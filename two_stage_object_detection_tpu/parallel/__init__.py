from two_stage_object_detection_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate)
from two_stage_object_detection_tpu.parallel.multiprocess import (  # noqa: F401
    fetch_global, init_distributed, is_multiprocess, put_global, put_local)
from two_stage_object_detection_tpu.parallel.sharding import (  # noqa: F401
    infer_param_sharding)
