from two_stage_object_detection_tpu.utils.utils import (  # noqa: F401
    set_seed, update_ema)
from two_stage_object_detection_tpu.utils.checkpoint import (  # noqa: F401
    save_checkpoint, restore_checkpoint)
from two_stage_object_detection_tpu.utils.preemption import (  # noqa: F401
    PreemptionGuard)
