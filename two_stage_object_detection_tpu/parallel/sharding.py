"""Parameter sharding rules for tensor parallelism.

Maps parameter paths to ``PartitionSpec``s over the ``model`` mesh axis:
dense kernels split their output features, conv kernels their output
channels; everything one-dimensional (biases, batch-norm scales/stats) is
replicated.  XLA inserts the all-gathers/reduce-scatters implied by the
shardings — there is no hand-written communication.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: str, shape, model_axis: str) -> P:
    ndim = len(shape)
    if ndim == 2 and ("Dense" in path or "cls_loc" in path or "score" in path
                      or "/fc1/" in path or "/fc2/" in path):
        return P(None, model_axis)            # [in, out] -> split out features
    # Backbone convs stay replicated: the HarDNet trunk is depthwise-grouped
    # throughout, and sharding any neighbouring 1x1 conv's output features
    # propagates a channel sharding into the grouped convs, which XLA's SPMD
    # partitioner cannot split (feature_group_count must divide the local
    # shard).  Tensor parallelism therefore lives in the dense heads, where
    # the big per-roi matmuls are.
    return P()


def infer_param_sharding(params, mesh: Mesh, model_axis: str = "model"):
    """Build a NamedSharding pytree for ``params`` (tensor-parallel rules).

    With a size-1 ``model`` axis this degrades to full replication, so the
    same code path serves pure data parallelism.
    """
    def to_sharding(path, leaf):
        path_str = "/".join(str(p.key) if hasattr(p, "key") else str(p)
                            for p in path)
        if mesh.shape[model_axis] == 1:
            return NamedSharding(mesh, P())
        spec = _spec_for(path_str, leaf.shape, model_axis)
        # only shard if the split axis is divisible
        for ax, name in enumerate(spec):
            if name is not None and leaf.shape[ax] % mesh.shape[name] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)
