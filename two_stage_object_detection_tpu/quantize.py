"""Int8 post-training quantization for inference (v5e native int8 MXU).

The v5e MXU peaks at 394 TOPS int8 vs 197 TFLOPS bf16, and int8
activations halve HBM traffic.  Measured per-conv effect at this
model's shapes (``scripts/ablate_int8.py``, chained-conv methodology):

==================================  =====================
shape                               int8+requant vs bf16
==================================  =====================
3x3 512ch @ 38x38  (MXU-bound)      1.56x
3x3 256ch @ 38x38                   1.50x
3x3 128ch @ 75x75                   1.41x
3x3  64ch @ 150x150 (HBM-bound)     2.39x
1x1  32ch @ 150x150 (lane-padded)   1.21x
1x1  96ch @ 75x75                   1.04x
dw3x3 96ch @ 75x75  (VPU)           0.93x  -> NOT quantized
==================================  =====================

So int8 pays on dense convs (the ResNet backbones most of all) and
does nothing for depthwise — which is why only ``feature_group_count
== 1`` convs are quantized.

**Measured end-to-end verdict (v5e-1): int8 does NOT pay on these
architectures — kept opt-in, defaults stay bf16.**  Full predict,
batch 16: resnet34 1.04x, resnet50 0.99x, hardnet39s 0.80x, hardnet39
0.74x; backbone alone: 1.09x / 0.95x / 0.58x
(``scripts/ablate_int8_model.py``, ``BENCH_CONFIG=int8``).  The
per-conv wins above assumed int8-resident activations between convs;
real topologies break that residency — ResNet's skip adds and
HarDNet's dense concats consume conv outputs in f32/bf16, so every
activation materialises at full width anyway and the quantize/requant
chain is pure extra VPU work.  Making int8 stick would need
int8-resident skip/concat paths (an accuracy-relevant model redesign),
not a PTQ wrapper.  See docs/DESIGN.md "Int8 inference".

Design — **interception, not model duplication**: ``flax.linen
.intercept_methods`` swaps every eligible ``nn.Conv.__call__`` for a
quantized equivalent at trace time.  No model code changes, no second
checkpoint format: weights stay float (per-output-channel scales are
derived from the float kernel inside the traced graph — a few
microseconds of VPU work per step), and activations use per-conv
scales recorded by a one-off calibration pass.  XLA fuses the requant
chain (int32 -> f32 scale -> BN -> ReLU6 -> /s_x -> round -> int8)
into the conv epilogue, so inter-layer tensors materialize in HBM as
int8.

Quantized conv semantics (symmetric, round-to-nearest-even)::

    s_w[c] = max|W[..., c]| / 127          # per out-channel, from params
    s_x    = calibrated max|x| / 127       # per conv instance, static
    y      = conv(q(x, s_x), q(W, s_w), accum=int32) * s_w * s_x  (+ bias)

Usage::

    scales = calibrate(model, variables, [batch1, batch2], method="predict")
    qpredict = quantized(lambda v, x: model.apply(v, x, method="predict"),
                         scales)
    out = jax.jit(qpredict)(variables, images)

or at the serving layer: ``Predictor(cfg, params, batch_stats,
int8_scales=scales)``.

The reference has no quantization story (pure f32 PyTorch,
``nets/frcnn_training.py``); this subsystem is TPU-native scope.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

__all__ = ["calibrate", "quantized", "filter_scales"]


def _conv_path(module: nn.Module) -> str:
    return "/".join(module.scope.path)


def _is_eligible(module: nn.Module) -> bool:
    """Dense 2-D convs only — depthwise/grouped measure <1x in int8.

    Conv options the quantized path does not reproduce (input dilation,
    kernel masks, circular/causal padding) fall back to float rather
    than silently mis-computing.
    """
    return (isinstance(module, nn.Conv)
            and module.feature_group_count == 1
            and module.has_variable("params", "kernel")
            and module.get_variable("params", "kernel").ndim == 4
            and _norm2(module.input_dilation) == (1, 1)
            and getattr(module, "mask", None) is None
            and (not isinstance(module.padding, str)
                 or module.padding in ("SAME", "VALID", "SAME_LOWER")))


def _norm2(v, default=1):
    if v is None:
        v = default
    if isinstance(v, int):
        return (v, v)
    t = tuple(int(e) for e in v)
    return t * 2 if len(t) == 1 else t


def _quantized_conv(module: nn.Conv, x: jnp.ndarray, s_x: float):
    """Int8 x int8 -> int32 conv with f32 requant, matching nn.Conv."""
    w = module.get_variable("params", "kernel").astype(jnp.float32)
    s_w = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    s_w = jnp.maximum(s_w, 1e-12)
    w_q = jnp.round(w / s_w).astype(jnp.int8)
    x_q = jnp.round(jnp.clip(x.astype(jnp.float32) / s_x, -127.0, 127.0))
    x_q = x_q.astype(jnp.int8)
    padding = module.padding
    if not isinstance(padding, str):
        padding = tuple((int(lo), int(hi)) for lo, hi in padding)
    acc = lax.conv_general_dilated(
        x_q, w_q,
        window_strides=_norm2(module.strides),
        padding=padding,
        rhs_dilation=_norm2(module.kernel_dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_w * s_x)
    if module.use_bias:
        y = y + module.get_variable("params", "bias").astype(jnp.float32)
    out_dtype = module.dtype if module.dtype is not None else x.dtype
    return y.astype(out_dtype)


def calibrate(model: nn.Module, variables, batches: Iterable,
              method=None, **apply_kwargs) -> Dict[str, float]:
    """Record per-conv input absmax over calibration batches.

    One jitted pass per batch shape (a recording interceptor collects
    each eligible conv's input absmax as a traced output, so the whole
    calibration is a single compiled program — eager apply would pay
    this tunneled runtime's per-op dispatch cost hundreds of times).
    Returns ``{conv_path: absmax}`` — feed it to :func:`quantized`.
    """

    def one_batch(variables, batch):
        recs: Dict[str, jnp.ndarray] = {}

        def recorder(next_fun, args, kwargs, context):
            m = context.module
            if (context.method_name == "__call__" and _is_eligible(m)
                    and args and isinstance(args[0], jnp.ndarray)):
                amax = jnp.max(jnp.abs(args[0])).astype(jnp.float32)
                path = _conv_path(m)
                prev = recs.get(path)
                recs[path] = amax if prev is None else jnp.maximum(prev, amax)
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(recorder):
            model.apply(variables, batch, method=method, **apply_kwargs)
        return recs

    jitted = jax.jit(one_batch)
    records: Dict[str, float] = {}
    for batch in batches:
        got = jax.device_get(jitted(variables, batch))
        for path, amax in got.items():
            records[path] = max(records.get(path, 0.0), float(amax))
    return records


def filter_scales(scales: Mapping[str, float],
                  prefix: str = "extractor") -> Dict[str, float]:
    """Restrict quantization to a module subtree (e.g. the backbone)."""
    return {k: v for k, v in scales.items() if k.startswith(prefix)}


def _make_interceptor(scales: Mapping[str, float]):
    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if context.method_name == "__call__" and _is_eligible(m):
            amax = scales.get(_conv_path(m), 0.0)
            if amax > 0.0:
                return _quantized_conv(m, args[0], float(amax) / 127.0)
        return next_fun(*args, **kwargs)

    return interceptor


def quantized(fn: Callable, scales: Mapping[str, float]) -> Callable:
    """Wrap ``fn`` so flax convs listed in ``scales`` run in int8.

    The interception context is entered inside the call, so it is
    active at trace time — the wrapped function jits/lowers/exports
    like any other.
    """
    scales = dict(scales)
    interceptor = _make_interceptor(scales)

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with nn.intercept_methods(interceptor):
            return fn(*args, **kwargs)

    return wrapped
