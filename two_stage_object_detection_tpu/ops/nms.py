"""Static-shape non-maximum suppression for TPU.

Replaces the reference's ``torchvision.ops.nms`` (a C++/CUDA kernel used at
``nets/rpn.py:63``, ``nets/frcnn_training.py:454``, ``multi_inference.py:84``)
with an XLA-friendly tiled algorithm:

* boxes are processed in score order, in tiles of ``tile_size``;
* each tile is first suppressed against all earlier (already final) tiles
  with dense tile x tile IoU blocks (pure VPU work, no gathers);
* within-tile greedy suppression is computed as the fixpoint of
  ``alive[j] = not any(i < j, alive[i] and iou[i, j] > t)`` via
  ``lax.while_loop`` — the unique solution of that recurrence *is* the greedy
  NMS result, and the iteration converges in a handful of sweeps in practice.

Everything is shape-static: outputs are padded to a fixed length with a
validity mask (the reference instead pads keep-indices by *duplicating*
top-scoring boxes, ``nets/rpn.py:65-68`` — we keep the padded contract but
mark padding explicitly).

Suppressed or invalid boxes are zeroed; a zero-area box has IoU 0 against
everything so it can neither suppress nor be suppressed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from two_stage_object_detection_tpu.ops.geometry import bbox_iou

NEG_INF = -1e9


def _self_suppress(box_tile: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS within one (score-sorted) tile; returns alive mask."""
    t = box_tile.shape[0]
    iou = bbox_iou(box_tile, box_tile)
    idx = jnp.arange(t)
    # can_suppress[i, j]: earlier box i overlaps later box j beyond threshold
    can = (iou > iou_threshold) & (idx[:, None] < idx[None, :])

    def body(state):
        alive, _ = state
        suppressed = jnp.any(can & alive[:, None], axis=0)
        new_alive = ~suppressed
        return new_alive, jnp.any(new_alive != alive)

    def cond(state):
        return state[1]

    alive0 = jnp.ones((t,), dtype=bool)
    alive, _ = lax.while_loop(cond, body, (alive0, jnp.array(True)))
    return alive


def nms_keep_mask_sorted(boxes_sorted: jnp.ndarray, iou_threshold: float,
                         tile_size: int = 256) -> jnp.ndarray:
    """Keep mask for boxes already sorted by descending score.

    Args:
      boxes_sorted: ``[n, 4]`` xyxy, descending score order, ``n`` a multiple
        of ``tile_size`` (pad with zero boxes).
      iou_threshold: suppress when IoU is strictly greater (torch semantics).

    Returns:
      ``[n]`` bool keep mask (zero-area padding rows come back True — callers
      must AND with their own validity mask).
    """
    n = boxes_sorted.shape[0]
    assert n % tile_size == 0, (n, tile_size)
    num_tiles = n // tile_size

    def process_tile(i, boxes):
        tile = lax.dynamic_slice(boxes, (i * tile_size, 0), (tile_size, 4))

        def cross(j, tile):
            other = lax.dynamic_slice(boxes, (j * tile_size, 0), (tile_size, 4))
            iou = bbox_iou(other, tile)               # [T_other, T_tile]
            dead = jnp.any(iou > iou_threshold, axis=0)
            return tile * (~dead[:, None]).astype(tile.dtype)

        tile = lax.fori_loop(0, i, cross, tile)
        alive = _self_suppress(tile, iou_threshold)
        tile = tile * alive[:, None].astype(tile.dtype)
        return lax.dynamic_update_slice(boxes, tile, (i * tile_size, 0))

    out = lax.fori_loop(0, num_tiles, process_tile, boxes_sorted)
    # a surviving box is one whose coordinates were not zeroed
    survived = jnp.any(out != 0.0, axis=1)
    originally_zero = ~jnp.any(boxes_sorted != 0.0, axis=1)
    return survived | originally_zero


def _pad_rows(x: jnp.ndarray, n: int, value=0.0) -> jnp.ndarray:
    pad = n - x.shape[0]
    if pad <= 0:
        return x[:n]
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "max_output", "tile_size"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        max_output: int, valid: jnp.ndarray | None = None,
        tile_size: int = 128):
    """torch-style NMS returning indices into the input, score-descending.

    Args:
      boxes: ``[n, 4]`` xyxy.
      scores: ``[n]``.
      iou_threshold: strict-greater suppression threshold.
      max_output: static output length.
      valid: optional ``[n]`` bool mask of real (non-padding) inputs.

    Returns:
      ``(indices, keep_valid)``: ``[max_output]`` int32 indices (0 for padding
      slots) and a ``[max_output]`` bool mask of which slots are real.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order] * valid[order][:, None].astype(boxes.dtype)
    valid_sorted = valid[order]

    n_pad = -(-n // tile_size) * tile_size
    mask = nms_keep_mask_sorted(_pad_rows(boxes_sorted, n_pad), iou_threshold,
                                tile_size)[:n]
    mask = mask & valid_sorted

    # compact kept sorted-positions into the first `max_output` slots
    pos = jnp.where(mask, jnp.cumsum(mask) - 1, max_output)
    out_idx = jnp.zeros((max_output,), dtype=jnp.int32)
    out_idx = out_idx.at[pos].set(order.astype(jnp.int32), mode="drop")
    keep_valid = jnp.arange(max_output) < jnp.sum(mask)
    return out_idx, keep_valid


@functools.partial(jax.jit, static_argnames=("iou_threshold", "n_post", "tile_size"))
def nms_padded(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
               n_post: int, valid: jnp.ndarray | None = None,
               tile_size: int = 128):
    """NMS returning the kept boxes themselves, padded to ``n_post``.

    This is the proposal-pipeline form of the reference's
    ``ProposalCreator.__call__`` tail (``nets/rpn.py:63-69``): fixed-size
    output, but padded with zeros + a validity mask instead of duplicated
    top boxes.

    Returns:
      ``(boxes_out [n_post, 4], scores_out [n_post], valid_out [n_post])``.
    """
    idx, keep_valid = nms(boxes, scores, iou_threshold, n_post, valid=valid,
                          tile_size=tile_size)
    vf = keep_valid.astype(boxes.dtype)
    return boxes[idx] * vf[:, None], scores[idx] * vf, keep_valid
