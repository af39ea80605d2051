"""Static-shape non-maximum suppression for TPU.

Replaces the reference's ``torchvision.ops.nms`` (a C++/CUDA kernel used at
``nets/rpn.py:63``, ``nets/frcnn_training.py:454``, ``multi_inference.py:84``)
with two XLA-friendly exact algorithms:

1. **Select-and-suppress** (the default, :func:`nms`): with boxes sorted by
   score, greedy NMS needs exactly ``max_output`` sequential steps — each
   step takes the first still-alive box (``argmax`` over the alive mask, the
   sort order makes "first alive" = "highest-scoring alive") and kills its
   overlaps with one vectorised IoU row.  Cost is ``O(max_output * n)`` VPU
   work with only ``max_output`` sequential steps — independent of how many
   candidate boxes there are (12k anchors -> 600 proposals = 600 steps).

2. **Tiled sweep** (:func:`nms_keep_mask_sorted`): computes the full keep
   mask in ``O((n/T)^2)`` tile-pair IoU blocks with a ``lax.while_loop``
   fixpoint for within-tile suppression — useful when *all* survivors are
   needed rather than a top-k.

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


def _iou_one_to_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one ``[4]`` box against ``[n, 4]`` boxes."""
    tl = jnp.maximum(box[:2], boxes[:, :2])
    br = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.maximum(br - tl, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area = (box[2] - box[0]) * (box[3] - box[1])
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (area + areas - inter + 1e-8)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "max_output"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        max_output: int, valid: jnp.ndarray | None = None):
    """torch-style NMS returning indices into the input, score-descending.

    Select-and-suppress greedy NMS: ``max_output`` sequential steps of
    vectorised work, independent of input length.

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
    alive0 = valid[order]

    def body(k, state):
        alive, out_pos, out_ok = state
        i = jnp.argmax(alive)                   # first alive = best-scoring alive
        ok = alive[i]
        box_i = boxes_sorted[i]
        suppress = _iou_one_to_many(box_i, boxes_sorted) > iou_threshold
        alive = alive & ~suppress
        alive = alive.at[i].set(False)
        out_pos = out_pos.at[k].set(i.astype(jnp.int32))
        out_ok = out_ok.at[k].set(ok)
        return alive, out_pos, out_ok

    out_pos0 = jnp.zeros((max_output,), jnp.int32)
    out_ok0 = jnp.zeros((max_output,), bool)
    _, out_pos, keep_valid = lax.fori_loop(0, max_output, body,
                                           (alive0, out_pos0, out_ok0))
    out_idx = jnp.where(keep_valid, order[out_pos].astype(jnp.int32), 0)
    return out_idx, keep_valid


@functools.partial(jax.jit, static_argnames=("iou_threshold", "n_post"))
def nms_padded(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
               n_post: int, valid: jnp.ndarray | None = None):
    """NMS returning the kept boxes themselves, padded to ``n_post``.

    This is the proposal-pipeline form of the reference's
    ``ProposalCreator.__call__`` tail (``nets/rpn.py:63-69``): fixed-size
    output, but padded with zeros + a validity mask instead of duplicated
    top boxes.

    Returns:
      ``(boxes_out [n_post, 4], scores_out [n_post], valid_out [n_post])``.
    """
    idx, keep_valid = nms(boxes, scores, iou_threshold, n_post, valid=valid)
    vf = keep_valid.astype(boxes.dtype)
    return boxes[idx] * vf[:, None], scores[idx] * vf, keep_valid
