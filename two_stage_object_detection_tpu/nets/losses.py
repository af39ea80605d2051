"""Detection losses (masked, static-shape).

Equivalents of reference ``FasterRCNNTrainer._fast_rcnn_loc_loss``
(``nets/frcnn_training.py:220-238``) and its ``F.cross_entropy`` calls with
``ignore_index`` — expressed as mask-weighted reductions so they are safe
under jit/vmap with zero positives (the reference divides by the number of
positive elements and would produce NaN at zero positives; we return 0).
"""

from __future__ import annotations

import jax.numpy as jnp


def fast_rcnn_loc_loss(pred_loc: jnp.ndarray, gt_loc: jnp.ndarray,
                       gt_label: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Smooth-L1 over positive samples, averaged over positive *elements*.

    Args:
      pred_loc / gt_loc: ``[..., N, 4]``.
      gt_label: ``[..., N]`` — positives are ``> 0``.
      sigma: smooth-L1 transition parameter (reference uses 1).
    """
    pos = (gt_label > 0).astype(pred_loc.dtype)[..., None]     # [..., N, 1]
    sigma2 = sigma ** 2
    diff = jnp.abs((gt_loc - pred_loc).astype(jnp.float32))
    loss = jnp.where(diff < 1.0 / sigma2,
                     0.5 * sigma2 * diff ** 2,
                     diff - 0.5 / sigma2)
    total = jnp.sum(loss * pos)
    n_elem = jnp.sum(pos) * pred_loc.shape[-1]
    return total / jnp.maximum(n_elem, 1.0)


def softmax_cross_entropy_with_ignore(logits: jnp.ndarray, labels: jnp.ndarray,
                                      ignore_index: int = -1) -> jnp.ndarray:
    """Mean softmax CE over entries whose label is not ``ignore_index``.

    Matches ``F.cross_entropy(..., ignore_index=-1)`` mean reduction
    (reference ``frcnn_training.py:274,327``).
    """
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    log_probs = logits - jnp.max(logits, axis=-1, keepdims=True)
    log_probs = log_probs - jnp.log(
        jnp.sum(jnp.exp(log_probs), axis=-1, keepdims=True))
    nll = -jnp.take_along_axis(log_probs, safe_labels[..., None], axis=-1)[..., 0]
    nll = nll * valid.astype(nll.dtype)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)
