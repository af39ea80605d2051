"""Device-side (jittable) training augmentations.

The reference augments on 12 host worker processes
(``dataset/dataloader.py:63-74`` + ``dataset/transform.py:4-12``); this
container's single host core caps that chain at ~27 img/s while the TPU
trains at ~52 and serves at ~220.  In the ``pipeline="device"`` mode the
host only decodes+resizes (C++ ``native/preprocess.cpp``) and the whole
augmentation chain runs on the TPU *inside* the train step:

* photometric distort — brightness / contrast / saturation / hue-mix with
  the same ranges and coin flips as the host chain (``data/transforms.py``);
* random horizontal flip with joint box flip;
* scale jitter — the reference's ``ScaleJitter -> Resize(600)`` composition
  is geometrically the identity on the final canvas (boxes land unchanged);
  its only pixel effect is the resample through a random intermediate scale.
  Reproduced with a ``lax.switch`` over a discrete scale set so every branch
  has static shapes.

Everything is ``vmap``-ed per image with per-image PRNG keys, so the whole
batch augments in one fused device pass.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

SCALES = (0.8, 0.9, 1.0, 1.1, 1.2)   # ScaleJitter(0.8, 1.2) discretised


def _photometric(img: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Brightness/contrast/saturation/hue jitter, host-chain parity
    (``data/transforms.py:17-41``)."""
    ks = jax.random.split(key, 10)
    u = lambda k, lo, hi: jax.random.uniform(k, (), minval=lo, maxval=hi)
    coin = lambda k: jax.random.bernoulli(k, 0.5)

    img = jnp.where(coin(ks[0]), img * u(ks[1], 0.875, 1.125), img)
    contrast_late = coin(ks[2])

    def contrast(x, k):
        mean = jnp.mean(x)
        return (x - mean) * u(k, 0.5, 1.5) + mean

    img = jnp.where(~contrast_late & coin(ks[3]), contrast(img, ks[4]), img)
    gray = img @ jnp.array([0.299, 0.587, 0.114], img.dtype)
    f = u(ks[5], 0.5, 1.5)
    img = jnp.where(coin(ks[6]),
                    img * f + gray[..., None] * (1.0 - f), img)
    delta = u(ks[7], -0.05, 0.05)
    shifted = jnp.roll(img, 1, axis=-1)
    img = jnp.where(coin(ks[8]),
                    img * (1.0 - jnp.abs(delta)) + shifted * jnp.abs(delta),
                    img)
    img = jnp.where(contrast_late & coin(ks[9]), contrast(img, ks[4]), img)
    return jnp.clip(img, 0.0, 1.0)


def _hflip(img: jnp.ndarray, boxes: jnp.ndarray, key: jax.Array):
    w = img.shape[1]
    flip = jax.random.bernoulli(key, 0.5)
    img = jnp.where(flip, img[:, ::-1], img)
    flipped = jnp.stack([w - boxes[:, 2], boxes[:, 1],
                         w - boxes[:, 0], boxes[:, 3]], axis=-1)
    boxes = jnp.where(flip, flipped, boxes)
    return img, boxes


def _scale_jitter(img: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Resample through a random intermediate scale (pixels only: the
    box geometry of ScaleJitter->Resize(target) cancels exactly)."""
    h, w, _ = img.shape

    def branch(s):
        def f(x):
            if abs(s - 1.0) < 1e-6:
                return x
            hs, ws = max(int(h * s), 8), max(int(w * s), 8)
            mid = jax.image.resize(x, (hs, ws, 3), "linear", antialias=True)
            return jax.image.resize(mid, (h, w, 3), "linear", antialias=True)
        return f

    idx = jax.random.randint(key, (), 0, len(SCALES))
    return jax.lax.switch(idx, [branch(s) for s in SCALES], img)


def _augment_one(img: jnp.ndarray, boxes: jnp.ndarray, key: jax.Array,
                 jitter: bool):
    k1, k2, k3 = jax.random.split(key, 3)
    img = _photometric(img, k1)
    img, boxes = _hflip(img, boxes, k2)
    if jitter:
        img = _scale_jitter(img, k3)
    return img, boxes


@functools.partial(jax.jit, static_argnames=("scale_jitter",))
def augment_batch(images: jnp.ndarray, boxes: jnp.ndarray, key: jax.Array,
                  scale_jitter: bool = True
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched training augmentation on device.

    Args:
      images: ``[B, H, W, 3]`` float32 in [0, 1] (decoded+resized on host).
      boxes: ``[B, G, 4]`` xyxy in image coordinates (padded; masks
        unaffected — flips preserve validity).
      key: PRNG key; split per image.

    Returns ``(images, boxes)`` augmented.
    """
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda i, b, k: _augment_one(i, b, k, scale_jitter))(
        images.astype(jnp.float32), boxes, keys)
