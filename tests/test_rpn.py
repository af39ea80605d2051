import jax
import jax.numpy as jnp
import numpy as np

from two_stage_object_detection_tpu.nets.rpn import RPNHead, create_proposals
from two_stage_object_detection_tpu.ops.anchors import (
    enumerate_shifted_anchor, generate_basic_anchor)


def test_rpn_head_shapes():
    head = RPNHead(n_anchors=9)
    x = jnp.zeros((2, 5, 6, 32))
    params = head.init(jax.random.PRNGKey(0), x)
    locs, scores = head.apply(params, x)
    assert locs.shape == (2, 5 * 6 * 9, 4)
    assert scores.shape == (2, 5 * 6 * 9, 2)


def _tiny_anchors():
    base = generate_basic_anchor(base_size=2, ratios=(1.0,), anchor_scales=(4.0, 8.0))
    return jnp.array(enumerate_shifted_anchor(base, 16, 4, 4))  # [32, 4]


def test_create_proposals_static_contract(rng):
    anchors = _tiny_anchors()
    n = anchors.shape[0]
    locs = jnp.array(rng.randn(n, 4).astype(np.float32) * 0.1)
    scores = jnp.array(rng.rand(n).astype(np.float32))
    rois, rscores, valid = create_proposals(
        locs, scores, anchors, (64, 64), nms_iou=0.7, n_pre_nms=32,
        n_post_nms=16, min_size=2.0)
    assert rois.shape == (16, 4)
    assert rscores.shape == (16,)
    assert valid.shape == (16,)
    v = np.asarray(valid)
    r = np.asarray(rois)
    # valid rois are inside the image and >= min_size
    assert (r[v][:, 0] >= 0).all() and (r[v][:, 2] <= 64).all()
    assert ((r[v][:, 2] - r[v][:, 0]) >= 2.0).all()
    # padded rows are zero
    np.testing.assert_allclose(r[~v], 0.0)
    # scores descending among valid
    s = np.asarray(rscores)[v]
    assert (s[:-1] >= s[1:]).all()


def test_create_proposals_min_size_filter(rng):
    anchors = _tiny_anchors()
    n = anchors.shape[0]
    # deltas that shrink all boxes below min_size -> no valid proposal
    locs = jnp.zeros((n, 4)).at[:, 2:].set(-5.0)   # exp(-5) * w tiny
    scores = jnp.array(rng.rand(n).astype(np.float32))
    _, _, valid = create_proposals(
        locs, scores, anchors, (64, 64), nms_iou=0.7, n_pre_nms=32,
        n_post_nms=16, min_size=16.0)
    assert not np.asarray(valid).any()


def test_create_proposals_vmap(rng):
    anchors = _tiny_anchors()
    n = anchors.shape[0]
    locs = jnp.array(rng.randn(3, n, 4).astype(np.float32) * 0.1)
    scores = jnp.array(rng.rand(3, n).astype(np.float32))
    fn = lambda l, s: create_proposals(l, s, anchors, (64, 64), nms_iou=0.7,
                                       n_pre_nms=32, n_post_nms=8, min_size=2.0)
    rois_b, _, valid_b = jax.vmap(fn)(locs, scores)
    assert rois_b.shape == (3, 8, 4)
    for i in range(3):
        rois_i, _, valid_i = fn(locs[i], scores[i])
        np.testing.assert_allclose(np.asarray(rois_b[i]), np.asarray(rois_i),
                                   rtol=1e-5)
