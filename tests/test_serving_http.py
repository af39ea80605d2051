"""HTTP serving front: JPEG in -> JSON detections out (serving_http.py).

The reference has no network-facing inference at all (SURVEY §2: its
``multi_inference.py`` is a matplotlib script that needs GT boxes); this
pins the rebuild's full production edge: HTTP body -> native decode+resize
-> wire pack -> DynamicBatcher collation -> original-coordinate JSON.
"""

import http.client
import io
import json
import os
import threading

import jax
import numpy as np
import pytest
from PIL import Image

from tests.test_detector import tiny_config
from two_stage_object_detection_tpu.nets.trainer import create_train_state
from two_stage_object_detection_tpu.serving import Predictor
from two_stage_object_detection_tpu.serving_http import DetectionServer

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "data", "real_coco", "train2017", "hopper_full.jpg")


@pytest.fixture(scope="module")
def server():
    cfg = tiny_config()
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    pred = Predictor(cfg, state.params, state.batch_stats,
                     batch_sizes=(1, 4), wire="yuv420")
    with DetectionServer(pred, class_names=["cat", "dog", "bird"],
                         max_wait_ms=10.0).start() as srv:
        yield srv, pred


def _post(srv, body, path="/detect"):
    conn = http.client.HTTPConnection(srv.host, srv.port, timeout=120)
    conn.request("POST", path, body=body,
                 headers={"Content-Length": str(len(body))})
    resp = conn.getresponse()
    out = (resp.status, json.loads(resp.read().decode()))
    conn.close()
    return out


def _jpeg_bytes(arr_u8):
    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, "JPEG", quality=92)
    return buf.getvalue()


def test_detect_real_jpeg_maps_to_original_coords(server):
    srv, pred = server
    with open(FIXTURE, "rb") as f:
        body = f.read()
    status, out = _post(srv, body)
    assert status == 200
    with Image.open(FIXTURE) as im:
        ow, oh = im.size
    assert out["image"] == {"height": oh, "width": ow}
    for d in out["detections"]:
        x1, y1, x2, y2 = d["box"]
        assert 0 <= x1 <= x2 <= ow + 1e-6
        assert 0 <= y1 <= y2 <= oh + 1e-6
        assert 0.0 <= d["score"] <= 1.0
        assert d["class"] in ("cat", "dog", "bird")

    # the HTTP answer equals the library answer on the same ingest pixels
    img, ih, iw = srv._ingest(body)
    want = pred(img[None])
    k = int(want["valid"][0].sum())
    assert len(out["detections"]) == k
    h, w = pred.cfg.input_size
    boxes = np.asarray(want["boxes"][0][:k], np.float64)
    boxes[:, 0::2] *= iw / w
    boxes[:, 1::2] *= ih / h
    got = np.array([d["box"] for d in out["detections"]], np.float64)
    if k:
        np.testing.assert_allclose(got, boxes, atol=0.011)  # rounded to 2dp


def test_concurrent_requests_collate(server):
    srv, _ = server
    rng = np.random.RandomState(3)
    bodies = [_jpeg_bytes(rng.randint(0, 256, (40, 50, 3)).astype(np.uint8))
              for _ in range(6)]
    results = [None] * 6

    def client(i):
        results[i] = _post(srv, bodies[i])

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for status, out in results:
        assert status == 200
        assert out["image"] == {"height": 40, "width": 50}
        assert isinstance(out["detections"], list)


def test_health_and_errors(server):
    srv, pred = server
    conn = http.client.HTTPConnection(srv.host, srv.port, timeout=30)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    health = json.loads(resp.read().decode())
    assert resp.status == 200
    assert health["status"] == "ok"
    assert health["wire"] == "yuv420"
    assert health["buckets"] == [1, 4]
    conn.request("GET", "/nope")
    resp = conn.getresponse()
    resp.read()
    assert resp.status == 404
    conn.close()

    status, out = _post(srv, b"this is not an image")
    assert status == 400 and "error" in out
    status, out = _post(srv, b"\xff\xd8ragged jpeg header")
    assert status == 400 and "error" in out
    status, _ = _post(srv, _jpeg_bytes(np.zeros((8, 8, 3), np.uint8)),
                      path="/wrong")
    assert status == 404
