"""End-to-end test of the inference server: register a support episode,
predict on a query, check the HTTP contract."""

import base64
import http.client
import json
import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy jit/model suite; excluded by -m 'not slow'

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def server():
    import serve

    service = serve.PoseService(size=56, max_kpt=16)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                serve.make_handler(service))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address
    httpd.shutdown()


def _b64_image(seed=0, size=96):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return base64.b64encode(buf.tobytes()).decode()


def _post(addr, path, payload):
    conn = http.client.HTTPConnection(*addr, timeout=300)
    conn.request("POST", path, json.dumps(payload),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def test_healthz(server):
    conn = http.client.HTTPConnection(*server, timeout=60)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    assert resp.status == 200
    assert json.loads(resp.read())["ok"] is True


def test_support_predict_roundtrip(server):
    status, out = _post(server, "/support", {
        "images": [_b64_image(0)],
        "keypoints": [[20, 20], [60, 30], [40, 70]],
        "skeleton": [[0, 1], [1, 2]],
    })
    assert status == 200, out
    cid = out["context_id"]

    status, pred = _post(server, "/predict",
                         {"context_id": cid, "image": _b64_image(1)})
    assert status == 200, pred
    assert len(pred["keypoints"]) == 3
    assert all(len(kp) == 3 for kp in pred["keypoints"])
    kp = np.array(pred["keypoints"])
    assert np.isfinite(kp).all()
    assert (kp[:, :2] >= 0).all() and (kp[:, :2] <= 96).all()
    assert len(pred["edge_weights"]) == 2


def test_unknown_context(server):
    status, out = _post(server, "/predict",
                        {"context_id": "nope", "image": _b64_image(2)})
    assert status == 400
    assert "error" in out


def test_index_page(server):
    """GET / serves the interactive click-to-annotate UI (the reference
    demo.py/app.py interaction surface, dependency-free)."""
    import http.client
    conn = http.client.HTTPConnection(*server, timeout=60)
    conn.request("GET", "/")
    resp = conn.getresponse()
    body = resp.read().decode()
    assert resp.status == 200
    assert "EdgeCape-TPU" in body
    # the annotation flow the JS drives: keypoint clicks, edge mode,
    # /support + /predict endpoints
    for needle in ("predictBtn", "/support", "/predict", "skeleton"):
        assert needle in body, needle
