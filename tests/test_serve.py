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
def service_obj():
    import serve

    service = serve.PoseService(size=56, max_kpt=16)
    service.enable_batching(window_s=0.05)
    return service


@pytest.fixture(scope="module")
def server(service_obj):
    import serve

    service = service_obj
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


def test_predict_batch_matches_single(server):
    """/predict_batch: one dispatch for N queries, rows match the
    single-query endpoint bit-for-bit (same bucket-padded batch path)."""
    status, out = _post(server, "/support", {
        "images": [_b64_image(3)],
        "keypoints": [[15, 25], [70, 40], [30, 80], [50, 50]],
        "skeleton": [[0, 1], [2, 3]],
    })
    assert status == 200, out
    cid = out["context_id"]

    queries = [_b64_image(s) for s in (4, 5, 6)]
    status, batch = _post(server, "/predict_batch",
                          {"context_id": cid, "images": queries})
    assert status == 200, batch
    assert len(batch["results"]) == 3
    assert len(batch["edge_weights"]) == 2

    for q, row in zip(queries, batch["results"]):
        status, single = _post(server, "/predict",
                               {"context_id": cid, "image": q})
        assert status == 200, single
        np.testing.assert_allclose(np.array(row["keypoints"]),
                                   np.array(single["keypoints"]),
                                   rtol=0, atol=1e-4)


def test_concurrent_predicts_coalesce(server):
    """Micro-batched concurrent /predict calls return correct results and
    the /healthz stats show coalescing happened."""
    import http.client

    status, out = _post(server, "/support", {
        "images": [_b64_image(7)],
        "keypoints": [[10, 10], [80, 80]],
        "skeleton": [[0, 1]],
    })
    assert status == 200, out
    cid = out["context_id"]
    # warm the bucket shapes so the coalesced window isn't dominated by
    # a jit compile on the 1-core box
    _post(server, "/predict_batch",
          {"context_id": cid, "images": [_b64_image(s) for s in (8, 9)]})

    conn = http.client.HTTPConnection(*server, timeout=60)
    conn.request("GET", "/healthz")
    before = json.loads(conn.getresponse().read())["stats"]

    results = {}

    def hit(seed):
        results[seed] = _post(server, "/predict",
                              {"context_id": cid,
                               "image": _b64_image(seed)})

    threads = [threading.Thread(target=hit, args=(s,))
               for s in (10, 11, 12, 13)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    for s in (10, 11, 12, 13):
        status, pred = results[s]
        assert status == 200, pred
        assert len(pred["keypoints"]) == 2

    conn = http.client.HTTPConnection(*server, timeout=60)
    conn.request("GET", "/healthz")
    after = json.loads(conn.getresponse().read())["stats"]
    assert after["queries"] - before["queries"] == 4
    # coalesced: the 4 concurrent requests shared device dispatches
    assert after["dispatches"] - before["dispatches"] < 4


def test_reload_hot_swaps_weights(server, service_obj, tmp_path):
    """POST /reload swaps head weights in place: cached contexts drop,
    old context ids 400, and predictions change under the new weights."""
    import jax

    from edgecape_tpu.train import checkpoint as ck

    status, out = _post(server, "/support", {
        "images": [_b64_image(20)],
        "keypoints": [[12, 18], [44, 60]],
        "skeleton": [[0, 1]],
    })
    assert status == 200, out
    old_cid = out["context_id"]
    query = _b64_image(21)
    status, pred_old = _post(server, "/predict",
                             {"context_id": old_cid, "image": query})
    assert status == 200, pred_old

    original = service_obj.est.head_params
    perturbed = jax.tree.map(
        lambda a: a * 1.5 + 0.01 if np.issubdtype(a.dtype, np.floating)
        else a, original)
    ck.save_checkpoint(str(tmp_path / "swap"), {"params": perturbed})
    ck.save_checkpoint(str(tmp_path / "orig"), {"params": original})

    status, out = _post(server, "/reload",
                        {"checkpoint": str(tmp_path / "swap")})
    assert status == 200, out
    assert out["ok"] and out["contexts_dropped"] >= 1

    # stale context id is rejected, not silently served with new weights
    status, out = _post(server, "/predict",
                        {"context_id": old_cid, "image": query})
    assert status == 400

    status, out = _post(server, "/support", {
        "images": [_b64_image(20)],
        "keypoints": [[12, 18], [44, 60]],
        "skeleton": [[0, 1]],
    })
    assert status == 200, out
    status, pred_new = _post(server, "/predict",
                             {"context_id": out["context_id"],
                              "image": query})
    assert status == 200, pred_new
    assert not np.allclose(np.array(pred_new["keypoints"]),
                           np.array(pred_old["keypoints"]), atol=1e-5)

    # structure mismatch is a client error, server keeps serving
    ck.save_checkpoint(str(tmp_path / "bogus"),
                       {"params": {"x": np.zeros(3, np.float32)}})
    status, out = _post(server, "/reload",
                        {"checkpoint": str(tmp_path / "bogus")})
    assert status == 400 and "error" in out

    # restore the original weights for any later module-scoped use
    status, out = _post(server, "/reload",
                        {"checkpoint": str(tmp_path / "orig")})
    assert status == 200, out


def test_reload_during_register_support_is_rejected(service_obj):
    """A /reload landing between register_support's param snapshot and its
    context insert must NOT leave a stale-generation context in the
    registry (it would silently pair old support features with the new
    head params). The insert is generation-checked and re-raised."""
    service = service_obj
    real_fns = service.est._cached_fns

    def racing_sup_fn(*args, **kw):
        ctx = real_fns[0](*args, **kw)
        with service.lock:          # simulate a concurrent /reload commit
            service.generation += 1
            service.contexts.clear()
        return ctx

    service.est._cached_fns = (racing_sup_fn,) + tuple(real_fns[1:])
    try:
        with pytest.raises(RuntimeError, match="reloaded during"):
            service.register_support({
                "images": [_b64_image(7)],
                "keypoints": [[10, 12], [30, 40]],
                "skeleton": [[0, 1]],
            })
        assert len(service.contexts) == 0
    finally:
        service.est._cached_fns = real_fns

    # sanity: without the race the same payload registers fine
    cid = service.register_support({
        "images": [_b64_image(7)],
        "keypoints": [[10, 12], [30, 40]],
        "skeleton": [[0, 1]],
    })
    assert cid in service.contexts
