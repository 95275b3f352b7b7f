"""Rolling reload under LIVE traffic: two REAL serve.py replicas behind
router.py, background threads hammering /predict through the router's
own HTTP server while a rolling /reload swaps checkpoints replica by
replica.

The client contract under churn (what this asserts): every in-flight
request either succeeds (200) or fails with the documented
503-re-register outcome — never a connection error, never a replica
marked dead by an application-level 400 (the unknown-context window
between a replica-side /reload and the router's unpin is exactly such a
400) — and aggregate capacity never reaches zero.

Reference capability being exceeded: the reference has no serving stack;
this is the scale-out recipe documented in docs/serving.md.
"""

import base64
import json
import threading
import time
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two real estimators on this 1-core box

cv2 = pytest.importorskip("cv2")


def _b64_image(seed=0, size=96):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return base64.b64encode(buf.tobytes()).decode()


def _post(url, path, payload, timeout=300):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def stack():
    """Two real PoseService replicas + a Router + its HTTP server."""
    import serve
    from router import Router, make_handler

    services, httpds = [], []
    for _ in range(2):
        svc = serve.PoseService(size=56, max_kpt=16)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                    serve.make_handler(svc))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        services.append(svc)
        httpds.append(httpd)
    urls = [f"http://127.0.0.1:{h.server_address[1]}" for h in httpds]
    router = Router(urls, probe_interval=0)
    rhttpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(router))
    threading.Thread(target=rhttpd.serve_forever, daemon=True).start()
    rurl = f"http://127.0.0.1:{rhttpd.server_address[1]}"
    yield services, router, rurl
    for h in httpds + [rhttpd]:
        h.shutdown()
        h.server_close()
    router.close()


def _register(rurl, seed):
    status, out = _post(rurl, "/support", {
        "images": [_b64_image(seed)],
        "keypoints": [[12, 18], [44, 60]],
        "skeleton": [[0, 1]],
    })
    assert status == 200, out
    return out["context_id"]


def test_rolling_reload_under_live_traffic(stack, tmp_path):
    import jax

    from edgecape_tpu.train import checkpoint as ck

    services, router, rurl = stack

    # one context per replica (least-loaded placement spreads them)
    cids = [_register(rurl, seed) for seed in (10, 11)]
    query = _b64_image(12)
    # warm the jitted predict path on both replicas before timing traffic
    for cid in cids:
        status, out = _post(rurl, "/predict",
                            {"context_id": cid, "image": query})
        assert status == 200, out

    perturbed = jax.tree.map(
        lambda a: a * 1.25 + 0.01 if np.issubdtype(a.dtype, np.floating)
        else a, services[0].est.head_params)
    ck.save_checkpoint(str(tmp_path / "swap"), {"params": perturbed})

    stop = threading.Event()
    violations, outcomes = [], []
    lock = threading.Lock()

    def client(idx):
        cid = cids[idx]
        while not stop.is_set():
            try:
                status, out = _post(rurl, "/predict",
                                    {"context_id": cid, "image": query})
            except Exception as e:  # noqa: BLE001 — transport failure
                with lock:
                    violations.append(f"transport: {e!r}")
                return
            if status == 200:
                with lock:
                    outcomes.append("ok")
            elif status == 503 and "re-register" in out.get("error", ""):
                # the documented contract: the pin was invalidated by the
                # rolling reload; re-register and keep going
                with lock:
                    outcomes.append("re-register")
                try:
                    cid = _register(rurl, 20 + idx)
                except Exception as e:  # noqa: BLE001
                    with lock:
                        violations.append(f"re-register failed: {e!r}")
                    return
            else:
                with lock:
                    violations.append(f"status {status}: {out}")
                return

    threads = [threading.Thread(target=client, args=(i,)) for i in (0, 1)]
    for t in threads:
        t.start()
    time.sleep(0.5)     # traffic in flight before the swap begins

    status, out = _post(rurl, "/reload",
                        {"checkpoint": str(tmp_path / "swap")})
    time.sleep(1.0)     # traffic keeps flowing after the swap
    stop.set()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive()

    assert status == 200 and out["ok"], out
    assert out["contexts_dropped"] >= 2
    assert violations == []
    counts = {k: outcomes.count(k) for k in set(outcomes)}
    # traffic flowed on both sides of the swap, and at least one client
    # crossed the invalidation window and recovered via re-register
    assert counts.get("ok", 0) >= 2, counts
    assert counts.get("re-register", 0) >= 1, counts

    # capacity never reached zero: both replicas alive, each reloaded
    # exactly once, and the pool still serves new work
    hz = router.healthz()
    assert hz["ok"] and all(r["alive"] for r in hz["replicas"])
    for svc in services:
        assert svc.stats.get("reloads", 0) == 1
    cid = _register(rurl, 30)
    status, out = _post(rurl, "/predict",
                        {"context_id": cid, "image": query})
    assert status == 200, out


def test_stale_context_400_does_not_kill_replica(stack):
    """A replica-side unknown-context 400 (reload landed between routing
    lookup and forward) must surface as the 503 re-register contract and
    leave the replica alive — the HTTPError-is-a-URLError trap."""
    services, router, rurl = stack

    cid = _register(rurl, 40)
    # simulate the race: the replica drops the context server-side but
    # the router still holds the pin
    rep = router.routes[cid]
    for svc in services:
        svc.contexts.clear()
    status, out = _post(rurl, "/predict",
                        {"context_id": cid, "image": _b64_image(41)})
    assert status == 503 and "re-register" in out["error"], out
    assert rep.alive
    assert cid not in router.routes
    hz = router.healthz()
    assert hz["ok"] and all(r["alive"] for r in hz["replicas"])
