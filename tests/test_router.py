"""router.py: context-sticky multi-replica routing.

Replicas here are lightweight fakes speaking serve.py's exact HTTP
contract (the real PoseService behind that contract is covered by
tests/test_serve.py) so the routing logic — stickiness, least-loaded
placement, failover, rolling reload — is tested fast and
deterministically, without building two estimators on this 1-core box.
"""

import json
import threading
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from router import Router, make_handler


class FakeReplica:
    """Minimal serve.py stand-in: /support mints ids, /predict answers
    only for ids it minted, /reload drops them, /healthz reports ok."""

    _seq = 0

    def __init__(self):
        FakeReplica._seq += 1
        self.name = f"rep{FakeReplica._seq}"
        self.contexts = set()
        self.calls = []            # (path,) log, in order
        self.lock = threading.Lock()
        fake = self

        class H(BaseHTTPRequestHandler):
            def _reply(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                with fake.lock:
                    fake.calls.append(self.path)
                self._reply(200, {"ok": True,
                                  "contexts": len(fake.contexts)})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n)) if n else {}
                with fake.lock:
                    fake.calls.append(self.path)
                    if self.path == "/support":
                        cid = f"{fake.name}-ctx{len(fake.contexts)}"
                        fake.contexts.add(cid)
                        self._reply(200, {"context_id": cid})
                    elif self.path in ("/predict", "/predict_batch"):
                        cid = payload.get("context_id")
                        if cid in fake.contexts:
                            self._reply(200, {"keypoints": [],
                                              "served_by": fake.name})
                        else:
                            self._reply(400, {"error": "unknown context"})
                    elif self.path == "/reload":
                        dropped = len(fake.contexts)
                        fake.contexts.clear()
                        self._reply(200, {"ok": True,
                                          "contexts_dropped": dropped})
                    else:
                        self._reply(404, {"error": "not found"})

            def log_message(self, *a):
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self.server.server_address[1]
        self.url = f"http://127.0.0.1:{self.port}"
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()

    def stop(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture()
def pool():
    reps = [FakeReplica(), FakeReplica()]
    # probe_interval=0: probing driven explicitly by the tests
    router = Router([r.url for r in reps], probe_interval=0)
    yield reps, router
    router.close()
    for r in reps:
        r.stop()


def _post(url, path, payload):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_sticky_routing_across_replicas(pool):
    reps, router = pool
    # two supports land on different replicas (least-loaded placement
    # tie-breaks by pinned-context count)
    cid_a = router.support({"images": []})["context_id"]
    cid_b = router.support({"images": []})["context_id"]
    assert cid_a.split("-")[0] != cid_b.split("-")[0]
    # predicts follow their pin, repeatedly, regardless of call order
    for cid in (cid_a, cid_b, cid_a, cid_b, cid_b):
        out = router.predict("/predict", {"context_id": cid})
        assert out["served_by"] == cid.split("-")[0]


def test_unknown_context_is_lookup_error(pool):
    _, router = pool
    with pytest.raises(LookupError, match="re-register"):
        router.predict("/predict", {"context_id": "nope"})


def test_failover_and_rejoin(pool):
    reps, router = pool
    cid_a = router.support({})["context_id"]
    cid_b = router.support({})["context_id"]
    dead = next(r for r in reps
                if cid_a.startswith(r.name))
    dead_port, dead_name = dead.port, dead.name
    dead.stop()
    # a predict against the dead replica surfaces "context lost" and
    # marks it dead; the other context keeps working
    with pytest.raises(LookupError, match="context lost"):
        router.predict("/predict", {"context_id": cid_a})
    out = router.predict("/predict", {"context_id": cid_b})
    assert out["served_by"] == cid_b.split("-")[0]
    # new supports avoid the dead replica entirely
    for _ in range(3):
        cid = router.support({})["context_id"]
        assert not cid.startswith(dead_name)
    # replica comes back on the same port -> prober readmits it
    rep_obj = next(r for r in router.replicas
                   if r.url.endswith(str(dead_port)))
    assert not rep_obj.alive
    back = _Revive(dead_port)
    try:
        router._probe_one(rep_obj)
        assert rep_obj.alive
    finally:
        back.stop()


class _Revive:
    """Tiny /healthz-only server bound to a specific port."""

    def __init__(self, port):
        class H(BaseHTTPRequestHandler):
            def do_GET(self):
                body = b'{"ok": true}'
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", port), H)
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()

    def stop(self):
        self.server.shutdown()
        self.server.server_close()


def test_rolling_reload_invalidates_and_sequences(pool):
    reps, router = pool
    cids = [router.support({})["context_id"] for _ in range(4)]
    out = router.rolling_reload({"checkpoint": "/tmp/x"})
    assert out["ok"] and out["contexts_dropped"] == 4
    # every live replica reloaded exactly once, and health-checked AFTER
    # its reload (the rolling gate that keeps capacity above zero)
    for r in reps:
        assert r.calls.count("/reload") == 1
        assert "/healthz" in r.calls[r.calls.index("/reload"):]
    # all pins invalidated: predicts now demand re-registration
    for cid in cids:
        with pytest.raises(LookupError, match="re-register"):
            router.predict("/predict", {"context_id": cid})
    # and the pool is still fully live (capacity never hit zero)
    assert all(rep.alive for rep in router.replicas)
    assert router.support({})["context_id"]


def test_http_surface_end_to_end(pool):
    """Drive the router through its OWN HTTP server (the client-facing
    contract: 503 + re-register message on lost contexts)."""
    reps, router = pool
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(router))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        status, out = _post(url, "/support", {"images": []})
        assert status == 200
        cid = out["context_id"]
        status, out = _post(url, "/predict", {"context_id": cid})
        assert status == 200 and out["served_by"] == cid.split("-")[0]
        status, out = _post(url, "/predict", {"context_id": "ghost"})
        assert status == 503 and "re-register" in out["error"]
        with urllib.request.urlopen(url + "/healthz", timeout=10) as r:
            hz = json.loads(r.read())
        assert hz["ok"] and len(hz["replicas"]) == 2
        assert hz["contexts"] == 1
    finally:
        server.shutdown()
        server.server_close()
