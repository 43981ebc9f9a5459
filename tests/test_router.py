"""Shard router (api/router.py): round-robin pools, synth_id routing,
worker-failure 502 — no Spark involved (workers are stubbed)."""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from treemachine_spark.api.router import ShardRouter, make_router_server


def _stub_worker(tag: str) -> ThreadingHTTPServer:
    class H(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length") or 0)
            body = json.loads(self.rfile.read(n) or b"{}")
            data = json.dumps({"worker": tag, "path": self.path, "echo": body}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *args):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def _post(base, path, body):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(), method="POST"
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_round_robin_and_synth_id_routing():
    wa, wb, wc = _stub_worker("a"), _stub_worker("b"), _stub_worker("c")
    url = lambda s: f"http://127.0.0.1:{s.server_address[1]}"  # noqa: E731
    router = ShardRouter(
        pools={"treeX": [url(wa), url(wb)], "treeY": [url(wc)]},
        default_pool=[url(wa), url(wb)],
    )
    srv = make_router_server(router)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # default pool round-robins
        seen = [
            _post(base, "/v3/tree_of_life/about", {})[1]["worker"]
            for _ in range(4)
        ]
        assert sorted(set(seen)) == ["a", "b"] and seen[0] != seen[1]
        # synth_id picks its pool, and the key is STRIPPED before forwarding
        status, resp = _post(
            base, "/v3/tree_of_life/mrca", {"synth_id": "treeY", "node_ids": ["n1"]}
        )
        assert status == 200 and resp["worker"] == "c"
        assert resp["echo"] == {"node_ids": ["n1"]}
        # unknown synth_id -> 400
        status, resp = _post(base, "/v3/tree_of_life/about", {"synth_id": "nope"})
        assert status == 400
        # dead worker -> 502, router survives
        wc.shutdown(); wc.server_close()
        status, resp = _post(base, "/v3/tree_of_life/about", {"synth_id": "treeY"})
        assert status == 502
        status, _ = _post(base, "/v3/tree_of_life/about", {})
        assert status == 200  # other pools unaffected
    finally:
        for s in (srv, wa, wb):
            s.shutdown()
            s.server_close()


def test_non_json_worker_error_body_becomes_502_style_payload():
    """ADVICE r5: a live worker answering with a NON-JSON body (proxy error
    page, truncated response) must not raise JSONDecodeError out of
    forward() — the client gets the worker's status with the raw text
    wrapped in {"message": ...}, not a dropped connection."""

    class H(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length") or 0)
            self.rfile.read(n)
            if self.path.endswith("html_error"):
                data = b"<html>upstream exploded</html>"
                self.send_response(503)
            else:  # 200 with a non-dict JSON body
                data = b"[1, 2, 3]"
                self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *args):
            pass

    w = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=w.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{w.server_address[1]}"
    router = ShardRouter(pools={"t": [url]}, default_pool=[url])
    srv = make_router_server(router)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # direct forward(): worker's status code, raw text as message
        status, resp = router.forward("/html_error", {"synth_id": "t"})
        assert status == 503 and "upstream exploded" in resp["message"]
        status, resp = router.forward("/list_body", {"synth_id": "t"})
        assert status == 200 and resp == {"message": "[1, 2, 3]"}
        # and over the router's HTTP front the client still gets an answer
        status, resp = _post(base, "/html_error", {"synth_id": "t"})
        assert status == 503 and "upstream exploded" in resp["message"]
    finally:
        for s in (srv, w):
            s.shutdown()
            s.server_close()


def test_cli_route_command_forwards():
    """`python -m treemachine_spark.cli route` starts a working router
    process (no SparkSession in it — pure stdlib forwarder)."""
    import subprocess
    import sys
    import time

    w = _stub_worker("cli")
    port = w.server_address[1]
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "treemachine_spark.cli",
            "route",
            f"synth=http://127.0.0.1:{port}",
            "--port",
            "0",
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    try:
        line = proc.stdout.readline()
        assert "shard router on" in line
        base = line.split(" on ")[1].split(" ->")[0].strip()
        deadline = time.time() + 20
        status = None
        while time.time() < deadline:
            try:
                status, resp = _post(base, "/v3/tree_of_life/about", {})
                break
            except Exception:
                time.sleep(0.3)
        assert status == 200 and resp["worker"] == "cli"
    finally:
        proc.terminate()
        proc.wait(timeout=10)
        w.shutdown()
        w.server_close()


def test_failover_to_live_replica():
    """A dead replica in a pool is skipped: the request lands on the live
    one (identical snapshots -> retry is safe); 502 only when ALL are down."""
    wa, wb = _stub_worker("a"), _stub_worker("b")
    url = lambda s: f"http://127.0.0.1:{s.server_address[1]}"  # noqa: E731
    dead = url(wb)
    router = ShardRouter(pools={"t": [url(wa), dead]}, default_pool=[url(wa)])
    wb.shutdown(); wb.server_close()
    try:
        # every request succeeds regardless of which replica round-robin
        # offers first
        for _ in range(4):
            status, resp = router.forward("/v3/tree_of_life/about", {"synth_id": "t"})
            assert status == 200 and resp["worker"] == "a"
        wa.shutdown(); wa.server_close()
        status, resp = router.forward("/v3/tree_of_life/about", {"synth_id": "t"})
        assert status == 502 and "all replicas failed" in resp["message"]
    finally:
        try:
            wa.server_close()
        except Exception:
            pass


def test_admin_reload_broadcast_hits_every_distinct_worker():
    """r12: the freshness control plane — /v3/admin/reload broadcasts to
    EVERY distinct worker across pools and shard sets (deduped), reports
    the per-worker outcome, and is 200 only when all workers answered 200
    (a reload that silently skipped a worker would leave the fleet serving
    mixed snapshots)."""
    wa, wb, wc = _stub_worker("a"), _stub_worker("b"), _stub_worker("c")
    urls = [f"http://127.0.0.1:{s.server_address[1]}" for s in (wa, wb, wc)]
    try:
        router = ShardRouter(
            {"synth": [urls[0]]},
            [urls[0]],  # default pool repeats worker a: must dedupe
            ann_shards=[[urls[1]]],
            dedup_shards=[[urls[2]]],
        )
        status, resp = router.broadcast("/v3/admin/reload", {})
        assert status == 200 and resp["broadcast_ok"]
        assert sorted(resp["workers"]) == sorted(urls)  # deduped: 3 not 4
        assert all(w["status"] == 200 for w in resp["workers"].values())

        # through the HTTP front
        rsrv = make_router_server(router)
        threading.Thread(target=rsrv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{rsrv.server_address[1]}"
        status, resp = _post(base, "/v3/admin/reload", {})
        assert status == 200 and resp["broadcast_ok"]
        rsrv.shutdown()
        rsrv.server_close()

        # one worker down -> 502 overall, surviving workers' outcomes kept
        wb.shutdown()
        wb.server_close()
        status, resp = router.broadcast("/v3/admin/reload", {})
        assert status == 502 and not resp["broadcast_ok"]
        assert resp["workers"][urls[0]]["status"] == 200
        assert resp["workers"][urls[1]]["status"] == 502

        # no workers at all -> router-level 400
        status, resp = ShardRouter({}, []).broadcast("/v3/admin/reload", {})
        assert status == 400
    finally:
        for s in (wa, wc):
            s.shutdown()
            s.server_close()


def test_admin_reload_worker_contract(monkeypatch):
    """The worker side of the reload route: 404 without a hook, 400 on
    arguments, 200 with the hook's summary, 500 when the hook raises —
    and a reload through the route must not be answered from the cache."""
    from treemachine_spark.api.server import ServerCore

    monkeypatch.setattr(
        ServerCore, "_build", lambda self, s: (
            setattr(self, "store", s), setattr(self, "apis", {})
        )
    )
    core = ServerCore({}, cache_size=16)
    assert core.handle("/v3/admin/reload", {})[0] == 404

    calls = []

    def reload_fn():
        calls.append(1)
        return {"generation": len(calls)}

    core = ServerCore({}, cache_size=16, reload_fn=reload_fn)
    status, resp = core.handle("/v3/admin/reload", {})
    assert (status, resp) == (200, {"reloaded": True, "generation": 1})
    status, resp = core.handle("/v3/admin/reload", {})
    assert (status, resp) == (200, {"reloaded": True, "generation": 2})
    assert len(calls) == 2  # mutating: never served from the cache
    assert core.handle("/v3/admin/reload", {"x": 1})[0] == 400

    def boom():
        raise RuntimeError("disk gone")

    core = ServerCore({}, cache_size=16, reload_fn=boom)
    status, resp = core.handle("/v3/admin/reload", {})
    assert status == 500 and "disk gone" in resp["message"]
