"""Serving daemon (sqtpu/serve.py): protocol, batching, parity.

The server is run in-process on a background thread (same CPU jax
backend as the rest of the suite) and exercised through the real UNIX
socket with the shipped ``ServeClient`` — the full wire path, minus
only the process boundary.
"""

import threading

import numpy as np
import pytest

from sqtpu.serve import ServeClient, ServeConfig, SQServer

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    sock = str(tmp_path_factory.mktemp("serve") / "sqtpu.sock")
    cfg = ServeConfig(ckpt_dir="/nonexistent-use-random-init",
                      model="resnet_sq", socket=sock, batch_size=4,
                      batch_window_ms=10.0, image_size=64)
    srv = SQServer(cfg)  # compiles the padded-batch predict up front
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    # wait until the socket accepts connections
    import time
    for _ in range(100):
        try:
            c = ServeClient(sock)
            assert c.ping()
            c.close()
            break
        except (FileNotFoundError, ConnectionRefusedError):
            time.sleep(0.05)
    else:
        pytest.fail("server did not come up")
    yield srv, sock
    with ServeClient(sock) as c:
        c.shutdown()
    t.join(timeout=10)
    assert not t.is_alive()


def _reference_predict(srv, imgs01):
    """Direct model output for the same images (chunked like the server:
    every device call is the one compiled padded-batch shape)."""
    bs = srv.cfg.batch_size
    out = []
    for lo in range(0, len(imgs01), bs):
        chunk = imgs01[lo:lo + bs]
        batch = np.zeros((bs, 64, 64), np.float32)
        batch[: len(chunk)] = chunk
        out.append(srv._run(batch)[: len(chunk)])
    return np.concatenate(out)


def test_b64_roundtrip_matches_direct(server):
    srv, sock = server
    rng = np.random.default_rng(0)
    # uint8 payload: the wire format is exact, so parity is exact
    imgs_u8 = rng.integers(0, 255, (3, 64, 64), dtype=np.uint8)
    imgs01 = imgs_u8.astype(np.float32) / 255.0
    want = _reference_predict(srv, imgs01)
    with ServeClient(sock) as c:
        got = [c.predict(u8) for u8 in imgs_u8]
    for resp, w in zip(got, want):
        assert resp["id"] is not None
        np.testing.assert_allclose(resp["params"], w, rtol=0, atol=1e-5)
        assert len(resp["denormalized"]) == 12
        # reference de-normalization semantics: a,t scaled x255
        np.testing.assert_allclose(resp["denormalized"][0],
                                   resp["params"][0] * 255, rtol=1e-6)
        assert resp["latency_ms"] >= 0


def test_path_request(server, tmp_path):
    srv, sock = server
    from sqtpu.data.bmp import write_bmp
    img = (np.linspace(0, 255, 64 * 64).reshape(64, 64)).astype(np.uint8)
    p = tmp_path / "img.bmp"
    write_bmp(str(p), img)
    want = _reference_predict(srv, img[None].astype(np.float32) / 255.0)
    with ServeClient(sock) as c:
        resp = c.predict(str(p))
    np.testing.assert_allclose(resp["params"], want[0], atol=1e-5)


def test_concurrent_clients_batched(server):
    srv, sock = server
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (6, 64, 64), dtype=np.uint8)
    want = _reference_predict(srv, imgs.astype(np.float32) / 255.0)
    results = [None] * len(imgs)

    def worker(i):
        with ServeClient(sock) as c:
            results[i] = c.predict(imgs[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    for i, resp in enumerate(results):
        assert resp is not None, f"request {i} never answered"
        np.testing.assert_allclose(resp["params"], want[i], atol=1e-5)
    # padding invariance: whatever micro-batches formed, answers match
    # the full-batch run exactly; stats must account for every request
    with ServeClient(sock) as c:
        st = c.stats()
    assert st["requests"] >= len(imgs)
    assert 1 <= st["batches"] <= st["requests"]


def test_bad_requests(server):
    srv, sock = server
    with ServeClient(sock) as c:
        resp = c._rpc({"id": 1})  # neither path nor b64
        assert "'path' or 'b64'" in resp.get("error", "")
        # wrong payload size -> error response, connection stays usable
        resp = c._rpc({"id": 2, "b64": "AAAA"})
        assert "error" in resp
        assert c.ping()


def test_wrong_size_rejected(server):
    srv, sock = server
    with ServeClient(sock) as c:
        with pytest.raises(RuntimeError, match="expected"):
            c.predict(np.zeros((32, 32), np.uint8))


def test_batcher_survives_run_failure(server):
    """A device-level failure mid-batch must answer the in-flight
    requests with an error and leave the batcher serving (round-3
    VERDICT weak #3: it previously died silently)."""
    srv, sock = server
    real_run = srv._run
    boom = {"armed": True}

    def failing_run(batch):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected device error")
        return real_run(batch)

    srv._run = failing_run
    try:
        img = np.zeros((64, 64), np.uint8)
        with ServeClient(sock) as c:
            with pytest.raises(RuntimeError, match="inference failed"):
                c.predict(img)
            # batcher must still be alive: the next predict succeeds
            resp = c.predict(img)
            assert len(resp["params"]) == 12
            st = c.stats()
            assert st["batch_failures"] == 1
    finally:
        srv._run = real_run


def test_overload_backpressure(server):
    """When the queue is full new predicts are rejected with
    'overloaded' instead of growing memory without bound."""
    import queue as queue_mod
    import threading as th

    srv, sock = server
    real_run = srv._run
    release = th.Event()

    def stalled_run(batch):
        release.wait(timeout=30)
        return real_run(batch)

    srv._run = stalled_run
    clients = []
    try:
        import base64
        import json
        import time

        # the stalled batcher absorbs up to batch_size requests; the
        # queue holds maxsize more; everything beyond MUST bounce
        flood = srv._queue.maxsize + srv.cfg.batch_size + 2
        clients = [ServeClient(sock) for _ in range(flood)]
        img = np.zeros((64, 64), np.uint8)
        payload = base64.b64encode(img.tobytes()).decode()
        for i, c in enumerate(clients):
            c._sock.sendall((json.dumps(
                {"id": i, "b64": payload}) + "\n").encode())
        for _ in range(200):
            if srv.stats["overloaded"] >= 1:
                break
            time.sleep(0.05)
        assert srv.stats["overloaded"] >= 1
    finally:
        release.set()
        srv._run = real_run
        for c in clients:
            try:
                c.close()
            except OSError:
                pass
    # the server keeps serving after the overload burst drains
    import time

    for _ in range(200):
        if srv._queue.empty():
            break
        time.sleep(0.05)
    with ServeClient(sock) as c:
        assert c.ping()
        for _ in range(20):  # the last stalled batch may still be running
            try:
                resp = c.predict(np.zeros((64, 64), np.uint8))
                break
            except RuntimeError:
                time.sleep(0.2)
        assert len(resp["params"]) == 12


def test_live_socket_not_hijacked(server):
    """Starting a second server on a live socket must refuse, not
    silently steal the address (round-3 ADVICE)."""
    import queue as queue_mod
    import threading as th

    srv, sock = server
    srv2 = SQServer.__new__(SQServer)
    srv2.cfg = ServeConfig(socket=sock)
    srv2._queue = queue_mod.Queue(4)
    srv2._stop = th.Event()
    srv2.stats = {"requests": 0, "batches": 0, "errors": 0,
                  "overloaded": 0, "batch_failures": 0}
    with pytest.raises(SystemExit, match="already listening"):
        srv2.serve_forever()
    # the live server is unharmed
    with ServeClient(sock) as c:
        assert c.ping()


def test_stale_socket_cleaned_up(tmp_path):
    """A dead leftover socket file is unlinked and the address reused."""
    import queue as queue_mod
    import socket as socket_mod
    import threading as th

    stale = str(tmp_path / "stale.sock")
    s = socket_mod.socket(socket_mod.AF_UNIX, socket_mod.SOCK_STREAM)
    s.bind(stale)
    s.close()  # file remains, nothing listens

    srv = SQServer.__new__(SQServer)
    srv.cfg = ServeConfig(socket=stale)
    srv._queue = queue_mod.Queue(4)
    srv._stop = th.Event()
    srv._stop.set()  # exit the accept loop immediately after binding
    srv.stats = {"requests": 0, "batches": 0, "errors": 0,
                 "overloaded": 0, "batch_failures": 0}
    srv.serve_forever()  # must not raise


def test_path_trust_model():
    """'path' requests: disabled over TCP without --path-root; confined
    to the root when set (symlink-escape safe)."""
    import os

    srv = SQServer.__new__(SQServer)
    # TCP, no root -> refused
    srv.cfg = ServeConfig(socket="", path_root="")
    with pytest.raises(ValueError, match="disabled over TCP"):
        srv._resolve_path("/etc/passwd")
    # TCP with a root -> confined
    srv.cfg = ServeConfig(socket="", path_root="/tmp/imgs")
    with pytest.raises(ValueError, match="outside"):
        srv._resolve_path("/etc/passwd")
    with pytest.raises(ValueError, match="outside"):
        srv._resolve_path("/tmp/imgs/../../etc/passwd")
    assert srv._resolve_path("/tmp/imgs/a.bmp").endswith("a.bmp")
    # UNIX socket, no root -> any path (filesystem-permission trust)
    srv.cfg = ServeConfig(socket="/tmp/x.sock", path_root="")
    assert srv._resolve_path("/etc/passwd") == os.path.realpath(
        "/etc/passwd")
