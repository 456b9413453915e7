"""Production serving daemon: persistent model, micro-batched inference.

The reference has no serving story — its only inference entries are the
one-shot scripts ``torch/test.py:14-47`` (load checkpoint, predict one
BMP, exit) and the bulk loops in ``torch/test_random.py``. Every call
pays model load + CUDA init. A deployed recovery service wants the
opposite: load and jit-compile ONCE, keep the model resident on the
TPU, and amortize per-request overhead by micro-batching concurrent
requests into a single fixed-shape device call (one compiled program
serves every batch size via padding — no recompiles, ever).

Protocol: newline-delimited JSON over a UNIX domain socket (default)
or localhost TCP. Requests::

    {"id": 7, "path": "/abs/depth.bmp"}          # read a BMP from disk
    {"id": 8, "b64": "<base64 uint8 H*W>"}       # raw depth bytes inline
    {"cmd": "ping"}                              # liveness -> {"ok": true}
    {"cmd": "stats"}                             # counters
    {"cmd": "shutdown"}                          # drain and exit

Responses carry the normalized 12-vector and the reference-unit
de-normalization (``torch/test.py:40-44`` semantics)::

    {"id": 7, "params": [..12..], "denormalized": [..12..],
     "batch": 3, "latency_ms": 4.1}

Usage::

    python -m sqtpu.serve --ckpt-dir artifacts/resnet_sq_robust_fp16.npz \
        --socket /tmp/sqtpu.sock --batch-size 64 --refine lm

    # from another process
    from sqtpu.serve import ServeClient
    params = ServeClient("/tmp/sqtpu.sock").predict("depth.bmp")

Batching model: one acceptor thread per listener, one reader thread per
connection feeding a shared queue, and a single batcher thread that
drains up to ``batch_size`` requests (waiting at most
``batch_window_ms`` after the first) and runs them as one padded device
call — all jax calls happen on the batcher thread only.

Hardening contract:

- The request queue is bounded (``queue_factor * batch_size``); when it
  is full new predict requests are rejected immediately with
  ``{"error": "overloaded"}`` instead of growing memory without limit.
- A batch-level failure (device error, encode error) answers every
  in-flight request in that batch with an error and the batcher keeps
  serving; it never dies silently.
- Sends use a per-connection lock plus an OS send timeout
  (``send_timeout_s`` via SO_SNDTIMEO): one slow client can stall only
  its own responses — on timeout its connection is dropped, never the
  batcher or other clients.
- Trust model: a UNIX socket is as trusted as its filesystem
  permissions, so ``{"path": ...}`` requests read any file the daemon
  user can. Over TCP, ``path`` requests are refused unless
  ``--path-root DIR`` confines them to a directory subtree (resolved
  via realpath, symlink-escape safe). Exception details from request
  handling are logged server-side; clients get sanitized strings.
- Startup refuses to steal a live server's UNIX socket: an existing
  socket path is probed with a connect first and only a dead/stale
  socket is unlinked.
"""

from __future__ import annotations

import base64
import json
import os
import queue
import socket
import struct
import threading
import time
from dataclasses import dataclass

import numpy as np

from sqtpu.utils.config import parse_cli


@dataclass
class ServeConfig:
    ckpt_dir: str = "checkpoints/run0"  # Orbax run dir or portable .npz
    model: str = "resnet_sq"
    socket: str = "/tmp/sqtpu.sock"   # UNIX socket path ("" -> TCP)
    host: str = "127.0.0.1"           # TCP fallback when socket == ""
    port: int = 7341
    batch_size: int = 64              # max micro-batch (= compiled shape)
    batch_window_ms: float = 2.0      # wait after the 1st queued request
    image_size: int = 256
    denormalize: bool = True          # include reference-unit params
    refine: str = "none"              # none | lm | gd | lm+gd
    refine_steps: int = 30
    refine_size: int = 64
    refine_lr: float = 3e-3
    refine_robust_c: float = 0.0
    refine_filter: str = "none"
    refine_residual: str = "sb"
    input_filter: str = "none"        # none | despeckle | median
    platform: str = ""                # override jax platform (e.g. "cpu")
    queue_factor: int = 4             # queue bound = factor * batch_size
    send_timeout_s: float = 10.0      # per-conn SO_SNDTIMEO (0 = none)
    path_root: str = ""               # confine 'path' requests (TCP: required)


class _Conn:
    """A client connection plus its send lock (sends are serialized per
    CONNECTION, not globally — a stalled peer blocks only itself)."""

    __slots__ = ("sock", "lock")

    def __init__(self, sock):
        self.sock, self.lock = sock, threading.Lock()


class _Request:
    __slots__ = ("conn", "rid", "img", "t0")

    def __init__(self, conn, rid, img, t0):
        self.conn, self.rid, self.img, self.t0 = conn, rid, img, t0


class SQServer:
    """Resident-model inference server (see module docstring)."""

    def __init__(self, cfg: ServeConfig):
        self.cfg = cfg
        self._queue: "queue.Queue[_Request]" = queue.Queue(
            maxsize=max(1, cfg.queue_factor) * cfg.batch_size)
        self._stop = threading.Event()
        self.stats = {"requests": 0, "batches": 0, "errors": 0,
                      "overloaded": 0, "batch_failures": 0}
        self._build()

    # ---- model -----------------------------------------------------

    def _build(self):
        import jax
        import jax.numpy as jnp

        from sqtpu.evaluate import load_eval_state, predict

        cfg = self.cfg
        model, state = load_eval_state(cfg)  # duck-typed like predict.py
        step = jax.jit(lambda imgs: predict(model, state, imgs))
        if cfg.refine != "none":
            from sqtpu.fit import refine_params
            refine = jax.jit(lambda imgs, p: refine_params(
                imgs, p, method=cfg.refine, steps=cfg.refine_steps,
                n=cfg.refine_size, lr=cfg.refine_lr,
                robust_c=cfg.refine_robust_c, prefilter=cfg.refine_filter,
                residual=cfg.refine_residual))

        def run(batch_np: np.ndarray) -> np.ndarray:
            x = jnp.asarray(batch_np)[..., None]
            if cfg.input_filter != "none":
                from sqtpu.fit import apply_prefilter
                x = apply_prefilter(x[..., 0], cfg.input_filter)[..., None]
            p = step(x)
            if cfg.refine != "none":
                p = refine(x[..., 0], p)
            return np.asarray(p)

        self._run = run
        # pay the compile before accepting traffic: the first real
        # request must not eat a multi-second (tunnel: multi-minute) jit
        warm = np.zeros((cfg.batch_size, cfg.image_size, cfg.image_size),
                        np.float32)
        self._run(warm)

    # ---- request decoding -------------------------------------------

    def _resolve_path(self, path: str) -> str:
        """Apply the trust model for 'path' requests (module docstring):
        TCP requires --path-root; a configured root confines reads to
        that subtree (realpath, so symlinks can't escape)."""
        cfg = self.cfg
        if not cfg.socket and not cfg.path_root:
            raise ValueError(
                "'path' requests are disabled over TCP; send 'b64' "
                "or start the server with --path-root")
        real = os.path.realpath(path)
        if cfg.path_root:
            root = os.path.realpath(cfg.path_root)
            if not (real == root or real.startswith(root + os.sep)):
                raise ValueError("path is outside the configured root")
        return real

    def _decode_image(self, msg: dict) -> np.ndarray:
        s = self.cfg.image_size
        if "path" in msg:
            from sqtpu.data.bmp import read_bmp
            path = self._resolve_path(str(msg["path"]))
            try:
                img = read_bmp(path).astype(np.float32) / 255.0
            except Exception as e:
                # don't echo raw exception internals (paths, errno
                # strings) back over the wire; log them server-side
                print(f"sqtpu.serve: read failed for {path!r}: {e}",
                      flush=True)
                raise ValueError("could not read image") from None
        elif "b64" in msg:
            raw = np.frombuffer(base64.b64decode(msg["b64"]), np.uint8)
            if raw.size != s * s:
                raise ValueError(
                    f"b64 payload has {raw.size} bytes, expected {s * s}")
            img = raw.reshape(s, s).astype(np.float32) / 255.0
        else:
            raise ValueError("request needs 'path' or 'b64'")
        if img.shape != (s, s):
            raise ValueError(f"image is {img.shape}, expected {(s, s)}")
        return img

    def _send(self, conn: _Conn, obj: dict):
        data = (json.dumps(obj) + "\n").encode()
        with conn.lock:
            try:
                conn.sock.sendall(data)
            except OSError:
                # client went away, or SO_SNDTIMEO fired on a stalled
                # peer: drop the response and the connection — never
                # stall the caller (possibly the batcher) on one client
                try:
                    conn.sock.close()
                except OSError:
                    pass

    # ---- connection handling ----------------------------------------

    def _serve_conn(self, conn: _Conn):
        f = conn.sock.makefile("rb")
        try:
            for line in f:
                if self._stop.is_set():
                    break
                line = line.strip()
                if not line:
                    continue
                try:
                    msg = json.loads(line)
                except json.JSONDecodeError as e:
                    self.stats["errors"] += 1
                    self._send(conn, {"error": f"bad json: {e}"})
                    continue
                cmd = msg.get("cmd")
                if cmd == "ping":
                    self._send(conn, {"ok": True})
                elif cmd == "stats":
                    self._send(conn, {"ok": True, **self.stats})
                elif cmd == "shutdown":
                    self._send(conn, {"ok": True, "shutting_down": True})
                    self._stop.set()
                    break
                else:
                    try:
                        img = self._decode_image(msg)
                    except Exception as e:  # bad request, keep serving
                        self.stats["errors"] += 1
                        self._send(conn, {"id": msg.get("id"),
                                          "error": str(e)})
                        continue
                    req = _Request(conn, msg.get("id"), img,
                                   time.perf_counter())
                    try:
                        self._queue.put_nowait(req)
                    except queue.Full:  # backpressure: reject, don't grow
                        self.stats["overloaded"] += 1
                        self._send(conn, {"id": msg.get("id"),
                                          "error": "overloaded"})
        finally:
            f.close()
            conn.sock.close()

    def _accept_loop(self, sock):
        sock.settimeout(0.2)
        while not self._stop.is_set():
            try:
                raw, _ = sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            if self.cfg.send_timeout_s > 0:
                # send timeout only (SO_SNDTIMEO) — reads stay blocking
                sec = int(self.cfg.send_timeout_s)
                usec = int((self.cfg.send_timeout_s - sec) * 1e6)
                raw.setsockopt(socket.SOL_SOCKET, socket.SO_SNDTIMEO,
                               struct.pack("ll", sec, usec))
            threading.Thread(target=self._serve_conn, args=(_Conn(raw),),
                             daemon=True).start()

    # ---- the batcher (single jax thread) -----------------------------

    def _batch_loop(self):
        cfg = self.cfg
        while not self._stop.is_set() or not self._queue.empty():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            reqs = [first]
            deadline = time.perf_counter() + cfg.batch_window_ms / 1e3
            while len(reqs) < cfg.batch_size:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    reqs.append(self._queue.get(timeout=left))
                except queue.Empty:
                    break
            # a device/encode failure must answer every in-flight
            # request and leave the batcher alive — it is the only
            # thread allowed to touch jax, so its death would hang
            # every future predict while ping/stats still answer
            try:
                batch = np.zeros(
                    (cfg.batch_size, cfg.image_size, cfg.image_size),
                    np.float32)
                for i, r in enumerate(reqs):
                    batch[i] = r.img
                params = self._run(batch)[: len(reqs)]
                self.stats["batches"] += 1
                self.stats["requests"] += len(reqs)
                now = time.perf_counter()
                for r, p in zip(reqs, params):
                    resp = {"id": r.rid,
                            "params": [float(v) for v in p],
                            "batch": len(reqs),
                            "latency_ms": round((now - r.t0) * 1e3, 2)}
                    if cfg.denormalize:
                        from sqtpu.data.labels import denormalize_torch
                        resp["denormalized"] = [
                            float(v) for v in denormalize_torch(p)]
                    self._send(r.conn, resp)
            except Exception as e:
                self.stats["batch_failures"] += 1
                self.stats["errors"] += len(reqs)
                print(f"sqtpu.serve: batch failed: {e!r}", flush=True)
                for r in reqs:
                    self._send(r.conn, {"id": r.rid,
                                        "error": "inference failed"})

    # ---- lifecycle ----------------------------------------------------

    def serve_forever(self):
        cfg = self.cfg
        if cfg.socket:
            if os.path.exists(cfg.socket):
                # refuse to hijack a LIVE server's address; only a
                # stale socket (nothing answering) is cleaned up
                probe = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
                probe.settimeout(1.0)
                try:
                    probe.connect(cfg.socket)
                except OSError:
                    os.unlink(cfg.socket)  # dead leftover
                else:
                    probe.close()
                    raise SystemExit(
                        f"sqtpu.serve: a server is already listening on "
                        f"{cfg.socket}; shut it down or pick another "
                        f"--socket")
                finally:
                    probe.close()
            sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            sock.bind(cfg.socket)
            where = cfg.socket
        else:
            sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            sock.bind((cfg.host, cfg.port))
            where = f"{cfg.host}:{cfg.port}"
        sock.listen(128)
        batcher = threading.Thread(target=self._batch_loop, daemon=True)
        batcher.start()
        print(f"sqtpu.serve: model {cfg.model} ready on {where} "
              f"(batch<= {cfg.batch_size}, window {cfg.batch_window_ms} ms,"
              f" refine={cfg.refine})", flush=True)
        try:
            self._accept_loop(sock)
        finally:
            self._stop.set()
            batcher.join(timeout=5.0)
            sock.close()
            if cfg.socket and os.path.exists(cfg.socket):
                os.unlink(cfg.socket)


class ServeClient:
    """Minimal blocking client for :class:`SQServer`.

    ``address`` is a UNIX socket path or a ``(host, port)`` tuple.
    """

    def __init__(self, address):
        if isinstance(address, str):
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        else:
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.connect(address)
        self._file = self._sock.makefile("rb")
        self._next_id = 0

    def _rpc(self, msg: dict) -> dict:
        self._sock.sendall((json.dumps(msg) + "\n").encode())
        line = self._file.readline()
        if not line:
            raise ConnectionError("server closed the connection")
        return json.loads(line)

    def ping(self) -> bool:
        return bool(self._rpc({"cmd": "ping"}).get("ok"))

    def stats(self) -> dict:
        return self._rpc({"cmd": "stats"})

    def shutdown(self):
        try:
            self._rpc({"cmd": "shutdown"})
        except ConnectionError:
            pass

    def predict(self, image) -> dict:
        """``image`` = BMP path (str) or (H, W) array in [0, 1] / uint8.
        Returns the full response dict (``params`` = normalized 12-vec).
        """
        self._next_id += 1
        if isinstance(image, str):
            msg = {"id": self._next_id, "path": os.path.abspath(image)}
        else:
            arr = np.asarray(image)
            if arr.dtype != np.uint8:
                arr = np.clip(np.asarray(arr, np.float32) * 255.0,
                              0, 255).astype(np.uint8)
            msg = {"id": self._next_id,
                   "b64": base64.b64encode(arr.tobytes()).decode()}
        resp = self._rpc(msg)
        if "error" in resp:
            raise RuntimeError(resp["error"])
        return resp

    def close(self):
        self._file.close()
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def main(argv=None):
    cfg = parse_cli(ServeConfig, argv)
    if cfg.platform:
        import jax
        jax.config.update("jax_platforms", cfg.platform)
    SQServer(cfg).serve_forever()


if __name__ == "__main__":
    main()
