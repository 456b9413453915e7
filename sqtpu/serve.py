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
"""

from __future__ import annotations

import base64
import json
import os
import queue
import socket
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


class _Request:
    __slots__ = ("conn", "rid", "img", "t0")

    def __init__(self, conn, rid, img, t0):
        self.conn, self.rid, self.img, self.t0 = conn, rid, img, t0


class SQServer:
    """Resident-model inference server (see module docstring)."""

    def __init__(self, cfg: ServeConfig):
        self.cfg = cfg
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._lock = threading.Lock()  # serializes per-conn sendall
        self.stats = {"requests": 0, "batches": 0, "errors": 0}
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

    def _decode_image(self, msg: dict) -> np.ndarray:
        s = self.cfg.image_size
        if "path" in msg:
            from sqtpu.data.bmp import read_bmp
            img = read_bmp(msg["path"]).astype(np.float32) / 255.0
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

    def _send(self, conn, obj: dict):
        data = (json.dumps(obj) + "\n").encode()
        with self._lock:
            try:
                conn.sendall(data)
            except OSError:
                pass  # client went away; nothing to do

    # ---- connection handling ----------------------------------------

    def _serve_conn(self, conn):
        f = conn.makefile("rb")
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
                    self._queue.put(_Request(conn, msg.get("id"), img,
                                             time.perf_counter()))
        finally:
            f.close()
            conn.close()

    def _accept_loop(self, sock):
        sock.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _ = sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            threading.Thread(target=self._serve_conn, args=(conn,),
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
                resp = {"id": r.rid, "params": [float(v) for v in p],
                        "batch": len(reqs),
                        "latency_ms": round((now - r.t0) * 1e3, 2)}
                if cfg.denormalize:
                    from sqtpu.data.labels import denormalize_torch
                    resp["denormalized"] = [
                        float(v) for v in denormalize_torch(p)]
                self._send(r.conn, resp)

    # ---- lifecycle ----------------------------------------------------

    def serve_forever(self):
        cfg = self.cfg
        if cfg.socket:
            if os.path.exists(cfg.socket):
                os.unlink(cfg.socket)
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
