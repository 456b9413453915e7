"""Load-test the serving daemon: concurrent clients, p50/p90/p99 latency.

The reference's only latency measurement is a per-image wall-clock mean
inside its eval loop (``py/test_isometry.py:47-52``) — model load + H2D
included in the first sample, single client, no percentiles. This tool
measures what a deployment cares about for ``sqtpu.serve``: end-to-end
request latency (client send -> response parsed) under K concurrent
clients, plus sustained throughput, against a live daemon.

The daemon owns the (single, tunneled) TPU; this script renders its
request images on CPU jax BEFORE spawning the server so the two never
contend for the chip.

Usage::

    python tools/serve_bench.py --ckpt artifacts/resnet_sq_c4_fp16.npz \
        --out runs/serve_bench.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def render_request_images(n: int, out_dir: str, seed: int = 0) -> list:
    """Random-SQ depth BMPs via the CPU renderer (test_random.py:34-43
    sampling), written with the byte-exact BMP codec."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sqtpu.data.bmp import write_bmp
    from sqtpu.data.synthetic import sample_params
    from sqtpu.ops.render import render_depth_hard

    key = jax.random.PRNGKey(seed)
    params = sample_params(key, n)
    render = jax.jit(jax.vmap(
        lambda p: render_depth_hard(p, 256, 30, quantize=True)))
    imgs = np.asarray(render(jnp.asarray(params)))
    paths = []
    for i in range(n):
        p = os.path.join(out_dir, f"req_{i:03d}.bmp")
        write_bmp(p, (imgs[i] * 255.0 + 0.5).astype(np.uint8))
        paths.append(p)
    return paths


def client_worker(sock_path: str, paths: list, n_requests: int,
                  latencies: list, errors: list, barrier: threading.Barrier):
    from sqtpu.serve import ServeClient

    c = ServeClient(sock_path)
    c.ping()
    barrier.wait()
    my_lat = []
    for i in range(n_requests):
        t0 = time.perf_counter()
        try:
            r = c.predict(paths[i % len(paths)])
            if "params" not in r:
                errors.append(r.get("error", "?"))
                continue
        except Exception as exc:  # noqa: BLE001 — record and continue
            errors.append(str(exc))
            continue
        my_lat.append((time.perf_counter() - t0) * 1e3)
    latencies.extend(my_lat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default="runs/serve_bench.json")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=100,
                    help="requests per client (after warmup)")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--batch-window-ms", type=float, default=2.0)
    ap.add_argument("--socket", default="/tmp/sqtpu_bench.sock")
    ap.add_argument("--platform", default="",
                    help="forwarded to the daemon (e.g. cpu for smoke runs)")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="sqtpu_serve_bench_")
    paths = render_request_images(32, tmp)
    print(f"rendered {len(paths)} request images (CPU)", flush=True)

    server = subprocess.Popen(
        [sys.executable, "-m", "sqtpu.serve", "--ckpt-dir", args.ckpt,
         "--socket", args.socket, "--batch-size", str(args.batch_size),
         "--batch-window-ms", str(args.batch_window_ms)]
        + (["--platform", args.platform] if args.platform else []),
        cwd=_REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        from sqtpu.serve import ServeClient

        # wait for the daemon to come up + compile (tunnel compiles are slow)
        deadline = time.time() + 900
        while True:
            try:
                if ServeClient(args.socket).ping():
                    break
            except (ConnectionError, OSError):
                pass
            if time.time() > deadline or server.poll() is not None:
                out = server.stdout.read() if server.stdout else ""
                raise RuntimeError(f"server did not come up:\n{out[-2000:]}")
            time.sleep(2)

        # warmup: one client touches every image path once (jit + page cache)
        warm = ServeClient(args.socket)
        t0 = time.perf_counter()
        for p in paths:
            warm.predict(p)
        print(f"warmup done ({time.perf_counter() - t0:.1f}s)", flush=True)

        latencies: list = []
        errors: list = []
        barrier = threading.Barrier(args.clients)
        threads = [threading.Thread(
            target=client_worker,
            args=(args.socket, paths[i::args.clients] or paths,
                  args.requests, latencies, errors, barrier))
            for i in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

        stats = ServeClient(args.socket).stats()
        warm.shutdown()

        latencies.sort()
        n = len(latencies)
        pct = lambda q: latencies[min(n - 1, int(q * n))] if n else None
        report = {
            "ckpt": args.ckpt,
            "clients": args.clients,
            "requests_per_client": args.requests,
            "completed": n,
            "errors": len(errors),
            "wall_s": round(wall, 3),
            "req_per_s": round(n / wall, 1) if wall else None,
            "latency_ms": {
                "p50": round(pct(0.50), 2), "p90": round(pct(0.90), 2),
                "p99": round(pct(0.99), 2), "mean": round(
                    statistics.fmean(latencies), 2) if n else None,
                "max": round(latencies[-1], 2) if n else None,
            },
            "server_stats": {k: stats.get(k) for k in
                             ("requests", "batches", "errors", "overloaded",
                              "batch_failures")},
        }
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps(report))
        if errors:
            print("sample errors:", errors[:5], file=sys.stderr)
    finally:
        if server.poll() is None:
            server.terminate()
            try:
                server.wait(timeout=30)
            except subprocess.TimeoutExpired:
                server.kill()


if __name__ == "__main__":
    main()
