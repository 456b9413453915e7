"""Drop-in CLI replacement for the reference ``data/scanner`` binary.

Same 18-argument contract (SURVEY.md §2.2-N2, verified black-box)::

    python -m sqtpu.scan out.bmp a1 a2 a3 e1 e2 px py pz r11 r12 ... r33

sizes/positions in 0..255 world units, 3x3 rotation matrix row-major.
Output: 256x256 24-bit grayscale BMP, byte-compatible layout, pixel =
max surface z (integer), background = 0 — rendered by the JAX hard
ray-caster instead of C++ (99.99% byte-equal on the reference examples;
see tests/test_render.py).

Every reference script that shells out to the scanner
(``torch/helpers.py:27-39``, ``test_random.py:41``) works unmodified with
``scanner`` pointed at this module (or at the native C++ build in
``native/``, which has no Python/JAX startup cost).
"""

from __future__ import annotations

import sys

import numpy as np


USAGE = ("usage: sqtpu.scan out.bmp a1 a2 a3 e1 e2 px py pz "
         "r11 r12 r13 r21 r22 r23 r31 r32 r33")


def render_from_cli_args(args: list[str]) -> tuple[str, np.ndarray]:
    if len(args) != 18:
        raise SystemExit(USAGE)
    out_path = args[0]
    vals = np.asarray([float(v) for v in args[1:]], dtype=np.float64)
    a, e, t = vals[0:3], vals[3:5], vals[5:8]
    M = vals[8:17].reshape(3, 3)

    import jax

    jax.config.update("jax_platforms", "cpu")  # CLI latency > tunnel compile
    import jax.numpy as jnp

    from sqtpu.ops import quaternion as quat
    from sqtpu.ops.render import render_depth_hard

    q = np.asarray(quat.from_matrix(jnp.asarray(M)))
    p = jnp.asarray(np.concatenate([a / 255.0, e, t / 255.0, q]))
    depth = np.asarray(render_depth_hard(p, 256, n_bisect=30, quantize=True))
    return out_path, (depth * 255.0).astype(np.uint8)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    out_path, img = render_from_cli_args(argv)
    from sqtpu.data.bmp import write_bmp

    write_bmp(out_path, img)


if __name__ == "__main__":
    main()
