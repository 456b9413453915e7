"""Fused Pallas TPU kernel for the hard (exact) depth renderer.

On-device ground-truth generation (the ``data/scanner`` replacement,
SURVEY.md §2.2-N2) is the second-hottest op after the implicit loss: the
end-to-end "online" training number renders every batch in-graph with
:func:`sqtpu.ops.render.render_depth_hard`. XLA's lowering of that
z-sweep ``lax.scan`` + bisection keeps re-materializing (S, S) slabs in
HBM and spends ~12 transcendentals per inside-outside test. This kernel:

* runs one sample per program with its 17 derived frame scalars read
  from SMEM (no param-broadcast planes needed);
* keeps the whole pixel plane as one lane-packed (S²/128, 128) VMEM
  block; the sweep + bisection are sequential ``fori_loop``s over that
  single resident block — zero HBM traffic between z-steps;
* tests inside/outside WITHOUT the outer ``^e1`` power: F^e1 ≤ 1 ⟺
  (A + B)^(e2/e1) + C ≤ 1 for positive exponents, saving 2 of the 10
  transcendentals of the full power chain (the reference's own scanner
  binary plays the same trick in ``sq::f``).

The kernel is NOT differentiable (ground-truth images are constants in
every training/eval graph; ``render_depth_hard`` remains the
differentiable path). Value-parity with the XLA renderer is tested in
tests/test_pallas_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sqtpu.ops import geometry
from sqtpu.ops import quaternion as quat

LANES = 128


def _interpret() -> bool:
    from sqtpu.ops.kernels.implicit import _interpret as _i
    return _i()


def _supported(s: int) -> bool:
    return (s * s) % LANES == 0 and s >= 16


def _kernel(s: int, n_sweep: int, n_bisect: int, par_ref, out_ref):
    rows = (s * s) // LANES
    prog = pl.program_id(0)

    # pixel lattice in the (x, y) plane layout: idx = x*s + y
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    idx = r * LANES + l
    xi = idx // s
    yi = idx - xi * s
    inv = 1.0 / (s - 1)
    X = xi.astype(jnp.float32) * inv
    Y = yi.astype(jnp.float32) * inv

    a1 = par_ref[prog, 0]
    a2 = par_ref[prog, 1]
    a3 = par_ref[prog, 2]
    ie2 = par_ref[prog, 3]      # 1/e2
    e21 = par_ref[prog, 4]      # e2/e1
    ie1 = par_ref[prog, 5]      # 1/e1
    t0 = par_ref[prog, 6]
    t1 = par_ref[prog, 7]
    t2 = par_ref[prog, 8]
    r00, r01, r02 = par_ref[prog, 9], par_ref[prog, 10], par_ref[prog, 11]
    r10, r11, r12 = par_ref[prog, 12], par_ref[prog, 13], par_ref[prog, 14]
    r20, r21, r22 = par_ref[prog, 15], par_ref[prog, 16], par_ref[prog, 17]
    z_hi = par_ref[prog, 18]
    step = par_ref[prog, 19]

    # loop-invariant per-pixel partial body coordinates (z terms added
    # per z-step): u = (R·[X,Y,z] − t_rot) / a
    ux = (r00 * X + r01 * Y - t0) / a1
    vy = (r10 * X + r11 * Y - t1) / a2
    wz = (r20 * X + r21 * Y - t2) / a3
    cux, cvy, cwz = r02 / a1, r12 / a2, r22 / a3

    tiny = jnp.float32(1.1754944e-38)

    def inside(z):
        """F ≤ 1 test without the outer ^e1 (monotone equivalent)."""
        u = ux + cux * z
        v = vy + cvy * z
        w = wz + cwz * z
        A = jnp.exp(jnp.log(u * u + tiny) * ie2)
        B = jnp.exp(jnp.log(v * v + tiny) * ie2)
        C = jnp.exp(jnp.log(w * w + tiny) * ie1)
        E = jnp.exp(jnp.log(A + B + tiny) * e21)
        return E + C <= 1.0

    # coarse sweep far -> near: first inside slab is max-z. The carry is
    # ONE f32 plane with -1 as the "not found yet" sentinel (z is always
    # >= 0 here); an i1 carry plane trips a Mosaic layout bug.
    def sweep(j, z_in):
        z = z_hi - j.astype(jnp.float32) * step
        ins = inside(z)
        return jnp.where(ins & (z_in < 0.0), z, z_in)

    z_in = jax.lax.fori_loop(
        0, n_sweep, sweep, jnp.full((rows, LANES), -1.0, jnp.float32))
    hit = z_in >= 0.0
    z_in = jnp.maximum(z_in, 0.0)

    # bisection between the inside slab and the one above it (outside)
    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        ins = inside(mid)
        return jnp.where(ins, mid, lo), jnp.where(ins, hi, mid)

    lo, _ = jax.lax.fori_loop(0, n_bisect, bisect, (z_in, z_in + step))
    out_ref[0] = jnp.where(hit, lo, 0.0)


@functools.partial(jax.jit, static_argnames=("image_size", "n_sweep",
                                             "n_bisect", "quantize"))
def render_depth_hard_pallas(
    p: jax.Array,
    image_size: int = 256,
    n_sweep: int = 48,
    n_bisect: int = 12,
    quantize: bool = True,
) -> jax.Array:
    """Batched fused hard render: (B, 12) params -> (B, S, S) depth maps.

    Same camera model / conventions as :func:`render_depth_hard`
    (orthographic −z, col = x, row-from-bottom = y, value = max surface
    z, background 0); non-differentiable.
    """
    s = image_size
    assert _supported(s), f"image_size {s} needs S² divisible by {LANES}"
    b = p.shape[0]
    rows = (s * s) // LANES
    dtype = jnp.float32

    a, e, t, q = geometry.split_params(p.astype(dtype))
    rot = quat.to_matrix(quat.conjugate(q))              # (B, 3, 3)
    tr = jnp.einsum("bij,bj->bi", rot, t)
    # z support window of the body box [-a, a] — shared with the XLA
    # renderer so the two sweeps stay bit-coupled (byte-parity contract)
    _, z_hi, step = geometry.z_support_window(a, rot, t, n_sweep, dtype)

    par = jnp.concatenate([
        a,                                   # 0..2
        (1.0 / e[:, 1])[:, None],            # 3: 1/e2
        (e[:, 1] / e[:, 0])[:, None],        # 4: e2/e1
        (1.0 / e[:, 0])[:, None],            # 5: 1/e1
        tr,                                  # 6..8
        rot.reshape(b, 9),                   # 9..17
        z_hi[:, None], step[:, None],        # 18, 19
        jnp.zeros((b, 4), dtype),            # pad to 24
    ], axis=-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,               # par in SMEM, indexed by pid
        grid=(b,),
        in_specs=[],
        out_specs=pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    depth = pl.pallas_call(
        functools.partial(_kernel, s, n_sweep, n_bisect),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, LANES), dtype),
        interpret=_interpret(),
    )(par)

    depth = depth.reshape(b, s, s)           # (B, x, y)
    if quantize:
        depth = jnp.floor(depth * 255.0) / 255.0
    # (x, y) -> image rows/cols: row = s-1-y, col = x
    return jnp.flip(jnp.swapaxes(depth, -1, -2), axis=-2)
