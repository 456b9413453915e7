"""Fused Pallas TPU kernel for the explicit loss (occupancy-grid MSE).

The explicit loss (``/root/reference/torch/classes.py:109-201``) compares
sigmoid(5·(1−F)) occupancies of the TRUE and PREDICTED superquadric on
the (N+1)³ explicit grid (quirk Q1) and takes MSE ×100 (quirk Q3). It is
the flagship training recipe's geometry term (``--loss explicit_sym``).

Why a kernel: the jnp path's forward is fine (XLA fuses the separable-
grid field into one elementwise pass), but its AUTODIFF backward
materializes every (N+1)³ fp32 intermediate of the exponent chain in
HBM — measured 250 ms @64³ (16× the 16 ms forward) and 805 ms @96³ at
batch 256 on v5e. This kernel evaluates both occupancies plane-by-plane
in VMEM and accumulates the analytic gradient w.r.t. the 17 derived
frame params (same dF chain as the implicit kernel —
:func:`sqtpu.ops.kernels.implicit._frame_grad_step`), so HBM traffic is
params in, scalars out; no volume ever exists.

Under differentiation the loss and its gradient come from ONE fused
sweep (``_fused_kernel``): the explicit loss is pointwise, so the
gradient needs no completed-sweep state (unlike the implicit loss's
L1-vs-depth sign) and the per-sample upstream cotangent is a scalar
applied outside the kernel. This shares the two field evaluations per
point between loss and gradient — 26 transcendentals/point instead of
the 48 a separate fwd+bwd pair costs — and makes the training-path
sweep count 1 instead of 2. The undifferentiated (eval) path keeps the
cheaper loss-only sweep (22/point).

Unlike the implicit grid (N² divisible by 128), the explicit plane has
(N+1)² points — not lane-aligned — so planes are padded to a multiple of
128 and masked: padded lanes contribute 0 to the loss and the gradient.

Gradient contract: the TRUE side gets NO gradient (the wrapper applies
``stop_gradient``) — labels are constants in every consumer (training
losses, ``fit.gd_fit``'s fixed target, eval). Consumers needing d/d true
must use :func:`sqtpu.ops.losses.explicit_loss` (XLA autodiff).

Bounded z-sweep (``z_window=True``, the default): far from both SQs the
two occupancies are saturated near-constants, so lattice planes outside
the union of the two SQs' z-support boxes (h = Σᵢ|rotᵢ₂|·aᵢ around t_z —
the same window :func:`sqtpu.ops.geometry.z_support_window` gives the
hard renderer, kernels/hardrender.py:147-149) plus a ``z_margin`` are
skipped. Evaluated planes stay EXACTLY on the reference lattice j/N, so
the windowed loss is the full loss minus the skipped planes' tiny tail
contributions (measured ≤3e-5 relative value / ≤5e-4 abs gradient at
the default margin). Windowed runs use ONE SAMPLE PER PROGRAM
(tile_b=1): the dynamic ``fori_loop(j_lo, j_hi+1)`` bounds ARE the
sample's window — no in-loop masks, no cross-sample window unions, and
(N+1)-independent VMEM (measured: masking planes at tile_b>1 pushed
n≥128 over the 16 MB scoped-VMEM cliff into spills). Windows are
piecewise-constant in the params, so their a.e.-gradient is zero —
they are computed under ``stop_gradient``. Exact full-sweep parity with
:func:`sqtpu.ops.losses.explicit_loss` is available via
``z_window=False`` (used by the golden-parity tests), which keeps the
multi-sample tiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sqtpu.ops import geometry
from sqtpu.ops import quaternion as quat
from sqtpu.ops.kernels.implicit import (
    LANES, N_PAR, _field_terms, _frame_grad_step, _frame_params,
    _interpret, _max_batch, _occ, _param_planes,
)

SHARP = 5.0  # explicit occupancy sharpness (classes.py:187, quirk Q2)
# The fused value+grad sweep adds a (B, 24) SMEM gradient output on top
# of the implicit kernel's (params-in, loss-out) SMEM layout; batch 512
# exceeds v5e's 1 MB SMEM envelope by 144 B (measured: remote compile
# "Ran out of memory in memory space smem" at B=512), so explicit
# pallas_calls chunk at 256 regardless of SQTPU_KERNEL_MAX_BATCH.
# Throughput is flat in batch (README bench sweep), so chunking is free.
_FUSED_MAX_BATCH = 256
Z_MARGIN = 0.08  # default window margin in normalized z units
# param-slot indices (within the (B, 24) SMEM layout) carrying the
# per-sample window bounds as float lattice indices; slots 17..23 are
# zero-padding in _frame_params, unread by any kernel math
SLOT_JLO, SLOT_JHI = 17, 18


def _rows(n: int) -> int:
    m = n + 1
    return -(-(m * m) // LANES)  # ceil


def _supported(n: int) -> bool:
    return n >= 8


def _tile_b(batch: int, n: int) -> int:
    """Samples per program: divide the batch AND keep the fused sweep's
    18 accumulator planes within ~3 MB of VMEM (the per-iteration field
    temporaries scale with the same tile_rows; 4 MB of accumulators put
    n=160's total scoped stack at 16.5 MB > the 16 MB limit)."""
    rows = _rows(n)
    budget = 3 * 1024 * 1024
    for t in (8, 4, 2):
        if batch % t == 0 and (N_PAR + 1) * t * rows * LANES * 4 <= budget:
            return t
    return 1


def _plane_coords(n: int, tile_rows: int, rows: int):
    """Lane-packed (tile_rows, 128) x/y coordinates on the EXPLICIT axis
    (value j/N for j = 0..N, zero nudged to 1e-4 — geometry.make_axis
    'explicit'), plus the padding mask (1.0 on real grid points)."""
    m = n + 1
    r = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    idx = (r % rows) * LANES + l
    valid = (idx < m * m).astype(jnp.float32)
    idx = jnp.minimum(idx, m * m - 1)
    xi = idx // m
    yi = idx - xi * m
    inv = 1.0 / n
    X = jnp.where(xi == 0, 1e-4, xi.astype(jnp.float32) * inv)
    Y = jnp.where(yi == 0, 1e-4, yi.astype(jnp.float32) * inv)
    return X, Y, valid


def _zval(j, n: int):
    inv = 1.0 / n
    return jnp.where(j == 0, jnp.float32(1e-4), j.astype(jnp.float32) * inv)


def _tile_bounds(par_ref, prog, tile_b: int):
    """Union z-lattice bounds [lo, hi] over the program's tile. Windowed
    runs use tile_b=1, so the union IS the sample's own window and the
    swept planes need no further masking; full-sweep runs carry [0, n]
    in every sample's slots, so the union is [0, n] for any tiling."""
    lo = par_ref[prog * tile_b, SLOT_JLO]
    hi = par_ref[prog * tile_b, SLOT_JHI]
    for k in range(1, tile_b):
        lo = jnp.minimum(lo, par_ref[prog * tile_b + k, SLOT_JLO])
        hi = jnp.maximum(hi, par_ref[prog * tile_b + k, SLOT_JHI])
    return lo.astype(jnp.int32), hi.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(n: int, tile_b: int, sharp: float, par_t_ref, par_p_ref,
                out_ref):
    rows = _rows(n)
    prog = pl.program_id(0)
    tile_rows = tile_b * rows
    X, Y, valid = _plane_coords(n, tile_rows, rows)
    pp_t = _param_planes(par_t_ref, prog, tile_b, rows)
    pp_p = _param_planes(par_p_ref, prog, tile_b, rows)
    lo, hi = _tile_bounds(par_p_ref, prog, tile_b)

    def body(j, acc):
        z = _zval(j, n)
        occ_t = _occ(_field_terms(pp_t, X, Y, z)["F"], sharp)
        occ_p = _occ(_field_terms(pp_p, X, Y, z)["F"], sharp)
        d = (occ_t - occ_p) * valid
        return acc + d * d

    zero = jnp.zeros((tile_rows, LANES), jnp.float32)
    acc = jax.lax.fori_loop(lo, hi + 1, body, zero)
    for k in range(tile_b):
        out_ref[prog * tile_b + k, 0] = jnp.sum(
            acc[k * rows:(k + 1) * rows])


def _fused_kernel(n: int, tile_b: int, sharp: float, par_t_ref, par_p_ref,
                  loss_ref, dpar_ref, acc_scr):
    """ONE sweep computing the loss AND its (B, 17) frame gradient.

    The explicit loss is pointwise — each plane's gradient contribution
    needs nothing from later planes (unlike the implicit loss, whose L1
    sign depends on the completed depth) — so training never needs the
    separate fwd+bwd sweeps: the two field evaluations per point (true +
    pred, 2×11 transcendentals) are shared between the loss and the
    gradient, cutting the per-point transcendental count from 48
    (22 fwd + 26 bwd) to 26. The upstream cotangent is applied OUTSIDE
    the kernel (a (B,)·(B,24) multiply) since the per-sample loss is a
    scalar. acc_scr plane N_PAR accumulates the squared difference."""
    rows = _rows(n)
    prog = pl.program_id(0)
    tile_rows = tile_b * rows
    X, Y, valid = _plane_coords(n, tile_rows, rows)
    pp_t = _param_planes(par_t_ref, prog, tile_b, rows)
    pp_p = _param_planes(par_p_ref, prog, tile_b, rows)

    acc_scr[:] = jnp.zeros((N_PAR + 1, tile_rows, LANES), jnp.float32)
    lo, hi = _tile_bounds(par_p_ref, prog, tile_b)

    def body(j, carry):
        z = _zval(j, n)
        occ_t = _occ(_field_terms(pp_t, X, Y, z)["F"], sharp)
        T = _field_terms(pp_p, X, Y, z)
        occ_p = _occ(T["F"], sharp)
        d = (occ_t - occ_p) * valid
        acc_scr[N_PAR] += d * d
        # d (occ_t - occ_p)² / dF_p = 2(occ_t-occ_p)·sharp·occ_p(1-occ_p)
        gF = valid * 2.0 * (occ_t - occ_p) * sharp * occ_p * (1.0 - occ_p)
        _frame_grad_step(acc_scr, T, gF, pp_p, X, Y, z)
        return carry

    jax.lax.fori_loop(lo, hi + 1, body, 0)

    for k in range(tile_b):
        loss_ref[prog * tile_b + k, 0] = jnp.sum(
            acc_scr[N_PAR, k * rows:(k + 1) * rows])
        for i in range(N_PAR):
            dpar_ref[prog * tile_b + k, i] = jnp.sum(
                acc_scr[i, k * rows:(k + 1) * rows])
        for i in range(N_PAR, 24):
            dpar_ref[prog * tile_b + k, i] = 0.0


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp
# ---------------------------------------------------------------------------

def _fwd_call(par_t, par_p, n: int, tile_b: int, sharp: float):
    b = par_p.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # par_t, par_p (B, 24) ride SMEM
        grid=(b // tile_b,),
        in_specs=[],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),  # full (B, 1)
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n, tile_b, sharp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        interpret=_interpret(),
    )(par_t, par_p)[:, 0]


def _fused_call(par_t, par_p, n: int, tile_b: int, sharp: float):
    b = par_p.shape[0]
    rows = _rows(n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # par_t, par_p (B, 24) ride SMEM
        grid=(b // tile_b,),
        in_specs=[],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # loss sums (B, 1)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dpar (B, 24)
        ],
        scratch_shapes=[
            pltpu.VMEM((N_PAR + 1, tile_b * rows, LANES), jnp.float32),
        ],
    )
    sums, dpar = pl.pallas_call(
        functools.partial(_fused_kernel, n, tile_b, sharp),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 24), jnp.float32),
        ],
        interpret=_interpret(),
    )(par_t, par_p)
    return sums[:, 0], dpar


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _core(par_t, par_p, n, tile_b, sharp):
    # primal (inference/eval) path: loss-only sweep, no gradient work
    return _fwd_call(par_t, par_p, n, tile_b, sharp)


def _core_fwd(par_t, par_p, n, tile_b, sharp):
    # differentiated path: ONE fused sweep emits the loss and the raw
    # (B, 24) frame gradient; the residual is those 24 floats/sample
    sums, dpar = _fused_call(par_t, par_p, n, tile_b, sharp)
    return sums, dpar


def _core_bwd(n, tile_b, sharp, res, g):
    dpar = res
    # the true side is stop_gradient'ed by the wrapper (see module doc)
    return jnp.zeros_like(dpar), g[:, None] * dpar


_core.defvjp(_core_fwd, _core_bwd)


def z_window_indices(true_p: jax.Array, pred_p: jax.Array, n: int,
                     margin: float = Z_MARGIN):
    """Per-sample lattice window [j_lo, j_hi] covering the union of the
    two (clamped) SQs' z-support boxes ± ``margin``, as float32 indices.
    Piecewise-constant in the params → computed under stop_gradient."""
    def win(p):
        pp = geometry.clamp_params(p.astype(jnp.float32))
        a, e, t, q = geometry.split_params(pp)
        rot = quat.to_matrix(quat.conjugate(q))
        zlo, zhi, _ = geometry.z_support_window(a, rot, t, 2)
        return zlo, zhi

    lo_t, hi_t = win(true_p)
    lo_p, hi_p = win(pred_p)
    zlo = jnp.clip(jnp.minimum(lo_t, lo_p) - margin, 0.0, 1.0)
    zhi = jnp.clip(jnp.maximum(hi_t, hi_p) + margin, 0.0, 1.0)
    jlo = jnp.ceil(zlo * n)
    jhi = jnp.maximum(jnp.floor(zhi * n), jlo)
    return (jax.lax.stop_gradient(jlo.astype(jnp.float32)),
            jax.lax.stop_gradient(jhi.astype(jnp.float32)))


def explicit_loss_pallas(
    true_p: jax.Array,
    pred_p: jax.Array,
    render_size: int = 32,
    reduce: bool = True,
    z_window: bool = True,
    z_margin: float | None = None,
    sharp: float = SHARP,
) -> jax.Array:
    """Drop-in fused replacement for
    :func:`sqtpu.ops.losses.explicit_loss` (fp32; gradient w.r.t.
    ``pred_p`` only — ``true_p`` is stop_gradient'ed).

    ``z_window=True`` (default) bounds each sample's z-sweep to the
    union of its two SQs' support windows ± ``z_margin`` (module
    docstring) — skips the saturated tails, value within ~3e-5 relative
    of the full sweep; ``z_window=False`` sweeps all (N+1) planes for
    exact XLA parity. ``z_margin=None`` scales the default margin
    inversely with ``sharp`` (the skipped tails decay like
    exp(−sharp·(F−1)), so sharper occupancies need less margin).
    ``sharp`` is the occupancy sharpness (reference value 5.0,
    quirk Q2; see :func:`sqtpu.ops.losses.occupancy_explicit`)."""
    n = render_size
    if not _supported(n):
        from sqtpu.ops import losses
        return losses.explicit_loss(true_p, pred_p, n, reduce=reduce,
                                    sharp=sharp)
    sharp = float(sharp)
    if z_margin is None:
        z_margin = max(Z_MARGIN * SHARP / sharp, 0.02)

    par_t = _frame_params(jax.lax.stop_gradient(true_p))
    par_p = _frame_params(pred_p)

    if z_window:
        jlo, jhi = z_window_indices(true_p, pred_p, n, z_margin)
        par_p = par_p.at[:, SLOT_JLO].set(jlo).at[:, SLOT_JHI].set(jhi)
        tiling = lambda nb: 1  # per-sample: loop bounds ARE the window
    else:
        par_p = par_p.at[:, SLOT_JHI].set(float(n))  # [0, n]: full sweep
        tiling = lambda nb: _tile_b(nb, n)

    b, mb = par_p.shape[0], min(_max_batch(), _FUSED_MAX_BATCH)
    if b > mb:
        sums = jnp.concatenate([
            _core(par_t[i:i + mb], par_p[i:i + mb], n,
                  tiling(min(mb, b - i)), sharp)
            for i in range(0, b, mb)])
    else:
        sums = _core(par_t, par_p, n, tiling(b), sharp)
    per_sample = sums * (100.0 / (n + 1) ** 3)  # mean over (N+1)³ ×100
    return jnp.mean(per_sample) if reduce else per_sample
