"""Fused Pallas kernels for the hot ops + dispatch.

:func:`implicit_loss_auto` picks the fastest available implementation of
the implicit loss for the current backend: the fused Pallas TPU kernel
(:mod:`sqtpu.ops.kernels.implicit`) when running on TPU with fp32,
otherwise the XLA-fused jnp path (:func:`sqtpu.ops.losses.implicit_loss`,
bit-identical semantics — the Pallas kernel is tested against it).
"""

from __future__ import annotations

import os

import jax

from sqtpu.ops import losses


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def pallas_available() -> bool:
    """True when the fused kernel can run: a real TPU backend, or CPU in
    interpreter mode (SQTPU_PALLAS_INTERPRET=1 — how the virtual-device
    mesh tests and the driver's multichip dryrun exercise the kernel)."""
    return (_on_tpu()
            or os.environ.get("SQTPU_PALLAS_INTERPRET", "0") == "1")


def implicit_loss_auto(img, pred_p, render_size=64, tau=1.5,
                       sharpness=260.0, z_window=True):
    """``z_window`` bounds the kernel's z-sweep to the SQ's support
    window (out-of-window transmittance is closed-form; see
    kernels/implicit.py) — ignored by the XLA fallback."""
    if pallas_available() and pred_p.dtype == jax.numpy.float32:
        try:
            from sqtpu.ops.kernels.implicit import implicit_loss_pallas
            return implicit_loss_pallas(img, pred_p, render_size, tau,
                                        sharpness, z_window=z_window)
        except ImportError:
            pass
    return losses.implicit_loss(img, pred_p, render_size, tau, sharpness)


def explicit_loss_auto(true_p, pred_p, render_size=32, reduce=True,
                       z_window=True, sharp=5.0):
    """Explicit occupancy-MSE, fused kernel when available. NOTE the
    kernel's gradient contract: d/d true_p is zero (labels are constants
    in every training consumer); the XLA path differentiates both sides.
    ``z_window`` bounds the kernel's z-sweep to the SQs' support windows
    (~1.35× faster, ≤1e-4 relative value shift; kernels/explicit.py
    doc) — ignored by the XLA fallback, which always sweeps the full
    lattice. ``sharp`` is the occupancy sharpness (reference value 5.0,
    quirk Q2)."""
    if pallas_available() and pred_p.dtype == jax.numpy.float32:
        try:
            from sqtpu.ops.kernels.explicit import explicit_loss_pallas
            return explicit_loss_pallas(true_p, pred_p, render_size,
                                        reduce=reduce, z_window=z_window,
                                        sharp=sharp)
        except ImportError:
            pass
    return losses.explicit_loss(true_p, pred_p, render_size, reduce=reduce,
                                sharp=sharp)


def render_hard_auto(p_batch, image_size=256, n_sweep=48, n_bisect=12,
                     quantize=True):
    """Batched hard render, fused Pallas kernel when available (byte-
    parity tested); falls back to the vmapped XLA renderer (which is
    also the differentiable path — the kernel is fwd-only)."""
    if pallas_available():
        try:
            from sqtpu.ops.kernels.hardrender import (
                _supported, render_depth_hard_pallas)
            if _supported(image_size):
                return render_depth_hard_pallas(
                    p_batch, image_size, n_sweep=n_sweep,
                    n_bisect=n_bisect, quantize=quantize)
        except ImportError:
            pass
    from sqtpu.ops.render import render_depth_hard_batch
    return render_depth_hard_batch(p_batch, image_size, n_bisect=n_bisect,
                                   quantize=quantize, n_sweep=n_sweep)
