"""Renderer tests: scanner binary as end-to-end oracle (SURVEY.md §4)."""

import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.data.bmp import read_bmp
from sqtpu.ops.render import render_depth_hard, render_depth_soft

from conftest import EXAMPLES, SCANNER

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


def _quat2mat_np(q):
    x, y, z, w = q / np.sqrt(np.square(q).sum())
    return np.array([
        [1 - 2 * (y**2 + z**2), 2*x*y - 2*w*z, 2*x*z + 2*w*y],
        [2*x*y + 2*w*z, 1 - 2*(x**2 + z**2), 2*y*z - 2*w*x],
        [2*x*z - 2*w*y, 2*y*z + 2*w*x, 1 - 2*(x**2 + y**2)],
    ])


def _run_scanner(tmp_path, a, e, t, q):
    """Render GT with the reference C++ binary (CLI contract SURVEY §2.2-N2)."""
    out = str(tmp_path / "oracle.bmp")
    M = _quat2mat_np(q)
    args = [SCANNER, out] + ["%f" % v for v in np.concatenate([a, e, t, M.ravel()])]
    subprocess.run(args, check=True, capture_output=True)
    return read_bmp(out).astype(np.float64)


class TestHardRendererVsScannerOracle:
    @pytest.mark.scanner
    def test_examples_nearly_byte_exact(self, example_labels):
        """All 10 shipped example BMPs: ≥99.9% of pixels byte-equal."""
        names, labels = example_labels
        total_bad, total = 0, 0
        for i, nm in enumerate(names):
            ref = read_bmp(os.path.join(EXAMPLES, nm)).astype(np.float64)
            ours = np.asarray(
                render_depth_hard(jnp.asarray(labels[i]), 256, 30, quantize=True)
            ) * 255.0
            total_bad += int((np.abs(ref - ours) > 1).sum())
            total += ref.size
        assert total_bad / total < 1e-3

    @pytest.mark.scanner
    def test_fresh_random_renders(self, tmp_path):
        if not os.access(SCANNER, os.X_OK):
            pytest.skip("scanner binary not executable")
        rng = np.random.default_rng(123)
        for _ in range(3):
            a = rng.uniform(25, 75, 3)
            e = rng.uniform(0.1, 1.0, 2)
            t = 128 + rng.uniform(-40, 40, 3)
            u = rng.uniform(0, 1, 3)
            q = np.array([
                np.sqrt(1 - u[0]) * np.sin(2 * np.pi * u[1]),
                np.sqrt(1 - u[0]) * np.cos(2 * np.pi * u[1]),
                np.sqrt(u[0]) * np.sin(2 * np.pi * u[2]),
                np.sqrt(u[0]) * np.cos(2 * np.pi * u[2]),
            ])
            ref = _run_scanner(tmp_path, a, e, t, q)
            p = jnp.asarray(np.concatenate([a / 255, e, t / 255, q]))
            ours = np.asarray(render_depth_hard(p, 256, 30, quantize=True)) * 255.0
            bad = (np.abs(ref - ours) > 1).mean()
            assert bad < 1e-3, f"mismatch rate {bad}"

    @pytest.mark.scanner
    def test_residual_mismatches_are_oracle_misses(self, tmp_path):
        """Characterize the last ~2e-4 of non-byte-equal pixels (round-4
        probe over 20 random SQs: 187 scanner-background + 55 off-by-one
        of 1.31M): every pixel where WE report a surface and the scanner
        reports background must be a GENUINE intersection — F dips below
        1 along that ray in fp64 — i.e. the binary's iterative
        ``sq::intersect`` fails on thin grazing chords (0.0005-0.042 z
        units measured), not our sweep hallucinating. The remaining
        deltas must be ±1 gray (root precision at near-integer z)."""
        if not os.access(SCANNER, os.X_OK):
            pytest.skip("scanner binary not executable")
        from sqtpu.ops import geometry

        rng = np.random.default_rng(7)
        a = rng.uniform(25, 75, 3)
        e = rng.uniform(0.1, 1.0, 2)
        t = 128 + rng.uniform(-40, 40, 3)
        u = rng.uniform(0, 1, 3)
        q = np.array([
            np.sqrt(1 - u[0]) * np.sin(2 * np.pi * u[1]),
            np.sqrt(1 - u[0]) * np.cos(2 * np.pi * u[1]),
            np.sqrt(u[0]) * np.sin(2 * np.pi * u[2]),
            np.sqrt(u[0]) * np.cos(2 * np.pi * u[2]),
        ])
        ref = _run_scanner(tmp_path, a, e, t, q)
        p = jnp.asarray(np.concatenate([a / 255, e, t / 255, q]),
                        jnp.float64)
        ours = np.rint(np.asarray(
            render_depth_hard(p, 256, 30, quantize=True)) * 255.0)
        ys, xs = np.nonzero(np.abs(ref - ours) > 0)
        zs = np.linspace(0.0, 1.0, 2001)
        for y, x in zip(ys, xs):
            if ref[y, x] == 0 and ours[y, x] > 0:
                pts = np.stack([np.full_like(zs, x / 255.0),
                                np.full_like(zs, (255 - y) / 255.0), zs],
                               axis=-1)
                fmin = float(jnp.min(geometry.field_points(
                    jnp.asarray(pts), p)))
                assert fmin < 1.0, (
                    f"claimed hit at ({y},{x}) is not real: F_min={fmin}")
            else:
                assert abs(ref[y, x] - ours[y, x]) <= 1, (
                    f"({y},{x}): oracle {ref[y,x]} ours {ours[y,x]}")


class TestSoftRenderer:
    def test_background_is_zero(self):
        """Empty column -> depth exactly 0 (scanner bg convention)."""
        p = jnp.asarray([0.05, 0.05, 0.05, 1, 1, 0.9, 0.9, 0.9, 0, 0, 0, 1],
                        dtype=jnp.float64)
        d = np.asarray(render_depth_soft(p, 64))
        assert d[32, 0] == pytest.approx(0.0, abs=1e-4)

    def test_depth_tracks_z_position(self):
        """Moving the SQ up in z raises the rendered max-depth value."""
        base = [0.15, 0.15, 0.15, 1.0, 1.0, 0.5, 0.5, 0.4, 0, 0, 0, 1]
        lo = jnp.asarray(base, dtype=jnp.float64)
        hi = lo.at[7].set(0.7)
        d_lo = float(np.max(np.asarray(render_depth_soft(lo, 64))))
        d_hi = float(np.max(np.asarray(render_depth_soft(hi, 64))))
        assert d_hi > d_lo
        # max depth ≈ t_z + a_z for a sphere
        assert d_hi == pytest.approx(0.7 + 0.15, abs=0.02)

    def test_differentiable(self):
        p = jnp.asarray([0.2, 0.2, 0.2, 0.5, 0.5, 0.5, 0.5, 0.5,
                         0.1, 0.2, -0.3, 0.927], dtype=jnp.float64)
        p = p.at[8:12].set(p[8:12] / jnp.linalg.norm(p[8:12]))
        g = np.asarray(jax.grad(lambda pp: jnp.sum(render_depth_soft(pp, 32)))(p))
        assert np.all(np.isfinite(g))
        assert np.any(g != 0)

    def test_soft_vs_hard_agree(self):
        """Soft render approximates the hard render (corr ~0.98 relation)."""
        p = jnp.asarray([0.2, 0.18, 0.22, 0.6, 0.7, 0.5, 0.45, 0.55,
                         0.3, -0.2, 0.4, 0.84], dtype=jnp.float64)
        p = p.at[8:12].set(p[8:12] / jnp.linalg.norm(p[8:12]))
        soft = np.asarray(render_depth_soft(p, 64, 1.5, 260.0))
        hard = np.asarray(render_depth_hard(p, 64))
        corr = np.corrcoef(soft.ravel(), hard.ravel())[0, 1]
        assert corr > 0.97


def test_hard_render_support_window_clip():
    """An SQ poking below z=0 must still render with depth clipped into
    the scanner's representable [0,1] lattice (the bounded sweep clips
    its window), and a near-degenerate window must not produce NaNs."""
    import jax.numpy as jnp
    from sqtpu.ops.render import render_depth_hard

    p = jnp.asarray([0.25, 0.25, 0.25, 1.0, 1.0, 0.5, 0.5, 0.1,
                     0.0, 0.0, 0.0, 1.0], jnp.float64)  # z in [-0.15, .35]
    img = np.asarray(render_depth_hard(p, 64, quantize=True, n_sweep=48))
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert img.max() > 0.2  # the top cap at z=0.35 is visible
    # entirely out of window above the lattice: clip degenerates cleanly
    p2 = p.at[7].set(2.0)
    img2 = np.asarray(render_depth_hard(p2, 32, quantize=True, n_sweep=16))
    assert np.isfinite(img2).all()
