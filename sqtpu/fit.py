"""Direct superquadric fitting — no neural net in the loop.

Covers two reference components:

* ``torch/visu.py:123-209`` — gradient-descent fitting of a 12-param leaf
  tensor under any L4 loss, with manual SGD and per-step quaternion
  renormalization (``:182-187``). Here the whole optimization is a
  ``lax.scan`` on device (:func:`gd_fit`), with SGD-parity and Adam
  variants; it doubles as the loss-landscape test rig exactly as visu.py
  does (README.md:12).
* the classical iterative recovery inside the ``data/scanner`` binary
  (symbols ``recover``/``estimate``/``mrqmin`` — Numerical-Recipes
  Levenberg–Marquardt with a moments-based initial pose, SURVEY.md
  §2.2-N4): :func:`moments_init` + :func:`lm_fit` on the Solina–Bajcsy
  energy, built from ``jax.jacfwd`` + damped normal equations inside a
  ``lax.scan`` (accept/reject with adaptive lambda).

Usage::

    python -m sqtpu.fit --loss explicit --steps 2000 --optimizer sgd
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sqtpu.ops import geometry, losses, metrics
from sqtpu.ops import quaternion as quat
from sqtpu.ops.image import nearest_resize
from sqtpu.utils.config import FitConfig, parse_cli


def _loss_closure(cfg: FitConfig, target_params=None, target_image=None):
    if cfg.loss == "explicit":
        assert target_params is not None
        tp = target_params[None]
        return lambda p: losses.explicit_loss(tp, p[None], cfg.render_size)
    if cfg.loss == "implicit":
        assert target_image is not None
        ti = target_image[None]
        return lambda p: losses.implicit_loss(
            ti, p[None], cfg.render_size, cfg.tau, cfg.sigmoid_sharpness)
    if cfg.loss == "leastsquares":
        assert target_image is not None
        ti = target_image[None]
        return lambda p: losses.least_squares_loss(ti, p[None],
                                                   cfg.render_size)
    raise ValueError(f"unknown loss {cfg.loss}")


def _renorm_quat(p):
    q = p[8:12]
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    return p.at[8:12].set(q)


@partial(jax.jit, static_argnames=("loss_fn", "steps", "optimizer"))
def _fit_scan(p0, loss_fn, steps: int, lr: float, optimizer: str):
    if optimizer == "adam":
        import optax
        tx = optax.adam(lr)
        opt0 = tx.init(p0)

        def body(carry, _):
            p, opt = carry
            l, g = jax.value_and_grad(loss_fn)(p)
            updates, opt = tx.update(g, opt, p)
            p = _renorm_quat(p + updates)
            return (p, opt), l

        (p, _), hist = jax.lax.scan(body, (p0, opt0), None, length=steps)
        return p, hist

    def body(p, _):
        # visu.py:182-187: params -= lr*grad; q -= lr*grad_q; q /= ||q||
        l, g = jax.value_and_grad(loss_fn)(p)
        p = _renorm_quat(p - lr * g)
        return p, l

    return jax.lax.scan(body, p0, None, length=steps)


def gd_fit(cfg: FitConfig, target_params=None, target_image=None,
           p0=None, key=None):
    """Gradient-descent fit. Returns (fitted 12-params, loss history)."""
    if p0 is None:
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        k1, k2, k3 = jax.random.split(key, 3)
        # visu.py:55-56 randsq() + randquat() init distribution:
        # a ~ U(0.1, 0.3), e ~ U(0.1, 1), t ~ U(0.34, 0.65)
        a = jax.random.uniform(k1, (3,), jnp.float32, 0.1, 0.3)
        e = jax.random.uniform(k2, (2,), jnp.float32, 0.1, 1.0)
        t = jax.random.uniform(k3, (3,), jnp.float32, 0.34, 0.65)
        q = quat.random_uniform(jax.random.fold_in(key, 3), ())
        p0 = jnp.concatenate([a, e, t, q]).astype(jnp.float32)
    loss_fn = _loss_closure(cfg, target_params, target_image)
    return _fit_scan(p0, loss_fn, cfg.steps, cfg.learning_rate,
                     cfg.optimizer if cfg.optimizer != "lm" else "sgd")


# ---------------------------------------------------------------------------
# Moments init + Levenberg–Marquardt (scanner binary N4 equivalent)
# ---------------------------------------------------------------------------

def image_points(img: jax.Array, n: int = 64):
    """Lift a depth image to weighted 3-D points ((n*n, 3), (n*n,) mask) —
    same (y, 1−x, z) convention as the least-squares loss
    (``classes.py:358-369``)."""
    small = nearest_resize(img, (n, n))
    rows = (jnp.arange(n, dtype=img.dtype) / n)[:, None]
    cols = (jnp.arange(n, dtype=img.dtype) / n)[None, :]
    pts = jnp.stack([
        jnp.broadcast_to(cols, (n, n)),
        jnp.broadcast_to(1.0 - rows, (n, n)),
        small,
    ], axis=-1).reshape(-1, 3)
    return pts, (small > 0).reshape(-1).astype(img.dtype)


def moments_init(pts: jax.Array, mask: jax.Array) -> jax.Array:
    """Initial SQ estimate from point moments (``estimate`` /
    ``inertia_in_frame`` / ``eigen`` lineage in the binary).

    Centroid -> t, PCA eigenvectors -> orientation (det fixed to +1),
    2·sqrt(3·eigenvalues) -> sizes (exact for a uniform box), e = (1, 1).
    """
    w = mask / jnp.maximum(jnp.sum(mask), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0)
    centered = pts - mean
    cov = (centered * w[:, None]).T @ centered
    eigval, eigvec = jnp.linalg.eigh(cov)
    # ascending order -> make axis 3 (z) the largest variance, keep right-handed
    R = eigvec
    R = jnp.where(jnp.linalg.det(R) < 0, -R, R)
    q0 = quat.from_matrix(R)
    a0 = jnp.clip(jnp.sqrt(jnp.maximum(3.0 * eigval, 1e-8)),
                  geometry.A_MIN, geometry.A_MAX)
    e0 = jnp.asarray([1.0, 1.0], pts.dtype)
    return jnp.concatenate([a0, e0, jnp.clip(mean, 0.0, 1.0), q0])


@partial(jax.jit, static_argnames=("iters", "robust_c", "residual"))
def lm_fit(pts: jax.Array, mask: jax.Array, p0: jax.Array,
           iters: int = 50, lam0: float = 1e-2, robust_c: float = 0.0,
           residual: str = "sb"):
    """Damped least squares (Levenberg–Marquardt) on the Solina–Bajcsy
    residuals r_i = √(a1a2a3)·(F^e1 − 1) over masked image points.

    ``mrqmin``-style adaptive damping: accepted steps shrink lambda 0.3x,
    rejected steps grow it 3x (step discarded). Fixed iteration count so
    the whole solve is one compiled ``lax.scan``.

    ``robust_c > 0`` enables IRLS outlier rejection (Tukey biweight,
    recomputed each iteration from the current residuals with MAD scale;
    4.685 is the classical 95%-efficiency constant): points whose
    residual exceeds ``robust_c`` robust standard deviations get weight 0
    — flying pixels / multipath ghosts (the ``salt`` corruption of
    :mod:`sqtpu.data.augment`) no longer drag the fit, which a plain
    least-squares has no defense against.

    ``residual="radial"`` swaps the SB energy for the signed radial
    euclidean distance |r0|·(1 − F^(−e1/2)) — the ``sq::sdistance``
    metric of the scanner binary (SURVEY.md §2.2-N1). The SB energy has
    a documented pathology on noisy visible-surface points: residuals
    scale ∝ e1, so an inflated boxy SQ (e1 at the clamp floor, one huge
    semi-axis) passing its top face through the point cloud can have
    LOWER energy than the truth, and ranging noise as small as σ=0.005
    tips the fit into that basin. The radial residual is in euclidean
    units — no e1 compression — and does not collapse.
    """
    def residuals(p):
        pp = geometry.clamp_params(_renorm_quat(p))
        if residual == "radial":
            return geometry.signed_distance(pts, pp) * mask
        f = geometry.field_points(pts, pp, guard=True)
        a = pp[geometry.SIZE_SLICE]
        return jnp.sqrt(a[0] * a[1] * a[2]) * (f - 1.0) * mask

    def weights(r):
        if not robust_c:
            return jnp.ones_like(r)
        absr = jnp.where(mask > 0, jnp.abs(r), jnp.nan)
        scale = jnp.maximum(1.4826 * jnp.nanmedian(absr), 1e-4)
        u = r / (robust_c * scale)
        return jnp.where(jnp.abs(u) < 1.0, (1.0 - u * u) ** 2, 0.0)

    def step(carry, _):
        p, lam = carry
        r = residuals(p)
        w = weights(r)                          # frozen within the step
        sw = jnp.sqrt(w)
        J = jax.jacfwd(residuals)(p)            # (P, 12)
        Jw = sw[:, None] * J
        A = Jw.T @ Jw
        g = Jw.T @ (sw * r)
        damped = A + lam * jnp.diag(jnp.diag(A)) \
            + 1e-12 * jnp.eye(12, dtype=p.dtype)
        delta = jnp.linalg.solve(damped, g)
        p_new = _renorm_quat(p - delta)
        c_old = jnp.sum(w * r ** 2)
        c_new = jnp.sum(w * residuals(p_new) ** 2)  # same w: comparable
        accept = c_new < c_old
        p = jnp.where(accept, p_new, p)
        lam = jnp.where(accept, lam * 0.3, lam * 3.0)
        return (p, lam), jnp.minimum(c_old, c_new)

    lam0 = jnp.asarray(lam0, p0.dtype)
    (p, _), hist = jax.lax.scan(step, (p0, lam0), None, length=iters)
    return geometry.clamp_params(_renorm_quat(p)), hist


def apply_prefilter(img: jax.Array, prefilter: str) -> jax.Array:
    """Depth-map cleanup before fitting: ``"despeckle"`` drops isolated
    object pixels (:func:`sqtpu.ops.image.despeckle`), ``"median"`` is a
    3×3 median (:func:`sqtpu.ops.image.median3` — also denoises ranging
    error and fills dropout holes), ``"none"`` is identity."""
    if prefilter == "despeckle":
        from sqtpu.ops.image import despeckle
        return despeckle(img)
    if prefilter == "median":
        from sqtpu.ops.image import median3
        return median3(img)
    if prefilter in ("none", "", None):
        return img
    raise ValueError(f"unknown prefilter {prefilter!r}")


def image_points_view(img: jax.Array, cam_q: jax.Array, n: int = 64):
    """Lift a POSED view's depth image to WORLD-frame points.

    ``cam_q`` is the view's world-from-camera rotation (the same
    convention as :func:`sqtpu.ops.render.render_depth_view`): the
    camera frame is the world frame rotated by ``conjugate(cam_q)``
    about the scene center, so a camera-frame point lifts back as
    ``x_w = R(cam_q)·(x_cam − c) + c``. Identity ``cam_q`` reduces to
    :func:`image_points` exactly."""
    from sqtpu.ops import quaternion as quat

    pts_cam, mask = image_points(img, n)
    c0 = jnp.asarray(0.5, img.dtype)
    pts_w = quat.rotate(pts_cam - c0, cam_q) + c0
    return pts_w, mask


@partial(jax.jit, static_argnames=("n_points", "iters", "robust_c",
                                   "prefilter", "residual"))
def recover_multiview(imgs: jax.Array, cam_qs: jax.Array,
                      n_points: int = 64, iters: int = 50,
                      robust_c: float = 0.0, prefilter: str = "none",
                      residual: str = "sb"):
    """Classical recovery from MULTIPLE posed depth views — beyond the
    reference (the binary's ``recover`` reads one range image): each
    view's pixels are lifted into the shared world frame, the merged
    cloud covers the self-occluded far side a single orthographic view
    never sees, and one moments init + L-M solve fits all of it.

    ``imgs``: (V, H, W) depth views of the SAME SQ; ``cam_qs``: (V, 4)
    world-from-camera rotations (xyzw), as rendered by
    :func:`sqtpu.ops.render.render_depth_view`. The merged solve keeps
    the fixed-shape masked-point contract of :func:`lm_fit` (V·n²
    points), so it jits once for any view count."""
    imgs = jax.vmap(lambda im: apply_prefilter(im, prefilter))(imgs)
    pts, mask = jax.vmap(
        lambda im, q: image_points_view(im, q, n_points))(imgs, cam_qs)
    pts = pts.reshape(-1, 3)
    mask = mask.reshape(-1)
    p0 = moments_init(pts, mask)
    return lm_fit(pts, mask, p0, iters, robust_c=robust_c,
                  residual=residual)


def recover(img: jax.Array, n_points: int = 64, iters: int = 50,
            robust_c: float = 0.0, prefilter: str = "none",
            residual: str = "sb"):
    """Full classical recovery: moments init + L-M refine on one depth
    image — the ``recover`` entry of the scanner binary, on device.

    ``prefilter`` cleans the depth map before lifting (protects the
    moments init from flying pixels); ``robust_c``/``residual`` harden
    the L-M polish (see :func:`lm_fit`)."""
    img = apply_prefilter(img, prefilter)
    pts, mask = image_points(img, n_points)
    p0 = moments_init(pts, mask)
    return lm_fit(pts, mask, p0, iters, robust_c=robust_c,
                  residual=residual)


@partial(jax.jit, static_argnames=("method", "steps", "n", "tau", "sharp",
                                   "robust_c", "prefilter", "residual"))
def refine_params(imgs: jax.Array, p0: jax.Array, method: str = "lm",
                  steps: int = 30, n: int = 64, lr: float = 3e-3,
                  tau: float = 1.5, sharp: float = 260.0,
                  robust_c: float = 0.0, prefilter: str = "none",
                  residual: str = "sb") -> jax.Array:
    """Test-time refinement: polish (B, 12) parameter estimates against
    their (B, H, W) depth images — the hybrid of the two reference
    recovery paths (CNN prediction, ``torch/test_random.py:52``, as the
    init; the classical iterative fit, scanner-binary ``recover``/
    ``mrqmin`` or ``visu.py:123-209`` GD, as the polish).

    method="lm": Levenberg–Marquardt on the Solina–Bajcsy energy over
    image points (fast; refines size/position/rotation to the visible
    surface). method="gd": Adam on the implicit depth-MAE loss at
    render size ``n`` (slower; optimizes the actual eval objective).

    ``robust_c``/``prefilter``/``residual`` harden refinement against
    corrupted depth maps (see :func:`lm_fit` / :func:`apply_prefilter`)
    — used by ``sqtpu.evaluate --refine-robust-c/--refine-filter/
    --refine-residual`` for the sensor-noise robustness protocol.
    Measured on the mixed corruption (gaussian 0.02 + dropout 0.2 +
    salt 0.005, IoU@32 from a perturbed-truth init at 0.63): plain LM
    collapses to 0.34; robust radial LM reaches 0.59; **the gd method
    (implicit depth-MAE, already an L1 norm) is the robust choice** —
    0.90 raw, 0.91 with the median prefilter (clean-image gd: 0.93).
    """
    imgs = apply_prefilter(imgs, prefilter)
    if method == "lm":
        def one(im, p):
            pts, mask = image_points(im, n)
            return lm_fit(pts, mask, p, iters=steps, robust_c=robust_c,
                          residual=residual)[0]
        return jax.vmap(one)(imgs, p0)
    if method == "gd":
        def one(im, p):
            # same Adam + per-step quat-renorm loop as `gd_fit` (one
            # shared implementation: _fit_scan)
            f = lambda q: losses.implicit_loss(im[None], q[None], n, tau,
                                               sharp)
            p_out, _ = _fit_scan(p, f, steps, lr, "adam")
            return geometry.clamp_params(p_out)
        return jax.vmap(one)(imgs, p0)
    if method == "lm+gd":
        # hybrid: LM snaps size/position/rotation to the visible surface
        # fast, then Adam descends the actual eval objective (implicit
        # depth MAE) from that much better basin
        p1 = refine_params(imgs, p0, "lm", steps, n, lr, tau, sharp,
                           robust_c=robust_c, residual=residual)
        return refine_params(imgs, p1, "gd", max(steps, 50), n, lr, tau,
                             sharp)
    raise ValueError(f"unknown refine method {method!r}")


def main(argv=None):
    cfg = parse_cli(FitConfig, argv)
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    from sqtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    key = jax.random.PRNGKey(cfg.seed)
    # a random ground truth like visu.py:77
    from sqtpu.data.synthetic import sample_params
    from sqtpu.ops.render import render_depth_hard

    true_p = sample_params(key, 1)[0]
    img = render_depth_hard(true_p, 256, n_bisect=12, quantize=True)

    if cfg.optimizer == "lm" and cfg.n_views > 1:
        # multi-view classical recovery: posed turntable views about y
        from sqtpu.ops.render import render_depth_view
        angs = jnp.arange(cfg.n_views) * (2 * jnp.pi / cfg.n_views)
        half = angs / 2
        cam_qs = jnp.stack([jnp.zeros_like(half), jnp.sin(half),
                            jnp.zeros_like(half), jnp.cos(half)], -1)
        views = jax.vmap(
            lambda q: render_depth_view(true_p, q, 256))(cam_qs)
        p_fit, hist = recover_multiview(
            views, cam_qs, iters=cfg.steps if cfg.steps <= 200 else 50)
    elif cfg.optimizer == "lm":
        p_fit, hist = recover(img, iters=cfg.steps if cfg.steps <= 200 else 50)
    else:
        p_fit, hist = gd_fit(cfg, target_params=true_p, target_image=img)
    iou = float(metrics.iou(true_p[None], p_fit[None], 64))
    print("true:", np.asarray(true_p))
    print("fit: ", np.asarray(p_fit))
    print(f"final loss {float(hist[-1]):.6f}  IoU {iou:.4f}  "
          f"steps {len(np.asarray(hist))}")
    return p_fit, hist


if __name__ == "__main__":
    main(sys.argv[1:])
