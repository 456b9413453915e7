"""Differentiable superquadric depth renderers.

TPU-native replacement for BOTH depth-image producers in the reference:

* the soft transmittance projection buried in ``ImplicitLoss``
  (``/root/reference/torch/classes.py:232-282``) — here a standalone,
  vmapped, jittable renderer usable for loss AND for visualization;
* the external C++ ray-caster ``data/scanner`` (SURVEY.md §2.2-N2) — here
  ``render_depth_hard``, an on-device exact ray-cast via bisection on the
  inside-outside function, so ground-truth data generation never leaves
  the chip (BASELINE.json north star).

Camera model (verified against the scanner binary, SURVEY.md §2.2-N2):
orthographic view along −z; image column = world x, image row counted
from the BOTTOM = world y; pixel value = max surface z along the ray
(integer grayscale in the scanner, continuous here); background = 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sqtpu.ops import geometry


def depth_from_axes(ax_x, ax_y, ax_z, p, tau, sharpness, n: int):
    """Clamped params + grid axes -> depth image slab in image layout
    ((rows, len(ax_x)) with row 0 = top). The single shared
    implementation of the occupancy->transmittance projection, reused by
    the full renderer and the grid-sharded loss (x-axis sliced)."""
    from sqtpu.ops import geometry as _g

    f = _g.field_grid(ax_x, ax_y, ax_z, p, guard=True)
    occ = jax.nn.sigmoid(sharpness * (1.0 - f))
    cum = jnp.cumsum(jnp.flip(occ, axis=-1), axis=-1)
    depth = 1.0 - jnp.sum(jnp.exp(-tau * cum), axis=-1) / n
    return jnp.flip(depth.T, axis=0)


def _depth_from_field(inout: jax.Array, tau, sharpness, n: int) -> jax.Array:
    """Soft occupancy -> transmittance depth, image convention.

    ``inout`` is F^(e1) on an (Nx, Ny, Nz) grid. Steps mirror
    ``classes.py:273-279``: occupancy sigmoid, z-flipped cumulative sum,
    exponential transmittance, then (x,y) -> (row, col) with the row axis
    flipped so row 0 is the image top (cv2 convention).
    """
    occ = jax.nn.sigmoid(sharpness * (1.0 - inout))
    # cumsum over z starting from the far end (z = max first)
    cum = jnp.cumsum(jnp.flip(occ, axis=-1), axis=-1)
    transmittance = jnp.exp(-tau * cum)
    depth = 1.0 - jnp.sum(transmittance, axis=-1) / n  # (Nx, Ny)
    return jnp.flip(depth.T, axis=0)  # (rows, cols), row 0 = top


def render_depth_soft(
    p: jax.Array,
    render_size: int = 64,
    tau: float = 1.5,
    sharpness: float = 260.0,
    *,
    clamp: bool = True,
    dtype=None,
) -> jax.Array:
    """Soft differentiable depth render of one SQ, shape (N, N), values [0,1].

    Faithful to ``ImplicitLoss.depth_projection`` (``classes.py:232-282``)
    with the training defaults tau=1.5, sharpness=260
    (``torch/train.py:64``). vmap over a batch of parameter vectors.
    """
    if dtype is None:
        dtype = p.dtype
    ax = geometry.make_axis(render_size, "implicit", dtype=dtype)
    pp = geometry.clamp_params(p) if clamp else p
    inout = geometry.field_grid(ax, ax, ax, pp, guard=True)
    tau = jnp.asarray(tau, dtype)
    sharpness = jnp.asarray(sharpness, dtype)
    return _depth_from_field(inout, tau, sharpness, render_size)


render_depth_soft_batch = jax.vmap(
    render_depth_soft, in_axes=(0,) + (None,) * 3, out_axes=0
)


# ---------------------------------------------------------------------------
# Hard (exact) renderer — the scanner replacement
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("image_size", "n_bisect", "quantize",
                                   "n_sweep"))
def render_depth_hard(
    p: jax.Array,
    image_size: int = 256,
    n_bisect: int = 24,
    quantize: bool = False,
    n_sweep: int | None = None,
) -> jax.Array:
    """Exact orthographic depth map by ray-casting F(x,y,z)=1, shape (S, S).

    For every pixel the ray runs along −z; because e1,e2 ∈ (0, 2] keeps
    the superquadric convex, the inside set along a ray is an interval,
    so a full z-sweep (one F evaluation per integer z-slab, streamed with
    ``lax.scan`` to keep memory at one (S,S) slab) finds the topmost
    inside slab, and ``n_bisect`` bisection steps refine the surface
    crossing to sub-voxel precision. Returns values in [0,1] = max
    surface z / (S-1)·(S-1)/S ≈ z; background exactly 0.

    ``quantize=True`` floors to integer grayscale / 255 like the scanner
    binary's BMP output (SURVEY.md §2.2-N2).

    ``n_sweep`` controls the coarse z-sweep slab count (default =
    ``image_size``). The sweep covers only the SQ's support window along
    z (typically 2h ≈ 0.6 for the reference data distribution; worst
    case ≈ 1.0 for a max-size SQ tilted along (1,1,1)), so slabs are
    typically ~2.5x finer than a full-[0,1] sweep of the same count and
    never coarser than 1/(n_sweep−1). The thinnest SQ (diameter ≈ 0.196)
    can never be missed; grazing silhouette rays whose inside chord is
    shorter than a slab can be. Use the default for scanner byte-parity,
    48 for bulk training data.
    """
    dtype = p.dtype
    s = image_size
    # Pixel world coordinates normalized to [0,1] (x=col, y=row-from-bottom).
    # For s=256 this is exactly the scanner's integer-pixel/255 lattice.
    ax = jnp.arange(s, dtype=dtype) / jnp.asarray(s - 1, dtype)
    X = ax[:, None]  # (s, 1) x varies over rows of this (x, y) layout
    Y = ax[None, :]  # (1, s)

    a, e, t, q = geometry.split_params(p)
    from sqtpu.ops import quaternion as quat
    rot = quat.to_matrix(quat.conjugate(q))
    tr = rot @ t

    def f_at(z):
        """F^(e1) on the (s, s) pixel plane at world z (scalar or (s,s))."""
        x2 = ((rot[0, 0] * X + rot[0, 1] * Y + rot[0, 2] * z - tr[0]) / a[0]) ** 2
        y2 = ((rot[1, 0] * X + rot[1, 1] * Y + rot[1, 2] * z - tr[1]) / a[1]) ** 2
        z2 = ((rot[2, 0] * X + rot[2, 1] * Y + rot[2, 2] * z - tr[2]) / a[2]) ** 2
        return geometry._power_chain(x2, y2, z2, e[0], e[1], guard=True)

    # Sweep z far -> near: the FIRST inside hit is max-z. The sweep is
    # BOUNDED to the SQ's exact support window along world z: the body
    # box [-a, a] has support h = a·|u| along world z (u = body z
    # direction = rot[:, 2]), and e1,e2 ≤ 1 keeps the SQ inside the box —
    # so slabs are ~(2h)⁻¹/(1)⁻¹ ≈ 2.5x finer than a full [0,1] sweep at
    # the same cost (fewer missed grazing rays, or fewer slabs needed).
    nsw = s if n_sweep is None else n_sweep
    _, z_hi, step = geometry.z_support_window(a, rot, t, nsw, dtype)
    zs = z_hi - jnp.arange(nsw, dtype=dtype) * step

    def sweep(carry, z):
        z_in, found = carry
        inside = f_at(z) <= 1.0
        newly = inside & ~found
        z_in = jnp.where(newly, z, z_in)
        return (z_in, found | inside), None

    (z_inside, hit), _ = jax.lax.scan(
        sweep, (jnp.zeros((s, s), dtype), jnp.zeros((s, s), bool)), zs
    )

    # Bisect between the inside slab and the slab above it (outside).
    lo = z_inside            # inside
    hi = z_inside + step     # outside (or beyond the top slab)

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        inside = f_at(mid) <= 1.0
        return jnp.where(inside, mid, lo), jnp.where(inside, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_bisect, bisect, (lo, hi))

    depth = jnp.where(hit, lo, jnp.zeros_like(lo))
    if quantize:
        depth = jnp.floor(depth * 255.0) / 255.0
    # (x, y) plane -> image rows/cols: row = s-1 - y, col = x
    return jnp.flip(depth.T, axis=0)


def render_depth_hard_batch(p: jax.Array, image_size: int = 256, **kw) -> jax.Array:
    return jax.vmap(lambda pi: render_depth_hard(pi, image_size, **kw))(p)


# ---------------------------------------------------------------------------
# General ray–SQ intersection + posed-camera rendering
# ---------------------------------------------------------------------------

def intersect_ray(
    origin: jax.Array,
    direction: jax.Array,
    p: jax.Array,
    n_sweep: int = 128,
    n_bisect: int = 24,
):
    """First intersection of a ray with the SQ surface F = 1.

    Equivalent of the scanner binary's ``sq::intersect(hvector,
    hvector)`` export (SURVEY.md §2.2-N2), which the reference ``main``
    never calls for anything but −z rays — this generalizes it to
    arbitrary rays, unlocking posed-camera rendering
    (:func:`render_depth_view`).

    Method: clip the ray to the SQ's bounding sphere (radius |a| around
    t; e1,e2 ∈ (0,2] keeps the body inside it), coarse-sweep ``n_sweep``
    samples for the first inside point (convexity ⇒ the inside set along
    a ray is an interval), then bisect the outside/inside bracket.

    Returns ``(t_hit, hit)``: ray parameter of the entry point (in units
    of |direction|) and a bool mask; ``t_hit`` is 0 where ``hit`` is
    False. Ray semantics: only t ≥ 0 counts. Vmap over leading dims for
    ray bundles.
    """
    dtype = p.dtype
    a, e, t, q = geometry.split_params(p)
    dn = jnp.linalg.norm(direction)
    d = direction / jnp.maximum(dn, jnp.asarray(1e-20, dtype))

    # bounding-sphere clip
    oc = origin - t
    b = jnp.dot(oc, d)
    c = jnp.dot(oc, oc) - jnp.dot(a, a)
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = jnp.maximum(-b - sq, 0.0)
    t1 = -b + sq
    miss_sphere = (disc <= 0.0) | (t1 <= 0.0)

    step = (t1 - t0) / n_sweep

    def inside(tt):
        return geometry.field_points(origin + tt * d, p, guard=True) <= 1.0

    def sweep(carry, i):
        t_in, found = carry
        tt = t0 + i.astype(dtype) * step
        ins = inside(tt)
        newly = ins & ~found
        t_in = jnp.where(newly, tt, t_in)
        return (t_in, found | ins), None

    (t_in, hit), _ = jax.lax.scan(
        sweep, (jnp.zeros((), dtype), jnp.zeros((), bool)),
        jnp.arange(n_sweep))
    hit = hit & ~miss_sphere

    # bracket: [t_in - step] is outside (or the sphere entry), t_in inside
    lo = jnp.maximum(t_in - step, t0)  # outside end
    hi = t_in                          # inside end

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        ins = inside(mid)
        return jnp.where(ins, lo, mid), jnp.where(ins, mid, hi)

    lo, hi = jax.lax.fori_loop(0, n_bisect, bisect, (lo, hi))
    t_hit = jnp.where(hit, hi / jnp.maximum(dn, jnp.asarray(1e-20, dtype)),
                      0.0)
    return t_hit, hit


SCENE_CENTER = 0.5  # the reference scene lives in the unit box


def camera_frame_params(p: jax.Array, cam_q: jax.Array) -> jax.Array:
    """SQ parameters expressed in a camera frame rotated by ``cam_q``
    (world-from-camera rotation) about the scene center (0.5, 0.5, 0.5),
    via :func:`sqtpu.ops.geometry.transform_params` — the hmatrix
    algebra the binary's ``sq::transform_g`` implements."""
    from sqtpu.ops import quaternion as quat
    c0 = jnp.full((3,), SCENE_CENTER, p.dtype)
    q_inv = quat.conjugate(cam_q)
    t2 = c0 - quat.rotate(c0, q_inv)
    return geometry.transform_params(p, q_inv, t2)


def render_depth_view(
    p: jax.Array,
    cam_q: jax.Array,
    image_size: int = 256,
    n_bisect: int = 24,
    quantize: bool = False,
    n_sweep: int | None = None,
) -> jax.Array:
    """Orthographic depth map from a POSED camera — beyond-reference
    capability (the scanner binary and the torch pipeline only ever
    render the fixed −z view): multi-view training data, shape-from-X
    experiments, turntable visualization.

    ``cam_q``: world-from-camera rotation (xyzw). The camera's pixel
    lattice and −z rays live in the camera frame, which is the world
    frame rotated about the scene center (0.5, 0.5, 0.5) so any view
    keeps the reference data distribution in frame. Identity ``cam_q``
    reproduces :func:`render_depth_hard` exactly. Implementation:
    express the SQ in the camera frame (rigid ``transform_params``) and
    reuse the verified −z ray-caster — the camera model stays
    bit-coupled to the scanner-parity path.
    """
    return render_depth_hard(
        camera_frame_params(p, cam_q), image_size,
        n_bisect=n_bisect, quantize=quantize, n_sweep=n_sweep)
