"""Visualization & loss-landscape diagnostics (reference L0).

Host-side equivalents of the reference's diagnostics, matplotlib-gated
(no open3d / cv2 dependency):

* :func:`slerp_sweep` — the loss & IoU vs rotation-angle experiment from
  the commented-out block in ``torch/classes.py:478-608`` (quaternion
  slerp between two orientations, evaluate any loss + IoU at each step),
  fully vmapped.
* :func:`depth_grid` — true/pred depth-image pairs side by side
  (``helpers.py:71-100`` compare_images, sans cv2 windows).
* :func:`voxel_scatter` — the occupancy scatter of ``plot_render``
  (``helpers.py:108-173``).
* :func:`plot_grad_flow` — per-layer gradient magnitudes
  (``helpers.py:242-268``) for a Flax param/grad tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sqtpu.ops import geometry, losses, metrics
from sqtpu.ops import quaternion as quat


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    return plt


def slerp_sweep(
    base_params: jax.Array,
    q_start: jax.Array,
    q_end: jax.Array,
    loss_name: str = "explicit",
    n: int = 200,
    render_size: int = 32,
    out_png: str | None = None,
):
    """Sweep pred quaternion along slerp(q_start→q_end), measuring the
    loss and IoU against fixed true params. Returns (angles_rad, losses,
    ious); optionally saves the twin-axis plot of ``classes.py:584-602``.
    """
    t = jnp.linspace(0.0, 1.0, n, dtype=base_params.dtype)
    qs = quat.slerp(q_start, q_end, t)  # (n, 4)
    true_p = base_params[None]
    q_true = base_params[8:12]
    if loss_name == "implicit":  # loop-invariant target, render once
        from sqtpu.ops.render import render_depth_soft
        target_img = render_depth_soft(base_params, render_size)[None]

    def eval_one(qi):
        pred = base_params.at[8:12].set(qi)[None]
        if loss_name == "explicit":
            l = losses.explicit_loss(true_p, pred, render_size)
        elif loss_name == "implicit":
            l = losses.implicit_loss(target_img, pred, render_size)
        elif loss_name == "quaternion":
            l = losses.quaternion_loss(qi[None], q_true[None])
        else:
            raise ValueError(loss_name)
        iou = metrics.iou(true_p, pred, render_size)
        ang = metrics.angle_error(q_true[None], qi[None])[0]
        return l, iou, ang

    ls, ious, angs = jax.lax.map(eval_one, qs)
    ls, ious, angs = map(np.asarray, (ls, ious, angs))

    if out_png:
        plt = _plt()
        fig, ax1 = plt.subplots()
        ax1.set_xlabel("Angle (deg)")
        ax1.set_ylabel("Loss", color="tab:red")
        ax1.plot(np.rad2deg(angs), ls, color="tab:red")
        ax2 = ax1.twinx()
        ax2.set_ylabel("Accuracy", color="tab:blue")
        ax2.plot(np.rad2deg(angs), ious, color="tab:blue")
        fig.tight_layout()
        fig.savefig(out_png, dpi=120)
        plt.close(fig)
    return angs, ls, ious


def depth_grid(true_imgs, pred_imgs, out_png: str, max_n: int = 8):
    """Side-by-side true|pred depth pairs, one row per sample."""
    plt = _plt()
    n = min(len(true_imgs), max_n)
    fig, axes = plt.subplots(n, 2, figsize=(6, 3 * n), squeeze=False)
    for i in range(n):
        axes[i][0].imshow(np.asarray(true_imgs[i]), cmap="gray",
                          vmin=0, vmax=1)
        axes[i][0].set_title("true")
        axes[i][1].imshow(np.asarray(pred_imgs[i]), cmap="gray",
                          vmin=0, vmax=1)
        axes[i][1].set_title("pred")
        for ax in axes[i]:
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_png, dpi=100)
    plt.close(fig)


PLOT_RENDER_MODES = ("all", "in", "in_inv", "bit", "shell")


def voxel_scatter(p: jax.Array, out_png: str, n: int = 24,
                  mode: str = "in", eps: float = 0.1):
    """3-D scatter of a voxelized field — all five ``plot_render`` display
    modes of the reference (``helpers.py:117-133``):

    * ``"all"``    — every voxel, colored by field value
    * ``"in"``     — voxels with F ≤ 1 (inside), rest faint (α=0.2)
    * ``"in_inv"`` — voxels with F > 0.9, rest faint
    * ``"bit"``    — the binarized occupancy (F ≤ 1 -> 1) at full alpha
      (the reference applied ``== 1`` to an already-binarized input
      array; on the continuous field that set has measure zero, so the
      field is binarized first)
    * ``"shell"``  — |F − 1| < eps, the surface shell
    """
    if mode not in PLOT_RENDER_MODES:
        raise ValueError(f"mode {mode!r} not in {PLOT_RENDER_MODES}")
    plt = _plt()
    ax1d = geometry.make_axis(n, "iou", dtype=p.dtype)
    f = np.asarray(geometry.field_grid(ax1d, ax1d, ax1d, p, guard=False))
    g = np.meshgrid(np.asarray(ax1d), np.asarray(ax1d), np.asarray(ax1d),
                    indexing="ij")
    if mode == "all":
        disp, opacity = f >= 0, 0.0
    elif mode == "in":
        disp, opacity = f <= 1, 0.2
    elif mode == "in_inv":
        disp, opacity = f > 0.9, 0.2
    elif mode == "bit":
        f = (f <= 1).astype(np.float32)
        disp, opacity = f == 1, 0.0
    else:  # shell
        disp, opacity = (f < 1 + eps) & (f > 1 - eps), 0.0
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    ax.scatter(g[0][disp], g[1][disp], g[2][disp], c=f[disp], cmap="jet",
               marker="o", s=4)
    if opacity > 0:
        hid = ~disp
        ax.scatter(g[0][hid], g[1][hid], g[2][hid], c=f[hid], cmap="jet",
                   marker="o", s=2, alpha=opacity)
    ax.set(xlim=(0, 1), ylim=(0, 1), zlim=(0, 1))
    fig.savefig(out_png, dpi=100)
    plt.close(fig)


def plot_points(points, out_png: str, lims=(-1.0, 1.0)):
    """3-D point scatter (``helpers.py:176-185`` ``plot_points``) —
    e.g. for depth-image point lifts or SQ surface samples.
    ``points``: (N, 3) array."""
    plt = _plt()
    pts = np.asarray(points)
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], marker="o")
    ax.set(xlim=lims, ylim=lims, zlim=lims)
    ax.set_xlabel("X Axis")
    ax.set_ylabel("Y Axis")
    ax.set_zlabel("Z Axis")
    fig.savefig(out_png, dpi=100)
    plt.close(fig)


def fit_view(cfg, target_params: jax.Array, out_png: str,
             n_frames: int = 6, key=None):
    """Headless equivalent of ``visu.py``'s live open3d fitting window
    (``visu.py:123-192``): run the gradient-descent fit in segments and
    render one panel per snapshot — true SQ surface (gray) vs current
    fit (colored), loss in the title. Returns the per-frame params.
    """
    import dataclasses

    from sqtpu.fit import gd_fit

    plt = _plt()
    seg = dataclasses.replace(cfg, steps=max(cfg.steps // n_frames, 1))
    p = None
    frames, losses_hist = [], []
    k = key if key is not None else jax.random.PRNGKey(cfg.seed)
    for _ in range(n_frames):
        p, hist = gd_fit(seg, target_params=target_params, p0=p, key=k)
        frames.append(np.asarray(p))
        losses_hist.append(float(np.asarray(hist)[-1]))

    true_pts = np.asarray(geometry.sample_surface(target_params, 32, 16))
    fig, axes = plt.subplots(1, n_frames, figsize=(3 * n_frames, 3),
                             subplot_kw={"projection": "3d"},
                             squeeze=False)
    for i, (pf, ax) in enumerate(zip(frames, axes[0])):
        fit_pts = np.asarray(
            geometry.sample_surface(jnp.asarray(pf), 32, 16))
        ax.scatter(true_pts[:, 0], true_pts[:, 1], true_pts[:, 2],
                   s=2, c="lightgray")
        ax.scatter(fit_pts[:, 0], fit_pts[:, 1], fit_pts[:, 2],
                   s=2, c=fit_pts[:, 2], cmap="jet")
        ax.set(xlim=(0, 1), ylim=(0, 1), zlim=(0, 1))
        ax.set_title(f"step {(i + 1) * seg.steps}\nloss {losses_hist[i]:.4f}",
                     fontsize=7)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_png, dpi=100)
    plt.close(fig)
    return frames


def fit_animation(cfg, target_params: jax.Array, out_html: str,
                  n_frames: int = 24, key=None):
    """Animated per-step playback of the gradient-descent fit — the
    headless equivalent of ``visu.py``'s LIVE open3d window updating
    every optimizer step (``torch/visu.py:96-141,189-192``).

    Renders one 3-D snapshot per fit segment and embeds them as base64
    PNGs in a self-contained HTML file with play/pause + a step slider
    (no pillow/ffmpeg in this image, so HTML replaces a GIF). Returns
    the per-frame params.
    """
    import base64
    import dataclasses
    import io

    from sqtpu.fit import gd_fit

    plt = _plt()
    seg = dataclasses.replace(cfg, steps=max(cfg.steps // n_frames, 1))
    k = key if key is not None else jax.random.PRNGKey(cfg.seed)
    true_pts = np.asarray(geometry.sample_surface(target_params, 32, 16))

    p = None
    frames_b64, losses_hist = [], []
    for i in range(n_frames):
        p, hist = gd_fit(seg, target_params=target_params, p0=p, key=k)
        loss_i = float(np.asarray(hist)[-1])
        losses_hist.append(loss_i)
        fit_pts = np.asarray(geometry.sample_surface(jnp.asarray(p), 32, 16))
        fig = plt.figure(figsize=(4, 4))
        ax = fig.add_subplot(projection="3d")
        ax.scatter(true_pts[:, 0], true_pts[:, 1], true_pts[:, 2],
                   s=2, c="lightgray")
        ax.scatter(fit_pts[:, 0], fit_pts[:, 1], fit_pts[:, 2],
                   s=2, c=fit_pts[:, 2], cmap="jet")
        ax.set(xlim=(0, 1), ylim=(0, 1), zlim=(0, 1))
        ax.set_title(f"step {(i + 1) * seg.steps}   loss {loss_i:.5f}",
                     fontsize=9)
        ax.axis("off")
        buf = io.BytesIO()
        fig.savefig(buf, format="png", dpi=90)
        plt.close(fig)
        frames_b64.append(base64.b64encode(buf.getvalue()).decode())

    imgs_js = ",".join(f'"{b}"' for b in frames_b64)
    html = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>sqtpu fit playback</title></head>
<body style="font-family:sans-serif;text-align:center">
<h3>Gradient-descent SQ fit ({cfg.loss} loss, {cfg.steps} steps)</h3>
<img id="f" style="max-width:480px"><br>
<button onclick="toggle()" id="b">pause</button>
<input type="range" id="s" min="0" max="{n_frames - 1}" value="0"
 oninput="show(+this.value)" style="width:360px">
<span id="t"></span>
<script>
const imgs = [{imgs_js}];
let i = 0, playing = true;
function show(j) {{
  i = j;
  document.getElementById('f').src = 'data:image/png;base64,' + imgs[i];
  document.getElementById('s').value = i;
  document.getElementById('t').textContent = (i + 1) + '/' + imgs.length;
}}
function toggle() {{
  playing = !playing;
  document.getElementById('b').textContent = playing ? 'pause' : 'play';
}}
setInterval(() => {{ if (playing) show((i + 1) % imgs.length); }}, 250);
show(0);
</script></body></html>"""
    with open(out_html, "w") as f:
        f.write(html)
    return losses_hist


def plot_grad_flow(grads, out_png: str):
    """Mean/max |grad| per layer for a Flax grad tree
    (``helpers.py:242-268`` equivalent)."""
    plt = _plt()
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    names, means, maxs = [], [], []
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "bias" in name:
            continue
        a = np.abs(np.asarray(leaf))
        names.append(name)
        means.append(a.mean())
        maxs.append(a.max())
    fig, ax = plt.subplots(figsize=(max(6, len(names) * 0.3), 4))
    ax.bar(range(len(maxs)), maxs, alpha=0.3, color="c", label="max")
    ax.bar(range(len(means)), means, alpha=0.5, color="b", label="mean")
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation="vertical", fontsize=5)
    ax.set_ylabel("|gradient|")
    ax.set_yscale("log")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return names, means, maxs


def plot_history(ckpt_or_jsonl: str, out_png: str):
    """Loss-curve plot from a checkpoint dir or a metrics.jsonl
    (``torch/helpers.py:323-327`` equivalent: the reference loads a
    checkpoint and plots its stored loss history).

    Accepts either a training ``--ckpt-dir`` (reads the history stored in
    ``last.meta.json``, falling back to ``best.meta.json``) or a path to
    a ``*_metrics.jsonl`` log. Returns the history dict.
    """
    import json
    import os

    if os.path.isdir(ckpt_or_jsonl):
        meta_path = None
        for name in ("last.meta.json", "best.meta.json"):
            cand = os.path.join(ckpt_or_jsonl, name)
            if os.path.exists(cand):
                meta_path = cand
                break
        if meta_path is None:
            raise FileNotFoundError(
                f"no last/best.meta.json under {ckpt_or_jsonl}")
        with open(meta_path) as f:
            history = json.load(f)["history"]
    else:
        history = {}
        with open(ckpt_or_jsonl) as f:
            for line in f:
                rec = json.loads(line)
                for k, v in rec.items():
                    if isinstance(v, (int, float)) and k != "epoch":
                        history.setdefault(k, []).append(v)

    plt = _plt()
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    for k in sorted(history):
        vals = np.asarray(history[k], dtype=np.float64)
        if "loss" in k and np.isfinite(vals).any():
            ax1.plot(vals, label=k)
        elif ("acc" in k or "angle" in k) and np.isfinite(vals).any():
            ax2.plot(vals, label=k)
    ax1.set_xlabel("epoch")
    ax1.set_ylabel("loss")
    ax1.set_yscale("log")
    ax1.legend(fontsize=8)
    ax2.set_xlabel("epoch")
    ax2.set_ylabel("metric")
    ax2.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return history


def turntable(
    p: jax.Array,
    out_png: str,
    n_views: int = 8,
    image_size: int = 128,
    axis=(0.0, 1.0, 0.0),
):
    """Grid of depth renders from ``n_views`` camera orientations
    spinning about ``axis`` (default y: the viewer looks along −z, so a
    y-spin walks around the object; a z-spin would only rotate the
    image in-plane) — the multi-view counterpart of the
    reference's single fixed-view debug renders (torch/visu.py shows one
    open3d window; this is the headless, arbitrary-view equivalent built
    on :func:`sqtpu.ops.render.render_depth_view`). Returns the (n,
    S, S) stack and saves the panel."""
    import numpy as np

    from sqtpu.ops.render import render_depth_view

    ax = jnp.asarray(axis, p.dtype)
    ax = ax / jnp.linalg.norm(ax)
    angles = jnp.linspace(0.0, 2.0 * jnp.pi, n_views, endpoint=False,
                          dtype=p.dtype)
    views = []
    for th in angles:
        cam_q = jnp.concatenate([ax * jnp.sin(th / 2),
                                 jnp.cos(th / 2)[None]])
        views.append(np.asarray(render_depth_view(p, cam_q, image_size)))
    views = np.stack(views)

    plt = _plt()
    cols = min(4, n_views)
    rows = -(-n_views // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(2.2 * cols, 2.2 * rows))
    for i, a in enumerate(np.atleast_1d(axes).ravel()):
        if i < n_views:
            a.imshow(views[i], cmap="gray", vmin=0, vmax=1)
            a.set_title(f"{float(angles[i]) * 180 / 3.14159:.0f}°",
                        fontsize=8)
        a.axis("off")
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)
    return views
