"""The training loop (reference L6, ``torch/train.py:72-175``) — TPU-first.

Differences from the reference by design:

* One jitted train step contains forward, loss (voxel render included),
  backward, and the optimizer update — nothing crosses the host boundary
  per step except the scalar loss for logging.
* Training data lives ON DEVICE: either a resident synthetic dataset
  rendered once at startup by the on-device ray-caster
  (``data="synthetic"``), per-step in-graph rendering (``data="online"``),
  or a host BMP directory (reference-dataset parity path).
* Batch axis is sharded over the mesh's 'data' axis; XLA inserts the
  gradient all-reduce (the DP story, SURVEY.md §2.3).
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sqtpu.data.synthetic import make_batch, sample_params
from sqtpu.models import build_model, params_vector
from sqtpu.ops import losses, metrics
from sqtpu.parallel.mesh import batch_sharding, make_mesh
from sqtpu.training.lr import ReduceLROnPlateau
from sqtpu.training.state import (
    SQTrainState, create_train_state, get_lr, set_lr,
)
from sqtpu.utils.checkpoint import load_checkpoint, save_checkpoint
from sqtpu.utils.config import TrainConfig
from sqtpu.utils.logging import MetricLogger, NanGuard, Throughput


def _elong_weights(cfg: TrainConfig, labels):
    """Per-sample weights emphasizing elongated shapes, or None when off.

    Round-2 per-sample analysis: closed-loop full-IoU residual
    anti-correlates with elongation max(a)/min(a) at r = −0.61 (thin
    volumes punish small absolute size/position errors), so with
    ``elong_weight`` w > 0 a sample's supervised loss is scaled by
    1 + w·(elongation − 1), normalized to mean 1 so the effective LR is
    unchanged."""
    if cfg.elong_weight <= 0:
        return None
    a = labels[..., 0:3]
    elong = jnp.max(a, axis=-1) / jnp.maximum(jnp.min(a, axis=-1), 1e-6)
    w = 1.0 + cfg.elong_weight * (elong - 1.0)
    return w / jnp.mean(w)


def _explicit_geo(cfg: TrainConfig, pred, labels, mesh=None):
    """Explicit occupancy-MSE geometry term, routed to the fused Pallas
    kernel when available (use_pallas; gradient w.r.t. pred only — the
    labels are constants here). Mirrors the implicit loss's routing:
    DP meshes wrap the kernel batch-locally via shard_map."""
    if cfg.use_pallas:
        from sqtpu.ops.kernels import explicit_loss_auto, pallas_available
        if (mesh is not None and mesh.shape.get("data", 1) > 1
                and pallas_available()):
            from sqtpu.parallel.sharded_losses import explicit_loss_dp
            return explicit_loss_dp(labels[..., :12], pred[..., :12],
                                    mesh, cfg.render_size,
                                    sharp=cfg.explicit_sharp)
        return explicit_loss_auto(labels[..., :12], pred[..., :12],
                                  cfg.render_size,
                                  sharp=cfg.explicit_sharp)
    return losses.explicit_loss(labels[..., :12], pred[..., :12],
                                cfg.render_size, sharp=cfg.explicit_sharp)


def _compute_loss(cfg: TrainConfig, pred, imgs, labels, mesh=None):
    """Loss selection (reference's commented-out alternatives,
    ``torch/train.py:62-64``, promoted to config)."""
    if cfg.loss == "implicit":
        if mesh is not None and mesh.shape.get("grid", 1) > 1:
            # voxel-grid SP: columns sharded over the 'grid' axis with a
            # psum of partial sums (SURVEY.md §5.7); runs the fused
            # Pallas kernel per column slab when available
            from sqtpu.parallel.sharded_losses import implicit_loss_gridsharded
            return implicit_loss_gridsharded(
                imgs[..., 0], pred, mesh, cfg.render_size, cfg.tau,
                cfg.sigmoid_sharpness, use_pallas=cfg.use_pallas)
        if cfg.use_pallas:
            from sqtpu.ops.kernels import implicit_loss_auto, pallas_available
            if (mesh is not None and mesh.shape.get("data", 1) > 1
                    and pallas_available()):
                # DP x Pallas: shard_map makes the kernel batch-local per
                # chip (XLA cannot auto-partition a custom call)
                from sqtpu.parallel.sharded_losses import implicit_loss_dp
                return implicit_loss_dp(
                    imgs[..., 0], pred, mesh, cfg.render_size, cfg.tau,
                    cfg.sigmoid_sharpness)
            return implicit_loss_auto(
                imgs[..., 0], pred, cfg.render_size, cfg.tau,
                cfg.sigmoid_sharpness)
        return losses.implicit_loss(
            imgs[..., 0], pred, cfg.render_size, cfg.tau,
            cfg.sigmoid_sharpness)
    if cfg.loss == "explicit":
        return _explicit_geo(cfg, pred, labels, mesh)
    if cfg.loss == "leastsquares":
        return losses.least_squares_loss(imgs[..., 0], pred, cfg.render_size)
    if cfg.loss == "param_mse":
        return losses.param_mse(pred, labels[..., : pred.shape[-1]])
    if cfg.loss == "supervised":
        # block-parameter MSE + antipodal-symmetric quaternion loss
        # (BASELINE config 2: explicit supervision of size/shape/position
        # plus rotation)
        per = (losses.param_mse(pred[..., :8], labels[..., :8],
                                reduce=False)
               + losses.quaternion_loss(pred[..., 8:12], labels[..., 8:12],
                                        reduce=False))
        w = _elong_weights(cfg, labels)
        return jnp.mean(per if w is None else per * w)
    if cfg.loss == "supervised_sym":
        # like "supervised" but rotation-symmetry-aware: the quaternion
        # target is only defined up to the SQ's D2 flip orbit (two orbit
        # members render identical images), so plain regression averages
        # over the orbit and never learns rotation — the min-over-orbit
        # loss makes the target well-posed (VERDICT round 1, weak #2).
        per = (losses.param_mse(pred[..., :8], labels[..., :8],
                                reduce=False)
               + losses.quaternion_loss_sym(pred[..., 8:12],
                                            labels[..., 8:12],
                                            reduce=False))
        w = _elong_weights(cfg, labels)
        return jnp.mean(per if w is None else per * w)
    if cfg.loss == "quaternion":
        # rotation-only experiments (GenericNetSQ,
        # torch/models.py:125-169): reference QuaternionLoss shape
        return losses.quaternion_loss(pred[..., -4:], labels[..., 8:12])
    if cfg.loss == "quaternion_sym":
        return losses.quaternion_loss_sym(pred[..., -4:],
                                          labels[..., 8:12])
    if cfg.loss == "supervised_geo":
        # supervised_sym + the observability-weighted second-moment
        # orientation term (see losses.rotation_moment_loss) — the
        # round-2 rotation warm-up recipe
        per = (losses.param_mse(pred[..., :8], labels[..., :8],
                                reduce=False)
               + losses.quaternion_loss_sym(pred[..., 8:12],
                                            labels[..., 8:12],
                                            reduce=False)
               + cfg.geo_weight * losses.rotation_moment_loss(
                   pred[..., 8:12], labels, reduce=False))
        w = _elong_weights(cfg, labels)
        return jnp.mean(per if w is None else per * w)
    if cfg.loss == "keras_chamfer":
        # the 2019 rotation regime (py/train_rotation.py:36-40 trains
        # Dense(12) under py/loss_functions.py:91-101's "chamfer_loss").
        # The pipeline's labels/predictions are torch-normalized; the TF
        # loss consumes keras normalization (quirk Q10), so both sides are
        # re-normalized inside the loss — the model's output space stays
        # consistent with every other sqtpu loss/eval path.
        # Deviations for trainability: the TF loss never clamps, so a raw
        # Dense(12) head's e ≤ 0 makes |x|^(2/e) non-finite at step 0.
        # The field therefore sees clamped params (jnp.clip subgradient:
        # identity inside the valid box, zero outside) plus a quadratic
        # penalty pulling out-of-box raw outputs back in. Two failed
        # variants are on record: a bare clamp strands params outside the
        # box (zero gradient there; |params| stuck at ~10-130 after 40
        # epochs, runs/eval_kerasrot), and a straight-through clamp lets
        # the huge field gradients (|x|^(2/e) at e = 0.1) blow raw
        # outputs to ±200 (runs/eval_kerasrot2).
        from sqtpu.ops import geometry, quaternion
        pred12 = pred[..., :12]
        clamped = geometry.clamp_params(pred12)
        clamped = clamped.at[..., 8:12].set(
            quaternion.normalize(pred12[..., 8:12]))
        range_penalty = jnp.mean(
            (pred12 - jax.lax.stop_gradient(clamped)) ** 2)
        # clip=100: the unclipped fp32 field square overflows to inf at
        # e = 0.1 (see keras_occupancy_mse) — the cap keeps all signal
        # around the surface band F = 1
        return losses.keras_occupancy_mse(
            losses.torch_to_keras_norm(labels[..., :12]),
            losses.torch_to_keras_norm(clamped), clip=100.0) + range_penalty
    if cfg.loss == "implicit_sym":
        # self-supervised depth MAE anchored by a small symmetry-aware
        # supervised term (rotation warm-up -> implicit fine-tune recipe)
        impl = _compute_loss(
            dataclasses.replace(cfg, loss="implicit"), pred, imgs, labels,
            mesh)
        sup = _compute_loss(
            dataclasses.replace(cfg, loss="supervised_sym"), pred, imgs,
            labels, mesh)
        return impl + cfg.aux_weight * sup
    if cfg.loss == "supervised_gauge":
        # fully gauge-aware supervision: min over the D4 orbit of
        # size/shape/position MSE + quat distance (losses.param_gauge_loss)
        per = losses.param_gauge_loss(pred[..., :12], labels, reduce=False)
        w = _elong_weights(cfg, labels)
        return jnp.mean(per if w is None else per * w)
    if cfg.loss == "explicit_sym":
        # explicit occupancy-MSE geometry + a D2-only supervised anchor.
        # For CANONICAL labels (sample_params default) this is the right
        # pairing: the D2 orbit-min handles the truly-unobservable flips
        # while the canonical label pins the xy-swap gauge — unlike the
        # free min-over-8 of explicit_gauge, under which the net converged
        # to a consistent ANTI-canonical convention (100% a1 < a2,
        # measured round 3) since any consistent gauge is a fixed point.
        expl = _explicit_geo(cfg, pred, labels, mesh)
        cw = None
        if cfg.shape_weight != 1.0:
            cw = jnp.asarray([1.0, 1.0, 1.0, cfg.shape_weight,
                              cfg.shape_weight, 1.0, 1.0, 1.0],
                             pred.dtype)
        per = (losses.param_mse(pred[..., :8], labels[..., :8],
                                reduce=False, col_weight=cw)
               + losses.quaternion_loss_sym(pred[..., 8:12],
                                            labels[..., 8:12],
                                            reduce=False))
        w = _elong_weights(cfg, labels)
        return expl + cfg.gauge_weight * jnp.mean(
            per if w is None else per * w)
    if cfg.loss == "explicit_gauge":
        # gauge-invariant geometry supervision (explicit occupancy MSE —
        # measured round 3: full IoU 0.92 on its own) + the gauge-aware
        # decomposition anchor that canonicalizes WHICH of the 8
        # equivalent decompositions the net outputs (high rot-IoU/low
        # gauge-angle without disturbing the geometry)
        expl = _explicit_geo(cfg, pred, labels, mesh)
        per = losses.param_gauge_loss(pred[..., :12], labels, reduce=False)
        w = _elong_weights(cfg, labels)
        return expl + cfg.gauge_weight * jnp.mean(
            per if w is None else per * w)
    if cfg.loss == "implicit_gauge":
        # self-supervised depth MAE + gauge-aware supervised anchor
        impl = _compute_loss(
            dataclasses.replace(cfg, loss="implicit"), pred, imgs, labels,
            mesh)
        per = losses.param_gauge_loss(pred[..., :12], labels, reduce=False)
        w = _elong_weights(cfg, labels)
        return impl + cfg.aux_weight * jnp.mean(
            per if w is None else per * w)
    raise ValueError(f"unknown loss {cfg.loss}")


def make_train_step(model, cfg: TrainConfig, mesh=None):
    """Build the jitted train step: fwd + loss + bwd + Adam update."""
    sharding = batch_sharding(mesh) if mesh is not None else None

    def loss_fn(params, batch_stats, imgs, labels):
        variables = {"params": params}
        mutable = []
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        outputs, mutated = model.apply(variables, imgs, train=True,
                                       mutable=mutable)
        pred = params_vector(outputs)
        loss = _compute_loss(cfg, pred, imgs, labels, mesh)
        new_stats = mutated.get("batch_stats") if mutable else None
        return loss, new_stats

    if cfg.remat:
        # rematerialize the forward during backward: trades ~1/3 extra
        # FLOPs for O(activations) HBM — lets fp32 batch-512 train steps
        # coexist with a multi-GB resident dataset on a 16 GB chip
        loss_fn = jax.checkpoint(loss_fn)

    donate = (0,) if cfg.donate else ()
    skip_nonfinite = cfg.nan_policy == "skip"

    @partial(jax.jit, donate_argnums=donate)
    def step(state: SQTrainState, imgs, labels):
        if sharding is not None:
            imgs = jax.lax.with_sharding_constraint(imgs, sharding)
            labels = jax.lax.with_sharding_constraint(labels, sharding)
        imgs = imgs.astype(jnp.float32)
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, imgs, labels)
        if cfg.freeze_base and "base" in grads:
            # refine_sq: train only the corrector — the warm-started
            # base stays fixed (zero grads keep the Adam state inert;
            # wd is 0 in every recipe, so no decay drift either)
            grads = dict(grads, base=jax.tree_util.tree_map(
                jnp.zeros_like, grads["base"]))
        new_state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            new_state = new_state.replace(batch_stats=new_stats)
        if skip_nonfinite:
            # nan_policy="skip": discard the whole update when the loss is
            # non-finite. Must happen IN-graph — with buffer donation the
            # pre-update state no longer exists on the host side.
            ok = jnp.isfinite(loss)
            new_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old)
                if hasattr(new, "dtype") else new,
                new_state, state)
        return new_state, loss

    return step


def make_eval_step(model, cfg: TrainConfig, mesh=None):
    """Validation: loss + IoU accuracy (``torch/train.py:135-154``)."""
    sharding = batch_sharding(mesh) if mesh is not None else None

    @jax.jit
    def step(state: SQTrainState, imgs, labels):
        if sharding is not None:
            imgs = jax.lax.with_sharding_constraint(imgs, sharding)
            labels = jax.lax.with_sharding_constraint(labels, sharding)
        imgs = imgs.astype(jnp.float32)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        outputs = model.apply(variables, imgs, train=False)
        pred = params_vector(outputs)
        loss = _compute_loss(cfg, pred, imgs, labels, mesh)
        if pred.shape[-1] == 12:
            acc = metrics.iou(labels, pred, cfg.acc_render_size)
            # rotation error modulo the SQ's exact D2 symmetry — the
            # per-epoch curve VERDICT's rotation story is judged on
            ang = jnp.mean(metrics.angle_error_sym(labels[..., 8:12],
                                                   pred[..., 8:12]))
        elif pred.shape[-1] == 4:
            # rotation-only model: score the quaternion against the
            # rotation block of the labels
            ang = jnp.mean(metrics.angle_error_sym(labels[..., 8:12], pred))
            acc = -ang
        else:
            acc = -losses.param_mae(pred, labels[..., : pred.shape[-1]])
            ang = jnp.zeros((), imgs.dtype)
        return loss, acc, ang, pred

    return step


# ---------------------------------------------------------------------------
# Data sources
# ---------------------------------------------------------------------------

class SyntheticResident:
    """Device-resident synthetic dataset rendered once at startup.

    Mirrors the reference's fixed pre-rendered dataset regime (150k
    scanner BMPs packed to HDF5) with zero disk or host involvement:
    images stay in HBM as uint8, batches are gathered on device.
    """

    def __init__(self, cfg: TrainConfig, size: int, seed: int = 0,
                 chunk: int = 256):
        self.cfg = cfg
        # pad the requested size up to the generation chunk BEFORE the
        # cache lookup so cached and freshly-generated datasets have the
        # same size and hence the same train/val split
        size = ((size + chunk - 1) // chunk) * chunk
        self.size = size
        cache = self._cache_path(cfg, size, seed)
        if cache and os.path.exists(cache):
            data = np.load(cache)
            self.images = jnp.asarray(data["images"])
            self.labels = jnp.asarray(data["labels"])
            size = self.size = int(self.images.shape[0])
            MetricLogger.line(f"loaded synthetic dataset cache {cache}")
        else:
            key = jax.random.PRNGKey(seed)
            n_pad = size

            # Fill a preallocated uint8 volume in place (donated buffers):
            # chunk-list + concatenate would transiently hold 2x the
            # dataset in HBM and OOM a 16 GB chip at ~100k 256^2 images.
            @partial(jax.jit, donate_argnums=(0, 1))
            def fill_chunk(images, labels, k, start):
                imgs, lbls = make_batch(
                    k, chunk, cfg.image_size, cfg.renderer, iso=cfg.iso
                )
                u8 = (imgs[..., 0] * 255.0).astype(jnp.uint8)
                images = jax.lax.dynamic_update_slice_in_dim(
                    images, u8, start, axis=0)
                labels = jax.lax.dynamic_update_slice_in_dim(
                    labels, lbls, start, axis=0)
                return images, labels

            images = jnp.zeros((n_pad, cfg.image_size, cfg.image_size),
                               jnp.uint8)
            labels = jnp.zeros((n_pad, 12), jnp.float32)
            for i in range(0, n_pad, chunk):
                k = jax.random.fold_in(key, i)
                images, labels = fill_chunk(images, labels, k,
                                            jnp.asarray(i, jnp.int32))
            self.images = images  # (N, S, S) uint8
            self.labels = labels  # (N, 12)
            if cache:
                os.makedirs(os.path.dirname(cache), exist_ok=True)
                np.savez(cache, images=np.asarray(self.images),
                         labels=np.asarray(self.labels))
        n_train = int(cfg.train_split * size)
        self.n_train, self.n_val = n_train, size - n_train
        if self.n_val == 0:
            # JAX clamps out-of-bounds gathers, so an empty val split would
            # silently validate on the last TRAIN image
            raise ValueError(
                f"train_split={cfg.train_split} leaves no validation "
                f"samples in a {size}-image synthetic dataset")

        @jax.jit
        def gather(images, labels, key, lo, n):
            # images/labels ride as device-buffer ARGUMENTS: capturing
            # them in the closure embeds the whole dataset into the HLO
            # as a constant (observed as an HTTP 413 from the remote
            # compile service on a 537 MB program)
            idx = jax.random.randint(key, (cfg.batch_size,), lo, lo + n)
            imgs = images[idx].astype(jnp.float32) / 255.0
            return imgs[..., None], labels[idx]

        self._gather = gather

    @staticmethod
    def _cache_path(cfg: TrainConfig, size: int, seed: int):
        if not cfg.ckpt_dir or not getattr(cfg, "data_cache", False):
            return None
        name = (f"synth_{size}_{cfg.image_size}_{cfg.renderer}"
                f"_iso{int(cfg.iso)}_s{seed}.npz")
        return os.path.join("data_cache", name)

    def train_batch(self, key):
        return self._gather(self.images, self.labels, key, 0, self.n_train)

    def val_batch(self, key):
        return self._gather(self.images, self.labels, key, self.n_train,
                            max(self.n_val, 1))


# ---------------------------------------------------------------------------
# The loop
# ---------------------------------------------------------------------------

def train(cfg: TrainConfig, synthetic_size: Optional[int] = None):
    """Run training per config; returns (state, history)."""
    logger = MetricLogger(cfg.ckpt_dir or "", "train")
    nan_guard = NanGuard(cfg.nan_policy)
    mesh = make_mesh(n_grid=cfg.n_grid)

    dtype = {"float32": None, "bfloat16": jnp.bfloat16}[cfg.dtype]
    model = build_model(cfg.model, dtype=dtype)
    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    state = create_train_state(model, init_key, cfg)
    if cfg.pretrained:
        # pretrained encoder init (reference always trains from ImageNet
        # resnet18, torch/models.py:181-184): any torchvision-layout
        # state_dict — a real torchvision .pt, or an exported TPU-trained
        # encoder (.npz from export_torchvision_resnet18)
        from sqtpu.models import (load_state_dict_file,
                                  load_torchvision_resnet18)
        variables = load_torchvision_resnet18(
            {"params": state.params, "batch_stats": state.batch_stats},
            load_state_dict_file(cfg.pretrained))
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        MetricLogger.line(f"loaded pretrained encoder from {cfg.pretrained}")
    if cfg.init_weights:
        # full-model warm start from a portable npz (fresh optimizer) —
        # branches a new stage off an exported model even after the Orbax
        # ckpt was overwritten by a later stage
        from sqtpu.utils.checkpoint import load_weights_npz
        variables = load_weights_npz(
            cfg.init_weights,
            {"params": state.params, "batch_stats": state.batch_stats})
        state = state.replace(params=variables["params"],
                              batch_stats=variables.get("batch_stats"))
        MetricLogger.line(f"warm-started all weights from {cfg.init_weights}")
    if cfg.init_base:
        # refine_sq: base submodule from a flagship resnet_sq npz; the
        # corrector keeps its identity init, so step 0 scores exactly
        # like the flagship
        from sqtpu.models.refiner import warm_start_base
        variables = warm_start_base(
            {"params": state.params, "batch_stats": state.batch_stats},
            cfg.init_base)
        state = state.replace(params=variables["params"],
                              batch_stats=variables.get("batch_stats"))
        MetricLogger.line(f"warm-started base from {cfg.init_base}")
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(state.params))
    MetricLogger.line(f"model={cfg.model} params={n_params:,} "
                      f"loss={cfg.loss} mesh={dict(mesh.shape)}")

    train_step = make_train_step(model, cfg, mesh)
    eval_step = make_eval_step(model, cfg, mesh)

    # ----- data
    if cfg.data == "synthetic":
        size = (synthetic_size or cfg.synthetic_size
                or max(cfg.batch_size * cfg.steps_per_epoch // 4,
                       cfg.batch_size * 4))
        MetricLogger.line(f"rendering {size} synthetic depth maps on device…")
        dataset = SyntheticResident(cfg, size, cfg.seed)
        host_dataset = None
    elif cfg.data == "online":
        dataset = None
        host_dataset = None
    else:
        from sqtpu.data.datasets import DepthDataset
        from sqtpu.data.labels import parse_csv_torch
        labels = parse_csv_torch(cfg.labels_csv)
        host_dataset = DepthDataset(cfg.data, labels, cfg.train_split)
        dataset = None

    @partial(jax.jit, static_argnames=())
    def online_batch(k):
        return make_batch(k, cfg.batch_size, cfg.image_size, cfg.renderer,
                          iso=cfg.iso)

    # training-time sensor-noise augmentation: corrupt the model INPUT
    # in-graph, labels untouched (the robustness protocol of
    # evaluate --noise-* is the matching measurement)
    augment = (getattr(cfg, "augment_gaussian", 0.0)
               or getattr(cfg, "augment_dropout", 0.0)
               or getattr(cfg, "augment_salt", 0.0))
    if augment:
        from sqtpu.data.augment import depth_noise

        @jax.jit
        def _augment(k, batch):
            imgs, lbls = batch
            g, d, s = (cfg.augment_gaussian, cfg.augment_dropout,
                       cfg.augment_salt)
            if cfg.augment_randomize:
                # per-sample magnitudes U(0, max): the batch spans the
                # whole corruption range including clean, so the model
                # cannot specialize to one noise level
                b = imgs.shape[0]
                km = jax.random.split(jax.random.fold_in(k, 99), 3)
                u = lambda kk: jax.random.uniform(
                    kk, (b, 1, 1), imgs.dtype)
                g = g * u(km[0]) if g else 0.0
                d = d * u(km[1]) if d else 0.0
                s = s * u(km[2]) if s else 0.0
            noisy = depth_noise(
                k, imgs[..., 0], gaussian=g, dropout=d, salt=s,
                quantize=True)[..., None]
            return noisy, lbls
    else:
        def _augment(k, batch):
            return batch

    def train_batches(epoch_key, epoch=0):
        if host_dataset is not None:
            for s, batch in enumerate(host_dataset.batches(
                    host_dataset.train_indices, cfg.batch_size,
                    shuffle=cfg.shuffle, seed=cfg.seed + epoch)):
                yield _augment(jax.random.fold_in(epoch_key, 777 + s), batch)
            return
        for s in range(cfg.steps_per_epoch):
            k = jax.random.fold_in(epoch_key, s)
            yield _augment(jax.random.fold_in(k, 777),
                           dataset.train_batch(k) if dataset is not None
                           else online_batch(k))

    def val_batches(epoch_key):
        if host_dataset is not None:
            for s, batch in enumerate(host_dataset.batches(
                    host_dataset.val_indices, cfg.batch_size,
                    drop_remainder=False)):
                yield _augment(jax.random.fold_in(epoch_key, 20_000 + s), batch)
            return
        for s in range(cfg.val_steps):
            k = jax.random.fold_in(epoch_key, 10_000 + s)
            yield _augment(jax.random.fold_in(k, 778),
                           dataset.val_batch(k) if dataset is not None
                           else online_batch(k))

    # ----- resume
    history = {"loss": [], "val_loss": [], "val_acc": []}
    reset_best = False
    start_epoch = 0
    ckpt_path = os.path.join(cfg.ckpt_dir, "best")
    last_path = os.path.join(cfg.ckpt_dir, "last")
    resume_path = last_path if getattr(cfg, "resume_from", "best") == "last" \
        else ckpt_path
    if cfg.continue_training and os.path.exists(os.path.abspath(resume_path)):
        MetricLogger.line("Continuing with training…")
        tree, history, saved_epoch = load_checkpoint(resume_path, state)
        state = tree
        # The checkpoint stores the last COMPLETED epoch (its history entry
        # is already in `history`); resume at the next one, otherwise every
        # resume re-runs an epoch and duplicates its history entry
        # (round-4 advisor: 26 history entries at "epoch 24").
        start_epoch = saved_epoch + 1
        history = {"loss": [], "val_loss": [], "val_acc": [],
                   **{k: list(v) for k, v in history.items()}}
        if cfg.reset_lr > 0:
            # loss-switch fine-tunes resume from a plateau-decayed LR;
            # this restores a sensible starting LR, and the best-val
            # baseline no longer applies across losses (the history
            # lists themselves stay epoch-aligned)
            state = set_lr(state, cfg.reset_lr)
            reset_best = True
            MetricLogger.line(f"reset LR to {cfg.reset_lr:g} on resume")

    scheduler = ReduceLROnPlateau(get_lr(state), cfg.plateau_patience,
                                  cfg.plateau_factor)
    finite_vals = [v for v in history.get("val_loss", [])
                   if np.isfinite(v)]
    best_val = None if (reset_best or not finite_vals) else min(finite_vals)
    meter = Throughput()

    # Fixed validation key: val batches are IDENTICAL across epochs, so
    # best-checkpoint selection and the plateau scheduler compare model
    # quality, not sampling noise (round-1 advisor finding).
    val_key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 0x7A1)

    profile_stack = contextlib.ExitStack()
    if cfg.profile_dir:
        from sqtpu.utils.profiling import trace
        profile_stack.enter_context(trace(cfg.profile_dir))

    epoch = last_saved_epoch = start_epoch - 1
    for epoch in range(start_epoch, cfg.max_epochs):
        key, epoch_key = jax.random.split(key)
        # Steps are dispatched asynchronously; the loss is fetched to host
        # only every log_interval steps (each float() is a full round-trip
        # through the TPU tunnel — the per-step sync cost the reference's
        # running-mean print also pays, train.py:118-127). Non-finite
        # protection stays IN-graph via nan_policy="skip"; the host-side
        # guard warns at the sync cadence.
        losses_dev = []
        meter.reset()
        for step_idx, (imgs, labels) in enumerate(
                train_batches(epoch_key, epoch)):
            state, loss = train_step(state, imgs, labels)
            losses_dev.append(loss)
            meter.update(int(imgs.shape[0]))
            if step_idx % cfg.log_interval == 0:
                loss_val = float(loss)  # host sync — fences the chain
                nan_guard.check(loss_val)
                MetricLogger.progress(
                    f"Train Epoch: {epoch} Step: {step_idx} "
                    f"Loss: {loss_val:.6f} ({meter.rate:.0f} imgs/s)")
        if losses_dev:
            # one fence + one transfer for the whole epoch
            epoch_losses = np.asarray(jax.device_get(jnp.stack(losses_dev)))
            finite = epoch_losses[np.isfinite(epoch_losses)]
            train_loss = float(finite.mean()) if finite.size else float("nan")
            if finite.size < epoch_losses.size:
                MetricLogger.line(
                    f"[nan-guard] {epoch_losses.size - finite.size} "
                    f"non-finite step losses this epoch")
        else:
            train_loss = float("nan")
        epoch_rate = meter.rate  # honest: the stack fetch above is a fence
        history["loss"].append(train_loss)

        val_losses, val_accs, val_angs = [], [], []
        val_first = None
        for imgs, labels in val_batches(val_key):
            l, a, ang, pred = eval_step(state, imgs, labels)
            if val_first is None:
                val_first = (imgs, pred)
            val_losses.append(l)
            val_accs.append(a)
            val_angs.append(ang)
        if val_losses:
            val_loss = float(np.mean(jax.device_get(jnp.stack(val_losses))))
            val_acc = float(np.mean(jax.device_get(jnp.stack(val_accs))))
            val_ang = float(np.mean(jax.device_get(jnp.stack(val_angs))))
        else:
            val_loss = val_acc = val_ang = float("nan")
        history["val_loss"].append(val_loss)
        history["val_acc"].append(val_acc)
        ang_hist = history.setdefault("val_angle_sym", [])
        # checkpoints saved before this metric existed: pad so every
        # history list stays epoch-aligned
        while len(ang_hist) < len(history["val_loss"]) - 1:
            ang_hist.append(float("nan"))
        ang_hist.append(val_ang)

        if (epoch == 0 and cfg.ckpt_dir and cfg.compare_images > 0
                and val_first is not None
                and val_first[1].shape[-1] == 12):
            # (guarded: 8-param models — keras_iso — can't be rendered)
            # epoch-0 true/pred compare renders, reference parity
            # (torch/train.py:148-151 -> helpers.py:71-81)
            _save_compare_images(cfg, val_first[0], val_first[1],
                                 os.path.join(cfg.ckpt_dir, "compare"))

        if cfg.lr_schedule == "step2019":
            from sqtpu.training.lr import step_schedule_2019
            new_lr = step_schedule_2019(epoch)
        else:
            new_lr = scheduler.step(val_loss)
        if abs(new_lr - get_lr(state)) > 1e-6 * max(new_lr, 1e-12):
            # tolerance: the scheduler's float64 lr vs the state's fp32
            # copy differ in the last ulp forever after a reduction
            MetricLogger.line(f"Reducing learning rate to {new_lr:g}")
            state = set_lr(state, new_lr)

        # non-finite val_loss must neither become the saved "best" nor
        # poison best_val (NaN compares False forever after)
        if cfg.ckpt_dir and np.isfinite(val_loss) and (
                best_val is None or val_loss < best_val):
            best_val = val_loss
            save_checkpoint(ckpt_path, state, history, epoch, config=cfg)
            saved = " [saved]"
        else:
            saved = ""
        last_every = max(int(getattr(cfg, "save_last_interval", 1)), 1)
        if cfg.ckpt_dir and getattr(cfg, "save_last", True) and (
                epoch % last_every == last_every - 1):
            # crash-recovery checkpoint (SURVEY.md §5.3: the reference has
            # no failure-recovery story beyond manual best-ckpt restarts)
            save_checkpoint(last_path, state, history, epoch, config=cfg)
            last_saved_epoch = epoch
        MetricLogger.line(
            f"Epoch {epoch}: loss {train_loss:.6f}  val_loss {val_loss:.6f} "
            f"val_acc {val_acc:.6f}  {epoch_rate:.0f} imgs/s{saved}")
        logger.log(epoch=epoch, loss=train_loss, val_loss=val_loss,
                   val_acc=val_acc, val_angle_sym=val_ang,
                   lr=get_lr(state), imgs_per_sec=epoch_rate)

    # 'last' must reflect the final state on ANY loop exit (normal end,
    # early stop, or a future break path) — the periodic save above can be
    # up to save_last_interval-1 epochs stale (round-2 advisor finding)
    if (cfg.ckpt_dir and getattr(cfg, "save_last", True)
            and epoch > last_saved_epoch):
        save_checkpoint(last_path, state, history, epoch, config=cfg)
    profile_stack.close()
    return state, history


def _save_compare_images(cfg: TrainConfig, imgs, pred, out_dir: str):
    """Write true/pred depth BMP pairs for the first few validation
    samples (``helpers.py:71-81`` wrote the same via two scanner
    shell-outs per sample; here the prediction render is on-device)."""
    from sqtpu.data.bmp import write_bmp
    from sqtpu.ops.render import render_depth_hard

    os.makedirs(out_dir, exist_ok=True)
    n = min(cfg.compare_images, int(imgs.shape[0]))
    pred_imgs = jax.vmap(
        lambda pi: render_depth_hard(pi, cfg.image_size, quantize=True)
    )(pred[:n])
    for i in range(n):
        true_u8 = (np.asarray(imgs[i, ..., 0]) * 255).astype(np.uint8)
        pred_u8 = (np.asarray(pred_imgs[i]) * 255).astype(np.uint8)
        write_bmp(os.path.join(out_dir, f"{i}_true.bmp"), true_u8)
        write_bmp(os.path.join(out_dir, f"{i}_pred.bmp"), pred_u8)
