"""Config dataclasses + CLI parsing.

The reference has no config system: every knob is a hardcoded constant at
the top of each entry script (``torch/train.py:38-45,62-66``; SURVEY.md
§5.6). Here each entry point owns one dataclass, every field overridable
from the command line (``--field value``).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class TrainConfig:
    # model / loss (reference: train.py:48, 62-66)
    model: str = "resnet_sq"          # resnet_sq | generic_sq | keras_iso | keras_rot
    loss: str = "implicit"            # implicit | explicit | leastsquares | param_mse
    #   | supervised | supervised_sym | supervised_geo | implicit_sym
    #   | quaternion | quaternion_sym (rotation-only models)
    #   | keras_chamfer (the 2019 rotation regime, py/train_rotation.py)
    #   | supervised_gauge | explicit_gauge | implicit_gauge (full-D4-
    #     gauge-aware variants; see losses.param_gauge_loss)
    #   | explicit_sym (explicit geometry + D2 anchor — pair with
    #     canonical labels)
    aux_weight: float = 0.05          # supervised anchor in implicit_sym/_gauge
    gauge_weight: float = 1.0         # decomposition anchor in explicit_gauge
    geo_weight: float = 1.0           # second-moment term in supervised_geo
    # (keep small: at 5.0 the term drowns the param-MSE gradients and
    # stalls size/position learning — measured on-chip, round 2)
    shape_weight: float = 1.0         # e1/e2 column weight in the
    # explicit_sym anchor — the shape exponents are the weakest CNN
    # columns (MAE ~0.06 vs 0.006 for size at stage c4a; LM refine gets
    # 0.012/0.030 from the same images, so the signal exists and the
    # uniform anchor under-trains it)
    elong_weight: float = 0.0         # >0: weight supervised per-sample
    # losses by 1 + w·(elongation−1) — full-IoU residual anti-correlates
    # with elongation (r = −0.61, round-2 analysis)
    render_size: int = 64
    tau: float = 1.5
    sigmoid_sharpness: float = 260.0
    explicit_sharp: float = 5.0       # explicit-occupancy sharpness
    # (reference value 5, quirk Q2; at 5 the occupancy transition spans
    # ~10 voxels of a 128³ grid — raise it with the grid so fine grids
    # actually sharpen the supervision: "sharpness annealing")
    acc_render_size: int = 64         # IoU validation metric grid

    # optimization (train.py:40, 51-52)
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    grad_clip: float = 0.0            # global-norm gradient clip, 0 = off
    # (the reference never clips; the ×100-scaled explicit gradients can
    # slam a plain unnormalized encoder's sigmoid heads into saturation
    # in the first epoch — the shrink-to-sliver spurious minimum seen in
    # runs/krf_train.log. Clip ~1.0 keeps the early steps bounded.)
    batch_size: int = 32
    max_epochs: int = 100
    steps_per_epoch: int = 100        # synthetic data is infinite; define epoch
    val_steps: int = 10
    plateau_patience: int = 25
    plateau_factor: float = 0.1
    seed: int = 0

    # data
    data: str = "synthetic"           # synthetic | online | <path to BMP dir>
    labels_csv: str = ""              # CSV for directory datasets
    image_size: int = 256
    renderer: str = "hard"            # on-device GT renderer for synthetic
    train_split: float = 0.9
    shuffle: bool = True
    iso: bool = False                 # isometric-view data (2019 pipeline)
    synthetic_size: int = 0           # resident dataset size (0 = auto)
    data_cache: bool = False          # persist synthetic data to disk.
    # Default OFF: on this environment host->device uploads run ~0.5 MB/s
    # through the TPU tunnel (a 537 MB dataset takes ~20 min to re-upload),
    # while regenerating on device takes seconds once compiled.
    lr_schedule: str = "plateau"      # plateau | step2019

    # training-time sensor-noise augmentation (data/augment.depth_noise,
    # applied to train AND val inputs in-graph; labels untouched). Pair
    # with a SUPERVISED loss — the self-supervised implicit loss would
    # fit the corrupted image instead of denoising it.
    augment_gaussian: float = 0.0     # object-pixel depth noise std
    augment_dropout: float = 0.0      # object-pixel missing-return prob
    augment_salt: float = 0.0         # background flying-pixel prob
    # domain randomization: draw each magnitude PER SAMPLE uniformly in
    # [0, augment_*] instead of using the fixed maxima — a fixed-level
    # fine-tune specializes to that exact corruption (measured: clean
    # full IoU 0.886 -> 0.663, off-level noise worse than the clean
    # model); randomized levels cover the whole range incl. clean
    augment_randomize: bool = False

    # precision / parallelism
    dtype: str = "float32"
    remat: bool = False               # jax.checkpoint the fwd (HBM for FLOPs)
    n_grid: int = 1                   # mesh grid-axis size (SP over voxels)
    donate: bool = True
    platform: str = ""                # override jax platform (e.g. "cpu")

    # pretrained encoder: torchvision-resnet18-layout state_dict
    # (.pt via torch, or .npz from export_torchvision_resnet18)
    pretrained: str = ""
    # warm-start the FULL model (all heads + batch_stats) from a portable
    # save_weights_npz artifact; optimizer state starts fresh. Use to
    # branch a new training stage off an exported model when the Orbax
    # ckpt has been overwritten by a later stage.
    init_weights: str = ""
    init_base: str = ""               # refine_sq: warm-start the "base"
    # submodule from an exported resnet_sq flagship npz (the corrector
    # stays at its zeros/identity init)
    freeze_base: bool = False         # refine_sq: zero the base
    # submodule's gradients — train the corrector alone at a healthy LR
    # without drifting the converged flagship underneath it

    # checkpoint / logging (train.py:38, 45)
    ckpt_dir: str = "checkpoints/run0"
    continue_training: bool = False
    resume_from: str = "best"         # best (reference parity) | last
    reset_lr: float = 0.0             # >0: override LR after resume (loss switch)
    save_last: bool = True            # crash-recovery ckpt (periodic)
    save_last_interval: int = 5       # epochs between 'last' saves: each
    # save round-trips the full train state through the TPU tunnel
    # (~5 s/epoch measured), so every epoch is wasteful at 15 s epochs
    log_interval: int = 10
    compare_images: int = 4           # epoch-0 true/pred BMP pairs (train.py:148-151)
    nan_policy: str = "warn"          # warn | skip
    profile_dir: str = ""             # set to emit a jax.profiler trace

    # kernels
    use_pallas: bool = True           # fused implicit-loss kernel on TPU


@dataclass
class EvalConfig:
    ckpt_dir: str = "checkpoints/run0"
    model: str = "resnet_sq"
    iso: bool = False                 # 2019 isometric-view protocol
    n: int = 1000
    batch_size: int = 32
    acc_render_size: int = 128        # test_random.py:25
    seed: int = 0
    image_size: int = 256
    results_file: str = "results.txt"
    save_pairs: int = 0               # save N true/pred image pairs
    out_dir: str = "eval_out"
    platform: str = ""                # override jax platform (e.g. "cpu")

    # sensor-noise robustness protocol (sqtpu.data.augment.depth_noise):
    # corrupt the model's input depth maps; truth params still score
    noise_gaussian: float = 0.0       # object-pixel depth noise std
    noise_dropout: float = 0.0        # object-pixel missing-return prob
    noise_salt: float = 0.0           # background flying-pixel prob
    # sensor preprocessing applied to the MODEL INPUT (after corruption,
    # before the CNN and before refinement) — what a deployment would do
    # to real depth frames. "median" fills isolated dropout holes and
    # removes flying pixels (ops.image.median3): the measured rescue for
    # the dropout collapse (full IoU 0.000 -> see README robustness).
    input_filter: str = "none"        # none | despeckle | median

    # test-time refinement: polish predictions against the input image
    # (CNN init + classical iterative fit — fit.refine_params)
    refine: str = "none"              # none | lm | gd | lm+gd
    refine_steps: int = 30
    refine_size: int = 64             # LM point grid / GD render size
    refine_lr: float = 3e-3           # GD (Adam) step size
    # hardening of the refinement/classical fit against corrupted inputs
    # (pairs with --noise-*; see fit.refine_params for measured numbers —
    # under noise prefer --refine gd, optionally --refine-filter median):
    refine_robust_c: float = 0.0      # IRLS Tukey constant (4.685 =
    #   classical 95%-efficiency choice; 0 = plain least squares)
    refine_filter: str = "none"       # none | despeckle | median
    refine_residual: str = "sb"       # LM residual: sb | radial


@dataclass
class FitConfig:
    loss: str = "explicit"            # explicit | implicit | leastsquares
    render_size: int = 32
    learning_rate: float = 1e-3
    steps: int = 2000
    seed: int = 0
    tau: float = 1.5
    sigmoid_sharpness: float = 260.0
    optimizer: str = "sgd"            # sgd (visu.py parity) | adam | lm
    n_views: int = 1                  # >1 with optimizer=lm: multi-view
    # classical recovery (fit.recover_multiview) from posed turntable
    # views of the same SQ — beyond-reference
    log_interval: int = 100
    platform: str = ""                # override jax platform (e.g. "cpu")


def parse_cli(cls, argv: Optional[list] = None):
    """Build an argparse CLI from a config dataclass."""
    parser = argparse.ArgumentParser(
        description=f"sqtpu {cls.__name__}",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    for f in dataclasses.fields(cls):
        arg = "--" + f.name.replace("_", "-")
        if f.type in ("bool", bool):
            # accept both `--flag` (bare = True) and `--flag true/false`
            parser.add_argument(arg, type=lambda s: s.lower() in
                                ("1", "true", "yes"), default=f.default,
                                nargs="?", const=True)
        else:
            parser.add_argument(arg, type=type(f.default), default=f.default)
    ns = parser.parse_args(argv)
    return cls(**{f.name: getattr(ns, f.name) for f in dataclasses.fields(cls)})
