"""Configuration tree for the CoPoNeRF-TPU framework.

One dataclass per subsystem; the reference's hardcoded constants
(npoints=64 CoPoNeRF.py:24, 18 eval chunks test.py:176, sparsity 192
train.py:87, frame separation 50 realestate10k_dataio.py:283, ...) are
promoted to fields with the reference values as defaults.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    n_view: int = 2
    npoints: int = 64               # epipolar samples per ray
    num_hidden_units_phi: int = 128
    latent_dim: int = 832           # 3*256 (UFC) + 64 (conv_map)
    hidden_dim: int = 128           # attention key/query width
    repeat_attention: bool = True
    corr_heads: int = 8
    # UFC layers per coarse-to-fine stage (aggregation.py:358: [2,2,1]);
    # shrinkable for compile-time-bound smoke/dryrun configs
    ufc_layer_nums: Tuple[int, ...] = (2, 2, 1)
    mask_upsample: int = 256        # cyclic-consistency mask resolution
    # compute dtype for the conv/matmul-heavy encoder+UFC path ("float32" or
    # "bfloat16"); geometry and the render attention stay float32.
    compute_dtype: str = "float32"
    use_pallas: bool = True         # Pallas kernels for hot ops on TPU
    # MXU one-hot sampling for small feature grids (bf16 weights, ~1e-3
    # relative error vs the exact gather) — the throughput path; parity
    # configs keep this off.
    fast_sampling: bool = False
    # rematerialize UFC layers under autodiff (trades ~30% encode FLOPs for
    # the activation memory that otherwise OOMs 256^2 training at batch>3/chip)
    remat_ufc: bool = True
    # Conv4d branch formulation: "2d" folds the untouched pair into a conv2d
    # batch (one grouped conv when symmetric; 4 HBM transposes per Conv4d);
    # "3d" runs each branch as one conv with three spatial dims on the
    # flattened layout (no transposes).  A/B'd in scripts/probe_conv4d.py.
    conv4d_impl: str = "2d"
    # remat policy when remat_ufc: "full" recomputes everything in the
    # backward; "dots" (jax.checkpoint_policies.dots_saveable) keeps matmul/
    # einsum outputs resident and recomputes only elementwise/conv work —
    # less recompute for more activation memory.  A/B via probe_conv4d.py.
    remat_policy: str = "full"
    # Two-stage coarse-to-fine epipolar sampling (throughput path only,
    # requires fast_sampling): stage A runs the full pipeline at
    # coarse_samples uniform positions, stage B refines fine_samples
    # positions inside the round-1 attention peak's bracketing interval,
    # and attention is a joint softmax over the union.  Per-sample math is
    # exact; the approximation is where the segment is sampled.  0/0
    # disables (single uniform stage of npoints, the reference protocol).
    coarse_samples: int = 0
    fine_samples: int = 0
    # Training-path fused conv_map+sampling custom VJP (ops/convmap_sample.py):
    # routes the 256^2 latent sampling gradient straight to the 7x7 conv
    # kernel via weighted input patches at the sample anchors, skipping the
    # (B*V, 65536, 64) table cotangent entirely (2 x ~35 ms/step one-hot
    # transpose kernels + the conv correlation, trace-verified).  Forward
    # numerics are identical; gradients differ only in reduction order.
    convmap_direct_grad: bool = True
    # Roll each UFC stage's identical layers into one lax.scan over stacked
    # params (models/ufc.py): same runtime math, much smaller encode HLO and
    # compile time.  Param layout differs from the default loop layout
    # (stack_ufc_params/unstack_ufc_params convert) — opt-in so default
    # checkpoints/parity trees stay stable.
    ufc_scan: bool = False
    # Training fast path: sample the <=64^2 latent levels with the NON-banded
    # one-hot MXU kernel instead of the XLA patch gather.  The gather itself
    # is cheap (~1.6 ms on the gather engine) but drags per-site s32/f32
    # coordinate-plane prefetch copies behind it (~4 ms elapsed each, r5
    # trace); the kernel consumes two flat (B*V, P) f32 vectors.  Backward is
    # the same one-hot transpose matmul either way.  Fast-sampling train only.
    train_onehot_small: bool = True
    # Fused dual-axis Pallas soft-argmax for the UFC flow extraction
    # (2 streaming passes over the 400 MB correlation volume instead of ~14
    # plus a layout transpose; values f32-round-off-equal).  MEASURED
    # NEGATIVE on v5e (interleaved A/B: 185 vs 175 ms/step at batch 3,
    # +17 ms at batch 6, compile 628 vs 281 s — the online column
    # accumulation forces q-sequential grid execution, defeating the
    # latency hiding XLA's multi-pass softmax gets for free).  Kept as
    # tested infrastructure; None resolves to OFF.
    fused_argmax: Optional[bool] = None


@dataclasses.dataclass(frozen=True)
class LossConfig:
    l2_coeff: float = 0.05
    depth: bool = False
    pose: bool = False
    cycle: bool = False
    ssim: bool = False
    w_cycle: float = 0.01
    w_ssim: float = 1.0
    w_pose: float = 1.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 5e-5 * 4
    lr_decay: float = 0.95          # per-epoch exponential decay
    batch_size: int = 12
    num_epochs: int = 40001
    query_sparsity: int = 192
    clip_grad_norm: float = 1.0
    steps_til_summary: int = 500
    epochs_til_ckpt: int = 100
    iters_til_ckpt: int = 10000
    seed: int = 0
    # true dataloader steps per epoch (len(dataset)//batch_size).  The 0.95 LR
    # decay steps once per EPOCH in the reference (wrapper.py:95-96); 0 means
    # unknown and falls back to steps_til_summary (a faster decay — only
    # acceptable for synthetic smoke runs).
    steps_per_epoch: int = 0
    # ravel params/grads to ONE vector inside the optimizer (optax.flatten):
    # fuses the per-leaf Adam/finite-select kernel tail into a few wide ops.
    # Changes the optimizer-state layout (flat mu/nu) — checkpoints are not
    # interchangeable with the default; opt-in for the throughput config.
    flat_optimizer: bool = False
    mesh_shape: Tuple[int, ...] = (-1,)   # 1-D data-parallel mesh by default
    mesh_axes: Tuple[str, ...] = ("data",)
    # debug toggle (SURVEY §5): raise at the op that first produces a NaN
    # instead of silently skipping the step via apply_if_finite.  The
    # reference's analogue is its NaN guard + breakpoint pair
    # (wrapper.py:44-58, summaries.py:120-121).  Off in production: it
    # re-runs jitted code op-by-op on NaN detection.
    debug_nans: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    img_root: str = ""
    pose_root: str = ""
    dataset: str = "realestate10k"  # realestate10k | acid | synthetic
    num_ctxt_views: int = 2
    num_query_views: int = 1
    image_size: int = 256
    n_skip: int = 50                # eval frame skip
    nframe_view: int = 50           # min context frame separation (ACID: 92)
    query_window: int = 32          # query frame window around contexts
    overlap_table: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    chunks: int = 18
    batch_size: int = 2


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    logging_root: str = "logs"
    experiment_name: str = "default"
