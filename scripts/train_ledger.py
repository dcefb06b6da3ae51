"""Train-step FLOP ledger + derived reference baseline (pairs/s).

BENCH/BASELINE cover rendering; this derives the TRAIN-side numbers the same
way BASELINE.md derives the render denominator:

  1. Count the fwd+bwd+Adam FLOPs of one training pair via XLA's cost
     analysis of the jitted train step (batch 1, no remat — remat re-executes
     forward work the reference does not, so the no-remat count is the math
     BOTH implementations perform; reference wrapper.py:101-151).
  2. Reference ceiling: A6000 fp32 peak (38.71 TF/s; the reference trains
     pure fp32 — no autocast/GradScaler/TF32 opt-in anywhere) times the same
     50%-MFU grant BASELINE.md gives the render path =>
     pairs/s/GPU = 38.71e12 * 0.5 / F_pair.
  3. Our side: pass measured seconds/step and batch (scripts/
     bench_train_step.py) to get pairs/s/chip, the multiple of the derived
     reference rate, and the achieved v5e bf16 MFU.

Run:  python scripts/train_ledger.py [sec_per_step batch_per_chip]
      (defaults to the PERF.md measurement: 0.67 s at batch 6)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

A6000_FP32 = 38.71e12
V5E_BF16 = 197e12
REF_MFU_GRANT = 0.5          # same grant as BASELINE.md's render derivation
REF_GPUS = 4                 # README.md:59: trained on 4x A6000


def count_train_flops(image_size: int = 256, sparsity: int = 192) -> float:
    """XLA cost-analysis FLOPs of one fwd+bwd+Adam step at batch 1."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from coponerf_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
    from coponerf_tpu.data.synthetic import make_batch
    from coponerf_tpu.models import CoPoNeRF
    from coponerf_tpu.training.trainer import TrainState, make_optimizer, make_train_step
    from coponerf_tpu.utils.fast_init import fast_init

    cfg = Config(
        # ledger config: exact f32 math, NO remat (count the math, not the
        # recompute), training token order; losses as in the reference run
        # (--pose --cycle --ssim, README.md:46-48)
        model=ModelConfig(remat_ufc=False),
        loss=LossConfig(pose=True, cycle=True, ssim=True),
        train=TrainConfig(),
    )
    model = CoPoNeRF(cfg.model)
    batch_np, _ = make_batch(batch_size=1, image_size=image_size, n_rays=sparsity, seed=0)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=True)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, steps_per_epoch=1000),
    )
    step_fn = make_train_step(cfg)
    lowered = step_fn.lower(state, batch)
    print("compiling train step for cost analysis (CPU, several minutes)...",
          flush=True)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older JAX returns one dict per device
        cost = cost[0]
    return float(cost["flops"])


def main():
    sec_per_step = float(sys.argv[1]) if len(sys.argv) > 1 else 0.67
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    f_pair = count_train_flops()
    print(f"train-step FLOPs per pair (fwd+bwd+Adam, 256^2, sparsity 192): "
          f"{f_pair / 1e9:.1f} GF")

    ref_sol = A6000_FP32 / f_pair
    ref_rate = ref_sol * REF_MFU_GRANT
    print(f"A6000 fp32 SOL: {ref_sol:.2f} pairs/s/GPU (100% MFU)")
    print(f"derived reference rate (at {REF_MFU_GRANT:.0%} MFU): "
          f"{ref_rate:.2f} pairs/s/GPU = {ref_rate * REF_GPUS:.2f} pairs/s "
          f"on the 4xA6000 rig")

    ours = batch / sec_per_step
    mfu = ours * f_pair / V5E_BF16
    print(f"measured: {sec_per_step:.3f} s/step at batch {batch}/chip "
          f"-> {ours:.2f} pairs/s/chip")
    print(f"  = {ours / ref_rate:.2f}x the derived per-GPU reference rate")
    print(f"  v5e bf16 MFU: {mfu:.1%} (bf16 peak; the f32 geometry/softmax "
          f"fraction makes the true utilization higher)")
    import json

    print(json.dumps({
        "metric": "train_pairs_per_sec_per_chip_256",
        "value": round(ours, 3),
        "unit": "pairs/s/chip",
        "vs_baseline": round(ours / ref_rate, 3),
        "flops_per_pair": f_pair,
        "ref_pairs_per_sec_per_gpu": round(ref_rate, 3),
    }))


if __name__ == "__main__":
    main()
