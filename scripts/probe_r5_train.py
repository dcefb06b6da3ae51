"""Interleaved same-process A/B of round-5 train-step variants on the real
chip.  Cross-session readings over the tunnel drift by more than the effects
being measured (PERF.md), so each variant's steps are interleaved round-robin
in ONE process and the per-variant median over rounds is reported.

    python scripts/probe_r5_train.py [batch] [variant ...]

Variants (default: base scan):
    base      fast_sampling + no_remat + fused conv (the r4 best config)
    scan      base + ufc_scan (stacked layer params, lax.scan per stage)
    nohot     base with train_onehot_small=False (r4 sampler: patch gather)
    remat     base with remat_ufc=True (the memory-safe default)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp

from coponerf_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from coponerf_tpu.config import Config, LossConfig, ModelConfig, TrainConfig  # noqa: E402
from coponerf_tpu.data.synthetic import make_batch  # noqa: E402
from coponerf_tpu.models import CoPoNeRF  # noqa: E402
from coponerf_tpu.training.trainer import TrainState, make_optimizer, make_train_step  # noqa: E402
from coponerf_tpu.utils.fast_init import fast_init  # noqa: E402

VARIANT_KWARGS = {
    "base": {},
    "scan": {"ufc_scan": True},
    "nohot": {"train_onehot_small": False},
    "remat": {"remat_ufc": True},
    "noargmax": {"fused_argmax": False},
}

_pos = [a for a in sys.argv[1:] if not a.startswith("-")]
BATCH = int(_pos[0]) if _pos and _pos[0].isdigit() else 6
names = [a for a in _pos if a in VARIANT_KWARGS] or ["base", "scan"]
IMG, RAYS = 256, 192
K = 8          # steps per round per variant
ROUNDS = 4


def build(name):
    kw = dict(compute_dtype="bfloat16", fast_sampling=True, remat_ufc=False,
              convmap_direct_grad=True)
    kw.update(VARIANT_KWARGS[name])
    cfg = Config(model=ModelConfig(**kw),
                 loss=LossConfig(pose=True, cycle=True, ssim=True),
                 train=TrainConfig())
    model = CoPoNeRF(cfg.model)
    batch_np, _ = make_batch(batch_size=BATCH, image_size=IMG, n_rays=RAYS, seed=0)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=True)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, steps_per_epoch=100),
    )
    step_fn = make_train_step(cfg)
    t0 = time.time()
    state, m = step_fn(state, batch)
    float(m["total_train_loss"])
    compile_s = time.time() - t0
    print(f"[{name}] compile {compile_s:.0f}s", flush=True)
    return dict(name=name, state=state, batch=batch, step=step_fn,
                compile_s=compile_s, times=[])


def main():
    runs = [build(n) for n in names]
    for r in range(ROUNDS):
        for v in runs:
            t0 = time.time()
            st = v["state"]
            for _ in range(K):
                st, m = v["step"](st, v["batch"])
            float(m["total_train_loss"])
            v["state"] = st
            dt = (time.time() - t0) / K
            v["times"].append(dt)
            print(f"round {r} [{v['name']}] {dt * 1000:.0f} ms/step", flush=True)
    print()
    for v in runs:
        med = sorted(v["times"])[len(v["times"]) // 2]
        print(f"{v['name']:6s} median {med * 1000:.0f} ms/step  "
              f"({BATCH / med:.2f} pairs/s/chip)  compile {v['compile_s']:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
