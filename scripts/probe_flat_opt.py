"""Same-process A/B of the optimizer formulation on the full train step:
default (per-leaf Adam + finite-select, ~300-leaf kernel tail) vs
flat_optimizer (optax.flatten over the whole transform: one raveled vector).

    python scripts/probe_flat_opt.py [batch] [--remat]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
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

_pos = [a for a in sys.argv[1:] if not a.startswith("-")]
BATCH = int(_pos[0]) if _pos else 6
REMAT = "--remat" in sys.argv


def time_step(name: str, flat: bool, model, cfg, batch, variables):
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, flat_optimizer=flat))
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
    print(f"[{name}] compile {time.time() - t0:.0f}s", flush=True)
    K = 10
    t0 = time.time()
    for _ in range(K):
        state, m = step_fn(state, batch)
    loss = float(m["total_train_loss"])
    dt = (time.time() - t0) / K
    print(
        f"[{name}] step {dt * 1000:.0f} ms  ({BATCH / dt:.2f} pairs/s/chip)"
        f"  loss={loss:.3f}",
        flush=True,
    )
    return dt


def main():
    cfg = Config(
        model=ModelConfig(compute_dtype="bfloat16", fast_sampling=True, remat_ufc=REMAT),
        loss=LossConfig(pose=True, cycle=True, ssim=True),
        train=TrainConfig(),
    )
    model = CoPoNeRF(cfg.model)
    batch_np, _ = make_batch(batch_size=BATCH, image_size=256, n_rays=192, seed=0)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=True)
    d1 = time_step("default", False, model, cfg, batch, variables)
    f1 = time_step("flat", True, model, cfg, batch, variables)
    d2 = time_step("default", False, model, cfg, batch, variables)
    f2 = time_step("flat", True, model, cfg, batch, variables)
    print(
        f"default {min(d1, d2) * 1000:.0f} ms vs flat {min(f1, f2) * 1000:.0f} ms "
        f"(best-of-2 each, interleaved)",
        flush=True,
    )


if __name__ == "__main__":
    main()
