"""Capture a jax.profiler trace of ONE full training step (fwd+bwd+Adam,
fast bf16 config, batch N) and print the per-op summary via xplane_summary.
The train-side analogue of trace_render.py; feeds the PERF.md train budget.

Usage: python scripts/trace_train.py [batch] [outdir]
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

_pos = [a for a in sys.argv[1:] if not a.startswith("-")]
BATCH = int(_pos[0]) if _pos else 6
IMG = 256
RAYS = 192
# accept both spellings: train.py exposes --no_remat, older notes used --no-remat
REMAT = not ({"--no-remat", "--no_remat"} & set(sys.argv))


def main():
    outdir = _pos[1] if len(_pos) > 1 else "/tmp/train_trace"
    cfg = Config(
        model=ModelConfig(compute_dtype="bfloat16", fast_sampling=True, remat_ufc=REMAT),
        loss=LossConfig(pose=True, cycle=True, ssim=True),
        train=TrainConfig(),
    )
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
    print(f"compile+first step {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    state, m = step_fn(state, batch)
    float(m["total_train_loss"])
    print(f"warm step {time.time() - t0:.2f}s", flush=True)

    jax.profiler.start_trace(outdir)
    state, m = step_fn(state, batch)
    float(m["total_train_loss"])
    jax.profiler.stop_trace()
    print("traced ->", outdir, flush=True)

    import os
    import subprocess

    subprocess.run([
        sys.executable, os.path.join(os.path.dirname(__file__), "xplane_summary.py"), outdir,
    ])


if __name__ == "__main__":
    main()
