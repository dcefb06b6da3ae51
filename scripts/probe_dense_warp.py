"""Same-process A/B of the dense warp sampler formulations (rowpair vs
patch) on the full train step — cross-session tunnel spread (384-449 ms for
identical code, PERF.md) makes separate-process A/Bs of ~40 ms effects
meaningless, so both variants compile and run back-to-back here.

    python scripts/probe_dense_warp.py [batch] [--remat]
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
REMAT = "--remat" in sys.argv


def time_step(impl: str, model, cfg, batch, variables):
    import importlib

    # NB: `from coponerf_tpu.ops import grid_sample` binds the re-exported
    # FUNCTION, silently setting the flag on the function object (measured
    # rowpair-vs-rowpair for one session before this was caught) — importlib
    # gets the module whose flag grid_sample_dense_nchw actually reads.
    gs = importlib.import_module("coponerf_tpu.ops.grid_sample")
    gs.DENSE_WARP_IMPL = impl
    assert gs.grid_sample_dense_nchw.__globals__["DENSE_WARP_IMPL"] == impl
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, steps_per_epoch=100),
    )
    # fresh jit per impl: the module flag changes the traced graph
    step_fn = make_train_step(cfg)
    t0 = time.time()
    state, m = step_fn(state, batch)
    float(m["total_train_loss"])
    print(f"[{impl}] compile {time.time() - t0:.0f}s", flush=True)
    K = 10
    t0 = time.time()
    for _ in range(K):
        state, m = step_fn(state, batch)
    loss = float(m["total_train_loss"])
    dt = (time.time() - t0) / K
    print(
        f"[{impl}] step {dt * 1000:.0f} ms  ({BATCH / dt:.2f} pairs/s/chip)"
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
    # interleave A B A B to cancel slow drift within the session
    r1 = time_step("rowpair", model, cfg, batch, variables)
    p1 = time_step("patch", model, cfg, batch, variables)
    r2 = time_step("rowpair", model, cfg, batch, variables)
    p2 = time_step("patch", model, cfg, batch, variables)
    print(
        f"rowpair {min(r1, r2) * 1000:.0f} ms vs patch {min(p1, p2) * 1000:.0f} ms"
        f"  (min of 2 each, same session)",
        flush=True,
    )


if __name__ == "__main__":
    main()
