"""A/B the train step over Conv4d formulations and UFC remat.

Configs: conv4d_impl in {2d, 3d} x remat_ufc in {True, False} (+ remat_policy=dots), full fast
train step (fwd+bwd+Adam, 256^2, sparsity 192, pose+cycle+ssim) at batch N.
The 2d formulation folds the untouched pair into a conv2d batch (4 HBM
transposes per Conv4d); the 3d formulation runs one conv with three spatial
dims directly on the flattened layout (no transposes) — see
coponerf_tpu/models/conv4d.py.  Numerical parity of the two is pinned by
tests/test_ops.py::test_conv4d_3d_impl_matches_2d.

Usage: python scripts/probe_conv4d.py [batch] [--skip-remat-off]
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
K = 8


def run(impl: str, remat: bool, policy: str = "full"):
    cfg = Config(
        model=ModelConfig(
            compute_dtype="bfloat16", fast_sampling=True, remat_ufc=remat,
            remat_policy=policy, conv4d_impl=impl,
        ),
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
    try:
        state, m = step_fn(state, batch)
        loss0 = float(m["total_train_loss"])
    except Exception as e:  # OOM surfaces here (remat off may not fit)
        print(f"impl={impl} remat={remat}/{policy}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    print(f"impl={impl} remat={remat}/{policy}: compile+step1 {time.time() - t0:.0f}s loss={loss0:.3f}", flush=True)
    t0 = time.time()
    for _ in range(K):
        state, m = step_fn(state, batch)
    loss = float(m["total_train_loss"])  # forces completion
    dt = (time.time() - t0) / K
    print(
        f"impl={impl} remat={remat}/{policy}: {dt * 1000:.0f} ms/step "
        f"({BATCH / dt:.2f} pairs/s/chip) loss={loss:.3f}",
        flush=True,
    )
    return dt


def main():
    results = {}
    combos = [("2d", True, "full"), ("3d", True, "full"), ("2d", True, "dots")]
    if "--skip-remat-off" not in sys.argv:
        combos += [("2d", False, "full"), ("3d", False, "full")]
    for impl, remat, policy in combos:
        results[(impl, remat, policy)] = run(impl, remat, policy)
    print({f"{i}/remat={r}/{p}": (f"{v * 1000:.0f}ms" if v else "fail") for (i, r, p), v in results.items()})


if __name__ == "__main__":
    main()
