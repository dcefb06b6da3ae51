"""Dump the compiled (post-optimization) train-step HLO to a text file so
DMA/copy producers can be located by metadata (op_name source annotations).

Usage: python scripts/dump_train_hlo.py [out.txt] [batch] [--flat_opt]
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
OUT = _pos[0] if _pos else "/tmp/train_step_hlo.txt"
BATCH = int(_pos[1]) if len(_pos) > 1 else 6


def main():
    cfg = Config(
        model=ModelConfig(compute_dtype="bfloat16", fast_sampling=True,
                          remat_ufc="--remat" in sys.argv),
        loss=LossConfig(pose=True, cycle=True, ssim=True),
        train=TrainConfig(flat_optimizer="--flat_opt" in sys.argv),
    )
    model = CoPoNeRF(cfg.model)
    batch_np, _ = make_batch(batch_size=BATCH, image_size=256, n_rays=192, seed=0)
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
    lowered = step_fn.lower(state, batch)  # make_train_step already jits with donation
    compiled = lowered.compile()
    print(f"compile {time.time() - t0:.0f}s", flush=True)
    txt = compiled.as_text()
    with open(OUT, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} chars to {OUT}")


if __name__ == "__main__":
    main()
