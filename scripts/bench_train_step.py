"""Measure the full training step (fwd+bwd+Adam) on the real chip at the
per-chip slice of BASELINE config 4 (global batch 48 on v5e-8 => 6/chip,
256^2 pairs, 192 query rays, pose+cycle+ssim losses), plus encode-only time.

Prints one JSON line like bench.py; vs_baseline is the multiple of the
DERIVED reference training rate (scripts/train_ledger.py: 1328 GF/pair
fwd+bwd+Adam by XLA cost analysis, A6000 fp32 peak at the same 50%-MFU
grant BASELINE.md gives the render path => 14.57 pairs/s/GPU).
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
# A/B the UFC rematerialization; both flag spellings accepted (train.py uses --no_remat)
REMAT = not ({"--no-remat", "--no_remat"} & set(sys.argv))
# A/B the fused conv_map+sampling custom VJP (ops/convmap_sample.py)
FUSED_CONV = "--no_fused_conv" not in sys.argv
# A/B the single-vector optimizer (optax.flatten over the whole transform)
FLAT_OPT = "--flat_opt" in sys.argv
# A/B the scan-rolled UFC stages (stacked layer params, one trace per stage)
UFC_SCAN = "--ufc_scan" in sys.argv
# A/B the small-level one-hot MXU train sampler (vs the XLA patch gather)
ONEHOT_SMALL = "--no_onehot_small" not in sys.argv


def main():
    cfg = Config(
        model=ModelConfig(compute_dtype="bfloat16", fast_sampling=True, remat_ufc=REMAT,
                          convmap_direct_grad=FUSED_CONV, ufc_scan=UFC_SCAN,
                          train_onehot_small=ONEHOT_SMALL),
        loss=LossConfig(pose=True, cycle=True, ssim=True),
        train=TrainConfig(flat_optimizer=FLAT_OPT),
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

    # encode-only timing
    @jax.jit
    def enc_loop(n, v, b):
        def body(i, acc):
            bb = dict(b)
            c = dict(bb["context"])
            c["rgb"] = c["rgb"] + (i * 1e-30).astype(jnp.float32)
            bb["context"] = c
            s = model.apply(v, bb, train=False, method="encode")
            return acc + jnp.sum(s.rel_pose) + jnp.sum(s.flows[0])
        return jax.lax.fori_loop(0, n, body, 0.0)

    t0 = time.time()
    float(enc_loop(jnp.int32(1), variables, batch))
    print(f"encode compile {time.time() - t0:.0f}s", flush=True)
    t0 = time.time(); float(enc_loop(jnp.int32(1), variables, batch)); t1 = time.time() - t0
    t0 = time.time(); float(enc_loop(jnp.int32(5), variables, batch)); t5 = time.time() - t0
    print(f"encode (batch {BATCH} pairs): {(t5 - t1) / 4 * 1000:.0f} ms", flush=True)

    # full train step: can't loop donated state inside fori easily; time a
    # python loop of K steps (dispatch overhead ~30ms amortized over step time)
    t0 = time.time()
    state, m = step_fn(state, batch)
    print(f"train step compile {time.time() - t0:.0f}s", flush=True)
    float(m["total_train_loss"])
    K = 10
    t0 = time.time()
    for _ in range(K):
        state, m = step_fn(state, batch)
    loss = float(m["total_train_loss"])  # forces completion of the chain
    dt = (time.time() - t0) / K
    print(f"train step (batch {BATCH}): {dt * 1000:.0f} ms  ({BATCH / dt:.1f} pairs/s/chip)  loss={loss:.3f}", flush=True)

    import json

    REF_PAIRS_PER_SEC_PER_GPU = 14.574   # scripts/train_ledger.py derivation
    FLOPS_PER_PAIR = 1.328e12
    pairs = BATCH / dt
    print(json.dumps({
        "metric": "train_pairs_per_sec_per_chip_256",
        "value": round(pairs, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs / REF_PAIRS_PER_SEC_PER_GPU, 3),
        "mfu_bf16": round(pairs * FLOPS_PER_PAIR / 197e12, 4),
    }))


if __name__ == "__main__":
    main()
