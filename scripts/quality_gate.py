"""Trained-weights quality gates -> PARITY.md.

Runs the full eval protocol (encode once, chunked dual-hypothesis render,
PSNR/SSIM/pose metrics) on deterministic procedural scenes with a TRAINED
checkpoint under several numerics configs and reports the deltas against the
exact-f32 reference path:

  exact      float32, exact gather sampling (the parity path)
  fast       bfloat16 + MXU one-hot sampling (the bench.py throughput path)
  cf[A, B]   fast + two-stage coarse-to-fine sampling (coarse A + fine B)

Random-weight parity (tests/test_parity_reference.py) pins the math; THIS
script is the quality evidence where numeric error actually shows — peaked
attention propagates bf16/sampling error very differently than random
weights do, and top-1 refinement is only meaningful once attention is
peaked.  The <=0.1 dB PSNR budget of BASELINE.json gates the fast paths.

Usage:
    python scripts/quality_gate.py CKPT [n_scenes] [--cf A,B ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG = 256


class SyntheticEvalSet:
    """Deterministic procedural scenes in the eval-dataset interface:
    ds[i] -> (model_input, gt, overlap)."""

    def __init__(self, n_scenes: int, image_size: int = IMG):
        from coponerf_tpu.data.synthetic import make_batch

        self.items = []
        for i in range(n_scenes):
            batch, gt = make_batch(
                batch_size=1, image_size=image_size, n_rays=image_size * image_size,
                seed=9000 + i, full_query_image=True,
            )
            import jax

            item = jax.tree.map(lambda x: x[0], batch)
            gt0 = jax.tree.map(lambda x: x[0], gt)
            self.items.append((item, gt0, 1.0))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def run_config(name, cfg, variables, ds, chunk=16384):
    import time

    import jax

    from coponerf_tpu.eval.harness import evaluate
    from coponerf_tpu.models import CoPoNeRF

    model = CoPoNeRF(cfg)
    t0 = time.time()
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # LPIPS column intentionally absent here
        acc = evaluate(model, variables, ds, batch_size=1, chunk=chunk,
                       image_size=IMG, verbose=False)
    stats = acc.summary()["all"]
    out = {k: stats[f"{k}_avg"] for k in ("psnr", "ssim", "rot", "trans", "angle_trans")}
    out["wall_s"] = time.time() - t0
    # per-scene values for PAIRED deltas vs the exact config (the gate
    # statistic: mean +/- std of per-scene dPSNR, not across-scene spread)
    import numpy as np

    out["per_scene"] = {k: np.asarray(acc.metrics["all"][k]) for k in ("psnr", "ssim", "rot")}
    print(f"{name:14s} psnr={out['psnr']:.4f} ssim={out['ssim']:.4f} "
          f"rot={out['rot']:.4f} trans={out['trans']:.4f} ({out['wall_s']:.0f}s)",
          flush=True)
    return out


def main():
    import dataclasses

    from coponerf_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from coponerf_tpu.config import ModelConfig
    from coponerf_tpu.training import checkpoint as ckpt_lib

    ckpt = sys.argv[1]
    n_scenes = int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else 3
    cf_list = []
    for a in sys.argv[2:]:
        if a.startswith("--cf"):
            ab = a.split("=")[1] if "=" in a else a.split("cf")[1]
            cf_list.append(tuple(int(x) for x in ab.split(",")))
    if not cf_list:
        cf_list = [(16, 16), (16, 8)]

    params, batch_stats, _, step = ckpt_lib.load(ckpt)
    variables = jax.tree.map(jnp.asarray, {"params": params, "batch_stats": batch_stats})
    print(f"checkpoint {ckpt} (step {step}); {n_scenes} scenes", flush=True)

    ds = SyntheticEvalSet(n_scenes)

    exact = ModelConfig()
    fast = dataclasses.replace(exact, fast_sampling=True, compute_dtype="bfloat16")
    # the exact f32 path carries ~2x the activation footprint per ray of the
    # bf16 fast path; 16384-ray chunks OOM the 16 GB chip in val mode
    results = {"exact": run_config("exact", exact, variables, ds, chunk=4096)}
    results["fast"] = run_config("fast", fast, variables, ds)
    for (a, b) in cf_list:
        cfg = dataclasses.replace(fast, coarse_samples=a, fine_samples=b)
        results[f"cf[{a},{b}]"] = run_config(f"cf[{a},{b}]", cfg, variables, ds)

    base = results["exact"]
    print(f"\nn = {n_scenes} scenes; dPSNR/drot are PAIRED per-scene deltas vs exact (mean +/- std)")
    print("| config | PSNR (dB) | dPSNR (mean +/- std) | max scene dPSNR | SSIM | rot (rad) | drot | trans |")
    print("|---|---|---|---|---|---|---|---|")
    import numpy as np

    for name, r in results.items():
        dpsnr = r["per_scene"]["psnr"] - base["per_scene"]["psnr"]
        drot = r["per_scene"]["rot"] - base["per_scene"]["rot"]
        # the worst-case per-scene bound (gate 1e): the mean can sit inside
        # the 0.1 dB budget while an individual scene blows it — report the
        # signed delta whose |.| is largest so the default-config policy can
        # be gated on the worst scene, not the mean
        wc = dpsnr[np.argmax(np.abs(dpsnr))] if len(dpsnr) else 0.0
        print(f"| {name} | {r['psnr']:.4f} | {dpsnr.mean():+.4f} +/- {dpsnr.std():.4f} | "
              f"{wc:+.4f} | "
              f"{r['ssim']:.4f} | {r['rot']:.4f} | {drot.mean():+.4f} +/- {drot.std():.4f} | "
              f"{r['trans']:.4f} |")


if __name__ == "__main__":
    main()
