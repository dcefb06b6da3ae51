"""Real-data parity gate: the COMPLETE reference eval protocol in one command.

Given a dataset root, a checkpoint (the released .pth or an .npz), and LPIPS
weights, this runs the full pipeline the reference's test.py runs
(test.py:111-302):

  1. per-scene overlap table (generated via eval/overlap.py when no official
     assets/overlap/*.npy is supplied),
  2. binned eval (PSNR / SSIM / LPIPS / rot / trans / angle_trans over
     all+small+medium+large overlap bins) under the EXACT f32 config,
  3. the same under the throughput config (bf16 + MXU sampling + cf[16,4]),
  4. a parity report: fast-vs-exact deltas gated against the BASELINE
     budget (<=0.1 dB PSNR, pose parity), plus optional checks against
     published numbers (--expect psnr=24.5,rot=0.02 ...).

--dry_run fabricates scenes + a fast-init checkpoint + RANDOM LPIPS weights
(clearly marked) so the full path is executable without network/datasets.

Usage:
    python scripts/real_parity.py --data_root .../test --pose_root .../test.mat \
        --checkpoint model.pth --lpips_weights vgg_lpips.npz --out /tmp/parity
    python scripts/real_parity.py --dry_run --out /tmp/parity_dry
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np

PSNR_BUDGET_DB = 0.1     # BASELINE.json north star: <=0.1 dB PSNR delta
ROT_BUDGET_RAD = 0.005   # pose rot-err parity budget (fast vs exact encode)


def load_variables(path):
    import jax
    import jax.numpy as jnp

    if path.endswith(".pth"):
        from coponerf_tpu.utils.torch_import import convert_state_dict, load_torch_checkpoint

        params, batch_stats = convert_state_dict(load_torch_checkpoint(path))
    else:
        from coponerf_tpu.training.checkpoint import load

        params, batch_stats, _, _ = load(path)
    return jax.tree.map(jnp.asarray, {"params": params, "batch_stats": batch_stats})


def run_eval(cfg_kwargs, variables, dataset, lpips_weights, chunk, max_batches, batch_size):
    import warnings

    from coponerf_tpu.config import ModelConfig
    from coponerf_tpu.eval.harness import evaluate
    from coponerf_tpu.models import CoPoNeRF

    model = CoPoNeRF(ModelConfig(**cfg_kwargs))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # missing-LPIPS warning handled at CLI level
        acc = evaluate(
            model, variables, dataset, batch_size=batch_size, chunk=chunk,
            max_batches=max_batches, lpips_weights=lpips_weights, verbose=False,
        )
    return acc.summary()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root")
    ap.add_argument("--pose_root")
    ap.add_argument("--checkpoint")
    ap.add_argument("--lpips_weights")
    ap.add_argument("--overlap", default=None,
                    help="official overlap .npy; generated via eval/overlap.py when absent")
    ap.add_argument("--dataset", default="realestate10k", choices=["realestate10k", "acid"])
    ap.add_argument("--n_skip", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--max_batches", type=int, default=None)
    ap.add_argument("--cf", type=str, default="16,4")
    ap.add_argument("--expect", type=str, default=None,
                    help="published numbers to gate against, e.g. psnr=24.5,rot=0.02 "
                         "(each |measured_exact - expected| must be within the PSNR/"
                         "rot budget)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--dry_run", action="store_true",
                    help="fabricated scenes + fast-init ckpt + RANDOM LPIPS weights")
    args = ap.parse_args()

    from coponerf_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    os.makedirs(args.out, exist_ok=True)
    notes = []

    if args.dry_run:
        from e2e_eval_drive import build_checkpoint, build_fake_data

        args.data_root, args.pose_root = build_fake_data(args.out)
        args.checkpoint = build_checkpoint(args.out)
        from coponerf_tpu.eval.lpips_jax import make_random_weights

        args.lpips_weights = make_random_weights(os.path.join(args.out, "lpips_rand.npz"))
        notes.append("DRY RUN: fabricated scenes, fast-init checkpoint, RANDOM "
                     "(structure-only) LPIPS weights — numbers are NOT meaningful, "
                     "only the protocol path is exercised")
        args.max_batches = args.max_batches or 1
        args.batch_size = 1
        args.chunk = 8192
    for req in ("data_root", "pose_root", "checkpoint", "lpips_weights"):
        if not getattr(args, req):
            ap.error(f"--{req} is required (or use --dry_run)")

    variables = load_variables(args.checkpoint)

    if args.dataset == "acid":
        from coponerf_tpu.data.acid import ACIDVis as Vis
    else:
        from coponerf_tpu.data.realestate import RealEstate10kVis as Vis

    # 1. overlap table
    overlap_path = args.overlap
    if overlap_path is None:
        from coponerf_tpu.config import ModelConfig
        from coponerf_tpu.eval.overlap import compute_overlap_table
        from coponerf_tpu.models import CoPoNeRF

        print("[1/4] generating overlap table (eval/overlap.py)...", flush=True)
        ds0 = Vis(args.data_root, args.pose_root, overlap=None, n_skip=args.n_skip)
        model = CoPoNeRF(ModelConfig(fast_sampling=True, compute_dtype="bfloat16"))
        table = compute_overlap_table(model, variables, ds0)
        overlap_path = os.path.join(args.out, "overlap.npy")
        np.save(overlap_path, table)
        notes.append("overlap table GENERATED from the model's correspondence field "
                     "(official assets/overlap/*.npy not supplied)")
    else:
        print("[1/4] using supplied overlap table", flush=True)

    dataset = Vis(args.data_root, args.pose_root, overlap=overlap_path, n_skip=args.n_skip)

    # 2. exact protocol
    print("[2/4] exact f32 protocol...", flush=True)
    exact = run_eval({}, variables, dataset, args.lpips_weights,
                     args.chunk, args.max_batches, args.batch_size)

    # 3. throughput config
    cf = tuple(int(x) for x in args.cf.split(","))
    print(f"[3/4] fast protocol (bf16 + MXU sampling + cf{list(cf)})...", flush=True)
    fast = run_eval(
        dict(fast_sampling=True, compute_dtype="bfloat16",
             coarse_samples=cf[0], fine_samples=cf[1]),
        variables, dataset, args.lpips_weights, args.chunk, args.max_batches,
        args.batch_size,
    )

    # 4. parity report
    print("[4/4] parity report", flush=True)
    keys = ("psnr", "ssim", "lpips", "rot", "trans", "angle_trans")
    deltas = {}
    for k in keys:
        ka = f"{k}_avg"
        if ka in exact.get("all", {}) and ka in fast.get("all", {}):
            deltas[k] = fast["all"][ka] - exact["all"][ka]
    gates = {
        "psnr_within_budget": abs(deltas.get("psnr", 0.0)) <= PSNR_BUDGET_DB,
        "rot_within_budget": abs(deltas.get("rot", 0.0)) <= ROT_BUDGET_RAD,
    }
    # per-key tolerance for --expect checks against published numbers; each
    # key gets a budget in its own units (previously everything but psnr was
    # gated against the rotation budget — meaningless for ssim/trans)
    expect_budgets = {
        "psnr": PSNR_BUDGET_DB,
        "ssim": 0.005,
        "lpips": 0.005,
        "rot": ROT_BUDGET_RAD,
        "trans": 0.005,
        "angle_trans": 0.01,  # radians of translation-direction angle
    }
    expected = {}
    if args.expect:
        for kv in args.expect.split(","):
            k, v = kv.split("=")
            if k not in expect_budgets:
                ap.error(f"--expect: unknown key {k!r} (known: {sorted(expect_budgets)})")
            budget = expect_budgets[k]
            meas = exact["all"][f"{k}_avg"]
            expected[k] = {
                "expected": float(v), "measured_exact": meas,
                "within_budget": abs(meas - float(v)) <= budget,
            }
            gates[f"published_{k}"] = expected[k]["within_budget"]

    report = {
        "notes": notes,
        "dataset": args.dataset,
        "n_scenes": len(dataset),
        "checkpoint": args.checkpoint,
        "exact": exact,
        "fast": fast,
        "fast_minus_exact_all": deltas,
        "gates": gates,
        "budgets": {"psnr_db": PSNR_BUDGET_DB, "rot_rad": ROT_BUDGET_RAD,
                    "expect": expect_budgets},
        "published": expected,
    }
    path = os.path.join(args.out, "report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)

    for n in notes:
        print(f"NOTE: {n}")
    print(f"scenes: {len(dataset)}")
    for k, d in deltas.items():
        print(f"  d{k} (fast - exact, all bin): {d:+.4f}")
    ok = all(gates.values())
    # random-weight dry runs exercise the PATH only; budget gates are
    # meaningful on trained weights (PARITY.md gate 1d: drot <= 1e-4 rad)
    suffix = "  (informational: random weights, not gated)" if args.dry_run else ""
    for g, v in gates.items():
        print(f"  gate {g}: {'PASS' if v else 'FAIL'}{suffix}")
    print(f"report -> {path}")
    if not ok and not args.dry_run:
        sys.exit(1)


if __name__ == "__main__":
    main()
