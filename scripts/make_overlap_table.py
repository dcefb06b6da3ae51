"""Generate a per-scene overlap table (.npy) for a dataset root.

The reference ships precomputed assets/overlap/{realestate,acid}.npy (loaded
at realestate10k_dataio.py:471) without the generating code; this regenerates
an equivalent table from the model's own correspondence field
(coponerf_tpu/eval/overlap.py) so the binned eval protocol is reproducible
on any dataset copy.

Usage:
    python scripts/make_overlap_table.py DATA_ROOT POSE_ROOT CKPT OUT.npy \
        [--dataset realestate10k|acid] [--n_skip 50]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("data_root")
    ap.add_argument("pose_root")
    ap.add_argument("checkpoint")
    ap.add_argument("out")
    ap.add_argument("--dataset", default="realestate10k", choices=["realestate10k", "acid"])
    ap.add_argument("--n_skip", type=int, default=50)
    args = ap.parse_args()

    from coponerf_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coponerf_tpu.config import ModelConfig
    from coponerf_tpu.eval.overlap import compute_overlap_table
    from coponerf_tpu.models import CoPoNeRF

    if args.dataset == "acid":
        from coponerf_tpu.data.acid import ACIDVis as Vis
    else:
        from coponerf_tpu.data.realestate import RealEstate10kVis as Vis

    ds = Vis(args.data_root, args.pose_root, overlap=None, n_skip=args.n_skip)
    model = CoPoNeRF(ModelConfig(fast_sampling=True, compute_dtype="bfloat16"))

    if args.checkpoint.endswith(".pth"):
        from coponerf_tpu.utils.torch_import import convert_state_dict, load_torch_checkpoint

        params, batch_stats = convert_state_dict(load_torch_checkpoint(args.checkpoint))
    else:
        from coponerf_tpu.training.checkpoint import load

        params, batch_stats, _, _ = load(args.checkpoint)
    variables = jax.tree.map(jnp.asarray, {"params": params, "batch_stats": batch_stats})

    table = compute_overlap_table(model, variables, ds)
    np.save(args.out, table)
    print(f"wrote {args.out}: {table.shape[0]} scenes, "
          f"mean overlap {float(table.mean()):.3f}")


if __name__ == "__main__":
    main()
