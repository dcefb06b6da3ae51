"""Evaluation entry point (replaces the reference's test.py).

    python test.py --checkpoint_path X --data_root ... --pose_root ... \
        [--overlap assets/overlap/realestate.npy] [--n_skip 50]

Runs the chunked dual-hypothesis eval protocol and prints PSNR/SSIM(/LPIPS
when weights are supplied)/pose errors binned by overlap
{small<0.5, 0.5<=medium<=0.75, large>0.75}.
"""

from __future__ import annotations

import argparse

from coponerf_tpu.utils.cli import parse_with_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--logging_root", type=str, default="logs")
    p.add_argument("--experiment_name", type=str, default="eval")
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--pose_root", type=str, required=True)
    p.add_argument("--overlap", type=str, default=None)
    p.add_argument("--dataset", type=str, default="realestate10k", choices=["realestate10k", "acid"])
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--views", type=int, default=2)
    p.add_argument("--n_skip", type=int, default=50)
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--chunk", type=int, default=4096)
    p.add_argument("--lpips_weights", type=str, default=None)
    p.add_argument("--allow_missing_lpips", action="store_true", default=False,
                   help="run without LPIPS (NOT the full reference protocol)")
    p.add_argument("--fast", action="store_true", default=False,
                   help="throughput config: bf16 + MXU sampling (~1e-3 feature error)")
    p.add_argument("--prune_invalid", action="store_true", default=False,
                   help="skip ray chunks outside the epipolar valid mask (the "
                        "reference renders them and overwrites white); rgb is "
                        "identical, aux panel outputs zero-fill pruned rays")
    p.add_argument("--num_workers", type=int, default=0,
                   help="eval scene-decode worker processes (0 = in-thread, "
                        "the reference's num_workers=0 at eval, test.py:130; "
                        ">0 overlaps decode with TPU render, same results)")
    p.add_argument("--include_tail", action="store_true", default=False,
                   help="evaluate the n %% batch_size tail scenes too "
                        "(deviation: the reference DataLoader drops them, "
                        "drop_last=True, test.py:130)")
    return p


def main():
    from coponerf_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    opt = parse_with_config(build_parser())

    if opt.lpips_weights is None and not opt.allow_missing_lpips:
        # the reference protocol always reports LPIPS (test.py:258-263):
        # refuse loudly rather than silently printing a partial table
        raise SystemExit(
            "--lpips_weights is required for the full reference eval protocol "
            "(fetch + convert with scripts/fetch_lpips_weights.py). Pass "
            "--allow_missing_lpips to run without the LPIPS column."
        )

    import jax.numpy as jnp

    from coponerf_tpu.config import ModelConfig
    from coponerf_tpu.eval.harness import evaluate
    from coponerf_tpu.models import CoPoNeRF

    if opt.dataset == "acid":
        from coponerf_tpu.data.acid import ACIDVis as Vis
    else:
        from coponerf_tpu.data.realestate import RealEstate10kVis as Vis

    dataset = Vis(opt.data_root, opt.pose_root, overlap=opt.overlap, n_skip=opt.n_skip,
                  num_ctxt_views=opt.views)

    model = CoPoNeRF(ModelConfig(
        n_view=opt.views,
        fast_sampling=opt.fast,
        compute_dtype="bfloat16" if opt.fast else "float32",
    ))

    if opt.checkpoint_path and opt.checkpoint_path.endswith(".pth"):
        from coponerf_tpu.utils.torch_import import convert_state_dict, load_torch_checkpoint

        params, batch_stats = convert_state_dict(load_torch_checkpoint(opt.checkpoint_path))
    elif opt.checkpoint_path:
        from coponerf_tpu.training.checkpoint import load

        params, batch_stats, _, _ = load(opt.checkpoint_path)
    else:
        raise SystemExit("--checkpoint_path is required for evaluation")
    variables = {"params": params, "batch_stats": batch_stats}
    variables = {k: jnp_tree(v) for k, v in variables.items()}

    import os

    from coponerf_tpu.training.trainer import MetricLogger

    logger = MetricLogger(os.path.join(opt.logging_root, opt.experiment_name, "summaries"))
    acc = evaluate(
        model, variables, dataset, batch_size=opt.batch_size, chunk=opt.chunk,
        max_batches=opt.max_batches, lpips_weights=opt.lpips_weights, logger=logger,
        prune_invalid=opt.prune_invalid, drop_last=not opt.include_tail,
        num_workers=opt.num_workers,
    )
    print(acc.format())


def jnp_tree(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, tree)


if __name__ == "__main__":
    main()
