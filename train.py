"""Training entry point (replaces the reference's train.py).

    python train.py --experiment_name X --data_root ... --pose_root ... \
        [--dataset realestate10k|acid|synthetic] [--pose --cycle --ssim] ...

One jitted global train step over a data-parallel device mesh replaces the
reference's mp.spawn + NCCL setup (train.py:78-147); --gpus is accepted for
CLI compatibility but parallelism comes from the visible JAX devices.
"""

from __future__ import annotations

import argparse
import os

from coponerf_tpu.utils.cli import parse_with_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--logging_root", type=str, default="logs")
    p.add_argument("--data_root", type=str, default="")
    p.add_argument("--pose_root", type=str, default="")
    p.add_argument("--val_root", type=str, default=None)
    p.add_argument("--val_pose_root", type=str, default=None)
    p.add_argument("--dataset", type=str, default="realestate10k",
                   choices=["realestate10k", "acid", "synthetic"])
    p.add_argument("--experiment_name", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--views", type=int, default=2)
    p.add_argument("--gpus", type=int, default=1, help="compat; uses all JAX devices")
    p.add_argument("--n_skip", type=int, default=50)
    p.add_argument("--lr", type=float, default=5e-5 * 4)
    p.add_argument("--l2_coeff", type=float, default=0.05)
    p.add_argument("--num_epochs", type=int, default=40001)
    p.add_argument("--max_steps", type=int, default=1000000)
    p.add_argument("--query_sparsity", type=int, default=192)
    p.add_argument("--num_workers", type=int, default=8,
                   help="loader worker processes (reference train.py:89-90)")
    p.add_argument("--cycle", action="store_true", default=False)
    p.add_argument("--pose", action="store_true", default=False)
    p.add_argument("--ssim", action="store_true", default=False)
    p.add_argument("--depth", action="store_true", default=False)
    p.add_argument("--epochs_til_ckpt", type=int, default=100)
    p.add_argument("--val_batches", type=int, default=2,
                   help="in-training validation batches per summary interval "
                        "(reference wrapper.py:160-254 renders a val sample)")
    p.add_argument("--steps_til_summary", type=int, default=500)
    p.add_argument("--iters_til_ckpt", type=int, default=10000)
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--debug_nans", action="store_true", default=False,
                   help="raise at the first NaN-producing op (debug; slow)")
    p.add_argument("--synthetic_pool", type=int, default=0,
                   help="synthetic dataset: pregenerate N batches and cycle "
                        "(keeps the chip busy on slow hosts)")
    p.add_argument("--fast", action="store_true", default=False,
                   help="throughput config: MXU sampling + custom-VJP backward "
                        "(use with --compute_dtype bfloat16)")
    p.add_argument("--no_remat", action="store_true", default=False,
                   help="disable UFC rematerialization: ~6%% faster step when "
                        "the activations fit (batch<=6/chip at 256^2; remat "
                        "is required for batch 12/chip)")
    p.add_argument("--flat_opt", action="store_true", default=False,
                   help="single-vector optimizer (optax.flatten): fuses the "
                        "per-leaf Adam kernel tail; optimizer-state layout "
                        "differs from the default (checkpoints not "
                        "interchangeable)")
    p.add_argument("--seed", type=int, default=0,
                   help="param-init PRNG seed (independent training seeds "
                        "for the PARITY quality gates)")
    p.add_argument("--ufc_scan", action="store_true", default=False,
                   help="roll each UFC stage's layers into one lax.scan over "
                        "stacked params: same math, smaller HLO / faster "
                        "compile; param layout differs from the default "
                        "(models/ufc.py stack_ufc_params converts)")
    return p


def make_dataset(opt):
    """Returns (batch iterator, steps_per_epoch or 0 when unbounded)."""
    if opt.dataset == "synthetic":
        from coponerf_tpu.data.synthetic import make_batch

        def gen(seed):
            return make_batch(
                batch_size=opt.batch_size, image_size=opt.image_size,
                n_rays=opt.query_sparsity, seed=seed,
            )

        if opt.synthetic_pool:
            # Procedural generation costs ~0.6 s/pair on a 1-core host —
            # serialized with the ~0.1 s/pair TPU step it dominates the wall
            # clock.  A pregenerated pool (cycled, ray subsets still differ
            # per epoch via the seed) keeps the chip busy.
            def pooled_iter():
                pool = [gen(s + 1) for s in range(opt.synthetic_pool)]
                i = 0
                while True:
                    yield pool[i % len(pool)]
                    i += 1

            return pooled_iter(), 0

        def synthetic_iter():
            seed = 0
            while True:
                seed += 1
                yield gen(seed)

        return synthetic_iter(), 0
    if opt.dataset == "acid":
        from coponerf_tpu.data.acid import ACID as DS
    else:
        from coponerf_tpu.data.realestate import RealEstate10k as DS
    from coponerf_tpu.data.loader import make_loader

    ds = DS(opt.data_root, opt.pose_root, num_ctxt_views=opt.views,
            num_query_views=1, query_sparsity=opt.query_sparsity, augment=True)
    # multiprocess prefetching (reference: 8 DataLoader workers, train.py:89-90)
    it = make_loader(ds, opt.batch_size, shuffle=True, num_workers=opt.num_workers)
    return it, max(1, len(ds) // opt.batch_size)


def main():
    from coponerf_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    # multi-host (DCN) training: set COPONERF_DISTRIBUTED=1 on each host and
    # the usual JAX coordinator env vars; the same 1-D data mesh then spans
    # all hosts' devices.
    if os.environ.get("COPONERF_DISTRIBUTED"):
        import jax

        jax.distributed.initialize()
    opt = parse_with_config(build_parser())

    from coponerf_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
    from coponerf_tpu.training import checkpoint as ckpt_lib
    from coponerf_tpu.training import trainer

    train_batches, steps_per_epoch = make_dataset(opt)

    cfg = Config(
        model=ModelConfig(
            n_view=opt.views, compute_dtype=opt.compute_dtype,
            fast_sampling=opt.fast, remat_ufc=not opt.no_remat,
            ufc_scan=opt.ufc_scan,
        ),
        loss=LossConfig(
            l2_coeff=opt.l2_coeff, depth=opt.depth, pose=opt.pose,
            cycle=opt.cycle, ssim=opt.ssim,
        ),
        train=TrainConfig(
            lr=opt.lr, batch_size=opt.batch_size, num_epochs=opt.num_epochs,
            query_sparsity=opt.query_sparsity,
            steps_til_summary=opt.steps_til_summary,
            epochs_til_ckpt=opt.epochs_til_ckpt,
            iters_til_ckpt=opt.iters_til_ckpt,
            steps_per_epoch=steps_per_epoch,
            flat_optimizer=opt.flat_opt,
            debug_nans=opt.debug_nans,
            seed=opt.seed,
        ),
        logging_root=opt.logging_root,
        experiment_name=opt.experiment_name,
    )

    train_iter = (b for b, _ in iter(train_batches))

    val_fn = None
    if opt.val_root:
        from coponerf_tpu.data.scene_dataset import batch_iterator
        from coponerf_tpu.training.validation import make_val_fn

        if opt.dataset == "acid":
            from coponerf_tpu.data.acid import ACID as ValDS
        else:
            from coponerf_tpu.data.realestate import RealEstate10k as ValDS
        val_ds = ValDS(opt.val_root, opt.val_pose_root or opt.pose_root,
                       num_ctxt_views=opt.views, num_query_views=1,
                       query_sparsity=None, augment=False)
        val_batches = []
        it = batch_iterator(val_ds, batch_size=1, shuffle=False)
        for i, vb in enumerate(it):
            val_batches.append(vb)
            if i >= opt.val_batches - 1:
                break
        val_fn = make_val_fn(cfg, val_batches, image_size=opt.image_size,
                             max_batches=opt.val_batches)

    state = None
    if opt.checkpoint_path:
        import jax
        import jax.numpy as jnp

        first = next(iter(train_batches))[0]
        state = trainer.create_train_state(
            cfg, jax.tree.map(jnp.asarray, first), jax.random.PRNGKey(cfg.train.seed)
        )
        if opt.checkpoint_path.endswith(".pth"):
            from coponerf_tpu.utils.torch_import import convert_state_dict, load_torch_checkpoint

            params, batch_stats = convert_state_dict(load_torch_checkpoint(opt.checkpoint_path))
            state = state.replace(params=params, batch_stats=batch_stats)
        else:
            state = ckpt_lib.restore_into(state, opt.checkpoint_path)
        print(f"Loaded weights from {opt.checkpoint_path}")

    trainer.train(cfg, train_iter, num_steps=opt.max_steps, state=state, val_fn=val_fn)


if __name__ == "__main__":
    main()
