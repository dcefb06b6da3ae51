"""Trained-weights distributed/resume parity gates (PARITY.md gates 2-3).

Gate 2 (default): render the SAME trained checkpoint on one device and on an
8-virtual-device `rays`-sharded CPU mesh (the workload's sequence axis,
SURVEY §5 long-context analogue) and compare rgb bitwise.  Random-weight
sharding equality is already pinned by tests/test_sharded_render.py; this
re-proves it where numeric error actually shows — peaked trained attention.

Gate 3 (--resume, real TPU): from a mid-training checkpoint, two optimizer
steps taken continuously must equal one step -> save -> load -> one step
(reference resume semantics: train.py:111-117 restores the 'optimizer' dict
so Adam moments survive).  Bit-exact because checkpoint.py round-trips f32
Adam state through .npz losslessly and restores as jax arrays.

Usage:
    python scripts/sharded_parity.py CKPT [n_rays]        # gate 2 (CPU mesh)
    python scripts/sharded_parity.py CKPT --resume        # gate 3 (TPU)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Both gates run at the qgate_r3 training resolution: the UFC positional
# embeddings are image-size-dependent (16^2 level = 256 tokens at 256^2), so
# the trained checkpoint only applies at 256^2.  Keep n_rays small for the
# 1-core CPU host in gate 2.
IMG = 256


def gate_sharded(ckpt: str, n_rays: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from coponerf_tpu.config import ModelConfig
    from coponerf_tpu.data.synthetic import make_batch
    from coponerf_tpu.models import CoPoNeRF
    from coponerf_tpu.training import checkpoint as ckpt_lib

    params, batch_stats, _, step = ckpt_lib.load(ckpt)
    variables = jax.tree.map(jnp.asarray, {"params": params, "batch_stats": batch_stats})
    print(f"checkpoint {ckpt} (step {step}); {n_rays} rays on {len(jax.devices())} devices",
          flush=True)

    model = CoPoNeRF(ModelConfig())  # exact f32 path
    batch_np, _ = make_batch(batch_size=1, image_size=IMG, n_rays=n_rays, seed=9000)
    batch = jax.tree.map(jnp.asarray, batch_np)

    encode = jax.jit(lambda v, b: model.apply(v, b, train=False, method="encode"))
    render = jax.jit(lambda v, b, s: model.apply(v, b, s, val=True, method="render")["rgb"])

    state = encode(variables, batch)
    rgb_single = np.asarray(render(variables, batch, state))
    print("single-device render done", flush=True)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("rays",))
    repl = NamedSharding(mesh, P())
    ray_sh = NamedSharding(mesh, P(None, None, "rays"))

    def shard_leaf(path, x):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        if "query/uv" in key or "query/rgb" in key:
            return jax.device_put(x, ray_sh)
        return jax.device_put(x, repl)

    sharded_batch = jax.tree_util.tree_map_with_path(shard_leaf, batch)
    rgb_sharded = np.asarray(
        render(jax.device_put(variables, repl), sharded_batch, jax.device_put(state, repl))
    )

    delta = float(np.max(np.abs(rgb_sharded - rgb_single)))
    gt = np.asarray(batch_np["query"]["rgb"])  # (1, 1, n_rays, 3) in [0,1]

    def psnr(x):
        # render stacks the two val hypotheses along the batch/context axis;
        # compare the estimated-pose hypothesis (index 0) to gt
        pred = x.reshape(2, -1, 3)[0] if x.shape[0] == 2 else x.reshape(-1, 3)
        mse = float(np.mean((pred - gt.reshape(-1, 3)) ** 2))
        return -10.0 * np.log10(mse)

    print(f"max |rgb_sharded - rgb_single| = {delta:.3e}")
    print(f"PSNR single={psnr(rgb_single):.4f}  sharded={psnr(rgb_sharded):.4f}  "
          f"dPSNR={psnr(rgb_sharded) - psnr(rgb_single):+.6f}")
    assert delta == 0.0, "ray-sharded render is not bitwise identical"
    print("GATE 2 PASS (bitwise identical)")


def gate_resume(ckpt: str) -> None:
    import dataclasses

    from coponerf_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from coponerf_tpu.config import Config, ModelConfig
    from coponerf_tpu.data.synthetic import make_batch
    from coponerf_tpu.training import checkpoint as ckpt_lib
    from coponerf_tpu.training.trainer import create_train_state, make_train_step

    base = Config()
    # same numerics/loss config as the qgate_r3 training run
    cfg = dataclasses.replace(
        base,
        model=dataclasses.replace(
            ModelConfig(), fast_sampling=True, compute_dtype="bfloat16"
        ),
        loss=dataclasses.replace(base.loss, pose=True, cycle=True, ssim=True),
    )

    batch_np, _ = make_batch(batch_size=2, image_size=IMG, n_rays=192, seed=77)
    batch = jax.tree.map(jnp.asarray, batch_np)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(cfg, batch, rng)
    state = ckpt_lib.restore_into(state, ckpt)
    print(f"restored step {state.step}", flush=True)

    step_fn = make_train_step(cfg)

    # one step, snapshot to host BEFORE the donated second step consumes s1
    s1, _ = step_fn(state, batch)
    path = ckpt_lib.save("/tmp/resume_gate", s1, int(s1.step), name="mid")
    # continuous trajectory: second step
    s2_cont, _ = step_fn(s1, batch)

    # interrupted trajectory: load the snapshot -> one step
    state_b = create_train_state(cfg, batch, jax.random.PRNGKey(1))  # different init
    state_b = ckpt_lib.restore_into(state_b, path)
    s2_res, _ = step_fn(state_b, batch)

    leaves_a = jax.tree_util.tree_leaves(s2_cont.params)
    leaves_b = jax.tree_util.tree_leaves(s2_res.params)
    worst = max(
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        for a, b in zip(leaves_a, leaves_b)
    )
    print(f"max param delta after resume = {worst:.3e}")
    assert worst == 0.0, "resume is not bit-exact"
    print("GATE 3 PASS (bit-exact resume across optimizer state)")


def main():
    ckpt = sys.argv[1]
    if "--resume" in sys.argv:
        gate_resume(ckpt)
    else:
        n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
        gate_sharded(ckpt, n_rays)


if __name__ == "__main__":
    main()
