"""Headline benchmark: rendered rays/sec/chip at 256x256.

Mirrors the reference eval protocol (test.py:173-196): encode the stereo pair
once, then render a full 256x256 query image (65,536 rays, 64 epipolar
samples/ray, dual-hypothesis val mode) in fixed-size ray chunks.  Rays/sec is
measured over the render phase with encode amortized out, matching how the
reference's throughput would be measured on its own harness.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md); the
denominator is an engineering estimate of the reference's per-GPU render rate
on its 4xA6000 setup (test.py renders 2x65,536 rays in 18 chunks; profiling
torch CoPoNeRF puts a chunk forward at ~45-60ms on an A6000-class part =>
~1.3e5 rays/s/GPU).  Recorded here as REF_RAYS_PER_SEC_PER_CHIP so the ratio
is auditable and can be re-anchored when a measured number exists.
"""

import json
import time

import numpy as np

REF_RAYS_PER_SEC_PER_CHIP = 1.3e5  # estimate; see module docstring

IMAGE = 256
CHUNK = 4096
N_ITERS = 3


def main():
    import jax

    from coponerf_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from coponerf_tpu.config import ModelConfig
    from coponerf_tpu.data.synthetic import make_batch
    from coponerf_tpu.models import CoPoNeRF
    from coponerf_tpu.utils.fast_init import fast_init

    cfg = ModelConfig()
    model = CoPoNeRF(cfg)
    batch_np, _ = make_batch(batch_size=1, image_size=IMAGE, n_rays=IMAGE * IMAGE, seed=0, full_query_image=True)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=False)

    n_rays = IMAGE * IMAGE
    n_chunks = n_rays // CHUNK

    def chunk_batch(i):
        q = dict(batch["query"])
        q["uv"] = jax.lax.dynamic_slice_in_dim(batch["query"]["uv"], i * CHUNK, CHUNK, axis=2)
        q["rgb"] = jax.lax.dynamic_slice_in_dim(batch["query"]["rgb"], i * CHUNK, CHUNK, axis=2)
        return {"context": batch["context"], "query": q}

    encode = jax.jit(lambda v, b: model.apply(v, b, train=False, method="encode"))

    @jax.jit
    def render_image(variables, batch, state):
        def body(i, acc):
            out = model.apply(variables, chunk_batch_t(batch, i), state, val=True, method="render")
            return jax.lax.dynamic_update_slice_in_dim(acc, out["rgb"], i * CHUNK, axis=2)

        acc = jnp.zeros((1, 1, n_rays, 3), jnp.float32)
        return jax.lax.fori_loop(0, n_chunks, body, acc)

    def chunk_batch_t(b, i):
        q = dict(b["query"])
        q["uv"] = jax.lax.dynamic_slice_in_dim(b["query"]["uv"], i * CHUNK, CHUNK, axis=2)
        q["rgb"] = jax.lax.dynamic_slice_in_dim(b["query"]["rgb"], i * CHUNK, CHUNK, axis=2)
        return {"context": b["context"], "query": q}

    state = jax.block_until_ready(encode(variables, batch))
    img = jax.block_until_ready(render_image(variables, batch, state))  # warmup/compile

    t0 = time.time()
    for _ in range(N_ITERS):
        img = render_image(variables, batch, state)
    jax.block_until_ready(img)
    dt = (time.time() - t0) / N_ITERS

    rays_per_sec = n_rays / dt
    n_chips = 1
    value = rays_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "rendered_rays_per_sec_per_chip_256",
                "value": round(float(value), 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(float(value / REF_RAYS_PER_SEC_PER_CHIP), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
