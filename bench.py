"""Headline benchmark: rendered rays/sec/chip at 256x256.

Mirrors the reference eval protocol (test.py:173-196): encode the stereo pair
once, then render a full 256x256 query image (65,536 rays, 64 epipolar
samples/ray, dual-hypothesis val mode) in fixed-size ray chunks.  Rays/sec is
measured over the render phase with encode amortized out, matching how the
reference's throughput would be measured on its own harness.

Timing methodology: jax.block_until_ready is a NO-OP on the tunneled axon
backend, so the render loop runs INSIDE one jitted lax.fori_loop whose carry
consumes the output; a scalar fetch forces completion and two loop lengths
are differenced to cancel the fixed dispatch overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md), so
the denominator is DERIVED, not guessed: the render path costs 668.9 MF/ray
(auditable ledger: scripts/flops_ledger.py), the reference runs pure fp32
(no autocast/TF32-matmul in the repo), and an A6000 peaks at 38.7 TFLOP/s
fp32 => speed-of-light 57.9k rays/s/GPU; granting the reference a generous
50% MFU gives 2.9e4 rays/s/GPU.  Full derivation: BASELINE.md.  (Round 1's
1.3e5 guess exceeded the A6000 fp32 speed-of-light 2.2x and was impossible.)
"""

import json
import sys
import time

REF_RAYS_PER_SEC_PER_CHIP = 2.9e4  # A6000 roofline @ 50% MFU; see BASELINE.md

IMAGE = 256
# chunk sweep at cf[16,4] (2026-08-19, real chip): 16384 -> 273.9k, 32768 ->
# 307.2k rays/s/chip — at 20 samples/ray the larger chunk amortizes the
# per-chunk fixed geometry/dispatch work the 64-sample tuning hid.
CHUNK = 32768
N_LO, N_HI = 1, 5  # images rendered per timing call

# Two-stage coarse-to-fine epipolar sampling (quality-gated in PARITY.md on
# TRAINED weights: cf[16,4] measured +0.027 dB vs exact, pose identical —
# inside the <=0.1 dB budget; joint softmax over the coarse+fine union keeps
# every computed sample mathematically exact).  Override with --cf A,B or
# disable with --cf 0,0 (single 64-sample uniform stage).
CF_DEFAULT = (16, 4)


def main():
    cf = CF_DEFAULT
    chunk = CHUNK
    for a in sys.argv[1:]:
        if a.startswith("--cf"):
            ab = a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1]
            cf = tuple(int(x) for x in ab.split(","))
        if a.startswith("--chunk"):
            chunk = int(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    import jax

    from coponerf_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from coponerf_tpu.config import ModelConfig
    from coponerf_tpu.data.synthetic import make_batch
    from coponerf_tpu.models import CoPoNeRF
    from coponerf_tpu.utils.fast_init import fast_init

    cfg = ModelConfig(
        fast_sampling=True,
        compute_dtype="bfloat16",
        coarse_samples=cf[0],
        fine_samples=cf[1],
    )
    model = CoPoNeRF(cfg)
    n_rays = IMAGE * IMAGE
    batch_np, _ = make_batch(
        batch_size=1, image_size=IMAGE, n_rays=n_rays, seed=0, full_query_image=True
    )
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=False)

    n_chunks = n_rays // chunk
    rendered_rays = n_chunks * chunk  # rays actually rendered per image
    if rendered_rays != n_rays:
        # a non-dividing chunk renders fewer rays than the full image; the
        # throughput denominator must count what was rendered, not n_rays
        print(
            f"# WARNING: --chunk {chunk} does not divide {n_rays} rays; "
            f"rendering {rendered_rays} rays/image and accounting only those",
            file=sys.stderr,
        )

    def chunk_query(b, i):
        q = dict(b["query"])
        q["uv"] = jax.lax.dynamic_slice_in_dim(b["query"]["uv"], i * chunk, chunk, axis=2)
        q["rgb"] = jax.lax.dynamic_slice_in_dim(b["query"]["rgb"], i * chunk, chunk, axis=2)
        return {"context": b["context"], "query": q}

    encode = jax.jit(lambda v, b: model.apply(v, b, train=False, method="encode"))

    def render_image(variables, batch, state):
        def body(i, acc):
            out = model.apply(variables, chunk_query(batch, i), state, val=True, method="render")
            return acc + jnp.sum(out["rgb"].astype(jnp.float32))

        return jax.lax.fori_loop(0, n_chunks, body, 0.0)

    @jax.jit
    def timed_loop(n, variables, batch, state):
        def body(k, acc):
            b = dict(batch)
            q = dict(b["query"])
            q["uv"] = q["uv"] + (k * 1e-30).astype(jnp.float32)  # defeat hoisting
            b["query"] = q
            return acc + render_image(variables, b, state)

        return jax.lax.fori_loop(0, n, body, 0.0)

    state = encode(variables, batch)
    float(timed_loop(jnp.int32(1), variables, batch, state))  # compile + warm

    t0 = time.time()
    float(timed_loop(jnp.int32(N_LO), variables, batch, state))
    t_lo = time.time() - t0
    t0 = time.time()
    float(timed_loop(jnp.int32(N_HI), variables, batch, state))
    t_hi = time.time() - t0
    dt = (t_hi - t_lo) / (N_HI - N_LO)

    rays_per_sec = rendered_rays / dt
    print(f"# per-image render {dt * 1000:.0f} ms", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "rendered_rays_per_sec_per_chip_256",
                "value": round(float(rays_per_sec), 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(float(rays_per_sec / REF_RAYS_PER_SEC_PER_CHIP), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
