"""Capture a jax.profiler trace of the benchmark render path (one full
256^2 image in CHUNK-ray chunks, fast config) and print the per-op summary
via xplane_summary.  Usage: python scripts/trace_render.py [outdir]"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys

import jax
import jax.numpy as jnp

from coponerf_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from coponerf_tpu.config import ModelConfig
from coponerf_tpu.data.synthetic import make_batch
from coponerf_tpu.models import CoPoNeRF
from coponerf_tpu.utils.fast_init import fast_init

IMAGE = 256
CHUNK = 16384


def main():
    global CHUNK
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    outdir = args[0] if args else "/tmp/render_trace"
    cf = (0, 0)
    for a in sys.argv[1:]:
        if a.startswith("--cf="):
            cf = tuple(int(x) for x in a.split("=", 1)[1].split(","))
        if a.startswith("--chunk="):
            CHUNK = int(a.split("=", 1)[1])
    cfg = ModelConfig(
        fast_sampling=True, compute_dtype="bfloat16",
        coarse_samples=cf[0], fine_samples=cf[1],
    )
    model = CoPoNeRF(cfg)
    n_rays = IMAGE * IMAGE
    batch_np, _ = make_batch(1, IMAGE, n_rays, seed=0, full_query_image=True)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=False)

    n_chunks = n_rays // CHUNK

    def chunk_query(b, i):
        q = dict(b["query"])
        q["uv"] = jax.lax.dynamic_slice_in_dim(b["query"]["uv"], i * CHUNK, CHUNK, axis=2)
        q["rgb"] = jax.lax.dynamic_slice_in_dim(b["query"]["rgb"], i * CHUNK, CHUNK, axis=2)
        return {"context": b["context"], "query": q}

    encode = jax.jit(lambda v, b: model.apply(v, b, train=False, method="encode"))

    @jax.jit
    def render_image(variables, batch, state):
        def body(i, acc):
            out = model.apply(variables, chunk_query(batch, i), state, val=True, method="render")
            return acc + jnp.sum(out["rgb"].astype(jnp.float32))

        return jax.lax.fori_loop(0, n_chunks, body, 0.0)

    state = encode(variables, batch)
    print("warm:", float(render_image(variables, batch, state)))

    jax.profiler.start_trace(outdir)
    v = float(render_image(variables, batch, state))
    jax.profiler.stop_trace()
    print("traced:", v, "->", outdir)

    import os
    import subprocess

    subprocess.run([
        sys.executable, os.path.join(os.path.dirname(__file__), "xplane_summary.py"), outdir,
    ])


if __name__ == "__main__":
    main()
