"""Dump the compiled (post-optimization) render-path HLO so trace items can
be matched to source lines via op_name metadata.

Usage: python scripts/dump_render_hlo.py [out.txt] [--cf=A,B] [--chunk=N]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys

import jax
import jax.numpy as jnp

from coponerf_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from coponerf_tpu.config import ModelConfig  # noqa: E402
from coponerf_tpu.data.synthetic import make_batch  # noqa: E402
from coponerf_tpu.models import CoPoNeRF  # noqa: E402
from coponerf_tpu.utils.fast_init import fast_init  # noqa: E402

IMAGE = 256


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = args[0] if args else "/tmp/render_hlo.txt"
    cf = (0, 0)
    chunk = 16384
    for a in sys.argv[1:]:
        if a.startswith("--cf="):
            cf = tuple(int(x) for x in a.split("=", 1)[1].split(","))
        if a.startswith("--chunk="):
            chunk = int(a.split("=", 1)[1])
    cfg = ModelConfig(
        fast_sampling=True, compute_dtype="bfloat16",
        coarse_samples=cf[0], fine_samples=cf[1],
    )
    model = CoPoNeRF(cfg)
    n_rays = IMAGE * IMAGE
    batch_np, _ = make_batch(1, IMAGE, n_rays, seed=0, full_query_image=True)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=False)
    n_chunks = n_rays // chunk

    def chunk_query(b, i):
        q = dict(b["query"])
        q["uv"] = jax.lax.dynamic_slice_in_dim(b["query"]["uv"], i * chunk, chunk, axis=2)
        q["rgb"] = jax.lax.dynamic_slice_in_dim(b["query"]["rgb"], i * chunk, chunk, axis=2)
        return {"context": b["context"], "query": q}

    state = jax.jit(lambda v, b: model.apply(v, b, train=False, method="encode"))(variables, batch)

    @jax.jit
    def render_image(variables, batch, state):
        def body(i, acc):
            out = model.apply(variables, chunk_query(batch, i), state, val=True, method="render")
            return acc + jnp.sum(out["rgb"].astype(jnp.float32))

        return jax.lax.fori_loop(0, n_chunks, body, 0.0)

    compiled = render_image.lower(variables, batch, state).compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes -> {out_path}")


if __name__ == "__main__":
    main()
