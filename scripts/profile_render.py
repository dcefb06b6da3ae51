"""Microbenchmark the render-path stages on the real chip to target Pallas work."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from coponerf_tpu import geometry as G
from coponerf_tpu.ops.grid_sample import grid_sample

B, V = 1, 2
N = 4096      # rays per chunk
S = 64        # epipolar samples
H = W = 256


def timeit(name, fn, *args, iters=5):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:35s} {dt:8.2f} ms")
    return dt


def main():
    # generate everything on-device (host->device uploads crawl over the tunnel)
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    latents = [
        jax.random.uniform(ks[0], (B * V, 16, 16, 256)),
        jax.random.uniform(ks[1], (B * V, 32, 32, 256)),
        jax.random.uniform(ks[2], (B * V, 64, 64, 256)),
        jax.random.uniform(ks[3], (B * V, 256, 256, 64)),
    ]
    pix = jax.random.uniform(ks[4], (B * V, N, S, 2)) * 2 - 1
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 230.0
    K[0, 2] = K[1, 2] = 128.0
    Kb = jnp.asarray(np.tile(K, (B * V, 1, 1)))
    eye = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B * V, 1, 1)))
    uv = jax.random.uniform(ks[5], (B * V, N, 2)) * 255
    plucker = jax.jit(G.plucker_embedding)(eye, uv, Kb)

    timeit("grid_sample all 4 latents", lambda p: jnp.concatenate(
        [grid_sample(z, p, padding_mode="border") for z in latents], axis=-1), pix)
    timeit("grid_sample conv latent only", lambda p: grid_sample(latents[3], p, padding_mode="border"), pix)
    timeit("grid_sample 64^2 latent only", lambda p: grid_sample(latents[2], p, padding_mode="border"), pix)
    timeit("project_rays", lambda o, d: G.project_rays(o, d, eye, Kb),
           jnp.zeros((B * V, N, 3)), plucker[..., :3])
    timeit("get_3d_point_epipolar", lambda r, p: G.get_3d_point_epipolar(r, p, eye, H, W, Kb)[0],
           plucker, pix)

    feat = jax.random.uniform(ks[6], (B * V, N, S, 832))
    w1 = jax.random.uniform(ks[7], (835, 832)) * 0.01
    w2 = jax.random.uniform(ks[7], (832, 416)) * 0.01

    def enc_attn(f):
        x = jnp.concatenate([f, jnp.tanh(f[..., :3])], axis=-1)
        x = jax.nn.relu(x @ w1)
        x = x @ w2
        w = jax.nn.softmax(jnp.sum(x[..., :128] * x[..., 128:256], -1) / 11.31, -1)
        return jnp.sum(x * w[..., None], axis=-2)

    timeit("encode+attention proxy", enc_attn, feat)

    # phi decoder proxy
    zc = jax.random.uniform(ks[6], (B, N, 850))
    wz = jax.random.uniform(ks[7], (850, 128)) * 0.02
    wh = jax.random.uniform(ks[7], (128, 128)) * 0.02

    def phi(z):
        x = jax.nn.relu(z @ wz)
        for _ in range(8):
            x = jax.nn.relu(x @ wh)
        return x

    timeit("phi proxy (9 matmuls)", phi, zc)


if __name__ == "__main__":
    main()
