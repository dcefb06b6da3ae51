"""Find the fastest TPU formulation for bilinear epipolar sampling."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

BV = 2
P = 4096 * 64  # points per chunk per view
H = W = 64
C = 256


def timeit(name, fn, *args, iters=5):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn_j(*args)
    jax.block_until_ready(out)
    print(f"{name:45s} {(time.time() - t0) / iters * 1000:8.2f} ms")


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    img = jax.random.uniform(ks[0], (BV, H, W, C))
    pts = jax.random.uniform(ks[1], (BV, P, 2)) * 2 - 1

    def coords(pts):
        x = ((pts[..., 0] + 1) * W - 1) * 0.5
        y = ((pts[..., 1] + 1) * H - 1) * 0.5
        x = jnp.clip(x, 0, W - 1)
        y = jnp.clip(y, 0, H - 1)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        return x0.astype(jnp.int32), y0.astype(jnp.int32), wx, wy

    def v_take_along(img, pts):
        x0, y0, wx, wy = coords(pts)
        x1 = jnp.minimum(x0 + 1, W - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)
        flat = img.reshape(BV, H * W, C)

        def g(yi, xi):
            return jnp.take_along_axis(flat, (yi * W + xi)[..., None], axis=1)

        return (
            g(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
            + g(y0, x1) * (wx * (1 - wy))[..., None]
            + g(y1, x0) * ((1 - wx) * wy)[..., None]
            + g(y1, x1) * (wx * wy)[..., None]
        )

    def v_patch_gather(img, pts):
        """One lax.gather of 2x2xC patches per point."""
        x0, y0, wx, wy = coords(pts)

        def per_view(im, y0v, x0v, wxv, wyv):
            starts = jnp.stack([y0v, x0v], axis=-1)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1),
            )
            patch = jax.lax.gather(
                im, starts, dn, slice_sizes=(2, 2, C), mode="clip"
            )  # (P, 2, 2, C)
            w = jnp.stack(
                [(1 - wxv) * (1 - wyv), wxv * (1 - wyv), (1 - wxv) * wyv, wxv * wyv],
                axis=-1,
            ).reshape(-1, 2, 2)
            w = jnp.stack([(1 - wyv) * (1 - wxv), (1 - wyv) * wxv, wyv * (1 - wxv), wyv * wxv], -1).reshape(-1, 2, 2)
            return jnp.einsum("pijc,pij->pc", patch, w)

        return jax.vmap(per_view)(img, y0, x0, wx, wy)

    def v_take_bf16(img, pts):
        return v_take_along(img.astype(jnp.bfloat16), pts).astype(jnp.float32)

    def v_onehot_bf16(img, pts):
        x0, y0, wx, wy = coords(pts)
        x1 = jnp.minimum(x0 + 1, W - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)
        i00 = y0 * W + x0
        i10 = y0 * W + x1
        i01 = y1 * W + x0
        i11 = y1 * W + x1
        flat = img.reshape(BV, H * W, C).astype(jnp.bfloat16)
        ids = jnp.arange(H * W)

        def block(fl, idx, w):
            M = (idx[:, :, None] == ids[None, None, :]).astype(jnp.bfloat16) * w[..., None].astype(jnp.bfloat16)
            return jnp.einsum("bph,bhc->bpc", M, fl)

        out = (
            block(flat, i00, (1 - wx) * (1 - wy))
            + block(flat, i10, wx * (1 - wy))
            + block(flat, i01, (1 - wx) * wy)
            + block(flat, i11, wx * wy)
        )
        return out.astype(jnp.float32)

    def v_two_stage(img, pts):
        """Lerp in x first via 2-row patch gathers (rows are contiguous)."""
        x0, y0, wx, wy = coords(pts)

        def per_view(im, y0v, x0v, wxv, wyv):
            starts = jnp.stack([y0v, x0v], axis=-1)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
            )
            patch = jax.lax.gather(im, starts, dn, slice_sizes=(2, 2, C), mode="clip")
            top = patch[:, 0, 0] * (1 - wxv)[:, None] + patch[:, 0, 1] * wxv[:, None]
            bot = patch[:, 1, 0] * (1 - wxv)[:, None] + patch[:, 1, 1] * wxv[:, None]
            return top * (1 - wyv)[:, None] + bot * wyv[:, None]

        return jax.vmap(per_view)(img, y0, x0, wx, wy)

    timeit("take_along_axis 4 corners (current)", v_take_along, img, pts)
    timeit("take_along_axis 4 corners bf16", v_take_bf16, img, pts)
    timeit("lax.gather 2x2 patches", v_patch_gather, img, pts)
    timeit("lax.gather 2x2 patches + lerp", v_two_stage, img, pts)
    # one-hot is O(P*HW*C); only worth checking at this HW
    timeit("one-hot bf16 matmul", v_onehot_bf16, img, pts)


if __name__ == "__main__":
    main()
