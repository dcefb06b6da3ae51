"""Correlation-guided "fundamental-matrix-style" cross-attention pose head.

Parity target: models/backbone.py:209-278 (quadratic positional encodings
from normalized intrinsics), 280-383 (CrossAttention with dual-softmax
correlation attention and bilinear forms), 386-428 (CrossBlock).

Notes on faithful quirks:
  - The positional encoding uses the reference's token indexing p[i] with
    x = xs[i // h], y = ys[i % h] (backbone.py:196-198, 267-271), i.e. it is
    TRANSPOSED relative to the row-major feature tokens.  Since h == w this
    is a consistent (if unusual) choice we replicate exactly.
  - With the reference's normalization (hpix=2cy, wpix=2cx), the normalized
    principal point is identically zero, so K^{-1}[x, y, 1] reduces to
    (x * cx / fx, y * cy / fy) — the double loop at backbone.py:266-271
    vectorizes to two scalar multiplies.
  - The two bilinear forms (v^T A) v are 262x4096x4096 matmuls — pure MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from coponerf_tpu.models.layers import Dense, TransformerMlp


def get_positional_encodings(n_tokens: int, intrinsics):
    """(y^2, x^2, xy, y, x, 1) per token; intrinsics = (fx, fy, cx, cy) each
    (B, 1), normalized to a 0-1 image."""
    fx, fy, cx, cy = intrinsics
    B = fx.shape[0]
    h = w = int(round(n_tokens ** 0.5))
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    # reference token layout: index i -> (x = xs[i // h], y = ys[i % h])
    y_coef = (cy / fy)  # (B, 1)
    x_coef = (cx / fx)
    p3 = jnp.tile(ys, (w,))[None] * y_coef  # (B, N)
    p4 = jnp.repeat(xs, h)[None] * x_coef
    ones = jnp.ones_like(p3)
    return jnp.stack([p3 * p3, p4 * p4, p3 * p4, p3, p4, ones], axis=-1)


class CrossAttention(nn.Module):
    dim: int = 256

    @nn.compact
    def __call__(self, x1, x2, corr, intrinsics):
        """x1/x2: (B, N, C) normalized tokens; corr: (B, 1, N, N) flattened."""
        B, N, C = x1.shape
        attn_1 = corr[:, 0].reshape(B, N, N)  # (src, trg)
        attn_2 = jnp.swapaxes(attn_1, -1, -2)

        af1 = nn.softmax(attn_1, axis=-1) * nn.softmax(attn_1, axis=-2)
        af2 = nn.softmax(attn_2, axis=-1) * nn.softmax(attn_2, axis=-2)

        positional = get_positional_encodings(N, intrinsics).astype(x1.dtype)
        v1 = jnp.concatenate([x1, positional], axis=-1)
        v2 = jnp.concatenate([x2, positional], axis=-1)

        # bilinear "fundamental" features: (v^T A) v -> (B, C+6, C+6)
        f1 = jnp.einsum("bnc,bnm,bmd->bcd", v1, af1, v1)
        f2 = jnp.einsum("bnc,bnm,bmd->bcd", v2, af2, v2)
        f1 = jnp.swapaxes(f1, -1, -2)
        f2 = jnp.swapaxes(f2, -1, -2)

        proj = Dense(self.dim, name="proj_fundamental")
        f1 = proj(f1)
        f2 = proj(f2)
        # flipped on return, as in the reference (backbone.py:357-359)
        return f2, f1


class CrossBlock(nn.Module):
    dim: int = 256
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, corr, intrinsics):
        """x: (B*2, N, C) tokens for both context views interleaved;
        returns (B, 2*(C+6), C) pose features."""
        b2, n, c = x.shape
        x = x.reshape(-1, 2, n, c)
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        f1, f2 = CrossAttention(self.dim, name="cross_attn")(
            norm1(x[:, 0]), norm1(x[:, 1]), corr, intrinsics
        )
        fundamental = jnp.concatenate([f1[:, None], f2[:, None]], axis=1)
        fundamental = fundamental.reshape(x.shape[0], -1, c)
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        mlp = TransformerMlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")
        fundamental = fundamental + mlp(norm2(fundamental))
        return nn.LayerNorm(epsilon=1e-5, name="norm")(fundamental)
