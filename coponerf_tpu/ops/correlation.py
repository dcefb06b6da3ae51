"""Correlation-volume primitives: cosine 4D correlation, temperature softmax,
soft-argmax flow extraction, and mapping<->flow conversions.

Parity targets: models/aggregation.py:70-74 (correlation), 119-144
(softmax_with_temperature / soft_argmax), 30-48
(unnormalise_and_convert_mapping_to_flow).

Correlation volumes use the reference's axis order
``(B, L, H_src, W_src, H_trg, W_trg)`` throughout the framework.
The correlation itself is one big batched matmul on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def l2_normalize_channels(feat: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Normalize the trailing channel axis: x / (||x|| + eps)."""
    norm = jnp.linalg.norm(feat, axis=-1, keepdims=True)
    return feat / (norm + eps)


def correlation(src_feat: jnp.ndarray, trg_feat: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Cosine correlation between two NHWC feature maps.

    src_feat/trg_feat: (B, H, W, C) -> (B, H, W, H', W').
    """
    src = l2_normalize_channels(src_feat, eps)
    trg = l2_normalize_channels(trg_feat, eps)
    return jnp.einsum("bhwc,bxyc->bhwxy", src, trg)


def correlation_tokens(src_tokens: jnp.ndarray, trg_tokens: jnp.ndarray, feat_hw: tuple[int, int], eps: float = 1e-5) -> jnp.ndarray:
    """Cosine correlation between token sequences (B, H*W, C) laid out
    row-major; returns (B, 1, H, W, H, W) with a leading level axis."""
    h, w = feat_hw
    b, n, c = src_tokens.shape
    src = src_tokens.reshape(b, h, w, c)
    trg = trg_tokens.reshape(b, h, w, c)
    return correlation(src, trg, eps)[:, None]


def softmax_with_temperature(x: jnp.ndarray, beta: float, axis: int = 1) -> jnp.ndarray:
    m = jnp.max(x, axis=axis, keepdims=True)
    exp_x = jnp.exp((x - m) / beta)
    return exp_x / jnp.sum(exp_x, axis=axis, keepdims=True)


def soft_argmax(corr: jnp.ndarray, beta: float = 0.02):
    """Expected source coordinate per target pixel.

    corr: (B, S, h, w) where S = H_src*W_src source tokens (row-major) and
    (h, w) is the target grid.  Returns (grid_x, grid_y), each (B, 1, h, w)
    in [-1, 1] — the soft-argmax "mapping" into the source image.
    """
    b, s, h, w = corr.shape
    hs = int(round((s) ** 0.5))
    ws = s // hs
    p = softmax_with_temperature(corr, beta=beta, axis=1)
    p = p.reshape(b, hs, ws, h, w)

    x_normal = jnp.linspace(-1.0, 1.0, ws, dtype=corr.dtype)
    grid_x = jnp.sum(p, axis=1)  # marginal over source y -> (B, ws, h, w)
    grid_x = jnp.sum(grid_x * x_normal[None, :, None, None], axis=1, keepdims=True)

    y_normal = jnp.linspace(-1.0, 1.0, hs, dtype=corr.dtype)
    grid_y = jnp.sum(p, axis=2)  # marginal over source x -> (B, hs, h, w)
    grid_y = jnp.sum(grid_y * y_normal[None, :, None, None], axis=1, keepdims=True)
    return grid_x, grid_y


def soft_argmax_flat(logits: jnp.ndarray, axis: int, beta: float = 0.02) -> jnp.ndarray:
    """soft_argmax on a FLATTENED correlation (B, Q, S) without the 5D
    marginal reshapes (whose small lane dims the TPU tiling pads 2x on 400 MB
    tensors — measured in the train step).

    ``axis`` selects the token axis to softmax over (1 = the Q/source axis,
    2 = the S/target axis); positions are the OTHER axis's (row-major) grid.
    Returns the [-1, 1] mapping (B, 2, h, w) over the position grid — the
    same values as soft_argmax on the reshaped volume (expected coordinate =
    dot with per-token coordinate vectors; the marginalization is folded in
    by linearity)."""
    b, Q, S = logits.shape
    n = logits.shape[axis]
    hs = int(round(n ** 0.5))
    ws = n // hs
    m = Q if axis == 2 else S
    hm = int(round(m ** 0.5))
    wm = m // hm
    # softmax with the division DEFERRED past the coordinate dots: the
    # expectation is (e @ xv) / sum(e), so the normalized p volume never
    # materializes (one full write + two reads of the ~400 MB tensor saved;
    # same value up to f32 summation order)
    mx = jnp.max(logits, axis=axis, keepdims=True)
    e = jnp.exp((logits - mx) / beta)
    z = jnp.sum(e, axis=axis)
    ar = jnp.arange(n)
    xv = jnp.linspace(-1.0, 1.0, ws, dtype=logits.dtype)[ar % ws]
    yv = jnp.linspace(-1.0, 1.0, hs, dtype=logits.dtype)[ar // ws]
    spec = "bqs,s->bq" if axis == 2 else "bqs,q->bs"
    gx = jnp.einsum(spec, e, xv, precision="highest") / z
    gy = jnp.einsum(spec, e, yv, precision="highest") / z
    return jnp.stack([gx, gy], axis=1).reshape(b, 2, hm, wm)


def unnormalise_and_convert_mapping_to_flow(mapping: jnp.ndarray) -> jnp.ndarray:
    """[-1,1]-normalized mapping (B, 2, H, W) -> pixel flow (B, 2, H, W)."""
    b, _, h, w = mapping.shape
    mx = (mapping[:, 0] + 1) * (w - 1) / 2.0
    my = (mapping[:, 1] + 1) * (h - 1) / 2.0
    xx = jnp.arange(w, dtype=mapping.dtype)[None, None, :]
    yy = jnp.arange(h, dtype=mapping.dtype)[None, :, None]
    flow_x = mx - xx
    flow_y = my - yy
    return jnp.stack([flow_x, flow_y], axis=1)
