"""Bilinear resampling expressed as small dense matmuls.

On TPU, separable bilinear resizing of feature maps is most efficient as two
(out, in) weight-matrix contractions that run on the MXU, instead of the
gather-based formulation a GPU implementation would use.  The weight matrices
are built with numpy at trace time (shapes are static under jit), so the
resize lowers to two einsums that XLA fuses with neighbouring ops.

Semantics match ``torch.nn.functional.interpolate(mode='bilinear')`` for both
``align_corners`` conventions (the reference mixes them: align_corners=True in
models/aggregation.py:52-54 and models/conv4d.py:46, align_corners=False —
the default — in models/CoPoNeRF.py:230-231 and utils_training/utils.py:55).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_weights_np(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    out_idx = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros_like(out_idx)
        else:
            src = out_idx * (in_size - 1) / (out_size - 1)
    else:
        src = (out_idx + 0.5) * in_size / out_size - 0.5
        src = np.maximum(src, 0.0)
    x0 = np.floor(src).astype(np.int64)
    x0 = np.clip(x0, 0, in_size - 1)
    x1 = np.minimum(x0 + 1, in_size - 1)
    w1 = src - x0
    w0 = 1.0 - w1
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    mat[np.arange(out_size), x0] += w0
    mat[np.arange(out_size), x1] += w1
    return mat.astype(np.float32)


def resize_bilinear(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    align_corners: bool = False,
    axes: tuple[int, int] = (-3, -2),
) -> jnp.ndarray:
    """Bilinearly resize two axes of ``x`` to ``out_hw``.

    By default resizes the (H, W) axes of an NHWC tensor.  The contraction is
    two matmuls: ``y = Wh @ x @ Ww^T`` along the chosen axes.
    """
    h_ax = axes[0] % x.ndim
    w_ax = axes[1] % x.ndim
    in_h, in_w = x.shape[h_ax], x.shape[w_ax]
    out_h, out_w = out_hw
    dtype = x.dtype
    # HIGHEST precision: interpolation weights carry sub-pixel fractions that
    # bf16 MXU passes would quantize visibly (hurts PSNR parity).
    if in_h != out_h:
        wh = jnp.asarray(_linear_weights_np(in_h, out_h, align_corners), dtype)
        x = jnp.moveaxis(jnp.tensordot(wh, x, axes=(1, h_ax), precision="highest"), 0, h_ax)
    if in_w != out_w:
        ww = jnp.asarray(_linear_weights_np(in_w, out_w, align_corners), dtype)
        x = jnp.moveaxis(jnp.tensordot(ww, x, axes=(1, w_ax), precision="highest"), 0, w_ax)
    return x


def resize_nchw(x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = False) -> jnp.ndarray:
    """Resize an NCHW tensor (reference layout) — convenience wrapper."""
    return resize_bilinear(x, out_hw, align_corners, axes=(-2, -1))


def resize4d_flat_kron(x: jnp.ndarray, in_hw: int, out_hw: int, align_corners: bool = True) -> jnp.ndarray:
    """Bilinearly resize BOTH spatial pairs of a FLATTENED correlation volume
    ``(B, C, in_hw^2, in_hw^2) -> (B, C, out_hw^2, out_hw^2)`` without ever
    leaving the flat layout.

    Folding each pair's (Wh, Ww) into one kron-structured matrix keeps every
    tensor (B, C, Q, S) with a 128-multiple lane dim; exact same weighted
    sums as the two-pass form (row of kron(Wh, Ww) = outer product of the
    rows), modulo f32 summation order.

    MEASURED-NEGATIVE as the UFC flow upsampler (2026-08-19, v5e train step
    batch 6): 426 ms/step vs 417 ms for separable interpolate4d_flat +
    soft_argmax_flat, encode fwd +90 ms, compile 17 min — the kron flops
    (f32-highest 206 GF at the 32^2 stage) cost more than the 5D layout
    padding they avoid once soft_argmax_flat removes the big marginal
    buffers.  Kept as tested infrastructure for volumes whose separable
    intermediates are the actual bottleneck."""
    if in_hw == out_hw:
        return x
    w1 = _linear_weights_np(in_hw, out_hw, align_corners)
    wk = jnp.asarray(np.kron(w1, w1), x.dtype)            # (out^2, in^2)
    x = jnp.einsum("bcqs,ts->bcqt", x, wk, precision="highest")
    x = jnp.einsum("rq,bcqs->bcrs", wk, x, precision="highest")
    return x


def interpolate4d(
    corr: jnp.ndarray, out_shape: tuple[int, int, int, int], align_corners: bool = True
) -> jnp.ndarray:
    """Resize a 4D correlation volume ``(B, L, Hq, Wq, Hs, Ws)`` on all four
    spatial axes, as the reference does in two 2D passes
    (models/aggregation.py:49-56): first the trailing (target) pair, then the
    leading (source) pair.  Each pass is a pair of MXU matmuls here.
    """
    hq, wq, hs, ws = out_shape
    corr = resize_bilinear(corr, (hs, ws), align_corners, axes=(-2, -1))
    corr = resize_bilinear(corr, (hq, wq), align_corners, axes=(2, 3))
    return corr
