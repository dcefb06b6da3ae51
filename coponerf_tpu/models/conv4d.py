"""Separable 4D convolution over correlation volumes.

Parity target: models/conv4d.py:7-163.  A Conv4d over a correlation volume is
decomposed (as in the reference) into a 2D conv over the query pair with the
support pair folded into the batch, plus a 2D conv over the support pair with
the query pair folded in, summed.  When strided, each branch first max-pools
the *other* pair (kernel = stride, ceil mode).  The two branches run as ONE
grouped NHWC convolution.

TPU layout note: correlation volumes are carried FLATTENED as
``(B, L, Hq*Wq, Hs*Ws)`` throughout the framework — the naive 6D layout puts
a 16- or 64-wide axis in the lane dimension, which the (8, 128) tiling pads
8x/2x in HBM (measured: it is what OOMs 256^2 training).  Spatial pairs are
materialized only transiently inside the conv/pool ops.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp

from coponerf_tpu.models.layers import GroupNormND, torch_kernel_init, torch_bias_init

# Conv4d branch formulations (the `impl` field, plumbed from
# ModelConfig.conv4d_impl): "2d" folds the untouched pair into the batch of a
# 2D conv (one grouped conv when symmetric); "3d" runs each branch as one conv
# with three spatial dims directly on the flattened layout (no transposes).


def maxpool_pair_flat(x: jnp.ndarray, size: int, pair: str, qhw: Tuple[int, int], shw: Tuple[int, int]):
    """Max-pool one coordinate pair of a flattened volume (B, L, Q, S) with
    kernel=stride=size, ceil_mode=True (right-pad with -inf)."""
    if size == 1:
        return x, qhw, shw
    B, L, Q, S = x.shape
    hq, wq = qhw
    hs, ws = shw
    if pair == "support":
        x6 = x.reshape(B, L, Q, hs, ws)
        window = (1, 1, 1, size, size)
        dims = (3, 4)
    else:
        x6 = x.reshape(B, L, hq, wq, S)
        window = (1, 1, size, size, 1)
        dims = (2, 3)
    pads = [(0, 0)] * 5
    for d in dims:
        pads[d] = (0, (-x6.shape[d]) % size)
    out = lax.reduce_window(
        x6, -jnp.inf, lax.max, window_dimensions=window, window_strides=window, padding=pads
    )
    if pair == "support":
        hs, ws = out.shape[3], out.shape[4]
        out = out.reshape(B, L, Q, hs * ws)
    else:
        hq, wq = out.shape[2], out.shape[3]
        out = out.reshape(B, L, hq * wq, S)
    return out, (hq, wq), (hs, ws)


class _ConvParams(nn.Module):
    """Parameter holder so both 4D-conv branches can run as ONE grouped conv
    while keeping the reference-compatible query_conv/supp_conv param paths."""

    features: int
    in_channels: int
    ksize: Tuple[int, int]

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", torch_kernel_init,
            (self.ksize[0], self.ksize[1], self.in_channels, self.features),
        )
        bias = self.param(
            "bias", torch_bias_init(self.in_channels * self.ksize[0] * self.ksize[1]),
            (self.features,),
        )
        return kernel, bias


class Conv4d(nn.Module):
    out_channels: int
    kernel_size: Tuple[int, int, int, int]
    stride: Tuple[int, int, int, int]
    padding: Tuple[int, int, int, int]
    dtype: Any = None  # compute dtype (params stay f32)
    impl: str = "2d"   # branch formulation, see module docstring

    @nn.compact
    def __call__(self, x: jnp.ndarray, qhw: Tuple[int, int], shw: Tuple[int, int]):
        """x: (B, L, Hq*Wq, Hs*Ws) -> (B, L', Hq'*Wq', Hs'*Ws'), plus the new
        spatial dims."""
        if self.dtype is not None:
            x = x.astype(self.dtype)
        B, L, Q, S = x.shape
        k, s, p = self.kernel_size, self.stride, self.padding
        change_supp = s[-1] > 1 or (s[0] == 1 and k[0] == 1)
        change_query = s[0] > 1 or (s[0] == 1 and k[0] == 1)

        xq_in, qhw_q, shw_q = maxpool_pair_flat(x, s[-1], "support", qhw, shw) if change_supp else (x, qhw, shw)
        xs_in, qhw_s, shw_s = maxpool_pair_flat(x, s[0], "query", qhw, shw) if change_query else (x, qhw, shw)

        kq, bq = _ConvParams(self.out_channels, L, (k[0], k[1]), name="query_conv")()
        ks_, bs = _ConvParams(self.out_channels, L, (k[2], k[3]), name="supp_conv")()
        if self.dtype is not None:
            kq, bq = kq.astype(self.dtype), bq.astype(self.dtype)
            ks_, bs = ks_.astype(self.dtype), bs.astype(self.dtype)

        hq, wq = qhw_q  # query-branch conv spatial dims
        hs, ws = shw_s  # support-branch conv spatial dims
        Sq = xq_in.shape[-1]
        Qs = xs_in.shape[-2]

        if self.impl == "3d":
            # transpose-free formulation: run each branch as ONE conv with
            # THREE spatial dims directly on the flattened (B, L, ...) layout,
            # making the folded pair a trivial (kernel-1) spatial axis instead
            # of materializing (B*S, h, w, L) transposes (which put the tiny
            # L in the lane dimension and cost 4 HBM copies fwd + more bwd).
            xq5 = xq_in.reshape(B, L, hq, wq, Sq)
            xs5 = xs_in.reshape(B, L, Qs, hs, ws)
            oq = lax.conv_general_dilated(
                xq5, kq[:, :, None], (s[0], s[1], 1),
                ((p[0], p[0]), (p[1], p[1]), (0, 0)),
                dimension_numbers=("NCHWD", "HWDIO", "NCHWD"),
            )
            os_ = lax.conv_general_dilated(
                xs5, ks_[None], (1, s[2], s[3]),
                ((0, 0), (p[2], p[2]), (p[3], p[3])),
                dimension_numbers=("NCDHW", "DHWIO", "NCDHW"),
            )
            hqo, wqo = oq.shape[2:4]
            hso, wso = os_.shape[3:5]
            bias = (bq + bs).reshape(1, self.out_channels, 1, 1)
            xq = oq.reshape(B, self.out_channels, hqo * wqo, Sq)
            xs = os_.reshape(B, self.out_channels, Qs, hso * wso)
            return xq + xs + bias, (hqo, wqo), (hso, wso)

        # query branch: conv over (Hq, Wq), support folded into batch
        xq = jnp.transpose(xq_in.reshape(B, L, hq, wq, Sq), (0, 4, 2, 3, 1)).reshape(B * Sq, hq, wq, L)
        # support branch: conv over (Hs, Ws), query folded into batch
        xs = jnp.transpose(xs_in.reshape(B, L, Qs, hs, ws), (0, 2, 3, 4, 1)).reshape(B * Qs, hs, ws, L)

        symmetric = k[0] == k[2] and s[0] == s[2] and p[0] == p[2] and xq.shape == xs.shape
        if symmetric:
            xin = jnp.concatenate([xq, xs], axis=-1)
            kcat = jnp.concatenate([kq, ks_], axis=-1)
            out = lax.conv_general_dilated(
                xin, kcat, window_strides=(s[0], s[1]),
                padding=((p[0], p[0]), (p[1], p[1])),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=2,
            )
            xq = out[..., : self.out_channels] + bq
            xs = out[..., self.out_channels:] + bs
        else:
            xq = lax.conv_general_dilated(
                xq, kq, (s[0], s[1]), ((p[0], p[0]), (p[1], p[1])),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bq
            xs = lax.conv_general_dilated(
                xs, ks_, (s[2], s[3]), ((p[2], p[2]), (p[3], p[3])),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bs

        hqo, wqo = xq.shape[1:3]
        hso, wso = xs.shape[1:3]
        # back to flattened (B, L', Q', S')
        xq = jnp.transpose(xq.reshape(B, Sq, hqo * wqo, self.out_channels), (0, 3, 2, 1))
        xs = jnp.transpose(xs.reshape(B, Qs, hso * wso, self.out_channels), (0, 3, 1, 2))
        return xq + xs, (hqo, wqo), (hso, wso)


class Encoder4D(nn.Module):
    """N x (Conv4d -> GroupNorm -> ReLU) over a flattened correlation volume
    (models/conv4d.py:138-163)."""

    corr_levels: Sequence[int]
    kernel_size: Sequence[Tuple[int, int, int, int]]
    stride: Sequence[Tuple[int, int, int, int]]
    padding: Sequence[Tuple[int, int, int, int]]
    group: Sequence[int] = (1,)
    dtype: Any = None
    impl: str = "2d"

    @nn.compact
    def __call__(self, x: jnp.ndarray, qhw: Tuple[int, int], shw: Tuple[int, int]):
        for i, (k, s, p) in enumerate(zip(self.kernel_size, self.stride, self.padding)):
            x, qhw, shw = Conv4d(self.corr_levels[i + 1], k, s, p, self.dtype, self.impl, name=f"conv4d_{i}")(x, qhw, shw)
            x = GroupNormND(self.group[i], self.corr_levels[i + 1], name=f"gn_{i}")(x)
            x = nn.relu(x)
        return x, qhw, shw
