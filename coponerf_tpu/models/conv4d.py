"""Separable 4D convolution over correlation volumes.

Parity target: models/conv4d.py:7-163.  A Conv4d over (B, L, Hq, Wq, Hs, Ws)
is decomposed (as in the reference) into a 2D conv over the query pair with
the support pair folded into the batch, plus a 2D conv over the support pair
with the query pair folded in, summed.  When strided, each branch first
max-pools the *other* pair (kernel = stride, ceil mode).

On TPU both branches lower to large-batch NHWC convolutions that XLA maps to
the MXU via implicit GEMM.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp

from coponerf_tpu.models.layers import GroupNormND, torch_kernel_init, torch_bias_init


def maxpool_pair(x: jnp.ndarray, size: int, pair: str) -> jnp.ndarray:
    """Max-pool one coordinate pair of a 6D volume with kernel=stride=size,
    ceil_mode=True (right-pad with -inf)."""
    if size == 1:
        return x
    if pair == "support":
        window = (1, 1, 1, 1, size, size)
        dims = (-2, -1)
    else:
        window = (1, 1, size, size, 1, 1)
        dims = (2, 3)
    pads = [(0, 0)] * 6
    for d in dims:
        extra = (-x.shape[d]) % size
        pads[d % 6] = (0, extra)
    return lax.reduce_window(
        x, -jnp.inf, lax.max, window_dimensions=window, window_strides=window, padding=pads
    )


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

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax.lax

        B, L, Hq, Wq, Hs, Ws = x.shape
        k, s, p = self.kernel_size, self.stride, self.padding
        change_supp = s[-1] > 1 or (s[0] == 1 and k[0] == 1)
        change_query = s[0] > 1 or (s[0] == 1 and k[0] == 1)

        x_query_in = maxpool_pair(x, s[-1], "support") if change_supp else x
        x_supp_in = maxpool_pair(x, s[0], "query") if change_query else x
        Hs2, Ws2 = x_query_in.shape[-2:]
        Hq2, Wq2 = x_supp_in.shape[2:4]

        kq, bq = _ConvParams(self.out_channels, L, (k[0], k[1]), name="query_conv")()
        ks_, bs = _ConvParams(self.out_channels, L, (k[2], k[3]), name="supp_conv")()

        # query branch input: conv over (Hq, Wq), support folded into batch
        xq = jnp.transpose(x_query_in, (0, 4, 5, 2, 3, 1)).reshape(B * Hs2 * Ws2, Hq, Wq, L)
        # support branch input: conv over (Hs, Ws), query folded into batch
        xs = jnp.transpose(x_supp_in, (0, 2, 3, 4, 5, 1)).reshape(B * Hq2 * Wq2, Hs, Ws, L)

        symmetric = k[0] == k[2] and s[0] == s[2] and p[0] == p[2] and xq.shape == xs.shape
        if symmetric:
            # one grouped conv over the channel-concatenated branches
            xin = jnp.concatenate([xq, xs], axis=-1)
            kcat = jnp.concatenate([kq, ks_], axis=-1)
            out = jax.lax.conv_general_dilated(
                xin, kcat, window_strides=(s[0], s[1]),
                padding=((p[0], p[0]), (p[1], p[1])),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=2,
            )
            xq = out[..., : self.out_channels] + bq
            xs = out[..., self.out_channels:] + bs
        else:
            xq = jax.lax.conv_general_dilated(
                xq, kq, (s[0], s[1]), ((p[0], p[0]), (p[1], p[1])),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bq
            xs = jax.lax.conv_general_dilated(
                xs, ks_, (s[2], s[3]), ((p[2], p[2]), (p[3], p[3])),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bs

        Hqo, Wqo = xq.shape[1:3]
        xq = xq.reshape(B, Hs2, Ws2, Hqo, Wqo, self.out_channels)
        xq = jnp.transpose(xq, (0, 5, 3, 4, 1, 2))
        Hso, Wso = xs.shape[1:3]
        xs = xs.reshape(B, Hq2, Wq2, Hso, Wso, self.out_channels)
        xs = jnp.transpose(xs, (0, 5, 1, 2, 3, 4))

        return xq + xs


class Encoder4D(nn.Module):
    """N x (Conv4d -> GroupNorm -> ReLU) over a correlation volume
    (models/conv4d.py:138-163)."""

    corr_levels: Sequence[int]
    kernel_size: Sequence[Tuple[int, int, int, int]]
    stride: Sequence[Tuple[int, int, int, int]]
    padding: Sequence[Tuple[int, int, int, int]]
    group: Sequence[int] = (1,)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, (k, s, p) in enumerate(zip(self.kernel_size, self.stride, self.padding)):
            x = Conv4d(self.corr_levels[i + 1], k, s, p, name=f"conv4d_{i}")(x)
            x = GroupNormND(self.group[i], self.corr_levels[i + 1], name=f"gn_{i}")(x)
            x = nn.relu(x)
        return x
