"""Shared flax building blocks with torch-matching default initializers,
so training-from-scratch has the same parameter statistics as the reference
and imported torch checkpoints drop into identically-shaped trees."""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

# torch nn.Linear / nn.Conv2d default: kaiming_uniform(a=sqrt(5)) on weights
# == U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
# variance_scaling(1/3, fan_in, uniform) gives bound sqrt(3*(1/3)/fan_in) = 1/sqrt(fan_in).
torch_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# kaiming_normal(fan_in, a=0): N(0, sqrt(2/fan_in)) — used by the reference's
# light-field decoder (models/lightfield.py:35-38).
kaiming_normal_init = variance_scaling(2.0, "fan_in", "normal")


def torch_bias_init(kernel_fan_in: int):
    bound = 1.0 / (kernel_fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    """nn.Dense with torch default init (weights and bias); optional compute
    dtype (params stay f32, matmul runs in ``dtype``)."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_zero: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bias_init = nn.initializers.zeros if self.bias_zero else torch_bias_init(fan_in)
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or torch_kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
        )(x)


class _RawDenseCore(nn.Module):
    """Param holder matching nn.Dense's tree ({kernel, bias}) and torch
    default inits, but exposing the raw arrays as attributes so callers can
    fold this layer's kernel into adjacent linear maps (e.g. ``K @ W2``)."""

    features: int
    in_features: int

    def setup(self):
        self.kernel = self.param(
            "kernel", torch_kernel_init, (self.in_features, self.features)
        )
        self.bias = self.param(
            "bias", torch_bias_init(self.in_features), (self.features,)
        )


class RawDense(nn.Module):
    """Drop-in for Dense (identical param path ``<name>/Dense_0/{kernel,bias}``
    and init distributions) whose kernel/bias are directly readable via
    ``.kernel``/``.bias`` — required by the render path's algebraic folding
    (latent_value/key_map deferred through query_encode_latent_2).  Optional
    ``dtype`` matches Dense's compute-dtype semantics (params stay f32)."""

    features: int
    in_features: int
    dtype: Optional[Any] = None

    def setup(self):
        self.core = _RawDenseCore(self.features, self.in_features, name="Dense_0")

    @property
    def kernel(self):
        return self.core.kernel

    @property
    def bias(self):
        return self.core.bias

    def __call__(self, x):
        assert x.shape[-1] == self.in_features, (x.shape, self.in_features)
        if self.dtype is not None:
            return (
                x.astype(self.dtype) @ self.core.kernel.astype(self.dtype)
                + self.core.bias.astype(self.dtype)
            )
        return x @ self.core.kernel + self.core.bias


class _SplitDenseCore(nn.Module):
    """Dense whose input arrives pre-split along the feature axis: applies
    kernel row-slices per chunk and sums the partial products.  Math-identical
    to Dense(concat(parts)) up to f32 reassociation, but the multi-GB concat
    of render-path sample tensors never materializes in HBM."""

    features: int
    splits: Sequence[int]
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, parts):
        fan_in = sum(self.splits)
        assert len(parts) == len(self.splits), (len(parts), self.splits)
        kernel = self.param("kernel", torch_kernel_init, (fan_in, self.features))
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        kd = self.dtype or kernel.dtype
        acc = None
        off = 0
        for p, c in zip(parts, self.splits):
            assert p.shape[-1] == c, (p.shape, c)
            w = jax.lax.slice_in_dim(kernel, off, off + c, axis=0).astype(kd)
            part = jnp.dot(p.astype(kd), w, preferred_element_type=kd)
            acc = part if acc is None else acc + part
            off += c
        return acc + bias.astype(kd)


class SplitDense(nn.Module):
    """Drop-in for Dense with the parameter tree unchanged
    (<name>/Dense_0/{kernel,bias}) but a list-of-chunks input."""

    features: int
    splits: Sequence[int]
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, parts):
        return _SplitDenseCore(
            self.features, tuple(self.splits), self.dtype, name="Dense_0"
        )(parts)


class MLPSeq(nn.Module):
    """A stack of Dense layers with an activation in between (and optionally
    before/after), mirroring the reference's nn.Sequential regressors."""

    features: Sequence[int]
    act: Callable = nn.relu
    act_first: bool = False
    act_last: bool = False

    @nn.compact
    def __call__(self, x):
        if self.act_first:
            x = self.act(x)
        for i, f in enumerate(self.features):
            x = Dense(f, name=f"fc{i}")(x)
            if i < len(self.features) - 1 or self.act_last:
                x = self.act(x)
        return x


class TransformerMlp(nn.Module):
    """fc1 -> GELU -> fc2 (timm-style Mlp, backbone.py:107-125)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = Dense(self.out, name="fc2")(x)
        return x


class LayerNorm(nn.Module):
    """LayerNorm with torch eps."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5)(x)


def group_norm_nd(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over (C, *spatial) for tensors laid out (B, C, *spatial),
    matching torch.nn.GroupNorm on arbitrary-rank inputs (used on 6D
    correlation volumes, models/conv4d.py:151)."""
    b, c = x.shape[:2]
    spatial = x.shape[2:]
    g = num_groups
    dt = x.dtype
    # statistics always in f32 (a no-op upcast on the exact path; required
    # for stability when the volume pipeline runs in bf16)
    xg = x.astype(jnp.float32).reshape(b, g, -1)
    mean = jnp.mean(xg, axis=-1, keepdims=True)
    var = jnp.var(xg, axis=-1, keepdims=True)
    xg = ((xg - mean) / jnp.sqrt(var + eps)).astype(dt)
    x = xg.reshape(b, c, *spatial)
    shape = (1, c) + (1,) * len(spatial)
    return x * scale.astype(dt).reshape(shape) + bias.astype(dt).reshape(shape)


class GroupNormND(nn.Module):
    """GroupNorm module for (B, C, *spatial) tensors of any rank."""

    num_groups: int
    num_channels: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.num_channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_channels,))
        return group_norm_nd(x, scale, bias, self.num_groups)


class RawConv(nn.Module):
    """Drop-in for ``nn.Conv(features, (kh, kw), padding=p)`` with the SAME
    param path (``<name>/{kernel, bias}``), shapes and init distributions,
    but exposing ``.kernel``/``.bias`` directly — required by the train
    path's fused conv+sample custom VJP (ops/convmap_sample.py), which
    needs the raw arrays to route the sampling gradient straight to the
    conv kernel."""

    features: int
    kernel_size: tuple
    in_features: int
    padding: int = 0
    dtype: Optional[Any] = None

    def setup(self):
        kh, kw = self.kernel_size
        self.kernel = self.param(
            "kernel", torch_kernel_init, (kh, kw, self.in_features, self.features)
        )
        self.bias = self.param(
            "bias", torch_bias_init(self.in_features * kh * kw), (self.features,)
        )

    def __call__(self, x):
        k, b = self.kernel, self.bias
        if self.dtype is not None:
            x, k, b = x.astype(self.dtype), k.astype(self.dtype), b.astype(self.dtype)
        p = self.padding
        out = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + b
