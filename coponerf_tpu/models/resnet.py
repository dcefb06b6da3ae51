"""ResNet-34 pixel-aligned spatial encoder (NHWC, XLA convs).

Parity target: models/backbone.py:10-102 (SpatialEncoder over torchvision
resnet34 with num_layers=5, use_first_pool=False).  For a 256x256 input the
returned pyramid (coarse-to-fine, top three kept by the top module) is
[512ch@16x16, 256ch@32x32, 128ch@64x64].

BatchNorm follows torch semantics: batch stats in training (running stats
updated with momentum 0.1), running stats at eval.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from coponerf_tpu.models.layers import torch_kernel_init


class ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        return x


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = ConvBN(self.features, 3, self.stride, name="cb1")(x, train)
        out = nn.relu(out)
        out = ConvBN(self.features, 3, 1, name="cb2")(out, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = ConvBN(self.features, 1, self.stride, name="downsample")(x, train)
        return nn.relu(out + identity)


class ResNet34Encoder(nn.Module):
    """Returns the feature pyramid reversed (deepest first), top `num_keep`."""

    layers: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)
    use_first_pool: bool = False
    num_keep: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        # x: (B, H, W, 3), ImageNet-normalized
        x = ConvBN(64, 7, 2, name="stem")(x, train)
        x = nn.relu(x)
        latents = [x]
        if self.use_first_pool:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (n_blocks, width) in enumerate(zip(self.layers, self.widths)):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = BasicBlock(width, stride, name=f"layer{stage + 1}_{b}")(x, train)
            latents.append(x)
        latents = latents[::-1]
        return latents[: self.num_keep]
