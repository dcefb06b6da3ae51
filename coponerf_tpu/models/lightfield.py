"""Per-ray light-field MLP decoder (ResnetFC).

Parity target: models/lightfield.py:9-167 — d_in=18 (two 9-dim ray coords),
d_latent=832 (two 416-dim attended features), d_hidden=128, 3 residual blocks
with per-block latent injection, custom kaiming/zero initialization.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from coponerf_tpu.models.layers import Dense, kaiming_normal_init


class ResnetBlockFC(nn.Module):
    size: int

    @nn.compact
    def __call__(self, x):
        net = Dense(self.size, kernel_init=kaiming_normal_init, bias_zero=True, name="fc_0")(nn.relu(x))
        dx = Dense(self.size, kernel_init=nn.initializers.zeros, bias_zero=True, name="fc_1")(nn.relu(net))
        return x + dx


class ResnetFC(nn.Module):
    d_in: int = 18
    d_out: int = 3
    n_blocks: int = 3
    d_latent: int = 832
    d_hidden: int = 128

    @nn.compact
    def __call__(self, zx: jnp.ndarray) -> jnp.ndarray:
        assert zx.shape[-1] == self.d_latent + self.d_in
        z = zx[..., : self.d_latent]
        x = zx[..., self.d_latent :]
        x = Dense(self.d_hidden, kernel_init=kaiming_normal_init, bias_zero=True, name="lin_in")(x)
        for i in range(self.n_blocks):
            tz = Dense(self.d_hidden, kernel_init=kaiming_normal_init, bias_zero=True, name=f"lin_z_{i}")(z)
            x = x + tz
            x = ResnetBlockFC(self.d_hidden, name=f"block_{i}")(x)
        return Dense(self.d_out, kernel_init=kaiming_normal_init, bias_zero=True, name="lin_out")(nn.relu(x))
