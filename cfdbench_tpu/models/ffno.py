"""Factorized Fourier Neural Operator (beyond-parity model).

Implements the FFNO architecture of Tran et al., "Factorized Fourier
Neural Operators" (arXiv:2111.13802, retrieved via PAPERS.md): each
layer applies *separable* 1-D spectral convolutions along H and W
(sum), followed by a two-layer feedforward, inside a residual branch —
O(C²·(m_h + m_w)) spectral parameters per layer instead of FNO's
O(C²·m_h·m_w), which the paper shows trains deeper and generalizes
better at equal budget.

Interface-compatible with ``Fno2d`` (``--model ffno``); input/output
conventions (mask, coords, case-param channels, masked preds) match
the CFDBench contract.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.spectral import (
    init_spectral_weights_1d,
    spectral_conv1d_matmul,
)
from .common import (
    Dense,
    gelu_exact,
    broadcast_params_to_channels,
    coord_channels,
    ensure_mask,
)


class FfnoBlock(nn.Module):
    channels: int
    modes1: int = 16
    modes2: int = 16
    ff_factor: int = 2

    @nn.compact
    def __call__(self, x):
        C = self.channels
        wh = self.param(
            "weights_h",
            lambda k: init_spectral_weights_1d(k, C, self.modes1),
        )
        ww = self.param(
            "weights_w",
            lambda k: init_spectral_weights_1d(k, C, self.modes2),
        )
        y = spectral_conv1d_matmul(x, wh, self.modes1, axis=1)
        y = y + spectral_conv1d_matmul(x, ww, self.modes2, axis=2)
        y = Dense(self.ff_factor * C)(y)
        y = gelu_exact(y)
        y = Dense(C)(y)
        return x + y


class Ffno2d(nn.Module):
    """Autoregressive FFNO with the CFDBench channel contract."""

    in_chan: int = 2
    out_chan: int = 2
    n_case_params: int = 5
    num_layers: int = 4
    modes1: int = 16
    modes2: int = 16
    hidden_dim: int = 32

    regime = "auto"
    pointwise = False

    @nn.compact
    def __call__(self, inputs, case_params, mask=None, train: bool = False):
        del train
        B, H, W, _ = inputs.shape
        mask = ensure_mask(mask, B, H, W)
        x = jnp.concatenate(
            [
                inputs,
                mask,
                coord_channels(B, H, W, inputs.dtype),
                broadcast_params_to_channels(case_params, H, W),
            ],
            axis=-1,
        )
        x = Dense(self.hidden_dim)(x)
        for _ in range(self.num_layers):
            x = FfnoBlock(self.hidden_dim, self.modes1, self.modes2)(x)
        x = Dense(128)(x)
        x = gelu_exact(x)
        preds = Dense(self.out_chan)(x)
        return preds * mask
