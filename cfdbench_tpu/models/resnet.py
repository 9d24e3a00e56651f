"""ResNet autoregressive baseline.

Behavioral mirror of ``src/models/resnet.py``:
- ResidualBlock: conv(k, replicate pad) → dropout(0.2) → GELU → conv →
  + residual (1×1-conv projection when channel counts differ). Note:
  the reference *defines* BatchNorms but never calls them in forward
  (``resnet.py:70-80``) — so there is no normalization here either.
- Stack: in-block (in+1+P → hidden, projected), ``num_blocks`` hidden
  blocks, out-block (hidden → out, projected); inner conv width 64.
- forward: channels = [u,v] ‖ mask ‖ case-param planes; global input
  residual ``preds = blocks(x) + inputs[:, :out_chan]``; preds and
  labels multiplied by mask (``resnet.py:181-192``).
"""

from __future__ import annotations

from flax import linen as nn
import jax.numpy as jnp

from .common import (
    Conv,
    broadcast_params_to_channels,
    ensure_mask,
    gelu_exact,
)


class ResidualBlock(nn.Module):
    out_chan: int
    hidden_chan: int = 64
    kernel_size: int = 7
    padding: int = 3
    dropout_rate: float = 0.2
    use_1x1conv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_1x1conv:
            residual = Conv(self.out_chan, kernel_size=1)(x)
        else:
            residual = x
        x = Conv(
            self.hidden_chan,
            kernel_size=self.kernel_size,
            padding=self.padding,
            replicate_pad=True,
        )(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = gelu_exact(x)
        x = Conv(
            self.out_chan,
            kernel_size=self.kernel_size,
            padding=self.padding,
            replicate_pad=True,
        )(x)
        return x + residual


class ResNet(nn.Module):
    in_chan: int = 2
    out_chan: int = 2
    n_case_params: int = 5
    hidden_chan: int = 32
    num_blocks: int = 4
    kernel_size: int = 7
    padding: int = 3

    regime = "auto"
    pointwise = False

    @nn.compact
    def __call__(self, inputs, case_params, mask=None, train: bool = False):
        B, H, W, _ = inputs.shape
        residual = inputs[..., : self.out_chan]
        mask = ensure_mask(mask, B, H, W)
        x = jnp.concatenate(
            [
                inputs,
                mask,
                broadcast_params_to_channels(case_params, H, W),
            ],
            axis=-1,
        )
        x = ResidualBlock(
            self.hidden_chan,
            kernel_size=self.kernel_size,
            padding=self.padding,
            use_1x1conv=True,
        )(x, train)
        for _ in range(self.num_blocks):
            x = ResidualBlock(
                self.hidden_chan,
                kernel_size=self.kernel_size,
                padding=self.padding,
            )(x, train)
        x = ResidualBlock(
            self.out_chan,
            kernel_size=self.kernel_size,
            padding=self.padding,
            use_1x1conv=True,
        )(x, train)
        preds = x + residual
        return preds * mask
