"""U-Net autoregressive baseline.

Behavioral mirror of ``src/models/unet.py``: classic 4-down/4-up U-Net
of DoubleConv blocks (conv3×3 replicate-pad → BatchNorm → ReLU, twice);
case params injected either as input channels (default) or added at the
bottleneck via a Linear; mask appended as a channel; global input
residual; preds/labels multiplied by the mask.

BatchNorm notes (SURVEY.md §7 hard part c): batch statistics are
computed over the *global* (sharded) batch inside jit — under data
parallelism XLA all-reduces the moments over ICI, which reproduces the
reference's single-device full-batch semantics exactly. torch BN
defaults are matched (momentum 0.1 → flax 0.9, eps 1e-5).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .common import Conv, broadcast_params_to_channels, ensure_mask
from .common import Dense, torch_bias_init, torch_kernel_init


class DoubleConv(nn.Module):
    out_chan: int
    mid_chan: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_chan or self.out_chan
        for feats in (mid, self.out_chan):
            x = Conv(
                feats, kernel_size=3, padding=1, replicate_pad=True
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x)
            x = nn.relu(x)
        return x


class Down(nn.Module):
    out_chan: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.out_chan)(x, train)


class Up(nn.Module):
    """ConvTranspose 2× upsample, pad to skip size, concat, DoubleConv
    (reference uses bilinear=False, ``unet.py:119, 145``)."""

    out_chan: int

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        in_ch = x1.shape[-1]
        # torch ConvTranspose2d init fan_in = weight.size(1)·kh·kw
        # = out_ch·4 (NOT in_ch·4 — its weight layout is (in, out,
        # kh, kw)), for both kernel and bias bounds.
        k = 2 * 2 * (in_ch // 2)
        x1 = nn.ConvTranspose(
            in_ch // 2,
            (2, 2),
            strides=(2, 2),
            kernel_init=torch_kernel_init(fan_in=k),
            bias_init=torch_bias_init(k),
        )(x1)
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        x1 = jnp.pad(
            x1,
            (
                (0, 0),
                (dh // 2, dh - dh // 2),
                (dw // 2, dw - dw // 2),
                (0, 0),
            ),
        )
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.out_chan)(x, train)


class UNet(nn.Module):
    in_chan: int = 2
    out_chan: int = 2
    n_case_params: int = 5
    insert_case_params_at: str = "input"  # "input" | "hidden"
    dim: int = 12

    regime = "auto"
    pointwise = False

    @nn.compact
    def __call__(self, inputs, case_params, mask=None, train: bool = False):
        assert self.insert_case_params_at in ("input", "hidden")
        B, H, W, _ = inputs.shape
        residual = inputs[..., : self.out_chan]
        mask = ensure_mask(mask, B, H, W)
        x = jnp.concatenate([inputs, mask], axis=-1)
        if self.insert_case_params_at == "input":
            x = jnp.concatenate(
                [x, broadcast_params_to_channels(case_params, H, W)],
                axis=-1,
            )
        d = self.dim
        x1 = DoubleConv(d)(x, train)
        x2 = Down(d * 2)(x1, train)
        x3 = Down(d * 4)(x2, train)
        x4 = Down(d * 8)(x3, train)
        x5 = Down(d * 16)(x4, train)
        if self.insert_case_params_at == "hidden":
            conds = Dense(d * 16)(case_params)  # (B, d*16)
            x5 = x5 + conds[:, None, None, :]
        x = Up(d * 8)(x5, x4, train)
        x = Up(d * 4)(x, x3, train)
        x = Up(d * 2)(x, x2, train)
        x = Up(d)(x, x1, train)
        preds = Conv(self.out_chan, kernel_size=1)(x)
        preds = preds + residual
        return preds * mask
