"""Convolutional KL-VAE (diffusers ``AutoencoderKL`` equivalent).

The reference wraps HF ``diffusers.AutoencoderKL`` (``src/models/
cfd_vae.py``); the production config is ``CfdVaeLite``: 4 encoder
blocks (32, 64, 128, 256 channels), 3 spatial downsamples (64×64 →
8×8), latent_channels=4. This module reimplements that architecture in
flax/NHWC: GroupNorm-SiLU ResNet blocks, stride-2 downsampling convs
(asymmetric right/bottom padding, matching diffusers), a mid block with
single-head spatial self-attention, quant/post-quant 1×1 convs and a
diagonal-Gaussian latent with the standard ``kl()`` / ``sample()``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import Conv, Dense, num_groups_for


class DiagonalGaussian(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray  # clamped to [-30, 20] like diffusers

    @property
    def std(self):
        return jnp.exp(0.5 * self.logvar)

    def sample(self, key):
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype
        )

    def mode(self):
        return self.mean

    def kl(self):
        """KL to N(0, I), summed over non-batch dims (diffusers
        ``DiagonalGaussianDistribution.kl``)."""
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + jnp.exp(self.logvar)
            - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


def _gn(ch, groups=32):
    return nn.GroupNorm(
        num_groups=num_groups_for(groups, ch), epsilon=1e-6
    )


class VaeResBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = _gn(in_ch)(x)
        h = nn.silu(h)
        h = Conv(self.out_channels, kernel_size=3, padding=1)(h)
        h = _gn(self.out_channels)(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = Conv(self.out_channels, kernel_size=3, padding=1)(h)
        if in_ch != self.out_channels:
            x = Conv(self.out_channels, kernel_size=1)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention (diffusers ``Attention`` in
    the VAE mid block)."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _gn(C)(x).reshape(B, H * W, C)
        q, k, v = Dense(C)(h), Dense(C)(h), Dense(C)(h)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(C), axis=-1
        )
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = Dense(C)(out).reshape(B, H, W, C)
        return x + out


class Encoder(nn.Module):
    block_out_channels: Tuple[int, ...]
    latent_channels: int
    layers_per_block: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Conv(self.block_out_channels[0], kernel_size=3, padding=1)(x)
        for i, ch in enumerate(self.block_out_channels):
            for _ in range(self.layers_per_block):
                h = VaeResBlock(ch)(h, train)
            if i != len(self.block_out_channels) - 1:
                # stride-2 conv with asymmetric (right/bottom) padding,
                # as in diffusers Downsample2D(padding=0) + manual pad.
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = Conv(ch, kernel_size=3, padding=0, stride=2)(h)
        ch = self.block_out_channels[-1]
        h = VaeResBlock(ch)(h, train)
        h = AttnBlock()(h)
        h = VaeResBlock(ch)(h, train)
        h = _gn(ch)(h)
        h = nn.silu(h)
        return Conv(2 * self.latent_channels, kernel_size=3, padding=1)(h)


class Decoder(nn.Module):
    block_out_channels: Tuple[int, ...]
    out_channels: int
    layers_per_block: int = 1

    @nn.compact
    def __call__(self, z, train: bool = False):
        chans = list(reversed(self.block_out_channels))
        h = Conv(chans[0], kernel_size=3, padding=1)(z)
        h = VaeResBlock(chans[0])(h, train)
        h = AttnBlock()(h)
        h = VaeResBlock(chans[0])(h, train)
        for i, ch in enumerate(chans):
            for _ in range(self.layers_per_block + 1):
                h = VaeResBlock(ch)(h, train)
            if i != len(chans) - 1:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = Conv(ch, kernel_size=3, padding=1)(h)
        h = _gn(h.shape[-1])(h)
        h = nn.silu(h)
        return Conv(self.out_channels, kernel_size=3, padding=1)(h)


class AutoencoderKL(nn.Module):
    """KL-VAE. ``encode`` → DiagonalGaussian over latents; ``decode``
    → reconstruction. ``CfdVaeLite``-equivalent defaults."""

    in_chan: int = 2
    out_chan: int = 2
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (32, 64, 128, 256)
    layers_per_block: int = 1

    def setup(self):
        self.encoder = Encoder(
            self.block_out_channels, self.latent_channels,
            self.layers_per_block,
        )
        self.decoder = Decoder(
            self.block_out_channels, self.out_chan,
            self.layers_per_block,
        )
        self.quant_conv = Conv(2 * self.latent_channels, kernel_size=1)
        self.post_quant_conv = Conv(self.latent_channels, kernel_size=1)

    def encode(self, x, train: bool = False) -> DiagonalGaussian:
        h = self.encoder(x, train)
        moments = self.quant_conv(h)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(mean, jnp.clip(logvar, -30.0, 20.0))

    def decode(self, z, train: bool = False):
        return self.decoder(self.post_quant_conv(z), train)

    def __call__(self, x, rng=None, train: bool = False):
        """Returns (reconstruction, posterior). Samples the posterior
        when an rng is given, else uses the mode (diffusers
        ``sample_posterior`` flag)."""
        posterior = self.encode(x, train)
        z = posterior.sample(rng) if rng is not None else posterior.mode()
        return self.decode(z, train), posterior


def make_cfd_vae(variant: str = "lite", in_chan=2, out_chan=2,
                 latent_dim=4, ch: int = 64,
                 ch_mult: Tuple[int, ...] = (1, 2, 3, 4),
                 num_res_blocks: int = 2) -> AutoencoderKL:
    """CfdVae family factory (``src/models/cfd_vae.py:10-144``).

    ``variant="custom"`` mirrors the diffsci-ddconfig path
    (``src/args.py:343-359`` / ``train_vae_diffsci.py``): channels =
    ch × ch_mult, ``num_res_blocks`` resnet layers per stage.
    """
    if variant == "custom":
        return AutoencoderKL(
            in_chan=in_chan,
            out_chan=out_chan,
            latent_channels=latent_dim,
            block_out_channels=tuple(ch * m for m in ch_mult),
            layers_per_block=num_res_blocks,
        )
    channels = {
        "v1": (64, 128),
        "v2": (64, 128, 256),
        "v3": (64, 128, 256, 512),
        "lite": (32, 64, 128, 256),
    }[variant]
    return AutoencoderKL(
        in_chan=in_chan,
        out_chan=out_chan,
        latent_channels=latent_dim,
        block_out_channels=channels,
    )
