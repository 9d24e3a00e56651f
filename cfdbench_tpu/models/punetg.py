"""PUNetG: conditional diffusion U-Net with FiLM conditioning.

Behavioral mirror of ``src/models/punetg.py``: sinusoidal timestep
embedding (+MLP), case-param MLP embedding, GroupNorm ResNet blocks
with scale/shift (FiLM) injection, strided-conv downsampling,
nearest-neighbor + conv upsampling, GroupNorm→SiLU→conv output head.

Documented defect fix: the reference's skip-connection bookkeeping is
unbalanced — the decoder pops ``num_res_blocks+1`` skips per level but
the encoder pushes only ``num_res_blocks``; constructing
``PUNetGCFD(channel_mults=(1,2,4), num_res_blocks=2)`` raises
``IndexError: pop from empty list`` (``punetg.py:215``, verified by
running it), so the reference's pixel-diffusion/GenCast models cannot
actually be instantiated. We implement the evident intent — the
standard diffusion-U-Net bookkeeping where the conv-in output and each
downsample output are also pushed as skips (as in HF diffusers
``UNet2DModel``), which balances exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import Conv, Dense, num_groups_for


def _num_groups(groups: int, channels: int) -> int:
    return num_groups_for(groups, channels)


def timestep_embedding(timesteps, dim: int):
    """Sinusoidal embedding (``punetg.py:119-136``): freqs =
    exp(-log(1e4)·i/(dim/2 − 1)), concat(sin, cos)."""
    half = dim // 2
    exponent = -np.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * exponent)
    args = timesteps[:, None].astype(jnp.float32) * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class FilmResBlock(nn.Module):
    """GroupNorm → SiLU → conv → FiLM(scale,shift) → SiLU → dropout →
    conv, + skip (``punetg.py:35-92``)."""

    out_channels: int
    dropout: float = 0.1
    num_groups: int = 32

    @nn.compact
    def __call__(self, x, cond_emb, train: bool = False):
        in_ch = x.shape[-1]
        if in_ch != self.out_channels:
            residual = Conv(self.out_channels, kernel_size=1)(x)
        else:
            residual = x
        h = nn.GroupNorm(
            num_groups=_num_groups(self.num_groups, in_ch), epsilon=1e-6
        )(x)
        h = nn.silu(h)
        h = Conv(self.out_channels, kernel_size=3, padding=1)(h)

        cond = Dense(self.out_channels * 2)(nn.silu(cond_emb))
        scale, shift = jnp.split(cond[:, None, None, :], 2, axis=-1)
        h = nn.GroupNorm(
            num_groups=_num_groups(self.num_groups, self.out_channels),
            epsilon=1e-6,
        )(h)
        h = h * (1 + scale) + shift
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = Conv(self.out_channels, kernel_size=3, padding=1)(h)
        return h + residual


class CrossAttnBlock(nn.Module):
    """Spatial-query cross-attention over a conditioning sequence
    (the mechanism HF ``UNet2DConditionModel`` uses for
    ``encoder_hidden_states`` in the reference's LDM v1,
    ``src/models/latent_diffusion.py:79-89``). Head count follows the
    reference's ``attention_head_dim=8`` convention
    (``src/models/ldm2.py:70``): heads = channels // head_dim."""

    head_dim: int = 8

    @nn.compact
    def __call__(self, x, context):
        """x: (B, H, W, C); context: (B, S, D)."""
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=_num_groups(32, C), epsilon=1e-6)(x)
        q = Dense(C)(h.reshape(B, H * W, C))
        k = Dense(C)(context)
        v = Dense(C)(context)
        nh = max(1, C // self.head_dim)
        hd = C // nh
        q = q.reshape(B, H * W, nh, hd)
        k = k.reshape(B, -1, nh, hd)
        v = v.reshape(B, -1, nh, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k) / jnp.sqrt(hd)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bnqk,bknd->bqnd", probs, v)
        out = Dense(C)(out.reshape(B, H * W, C))
        return x + out.reshape(B, H, W, C)


class PUNetGCFD(nn.Module):
    in_channels: int
    out_channels: int
    base_channels: int = 64
    n_case_params: int = 5
    channel_mults: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    dropout: float = 0.1
    num_groups_norm: int = 32
    cross_attention: bool = False  # attend over a context sequence

    @nn.compact
    def __call__(self, x, timesteps, case_params, mask=None,
                 train: bool = False, context=None):
        """x: (B, H, W, C_in); timesteps: (B,); case_params: (B, P);
        context: optional (B, S, D) sequence for cross-attention."""
        del mask  # handled by callers via channel concat
        b = self.base_channels
        ted = b * 4
        t_emb = timestep_embedding(timesteps, b)
        t_emb = Dense(ted)(t_emb)
        t_emb = Dense(ted)(nn.silu(t_emb))
        c_emb = Dense(ted)(case_params)
        c_emb = Dense(ted)(nn.silu(c_emb))
        cond = jnp.concatenate([t_emb, c_emb], axis=-1)  # (B, 8b)

        h = Conv(b, kernel_size=3, padding=1)(x)
        skips = [h]
        cur = b
        for i, mult in enumerate(self.channel_mults):
            out_ch = b * mult
            for _ in range(self.num_res_blocks):
                h = FilmResBlock(
                    out_ch, self.dropout, self.num_groups_norm
                )(h, cond, train)
                cur = out_ch
                skips.append(h)
            if i != len(self.channel_mults) - 1:
                h = Conv(cur, kernel_size=3, padding=1, stride=2)(h)
                skips.append(h)

        h = FilmResBlock(cur, self.dropout, self.num_groups_norm)(
            h, cond, train
        )
        if self.cross_attention and context is not None:
            h = CrossAttnBlock()(h, context)
        h = FilmResBlock(cur, self.dropout, self.num_groups_norm)(
            h, cond, train
        )

        for i, mult in enumerate(reversed(self.channel_mults)):
            out_ch = b * mult
            if i != 0:
                # nearest-neighbor 2x upsample + conv (punetg.py:106-116)
                C = h.shape[-1]
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                # Odd spatial dims (tube/dam fields are 66x65): the
                # stride-2 encoder maps W -> ceil(W/2), so a plain 2x
                # upsample overshoots by one row/col; crop to the
                # matching skip's shape (standard UNet practice — the
                # reference only ever ran this UNet on 64x64 latents).
                sh, sw = skips[-1].shape[1], skips[-1].shape[2]
                h = h[:, :sh, :sw, :]
                h = Conv(C, kernel_size=3, padding=1)(h)
            for _ in range(self.num_res_blocks + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = FilmResBlock(
                    out_ch, self.dropout, self.num_groups_norm
                )(h, cond, train)
            cur = out_ch

        assert not skips, f"{len(skips)} unused skip connections"
        h = nn.GroupNorm(
            num_groups=_num_groups(self.num_groups_norm, cur), epsilon=1e-6
        )(h)
        h = nn.silu(h)
        return Conv(self.out_channels, kernel_size=3, padding=1)(h)
