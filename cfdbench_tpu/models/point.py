"""Point-query autoregressive models (the DeepONet family).

Behavioral mirrors of ``src/models/auto_ffn.py``,
``auto_deeponet.py``, ``auto_edeeponet.py``, ``auto_deeponet_cnn.py``.
All four: flatten (parts of) the input field, score every point of the
full H×W query lattice in one batched pass, and add the input-field
value at the query point as a residual. They model the u channel only;
training loss is against flattened u labels.

The query lattice is ``product(range(H), range(W))`` — row-major — so
"prediction at all queries" is exactly a ``reshape(B, H*W)`` and the
residual gather is a flatten: no gather ops on TPU.

Documented deviation: ``AutoFfn`` in the reference tiles the field
batch and the query list with different periods before concatenating
(``auto_ffn.py:99-103``), scrambling field↔query pairing whenever
batch_size > 1 and H·W % batch_size != 0. We implement the evident
intent (every batch element paired with every query).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import (
    Dense,
    Mlp,
    broadcast_params_to_channels,
    ensure_mask,
)


def _lattice_xy(H, W, dtype=jnp.float32):
    """(H*W, 2) row-major (row, col) float query coordinates."""
    rows = jnp.repeat(jnp.arange(H, dtype=dtype), W)
    cols = jnp.tile(jnp.arange(W, dtype=dtype), H)
    return jnp.stack([rows, cols], axis=-1)


class AutoFfn(nn.Module):
    """MLP over [flat u ‖ case_params ‖ (x, y)] → scalar u at the query;
    residual prediction (``auto_ffn.py:54-124``)."""

    input_field_dim: int
    num_case_params: int
    width: int = 200
    depth: int = 8
    act_name: str = "relu"

    regime = "auto"
    pointwise = True
    out_chan = 1

    @nn.compact
    def __call__(self, inputs, case_params, mask=None, train: bool = False):
        del mask, train
        B, H, W = inputs.shape[0], inputs.shape[1], inputs.shape[2]
        u = inputs[..., 0]  # (B, H, W)
        flat = u.reshape(B, -1)  # (B, HW)
        ctx = jnp.concatenate([flat, case_params], axis=1)  # (B, HW+P)
        k = H * W
        xy = _lattice_xy(H, W)  # (k, 2)
        # (B, k, HW+P+2)
        inp = jnp.concatenate(
            [
                jnp.broadcast_to(ctx[:, None, :], (B, k, ctx.shape[1])),
                jnp.broadcast_to(xy[None], (B, k, 2)),
            ],
            axis=-1,
        )
        dims = [inp.shape[-1]] + [self.width] * self.depth + [1]
        preds = Mlp(dims, act_name=self.act_name)(inp)[..., 0]  # (B, k)
        return preds + flat  # residual at query points


class AutoDeepONet(nn.Module):
    """Branch MLP over [flat u ‖ case_params]; trunk MLP over
    normalized (x,y); dot-product head + bias + residual
    (``auto_deeponet.py:76-147``)."""

    branch_dim: int  # H*W + P
    width: int = 100
    branch_depth: int = 4
    trunk_depth: int = 4
    act_name: str = "relu"

    regime = "auto"
    pointwise = True
    out_chan = 1

    @nn.compact
    def __call__(self, inputs, case_params, mask=None, train: bool = False):
        del mask, train
        B, H, W = inputs.shape[0], inputs.shape[1], inputs.shape[2]
        u = inputs[..., 0]
        flat = u.reshape(B, -1)
        branch_in = jnp.concatenate([flat, case_params], axis=1)
        b = Mlp(
            [branch_in.shape[-1]] + [self.width] * self.branch_depth,
            act_name=self.act_name,
        )(branch_in)  # (B, p)
        xy = (_lattice_xy(H, W) - 50.0) / 100.0  # (k, 2)
        t = Mlp(
            [2] + [self.width] * self.trunk_depth, act_name=self.act_name
        )(xy)  # (k, p)
        bias = self.param("bias", nn.initializers.zeros, (1,))
        preds = jnp.einsum("bp,kp->bk", b, t) + bias  # (B, k)
        return preds + flat


class AutoEDeepONet(nn.Module):
    """Two branches (flat u; case params) fused by elementwise product,
    trunk dot-product head + residual (``auto_edeeponet.py:66-125``)."""

    dim_branch1: int  # H*W
    dim_branch2: int  # P
    width: int = 100
    branch_depth: int = 4
    trunk_depth: int = 4
    act_name: str = "relu"

    regime = "auto"
    pointwise = True
    out_chan = 1

    @nn.compact
    def __call__(self, inputs, case_params, mask=None, train: bool = False):
        del mask, train
        B, H, W = inputs.shape[0], inputs.shape[1], inputs.shape[2]
        u = inputs[..., 0]
        flat = u.reshape(B, -1)
        b1 = Mlp(
            [flat.shape[-1]] + [self.width] * self.branch_depth,
            act_name=self.act_name,
        )(flat)
        b2 = Mlp(
            [case_params.shape[-1]] + [self.width] * self.branch_depth,
            act_name=self.act_name,
        )(case_params)
        fused = b1 * b2  # (B, p)
        xy = (_lattice_xy(H, W) - 50.0) / 100.0
        t = Mlp(
            [2] + [self.width] * self.trunk_depth, act_name=self.act_name
        )(xy)
        bias = self.param("bias", nn.initializers.zeros, (1,))
        preds = jnp.einsum("bp,kp->bk", fused, t) + bias
        return preds + flat


class CnnBranch(nn.Module):
    """4×[conv5×5 → maxpool2 → relu] conv encoder
    (``auto_deeponet_cnn.py:13-39``)."""

    depth: int = 4

    @nn.compact
    def __call__(self, x):
        from .common import Conv

        x = Conv(32, kernel_size=5, padding=2)(x)
        for _ in range(self.depth):
            x = Conv(32, kernel_size=5, padding=2)(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.relu(x)
        return Conv(32, kernel_size=5, padding=2)(x)


class AutoDeepONetCnn(nn.Module):
    """CNN branch over [u,v ‖ mask ‖ case-param planes]; trunk MLP to
    the branch-code width; elementwise fusion then an output MLP;
    residual at query (``auto_deeponet_cnn.py:42-184``)."""

    in_chan: int = 2
    num_case_params: int = 5
    trunk_depth: int = 4
    act_name: str = "relu"

    regime = "auto"
    pointwise = True
    out_chan = 1

    @nn.compact
    def __call__(self, inputs, case_params, mask=None, train: bool = False):
        del train
        B, H, W = inputs.shape[0], inputs.shape[1], inputs.shape[2]
        u = inputs[..., 0]
        flat = u.reshape(B, -1)
        x = inputs
        if mask is not None:
            m = ensure_mask(mask, B, H, W)
            x = jnp.concatenate([x, m], axis=-1)
        x = jnp.concatenate(
            [x, broadcast_params_to_channels(case_params, H, W)], axis=-1
        )
        code = CnnBranch()(x)  # (B, H/16, W/16, 32)
        # Flatten channel-major (C, i, j) like the reference's
        # ``x_branch.view(b, -1)`` on NCHW — the code/trunk elementwise
        # pairing is layout-sensitive, and matching it makes torch
        # checkpoints convertible (golden parity).
        code = jnp.transpose(code, (0, 3, 1, 2)).reshape(B, -1)  # (B, D)
        D = code.shape[-1]
        xy = (_lattice_xy(H, W) - 50.0) / 100.0
        t = Mlp(
            [2] + [100] * self.trunk_depth + [D], act_name=self.act_name
        )(xy)  # (k, D)
        fused = code[:, None, :] * t[None, :, :]  # (B, k, D)
        preds = Mlp([D, D, D, 1], act_name=self.act_name)(fused)[..., 0]
        return preds + flat
