"""Non-autoregressive models: FFN and DeepONet.

These learn ``(case_params, t, x, y) → u(t, x, y)`` — coordinate-queried
operators (``src/models/ffn.py:38-181``, ``src/models/deeponet.py``).
Training samples random query points per step (the reference samples
1000 lattice points with replacement inside forward,
``deeponet.py:170-191``); here the trainer samples them and passes
``query_xy`` explicitly so models stay pure functions of their inputs.

Both default to the paper's scale-invariant activation (``act_norm``).
DeepONet feeds *raw* (unnormalized) query coordinates to its trunk
(``deeponet.py:195``, normalization is commented out in the reference).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import Dense, Mlp, get_act_fn


class FfnModel(nn.Module):
    """MLP over [case_params ‖ x ‖ y ‖ t] → scalar u."""

    n_case_params: int = 5
    width: int = 100
    depth: int = 8
    act_name: str = "relu"
    act_norm: bool = True
    act_on_output: bool = False

    regime = "nonauto"
    pointwise = True
    out_chan = 1

    @nn.compact
    def __call__(self, case_params, t, query_xy):
        """case_params (B,P); t (B,1); query_xy (k,2) → (B,k)."""
        B = case_params.shape[0]
        k = query_xy.shape[0]
        coords = jnp.broadcast_to(query_xy[None], (B, k, 2))
        tt = jnp.broadcast_to(t[:, None, :], (B, k, 1))
        cp = jnp.broadcast_to(
            case_params[:, None, :], (B, k, case_params.shape[1])
        )
        inp = jnp.concatenate([cp, coords, tt], axis=-1)  # (B,k,P+3)
        # Flatten to (B·k, F) before the MLP: the reference applies its
        # Ffn to the flattened view (``ffn.py:128-135``), so NormAct
        # normalizes each (sample, query) row over features — not over
        # (queries, features) jointly.
        inp = inp.reshape(B * k, -1)
        dims = [inp.shape[-1]] + [self.width] * self.depth + [1]
        out = Mlp(
            dims,
            act_name=self.act_name,
            act_norm=self.act_norm,
            act_on_output=self.act_on_output,
        )(inp)
        return out[..., 0].reshape(B, k)


class DeepONet(nn.Module):
    """Branch MLP on case params; trunk = fc_t(t) + fc_xy(x,y) → MLP;
    prediction = Σ branch·trunk + bias (``deeponet.py:153-223``)."""

    n_case_params: int = 5
    width: int = 100
    branch_depth: int = 8
    trunk_depth: int = 8
    act_name: str = "relu"
    act_norm: bool = False
    act_on_output: bool = False

    regime = "nonauto"
    pointwise = True
    out_chan = 1

    @nn.compact
    def __call__(self, case_params, t, query_xy):
        w = self.width
        branch = Mlp(
            [self.n_case_params] + [w] * self.branch_depth,
            act_name=self.act_name,
            act_norm=self.act_norm,
            act_on_output=self.act_on_output,
        )(case_params)  # (B, w)
        x_t = Dense(w)(t)  # (B, w)
        x_xy = Dense(w)(query_xy)  # (k, w)
        x_trunk = x_t[:, None, :] + x_xy[None, :, :]  # (B, k, w)
        x_trunk = Mlp(
            [w] * self.trunk_depth,
            act_name=self.act_name,
            act_norm=self.act_norm,
        )(x_trunk)  # (B, k, w)
        bias = self.param("bias", nn.initializers.zeros, (1,))
        return jnp.einsum("bp,bkp->bk", branch, x_trunk) + bias
