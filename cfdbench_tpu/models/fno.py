"""Fourier Neural Operator (the flagship autoregressive model).

Behavioral mirror of ``Fno2d`` (``src/models/fno/fno2d.py:115-255``):
input channels = [u, v] ‖ mask ‖ (x, y) coord grid ‖ case-param planes;
1×1-conv lift to ``hidden_dim``; N FnoBlocks (spectral conv + 1×1-conv
bypass + GELU); 1×1-conv head fc1(→128) → GELU → fc2(→out_chan); output
multiplied by the geometry mask.

TPU-native: NHWC layout; 1×1 convs are Dense layers over the channel
axis (identical math, maps straight onto the MXU); spectral conv from
``cfdbench_tpu.ops.spectral``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.spectral import init_spectral_weights, spectral_conv2d
from .common import (
    Dense,
    dense_thin,
    gelu_exact,
    broadcast_params_to_channels,
    coord_channels,
    ensure_mask,
)


class SpectralConv2d(nn.Module):
    out_channels: int
    modes1: int = 12
    modes2: int = 12

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param(
            "weights",
            lambda key: init_spectral_weights(
                key, in_ch, self.out_channels, self.modes1, self.modes2
            ),
        )
        return spectral_conv2d(x, w, self.modes1, self.modes2)


class FnoBlock(nn.Module):
    out_chan: int
    modes1: int
    modes2: int
    use_act: bool = True

    @nn.compact
    def __call__(self, x):
        x1 = SpectralConv2d(self.out_chan, self.modes1, self.modes2)(x)
        x2 = Dense(self.out_chan)(x)  # 1x1 conv bypass (fno2d.py:104)
        x = x1 + x2
        if self.use_act:
            x = gelu_exact(x)
        return x


def _fno_head(mdl, x):
    """fc1(→128) → GELU → fc2(→out_chan) head (``fno2d.py:175-176,
    228-230``). Plain function (first arg: the Fno2d module) so it can
    be lifted with ``nn.remat`` without changing the param tree —
    explicit names keep the reference layout Dense_1/Dense_2.

    (The head is ~30 % of the train step at the flagship width —
    fc1 K=32, fc2 N=2 with a degenerate K=2 transpose in the backward
    pass. A block-diagonal "fold rows into lanes" relayout was measured
    and REJECTED: on TPU a reshape that regroups the minor/lane axis is
    a physical copy, and the extra 134 MB relayouts cost more than the
    MXU padding they save — see BASELINE.md §anatomy.)"""
    x = Dense(128, name="Dense_1")(x)  # fc1
    x = gelu_exact(x)
    # fc2 via dense_thin: same matmul, backward without the degenerate
    # K=out_chan transpose dot (models/common.py::dense_thin).
    fc2 = Dense(mdl.out_chan, name="Dense_2")
    _ = fc2(x[:, :1, :1, :])  # instantiate params (output unused)
    inner = fc2.variables["params"]["Dense_0"]
    return dense_thin(x, inner["kernel"], inner["bias"])


class Fno2d(nn.Module):
    """Autoregressive FNO. ``__call__(inputs, case_params, mask) → preds``.

    inputs: (B, H, W, in_chan); case_params: (B, P); mask: (B, H, W, 1)
    or None. Returns (B, H, W, out_chan), masked.

    ``remat_head`` rematerializes the head in the backward pass instead
    of saving its two (B, H, W, 128) intermediates (the largest tensors
    in the model — 4× wider than the hidden dim): recomputing fc1+GELU
    costs less than writing + re-reading 2×134 MB at the flagship
    batch (measured on v5e; BASELINE.md anatomy table). No effect on
    forward-only (rollout) execution or on numerics.
    """

    in_chan: int = 2
    out_chan: int = 2
    n_case_params: int = 5
    num_layers: int = 4
    modes1: int = 12
    modes2: int = 12
    hidden_dim: int = 32
    padding: Optional[int] = None
    remat_head: bool = True

    regime = "auto"
    pointwise = False

    @nn.compact
    def __call__(self, inputs, case_params, mask=None, train: bool = False):
        del train  # no BatchNorm/Dropout in FNO
        B, H, W, C = inputs.shape
        mask = ensure_mask(mask, B, H, W)
        # fc0 lift (1x1 conv) over [inputs ‖ mask ‖ coords ‖ params],
        # computed as summed partial matmuls on kernel row-slices
        # instead of materializing the concatenated (B, H, W, C+3+P)
        # tensor (whose backward is three splits). Identical math; the
        # coord and case-param terms are broadcast, not full-field.
        fc0 = Dense(self.hidden_dim)
        coords = coord_channels(1, H, W, inputs.dtype)  # (1, H, W, 2)
        _ = fc0(
            jnp.concatenate(
                [
                    inputs[:1, :1, :1],
                    mask[:1, :1, :1],
                    coords[:, :1, :1],
                    case_params[:1, None, None, :],
                ],
                axis=-1,
            )
        )  # instantiate params with the full fan-in (output unused)
        k = fc0.variables["params"]["Dense_0"]["kernel"]
        b = fc0.variables["params"]["Dense_0"]["bias"]
        P = case_params.shape[-1]
        x = (
            inputs @ k[:C]
            + mask @ k[C: C + 1]
            + coords @ k[C + 1: C + 3]        # (1, H, W, hidden)
            + (case_params @ k[C + 3: C + 3 + P])[:, None, None, :]
            + b
        )
        if self.padding is not None:
            p = self.padding
            x = jnp.pad(x, ((0, 0), (0, p), (0, p), (0, 0)))
        for _ in range(self.num_layers):
            x = FnoBlock(self.hidden_dim, self.modes1, self.modes2)(x)
        if self.padding is not None:
            x = x[:, : -self.padding, : -self.padding, :]
        head = nn.remat(_fno_head) if self.remat_head else _fno_head
        preds = head(self, x)
        return preds * mask


def fno2d_apply_pallas_head(
    model: Fno2d, params, inputs, case_params, mask=None,
    batch_tile: int = 1, interpret: bool = False,
):
    """Forward pass with the XLA lift+blocks and the *head* (fc1 → GELU
    → fc2 → mask) executed as one Pallas kernel
    (``ops.pallas_fno.fused_fno_head``): the (B, H, W, 128) fc1
    intermediate stays in VMEM instead of round-tripping HBM. This is
    the subset of the fused-FNO design that the restricted Mosaic
    backend in this environment can compile (see ops/pallas_fno.py).

    ``batch_tile`` rows are processed per kernel instance (grid-tiled),
    enlarging the MXU matmul to (tile·H·W, C). Equality with the plain
    XLA path is unit-tested in interpret mode.
    """
    from ..ops.pallas_fno import fused_fno_head

    assert model.padding is None, (
        "pallas-head path does not implement domain padding; use the "
        "standard apply for padded models"
    )
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

    def dense(p, x):
        inner = p["Dense_0"]
        return x @ inner["kernel"] + inner["bias"]

    x = dense(params["Dense_0"], x)  # fc0
    for i in range(model.num_layers):
        blk = params[f"FnoBlock_{i}"]
        from ..ops.spectral import spectral_conv2d

        x1 = spectral_conv2d(
            x, blk["SpectralConv2d_0"]["weights"],
            model.modes1, model.modes2,
        )
        x2 = dense(blk["Dense_0"], x)
        x = gelu_exact(x1 + x2)
    return fused_fno_head(
        x,
        params["Dense_1"]["Dense_0"]["kernel"],
        params["Dense_1"]["Dense_0"]["bias"],
        params["Dense_2"]["Dense_0"]["kernel"],
        params["Dense_2"]["Dense_0"]["bias"],
        mask,
        batch_tile=batch_tile,
        interpret=interpret,
    )


def fno2d_apply_pallas(
    model: Fno2d, params, inputs, case_params, mask=None,
    interpret: bool = False,
):
    """Forward pass equivalent to ``model.apply({'params': params}, ...)``
    with every FnoBlock executed as the fused Pallas kernel
    (``ops.pallas_fno.fused_fno_block``): the whole spectral chain +
    bypass + GELU stays in VMEM. Reads the standard linen param tree,
    so the same checkpoint drives both paths (equality unit-tested).
    Inference only (no custom VJP).
    """
    from ..ops.pallas_fno import fused_fno_block

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

    def dense(p, x):
        inner = p["Dense_0"]
        return x @ inner["kernel"] + inner["bias"]

    x = dense(params["Dense_0"], x)  # fc0
    if model.padding is not None:
        p = model.padding
        x = jnp.pad(x, ((0, 0), (0, p), (0, p), (0, 0)))
    for i in range(model.num_layers):
        blk = params[f"FnoBlock_{i}"]
        x = fused_fno_block(
            x,
            blk["SpectralConv2d_0"]["weights"],
            blk["Dense_0"]["Dense_0"]["kernel"],
            blk["Dense_0"]["Dense_0"]["bias"],
            modes1=model.modes1,
            modes2=model.modes2,
            interpret=interpret,
        )
    if model.padding is not None:
        x = x[:, : -model.padding, : -model.padding, :]
    x = dense(params["Dense_1"], x)  # fc1
    x = gelu_exact(x)
    preds = dense(params["Dense_2"], x)  # fc2
    return preds * mask
