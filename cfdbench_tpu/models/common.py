"""Shared model building blocks.

- activation registry incl. the paper's scale-invariant ``NormAct``
  (``src/models/act_fn.py:21-47``),
- ``Mlp``: the generic Linear+act stack (``src/models/ffn.py:12-35``),
- torch-default initializers so training dynamics match the reference's
  ``nn.Linear``/``nn.Conv2d`` initialization distributions.

All modules are flax.linen with NHWC conventions.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def num_groups_for(groups: int, channels: int) -> int:
    """Largest divisor of ``channels`` that is <= ``groups`` — the
    GroupNorm group-count rule shared by the PUNetG and VAE stacks
    (diffusers picks 32 and requires divisibility; these models accept
    any channel count)."""
    g = min(groups, channels)
    while channels % g:
        g -= 1
    return g


def torch_kernel_init(dtype=jnp.float32, fan_in=None):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Linear/Conv2d default
    (kaiming_uniform with a=sqrt(5)).

    ``fan_in`` overrides the shape-derived value — needed for
    ConvTranspose, where torch computes fan_in from ``weight.size(1)``
    (= out_ch·kh·kw, its weight layout being (in, out, kh, kw)) while
    the flax kernel is (kh, kw, in, out)."""

    def init(key, shape, dtype=dtype):
        # Dense kernels are (fan_in, fan_out); conv kernels are
        # (kh, kw, in_ch, out_ch) → fan_in = kh*kw*in_ch.
        if fan_in is not None:
            f = fan_in
        elif len(shape) == 2:
            f = shape[0]
        else:
            receptive = 1
            for s in shape[:-2]:
                receptive *= s
            f = shape[-2] * receptive
        bound = f ** -0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int, dtype=jnp.float32):
    def init(key, shape, dtype=dtype):
        bound = fan_in ** -0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    """nn.Dense with torch-default init."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=torch_kernel_init(),
            bias_init=torch_bias_init(in_features),
        )(x)


@jax.custom_vjp
def dense_thin(x, kernel, bias):
    """``x @ kernel + bias`` for very narrow outputs (the FNO head's
    fc2 has N=2). Forward is the plain matmul; the backward computes
    ``g @ kernelᵀ`` as a broadcast multiply-reduce over the N≤8 output
    channels instead of a degenerate K=N matmul — profiled on v5e, the
    K=2 transpose dot ran at <500 GB/s effective and was the single
    most expensive op in the flagship train step (BASELINE.md
    §anatomy).

    Reverse-mode only: as a ``jax.custom_vjp`` without a JVP rule,
    forward-mode transforms (``jax.jvp``, ``jacfwd``, ``jax.hessian``)
    of anything using it raise. Nothing in this repo uses forward mode;
    if that changes, wrap with ``jax.custom_jvp`` fallbacks or call the
    plain matmul on those paths."""
    return x @ kernel + bias


def _dense_thin_fwd(x, kernel, bias):
    return x @ kernel + bias, (x, kernel)


def _dense_thin_bwd(res, g):
    x, kernel = res
    # (rows, C) = Σ_o g[rows, o] · kernel[C, o]: elementwise FMA over
    # the tiny o axis, fused by XLA (no MXU pass, no K=N padding).
    gx = jnp.sum(g[..., None, :] * kernel, axis=-1)
    gk = jnp.einsum("...c,...o->co", x, g)
    gb = jnp.sum(g, axis=tuple(range(g.ndim - 1)))
    return gx, gk, gb


dense_thin.defvjp(_dense_thin_fwd, _dense_thin_bwd)


class Conv(nn.Module):
    """NHWC conv with torch-default init and optional replicate padding.

    The reference's conv models use ``padding_mode="replicate"``
    (``src/models/resnet.py:35-43``); XLA has no replicate conv padding,
    so we pad explicitly (edge mode) and run a VALID conv — numerically
    identical.
    """

    features: int
    kernel_size: int = 3
    padding: int = 0
    replicate_pad: bool = False
    stride: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        k = self.kernel_size
        pad = self.padding
        if self.replicate_pad and pad > 0:
            x = jnp.pad(
                x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge"
            )
            padding = "VALID"
        else:
            padding = [(pad, pad), (pad, pad)]
        fan_in = in_features * k * k
        return nn.Conv(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=padding,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init(),
            bias_init=torch_bias_init(fan_in),
        )(x)


def _erf_rational(z: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz–Stegun 7.1.26 rational erf (max abs err 1.5e-7).

    Python float constants are weakly typed: they do not promote
    bfloat16 inputs to float32 (scan carries must keep their dtype).
    """
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (
        0.254829592
        + t * (
            -0.284496736
            + t * (
                1.421413741 + t * (-1.453152027 + t * 1.061405429)
            )
        )
    )
    return jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))


@jax.custom_jvp
def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf GELU, ``x·Φ(x)`` (torch ``F.gelu`` default semantics).

    Computes erf with the Abramowitz–Stegun 7.1.26 rational
    approximation instead of XLA's erf lowering: in float32, max abs
    error vs ``jax.nn.gelu(approximate=False)`` is 7.2e-7 over [-8, 8]
    (far below the bf16 matmul noise floor and the 2e-5 golden-parity
    tolerance). Under bf16 mixed precision the polynomial itself
    evaluates in bf16, so the error is set by bf16 rounding (~1e-2
    relative) — same as any erf implementation would be at that dtype;
    the 7.2e-7 bound is f32-only. It is ~2× faster on the TPU VPU —
    the erf was ~25 %
    of the flagship FNO rollout step (measured on v5e; see
    PARITY.md §perf). Note this is *not* the tanh approximation
    (``approximate=True``), whose error is ~1e-3.

    The gradient is the analytic ``Φ(x) + x·φ(x)`` (custom_jvp) rather
    than autodiff of the rational formula — cheaper (one exp) and more
    accurate (error ~1e-7 vs the exact derivative).
    """
    z = x * 0.7071067811865476  # 1/sqrt(2)
    return 0.5 * x * (1.0 + _erf_rational(z))


@gelu_exact.defjvp
def _gelu_exact_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    cdf = 0.5 * (1.0 + _erf_rational(x * 0.7071067811865476))
    pdf = 0.3989422804014327 * jnp.exp(-0.5 * x * x)  # φ(x)
    return x * cdf, (cdf + x * pdf) * dx


def norm_act(act: Callable, x: jnp.ndarray) -> jnp.ndarray:
    """Scale-invariant activation (``src/models/act_fn.py:33-47``):
    normalize per-sample (mean/std over non-batch dims), apply act,
    de-normalize. Uses the unbiased std like ``Tensor.std()``."""
    dims = tuple(range(1, x.ndim))
    mean = jnp.mean(x, axis=dims, keepdims=True)
    n = 1
    for d in dims:
        n *= x.shape[d]
    var = jnp.sum(jnp.square(x - mean), axis=dims, keepdims=True) / max(
        n - 1, 1
    )
    std = jnp.sqrt(var)
    return act((x - mean) / std) * std + mean


_ACTS = {
    "relu": nn.relu,
    "tanh": jnp.tanh,
    # The reference's "gelu" is torch F.gelu = exact erf
    # (src/models/act_fn.py:5-18); flax's nn.gelu defaults to the tanh
    # approximation, so use the exact-erf implementation here.
    "gelu": gelu_exact,
    "swish": nn.silu,
}


def get_act_fn(name: str, norm: bool = False) -> Callable:
    """Mirror of ``src/models/act_fn.py:5-18``."""
    if name not in _ACTS:
        raise ValueError(f"Unknown activation function: {name}")
    act = _ACTS[name]
    if norm:
        return lambda x: norm_act(act, x)
    return act


class Mlp(nn.Module):
    """Generic fully connected stack (reference ``Ffn``,
    ``src/models/ffn.py:12-35``): Linear+act between all dims, final
    Linear without act unless ``act_on_output``."""

    dims: Sequence[int]  # [in, hidden..., out]; in is checked vs input
    act_name: str = "relu"
    act_norm: bool = False
    act_on_output: bool = False

    @nn.compact
    def __call__(self, x):
        act = get_act_fn(self.act_name, self.act_norm)
        dims = list(self.dims)
        assert x.shape[-1] == dims[0], (x.shape, dims)
        for d in dims[1:-1]:
            x = Dense(d)(x)
            x = act(x)
        x = Dense(dims[-1])(x)
        if self.act_on_output:
            x = act(x)
        return x


def broadcast_params_to_channels(case_params, h, w):
    """(B, P) → (B, H, W, P) constant channel planes."""
    return jnp.broadcast_to(
        case_params[:, None, None, :],
        (case_params.shape[0], h, w, case_params.shape[1]),
    )


def coord_channels(batch, h, w, dtype=jnp.float32):
    """(B, H, W, 2) with x=linspace over rows, y=linspace over cols —
    matches ``Fno2d.get_coords`` (``fno2d.py:244-255``)."""
    gx = jnp.linspace(0.0, 1.0, h, dtype=dtype)
    gy = jnp.linspace(0.0, 1.0, w, dtype=dtype)
    grid_x = jnp.broadcast_to(gx[:, None], (h, w))
    grid_y = jnp.broadcast_to(gy[None, :], (h, w))
    grid = jnp.stack([grid_x, grid_y], axis=-1)
    return jnp.broadcast_to(grid[None], (batch, h, w, 2))


def ensure_mask(mask, batch, h, w):
    """None → all-ones; (B,H,W) → (B,H,W,1)."""
    if mask is None:
        return jnp.ones((batch, h, w, 1), dtype=jnp.float32)
    if mask.ndim == 3:
        mask = mask[..., None]
    return mask
