"""Pallas TPU kernel: fused FnoBlock forward.

One kernel per batch element computes the entire FNO block —
packed-complex DFT projection, per-mode channel mixing, inverse
projection, 1×1-conv bypass, bias add, exact GELU — with every
intermediate resident in VMEM. The XLA path materializes ~10
intermediates through HBM per block; here only x is read and the
activation written.

Forward-only (no custom VJP); the XLA path is used for training.

Backend status: the fused block kernel is numerically validated in
interpret mode (tests/test_pallas.py) but the TPU backend available in
this environment (axon / remote Mosaic compile service) cannot compile
it — three limitations isolated empirically:
  1. ``erf``/``erfc`` are not lowered (worked around with the
     Abramowitz–Stegun rational erf, max err 1.5e-7);
  2. in-kernel reshapes that merge the minor (lane) dimension with
     others crash the compiler (HTTP 500 from the compile helper);
  3. any ``dot_general`` with a 3-D operand (batched or
     middle-axis contraction) crashes likewise — only plain 2-D dots
     compile.
``fused_fno_head`` below stays within those limits (2-D dots,
major-dim reshapes only) and compiles and runs correctly on the real
chip. On a standard TPU toolchain the full block kernel should compile
as-is.

See /opt/skills/guides/pallas_guide.md for the kernel-language rules
used here (VMEM block specs, MXU ``preferred_element_type``, grids).

FROZEN (round 3): no further Pallas work is planned on this backend.
Decision record — every measured kernel lost to XLA, and round 3's
profiling explains why structurally, not just empirically:
  - head kernel in the rollout: 14.5k vs 61.2k frames/s (round 2,
    stacked-output layout forces a 64×-padded T(8,128) buffer);
  - head kernel standalone: 2.8 ms vs 0.57 ms XLA (4-D blocks with a
    32-wide lane dim waste 3/4 of each VMEM tile);
  - a redesigned 2-D row-tiled head (round 3): 1.07 ms vs 0.48 ms —
    bisection showed the first (rows, 32)@(32, 128) dot per tile
    dominating; the skinny-K dot + per-grid-step overhead exceed the
    HBM traffic the fusion saves;
  - the one remaining hypothesis, a VMEM-resident multi-step rollout
    kernel, is already realized by XLA itself: xprof shows the b128
    rollout's bypass/lift ops executing at 1.7-4.0 TB/s (operands
    resident on-chip between fusions) — that discovery is what
    explains the b512 throughput regression (BASELINE.md §b512). A
    hand-written kernel could only relocate, not remove, that
    residency, while limitations (2) and (3) above force per-(b, h)
    scalar loops for the DFT matmuls.
The kernels stay as a validated capability demonstration (interpret-
mode parity tests keep passing) and as a starting point for a standard
Mosaic toolchain without these restrictions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import _dft_factors_packed

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def _kernel(x_ref, e1c_ref, e2c_ref, ac_ref, bc_ref, wblk_ref,
            w0_ref, b0_ref, out_ref, *, H, W, Cin, Cout, m1, m2):
    K = 2 * m1
    x = x_ref[0]  # (H, W, Cin)

    # 1) row transform: (2K, H) @ (H, W*Cin) -> (2K, W, Cin)
    t = jnp.dot(
        e1c_ref[:], x.reshape(H, W * Cin),
        preferred_element_type=jnp.float32,
    ).reshape(2 * K, W, Cin)
    # repack re/im halves of axis 0 onto the W axis: (K, 2W, Cin)
    s = jnp.concatenate([t[:K], t[K:]], axis=1)
    # 2) column transform: contract w — einsum (2m2,2W),(K,2W,C)->(K,2m2,C)
    u = jax.lax.dot_general(
        e2c_ref[:], s,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (2m2, K, Cin)
    u = jnp.transpose(u, (1, 0, 2))  # (K, 2m2, Cin)
    # repack re/im halves of the mode axis onto channels: (K, m2, 2Cin)
    v = jnp.concatenate([u[:, :m2], u[:, m2:]], axis=2)
    # 3) per-mode channel mixing. Mosaic's dot does not support
    # multiple batch dims, so flatten modes into rows and express the
    # block-diagonal mixing as broadcast-multiply + reduce on the VPU:
    # y[km, o] = sum_i v[km, i] * Wblk[km, i, o].
    Km = K * m2
    twoCi = v.shape[-1]
    v2 = v.reshape(Km, twoCi)  # (Km, 2Ci)
    wb = wblk_ref[:]  # (Km, 2Ci, 2Co) — pre-transposed outside
    y2 = jnp.sum(v2[:, :, None] * wb, axis=1)  # (Km, 2Co)
    y2 = y2.reshape(K, m2, -1)
    # repack re/im halves of channels onto the K axis: (2K, m2, Cout)
    y3 = jnp.concatenate([y2[..., :Cout], y2[..., Cout:]], axis=0)
    # 4) inverse row transform: (2H, 2K) @ (2K, m2*Cout)
    z = jnp.dot(
        ac_ref[:], y3.reshape(2 * K, m2 * Cout),
        preferred_element_type=jnp.float32,
    ).reshape(2 * H, m2, Cout)
    # repack re/im halves of the H axis onto modes: (H, 2m2, Cout)
    z2 = jnp.concatenate([z[:H], z[H:]], axis=1)
    # 5) inverse column transform: (W, 2m2) @ (H, 2m2, Cout)
    spec = jax.lax.dot_general(
        bc_ref[:], z2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (W, H, Cout)
    spec = jnp.transpose(spec, (1, 0, 2))  # (H, W, Cout)

    # bypass 1x1 conv + bias, then exact GELU
    bypass = jnp.dot(
        x.reshape(H * W, Cin), w0_ref[:],
        preferred_element_type=jnp.float32,
    ).reshape(H, W, Cout)
    y = spec + bypass + b0_ref[:]
    # Exact GELU. Neither erf nor erfc is lowered in Pallas TPU, so use
    # the Abramowitz–Stegun 7.1.26 rational erf approximation (max abs
    # error 1.5e-7 — below the kernel's f32 accumulation noise).
    z = y * np.float32(1.0 / np.sqrt(2.0))
    az = jnp.abs(z)
    t = 1.0 / (1.0 + np.float32(0.3275911) * az)
    poly = t * (
        np.float32(0.254829592)
        + t * (
            np.float32(-0.284496736)
            + t * (
                np.float32(1.421413741)
                + t * (
                    np.float32(-1.453152027)
                    + t * np.float32(1.061405429)
                )
            )
        )
    )
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf_z = jnp.sign(z) * erf_abs
    out_ref[0] = 0.5 * y * (1.0 + erf_z)


def build_weight_block(weights, m1, m2):
    """(2,2,Ci,Co,m1,m2) → (2m1·m2, 2Ci, 2Co) per-mode mixing block,
    rows ordered like the kernel's flattened (K, m2) mode axis."""
    Wr = jnp.concatenate(
        [weights[0, 0, :, :, :m1, :m2], weights[1, 0, :, :, :m1, :m2]],
        axis=2,
    )
    Wi = jnp.concatenate(
        [weights[0, 1, :, :, :m1, :m2], weights[1, 1, :, :, :m1, :m2]],
        axis=2,
    )
    blk = jnp.concatenate(
        [
            jnp.concatenate([Wr, Wi], axis=1),
            jnp.concatenate([-Wi, Wr], axis=1),
        ],
        axis=0,
    )  # (2Ci, 2Co, K, m2)
    K = 2 * m1
    return jnp.transpose(blk, (2, 3, 0, 1)).reshape(
        K * m2, blk.shape[0], blk.shape[1]
    )


@functools.partial(
    jax.jit, static_argnames=("modes1", "modes2", "interpret")
)
def fused_fno_block(
    x: jnp.ndarray,  # (B, H, W, Cin) float32
    spectral_weights: jnp.ndarray,  # (2, 2, Ci, Co, m1, m2)
    w0_kernel: jnp.ndarray,  # (Cin, Cout)
    w0_bias: jnp.ndarray,  # (Cout,)
    modes1: int = 12,
    modes2: int = 12,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, W, Cin = x.shape
    Cout = spectral_weights.shape[3]
    m1 = min(modes1, H // 2)
    m2 = min(modes2, W // 2 + 1)
    E1c, E2c, Ac, Bc = (
        jnp.asarray(f) for f in _dft_factors_packed(H, W, m1, m2)
    )
    Wblk = build_weight_block(spectral_weights, m1, m2)

    kernel = functools.partial(
        _kernel, H=H, W=W, Cin=Cin, Cout=Cout, m1=m1, m2=m2
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H, W, Cin), lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(E1c.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(E2c.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(Ac.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(Bc.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(Wblk.shape, lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w0_kernel.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w0_bias.shape, lambda b: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W, Cout), lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), jnp.float32),
        interpret=interpret,
    )(x, E1c, E2c, Ac, Bc, Wblk, w0_kernel, w0_bias)


def _head_kernel(x_ref, k1_ref, b1_ref, k2_ref, b2_ref, mask_ref,
                 out_ref, *, T, H, W, C):
    """fc1 → GELU → fc2 → mask in one VMEM pass (Fno2d head,
    ``fno2d.py:228-233``) over a tile of ``T`` batch rows. Only 2-D
    dots and major-dim reshapes — compiles on the restricted Mosaic
    backend; tiling enlarges the MXU matmul to (T·H·W, C)."""
    h = x_ref[:].reshape(T * H * W, C)
    h = jnp.dot(h, k1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:]
    # exact GELU via rational erf (see module docstring)
    z = h * np.float32(1.0 / np.sqrt(2.0))
    az = jnp.abs(z)
    t = 1.0 / (1.0 + np.float32(0.3275911) * az)
    poly = t * (
        np.float32(0.254829592)
        + t * (
            np.float32(-0.284496736)
            + t * (
                np.float32(1.421413741)
                + t * (
                    np.float32(-1.453152027)
                    + t * np.float32(1.061405429)
                )
            )
        )
    )
    erf_z = jnp.where(z >= 0, 1.0, -1.0) * (1.0 - poly * jnp.exp(-az * az))
    h = 0.5 * h * (1.0 + erf_z)
    h = jnp.dot(h, k2_ref[:], preferred_element_type=jnp.float32)
    h = h + b2_ref[:]
    out_ref[:] = h.reshape(T, H, W, -1) * mask_ref[:]


@functools.partial(
    jax.jit, static_argnames=("batch_tile", "interpret")
)
def fused_fno_head(x, k1, b1, k2, b2, mask, batch_tile: int = 1,
                   interpret: bool = False):
    """x: (B, H, W, C); k1: (C, 128); k2: (128, out); mask: (B, H, W, 1)
    → (B, H, W, out), masked. Compiles and runs on the axon backend.

    ``batch_tile`` batch rows per kernel instance (must divide B):
    larger tiles mean bigger MXU matmuls and fewer grid steps at the
    cost of VMEM (tile·H·W·(C+128+out)·4 bytes of activations).
    """
    B, H, W, C = x.shape
    T = batch_tile
    assert B % T == 0, f"batch {B} not divisible by tile {T}"
    out_ch = k2.shape[-1]
    kernel = functools.partial(_head_kernel, T=T, H=H, W=W, C=C)
    return pl.pallas_call(
        kernel,
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((T, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(k1.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda b: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(k2.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda b: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, H, W, 1), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (T, H, W, out_ch), lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, out_ch), jnp.float32),
        interpret=interpret,
    )(x, k1, b1, k2, b2, mask)
