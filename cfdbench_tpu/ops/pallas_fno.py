"""Pallas TPU kernel: fused FnoBlock forward.

One kernel per batch element computes the entire FNO block —
packed-complex DFT projection, per-mode channel mixing, inverse
projection, 1×1-conv bypass, bias add, exact GELU — with every
intermediate resident in VMEM. The XLA path materializes ~10
intermediates through HBM per block; here only x is read and the
activation written.

Forward-only: the rollout/inference path uses this kernel (enable with
``cfdbench_tpu.ops.spectral.SPECTRAL_BACKEND`` untouched — the kernel
is plugged in via ``models.fno.Fno2d(use_pallas=True)``); training uses
the XLA path (same math, unit-tested equal).

See /opt/skills/guides/pallas_guide.md for the kernel-language rules
used here (VMEM block specs, MXU ``preferred_element_type``, grids).
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
    # 3) per-mode channel mixing: (K, m2, 2Ci) x (2Ci, 2Co, K, m2)
    y2 = jnp.einsum(
        "kmi,iokm->kmo", v, wblk_ref[:],
        preferred_element_type=jnp.float32,
    )  # (K, m2, 2Cout)
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
    out_ref[0] = jax.nn.gelu(y, approximate=False)


def build_weight_block(weights, m1, m2):
    """(2,2,Ci,Co,m1,m2) → (2Ci, 2Co, 2m1, m2) packed mixing block
    (same layout as spectral_conv2d_matmul_packed)."""
    Wr = jnp.concatenate(
        [weights[0, 0, :, :, :m1, :m2], weights[1, 0, :, :, :m1, :m2]],
        axis=2,
    )
    Wi = jnp.concatenate(
        [weights[0, 1, :, :, :m1, :m2], weights[1, 1, :, :, :m1, :m2]],
        axis=2,
    )
    return jnp.concatenate(
        [
            jnp.concatenate([Wr, Wi], axis=1),
            jnp.concatenate([-Wi, Wr], axis=1),
        ],
        axis=0,
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
            pl.BlockSpec(Wblk.shape, lambda b: (0, 0, 0, 0),
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
