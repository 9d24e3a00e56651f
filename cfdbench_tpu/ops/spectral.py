"""Truncated-mode 2-D spectral convolution (the FNO compute kernel).

Semantics match ``SpectralConv2d_fast`` (``src/models/fno/fno2d.py:17-82``):
rfft2 over the spatial dims, complex per-mode channel mixing on the two
low-frequency "corners" of the row axis ([:m1] and [-m1:]) with separate
weight tensors, zeros elsewhere, irfft2 back to physical space.

TPU-native design notes:
- layout is NHWC; the FFT runs over axes (1, 2) via XLA's FFT.
- complex weights are stored as a real ``(2, ...)`` array so standard
  optax optimizers work without complex-Adam special-casing (the
  reference vendors a complex-capable Adam copy, ``src/models/fno/Adam.py``).
- the mode-mixing einsum contracts channels per retained mode; XLA maps
  it to batched MXU matmuls. Instead of scattering the two mixed corners
  into a zero array of the full spectrum (HBM-wasteful), we build only
  the retained row-bands and zero-pad between them, which XLA fuses.
"""

from __future__ import annotations

import jax.numpy as jnp


def spectral_conv2d(
    x: jnp.ndarray,  # (B, H, W, Cin) float32
    weights: jnp.ndarray,  # (2, 2, Cin, Cout, m1, m2): [corner, re/im, ...]
    modes1: int,
    modes2: int,
) -> jnp.ndarray:
    """Returns (B, H, W, Cout) float32."""
    B, H, W, Cin = x.shape
    Cout = weights.shape[3]
    wf = W // 2 + 1
    # Clamp retained modes to the grid's spectrum (the reference assumes
    # 64×64 where modes=12 always fits; clamping keeps parameter shapes
    # config-determined while supporting any grid).
    m1 = min(modes1, H // 2)
    m2 = min(modes2, wf)

    x_ft = jnp.fft.rfft2(x, axes=(1, 2))  # (B, H, wf, Cin) complex64

    w_c = (
        weights[:, 0, :, :, :m1, :m2] + 1j * weights[:, 1, :, :, :m1, :m2]
    )  # (2, Cin, Cout, m1, m2)

    top = jnp.einsum(
        "bxyi,ioxy->bxyo", x_ft[:, :m1, :m2, :], w_c[0]
    )  # (B, m1, m2, Cout)
    bot = jnp.einsum(
        "bxyi,ioxy->bxyo", x_ft[:, H - m1:, :m2, :], w_c[1]
    )  # (B, m1, m2, Cout)

    # Assemble the full (B, H, wf, Cout) spectrum: retained corners,
    # zeros elsewhere. Concatenation of three row-bands avoids a
    # scatter into a zero-initialized full-size buffer.
    zcols = jnp.zeros((B, m1, wf - m2, Cout), dtype=top.dtype)
    top_band = jnp.concatenate([top, zcols], axis=2)
    bot_band = jnp.concatenate([bot, zcols], axis=2)
    mid = jnp.zeros((B, H - 2 * m1, wf, Cout), dtype=top.dtype)
    out_ft = jnp.concatenate([top_band, mid, bot_band], axis=1)

    return jnp.fft.irfft2(out_ft, s=(H, W), axes=(1, 2))


def init_spectral_weights(key, in_ch: int, out_ch: int, m1: int, m2: int):
    """U(0, 1/(in*out)) per real/imag component, matching
    ``scale * torch.rand(..., dtype=cfloat)`` (fno2d.py:31-51)."""
    import jax

    scale = 1.0 / (in_ch * out_ch)
    return scale * jax.random.uniform(
        key, (2, 2, in_ch, out_ch, m1, m2), dtype=jnp.float32
    )
