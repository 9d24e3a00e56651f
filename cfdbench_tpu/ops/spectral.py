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

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _dft_factors(H: int, W: int, m1: int, m2: int):
    """Precomputed real/imag DFT factor matrices for the matmul path.

    Forward (rfft2 restricted to retained modes):
        E1[k, h] = exp(-2πi·K1[k]·h/H), K1 = [0..m1-1, H-m1..H-1]
        E2[m, w] = exp(-2πi·m·w/W), m = 0..m2-1
    Inverse (irfft2 of a half-spectrum that is zero outside the
    retained modes; matches pocketfft C2R semantics exactly, including
    dropping the imaginary part at column 0 — validated numerically
    against numpy and torch irfft2):
        A[h, k] = exp(+2πi·K1[k]·h/H) / H
        B[w, m] = α_m · exp(+2πi·m·w/W) / W,  α_0 = 1, α_{m>0} = 2
    """
    k1 = np.concatenate([np.arange(m1), np.arange(H - m1, H)])
    k2 = np.arange(m2)
    h = np.arange(H)
    w = np.arange(W)
    E1 = np.exp(-2j * np.pi * np.outer(k1, h) / H)  # (2m1, H)
    E2 = np.exp(-2j * np.pi * np.outer(k2, w) / W)  # (m2, W)
    A = np.exp(2j * np.pi * np.outer(h, k1) / H) / H  # (H, 2m1)
    # α doubles every retained column to stand in for its dropped
    # conjugate — except DC and (for even W) the Nyquist column, which
    # are their own conjugates and appear once (pocketfft C2R).
    alpha = np.where(
        (k2 == 0) | ((W % 2 == 0) & (k2 == W // 2)), 1.0, 2.0
    )
    B = alpha * np.exp(2j * np.pi * np.outer(w, k2) / W) / W  # (W, m2)
    # Return host numpy (not device arrays): this function is lru_cached
    # and may first run inside a jit trace — numpy constants are always
    # safe to cache and are folded into the compiled program.
    f32 = lambda a: np.ascontiguousarray(a, np.float32)  # noqa: E731
    return (
        f32(E1.real), f32(E1.imag),
        f32(E2.real), f32(E2.imag),
        f32(A.real), f32(A.imag),
        f32(B.real), f32(B.imag),
    )


def spectral_conv2d_matmul(
    x: jnp.ndarray,  # (B, H, W, Cin) float32
    weights: jnp.ndarray,  # (2, 2, Cin, Cout, m1, m2)
    modes1: int,
    modes2: int,
    compute_dtype=None,
) -> jnp.ndarray:
    """FFT-free spectral conv: project onto the retained Fourier modes
    with dense DFT matmuls (MXU-friendly), mix channels per mode,
    reconstruct. Bit-equivalent in exact arithmetic to the rfft2 →
    truncate → mix → irfft2 pipeline (see ``_dft_factors``); preferred
    on TPU where it avoids the XLA FFT op and computes only the
    2·m1×m2 retained modes instead of the full H×(W/2+1) spectrum.
    """
    B, H, W, Cin = x.shape
    wf = W // 2 + 1
    m1 = min(modes1, H // 2)
    m2 = min(modes2, wf)
    factors = _dft_factors(H, W, m1, m2)
    out_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
        factors = tuple(f.astype(compute_dtype) for f in factors)
    E1r, E1i, E2r, E2i, Ar, Ai, Br, Bi = factors

    # Row transform: contract h. (2m1, H) x (B, H, W, C) -> (B, 2m1, W, C)
    t_r = jnp.einsum("kh,bhwc->bkwc", E1r, x)
    t_i = jnp.einsum("kh,bhwc->bkwc", E1i, x)
    # Column transform: contract w -> (B, 2m1, m2, C)
    X_r = jnp.einsum("mw,bkwc->bkmc", E2r, t_r) - jnp.einsum(
        "mw,bkwc->bkmc", E2i, t_i
    )
    X_i = jnp.einsum("mw,bkwc->bkmc", E2r, t_i) + jnp.einsum(
        "mw,bkwc->bkmc", E2i, t_r
    )

    # Per-mode channel mixing; corner 0 = rows [:m1], corner 1 = rows
    # [-m1:] of the half spectrum, each with its own weights.
    Wr = jnp.concatenate(
        [weights[0, 0, :, :, :m1, :m2], weights[1, 0, :, :, :m1, :m2]],
        axis=2,
    )  # (Cin, Cout, 2m1, m2)
    Wi = jnp.concatenate(
        [weights[0, 1, :, :, :m1, :m2], weights[1, 1, :, :, :m1, :m2]],
        axis=2,
    )
    Y_r = jnp.einsum("bkmi,iokm->bkmo", X_r, Wr) - jnp.einsum(
        "bkmi,iokm->bkmo", X_i, Wi
    )
    Y_i = jnp.einsum("bkmi,iokm->bkmo", X_r, Wi) + jnp.einsum(
        "bkmi,iokm->bkmo", X_i, Wr
    )

    # Inverse: rows then columns, keeping the real part.
    Z_r = jnp.einsum("hk,bkmo->bhmo", Ar, Y_r) - jnp.einsum(
        "hk,bkmo->bhmo", Ai, Y_i
    )
    Z_i = jnp.einsum("hk,bkmo->bhmo", Ar, Y_i) + jnp.einsum(
        "hk,bkmo->bhmo", Ai, Y_r
    )
    y = jnp.einsum("wm,bhmo->bhwo", Br, Z_r) - jnp.einsum(
        "wm,bhmo->bhwo", Bi, Z_i
    )
    return y.astype(out_dtype)


def spectral_conv2d_fft(
    x: jnp.ndarray,  # (B, H, W, Cin) float32
    weights: jnp.ndarray,  # (2, 2, Cin, Cout, m1, m2): [corner, re/im, ...]
    modes1: int,
    modes2: int,
) -> jnp.ndarray:
    """XLA-FFT implementation. Returns (B, H, W, Cout) float32.

    Numerically equivalent to the matmul path (unit-tested); kept for
    platforms with fast FFT and as the semantic reference.
    """
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


@lru_cache(maxsize=None)
def _dft_factors_packed(H: int, W: int, m1: int, m2: int):
    """Block-packed real factor matrices for the packed path: complex
    products become single real matmuls over doubled axes."""
    E1r, E1i, E2r, E2i, Ar, Ai, Br, Bi = _dft_factors(H, W, m1, m2)
    E1c = np.concatenate([E1r, E1i], axis=0)            # (2K, H)
    E2c = np.block([[E2r, -E2i], [E2i, E2r]])           # (2m2, 2W)
    Ac = np.block([[Ar, -Ai], [Ai, Ar]])                # (2H, 2K)
    Bc = np.concatenate([Br, -Bi], axis=1)              # (W, 2m2)
    return E1c, E2c, Ac, Bc


def spectral_conv2d_matmul_packed(
    x: jnp.ndarray,  # (B, H, W, Cin)
    weights: jnp.ndarray,  # (2, 2, Cin, Cout, m1, m2)
    modes1: int,
    modes2: int,
    compute_dtype=None,
) -> jnp.ndarray:
    """Packed-complex variant of :func:`spectral_conv2d_matmul`:
    identical math in 5 einsums instead of 14 by stacking real/imag
    parts into block matrices. The weight block-matrix construction is
    loop-invariant, so XLA hoists it out of rollout scans.
    """
    B, H, W, Cin = x.shape
    wf = W // 2 + 1
    m1 = min(modes1, H // 2)
    m2 = min(modes2, wf)
    K = 2 * m1
    E1c, E2c, Ac, Bc = _dft_factors_packed(H, W, m1, m2)
    out_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
        E1c, E2c, Ac, Bc = (
            f.astype(compute_dtype) for f in (E1c, E2c, Ac, Bc)
        )

    # Weight block per mode: [[Wr, Wi], [-Wi, Wr]] over channel axes so
    # that (Xr ‖ Xi) @ block = (Yr ‖ Yi).
    Wr = jnp.concatenate(
        [weights[0, 0, :, :, :m1, :m2], weights[1, 0, :, :, :m1, :m2]],
        axis=2,
    )  # (Ci, Co, K, m2)
    Wi = jnp.concatenate(
        [weights[0, 1, :, :, :m1, :m2], weights[1, 1, :, :, :m1, :m2]],
        axis=2,
    )
    Wblk = jnp.concatenate(
        [
            jnp.concatenate([Wr, Wi], axis=1),   # (Ci, 2Co, K, m2)
            jnp.concatenate([-Wi, Wr], axis=1),
        ],
        axis=0,
    )  # (2Ci, 2Co, K, m2)

    # 1) row transform, re/im stacked along k: (B, 2K, W, C)
    t = jnp.einsum("kh,bhwc->bkwc", E1c, x)
    # repack re/im from the k axis onto the w axis: (B, K, 2W, C)
    s = jnp.concatenate([t[:, :K], t[:, K:]], axis=2)
    # 2) column transform: (B, K, 2m2, C); halves along m are re/im
    u = jnp.einsum("mw,bkwc->bkmc", E2c, s)
    # repack re/im from the m axis onto the channel axis: (B, K, m2, 2C)
    v = jnp.concatenate([u[:, :, :m2], u[:, :, m2:]], axis=3)
    # 3) per-mode channel mixing: (B, K, m2, 2Co)
    y2 = jnp.einsum("bkmi,iokm->bkmo", v, Wblk)
    # repack re/im from channel axis onto the k axis: (B, 2K, m2, Co)
    Co = y2.shape[-1] // 2
    y3 = jnp.concatenate([y2[..., :Co], y2[..., Co:]], axis=1)
    # 4) inverse row transform: (B, 2H, m2, Co); halves along h re/im
    z = jnp.einsum("hk,bkmo->bhmo", Ac, y3)
    # repack re/im from the h axis onto the m axis: (B, H, 2m2, Co)
    z2 = jnp.concatenate([z[:, :H], z[:, H:]], axis=2)
    # 5) inverse column transform (takes real part): (B, H, W, Co)
    y = jnp.einsum("wm,bhmo->bhwo", Bc, z2)
    return y.astype(out_dtype)


def _mode_group(packed_ch: int, m2: int) -> int:
    """How many adjacent m2 modes to fold into one block-diagonal
    matmul so the contraction axis reaches the 128-lane MXU tile.
    Returns the largest g ≤ 128//packed_ch that divides m2 (1 when the
    channel axis already fills the tile)."""
    g = max(1, 128 // max(packed_ch, 1))
    while g > 1 and m2 % g:
        g -= 1
    return g


def _block_diag_modes(Wblk: jnp.ndarray, g: int) -> jnp.ndarray:
    """(Ci, Co, K, m2) per-mode weights → (g·Ci, g·Co, K, m2/g)
    block-diagonal weights pairing each run of g adjacent m2 modes,
    matching the reshape (…, m2, C) → (…, m2/g, g·C) of activations."""
    Ci, Co, K, m2 = Wblk.shape
    rows = []
    for a in range(g):
        Wa = Wblk[:, :, :, a::g]  # (Ci, Co, K, m2/g) — mode p·g+a
        row = [
            Wa if b == a else jnp.zeros_like(Wa) for b in range(g)
        ]
        rows.append(jnp.concatenate(row, axis=1))  # (Ci, g·Co, …)
    return jnp.concatenate(rows, axis=0)  # (g·Ci, g·Co, K, m2/g)


@lru_cache(maxsize=None)
def _dft_factors_wfirst(H: int, W: int, m1: int, m2: int):
    """Block factor matrices for the W-first packed path."""
    E1r, E1i, E2r, E2i, Ar, Ai, Br, Bi = _dft_factors(H, W, m1, m2)
    E2s = np.concatenate([E2r, E2i], axis=0)     # (2m2, W)
    E1blk = np.block([[E1r, -E1i], [E1i, E1r]])  # (2K, 2H)
    Ablk = np.block([[Ar, -Ai], [Ai, Ar]])       # (2H, 2K)
    Bs = np.concatenate([Br, -Bi], axis=1)       # (W, 2m2)
    return E2s, E1blk, Ablk, Bs


def spectral_conv2d_matmul_wfirst(
    x: jnp.ndarray,  # (B, H, W, Cin)
    weights: jnp.ndarray,  # (2, 2, Cin, Cout, m1, m2)
    modes1: int,
    modes2: int,
    compute_dtype=None,
) -> jnp.ndarray:
    """W-first variant of :func:`spectral_conv2d_matmul_packed`:
    contract the column (w) axis before the row (h) axis on the way in
    and after it on the way out. Same math, but the largest
    intermediates shrink from (B, 2m1·2, W, C) ≈ 50 MB to
    (B, H, 2m2, C) ≈ 25 MB at the flagship shape — measured 27 % faster
    per FnoBlock on a v5e chip (HBM-traffic-bound op). Default backend.
    """
    B, H, W, Cin = x.shape
    wf = W // 2 + 1
    m1 = min(modes1, H // 2)
    m2 = min(modes2, wf)
    K = 2 * m1
    E2s, E1blk, Ablk, Bs = _dft_factors_wfirst(H, W, m1, m2)
    out_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
        E2s, E1blk, Ablk, Bs = (
            f.astype(compute_dtype) for f in (E2s, E1blk, Ablk, Bs)
        )

    # 1) column DFT: (B, H, 2m2, C); halves along m = re|im
    u = jnp.einsum("mw,bhwc->bhmc", E2s, x)
    # repack re/im from the m axis onto the h axis: (B, 2H, m2, C)
    s = jnp.concatenate([u[:, :, :m2], u[:, :, m2:]], axis=1)
    # 2) row DFT on complex u: (B, 2K, m2, C); halves along k = re|im
    v = jnp.einsum("kh,bhmc->bkmc", E1blk, s)
    # repack re/im from the k axis onto the channel axis: (B, K, m2, 2C)
    vc = jnp.concatenate([v[:, :K], v[:, K:]], axis=3)
    # 3) per-mode channel mixing (same block weights as the packed path)
    Wr = jnp.concatenate(
        [weights[0, 0, :, :, :m1, :m2], weights[1, 0, :, :, :m1, :m2]],
        axis=2,
    )
    Wi = jnp.concatenate(
        [weights[0, 1, :, :, :m1, :m2], weights[1, 1, :, :, :m1, :m2]],
        axis=2,
    )
    Wblk = jnp.concatenate(
        [
            jnp.concatenate([Wr, Wi], axis=1),
            jnp.concatenate([-Wi, Wr], axis=1),
        ],
        axis=0,
    )  # (2Ci, 2Co, K, m2)
    # MXU lane fill: the per-mode matmul contracts 2·Cin channels; at
    # the flagship width (hidden 32 → 64 lanes) that pads half of the
    # 128-lane MXU tiles with zeros. Group g adjacent m2 modes into one
    # block-diagonal matmul so contraction/output reach 128 lanes —
    # the padding that the hardware would insert anyway is filled with
    # the neighboring mode's real work (measured ~2× on this einsum).
    Cin2, Cout2 = Wblk.shape[0], Wblk.shape[1]
    g = _mode_group(Cin2, m2)
    if g > 1:
        # Pair adjacent modes: reshape (…, m2, C) → (…, m2/g, g·C) is a
        # free relayout (m2 and channels are the two minor axes).
        vc = vc.reshape(B, K, m2 // g, g * Cin2)
        Wg = _block_diag_modes(Wblk, g)  # (g·2Ci, g·2Co, K, m2/g)
        y2 = jnp.einsum("bkmi,iokm->bkmo", vc, Wg)
        y2 = y2.reshape(B, K, m2, Cout2)
    else:
        y2 = jnp.einsum("bkmi,iokm->bkmo", vc, Wblk)  # (B, K, m2, 2Co)
    Co = y2.shape[-1] // 2
    # repack re/im from the channel axis onto the k axis: (B, 2K, m2, Co)
    y3 = jnp.concatenate([y2[..., :Co], y2[..., Co:]], axis=1)
    # 4) inverse row DFT: (B, 2H, m2, Co); halves along h = re|im
    z = jnp.einsum("hk,bkmo->bhmo", Ablk, y3)
    # repack re/im from the h axis onto the m axis: (B, H, 2m2, Co)
    z2 = jnp.concatenate([z[:, :H], z[:, H:]], axis=2)
    # 5) inverse column DFT, real part: (B, H, W, Co)
    y = jnp.einsum("wm,bhmo->bhwo", Bs, z2)
    return y.astype(out_dtype)


@lru_cache(maxsize=None)
def _dft_factors_rsep(H: int, W: int, m1: int, m2: int):
    """Factor tensors for the separate-re/im-axis path: the 2-valued
    re/im index is its own (leading/small) array axis instead of being
    concatenated onto a data axis."""
    E1r, E1i, E2r, E2i, Ar, Ai, Br, Bi = _dft_factors(H, W, m1, m2)
    E2s5 = np.stack([E2r, E2i])                       # (2, m2, W)
    E1_5 = np.stack([
        np.stack([E1r, -E1i]), np.stack([E1i, E1r])
    ])                                                # (2, 2, K, H)
    A5 = np.stack([
        np.stack([Ar, -Ai]), np.stack([Ai, Ar])
    ])                                                # (2, 2, H, K)
    B5 = np.stack([Br, -Bi], axis=1)                  # (W, 2, m2)
    return E2s5, E1_5, A5, B5


def spectral_conv2d_matmul_rsep(
    x: jnp.ndarray,  # (B, H, W, Cin)
    weights: jnp.ndarray,  # (2, 2, Cin, Cout, m1, m2)
    modes1: int,
    modes2: int,
    compute_dtype=None,
) -> jnp.ndarray:
    """Same math as :func:`spectral_conv2d_matmul_wfirst`, but the
    re/im halves live on a dedicated length-2 axis placed so that every
    complex-bookkeeping step is either a free axis-split view or a
    small mode-space transpose. The W-first path's concatenations move
    12-33 MB image-space tensors per repack, and their transposes
    (``split`` ops) show up again in the backward pass — here the only
    data movement between matmuls is on the ~5 MB retained-mode
    tensors. Profiled motivation: BASELINE.md §anatomy."""
    B, H, W, Cin = x.shape
    wf = W // 2 + 1
    m1 = min(modes1, H // 2)
    m2 = min(modes2, wf)
    K = 2 * m1
    E2s5, E1_5, A5, B5 = _dft_factors_rsep(H, W, m1, m2)
    out_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
        E2s5, E1_5, A5, B5 = (
            f.astype(compute_dtype) for f in (E2s5, E1_5, A5, B5)
        )

    # 1) column DFT: (B, H, 2, m2, C), r = re/im
    u = jnp.einsum("rmw,bhwc->bhrmc", E2s5, x)
    # 2) row DFT (complex): contraction over the adjacent (h, r) pair
    v = jnp.einsum("srkh,bhrmc->bkmsc", E1_5, u)  # (B, K, m2, 2, C)
    # 3) per-mode channel mixing.
    if Cin >= 128:
        # Wide widths: the channel axis already fills the MXU lanes, so
        # run the complex mixing per corner with raw weight *slices* —
        # building the packed block matrix would materialize an
        # O(4·Ci·Co·m1·m2) tensor per block per step (151 MB at hidden
        # 256) in the forward AND split it again in the backward.
        Co = weights.shape[3]
        y6_parts = []
        for c in range(2):  # corner 0 = rows [:m1], corner 1 = [-m1:]
            vs = v[:, c * m1: (c + 1) * m1]  # (B, m1, m2, 2, C)
            vr, vi = vs[:, :, :, 0], vs[:, :, :, 1]
            Wr = weights[c, 0, :, :, :m1, :m2]
            Wi = weights[c, 1, :, :, :m1, :m2]
            yr = jnp.einsum("bkmi,iokm->bkmo", vr, Wr) - jnp.einsum(
                "bkmi,iokm->bkmo", vi, Wi
            )
            yi = jnp.einsum("bkmi,iokm->bkmo", vr, Wi) + jnp.einsum(
                "bkmi,iokm->bkmo", vi, Wr
            )
            y6_parts.append(jnp.stack([yr, yi], axis=3))
        y6 = jnp.concatenate(y6_parts, axis=1)  # (B, K, m2, 2, Co)
    else:
        # Narrow widths: pack re/im into the channel axis (free view —
        # (s, c) are the two minor axes) and fill the MXU lanes by
        # grouping adjacent modes block-diagonally.
        vc = v.reshape(B, K, m2, 2 * Cin)
        Wr = jnp.concatenate(
            [weights[0, 0, :, :, :m1, :m2],
             weights[1, 0, :, :, :m1, :m2]],
            axis=2,
        )
        Wi = jnp.concatenate(
            [weights[0, 1, :, :, :m1, :m2],
             weights[1, 1, :, :, :m1, :m2]],
            axis=2,
        )
        Wblk = jnp.concatenate(
            [
                jnp.concatenate([Wr, Wi], axis=1),
                jnp.concatenate([-Wi, Wr], axis=1),
            ],
            axis=0,
        )  # (2Ci, 2Co, K, m2)
        g = _mode_group(Wblk.shape[0], m2)
        if g > 1:
            vcg = vc.reshape(B, K, m2 // g, g * 2 * Cin)
            Wg = _block_diag_modes(Wblk, g)
            y2 = jnp.einsum("bkmi,iokm->bkmo", vcg, Wg)
            y2 = y2.reshape(B, K, m2, Wblk.shape[1])
        else:
            y2 = jnp.einsum("bkmi,iokm->bkmo", vc, Wblk)
        Co = y2.shape[-1] // 2
        y6 = y2.reshape(B, K, m2, 2, Co)  # free view: t = re/im
    # 4) inverse row DFT (complex): small mode-space operand
    z = jnp.einsum("sthk,bkmto->bhsmo", A5, y6)  # (B, H, 2, m2, Co)
    # 5) inverse column DFT, real part: contraction over adjacent (s, m)
    y = jnp.einsum("wsm,bhsmo->bhwo", B5, z)
    return y.astype(out_dtype)


# Default backend: "auto" picks per shape (static at trace time):
# "matmul_rsep" (separate re/im axis + MXU mode grouping) from batch
# ≥ 64 — measured fastest for training at both narrow and wide widths
# on v5e (equal to wfirst at hidden 32, 1.22x at hidden 256 where
# wfirst's image-space repacks and packed-weight construction
# dominate) — and "matmul_wfirst" below it, where rsep's mode-space
# transposes do not amortize (b16 rollout: 38.7k vs 31.5k frames/s).
# "fft" is the semantic reference. All are numerically equivalent
# (unit-tested against each other and torch).
SPECTRAL_BACKEND = "auto"

# The measured rsep/wfirst crossover is a PER-CHIP batch of 64. Under a
# data-parallel mesh, the traced x.shape[0] is the GLOBAL batch, so the
# auto rule divides by the data-axis size. ``parallel.mesh.make_mesh``
# publishes this via ``set_data_shards`` when it builds a mesh; 1 =
# single chip. Every trace ENTRY POINT should declare its parallelism
# (mesh builders the data-axis size, single-device paths 1) — the value
# is process-global, so a dp>1 mesh left behind by a previous phase
# would otherwise skew a later unsharded trace's backend choice
# (ADVICE r4 #1).
AUTO_DATA_SHARDS = 1
AUTO_RSEP_MIN_BATCH = 64


def set_data_shards(d: int) -> None:
    """Declare how many data-parallel shards the next traces split
    their leading batch axis over (1 = single-device/unsharded)."""
    global AUTO_DATA_SHARDS
    AUTO_DATA_SHARDS = max(1, int(d))


SPECTRAL_BACKENDS = (
    "auto", "matmul_rsep", "matmul_wfirst", "matmul_packed", "matmul",
    "fft",
)


def auto_backend_for(per_chip_batch: int) -> str:
    """rsep/wfirst choice for a known PER-CHIP batch. Callers that
    already hold local (per-shard) shapes — e.g. inside a ``shard_map``
    body, where ``x.shape[0]`` is the local microbatch — should call
    this directly instead of letting ``spectral_conv2d``'s "auto"
    branch divide by ``AUTO_DATA_SHARDS`` a second time."""
    return (
        "matmul_rsep" if per_chip_batch >= AUTO_RSEP_MIN_BATCH
        else "matmul_wfirst"
    )


def spectral_conv2d(x, weights, modes1: int, modes2: int, backend=None):
    b = backend or SPECTRAL_BACKEND
    if b == "auto":
        b = auto_backend_for(x.shape[0] // max(1, AUTO_DATA_SHARDS))
    if b == "matmul_rsep":
        return spectral_conv2d_matmul_rsep(x, weights, modes1, modes2)
    if b == "matmul_wfirst":
        return spectral_conv2d_matmul_wfirst(x, weights, modes1, modes2)
    if b == "matmul_packed":
        return spectral_conv2d_matmul_packed(x, weights, modes1, modes2)
    if b == "matmul":
        return spectral_conv2d_matmul(x, weights, modes1, modes2)
    if b != "fft":
        raise ValueError(
            f"unknown spectral backend {b!r}; choose from "
            f"{SPECTRAL_BACKENDS}"
        )
    return spectral_conv2d_fft(x, weights, modes1, modes2)


def init_spectral_weights(key, in_ch: int, out_ch: int, m1: int, m2: int):
    """U(0, 1/(in*out)) per real/imag component, matching
    ``scale * torch.rand(..., dtype=cfloat)`` (fno2d.py:31-51)."""
    import jax

    scale = 1.0 / (in_ch * out_ch)
    return scale * jax.random.uniform(
        key, (2, 2, in_ch, out_ch, m1, m2), dtype=jnp.float32
    )


@lru_cache(maxsize=None)
def _dft_factors_1d(N: int, m: int):
    """1-D half-spectrum factors for modes k = 0..m-1 (m ≤ N//2):
    forward E[k, n] = exp(-2πi·k·n/N); inverse A[n, k] =
    α_k·exp(+2πi·k·n/N)/N with α_0 = 1, α_{k>0} = 2 (pocketfft C2R
    semantics, same derivation as the 2-D factors)."""
    k = np.arange(m)
    n = np.arange(N)
    E = np.exp(-2j * np.pi * np.outer(k, n) / N)
    alpha = np.where(k == 0, 1.0, 2.0)
    A = alpha * np.exp(2j * np.pi * np.outer(n, k) / N) / N
    f32 = lambda a: np.ascontiguousarray(a, np.float32)  # noqa: E731
    return f32(E.real), f32(E.imag), f32(A.real), f32(A.imag)


def spectral_conv1d_matmul(
    x: jnp.ndarray,  # (B, H, W, C)
    weights: jnp.ndarray,  # (2, C, C, m): [re/im, in, out, mode]
    modes: int,
    axis: int,  # 1 (H) or 2 (W)
) -> jnp.ndarray:
    """Factorized 1-D spectral conv along one spatial axis (the FFNO
    building block, Tran et al., arXiv:2111.13802): project onto the
    first ``modes`` Fourier modes of that axis, mix channels per mode,
    reconstruct. DFT-matmul formulation like the 2-D op."""
    assert axis in (1, 2)
    N = x.shape[axis]
    m = min(modes, N // 2)
    Er, Ei, Ar, Ai = _dft_factors_1d(N, m)
    Wr, Wi = weights[0, :, :, :m], weights[1, :, :, :m]

    sub = "kh,bhwc->bkwc" if axis == 1 else "kw,bhwc->bhkc"
    X_r = jnp.einsum(sub, Er, x)
    X_i = jnp.einsum(sub, Ei, x)
    mix = "bkwi,iok->bkwo" if axis == 1 else "bhki,iok->bhko"
    Y_r = jnp.einsum(mix, X_r, Wr) - jnp.einsum(mix, X_i, Wi)
    Y_i = jnp.einsum(mix, X_r, Wi) + jnp.einsum(mix, X_i, Wr)
    inv = "hk,bkwc->bhwc" if axis == 1 else "wk,bhkc->bhwc"
    return jnp.einsum(inv, Ar, Y_r) - jnp.einsum(inv, Ai, Y_i)


def init_spectral_weights_1d(key, ch: int, m: int):
    import jax

    scale = 1.0 / (ch * ch)
    return scale * jax.random.uniform(
        key, (2, ch, ch, m), dtype=jnp.float32
    )
