"""Spectral conv: matmul backend ≡ FFT backend ≡ torch-style reference
formula (on CPU, where all FFT conventions are pocketfft)."""

import jax
import jax.numpy as jnp
import numpy as np

from cfdbench_tpu.ops.spectral import (
    init_spectral_weights,
    spectral_conv2d_fft,
    spectral_conv2d_matmul,
    spectral_conv2d_matmul_packed,
    spectral_conv2d_matmul_rsep,
    spectral_conv2d_matmul_wfirst,
)


def _np_reference(x_nhwc, weights, m1, m2):
    """Reference semantics from the published FNO formulation
    (rfft2 → two-corner truncated complex mixing → irfft2), computed
    with numpy in NCHW like the original torch code."""
    x = np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))  # (B, C, H, W)
    B, C, H, W = x.shape
    w_c = np.asarray(weights[:, 0] + 1j * weights[:, 1])  # (2,Ci,Co,m1,m2)
    Cout = w_c.shape[2]
    x_ft = np.fft.rfft2(x)
    out_ft = np.zeros((B, Cout, H, W // 2 + 1), dtype=complex)
    out_ft[:, :, :m1, :m2] = np.einsum(
        "bixy,ioxy->boxy", x_ft[:, :, :m1, :m2], w_c[0]
    )
    out_ft[:, :, -m1:, :m2] = np.einsum(
        "bixy,ioxy->boxy", x_ft[:, :, -m1:, :m2], w_c[1]
    )
    y = np.fft.irfft2(out_ft, s=(H, W))
    return np.transpose(y, (0, 2, 3, 1))


def test_matmul_equals_fft_and_reference(rng):
    B, H, W, Ci, Co, m1, m2 = 2, 16, 16, 3, 5, 4, 4
    x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.float32)
    w = init_spectral_weights(jax.random.PRNGKey(1), Ci, Co, m1, m2)

    y_fft = spectral_conv2d_fft(x, w, m1, m2)
    y_mm = spectral_conv2d_matmul(x, w, m1, m2)
    y_pk = spectral_conv2d_matmul_packed(x, w, m1, m2)
    y_wf = spectral_conv2d_matmul_wfirst(x, w, m1, m2)
    y_rs = spectral_conv2d_matmul_rsep(x, w, m1, m2)
    y_ref = _np_reference(x, np.asarray(w), m1, m2)

    np.testing.assert_allclose(np.asarray(y_fft), y_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_mm), y_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_pk), y_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_wf), y_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_rs), y_ref, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(y_mm), np.asarray(y_fft), atol=2e-5
    )


def test_matmul_equals_fft_64x64_modes12(rng):
    """Production config: 64×64, 12 modes."""
    B, H, W, C = 2, 64, 64, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = init_spectral_weights(jax.random.PRNGKey(2), C, C, 12, 12)
    y_fft = spectral_conv2d_fft(x, w, 12, 12)
    y_mm = spectral_conv2d_matmul(x, w, 12, 12)
    y_pk = spectral_conv2d_matmul_packed(x, w, 12, 12)
    y_wf = spectral_conv2d_matmul_wfirst(x, w, 12, 12)
    y_rs = spectral_conv2d_matmul_rsep(x, w, 12, 12)
    np.testing.assert_allclose(
        np.asarray(y_rs), np.asarray(y_fft), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(y_mm), np.asarray(y_fft), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(y_pk), np.asarray(y_fft), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(y_wf), np.asarray(y_fft), atol=5e-5
    )


def test_wfirst_nonsquare_and_clamped_modes(rng):
    """The padded tube/dam grids are non-square (66×65); modes also
    clamp when they exceed the grid's half-spectrum."""
    for (H, W, m1, m2) in ((18, 10, 4, 4), (12, 16, 12, 12)):
        x = jnp.asarray(rng.standard_normal((2, H, W, 3)), jnp.float32)
        eff1, eff2 = min(m1, H // 2), min(m2, W // 2 + 1)
        w = init_spectral_weights(jax.random.PRNGKey(4), 3, 5, eff1, eff2)
        y_fft = spectral_conv2d_fft(x, w, m1, m2)
        y_wf = spectral_conv2d_matmul_wfirst(x, w, m1, m2)
        y_rs = spectral_conv2d_matmul_rsep(x, w, m1, m2)
        np.testing.assert_allclose(
            np.asarray(y_wf), np.asarray(y_fft), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(y_rs), np.asarray(y_fft), atol=2e-5
        )


def test_gradients_match(rng):
    B, H, W, C = 2, 16, 16, 4
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = init_spectral_weights(jax.random.PRNGKey(3), C, C, 4, 4)

    g_fft = jax.grad(lambda w: spectral_conv2d_fft(x, w, 4, 4).sum())(w)
    g_mm = jax.grad(lambda w: spectral_conv2d_matmul(x, w, 4, 4).sum())(w)
    g_pk = jax.grad(
        lambda w: spectral_conv2d_matmul_packed(x, w, 4, 4).sum()
    )(w)
    g_wf = jax.grad(
        lambda w: spectral_conv2d_matmul_wfirst(x, w, 4, 4).sum()
    )(w)
    np.testing.assert_allclose(
        np.asarray(g_mm), np.asarray(g_fft), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_pk), np.asarray(g_fft), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_wf), np.asarray(g_fft), atol=2e-4
    )
    g_rs = jax.grad(
        lambda w: spectral_conv2d_matmul_rsep(x, w, 4, 4).sum()
    )(w)
    np.testing.assert_allclose(
        np.asarray(g_rs), np.asarray(g_fft), atol=2e-4
    )


def test_rsep_wide_width_per_corner_path(rng):
    """Cin >= 128 takes the per-corner raw-slice mixing branch (no
    packed weight-block construction); numerics must match the FFT
    backend, forward and gradient."""
    B, H, W, C, m = 2, 16, 16, 128, 4
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = init_spectral_weights(jax.random.PRNGKey(5), C, C, m, m)
    y_fft = spectral_conv2d_fft(x, w, m, m)
    y_rs = spectral_conv2d_matmul_rsep(x, w, m, m)
    np.testing.assert_allclose(
        np.asarray(y_rs), np.asarray(y_fft), atol=2e-4
    )
    g_fft = jax.grad(lambda w: spectral_conv2d_fft(x, w, m, m).sum())(w)
    g_rs = jax.grad(
        lambda w: spectral_conv2d_matmul_rsep(x, w, m, m).sum()
    )(w)
    np.testing.assert_allclose(
        np.asarray(g_rs), np.asarray(g_fft), atol=2e-3
    )


def test_spectral_conv1d_matches_fft(rng):
    """1-D spectral conv (FFNO building block) vs an rfft/irfft
    reference along each axis."""
    from cfdbench_tpu.ops.spectral import (
        init_spectral_weights_1d,
        spectral_conv1d_matmul,
    )

    B, H, W, C, m = 2, 16, 12, 4, 5
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = init_spectral_weights_1d(jax.random.PRNGKey(7), C, m)
    wc = np.asarray(w[0] + 1j * w[1])  # (C, C, m)

    for axis, N in ((1, H), (2, W)):
        out = spectral_conv1d_matmul(x, w, m, axis=axis)
        xf = np.fft.rfft(np.asarray(x), axis=axis)
        yf = np.zeros_like(xf)
        if axis == 1:
            mixed = np.einsum("bkwi,iok->bkwo", xf[:, :m], wc)
            yf[:, :m] = mixed
        else:
            mixed = np.einsum("bhki,iok->bhko", xf[:, :, :m], wc)
            yf[:, :, :m] = mixed
        ref = np.fft.irfft(yf, n=N, axis=axis)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_ffno_model_shapes(rng):
    from cfdbench_tpu.models.ffno import Ffno2d

    model = Ffno2d(num_layers=2, hidden_dim=8, modes1=4, modes2=4)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 2)), jnp.float32)
    cp = jnp.zeros((2, 5))
    m = jnp.ones((2, 16, 16, 1))
    vs = model.init(jax.random.PRNGKey(0), x, cp, m)
    out = model.apply(vs, x, cp, m)
    assert out.shape == (2, 16, 16, 2)
    # factorized: spectral params scale with m1 + m2, not m1 * m2
    n = sum(
        p.size for name, p in jax.tree_util.tree_leaves_with_path(
            vs["params"]
        ) if "weights" in str(name)
    )
    assert n == 2 * (2 * 8 * 8 * 4) * 2  # 2 layers x (h + w) weights
