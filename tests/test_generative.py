"""Generative extension: scheduler math, PUNetG, VAE, diffusion tasks."""

import jax
import jax.numpy as jnp
import numpy as np

from cfdbench_tpu.metrics import loss_name_to_fn
from cfdbench_tpu.ops.diffusion import ddpm_sample, make_ddpm_scheduler


def test_cosine_schedule_properties():
    s = make_ddpm_scheduler(1000)
    betas = np.asarray(s.betas)
    assert betas.shape == (1000,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    acp = np.asarray(s.alphas_cumprod)
    assert np.all(np.diff(acp) < 0)  # strictly decreasing
    assert acp[0] > 0.99 and acp[-1] < 1e-4
    # Nichol & Dhariwal: alpha_bar(t) ≈ cos^2 ramp
    t = 500
    expected = (
        np.cos((t / 1000 + 0.008) / 1.008 * np.pi / 2) ** 2
        / np.cos(0.008 / 1.008 * np.pi / 2) ** 2
    )
    assert abs(acp[t - 1] - expected) < 5e-3


def test_add_noise_endpoints(rng):
    s = make_ddpm_scheduler(1000)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 2)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 8, 8, 2)), jnp.float32)
    near_clean = s.add_noise(x, noise, jnp.array([0, 0]))
    assert float(jnp.abs(near_clean - x).mean()) < 0.05
    near_noise = s.add_noise(x, noise, jnp.array([999, 999]))
    assert float(jnp.abs(near_noise - noise).mean()) < 0.05


def test_ddpm_sample_oracle_denoiser(rng):
    """With the oracle eps-predictor for a fixed target x0 (|x0|<=1 so
    clipping is inactive), sampling should land near x0."""
    s = make_ddpm_scheduler(1000)
    x0 = jnp.asarray(
        0.5 * np.sign(rng.standard_normal((1, 4, 4, 1))), jnp.float32
    )

    def oracle(x_t, t):
        acp = s.alphas_cumprod[t].reshape(-1, 1, 1, 1)
        return (x_t - jnp.sqrt(acp) * x0) / jnp.sqrt(1 - acp)

    out = ddpm_sample(
        s, oracle, x0.shape, jax.random.PRNGKey(0), num_inference_steps=50
    )
    assert float(jnp.abs(out - x0).max()) < 0.05


def test_punetg_shapes(rng):
    from cfdbench_tpu.models.punetg import PUNetGCFD

    m = PUNetGCFD(in_channels=6, out_channels=2, base_channels=32,
                  n_case_params=5)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 6)), jnp.float32)
    t = jnp.array([5, 900])
    cp = jnp.asarray(rng.standard_normal((2, 5)), jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), x, t, cp)
    out = m.apply(vs, x, t, cp)
    assert out.shape == (2, 64, 64, 2)
    # Conditioning matters: different timesteps → different outputs.
    out2 = m.apply(vs, x, jnp.array([500, 100]), cp)
    assert float(jnp.abs(out - out2).max()) > 1e-4


def test_vae_roundtrip_shapes(rng):
    from cfdbench_tpu.models.vae import make_cfd_vae

    vae = make_cfd_vae("lite", 2, 2, 4)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 2)), jnp.float32)
    vs = vae.init(jax.random.PRNGKey(0), x, rng=None)
    recon, posterior = vae.apply(
        vs, x, rng=jax.random.PRNGKey(1)
    )
    assert recon.shape == x.shape
    assert posterior.mean.shape == (2, 8, 8, 4)  # 64 -> 8 spatial
    kl = posterior.kl()
    assert kl.shape == (2,) and (np.asarray(kl) >= 0).all()


def test_pixel_diffusion_task(rng):
    from cfdbench_tpu.models.diffusion import PixelDiffusionCfdModel

    task = PixelDiffusionCfdModel(
        loss_name_to_fn("nmse"), out_chan=2, n_case_params=5,
        image_size=16, base_channels=32, num_res_blocks=1,
        noise_scheduler_timesteps=100,
    )
    batch = dict(
        inputs=jnp.asarray(rng.standard_normal((2, 16, 16, 2)), jnp.float32),
        labels=jnp.asarray(rng.standard_normal((2, 16, 16, 2)), jnp.float32),
        mask=jnp.ones((2, 16, 16, 1)),
        case_params=jnp.zeros((2, 5)),
        weights=jnp.ones((2,)),
    )
    params, state = task.init_variables(jax.random.PRNGKey(0), batch)
    obj, (scores, _) = task.loss_scores(
        params, batch, train=True, rng=jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(obj))
    # gradient flows
    g = jax.grad(
        lambda p: task.loss_scores(p, batch, rng=jax.random.PRNGKey(1))[0]
    )(params)
    assert float(jax.tree.leaves(g)[0].std()) > 0
    task.num_inference_steps = 5
    frame = task.predict_frame(
        params, batch["inputs"], batch["case_params"], batch["mask"]
    )
    assert frame.shape == (2, 16, 16, 2)


def test_gencast_wrapper_and_task(synth_root, rng):
    from cfdbench_tpu.data import get_auto_dataset
    from cfdbench_tpu.data.wrapper import (
        compute_residual_stats,
        wrap_gencast,
    )
    from cfdbench_tpu.models.diffusion import GenCastCfdModel

    train, _, _ = get_auto_dataset(
        synth_root, "cavity_prop", 0.1, True, True, load_splits=["train"]
    )
    gc = wrap_gencast(train)
    # Triples align: inputs_prev at index i is the pair before inputs.
    assert len(gc) < len(train)
    stats = compute_residual_stats(gc)
    assert stats["residual_mean"].shape == (2,)
    assert (stats["residual_std"] >= 1e-6).all()
    # X_{t-1} of triple equals label of the previous pair
    ids = train.case_ids
    valid = np.nonzero((np.arange(len(ids)) > 0) & (ids == np.roll(ids, 1)))[0]
    np.testing.assert_allclose(gc.inputs_prev, train.inputs[valid - 1])

    task = GenCastCfdModel(
        loss_name_to_fn("nmse"),
        residual_mean=stats["residual_mean"],
        residual_std=stats["residual_std"],
        n_case_params=gc.n_case_params,
        base_channels=32,
        num_res_blocks=1,
        noise_scheduler_timesteps=100,
    )
    batch = dict(
        inputs=jnp.asarray(gc.inputs[:2]),
        inputs_prev=jnp.asarray(gc.inputs_prev[:2]),
        labels=jnp.asarray(gc.labels[:2]),
        mask=jnp.asarray(gc.masks[:2]),
        case_params=jnp.asarray(gc.case_params[:2]),
        weights=jnp.ones((2,)),
    )
    params, _ = task.init_variables(jax.random.PRNGKey(0), batch)
    obj, (scores, _) = task.loss_scores(
        params, batch, train=True, rng=jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(obj))
    task.num_inference_steps = 4
    nxt = task.generate(
        params, batch["inputs"], batch["inputs_prev"],
        batch["case_params"], batch["mask"],
    )
    assert nxt.shape == batch["inputs"].shape
    # Mixed precision (the reference's AMP path): bf16 fwd, f32 loss,
    # close to the f32 loss; grads stay f32 wrt master params.
    obj32 = float(obj)
    task.compute_dtype = jnp.bfloat16
    obj16, (scores16, _) = task.loss_scores(
        params, batch, train=True, rng=jax.random.PRNGKey(1)
    )
    assert scores16["mse"].dtype == jnp.float32
    assert np.isclose(obj32, float(obj16), rtol=0.05)
    g = jax.grad(
        lambda p: task.loss_scores(p, batch, rng=jax.random.PRNGKey(1))[0]
    )(params)
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(g))
    task.compute_dtype = None


def test_latent_diffusion2_nonlite_raw_context(rng):
    """Non-lite LDM2 (src/models/ldm2.py:58-135): cross-attention UNet
    conditioned on *raw* per-pixel [u,v ‖ case_params] tokens (no
    learned projection), memory-lean config."""
    from cfdbench_tpu.models.diffusion import LatentDiffusionCfdModel2
    from cfdbench_tpu.models.vae import make_cfd_vae

    vae = make_cfd_vae("lite", 2, 2, 4)
    x16 = jnp.zeros((1, 16, 16, 2))
    vae_params = dict(vae.init(jax.random.PRNGKey(0), x16, rng=None))[
        "params"
    ]
    task = LatentDiffusionCfdModel2(
        loss_name_to_fn("nmse"), vae_params,
        unet_base_channels=32, unet_channel_mult=(1,),
        noise_scheduler_timesteps=100,
    )
    batch = dict(
        inputs=jnp.asarray(rng.standard_normal((2, 16, 16, 2)), jnp.float32),
        labels=jnp.asarray(rng.standard_normal((2, 16, 16, 2)), jnp.float32),
        mask=jnp.ones((2, 16, 16, 1)),
        case_params=jnp.zeros((2, 5)),
        weights=jnp.ones((2,)),
    )
    params, _ = task.init_variables(jax.random.PRNGKey(0), batch)
    # No learned context projection — params hold only the UNet.
    assert set(params) == {"unet"}
    obj, _ = task.loss_scores(
        params, batch, train=True, rng=jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(obj))
    # Cross-attention conditioning on the input frame matters.
    batch2 = dict(batch, inputs=batch["inputs"] * 3.0)
    obj2, _ = task.loss_scores(
        params, batch2, train=True, rng=jax.random.PRNGKey(1)
    )
    assert abs(float(obj) - float(obj2)) > 1e-7
    task.num_inference_steps = 3
    frame = task.predict_frame(
        params, batch["inputs"], batch["case_params"], batch["mask"]
    )
    assert frame.shape == (2, 16, 16, 2)


def test_latent_diffusion_v1_cross_attention(rng):
    from cfdbench_tpu.models.diffusion import LatentDiffusionCfdModel
    from cfdbench_tpu.models.vae import make_cfd_vae
    import jax

    vae = make_cfd_vae("lite", 2, 2, 4)
    x16 = jnp.zeros((1, 16, 16, 2))
    vae_params = dict(vae.init(jax.random.PRNGKey(0), x16, rng=None))[
        "params"
    ]
    task = LatentDiffusionCfdModel(
        loss_name_to_fn("nmse"), vae_params,
        unet_base_channels=32, unet_channel_mult=(1,),
        noise_scheduler_timesteps=100,
    )
    batch = dict(
        inputs=jnp.asarray(rng.standard_normal((2, 16, 16, 2)), jnp.float32),
        labels=jnp.asarray(rng.standard_normal((2, 16, 16, 2)), jnp.float32),
        mask=jnp.ones((2, 16, 16, 1)),
        case_params=jnp.zeros((2, 5)),
        weights=jnp.ones((2,)),
    )
    params, _ = task.init_variables(jax.random.PRNGKey(0), batch)
    obj, (scores, _) = task.loss_scores(
        params, batch, train=True, rng=jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(obj))
    # conditioning matters: different inputs -> different loss
    batch2 = dict(batch, inputs=batch["inputs"] * 3.0)
    obj2, _ = task.loss_scores(
        params, batch2, train=True, rng=jax.random.PRNGKey(1)
    )
    assert abs(float(obj) - float(obj2)) > 1e-7
    task.num_inference_steps = 3
    frame = task.predict_frame(
        params, batch["inputs"], batch["case_params"], batch["mask"]
    )
    assert frame.shape == (2, 16, 16, 2)
