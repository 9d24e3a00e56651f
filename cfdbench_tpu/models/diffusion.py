"""Diffusion-based generative CFD models.

Task-level composites (scheduler + networks + loss) exposing the same
interface as ``trainer_auto.AutoTask`` so the standard trainers drive
them:

- ``PixelDiffusionCfdModel`` (``src/models/pixel_diffusion.py``):
  DDPM in pixel space on the target frame. Reference quirk preserved:
  the forward pass does NOT condition on the input frame (defect #12 in
  SURVEY.md §8) — the UNet sees only the noisy label + (t, params).
- ``LatentDiffusionCfdModelLite`` (``src/models/ldm2.py:240-430``):
  frozen CfdVaeLite encodes the label to 8×8 latents ×scaling_factor; a
  conv conditioning encoder over the input frame + case-param MLP is
  *added* to the noisy latents; a latent UNet predicts the noise;
  generation denoises then VAE-decodes (÷scaling_factor).
- ``GenCastCfdModel`` (``src/models/gen_cast_cfd.py``): diffuses the
  normalized residual X_t − X_{t−1} with second-order conditioning
  (noisy residual ‖ X_{t−1} ‖ X_{t−2} as UNet input); generation
  denoises the residual and adds it to X_{t−1}, masked.

Evaluation rng note: the reference samples fresh noise inside forward
during eval (stochastic dev scores); here eval uses a fixed key for
reproducibility.

Generation runs the full DDPM loop as one ``lax.scan`` program
(``cfdbench_tpu.ops.diffusion.ddpm_sample``) instead of the reference's
50 Python-loop dispatches per frame.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..metrics import LossFn
from ..ops.diffusion import ddpm_sample, make_ddpm_scheduler
from .common import Conv, Dense
from .punetg import PUNetGCFD


class _DiffusionTaskBase:
    pointwise = False
    # Eval generates frames and scores them (masked frame MSE/NMSE,
    # reference evaluate_ldm) rather than scoring the noise prediction.
    generative = True

    def __init__(self, loss_fn: LossFn, timesteps: int):
        self.loss_fn = loss_fn
        self.scheduler = make_ddpm_scheduler(timesteps)
        self.num_inference_steps = 50
        # bf16 fwd/bwd with f32 master weights + loss (the reference's
        # diffusion trainers run under AMP autocast,
        # src/train_gencast.py:358-366, train_ldm.py:63-66).
        self.compute_dtype = None
        # jax.checkpoint (remat) around the UNet in the training loss:
        # trades recompute for activation memory
        # (reference: torch.utils.checkpoint, pixel_diffusion.py:80-89).
        self.use_gradient_checkpointing = False

    def _with_remat(self, enabled: bool):
        self.use_gradient_checkpointing = bool(enabled)
        return self

    def _maybe_remat(self, fn):
        import jax as _jax

        return _jax.checkpoint(fn) if self.use_gradient_checkpointing else fn

    def _cast(self, tree, train: bool = True):
        # Mixed precision applies to the TRAIN forward/backward only;
        # eval/generation stays f32 (the --use_mixed_precision contract).
        if self.compute_dtype is None or not train:
            return tree
        dt = self.compute_dtype
        return jax.tree.map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    @property
    def feedback_channels(self):
        return self.out_chan

    def init_params(self, rng, sample_batch):
        params, state = self.init_variables(rng, sample_batch)
        return {"params": params, **state}

    def _sample_noise_and_t(self, rng, target):
        nkey, tkey = jax.random.split(rng)
        noise = jax.random.normal(nkey, target.shape, target.dtype)
        t = jax.random.randint(
            tkey,
            (target.shape[0],),
            0,
            self.scheduler.num_train_timesteps,
        )
        return noise, t

    # The frozen VAE downsamples by 8; its floor-chain and the Lite
    # cond encoder's ceil-chain disagree on odd dims (tube/dam fields
    # are 66x65), so the latent family operates on fields zero-padded
    # up to a multiple of 8 and crops the decode back to the grid.
    _vae_factor = 8

    def _pad_field(self, x):
        f = self._vae_factor
        ph = (-x.shape[1]) % f
        pw = (-x.shape[2]) % f
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        return x

    def _latent_shape(self, inputs):
        """Latent sampling shape for the frozen VAE on the padded grid,
        from the encoder itself (BOTH spatial axes — a square H//8
        guess diverges from the latents the UNet saw in training).
        Traced shapes only — free under jit."""
        post = jax.eval_shape(
            lambda x: self.vae.apply(
                {"params": self.vae_params},
                self._pad_field(x), method=self.vae.encode,
            ),
            jax.ShapeDtypeStruct(
                inputs[..., : self.out_chan].shape, jnp.float32
            ),
        )
        return post.mean.shape


class PixelDiffusionCfdModel(_DiffusionTaskBase):
    def __init__(
        self,
        loss_fn: LossFn,
        out_chan: int = 2,
        n_case_params: int = 5,
        image_size: int = 64,
        noise_scheduler_timesteps: int = 1000,
        base_channels: int = 64,
        channel_mults=(1, 2, 4),
        num_res_blocks: int = 2,
        dropout: float = 0.1,
    ):
        super().__init__(loss_fn, noise_scheduler_timesteps)
        self.out_chan = out_chan
        self.image_size = image_size
        self.unet = PUNetGCFD(
            in_channels=out_chan,
            out_channels=out_chan,
            base_channels=base_channels,
            n_case_params=n_case_params,
            channel_mults=channel_mults,
            num_res_blocks=num_res_blocks,
            dropout=dropout,
        )

    def init_variables(self, rng, sample_batch):
        b = sample_batch["labels"].shape[0]
        variables = dict(
            self.unet.init(
                rng,
                sample_batch["labels"][..., : self.out_chan],
                jnp.zeros((b,), jnp.int32),
                sample_batch["case_params"],
            )
        )
        return variables.pop("params"), variables

    def loss_scores(self, params, batch, model_state=None, train=False,
                    rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        label = batch["labels"][..., : self.out_chan]
        noise, t = self._sample_noise_and_t(rng, label)
        noisy = self.scheduler.add_noise(label, noise, t)
        # fold_in, not split: split(rng) would return exactly the
        # (nkey, tkey) pair _sample_noise_and_t already consumed, making
        # the dropout key bit-identical to the timestep key.
        drop = jax.random.fold_in(rng, 0x64726F70)  # "drop"

        def unet_fwd(p, noisy_, t_, cp_, drop_):
            return self.unet.apply(
                {"params": p, **(model_state or {})},
                noisy_, t_, cp_, train=train, rngs={"dropout": drop_},
            )

        eps = self._maybe_remat(unet_fwd)(
            self._cast(params, train), self._cast(noisy, train),
            t, self._cast(batch["case_params"], train), drop
        ).astype(jnp.float32)
        scores = self.loss_fn(
            eps, noise, sample_weights=batch.get("weights")
        )
        return scores[self.loss_fn.objective], (scores, model_state or {})

    def predict_frame(self, params, inputs, case_params, mask,
                      model_state=None, rng=None):
        """Generate the next frame by full DDPM sampling from noise
        (the reference forward never conditions on ``inputs``)."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        B, H, W = inputs.shape[0], inputs.shape[1], inputs.shape[2]

        def denoise(x, t):
            return self.unet.apply(
                {"params": params, **(model_state or {})},
                x, t, case_params, train=False,
            )

        frame = ddpm_sample(
            self.scheduler, denoise, (B, H, W, self.out_chan), rng,
            self.num_inference_steps,
        )
        if mask is not None:
            frame = frame * mask
        return frame


class GenCastCfdModel(_DiffusionTaskBase):
    """Batch contract adds ``inputs_prev`` (X_{t-2})."""

    def __init__(
        self,
        loss_fn: LossFn,
        residual_mean: np.ndarray,  # (C,)
        residual_std: np.ndarray,  # (C,)
        in_chan: int = 2,
        out_chan: int = 2,
        n_case_params: int = 5,
        noise_scheduler_timesteps: int = 1000,
        base_channels: int = 64,
        channel_mults=(1, 2, 4),
        num_res_blocks: int = 2,
        dropout: float = 0.1,
    ):
        super().__init__(loss_fn, noise_scheduler_timesteps)
        self.in_chan = in_chan
        self.out_chan = out_chan
        self.residual_mean = jnp.asarray(residual_mean).reshape(1, 1, 1, -1)
        self.residual_std = jnp.asarray(residual_std).reshape(1, 1, 1, -1)
        self.unet = PUNetGCFD(
            in_channels=out_chan + 2 * in_chan,
            out_channels=out_chan,
            base_channels=base_channels,
            n_case_params=n_case_params,
            channel_mults=channel_mults,
            num_res_blocks=num_res_blocks,
            dropout=dropout,
        )

    def init_variables(self, rng, sample_batch):
        b = sample_batch["inputs"].shape[0]
        h, w = sample_batch["inputs"].shape[1:3]
        x = jnp.zeros(
            (b, h, w, self.out_chan + 2 * self.in_chan), jnp.float32
        )
        variables = dict(
            self.unet.init(
                rng, x, jnp.zeros((b,), jnp.int32),
                sample_batch["case_params"],
            )
        )
        return variables.pop("params"), variables

    def normalize_residual(self, residual):
        return (residual - self.residual_mean) / (self.residual_std + 1e-6)

    def loss_scores(self, params, batch, model_state=None, train=False,
                    rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        inputs = batch["inputs"]
        prev = batch["inputs_prev"]
        label = batch["labels"][..., : self.out_chan]
        norm_res = self.normalize_residual(label - inputs)
        noise, t = self._sample_noise_and_t(rng, norm_res)
        noisy = self.scheduler.add_noise(norm_res, noise, t)
        unet_in = jnp.concatenate([noisy, inputs, prev], axis=-1)
        # fold_in for the same reason as PixelDiffusion.loss_scores:
        # split(rng) here would alias the timestep key.
        drop = jax.random.fold_in(rng, 0x64726F70)  # "drop"

        def unet_fwd(p, x_, t_, cp_, drop_):
            return self.unet.apply(
                {"params": p, **(model_state or {})},
                x_, t_, cp_, train=train, rngs={"dropout": drop_},
            )

        eps = self._maybe_remat(unet_fwd)(
            self._cast(params, train), self._cast(unet_in, train),
            t, self._cast(batch["case_params"], train), drop
        ).astype(jnp.float32)
        scores = self.loss_fn(
            eps, noise, sample_weights=batch.get("weights")
        )
        return scores[self.loss_fn.objective], (scores, model_state or {})

    def generate(self, params, inputs, inputs_prev, case_params, mask,
                 model_state=None, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        B, H, W = inputs.shape[0], inputs.shape[1], inputs.shape[2]

        def denoise(x, t):
            unet_in = jnp.concatenate([x, inputs, inputs_prev], axis=-1)
            return self.unet.apply(
                {"params": params, **(model_state or {})},
                unet_in, t, case_params, train=False,
            )

        norm_res = ddpm_sample(
            self.scheduler, denoise, (B, H, W, self.out_chan), rng,
            self.num_inference_steps,
        )
        residual = norm_res * self.residual_std + self.residual_mean
        nxt = inputs + residual
        if mask is not None:
            nxt = nxt * mask
        return nxt

    def rollout(self, params, frame0, frame_prev0, case_params, mask,
                steps, model_state=None, rng=None):
        """Autoregressive generation keeping the 2-frame window
        (``gen_cast_cfd.py:275-308``) as a jitted scan."""
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def body(carry, key):
            cur, prev = carry
            nxt = self.generate(
                params, cur, prev, case_params, mask,
                model_state=model_state, rng=key,
            )
            return (nxt, cur), nxt

        keys = jax.random.split(rng, steps)
        _, frames = jax.lax.scan(body, (frame0, frame_prev0), keys)
        return frames


class LatentDiffusionCfdModel(_DiffusionTaskBase):
    """LDM v1 (``src/models/latent_diffusion.py``): frozen CfdVaeLite
    encodes the label → 8×8 latents ×scaling_factor; the latent UNet
    conditions via cross-attention over a sequence built from the input
    field ‖ broadcast case params flattened over space
    (``latent_diffusion.py:79-89``)."""

    def __init__(
        self,
        loss_fn: LossFn,
        vae_params,
        in_chan: int = 2,
        out_chan: int = 2,
        n_case_params: int = 5,
        latent_dim: int = 4,
        scaling_factor: float = 4.5578,
        noise_scheduler_timesteps: int = 1000,
        unet_base_channels: int = 64,
        unet_channel_mult=(1, 2, 4),
        unet_num_res_blocks: int = 1,
        context_dim: int = 64,
    ):
        from .vae import make_cfd_vae

        super().__init__(loss_fn, noise_scheduler_timesteps)
        self.in_chan = in_chan
        self.out_chan = out_chan
        self.latent_dim = latent_dim
        self.scaling_factor = scaling_factor
        self.context_dim = context_dim
        self.vae = make_cfd_vae("lite", out_chan, out_chan, latent_dim)
        self.vae_params = vae_params
        self.context_proj = Dense(context_dim)
        self.unet = PUNetGCFD(
            in_channels=latent_dim,
            out_channels=latent_dim,
            base_channels=unet_base_channels,
            n_case_params=n_case_params,
            channel_mults=unet_channel_mult,
            num_res_blocks=unet_num_res_blocks,
            dropout=0.0,
            cross_attention=True,
        )

    def _context_tokens(self, inputs, case_params):
        """Per-pixel tokens [u, v ‖ case_params] → (B, H·W, 2+P)."""
        B, H, W, _ = inputs.shape
        cp = jnp.broadcast_to(
            case_params[:, None, None, :],
            (B, H, W, case_params.shape[-1]),
        )
        return jnp.concatenate(
            [inputs[..., : self.in_chan], cp], axis=-1
        ).reshape(B, H * W, -1)

    def init_variables(self, rng, sample_batch):
        b = sample_batch["inputs"].shape[0]
        h, w = sample_batch["inputs"].shape[1:3]
        f = self._vae_factor
        latent_h, latent_w = -(-h // f), -(-w // f)  # padded grid / 8
        tokens = self._context_tokens(
            jnp.asarray(sample_batch["inputs"]),
            jnp.asarray(sample_batch["case_params"]),
        )
        r1, r2 = jax.random.split(rng)
        proj_vs = self.context_proj.init(r1, tokens)
        ctx = self.context_proj.apply(proj_vs, tokens)
        unet_vs = self.unet.init(
            r2,
            jnp.zeros((b, latent_h, latent_w, self.latent_dim)),
            jnp.zeros((b,), jnp.int32),
            sample_batch["case_params"],
            context=ctx,
        )
        return {
            "context_proj": dict(proj_vs)["params"],
            "unet": dict(unet_vs)["params"],
        }, {}

    def init_params(self, rng, sample_batch):
        params, state = self.init_variables(rng, sample_batch)
        return {"params": params, **state}

    def _context(self, params, inputs, case_params):
        tokens = self._context_tokens(inputs, case_params)
        return self.context_proj.apply(
            {"params": params["context_proj"]}, tokens
        )

    def loss_scores(self, params, batch, model_state=None, train=False,
                    rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng, vkey = jax.random.split(rng)
        label = self._pad_field(batch["labels"][..., : self.out_chan])
        posterior = self.vae.apply(
            {"params": self.vae_params}, label, method=self.vae.encode
        )
        latents = (
            jax.lax.stop_gradient(posterior.sample(vkey))
            * self.scaling_factor
        )
        noise, t = self._sample_noise_and_t(rng, latents)
        noisy = self.scheduler.add_noise(latents, noise, t)
        ctx = self._context(params, batch["inputs"], batch["case_params"])
        eps = self.unet.apply(
            {"params": self._cast(params["unet"], train)},
            self._cast(noisy, train), t,
            self._cast(batch["case_params"], train),
            train=train, context=self._cast(ctx, train),
        ).astype(jnp.float32)
        scores = self.loss_fn(
            eps, noise, sample_weights=batch.get("weights")
        )
        return scores[self.loss_fn.objective], (scores, model_state or {})

    def predict_frame(self, params, inputs, case_params, mask,
                      model_state=None, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        lat_shape = self._latent_shape(inputs)
        ctx = self._context(params, inputs, case_params)

        def denoise(x, t):
            return self.unet.apply(
                {"params": params["unet"]},
                x, t, case_params, train=False, context=ctx,
            )

        latents = ddpm_sample(
            self.scheduler, denoise, lat_shape, rng,
            self.num_inference_steps,
        )
        frame = self.vae.apply(
            {"params": self.vae_params},
            latents / self.scaling_factor,
            method=self.vae.decode,
        )
        # The decoder reconstructs to the next multiple of the VAE's
        # downsample factor; crop back to the field dims (tube/dam are
        # 66x65) so masking/metrics see the original grid.
        frame = frame[:, : inputs.shape[1], : inputs.shape[2], :]
        if mask is not None:
            frame = frame * mask
        return frame


class LatentDiffusionCfdModel2(LatentDiffusionCfdModel):
    """Non-lite LDM2 (``src/models/ldm2.py:58-135``): a *cross-attention*
    latent UNet with the explicit memory-lean config — no self-attention
    in the down/up path (reference ``down_block_types=DownBlock2D``),
    cross-attention in the mid block only, and conditioning tokens fed
    *raw*: per-pixel ``[u, v ‖ case_params]`` with
    ``cross_attention_dim = in_chan + n_case_params``
    (``ldm2.py:125-131``) — unlike v1, no learned context projection.

    Deviation (documented): the reference uses ``attention_head_dim=8``
    inside HF's UNet2DConditionModel; our mid-block CrossAttnBlock uses
    4 heads of C/4 dims — same attention structure, different head
    split.
    """

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("unet_num_res_blocks", 1)
        super().__init__(*args, **kwargs)

    def init_variables(self, rng, sample_batch):
        b = sample_batch["inputs"].shape[0]
        h, w = sample_batch["inputs"].shape[1:3]
        f = self._vae_factor
        latent_h, latent_w = -(-h // f), -(-w // f)  # padded grid / 8
        tokens = self._context_tokens(
            jnp.asarray(sample_batch["inputs"]),
            jnp.asarray(sample_batch["case_params"]),
        )
        unet_vs = self.unet.init(
            rng,
            jnp.zeros((b, latent_h, latent_w, self.latent_dim)),
            jnp.zeros((b,), jnp.int32),
            sample_batch["case_params"],
            context=tokens,
        )
        return {"unet": dict(unet_vs)["params"]}, {}

    def _context(self, params, inputs, case_params):
        # Raw conditioning tokens — no projection (ldm2.py:125-131).
        return self._context_tokens(inputs, case_params)


class LatentDiffusionCfdModelLite(_DiffusionTaskBase):
    """LDM with conditioning-by-addition in latent space (the
    memory-lean production variant, ``src/models/ldm2.py:240-430``)."""

    class CondEncoder(nn.Module):
        """3×(stride-2 conv) velocity encoder + case-param MLP,
        combined to latent_dim channels (``ldm2.py:263-289``)."""

        latent_dim: int

        @nn.compact
        def __call__(self, inputs, case_params):
            h = inputs
            for ch in (64, 128, 128):
                h = Conv(ch, kernel_size=3, padding=1, stride=2)(h)
                h = nn.silu(h)
                h = nn.GroupNorm(num_groups=8)(h)
            p = Dense(256)(case_params)
            p = nn.silu(p)
            p = Dense(256)(p)
            p = nn.silu(p)
            B, hh, ww, _ = h.shape
            p = jnp.broadcast_to(p[:, None, None, :], (B, hh, ww, 256))
            h = jnp.concatenate([h, p], axis=-1)
            h = Conv(128, kernel_size=3, padding=1)(h)
            h = nn.silu(h)
            h = nn.GroupNorm(num_groups=8)(h)
            return Conv(self.latent_dim, kernel_size=3, padding=1)(h)

    def __init__(
        self,
        loss_fn: LossFn,
        vae_params,  # frozen, pre-trained (CfdVaeLite weights)
        in_chan: int = 2,
        out_chan: int = 2,
        n_case_params: int = 5,
        latent_dim: int = 4,
        scaling_factor: float = 4.5578,
        noise_scheduler_timesteps: int = 1000,
        unet_base_channels: int = 64,
        unet_channel_mult=(1, 2, 4),
        unet_num_res_blocks: int = 1,
    ):
        from .vae import make_cfd_vae

        super().__init__(loss_fn, noise_scheduler_timesteps)
        self.in_chan = in_chan
        self.out_chan = out_chan
        self.latent_dim = latent_dim
        self.scaling_factor = scaling_factor
        self.vae = make_cfd_vae("lite", out_chan, out_chan, latent_dim)
        self.vae_params = vae_params
        self.cond_encoder = self.CondEncoder(latent_dim)
        self.unet = PUNetGCFD(
            in_channels=latent_dim,
            out_channels=latent_dim,
            base_channels=unet_base_channels,
            n_case_params=n_case_params,
            channel_mults=unet_channel_mult,
            num_res_blocks=unet_num_res_blocks,
            dropout=0.0,
        )

    def init_variables(self, rng, sample_batch):
        b = sample_batch["inputs"].shape[0]
        h, w = sample_batch["inputs"].shape[1:3]
        f = self._vae_factor
        latent_h, latent_w = -(-h // f), -(-w // f)  # padded grid / 8
        r1, r2 = jax.random.split(rng)
        cond_vs = self.cond_encoder.init(
            r1,
            self._pad_field(sample_batch["inputs"][..., : self.in_chan]),
            sample_batch["case_params"],
        )
        unet_vs = self.unet.init(
            r2,
            jnp.zeros((b, latent_h, latent_w, self.latent_dim)),
            jnp.zeros((b,), jnp.int32),
            sample_batch["case_params"],
        )
        params = {
            "cond_encoder": dict(cond_vs)["params"],
            "unet": dict(unet_vs)["params"],
        }
        return params, {}

    def loss_scores(self, params, batch, model_state=None, train=False,
                    rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng, vkey = jax.random.split(rng)
        label = self._pad_field(batch["labels"][..., : self.out_chan])
        posterior = self.vae.apply(
            {"params": self.vae_params}, label, method=self.vae.encode
        )
        latents = (
            jax.lax.stop_gradient(posterior.sample(vkey))
            * self.scaling_factor
        )
        noise, t = self._sample_noise_and_t(rng, latents)
        noisy = self.scheduler.add_noise(latents, noise, t)
        cond = self.cond_encoder.apply(
            {"params": params["cond_encoder"]},
            self._pad_field(batch["inputs"][..., : self.in_chan]),
            batch["case_params"],
        )
        eps = self.unet.apply(
            {"params": self._cast(params["unet"], train)},
            self._cast(noisy + cond, train), t,
            self._cast(batch["case_params"], train), train=train,
        ).astype(jnp.float32)
        scores = self.loss_fn(
            eps, noise, sample_weights=batch.get("weights")
        )
        return scores[self.loss_fn.objective], (scores, model_state or {})

    def predict_frame(self, params, inputs, case_params, mask,
                      model_state=None, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        lat_shape = self._latent_shape(inputs)
        cond = self.cond_encoder.apply(
            {"params": params["cond_encoder"]},
            self._pad_field(inputs[..., : self.in_chan]), case_params,
        )

        def denoise(x, t):
            return self.unet.apply(
                {"params": params["unet"]},
                x + cond, t, case_params, train=False,
            )

        latents = ddpm_sample(
            self.scheduler, denoise, lat_shape, rng,
            self.num_inference_steps,
        )
        frame = self.vae.apply(
            {"params": self.vae_params},
            latents / self.scaling_factor,
            method=self.vae.decode,
        )
        # The decoder reconstructs to the next multiple of the VAE's
        # downsample factor; crop back to the field dims (tube/dam are
        # 66x65) so masking/metrics see the original grid.
        frame = frame[:, : inputs.shape[1], : inputs.shape[2], :]
        if mask is not None:
            frame = frame * mask
        return frame
