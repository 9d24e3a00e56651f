"""DDPM noise scheduler (diffusers-free reimplementation).

Mirrors the behavior the reference gets from
``diffusers.DDPMScheduler(num_train_timesteps, beta_schedule=
"squaredcos_cap_v2")`` with default config (prediction_type="epsilon",
variance_type="fixed_small", clip_sample=True, clip_sample_range=1.0):

- betas: the improved-DDPM cosine schedule (Nichol & Dhariwal 2021):
  ᾱ(t) = cos²(((t/T)+0.008)/1.008 · π/2),
  β_t = min(1 − ᾱ(t+1)/ᾱ(t), 0.999).
- ``add_noise``: √ᾱ_t·x₀ + √(1−ᾱ_t)·ε.
- ``set_timesteps(n)``: leading spacing — (arange(n)·(T//n)) reversed.
- ``step``: ancestral DDPM step with x₀ clipping to [-1, 1] and
  fixed-small posterior variance, noise added for t > 0.

Everything is jit-friendly: the sampling loop is a ``lax.scan`` over
the spaced timesteps (see ``ddpm_sample``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DDPMScheduler(NamedTuple):
    betas: jnp.ndarray  # (T,)
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int
    clip_sample: bool = True
    clip_sample_range: float = 1.0

    @property
    def config(self):  # mirror diffusers' .config.num_train_timesteps
        return self

    def add_noise(self, original_samples, noise, timesteps):
        """timesteps: (B,) int. Broadcast over trailing dims."""
        acp = self.alphas_cumprod[timesteps]
        shape = (-1,) + (1,) * (original_samples.ndim - 1)
        sqrt_acp = jnp.sqrt(acp).reshape(shape)
        sqrt_1macp = jnp.sqrt(1.0 - acp).reshape(shape)
        return sqrt_acp * original_samples + sqrt_1macp * noise

    def spaced_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Leading spacing, descending (diffusers set_timesteps)."""
        step_ratio = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1]
        return ts.astype(np.int32).copy()

    def step(self, model_output, timestep, sample, prev_timestep, key=None):
        """One ancestral denoising step t → prev_t (ε-prediction).

        ``prev_timestep`` < 0 means the final step (ᾱ_prev = 1).
        """
        acp_t = self.alphas_cumprod[timestep]
        acp_prev = jnp.where(
            prev_timestep >= 0,
            self.alphas_cumprod[jnp.maximum(prev_timestep, 0)],
            jnp.ones_like(acp_t),
        )
        beta_prod_t = 1.0 - acp_t
        current_alpha_t = acp_t / acp_prev
        current_beta_t = 1.0 - current_alpha_t

        pred_x0 = (
            sample - jnp.sqrt(beta_prod_t) * model_output
        ) / jnp.sqrt(acp_t)
        if self.clip_sample:
            pred_x0 = jnp.clip(
                pred_x0, -self.clip_sample_range, self.clip_sample_range
            )

        pred_x0_coeff = jnp.sqrt(acp_prev) * current_beta_t / beta_prod_t
        current_coeff = (
            jnp.sqrt(current_alpha_t) * (1.0 - acp_prev) / beta_prod_t
        )
        prev_sample = pred_x0_coeff * pred_x0 + current_coeff * sample

        if key is not None:
            variance = (
                (1.0 - acp_prev) / (1.0 - acp_t) * current_beta_t
            )
            variance = jnp.clip(variance, 1e-20)
            noise = jax.random.normal(key, sample.shape, sample.dtype)
            prev_sample = jnp.where(
                timestep > 0,
                prev_sample + jnp.sqrt(variance) * noise,
                prev_sample,
            )
        return prev_sample


def make_ddpm_scheduler(
    num_train_timesteps: int = 1000,
    beta_schedule: str = "squaredcos_cap_v2",
    clip_sample: bool = True,
) -> DDPMScheduler:
    T = num_train_timesteps
    if beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t / T + 0.008) / 1.008 * np.pi / 2) ** 2

        ts = np.arange(T)
        betas = np.minimum(
            1.0 - alpha_bar(ts + 1) / alpha_bar(ts), 0.999
        )
    elif beta_schedule == "linear":
        betas = np.linspace(1e-4, 0.02, T)
    else:
        raise ValueError(f"unknown beta schedule: {beta_schedule}")
    betas = jnp.asarray(betas, jnp.float32)
    alphas = 1.0 - betas
    return DDPMScheduler(
        betas=betas,
        alphas=alphas,
        alphas_cumprod=jnp.cumprod(alphas),
        num_train_timesteps=T,
        clip_sample=clip_sample,
    )


def ddpm_sample(
    scheduler: DDPMScheduler,
    denoise_fn: Callable,  # (x_t, t_batch) -> eps prediction
    shape,
    key,
    num_inference_steps: int = 50,
) -> jnp.ndarray:
    """Full DDPM sampling loop as one ``lax.scan`` program.

    The reference runs a 50-step Python loop with one device dispatch
    per step (``src/models/pixel_diffusion.py:107-137``); here the whole
    loop compiles to a single XLA computation.
    """
    ts = scheduler.spaced_timesteps(num_inference_steps)
    step_ratio = scheduler.num_train_timesteps // num_inference_steps
    prev_ts = ts - step_ratio
    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape, jnp.float32)

    def body(carry, t_pair):
        x, key = carry
        t, prev_t = t_pair
        key, step_key = jax.random.split(key)
        batch = x.shape[0]
        eps = denoise_fn(x, jnp.full((batch,), t, jnp.int32))
        x = scheduler.step(eps, t, x, prev_t, key=step_key)
        return (x, key), None

    (x, _), _ = jax.lax.scan(
        body,
        (x, key),
        (jnp.asarray(ts), jnp.asarray(prev_ts)),
    )
    return x
