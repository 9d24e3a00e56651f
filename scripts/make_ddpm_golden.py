#!/usr/bin/env python
"""Record golden constants for the DDPM scheduler.

The reference gets its scheduler from ``diffusers.DDPMScheduler(
num_train_timesteps=T, beta_schedule="squaredcos_cap_v2")`` with
otherwise-default config (``src/models/pixel_diffusion.py:57-60``,
``gen_cast_cfd.py:103-106``, ``latent_diffusion.py:54-57``,
``ldm2.py:84-87, 321-324``). ``diffusers`` is not installable here, so
this script transcribes the *published* algorithm (diffusers
``scheduling_ddpm.py``; Nichol & Dhariwal 2021, arXiv:2102.09672 §3.2)
independently in float64 numpy and records:

- the full beta / ᾱ tables for T=1000 (and spot values for T=100),
- ``set_timesteps(50)`` leading-spaced timesteps,
- three deterministic ancestral-step outputs (ε-prediction,
  clip_sample=True, range 1.0) on fixed pseudo-random tensors,
- the fixed_small posterior σ = √variance at those timesteps.

The recorded fixture (tests/golden/ddpm_scheduler.npz) is asserted by
``tests/test_generative.py::test_ddpm_scheduler_golden_constants``
against ``cfdbench_tpu.ops.diffusion`` — pinning recorded behavior, not
just a closed-form re-derivation inside the same codebase.

Run: python scripts/make_ddpm_golden.py   (dev-time only)
"""

from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parent.parent / "tests" / "golden"


def betas_squaredcos_cap_v2(T: int, max_beta: float = 0.999) -> np.ndarray:
    """diffusers ``betas_for_alpha_bar`` with the squaredcos_cap_v2
    alpha_bar_fn: ᾱ(t) = cos²(((t + 0.008)/1.008)·π/2), t ∈ [0, 1];
    β_i = min(1 − ᾱ((i+1)/T)/ᾱ(i/T), 0.999). Computed in python floats
    (float64) exactly as diffusers does, then cast f32 at the end."""

    def alpha_bar(t):
        return float(np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2)

    betas = []
    for i in range(T):
        t1 = i / T
        t2 = (i + 1) / T
        betas.append(min(1.0 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.asarray(betas, dtype=np.float64)


def set_timesteps_leading(T: int, n: int) -> np.ndarray:
    """diffusers DDPMScheduler.set_timesteps default (leading
    spacing): (arange(n) · (T // n)).round()[::-1]."""
    step_ratio = T // n
    return (
        (np.arange(0, n) * step_ratio).round()[::-1].copy().astype(np.int64)
    )


def ddpm_step(
    betas: np.ndarray,
    t: int,
    prev_t: int,
    sample: np.ndarray,
    model_output: np.ndarray,
    clip_sample: bool = True,
    clip_range: float = 1.0,
):
    """diffusers DDPMScheduler.step, default config: ε-prediction,
    fixed_small variance, clip_sample=True. Returns (prev_sample
    *without* the noise term, √variance) so the fixture is
    deterministic; the stochastic part is σ·ε with recorded σ."""
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    alpha_prod_t = acp[t]
    alpha_prod_prev = acp[prev_t] if prev_t >= 0 else 1.0
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_prev = 1.0 - alpha_prod_prev
    current_alpha_t = alpha_prod_t / alpha_prod_prev
    current_beta_t = 1.0 - current_alpha_t

    pred_x0 = (sample - np.sqrt(beta_prod_t) * model_output) / np.sqrt(
        alpha_prod_t
    )
    if clip_sample:
        pred_x0 = np.clip(pred_x0, -clip_range, clip_range)

    x0_coeff = np.sqrt(alpha_prod_prev) * current_beta_t / beta_prod_t
    cur_coeff = np.sqrt(current_alpha_t) * beta_prod_prev / beta_prod_t
    prev_sample = x0_coeff * pred_x0 + cur_coeff * sample

    variance = max(
        beta_prod_prev / beta_prod_t * current_beta_t, 1e-20
    )
    return prev_sample, np.sqrt(variance)


def main() -> None:
    T = 1000
    betas = betas_squaredcos_cap_v2(T)
    acp = np.cumprod(1.0 - betas)
    ts50 = set_timesteps_leading(T, 50)

    rng = np.random.default_rng(20260816)
    sample = rng.standard_normal((2, 8, 8, 2))
    eps = rng.standard_normal((2, 8, 8, 2))

    step_ts, step_prev_ts, step_outs, step_sigmas = [], [], [], []
    x = sample
    for t in ts50[:3]:
        prev_t = int(t) - T // 50
        x, sigma = ddpm_step(betas, int(t), prev_t, x, eps)
        step_ts.append(int(t))
        step_prev_ts.append(prev_t)
        step_outs.append(x.copy())
        step_sigmas.append(sigma)

    np.savez(
        OUT / "ddpm_scheduler.npz",
        betas_T1000=betas.astype(np.float32),
        alphas_cumprod_T1000=acp.astype(np.float32),
        betas_T100=betas_squaredcos_cap_v2(100).astype(np.float32),
        timesteps_50=ts50.astype(np.int32),
        sample=sample.astype(np.float32),
        eps=eps.astype(np.float32),
        step_ts=np.asarray(step_ts, np.int32),
        step_prev_ts=np.asarray(step_prev_ts, np.int32),
        step_outs=np.asarray(step_outs, np.float32),
        step_sigmas=np.asarray(step_sigmas, np.float32),
    )
    print(f"wrote {OUT / 'ddpm_scheduler.npz'}")
    print("betas[:4] =", betas[:4])
    print("acp[[0, 499, 999]] =", acp[[0, 499, 999]])


if __name__ == "__main__":
    main()
