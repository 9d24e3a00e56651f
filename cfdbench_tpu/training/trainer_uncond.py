"""Unconditional DDPM trainer with EMA.

Native counterpart of the reference's ``src/train_diffusers.py`` (the
stock HF diffusers unconditional-DDPM example built on
``accelerate.Accelerator`` — generic and not wired to CFDBench data,
SURVEY.md §2 parallelism note). Here the same capability — train an
unconditional DDPM over flow frames with an EMA shadow of the weights
and periodic sample grids — is implemented natively and actually wired
to the CFDBench datasets.
"""

from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.pipeline import batches, device_prefetch
from ..models.punetg import PUNetGCFD
from ..ops.diffusion import ddpm_sample, make_ddpm_scheduler
from ..parallel.mesh import default_sharding_fn
from ..utils.artifacts import dump_json
from . import checkpoints


class UncondState(NamedTuple):
    params: Any
    ema_params: Any
    opt_state: Any
    step: jnp.ndarray


def train_uncond_ddpm(
    frames: np.ndarray,  # (N, H, W, C)
    output_dir: Path,
    num_epochs: int = 50,
    lr: float = 1e-4,
    batch_size: int = 16,
    timesteps: int = 1000,
    base_channels: int = 64,
    ema_decay: float = 0.9999,
    sample_every: int = 10,
    seed: int = 0,
    mesh=None,
    resume: bool = False,
) -> Any:
    """``resume=True`` continues from ``output_dir/training_state``
    (params + EMA shadow + optimizer + step); the reference's stock
    diffusers example relies on accelerate's checkpointing, which its
    CFDBench copy never wires up (``src/train_diffusers.py``)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    pad_mult = mesh.shape["data"] if mesh is not None else 1
    N, H, W, C = frames.shape
    scheduler = make_ddpm_scheduler(timesteps)
    unet = PUNetGCFD(
        in_channels=C, out_channels=C, base_channels=base_channels,
        n_case_params=1,
    )
    zero_cond = jnp.zeros((batch_size, 1), jnp.float32)
    params = dict(
        unet.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((batch_size, H, W, C)),
            jnp.zeros((batch_size,), jnp.int32),
            zero_cond,
        )
    )["params"]
    tx = optax.adamw(lr)
    if mesh is not None:
        from ..parallel.sharding_rules import shard_params

        params = shard_params(params, mesh)
    # The EMA shadow starts equal to params but must be a *distinct*
    # buffer: the donated train step would otherwise donate the same
    # buffer twice on the first call.
    state = UncondState(
        params, jax.tree.map(jnp.copy, params), tx.init(params),
        jnp.zeros((), jnp.int32),
    )
    base_rng = jax.random.PRNGKey(seed + 99)

    # Donate the carried state (params + EMA shadow + adamw mu/nu —
    # 4× the UNet param bytes) so XLA updates it in place instead of
    # double-buffering, like every other trainer's step.
    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(state: UncondState, x, w):
        rng = jax.random.fold_in(base_rng, state.step)
        nkey, tkey, dkey = jax.random.split(rng, 3)
        noise = jax.random.normal(nkey, x.shape, x.dtype)
        t = jax.random.randint(tkey, (x.shape[0],), 0, timesteps)
        noisy = scheduler.add_noise(x, noise, t)

        def lf(p):
            eps = unet.apply(
                {"params": p}, noisy, t,
                jnp.zeros((x.shape[0], 1), x.dtype),
                train=True, rngs={"dropout": dkey},
            )
            per = jnp.mean(jnp.square(eps - noise), axis=(1, 2, 3))
            return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)

        loss, grads = jax.value_and_grad(lf)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree.map(
            lambda e, p: ema_decay * e + (1 - ema_decay) * p,
            state.ema_params, params,
        )
        return UncondState(params, ema, opt_state, state.step + 1), loss

    losses = []
    start = time.time()
    start_epoch = 0
    meta_path = output_dir / "training_meta.json"
    resume_dir = output_dir / "training_state"
    if resume and meta_path.exists() and resume_dir.exists():
        from ..data.core import load_json

        meta = load_json(meta_path)
        state_shardings = (
            checkpoints.resume_shardings(state, mesh)
            if mesh is not None else None
        )
        restored = checkpoints.load_params(
            jax.device_get(state), resume_dir
        )
        state = (
            restored if isinstance(restored, UncondState)
            else UncondState(*restored)
        )
        if state_shardings is not None:
            state = jax.device_put(state, state_shardings)
        start_epoch = meta["epoch"] + 1
        losses = meta["losses"]
        print(f"Resumed from epoch {meta['epoch']}")

    sharding_fn = default_sharding_fn(mesh)
    for ep in range(start_epoch, num_epochs):
        rng = np.random.default_rng(seed * 65537 + ep)
        ep_losses_dev = []
        for batch in device_prefetch(
            batches(
                dict(x=frames), batch_size, shuffle=True, rng=rng,
                pad_multiple=pad_mult,
            ),
            size=2,
            sharding_fn=sharding_fn,
        ):
            state, loss = train_step(state, batch["x"], batch["weights"])
            ep_losses_dev.append(loss)
        if ep_losses_dev:
            losses += np.asarray(jnp.stack(ep_losses_dev)).tolist()
        print(
            f"ep {ep}: loss={np.mean(losses[-10:]):.5f} "
            f"time={time.time() - start:.0f}s"
        )
        if (ep + 1) % sample_every == 0:
            sample_grid(
                unet, scheduler, state.ema_params, (4, H, W, C),
                output_dir / f"samples-ep{ep}.png",
            )
            checkpoints.save_params(
                {"params": jax.device_get(state.ema_params)},
                output_dir / "ema_model",
            )
        # Full-state snapshot for --resume (params + EMA + opt + step).
        checkpoints.save_params(jax.device_get(state), resume_dir)
        dump_json(dict(epoch=ep, losses=losses), meta_path)
    dump_json(losses, output_dir / "train_losses.json")
    checkpoints.save_params(
        {"params": jax.device_get(state.ema_params)},
        output_dir / "ema_model",
    )
    return state


def sample_grid(unet, scheduler, params, shape, out_path,
                num_inference_steps: int = 50) -> None:
    def denoise(x, t):
        return unet.apply(
            {"params": params}, x, t,
            jnp.zeros((x.shape[0], 1), x.dtype), train=False,
        )

    samples = np.asarray(
        ddpm_sample(
            scheduler, denoise, shape, jax.random.PRNGKey(0),
            num_inference_steps,
        )
    )
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = shape[0]
        fig, axs = plt.subplots(1, n, figsize=(3 * n, 3))
        for ax, s in zip(np.atleast_1d(axs), samples):
            ax.imshow(s[..., 0])
            ax.axis("off")
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(out_path)
        plt.close(fig)
    except Exception:  # pragma: no cover
        pass
