"""VAE trainer (mirror of ``src/train_vae.py`` /
``train_vae_kl_annealing.py``).

Loop shape: recon MSE + kl_weight · posterior.kl().mean(); training
samples the posterior, validation uses its mean; ReduceLROnPlateau on
val loss; early stopping (patience/delta); best weights saved to
``ldm_vae_weights_path``; loss-history JSON + plots. Optional linear
KL-weight annealing over ``vae_kl_annealing_epochs``.
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
from ..data.vae_data import VaeDataset
from ..models.vae import AutoencoderKL
from ..parallel.mesh import batch_sharding, default_sharding_fn
from ..utils.artifacts import dump_json, plot_loss
from . import checkpoints


class VaeState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _wmean(per_sample, w):
    """Mean over valid (weight-1) samples — padded rows excluded."""
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def make_steps(vae: AutoencoderKL, tx, seed: int):
    base_rng = jax.random.PRNGKey(seed + 31337)

    def loss_parts(params, frames, w, kl_weight, rng, train):
        recon, posterior = vae.apply(
            {"params": params}, frames, rng=rng, train=train
        )
        per_recon = jnp.mean(jnp.square(recon - frames), axis=(1, 2, 3))
        recon_loss = _wmean(per_recon, w)
        kl_loss = _wmean(posterior.kl(), w)
        return recon_loss + kl_weight * kl_loss, (recon_loss, kl_loss)

    # Donate the carried state (params + Adam moments) — in-place
    # update instead of double-buffering, like the other trainers.
    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(state: VaeState, frames, w, kl_weight):
        rng = jax.random.fold_in(base_rng, state.step)

        def lf(params):
            return loss_parts(params, frames, w, kl_weight, rng, True)

        (loss, (recon, kl)), grads = jax.value_and_grad(
            lf, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            VaeState(params, opt_state, state.step + 1),
            dict(total=loss, recon=recon, kl=kl),
        )

    @jax.jit
    def eval_step(params, frames, w, kl_weight):
        # mean latent, like the reference's validation pass
        loss, (recon_loss, kl_loss) = loss_parts(
            params, frames, w, kl_weight, None, False
        )
        return dict(total=loss, recon=recon_loss, kl=kl_loss)

    return train_step, eval_step


def train_vae(
    vae: AutoencoderKL,
    train_data: VaeDataset,
    dev_data: VaeDataset,
    output_dir: Path,
    weights_path: Path,
    num_epochs: int = 100,
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    batch_size: int = 8,
    kl_weight: float = 1e-4,
    kl_annealing_epochs: int = 0,
    lr_factor: float = 0.5,
    lr_patience: int = 5,
    early_stopping_patience: int = 20,
    early_stopping_delta: float = 1e-5,
    seed: int = 0,
    mesh=None,
    resume: bool = False,
) -> Any:
    """``resume=True`` continues from ``output_dir/training_state``
    (params + optimizer incl. the plateau-reduced lr + step) and
    ``training_meta.json`` (epoch, best-val, patience counters,
    history). The reference's VAE loop restarts from scratch
    (``src/train_vae.py``); resume here matches this repo's other
    trainers."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    pad_mult = mesh.shape["data"] if mesh is not None else 1

    def put(batch):
        if mesh is not None:
            return jax.device_put(batch, batch_sharding(mesh))
        return batch
    if weight_decay > 0:
        inner = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=weight_decay
        )
    else:
        inner = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    tx = inner

    sample = jnp.asarray(train_data.frames[:2])
    params = dict(
        vae.init(jax.random.PRNGKey(seed), sample, rng=None)
    )["params"]
    if mesh is not None:
        from ..parallel.sharding_rules import shard_params

        params = shard_params(params, mesh)
    state = VaeState(params, tx.init(params), jnp.zeros((), jnp.int32))
    train_step, eval_step = make_steps(vae, tx, seed)

    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"VAE has {n_params} parameters")

    history = {
        "train_total": [], "train_recon": [], "train_kl": [],
        "val_total": [], "val_recon": [], "val_kl": [], "val_steps": [],
    }
    best_val = np.inf
    # Host copy, not an alias: the donated train step invalidates the
    # initial device buffers on its first call, and a run whose
    # validation never improves (e.g. NaN divergence) returns this.
    best_params = jax.device_get(params)
    patience = 0
    plateau = 0
    cur_lr = lr
    start = time.time()
    global_step = 0
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
            restored if isinstance(restored, VaeState)
            else VaeState(*restored)
        )
        if state_shardings is not None:
            state = jax.device_put(state, state_shardings)
        start_epoch = meta["epoch"] + 1
        best_val = meta["best_val"]
        patience = meta["patience"]
        plateau = meta["plateau"]
        cur_lr = meta["cur_lr"]
        global_step = meta["global_step"]
        history = meta["history"]
        if Path(weights_path).exists():
            best_params = dict(
                checkpoints.load_params(
                    {"params": jax.device_get(state.params)},
                    Path(weights_path),
                )
            )["params"]
        print(f"Resumed from epoch {meta['epoch']}")

    for ep in range(start_epoch, num_epochs):
        if kl_annealing_epochs > 0:
            w = kl_weight * min(1.0, (ep + 1) / kl_annealing_epochs)
        else:
            w = kl_weight
        rng = np.random.default_rng(seed * 7919 + ep)
        # Prefetched batches + device-side per-step losses (a float()
        # here would host-sync every step); one transfer per epoch.
        ep_losses_dev = []
        for batch in device_prefetch(
            batches(
                dict(frames=train_data.frames), batch_size,
                shuffle=True, rng=rng, pad_multiple=pad_mult,
            ),
            size=2,
            sharding_fn=default_sharding_fn(mesh),
        ):
            state, losses = train_step(
                state, batch["frames"], batch["weights"], w
            )
            ep_losses_dev.append(
                jnp.stack([losses[k] for k in ("total", "recon", "kl")])
            )
            global_step += 1
        if ep_losses_dev:
            ep_mat = np.asarray(jnp.stack(ep_losses_dev))
            for j, k in enumerate(("total", "recon", "kl")):
                history[f"train_{k}"] += ep_mat[:, j].tolist()

        # validation (mean latent) — per-batch losses stay on device,
        # one stacked transfer after the loop (host syncs cost ~28 ms
        # on this backend; see trainer_auto.evaluate).
        val_rows = []
        for batch in batches(
            dict(frames=dev_data.frames), batch_size, shuffle=False,
            pad_multiple=pad_mult,
        ):
            batch = put(batch)
            losses = eval_step(
                state.params, batch["frames"], batch["weights"], w
            )
            val_rows.append(
                jnp.stack([losses[k] for k in ("total", "recon", "kl")])
            )
        val_mat = (
            np.asarray(jnp.stack(val_rows))
            if val_rows else np.zeros((0, 3))
        )  # (B, 3)
        vals = {
            k: val_mat[:, j]
            for j, k in enumerate(("total", "recon", "kl"))
        }
        val_total = float(np.mean(vals["total"]))
        for k in vals:
            history[f"val_{k}"].append(float(np.mean(vals[k])))
        history["val_steps"].append(global_step)
        print(
            f"ep {ep}: val_total={val_total:.6f} "
            f"val_recon={np.mean(vals['recon']):.6f} "
            f"val_kl={np.mean(vals['kl']):.4f} lr={cur_lr:.2e} "
            f"kl_w={w:.2e} time={time.time() - start:.0f}s"
        )

        if val_total < best_val - early_stopping_delta:
            best_val = val_total
            best_params = jax.device_get(state.params)
            patience = 0
            plateau = 0
            checkpoints.save_params({"params": best_params}, weights_path)
            print(f"  new best; weights saved to {weights_path}")
        else:
            patience += 1
            plateau += 1
            if plateau > lr_patience:
                cur_lr *= lr_factor
                state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
                    cur_lr
                )
                plateau = 0
                print(f"  plateau: lr reduced to {cur_lr:.2e}")
        # Full-state snapshot for --resume (params + opt incl. the
        # plateau-reduced lr inside inject_hyperparams + step).
        checkpoints.save_params(jax.device_get(state), resume_dir)
        dump_json(
            dict(
                epoch=ep, best_val=float(best_val), patience=patience,
                plateau=plateau, cur_lr=cur_lr,
                global_step=global_step, history=history,
            ),
            meta_path,
        )
        if patience > early_stopping_patience:
            print("Early stopping.")
            break

    dump_json(history, output_dir / "loss_history.json")
    plot_loss(history["train_total"], output_dir / "train_loss.png")
    plot_loss(history["val_total"], output_dir / "val_loss.png")
    return best_params
