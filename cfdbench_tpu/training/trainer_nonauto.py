"""Non-autoregressive trainer (the ``train.py`` driver's engine).

Mirror of ``src/train.py``: training samples ``num_label_samples``
random lattice points per step (with replacement, like torch.randint —
``src/models/deeponet.py:170-191``) and regresses u at those points;
evaluation queries the full lattice via ``generate_one`` and scores
against the full u frame (``src/train.py:64-113``). Artifacts:
``ckpt-{ep}/{model, dev_loss.json, train_loss.json, scores.json}``
(note the reference's non-auto eval file is ``dev_loss.json``, not
``dev_scores.json``).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.datasets import FrameDataset
from ..data.pipeline import batches, device_prefetch, num_batches
from ..metrics import LossFn
from ..parallel.mesh import (
    batch_sharding,
    default_sharding_fn,
    replicated_sharding,
)
from ..utils.artifacts import dump_json, plot_loss
from . import checkpoints


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class NonAutoTask:
    """Couples an (case_params, t, query_xy) → (B,k) model with the
    reference's point-sampled loss semantics."""

    def __init__(self, model, loss_fn: LossFn, num_label_samples=1000):
        self.model = model
        self.loss_fn = loss_fn
        self.num_label_samples = num_label_samples

    def init_params(self, rng, sample_batch):
        return self.model.init(
            rng,
            sample_batch["case_params"],
            sample_batch["t"],
            jnp.zeros((4, 2), jnp.float32),
        )["params"]

    def loss_scores(self, params, batch, query_idxs):
        """query_idxs: (k, 2) int32 lattice points."""
        qxy = query_idxs.astype(jnp.float32)
        preds = self.model.apply(
            {"params": params}, batch["case_params"], batch["t"], qxy
        )
        labels_u = batch["labels"][..., 0]  # (B, H, W)
        labels = labels_u[:, query_idxs[:, 0], query_idxs[:, 1]]  # (B, k)
        scores = self.loss_fn(
            preds, labels, sample_weights=batch.get("weights")
        )
        return scores[self.loss_fn.objective], scores

    def generate_one(self, params, case_params, t, height, width):
        """Full-lattice frame generation → (B, H, W, 1)
        (``deeponet.py:225-257``)."""
        rows = jnp.repeat(jnp.arange(height, dtype=jnp.float32), width)
        cols = jnp.tile(jnp.arange(width, dtype=jnp.float32), height)
        qxy = jnp.stack([rows, cols], axis=-1)
        preds = self.model.apply(
            {"params": params}, case_params, t, qxy
        )
        return preds.reshape(-1, height, width, 1)


def make_train_step(task: NonAutoTask, tx, seed: int, grid_hw):
    H, W = grid_hw
    base_rng = jax.random.PRNGKey(seed + 777)
    k = task.num_label_samples

    def train_step(state: TrainState, batch):
        rng = jax.random.fold_in(base_rng, state.step)
        r1, r2 = jax.random.split(rng)
        query_idxs = jnp.stack(
            [
                jax.random.randint(r1, (k,), 0, H),
                jax.random.randint(r2, (k,), 0, W),
            ],
            axis=-1,
        )

        def lf(params):
            return task.loss_scores(params, batch, query_idxs)

        grads, scores = jax.grad(lf, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), scores

    return jax.jit(train_step, donate_argnums=0)


def make_eval_step(task: NonAutoTask, grid_hw):
    H, W = grid_hw

    def eval_step(params, batch):
        preds = task.generate_one(
            params, batch["case_params"], batch["t"], H, W
        )  # (B, H, W, 1)
        labels = batch["labels"][..., :1]  # u channel
        scores = task.loss_fn(
            preds, labels, sample_weights=batch.get("weights")
        )
        return scores, preds

    return jax.jit(eval_step)


def dataset_arrays(data: FrameDataset) -> Dict[str, np.ndarray]:
    return dict(
        case_params=data.case_params,
        t=data.frame_t[:, None],
        labels=data.frames,
    )


def evaluate(
    task: NonAutoTask,
    params,
    data: FrameDataset,
    output_dir: Path,
    batch_size: int = 64,
    eval_step=None,
    mesh=None,
    collect_preds: bool = False,
    measure_time: bool = False,
) -> Dict[str, Any]:
    H, W = data.field_shape
    if eval_step is None:
        eval_step = make_eval_step(task, (H, W))
    pad_mult = mesh.shape["data"] if mesh is not None else 1
    names = task.loss_fn.get_score_names()
    score_rows = []  # device (n_names,) vectors; one transfer at the end
    all_preds = []
    n_valids = []
    start = time.time()
    n_batches = 0
    for batch in batches(
        dataset_arrays(data), batch_size, shuffle=False,
        pad_multiple=pad_mult,
    ):
        n_valids.append(int(batch["weights"].sum()))
        if mesh is not None:
            batch = jax.device_put(batch, batch_sharding(mesh))
        s, preds = eval_step(params, batch)
        score_rows.append(jnp.stack([s[kk] for kk in names]))
        if collect_preds:
            all_preds.append(preds)
        n_batches += 1
    # Single device→host sync; empty split (no frames after filtering)
    # yields empty score lists instead of a stack([]) crash.
    mat = (
        np.asarray(jnp.stack(score_rows))
        if score_rows else np.zeros((0, len(names)))
    )
    if measure_time:
        dt = 1000 * (time.time() - start) / max(n_batches, 1)
        print(f"Time per step: {dt:.3f} ms")
    scores = {kk: mat[:, i].tolist() for i, kk in enumerate(names)}
    if collect_preds and all_preds:
        stacked = np.asarray(jnp.stack(all_preds))
        all_preds = [p[:nv] for p, nv in zip(stacked, n_valids)]
    avg = {kk: float(np.mean(v)) for kk, v in scores.items()}
    for kk, v in avg.items():
        print(f"{kk}: {v}")
    if "nmse" in scores:
        plot_loss(scores["nmse"], Path(output_dir) / "loss.png")
    result: Dict[str, Any] = dict(scores=dict(mean=avg, all=scores))
    if collect_preds:
        result["preds"] = np.concatenate(all_preds) if all_preds else None
    return result


def train(
    task: NonAutoTask,
    train_data: FrameDataset,
    dev_data: FrameDataset,
    output_dir: Path,
    num_epochs: int = 400,
    lr: float = 1e-3,
    lr_step_size: int = 1,
    lr_gamma: float = 0.9,
    batch_size: int = 64,
    log_interval: int = 50,
    eval_interval: int = 2,
    seed: int = 0,
    mesh=None,
    measure_time: bool = False,
    resume: bool = False,
) -> TrainState:
    """``resume=True`` continues from ``output_dir/training_state``
    (params / optimizer moments / step + epoch) when present — same
    full-state resume contract as the auto trainer (the reference's
    main trainers can only restart from scratch, SURVEY.md §5)."""
    from .optim import make_adam, step_lr_schedule

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    H, W = train_data.field_shape
    steps_per_epoch = num_batches(len(train_data), batch_size)
    tx = make_adam(
        lr, gamma=lr_gamma, lr_step_size=lr_step_size,
        steps_per_epoch=steps_per_epoch,
    )
    # Display-only; same function that drives the optimizer in
    # make_adam, so logs can't diverge from the applied lr.
    lr_schedule = step_lr_schedule(lr, lr_gamma, lr_step_size,
                                   steps_per_epoch)
    arrays = dataset_arrays(train_data)
    sample = next(iter(batches(arrays, batch_size, shuffle=False)))
    params = task.init_params(jax.random.PRNGKey(seed), sample)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    if mesh is not None:
        state = jax.device_put(state, replicated_sharding(mesh))

    from ..data.core import load_json

    start_epoch = 0
    meta_path = output_dir / "training_meta.json"
    resume_dir = output_dir / "training_state"
    if resume and meta_path.exists() and resume_dir.exists():
        meta = load_json(meta_path)
        restored = checkpoints.load_params(
            jax.device_get(state), resume_dir
        )
        state = (
            restored if isinstance(restored, TrainState)
            else TrainState(*restored)
        )
        if mesh is not None:
            state = jax.device_put(state, replicated_sharding(mesh))
        start_epoch = meta["epoch"] + 1
        print(f"Resumed from epoch {meta['epoch']}")

    # Restore the loss history so a resumed run's final
    # train_losses.json keeps the pre-resume epochs (checkpointed in
    # the eval block below; the artifact layout is an API). Truncated
    # to the committed epoch: a completed run's final dump contains
    # epochs past the last snapshot, which are about to be retrained.
    losses_path = output_dir / "train_losses.json"
    train_losses_resumed = (
        load_json(losses_path)
        if start_epoch > 0 and losses_path.exists() else []
    )[: start_epoch * steps_per_epoch]

    train_step = make_train_step(task, tx, seed, (H, W))
    eval_step = make_eval_step(task, (H, W))

    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"Model has {n_params} parameters")
    print("==== Training ====")
    print(f"# lr: {lr}")
    print(f"# batch: {batch_size}")
    print(f"# examples: {len(train_data)}")
    print(f"# step: {steps_per_epoch}")
    print(f"# epoch: {num_epochs}")

    start_time = time.time()
    global_step = start_epoch * steps_per_epoch
    all_train_losses = list(train_losses_resumed)
    objective = task.loss_fn.objective

    sharding_fn = default_sharding_fn(mesh)
    for ep in range(start_epoch, num_epochs):
        ep_start = time.time()
        # Device-side losses + prefetched batches: a float() here would
        # sync the host every step (~28 ms on a tunneled backend).
        ep_losses_dev = []
        rng = np.random.default_rng(seed * 999_983 + ep)
        for batch in device_prefetch(
            batches(
                arrays, batch_size, shuffle=True, rng=rng,
                pad_multiple=(
                    mesh.shape["data"] if mesh is not None else 1
                ),
            ),
            size=2,
            sharding_fn=sharding_fn,
        ):
            state, scores = train_step(state, batch)
            ep_losses_dev.append(scores[objective])
            global_step += 1
            if global_step % log_interval == 0 and not measure_time:
                print(
                    dict(
                        ep=ep,
                        step=global_step,
                        loss=f"{float(scores[objective]):.3e}",
                        lr=f"{lr_schedule(global_step - 1):.3e}",
                        time=round(time.time() - start_time),
                    )
                )
        ep_losses = (
            np.asarray(jnp.stack(ep_losses_dev)).tolist()
            if ep_losses_dev else []
        )
        if measure_time:
            from ..utils.timing import force_completion

            force_completion(state.params)
            print("Time usage:")
            print(time.time() - ep_start)
            return state

        if (ep + 1) % eval_interval == 0:
            ckpt_dir = output_dir / f"ckpt-{ep}"
            ckpt_dir.mkdir(parents=True, exist_ok=True)
            result = evaluate(
                task, state.params, dev_data, ckpt_dir,
                eval_step=eval_step, mesh=mesh,
            )
            dev_scores = result["scores"]
            dump_json(dev_scores, ckpt_dir / "dev_loss.json")
            dump_json(ep_losses, ckpt_dir / "train_loss.json")
            checkpoints.save_params({"params": state.params}, ckpt_dir)
            dev_key = "nmse" if "nmse" in dev_scores["mean"] else objective
            checkpoints.save_epoch_scores(
                ckpt_dir,
                ep=ep,
                train_loss=float(np.mean(ep_losses)),
                dev_loss=float(dev_scores["mean"][dev_key]),
                time_s=time.time() - ep_start,
            )
            # Full-state snapshot for --resume (params + optimizer
            # moments + step).
            checkpoints.save_params(
                jax.device_get(state), output_dir / "training_state"
            )
            # Loss history checkpoint for --resume (this epoch's
            # losses are appended below, so include them here). Losses
            # BEFORE meta: training_meta.json is the resume commit
            # record, so a kill between the two writes must leave the
            # history at-or-ahead of the commit point, never behind it
            # (resume truncates any overshoot).
            dump_json(
                all_train_losses + ep_losses,
                output_dir / "train_losses.json",
            )
            dump_json(
                dict(epoch=ep, global_step=global_step),
                output_dir / "training_meta.json",
            )
        all_train_losses += ep_losses
    dump_json(all_train_losses, output_dir / "train_losses.json")
    plot_loss(all_train_losses, output_dir / "train_losses.png")
    return state


def test(
    task: NonAutoTask,
    params,
    data: FrameDataset,
    output_dir: Path,
    batch_size: int = 1,
    mesh=None,
    measure_time: bool = False,
) -> None:
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    result = evaluate(
        task, params, data, output_dir,
        batch_size=batch_size, mesh=mesh,
        collect_preds=True, measure_time=measure_time,
    )
    preds = result.get("preds")
    if preds is not None:
        np.save(output_dir / "preds.npy", preds)
        # Plot u-channel predictions vs labels at intervals (reference
        # non-auto eval plots predictions, src/train.py:76-80).
        from ..utils.artifacts import plot_predictions

        H, W = data.field_shape
        for i in range(0, preds.shape[0], max(1, preds.shape[0] // 5)):
            plot_predictions(
                inp=None,
                label=np.asarray(data.frames[i, ..., 0]),
                pred=np.asarray(preds[i]).reshape(H, W),
                out_dir=output_dir / "images",
                step=i,
            )
    dump_json(result["scores"], output_dir / "scores.json")
