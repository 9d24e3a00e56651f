"""Autoregressive trainer (the ``train_auto.py`` driver's engine).

Behavioral mirror of ``src/train_auto.py`` with TPU-native mechanics:
- one jitted, donated train step (forward+backward+Adam update fused by
  XLA) instead of per-op dispatch,
- statically shaped padded batches with 0/1 sample weights (bit-exact
  metrics, no retracing),
- batches sharded over the mesh's data axis; params replicated,
- evaluate() computes both prediction scores and the input-as-prediction
  persistence baseline per batch (``src/train_auto.py:92-97, 132-139``),
- artifacts: ``ckpt-{ep}/{model, dev_scores.json, train_loss.json,
  scores.json}``, final ``train_losses.json`` (+ png curves).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.datasets import AutoDataset
from ..data.pipeline import batches, device_prefetch, num_batches
from ..metrics import LossFn
from ..parallel.mesh import (
    batch_sharding,
    batch_sharding_spatial,
    default_sharding_fn,
    replicated_sharding,
)
from ..utils.artifacts import (
    dump_json,
    plot_example,
    plot_loss,
    plot_predictions,
)
from ..utils.rng import fast_train_key
from ..utils.timing import force_completion
from . import checkpoints


class TrainState(NamedTuple):
    params: Any       # trainable variables
    model_state: Any  # non-trainable collections (e.g. BatchNorm stats)
    opt_state: Any
    step: jnp.ndarray


class AutoTask:
    """Couples a model with loss semantics for its family.

    Field models (fno/unet/resnet): model returns masked (B,H,W,C)
    preds; loss against mask-multiplied labels over all channels.
    Point models (auto_ffn / auto_deeponet / auto_edeeponet /
    auto_deeponet_cnn): model returns flat (B, H*W) u-channel preds at
    the full query lattice; loss against flattened u labels (unmasked)
    — matching e.g. ``src/models/auto_deeponet.py:108-144``.
    """

    generative = False  # diffusion tasks override: eval generates frames

    def __init__(self, model, loss_fn: LossFn, compute_dtype=None):
        """``compute_dtype=jnp.bfloat16`` enables true mixed precision:
        the forward/backward runs with bf16 params + activations
        (halving HBM activation traffic — the wide-model bottleneck,
        BASELINE.md MFU table) while master params, optimizer state,
        labels and the loss stay f32. grad-of-cast accumulates back to
        f32, so no loss scaling is needed with bf16's f32-sized
        exponent. This is the real implementation of the reference's
        AMP flag (``--use_mixed_precision``)."""
        self.model = model
        self.loss_fn = loss_fn
        self.pointwise = getattr(model, "pointwise", False)
        self.compute_dtype = compute_dtype

    def _cast(self, tree):
        if self.compute_dtype is None:
            return tree
        dt = self.compute_dtype
        return jax.tree.map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    def init_variables(self, rng, sample_batch):
        """Returns (params, model_state) where model_state holds
        non-trainable collections (BatchNorm running stats)."""
        variables = dict(
            self.model.init(
                rng,
                sample_batch["inputs"],
                sample_batch["case_params"],
                sample_batch["mask"],
            )
        )
        params = variables.pop("params")
        return params, variables

    # Back-compat convenience: full variables dict for apply().
    def init_params(self, rng, sample_batch) -> Any:
        params, model_state = self.init_variables(rng, sample_batch)
        return {"params": params, **model_state}

    def _forward(self, params, model_state, batch, train, rng):
        # Mixed precision applies to the TRAIN forward/backward only;
        # eval stays f32 (the documented --use_mixed_precision
        # contract: bf16 fwd/bwd, f32 master weights/loss/eval).
        if self.compute_dtype is not None and train:
            params = self._cast(params)
            batch = dict(
                batch,
                inputs=self._cast(batch["inputs"]),
                case_params=self._cast(batch["case_params"]),
                mask=self._cast(batch["mask"]),
            )
        variables = {"params": params, **model_state}
        kwargs = {}
        if rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        if train:
            preds, new_state = self.model.apply(
                variables,
                batch["inputs"],
                batch["case_params"],
                batch["mask"],
                train=True,
                mutable=list(model_state.keys()) or ["batch_stats"],
                **kwargs,
            )
        else:
            preds = self.model.apply(
                variables,
                batch["inputs"],
                batch["case_params"],
                batch["mask"],
                train=False,
            )
            new_state = model_state
        return preds, dict(new_state)

    def loss_scores(
        self, params, batch, model_state=None, train=False, rng=None
    ):
        preds, new_state = self._forward(
            params, model_state or {}, batch, train, rng
        )
        # Loss/metrics always in f32 (labels are untouched f32).
        preds = preds.astype(jnp.float32)
        w = batch.get("weights")
        if self.pointwise:
            b = batch["labels"].shape[0]
            labels = batch["labels"][..., 0].reshape(b, -1)
        else:
            labels = batch["labels"] * batch["mask"]
        scores = self.loss_fn(preds, labels, sample_weights=w)
        return scores[self.loss_fn.objective], (scores, new_state)

    def predict_frame(
        self, params, inputs, case_params, mask, model_state=None
    ):
        """Full-field next-frame prediction (for rollout / generate).
        Eval mode (running BN stats, no dropout)."""
        variables = {"params": params, **(model_state or {})}
        preds = self.model.apply(
            variables, inputs, case_params, mask, train=False
        )
        if self.pointwise:
            b, h, w = inputs.shape[0], inputs.shape[1], inputs.shape[2]
            preds = preds.reshape(b, h, w, 1)
        return preds

    @property
    def feedback_channels(self) -> int:
        """Channels carried through the rollout. DeepONet-family models
        feed back their 1-channel u prediction (reference quirk,
        SURVEY.md §2.3)."""
        return 1 if self.pointwise else self.model.out_chan


def make_train_step(
    task: AutoTask, tx: optax.GradientTransformation, seed: int = 0
):
    # RBG-impl key: hardware-accelerated random bits for the dropout
    # streams of the diffusion models (utils/rng.py); models without
    # dropout never consume it.
    base_rng = fast_train_key(seed)

    def train_step(state: TrainState, batch):
        rng = jax.random.fold_in(base_rng, state.step)

        def lf(params):
            return task.loss_scores(
                params, batch, model_state=state.model_state,
                train=True, rng=rng,
            )

        grads, (scores, model_state) = jax.grad(lf, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, model_state, opt_state, state.step + 1),
            scores,
        )

    return jax.jit(train_step, donate_argnums=0)


def make_pp_train_step(
    task: AutoTask,
    tx: optax.GradientTransformation,
    mesh,
    n_micro: int,
    prestacked: bool = False,
):
    """Training step whose forward runs pipeline-parallel over the
    mesh's model axis (``parallel.pipeline.make_pipelined_fno_forward``
    — GPipe microbatching, dp × pp). The gradient flows through the
    whole pipeline (scan + ppermute are differentiable), so updates
    equal the single-device ones exactly (tests/test_parallel.py).

    ``prestacked=False``: ``state.params`` is the standard flax tree,
    restacked inside every step (simple, layout-free — what the parity
    tests exercise against the single-device step). ``prestacked=True``
    is the trainer's steady-state path: ``state.params`` (and hence the
    optimizer state from ``tx.init``) live in the
    ``parallel.pipeline.pp_pack_params`` layout, stage blocks sharded
    1/S over the model axis — no per-step restack copy, and each chip
    holds only its own stages' params + Adam moments. Checkpoints are
    unpacked back to the standard tree, so the on-disk format is
    identical either way. FNO only (the only benchmark model deep
    enough to stage); mixed precision follows ``task.compute_dtype``.
    """
    from ..models.fno import Fno2d
    from ..parallel.pipeline import make_pipelined_fno_forward

    assert isinstance(task.model, Fno2d), (
        "--pp_microbatches supports --model fno (the staged-depth "
        f"model); got {type(task.model).__name__}"
    )
    fwd = make_pipelined_fno_forward(
        task.model, mesh, n_micro=n_micro, prestacked=prestacked
    )

    def train_step(state: TrainState, batch):
        def lf(params):
            b = batch
            if task.compute_dtype is not None:
                params = task._cast(params)
                b = dict(
                    b,
                    inputs=task._cast(b["inputs"]),
                    case_params=task._cast(b["case_params"]),
                    mask=task._cast(b["mask"]),
                )
            preds = fwd(
                params, b["inputs"], b["case_params"], b["mask"]
            ).astype(jnp.float32)
            labels = batch["labels"] * batch["mask"]
            scores = task.loss_fn(
                preds, labels, sample_weights=batch.get("weights")
            )
            return scores[task.loss_fn.objective], scores

        grads, scores = jax.grad(lf, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                params, state.model_state, opt_state, state.step + 1
            ),
            scores,
        )

    return jax.jit(train_step, donate_argnums=0)


def make_eval_step(task: AutoTask, with_preds: bool = True):
    """``with_preds=False`` skips the frame prediction (expensive for
    diffusion tasks, whose predict_frame is a full DDPM sampling loop;
    the reference's training-time eval also only computes the loss)."""

    def eval_step(params, model_state, batch):
        _, (scores, _) = task.loss_scores(
            params, batch, model_state=model_state, train=False
        )
        # Persistence baseline: input u as prediction of label u,
        # unmasked (src/train_auto.py:92-97).
        input_scores = task.loss_fn(
            batch["inputs"][..., :1],
            batch["labels"][..., :1],
            sample_weights=batch.get("weights"),
        )
        if with_preds:
            preds = task.predict_frame(
                params,
                batch["inputs"],
                batch["case_params"],
                batch["mask"],
                model_state=model_state,
            )
        else:
            preds = jnp.zeros((), jnp.float32)
        return scores, input_scores, preds

    return jax.jit(eval_step)


def make_gen_eval_step(task):
    """Generate-and-score eval for diffusion tasks: DDPM-sample the next
    frame and score masked frame metrics against the label (reference
    ``evaluate_ldm``, ``src/train_ldm.py:21-59``: mse of ``gen*mask`` vs
    ``label*mask``, nmse normalized by the masked label), plus a masked
    persistence baseline (``src/train_gencast.py:176-180``)."""

    def gen_eval_step(params, model_state, batch):
        frame = task.predict_frame(
            params,
            batch["inputs"],
            batch["case_params"],
            batch["mask"],
            model_state=model_state,
        )
        oc = frame.shape[-1]
        w = batch.get("weights")
        labels = batch["labels"][..., :oc] * batch["mask"]
        scores = task.loss_fn(
            frame * batch["mask"], labels, sample_weights=w
        )
        input_scores = task.loss_fn(
            batch["inputs"][..., :oc] * batch["mask"], labels,
            sample_weights=w,
        )
        return scores, input_scores, frame

    return jax.jit(gen_eval_step)


def dataset_arrays(data: AutoDataset) -> Dict[str, np.ndarray]:
    return dict(
        inputs=data.inputs,
        labels=data.labels,
        mask=data.masks,
        case_params=data.case_params,
    )


def evaluate(
    task: AutoTask,
    params,
    data: AutoDataset,
    output_dir: Path,
    model_state=None,
    batch_size: int = 2,
    plot_interval: Optional[int] = None,
    eval_step=None,
    mesh=None,
    collect_preds: bool = True,
    measure_time: bool = False,
    max_eval_batches: Optional[int] = None,
    spatial: bool = False,
) -> Dict[str, Any]:
    """Mirror of ``src/train_auto.py:61-148``: per-batch score lists,
    means over batches, optional prediction collection and plots.

    Diffusion tasks (``task.generative``) are scored on the *generated
    frame* (masked MSE/NMSE vs label, reference ``evaluate_ldm``), not
    on the noise-prediction loss. ``max_eval_batches`` caps the number
    of eval batches (the reference caps diffusion eval at 50/100,
    ``src/train_ldm2.py:26``, ``src/train_gencast.py:144``).

    Per-batch scores stay on device; one transfer at the end (the
    per-batch host sync costs ~28 ms each on the tunneled backend).
    """
    generative = getattr(task, "generative", False)
    keep_preds = collect_preds or bool(plot_interval)
    if eval_step is None:
        if generative:
            eval_step = make_gen_eval_step(task)
        else:
            eval_step = make_eval_step(task, with_preds=keep_preds)
    pad_mult = mesh.shape["data"] if mesh is not None else 1
    names = task.loss_fn.get_score_names()
    score_rows = []  # device (2, n_names) stacks: [pred, input-baseline]
    all_preds = []
    n_valids = []
    plot_panels = {}  # step -> (input_u, label_u) host slices
    start = time.time()
    n_batches = 0
    for step, batch in enumerate(
        batches(
            dataset_arrays(data), batch_size, shuffle=False,
            pad_multiple=pad_mult,
        )
    ):
        if max_eval_batches is not None and step >= max_eval_batches:
            break
        n_valids.append(int(batch["weights"].sum()))
        if plot_interval and step % plot_interval == 0:
            plot_panels[step] = (
                batch["inputs"][0, ..., 0].copy(),
                batch["labels"][0, ..., 0].copy(),
            )
        if mesh is not None:
            batch = jax.device_put(
                batch,
                batch_sharding_spatial(mesh, batch)
                if spatial else batch_sharding(mesh),
            )
        s, isc, preds = eval_step(params, model_state or {}, batch)
        score_rows.append(
            jnp.stack(
                [
                    jnp.stack([s[k] for k in names]),
                    jnp.stack([isc[k] for k in names]),
                ]
            )
        )
        if keep_preds and preds.ndim > 0:
            # Only hold/transfer generated frames when a consumer exists
            # (collect_preds or plotting) — the generative eval_step
            # always returns them.
            all_preds.append(preds)
        n_batches += 1
    # Single device→host transfer for every batch's scores.
    if score_rows:
        mat = np.asarray(jnp.stack(score_rows))  # (n_batches, 2, n_names)
    else:
        mat = np.zeros((0, 2, len(names)))
    if measure_time:
        dt = 1000 * (time.time() - start) / max(n_batches, 1)
        print(f"Time (ms) per step: {dt:.3f}")

    scores = {k: mat[:, 0, i].tolist() for i, k in enumerate(names)}
    input_scores = {k: mat[:, 1, i].tolist() for i, k in enumerate(names)}
    preds_host = None
    if all_preds:
        # One stacked transfer, then unpad per batch.
        stacked = np.asarray(jnp.stack(all_preds))
        preds_host = np.concatenate(
            [p[:nv] for p, nv in zip(stacked, n_valids)]
        )
    if (
        plot_interval
        and preds_host is not None
        and not task.pointwise
        and not measure_time
    ):
        offsets = np.cumsum([0] + n_valids)
        for step, (inp_u, label_u) in plot_panels.items():
            plot_predictions(
                inp=inp_u,
                label=label_u,
                pred=preds_host[offsets[step], ..., 0],
                out_dir=Path(output_dir) / "images",
                step=step,
            )

    avg_scores = {}
    for k in names:
        avg_scores[k] = float(np.mean(scores[k]))
        avg_scores[f"input_{k}"] = float(np.mean(input_scores[k]))
    result: Dict[str, Any] = dict(
        scores=dict(mean=avg_scores, all=scores),
    )
    if collect_preds:
        result["preds"] = preds_host
    if "nmse" in scores:
        plot_loss(scores["nmse"], Path(output_dir) / "loss.png")
    return result


def train(
    task: AutoTask,
    train_data: AutoDataset,
    dev_data: AutoDataset,
    output_dir: Path,
    num_epochs: int = 400,
    lr: float = 1e-3,
    lr_step_size: int = 1,
    lr_gamma: float = 0.9,
    batch_size: int = 2,
    eval_batch_size: int = 2,
    log_interval: int = 10,
    eval_interval: int = 2,
    seed: int = 0,
    mesh=None,
    measure_time: bool = False,
    eval_max_batches: Optional[int] = None,
    plot_examples: bool = False,
    resume: bool = False,
    spatial: bool = False,
    pp_microbatches: int = 0,
    opt_state: str = "f32",
) -> TrainState:
    """``resume=True`` continues from ``output_dir/training_state``
    (params / BN stats / optimizer moments / step + epoch) when
    present. The reference's main trainers can only restart from
    scratch (SURVEY.md §5 failure recovery — only its GenCast trainer
    resumes); here every eval epoch snapshots the full state."""
    from .optim import make_adam, step_lr_schedule

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    steps_per_epoch = num_batches(len(train_data), batch_size)
    tx = make_adam(
        lr,
        gamma=lr_gamma,
        lr_step_size=lr_step_size,
        steps_per_epoch=steps_per_epoch,
        opt_state=opt_state,
    )
    # Display-only; same function that drives the optimizer in
    # make_adam, so logs can't diverge from the applied lr.
    lr_schedule = step_lr_schedule(lr, lr_gamma, lr_step_size,
                                   steps_per_epoch)

    arrays = dataset_arrays(train_data)
    sample = next(iter(batches(arrays, batch_size, shuffle=False)))
    params, model_state = task.init_variables(
        jax.random.PRNGKey(seed), sample
    )
    use_pp = bool(
        pp_microbatches
        and mesh is not None
        and mesh.shape.get("model", 1) > 1
    )
    if pp_microbatches and not use_pp:
        # The flag convention here is "mistakes are loud, never silent
        # fallbacks" (config.py boolean-literal parsing): a requested
        # pipeline run must not quietly train plain-DP because the mesh
        # has no model axis to split stages over.
        raise ValueError(
            f"--pp_microbatches {pp_microbatches} requires a mesh with "
            f"a model axis > 1 (got "
            f"{dict(mesh.shape) if mesh is not None else None}); pass "
            "--mesh_shape NxM with M > 1, or drop --pp_microbatches"
        )
    if use_pp:
        # Validate up front, before pp_pack_params touches the tree —
        # otherwise an unsupported model dies on an opaque
        # AttributeError/KeyError instead of naming the mistake.
        from ..models.fno import Fno2d

        if not isinstance(task.model, Fno2d):
            raise ValueError(
                "--pp_microbatches supports --model fno (the "
                f"staged-depth model); got {type(task.model).__name__}"
            )
        if opt_state == "factored":
            raise ValueError(
                "--opt_state_dtype factored is not supported with "
                "pipeline parallelism: adafactor keeps per-tensor "
                "statistics, which over the packed (stages, per, ...) "
                "stage leaves would diverge from the single-device "
                "update; use f32 or bf16"
            )
    if mesh is not None:
        if use_pp:
            # pp steady-state layout: stage blocks packed once
            # (pp_pack_params) and sharded 1/S over the model axis —
            # no per-step restack copy, and tx.init below places the
            # optimizer moments on the same 1/S shards. Eval/ckpt
            # paths unpack back to the standard tree (std_params).
            from ..parallel.pipeline import (
                pp_pack_params,
                pp_param_shardings,
            )

            params = pp_pack_params(
                params, mesh.shape["model"], task.model.num_layers
            )
            params = jax.device_put(
                params, pp_param_shardings(mesh, params)
            )
        else:
            # TP: large weight matrices sharded over the model axis
            # (no-op on a 1-wide model axis); optimizer state inherits
            # shardings.
            from ..parallel.sharding_rules import shard_params

            params = shard_params(params, mesh)
        model_state = jax.device_put(
            model_state, replicated_sharding(mesh)
        )
    opt_state = tx.init(params)
    state = TrainState(
        params, model_state, opt_state,
        jnp.zeros((), jnp.int32)
    )
    if mesh is not None:
        state = state._replace(
            step=jax.device_put(state.step, replicated_sharding(mesh))
        )

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
        template = jax.device_get(state)
        if use_pp:
            # On disk the snapshot is in the STANDARD layout (see the
            # save block): layout-free, so it resumes across a
            # different model-axis size and accepts snapshots taken
            # before the packed layout existed. Convert the live packed
            # template to match, restore, then repack.
            from ..parallel.pipeline import (
                pp_state_from_std,
                pp_state_to_std,
            )

            std_template = pp_state_to_std(
                template, template.params, task.model.num_layers
            )
            restored = checkpoints.load_params(std_template, resume_dir)
            restored = (
                restored if isinstance(restored, TrainState)
                else TrainState(*restored)
            )
            state = pp_state_from_std(
                restored, std_template.params,
                mesh.shape["model"], task.model.num_layers,
            )
        else:
            restored = checkpoints.load_params(template, resume_dir)
            state = (
                restored if isinstance(restored, TrainState)
                else TrainState(*restored)
            )
        if state_shardings is not None:
            state = jax.device_put(state, state_shardings)
        start_epoch = meta["epoch"] + 1
        global_step_resumed = meta.get("global_step", 0)
        # The running loss history is checkpointed alongside the
        # training state; without this, a resumed run's final
        # train_losses.json would silently drop every pre-resume epoch
        # (the result-dir layout is an API — see module docstring).
        losses_path = output_dir / "train_losses.json"
        train_losses_resumed = (
            load_json(losses_path) if losses_path.exists() else []
        )
        # Truncate to the committed epoch: a completed run's final dump
        # contains epochs past the last training_state snapshot, and
        # those epochs are about to be retrained — keeping their
        # entries would duplicate them in the final history.
        train_losses_resumed = train_losses_resumed[
            : start_epoch * steps_per_epoch
        ]
        print(f"Resumed from epoch {meta['epoch']}")
    else:
        global_step_resumed = 0
        train_losses_resumed = []

    if use_pp:
        print(
            f"pp: {mesh.shape['model']} stages x "
            f"{pp_microbatches} microbatches (+{mesh.shape['data']}-way dp)"
        )
        train_step = make_pp_train_step(
            task, tx, mesh, n_micro=pp_microbatches, prestacked=True
        )
        from ..parallel.pipeline import pp_unpack_params

        _unpack = jax.jit(
            lambda p: pp_unpack_params(p, task.model.num_layers)
        )

        def std_params(p):
            # Standard flax tree, replicated — for eval / example
            # plots / ckpt-{ep} saves / the returned state. One S-way
            # gather per eval interval, nothing per step.
            return jax.device_put(_unpack(p), replicated_sharding(mesh))
    else:
        train_step = make_train_step(task, tx, seed=seed)

        def std_params(p):
            return p
    if getattr(task, "generative", False):
        # Diffusion dev eval generates frames and scores them (masked
        # frame MSE/NMSE, reference evaluate_ldm) — cap the batches.
        eval_step = make_gen_eval_step(task)
    else:
        eval_step = make_eval_step(task, with_preds=False)
    predict_fn = None
    if plot_examples:
        predict_fn = jax.jit(
            lambda p, st, b: task.predict_frame(
                p, b["inputs"], b["case_params"], b["mask"],
                model_state=st,
            )
        )

    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"Model has {n_params} parameters")
    print("====== Training ======")
    print(f"# batch: {batch_size}")
    print(f"# examples: {len(train_data)}")
    print(f"# step: {steps_per_epoch}")
    print(f"# epoch: {num_epochs}")

    start_time = time.time()
    global_step = global_step_resumed
    train_losses = list(train_losses_resumed)
    objective = task.loss_fn.objective

    sharding_fn = default_sharding_fn(mesh, spatial=spatial)

    for ep in range(start_epoch, num_epochs):
        ep_start = time.time()
        # Per-step losses stay on device (a float() here would sync the
        # host every step — ~28 ms on a tunneled backend — and stall
        # the dispatch pipeline); one stacked transfer per epoch.
        ep_losses_dev = []
        rng = np.random.default_rng(seed * 1_000_003 + ep)
        # pp divides each data shard into n_micro microbatches, so
        # padded batches must be divisible by data*n_micro (the 0/1
        # sample weights keep metrics exact).
        pad_mult = mesh.shape["data"] if mesh is not None else 1
        if use_pp:
            pad_mult *= pp_microbatches
        for step, batch in enumerate(
            device_prefetch(
                batches(
                    arrays, batch_size, shuffle=True, rng=rng,
                    pad_multiple=pad_mult,
                ),
                size=2,
                sharding_fn=sharding_fn,
            )
        ):
            state, scores = train_step(state, batch)
            ep_losses_dev.append(scores[objective])
            global_step += 1
            if global_step % log_interval == 0:
                info = dict(
                    ep=ep,
                    step=step,
                    mse=f"{float(scores['mse']):.3e}",
                    **{
                        objective: f"{float(scores[objective]):.3e}"
                        for _ in [0]
                        if objective != "mse"
                    },
                    lr=f"{lr_schedule(global_step - 1):.3e}",
                    time=round(time.time() - start_time),
                )
                print(info)
        ep_losses = (
            np.asarray(jnp.stack(ep_losses_dev)).tolist()
            if ep_losses_dev else []
        )

        if measure_time:
            force_completion(scores)
            print("Memory usage:")
            try:
                stats = jax.local_devices()[0].memory_stats() or {}
                for k in ("bytes_in_use", "peak_bytes_in_use",
                          "bytes_limit"):
                    if k in stats:
                        print(f"  {k}: {stats[k] / 2**20:.1f} MiB")
            except Exception:
                print("  (memory stats unavailable on this backend)")
            print("Time usage:")
            print(time.time() - ep_start)
            return state._replace(params=std_params(state.params))

        train_losses += ep_losses
        if (ep + 1) % eval_interval == 0:
            ckpt_dir = output_dir / f"ckpt-{ep}"
            ckpt_dir.mkdir(parents=True, exist_ok=True)
            eval_params = std_params(state.params)
            result = evaluate(
                task,
                eval_params,
                dev_data,
                ckpt_dir,
                model_state=state.model_state,
                batch_size=eval_batch_size,
                eval_step=eval_step,
                mesh=mesh,
                collect_preds=False,
                max_eval_batches=eval_max_batches,
                spatial=spatial,
            )
            dev_scores = result["scores"]
            if predict_fn is not None:
                # Train-time example.png (src/train_auto.py:234-250).
                pb = next(
                    iter(
                        batches(
                            dataset_arrays(dev_data), eval_batch_size,
                            shuffle=False,
                            pad_multiple=(
                                mesh.shape["data"] if mesh is not None
                                else 1
                            ),
                        )
                    )
                )
                if mesh is not None:
                    pb = jax.device_put(pb, batch_sharding(mesh))
                pred = predict_fn(eval_params, state.model_state, pb)
                plot_example(
                    inp=np.asarray(pb["inputs"][0, ..., 0]),
                    label=np.asarray(pb["labels"][0, ..., 0]),
                    pred=np.asarray(pred[0, ..., 0]),
                    out_path=output_dir / "example.png",
                )
            dump_json(dev_scores, ckpt_dir / "dev_scores.json")
            dump_json(ep_losses, ckpt_dir / "train_loss.json")
            checkpoints.save_params(
                {"params": eval_params, **state.model_state}, ckpt_dir
            )
            dev_key = "nmse" if "nmse" in dev_scores["all"] else objective
            checkpoints.save_epoch_scores(
                ckpt_dir,
                ep=ep,
                train_loss=float(np.mean(ep_losses)),
                dev_loss=float(np.mean(dev_scores["all"][dev_key])),
                time_s=time.time() - ep_start,
            )
            # Full-state snapshot for --resume (params + BN stats +
            # optimizer moments + step). pp runs store the STANDARD
            # layout — layout-free on disk, so the snapshot resumes
            # across a different model-axis size.
            snap = jax.device_get(state)
            if use_pp:
                from ..parallel.pipeline import pp_state_to_std

                snap = pp_state_to_std(
                    snap, snap.params, task.model.num_layers
                )
            checkpoints.save_params(snap, output_dir / "training_state")
            # Losses BEFORE meta: training_meta.json is the resume
            # commit record, so a kill between the two writes must
            # leave the history at-or-ahead of the commit point, never
            # behind it (resume truncates any overshoot).
            dump_json(train_losses, output_dir / "train_losses.json")
            dump_json(
                dict(epoch=ep, global_step=global_step),
                output_dir / "training_meta.json",
            )
    print("====== Training done ======")
    dump_json(train_losses, output_dir / "train_losses.json")
    plot_loss(train_losses, output_dir / "train_losses.png")
    # Callers (test eval, export) always see the standard flax tree;
    # the packed pp layout is an internal training-state detail.
    return state._replace(params=std_params(state.params))


def test(
    task: AutoTask,
    params,
    data: AutoDataset,
    output_dir: Path,
    model_state=None,
    batch_size: int = 1,
    plot_interval: int = 10,
    mesh=None,
    measure_time: bool = False,
    max_eval_batches: Optional[int] = None,
) -> None:
    """Single-step test-set eval; writes preds.npy + scores.json
    (reference writes preds.pt, ``src/train_auto.py:151-178``). For
    diffusion tasks this generates every frame (sampling scan) and
    scores masked frame metrics."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    result = evaluate(
        task,
        params,
        data,
        output_dir,
        model_state=model_state,
        batch_size=batch_size,
        plot_interval=plot_interval,
        mesh=mesh,
        measure_time=measure_time,
        max_eval_batches=max_eval_batches,
    )
    if result.get("preds") is not None:
        np.save(output_dir / "preds.npy", result["preds"])
    dump_json(result["scores"], output_dir / "scores.json")
