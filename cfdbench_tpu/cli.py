"""CLI entry points (the reference's ``train_auto.py`` / ``train.py`` /
``test_multistep.py`` drivers)."""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from .config import Args
from .data import get_auto_dataset, get_dataset
from .metrics import loss_name_to_fn
from .models import init_auto_model
from .parallel.mesh import make_mesh
from .training import trainer_auto
from .training.checkpoints import load_best_params
from .utils.artifacts import dump_json, get_output_dir


def _mesh(args: Args):
    return make_mesh(args.mesh_shape)


def main_auto(argv=None) -> None:
    """Mirror of ``src/train_auto.py:316-378``."""
    args = Args.parse_args(argv)
    print("#" * 80)
    print(args)
    print("#" * 80)

    output_dir = get_output_dir(args, is_auto=True)
    output_dir.mkdir(parents=True, exist_ok=True)
    args.save(output_dir / "args.json")

    print("Loading data...")
    splits = ["train", "dev", "test"] if "train" in args.mode else ["test"]
    if "test" in args.mode and "test" not in splits:
        splits.append("test")
    train_data, dev_data, test_data = get_auto_dataset(
        data_dir=Path(args.data_dir),
        data_name=args.data_name,
        delta_time=args.delta_time,
        norm_props=bool(args.norm_props),
        norm_bc=bool(args.norm_bc),
        load_splits=splits,
        seed=args.seed,
    )
    ref = train_data if train_data is not None else test_data
    print(f"# train examples: {len(train_data) if train_data else 0}")
    print(f"# dev examples: {len(dev_data) if dev_data else 0}")
    print(f"# test examples: {len(test_data) if test_data else 0}")

    model = init_auto_model(
        args, n_case_params=ref.n_case_params, field_shape=ref.field_shape
    )
    task = trainer_auto.AutoTask(model, loss_name_to_fn(args.loss_name))
    mesh = _mesh(args)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    state = None
    if "train" in args.mode:
        args.save(output_dir / "train_args.json")
        state = trainer_auto.train(
            task,
            train_data=train_data,
            dev_data=dev_data,
            output_dir=output_dir,
            lr=args.lr,
            lr_step_size=args.lr_step_size,
            lr_gamma=args.lr_gamma,
            num_epochs=args.num_epochs,
            batch_size=args.batch_size,
            eval_batch_size=args.eval_batch_size,
            eval_interval=args.eval_interval,
            log_interval=args.log_interval,
            seed=args.seed,
            mesh=mesh,
            measure_time=bool(args.measure_time),
        )
    if "test" in args.mode:
        args.save(output_dir / "test_args.json")
        sample = dict(
            inputs=test_data.inputs[:1],
            labels=test_data.labels[:1],
            mask=test_data.masks[:1],
            case_params=test_data.case_params[:1],
        )
        template = task.init_params(jax.random.PRNGKey(0), sample)
        variables = dict(load_best_params(template, output_dir))
        params = variables.pop("params")
        trainer_auto.test(
            task,
            params,
            test_data,
            output_dir / "test",
            model_state=variables,
            batch_size=1,
            plot_interval=10,
            mesh=mesh,
        )


def main_train(argv=None) -> None:
    """Non-autoregressive driver (mirror of ``src/train.py:295-350``)."""
    from .models import init_nonauto_model
    from .training import trainer_nonauto

    args = Args.parse_args(argv)
    print("#" * 80)
    print(args)
    print("#" * 80)

    output_dir = get_output_dir(args, is_auto=False)
    output_dir.mkdir(parents=True, exist_ok=True)
    args.save(output_dir / "args.json")

    print("Loading data...")
    train_data, dev_data, test_data = get_dataset(
        data_name=args.data_name,
        data_dir=Path(args.data_dir),
        norm_props=bool(args.norm_props),
        norm_bc=bool(args.norm_bc),
        seed=args.seed,
    )
    print(f"# train examples: {len(train_data)}")
    print(f"# dev examples: {len(dev_data)}")
    print(f"# test examples: {len(test_data)}")

    model = init_nonauto_model(args, n_case_params=train_data.n_case_params)
    task = trainer_nonauto.NonAutoTask(model, loss_name_to_fn(args.loss_name))
    mesh = _mesh(args)

    if "train" in args.mode:
        args.save(output_dir / "train_args.json")
        trainer_nonauto.train(
            task,
            train_data=train_data,
            dev_data=dev_data,
            output_dir=output_dir,
            lr=args.lr,
            lr_step_size=args.lr_step_size,
            lr_gamma=args.lr_gamma,
            num_epochs=args.num_epochs,
            batch_size=args.batch_size,
            eval_interval=args.eval_interval,
            log_interval=args.log_interval,
            seed=args.seed,
            mesh=mesh,
            measure_time=bool(args.measure_time),
        )
    if "test" in args.mode:
        args.save(output_dir / "test_args.json")
        sample = dict(
            case_params=test_data.case_params[:1],
            t=test_data.frame_t[:1, None],
        )
        template = {
            "params": task.init_params(jax.random.PRNGKey(0), sample)
        }
        params = dict(load_best_params(template, output_dir))["params"]
        trainer_nonauto.test(
            task,
            params,
            test_data,
            output_dir / "test",
            batch_size=1,
            mesh=mesh,
        )


def main_multistep(argv=None) -> None:
    """Mirror of ``src/test_multistep.py:180-236``: 20-step rollout on
    the test split, per-step masked-u metrics averaged over cases —
    executed as one jitted scan over all cases at once."""
    from .training.rollout import (
        make_rollout_fn,
        multistep_metrics,
        pad_case_features,
    )
    from .utils.artifacts import plot_multistep_metrics

    args = Args.parse_args(argv)
    print(args)

    _, _, test_data = get_auto_dataset(
        data_dir=Path(args.data_dir),
        data_name=args.data_name,
        delta_time=args.delta_time,
        norm_props=bool(args.norm_props),
        norm_bc=bool(args.norm_bc),
        load_splits=["test"],
        seed=args.seed,
    )
    infer_steps = 20
    features = pad_case_features(test_data.all_features, infer_steps)
    case_params = np.stack(
        [
            np.asarray(
                [v for k, v in p.items() if k not in ("rotated", "dx", "dy")],
                dtype=np.float32,
            )
            for p in test_data.case_params_list
        ]
    )
    frame0 = features[:, 0, :, :, :2]
    mask = features[:, 0, :, :, 2:3]

    if args.model in ("ffn", "deeponet"):
        # Non-auto branch (``test_multistep.py:119-132``): one frame per
        # (case, step) via generate_one — executed as a single batched
        # call over all cases × steps.
        from .models import init_nonauto_model
        from .training import trainer_nonauto

        C = frame0.shape[0]
        H, W = frame0.shape[1:3]
        model = init_nonauto_model(args, n_case_params=case_params.shape[1])
        task = trainer_nonauto.NonAutoTask(
            model, loss_name_to_fn(args.loss_name)
        )
        output_dir = get_output_dir(args, is_auto=False)
        template = {
            "params": task.init_params(
                jax.random.PRNGKey(0),
                dict(case_params=case_params[:1], t=np.zeros((1, 1))),
            )
        }
        params = dict(load_best_params(template, output_dir))["params"]
        cp_tiled = np.tile(case_params, (infer_steps, 1))
        ts = np.repeat(
            np.arange(infer_steps, dtype=np.float32), C
        )[:, None]
        preds_flat = jax.jit(
            lambda p, cp, t: task.generate_one(p, cp, t, H, W)
        )(params, cp_tiled, ts)
        preds = np.asarray(preds_flat).reshape(infer_steps, C, H, W, 1)
        metrics = multistep_metrics(preds, features, mask)
        for m in metrics:
            print(m)
        dump_json(metrics, output_dir / "multistep_metrics.json")
        plot_multistep_metrics(metrics, output_dir / "multistep_metrics.pdf")
        return

    model = init_auto_model(
        args,
        n_case_params=case_params.shape[1],
        field_shape=frame0.shape[1:3],
    )
    task = trainer_auto.AutoTask(model, loss_name_to_fn(args.loss_name))
    output_dir = get_output_dir(args, is_auto=True)
    sample = dict(
        inputs=frame0[:1],
        labels=frame0[:1],
        mask=mask[:1],
        case_params=case_params[:1],
    )
    template = task.init_params(jax.random.PRNGKey(0), sample)
    variables = dict(load_best_params(template, output_dir))
    params = variables.pop("params")

    fb = task.feedback_channels
    rollout = make_rollout_fn(
        lambda p, f, cp, m: task.predict_frame(
            p, f, cp, m, model_state=variables
        ),
        steps=infer_steps,
        include_initial=(args.model == "resnet"),
    )
    preds = rollout(params, frame0[..., :fb], case_params, mask)
    metrics = multistep_metrics(preds, features, mask)
    for m in metrics:
        print(m)
    dump_json(metrics, output_dir / "multistep_metrics.json")
    plot_multistep_metrics(metrics, output_dir / "multistep_metrics.pdf")
