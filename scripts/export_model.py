#!/usr/bin/env python
"""Export a trained checkpoint as a serving artifact (StableHLO).

Loads the best checkpoint from the standard result tree (same
discovery as ``--mode test``: min dev_loss over ``ckpt-*/scores.json``)
and writes ``<output_dir>/serve/{predict,rollout}.stablehlo`` — the
jitted single-step and N-step-rollout programs with the weights baked
in. A serving process needs only jax + the artifact
(``cfdbench_tpu.utils.export.load_exported``).

Usage mirrors the trainers:
    python scripts/export_model.py --model fno \
        --data_name cavity_prop_bc_geo --data_dir <root> \
        --output_dir <result root> --batch_size 128
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main(argv=None) -> None:
    import jax

    from cfdbench_tpu.cli import make_auto_task
    from cfdbench_tpu.config import Args
    from cfdbench_tpu.data import get_auto_dataset
    from cfdbench_tpu.training.checkpoints import load_best_params
    from cfdbench_tpu.utils.artifacts import get_output_dir
    from cfdbench_tpu.utils.export import export_predict, export_rollout

    args = Args.parse_args(argv)
    # Same runtime knobs as the trainers: the exported artifact bakes
    # in --spectral_backend / --matmul_precision, and the compile
    # cache saves the 1-2 min tunnel compile on re-export.
    from cfdbench_tpu.cli import _apply_runtime_flags

    _apply_runtime_flags(args)
    _, _, test_data = get_auto_dataset(
        data_dir=Path(args.data_dir),
        data_name=args.data_name,
        delta_time=args.delta_time,
        norm_props=bool(args.norm_props),
        norm_bc=bool(args.norm_bc),
        load_splits=["test"],
        seed=args.seed,
        cache_dir=args.cache_dir or None,
    )
    H, W = test_data.field_shape
    P = test_data.n_case_params
    task = make_auto_task(args, n_case_params=P, field_shape=(H, W))
    output_dir = get_output_dir(args, is_auto=True)

    sample = dict(
        inputs=test_data.inputs[:1],
        labels=test_data.labels[:1],
        mask=test_data.masks[:1],
        case_params=test_data.case_params[:1],
    )
    template = jax.eval_shape(
        lambda: task.init_params(jax.random.PRNGKey(0), sample)
    )
    variables = dict(load_best_params(template, output_dir))
    params = variables.pop("params")

    serve = output_dir / "serve"
    B = args.batch_size
    # Bake both TPU and CPU lowerings in so one artifact serves either.
    plats = ("tpu", "cpu")
    n1 = export_predict(
        task, params, serve / "predict.stablehlo", B, H, W, P,
        model_state=variables, platforms=plats,
    )
    n2 = export_rollout(
        task, params, serve / "rollout.stablehlo", B, H, W, P,
        steps=20, model_state=variables, platforms=plats,
    )
    print(f"wrote {serve}/predict.stablehlo ({n1} bytes)")
    print(f"wrote {serve}/rollout.stablehlo ({n2} bytes)")


if __name__ == "__main__":
    main()
