#!/usr/bin/env python
"""Serving-latency benchmark for exported StableHLO artifacts.

Measures what a serving process actually sees: per-call latency and
throughput of a deserialized artifact (jitted once at load — the
compiled-serving pattern), with input shapes read from the artifact
itself. ``--selftest`` additionally builds a throwaway FNO, exports
its predict/rollout programs, and times the served programs against
the same computations run in-process — the overhead should be ~0
because the artifact *is* the compiled program. (The reference has no
serving story: inference there means loading a torch checkpoint into
the full model codebase, ``src/test_multistep.py:224-230``.)

Prints one JSON dict.

Usage:
    # time an artifact written by scripts/export_model.py
    python scripts/serve_bench.py --artifact <run>/serve/rollout.stablehlo

    # no checkpoint needed: export a throwaway model and compare
    python scripts/serve_bench.py --selftest --batch 128 --grid 64

Timing note: per-call wall time here includes one device→host sync
(``utils/timing.py`` — the only honest completion signal on this
backend, and a cost a real server pays anyway to read the result).
The served-vs-in-process comparison cancels it.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def _time_calls(fn, args, iters):
    """Median wall seconds per call, completion forced via host
    transfer (cfdbench_tpu/utils/timing.py)."""
    import numpy as np

    from cfdbench_tpu.utils.timing import force_completion

    force_completion(fn(*args))  # warmup: compile + first execution
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force_completion(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _ones_inputs(avals):
    import jax.numpy as jnp

    return tuple(jnp.ones(a.shape, a.dtype) for a in avals)


def bench_artifact(path: Path, iters: int) -> dict:
    """Deserialize, jit, and time one artifact; shapes from its avals."""
    import jax
    from jax import export as jax_export

    exp = jax_export.deserialize(Path(path).read_bytes())
    args = _ones_inputs(exp.in_avals)
    served = jax.jit(exp.call)
    sec = _time_calls(served, args, iters)

    out_shape = tuple(exp.out_avals[0].shape)
    # predict artifacts return (B, H, W, C); rollout ones (S, B, H, W, C)
    if len(out_shape) == 5:
        steps, batch = out_shape[0], out_shape[1]
    else:
        steps, batch = 1, out_shape[0]
    return dict(
        artifact=str(path),
        bytes=Path(path).stat().st_size,
        in_shapes=[tuple(a.shape) for a in exp.in_avals],
        out_shape=out_shape,
        latency_ms_per_call=round(1e3 * sec, 3),
        frames_per_sec=round(steps * batch / sec, 1),
    )


def selftest(ns) -> dict:
    """Export a throwaway model and compare served vs in-process.

    ``--model fno`` (spectral flagship) or ``--model unet`` (the conv
    throughput champion — BASELINE.md §cross-family; its BatchNorm
    running stats ride along as ``model_state``, so this also proves
    stateful models serve correctly)."""
    import jax

    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.training.rollout import make_rollout_fn
    from cfdbench_tpu.training.trainer_auto import AutoTask
    from cfdbench_tpu.utils.export import export_predict, export_rollout

    if ns.model == "fno":
        from cfdbench_tpu.models.fno import Fno2d

        model = Fno2d(
            in_chan=2, out_chan=2, n_case_params=5, num_layers=ns.depth,
            modes1=ns.modes, modes2=ns.modes, hidden_dim=ns.hidden,
        )
    else:
        from cfdbench_tpu.models.unet import UNet

        # --hidden maps to the UNet's base channel count ("dim").
        model = UNet(
            in_chan=2, out_chan=2, n_case_params=5,
            insert_case_params_at="input", dim=ns.hidden,
        )
    task = AutoTask(model, loss_name_to_fn("nmse"))
    B, H, W = ns.batch, ns.grid, ns.grid
    frame, cp, mask = _ones_inputs(
        [jax.ShapeDtypeStruct(s, "float32")
         for s in [(B, H, W, 2), (B, 5), (B, H, W, 1)]]
    )
    variables = model.init(jax.random.PRNGKey(0), frame, cp, mask)
    params = variables["params"]
    model_state = {
        k: v for k, v in variables.items() if k != "params"
    }  # UNet: batch_stats; FNO: empty

    out = dict(config=dict(model=ns.model, batch=B, grid=ns.grid,
                           hidden=ns.hidden, depth=ns.depth,
                           modes=ns.modes, steps=ns.steps))
    with tempfile.TemporaryDirectory() as td:
        sections = (
            (
                "predict",
                lambda p: export_predict(
                    task, params, p, B, H, W, 5,
                    model_state=model_state),
                jax.jit(lambda f, c, m: task.predict_frame(
                    params, f, c, m, model_state=model_state)),
            ),
            (
                "rollout",
                lambda p: export_rollout(
                    task, params, p, B, H, W, 5, steps=ns.steps,
                    model_state=model_state),
                jax.jit(lambda f, c, m: make_rollout_fn(
                    lambda pp, ff, cc, mm: task.predict_frame(
                        pp, ff, cc, mm, model_state=model_state),
                    steps=ns.steps,
                )(params, f, c, m)),
            ),
        )
        for kind, export_fn, live in sections:
            if ns.only and kind != ns.only:
                continue
            path = Path(td) / f"{kind}.stablehlo"
            export_fn(path)
            served = bench_artifact(path, ns.iters)
            live_sec = _time_calls(live, (frame, cp, mask), ns.iters)
            served.pop("artifact")
            served["in_process_ms_per_call"] = round(1e3 * live_sec, 3)
            served["served_overhead_pct"] = round(
                100.0 * (served["latency_ms_per_call"] / (1e3 * live_sec)
                         - 1.0), 1,
            )
            out[kind] = served
    return out


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--artifact", type=Path, default=None,
                    help="path to a .stablehlo artifact to time")
    ap.add_argument("--selftest", action="store_true",
                    help="export a throwaway model (--model fno|unet) "
                         "and compare served vs in-process")
    ap.add_argument("--model", choices=["fno", "unet"], default="fno",
                    help="selftest model family")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--modes", type=int, default=12)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--only", choices=["predict", "rollout"], default=None,
                    help="selftest: run just one section — on the "
                         "tunneled TPU backend (which wedges after "
                         "~3-4 large compilations per process, "
                         "BASELINE.md §wedge) run each section in its "
                         "own process")
    ns = ap.parse_args(argv)

    if ns.artifact is None and not ns.selftest:
        ap.error("pass --artifact PATH and/or --selftest")

    # Honor JAX_PLATFORMS=cpu even though the preinstalled axon TPU
    # plugin overrides the environment variable (the config API wins).
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # Persistent compile cache (same one bench.py uses): a hit turns
    # the 1-2 min tunnel compile into <1 s; execution timing unaffected.
    if os.environ.get("CFDBENCH_XLA_CACHE", "1") != "0":
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/cfdbench_tpu_xla"),
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0
        )

    result = {}
    if ns.artifact is not None:
        result["artifact_bench"] = bench_artifact(ns.artifact, ns.iters)
    if ns.selftest:
        result["selftest"] = selftest(ns)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
