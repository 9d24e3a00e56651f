#!/usr/bin/env python
"""Benchmark: FNO 20-step autoregressive rollout throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline number is rollout frames/sec/chip on the flagship config
(FNO d4 h32 m12 on 64×64 fields, 16 cases, 20 steps) — the reference's
multistep path (``src/test_multistep.py:135-177``) runs this as a
sequential batch-1 Python loop; BASELINE.md's north star is ≥10× that.

``vs_baseline`` is measured on the SAME hardware against a faithful
emulation of the reference's execution structure: per-case Python loop,
batch 1, one device dispatch per step (each forward jitted, as torch's
eager kernels are compiled ops too) — isolating the framework-design
win (batched scan, fused program) from hardware differences.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _setup(n_cases=16, h=64, w=64):
    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.fno import Fno2d
    from cfdbench_tpu.training.trainer_auto import AutoTask

    model = Fno2d(
        in_chan=2, out_chan=2, n_case_params=5, num_layers=4,
        modes1=12, modes2=12, hidden_dim=32,
    )
    task = AutoTask(model, loss_name_to_fn("nmse"))
    rng = np.random.default_rng(0)
    frame0 = jnp.asarray(rng.standard_normal((n_cases, h, w, 2)), jnp.float32)
    case_params = jnp.asarray(rng.standard_normal((n_cases, 5)), jnp.float32)
    mask = jnp.ones((n_cases, h, w, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), frame0, case_params, mask)
    return task, variables["params"], frame0, case_params, mask


def _timed_scan(task, params, frame0, case_params, mask, steps, iters=8):
    """Median wall time of a `steps`-step rollout, forcing completion
    via a device-side reduction pulled to host (block_until_ready is
    unreliable on the tunneled backend)."""
    from cfdbench_tpu.training.rollout import make_rollout_fn

    r = make_rollout_fn(task.predict_frame, steps=steps)
    sink = jax.jit(lambda *a: r(*a).sum())
    float(sink(params, frame0, case_params, mask))  # warmup/compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(sink(params, frame0, case_params, mask))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_scan_rollout(task, params, frame0, case_params, mask, steps=20):
    """Sustained frames/sec via the slope method: marginal cost per
    rollout step, cancelling fixed host-sync overhead (which on this
    dev setup is a ~28 ms tunnel round trip, not a TPU property)."""
    t_long = _timed_scan(task, params, frame0, case_params, mask, 4 * steps)
    t_short = _timed_scan(task, params, frame0, case_params, mask, steps)
    marginal = (t_long - t_short) / (3 * steps)
    return frame0.shape[0] / marginal  # frames/sec


def _timed_reference(task, params, frame0, case_params, mask, steps):
    """Reference execution structure: per-case Python loop, batch 1,
    one device dispatch per step; completion forced per case chain."""
    step_fn = jax.jit(
        lambda p, f, cp, m: task.predict_frame(p, f, cp, m)
    )
    n_cases = frame0.shape[0]
    cur = step_fn(params, frame0[:1], case_params[:1], mask[:1])
    float(cur.sum())  # warmup/compile
    t0 = time.perf_counter()
    for c in range(n_cases):
        cur = frame0[c: c + 1]
        for _ in range(steps):
            cur = step_fn(params, cur, case_params[c: c + 1],
                          mask[c: c + 1])
        float(cur.sum())
    return time.perf_counter() - t0


def bench_reference_style(task, params, frame0, case_params, mask,
                          steps=20):
    """Slope method, same as the scan path, so both sides exclude the
    fixed per-sync tunnel latency."""
    t_long = _timed_reference(task, params, frame0, case_params, mask,
                              4 * steps)
    t_short = _timed_reference(task, params, frame0, case_params, mask,
                               steps)
    marginal = (t_long - t_short) / (3 * steps * frame0.shape[0])
    return 1.0 / marginal


def main():
    task, params, frame0, case_params, mask = _setup()
    fps = bench_scan_rollout(task, params, frame0, case_params, mask)
    baseline_fps = bench_reference_style(
        task, params, frame0, case_params, mask
    )
    print(
        json.dumps(
            dict(
                metric="fno_rollout_frames_per_sec_per_chip",
                value=round(fps, 2),
                unit="frames/s",
                vs_baseline=round(fps / baseline_fps, 2),
            )
        )
    )


if __name__ == "__main__":
    main()
