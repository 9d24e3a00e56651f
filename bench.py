#!/usr/bin/env python
"""Benchmark: FNO rollout throughput + training-step MFU.

Prints ONE **compact** JSON line to stdout (guaranteed < 2 KB):
``{"metric", "value", "unit", "vs_baseline", "details": {scalars...}}``
— the full measurement snapshot (per-batch sweeps, precision variants,
skip lists, last-known-good provenance) is written to the
``bench_details.json`` sidecar instead of the line. Round 4's driver
artifact (BENCH_r04.json) captured only a bounded tail of stdout and
the then multi-KB line was truncated mid-JSON → ``parsed=null``; the
compact-line + sidecar split is the fix. Nothing else is ever printed
to stdout after the line.

Headline: rollout frames/sec/chip of the flagship config (FNO d4 h32
m12 on 64×64 fields, 20-step autoregressive rollout) at the best
measured user-reachable configuration — batch size sweep plus the
bf16-storage mode (``--rollout_dtype bfloat16``, 0.60% rel-L2
deviation; BASELINE.md). ``details.headline_config`` names the
winner. ``details`` carries the full story:

- ``rollout_fps``: frames/s at batch {16, 128, 512} (bf16 matmuls —
  XLA's TPU default) and at batch 128 with f32 (``highest``) matmuls.
- ``train_step``: jitted fused train-step (fwd+bwd+Adam) wall time at
  batch 128, FLOPs/step from XLA's cost model (analytic fallback), and
  **MFU%** against the chip's bf16 peak.
- worker tiers: the default schedule covers every model family (FNO,
  UNet, ResNet, GenCast residual diffusion, DeepONet) inside one
  budgeted run — round 4's schedule front-loaded FNO precision sweeps
  and budget-starved the other families. The now-settled FNO sweep
  variants (batch 16/512, f32 rollout/train variants, trainer-loop
  A/B, Pallas head) run only under ``--extended``.
- ``baseline_fps_pinned``: the PINNED reference-style number (see
  BASELINE.md §method): a faithful emulation of the reference's
  execution structure — per-case Python loop, batch 1, one device
  dispatch per step (``src/test_multistep.py:135-177``) — measured once
  on this hardware with the slope method and recorded as a constant, so
  ``vs_baseline`` does not swing with per-run tunnel latency (the
  round-1 27×-vs-72× inconsistency). Re-measure with
  ``python bench.py --remeasure-baseline``.

Every configuration runs in its own subprocess: the tunneled axon
backend wedges after >3-4 large compilations in one process, and
timings must force completion via host transfers (fake
block_until_ready) — see cfdbench_tpu/utils/timing.py. All timings use
the slope method (t(4S) − t(S)) / 3S to cancel the fixed ~28 ms/sync
tunnel round trip, which is a dev-harness artifact, not a TPU property.

Robustness contract (round 4 — BENCH_r03.json was rc=124/parsed=null):

- **Global wall-clock budget** (``CFDBENCH_BENCH_BUDGET_SEC``, default
  900 s): when exceeded, remaining workers are skipped and the final
  JSON line is printed with whatever was measured.
- **Headline-first ordering**: bf16-storage rollout b128 (the measured
  headline winner) → f32-storage rollout b128 → train b128 mixed →
  everything else, so an early kill or a wedge-starved budget still
  captures the number that matters most.
- **Per-worker timeout** (``CFDBENCH_BENCH_WORKER_TIMEOUT``, default
  240 s) **with one retry** — a retry after a cold-compile timeout hits
  the persistent XLA cache entries the first attempt already wrote.
- **Partial streaming**: after every worker the full result snapshot is
  written to ``bench_partial.json``, so even SIGKILL leaves a parseable
  artifact on disk.
- **SIGTERM/SIGINT handler**: prints the final JSON line from the
  current snapshot before exiting — ``timeout(1)`` (the likely rc=124
  source) sends SIGTERM first, so a driver-side kill now still yields
  a parsed result.
- **Worker heartbeats**: each subprocess logs ``[hb +Ns]`` stage marks
  (devices up / compile start / compile done / timing) to stderr, which
  is inherited — a wedge is attributable to compile vs tunnel from the
  driver's stderr tail alone.
"""

import functools
import json
import os
import signal
import subprocess
import sys
import time

# ---------------------------------------------------------------------------
# Pinned baseline (frames/s): reference-style batch-1 dispatch loop for
# the flagship FNO config. Measured repeatedly on the v5e chip via
# `python bench.py --remeasure-baseline` (slope-timed): 133-291 f/s on
# 2026-08-16, ~887 f/s implied by the round-1 driver run — the
# dispatch loop is bound by tunnel round-trip latency, which varies
# run to run and is not a TPU property. Pinned at the MOST FAVORABLE
# observation so vs_baseline is a lower bound of the true advantage.
# Methodology + provenance: BASELINE.md §method.
PINNED_BASELINE_FPS = 887.0

FLAGSHIP = dict(depth=4, hidden=32, modes=12, h=64, w=64)
PEAK_BF16_FLOPS = 197e12  # TPU v5e per-chip bf16 peak (public spec)

# Global orchestrator budget + per-worker limits (see module docstring).
# 900 s: with the SIGTERM rescue a driver kill still emits the line, so
# the budget's job is only to finish cleanly ahead of it; measured
# wedge-state days (BASELINE.md §wedge) burn ~585 s on the ping alone
# and still need room for one headline attempt.
BUDGET_SEC = float(os.environ.get("CFDBENCH_BENCH_BUDGET_SEC", "900"))
WORKER_TIMEOUT_SEC = float(
    os.environ.get("CFDBENCH_BENCH_WORKER_TIMEOUT", "240")
)
# Below this much remaining budget, don't even start a worker.
MIN_WORKER_SEC = 35.0
# Artifact paths are env-overridable so the orchestration tests write
# to tmp dirs instead of clobbering real run artifacts at the repo root.
PARTIAL_PATH = os.environ.get("CFDBENCH_BENCH_PARTIAL") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_partial.json"
)
HISTORY_PATH = os.environ.get("CFDBENCH_BENCH_HISTORY") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_history.jsonl"
)
# Full-snapshot sidecar: everything the pre-round-5 stdout line carried.
DETAILS_PATH = os.environ.get("CFDBENCH_BENCH_DETAILS") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_details.json"
)
# Hard ceiling on the final stdout line (the driver captures a bounded
# tail of stdout; BENCH_r04's truncation point was well above this).
MAX_LINE_BYTES = 2000

_T0 = time.time()


def _hb(msg):
    """Worker heartbeat → stderr (inherited by the orchestrator and the
    driver): makes a wedge attributable to compile vs tunnel."""
    print(f"[hb +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr,
          flush=True)


def _make_model(model: str = "fno", hidden=None):
    """Flagship-config constructors for the benched auto models (same
    defaults as the reference's ``--model`` hparams, ``src/args.py``)."""
    if model == "fno":
        from cfdbench_tpu.models.fno import Fno2d

        return Fno2d(
            in_chan=2, out_chan=2, n_case_params=5,
            num_layers=FLAGSHIP["depth"], modes1=FLAGSHIP["modes"],
            modes2=FLAGSHIP["modes"],
            hidden_dim=hidden or FLAGSHIP["hidden"],
        )
    if model == "unet":
        from cfdbench_tpu.models.unet import UNet

        return UNet(in_chan=2, out_chan=2, n_case_params=5,
                    dim=hidden or 12)
    if model == "resnet":
        from cfdbench_tpu.models.resnet import ResNet

        return ResNet(in_chan=2, out_chan=2, n_case_params=5,
                      hidden_chan=hidden or 32)
    raise ValueError(f"unknown bench model {model!r}")


def _setup(n_cases, h=64, w=64, hidden=None, model="fno"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.training.trainer_auto import AutoTask

    net = _make_model(model, hidden)
    task = AutoTask(net, loss_name_to_fn("nmse"))
    rng = np.random.default_rng(0)
    frame0 = jnp.asarray(rng.standard_normal((n_cases, h, w, 2)), jnp.float32)
    case_params = jnp.asarray(rng.standard_normal((n_cases, 5)), jnp.float32)
    mask = jnp.ones((n_cases, h, w, 1), jnp.float32)
    params, model_state = task.init_variables(
        jax.random.PRNGKey(0),
        dict(inputs=frame0, case_params=case_params, mask=mask),
    )
    return task, params, frame0, case_params, mask, model_state


def _timed_scan(
    task, params, frame0, case_params, mask, steps, iters=8,
    model_state=None,
):
    import jax
    import numpy as np

    from cfdbench_tpu.training.rollout import make_rollout_fn

    r = make_rollout_fn(
        lambda p, f, cp, m: task.predict_frame(
            p, f, cp, m, model_state=model_state or {}
        ),
        steps=steps,
    )
    sink = jax.jit(lambda *a: r(*a).sum())
    _hb(f"compile start: rollout scan steps={steps}")
    float(sink(params, frame0, case_params, mask))  # warmup/compile
    _hb(f"compile done: rollout scan steps={steps}; timing {iters} iters")
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(sink(params, frame0, case_params, mask))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def worker_ping():
    """Tunnel liveness + latency probe: one trivial compile + a few
    host syncs. Runs FIRST so a dead/cold tunnel is attributed here
    (cheap, retried) instead of wedging the headline worker, and its
    compile warms up the backend connection for the rest of the run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    _hb("ping: querying devices")
    dev = jax.devices()
    _hb(f"ping: devices up: {dev}")
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((256, 256), jnp.float32)
    _hb("ping: compile start")
    float(f(x))
    _hb("ping: compile done; measuring sync round trip")
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(f(x))
        times.append(time.perf_counter() - t0)
    return dict(
        platform=dev[0].platform,
        n_devices=len(dev),
        sync_roundtrip_ms=round(1e3 * float(np.median(times)), 2),
    )


def worker_rollout(batch, steps=20, dtype="float32", model="fno"):
    """``dtype="bfloat16"`` additionally stores params/activations in
    bf16 (multiplies are bf16 on TPU either way; this halves HBM
    traffic at the cost of activation precision — measured +29% at
    b128 once the erf cost was removed: the step is HBM-traffic-bound)."""
    import jax
    import jax.numpy as jnp

    task, params, frame0, case_params, mask, mstate = _setup(
        batch, model=model
    )
    if dtype != "float32":
        dt = jnp.dtype(dtype)

        def cast(x):
            return (
                x.astype(dt)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x
            )

        params = jax.tree.map(cast, params)
        mstate = jax.tree.map(cast, mstate)  # incl. BN running stats
        frame0, case_params, mask = (
            frame0.astype(dt), case_params.astype(dt), mask.astype(dt)
        )
    t_long = _timed_scan(
        task, params, frame0, case_params, mask, 4 * steps,
        model_state=mstate,
    )
    t_short = _timed_scan(
        task, params, frame0, case_params, mask, steps,
        model_state=mstate,
    )
    marginal = (t_long - t_short) / (3 * steps)
    return dict(frames_per_sec=batch / marginal)


def worker_rollout_pallas(batch, steps=20, batch_tile=1):
    """XLA-head vs Pallas-head rollout, same harness: accumulate-only
    scan (the Pallas custom-call output otherwise forces a (…,64,2)
    T(8,128) layout on the stacked frames — 64× padded, 21 GB at b128).
    The Pallas head (``ops.pallas_fno.fused_fno_head``) keeps the
    (B,H,W,128) fc1 intermediate in VMEM."""
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfdbench_tpu.models.fno import fno2d_apply_pallas_head

    task, params, frame0, case_params, mask, _ = _setup(batch)
    model = task.model

    def predict_pallas(p, f, cp, m):
        return fno2d_apply_pallas_head(
            model, p, f, cp, m, batch_tile=batch_tile
        )

    def make_sink(predict, s):
        def body(p, carry, _):
            f, acc = carry
            nxt = predict(p, f, case_params, mask)
            return (nxt, acc + jnp.sum(nxt)), None

        @jax.jit
        def sink(p, f0):
            (f, acc), _ = jax.lax.scan(
                functools.partial(body, p),
                (f0, jnp.zeros((), jnp.float32)), None, length=s,
            )
            return acc

        return sink

    def timed(predict, s):
        sink = make_sink(predict, s)
        float(sink(params, frame0))
        times = []
        for _ in range(8):
            t0 = _time.perf_counter()
            float(sink(params, frame0))
            times.append(_time.perf_counter() - t0)
        return float(np.median(times))

    out = {}
    for name, predict in (
        ("xla", task.predict_frame),
        ("pallas", predict_pallas),
    ):
        t_long = timed(predict, 4 * steps)
        t_short = timed(predict, steps)
        marginal = (t_long - t_short) / (3 * steps)
        out[f"{name}_frames_per_sec"] = batch / marginal
    return out


def _analytic_fno_forward_flops(batch, hidden=None):
    """Matmul FLOPs of one FNO forward (packed spectral path) at the
    flagship grid/modes/depth, per batch; fallback when XLA cost
    analysis is unavailable. ``hidden`` must match the worker's width
    override — the channel-mixing terms scale with its square."""
    h, w = FLAGSHIP["h"], FLAGSHIP["w"]
    c = hidden or FLAGSHIP["hidden"]
    m = FLAGSHIP["modes"]
    hw = h * w
    fc0 = 2 * hw * 10 * c
    k = 2 * m
    per_block = (
        2 * (2 * k) * h * w * c          # row DFT
        + 2 * (2 * m) * (2 * w) * k * c  # col DFT
        + k * m * 2 * (2 * c) * (2 * c)  # per-mode channel mixing
        + 2 * (2 * h) * (2 * k) * m * c  # inverse row
        + 2 * w * (2 * m) * h * c        # inverse col
        + 2 * hw * c * c                 # 1x1 bypass
    )
    head = 2 * hw * c * 128 + 2 * hw * 128 * 2
    return batch * (fc0 + FLAGSHIP["depth"] * per_block + head)


def worker_train_step(batch, iters=16, hidden=None, mixed=True,
                      model="fno", opt_state="f32"):
    """``mixed=True`` (the optimized default since round 3) measures
    the true-mixed-precision step: bf16 params+activations in fwd/bwd,
    f32 master weights/optimizer/loss — the same path
    ``--use_mixed_precision`` drives in the trainers. ``mixed=False``
    measures the all-f32-storage step (matmuls are still bf16, XLA's
    TPU default). ``opt_state``: "bf16"/"factored" measure the
    reduced-optimizer-traffic Adam variants (training.optim) for the
    hidden-256 MFU question (BASELINE.md §anatomy)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfdbench_tpu.training.optim import make_adam
    from cfdbench_tpu.training.trainer_auto import (
        TrainState,
        make_train_step,
    )

    task, params, frame0, case_params, mask, mstate = _setup(
        batch, hidden=hidden, model=model
    )
    if mixed:  # true mixed precision (bf16 fwd/bwd, f32 master+loss)
        task.compute_dtype = jnp.bfloat16
    rng = np.random.default_rng(1)
    batch_dict = dict(
        inputs=frame0,
        labels=jnp.asarray(
            rng.standard_normal(frame0.shape), jnp.float32
        ),
        mask=mask,
        case_params=case_params,
        weights=jnp.ones((batch,), jnp.float32),
    )
    tx = make_adam(1e-3, steps_per_epoch=100, opt_state=opt_state)
    task_state = TrainState(
        params, mstate, tx.init(params), jnp.zeros((), jnp.int32)
    )
    step = make_train_step(task, tx)

    flops = None
    try:
        cost = step.lower(task_state, batch_dict).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost and cost.get("flops"):
            flops = float(cost["flops"])
    except Exception:
        pass
    if not flops and model == "fno":
        # fwd + ~2x for bwd (the analytic formula is FNO-specific;
        # other models report no MFU when XLA cost analysis fails)
        flops = 3.0 * _analytic_fno_forward_flops(batch, hidden=hidden)

    def run(n):
        nonlocal task_state
        t0 = time.perf_counter()
        for _ in range(n):
            task_state, scores = step(task_state, batch_dict)
        float(scores["mse"])  # force completion (host transfer)
        return time.perf_counter() - t0

    _hb("compile start: train step")
    run(2)  # warmup/compile
    _hb(f"compile done: train step; timing {5 * iters} steps")
    t_long = run(4 * iters)
    t_short = run(iters)
    sec_per_step = (t_long - t_short) / (3 * iters)
    out = dict(
        ms_per_step=1e3 * sec_per_step,
        examples_per_sec=batch / sec_per_step,
    )
    if flops:
        out.update(
            flops_per_step=flops,
            achieved_tflops=flops / sec_per_step / 1e12,
            mfu_pct=100.0 * flops / sec_per_step / PEAK_BF16_FLOPS,
        )
    return out


def worker_train_gencast(batch=32, iters=8, mixed=False):
    """GenCast (residual-diffusion UNet, base 64 — the most expensive
    trainer) jit-fused train step: AdamW + clip + NaN-skip, like the
    real trainer. ``mixed`` enables bf16 fwd/bwd (the reference trains
    GenCast under AMP)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.diffusion import GenCastCfdModel
    from cfdbench_tpu.training.trainer_gencast import make_gencast_tx

    task = GenCastCfdModel(
        loss_name_to_fn("nmse"),
        residual_mean=np.zeros(2, np.float32),
        residual_std=np.ones(2, np.float32),
        n_case_params=5, base_channels=64, num_res_blocks=2,
        noise_scheduler_timesteps=1000,
    )
    if mixed:
        task.compute_dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    b = dict(
        inputs=jnp.asarray(
            rng.standard_normal((batch, 64, 64, 2)), jnp.float32
        ),
        inputs_prev=jnp.asarray(
            rng.standard_normal((batch, 64, 64, 2)), jnp.float32
        ),
        labels=jnp.asarray(
            rng.standard_normal((batch, 64, 64, 2)), jnp.float32
        ),
        mask=jnp.ones((batch, 64, 64, 1), jnp.float32),
        case_params=jnp.asarray(
            rng.standard_normal((batch, 5)), jnp.float32
        ),
        weights=jnp.ones((batch,), jnp.float32),
    )
    params, _ = task.init_variables(jax.random.PRNGKey(0), b)
    tx = make_gencast_tx(1e-4, total_steps=1000, warmup_steps=10)
    opt_state = tx.init(params)
    from cfdbench_tpu.utils.rng import fast_train_key

    base_rng = fast_train_key(7)  # production trainer's RBG stream

    @jax.jit
    def step(params, opt_state, i, b):
        rng = jax.random.fold_in(base_rng, i)

        def lf(p):
            return task.loss_scores(p, b, train=True, rng=rng)

        grads, (scores, _) = jax.grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, scores

    flops = None
    try:
        cost = step.lower(
            params, opt_state, jnp.zeros((), jnp.int32), b
        ).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost and cost.get("flops"):
            flops = float(cost["flops"])
    except Exception:
        pass

    def run(n):
        nonlocal params, opt_state
        t0 = time.perf_counter()
        for i in range(n):
            params, opt_state, scores = step(
                params, opt_state, jnp.asarray(i), b
            )
        float(scores["mse"])  # force completion
        return time.perf_counter() - t0

    _hb("compile start: gencast train step")
    run(2)
    _hb(f"compile done: gencast step; timing {5 * iters} steps")
    t_long = run(4 * iters)
    t_short = run(iters)
    sec = (t_long - t_short) / (3 * iters)
    out = dict(
        ms_per_step=1e3 * sec,
        examples_per_sec=batch / sec,
    )
    if flops:
        out["achieved_tflops"] = flops / sec / 1e12
        out["mfu_pct"] = 100.0 * flops / sec / PEAK_BF16_FLOPS
    return out


def worker_train_nonauto(batch=64, iters=16):
    """DeepONet (non-auto regime) jitted train step: 1000 random
    lattice-point samples per step, the workload of the reference's
    only other timing harness (``src/train.py:94-100`` measures this
    path at batch 1 on CUDA)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.nonauto import DeepONet
    from cfdbench_tpu.training.optim import make_adam
    from cfdbench_tpu.training.trainer_nonauto import (
        NonAutoTask,
        TrainState,
        make_train_step,
    )

    rng = np.random.default_rng(0)
    task = NonAutoTask(
        DeepONet(n_case_params=5), loss_name_to_fn("nmse")
    )
    b = dict(
        case_params=jnp.asarray(
            rng.standard_normal((batch, 5)), jnp.float32
        ),
        t=jnp.asarray(rng.uniform(0, 10, (batch, 1)), jnp.float32),
        labels=jnp.asarray(
            rng.standard_normal((batch, 64, 64, 1)), jnp.float32
        ),
        weights=jnp.ones((batch,), jnp.float32),
    )
    params = task.init_params(jax.random.PRNGKey(0), b)
    tx = make_adam(1e-3, steps_per_epoch=100)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(task, tx, seed=0, grid_hw=(64, 64))

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, scores = step(state, b)
        float(scores["mse"])
        return time.perf_counter() - t0

    run(2)
    t_long = run(4 * iters)
    t_short = run(iters)
    sec = (t_long - t_short) / (3 * iters)
    return dict(
        ms_per_step=1e3 * sec, examples_per_sec=batch / sec
    )


def worker_train_loop(batch=16, n_examples=2048, prefetch=2,
                      lazy_scores=True, mixed=True):
    """Throughput of the REAL trainer inner loop (host batching +
    device placement + jitted step + loss bookkeeping), not just the
    isolated step: measures the async double-buffered input pipeline
    (``data.pipeline.device_prefetch``) and the device-side loss
    accumulation against the synchronous per-step alternative
    (``prefetch=0, lazy_scores=False`` emulates the reference's
    per-batch ``.cuda()`` + per-step ``loss.item()`` structure,
    ``src/train_auto.py:228-257``)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfdbench_tpu.data.pipeline import batches, device_prefetch
    from cfdbench_tpu.training.optim import make_adam
    from cfdbench_tpu.training.trainer_auto import (
        TrainState,
        make_train_step,
    )

    task, params, f0, cp, mask, mstate = _setup(batch)
    if mixed:
        task.compute_dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    arrays = dict(
        inputs=rng.standard_normal((n_examples, 64, 64, 2)).astype(
            np.float32
        ),
        labels=rng.standard_normal((n_examples, 64, 64, 2)).astype(
            np.float32
        ),
        mask=np.ones((n_examples, 64, 64, 1), np.float32),
        case_params=rng.standard_normal((n_examples, 5)).astype(
            np.float32
        ),
    )
    tx = make_adam(1e-3, steps_per_epoch=100)
    state = TrainState(
        params, mstate, tx.init(params), jnp.zeros((), jnp.int32)
    )
    step = make_train_step(task, tx)

    def epoch(state, n=None):
        # one epoch over arrays; returns (state, steps, last scores)
        it = batches(
            arrays, batch, shuffle=True,
            rng=np.random.default_rng(1),
        )
        if prefetch:
            it = device_prefetch(it, size=prefetch)
        losses = []
        k = 0
        for b in it:
            if not prefetch:
                b = jax.device_put(b)
            state, scores = step(state, b)
            if lazy_scores:
                losses.append(scores["mse"])
            else:
                losses.append(float(scores["mse"]))
            k += 1
            if n and k >= n:
                break
        if lazy_scores:
            np.asarray(jnp.stack(losses))
        return state, k, scores

    state, _, scores = epoch(state, n=4)  # warmup/compile
    float(scores["mse"])
    t0 = time.perf_counter()
    state, k, scores = epoch(state)
    float(scores["mse"])
    dt = time.perf_counter() - t0
    return dict(
        steps_per_sec=k / dt,
        examples_per_sec=k * batch / dt,
        ms_per_step=1e3 * dt / k,
    )


def worker_baseline(steps=20, n_cases=16):
    """Reference execution structure: per-case Python loop, batch 1, one
    device dispatch per step, completion forced per case chain."""
    import jax

    task, params, frame0, case_params, mask, _ = _setup(n_cases)
    step_fn = jax.jit(lambda p, f, cp, m: task.predict_frame(p, f, cp, m))

    def run(s):
        cur = step_fn(params, frame0[:1], case_params[:1], mask[:1])
        float(cur.sum())  # warmup/compile
        t0 = time.perf_counter()
        for c in range(n_cases):
            cur = frame0[c: c + 1]
            for _ in range(s):
                cur = step_fn(
                    params, cur, case_params[c: c + 1], mask[c: c + 1]
                )
            float(cur.sum())
        return time.perf_counter() - t0

    t_long = run(4 * steps)
    t_short = run(steps)
    marginal = (t_long - t_short) / (3 * steps * n_cases)
    return dict(frames_per_sec=1.0 / marginal)


WORKERS = dict(
    ping=worker_ping,
    rollout=worker_rollout,
    rollout_pallas=worker_rollout_pallas,
    train=worker_train_step,
    train_loop=worker_train_loop,
    train_gencast=worker_train_gencast,
    train_nonauto=worker_train_nonauto,
    baseline=worker_baseline,
)


def run_worker_inproc(spec):
    import os

    import jax

    # CFDBENCH_BENCH_PLATFORM=cpu forces workers onto the host platform
    # (the env var alone is overridden by the axon plugin; the config
    # API wins) — used by the orchestration tests.
    plat = os.environ.get("CFDBENCH_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    # Persistent compilation cache: a hit turns the 1-2 min tunnel
    # compile into <1 s and does not affect measured execution times
    # (slope timing measures steady-state runs). CFDBENCH_XLA_CACHE=0
    # disables.
    if os.environ.get("CFDBENCH_XLA_CACHE", "1") != "0":
        cache = os.path.expanduser("~/.cache/cfdbench_tpu_xla")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0
        )
    if spec.get("precision"):
        jax.config.update("jax_default_matmul_precision", spec["precision"])
    kind = spec["kind"]
    kwargs = {
        k: v for k, v in spec.items() if k not in ("kind", "precision")
    }
    return WORKERS[kind](**kwargs)


class BenchRun:
    """Budgeted, kill-tolerant orchestrator (module docstring §contract).

    State accumulates into ``self.details``/``self.rollout``; after every
    worker the snapshot streams to ``bench_partial.json``. SIGTERM/SIGINT
    prints the final JSON line from the snapshot and exits 0.
    """

    def __init__(self, budget=BUDGET_SEC):
        self.t_start = time.monotonic()
        self.budget = budget
        self.worker_timeout = WORKER_TIMEOUT_SEC
        self.details = {}
        self.rollout = {}
        # Non-batch-sweep headline candidates (e.g. bf16-storage): kept
        # out of self.rollout so details["rollout_fps_bf16"] stays a
        # pure {batch: fps} sweep as the module docstring promises.
        self.headline_extra = {}
        self.skipped = []
        self.deferred = []
        self.child = None
        self.emitted = False
        # Execution-hang wedge detection: the ping-based stretch at
        # startup only catches slow *compiles*; the other observed
        # wedge flavor is a fast ping with large-program *executions*
        # hanging, then recovering in ~350 s (BASELINE.md §wedge,
        # re-observed 2026-08-19: ping 34 s, both rollout workers dead
        # at 240 s). One-shot: after the first worker TIMEOUT, stretch
        # the remaining workers' timeout to min(420 s, remaining/2) —
        # fewer attempts with room to clear the hang beats draining the
        # budget in 240 s bites. Deferred retries pick the stretched
        # value up automatically (they re-resolve self.worker_timeout).
        self.timeout_stretched = False
        self.last_failure_timeout = False
        # --remeasure-baseline prints a {"baseline": ...} dict, not the
        # rollout-metric schema; the signal handler must match it so a
        # driver kill can't masquerade as a 0-valued rollout headline.
        self.baseline_mode = False
        for sig in (signal.SIGTERM, signal.SIGINT):
            signal.signal(sig, self._on_signal)

    def elapsed(self):
        return time.monotonic() - self.t_start

    def remaining(self):
        return self.budget - self.elapsed()

    def _on_signal(self, signum, frame):
        print(f"[bench] caught signal {signum}; emitting partial result",
              file=sys.stderr, flush=True)
        if self.child is not None:
            try:
                self.child.kill()
            except Exception:
                pass
        self.details["interrupted_by_signal"] = signum
        if self.baseline_mode:
            print(json.dumps(
                dict(baseline=None, interrupted_by_signal=signum)
            ), flush=True)
        else:
            self.emit()
        os._exit(0)

    def run(self, spec, retry=True, timeout=None, est=None, apply=None,
            immediate_retry=False):
        """Run one worker subprocess under the global budget; one retry
        on failure (the retry hits the persistent-XLA-cache entries the
        first attempt wrote before timing out).

        The retry is DEFERRED by default: the failed spec is queued and
        re-run only when :meth:`flush_deferred` is called, after the
        rest of the schedule has had its first pass. An immediate retry
        of an expensive worker starves every family after it in the
        schedule (round 5: a unet train worker hitting a tunnel stall
        burned 2x240 s and budget-skipped resnet + gencast); leftover
        budget goes to retries only once each family had its shot.
        ``apply``: result consumer, called on whichever attempt
        succeeds — required for a deferred retry's result to land in
        ``details``. ``immediate_retry=True`` restores the in-place
        retry (the ping probe, where nothing is scheduled behind it).

        ``est``: rough cold-ish cost estimate (seconds). A worker whose
        estimate exceeds the remaining budget is skipped *without*
        consuming any of it, so cheaper workers later in the schedule
        still get their turn (round 4: a resnet train worker burned the
        last 131 s timing out, starving four sub-minute workers)."""
        if self.remaining() < max(MIN_WORKER_SEC, est or 0.0):
            self.skipped.append(spec)
            print(f"[bench] SKIP (budget) {spec}", file=sys.stderr,
                  flush=True)
            return None
        out = self._run_once(spec, timeout)
        if (
            out is None
            and self.last_failure_timeout
            and not self.timeout_stretched
        ):
            # Execution-hang wedge (see __init__): one-shot stretch so
            # the rest of the schedule gets past a ~350 s recovery.
            self.timeout_stretched = True
            stretched = max(
                self.worker_timeout, min(420.0, self.remaining() / 2)
            )
            if stretched > self.worker_timeout:
                self.worker_timeout = stretched
                print(
                    f"[bench] worker timeout after a fast ping: "
                    f"stretching worker timeout -> {stretched:.0f}s",
                    file=sys.stderr, flush=True,
                )
        # The retry honors the same est guard as the first attempt — a
        # crashed expensive worker must not burn the tail workers'
        # remaining budget on a doomed re-run.
        if out is None and retry:
            if immediate_retry and self.remaining() > max(
                MIN_WORKER_SEC, est or 0.0
            ):
                print("[bench]   retrying once", file=sys.stderr,
                      flush=True)
                out = self._run_once(spec, timeout)
            elif not immediate_retry:
                print("[bench]   deferring retry to end of schedule",
                      file=sys.stderr, flush=True)
                self.deferred.append((spec, timeout, est, apply))
        if out is not None and apply is not None:
            apply(out)
        self.write_partial()
        return out

    def flush_deferred(self):
        """Re-run first-pass failures with whatever budget is left (in
        schedule order — headline before cross-family extras)."""
        pending, self.deferred = self.deferred, []
        for spec, timeout, est, apply in pending:
            if self.remaining() < max(MIN_WORKER_SEC, est or 0.0):
                self.skipped.append(spec)
                print(f"[bench] SKIP (budget, deferred retry) {spec}",
                      file=sys.stderr, flush=True)
                continue
            print(f"[bench] deferred retry {spec}", file=sys.stderr,
                  flush=True)
            out = self._run_once(spec, timeout)
            if out is not None and apply is not None:
                apply(out)
            self.write_partial()

    def _run_once(self, spec, timeout=None):
        self.last_failure_timeout = False
        timeout = min(timeout or self.worker_timeout,
                      max(20.0, self.remaining() - 15))
        print(f"[bench] {spec} (timeout {timeout:.0f}s, "
              f"budget left {self.remaining():.0f}s) ...",
              file=sys.stderr, flush=True)
        try:
            # stderr inherited: worker [hb] lines stream to the driver.
            self.child = subprocess.Popen(
                [sys.executable, __file__, "--worker", json.dumps(spec)],
                stdout=subprocess.PIPE, text=True,
            )
            try:
                stdout, _ = self.child.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                self.child.kill()
                self.child.communicate()
                raise
            finally:
                self.child = None
            line = stdout.strip().splitlines()[-1]
            out = json.loads(line)
            print(f"[bench]   -> {out}", file=sys.stderr, flush=True)
            return out
        except Exception as e:  # timeout, crash, parse failure
            self.last_failure_timeout = isinstance(
                e, subprocess.TimeoutExpired
            )
            print(f"[bench]   -> FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            return None

    def snapshot(self):
        details = dict(self.details)
        details["baseline_fps_pinned"] = PINNED_BASELINE_FPS
        details["peak_bf16_tflops"] = PEAK_BF16_FLOPS / 1e12
        details["elapsed_sec"] = round(self.elapsed(), 1)
        details["budget_sec"] = self.budget
        if self.skipped:
            details["skipped_for_budget"] = [
                s.get("kind", "?") + ":" + json.dumps(s)
                for s in self.skipped
            ]
        candidates = {
            k: v
            for k, v in {**self.rollout, **self.headline_extra}.items()
            if v
        }
        headline = max(candidates.values()) if candidates else 0.0
        if candidates:
            details["headline_config"] = "rollout_b" + max(
                candidates, key=candidates.get
            )
        return dict(
            metric="fno_rollout_frames_per_sec_per_chip",
            value=round(headline, 2),
            unit="frames/s",
            vs_baseline=round(headline / PINNED_BASELINE_FPS, 2),
            details=details,
        )

    def write_partial(self):
        try:
            with open(PARTIAL_PATH, "w") as f:
                json.dump(self.snapshot(), f)
        except OSError:
            pass

    def compact_line(self, snap):
        """Distill the full snapshot into the bounded final stdout line:
        core metric keys + a dozen scalar summaries. The full snapshot
        lives in the ``bench_details.json`` sidecar (``details_file``)."""
        d = snap["details"]
        c = dict(
            metric=snap["metric"], value=snap["value"], unit=snap["unit"],
            vs_baseline=snap["vs_baseline"],
        )
        if "stale_value" in snap:
            c["stale_value"] = snap["stale_value"]
            c["stale_age_sec"] = snap.get("stale_age_sec")
        cd = {}
        if "headline_config" in d:
            cd["headline_config"] = d["headline_config"]
        rb = d.get("rollout_fps_bf16") or {}
        if rb.get("128") is not None:
            cd["rollout_fps_b128"] = rb["128"]
        if d.get("rollout_fps_bf16_storage_b128") is not None:
            cd["rollout_fps_bf16_storage_b128"] = d[
                "rollout_fps_bf16_storage_b128"
            ]
        ts = d.get("train_step_b128_mixed") or {}
        for k in ("ms_per_step", "mfu_pct"):
            if k in ts:
                cd[f"train_{k}"] = ts[k]
        for fam in ("unet", "resnet"):
            r = d.get(f"{fam}_rollout_fps_b128")
            if r is not None:
                cd[f"{fam}_rollout_fps_b128"] = r
            t = d.get(f"{fam}_train_b128_mixed") or {}
            if "ms_per_step" in t:
                cd[f"{fam}_train_ms_per_step"] = t["ms_per_step"]
        gc = d.get("gencast_train_b32") or {}
        if "ms_per_step" in gc:
            cd["gencast_train_ms_per_step"] = gc["ms_per_step"]
        na = d.get("deeponet_train_b64") or {}
        if "ms_per_step" in na:
            cd["deeponet_train_ms_per_step"] = na["ms_per_step"]
        tun = d.get("tunnel") or {}
        if "sync_roundtrip_ms" in tun:
            cd["tunnel_sync_ms"] = tun["sync_roundtrip_ms"]
        if "elapsed_sec" in d:
            cd["elapsed_sec"] = d["elapsed_sec"]
        if d.get("skipped_for_budget"):
            cd["n_skipped_for_budget"] = len(d["skipped_for_budget"])
        if "interrupted_by_signal" in d:
            cd["interrupted_by_signal"] = d["interrupted_by_signal"]
        cd["details_file"] = os.path.basename(DETAILS_PATH)
        c["details"] = cd
        # Belt and braces: the picks above are all scalars, but never
        # let the line outgrow the driver's stdout-tail capture again.
        if len(json.dumps(c)) > MAX_LINE_BYTES:
            c["details"] = dict(details_file=cd["details_file"])
        return c

    def emit(self):
        if self.emitted:
            return
        self.emitted = True
        self.write_partial()
        snap = self.snapshot()
        if snap["value"] > 0:
            # Append successful runs to a local history so a later
            # wedge-day run can cite the last real measurement.
            try:
                with open(HISTORY_PATH, "a") as f:
                    f.write(json.dumps(
                        dict(ts=time.time(), value=snap["value"],
                             details=snap["details"])
                    ) + "\n")
            except OSError:
                pass
        else:
            # Nothing measured (wedged tunnel — BASELINE.md §wedge):
            # attach the most recent successful run, clearly labeled,
            # so the artifact still carries real numbers + provenance.
            # stale_value is a machine-usable top-level mirror.
            try:
                with open(HISTORY_PATH) as f:
                    lines = [ln for ln in f.read().splitlines() if ln]
                if lines:
                    last = json.loads(lines[-1])
                    snap["details"]["last_known_good"] = dict(
                        note=(
                            "this run measured nothing (backend "
                            "wedged); most recent successful bench "
                            "on this machine follows"
                        ),
                        age_sec=round(time.time() - last["ts"], 0),
                        value=last["value"],
                        details=last["details"],
                    )
                    snap["stale_value"] = last["value"]
                    snap["stale_age_sec"] = round(
                        time.time() - last["ts"], 0
                    )
            except (OSError, ValueError):
                pass
        try:
            with open(DETAILS_PATH, "w") as f:
                json.dump(snap, f, indent=1)
        except OSError:
            pass
        print(json.dumps(self.compact_line(snap)), flush=True)


def main():
    if "--worker" in sys.argv:
        spec = json.loads(sys.argv[sys.argv.index("--worker") + 1])
        print(json.dumps(run_worker_inproc(spec)), flush=True)
        return

    if "--remeasure-baseline" in sys.argv:
        br = BenchRun()
        br.baseline_mode = True
        out = br.run(dict(kind="baseline"), immediate_retry=True)
        print(json.dumps(dict(baseline=out)))
        return

    br = BenchRun()
    details = br.details

    # 0. Tunnel liveness/latency probe — a dead or cold tunnel fails
    # HERE (cheap + retried), not inside the headline worker. On slow
    # days (observed: first EXECUTION after a warm compile can take
    # minutes; the compile itself is cache-fast) the ping duration is
    # used to stretch per-worker timeouts: fewer workers with room to
    # finish beats many workers that all hit a too-short timeout.
    t_ping = time.monotonic()
    ping = br.run(dict(kind="ping"), timeout=330.0, immediate_retry=True)
    ping_sec = time.monotonic() - t_ping
    if ping:
        ping["ping_wall_sec"] = round(ping_sec, 1)
        details["tunnel"] = ping
    if ping_sec > 90:
        br.worker_timeout = max(br.worker_timeout, min(420.0, br.budget / 2))
        print(f"[bench] slow tunnel (ping {ping_sec:.0f}s): worker "
              f"timeout -> {br.worker_timeout:.0f}s", file=sys.stderr,
              flush=True)

    # 1. HEADLINE first — and the *winning* headline config first of
    # all: the bf16-storage rollout (`--rollout_dtype bfloat16`,
    # user-reachable since round 4, 0.60% rel-L2 deviation —
    # BASELINE.md) has measured fastest, so on a wedge-starved day
    # where only one worker fits the remaining budget it must be this
    # one. It competes for the headline via headline_extra (kept out
    # of the rollout_fps_bf16 batch sweep). Then the f32-storage b128
    # rollout and the flagship train step.
    def apply_bf16s(out):
        fps = round(out["frames_per_sec"], 1)
        details["rollout_fps_bf16_storage_b128"] = fps
        br.headline_extra["128_bf16_storage"] = fps

    details["rollout_fps_bf16_storage_b128"] = None
    br.headline_extra["128_bf16_storage"] = None
    br.run(dict(kind="rollout", batch=128, dtype="bfloat16"),
           apply=apply_bf16s)

    br.rollout["128"] = None
    details["rollout_fps_bf16"] = br.rollout
    br.run(
        dict(kind="rollout", batch=128),
        apply=lambda out: br.rollout.__setitem__(
            "128", round(out["frames_per_sec"], 1)
        ),
    )

    # Flagship train step: MIXED precision is the optimized default
    # (bf16 fwd/bwd, f32 master — what --use_mixed_precision drives).
    def apply_train(train):
        details["train_step_b128_mixed"] = dict(
            ms_per_step=round(train["ms_per_step"], 3),
            flops_per_step=round(train["flops_per_step"]),
            achieved_tflops=round(train["achieved_tflops"], 2),
            mfu_pct=round(train["mfu_pct"], 2),
            examples_per_sec=round(train["examples_per_sec"], 1),
        )

    br.run(dict(kind="train", batch=128), apply=apply_train)

    # 2. CROSS-FAMILY coverage — every model family inside the default
    # budget (round 4's schedule front-loaded FNO sweeps and starved
    # these). Conv family (UNet / ResNet): train + rollout — the
    # reference's timing harness scope covers any --model
    # (src/train_auto.py:124-130). Cost estimates from measured runs
    # (BASELINE.md): heavy-compile workers annotated so a thin
    # remaining budget skips them in favor of the cheap tail workers.
    for m in ("unet", "resnet"):
        def apply_t(t, m=m):
            row = dict(
                ms_per_step=round(t["ms_per_step"], 3),
                examples_per_sec=round(t["examples_per_sec"], 1),
            )
            if "mfu_pct" in t:  # absent when XLA cost analysis fails
                row["mfu_pct"] = round(t["mfu_pct"], 2)
            details[f"{m}_train_b128_mixed"] = row

        br.run(dict(kind="train", batch=128, model=m),
               est=180.0 if m == "resnet" else 90.0, apply=apply_t)

        def apply_r(r, m=m):
            details[f"{m}_rollout_fps_b128"] = round(
                r["frames_per_sec"], 1
            )

        br.run(dict(kind="rollout", batch=128, model=m),
               est=120.0 if m == "resnet" else 60.0, apply=apply_r)
    br.run(
        dict(kind="train_gencast", batch=32), est=150.0,
        apply=lambda gc: details.__setitem__(
            "gencast_train_b32", {k: round(v, 2) for k, v in gc.items()}
        ),
    )
    br.run(
        dict(kind="train_nonauto", batch=64),
        apply=lambda na: details.__setitem__(
            "deeponet_train_b64", {k: round(v, 2) for k, v in na.items()}
        ),
    )
    # First-pass failures get their retries now, before the extended
    # tier can touch the remaining budget: one complete family table
    # outranks precision-forensics sweeps.
    br.flush_deferred()

    # 3. EXTENDED tier (--extended): the now-settled FNO sweep variants
    # — useful for precision forensics, but they must never again crowd
    # the cross-family table out of the budget.
    if "--extended" in sys.argv:
        for batch in (16, 512):
            br.rollout[str(batch)] = None
            br.run(
                dict(kind="rollout", batch=batch),
                apply=lambda out, b=str(batch): br.rollout.__setitem__(
                    b, round(out["frames_per_sec"], 1)
                ),
            )
        details["rollout_fps_f32_b128"] = None
        br.run(
            dict(kind="rollout", batch=128, precision="highest"),
            apply=lambda f32: details.__setitem__(
                "rollout_fps_f32_b128", round(f32["frames_per_sec"], 1)
            ),
        )

        # Train-step precision variants. ``train_step_b128`` is kept as
        # a legacy alias of the f32-storage row (the pre-round-3 default
        # semantics of that key) for historical comparability.
        def apply_f32s(train_f32s):
            details["train_step_b128_f32_storage"] = dict(
                ms_per_step=round(train_f32s["ms_per_step"], 3),
                mfu_pct=round(train_f32s["mfu_pct"], 2),
            )
            details["train_step_b128"] = dict(
                details["train_step_b128_f32_storage"],
                legacy_alias_of="train_step_b128_f32_storage",
            )

        br.run(dict(kind="train", batch=128, mixed=False),
               apply=apply_f32s)
        br.run(
            dict(kind="train", batch=128, mixed=False,
                 precision="highest"),
            apply=lambda train_f32: details.__setitem__(
                "train_step_b128_f32",
                dict(
                    ms_per_step=round(train_f32["ms_per_step"], 3),
                    achieved_tflops=round(
                        train_f32["achieved_tflops"], 2
                    ),
                ),
            ),
        )
        # End-to-end trainer-loop throughput at small batch: async
        # double-buffered feed + device-side losses vs the synchronous
        # reference-style structure (per-batch .cuda() + loss.item()).
        loops = {}
        br.run(
            dict(kind="train_loop", batch=16, prefetch=2,
                 lazy_scores=True),
            apply=lambda o: loops.__setitem__("async", o),
        )
        br.run(
            dict(kind="train_loop", batch=16, prefetch=0,
                 lazy_scores=False),
            apply=lambda o: loops.__setitem__("sync", o),
        )
        # Pallas head (XLA-vs-Pallas head timing): only batch_tile=1
        # compiles on this backend (tiles ≥2 exceed the 16M scoped-vmem
        # stack limit); measured 2026-08-16: pallas 14.5k vs xla
        # 61.2k f/s — XLA fusion wins, recorded in PARITY.md §perf.
        details["head_xla_vs_pallas_b128"] = None
        br.run(
            dict(kind="rollout_pallas", batch=128, batch_tile=1),
            apply=lambda out: details.__setitem__(
                "head_xla_vs_pallas_b128",
                {k: round(v, 1) for k, v in out.items()},
            ),
        )
        br.flush_deferred()
        # The loop pair's combined row is computed after the deferred
        # retries so a first-pass failure of either half can still
        # complete the comparison.
        if "async" in loops and "sync" in loops:
            details["trainer_loop_b16"] = dict(
                async_ms_per_step=round(loops["async"]["ms_per_step"], 2),
                sync_ms_per_step=round(loops["sync"]["ms_per_step"], 2),
                speedup=round(
                    loops["sync"]["ms_per_step"]
                    / loops["async"]["ms_per_step"], 2
                ),
            )

    br.emit()


if __name__ == "__main__":
    main()
