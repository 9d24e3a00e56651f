#!/usr/bin/env python
"""Benchmark: FNO rollout throughput + training-step MFU.

Prints ONE JSON line to stdout:
``{"metric", "value", "unit", "vs_baseline", "details": {...}}``.

Headline: rollout frames/sec/chip of the flagship config (FNO d4 h32
m12 on 64×64 fields, 20-step autoregressive rollout) at the best
measured batch size. ``details`` carries the full story:

- ``rollout_fps``: frames/s at batch {16, 128, 512} (bf16 matmuls —
  XLA's TPU default) and at batch 128 with f32 (``highest``) matmuls.
- ``train_step``: jitted fused train-step (fwd+bwd+Adam) wall time at
  batch 128, FLOPs/step from XLA's cost model (analytic fallback), and
  **MFU%** against the chip's bf16 peak.
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
"""

import functools
import json
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
    float(sink(params, frame0, case_params, mask))  # warmup/compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(sink(params, frame0, case_params, mask))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


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


def _analytic_fno_forward_flops(batch):
    """Matmul FLOPs of one flagship-FNO forward (packed spectral path),
    per batch; fallback when XLA cost analysis is unavailable."""
    h, w, c = FLAGSHIP["h"], FLAGSHIP["w"], FLAGSHIP["hidden"]
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
                      model="fno"):
    """``mixed=True`` (the optimized default since round 3) measures
    the true-mixed-precision step: bf16 params+activations in fwd/bwd,
    f32 master weights/optimizer/loss — the same path
    ``--use_mixed_precision`` drives in the trainers. ``mixed=False``
    measures the all-f32-storage step (matmuls are still bf16, XLA's
    TPU default)."""
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
    tx = make_adam(1e-3, steps_per_epoch=100)
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
        flops = 3.0 * _analytic_fno_forward_flops(batch)

    def run(n):
        nonlocal task_state
        t0 = time.perf_counter()
        for _ in range(n):
            task_state, scores = step(task_state, batch_dict)
        float(scores["mse"])  # force completion (host transfer)
        return time.perf_counter() - t0

    run(2)  # warmup/compile
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

    run(2)
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


def run_worker_subprocess(spec, timeout=900):
    """Each config in its own process: few compiles per process (the
    tunneled backend wedges on compile-heavy processes)."""
    print(f"[bench] {spec} ...", file=sys.stderr, flush=True)
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--worker", json.dumps(spec)],
            capture_output=True, text=True, timeout=timeout,
        )
        line = proc.stdout.strip().splitlines()[-1]
        out = json.loads(line)
        print(f"[bench]   -> {out}", file=sys.stderr, flush=True)
        return out
    except Exception as e:  # timeout, crash, parse failure
        print(f"[bench]   -> FAILED: {e}", file=sys.stderr, flush=True)
        return None


def main():
    if "--worker" in sys.argv:
        spec = json.loads(sys.argv[sys.argv.index("--worker") + 1])
        print(json.dumps(run_worker_inproc(spec)), flush=True)
        return

    if "--remeasure-baseline" in sys.argv:
        out = run_worker_subprocess(dict(kind="baseline"))
        print(json.dumps(dict(baseline=out)))
        return

    details = {}
    rollout = {}
    for batch in (16, 128, 512):
        out = run_worker_subprocess(dict(kind="rollout", batch=batch))
        rollout[str(batch)] = (
            round(out["frames_per_sec"], 1) if out else None
        )
    details["rollout_fps_bf16"] = rollout
    f32 = run_worker_subprocess(
        dict(kind="rollout", batch=128, precision="highest")
    )
    details["rollout_fps_f32_b128"] = (
        round(f32["frames_per_sec"], 1) if f32 else None
    )
    bf16s = run_worker_subprocess(
        dict(kind="rollout", batch=128, dtype="bfloat16")
    )
    details["rollout_fps_bf16_storage_b128"] = (
        round(bf16s["frames_per_sec"], 1) if bf16s else None
    )

    # Flagship train step: MIXED precision is the optimized default
    # (bf16 fwd/bwd, f32 master — what --use_mixed_precision drives);
    # f32-storage and f32-matmul (highest) variants for reference.
    train = run_worker_subprocess(dict(kind="train", batch=128))
    if train:
        details["train_step_b128_mixed"] = dict(
            ms_per_step=round(train["ms_per_step"], 3),
            flops_per_step=round(train["flops_per_step"]),
            achieved_tflops=round(train["achieved_tflops"], 2),
            mfu_pct=round(train["mfu_pct"], 2),
            examples_per_sec=round(train["examples_per_sec"], 1),
        )
    train_f32s = run_worker_subprocess(
        dict(kind="train", batch=128, mixed=False)
    )
    if train_f32s:
        details["train_step_b128_f32_storage"] = dict(
            ms_per_step=round(train_f32s["ms_per_step"], 3),
            mfu_pct=round(train_f32s["mfu_pct"], 2),
        )
    train_f32 = run_worker_subprocess(
        dict(kind="train", batch=128, mixed=False, precision="highest")
    )
    if train_f32:
        details["train_step_b128_f32"] = dict(
            ms_per_step=round(train_f32["ms_per_step"], 3),
            achieved_tflops=round(train_f32["achieved_tflops"], 2),
        )
    # Conv family (UNet / ResNet): train + rollout — the reference's
    # timing harness scope covers any --model (src/train_auto.py:124-130).
    for m in ("unet", "resnet"):
        t = run_worker_subprocess(
            dict(kind="train", batch=128, model=m)
        )
        if t:
            row = dict(
                ms_per_step=round(t["ms_per_step"], 3),
                examples_per_sec=round(t["examples_per_sec"], 1),
            )
            if "mfu_pct" in t:  # absent when XLA cost analysis fails
                row["mfu_pct"] = round(t["mfu_pct"], 2)
            details[f"{m}_train_b128_mixed"] = row
        r = run_worker_subprocess(
            dict(kind="rollout", batch=128, model=m)
        )
        if r:
            details[f"{m}_rollout_fps_b128"] = round(
                r["frames_per_sec"], 1
            )
    gc = run_worker_subprocess(dict(kind="train_gencast", batch=32))
    if gc:
        details["gencast_train_b32"] = {
            k: round(v, 2) for k, v in gc.items()
        }
    na = run_worker_subprocess(dict(kind="train_nonauto", batch=64))
    if na:
        details["deeponet_train_b64"] = {
            k: round(v, 2) for k, v in na.items()
        }
    # End-to-end trainer-loop throughput at small batch: async
    # double-buffered feed + device-side losses vs the synchronous
    # reference-style structure (per-batch .cuda() + loss.item()).
    loop_async = run_worker_subprocess(
        dict(kind="train_loop", batch=16, prefetch=2, lazy_scores=True)
    )
    loop_sync = run_worker_subprocess(
        dict(kind="train_loop", batch=16, prefetch=0, lazy_scores=False)
    )
    if loop_async and loop_sync:
        details["trainer_loop_b16"] = dict(
            async_ms_per_step=round(loop_async["ms_per_step"], 2),
            sync_ms_per_step=round(loop_sync["ms_per_step"], 2),
            speedup=round(
                loop_sync["ms_per_step"] / loop_async["ms_per_step"], 2
            ),
        )
    # Pallas head (XLA-vs-Pallas head timing): only batch_tile=1
    # compiles on this backend (tiles ≥2 exceed the 16M scoped-vmem
    # stack limit); measured 2026-08-16: pallas 14.5k vs xla 61.2k f/s
    # — XLA fusion wins, recorded in PARITY.md §perf.
    out = run_worker_subprocess(
        dict(kind="rollout_pallas", batch=128, batch_tile=1)
    )
    details["head_xla_vs_pallas_b128"] = (
        {k: round(v, 1) for k, v in out.items()} if out else None
    )

    details["baseline_fps_pinned"] = PINNED_BASELINE_FPS
    details["peak_bf16_tflops"] = PEAK_BF16_FLOPS / 1e12

    candidates = [v for v in rollout.values() if v]
    headline = max(candidates) if candidates else 0.0
    print(
        json.dumps(
            dict(
                metric="fno_rollout_frames_per_sec_per_chip",
                value=round(headline, 2),
                unit="frames/s",
                vs_baseline=round(headline / PINNED_BASELINE_FPS, 2),
                details=details,
            )
        )
    )


if __name__ == "__main__":
    main()
