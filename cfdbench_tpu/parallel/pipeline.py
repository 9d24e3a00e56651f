"""Pipeline parallelism (pp): GPipe-style microbatch pipelining.

The reference has no parallelism of any kind (SURVEY.md §2, parallelism
note); like dp/tp/sp this subsystem is TPU-greenfield. It exists for
scaled-up configurations (deep/wide FNO stacks, e.g. hidden_dim ≥ 256
where one chip's HBM bounds the batch — BASELINE.md's width sweep shows
the HBM ceiling): the depth dimension is split into stages over the
mesh's ``model`` axis, and microbatches stream through the stages with
``jax.lax.ppermute`` moving activations stage→stage over ICI.

Design (TPU-native, single program):
- ``shard_map`` over the full ``(data, model)`` mesh: the batch stays
  sharded over ``data`` (dp), stage parameters are sharded over
  ``model`` along a leading stage axis (each device holds only its own
  stage's blocks — the point of pp: parameter memory scales 1/S).
- One ``lax.scan`` over ``n_micro + S − 1`` ticks; each tick every
  device applies its stage to its current microbatch and ppermutes the
  activation to the next stage (the classic GPipe schedule — bubble
  fraction (S−1)/(n_micro+S−1)).
- The lift (fc0) runs only on stage 0 and the head (fc1→GELU→fc2→mask)
  only on stage S−1, gated by ``lax.cond`` on the stage index (one SPMD
  program, runtime-divergent branches — no compute-and-discard waste).
- Differentiable end-to-end: ``jax.grad`` through scan + ppermute gives
  the exact single-device gradients (1F1B scheduling is a memory
  optimization the 64×64 benchmark does not need).

Numerical parity with the single-device forward/backward is unit-tested
on a CPU mesh (tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
try:
    from jax import shard_map as _shard_map

    _SHARD_KW = {"check_vma": False}
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map

    _SHARD_KW = {"check_rep": False}
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import (
    broadcast_params_to_channels,
    coord_channels,
    dense_thin,
    ensure_mask,
    gelu_exact,
)
from ..ops import spectral
from ..ops.spectral import spectral_conv2d
from .mesh import DATA_AXIS, MODEL_AXIS


def _dense(p, x):
    inner = p["Dense_0"]
    return x @ inner["kernel"] + inner["bias"]


def stack_stage_params(params, n_stages: int, num_layers: int):
    """Split the flax FNO param tree into (stacked block stages, rest).

    Returns ``(stages, lift, fc1, fc2)`` where ``stages`` is the block
    param tree with a leading ``(n_stages, layers_per_stage)`` axis —
    the leading axis is what gets sharded over ``model``.
    """
    assert num_layers % n_stages == 0, (
        f"{num_layers} blocks cannot split into {n_stages} equal stages"
    )
    per = num_layers // n_stages
    blocks = [params[f"FnoBlock_{i}"] for i in range(num_layers)]
    grouped = [
        jax.tree.map(lambda *xs: jnp.stack(xs), *blocks[s * per:(s + 1) * per])
        for s in range(n_stages)
    ]
    stages = jax.tree.map(lambda *xs: jnp.stack(xs), *grouped)
    return stages, params["Dense_0"], params["Dense_1"], params["Dense_2"]


def pp_pack_params(params, n_stages: int, num_layers: int):
    """Standard flax FNO tree → the pp training layout: stacked stage
    blocks + the replicated lift/head parts, as one dict pytree.

    Packing ONCE at trainer setup (instead of restacking inside every
    jitted step) removes a ~params-sized HBM copy from each step's
    forward (plus its unstack in the backward) — pp targets exactly the
    wide configs where spectral weights dominate traffic
    (BASELINE.md §anatomy)."""
    stages, lift, fc1, fc2 = stack_stage_params(
        params, n_stages, num_layers
    )
    return dict(stages=stages, lift=lift, fc1=fc1, fc2=fc2)


def pp_unpack_params(pp_params, num_layers: int):
    """Inverse of :func:`pp_pack_params` — back to the standard flax
    tree (for eval, ckpt-{ep} saves, and the trainer's return value, so
    the on-disk checkpoint format is identical to non-pp runs)."""
    stages = pp_params["stages"]
    S = jax.tree.leaves(stages)[0].shape[0]
    per = num_layers // S
    out = {
        "Dense_0": pp_params["lift"],
        "Dense_1": pp_params["fc1"],
        "Dense_2": pp_params["fc2"],
    }
    for s in range(S):
        for j in range(per):
            out[f"FnoBlock_{s * per + j}"] = jax.tree.map(
                lambda a, s=s, j=j: a[s, j], stages
            )
    return out


def pp_map_paramlike(tree, example, fn):
    """Apply ``fn`` to every subtree of ``tree`` whose pytree structure
    equals ``example``'s, passing all other leaves through.

    This is how the trainer converts a full ``TrainState`` between the
    packed pp layout and the standard flax layout: ``params`` itself and
    the optimizer's param-shaped moment trees (Adam ``mu``/``nu`` —
    ``optax`` inits them by ``tree.map`` over params, so their structure
    is identical) all match ``example`` and get converted; scalars like
    Adam's ``count`` pass through. Keeps the on-disk ``training_state``
    snapshot in the standard layout — resumable across different
    model-axis sizes and by pre-packed-layout checkpoints."""
    tdef = jax.tree.structure(example)

    def is_match(x):
        try:
            return jax.tree.structure(x) == tdef
        except Exception:
            return False

    return jax.tree.map(
        lambda x: fn(x) if is_match(x) else x, tree, is_leaf=is_match
    )


def pp_state_to_std(state, packed_example, num_layers: int):
    """Training state with packed-layout subtrees → standard layout."""
    return pp_map_paramlike(
        state, packed_example, lambda p: pp_unpack_params(p, num_layers)
    )


def pp_state_from_std(state, std_example, n_stages: int, num_layers: int):
    """Inverse of :func:`pp_state_to_std`."""
    return pp_map_paramlike(
        state, std_example,
        lambda p: pp_pack_params(p, n_stages, num_layers),
    )


def pp_param_shardings(mesh: Mesh, pp_params):
    """NamedSharding tree for the packed layout: stage blocks sharded
    1/S over the model axis (each chip holds only its own stages'
    params — and, via ``tx.init`` on this tree, only its own optimizer
    moments), lift/head replicated."""
    staged = NamedSharding(mesh, P(MODEL_AXIS))
    rep = NamedSharding(mesh, P())
    return dict(
        stages=jax.tree.map(lambda _: staged, pp_params["stages"]),
        lift=jax.tree.map(lambda _: rep, pp_params["lift"]),
        fc1=jax.tree.map(lambda _: rep, pp_params["fc1"]),
        fc2=jax.tree.map(lambda _: rep, pp_params["fc2"]),
    )


def make_pipelined_fno_forward(
    model,
    mesh: Mesh,
    n_micro: int,
    n_stages: Optional[int] = None,
    prestacked: bool = False,
):
    """Build ``fn(params, inputs, case_params, mask) -> preds`` running
    the FNO forward pipeline-parallel over ``mesh``'s ``model`` axis.

    ``params`` is the standard single-device flax tree (restacked
    internally, so the same checkpoint drives pp and non-pp paths) —
    or, with ``prestacked=True``, the :func:`pp_pack_params` layout
    (the trainer's steady-state path: no per-step restack, stage
    params stay sharded 1/S over the model axis).
    The global batch must divide into ``n_micro`` microbatches, and the
    per-dp-shard microbatch must be whole.
    """
    assert model.padding is None, "pp path assumes no domain padding"
    S = n_stages or mesh.shape[MODEL_AXIS]
    assert S == mesh.shape[MODEL_AXIS], (
        "n_stages must equal the mesh's model-axis size"
    )
    L = model.num_layers // S
    m1, m2 = model.modes1, model.modes2

    def block_apply(bp, x):
        # Inside the shard_map body x.shape[0] is already the LOCAL
        # per-chip microbatch — resolve "auto" from it directly rather
        # than letting spectral_conv2d's auto branch divide by
        # AUTO_DATA_SHARDS a second time. Explicit (non-auto) backend
        # choices pass through untouched.
        b = spectral.SPECTRAL_BACKEND
        if b == "auto":
            b = spectral.auto_backend_for(x.shape[0])
        x1 = spectral_conv2d(
            x, bp["SpectralConv2d_0"]["weights"], m1, m2, backend=b
        )
        x2 = _dense(bp["Dense_0"], x)
        return gelu_exact(x1 + x2)

    def stage_apply(stage_params, x):
        # stage_params leaves: (1, L, ...) on this device
        for j in range(L):
            bp = jax.tree.map(lambda a: a[0, j], stage_params)
            x = block_apply(bp, x)
        return x

    def lift(lift_p, frame, case_params, mask):
        mb, H, W, _ = frame.shape
        x = jnp.concatenate(
            [
                frame,
                mask,
                coord_channels(mb, H, W, frame.dtype),
                broadcast_params_to_channels(case_params, H, W),
            ],
            axis=-1,
        )
        return _dense(lift_p, x)

    def head(fc1, fc2, x, mask):
        h = gelu_exact(_dense(fc1, x))
        # dense_thin: same numerics as the plain matmul, but the
        # backward avoids the degenerate K=out_chan transpose dot that
        # models/common.py::dense_thin eliminated on the single-device
        # path — pp targets exactly the large configs where that op
        # was most expensive (BASELINE.md §anatomy).
        inner = fc2["Dense_0"]
        return dense_thin(h, inner["kernel"], inner["bias"]) * mask

    def shard_body(stages, lift_p, fc1_p, fc2_p, inputs, case_params, mask):
        """Runs per (data, model) shard. inputs: (B_local, H, W, Cin)."""
        idx = jax.lax.axis_index(MODEL_AXIS)
        B_local, H, W, Cin = inputs.shape
        assert B_local % n_micro == 0, (
            f"per-shard batch {B_local} not divisible into {n_micro} "
            "microbatches"
        )
        mb = B_local // n_micro
        micro_x = inputs.reshape(n_micro, mb, H, W, Cin)
        micro_cp = case_params.reshape(n_micro, mb, -1)
        micro_m = mask.reshape(n_micro, mb, H, W, 1)

        T = n_micro + S - 1
        state0 = jnp.zeros((mb, H, W, model.hidden_dim), inputs.dtype)
        out0 = jnp.zeros((n_micro, mb, H, W, model.out_chan), inputs.dtype)

        def tick(carry, t):
            state, outs = carry
            src = jnp.clip(t, 0, n_micro - 1)
            # Stage-conditional lift/head: only stage 0 computes the
            # lift and only stage S−1 computes the head. Under SPMD
            # every device compiles both branches but executes one at
            # runtime (axis_index is uniform per shard), so the other
            # stages skip the work instead of computing-and-discarding.
            inp = jax.lax.cond(
                idx == 0,
                lambda: lift(
                    lift_p, micro_x[src], micro_cp[src], micro_m[src]
                ),
                lambda: state,
            )
            act = stage_apply(stages, inp)
            out_m = micro_m[jnp.clip(t - (S - 1), 0, n_micro - 1)]
            frame = jax.lax.cond(
                idx == S - 1,
                lambda: head(fc1_p, fc2_p, act, out_m),
                lambda: jnp.zeros(
                    act.shape[:3] + (model.out_chan,), act.dtype
                ),
            )
            dst = t - (S - 1)
            valid = jnp.logical_and(t >= S - 1, idx == S - 1)
            outs = jax.lax.dynamic_update_slice(
                outs,
                jnp.where(valid, frame, outs[jnp.clip(dst, 0, n_micro - 1)])[
                    None
                ],
                (jnp.clip(dst, 0, n_micro - 1), 0, 0, 0, 0),
            )
            if S > 1:
                nxt = jax.lax.ppermute(
                    act,
                    MODEL_AXIS,
                    [(i, i + 1) for i in range(S - 1)],
                )
            else:
                nxt = act
            return (nxt, outs), None

        (_, outs), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(T)
        )
        # Only stage S−1 holds real outputs; broadcast them to every
        # stage so the result is replicated over the model axis.
        outs = jax.lax.psum(
            jnp.where(idx == S - 1, outs, jnp.zeros_like(outs)),
            MODEL_AXIS,
        )
        return outs.reshape(B_local, H, W, model.out_chan)

    in_specs = (
        P(MODEL_AXIS),  # stage params: leading stage axis (prefix spec)
        P(),  # lift params replicated
        P(),  # fc1
        P(),  # fc2
        P(DATA_AXIS),  # inputs
        P(DATA_AXIS),  # case_params
        P(DATA_AXIS),  # mask
    )

    sharded = _shard_map(
        shard_body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(DATA_AXIS),
        **_SHARD_KW,
    )

    @jax.jit
    def fn(params, inputs, case_params, mask):
        B, H, W, _ = inputs.shape
        mask = ensure_mask(mask, B, H, W)
        if prestacked:
            stages, lift_p, fc1_p, fc2_p = (
                params["stages"], params["lift"],
                params["fc1"], params["fc2"],
            )
        else:
            stages, lift_p, fc1_p, fc2_p = stack_stage_params(
                params, S, model.num_layers
            )
        return sharded(
            stages, lift_p, fc1_p, fc2_p, inputs, case_params, mask
        )

    return fn
