"""Parallelism: dp and dp×tp runs match single-device numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdbench_tpu.metrics import loss_name_to_fn
from cfdbench_tpu.models.fno import Fno2d
from cfdbench_tpu.parallel.mesh import batch_sharding, make_mesh
from cfdbench_tpu.parallel.sharding_rules import param_shardings, shard_params
from cfdbench_tpu.training.optim import make_adam
from cfdbench_tpu.training.trainer_auto import (
    AutoTask,
    TrainState,
    make_train_step,
)


def _setup(rng):
    model = Fno2d(
        in_chan=2, out_chan=2, n_case_params=5, num_layers=2,
        modes1=4, modes2=4, hidden_dim=8,
    )
    task = AutoTask(model, loss_name_to_fn("nmse"))
    batch = dict(
        inputs=jnp.asarray(rng.standard_normal((8, 16, 16, 2)), jnp.float32),
        labels=jnp.asarray(rng.standard_normal((8, 16, 16, 2)), jnp.float32),
        mask=jnp.ones((8, 16, 16, 1), jnp.float32),
        case_params=jnp.asarray(rng.standard_normal((8, 5)), jnp.float32),
        weights=jnp.ones((8,), jnp.float32),
    )
    return task, batch


def _one_step(task, batch, mesh):
    params, model_state = task.init_variables(jax.random.PRNGKey(0), batch)
    if mesh is not None:
        params = shard_params(params, mesh, min_size=1024)
        batch = jax.device_put(batch, batch_sharding(mesh))
    tx = make_adam(1e-3, steps_per_epoch=10)
    state = TrainState(
        params, model_state, tx.init(params), jnp.zeros((), jnp.int32)
    )
    step = make_train_step(task, tx)
    state, scores = step(state, batch)
    return jax.device_get(state.params), float(scores["nmse"])


def test_make_mesh_sets_spectral_data_shards():
    """The spectral 'auto' backend crossover is per-chip batch; mesh
    construction must record the data-axis size (ADVICE r3 #1)."""
    from cfdbench_tpu.ops import spectral

    before = spectral.AUTO_DATA_SHARDS
    try:
        make_mesh("4x2")
        assert spectral.AUTO_DATA_SHARDS == 4
        make_mesh("8x1")
        assert spectral.AUTO_DATA_SHARDS == 8
        make_mesh("1x1")
        assert spectral.AUTO_DATA_SHARDS == 1
    finally:
        spectral.AUTO_DATA_SHARDS = before


def test_dp_tp_matches_single_device(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    task, batch = _setup(rng)
    p_single, l_single = _one_step(task, batch, None)
    p_dp, l_dp = _one_step(task, batch, make_mesh("8"))
    p_tp, l_tp = _one_step(task, batch, make_mesh("4x2"))
    assert np.isclose(l_single, l_dp, rtol=1e-5)
    assert np.isclose(l_single, l_tp, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(a, b, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_tp)):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_unet_tp_matches_single_device(rng):
    """UNet (BatchNorm model) under dp×tp: batch stats are computed over
    the whole logically-global batch inside one jitted program, so TP/DP
    sharding must not change the numerics."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from cfdbench_tpu.models.unet import UNet

    model = UNet(in_chan=2, out_chan=2, n_case_params=5, dim=4)
    task = AutoTask(model, loss_name_to_fn("nmse"))
    batch = dict(
        inputs=jnp.asarray(rng.standard_normal((8, 16, 16, 2)), jnp.float32),
        labels=jnp.asarray(rng.standard_normal((8, 16, 16, 2)), jnp.float32),
        mask=jnp.ones((8, 16, 16, 1), jnp.float32),
        case_params=jnp.asarray(rng.standard_normal((8, 5)), jnp.float32),
        weights=jnp.ones((8,), jnp.float32),
    )
    def grads_of(mesh):
        params, mstate = task.init_variables(jax.random.PRNGKey(0), batch)
        b = batch
        if mesh is not None:
            params = shard_params(params, mesh, min_size=1024)
            b = jax.device_put(b, batch_sharding(mesh))

        def lf(p):
            return task.loss_scores(
                p, b, model_state=mstate, train=True,
                rng=jax.random.PRNGKey(3),
            )

        g, (scores, _) = jax.jit(jax.grad(lf, has_aux=True))(params)
        return jax.device_get(g), float(scores["nmse"])

    # Compare loss + gradients (post-Adam params are not a meaningful
    # parity target: noise-level grads flip sign under Adam's eps
    # normalization, moving params by ±lr).
    g_single, l_single = grads_of(None)
    for spec in ("8", "4x2"):
        g_mesh, l_mesh = grads_of(make_mesh(spec))
        assert np.isclose(l_single, l_mesh, rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_mesh)):
            np.testing.assert_allclose(a, b, atol=1e-5)


def test_gencast_dp_matches_single_device(rng):
    """GenCast trainer step under pure DP matches single-device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import optax

    from cfdbench_tpu.models.diffusion import GenCastCfdModel
    from cfdbench_tpu.parallel.sharding_rules import shard_params

    task = GenCastCfdModel(
        loss_name_to_fn("nmse"),
        residual_mean=np.zeros(2, np.float32),
        residual_std=np.ones(2, np.float32),
        n_case_params=5, base_channels=8, num_res_blocks=1,
        noise_scheduler_timesteps=20, dropout=0.0,
    )
    batch = dict(
        inputs=jnp.asarray(rng.standard_normal((8, 16, 16, 2)), jnp.float32),
        inputs_prev=jnp.asarray(
            rng.standard_normal((8, 16, 16, 2)), jnp.float32
        ),
        labels=jnp.asarray(rng.standard_normal((8, 16, 16, 2)), jnp.float32),
        mask=jnp.ones((8, 16, 16, 1), jnp.float32),
        case_params=jnp.asarray(rng.standard_normal((8, 5)), jnp.float32),
        weights=jnp.ones((8,), jnp.float32),
    )
    del optax  # loss/grad parity is the meaningful check (see UNet test)

    def grads_of(mesh):
        params, _ = task.init_variables(jax.random.PRNGKey(0), batch)
        b = batch
        if mesh is not None:
            params = shard_params(params, mesh, min_size=1024)
            b = jax.device_put(b, batch_sharding(mesh))

        @jax.jit
        def gfn(params, b):
            def lf(p):
                return task.loss_scores(
                    p, b, train=True, rng=jax.random.PRNGKey(7)
                )

            return jax.grad(lf, has_aux=True)(params)

        grads, (scores, _) = gfn(params, b)
        return jax.device_get(grads), float(scores["nmse"])

    g_single, l_single = grads_of(None)
    g_dp, l_dp = grads_of(make_mesh("8"))
    assert np.isclose(l_single, l_dp, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("model_name", ["fno", "unet"])
def test_spatial_sharding_matches_single_device(rng, model_name):
    """sp: grid rows sharded over the model axis (plus dp batching) —
    XLA inserts conv halos / DFT-einsum reductions; loss and grads must
    equal the unsharded run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from cfdbench_tpu.parallel.mesh import batch_sharding_spatial

    if model_name == "fno":
        model = Fno2d(
            in_chan=2, out_chan=2, n_case_params=5, num_layers=2,
            modes1=4, modes2=4, hidden_dim=8,
        )
    else:
        from cfdbench_tpu.models.unet import UNet

        model = UNet(in_chan=2, out_chan=2, n_case_params=5, dim=4)
    task = AutoTask(model, loss_name_to_fn("nmse"))
    batch = dict(
        inputs=jnp.asarray(rng.standard_normal((4, 32, 32, 2)), jnp.float32),
        labels=jnp.asarray(rng.standard_normal((4, 32, 32, 2)), jnp.float32),
        mask=jnp.ones((4, 32, 32, 1), jnp.float32),
        case_params=jnp.asarray(rng.standard_normal((4, 5)), jnp.float32),
        weights=jnp.ones((4,), jnp.float32),
    )

    def grads_of(mesh):
        params, mstate = task.init_variables(jax.random.PRNGKey(0), batch)
        b = batch
        if mesh is not None:
            b = jax.device_put(b, batch_sharding_spatial(mesh, b))
            # Field tensors really are split over the model axis.
            assert not b["inputs"].sharding.is_fully_replicated

        def lf(p):
            return task.loss_scores(
                p, b, model_state=mstate, train=True,
                rng=jax.random.PRNGKey(3),
            )

        g, (scores, _) = jax.jit(jax.grad(lf, has_aux=True))(params)
        return jax.device_get(g), float(scores["nmse"])

    g_single, l_single = grads_of(None)
    for spec in ("2x4", "1x8"):
        g_sp, l_sp = grads_of(make_mesh(spec))
        assert np.isclose(l_single, l_sp, rtol=1e-5), spec
        for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sp)):
            np.testing.assert_allclose(a, b, atol=2e-5, err_msg=spec)


def test_spec_for_non_divisible_falls_back_replicated():
    """Weights whose output axis does not divide the model-axis size
    must fall back to replication (sharding_rules fallback paths)."""
    from jax.sharding import PartitionSpec as P

    from cfdbench_tpu.parallel.sharding_rules import _spec_for

    class A:
        def __init__(self, shape):
            self.shape = shape
            self.ndim = len(shape)
            self.size = int(np.prod(shape))

    # Dense kernel with non-divisible Cout → replicated.
    assert _spec_for(A((4096, 7)), model_size=2, min_size=1024) == P()
    # Divisible Cout → sharded on the trailing axis.
    assert _spec_for(A((4096, 8)), model_size=2, min_size=1024) != P()
    # Spectral (2,2,Cin,Cout,m1,m2) with odd Cout → replicated.
    assert (
        _spec_for(A((2, 2, 8, 7, 4, 4)), model_size=2, min_size=16) == P()
    )
    # Small tensors below min_size → replicated regardless.
    assert _spec_for(A((8, 8)), model_size=2, min_size=1024) == P()


def test_tp_actually_shards(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    task, batch = _setup(rng)
    mesh = make_mesh("4x2")
    params, _ = task.init_variables(jax.random.PRNGKey(0), batch)
    shardings = param_shardings(params, mesh, min_size=1024)
    n_split = sum(
        1 for s in jax.tree.leaves(
            shardings, is_leaf=lambda x: hasattr(x, "spec")
        )
        if any(p is not None for p in s.spec)
    )
    assert n_split >= 3  # spectral weights + fc1 at least


def test_pipeline_parallel_matches_single_device(rng):
    """pp: GPipe microbatch pipeline over the model axis (FNO blocks
    split into stages, ppermute over ICI). Forward and gradients must
    equal the plain single-device apply."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from cfdbench_tpu.parallel.pipeline import make_pipelined_fno_forward

    model = Fno2d(
        in_chan=2, out_chan=2, n_case_params=5, num_layers=4,
        modes1=4, modes2=4, hidden_dim=8,
    )
    B, H, W = 8, 16, 16
    inputs = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    cp = jnp.asarray(rng.standard_normal((B, 5)), jnp.float32)
    mask = jnp.ones((B, H, W, 1), jnp.float32)
    labels = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), inputs, cp, mask)["params"]

    ref = model.apply({"params": params}, inputs, cp, mask)

    def loss(apply_fn, p):
        preds = apply_fn(p, inputs, cp, mask)
        return jnp.mean(jnp.square(preds - labels))

    ref_apply = lambda p, x, c, m: model.apply({"params": p}, x, c, m)
    g_ref = jax.grad(lambda p: loss(ref_apply, p))(params)

    for spec, n_micro in (("2x4", 2), ("4x2", 2), ("2x4", 4)):
        mesh = make_mesh(spec)
        fn = make_pipelined_fno_forward(model, mesh, n_micro=n_micro)
        got = fn(params, inputs, cp, mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5,
            err_msg=f"forward {spec} micro={n_micro}",
        )
        g_pp = jax.grad(lambda p: loss(fn, p))(params)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5,
                err_msg=f"grad {spec} micro={n_micro}",
            )


def test_pp_train_step_matches_single_device(rng):
    """The wired pp TRAINING step (make_pp_train_step — what
    --pp_microbatches drives) must produce the same parameters as the
    plain single-device train step after 2 Adam updates."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.training.optim import make_adam
    from cfdbench_tpu.training.trainer_auto import (
        AutoTask,
        TrainState,
        make_pp_train_step,
        make_train_step,
    )

    model = Fno2d(
        in_chan=2, out_chan=2, n_case_params=5, num_layers=4,
        modes1=4, modes2=4, hidden_dim=8,
    )
    task = AutoTask(model, loss_name_to_fn("nmse"))
    B, H, W = 8, 16, 16
    batch = dict(
        inputs=jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32),
        labels=jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32),
        mask=jnp.ones((B, H, W, 1), jnp.float32),
        case_params=jnp.asarray(rng.standard_normal((B, 5)), jnp.float32),
        weights=jnp.ones((B,), jnp.float32),
    )
    params = model.init(
        jax.random.PRNGKey(0), batch["inputs"], batch["case_params"],
        batch["mask"],
    )["params"]

    def run(step_fn):
        tx = make_adam(1e-3, steps_per_epoch=10)
        st = TrainState(
            jax.tree.map(jnp.copy, params), {}, tx.init(params),
            jnp.zeros((), jnp.int32),
        )
        # build per-run tx inside step factory callers
        for _ in range(2):
            st, scores = step_fn(st, batch)
        return st, scores

    tx = make_adam(1e-3, steps_per_epoch=10)
    ref_step = make_train_step(task, tx, seed=0)
    st_ref, sc_ref = run(ref_step)

    mesh = make_mesh("2x4")
    pp_step = make_pp_train_step(task, tx, mesh, n_micro=2)
    st_pp, sc_pp = run(pp_step)

    np.testing.assert_allclose(
        float(sc_pp["mse"]), float(sc_ref["mse"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(st_ref.params), jax.tree.leaves(st_pp.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5
        )


def test_pp_train_step_prestacked_matches_single_device(rng):
    """The trainer's steady-state pp layout (pp_pack_params: stage
    params packed once, sharded 1/S over the model axis, optimizer
    state living on the same shards — no per-step restack) must update
    identically to the plain single-device step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.parallel.pipeline import (
        pp_pack_params,
        pp_param_shardings,
        pp_unpack_params,
    )
    from cfdbench_tpu.training.optim import make_adam
    from cfdbench_tpu.training.trainer_auto import (
        AutoTask,
        TrainState,
        make_pp_train_step,
        make_train_step,
    )

    model = Fno2d(
        in_chan=2, out_chan=2, n_case_params=5, num_layers=4,
        modes1=4, modes2=4, hidden_dim=8,
    )
    task = AutoTask(model, loss_name_to_fn("nmse"))
    B, H, W = 8, 16, 16
    batch = dict(
        inputs=jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32),
        labels=jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32),
        mask=jnp.ones((B, H, W, 1), jnp.float32),
        case_params=jnp.asarray(rng.standard_normal((B, 5)), jnp.float32),
        weights=jnp.ones((B,), jnp.float32),
    )
    params = model.init(
        jax.random.PRNGKey(0), batch["inputs"], batch["case_params"],
        batch["mask"],
    )["params"]

    tx = make_adam(1e-3, steps_per_epoch=10)
    st_ref = TrainState(
        jax.tree.map(jnp.copy, params), {}, tx.init(params),
        jnp.zeros((), jnp.int32),
    )
    ref_step = make_train_step(task, tx, seed=0)
    for _ in range(2):
        st_ref, sc_ref = ref_step(st_ref, batch)

    mesh = make_mesh("2x4")
    pp_params = pp_pack_params(
        jax.tree.map(jnp.copy, params), 4, model.num_layers
    )
    pp_params = jax.device_put(
        pp_params, pp_param_shardings(mesh, pp_params)
    )
    st_pp = TrainState(
        pp_params, {}, tx.init(pp_params), jnp.zeros((), jnp.int32)
    )
    pp_step = make_pp_train_step(
        task, tx, mesh, n_micro=2, prestacked=True
    )
    for _ in range(2):
        st_pp, sc_pp = pp_step(st_pp, batch)

    # Stage params (and their Adam moments via tx.init) really are
    # 1/S-sharded over the model axis, not replicated.
    leaf = jax.tree.leaves(st_pp.params["stages"])[0]
    assert "model" in getattr(leaf.sharding, "spec", ())[0:1] or (
        leaf.sharding.spec and leaf.sharding.spec[0] == "model"
    ), leaf.sharding

    np.testing.assert_allclose(
        float(sc_pp["mse"]), float(sc_ref["mse"]), rtol=1e-5
    )
    unpacked = pp_unpack_params(st_pp.params, model.num_layers)
    ref_leaves, _ = jax.tree.flatten(st_ref.params)
    pp_leaves, _ = jax.tree.flatten(unpacked)
    for a, b in zip(ref_leaves, pp_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5
        )

    # Round-trip identity of the packing itself.
    rt = pp_unpack_params(
        pp_pack_params(params, 4, model.num_layers), model.num_layers
    )
    for a, b in zip(
        jax.tree.leaves(params), jax.tree.leaves(rt)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
