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
