"""Model zoo: shapes, masking/residual semantics, golden param counts.

Golden counts were cross-checked against the reference torch models
(instantiated from /root/reference during development). Known counting
artifacts, all parameter-equivalent:
- FNO: torch numel counts a complex weight as 1; we store re/im
  separately → ours = torch + n_layers·2·C²·m1·m2.
- ResNet: torch count includes BatchNorms that its forward never calls
  (src/models/resnet.py:70-80) → ours = torch − 932 at default sizes.
- AutoDeepONetCnn: torch defines an unused bias (line 160 commented
  out) → ours = torch − 1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdbench_tpu.config import Args
from cfdbench_tpu.models import init_auto_model

H, W, P = 64, 64, 5

GOLDEN_COUNTS = {
    # name: (ours, torch)
    "fno": (2368354, 1188706),
    "resnet": (533764, 534696),
    "unet": (1095038, 1095038),
    "auto_deeponet": (551901, 551901),
    "auto_edeeponet": (622701, 622701),
    "auto_ffn": (1102401, 1102401),
    "auto_deeponet_cnn": (742729, 742730),
}

ALL_AUTO = list(GOLDEN_COUNTS)


def _make(name):
    args = Args(
        model=name,
        fno_hidden_dim=32,
        branch_depth=8,
        trunk_depth=8,
        autoedeeponet_depth=8,
        resnet_hidden_chan=16,
    )
    return init_auto_model(args, n_case_params=P, field_shape=(H, W))


def _init(model, b=2):
    x = jnp.zeros((b, H, W, 2))
    cp = jnp.zeros((b, P))
    m = jnp.ones((b, H, W, 1))
    vs = model.init(jax.random.PRNGKey(0), x, cp, m)
    return vs, (x, cp, m)


@pytest.mark.parametrize("name", ALL_AUTO)
def test_param_counts(name):
    model = _make(name)
    vs, _ = _init(model, b=1)
    n = sum(x.size for x in jax.tree.leaves(vs["params"]))
    assert n == GOLDEN_COUNTS[name][0], (name, n)


@pytest.mark.parametrize("name", ["fno", "unet", "resnet"])
def test_field_model_output_and_mask(name, rng):
    model = _make(name)
    vs, _ = _init(model)
    x = jnp.asarray(rng.standard_normal((2, H, W, 2)), jnp.float32)
    cp = jnp.asarray(rng.standard_normal((2, P)), jnp.float32)
    m = np.ones((2, H, W, 1), np.float32)
    m[:, 10:20, 10:20] = 0.0
    m = jnp.asarray(m)
    out = model.apply(vs, x, cp, m)
    assert out.shape == (2, H, W, 2)
    # Masked locations are exactly zero.
    assert np.abs(np.asarray(out)[:, 10:20, 10:20]).max() == 0.0


@pytest.mark.parametrize(
    "name", ["auto_ffn", "auto_deeponet", "auto_edeeponet",
             "auto_deeponet_cnn"]
)
def test_point_model_output_and_residual(name, rng):
    model = _make(name)
    vs, _ = _init(model)
    x = jnp.asarray(rng.standard_normal((2, H, W, 2)), jnp.float32)
    cp = jnp.asarray(rng.standard_normal((2, P)), jnp.float32)
    m = jnp.ones((2, H, W, 1), jnp.float32)
    out = model.apply(vs, x, cp, m)
    assert out.shape == (2, H * W)
    # Residual structure: output = net + u_flat; with scaled input the
    # residual term dominates for large u.
    big = x.at[..., 0].mul(1e4)
    out_big = model.apply(vs, big, cp, m)
    u_flat = np.asarray(big[..., 0]).reshape(2, -1)
    rel = np.abs(np.asarray(out_big) - u_flat) / (np.abs(u_flat) + 1e4)
    assert np.median(rel) < 0.5


def test_unet_bottleneck_conditioning(rng):
    args = Args(model="unet", unet_insert_case_params_at="hidden")
    model = init_auto_model(args, n_case_params=P, field_shape=(H, W))
    vs, (x, cp, m) = _init(model)
    out = model.apply(vs, x, cp, m)
    assert out.shape == (2, H, W, 2)


def test_unet_batchnorm_state_updates(rng):
    model = _make("unet")
    vs, _ = _init(model)
    x = jnp.asarray(rng.standard_normal((2, H, W, 2)), jnp.float32)
    cp = jnp.zeros((2, P))
    m = jnp.ones((2, H, W, 1))
    out, new_state = model.apply(
        vs, x, cp, m, train=True, mutable=["batch_stats"]
    )
    # Running stats moved away from init.
    leaves = jax.tree.leaves(new_state["batch_stats"])
    assert any(float(jnp.abs(a).max()) > 0 for a in leaves)


def test_odd_grid_unet():
    """tube/dam grids are 66x65 — U-Net must handle odd sizes via its
    skip-connection padding."""
    model = _make("unet")
    x = jnp.zeros((1, 66, 65, 2))
    cp = jnp.zeros((1, P))
    m = jnp.ones((1, 66, 65, 1))
    vs = model.init(jax.random.PRNGKey(0), x, cp, m)
    out = model.apply(vs, x, cp, m)
    assert out.shape == (1, 66, 65, 2)


def test_gelu_exact_matches_erf_gelu():
    """Rational-erf GELU: forward and analytic gradient both within
    1e-6 of jax.nn.gelu(approximate=False); bf16 dtype preserved."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfdbench_tpu.models.common import gelu_exact

    x = jnp.linspace(-8, 8, 20001, dtype=jnp.float32)
    ref = jax.nn.gelu(x, approximate=False)
    assert float(jnp.max(jnp.abs(gelu_exact(x) - ref))) < 1e-6
    g = jax.vmap(jax.grad(gelu_exact))(x)
    gr = jax.vmap(jax.grad(lambda v: jax.nn.gelu(v, approximate=False)))(x)
    assert float(jnp.max(jnp.abs(g - gr))) < 1e-6
    assert gelu_exact(x.astype(jnp.bfloat16)).dtype == jnp.bfloat16
    # second-order (hessian through custom_jvp) stays finite
    h = jax.vmap(jax.grad(jax.grad(gelu_exact)))(x[::100])
    assert np.all(np.isfinite(np.asarray(h)))


def test_point_family_bf16_rollout_carry():
    """bf16-storage rollout must work for the point family: their f32
    lattice coords (models/point.py::_lattice_xy) promote predictions
    to float32, and lax.scan requires carry-in == carry-out types —
    the rollout pins the feedback to the carry dtype (regression:
    round-4 review found --rollout_dtype bfloat16 crashed here)."""
    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.point import AutoDeepONet
    from cfdbench_tpu.training.rollout import make_rollout_fn
    from cfdbench_tpu.training.trainer_auto import AutoTask

    h = w = 8
    model = AutoDeepONet(branch_dim=h * w + P, width=8,
                         branch_depth=2, trunk_depth=2)
    task = AutoTask(model, loss_name_to_fn("nmse"))
    frame = jnp.ones((2, h, w, 1), jnp.bfloat16)
    cp = jnp.zeros((2, P), jnp.bfloat16)
    mask = jnp.ones((2, h, w, 1), jnp.bfloat16)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        model.init(jax.random.PRNGKey(0), frame, cp, mask)["params"],
    )
    rollout = make_rollout_fn(task.predict_frame, steps=3)
    frames = rollout(params, frame, cp, mask)
    assert frames.shape == (3, 2, h, w, 1)
    assert frames.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(frames, np.float32)))


def test_multistep_rejects_unknown_rollout_dtype():
    """--rollout_dtype is validated right after parse — a typo fails
    fast with a clear error, before any dataset or checkpoint IO (the
    data_dir here does not even exist)."""
    import pytest

    from cfdbench_tpu.cli import main_multistep

    with pytest.raises(ValueError, match="rollout_dtype"):
        main_multistep([
            "--model", "fno", "--data_name", "cavity_prop_bc_geo",
            "--data_dir", "/nonexistent", "--output_dir", "/nonexistent",
            "--rollout_dtype", "fp8",
        ])
