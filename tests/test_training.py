"""Training machinery: schedules, checkpoints, rollout semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from cfdbench_tpu.training import checkpoints
from cfdbench_tpu.training.optim import step_lr_schedule
from cfdbench_tpu.training.rollout import (
    make_rollout_fn,
    multistep_metrics,
    pad_case_features,
)


def test_step_lr_matches_steplr():
    """StepLR(step_size=2, gamma=0.5) over 3 steps/epoch."""
    sched = step_lr_schedule(1.0, 0.5, 2, 3)
    # epochs: 0,0,0, 1,1,1, 2,2,2 → lr 1,1,1, 1,1,1, 0.5,...
    expected = [1, 1, 1, 1, 1, 1, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.25]
    got = [float(sched(i)) for i in range(13)]
    assert got == expected


def test_make_adam_schedule_under_grad_accum():
    """Under gradient accumulation the staircase must decay on *epoch*
    boundaries: optax.MultiSteps advances the inner schedule once per
    optimizer step (every k micro-batches), so make_adam converts
    steps_per_epoch to optimizer-step units (round-4 review; the
    reference divides the same way, ``src/train_gencast.py:288``)."""
    import optax

    from cfdbench_tpu.training.optim import make_adam

    # 4 micro-steps/epoch, k=2 → 2 optimizer steps/epoch; lr halves
    # each epoch, so applied lrs per opt step are 1, 1, 0.5, 0.5.
    tx = make_adam(1.0, gamma=0.5, lr_step_size=1, steps_per_epoch=4,
                   grad_accum_steps=2)
    params = {"w": jnp.zeros(())}
    opt = tx.init(params)
    grads = {"w": jnp.ones(())}
    seen = []
    prev = params["w"]
    for _ in range(8):  # 8 micro-steps = 4 optimizer steps
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        delta = float(abs(params["w"] - prev))
        if delta > 0:  # an optimizer step actually applied
            seen.append(delta)
        prev = params["w"]
    # Adam's normalized update ≈ lr for constant grads.
    assert len(seen) == 4
    np.testing.assert_allclose(seen, [1.0, 1.0, 0.5, 0.5], rtol=1e-2)


def test_adam_opt_state_variants():
    """The reduced-optimizer-traffic Adam variants (bf16 moment state,
    adafactor) track stock Adam on a quadratic: same trajectory to
    bf16 rounding for "bf16", monotone descent for "factored"."""
    import optax

    from cfdbench_tpu.training.optim import make_adam

    def losses(opt_state, n=30):
        tx = make_adam(1e-1, steps_per_epoch=1000, opt_state=opt_state)
        params = {"w": jnp.arange(1.0, 9.0).reshape(2, 4) / 3}
        target = jnp.ones((2, 4))
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            def loss(p):
                return jnp.sum((p["w"] - target) ** 2)

            g = jax.grad(loss)(params)
            updates, state2 = tx.update(g, state, params)
            return optax.apply_updates(params, updates), state2, loss(
                params
            )

        out = []
        for _ in range(n):
            params, state, lo = step(params, state)
            out.append(float(lo))
        return out

    ref = losses("f32")
    bf16 = losses("bf16")
    fact = losses("factored")
    np.testing.assert_allclose(bf16, ref, rtol=0.05)
    assert fact[-1] < fact[0] * 0.2  # different optimizer, still descends
    assert ref[-1] < ref[0] * 0.05

    # bf16 variant actually stores moments in bf16
    tx = make_adam(1e-1, opt_state="bf16")
    st = tx.init({"w": jnp.ones((3,))})
    assert st[0].mu["w"].dtype == jnp.bfloat16
    assert st[0].nu["w"].dtype == jnp.bfloat16


def test_best_ckpt_selection(tmp_path):
    for ep, dev_loss in [(1, 0.5), (3, 0.2), (5, 0.3)]:
        d = tmp_path / f"ckpt-{ep}"
        d.mkdir()
        checkpoints.save_epoch_scores(d, ep, 0.1, dev_loss, 1.0)
    best = checkpoints.get_best_ckpt(tmp_path)
    assert best.name == "ckpt-3"


def test_params_roundtrip(tmp_path):
    params = {
        "params": {
            "a": jnp.arange(6.0).reshape(2, 3),
            "b": {"c": jnp.ones((4,))},
        }
    }
    checkpoints.save_params(params, tmp_path / "ckpt-0")
    template = jax.tree.map(jnp.zeros_like, params)
    loaded = checkpoints.load_params(template, tmp_path / "ckpt-0")
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_interrupted_save_falls_back_to_backup(tmp_path):
    """save_params rotates crash-safely: a kill after the rotation but
    before/through the rename leaves backup_model intact, and
    load_params restores from it instead of crashing (round-4 review:
    the old order renamed the live dir away before the new save)."""
    import shutil

    d = tmp_path / "ckpt-0"
    old = {"params": {"w": jnp.ones((3,))}}
    new = {"params": {"w": 2.0 * jnp.ones((3,))}}
    checkpoints.save_params(old, d)
    checkpoints.save_params(new, d)  # rotates old -> backup_model
    assert (d / "backup_model").exists()
    # Simulate a kill mid-rotation: live model dir gone, backup intact.
    shutil.rmtree(d / "model")
    template = jax.tree.map(jnp.zeros_like, old)
    loaded = checkpoints.load_params(template, d)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["w"]), np.ones((3,))
    )


def test_rollout_include_initial():
    """ResNet's generate_many includes the initial frame, shifting its
    alignment (src/models/resnet.py:229-235)."""

    def apply_fn(params, frame, cp, mask):
        return frame + 1.0

    frame0 = jnp.zeros((2, 4, 4, 1))
    cp = jnp.zeros((2, 3))
    mask = jnp.ones((2, 4, 4, 1))
    plain = make_rollout_fn(apply_fn, steps=3)(None, frame0, cp, mask)
    with_init = make_rollout_fn(apply_fn, steps=3, include_initial=True)(
        None, frame0, cp, mask
    )
    np.testing.assert_allclose(np.asarray(plain[:, 0, 0, 0, 0]), [1, 2, 3])
    np.testing.assert_allclose(
        np.asarray(with_init[:, 0, 0, 0, 0]), [0, 1, 2]
    )


def test_pad_case_features():
    feats = [np.ones((3, 4, 4, 3)), np.ones((25, 4, 4, 3))]
    feats[0][-1] *= 7.0
    out = pad_case_features(feats, 20)
    assert out.shape == (2, 20, 4, 4, 3)
    # short case padded by repeating the last frame
    assert (out[0, 3:] == 7.0).all()


def test_multistep_metrics_masked_u():
    steps, B, H, W = 2, 1, 2, 2
    preds = jnp.asarray(
        np.array([[[[[1.0, 9.0]] * W] * H], [[[[2.0, 9.0]] * W] * H]])
    )  # (2, 1, 2, 2, 2): u=1 then 2 everywhere; v=9 (ignored)
    labels = np.zeros((B, steps, H, W, 3))
    labels[..., 0] = 1.0  # u ground truth = 1
    mask = np.ones((B, H, W))
    mask[0, 0, 0] = 0  # one masked cell
    m = multistep_metrics(preds, labels, mask)
    # step 0: preds u=1 == labels → only masked cell differs→ 0 error
    assert np.isclose(m[0]["mse"], 0.0)
    # step 1: pred u=2, label 1, masked cell excluded: err 1 on 3 of 4
    assert np.isclose(m[1]["mse"], 3 / 4)


def test_vae_dataset_resize(synth_root):
    from cfdbench_tpu.data import get_auto_dataset
    from cfdbench_tpu.data.vae_data import build_vae_dataset

    train, _, _ = get_auto_dataset(
        synth_root, "tube_prop", 0.1, True, True, load_splits=["train"]
    )
    ds = build_vae_dataset(train, size=64)
    assert ds.frames.shape[1:] == (64, 64, 2)  # resized from 18x17


def test_mixed_precision_train_step(rng):
    """bf16 compute_dtype: grads/updates stay f32 (master weights),
    losses track the f32 step within bf16 tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.fno import Fno2d
    from cfdbench_tpu.training.optim import make_adam
    from cfdbench_tpu.training.trainer_auto import (
        AutoTask,
        TrainState,
        make_train_step,
    )

    model = Fno2d(
        in_chan=2, out_chan=2, n_case_params=5, num_layers=2,
        modes1=4, modes2=4, hidden_dim=8,
    )
    batch = dict(
        inputs=jnp.asarray(rng.standard_normal((4, 16, 16, 2)), jnp.float32),
        labels=jnp.asarray(rng.standard_normal((4, 16, 16, 2)), jnp.float32),
        mask=jnp.ones((4, 16, 16, 1), jnp.float32),
        case_params=jnp.asarray(rng.standard_normal((4, 5)), jnp.float32),
        weights=jnp.ones((4,), jnp.float32),
    )
    losses = {}
    params_out = {}
    for mixed in (False, True):
        task = AutoTask(
            model, loss_name_to_fn("nmse"),
            compute_dtype=jnp.bfloat16 if mixed else None,
        )
        params, mstate = task.init_variables(jax.random.PRNGKey(0), batch)
        tx = make_adam(1e-3, steps_per_epoch=10)
        state = TrainState(
            params, mstate, tx.init(params), jnp.zeros((), jnp.int32)
        )
        step = make_train_step(task, tx)
        for _ in range(3):
            state, scores = step(state, batch)
        losses[mixed] = float(scores["nmse"])
        params_out[mixed] = state.params
        # Master params stay f32 under mixed precision.
        assert all(
            x.dtype == jnp.float32
            for x in jax.tree.leaves(state.params)
        )
    assert np.isclose(losses[False], losses[True], rtol=0.05), losses


def test_device_prefetch_order_and_weights():
    """device_prefetch must preserve batch order, contents (incl. the
    0/1 padding weights), and count, while placing batches on device
    ahead of consumption."""
    from cfdbench_tpu.data.pipeline import batches, device_prefetch

    rng = np.random.default_rng(0)
    arrays = dict(
        inputs=rng.standard_normal((23, 4, 4, 2)).astype(np.float32),
        labels=rng.standard_normal((23, 4, 4, 2)).astype(np.float32),
    )
    raw = list(
        batches(arrays, 5, shuffle=True, rng=np.random.default_rng(7))
    )
    pre = list(
        device_prefetch(
            batches(
                arrays, 5, shuffle=True, rng=np.random.default_rng(7)
            ),
            size=2,
        )
    )
    assert len(pre) == len(raw) == 5
    for a, b in zip(raw, pre):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], np.asarray(b[k]))
        assert isinstance(b["inputs"], jax.Array)
    # final partial batch: 23 = 4*5 + 3 -> 3 real rows weighted 1
    np.testing.assert_array_equal(
        np.asarray(pre[-1]["weights"]), [1, 1, 1, 0, 0]
    )


def test_device_prefetch_with_sharding_fn():
    from cfdbench_tpu.data.pipeline import batches, device_prefetch
    from cfdbench_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(f"{jax.device_count()}x1")
    arrays = dict(
        inputs=np.ones((16, 4, 4, 2), np.float32),
        labels=np.ones((16, 4, 4, 2), np.float32),
    )
    out = list(
        device_prefetch(
            batches(
                arrays, 8, shuffle=False,
                pad_multiple=mesh.shape["data"],
            ),
            size=2,
            sharding_fn=lambda b: batch_sharding(mesh),
        )
    )
    assert len(out) == 2
    for b in out:
        assert not b["inputs"].sharding.is_fully_replicated


def test_lite_checkpoint_mismatch_explained(tmp_path):
    """Restoring a latent_diffusion_lite-era checkpoint (conv
    cond_encoder tree) with the non-lite template must raise the
    actionable pointer, not a raw orbax structure error."""
    import pytest

    lite_params = {
        "params": {
            "cond_encoder": {"Conv_0": {"kernel": np.ones((1, 1, 2, 4), np.float32)}},
            "unet": {"Dense_0": {"kernel": np.ones((4, 4), np.float32)}},
        }
    }
    checkpoints.save_params(lite_params, tmp_path / "ckpt-0")
    nonlite_template = {
        "params": {
            "ctx_proj": {"kernel": np.zeros((8, 4), np.float32)},
            "unet": {"Dense_0": {"kernel": np.zeros((4, 4), np.float32)}},
        }
    }
    with pytest.raises(Exception) as ei:
        checkpoints.load_params(nonlite_template, tmp_path / "ckpt-0")
    assert "latent_diffusion_lite" in str(ei.value) or "cond_encoder" in str(
        ei.value
    )


def test_export_roundtrip(tmp_path, rng):
    """jax.export serving artifacts: the deserialized single-step and
    rollout programs must reproduce the live computation exactly, with
    no model code involved on the load side."""
    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.fno import Fno2d
    from cfdbench_tpu.training.trainer_auto import AutoTask
    from cfdbench_tpu.utils.export import (
        export_predict,
        export_rollout,
        load_exported,
    )

    model = Fno2d(
        in_chan=2, out_chan=2, n_case_params=5, num_layers=2,
        modes1=4, modes2=4, hidden_dim=8,
    )
    task = AutoTask(model, loss_name_to_fn("nmse"))
    B, H, W = 4, 16, 16
    frame = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    cp = jnp.asarray(rng.standard_normal((B, 5)), jnp.float32)
    mask = jnp.ones((B, H, W, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), frame, cp, mask)["params"]

    p1 = tmp_path / "predict.stablehlo"
    n = export_predict(task, params, p1, B, H, W, 5)
    assert n > 0 and p1.exists()
    served = load_exported(p1)
    np.testing.assert_allclose(
        np.asarray(served(frame, cp, mask)),
        np.asarray(task.predict_frame(params, frame, cp, mask)),
        atol=1e-6,
    )

    p2 = tmp_path / "rollout.stablehlo"
    export_rollout(task, params, p2, B, H, W, 5, steps=3)
    from cfdbench_tpu.training.rollout import make_rollout_fn

    ref = make_rollout_fn(task.predict_frame, steps=3)(
        params, frame, cp, mask
    )
    got = load_exported(p2)(frame, cp, mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-6
    )


def test_plot_predictions_tensor_sidecar(tmp_path):
    """Each plot panel gets a raw-array sidecar at tensors/<stem>.npz,
    mirroring the reference's tensors/<stem>.pt dumps next to every
    image (src/utils/common.py:102-105; .pt -> .npz is the documented
    framework-neutral deviation)."""
    import numpy as np

    from cfdbench_tpu.utils.artifacts import plot_predictions

    inp = np.arange(16.0).reshape(4, 4)
    label = inp + 1
    pred = inp + 2
    plot_predictions(inp, label, pred, tmp_path, step=3)
    with np.load(tmp_path / "tensors" / "step-3.npz") as z:
        np.testing.assert_array_equal(z["input"], inp)
        np.testing.assert_array_equal(z["label"], label)
        np.testing.assert_array_equal(z["pred"], pred)
    assert (tmp_path / "step-3.png").exists()
