"""Generative trainers end-to-end on tiny configs (CPU)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.slow


def test_generative_eval_scores_frames(tmp_path, rng):
    """Diffusion-family eval must score the *generated frame* (masked
    MSE/NMSE vs label — reference ``evaluate_ldm``,
    ``src/train_ldm.py:21-59``), not the noise prediction, with a
    masked persistence baseline and capped batches."""
    from types import SimpleNamespace

    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.diffusion import PixelDiffusionCfdModel
    from cfdbench_tpu.training import trainer_auto

    task = PixelDiffusionCfdModel(
        loss_name_to_fn("nmse"), out_chan=2, n_case_params=5,
        image_size=8, base_channels=8, num_res_blocks=1,
        noise_scheduler_timesteps=20,
    )
    assert task.generative
    task.num_inference_steps = 2
    n = 6
    data = SimpleNamespace(
        inputs=rng.standard_normal((n, 8, 8, 2)).astype(np.float32),
        labels=rng.standard_normal((n, 8, 8, 2)).astype(np.float32),
        masks=np.ones((n, 8, 8, 1), np.float32),
        case_params=np.zeros((n, 5), np.float32),
    )
    batch = {
        k: jnp.asarray(v[:2])
        for k, v in dict(
            inputs=data.inputs, labels=data.labels, mask=data.masks,
            case_params=data.case_params,
        ).items()
    }
    params, _ = task.init_variables(jax.random.PRNGKey(0), batch)
    result = trainer_auto.evaluate(
        task, params, data, tmp_path, batch_size=2,
        collect_preds=True, max_eval_batches=2,
    )
    scores = result["scores"]
    # Cap respected: 2 of 3 batches.
    assert len(scores["all"]["nmse"]) == 2
    assert result["preds"].shape == (4, 8, 8, 2)
    assert np.isfinite(result["preds"]).all()
    # Input-baseline column carries the masked persistence score
    # exactly (mask is all ones here, so plain MSE).
    mat_in = np.asarray(scores["mean"]["input_mse"])
    exp_all = [
        float(np.mean((data.inputs[i: i + 2] - data.labels[i: i + 2]) ** 2))
        for i in (0, 2)
    ]
    assert np.isclose(mat_in, np.mean(exp_all), rtol=1e-5)
    # Frame scores come from generation, not persistence.
    assert not np.isclose(
        scores["mean"]["mse"], scores["mean"]["input_mse"]
    )


def test_vae_trainer_smoke(synth_root, tmp_path, capsys):
    from cfdbench_tpu.data import get_auto_dataset
    from cfdbench_tpu.data.vae_data import build_vae_dataset
    from cfdbench_tpu.models.vae import AutoencoderKL
    from cfdbench_tpu.training.trainer_vae import train_vae

    train, dev, _ = get_auto_dataset(
        synth_root, "cavity_prop_bc_geo", 0.1, True, True,
        load_splits=["train", "dev"],
    )
    vae_train = build_vae_dataset(train, size=16)
    vae_dev = build_vae_dataset(dev, size=16)
    vae = AutoencoderKL(block_out_channels=(8, 16), latent_channels=2)
    best = train_vae(
        vae, vae_train, vae_dev,
        output_dir=tmp_path / "vae_out",
        weights_path=tmp_path / "weights",
        num_epochs=2, lr=1e-3, batch_size=16,
        kl_annealing_epochs=2,
    )
    assert best is not None
    assert (tmp_path / "vae_out" / "loss_history.json").exists()
    assert (tmp_path / "weights").exists()

    # Full-state resume: epoch 2 continues from the snapshot (optimizer
    # + patience counters restored; start_epoch advances past 1).
    assert (tmp_path / "vae_out" / "training_state").exists()
    import json

    meta = json.loads(
        (tmp_path / "vae_out" / "training_meta.json").read_text()
    )
    assert meta["epoch"] == 1
    capsys.readouterr()  # drain
    train_vae(
        vae, vae_train, vae_dev,
        output_dir=tmp_path / "vae_out",
        weights_path=tmp_path / "weights",
        num_epochs=3, lr=1e-3, batch_size=16,
        kl_annealing_epochs=2, resume=True,
    )
    # Discriminating check (a broken resume restarting from scratch
    # would reproduce identical meta/history deterministically): the
    # resumed run must train ONLY epoch 2 — no "ep 0:"/"ep 1:" lines.
    log = capsys.readouterr().out
    assert "ep 2:" in log and "ep 0:" not in log and "ep 1:" not in log
    meta = json.loads(
        (tmp_path / "vae_out" / "training_meta.json").read_text()
    )
    assert meta["epoch"] == 2  # exactly one more epoch ran
    assert len(meta["history"]["val_total"]) == 3


def test_gencast_trainer_smoke_and_resume(synth_root, tmp_path, capsys):
    from cfdbench_tpu.data import get_auto_dataset
    from cfdbench_tpu.data.wrapper import (
        compute_residual_stats, wrap_gencast,
    )
    from cfdbench_tpu.data.core import load_json
    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.diffusion import GenCastCfdModel
    from cfdbench_tpu.training.trainer_gencast import (
        test_gencast,
        train_gencast,
    )

    train, dev, _ = get_auto_dataset(
        synth_root, "cavity_prop_bc_geo", 0.1, True, True,
        load_splits=["train", "dev"],
    )
    gc_train, gc_dev = wrap_gencast(train), wrap_gencast(dev)
    stats = compute_residual_stats(gc_train)
    task = GenCastCfdModel(
        loss_name_to_fn("nmse"),
        residual_mean=stats["residual_mean"],
        residual_std=stats["residual_std"],
        n_case_params=gc_train.n_case_params,
        base_channels=8, num_res_blocks=1,
        noise_scheduler_timesteps=50,
    )
    task.num_inference_steps = 2
    out = tmp_path / "gc_out"
    state = train_gencast(
        task, gc_train, gc_dev, output_dir=out,
        num_epochs=2, lr=1e-3, batch_size=16, eval_batch_size=16,
        eval_interval=2, log_interval=100, warmup_steps=2,
        frame_eval_batches=1,
    )
    assert (out / "best_model").exists()
    assert (out / "training_meta.json").exists()
    # Eval artifact: noise scores + masked persistence baseline +
    # generated-frame scores (reference evaluate_ldm semantics).
    dev_scores = load_json(out / "ckpt-1" / "dev_scores.json")
    for key in ("nmse", "input_nmse", "gen_frame_nmse"):
        assert np.isfinite(dev_scores["mean"][key])
    step_after_first = int(np.asarray(jax.device_get(state.step)))
    # Resume continues from the saved epoch. Discriminators (a broken
    # resume would deterministically reproduce counters): the epoch-1
    # eval artifact is not rewritten, and no epoch-0/1 log lines recur.
    ckpt1_mtime = (out / "ckpt-1" / "dev_scores.json").stat().st_mtime_ns
    capsys.readouterr()  # drain
    state2 = train_gencast(
        task, gc_train, gc_dev, output_dir=out,
        num_epochs=4, lr=1e-3, batch_size=16, eval_batch_size=16,
        eval_interval=2, log_interval=100, warmup_steps=2,
        frame_eval_batches=1,
    )
    log = capsys.readouterr().out
    assert "ep 3:" in log and "ep 1:" not in log
    assert (
        out / "ckpt-1" / "dev_scores.json"
    ).stat().st_mtime_ns == ckpt1_mtime
    assert int(np.asarray(jax.device_get(state2.step))) > step_after_first
    # Test mode: generate-and-score the dev split (stand-in for test).
    scores = test_gencast(
        task, state2.params, gc_dev, out / "test", batch_size=16,
        max_eval_batches=2,
    )
    assert np.isfinite(scores["mean"]["nmse"])
    assert (out / "test" / "scores.json").exists()
    assert (out / "test" / "preds.npy").exists()


def test_uncond_ddpm_trainer_smoke(synth_root, tmp_path, capsys):
    from cfdbench_tpu.data import get_auto_dataset
    from cfdbench_tpu.training.trainer_uncond import train_uncond_ddpm

    train, _, _ = get_auto_dataset(
        synth_root, "cavity_prop", 0.1, True, True, load_splits=["train"]
    )
    state = train_uncond_ddpm(
        train.labels[:32], output_dir=tmp_path / "uncond",
        num_epochs=1, batch_size=16, timesteps=50,
        base_channels=8, sample_every=100,
    )
    # EMA shadow differs from live params after updates
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree.leaves(state.params),
            jax.tree.leaves(state.ema_params),
        )
    ]
    assert max(diffs) > 0
    assert (tmp_path / "uncond" / "ema_model").exists()

    # Full-state resume: continues at epoch 1 with params + EMA + opt.
    import json

    meta = json.loads(
        (tmp_path / "uncond" / "training_meta.json").read_text()
    )
    assert meta["epoch"] == 0
    capsys.readouterr()  # drain
    state2 = train_uncond_ddpm(
        train.labels[:32], output_dir=tmp_path / "uncond",
        num_epochs=2, batch_size=16, timesteps=50,
        base_channels=8, sample_every=100, resume=True,
    )
    # Discriminating check: only epoch 1 trained (a broken resume
    # would re-run epoch 0 and reproduce identical counters).
    log = capsys.readouterr().out
    assert "ep 1:" in log and "ep 0:" not in log
    meta = json.loads(
        (tmp_path / "uncond" / "training_meta.json").read_text()
    )
    assert meta["epoch"] == 1
    assert int(state2.step) == 2 * int(state.step)  # one more epoch
