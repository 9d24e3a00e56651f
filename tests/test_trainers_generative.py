"""Generative trainers end-to-end on tiny configs (CPU)."""

import jax
import numpy as np


def test_vae_trainer_smoke(synth_root, tmp_path):
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


def test_gencast_trainer_smoke_and_resume(synth_root, tmp_path):
    from cfdbench_tpu.data import get_auto_dataset
    from cfdbench_tpu.data.wrapper import (
        compute_residual_stats, wrap_gencast,
    )
    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.diffusion import GenCastCfdModel
    from cfdbench_tpu.training.trainer_gencast import train_gencast

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
    out = tmp_path / "gc_out"
    state = train_gencast(
        task, gc_train, gc_dev, output_dir=out,
        num_epochs=2, lr=1e-3, batch_size=16, eval_batch_size=16,
        eval_interval=2, log_interval=100, warmup_steps=2,
    )
    assert (out / "best_model").exists()
    assert (out / "training_meta.json").exists()
    step_after_first = int(np.asarray(jax.device_get(state.step)))
    # Resume continues from the saved epoch.
    state2 = train_gencast(
        task, gc_train, gc_dev, output_dir=out,
        num_epochs=4, lr=1e-3, batch_size=16, eval_batch_size=16,
        eval_interval=2, log_interval=100, warmup_steps=2,
    )
    assert int(np.asarray(jax.device_get(state2.step))) > step_after_first


def test_uncond_ddpm_trainer_smoke(synth_root, tmp_path):
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
