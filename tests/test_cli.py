"""CLI drivers end-to-end on tiny synthetic data (regression lock for
the train_auto / train / test_multistep surfaces)."""

import json

import pytest

from cfdbench_tpu.cli import main_auto, main_multistep, main_train

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def out_root(tmp_path_factory):
    return tmp_path_factory.mktemp("cli_results")


def test_train_auto_fno_end_to_end(synth_root, out_root):
    out = out_root / "auto"
    main_auto([
        "--model", "fno", "--data_name", "cavity_prop_bc_geo",
        "--data_dir", str(synth_root), "--num_epochs", "2",
        "--batch_size", "16", "--eval_batch_size", "16",
        "--eval_interval", "2", "--log_interval", "100",
        "--mode", "train_test", "--output_dir", str(out),
        "--fno_depth", "1", "--fno_hidden_dim", "8",
        "--fno_modes_x", "4", "--fno_modes_y", "4",
        "--mesh_shape", "1",
    ])
    run = (
        out / "auto" / "cavity_prop_bc_geo" / "dt0.1" / "fno"
        / "lr0.0001_d1_h8_m14_m24"
    )
    assert (run / "ckpt-1" / "scores.json").exists()
    scores = json.loads((run / "test" / "scores.json").read_text())
    assert "nmse" in scores["mean"] and "input_nmse" in scores["mean"]
    assert (run / "test" / "preds.npy").exists()

    # multistep reuses the best checkpoint
    main_multistep([
        "--model", "fno", "--data_name", "cavity_prop_bc_geo",
        "--data_dir", str(synth_root), "--output_dir", str(out),
        "--fno_depth", "1", "--fno_hidden_dim", "8",
        "--fno_modes_x", "4", "--fno_modes_y", "4",
        "--mesh_shape", "1",
    ])
    metrics = json.loads((run / "multistep_metrics.json").read_text())
    assert len(metrics) == 20
    assert all(set(m) == {"mse", "nmse", "mae"} for m in metrics)

    # --rollout_dtype bfloat16: the bf16-storage inference mode (+31%
    # frames/s on TPU, BASELINE.md) must stay metric-close to f32 —
    # scores are computed in f32 either way, only the scan storage
    # changes.
    import math

    main_multistep([
        "--model", "fno", "--data_name", "cavity_prop_bc_geo",
        "--data_dir", str(synth_root), "--output_dir", str(out),
        "--fno_depth", "1", "--fno_hidden_dim", "8",
        "--fno_modes_x", "4", "--fno_modes_y", "4",
        "--mesh_shape", "1", "--rollout_dtype", "bfloat16",
    ])
    metrics_bf16 = json.loads(
        (run / "multistep_metrics.json").read_text()
    )
    assert len(metrics_bf16) == 20
    assert all(
        math.isfinite(v) for m in metrics_bf16 for v in m.values()
    )
    for a, b in zip(metrics, metrics_bf16):
        assert abs(a["nmse"] - b["nmse"]) <= 0.08 * max(1.0, a["nmse"]), (
            a, b,
        )


def test_multistep_pixel_diffusion_end_to_end(synth_root, out_root):
    """Diffusion family in test_multistep (round-1 gap #2): train a tiny
    pixel-diffusion model, then chain DDPM generation for 20 steps."""
    out = out_root / "diff"
    common = [
        "--model", "pixel_diffusion", "--data_name", "cavity_prop_bc_geo",
        "--data_dir", str(synth_root), "--output_dir", str(out),
        "--pixel_diffusion_base_channels", "8",
        "--pixel_diffusion_num_res_blocks", "1",
        "--ldm_noise_scheduler_timesteps", "20",
        "--ldm_num_inference_steps", "2", "--mesh_shape", "1",
    ]
    main_auto(common + [
        "--num_epochs", "2", "--batch_size", "16",
        "--eval_batch_size", "16", "--eval_interval", "2",
        "--log_interval", "100", "--mode", "train",
        "--plot_train_examples", "0",
    ])
    run = (
        out / "auto" / "cavity_prop_bc_geo" / "dt0.1" / "pixel_diffusion"
        / "lr0.0001_steps20"
    )
    dev = json.loads((run / "ckpt-1" / "dev_scores.json").read_text())
    # Frame-based scores (generate-and-score), not noise loss: the
    # persistence baseline must be present and finite.
    assert "input_nmse" in dev["mean"]

    main_multistep(common)
    metrics = json.loads((run / "multistep_metrics.json").read_text())
    assert len(metrics) == 20
    assert all(set(m) == {"mse", "nmse", "mae"} for m in metrics)


def test_multistep_gencast_end_to_end(synth_root, out_root, tmp_path):
    """GenCast 2-frame-window rollout reachable from the driver."""
    from cfdbench_tpu.cli import main_gencast

    out = out_root / "gc"
    common = [
        "--model", "gencast", "--data_name", "cavity_prop_bc_geo",
        "--data_dir", str(synth_root), "--output_dir", str(out),
        "--pixel_diffusion_base_channels", "8",
        "--pixel_diffusion_num_res_blocks", "1",
        "--ldm_noise_scheduler_timesteps", "20",
        "--ldm_num_inference_steps", "2", "--mesh_shape", "1",
    ]
    main_gencast(common + [
        "--num_epochs", "2", "--batch_size", "16",
        "--eval_batch_size", "16", "--eval_interval", "2",
        "--log_interval", "100", "--mode", "train",
    ])
    run = (
        out / "auto" / "cavity_prop_bc_geo" / "dt0.1" / "gencast"
        / "lr0.0001_steps20"
    )
    assert (run / "best_model").exists()
    main_multistep(common)
    metrics = json.loads((run / "multistep_metrics.json").read_text())
    assert len(metrics) == 20

    # dp×tp mesh on the GenCast rollout branch: cases dp-sharded with
    # weight-0 padding replicas, params through shard_params (these
    # tiny conv kernels stay replicated below min_size — exercised here
    # are the gencast branch's sharding plumbing and the sharded DDPM
    # sampling scan; the FNO test covers genuinely split weights).
    import jax

    if len(jax.devices()) >= 8:
        assert common[-2:] == ["--mesh_shape", "1"]
        main_multistep(common[:-2] + ["--mesh_shape", "2x4"])
        sharded = json.loads(
            (run / "multistep_metrics.json").read_text()
        )
        assert len(sharded) == 20
        for a, b in zip(metrics, sharded):
            for k in ("mse", "nmse", "mae"):
                assert abs(a[k] - b[k]) <= 1e-4 * max(1e-3, abs(a[k])), (
                    k, a, b,
                )


def test_train_auto_resume(synth_root, out_root):
    """--resume continues the flagship trainer from the saved full
    state (params + optimizer + epoch)."""
    out = out_root / "resume"
    common = [
        "--model", "fno", "--data_name", "cavity_prop_bc_geo",
        "--data_dir", str(synth_root), "--batch_size", "16",
        "--eval_batch_size", "16", "--eval_interval", "2",
        "--log_interval", "100", "--mode", "train",
        "--output_dir", str(out), "--fno_depth", "1",
        "--fno_hidden_dim", "8", "--fno_modes_x", "4",
        "--fno_modes_y", "4", "--mesh_shape", "1",
        "--plot_train_examples", "0",
    ]
    main_auto(common + ["--num_epochs", "2"])
    run = (
        out / "auto" / "cavity_prop_bc_geo" / "dt0.1" / "fno"
        / "lr0.0001_d1_h8_m14_m24"
    )
    meta = json.loads((run / "training_meta.json").read_text())
    assert meta["epoch"] == 1
    # Resume to 4 epochs: picks up at epoch 2, writes ckpt-3.
    main_auto(common + ["--num_epochs", "4", "--resume", "1"])
    meta = json.loads((run / "training_meta.json").read_text())
    assert meta["epoch"] == 3
    assert (run / "ckpt-3" / "scores.json").exists()
    # Without --resume a fresh run starts over (reference behavior).
    assert not (run / "ckpt-5").exists()


def test_train_nonauto_ffn_end_to_end(synth_root, out_root):
    out = out_root / "nonauto"
    main_train([
        "--model", "ffn", "--data_name", "tube_prop_bc_geo",
        "--data_dir", str(synth_root), "--num_epochs", "2",
        "--batch_size", "16", "--eval_interval", "2",
        "--log_interval", "100", "--mode", "train_test",
        "--output_dir", str(out), "--ffn_depth", "2",
        "--ffn_width", "16", "--mesh_shape", "1",
    ])
    run = (
        out / "non-auto" / "tube_prop_bc_geo" / "dt0.1" / "ffn"
        / "lr0.0001_width16_depth2"
    )
    assert (run / "ckpt-1" / "dev_loss.json").exists()
    scores = json.loads((run / "test" / "scores.json").read_text())
    assert "nmse" in scores["mean"]


def test_train_auto_pp_cli(synth_root, out_root):
    """--mesh_shape NxM --pp_microbatches K drives the pipeline-parallel
    training step from the CLI (FNO staged over the model axis)."""
    out = out_root / "pp"
    main_auto([
        "--model", "fno", "--data_name", "cavity_prop_bc_geo",
        "--data_dir", str(synth_root), "--num_epochs", "2",
        "--batch_size", "16", "--eval_batch_size", "16",
        "--eval_interval", "2", "--log_interval", "100",
        "--mode", "train", "--output_dir", str(out),
        "--fno_depth", "2", "--fno_hidden_dim", "8",
        "--fno_modes_x", "4", "--fno_modes_y", "4",
        # 3 microbatches: per-data-shard batches must be padded to
        # data*n_micro (16/4 = 4 is not divisible by 3 — regression
        # test for the pp pad_multiple fix)
        "--mesh_shape", "4x2", "--pp_microbatches", "3",
    ])
    run = (
        out / "auto" / "cavity_prop_bc_geo" / "dt0.1" / "fno"
        / "lr0.0001_d2_h8_m14_m24"
    )
    scores = json.loads((run / "ckpt-1" / "scores.json").read_text())
    assert scores["dev_loss"] > 0


def test_train_nonauto_resume(synth_root, out_root):
    """--resume continues the non-auto trainer from the saved full
    state (params + optimizer + epoch) — same contract as the auto
    trainer."""
    out = out_root / "resume_nonauto"
    common = [
        "--model", "deeponet", "--data_name", "cavity_prop_bc_geo",
        "--data_dir", str(synth_root), "--batch_size", "32",
        "--eval_interval", "2", "--log_interval", "1000",
        "--mode", "train", "--output_dir", str(out),
        "--deeponet_width", "16", "--branch_depth", "2",
        "--trunk_depth", "2", "--mesh_shape", "1",
    ]
    main_train(common + ["--num_epochs", "2"])
    runs = list(out.glob("non-auto/cavity_prop_bc_geo/dt*/deeponet/*"))
    assert len(runs) == 1
    run = runs[0]
    meta = json.loads((run / "training_meta.json").read_text())
    assert meta["epoch"] == 1
    mtime_before = (run / "ckpt-1" / "scores.json").stat().st_mtime
    main_train(common + ["--num_epochs", "4", "--resume", "1"])
    meta = json.loads((run / "training_meta.json").read_text())
    assert meta["epoch"] == 3
    assert (run / "ckpt-3" / "scores.json").exists()
    # resume must start at epoch 2, not re-run epochs 0-1 (ckpt-1
    # untouched by the resumed run)
    assert (
        (run / "ckpt-1" / "scores.json").stat().st_mtime == mtime_before
    )


def test_multistep_sharded_matches_single_device(synth_root, out_root):
    """--mesh_shape on test_multistep (round-4 verdict #4): the case
    axis is dp-sharded over the mesh's data axis, the case count padded
    to a multiple of dp with weight-0 replicas — reported per-step
    metrics must equal the single-device run. A dp×tp mesh (2x4)
    additionally tensor-shards the spectral weights over the model
    axis; its metrics match up to GSPMD reduction-order float noise."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    out = out_root / "multistep_dp"
    common = [
        "--model", "fno", "--data_name", "cavity_prop_bc_geo",
        "--data_dir", str(synth_root), "--output_dir", str(out),
        "--fno_depth", "1", "--fno_hidden_dim", "8",
        "--fno_modes_x", "4", "--fno_modes_y", "4",
    ]
    main_auto(common + [
        "--num_epochs", "1", "--batch_size", "16",
        "--eval_batch_size", "16", "--eval_interval", "1",
        "--log_interval", "100", "--mode", "train",
        "--mesh_shape", "1",
    ])
    run = (
        out / "auto" / "cavity_prop_bc_geo" / "dt0.1" / "fno"
        / "lr0.0001_d1_h8_m14_m24"
    )

    main_multistep(common + ["--mesh_shape", "1"])
    single = json.loads((run / "multistep_metrics.json").read_text())

    # The synthetic test split has 1 case (12 cases -> 10/1/1) — NOT a
    # multiple of 8, so this exercises the pad-and-weight-out path
    # (7 weight-0 replicas), not just sharding.
    main_multistep(common + ["--mesh_shape", "8x1"])
    sharded = json.loads((run / "multistep_metrics.json").read_text())

    assert len(single) == len(sharded) == 20
    for a, b in zip(single, sharded):
        for k in ("mse", "nmse", "mae"):
            assert abs(a[k] - b[k]) <= 1e-6 * max(1.0, abs(a[k])), (
                k, a, b,
            )

    # dp×tp: 2 data-parallel groups × 4-way tensor parallelism. The
    # h8/m4 spectral weights (2,2,8,8,4,4) hit shard_params' min_size
    # exactly, so the model axis is genuinely exercised (XLA inserts
    # the channel-contraction collectives). Tolerance is looser than
    # the dp-only case: tp changes the reduction order of the Cin
    # contraction, which compounds over the 20-step rollout.
    main_multistep(common + ["--mesh_shape", "2x4"])
    tp_sharded = json.loads((run / "multistep_metrics.json").read_text())
    assert len(tp_sharded) == 20
    for a, b in zip(single, tp_sharded):
        for k in ("mse", "nmse", "mae"):
            assert abs(a[k] - b[k]) <= 1e-4 * max(1e-3, abs(a[k])), (
                k, a, b,
            )


def test_export_model_unet_end_to_end(synth_root, out_root):
    """scripts/export_model.py through the checkpoint path on a second
    model family: train a tiny UNet, export its best checkpoint to
    StableHLO (BatchNorm running stats baked in as model_state), reload
    the artifact with no model code, and check it reproduces the
    in-process prediction."""
    import sys
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "scripts")
    )
    import export_model

    from cfdbench_tpu.cli import make_auto_task
    from cfdbench_tpu.config import Args
    from cfdbench_tpu.training.checkpoints import load_best_params
    from cfdbench_tpu.utils.artifacts import get_output_dir
    from cfdbench_tpu.utils.export import load_exported

    out = out_root / "export_unet"
    argv = [
        "--model", "unet", "--data_name", "cavity_prop_bc_geo",
        "--data_dir", str(synth_root), "--output_dir", str(out),
        "--unet_dim", "4", "--batch_size", "4",
        "--eval_batch_size", "4",
    ]
    main_auto(argv + [
        "--num_epochs", "1", "--eval_interval", "1",
        "--log_interval", "100", "--mode", "train",
    ])
    export_model.main(argv)

    args = Args.parse_args(argv)
    run = get_output_dir(args, is_auto=True)
    assert (run / "serve" / "predict.stablehlo").exists()
    assert (run / "serve" / "rollout.stablehlo").exists()

    # Serve the artifact and compare against the in-process forward
    # with the same best checkpoint.
    B, H, W = 4, 16, 16
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    cp = jnp.asarray(rng.standard_normal((B, 5)), jnp.float32)
    mask = jnp.ones((B, H, W, 1), jnp.float32)
    served = load_exported(run / "serve" / "predict.stablehlo")(
        frame, cp, mask
    )

    task = make_auto_task(args, n_case_params=5, field_shape=(H, W))
    sample = dict(inputs=frame, labels=frame, mask=mask, case_params=cp)
    template = jax.eval_shape(
        lambda: task.init_params(jax.random.PRNGKey(0), sample)
    )
    variables = dict(load_best_params(template, run))
    params = variables.pop("params")
    live = task.predict_frame(params, frame, cp, mask,
                              model_state=variables)
    np.testing.assert_allclose(
        np.asarray(served), np.asarray(live), atol=1e-5
    )


def test_pp_trainer_resume_on_mesh(synth_root, out_root):
    """--resume on a meshed run (pp layout): restored optimizer
    scalars must be re-placed replicated, not committed to the
    snapshot's single device (checkpoints.resume_shardings), and the
    final train_losses.json must keep the pre-resume epochs. The
    resume deliberately uses a DIFFERENT mesh shape (2 stages → 4):
    the training_state snapshot is stored in the standard (unpacked)
    layout, so it must be layout-free across model-axis sizes."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    out = out_root / "pp_resume"
    common = [
        "--model", "fno", "--data_name", "cavity_prop_bc_geo",
        "--data_dir", str(synth_root), "--output_dir", str(out),
        "--fno_depth", "4", "--fno_hidden_dim", "8",
        "--fno_modes_x", "4", "--fno_modes_y", "4",
        "--batch_size", "16", "--eval_batch_size", "16",
        "--eval_interval", "1", "--log_interval", "100",
        "--mode", "train", "--mesh_shape", "4x2",
        "--pp_microbatches", "2",
    ]
    main_auto(common + ["--num_epochs", "1"])
    run = (
        out / "auto" / "cavity_prop_bc_geo" / "dt0.1" / "fno"
        / "lr0.0001_d4_h8_m14_m24"
    )
    n1 = len(json.loads((run / "train_losses.json").read_text()))
    assert n1 > 0
    # argparse last-wins: 2x4 overrides common's 4x2 (4 pp stages).
    main_auto(common + ["--num_epochs", "2", "--resume", "1",
                        "--mesh_shape", "2x4"])
    n2 = len(json.loads((run / "train_losses.json").read_text()))
    assert n2 == 2 * n1, (n1, n2)
    assert (run / "ckpt-1" / "scores.json").exists()


def test_pp_flag_validation(synth_root, out_root):
    """pp flags on an unsupported model or optimizer state must fail
    loudly with the actual mistake named — not an AttributeError from
    pp_pack_params."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    common = [
        "--data_name", "cavity_prop_bc_geo",
        "--data_dir", str(synth_root),
        "--output_dir", str(out_root / "pp_validate"),
        "--batch_size", "16", "--eval_batch_size", "16",
        "--num_epochs", "1", "--mode", "train",
        "--mesh_shape", "4x2", "--pp_microbatches", "2",
    ]
    with pytest.raises(ValueError, match="--model fno"):
        main_auto(common + ["--model", "unet", "--unet_dim", "8"])
    with pytest.raises(ValueError, match="factored"):
        main_auto(common + [
            "--model", "fno", "--fno_depth", "2",
            "--fno_hidden_dim", "8", "--fno_modes_x", "4",
            "--fno_modes_y", "4", "--opt_state_dtype", "factored",
        ])


def test_resume_extends_completed_run_without_duplicates(
    synth_root, out_root
):
    """Resuming a COMPLETED run (final train_losses.json holds epochs
    past the last training_state snapshot) must truncate the restored
    history to the committed epoch — otherwise the retrained window
    appears twice in the final artifact."""
    out = out_root / "resume_trunc"
    common = [
        "--model", "fno", "--data_name", "cavity_prop_bc_geo",
        "--data_dir", str(synth_root), "--batch_size", "16",
        "--eval_batch_size", "16", "--eval_interval", "2",
        "--log_interval", "100", "--mode", "train",
        "--output_dir", str(out), "--fno_depth", "1",
        "--fno_hidden_dim", "8", "--fno_modes_x", "4",
        "--fno_modes_y", "4", "--mesh_shape", "1",
        "--plot_train_examples", "0",
    ]
    # 3 epochs, eval every 2: snapshot commits epoch 1, the final dump
    # additionally holds epoch 2 (beyond the commit point).
    main_auto(common + ["--num_epochs", "3"])
    run = (
        out / "auto" / "cavity_prop_bc_geo" / "dt0.1" / "fno"
        / "lr0.0001_d1_h8_m14_m24"
    )
    losses = json.loads((run / "train_losses.json").read_text())
    meta = json.loads((run / "training_meta.json").read_text())
    assert meta["epoch"] == 1
    steps_per_epoch = len(losses) // 3
    assert len(losses) == 3 * steps_per_epoch
    # Resume to 5 epochs: epochs 2-4 retrain from the epoch-1 snapshot;
    # the final history must hold exactly 5 epochs, not 6.
    main_auto(common + ["--num_epochs", "5", "--resume", "1"])
    losses = json.loads((run / "train_losses.json").read_text())
    assert len(losses) == 5 * steps_per_epoch, (
        len(losses), steps_per_epoch
    )
