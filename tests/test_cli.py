"""CLI drivers end-to-end on tiny synthetic data (regression lock for
the train_auto / train / test_multistep surfaces)."""

import json

import pytest

from cfdbench_tpu.cli import main_auto, main_multistep, main_train


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
