"""Smoke tests for the post-hoc analysis scripts (SURVEY.md §2.6 L4
tooling) on the synthetic case tree — the reference ships these as
manual, path-hardcoded scripts with no tests (SURVEY.md §4); here each
runs end-to-end in the fast tier.
"""

import json
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

REPO = Path(__file__).parent.parent


def run_script(args, **kw):
    return subprocess.run(
        [sys.executable, *args], capture_output=True, text=True,
        cwd=REPO, timeout=300, **kw,
    )


def test_analyze_cylinder_position(synth_root, tmp_path):
    case = sorted((synth_root / "cylinder" / "geo").glob("case*"))[0]
    p = run_script(
        ["scripts/analyze_cylinder_position.py", str(case),
         "--out_dir", str(tmp_path)]
    )
    assert p.returncode == 0, p.stderr
    out = json.loads(p.stdout.strip().splitlines()[-1])
    assert out["specified"]["radius"] is not None
    assert "interior_min" in out and "nan_inf" in out
    assert Path(out["plot"]).exists()


def test_find_cylinder_centers(synth_root):
    p = run_script(
        ["scripts/find_cylinder_centers.py",
         str(synth_root / "cylinder" / "geo"), "--max_cases", "3"]
    )
    assert p.returncode == 0, p.stderr
    out = json.loads(p.stdout.strip().splitlines()[-1])
    assert len(out["cases"]) == 3
    # cross-case pattern analysis present, with a recommendation per axis
    assert set(out["pattern"]) == {"x", "y"}
    for axis in ("x", "y"):
        assert "rule" in out["pattern"][axis]
        assert len(out["pattern"][axis]["offsets"]) == 3


def test_serve_bench_selftest():
    """Serving benchmark: export a throwaway FNO, time the served
    StableHLO artifacts, and sanity-check the emitted JSON (predict +
    rollout sections, near-zero served-vs-in-process overhead)."""
    p = run_script(
        ["scripts/serve_bench.py", "--selftest", "--batch", "4",
         "--grid", "16", "--hidden", "8", "--depth", "2", "--modes", "4",
         "--steps", "3", "--iters", "3"]
    )
    assert p.returncode == 0, p.stderr
    out = json.loads(p.stdout)["selftest"]
    for kind, steps in (("predict", 1), ("rollout", 3)):
        sec = out[kind]
        assert sec["latency_ms_per_call"] > 0
        assert sec["frames_per_sec"] > 0
        assert sec["in_shapes"][0] == [4, 16, 16, 2]
        expect = [4, 16, 16, 2] if steps == 1 else [3, 4, 16, 16, 2]
        assert sec["out_shape"] == expect
        # served-vs-in-process overhead is ~0 in quiet conditions but
        # unbounded noise on a contended single-core host — assert the
        # comparison was made, not its value
        assert isinstance(sec["served_overhead_pct"], float)


def test_serve_bench_selftest_unet():
    """Second model family through the serving path: UNet carries
    BatchNorm running stats as model_state, so this proves stateful
    models export/deserialize/serve (the throughput champion —
    BASELINE.md §cross-family)."""
    p = run_script(
        ["scripts/serve_bench.py", "--selftest", "--model", "unet",
         "--batch", "4", "--grid", "16", "--hidden", "4",
         "--steps", "3", "--iters", "3"]
    )
    assert p.returncode == 0, p.stderr
    out = json.loads(p.stdout)["selftest"]
    assert out["config"]["model"] == "unet"
    assert out["predict"]["out_shape"] == [4, 16, 16, 2]
    assert out["rollout"]["out_shape"] == [3, 4, 16, 16, 2]
    for kind in ("predict", "rollout"):
        assert out[kind]["frames_per_sec"] > 0


def test_locate_cylinder(synth_root):
    case = sorted((synth_root / "cylinder" / "prop").glob("case*"))[0]
    p = run_script(["scripts/locate_cylinder.py", str(case)])
    assert p.returncode == 0, p.stderr
    assert "analytic center" in p.stdout


def test_get_result_tsv(tmp_path):
    """Result collector emits one TSV row per run with mean metrics."""
    run = (tmp_path / "auto" / "cavity_prop" / "dt0.1" / "fno"
           / "lr0.0001_d4" / "test")
    run.mkdir(parents=True)
    (run / "scores.json").write_text(json.dumps(dict(
        mean=dict(mse=0.01, nmse=0.1), all={},
    )))
    p = run_script(["scripts/get_result.py", str(tmp_path)])
    assert p.returncode == 0, p.stderr
    lines = p.stdout.strip().splitlines()
    assert lines[0].startswith("regime\tdata\tdt\tmodel\thparams")
    assert len(lines) == 2
    assert "fno" in lines[1] and "1.000000e-01" in lines[1]


def test_get_stats(synth_root):
    p = run_script(
        ["scripts/get_stats.py", "--data_name", "cavity_prop",
         "--data_dir", str(synth_root)]
    )
    assert p.returncode == 0, p.stderr
    assert "mean" in p.stdout and "std" in p.stdout


def test_plot_multistep(tmp_path):
    for model, base in (("fno", 0.01), ("unet", 0.02)):
        run = (tmp_path / "auto" / "cavity_prop" / "dt0.1" / model
               / "h")
        run.mkdir(parents=True)
        (run / "multistep_metrics.json").write_text(json.dumps(
            [dict(nmse=base * (i + 1), mse=0.1, mae=0.1)
             for i in range(5)]
        ))
    out = tmp_path / "curves.pdf"
    p = run_script(
        ["scripts/plot_multistep.py", str(tmp_path), "cavity_prop",
         str(out)]
    )
    assert p.returncode == 0, p.stderr
    assert out.exists()


def test_plot_mask_overlay(synth_root, tmp_path):
    case = sorted((synth_root / "cylinder" / "geo").glob("case*"))[0]
    out = tmp_path / "overlay.png"
    p = run_script(
        ["scripts/plot_mask_overlay.py", str(case), "cylinder",
         str(out)]
    )
    assert p.returncode == 0, p.stderr
    assert out.exists()


def test_plot_losses(tmp_path):
    """Loss-curve plotter on both artifact layouts it supports."""
    run = tmp_path / "run"
    (run / "ckpt-2").mkdir(parents=True)
    (run / "ckpt-4").mkdir()
    (run / "train_losses.json").write_text(
        json.dumps([1.0, 0.8, 0.6, 0.5, 0.45, 0.4])
    )
    (run / "ckpt-2" / "scores.json").write_text(
        json.dumps(dict(ep=2, train_loss=0.6, dev_loss=0.7))
    )
    (run / "ckpt-4" / "scores.json").write_text(
        json.dumps(dict(ep=4, train_loss=0.45, dev_loss=0.5))
    )
    p = run_script(["scripts/plot_losses.py", "--result_dir", str(run)])
    assert p.returncode == 0, p.stderr
    out = json.loads(p.stdout.strip().splitlines()[-1])
    assert out["n_train_points"] == 6 and out["n_dev_points"] == 2
    assert Path(out["plot"]).exists()

    vae_run = tmp_path / "vae_run"
    vae_run.mkdir()
    (vae_run / "loss_history.json").write_text(json.dumps(dict(
        train_total=[1.0, 0.9, 0.8], val_total=[0.95, 0.85],
        val_steps=[1, 2],
    )))
    p = run_script(
        ["scripts/plot_losses.py", "--result_dir", str(vae_run),
         "--log_scale"]
    )
    assert p.returncode == 0, p.stderr
    out = json.loads(p.stdout.strip().splitlines()[-1])
    assert out["n_dev_points"] == 2


def test_vae_diagnostics_write(tmp_path):
    """The full diagnostics battery (embedding, histograms, traversals,
    reconstructions, interpolation, collapse JSON) on a tiny untrained
    VAE — covers ``src/utils/vae.py``'s visualization surface."""
    sys.path.insert(0, str(REPO))
    from cfdbench_tpu.models.vae import make_cfd_vae
    from scripts.vae_diagnostics import embed_2d, write_diagnostics

    vae = make_cfd_vae("lite", 2, 2, 4)
    frames = np.random.default_rng(0).standard_normal(
        (6, 64, 64, 2)
    ).astype(np.float32)
    params = vae.init(
        jax.random.PRNGKey(0), frames[:1], rng=None
    )["params"]
    summary = write_diagnostics(vae, params, frames, tmp_path)

    assert len(summary["per_dim_kl"]) == 4
    assert summary["embedding_method"] in ("tsne", "pca")
    for name in (
        "latent_embedding.png", "latent_histograms.png",
        "latent_traversals.png", "reconstructions.png",
        "latent_interpolation.png", "diagnostics.json",
    ):
        assert (tmp_path / name).exists(), name
    reloaded = json.loads((tmp_path / "diagnostics.json").read_text())
    assert reloaded["scaling_factor"] == pytest.approx(
        summary["scaling_factor"]
    )

    # embed_2d alone on a tiny matrix (exercises the sklearn gate)
    pts, method = embed_2d(
        np.random.default_rng(1).standard_normal((8, 5)).astype(
            np.float32
        )
    )
    assert pts.shape == (8, 2)


def test_check_dataset_clean_tree(synth_root):
    """Readiness kit (docs/MIGRATING.md): a well-formed tree passes with
    per-problem counts, split preview and read-rate estimates."""
    p = run_script(
        ["scripts/check_dataset.py", str(synth_root), "--json",
         "--sample", "4"]
    )
    assert p.returncode == 0, p.stderr
    out = json.loads(p.stdout)
    assert out["ok"] is True
    assert [r["problem"] for r in out["problems"]] == [
        "cavity", "tube", "dam", "cylinder"
    ]
    for r in out["problems"]:
        assert r["subsets"] == {"prop": 4, "bc": 4, "geo": 4}
        # Must match the framework's round()-based split_cases (12
        # cases -> 10/1/1), not a re-derived int() floor.
        assert r["split_preview"] == {"train": 10, "dev": 1, "test": 1}
        assert r["errors"] == []
        assert r["cases_checked"] == 4
        assert r["est_full_read_s_numpy"] is not None


def test_check_dataset_detects_defects(synth_root, tmp_path):
    """Corruptions a real download can have — NaN field, missing v.npy,
    missing required case.json key, single-frame case — are reported as
    errors and fail the exit code."""
    import shutil

    root = tmp_path / "data"
    shutil.copytree(synth_root / "tube", root / "tube")
    cases = sorted((root / "tube" / "prop").glob("case*"))

    u = np.load(cases[0] / "u.npy")
    u[0, 0, 0] = np.nan
    np.save(cases[0] / "u.npy", u)
    (cases[1] / "v.npy").unlink()
    cj = json.loads((cases[2] / "case.json").read_text())
    del cj["vel_in"]
    (cases[2] / "case.json").write_text(json.dumps(cj))
    np.save(cases[3] / "u.npy", u[:1])

    p = run_script(
        ["scripts/check_dataset.py", str(root), "--problems", "tube",
         "--sample", "999", "--json"]
    )
    assert p.returncode == 1
    out = json.loads(p.stdout)
    errors = "\n".join(out["problems"][0]["errors"])
    assert "NaN" in errors
    assert "missing v.npy" in errors
    assert "vel_in" in errors
    assert "no autoregressive pair" in errors

    # A problem dir that doesn't exist at all must still produce valid
    # --json output (early-return path), not a serialization crash.
    p = run_script(
        ["scripts/check_dataset.py", str(root), "--problems",
         "tube,cavity", "--json"]
    )
    assert p.returncode == 1
    out = json.loads(p.stdout)
    missing = [r for r in out["problems"] if r["problem"] == "cavity"][0]
    assert any("directory missing" in e for e in missing["errors"])
