#!/usr/bin/env python
"""Plot training/dev loss curves from a finished run directory
(capability mirror of ``scripts/visualization/plot_losses.py``).

Reads this repo's run artifacts (the result-dir layout is API,
SURVEY.md §5):

- trainer runs: ``train_losses.json`` (per-step train losses) +
  ``ckpt-*/scores.json`` (``ep`` / ``train_loss`` / ``dev_loss`` per
  eval epoch, ``training/checkpoints.py::save_epoch_scores``)
- VAE runs: ``loss_history.json`` with ``train_total`` / ``val_total``
  / ``val_steps`` (``training/trainer_vae.py``)

Usage: python scripts/plot_losses.py --result_dir <run dir> \
    [--output out.png] [--log_scale]
"""

import argparse
import json
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def load_trainer_curves(run_dir):
    """(train_steps, train_losses), (dev_eps, dev_losses) from a
    trainer run dir; either side may be empty."""
    train = []
    tl = run_dir / "train_losses.json"
    if tl.exists():
        train = json.loads(tl.read_text())
    dev = []
    for ck in sorted(run_dir.glob("ckpt-*")):
        sj = ck / "scores.json"
        if sj.exists():
            s = json.loads(sj.read_text())
            if "ep" in s and "dev_loss" in s:
                dev.append((s["ep"], s["dev_loss"]))
    dev.sort()
    return train, dev


def load_vae_curves(run_dir):
    hist = json.loads((run_dir / "loss_history.json").read_text())
    val_x = hist.get("val_steps") or list(
        range(len(hist.get("val_total", [])))
    )
    return hist.get("train_total", []), list(
        zip(val_x, hist.get("val_total", []))
    )


def plot_curves(train, dev, out_path, title="", log_scale=False,
                dev_x_label="epoch"):
    fig, ax = plt.subplots(figsize=(10, 6))
    if train:
        ax.plot(range(len(train)), train, lw=1, alpha=0.8,
                label="train loss (per step)")
    if dev:
        xs, ys = zip(*dev)
        # dev is per eval-epoch; scale to the step axis when both exist
        if train:
            scale = len(train) / max(xs[-1] + 1, 1)
            xs = [x * scale for x in xs]
        ax.plot(xs, ys, "s-", ms=5, lw=2, label=f"dev loss (per {dev_x_label})")
    if log_scale:
        ax.set_yscale("log")
    ax.set(xlabel="step", ylabel="loss", title=title)
    ax.grid(alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--result_dir", type=Path, required=True)
    p.add_argument("--output", type=Path, default=None)
    p.add_argument("--log_scale", action="store_true")
    a = p.parse_args()

    run_dir = a.result_dir
    if (run_dir / "loss_history.json").exists():
        train, dev = load_vae_curves(run_dir)
        dev_label = "val epoch"
    else:
        train, dev = load_trainer_curves(run_dir)
        dev_label = "eval epoch"
    if not train and not dev:
        raise SystemExit(
            f"no loss artifacts (train_losses.json / ckpt-*/scores.json "
            f"/ loss_history.json) under {run_dir}"
        )
    out = a.output or run_dir / "loss_curves.png"
    plot_curves(train, dev, out, title=str(run_dir.name),
                log_scale=a.log_scale, dev_x_label=dev_label)
    print(json.dumps(dict(
        plot=str(out), n_train_points=len(train), n_dev_points=len(dev),
    )))


if __name__ == "__main__":
    main()
