#!/usr/bin/env python
"""Multi-step metric curves per model (mirror of
``scripts/visualization/plot_multistep_inference.py``): reads each
run's ``multistep_metrics.json`` and plots nMSE vs step for all models
on one figure.

Usage: python scripts/plot_multistep.py <result_dir> <data_name> [out.pdf]
"""

import json
import sys
from pathlib import Path

# Canonical model-name → display-label map
# (plot_multistep_inference.py:15-25).
MODEL_LABELS = {
    "auto_ffn": "Auto-FFN",
    "auto_deeponet": "Auto-DeepONet",
    "auto_edeeponet": "Auto-EDeepONet",
    "auto_deeponet_cnn": "Auto-DeepONetCNN",
    "resnet": "ResNet",
    "unet": "U-Net",
    "fno": "FNO",
    "ffn": "FFN",
    "deeponet": "DeepONet",
}


def main():
    result_dir = Path(sys.argv[1])
    data_name = sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "multistep_all_models.pdf"

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    found = 0
    for metrics_file in sorted(result_dir.rglob("multistep_metrics.json")):
        # .../(auto|non-auto)/<data>/dt*/<model>/<hparams>/...
        parts = metrics_file.relative_to(result_dir).parts
        # Exact component match: a substring test would also sweep in
        # superset-named datasets (cavity_prop matching
        # cavity_prop_bc_geo) and stray path fragments.
        if len(parts) < 2 or parts[1] != data_name:
            continue
        model = parts[3] if len(parts) >= 4 else metrics_file.parent.name
        with open(metrics_file) as f:
            metrics = json.load(f)
        nmse = [m["nmse"] for m in metrics]
        plt.plot(range(1, len(nmse) + 1), nmse,
                 label=MODEL_LABELS.get(model, model), marker="o",
                 markersize=3)
        found += 1
    if not found:
        print(f"no multistep_metrics.json for {data_name} under {result_dir}")
        return
    plt.yscale("log")
    plt.xlabel("Inference step")
    plt.ylabel("nMSE")
    plt.title(data_name)
    plt.legend()
    plt.savefig(out, bbox_inches="tight")
    print(f"wrote {out} ({found} models)")


if __name__ == "__main__":
    main()
