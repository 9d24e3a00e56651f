#!/usr/bin/env python
"""Result collector (mirror of ``scripts/visualization/get_result.py``):
walks the ``result/`` tree, collates ``test/scores.json`` across runs
into a TSV table on stdout.

Usage: python scripts/get_result.py [result_dir]
"""

import json
import sys
from pathlib import Path


def collect(result_dir: Path):
    rows = []
    for scores_file in sorted(result_dir.rglob("test/scores.json")):
        run_dir = scores_file.parent.parent
        rel = run_dir.relative_to(result_dir)
        parts = rel.parts  # (auto|non-auto, data_name, dtX, model, hparams)
        if len(parts) < 5:
            continue
        with open(scores_file) as f:
            scores = json.load(f)
        mean = scores.get("mean", {})
        rows.append(
            dict(
                regime=parts[0],
                data=parts[1],
                dt=parts[2],
                model=parts[3],
                hparams=parts[4],
                **{k: v for k, v in mean.items()},
            )
        )
    return rows


def main():
    result_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "result")
    rows = collect(result_dir)
    if not rows:
        print(f"no test/scores.json found under {result_dir}")
        return
    keys = ["regime", "data", "dt", "model", "hparams"]
    metric_keys = sorted({k for r in rows for k in r if k not in keys})
    print("\t".join(keys + metric_keys))
    for r in rows:
        vals = [str(r.get(k, "")) for k in keys]
        vals += [
            f"{r[k]:.6e}"
            if isinstance(r.get(k), (int, float))
            and not isinstance(r.get(k), bool) else ""
            for k in metric_keys
        ]
        print("\t".join(vals))


if __name__ == "__main__":
    main()
