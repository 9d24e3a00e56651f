#!/usr/bin/env python
"""Find cylinder centers across many cases and test whether the data's
center placement follows a fixed rule relative to the domain box
(capability mirror of ``scripts/analysis/find_cylinder_centers.py``).

Per case: locate the interior velocity-magnitude minimum at a
developed-flow timestep (the stagnation point sits on the body), map it
to physical coordinates, then across cases check whether
``center − (x_min, y_min)`` is constant (⇒ recommend the offset rule)
or varies (⇒ per-case geometry).

Usage: python scripts/find_cylinder_centers.py <subset_dir> \
    [--max_cases N] [--margin M]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402

from scripts.analyze_cylinder_position import (  # noqa: E402
    grid_coords,
    interior_vel_minimum,
)


def find_cylinder_center(case_dir, margin=5):
    """Interior |vel|-minimum detector for one case dir."""
    case_dir = Path(case_dir)
    u = np.load(case_dir / "u.npy")
    v = np.load(case_dir / "v.npy")
    with open(case_dir / "case.json") as f:
        params = json.load(f)

    t = min(500, u.shape[0] - 1)
    u_t, v_t = u[t], v[t]
    H, W = u_t.shape
    x, y, _, _ = grid_coords(params, H, W)
    vel = np.sqrt(u_t**2 + v_t**2)
    found = interior_vel_minimum(vel, margin)
    if found is None:  # degenerate field: no interior to search
        return dict(case=case_dir.name, error="empty interior")
    i, j = found
    return dict(
        case=case_dir.name,
        center_x=float(x[j]), center_y=float(y[i]),
        x_min=params["x_min"], x_max=params["x_max"],
        y_min=params["y_min"], y_max=params["y_max"],
        radius=params.get("radius"),
    )


def analyze_offsets(results):
    """Cross-case pattern check: constant offset from the domain corner?"""
    ox = np.array([r["center_x"] - r["x_min"] for r in results])
    oy = np.array([r["center_y"] - r["y_min"] for r in results])
    rec = {}
    for name, off in (("x", ox), ("y", oy)):
        rec[name] = dict(
            offsets=[round(float(o), 6) for o in off],
            mean=float(off.mean()), std=float(off.std()),
            rule=(
                f"center_{name} = {name}_min + {off.mean():.6f}"
                if off.std() < 1e-3
                else f"center_{name} varies across cases"
            ),
        )
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("subset_dir", type=Path,
                   help="e.g. <data_root>/cylinder/geo")
    p.add_argument("--max_cases", type=int, default=5)
    p.add_argument("--margin", type=int, default=5)
    a = p.parse_args()

    case_dirs = sorted(a.subset_dir.glob("case*"))[: a.max_cases]
    if not case_dirs:
        raise SystemExit(f"no case dirs under {a.subset_dir}")
    results = [find_cylinder_center(d, a.margin) for d in case_dirs]
    bad = [r for r in results if "error" in r]
    for r in bad:
        print(f"{r['case']}: skipped ({r['error']})", file=sys.stderr)
    results = [r for r in results if "error" not in r]
    for r in results:
        print(
            f"{r['case']}: center=({r['center_x']:.6f}, "
            f"{r['center_y']:.6f}), x_min={r['x_min']:.3f}, "
            f"radius={r['radius']}",
            file=sys.stderr,
        )
    out = dict(cases=results)
    if len(results) > 1:
        out["pattern"] = analyze_offsets(results)
        for axis in ("x", "y"):
            print(f"recommendation: {out['pattern'][axis]['rule']}",
                  file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
