#!/usr/bin/env python
"""Analyze the actual cylinder position from the flow pattern of one
case (capability mirror of
``scripts/analysis/analyze_cylinder_position.py:1-183``): the obstacle
shows up as a stagnation region and a high-variance wake, not only as
exactly-zero velocity, so four independent detectors are run and
cross-checked against the analytic position from ``case.json``:

1. low-u stagnation bounding box,
2. NaN/Inf census (masked solvers sometimes emit NaN inside bodies),
3. per-row u-velocity variance (the wake rows),
4. interior velocity-magnitude minimum.

Writes ``flow_analysis_<case>.png`` (u, v, |vel| fields with the
expected cylinder circle; per-row mean/std profiles; low-velocity
mask) and prints a JSON summary line for downstream tooling.

Usage: python scripts/analyze_cylinder_position.py <case_dir> \
    [--t_idx N] [--out_dir DIR]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def grid_coords(params, H, W):
    """Cell-center physical coordinates (the reference places centers
    at (idx + 0.5)·d, ``analyze_cylinder_position.py:41-44``)."""
    x_min, x_max = params["x_min"], params["x_max"]
    y_min, y_max = params["y_min"], params["y_max"]
    dx = (x_max - x_min) / W
    dy = (y_max - y_min) / H
    x = x_min + (np.arange(W) + 0.5) * dx
    y = y_min + (np.arange(H) + 0.5) * dy
    return x, y, dx, dy


def interior_vel_minimum(vel_mag, margin):
    """(i, j) of the interior |vel| minimum with boundaries excluded,
    or None for an empty interior — the cylinder-center detector shared
    with find_cylinder_centers.py."""
    H, W = vel_mag.shape
    m = min(margin, max(0, min(H, W) // 2 - 1))
    interior = vel_mag[m:H - m or None, m:W - m or None]
    if not interior.size:
        return None
    ii, jj = np.unravel_index(np.nanargmin(interior), interior.shape)
    return ii + m, jj + m


def analyze_flow_pattern(case_dir, t_idx=None, u_threshold=0.05,
                         wake_std_threshold=0.3, interior_margin=5):
    """Run the four detectors on one case; returns a summary dict."""
    case_dir = Path(case_dir)
    u = np.load(case_dir / "u.npy")
    v = np.load(case_dir / "v.npy")
    with open(case_dir / "case.json") as f:
        params = json.load(f)

    # Developed flow: late timestep (reference uses min(500, T-1)).
    if t_idx is None:
        t = min(500, u.shape[0] - 1)
    else:
        if not 0 <= t_idx < u.shape[0]:
            raise SystemExit(
                f"--t_idx {t_idx} out of range: case has "
                f"{u.shape[0]} frames"
            )
        t = t_idx
    u_t, v_t = u[t], v[t]
    H, W = u_t.shape
    x, y, dx, dy = grid_coords(params, H, W)
    vel_mag = np.sqrt(u_t**2 + v_t**2)

    out = dict(
        case=case_dir.name, t_idx=int(t), shape=[int(H), int(W)],
        specified=dict(
            center_x=params.get("center_x"),
            center_y=params.get("center_y"),
            radius=params.get("radius"),
        ),
    )

    # 1. Stagnation: bounding box of low-u cells.
    low_u = u_t < u_threshold
    if low_u.any():
        rows, cols = np.nonzero(low_u)
        ci = (rows.min() + rows.max()) / 2
        cj = (cols.min() + cols.max()) / 2
        out["stagnation"] = dict(
            n_cells=int(low_u.sum()),
            center_x=float(x[0] + cj * dx),
            center_y=float(y[0] + ci * dy),
        )

    # 2. NaN/Inf census.
    out["nan_inf"] = dict(
        u=int((~np.isfinite(u_t)).sum()), v=int((~np.isfinite(v_t)).sum())
    )

    # 3. Wake rows: per-row u variance spikes where the wake sheds.
    mean_u_row = np.nanmean(u_t, axis=1)
    std_u_row = np.nanstd(u_t, axis=1)
    wake_rows = np.nonzero(std_u_row > wake_std_threshold)[0]
    if wake_rows.size:
        ci = float(np.median(wake_rows))
        out["wake"] = dict(
            rows=[int(wake_rows.min()), int(wake_rows.max())],
            center_y=float(y[0] + ci * dy),
        )

    # 4. Interior |vel| minimum (boundaries excluded).
    found = interior_vel_minimum(vel_mag, interior_margin)
    if found is not None:
        ii, jj = found
        out["interior_min"] = dict(
            i=int(ii), j=int(jj),
            center_x=float(x[jj]), center_y=float(y[ii]),
            vel=float(vel_mag[ii, jj]),
        )

    return out, (u_t, v_t, vel_mag, mean_u_row, std_u_row, x, y, params)


def plot_analysis(summary, fields, out_path):
    u_t, v_t, vel_mag, mean_u_row, std_u_row, x, y, params = fields
    extent = [x[0], x[-1], y[0], y[-1]]
    fig, axes = plt.subplots(2, 3, figsize=(18, 10))

    for ax, field, title, cmap in (
        (axes[0, 0], u_t, f"u velocity (t={summary['t_idx']})", "RdBu_r"),
        (axes[0, 1], v_t, f"v velocity (t={summary['t_idx']})", "RdBu_r"),
        (axes[0, 2], vel_mag, "velocity magnitude", "viridis"),
    ):
        im = ax.imshow(field, cmap=cmap, origin="lower", extent=extent)
        ax.set(title=title, xlabel="x", ylabel="y")
        ax.axhline(0, color="green", ls="--", alpha=0.5)
        ax.axvline(0, color="green", ls="--", alpha=0.5)
        fig.colorbar(im, ax=ax)

    spec = summary["specified"]
    if spec["radius"] is not None:
        for ax in (axes[0, 2], axes[1, 2]):
            ax.add_patch(plt.Circle(
                (spec["center_x"] or 0.0, spec["center_y"] or 0.0),
                spec["radius"], color="red", fill=False, lw=2,
                label="specified cylinder",
            ))
        axes[0, 2].legend()

    axes[1, 0].plot(mean_u_row, y, "b-")
    axes[1, 0].set(xlabel="mean u per row", ylabel="y",
                   title="mean u per row")
    axes[1, 0].grid(alpha=0.3)
    axes[1, 1].plot(std_u_row, y, "r-")
    axes[1, 1].set(xlabel="std u per row", ylabel="y",
                   title="std u per row (wake)")
    axes[1, 1].grid(alpha=0.3)
    axes[1, 2].imshow(vel_mag < 0.1, cmap="gray", origin="lower",
                      extent=extent)
    axes[1, 2].set(title="low-velocity mask (<0.1)", xlabel="x",
                   ylabel="y")

    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("case_dir", type=Path)
    p.add_argument("--t_idx", type=int, default=None)
    p.add_argument("--out_dir", type=Path, default=Path("."))
    a = p.parse_args()

    summary, fields = analyze_flow_pattern(a.case_dir, a.t_idx)
    a.out_dir.mkdir(parents=True, exist_ok=True)
    png = a.out_dir / f"flow_analysis_{a.case_dir.name}.png"
    plot_analysis(summary, fields, png)
    summary["plot"] = str(png)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
