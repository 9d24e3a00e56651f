#!/usr/bin/env python
"""Per-channel mean/std of a dataset's frames in the VAE's input space
(mirror of ``scripts/utils/get_stats.py:17-33``) — the source of the
hardcoded ``VaeDataset`` normalization constants.

Like the reference (which builds an identity-normalized ``VaeDataset``
and iterates it), stats are computed AFTER the 64x64 bilinear resize
that the VAE pipeline applies — on non-64x64 problems (tube/dam are
66x65) raw-frame stats would differ from what the VAE actually sees.

Usage: python scripts/get_stats.py --data_name cavity_prop_bc_geo \
    --data_dir <root>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

# Host-side tool (the VAE-space resize is jax.image.resize): stay off
# the tunneled TPU plugin, which overrides JAX_PLATFORMS=cpu.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from cfdbench_tpu.config import Args  # noqa: E402
from cfdbench_tpu.data import get_auto_dataset  # noqa: E402
from cfdbench_tpu.data.vae_data import build_vae_dataset  # noqa: E402


def main():
    args = Args.parse_args()
    train, _, _ = get_auto_dataset(
        data_dir=Path(args.data_dir),
        data_name=args.data_name,
        delta_time=args.delta_time,
        norm_props=bool(args.norm_props),
        norm_bc=bool(args.norm_bc),
        load_splits=["train"],
        seed=args.seed,
        cache_dir=args.cache_dir or None,
    )
    # Identity-normalized VAE frame space: post-resize, pre-normalize.
    labels = build_vae_dataset(train, normalize=False).frames
    mean = labels.mean(axis=(0, 1, 2))
    std = labels.std(axis=(0, 1, 2))
    print(f"dataset: {args.data_name}")
    print(f"# frames: {labels.shape[0]}")
    print(f"channel mean (u, v): {np.round(mean, 4).tolist()}")
    print(f"channel std  (u, v): {np.round(std, 4).tolist()}")


if __name__ == "__main__":
    main()
