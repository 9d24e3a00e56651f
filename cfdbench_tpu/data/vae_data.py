"""VAE training dataset (mirror of ``src/dataset/vae.py``).

Takes the *label* frame's 2 velocity channels from an auto dataset,
resizes to 64×64 (bilinear), and optionally normalizes with the
reference's hardcoded dataset stats (mean=[1.891, 1.806],
std=[1.550, 1.574], ``vae.py:25-33``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from .datasets import AutoDataset

VAE_MEAN = np.asarray([1.891, 1.806], np.float32)
VAE_STD = np.asarray([1.550, 1.574], np.float32)


@dataclass
class VaeDataset:
    frames: np.ndarray  # (N, 64, 64, 2)

    def __len__(self):
        return self.frames.shape[0]


def build_vae_dataset(
    base: AutoDataset, size: int = 64, normalize: bool = True
) -> VaeDataset:
    frames = base.labels  # (N, H, W, 2)
    if frames.shape[1:3] != (size, size):
        frames = np.asarray(
            jax.image.resize(
                frames,
                (frames.shape[0], size, size, frames.shape[-1]),
                method="bilinear",
            )
        )
    if normalize:
        frames = (frames - VAE_MEAN) / VAE_STD
    return VaeDataset(frames=frames.astype(np.float32))
