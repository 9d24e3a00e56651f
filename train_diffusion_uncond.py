#!/usr/bin/env python
"""Unconditional DDPM on flow frames with EMA (native counterpart of
the reference's stock ``src/train_diffusers.py`` example — here
actually wired to CFDBench data).

Usage:
    python train_diffusion_uncond.py --data_name cavity_prop_bc_geo \
        --data_dir <root> --num_epochs 50
"""

from pathlib import Path

from cfdbench_tpu.cli import _apply_runtime_flags, _mesh
from cfdbench_tpu.config import Args
from cfdbench_tpu.data import get_auto_dataset
from cfdbench_tpu.training.trainer_uncond import train_uncond_ddpm


def main():
    args = Args.parse_args()
    _apply_runtime_flags(args)
    print(args)
    train_data, _, _ = get_auto_dataset(
        data_dir=Path(args.data_dir),
        data_name=args.data_name,
        delta_time=args.delta_time,
        norm_props=bool(args.norm_props),
        norm_bc=bool(args.norm_bc),
        load_splits=["train"],
        seed=args.seed,
        cache_dir=args.cache_dir or None,
    )
    frames = train_data.labels  # (N, H, W, 2)
    print(f"# frames: {frames.shape}")
    train_uncond_ddpm(
        frames,
        output_dir=Path(args.output_dir) / "uncond_ddpm" / args.data_name,
        num_epochs=args.num_epochs,
        lr=args.lr,
        batch_size=args.batch_size,
        timesteps=args.ldm_noise_scheduler_timesteps,
        base_channels=args.pixel_diffusion_base_channels,
        seed=args.seed,
        mesh=_mesh(args),
        resume=bool(args.resume),
    )


if __name__ == "__main__":
    main()
