"""Configuration / CLI.

Mirrors the reference's flat typed-CLI config (``src/args.py:5-369``):
same field names, same defaults, same ``data_name`` grammar. Implemented
as a plain dataclass with an argparse-backed parser (the reference uses
``tap.Tap``, which is not a baked-in dependency here).

Deviations (documented; see SURVEY.md §8 defect ledger):
- ``lr_step_size`` / ``lr_gamma`` exist here (the reference *reads*
  ``args.lr_step_size`` in ``train.py:329`` / ``train_auto.py:357`` but
  never defines it — defect #1). Defaults match the reference train()
  signature defaults (step_size=1, gamma=0.9, ``src/train_auto.py:188-189``).
- ``vae_weight_decay`` exists (defect #2), default 0.0.
- TPU-specific flags are grouped at the bottom (mesh shape, precision).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Tuple


def _parse_bool(s: str) -> bool:
    v = s.lower()
    if v in ("1", "true", "yes", "on"):
        return True
    if v in ("0", "false", "no", "off"):
        return False
    raise argparse.ArgumentTypeError(
        f"{s!r} is not a boolean (use 1/0, true/false, yes/no, on/off)"
    )


@dataclass
class Args:
    # --- 1. general ---
    mode: str = "train"  # 'train', 'test', or 'train_test'
    seed: int = 0
    output_dir: str = "result"

    # --- 2. training ---
    lr: float = 1e-4
    weight_decay: float = 1e-5
    num_epochs: int = 100
    batch_size: int = 8
    eval_batch_size: int = 16
    lr_scheduler_factor: float = 0.5
    lr_scheduler_patience: int = 5
    lr_step_size: int = 1  # StepLR period in epochs (reference train() default)
    lr_gamma: float = 0.9  # StepLR decay factor
    loss_name: str = "nmse"  # training objective; reference backprops nmse
    log_interval: int = 50
    eval_interval: int = 2
    save_checkpoint_every_n_epochs: int = 20
    resume: int = 0
    """Resume training from output_dir/training_state (full state:
    params, BN stats, optimizer moments, epoch). The reference's main
    trainers restart from scratch; only its GenCast trainer resumes
    (which resumes here by default)."""
    save_images_every_n_epochs: int = 20
    early_stopping_patience: int = 20
    early_stopping_delta: float = 1e-5

    # --- 3. dataset ---
    data_name: str = "cavity_prop_bc_geo"
    data_dir: str = "../data"
    num_rows: int = 64
    num_cols: int = 64
    delta_time: float = 0.1
    norm_props: int = 1
    norm_bc: int = 1
    cache_dir: str = ""
    """If set, cache preprocessed dataset arrays here (npz), keyed by
    the full preprocessing config (reference caches cylinder only,
    ``src/dataset/cylinder.py:477-541``)."""

    # --- 4. model selection ---
    model: str = "fno"
    in_chan: int = 2
    out_chan: int = 2

    # --- 5. model-specific hyperparameters ---
    # FFN
    ffn_depth: int = 8
    ffn_width: int = 100
    # Auto-FFN
    autoffn_depth: int = 8
    autoffn_width: int = 200
    # DeepONet
    deeponet_width: int = 100
    branch_depth: int = 8
    trunk_depth: int = 8
    act_fn: str = "relu"
    act_scale_invariant: int = 1
    act_on_output: int = 0
    # Auto-EDeepONet
    autoedeeponet_width: int = 100
    autoedeeponet_depth: int = 8
    autoedeeponet_act_fn: str = "relu"
    # FNO
    fno_depth: int = 4
    fno_hidden_dim: int = 32
    fno_modes_x: int = 12
    fno_modes_y: int = 12
    # U-Net
    unet_dim: int = 12
    unet_insert_case_params_at: str = "input"
    # ResNet
    resnet_depth: int = 4
    resnet_hidden_chan: int = 16
    resnet_kernel_size: int = 7
    resnet_padding: int = 3
    # VAE
    vae_variant: str = "lite"
    """CfdVae family variant: lite | v1 | v2 | v3 | custom (custom uses
    ch / ch_mult / num_res_blocks / z_channels, mirroring the diffsci
    ddconfig path of train_vae_diffsci.py)."""
    vae_kl_weight: float = 1e-4
    vae_kl_annealing_epochs: int = 20
    vae_weight_decay: float = 0.0
    z_channels: int = 4
    resolution: int = 64
    ch: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 3, 4)
    num_res_blocks: int = 2
    dropout: float = 0.0
    embed_dim: int = 4
    kl_weight: float = 1e-6
    # latent diffusion
    ldm_vae_weights_path: str = "weights/vaelite_002"
    ldm_latent_dim: int = 4
    ldm_noise_scheduler_timesteps: int = 1000
    ldm_num_inference_steps: int = 50
    """DDPM sampling steps at generation time (the reference hardcodes
    50, e.g. ``src/models/pixel_diffusion.py:107-137``)."""
    ldm_scaling_factor: float = 4.5578
    max_eval_batches: int = 50
    """Diffusion-family eval-batch cap: generating frames is a full
    sampling loop per batch, so dev eval is capped (reference:
    ``src/train_ldm2.py:26`` caps at 50, ``train_gencast.py:144`` at
    100). 0 = no cap. Non-diffusion models are never capped."""
    unet_base_channels: int = 64
    unet_channel_mult: Tuple[int, ...] = (1, 2, 4)
    unet_num_res_blocks: int = 1
    unet_attention_resolutions: Tuple[int, ...] = ()
    # pixel diffusion (PUNetG)
    pixel_diffusion_base_channels: int = 64
    pixel_diffusion_channel_mults: Tuple[int, ...] = (1, 2, 4)
    pixel_diffusion_num_res_blocks: int = 2
    pixel_diffusion_dropout: float = 0.1

    # --- 6. advanced training options ---
    use_mixed_precision: bool = False
    """True mixed precision for the auto trainers: forward/backward in
    bf16 params+activations (halves HBM activation traffic — the
    wide-model bottleneck), master weights / optimizer / labels / loss
    in f32, eval in f32. No loss scaling needed with bf16. (XLA's
    default matmul precision already multiplies in bf16 even without
    this flag; use --matmul_precision highest for f32 parity runs.)"""
    gradient_accumulation_steps: int = 1
    use_gradient_checkpointing: bool = False
    opt_state_dtype: str = "f32"
    """Adam moment-state storage for the auto trainer: "f32" (stock),
    "bf16" (moments stored bf16, update math f32 —
    training.optim.scale_by_adam_compact), or "factored" (adafactor).
    For wide models whose step is optimizer-traffic-bound
    (BASELINE.md §anatomy, hidden >= 256)."""

    # --- 7. TPU / parallelism (new; no reference equivalent) ---
    mesh_shape: str = "auto"  # "auto" | "N" | "NdxM" e.g. "4x2" (data x model)
    pp_microbatches: int = 0
    """Pipeline parallelism (GPipe): with --mesh_shape NxM (M ≥ 2
    stages over the model axis) and --pp_microbatches K ≥ 1, the auto
    trainer streams K microbatches per step through depth-split FNO
    stages (activations move stage→stage by ppermute over ICI),
    composing with dp over the data axis. Gradients are exact
    (differentiable schedule; parity unit-tested on a CPU mesh).
    FNO only; 0 disables (default)."""
    shard_spatial: int = 0
    """Spatial (sp) sharding: split field tensors' grid rows over the
    model mesh axis in addition to dp batching — for grids too large
    for one chip's HBM. XLA inserts conv halo exchanges and einsum
    reductions automatically; numerics equal the unsharded run
    (tests/test_parallel.py)."""
    spectral_backend: str = "auto"
    """FNO spectral-conv implementation: "auto" (per-shape choice —
    matmul_rsep from batch 64, matmul_wfirst below), or force one of
    matmul_rsep | matmul_wfirst | matmul_packed | matmul | fft. All
    numerically equivalent (ops/spectral.py)."""
    measure_time: int = 0
    plot_train_examples: int = 1
    """Write an ``example.png`` (input/label/pred) at each eval epoch
    (reference plots one on the first step of every epoch,
    ``src/train_auto.py:234-250``)."""
    use_pallas_head: int = 0
    """FNO only: run the model head (fc1→GELU→fc2→mask) as a fused
    Pallas kernel in rollout/inference paths (ops/pallas_fno.py). The
    numerics equal the XLA path (unit-tested); see bench.py's
    rollout_fps_pallas_head_* for measured XLA-vs-Pallas timings."""
    rollout_dtype: str = "float32"
    """Multi-step rollout storage dtype: "float32" (stock) or
    "bfloat16" — params/activations/carried frames stored bf16 during
    the rollout scan (matmuls are bf16 on TPU either way; this halves
    HBM traffic on the HBM-bound FNO rollout: +31% frames/s at batch
    128, BASELINE.md §measured). Metrics are always computed in f32
    against f32 ground truth. Deterministic auto models only: the
    stochastic diffusion rollouts and the --use_pallas_head path keep
    f32 (the CLI warns and falls back)."""
    matmul_precision: str = "default"
    """XLA matmul precision: 'default' (bf16 multiplies, f32 accumulate
    — fastest on TPU), 'high', or 'highest' (full f32, for numerical
    parity runs against the fp32 reference)."""
    profile_dir: str = ""
    """If set, write a jax.profiler trace of the training loop here."""
    compilation_cache_dir: str = ""
    """If set, persist compiled XLA executables here (jax compilation
    cache). On the tunneled dev TPU a cache hit turns a 1-2 minute
    compile into <1 s (measured 289×); recommended for iterative
    work."""

    # ------------------------------------------------------------------
    def save(self, path) -> None:
        """Snapshot args to JSON (reference ``args.save``)."""
        d = dataclasses.asdict(self)
        d = {k: list(v) if isinstance(v, tuple) else v for k, v in d.items()}
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w", encoding="utf8") as f:
            json.dump(d, f, indent=2, ensure_ascii=False)

    @classmethod
    def load(cls, path) -> "Args":
        with open(path, "r", encoding="utf8") as f:
            d = json.load(f)
        names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in d.items():
            if k not in names:
                continue
            if isinstance(v, list):
                v = tuple(v)
            kwargs[k] = v
        return cls(**kwargs)

    @classmethod
    def parse_args(cls, argv=None) -> "Args":
        parser = argparse.ArgumentParser(description="CFDBench-TPU")
        for f in dataclasses.fields(cls):
            name = "--" + f.name
            default = f.default
            if isinstance(default, dataclasses._MISSING_TYPE):
                default = f.default_factory()  # type: ignore[misc]
            if isinstance(default, bool):
                # Bare `--flag` means True; an explicit value must be a
                # recognized boolean literal — an unknown string (e.g. a
                # typo like "ture") is an error, never a silent False.
                parser.add_argument(
                    name, type=_parse_bool, nargs="?", const=True,
                    default=default,
                )
            elif isinstance(default, tuple):
                parser.add_argument(
                    name, type=int, nargs="*", default=list(default)
                )
            else:
                parser.add_argument(name, type=type(default), default=default)
        ns = parser.parse_args(argv)
        kwargs = {}
        for f in dataclasses.fields(cls):
            v = getattr(ns, f.name)
            if isinstance(v, list):
                v = tuple(v)
            kwargs[f.name] = v
        args = cls(**kwargs)
        is_args_valid(args)
        return args


def is_args_valid(args: Args) -> None:
    """Mirror of ``src/args.py:372-378``."""
    assert any(
        key in args.data_name
        for key in ["poiseuille", "cavity", "karman", "tube", "dam", "cylinder"]
    ), f"invalid data_name: {args.data_name}"
    assert args.batch_size > 0


def problem_name(data_name: str) -> str:
    return data_name.split("_")[0]


def subset_name(data_name: str) -> str:
    p = problem_name(data_name)
    return data_name[len(p) + 1:]
