"""CLI entry points (the reference's ``train_auto.py`` / ``train.py`` /
``test_multistep.py`` drivers)."""

from __future__ import annotations

import os
from pathlib import Path

import jax

# Honor JAX_PLATFORMS=cpu even where a preinstalled TPU plugin
# overrides the environment variable (the config API wins) — needed to
# run the trainers on virtual CPU devices, e.g.
# XLA_FLAGS=--xla_force_host_platform_device_count=8 for pp smoke runs.
if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from .config import Args
from .data import get_auto_dataset, get_dataset
from .metrics import loss_name_to_fn
from .models import init_auto_model
from .parallel.mesh import make_mesh
from .training import trainer_auto
from .training.checkpoints import load_best_params
from .utils.artifacts import dump_json, get_output_dir


def _mesh(args: Args):
    return make_mesh(args.mesh_shape)


def _apply_runtime_flags(args: Args):
    """Precision + profiling knobs (the reference's measure_time prints
    ms/step; jax.profiler traces are the TPU-native upgrade)."""
    if args.matmul_precision != "default":
        jax.config.update(
            "jax_default_matmul_precision", args.matmul_precision
        )
    if args.compilation_cache_dir:
        jax.config.update(
            "jax_compilation_cache_dir", args.compilation_cache_dir
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0
        )
    if args.spectral_backend != "auto":
        from .ops import spectral

        if args.spectral_backend not in spectral.SPECTRAL_BACKENDS:
            raise SystemExit(
                f"--spectral_backend {args.spectral_backend!r}: choose "
                f"from {spectral.SPECTRAL_BACKENDS}"
            )
        spectral.SPECTRAL_BACKEND = args.spectral_backend
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
        import atexit

        atexit.register(jax.profiler.stop_trace)


DIFFUSION_MODELS = (
    "pixel_diffusion",
    "latent_diffusion",        # v1: cross-attention, learned ctx proj
    "latent_diffusion2",       # v2 non-lite: cross-attention, raw ctx
    "latent_diffusion_lite",   # v2 Lite: conditioning-by-addition
    "latent_diffusion2_lite",  # alias → Lite
)
# NOTE: before the non-lite LatentDiffusionCfdModel2 existed,
# --model latent_diffusion2 itself mapped to the Lite variant (like the
# reference, whose train_ldm2.py drives the Lite class). Checkpoints
# from such runs have a different param tree (conv cond_encoder instead
# of cross-attention): re-test/resume them with
# --model latent_diffusion_lite, not latent_diffusion2.


def make_auto_task(args: Args, n_case_params: int, field_shape):
    """AutoTask-compatible task for any autoregressive --model,
    including the diffusion family."""
    loss_fn = loss_name_to_fn(args.loss_name)
    if args.model == "pixel_diffusion":
        from .models.diffusion import PixelDiffusionCfdModel

        task = PixelDiffusionCfdModel(
            loss_fn,
            out_chan=args.out_chan,
            n_case_params=n_case_params,
            image_size=field_shape[0],
            noise_scheduler_timesteps=args.ldm_noise_scheduler_timesteps,
            base_channels=args.pixel_diffusion_base_channels,
            channel_mults=tuple(args.pixel_diffusion_channel_mults),
            num_res_blocks=args.pixel_diffusion_num_res_blocks,
            dropout=args.pixel_diffusion_dropout,
        )._with_remat(args.use_gradient_checkpointing)
        task.num_inference_steps = args.ldm_num_inference_steps
        if args.use_mixed_precision:
            task.compute_dtype = jnp_bf16()
        return task
    if args.model.startswith("latent_diffusion"):
        from .models.diffusion import (
            LatentDiffusionCfdModel,
            LatentDiffusionCfdModel2,
            LatentDiffusionCfdModelLite,
        )
        from .models.vae import make_cfd_vae
        from .training.checkpoints import load_params

        # Same variant/shape flags main_vae trains with, so any trained
        # VAE checkpoint (lite/v1/v2/custom) restores into the right
        # tree here.
        vae = make_cfd_vae(
            args.vae_variant, args.out_chan, args.out_chan,
            args.z_channels if args.vae_variant == "custom"
            else args.ldm_latent_dim,
            ch=args.ch,
            ch_mult=tuple(args.ch_mult),
            num_res_blocks=args.num_res_blocks,
        )
        # Abstract template (shapes only): eager full-size VAE init is
        # minutes of op-by-op dispatch; restore only needs structure.
        template = jax.eval_shape(
            lambda: dict(
                vae.init(
                    jax.random.PRNGKey(0),
                    jnp_zeros((1, 64, 64, args.out_chan)),
                    rng=None,
                )
            )
        )
        vae_params = dict(
            load_params(template, Path(args.ldm_vae_weights_path))
        )["params"]
        # v1 = cross-attention with learned context projection
        # (latent_diffusion.py); v2 non-lite = cross-attention with raw
        # context tokens + memory-lean config (ldm2.py:58-135); Lite =
        # conditioning-by-addition (ldm2.py:240-430).
        cls = {
            "latent_diffusion": LatentDiffusionCfdModel,
            "latent_diffusion2": LatentDiffusionCfdModel2,
            "latent_diffusion_lite": LatentDiffusionCfdModelLite,
            "latent_diffusion2_lite": LatentDiffusionCfdModelLite,
        }[args.model]
        task = cls(
            loss_fn,
            vae_params,
            in_chan=args.in_chan,
            out_chan=args.out_chan,
            n_case_params=n_case_params,
            latent_dim=args.ldm_latent_dim,
            scaling_factor=args.ldm_scaling_factor,
            noise_scheduler_timesteps=args.ldm_noise_scheduler_timesteps,
            unet_base_channels=args.unet_base_channels,
            unet_channel_mult=tuple(args.unet_channel_mult),
            unet_num_res_blocks=args.unet_num_res_blocks,
        )
        task.num_inference_steps = args.ldm_num_inference_steps
        if args.use_mixed_precision:
            task.compute_dtype = jnp_bf16()
        return task
    model = init_auto_model(
        args, n_case_params=n_case_params, field_shape=field_shape
    )
    compute_dtype = None
    if args.use_mixed_precision:
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16
    return trainer_auto.AutoTask(
        model, loss_fn, compute_dtype=compute_dtype
    )


def jnp_bf16():
    import jax.numpy as jnp

    return jnp.bfloat16


def jnp_zeros(shape):
    import jax.numpy as jnp

    return jnp.zeros(shape, jnp.float32)


def main_auto(argv=None) -> None:
    """Mirror of ``src/train_auto.py:316-378``."""
    args = Args.parse_args(argv)
    _apply_runtime_flags(args)
    print("#" * 80)
    print(args)
    print("#" * 80)

    output_dir = get_output_dir(args, is_auto=True)
    output_dir.mkdir(parents=True, exist_ok=True)
    args.save(output_dir / "args.json")

    print("Loading data...")
    splits = ["train", "dev"] if "train" in args.mode else []
    if "test" in args.mode:
        splits.append("test")
    train_data, dev_data, test_data = get_auto_dataset(
        data_dir=Path(args.data_dir),
        data_name=args.data_name,
        delta_time=args.delta_time,
        norm_props=bool(args.norm_props),
        norm_bc=bool(args.norm_bc),
        load_splits=splits,
        seed=args.seed,
        cache_dir=args.cache_dir or None,
    )
    ref = train_data if train_data is not None else test_data
    print(f"# train examples: {len(train_data) if train_data else 0}")
    print(f"# dev examples: {len(dev_data) if dev_data else 0}")
    print(f"# test examples: {len(test_data) if test_data else 0}")

    task = make_auto_task(
        args, n_case_params=ref.n_case_params, field_shape=ref.field_shape
    )
    mesh = _mesh(args)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    state = None
    if "train" in args.mode:
        args.save(output_dir / "train_args.json")
        state = trainer_auto.train(
            task,
            train_data=train_data,
            dev_data=dev_data,
            output_dir=output_dir,
            lr=args.lr,
            lr_step_size=args.lr_step_size,
            lr_gamma=args.lr_gamma,
            num_epochs=args.num_epochs,
            batch_size=args.batch_size,
            eval_batch_size=args.eval_batch_size,
            eval_interval=args.eval_interval,
            log_interval=args.log_interval,
            seed=args.seed,
            mesh=mesh,
            measure_time=bool(args.measure_time),
            eval_max_batches=(
                args.max_eval_batches or None
                if task.generative else None
            ),
            plot_examples=bool(args.plot_train_examples),
            resume=bool(args.resume),
            spatial=bool(args.shard_spatial),
            pp_microbatches=args.pp_microbatches,
            opt_state=args.opt_state_dtype,
        )
        if args.measure_time:
            # measure_time is a micro-bench: print ms/step and stop
            # (reference exits the process, src/train.py:94-100).
            return
    if "test" in args.mode:
        args.save(output_dir / "test_args.json")
        sample = dict(
            inputs=test_data.inputs[:1],
            labels=test_data.labels[:1],
            mask=test_data.masks[:1],
            case_params=test_data.case_params[:1],
        )
        template = jax.eval_shape(
            lambda: task.init_params(jax.random.PRNGKey(0), sample)
        )
        variables = dict(load_best_params(template, output_dir))
        params = variables.pop("params")
        trainer_auto.test(
            task,
            params,
            test_data,
            output_dir / "test",
            model_state=variables,
            batch_size=1,
            plot_interval=10,
            mesh=mesh,
        )


def main_train(argv=None) -> None:
    """Non-autoregressive driver (mirror of ``src/train.py:295-350``)."""
    from .models import init_nonauto_model
    from .training import trainer_nonauto

    args = Args.parse_args(argv)
    _apply_runtime_flags(args)
    print("#" * 80)
    print(args)
    print("#" * 80)

    output_dir = get_output_dir(args, is_auto=False)
    output_dir.mkdir(parents=True, exist_ok=True)
    args.save(output_dir / "args.json")

    print("Loading data...")
    train_data, dev_data, test_data = get_dataset(
        data_name=args.data_name,
        data_dir=Path(args.data_dir),
        norm_props=bool(args.norm_props),
        norm_bc=bool(args.norm_bc),
        seed=args.seed,
    )
    print(f"# train examples: {len(train_data)}")
    print(f"# dev examples: {len(dev_data)}")
    print(f"# test examples: {len(test_data)}")

    model = init_nonauto_model(args, n_case_params=train_data.n_case_params)
    task = trainer_nonauto.NonAutoTask(model, loss_name_to_fn(args.loss_name))
    mesh = _mesh(args)

    if "train" in args.mode:
        args.save(output_dir / "train_args.json")
        trainer_nonauto.train(
            task,
            train_data=train_data,
            dev_data=dev_data,
            output_dir=output_dir,
            lr=args.lr,
            lr_step_size=args.lr_step_size,
            lr_gamma=args.lr_gamma,
            num_epochs=args.num_epochs,
            batch_size=args.batch_size,
            eval_interval=args.eval_interval,
            log_interval=args.log_interval,
            seed=args.seed,
            mesh=mesh,
            measure_time=bool(args.measure_time),
            resume=bool(args.resume),
        )
        if args.measure_time:
            return
    if "test" in args.mode:
        args.save(output_dir / "test_args.json")
        sample = dict(
            case_params=test_data.case_params[:1],
            t=test_data.frame_t[:1, None],
        )
        template = {
            "params": task.init_params(jax.random.PRNGKey(0), sample)
        }
        params = dict(load_best_params(template, output_dir))["params"]
        trainer_nonauto.test(
            task,
            params,
            test_data,
            output_dir / "test",
            batch_size=1,
            mesh=mesh,
        )


def main_multistep(argv=None) -> None:
    """Mirror of ``src/test_multistep.py:180-236``: 20-step rollout on
    the test split, per-step masked-u metrics averaged over cases —
    executed as one jitted scan over all cases at once. With
    ``--mesh_shape NxM`` (or the default ``auto`` on a multi-chip host)
    the case axis is dp-sharded over the mesh's data axis and — for
    M > 1 — params are tensor-sharded over the model axis with the
    same Megatron-style rules the trainers use
    (``parallel/sharding_rules.py``), so a checkpoint too large for one
    chip's HBM can still be rolled out. Reported metrics equal the
    single-device run (padding cases are weighted out; tp introduces
    only reduction-order float noise, bounded in
    tests/test_cli.py::test_multistep_sharded_matches_single_device)."""
    from .training.rollout import (
        make_rollout_fn,
        multistep_metrics,
        pad_case_features,
    )
    from .utils.artifacts import plot_multistep_metrics

    args = Args.parse_args(argv)
    if args.rollout_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"--rollout_dtype {args.rollout_dtype!r}: choose "
            "float32 or bfloat16"
        )
    _apply_runtime_flags(args)
    print(args)

    _, _, test_data = get_auto_dataset(
        data_dir=Path(args.data_dir),
        data_name=args.data_name,
        delta_time=args.delta_time,
        norm_props=bool(args.norm_props),
        norm_bc=bool(args.norm_bc),
        load_splits=["test"],
        seed=args.seed,
        cache_dir=args.cache_dir or None,
    )
    infer_steps = 20
    features = pad_case_features(test_data.all_features, infer_steps)
    from .data.core import params_to_vector

    case_params = np.stack(
        [
            params_to_vector(p)
            for p in test_data.case_params_list
        ]
    )
    frame0 = features[:, 0, :, :, :2]
    mask = features[:, 0, :, :, 2:3]

    if args.model in ("ffn", "deeponet"):
        # Non-auto branch (``test_multistep.py:119-132``): one frame per
        # (case, step) via generate_one — executed as a single batched
        # call over all cases × steps.
        from .models import init_nonauto_model
        from .training import trainer_nonauto

        C = frame0.shape[0]
        H, W = frame0.shape[1:3]
        model = init_nonauto_model(args, n_case_params=case_params.shape[1])
        task = trainer_nonauto.NonAutoTask(
            model, loss_name_to_fn(args.loss_name)
        )
        output_dir = get_output_dir(args, is_auto=False)
        template = {
            "params": task.init_params(
                jax.random.PRNGKey(0),
                dict(case_params=case_params[:1], t=np.zeros((1, 1))),
            )
        }
        params = dict(load_best_params(template, output_dir))["params"]
        # One jitted call per step (cases batched): the all-steps-at-once
        # variant materializes a (steps·cases, H·W, width) trunk
        # intermediate — multi-GB at the real test-split size. The
        # reference evaluates per frame (``test_multistep.py:119-132``).
        gen = jax.jit(lambda p, cp, t: task.generate_one(p, cp, t, H, W))
        preds = np.stack(
            [
                np.asarray(
                    gen(
                        params, case_params,
                        np.full((C, 1), s, dtype=np.float32),
                    )
                ).reshape(C, H, W, 1)
                for s in range(infer_steps)
            ]
        )
        metrics = multistep_metrics(preds, features, mask)
        for m in metrics:
            print(m)
        dump_json(metrics, output_dir / "multistep_metrics.json")
        plot_multistep_metrics(metrics, output_dir / "multistep_metrics.pdf")
        return

    output_dir = get_output_dir(args, is_auto=True)

    # dp×tp-sharded rollout (auto + gencast branches): shard the case
    # axis over the mesh's data axis — the rollout scan and per-step
    # metric math run SPMD, XLA inserts nothing (fully batch-parallel).
    # The case count is padded to a multiple of dp by repeating the
    # last case; padding replicas carry weight 0 so the reported
    # per-step means equal the unpadded single-device result exactly
    # (tests/test_cli.py::test_multistep_sharded_matches_single_device).
    # With a model axis (--mesh_shape NxM, M > 1) params are
    # additionally tensor-sharded by the trainers' Megatron-style rules
    # (parallel/sharding_rules.py); GSPMD propagates the channel
    # sharding through the rollout and inserts the ICI collectives.
    from .parallel.mesh import (
        DATA_AXIS,
        MODEL_AXIS,
        batch_sharding,
        replicated_sharding,
    )
    from .parallel.sharding_rules import shard_params

    mesh = _mesh(args)
    dp = mesh.shape[DATA_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    n_real = frame0.shape[0]
    case_weights = None
    if dp > 1:
        pad = (-n_real) % dp
        if pad:
            def _rep(a):
                return np.concatenate(
                    [a, np.repeat(a[-1:], pad, axis=0)], axis=0
                )

            features = _rep(features)
            frame0, case_params, mask = map(
                _rep, (frame0, case_params, mask)
            )
            case_weights = np.concatenate(
                [np.ones(n_real, np.float32), np.zeros(pad, np.float32)]
            )
        print(f"[multistep] sharding {frame0.shape[0]} cases "
              f"({n_real} real) over {dp} data-parallel devices")
    if dp > 1 or tp > 1:
        def _shard_in(a):
            return jax.device_put(a, batch_sharding(mesh))

        def _replicate(tree):
            return jax.device_put(tree, replicated_sharding(mesh))

        def _shard_params(tree):
            return (
                shard_params(tree, mesh) if tp > 1 else _replicate(tree)
            )

        if tp > 1:
            print(f"[multistep] tensor-sharding params over {tp} "
                  "model-axis devices")
    else:
        def _shard_in(a):
            return a

        def _replicate(tree):
            return tree

        _shard_params = _replicate

    if args.model == "gencast":
        # GenCast rollout: jitted scan keeping the 2-frame window
        # (``src/models/gen_cast_cfd.py:275-308``). The window is seeded
        # with (frame0, frame0) — the reference's test_multistep never
        # wires GenCast, so only one initial frame is available.
        from .data.wrapper import load_residual_stats
        from .models.diffusion import GenCastCfdModel
        from .training.checkpoints import load_params

        stats = load_residual_stats(output_dir / "residual_stats.npz")
        task = GenCastCfdModel(
            loss_name_to_fn(args.loss_name),
            residual_mean=stats["residual_mean"],
            residual_std=stats["residual_std"],
            in_chan=args.in_chan,
            out_chan=args.out_chan,
            n_case_params=case_params.shape[1],
            noise_scheduler_timesteps=args.ldm_noise_scheduler_timesteps,
            base_channels=args.pixel_diffusion_base_channels,
            channel_mults=tuple(args.pixel_diffusion_channel_mults),
            num_res_blocks=args.pixel_diffusion_num_res_blocks,
            dropout=args.pixel_diffusion_dropout,
        )
        task.num_inference_steps = args.ldm_num_inference_steps
        sample = dict(
            inputs=frame0[:1], inputs_prev=frame0[:1],
            labels=frame0[:1], mask=mask[:1],
            case_params=case_params[:1],
        )
        template = jax.eval_shape(
            lambda: task.init_variables(jax.random.PRNGKey(0), sample)[0]
        )
        params = _shard_params(dict(
            load_params({"params": template}, output_dir / "best_model")
        )["params"])
        preds = jax.jit(
            lambda p, f0, cp, m: task.rollout(
                p, f0, f0, cp, m, steps=infer_steps
            )
        )(
            params, _shard_in(frame0), _shard_in(case_params),
            _shard_in(mask),
        )
    else:
        task = make_auto_task(
            args,
            n_case_params=case_params.shape[1],
            field_shape=frame0.shape[1:3],
        )
        sample = dict(
            inputs=frame0[:1],
            labels=frame0[:1],
            mask=mask[:1],
            case_params=case_params[:1],
        )
        template = jax.eval_shape(
            lambda: task.init_params(jax.random.PRNGKey(0), sample)
        )
        variables = dict(load_best_params(template, output_dir))
        params = variables.pop("params")

        fb = task.feedback_channels
        roll_frame0, roll_cp, roll_mask = frame0, case_params, mask
        pallas_head_active = args.use_pallas_head and args.model == "fno"
        if args.rollout_dtype == "bfloat16" and (
            getattr(task, "generative", False) or pallas_head_active
        ):
            print(
                "[multistep] --rollout_dtype bfloat16 ignored: "
                "stochastic diffusion rollouts and --use_pallas_head "
                "run in float32 (config.py::rollout_dtype)"
            )
        if (
            args.rollout_dtype == "bfloat16"
            and not getattr(task, "generative", False)
            and not pallas_head_active
        ):
            # bf16-storage rollout: cast params/state/inputs once; the
            # scan then carries bf16 frames (halves HBM traffic on the
            # HBM-bound FNO rollout — config.py::rollout_dtype).
            # Stochastic diffusion rollouts keep f32 (DDPM ancestral
            # steps accumulate noise-scale roundoff differently).
            # Metrics below still score f32 preds vs f32 ground truth.
            bf16 = jnp_bf16()

            def _cast(x):
                return (
                    x.astype(bf16)
                    if hasattr(x, "dtype") and x.dtype == np.float32
                    else x
                )

            params = jax.tree.map(_cast, params)
            variables = jax.tree.map(_cast, variables)
            roll_frame0 = np.asarray(frame0, bf16)
            roll_cp = np.asarray(case_params, bf16)
            roll_mask = np.asarray(mask, bf16)
        variables = _replicate(variables)  # BN state etc., closed over
        if getattr(task, "generative", False):
            # Diffusion chaining: each step is a DDPM sampling run with
            # fresh noise (``src/models/pixel_diffusion.py:139-154``).
            rollout = make_rollout_fn(
                lambda p, f, cp, m, key: task.predict_frame(
                    p, f, cp, m, model_state=variables, rng=key
                ),
                steps=infer_steps,
                stochastic=True,
                seed=args.seed,
            )
        elif args.use_pallas_head and args.model == "fno":
            from .models.fno import fno2d_apply_pallas_head

            model = task.model
            rollout = make_rollout_fn(
                lambda p, f, cp, m: fno2d_apply_pallas_head(
                    model, p, f, cp, m
                ),
                steps=infer_steps,
            )
        else:
            rollout = make_rollout_fn(
                lambda p, f, cp, m: task.predict_frame(
                    p, f, cp, m, model_state=variables
                ),
                steps=infer_steps,
                include_initial=(args.model == "resnet"),
            )
        preds = rollout(
            _shard_params(params), _shard_in(roll_frame0[..., :fb]),
            _shard_in(roll_cp), _shard_in(roll_mask),
        )
        if preds.dtype != np.float32:
            # On-device upcast so the jitted metrics score f32; the f32
            # path stays on device untouched (host pulls cost ~28 ms
            # per sync on this backend, and the full stack is large).
            preds = preds.astype(np.float32)
    metrics = multistep_metrics(
        preds, features, mask, case_weights=case_weights
    )
    for m in metrics:
        print(m)
    dump_json(metrics, output_dir / "multistep_metrics.json")
    plot_multistep_metrics(metrics, output_dir / "multistep_metrics.pdf")


def main_vae(argv=None) -> None:
    """VAE trainer driver (mirror of ``src/train_vae.py:82-276``)."""
    from .data.vae_data import build_vae_dataset
    from .models.vae import make_cfd_vae
    from .training.trainer_vae import train_vae

    args = Args.parse_args(argv)
    _apply_runtime_flags(args)
    print(args)
    train_data, dev_data, _ = get_auto_dataset(
        data_dir=Path(args.data_dir),
        data_name=args.data_name,
        delta_time=args.delta_time,
        norm_props=bool(args.norm_props),
        norm_bc=bool(args.norm_bc),
        load_splits=["train", "dev"],
        seed=args.seed,
        cache_dir=args.cache_dir or None,
    )
    vae_train = build_vae_dataset(train_data)
    vae_dev = build_vae_dataset(dev_data)
    print(f"# train frames: {len(vae_train)}, dev frames: {len(vae_dev)}")
    vae = make_cfd_vae(
        args.vae_variant, 2, 2,
        args.z_channels if args.vae_variant == "custom"
        else args.ldm_latent_dim,
        ch=args.ch,
        ch_mult=tuple(args.ch_mult),
        num_res_blocks=args.num_res_blocks,
    )
    output_dir = Path(args.output_dir) / "vae" / args.data_name
    train_vae(
        vae,
        vae_train,
        vae_dev,
        output_dir=output_dir,
        weights_path=Path(args.ldm_vae_weights_path),
        num_epochs=args.num_epochs,
        lr=args.lr,
        weight_decay=args.vae_weight_decay,
        batch_size=args.batch_size,
        kl_weight=args.vae_kl_weight,
        kl_annealing_epochs=(
            args.vae_kl_annealing_epochs
            if "anneal" in args.mode
            else 0
        ),
        lr_factor=args.lr_scheduler_factor,
        lr_patience=args.lr_scheduler_patience,
        early_stopping_patience=args.early_stopping_patience,
        early_stopping_delta=args.early_stopping_delta,
        seed=args.seed,
        mesh=_mesh(args),
        resume=bool(args.resume),
    )


def main_gencast(argv=None) -> None:
    """GenCast trainer driver (mirror of ``src/train_gencast.py``).

    Deviation: the reference hard-requires a precomputed
    ``residual_stats.pt`` (``train_gencast.py:513-520``); here the
    stats are computed automatically from the train split when the file
    is missing (same two-pass math), then cached.
    """
    from .data.wrapper import (
        compute_residual_stats,
        load_residual_stats,
        save_residual_stats,
        wrap_gencast,
    )
    from .models.diffusion import GenCastCfdModel
    from .training.trainer_gencast import test_gencast, train_gencast

    args = Args.parse_args(argv)
    _apply_runtime_flags(args)
    print(args)
    splits = ["train", "dev"]
    if "test" in args.mode:
        splits.append("test")
    train_data, dev_data, test_data = get_auto_dataset(
        data_dir=Path(args.data_dir),
        data_name=args.data_name,
        delta_time=args.delta_time,
        norm_props=bool(args.norm_props),
        norm_bc=bool(args.norm_bc),
        load_splits=splits,
        seed=args.seed,
        cache_dir=args.cache_dir or None,
    )
    gc_train = wrap_gencast(train_data)
    gc_dev = wrap_gencast(dev_data)
    print(f"# train triples: {len(gc_train)}, dev: {len(gc_dev)}")

    output_dir = get_output_dir(
        dataclasses_replace(args, model="gencast"), is_auto=True
    )
    stats_path = output_dir / "residual_stats.npz"
    if stats_path.exists():
        stats = load_residual_stats(stats_path)
    else:
        stats = compute_residual_stats(gc_train)
        save_residual_stats(stats, stats_path)
        print(f"Residual stats computed and cached at {stats_path}")
    print(
        f"residual mean={stats['residual_mean']}, "
        f"std={stats['residual_std']}"
    )

    task = GenCastCfdModel(
        loss_name_to_fn(args.loss_name),
        residual_mean=stats["residual_mean"],
        residual_std=stats["residual_std"],
        in_chan=args.in_chan,
        out_chan=args.out_chan,
        n_case_params=gc_train.n_case_params,
        noise_scheduler_timesteps=args.ldm_noise_scheduler_timesteps,
        base_channels=args.pixel_diffusion_base_channels,
        channel_mults=tuple(args.pixel_diffusion_channel_mults),
        num_res_blocks=args.pixel_diffusion_num_res_blocks,
        dropout=args.pixel_diffusion_dropout,
    )
    task._with_remat(args.use_gradient_checkpointing)
    task.num_inference_steps = args.ldm_num_inference_steps
    if args.use_mixed_precision:
        task.compute_dtype = jnp_bf16()
    if "train" in args.mode:
        train_gencast(
            task,
            gc_train,
            gc_dev,
            output_dir=output_dir,
            num_epochs=args.num_epochs,
            lr=args.lr,
            batch_size=args.batch_size,
            eval_batch_size=args.eval_batch_size,
            eval_interval=args.eval_interval,
            log_interval=args.log_interval,
            weight_decay=args.weight_decay,
            grad_accum_steps=args.gradient_accumulation_steps,
            seed=args.seed,
            max_eval_batches=args.max_eval_batches,
            mesh=_mesh(args),
        )
    if "test" in args.mode:
        from .training.checkpoints import load_params

        gc_test = wrap_gencast(test_data)
        sample = {
            k: v[:2]
            for k, v in dict(
                inputs=gc_test.inputs,
                inputs_prev=gc_test.inputs_prev,
                labels=gc_test.labels,
                mask=gc_test.masks,
                case_params=gc_test.case_params,
            ).items()
        }
        template = jax.eval_shape(
            lambda: task.init_variables(jax.random.PRNGKey(0), sample)[0]
        )
        params = dict(
            load_params({"params": template}, output_dir / "best_model")
        )["params"]
        test_gencast(
            task,
            params,
            gc_test,
            output_dir / "test",
            batch_size=args.eval_batch_size,
            max_eval_batches=0,
        )


def dataclasses_replace(args, **kw):
    import dataclasses

    return dataclasses.replace(args, **kw)
