#!/usr/bin/env python
"""VAE latent-space diagnostics (mirror of ``src/utils/vae.py`` and
``scripts/utils/test_vae_collapse.py``): per-dimension KL
(posterior-collapse check), latent statistics, 2-D embedding of latent
means (t-SNE when sklearn is installed — ``src/utils/vae.py:55-57`` —
else PCA), per-channel latent traversal grid
(``src/utils/vae.py:279-320``), latent histograms vs N(0,1)
(``src/utils/vae.py:86-140``), original-vs-reconstruction pairs
(``src/utils/vae.py:322-348``), and latent interpolation.

Usage: python scripts/vae_diagnostics.py --data_name cavity_prop_bc_geo \
    --data_dir <root> --ldm_vae_weights_path weights/vaelite \
    --output_dir diag_out
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

# Diagnostics are a host-side tool: stay off the tunneled TPU plugin
# (eager VAE init is minutes of op-by-op dispatch there, and the
# backend wedges after a few large compiles — CLAUDE.md).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cfdbench_tpu.config import Args  # noqa: E402
from cfdbench_tpu.data import get_auto_dataset  # noqa: E402
from cfdbench_tpu.data.vae_data import build_vae_dataset  # noqa: E402
from cfdbench_tpu.models.vae import make_cfd_vae  # noqa: E402
from cfdbench_tpu.training.checkpoints import load_params  # noqa: E402


def per_dim_kl(mean, logvar):
    """KL per latent dim, averaged over batch and spatial positions
    (posterior-collapse check, ``src/utils/vae.py:396-425``): a dim
    with KL ≈ 0 is collapsed."""
    kl = 0.5 * (np.square(mean) + np.exp(logvar) - 1.0 - logvar)
    return kl.mean(axis=(0, 1, 2))  # (latent_dim,)


def embed_2d(flat, perplexity=30):
    """2-D embedding of flattened latent means: t-SNE when sklearn is
    available (``src/utils/vae.py:55-57``), else top-2 PCA. Returns
    ``(points, method_name)``."""
    # TSNE needs perplexity < n_samples, so n >= 4 for the minimum
    # perplexity of 2 plus headroom; tiny sample counts (smoke tests,
    # 2-frame datasets) go straight to PCA.
    if flat.shape[0] >= 4:
        try:
            from sklearn.manifold import TSNE

            p = min(perplexity, max(2, flat.shape[0] - 2))
            return (
                TSNE(n_components=2, random_state=42,
                     perplexity=p).fit_transform(flat),
                "tsne",
            )
        except ImportError:
            pass
    centered = flat - flat.mean(0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    return centered @ vt[:2].T, "pca"


def write_diagnostics(vae, params, frames, out_dir, n_traversal_steps=7,
                      traversal_scale=2.0, n_recon_pairs=4):
    """Encode ``frames`` (N, H, W, C) and write every diagnostic plot +
    a ``diagnostics.json`` summary. Factored out of ``main`` so the
    test tier can drive it with a freshly-initialized tiny VAE."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    frames = jnp.asarray(frames)
    posterior = vae.apply({"params": params}, frames, method=vae.encode)
    mean = np.asarray(posterior.mean)     # (N, h, w, latent_dim)
    logvar = np.asarray(posterior.logvar)
    latent_dim = mean.shape[-1]

    kl_dims = per_dim_kl(mean, logvar)
    summary = dict(
        per_dim_kl=[float(k) for k in kl_dims],
        collapsed_dims=[int(i) for i, k in enumerate(kl_dims) if k < 0.01],
        latent_mean=float(mean.mean()),
        latent_std=float(mean.std()),
        # A fully-collapsed posterior (identical means — the pathology
        # this tool diagnoses) has std 0: report null, not Infinity
        # (json.dump would emit non-spec `Infinity`).
        scaling_factor=(
            float(1.0 / mean.std()) if float(mean.std()) > 0 else None
        ),
    )

    # 2-D embedding of latent means (t-SNE or PCA).
    flat = mean.reshape(mean.shape[0], -1)
    proj, method = embed_2d(flat)
    summary["embedding_method"] = method
    plt.scatter(proj[:, 0], proj[:, 1], s=6)
    plt.title(f"latent means ({method})")
    plt.savefig(out_dir / "latent_embedding.png")
    plt.clf()

    # Latent histograms: overall + per channel, against N(0, 1).
    fig, axes = plt.subplots(
        1, 1 + latent_dim, figsize=(4 * (1 + latent_dim), 3)
    )
    axes = np.atleast_1d(axes)
    grid = np.linspace(-3, 3, 200)
    normal = np.exp(-grid**2 / 2) / np.sqrt(2 * np.pi)
    axes[0].hist(mean.reshape(-1), bins=100, density=True, alpha=0.7)
    axes[0].plot(grid, normal, "r--", lw=1)
    axes[0].set_title("all latent values")
    for c in range(latent_dim):
        axes[1 + c].hist(
            mean[..., c].reshape(-1), bins=60, density=True, alpha=0.7
        )
        axes[1 + c].plot(grid, normal, "r--", lw=1)
        axes[1 + c].set_title(f"channel {c} (KL {kl_dims[c]:.3f})")
    fig.tight_layout()
    fig.savefig(out_dir / "latent_histograms.png")
    plt.close(fig)

    # Per-channel latent traversal: add a constant to one channel of a
    # base latent, decode, plot the u-velocity reconstruction.
    z_base = jnp.asarray(mean[:1])
    vals = np.linspace(-traversal_scale, traversal_scale,
                       n_traversal_steps)
    fig, axes = plt.subplots(
        latent_dim, n_traversal_steps,
        figsize=(2 * n_traversal_steps, 2 * latent_dim), squeeze=False,
    )
    for dim in range(latent_dim):
        zs = jnp.concatenate(
            [
                z_base.at[..., dim].add(float(v))
                for v in vals
            ]
        )
        recons = np.asarray(
            vae.apply({"params": params}, zs, method=vae.decode)
        )
        for step, v in enumerate(vals):
            ax = axes[dim][step]
            ax.imshow(recons[step, ..., 0], cmap="viridis")
            ax.axis("off")
            if dim == 0:
                ax.set_title(f"{v:+.1f}", fontsize=9)
        axes[dim][0].text(
            -0.15, 0.5, f"ch {dim}", transform=axes[dim][0].transAxes,
            rotation=90, va="center",
        )
    fig.suptitle("latent traversal per channel (u recon)")
    fig.savefig(out_dir / "latent_traversals.png", dpi=120)
    plt.close(fig)

    # Original vs reconstruction pairs.
    n_pairs = min(n_recon_pairs, frames.shape[0])
    recon = np.asarray(
        vae.apply({"params": params}, jnp.asarray(mean[:n_pairs]),
                  method=vae.decode)
    )
    fig, axes = plt.subplots(n_pairs, 2, figsize=(6, 3 * n_pairs),
                             squeeze=False)
    for i in range(n_pairs):
        axes[i][0].imshow(np.asarray(frames[i, ..., 0]), cmap="viridis")
        axes[i][0].set_title(f"original #{i}")
        axes[i][1].imshow(recon[i, ..., 0], cmap="viridis")
        axes[i][1].set_title(f"reconstruction #{i}")
        for ax in axes[i]:
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_dir / "reconstructions.png")
    plt.close(fig)

    # Latent interpolation between the first two frames.
    if mean.shape[0] >= 2:
        alphas = np.linspace(0, 1, 6)
        zs = jnp.asarray(
            [mean[0] * (1 - a) + mean[1] * a for a in alphas]
        )
        recons = np.asarray(
            vae.apply({"params": params}, zs, method=vae.decode)
        )
        fig, axs = plt.subplots(
            1, len(alphas), figsize=(2 * len(alphas), 2)
        )
        for ax, a, r in zip(axs, alphas, recons):
            ax.imshow(r[..., 0])
            ax.set_title(f"a={a:.1f}")
            ax.axis("off")
        fig.savefig(out_dir / "latent_interpolation.png")
        plt.close(fig)

    with open(out_dir / "diagnostics.json", "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def main():
    args = Args.parse_args()
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    _, dev, _ = get_auto_dataset(
        data_dir=Path(args.data_dir),
        data_name=args.data_name,
        delta_time=args.delta_time,
        norm_props=bool(args.norm_props),
        norm_bc=bool(args.norm_bc),
        load_splits=["dev"],
        seed=args.seed,
        cache_dir=args.cache_dir or None,
    )
    frames = build_vae_dataset(dev).frames[:256]

    # Same variant/shape flags the trainer honors (cli.py main_vae) —
    # a v2- or custom-trained checkpoint restores into the right tree.
    vae = make_cfd_vae(
        args.vae_variant, 2, 2,
        args.z_channels if args.vae_variant == "custom"
        else args.ldm_latent_dim,
        ch=args.ch,
        ch_mult=tuple(args.ch_mult),
        num_res_blocks=args.num_res_blocks,
    )
    # Abstract template (shapes only): restore needs structure, not an
    # eager init (cli.py:make_auto_task uses the same pattern).
    template = jax.eval_shape(
        lambda: dict(
            vae.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 2)),
                rng=None,
            )
        )
    )
    params = dict(
        load_params(template, Path(args.ldm_vae_weights_path))
    )["params"]

    summary = write_diagnostics(vae, params, frames, out_dir)
    print("Per-dimension KL (collapse check; ~0 = collapsed):")
    for i, k in enumerate(summary["per_dim_kl"]):
        flag = "  <-- COLLAPSED" if i in summary["collapsed_dims"] else ""
        print(f"  dim {i}: {k:.4f}{flag}")
    print(
        f"latent mean stats: mean={summary['latent_mean']:.4f} "
        f"std={summary['latent_std']:.4f}"
    )
    sf = summary["scaling_factor"]
    print(
        "suggested scaling_factor = 1/std = "
        + (f"{sf:.4f}" if sf is not None else "undefined (collapsed)")
    )
    print(f"plots + diagnostics.json written to {out_dir} "
          f"(embedding: {summary['embedding_method']})")


if __name__ == "__main__":
    main()
