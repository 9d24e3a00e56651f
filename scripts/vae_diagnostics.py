#!/usr/bin/env python
"""VAE latent-space diagnostics (mirror of ``src/utils/vae.py`` and
``scripts/utils/test_vae_collapse.py``): per-dimension KL
(posterior-collapse check), latent statistics, PCA scatter of latent
means, and latent interpolation reconstructions.

Usage: python scripts/vae_diagnostics.py --data_name cavity_prop_bc_geo \
    --data_dir <root> --ldm_vae_weights_path weights/vaelite \
    --output_dir diag_out
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
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
    )
    frames = build_vae_dataset(dev).frames[:256]

    vae = make_cfd_vae("lite", 2, 2, args.ldm_latent_dim)
    template = dict(
        vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 2)), rng=None)
    )
    params = dict(
        load_params(template, Path(args.ldm_vae_weights_path))
    )["params"]

    posterior = vae.apply(
        {"params": params}, jnp.asarray(frames), method=vae.encode
    )
    mean = np.asarray(posterior.mean)
    logvar = np.asarray(posterior.logvar)

    kl_dims = per_dim_kl(mean, logvar)
    print("Per-dimension KL (collapse check; ~0 = collapsed):")
    for i, k in enumerate(kl_dims):
        flag = "  <-- COLLAPSED" if k < 0.01 else ""
        print(f"  dim {i}: {k:.4f}{flag}")
    print(f"latent mean stats: mean={mean.mean():.4f} std={mean.std():.4f}")
    print(f"suggested scaling_factor = 1/std = {1.0 / mean.std():.4f}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        # PCA scatter of flattened latent means.
        flat = mean.reshape(mean.shape[0], -1)
        flat = flat - flat.mean(0)
        _, _, vt = np.linalg.svd(flat, full_matrices=False)
        proj = flat @ vt[:2].T
        plt.scatter(proj[:, 0], proj[:, 1], s=4)
        plt.title("latent means (PCA)")
        plt.savefig(out_dir / "latent_pca.png")
        plt.clf()

        # Latent interpolation between two frames.
        z0, z1 = mean[0], mean[1]
        alphas = np.linspace(0, 1, 6)
        zs = jnp.asarray([z0 * (1 - a) + z1 * a for a in alphas])
        recons = np.asarray(
            vae.apply({"params": params}, zs, method=vae.decode)
        )
        fig, axs = plt.subplots(1, len(alphas), figsize=(2 * len(alphas), 2))
        for ax, a, r in zip(axs, alphas, recons):
            ax.imshow(r[..., 0])
            ax.set_title(f"a={a:.1f}")
            ax.axis("off")
        fig.savefig(out_dir / "latent_interpolation.png")
        plt.close("all")
        print(f"plots written to {out_dir}")
    except Exception as e:  # pragma: no cover
        print(f"plotting skipped: {e}")


if __name__ == "__main__":
    main()
