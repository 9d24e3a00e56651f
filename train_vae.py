#!/usr/bin/env python
"""VAE training driver (mirror of ``src/train_vae.py``).

Usage:
    python train_vae.py --data_name cavity_prop_bc_geo --data_dir <root> \
        --ldm_vae_weights_path weights/vaelite_002

KL annealing (``src/train_vae_kl_annealing.py``): pass
``--mode train_anneal``.
"""

from cfdbench_tpu.cli import main_vae

if __name__ == "__main__":
    main_vae()
