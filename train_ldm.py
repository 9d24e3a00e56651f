#!/usr/bin/env python
"""Latent-diffusion training driver (mirror of ``src/train_ldm.py`` /
``train_ldm2.py``).

Two-stage pipeline: first train the VAE (``train_vae.py``), then:
    python train_ldm.py --model latent_diffusion2 --data_name ... \
        --ldm_vae_weights_path weights/vaelite_002
"""

import sys

from cfdbench_tpu.cli import main_auto

if __name__ == "__main__":
    argv = sys.argv[1:]
    if not any(a.startswith("--model") for a in argv):
        argv = ["--model", "latent_diffusion2"] + argv
    main_auto(argv)
