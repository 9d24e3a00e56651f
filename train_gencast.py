#!/usr/bin/env python
"""GenCast-style residual-diffusion training driver (mirror of
``src/train_gencast.py``).

Usage:
    python train_gencast.py --data_name cavity_prop_bc_geo \
        --data_dir <root> --num_epochs 100
"""

from cfdbench_tpu.cli import main_gencast

if __name__ == "__main__":
    main_gencast()
