#!/usr/bin/env python
"""Autoregressive training driver.

Usage mirrors the reference (``src/train_auto.py``):
    python train_auto.py --model fno --data_name cavity_prop_bc_geo \
        --data_dir <root> --mode train_test
"""

from cfdbench_tpu.cli import main_auto

if __name__ == "__main__":
    main_auto()
