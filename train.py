#!/usr/bin/env python
"""Non-autoregressive training driver (mirror of ``src/train.py``).

Usage:
    python train.py --model deeponet --data_name dam_prop_geo \
        --data_dir <root> --mode train_test
"""

from cfdbench_tpu.cli import main_train

if __name__ == "__main__":
    main_train()
