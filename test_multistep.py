#!/usr/bin/env python
"""Multi-step rollout evaluation (mirror of ``src/test_multistep.py``).

Usage:
    python test_multistep.py --model fno --data_name cavity_prop_bc_geo \
        --data_dir <root>
"""

from cfdbench_tpu.cli import main_multistep

if __name__ == "__main__":
    main_multistep()
