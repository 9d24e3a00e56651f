#!/usr/bin/env python
"""Convert a PyTorch reference checkpoint (``model.pt``) into this
framework's checkpoint format.

The reference saves ``model.state_dict()`` per eval into
``result/.../ckpt-{ep}/model.pt`` (``src/train_auto.py:294-301``). This
tool maps those weights onto the flax variable tree
(``cfdbench_tpu/utils/torch_import.py``), verifies every leaf's path
and shape against the freshly-constructed model, and writes a standard
``ckpt-{ep}`` directory (plus ``scores.json``) into this framework's
result tree — so ``--mode test`` / ``test_multistep.py`` pick it up
exactly like a locally-trained checkpoint:

    python scripts/import_reference_checkpoint.py \
        --torch_ckpt /ref/result/auto/cavity_prop_bc_geo/dt0.1/fno/..../ckpt-40/model.pt \
        --model fno --data_name cavity_prop_bc_geo --output_dir result
    python test_multistep.py --model fno --data_name cavity_prop_bc_geo ...

Model hyperparameter flags must match the reference run (depth/width
are additionally cross-checked against the state dict — a mismatch
fails with the offending paths). If a ``scores.json`` sits next to the
``model.pt``, it is copied verbatim (preserving the reference's
dev-loss for best-checkpoint selection); otherwise a stub with
``dev_loss=0.0`` is written so the imported checkpoint is selected.

torch (CPU) is required only to read the ``.pt`` file.
"""

from __future__ import annotations

import re
import shutil
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import jax

# Conversion is a host-side tool: stay off any TPU/accelerator plugin.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


NONAUTO = ("ffn", "deeponet")


def _template_variables(args):
    """Construct the model from args and init a variables tree whose
    structure/shapes the imported weights must match."""
    import jax.numpy as jnp

    from cfdbench_tpu.models import (
        get_input_shapes,
        init_auto_model,
        init_nonauto_model,
    )

    h, w, p = get_input_shapes(args)
    rng = jax.random.PRNGKey(0)
    if args.model in NONAUTO:
        model = init_nonauto_model(args, n_case_params=p)
        return model.init(
            rng,
            jnp.zeros((1, p)),
            jnp.zeros((1, 1)),
            jnp.zeros((4, 2)),
        )
    model = init_auto_model(args)
    return model.init(
        rng,
        jnp.zeros((1, h, w, args.in_chan)),
        jnp.zeros((1, p)),
        jnp.ones((1, h, w, 1)),
        train=False,
    )


def main(argv=None) -> None:
    import argparse

    from cfdbench_tpu.config import Args
    from cfdbench_tpu.training import checkpoints
    from cfdbench_tpu.utils.artifacts import get_output_dir
    from cfdbench_tpu.utils.torch_import import (
        import_state_dict,
        verify_variables,
    )

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--torch_ckpt", required=True,
                     help="path to a reference-written model.pt")
    pre.add_argument("--as_epoch", type=int, default=None,
                     help="epoch number for the ckpt dir "
                          "(default: parsed from the source ckpt-N dir)")
    pre.add_argument("--force", action="store_true",
                     help="write the dev_loss=0.0 stub scores.json even "
                          "when the target result dir already holds "
                          "locally-trained checkpoints with real dev "
                          "losses (the stub would beat all of them in "
                          "best-checkpoint selection)")
    ns, rest = pre.parse_known_args(argv)
    args = Args.parse_args(rest)

    import torch

    src = Path(ns.torch_ckpt)
    sd = torch.load(src, map_location="cpu")
    if not isinstance(sd, dict) or not all(
        hasattr(v, "detach") or isinstance(v, np.ndarray) for v in sd.values()
    ):
        raise SystemExit(
            f"{src} is not a flat state dict (got {type(sd).__name__}); "
            "pass the reference's ckpt-*/model.pt"
        )

    variables = import_state_dict(args.model, sd)
    verify_variables(variables, jax.device_get(_template_variables(args)))

    ep = ns.as_epoch
    if ep is None:
        m = re.match(r"ckpt-(\d+)$", src.parent.name)
        ep = int(m.group(1)) if m else 0

    out_root = get_output_dir(args, is_auto=args.model not in NONAUTO)
    ckpt_dir = out_root / f"ckpt-{ep}"

    # A dev_loss=0.0 stub unconditionally wins best-checkpoint
    # selection; refuse when real locally-trained scores already exist
    # in this result dir unless the user forces it (ADVICE r4 #3).
    # The guard MUST run before save_params: a refused import must
    # leave the target ckpt dir untouched, not overwrite a same-epoch
    # local checkpoint's weights and then claim it refused.
    src_scores = src.parent / "scores.json"
    if not src_scores.exists():
        others = [
            p for p in out_root.glob("ckpt-*/scores.json")
            if p.parent != ckpt_dir
        ]
        if others and not ns.force:
            raise SystemExit(
                f"{out_root} already holds {len(others)} checkpoint(s) "
                "with real scores.json; a dev_loss=0.0 stub for the "
                "imported checkpoint would beat all of them in "
                "best-checkpoint selection. Re-run with --force to "
                "write the stub anyway, or place the import in a fresh "
                "--output_dir."
            )

    checkpoints.save_params(variables, ckpt_dir)

    if src_scores.exists():
        shutil.copy(src_scores, ckpt_dir / "scores.json")
        print(f"copied reference scores.json (dev-loss preserved)")
    else:
        checkpoints.save_epoch_scores(
            ckpt_dir, ep=ep, train_loss=0.0, dev_loss=0.0, time_s=0.0
        )
        print("no scores.json next to the source; wrote a dev_loss=0.0 "
              "stub so this checkpoint is selected as best")
    n = sum(
        int(np.prod(np.asarray(x).shape))
        for x in jax.tree_util.tree_leaves(variables)
    )
    print(f"imported {src} -> {ckpt_dir} ({n:,} weights, verified)")


if __name__ == "__main__":
    main()
