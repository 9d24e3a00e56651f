#!/usr/bin/env python
"""Flagship-scale FNO systematic-parity diagnostic vs the torch
reference (dev-time tool; requires /root/reference).

Maps the reference's weights into this framework at the benchmark
shape (d4 h32 m12 on 64×64 — ``src/args.py`` defaults) and compares:

1. one forward pass (f32, ``highest`` matmul precision),
2. the nmse gradient implicitly via
3. a 20-step fixed-batch Adam trajectory (same lr, same batch).

This separates *systematic* divergence (would show here) from
*statistical* divergence (independent inits/shuffles — covered by
``compare_training.py --flagship``). Round-4 measurement: trajectory
max relative diff **2.6e-6** — no scale-dependent divergence
(PARITY.md §5 "Flagship scale").

Usage: python scripts/diag_scale_parity.py [--depth 4 --hidden 32
    --modes 12 --grid 64 --steps 20]
"""

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "scripts"))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

from make_golden import t2n  # noqa: E402

# Single source of truth for the torch->flax FNO layout mapping —
# don't re-implement it here (utils/torch_import.py::import_fno).
from cfdbench_tpu.utils.torch_import import import_state_dict  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--modes", type=int, default=12)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-3)
    a = ap.parse_args()

    sys.path.insert(0, "/root/reference/src")
    from models.fno.fno2d import Fno2d as RefFno
    from models.loss import MseLoss

    P = 5
    torch.manual_seed(3)
    ref = RefFno(
        in_chan=2, out_chan=2, n_case_params=P, loss_fn=MseLoss(True),
        num_layers=a.depth, modes1=a.modes, modes2=a.modes,
        hidden_dim=a.hidden,
    )
    ref.train()

    rng = np.random.default_rng(11)
    B, H, W = a.batch, a.grid, a.grid
    inputs = rng.standard_normal((B, 2, H, W)).astype(np.float32)
    labels = rng.standard_normal((B, 2, H, W)).astype(np.float32)
    case_params = rng.standard_normal((B, P)).astype(np.float32)
    mask = np.ones((B, H, W), np.float32)
    mask[:, H // 3: H // 2, W // 3: 2 * W // 3] = 0.0

    params = import_state_dict("fno", ref.state_dict())["params"]

    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.fno import Fno2d

    ours = Fno2d(
        in_chan=2, out_chan=2, n_case_params=P, num_layers=a.depth,
        modes1=a.modes, modes2=a.modes, hidden_dim=a.hidden,
    )
    x = jnp.asarray(inputs.transpose(0, 2, 3, 1))
    y = jnp.asarray(labels.transpose(0, 2, 3, 1))
    cp = jnp.asarray(case_params)
    mk = jnp.asarray(mask[..., None])

    out_ours = np.asarray(ours.apply({"params": params}, x, cp, mk))
    with torch.no_grad():
        out_ref = t2n(ref(
            torch.tensor(inputs), torch.tensor(case_params),
            mask=torch.tensor(mask),
        )["preds"]).transpose(0, 2, 3, 1)
    fwd = np.abs(out_ours - out_ref).max()
    print(f"forward max|diff| = {fwd:.3e} "
          f"(output scale {np.abs(out_ref).max():.3f})")

    loss_fn = loss_name_to_fn("nmse")

    def our_loss(p):
        preds = ours.apply({"params": p}, x, cp, mk)
        return loss_fn(preds * mk, y * mk)["nmse"]

    import optax

    tx = optax.adam(a.lr)
    opt_state = tx.init(params)
    p = params
    grad_fn = jax.jit(jax.value_and_grad(our_loss))
    our_losses = []
    for _ in range(a.steps):
        lo, g = grad_fn(p)
        updates, opt_state = tx.update(g, opt_state, p)
        p = optax.apply_updates(p, updates)
        our_losses.append(float(lo))

    opt = torch.optim.Adam(ref.parameters(), lr=a.lr)
    ref_losses = []
    for _ in range(a.steps):
        out = ref(
            torch.tensor(inputs), torch.tensor(case_params),
            mask=torch.tensor(mask), label=torch.tensor(labels),
        )
        lo = out["loss"]["nmse"]
        opt.zero_grad()
        lo.backward()
        opt.step()
        ref_losses.append(float(lo.detach()))

    rel = np.abs(np.array(our_losses) - np.array(ref_losses)) / np.array(
        ref_losses
    )
    print(f"{a.steps}-step Adam trajectory max rel diff = {rel.max():.3e}")
    ok = fwd < 1e-3 and rel.max() < 1e-4
    print("PARITY OK" if ok else "PARITY DIVERGED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
