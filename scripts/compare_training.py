#!/usr/bin/env python
"""End-to-end training-quality comparison vs the reference.

Trains the reference's torch models (CPU) and this framework's flax
models on the SAME synthetic case tree / split / hyperparameters and
compares final dev scores. Unlike the golden-fixture tests (bit-level
parity on fixed batches), this covers the full loops — data pipeline,
shuffling, optimizer, LR schedule, eval — where only *statistical*
parity is expected (different RNG streams for shuffling/init).

Dev-time tool (requires /root/reference). Results are recorded in
PARITY.md §parity-evidence.

Usage: python scripts/compare_training.py [--epochs 30] [--model fno]
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
REFERENCE_SRC = Path("/root/reference/src")



def _delta_time(data_name: str) -> float:
    """Per-problem delta_time matching the reference's data stride:
    cylinder frames are 0.001 s apart (cylinder.py:421), so stride-1
    pairs on the 12-frame synthetic tree need delta_time=0.001; the
    other problems use the reference scripts' default 0.1."""
    return 0.001 if data_name.startswith("cylinder") else 0.1


@contextlib.contextmanager
def _chdir(path):
    """The reference cylinder auto dataset writes a torch cache to
    ``./dataset/cache/cylinder/<subset>`` relative to CWD
    (cylinder.py:654): pin CWD to the per-run tree root so caches can
    neither litter the repo nor leak between runs with different trees."""
    prev = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(prev)


def _collate_reference_auto(batch):
    """Reference train_auto.py collate (src/train_auto.py:44-51):
    channel split + case-param key filtering — shared by the FNO-family
    and auto_deeponet reference loops so the exclusion list cannot
    drift between them."""
    import torch

    inputs, labels, case_params = zip(*batch)
    inputs = torch.stack(inputs)
    labels = torch.stack(labels)
    keys = [
        k for k in case_params[0].keys()
        if k not in ("rotated", "dx", "dy")
    ]
    cp = torch.tensor(
        [[float(p[k]) for k in keys] for p in case_params]
    )
    return dict(
        inputs=inputs[:, :-1], label=labels[:, :-1],
        mask=inputs[:, -1:], case_params=cp,
    )

def make_tree(grid=16, data_name="cavity_prop_bc_geo"):
    sys.path.insert(0, str(REPO_ROOT))
    from cfdbench_tpu.data.synthetic import generate_all

    root = Path(tempfile.mkdtemp()) / "synth"
    # Same parameters as the test suite's fixture; the default 16x16
    # grid keeps the torch-CPU side fast while exercising every code
    # path. --flagship raises this to the benchmark's 64x64. The
    # 80/10/10 case split (int() floors, dataset/tube.py:360-365) needs
    # >= 10 cases total for a non-empty dev split, so single-subset
    # data names (tube_prop, cylinder_prop) get a bigger tree.
    n_subsets = sum(s in data_name for s in ("prop", "bc", "geo"))
    per_subset = max(5, -(-10 // max(n_subsets, 1)))
    generate_all(root, cases_per_subset=per_subset, num_frames=12,
                 grid=grid, seed=0)
    return root


# Model-size presets: "small" is the fast test-tier shape; "flagship"
# is the benchmark shape (FNO d4 h32 m12 on 64x64 — src/args.py
# defaults), for ruling out scale-dependent divergence that the small
# comparisons cannot see (BN stats, mode count, schedule length).
FNO_SCALES = dict(
    small=dict(num_layers=2, modes1=4, modes2=4, hidden_dim=8),
    flagship=dict(num_layers=4, modes1=12, modes2=12, hidden_dim=32),
)


def _make_reference_model(name, seed, scale="small", n_case_params=5):
    import torch

    from models.loss import MseLoss

    torch.manual_seed(seed)
    if name == "fno":
        from models.fno.fno2d import Fno2d

        return Fno2d(
            in_chan=2, out_chan=2, n_case_params=n_case_params,
            loss_fn=MseLoss(True), **FNO_SCALES[scale],
        )
    if name == "unet":
        from models.unet import UNet

        return UNet(
            in_chan=2, out_chan=2, loss_fn=MseLoss(True),
            n_case_params=n_case_params, insert_case_params_at="input",
            bilinear=False, dim=4,
        )
    if name == "resnet":
        from models.resnet import ResNet

        return ResNet(
            in_chan=2, out_chan=2, n_case_params=n_case_params,
            loss_fn=MseLoss(True), hidden_chan=8, num_blocks=2,
            kernel_size=3, padding=1,
        )
    raise ValueError(name)


def _make_our_model(name, scale="small", n_case_params=5):
    if name == "fno":
        from cfdbench_tpu.models.fno import Fno2d

        return Fno2d(
            in_chan=2, out_chan=2, n_case_params=n_case_params,
            **FNO_SCALES[scale],
        )
    if name == "unet":
        from cfdbench_tpu.models.unet import UNet

        return UNet(
            in_chan=2, out_chan=2, n_case_params=n_case_params,
            insert_case_params_at="input", dim=4,
        )
    if name == "resnet":
        from cfdbench_tpu.models.resnet import ResNet

        return ResNet(
            in_chan=2, out_chan=2, n_case_params=n_case_params,
            hidden_chan=8, num_blocks=2, kernel_size=3, padding=1,
        )
    raise ValueError(name)


def train_reference_fno(root, epochs, lr, batch_size, seed=0,
                        model_name="fno", scale="small",
                        data_name="cavity_prop_bc_geo"):
    sys.path.insert(0, str(REFERENCE_SRC))
    import torch
    from torch.utils.data import DataLoader

    from dataset import get_auto_dataset

    with _chdir(root):
        train_data, dev_data, _ = get_auto_dataset(
            data_dir=root, data_name=data_name,
            delta_time=_delta_time(data_name),
            norm_props=True, norm_bc=True,
            load_splits=["train", "dev"],
        )

    collate = _collate_reference_auto

    # n_case_params is shape-driven, exactly as the reference driver
    # derives it from the first collated batch (src/train_auto.py:44-60);
    # cavity/tube have 5, cylinder 8 (cylinder.py:297-306).
    n_case_params = collate([train_data[0]])["case_params"].shape[-1]
    model = _make_reference_model(model_name, seed, scale, n_case_params)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.9)
    loader = DataLoader(
        train_data, batch_size=batch_size, shuffle=True,
        collate_fn=collate,
    )
    dev_loader = DataLoader(
        dev_data, batch_size=batch_size, shuffle=False,
        collate_fn=collate,
    )
    t0 = time.time()
    for ep in range(epochs):
        model.train()
        for batch in loader:
            out = model(
                batch["inputs"], batch["case_params"],
                mask=batch["mask"], label=batch["label"],
            )
            opt.zero_grad()
            out["loss"]["nmse"].backward()
            opt.step()
        sched.step()
    model.eval()
    scores = []
    with torch.no_grad():
        for batch in dev_loader:
            out = model(
                batch["inputs"], batch["case_params"],
                mask=batch["mask"], label=batch["label"],
            )
            scores.append(float(out["loss"]["nmse"]))
    return dict(
        dev_nmse=float(np.mean(scores)), train_s=time.time() - t0
    )


def train_ours_fno(root, epochs, lr, batch_size, out_dir, seed=0,
                   model_name="fno", scale="small",
                   data_name="cavity_prop_bc_geo"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cfdbench_tpu.data import get_auto_dataset
    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.training import trainer_auto

    train_data, dev_data, _ = get_auto_dataset(
        root, data_name, _delta_time(data_name), True, True,
        load_splits=["train", "dev"],
    )
    model = _make_our_model(model_name, scale, train_data.n_case_params)
    task = trainer_auto.AutoTask(model, loss_name_to_fn("nmse"))
    t0 = time.time()
    state = trainer_auto.train(
        task, train_data, dev_data, output_dir=out_dir,
        num_epochs=epochs, lr=lr, batch_size=batch_size,
        eval_batch_size=batch_size, eval_interval=epochs,
        log_interval=10_000, seed=seed,
    )
    train_s = time.time() - t0
    result = trainer_auto.evaluate(
        task, state.params, dev_data, out_dir,
        model_state=state.model_state, batch_size=batch_size,
        collect_preds=False,
    )
    return dict(
        dev_nmse=result["scores"]["mean"]["nmse"], train_s=train_s
    )


def train_reference_deeponet(root, epochs, lr, batch_size, seed=0,
                             model_name="deeponet"):
    """Non-auto regime: the reference's ``src/train.py`` loop —
    DeepONet/FFN with 1000 random lattice samples per frame, dev eval
    by full-lattice ``generate_one`` scored on the u channel
    (``train.py:64-92, 147-245``)."""
    sys.path.insert(0, str(REFERENCE_SRC))
    import torch
    from torch.utils.data import DataLoader

    from dataset.cavity import get_cavity_datasets
    from models.loss import MseLoss

    train_data, dev_data, _ = get_cavity_datasets(
        data_dir=root / "cavity", case_name="prop_bc_geo",
        norm_props=True, norm_bc=True,
    )

    def collate(batch):
        case_params, t, label = zip(*batch)
        return dict(
            case_params=torch.stack(case_params),
            t=torch.stack(t),
            label=torch.stack(label),
        )

    torch.manual_seed(seed)
    if model_name == "ffn":
        from models.ffn import FfnModel

        model = FfnModel(
            widths=[5 + 3] + [32] * 3 + [1], loss_fn=MseLoss(True)
        )
    else:
        from models.deeponet import DeepONet

        model = DeepONet(
            branch_dim=5, trunk_dim=3, loss_fn=MseLoss(True),
            width=32, branch_depth=3, trunk_depth=3,
        )
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.9)
    loader = DataLoader(
        train_data, batch_size=batch_size, shuffle=True,
        collate_fn=collate,
    )
    dev_loader = DataLoader(
        dev_data, batch_size=batch_size, shuffle=False,
        collate_fn=collate,
    )
    t0 = time.time()
    for ep in range(epochs):
        model.train()
        for batch in loader:
            out = model(
                case_params=batch["case_params"], t=batch["t"],
                label=batch["label"],
            )
            opt.zero_grad()
            out["loss"]["nmse"].backward()
            opt.step()
        sched.step()
    model.eval()
    scores = []
    with torch.no_grad():
        for batch in dev_loader:
            h, w = batch["label"].shape[-2:]
            preds = model.generate_one(
                case_params=batch["case_params"], t=batch["t"],
                height=h, width=w,
            )
            loss = model.loss_fn(
                labels=batch["label"][:, :1], preds=preds
            )
            scores.append(float(loss["nmse"]))
    return dict(
        dev_nmse=float(np.mean(scores)), train_s=time.time() - t0
    )


def train_ours_deeponet(root, epochs, lr, batch_size, out_dir, seed=0,
                        model_name="deeponet"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cfdbench_tpu.data import get_dataset
    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.training import trainer_nonauto

    train_data, dev_data, _ = get_dataset(
        "cavity_prop_bc_geo", root, norm_props=True, norm_bc=True,
    )
    if model_name == "ffn":
        from cfdbench_tpu.models.nonauto import FfnModel

        model = FfnModel(n_case_params=5, width=32, depth=3)
    else:
        from cfdbench_tpu.models.nonauto import DeepONet

        model = DeepONet(
            n_case_params=5, width=32, branch_depth=3, trunk_depth=3
        )
    task = trainer_nonauto.NonAutoTask(model, loss_name_to_fn("nmse"))
    t0 = time.time()
    state = trainer_nonauto.train(
        task, train_data, dev_data, output_dir=out_dir,
        num_epochs=epochs, lr=lr, batch_size=batch_size,
        eval_interval=epochs, log_interval=10_000, seed=seed,
    )
    train_s = time.time() - t0
    result = trainer_nonauto.evaluate(
        task, state.params, dev_data, out_dir,
        batch_size=batch_size, collect_preds=False,
    )
    return dict(
        dev_nmse=result["scores"]["mean"]["nmse"], train_s=train_s
    )


def train_reference_auto_deeponet(root, epochs, lr, batch_size, seed=0):
    """Auto point model through the reference's ``train_auto.py`` loop
    (``src/models/auto_deeponet.py:76-147``)."""
    sys.path.insert(0, str(REFERENCE_SRC))
    import torch
    from torch.utils.data import DataLoader

    from dataset.cavity import get_cavity_auto_datasets
    from models.auto_deeponet import AutoDeepONet
    from models.loss import MseLoss

    train_data, dev_data, _ = get_cavity_auto_datasets(
        data_dir=root / "cavity", case_name="prop_bc_geo",
        norm_props=True, norm_bc=True, delta_time=0.1,
    )

    collate = _collate_reference_auto

    torch.manual_seed(seed)
    grid = 16
    model = AutoDeepONet(
        branch_dim=grid * grid + 5, trunk_dim=2,
        loss_fn=MseLoss(True), width=32, branch_depth=3,
        trunk_depth=3,
    )
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.9)
    loader = DataLoader(
        train_data, batch_size=batch_size, shuffle=True,
        collate_fn=collate,
    )
    dev_loader = DataLoader(
        dev_data, batch_size=batch_size, shuffle=False,
        collate_fn=collate,
    )
    t0 = time.time()
    for ep in range(epochs):
        model.train()
        for batch in loader:
            out = model(
                batch["inputs"], batch["case_params"],
                label=batch["label"], mask=batch["mask"],
            )
            opt.zero_grad()
            out["loss"]["nmse"].backward()
            opt.step()
        sched.step()
    model.eval()
    scores = []
    with torch.no_grad():
        for batch in dev_loader:
            out = model(
                batch["inputs"], batch["case_params"],
                label=batch["label"], mask=batch["mask"],
            )
            scores.append(float(out["loss"]["nmse"]))
    return dict(
        dev_nmse=float(np.mean(scores)), train_s=time.time() - t0
    )


def train_ours_auto_deeponet(root, epochs, lr, batch_size, out_dir,
                             seed=0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cfdbench_tpu.data import get_auto_dataset
    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.point import AutoDeepONet
    from cfdbench_tpu.training import trainer_auto

    train_data, dev_data, _ = get_auto_dataset(
        root, "cavity_prop_bc_geo", 0.1, True, True,
        load_splits=["train", "dev"],
    )
    grid = train_data.field_shape[0]
    model = AutoDeepONet(
        branch_dim=grid * grid + 5, width=32, branch_depth=3,
        trunk_depth=3,
    )
    task = trainer_auto.AutoTask(model, loss_name_to_fn("nmse"))
    t0 = time.time()
    state = trainer_auto.train(
        task, train_data, dev_data, output_dir=out_dir,
        num_epochs=epochs, lr=lr, batch_size=batch_size,
        eval_batch_size=batch_size, eval_interval=epochs,
        log_interval=10_000, seed=seed,
    )
    train_s = time.time() - t0
    result = trainer_auto.evaluate(
        task, state.params, dev_data, out_dir,
        model_state=state.model_state, batch_size=batch_size,
        collect_preds=False,
    )
    return dict(
        dev_nmse=result["scores"]["mean"]["nmse"], train_s=train_s
    )


TRAINERS = {
    "fno": (train_ours_fno, train_reference_fno),
    "unet": (train_ours_fno, train_reference_fno),
    "resnet": (train_ours_fno, train_reference_fno),
    "deeponet": (train_ours_deeponet, train_reference_deeponet),
    "ffn": (train_ours_deeponet, train_reference_deeponet),
    "auto_deeponet": (
        train_ours_auto_deeponet, train_reference_auto_deeponet
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--seed_offset", type=int, default=0,
                    help="first seed (extend an earlier run without "
                    "re-running its seeds)")
    ap.add_argument("--model", default="fno", choices=sorted(TRAINERS))
    ap.add_argument(
        "--data_name", default="cavity_prop_bc_geo",
        help="auto-family (fno/unet/resnet) can also compare on the "
        "padded-BC grid path (tube_*: H+2 x W+1, "
        "src/dataset/tube.py:34-51) and the 8-case-param problem "
        "(cylinder_*, src/dataset/cylinder.py:297-306); point/non-auto "
        "models stay cavity-only",
    )
    ap.add_argument("--grid", type=int, default=16)
    ap.add_argument(
        "--flagship", action="store_true",
        help="FNO at the benchmark shape (d4 h32 m12) on a 64x64 "
        "synthetic tree — rules out scale-dependent divergence "
        "(fno only; pick --epochs/--seeds small, torch-CPU is slow)",
    )
    args = ap.parse_args()
    if args.flagship:
        assert args.model == "fno", "--flagship is the FNO benchmark shape"
        args.grid = 64
    if args.data_name != "cavity_prop_bc_geo":
        assert args.model in ("fno", "unet", "resnet"), (
            "--data_name is plumbed through the auto-family loop only"
        )
    root = make_tree(args.grid, args.data_name)
    ours_fn, ref_fn = TRAINERS[args.model]
    ours, ref = [], []
    for seed in range(args.seed_offset, args.seed_offset + args.seeds):
        out = Path(tempfile.mkdtemp()) / "ours"
        kw = (
            dict(model_name=args.model)
            if args.model in ("fno", "unet", "resnet", "ffn", "deeponet")
            else {}
        )
        if args.model in ("fno", "unet", "resnet"):
            kw["data_name"] = args.data_name
        if args.flagship:
            kw["scale"] = "flagship"
        ours.append(
            ours_fn(
                root, args.epochs, args.lr, args.batch_size, out,
                seed=seed, **kw,
            )
        )
        ref.append(
            ref_fn(
                root, args.epochs, args.lr, args.batch_size,
                seed=seed, **kw,
            )
        )

    def summarize(rows):
        v = [r["dev_nmse"] for r in rows]
        return dict(
            dev_nmse_mean=float(np.mean(v)),
            dev_nmse_min=float(np.min(v)),
            dev_nmse_max=float(np.max(v)),
            per_seed=[round(x, 4) for x in v],
        )

    print(json.dumps(dict(
        config=dict(model=args.model, grid=args.grid,
                    scale="flagship" if args.flagship else "small",
                    epochs=args.epochs, lr=args.lr,
                    batch_size=args.batch_size, seeds=args.seeds,
                    data=f"synthetic {args.data_name}"),
        reference_torch=summarize(ref),
        this_framework=summarize(ours),
    ), indent=2))


if __name__ == "__main__":
    main()
