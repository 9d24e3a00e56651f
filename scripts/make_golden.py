#!/usr/bin/env python
"""Generate golden forward-parity fixtures from the reference models.

Dev-time-only tool (requires the read-only reference checkout at
``/root/reference``): instantiates the reference's torch models on CPU
with fixed seeds, runs one forward pass on fixed inputs, converts the
torch weights to this repo's flax parameter trees, and writes
``tests/golden/<model>.npz`` fixtures. The committed fixtures make
``tests/test_golden_parity.py`` hermetic — the reference is never
imported at test time.

Weight-mapping conventions (torch → flax/NHWC):
- Linear ``(out, in)`` → Dense kernel ``(in, out)`` (transpose)
- Conv2d ``(out, in, kh, kw)`` → Conv kernel ``(kh, kw, in, out)``
- 1×1 Conv2d → Dense kernel ``w[:, :, 0, 0].T``
- ConvTranspose2d ``(in, out, kh, kw)`` → ConvTranspose kernel
  ``(kh, kw, in, out)`` with both spatial axes flipped (numerically
  probed: lax.conv_transpose does not flip the kernel, torch's
  gradient-of-conv does — exact match on CPU after the flip)
- SpectralConv2d_fast complex ``weights1/weights2`` ``(in, out, m1, m2)``
  → real ``(corner, re/im, in, out, m1, m2)``
- BatchNorm2d weight/bias → scale/bias params; running stats →
  ``batch_stats`` collection.

Usage: python scripts/make_golden.py [--out tests/golden]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import torch

REFERENCE_SRC = Path("/root/reference/src")
REPO_ROOT = Path(__file__).resolve().parent.parent

B, H, W, P = 2, 16, 16, 5


sys.path.insert(0, str(REPO_ROOT))

# The torch→flax array mappings live in the installed package
# (cfdbench_tpu/utils/torch_import.py) and are shared with the
# user-facing checkpoint importer (scripts/import_reference_checkpoint.py)
# — one source of truth, locked at value level by the golden fixtures
# this script emits. The thin wrappers below adapt raw torch state
# dicts (tensors) to those numpy-based helpers and keep this script's
# historical signatures.
from cfdbench_tpu.utils import torch_import as _ti


def t2n(x):
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


class _NpSd:
    """Numpy view of a torch state dict (converts per-key access)."""

    def __init__(self, sd):
        self._sd = sd

    def __getitem__(self, k):
        return t2n(self._sd[k])

    def __contains__(self, k):
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)


def lin(sd, key):
    return _ti.lin(_NpSd(sd), key)


def conv1x1_as_dense(sd, key):
    return _ti.conv1x1_as_dense(_NpSd(sd), key)


def conv(sd, key):
    return _ti.conv(_NpSd(sd), key)


def bn(sd, key):
    return _ti.bn(_NpSd(sd), key)


def mlp(sd, key, n_linear=None):
    """Reference Ffn → Mlp subtree; linear count inferred from keys and
    cross-checked against the historical explicit count."""
    view = _NpSd(sd)
    inferred = _ti._seq_linear_indices(view, key)
    if n_linear is not None:
        assert len(inferred) == n_linear, (key, inferred, n_linear)
    return _ti.mlp(view, key)


def flatten(tree, prefix, out):
    for k, v in tree.items():
        if isinstance(v, dict):
            flatten(v, f"{prefix}{k}|", out)
        else:
            out[f"{prefix}{k}"] = np.asarray(v)


def save_case(name, params, stats, inputs_nhwc, case_params, mask_nhwc,
              expected_nhwc, out_dir):
    data = {}
    flatten(params, "P|", data)
    if stats:
        flatten(stats, "S|", data)
    data["input"] = inputs_nhwc
    data["case_params"] = case_params
    data["mask"] = mask_nhwc
    data["expected"] = expected_nhwc
    out = Path(out_dir) / f"{name}.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, **data)
    print(f"wrote {out} ({len(data)} arrays, "
          f"expected mean {np.abs(expected_nhwc).mean():.4f})")


def fixed_inputs(rng, in_chan=2):
    inputs = rng.standard_normal((B, in_chan, H, W)).astype(np.float32)
    case_params = rng.standard_normal((B, P)).astype(np.float32)
    mask = np.ones((B, H, W), np.float32)
    mask[:, 5:9, 6:11] = 0.0  # exercise the masking path
    return inputs, case_params, mask


def make_fno(out_dir):
    from models.fno.fno2d import Fno2d  # noqa: reference import
    from models.loss import MseLoss

    torch.manual_seed(7)
    m = Fno2d(
        in_chan=2, out_chan=2, n_case_params=P, loss_fn=MseLoss(True),
        num_layers=2, modes1=4, modes2=4, hidden_dim=8,
    ).eval()
    rng = np.random.default_rng(42)
    inputs, case_params, mask = fixed_inputs(rng)
    with torch.no_grad():
        out = m(
            torch.tensor(inputs), torch.tensor(case_params),
            mask=torch.tensor(mask),
        )["preds"]
    sd = m.state_dict()
    params = {
        "Dense_0": conv1x1_as_dense(sd, "fc0"),
        "Dense_1": conv1x1_as_dense(sd, "fc1"),
        "Dense_2": conv1x1_as_dense(sd, "fc2"),
    }
    for i in range(2):
        w1 = t2n(sd[f"blocks.{i}.conv0.weights1"])
        w2 = t2n(sd[f"blocks.{i}.conv0.weights2"])
        spectral = np.stack(
            [
                np.stack([w1.real, w1.imag]),
                np.stack([w2.real, w2.imag]),
            ]
        ).astype(np.float32)  # (corner, re/im, in, out, m1, m2)
        params[f"FnoBlock_{i}"] = {
            "SpectralConv2d_0": {"weights": spectral},
            "Dense_0": conv1x1_as_dense(sd, f"blocks.{i}.w0"),
        }
    save_case(
        "fno", params, {},
        inputs.transpose(0, 2, 3, 1), case_params, mask[..., None],
        t2n(out).transpose(0, 2, 3, 1), out_dir,
    )


def map_double_conv(sd, key):
    p1, s1 = bn(sd, f"{key}.conv1.1")
    p2, s2 = bn(sd, f"{key}.conv2.1")
    params = {
        "Conv_0": conv(sd, f"{key}.conv1.0"),
        "BatchNorm_0": p1,
        "Conv_1": conv(sd, f"{key}.conv2.0"),
        "BatchNorm_1": p2,
    }
    stats = {"BatchNorm_0": s1, "BatchNorm_1": s2}
    return params, stats


def make_unet(out_dir, insert_at):
    from models.loss import MseLoss
    from models.unet import UNet

    torch.manual_seed(11)
    m = UNet(
        in_chan=2, out_chan=2, loss_fn=MseLoss(True), n_case_params=P,
        insert_case_params_at=insert_at, bilinear=False, dim=4,
    ).eval()
    rng = np.random.default_rng(43)
    inputs, case_params, mask = fixed_inputs(rng)
    with torch.no_grad():
        out = m(
            torch.tensor(inputs), torch.tensor(case_params),
            mask=torch.tensor(mask),
        )["preds"]
    sd = m.state_dict()
    params, stats = {}, {}
    p, s = map_double_conv(sd, "in_conv")
    params["DoubleConv_0"], stats["DoubleConv_0"] = p, s
    for i in range(4):
        p, s = map_double_conv(sd, f"down{i + 1}.maxpool_conv.1")
        params[f"Down_{i}"] = {"DoubleConv_0": p}
        stats[f"Down_{i}"] = {"DoubleConv_0": s}
    if insert_at == "hidden":
        params["Dense_0"] = lin(sd, "case_params_fc")
    for i in range(4):
        tw = t2n(sd[f"up{i + 1}.up.weight"])  # (in, out, kh, kw)
        p, s = map_double_conv(sd, f"up{i + 1}.conv")
        params[f"Up_{i}"] = {
            "ConvTranspose_0": {
                "kernel": np.ascontiguousarray(
                    tw.transpose(2, 3, 0, 1)[::-1, ::-1]
                ),
                "bias": t2n(sd[f"up{i + 1}.up.bias"]),
            },
            "DoubleConv_0": p,
        }
        stats[f"Up_{i}"] = {"DoubleConv_0": s}
    params["Conv_0"] = conv(sd, "out_conv.conv")
    save_case(
        f"unet_{insert_at}", params, stats,
        inputs.transpose(0, 2, 3, 1), case_params, mask[..., None],
        t2n(out).transpose(0, 2, 3, 1), out_dir,
    )


def map_res_block(sd, key, use_1x1conv):
    # Ours: Conv_0 = 1x1 projection (when present), then hidden conv,
    # then out conv — flax names follow call order.
    out = {}
    idx = 0
    if use_1x1conv:
        out[f"Conv_{idx}"] = conv(sd, f"{key}.res_conv")
        idx += 1
    out[f"Conv_{idx}"] = conv(sd, f"{key}.conv1")
    out[f"Conv_{idx + 1}"] = conv(sd, f"{key}.conv2")
    return out


def make_resnet(out_dir):
    from models.loss import MseLoss
    from models.resnet import ResNet

    torch.manual_seed(13)
    m = ResNet(
        in_chan=2, out_chan=2, n_case_params=P, loss_fn=MseLoss(True),
        hidden_chan=8, num_blocks=2, kernel_size=5, padding=2,
    ).eval()
    rng = np.random.default_rng(44)
    inputs, case_params, mask = fixed_inputs(rng)
    with torch.no_grad():
        out = m(
            torch.tensor(inputs), torch.tensor(case_params),
            mask=torch.tensor(mask),
        )["preds"]
    sd = m.state_dict()
    params = {
        "ResidualBlock_0": map_res_block(sd, "blocks.0", True),
        "ResidualBlock_1": map_res_block(sd, "blocks.1", False),
        "ResidualBlock_2": map_res_block(sd, "blocks.2", False),
        "ResidualBlock_3": map_res_block(sd, "blocks.3", True),
    }
    save_case(
        "resnet", params, {},
        inputs.transpose(0, 2, 3, 1), case_params, mask[..., None],
        t2n(out).transpose(0, 2, 3, 1), out_dir,
    )


def make_auto_deeponet(out_dir):
    from models.auto_deeponet import AutoDeepONet
    from models.loss import MseLoss

    torch.manual_seed(17)
    depth = 2
    m = AutoDeepONet(
        branch_dim=H * W + P, trunk_dim=2, loss_fn=MseLoss(True),
        branch_depth=depth, trunk_depth=depth, width=16, act_name="relu",
    ).eval()
    rng = np.random.default_rng(45)
    inputs, case_params, mask = fixed_inputs(rng)
    with torch.no_grad():
        out = m.generate(
            torch.tensor(inputs), torch.tensor(case_params),
            mask=torch.tensor(mask),
        )  # (B, 1, H, W)
    sd = m.state_dict()
    params = {
        "Mlp_0": mlp(sd, "branch_net", depth),
        "Mlp_1": mlp(sd, "trunk_net", depth),
        "bias": t2n(sd["bias"]),
    }
    save_case(
        "auto_deeponet", params, {},
        inputs.transpose(0, 2, 3, 1), case_params, mask[..., None],
        t2n(out).transpose(0, 2, 3, 1), out_dir,
    )


def grads_as_sd(model):
    """named_parameters' .grad under state_dict-style keys, so the same
    weight-mapping helpers convert gradients (all mappings are
    transposes/slices/stacks — linear, so they apply to grads too).
    torch's .grad for complex params is (dL/dRe) + i(dL/dIm), which
    matches our real-pair [re, im] layout directly."""
    return {k: p.grad for k, p in model.named_parameters()}


def map_double_conv_grads(gd, key):
    """map_double_conv for a grads-sd (parameters only — BN running
    stats are buffers and carry no gradient)."""
    return {
        "Conv_0": conv(gd, f"{key}.conv1.0"),
        "BatchNorm_0": {
            "scale": t2n(gd[f"{key}.conv1.1.weight"]),
            "bias": t2n(gd[f"{key}.conv1.1.bias"]),
        },
        "Conv_1": conv(gd, f"{key}.conv2.0"),
        "BatchNorm_1": {
            "scale": t2n(gd[f"{key}.conv2.1.weight"]),
            "bias": t2n(gd[f"{key}.conv2.1.bias"]),
        },
    }


def make_unet_grads(out_dir, insert_at="input"):
    """Gradient parity for the UNet: d(nmse)/d(params) on the same
    fixed batch/init as the forward fixture (eval-mode BatchNorm —
    fresh running stats — so the linearization point is deterministic
    on both sides). Loss = in-forward masked nmse
    (``src/models/unet.py:210-218`` + ``loss.py:22-37``)."""
    from models.loss import MseLoss
    from models.unet import UNet

    torch.manual_seed(11)
    m = UNet(
        in_chan=2, out_chan=2, loss_fn=MseLoss(True), n_case_params=P,
        insert_case_params_at=insert_at, bilinear=False, dim=4,
    ).eval()
    rng = np.random.default_rng(43)
    inputs, case_params, mask = fixed_inputs(rng)
    label = rng.standard_normal((B, 2, H, W)).astype(np.float32)
    out = m(
        torch.tensor(inputs), torch.tensor(case_params),
        mask=torch.tensor(mask), label=torch.tensor(label),
    )
    out["loss"]["nmse"].backward()
    gd = grads_as_sd(m)
    grads = {"DoubleConv_0": map_double_conv_grads(gd, "in_conv")}
    for i in range(4):
        grads[f"Down_{i}"] = {
            "DoubleConv_0": map_double_conv_grads(
                gd, f"down{i + 1}.maxpool_conv.1"
            )
        }
    for i in range(4):
        tw = t2n(gd[f"up{i + 1}.up.weight"])
        grads[f"Up_{i}"] = {
            "ConvTranspose_0": {
                "kernel": np.ascontiguousarray(
                    tw.transpose(2, 3, 0, 1)[::-1, ::-1]
                ),
                "bias": t2n(gd[f"up{i + 1}.up.bias"]),
            },
            "DoubleConv_0": map_double_conv_grads(gd, f"up{i + 1}.conv"),
        }
    grads["Conv_0"] = conv(gd, "out_conv.conv")
    data = {}
    flatten(grads, "G|", data)
    data["label"] = label.transpose(0, 2, 3, 1)
    data["loss_nmse"] = np.float32(out["loss"]["nmse"].item())
    np.savez_compressed(Path(out_dir) / "unet_grads.npz", **data)
    print("wrote unet_grads.npz "
          f"(loss {float(out['loss']['nmse']):.5f})")


def make_fno_grads(out_dir):
    """Gradient parity: d(nmse)/d(params) for the FNO on a fixed batch.
    The loss is the reference's in-forward masked nmse
    (``src/models/fno/fno2d.py:232-237`` + ``loss.py:22-37``)."""
    from models.fno.fno2d import Fno2d
    from models.loss import MseLoss

    torch.manual_seed(7)
    m = Fno2d(
        in_chan=2, out_chan=2, n_case_params=P, loss_fn=MseLoss(True),
        num_layers=2, modes1=4, modes2=4, hidden_dim=8,
    ).eval()
    rng = np.random.default_rng(42)
    inputs, case_params, mask = fixed_inputs(rng)
    label = rng.standard_normal((B, 2, H, W)).astype(np.float32)
    out = m(
        torch.tensor(inputs), torch.tensor(case_params),
        mask=torch.tensor(mask), label=torch.tensor(label),
    )
    out["loss"]["nmse"].backward()
    sd = grads_as_sd(m)
    grads = {
        "Dense_0": conv1x1_as_dense(sd, "fc0"),
        "Dense_1": conv1x1_as_dense(sd, "fc1"),
        "Dense_2": conv1x1_as_dense(sd, "fc2"),
    }
    for i in range(2):
        w1 = t2n(sd[f"blocks.{i}.conv0.weights1"])
        w2 = t2n(sd[f"blocks.{i}.conv0.weights2"])
        grads[f"FnoBlock_{i}"] = {
            "SpectralConv2d_0": {
                "weights": np.stack(
                    [
                        np.stack([w1.real, w1.imag]),
                        np.stack([w2.real, w2.imag]),
                    ]
                ).astype(np.float32)
            },
            "Dense_0": conv1x1_as_dense(sd, f"blocks.{i}.w0"),
        }
    data = {}
    flatten(grads, "G|", data)
    data["label"] = label.transpose(0, 2, 3, 1)
    data["loss_nmse"] = np.float32(out["loss"]["nmse"].item())
    out_path = Path(out_dir) / "fno_grads.npz"
    np.savez_compressed(out_path, **data)
    print(f"wrote {out_path} (loss={data['loss_nmse']:.6f})")


def make_resnet_grads(out_dir):
    from models.loss import MseLoss
    from models.resnet import ResNet

    torch.manual_seed(13)
    m = ResNet(
        in_chan=2, out_chan=2, n_case_params=P, loss_fn=MseLoss(True),
        hidden_chan=8, num_blocks=2, kernel_size=5, padding=2,
    ).eval()
    rng = np.random.default_rng(44)
    inputs, case_params, mask = fixed_inputs(rng)
    label = rng.standard_normal((B, 2, H, W)).astype(np.float32)
    out = m(
        torch.tensor(inputs), torch.tensor(case_params),
        mask=torch.tensor(mask), label=torch.tensor(label),
    )
    out["loss"]["nmse"].backward()
    sd = grads_as_sd(m)
    grads = {
        "ResidualBlock_0": map_res_block(sd, "blocks.0", True),
        "ResidualBlock_1": map_res_block(sd, "blocks.1", False),
        "ResidualBlock_2": map_res_block(sd, "blocks.2", False),
        "ResidualBlock_3": map_res_block(sd, "blocks.3", True),
    }
    data = {}
    flatten(grads, "G|", data)
    data["label"] = label.transpose(0, 2, 3, 1)
    data["loss_nmse"] = np.float32(out["loss"]["nmse"].item())
    np.savez_compressed(Path(out_dir) / "resnet_grads.npz", **data)
    print(f"wrote resnet_grads.npz (loss={data['loss_nmse']:.6f})")


def make_fno_sgd_trajectory(out_dir, n_steps=5, lr=1e-2):
    """Training-trajectory parity: n_steps of plain SGD on the masked
    nmse loss over two alternating fixed batches. Records per-step
    losses and the final parameters (converted). SGD isolates gradient
    dynamics from optimizer-implementation differences."""
    from models.fno.fno2d import Fno2d
    from models.loss import MseLoss

    torch.manual_seed(7)
    m = Fno2d(
        in_chan=2, out_chan=2, n_case_params=P, loss_fn=MseLoss(True),
        num_layers=2, modes1=4, modes2=4, hidden_dim=8,
    ).eval()
    rng = np.random.default_rng(42)
    batches = []
    for _ in range(2):
        inputs, case_params, mask = fixed_inputs(rng)
        label = rng.standard_normal((B, 2, H, W)).astype(np.float32)
        batches.append((inputs, case_params, mask, label))
    opt = torch.optim.SGD(m.parameters(), lr=lr)
    losses = []
    for step in range(n_steps):
        inputs, case_params, mask, label = batches[step % 2]
        opt.zero_grad()
        out = m(
            torch.tensor(inputs), torch.tensor(case_params),
            mask=torch.tensor(mask), label=torch.tensor(label),
        )
        loss = out["loss"]["nmse"]
        loss.backward()
        opt.step()
        losses.append(loss.item())
    sd = m.state_dict()
    final = {
        "Dense_0": conv1x1_as_dense(sd, "fc0"),
        "Dense_1": conv1x1_as_dense(sd, "fc1"),
        "Dense_2": conv1x1_as_dense(sd, "fc2"),
    }
    for i in range(2):
        w1 = t2n(sd[f"blocks.{i}.conv0.weights1"])
        w2 = t2n(sd[f"blocks.{i}.conv0.weights2"])
        final[f"FnoBlock_{i}"] = {
            "SpectralConv2d_0": {
                "weights": np.stack(
                    [
                        np.stack([w1.real, w1.imag]),
                        np.stack([w2.real, w2.imag]),
                    ]
                ).astype(np.float32)
            },
            "Dense_0": conv1x1_as_dense(sd, f"blocks.{i}.w0"),
        }
    data = {}
    flatten(final, "F|", data)
    for j, (inputs, case_params, mask, label) in enumerate(batches):
        data[f"b{j}_input"] = inputs.transpose(0, 2, 3, 1)
        data[f"b{j}_case_params"] = case_params
        data[f"b{j}_mask"] = mask[..., None]
        data[f"b{j}_label"] = label.transpose(0, 2, 3, 1)
    data["losses"] = np.asarray(losses, np.float32)
    data["lr"] = np.float32(lr)
    np.savez_compressed(Path(out_dir) / "fno_sgd_trajectory.npz", **data)
    print(f"wrote fno_sgd_trajectory.npz (losses={losses})")


def lattice_idxs(h, w):
    from itertools import product as iproduct

    return np.asarray(list(iproduct(range(h), range(w))), np.float32)


def make_ffn_nonauto(out_dir):
    """Non-auto FFN with the default scale-invariant activation — this
    exercises NormAct's per-(sample, query)-row normalization."""
    from models.ffn import FfnModel
    from models.loss import MseLoss

    torch.manual_seed(19)
    widths = [P + 3] + [16] * 3 + [1]
    m = FfnModel(widths=widths, loss_fn=MseLoss(True)).eval()
    rng = np.random.default_rng(46)
    case_params = rng.standard_normal((B, P)).astype(np.float32)
    t = rng.uniform(0, 10, (B, 1)).astype(np.float32)
    q = lattice_idxs(H, W)
    with torch.no_grad():
        out = m(
            torch.tensor(case_params), torch.tensor(t),
            query_idxs=torch.tensor(q),
        )["preds"]  # (B, k)
    params = {"Mlp_0": mlp(m.state_dict(), "ffn", len(widths) - 1)}
    data = {}
    flatten(params, "P|", data)
    data["case_params"] = case_params
    data["t"] = t
    data["query_xy"] = q
    data["expected"] = t2n(out)
    np.savez_compressed(Path(out_dir) / "ffn_nonauto.npz", **data)
    print(f"wrote ffn_nonauto.npz (act_norm path, k={q.shape[0]})")


def make_deeponet_nonauto(out_dir):
    from models.deeponet import DeepONet
    from models.loss import MseLoss

    torch.manual_seed(23)
    depth = 3
    m = DeepONet(
        branch_dim=P, trunk_dim=3, loss_fn=MseLoss(True),
        branch_depth=depth, trunk_depth=depth, width=16,
        act_name="relu", act_norm=True,
    ).eval()
    rng = np.random.default_rng(47)
    case_params = rng.standard_normal((B, P)).astype(np.float32)
    t = rng.uniform(0, 10, (B, 1)).astype(np.float32)
    q = lattice_idxs(H, W)
    with torch.no_grad():
        out = m(
            torch.tensor(case_params), torch.tensor(t),
            query_idxs=torch.tensor(q),
        )["preds"]
    sd = m.state_dict()
    params = {
        "Mlp_0": mlp(sd, "branch_net", depth),
        "Dense_0": lin(sd, "fc_trunk_t"),
        "Dense_1": lin(sd, "fc_trunk_xy"),
        # trunk Ffn over [w]*depth has depth-1 linears
        "Mlp_1": mlp(sd, "trunk_net", depth - 1),
        "bias": t2n(sd["bias"]),
    }
    data = {}
    flatten(params, "P|", data)
    data["case_params"] = case_params
    data["t"] = t
    data["query_xy"] = q
    data["expected"] = t2n(out)
    np.savez_compressed(Path(out_dir) / "deeponet_nonauto.npz", **data)
    print("wrote deeponet_nonauto.npz (act_norm trunk path)")


def make_auto_ffn(out_dir):
    """batch=1: the reference's tiling defect (auto_ffn.py:99-103)
    scrambles field/query pairing only when batch > 1, so the defect-
    free pairing is comparable at batch 1."""
    from models.auto_ffn import AutoFfn
    from models.loss import MseLoss

    torch.manual_seed(29)
    depth = 2
    m = AutoFfn(
        input_field_dim=H * W, num_case_params=P, query_dim=2,
        loss_fn=MseLoss(True), depth=depth, width=16,
    ).eval()
    rng = np.random.default_rng(48)
    inputs = rng.standard_normal((1, 2, H, W)).astype(np.float32)
    case_params = rng.standard_normal((1, P)).astype(np.float32)
    q = lattice_idxs(H, W)
    with torch.no_grad():
        out = m(
            torch.tensor(inputs), torch.tensor(case_params),
            query_idxs=torch.tensor(q, dtype=torch.long),
        )["preds"]  # (1, k)
    params = {"Mlp_0": mlp(m.state_dict(), "ffn", depth + 1)}
    mask = np.ones((1, H, W, 1), np.float32)
    save_case(
        "auto_ffn", params, {},
        inputs.transpose(0, 2, 3, 1), case_params, mask,
        t2n(out)[..., None, None].reshape(1, H, W, 1), out_dir,
    )


def make_auto_edeeponet(out_dir):
    from models.auto_edeeponet import AutoEDeepONet
    from models.loss import MseLoss

    torch.manual_seed(31)
    depth = 2
    m = AutoEDeepONet(
        dim_branch1=H * W, dim_branch2=P, trunk_dim=2,
        loss_fn=MseLoss(True), branch_depth=depth, trunk_depth=depth,
        width=16, act_name="relu",
    ).eval()
    rng = np.random.default_rng(49)
    inputs = rng.standard_normal((B, 2, H, W)).astype(np.float32)
    case_params = rng.standard_normal((B, P)).astype(np.float32)
    with torch.no_grad():
        out = m(
            torch.tensor(inputs), torch.tensor(case_params),
        )["preds"]  # (B, k)
    sd = m.state_dict()
    params = {
        "Mlp_0": mlp(sd, "branch1", depth),
        "Mlp_1": mlp(sd, "branch2", depth),
        "Mlp_2": mlp(sd, "trunk_net", depth),
        "bias": t2n(sd["bias"]),
    }
    mask = np.ones((B, H, W, 1), np.float32)
    save_case(
        "auto_edeeponet", params, {},
        inputs.transpose(0, 2, 3, 1), case_params, mask,
        t2n(out).reshape(B, H, W, 1), out_dir,
    )


def make_auto_deeponet_cnn(out_dir):
    """64×64 grid: the reference hardcodes the 4×4×32 branch-code shape
    (auto_deeponet_cnn.py trunk_dims), which assumes H=W=64."""
    from models.auto_deeponet_cnn import AutoDeepONetCnn
    from models.loss import MseLoss

    h = w = 64
    torch.manual_seed(37)
    m = AutoDeepONetCnn(
        in_chan=2, query_dim=2, loss_fn=MseLoss(True), num_case_params=P,
        trunk_depth=2,
    ).eval()
    rng = np.random.default_rng(50)
    inputs = rng.standard_normal((1, 2, h, w)).astype(np.float32)
    case_params = rng.standard_normal((1, P)).astype(np.float32)
    mask = np.ones((1, h, w), np.float32)
    mask[:, 20:30, 25:40] = 0.0
    with torch.no_grad():
        out = m(
            torch.tensor(inputs), torch.tensor(case_params),
            mask=torch.tensor(mask),
        )["preds"]  # (1, k)
    sd = m.state_dict()
    branch = {"Conv_0": conv(sd, "branch_net.in_conv")}
    for i in range(4):
        branch[f"Conv_{i + 1}"] = conv(sd, f"branch_net.blocks.{3 * i}")
    branch["Conv_5"] = conv(sd, "branch_net.out_conv")
    params = {
        "CnnBranch_0": branch,
        "Mlp_0": mlp(sd, "trunk_net", 3),  # [2]+[100]*2+[512]: 3 linears
        "Mlp_1": mlp(sd, "out_ffn", 3),
    }
    save_case(
        "auto_deeponet_cnn", params, {},
        inputs.transpose(0, 2, 3, 1), case_params, mask[..., None],
        t2n(out).reshape(1, h, w, 1), out_dir,
    )


def make_fno_adam_trajectory(out_dir, n_steps=5, lr=1e-3):
    """Same trajectory protocol with torch.optim.Adam — the optimizer
    the trainers actually use (Adam lr 1e-4..1e-3 + StepLR,
    ``src/train_auto.py:229``). torch updates complex params as real
    re/im pairs, matching the real-pair spectral layout."""
    from models.fno.fno2d import Fno2d
    from models.loss import MseLoss

    torch.manual_seed(7)
    m = Fno2d(
        in_chan=2, out_chan=2, n_case_params=P, loss_fn=MseLoss(True),
        num_layers=2, modes1=4, modes2=4, hidden_dim=8,
    ).eval()
    rng = np.random.default_rng(42)
    batches = []
    for _ in range(2):
        inputs, case_params, mask = fixed_inputs(rng)
        label = rng.standard_normal((B, 2, H, W)).astype(np.float32)
        batches.append((inputs, case_params, mask, label))
    opt = torch.optim.Adam(m.parameters(), lr=lr)
    losses = []
    for step in range(n_steps):
        inputs, case_params, mask, label = batches[step % 2]
        opt.zero_grad()
        out = m(
            torch.tensor(inputs), torch.tensor(case_params),
            mask=torch.tensor(mask), label=torch.tensor(label),
        )
        loss = out["loss"]["nmse"]
        loss.backward()
        opt.step()
        losses.append(loss.item())
    data = {"losses": np.asarray(losses, np.float32),
            "lr": np.float32(lr)}
    np.savez_compressed(Path(out_dir) / "fno_adam_trajectory.npz", **data)
    print(f"wrote fno_adam_trajectory.npz (losses={losses})")


def make_unet_adam_trajectory(out_dir, n_steps=5, lr=1e-3):
    """Training-dynamics parity for the conv family: 5 Adam steps of
    the UNet in TRAIN mode (BatchNorm normalizes with batch statistics;
    running stats update but do not enter the loss) over two
    alternating fixed batches. Records per-step losses + the batches
    (flax momentum 0.9 == torch momentum 0.1; eps 1e-5 matched)."""
    from models.loss import MseLoss
    from models.unet import UNet

    torch.manual_seed(11)
    m = UNet(
        in_chan=2, out_chan=2, loss_fn=MseLoss(True), n_case_params=P,
        insert_case_params_at="input", bilinear=False, dim=4,
    ).train()
    rng = np.random.default_rng(45)
    batches_ = []
    for _ in range(2):
        inputs, case_params, mask = fixed_inputs(rng)
        label = rng.standard_normal((B, 2, H, W)).astype(np.float32)
        batches_.append((inputs, case_params, mask, label))
    opt = torch.optim.Adam(m.parameters(), lr=lr)
    losses = []
    for step in range(n_steps):
        inputs, case_params, mask, label = batches_[step % 2]
        opt.zero_grad()
        out = m(
            torch.tensor(inputs), torch.tensor(case_params),
            mask=torch.tensor(mask), label=torch.tensor(label),
        )
        loss = out["loss"]["nmse"]
        loss.backward()
        opt.step()
        losses.append(loss.item())
    data = {"losses": np.asarray(losses, np.float32),
            "lr": np.float32(lr)}
    for i, (inputs, case_params, mask, label) in enumerate(batches_):
        data[f"b{i}_input"] = inputs.transpose(0, 2, 3, 1)
        data[f"b{i}_case_params"] = case_params
        data[f"b{i}_mask"] = mask[..., None]
        data[f"b{i}_label"] = label.transpose(0, 2, 3, 1)
    np.savez_compressed(
        Path(out_dir) / "unet_adam_trajectory.npz", **data
    )
    print(f"wrote unet_adam_trajectory.npz (losses={losses})")


def make_auto_deeponet_adam_trajectory(out_dir, n_steps=5, lr=1e-3):
    """Training-dynamics parity for the point/operator family: 5 Adam
    steps of AutoDeepONet. The auto trainer calls forward with
    query_idxs=None, which scores the FULL H*W lattice
    (``src/models/auto_deeponet.py:119-125``) and takes the loss
    against flat u labels (``:137-141``) — no query sampling on this
    path, so the trajectory is exactly reproducible cross-framework.
    Same seed/config as make_auto_deeponet ⇒ the converted init in
    auto_deeponet.npz is this trajectory's step-0 params."""
    from models.auto_deeponet import AutoDeepONet
    from models.loss import MseLoss

    torch.manual_seed(17)
    depth = 2
    m = AutoDeepONet(
        branch_dim=H * W + P, trunk_dim=2, loss_fn=MseLoss(True),
        branch_depth=depth, trunk_depth=depth, width=16, act_name="relu",
    ).train()
    rng = np.random.default_rng(46)
    batches_ = []
    for _ in range(2):
        inputs, case_params, mask = fixed_inputs(rng)
        label = rng.standard_normal((B, 2, H, W)).astype(np.float32)
        batches_.append((inputs, case_params, mask, label))
    opt = torch.optim.Adam(m.parameters(), lr=lr)
    losses = []
    for step in range(n_steps):
        inputs, case_params, mask, label = batches_[step % 2]
        opt.zero_grad()
        out = m(
            torch.tensor(inputs), torch.tensor(case_params),
            mask=torch.tensor(mask), label=torch.tensor(label),
        )
        loss = out["loss"]["nmse"]
        loss.backward()
        opt.step()
        losses.append(loss.item())
    data = {"losses": np.asarray(losses, np.float32),
            "lr": np.float32(lr)}
    for i, (inputs, case_params, mask, label) in enumerate(batches_):
        data[f"b{i}_input"] = inputs.transpose(0, 2, 3, 1)
        data[f"b{i}_case_params"] = case_params
        data[f"b{i}_mask"] = mask[..., None]
        data[f"b{i}_label"] = label.transpose(0, 2, 3, 1)
    np.savez_compressed(
        Path(out_dir) / "auto_deeponet_adam_trajectory.npz", **data
    )
    print(f"wrote auto_deeponet_adam_trajectory.npz (losses={losses})")


def make_resnet_adam_trajectory(out_dir, n_steps=5, lr=1e-3):
    """Training-dynamics parity for the input-residual conv family: 5
    Adam steps of the ResNet over two alternating fixed batches, taken
    in eval mode (dropout off — cross-framework dropout RNG parity is
    impossible, and the reference's ResNet forward never calls its
    BatchNorms, ``src/models/resnet.py:55-77``, so eval mode changes
    nothing else about the computation). Same seed/config as
    make_resnet ⇒ the converted init in resnet.npz is this
    trajectory's step-0 params."""
    from models.loss import MseLoss
    from models.resnet import ResNet

    torch.manual_seed(13)
    m = ResNet(
        in_chan=2, out_chan=2, n_case_params=P, loss_fn=MseLoss(True),
        hidden_chan=8, num_blocks=2, kernel_size=5, padding=2,
    ).eval()
    rng = np.random.default_rng(47)
    batches_ = []
    for _ in range(2):
        inputs, case_params, mask = fixed_inputs(rng)
        label = rng.standard_normal((B, 2, H, W)).astype(np.float32)
        batches_.append((inputs, case_params, mask, label))
    opt = torch.optim.Adam(m.parameters(), lr=lr)
    losses = []
    for step in range(n_steps):
        inputs, case_params, mask, label = batches_[step % 2]
        opt.zero_grad()
        out = m(
            torch.tensor(inputs), torch.tensor(case_params),
            mask=torch.tensor(mask), label=torch.tensor(label),
        )
        loss = out["loss"]["nmse"]
        loss.backward()
        opt.step()
        losses.append(loss.item())
    data = {"losses": np.asarray(losses, np.float32),
            "lr": np.float32(lr)}
    for i, (inputs, case_params, mask, label) in enumerate(batches_):
        data[f"b{i}_input"] = inputs.transpose(0, 2, 3, 1)
        data[f"b{i}_case_params"] = case_params
        data[f"b{i}_mask"] = mask[..., None]
        data[f"b{i}_label"] = label.transpose(0, 2, 3, 1)
    np.savez_compressed(
        Path(out_dir) / "resnet_adam_trajectory.npz", **data
    )
    print(f"wrote resnet_adam_trajectory.npz (losses={losses})")


def make_dataset_goldens(out_dir):
    """Loader parity: run the *reference's* dataset classes on the same
    deterministic synthetic case tree the test suite uses (identical
    generator parameters as tests/conftest.py's ``synth_root``) and
    record the packed (inputs, labels, mask, case_params, case_ids)
    splits. tests/test_golden_parity.py rebuilds the tree and compares
    this repo's loaders element-for-element — covers pair slicing,
    convergence truncation, BC padding, masks, and normalization."""
    import sys as _sys
    import tempfile

    _sys.path.insert(0, str(REPO_ROOT))
    from cfdbench_tpu.data.synthetic import generate_all

    from dataset.cavity import CavityFlowAutoDataset
    from dataset.cylinder import CylinderFlowAutoDataset
    from dataset.dam import DamFlowAutoDataset
    from dataset.tube import TubeFlowAutoDataset

    root = Path(tempfile.mkdtemp()) / "synth"
    generate_all(root, cases_per_subset=4, num_frames=12, grid=16, seed=0)

    classes = dict(
        cavity=CavityFlowAutoDataset,
        tube=TubeFlowAutoDataset,
        dam=DamFlowAutoDataset,
        cylinder=CylinderFlowAutoDataset,
    )
    for problem, cls in classes.items():
        case_dirs = sorted(
            (root / problem / "prop").glob("case*"),
            key=lambda x: int(x.name[4:]),
        ) + sorted(
            (root / problem / "bc").glob("case*"),
            key=lambda x: int(x.name[4:]),
        )
        if problem == "cylinder":
            # data_delta_time=0.001 → delta 0.002 gives stride 2 on the
            # 12-frame synthetic cases; cache goes to a throwaway dir.
            ds = cls(
                case_dirs, norm_props=True, norm_bc=True,
                delta_time=0.002, split="golden",
                cache_dir=Path(tempfile.mkdtemp()) / "cyl_cache",
            )
        else:
            ds = cls(case_dirs, norm_props=True, norm_bc=True)
        inputs = t2n(ds.inputs)  # (N, 3, h, w)
        labels = t2n(ds.labels)
        # The train collate splits channels (src/train_auto.py:33-58).
        data = dict(
            inputs=inputs[:, :2].transpose(0, 2, 3, 1),
            mask=inputs[:, 2:].transpose(0, 2, 3, 1),
            labels=labels[:, :2].transpose(0, 2, 3, 1),
            case_ids=np.asarray(ds.case_ids),
            case_params=np.stack(
                [
                    np.asarray(
                        [
                            v for k, v in p.items()
                            if k not in ("rotated", "dx", "dy")
                        ],
                        np.float32,
                    )
                    for p in [ds.case_params[c] for c in ds.case_ids]
                ]
            ),
        )
        np.savez_compressed(
            Path(out_dir) / f"dataset_{problem}.npz", **data
        )
        print(
            f"wrote dataset_{problem}.npz "
            f"({inputs.shape[0]} pairs from {len(case_dirs)} cases)"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO_ROOT / "tests" / "golden"))
    args = ap.parse_args()
    assert REFERENCE_SRC.exists(), "reference checkout not found"
    sys.path.insert(0, str(REFERENCE_SRC))
    make_fno(args.out)
    make_unet(args.out, "input")
    make_unet(args.out, "hidden")
    make_resnet(args.out)
    make_auto_deeponet(args.out)
    make_ffn_nonauto(args.out)
    make_deeponet_nonauto(args.out)
    make_auto_ffn(args.out)
    make_auto_edeeponet(args.out)
    make_auto_deeponet_cnn(args.out)
    make_fno_grads(args.out)
    make_unet_grads(args.out)
    make_resnet_grads(args.out)
    make_fno_sgd_trajectory(args.out)
    make_fno_adam_trajectory(args.out)
    make_unet_adam_trajectory(args.out)
    make_auto_deeponet_adam_trajectory(args.out)
    make_resnet_adam_trajectory(args.out)
    make_dataset_goldens(args.out)


if __name__ == "__main__":
    main()
