"""Import PyTorch reference checkpoints (``model.pt`` state dicts) as
this framework's flax variable trees.

The reference's trainers save ``model.state_dict()`` into
``ckpt-{ep}/model.pt`` (``src/train_auto.py:294-301``,
``src/train.py:222-245``). A user migrating from the reference can
convert such a checkpoint with :func:`import_state_dict` (or the
``scripts/import_reference_checkpoint.py`` CLI) and evaluate / roll out
/ fine-tune it here without retraining.

All mappings are pure array relayouts (transposes, slices, stacks) of
the torch parameter layouts onto the flax trees:

- torch ``Linear.weight`` is ``(out, in)`` → flax ``kernel`` ``(in, out)``;
- torch ``Conv2d.weight`` is ``(O, I, kh, kw)`` → flax NHWC ``(kh, kw, I, O)``;
- torch ``ConvTranspose2d.weight`` is ``(I, O, kh, kw)`` → flax
  ``ConvTranspose`` ``(kh, kw, I, O)`` with both spatial axes flipped
  (torch computes a true transposed conv; flax a fractionally-strided
  conv — equal after the flip);
- the reference's complex spectral weights ``weights1``/``weights2``
  (``src/models/fno/fno2d.py:54-58``) → our real-pair layout
  ``(corner, re/im, in, out, m1, m2)`` (``ops/spectral.py``).

Structural hyperparameters (depth, block count, conditioning mode,
per-block projection convs) are inferred from the state-dict keys, so
no model flags are needed for the conversion itself.

These helpers are the single source of truth for the torch↔flax weight
correspondence: ``scripts/make_golden.py`` builds the committed golden
parity fixtures through the same functions, so
``tests/test_golden_parity.py``'s ≤2e-5 forward parity locks the
mapping math at value level against every paper baseline.

Input is a ``dict[str, np.ndarray]`` (use :func:`state_dict_to_numpy`
on a freshly-``torch.load``-ed state dict); torch itself is only needed
to *read* the ``.pt`` file, never by this module.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

Array = np.ndarray
StateDict = Dict[str, Array]


def state_dict_to_numpy(sd) -> StateDict:
    """Convert a torch state dict's tensors to numpy (torch-free after
    this point; complex spectral weights stay complex)."""
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


# ---------------------------------------------------------------- helpers


def lin(sd: StateDict, key: str) -> dict:
    """torch ``Linear`` → our Dense wrapper subtree."""
    return {
        "Dense_0": {
            "kernel": sd[f"{key}.weight"].T,
            "bias": sd[f"{key}.bias"],
        }
    }


def conv1x1_as_dense(sd: StateDict, key: str) -> dict:
    """torch 1×1 ``Conv2d`` → our channel-mixing Dense."""
    return {
        "Dense_0": {
            "kernel": sd[f"{key}.weight"][:, :, 0, 0].T,
            "bias": sd[f"{key}.bias"],
        }
    }


def conv(sd: StateDict, key: str) -> dict:
    """torch ``Conv2d`` → our Conv wrapper subtree (NHWC kernel)."""
    return {
        "Conv_0": {
            "kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{key}.bias"],
        }
    }


def bn(sd: StateDict, key: str):
    """torch ``BatchNorm2d`` → (params, batch_stats) subtrees."""
    params = {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}
    stats = {"mean": sd[f"{key}.running_mean"], "var": sd[f"{key}.running_var"]}
    return params, stats


def _seq_linear_indices(sd: StateDict, key: str) -> list:
    """Sorted Sequential indices of the Linear layers under
    ``{key}.layers`` (the reference's ``Ffn`` interleaves activations at
    the odd slots — ``src/models/ffn.py:12-35``)."""
    idxs = set()
    pat = re.compile(re.escape(key) + r"\.layers\.(\d+)\.weight$")
    for k in sd:
        m = pat.match(k)
        if m:
            idxs.add(int(m.group(1)))
    return sorted(idxs)


def mlp(sd: StateDict, key: str) -> dict:
    """Reference ``Ffn`` (Sequential of Linear/act) → our Mlp subtree,
    linear count inferred from the keys."""
    out = {}
    for j, i in enumerate(_seq_linear_indices(sd, key)):
        out[f"Dense_{j}"] = lin(sd, f"{key}.layers.{i}")
    if not out:
        raise KeyError(f"no '{key}.layers.*.weight' keys in state dict")
    return out


# ---------------------------------------------------------------- families


def import_fno(sd: StateDict) -> dict:
    """``Fno2d`` (``src/models/fno/fno2d.py:115-233``); depth inferred
    from the ``blocks.{i}.*`` keys."""
    params: Dict[str, Any] = {
        "Dense_0": conv1x1_as_dense(sd, "fc0"),
        "Dense_1": conv1x1_as_dense(sd, "fc1"),
        "Dense_2": conv1x1_as_dense(sd, "fc2"),
    }
    i = 0
    while f"blocks.{i}.conv0.weights1" in sd:
        w1 = sd[f"blocks.{i}.conv0.weights1"]
        w2 = sd[f"blocks.{i}.conv0.weights2"]
        spectral = np.stack(
            [np.stack([w1.real, w1.imag]), np.stack([w2.real, w2.imag])]
        ).astype(np.float32)  # (corner, re/im, in, out, m1, m2)
        params[f"FnoBlock_{i}"] = {
            "SpectralConv2d_0": {"weights": spectral},
            "Dense_0": conv1x1_as_dense(sd, f"blocks.{i}.w0"),
        }
        i += 1
    if i == 0:
        raise KeyError("no 'blocks.{i}.conv0.weights1' keys: not an FNO state dict")
    return {"params": params}


def _double_conv(sd: StateDict, key: str):
    p1, s1 = bn(sd, f"{key}.conv1.1")
    p2, s2 = bn(sd, f"{key}.conv2.1")
    params = {
        "Conv_0": conv(sd, f"{key}.conv1.0"),
        "BatchNorm_0": p1,
        "Conv_1": conv(sd, f"{key}.conv2.0"),
        "BatchNorm_1": p2,
    }
    return params, {"BatchNorm_0": s1, "BatchNorm_1": s2}


def import_unet(sd: StateDict) -> dict:
    """``UNet`` (``src/models/unet.py:121-218``); the conditioning mode
    is inferred from the ``case_params_fc`` key (present only for
    ``insert_case_params_at='hidden'``)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["DoubleConv_0"], stats["DoubleConv_0"] = _double_conv(sd, "in_conv")
    for i in range(4):
        p, s = _double_conv(sd, f"down{i + 1}.maxpool_conv.1")
        params[f"Down_{i}"] = {"DoubleConv_0": p}
        stats[f"Down_{i}"] = {"DoubleConv_0": s}
    if "case_params_fc.weight" in sd:
        params["Dense_0"] = lin(sd, "case_params_fc")
    for i in range(4):
        tw = sd[f"up{i + 1}.up.weight"]  # (in, out, kh, kw)
        p, s = _double_conv(sd, f"up{i + 1}.conv")
        params[f"Up_{i}"] = {
            "ConvTranspose_0": {
                "kernel": np.ascontiguousarray(
                    tw.transpose(2, 3, 0, 1)[::-1, ::-1]
                ),
                "bias": sd[f"up{i + 1}.up.bias"],
            },
            "DoubleConv_0": p,
        }
        stats[f"Up_{i}"] = {"DoubleConv_0": s}
    params["Conv_0"] = conv(sd, "out_conv.conv")
    return {"params": params, "batch_stats": stats}


def import_resnet(sd: StateDict) -> dict:
    """``ResNet`` (``src/models/resnet.py:96-192``); block count and
    per-block 1×1 projection convs inferred from the keys. (The
    reference's BatchNorms are defined but never called —
    ``src/models/resnet.py:40-56`` — so their buffers are dropped.)"""
    params: Dict[str, Any] = {}
    i = 0
    while f"blocks.{i}.conv1.weight" in sd:
        block: Dict[str, Any] = {}
        idx = 0
        if f"blocks.{i}.res_conv.weight" in sd:
            block[f"Conv_{idx}"] = conv(sd, f"blocks.{i}.res_conv")
            idx += 1
        block[f"Conv_{idx}"] = conv(sd, f"blocks.{i}.conv1")
        block[f"Conv_{idx + 1}"] = conv(sd, f"blocks.{i}.conv2")
        params[f"ResidualBlock_{i}"] = block
        i += 1
    if i == 0:
        raise KeyError("no 'blocks.{i}.conv1.weight' keys: not a ResNet state dict")
    return {"params": params}


def import_auto_deeponet(sd: StateDict) -> dict:
    """``AutoDeepONet`` (``src/models/auto_deeponet.py:85-135``)."""
    return {
        "params": {
            "Mlp_0": mlp(sd, "branch_net"),
            "Mlp_1": mlp(sd, "trunk_net"),
            "bias": sd["bias"],
        }
    }


def import_auto_ffn(sd: StateDict) -> dict:
    """``AutoFfn`` (``src/models/auto_ffn.py:60-110``)."""
    return {"params": {"Mlp_0": mlp(sd, "ffn")}}


def import_auto_edeeponet(sd: StateDict) -> dict:
    """``AutoEDeepONet`` (``src/models/auto_edeeponet.py:60-125``)."""
    return {
        "params": {
            "Mlp_0": mlp(sd, "branch1"),
            "Mlp_1": mlp(sd, "branch2"),
            "Mlp_2": mlp(sd, "trunk_net"),
            "bias": sd["bias"],
        }
    }


def import_auto_deeponet_cnn(sd: StateDict) -> dict:
    """``AutoDeepONetCnn`` (``src/models/auto_deeponet_cnn.py:13-39,
    120-163``); the CNN branch's conv positions inside its Sequential
    are inferred from the keys."""
    branch = {"Conv_0": conv(sd, "branch_net.in_conv")}
    pat = re.compile(r"branch_net\.blocks\.(\d+)\.weight$")
    block_idxs = sorted(int(m.group(1)) for k in sd if (m := pat.match(k)))
    for j, i in enumerate(block_idxs):
        branch[f"Conv_{j + 1}"] = conv(sd, f"branch_net.blocks.{i}")
    branch[f"Conv_{len(block_idxs) + 1}"] = conv(sd, "branch_net.out_conv")
    return {
        "params": {
            "CnnBranch_0": branch,
            "Mlp_0": mlp(sd, "trunk_net"),
            "Mlp_1": mlp(sd, "out_ffn"),
        }
    }


def import_ffn(sd: StateDict) -> dict:
    """Non-auto ``FfnModel`` (``src/models/ffn.py:38-181``)."""
    return {"params": {"Mlp_0": mlp(sd, "ffn")}}


def import_deeponet(sd: StateDict) -> dict:
    """Non-auto ``DeepONet`` (``src/models/deeponet.py:27-66``)."""
    return {
        "params": {
            "Mlp_0": mlp(sd, "branch_net"),
            "Dense_0": lin(sd, "fc_trunk_t"),
            "Dense_1": lin(sd, "fc_trunk_xy"),
            "Mlp_1": mlp(sd, "trunk_net"),
            "bias": sd["bias"],
        }
    }


_IMPORTERS = {
    "fno": import_fno,
    "unet": import_unet,
    "resnet": import_resnet,
    "auto_deeponet": import_auto_deeponet,
    "auto_ffn": import_auto_ffn,
    "auto_edeeponet": import_auto_edeeponet,
    "auto_deeponet_cnn": import_auto_deeponet_cnn,
    "ffn": import_ffn,
    "deeponet": import_deeponet,
}


def import_state_dict(model_name: str, sd: StateDict) -> dict:
    """Map a reference state dict to this framework's variables tree
    ``{"params": ..., ["batch_stats": ...]}`` — the exact tree the
    trainers checkpoint (``training/trainer_auto.py``), so the result
    can be written with ``training.checkpoints.save_params`` and picked
    up by ``--mode test``."""
    if model_name not in _IMPORTERS:
        raise ValueError(
            f"no torch importer for model '{model_name}' "
            f"(supported: {sorted(_IMPORTERS)})"
        )
    return _IMPORTERS[model_name](state_dict_to_numpy(sd))


def verify_variables(imported: dict, template: dict) -> None:
    """Assert the imported tree has the template's exact structure and
    shapes (template from ``model.init`` / ``jax.eval_shape``); raises
    ``ValueError`` naming every mismatched path."""
    import jax

    flat_imp = {
        "/".join(map(str, path)): np.asarray(leaf).shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            imported
        )[0]
    }
    flat_tpl = {
        "/".join(map(str, path)): np.asarray(leaf).shape
        if not hasattr(leaf, "shape")
        else tuple(leaf.shape)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            template
        )[0]
    }
    problems = []
    for k in sorted(set(flat_imp) | set(flat_tpl)):
        if k not in flat_imp:
            problems.append(f"missing in import: {k} {flat_tpl[k]}")
        elif k not in flat_tpl:
            problems.append(f"unexpected in import: {k} {flat_imp[k]}")
        elif flat_imp[k] != flat_tpl[k]:
            problems.append(
                f"shape mismatch at {k}: imported {flat_imp[k]} "
                f"vs model {flat_tpl[k]}"
            )
    if problems:
        raise ValueError(
            "imported checkpoint does not match the model:\n  "
            + "\n  ".join(problems)
        )
