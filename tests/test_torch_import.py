"""Reference-checkpoint importer tests.

Strategy: the committed golden fixtures (tests/golden/*.npz) hold flax
parameter trees derived from *real* reference state dicts
(scripts/make_golden.py). Each test reconstructs the original torch
state dict by inverting the layout mapping, feeds it through the
user-facing importer (cfdbench_tpu/utils/torch_import.py), and
asserts the result is bit-identical to the golden tree — a true
round trip on reference-trained-shaped weights that also exercises the
structural inference (block count, conditioning mode, per-block
projection convs) without importing the reference.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests._golden import trees_from_flat

from cfdbench_tpu.utils.torch_import import (
    import_state_dict,
    verify_variables,
)

GOLDEN = Path(__file__).parent / "golden"
REPO = Path(__file__).resolve().parent.parent


# ---------------------------------------------------------- golden helpers


def load_tree(npz_path):
    """Rebuild {"params": ..., ["batch_stats": ...]} from the flattened
    P|/S| arrays of a golden fixture (shared decoder: tests/_golden)."""
    data = np.load(npz_path)
    trees = trees_from_flat({k: data[k] for k in data.files}, ("P", "S"))
    params, stats = trees["P"], trees["S"]
    tree = {"params": params}
    if stats:
        tree["batch_stats"] = stats
    return tree


def assert_trees_equal(a, b, path=""):
    assert sorted(a) == sorted(b), (path, sorted(a), sorted(b))
    for k in a:
        if isinstance(a[k], dict):
            assert_trees_equal(a[k], b[k], f"{path}/{k}")
        else:
            assert np.array_equal(
                np.asarray(a[k]), np.asarray(b[k])
            ), f"value diff at {path}/{k}"


# ------------------------------------------------- inverse mappings (torch)


def inv_lin(sd, key, sub):
    d = sub["Dense_0"]
    sd[f"{key}.weight"] = np.ascontiguousarray(d["kernel"].T)
    sd[f"{key}.bias"] = d["bias"]


def inv_conv1x1(sd, key, sub):
    d = sub["Dense_0"]
    sd[f"{key}.weight"] = np.ascontiguousarray(d["kernel"].T)[:, :, None, None]
    sd[f"{key}.bias"] = d["bias"]


def inv_conv(sd, key, sub):
    c = sub["Conv_0"]
    sd[f"{key}.weight"] = np.ascontiguousarray(c["kernel"].transpose(3, 2, 0, 1))
    sd[f"{key}.bias"] = c["bias"]


def inv_bn(sd, key, p, s):
    sd[f"{key}.weight"] = p["scale"]
    sd[f"{key}.bias"] = p["bias"]
    sd[f"{key}.running_mean"] = s["mean"]
    sd[f"{key}.running_var"] = s["var"]


def inv_mlp(sd, key, sub):
    for j in range(len(sub)):
        inv_lin(sd, f"{key}.layers.{2 * j}", sub[f"Dense_{j}"])


def fno_state_dict(tree):
    p = tree["params"]
    sd = {}
    inv_conv1x1(sd, "fc0", p["Dense_0"])
    inv_conv1x1(sd, "fc1", p["Dense_1"])
    inv_conv1x1(sd, "fc2", p["Dense_2"])
    i = 0
    while f"FnoBlock_{i}" in p:
        w = p[f"FnoBlock_{i}"]["SpectralConv2d_0"]["weights"]
        sd[f"blocks.{i}.conv0.weights1"] = (w[0, 0] + 1j * w[0, 1]).astype(
            np.complex64
        )
        sd[f"blocks.{i}.conv0.weights2"] = (w[1, 0] + 1j * w[1, 1]).astype(
            np.complex64
        )
        inv_conv1x1(sd, f"blocks.{i}.w0", p[f"FnoBlock_{i}"]["Dense_0"])
        i += 1
    return sd


def inv_double_conv(sd, key, p, s):
    inv_conv(sd, f"{key}.conv1.0", p["Conv_0"])
    inv_bn(sd, f"{key}.conv1.1", p["BatchNorm_0"], s["BatchNorm_0"])
    inv_conv(sd, f"{key}.conv2.0", p["Conv_1"])
    inv_bn(sd, f"{key}.conv2.1", p["BatchNorm_1"], s["BatchNorm_1"])


def unet_state_dict(tree):
    p, s = tree["params"], tree["batch_stats"]
    sd = {}
    inv_double_conv(sd, "in_conv", p["DoubleConv_0"], s["DoubleConv_0"])
    for i in range(4):
        inv_double_conv(
            sd,
            f"down{i + 1}.maxpool_conv.1",
            p[f"Down_{i}"]["DoubleConv_0"],
            s[f"Down_{i}"]["DoubleConv_0"],
        )
    if "Dense_0" in p:
        inv_lin(sd, "case_params_fc", p["Dense_0"])
    for i in range(4):
        ct = p[f"Up_{i}"]["ConvTranspose_0"]
        sd[f"up{i + 1}.up.weight"] = np.ascontiguousarray(
            ct["kernel"][::-1, ::-1].transpose(2, 3, 0, 1)
        )
        sd[f"up{i + 1}.up.bias"] = ct["bias"]
        inv_double_conv(
            sd,
            f"up{i + 1}.conv",
            p[f"Up_{i}"]["DoubleConv_0"],
            s[f"Up_{i}"]["DoubleConv_0"],
        )
    inv_conv(sd, "out_conv.conv", p["Conv_0"])
    return sd


def resnet_state_dict(tree):
    p = tree["params"]
    sd = {}
    i = 0
    while f"ResidualBlock_{i}" in p:
        block = p[f"ResidualBlock_{i}"]
        convs = sorted(block)
        if len(convs) == 3:  # projection block: Conv_0 is res_conv
            inv_conv(sd, f"blocks.{i}.res_conv", block["Conv_0"])
            inv_conv(sd, f"blocks.{i}.conv1", block["Conv_1"])
            inv_conv(sd, f"blocks.{i}.conv2", block["Conv_2"])
        else:
            inv_conv(sd, f"blocks.{i}.conv1", block["Conv_0"])
            inv_conv(sd, f"blocks.{i}.conv2", block["Conv_1"])
        i += 1
    return sd


def auto_deeponet_state_dict(tree):
    p = tree["params"]
    sd = {"bias": p["bias"]}
    inv_mlp(sd, "branch_net", p["Mlp_0"])
    inv_mlp(sd, "trunk_net", p["Mlp_1"])
    return sd


def auto_ffn_state_dict(tree):
    sd = {}
    inv_mlp(sd, "ffn", tree["params"]["Mlp_0"])
    return sd


def auto_edeeponet_state_dict(tree):
    p = tree["params"]
    sd = {"bias": p["bias"]}
    inv_mlp(sd, "branch1", p["Mlp_0"])
    inv_mlp(sd, "branch2", p["Mlp_1"])
    inv_mlp(sd, "trunk_net", p["Mlp_2"])
    return sd


def auto_deeponet_cnn_state_dict(tree):
    p = tree["params"]
    sd = {}
    branch = p["CnnBranch_0"]
    inv_conv(sd, "branch_net.in_conv", branch["Conv_0"])
    # Reference CnnBranch: Sequential blocks of (conv, maxpool, act) —
    # conv sits at every 3rd slot (src/models/auto_deeponet_cnn.py:13-39).
    n_mid = len(branch) - 2
    for j in range(n_mid):
        inv_conv(sd, f"branch_net.blocks.{3 * j}", branch[f"Conv_{j + 1}"])
    inv_conv(sd, "branch_net.out_conv", branch[f"Conv_{n_mid + 1}"])
    inv_mlp(sd, "trunk_net", p["Mlp_0"])
    inv_mlp(sd, "out_ffn", p["Mlp_1"])
    return sd


def ffn_state_dict(tree):
    sd = {}
    inv_mlp(sd, "ffn", tree["params"]["Mlp_0"])
    return sd


def deeponet_state_dict(tree):
    p = tree["params"]
    sd = {"bias": p["bias"]}
    inv_mlp(sd, "branch_net", p["Mlp_0"])
    inv_lin(sd, "fc_trunk_t", p["Dense_0"])
    inv_lin(sd, "fc_trunk_xy", p["Dense_1"])
    inv_mlp(sd, "trunk_net", p["Mlp_1"])
    return sd


# -------------------------------------------------------------------- tests


CASES = [
    ("fno", "fno.npz", fno_state_dict),
    ("unet", "unet_input.npz", unet_state_dict),
    ("unet", "unet_hidden.npz", unet_state_dict),
    ("resnet", "resnet.npz", resnet_state_dict),
    ("auto_deeponet", "auto_deeponet.npz", auto_deeponet_state_dict),
    ("auto_ffn", "auto_ffn.npz", auto_ffn_state_dict),
    ("auto_edeeponet", "auto_edeeponet.npz", auto_edeeponet_state_dict),
    ("auto_deeponet_cnn", "auto_deeponet_cnn.npz", auto_deeponet_cnn_state_dict),
    ("ffn", "ffn_nonauto.npz", ffn_state_dict),
    ("deeponet", "deeponet_nonauto.npz", deeponet_state_dict),
]


@pytest.mark.parametrize("model,fixture,inverse", CASES)
def test_roundtrip_against_golden(model, fixture, inverse):
    golden = load_tree(GOLDEN / fixture)
    sd = inverse(golden)
    imported = import_state_dict(model, sd)
    assert_trees_equal(imported, golden)
    verify_variables(imported, golden)


def test_verify_reports_mismatch_paths():
    golden = load_tree(GOLDEN / "fno.npz")
    sd = fno_state_dict(golden)
    imported = import_state_dict("fno", sd)
    broken = load_tree(GOLDEN / "fno.npz")
    broken["params"]["Dense_0"]["Dense_0"]["kernel"] = np.zeros((3, 3))
    del broken["params"]["FnoBlock_1"]
    with pytest.raises(ValueError) as e:
        verify_variables(imported, broken)
    msg = str(e.value)
    assert "shape mismatch" in msg and "Dense_0" in msg
    assert "unexpected in import" in msg and "FnoBlock_1" in msg


def test_unknown_model_rejected():
    with pytest.raises(ValueError, match="no torch importer"):
        import_state_dict("latent_diffusion", {})


@pytest.mark.slow
def test_import_script_end_to_end(tmp_path):
    """torch.save a golden-derived FNO state dict, run the CLI importer,
    and check the written checkpoint loads and evaluates."""
    torch = pytest.importorskip("torch")
    golden = load_tree(GOLDEN / "fno.npz")
    sd = {k: torch.tensor(v) for k, v in fno_state_dict(golden).items()}
    src_dir = tmp_path / "ref" / "ckpt-7"
    src_dir.mkdir(parents=True)
    torch.save(sd, src_dir / "model.pt")

    out_root = tmp_path / "result"
    flags = [
        "--torch_ckpt", str(src_dir / "model.pt"),
        "--model", "fno", "--fno_depth", "2", "--fno_hidden_dim", "8",
        "--fno_modes_x", "4", "--fno_modes_y", "4",
        "--data_name", "cavity_prop_bc_geo",
        "--output_dir", str(out_root),
    ]
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "import_reference_checkpoint.py")]
        + flags,
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    ckpts = list(out_root.glob("auto/cavity_prop_bc_geo/*/fno/*/ckpt-7"))
    assert len(ckpts) == 1, (r.stdout, list(out_root.rglob("*")))
    ckpt = ckpts[0]
    assert (ckpt / "scores.json").exists()

    from cfdbench_tpu.training import checkpoints

    restored = checkpoints.load_params(golden, ckpt)
    assert_trees_equal(restored, golden)

    # Wrong structural flags must fail loudly, naming the mismatch.
    r2 = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "import_reference_checkpoint.py")]
        + flags[:5] + ["4"] + flags[6:],  # --fno_depth 4
        capture_output=True, text=True, timeout=300,
    )
    assert r2.returncode != 0
    assert "does not match the model" in r2.stderr

    # A refused import (stub would beat real local scores) must leave
    # the target ckpt dir UNTOUCHED — the guard runs before any write,
    # so a same-epoch local checkpoint's weights are never replaced by
    # an import that then claims it refused (round-5 review finding).
    import json

    local = ckpt.parent / "ckpt-3"
    local.mkdir()
    (local / "scores.json").write_text(json.dumps(
        dict(ep=3, train_loss=0.1, dev_loss=0.05, time_s=1.0)
    ))
    r3 = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "import_reference_checkpoint.py")]
        + flags + ["--as_epoch", "3"],
        capture_output=True, text=True, timeout=300,
    )
    assert r3.returncode != 0
    assert "--force" in r3.stderr
    assert sorted(p.name for p in local.iterdir()) == ["scores.json"]
