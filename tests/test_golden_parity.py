"""Golden-output forward parity against the reference torch models.

Fixtures in ``tests/golden/*.npz`` were produced by
``scripts/make_golden.py``: the reference models (torch, CPU, eval mode,
fixed seeds) were run on fixed inputs and their weights converted to
this repo's flax parameter trees. These tests are hermetic — they never
import the reference — and prove forward-pass numerical equivalence,
the strongest parity evidence available without the real dataset.

Tolerance: 2e-5 absolute. Differences come from op-order (NHWC vs NCHW
convs, DFT-matmul vs rfft2 spectral path) in f32.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tests._golden import insert_path
import pytest

GOLDEN = Path(__file__).parent / "golden"
ATOL = 2e-5


def load_case(name):
    data = dict(np.load(GOLDEN / f"{name}.npz"))
    params, stats = {}, {}

    for key, value in data.items():
        if key.startswith("P|"):
            insert_path(params, key[2:].split("|"), value)
        elif key.startswith("S|"):
            insert_path(stats, key[2:].split("|"), value)
    return (
        params,
        stats,
        data["input"],
        data["case_params"],
        data["mask"],
        data["expected"],
    )


def check(model, name, **apply_kwargs):
    params, stats, inputs, case_params, mask, expected = load_case(name)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    out = model.apply(
        variables, inputs, case_params, mask, train=False, **apply_kwargs
    )
    out = np.asarray(out)
    if out.shape != expected.shape:  # pointwise models return (B, H*W)
        out = out.reshape(expected.shape)
    np.testing.assert_allclose(out, expected, atol=ATOL)
    return out


def test_fno_forward_matches_reference():
    from cfdbench_tpu.models.fno import Fno2d

    model = Fno2d(
        in_chan=2, out_chan=2, n_case_params=5, num_layers=2,
        modes1=4, modes2=4, hidden_dim=8,
    )
    check(model, "fno")


@pytest.mark.parametrize("insert_at", ["input", "hidden"])
def test_unet_forward_matches_reference(insert_at):
    from cfdbench_tpu.models.unet import UNet

    model = UNet(
        in_chan=2, out_chan=2, n_case_params=5,
        insert_case_params_at=insert_at, dim=4,
    )
    check(model, f"unet_{insert_at}")


def test_resnet_forward_matches_reference():
    from cfdbench_tpu.models.resnet import ResNet

    model = ResNet(
        in_chan=2, out_chan=2, n_case_params=5, hidden_chan=8,
        num_blocks=2, kernel_size=5, padding=2,
    )
    check(model, "resnet")


def test_auto_deeponet_forward_matches_reference():
    from cfdbench_tpu.models.point import AutoDeepONet

    model = AutoDeepONet(
        branch_dim=16 * 16 + 5, width=16, branch_depth=2, trunk_depth=2,
        act_name="relu",
    )
    check(model, "auto_deeponet")


def test_auto_ffn_forward_matches_reference():
    """Batch 1 (the reference's tiling defect only scrambles pairing at
    batch > 1, so batch 1 is the defect-free comparable case)."""
    from cfdbench_tpu.models.point import AutoFfn

    model = AutoFfn(
        input_field_dim=16 * 16, num_case_params=5, width=16, depth=2,
    )
    check(model, "auto_ffn")


def test_auto_edeeponet_forward_matches_reference():
    from cfdbench_tpu.models.point import AutoEDeepONet

    model = AutoEDeepONet(
        dim_branch1=16 * 16, dim_branch2=5, width=16,
        branch_depth=2, trunk_depth=2, act_name="relu",
    )
    check(model, "auto_edeeponet")


def test_auto_deeponet_cnn_forward_matches_reference():
    from cfdbench_tpu.models.point import AutoDeepONetCnn

    model = AutoDeepONetCnn(in_chan=2, num_case_params=5, trunk_depth=2)
    check(model, "auto_deeponet_cnn")


def _load_nonauto(name):
    data = dict(np.load(GOLDEN / f"{name}.npz"))
    params = {}

    for key, value in data.items():
        if key.startswith("P|"):
            insert_path(params, key[2:].split("|"), value)
    return (
        params, data["case_params"], data["t"], data["query_xy"],
        data["expected"],
    )


def test_ffn_nonauto_forward_matches_reference():
    """Exercises the scale-invariant NormAct path: normalization must be
    per (sample, query) row over features, like the reference's
    flattened-view Ffn (``src/models/ffn.py:128-135``)."""
    from cfdbench_tpu.models.nonauto import FfnModel

    model = FfnModel(n_case_params=5, width=16, depth=3, act_norm=True)
    params, case_params, t, q, expected = _load_nonauto("ffn_nonauto")
    out = model.apply({"params": params}, case_params, t, q)
    np.testing.assert_allclose(np.asarray(out), expected, atol=ATOL)


def test_deeponet_nonauto_forward_matches_reference():
    from cfdbench_tpu.models.nonauto import DeepONet

    model = DeepONet(
        n_case_params=5, width=16, branch_depth=3, trunk_depth=3,
        act_name="relu", act_norm=True,
    )
    params, case_params, t, q, expected = _load_nonauto(
        "deeponet_nonauto"
    )
    out = model.apply({"params": params}, case_params, t, q)
    np.testing.assert_allclose(np.asarray(out), expected, atol=ATOL)


def test_fno_spectral_backends_match_golden():
    """All three spectral backends reproduce the reference output."""
    from cfdbench_tpu.models.fno import Fno2d
    from cfdbench_tpu.ops import spectral

    model = Fno2d(
        in_chan=2, out_chan=2, n_case_params=5, num_layers=2,
        modes1=4, modes2=4, hidden_dim=8,
    )
    params, _, inputs, case_params, mask, expected = load_case("fno")
    orig = spectral.SPECTRAL_BACKEND
    try:
        for backend in (
            "matmul_packed", "matmul", "fft", "matmul_wfirst",
            "matmul_rsep",
        ):
            spectral.SPECTRAL_BACKEND = backend
            out = model.apply(
                {"params": params}, inputs, case_params, mask
            )
            np.testing.assert_allclose(
                np.asarray(out), expected, atol=ATOL,
                err_msg=f"backend={backend}",
            )
    finally:
        spectral.SPECTRAL_BACKEND = orig


def _load_grads(name):
    data = dict(np.load(GOLDEN / f"{name}.npz"))
    grads = {}

    for key, value in data.items():
        if key.startswith("G|"):
            insert_path(grads, key[2:].split("|"), value)
    return grads, data["label"], float(data["loss_nmse"])


def _grad_check(model, case, grad_case, atol=3e-5):
    """loss value + d(nmse)/d(params) match the reference's autograd on
    a fixed batch — training-dynamics parity, one level deeper than
    forward parity. Models with BatchNorm are linearized in eval mode
    (fresh running stats on both sides)."""
    from cfdbench_tpu.metrics import loss_name_to_fn

    params, stats, inputs, case_params, mask, _ = load_case(case)
    exp_grads, label, exp_loss = _load_grads(grad_case)
    loss_fn = loss_name_to_fn("nmse")
    variables_extra = {"batch_stats": stats} if stats else {}

    def lf(p):
        preds = model.apply(
            {"params": p, **variables_extra},
            inputs, case_params, mask, train=False,
        )
        return loss_fn(preds, jnp.asarray(label) * jnp.asarray(mask))[
            "nmse"
        ]

    loss, grads = jax.value_and_grad(lf)(params)
    assert np.isclose(float(loss), exp_loss, rtol=1e-5)
    flat_got = jax.tree_util.tree_flatten_with_path(grads)[0]
    flat_exp = jax.tree_util.tree_flatten_with_path(exp_grads)[0]
    assert len(flat_got) == len(flat_exp)
    for (pg, g), (pe, e) in zip(flat_got, flat_exp):
        assert jax.tree_util.keystr(pg) == jax.tree_util.keystr(pe)
        np.testing.assert_allclose(
            np.asarray(g), e, atol=atol,
            err_msg=jax.tree_util.keystr(pg),
        )


def test_fno_grads_match_reference():
    from cfdbench_tpu.models.fno import Fno2d

    model = Fno2d(
        in_chan=2, out_chan=2, n_case_params=5, num_layers=2,
        modes1=4, modes2=4, hidden_dim=8,
    )
    _grad_check(model, "fno", "fno_grads")


def test_unet_grads_match_reference():
    from cfdbench_tpu.models.unet import UNet

    model = UNet(
        in_chan=2, out_chan=2, n_case_params=5,
        insert_case_params_at="input", dim=4,
    )
    _grad_check(model, "unet_input", "unet_grads", atol=1e-4)


def test_resnet_grads_match_reference():
    from cfdbench_tpu.models.resnet import ResNet

    model = ResNet(
        in_chan=2, out_chan=2, n_case_params=5, hidden_chan=8,
        num_blocks=2, kernel_size=5, padding=2,
    )
    _grad_check(model, "resnet", "resnet_grads")


def test_fno_sgd_trajectory_matches_reference():
    """5 steps of plain SGD on the masked nmse over two alternating
    batches: per-step losses and final params must track the
    reference's torch training trajectory (training-dynamics parity)."""
    import optax

    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.fno import Fno2d

    model = Fno2d(
        in_chan=2, out_chan=2, n_case_params=5, num_layers=2,
        modes1=4, modes2=4, hidden_dim=8,
    )
    params, _, _, _, _, _ = load_case("fno")  # converted init weights
    data = dict(np.load(GOLDEN / "fno_sgd_trajectory.npz"))
    exp_final = {}

    for key, value in data.items():
        if key.startswith("F|"):
            insert_path(exp_final, key[2:].split("|"), value)
    loss_fn = loss_name_to_fn("nmse")
    tx = optax.sgd(float(data["lr"]))
    opt_state = tx.init(params)

    def lf(p, b):
        preds = model.apply(
            {"params": p}, data[f"b{b}_input"],
            data[f"b{b}_case_params"], data[f"b{b}_mask"], train=False,
        )
        return loss_fn(
            preds,
            jnp.asarray(data[f"b{b}_label"])
            * jnp.asarray(data[f"b{b}_mask"]),
        )["nmse"]

    exp_losses = data["losses"]
    for step in range(len(exp_losses)):
        loss, grads = jax.value_and_grad(lf)(params, step % 2)
        assert np.isclose(float(loss), exp_losses[step], rtol=1e-5), (
            step, float(loss), exp_losses[step]
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    flat_got = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_exp = jax.tree_util.tree_flatten_with_path(exp_final)[0]
    for (pg, g), (pe, e) in zip(flat_got, flat_exp):
        assert jax.tree_util.keystr(pg) == jax.tree_util.keystr(pe)
        np.testing.assert_allclose(
            np.asarray(g), e, atol=5e-6,
            err_msg=jax.tree_util.keystr(pg),
        )


@pytest.mark.parametrize("problem", ["cavity", "tube", "dam", "cylinder"])
def test_dataset_loader_matches_reference(problem, synth_root):
    """This repo's packed AutoDataset must reproduce the reference's
    Dataset classes element-for-element on the same raw case tree
    (pair slicing, convergence cutoff, BC padding, masks, param
    normalization + vector order). The golden was produced by running
    the reference's ``*FlowAutoDataset`` on an identical deterministic
    synthetic tree (scripts/make_golden.py::make_dataset_goldens)."""
    from cfdbench_tpu.data.datasets import build_auto_dataset

    data = dict(np.load(GOLDEN / f"dataset_{problem}.npz"))
    case_dirs = sorted(
        (synth_root / problem / "prop").glob("case*"),
        key=lambda x: int(x.name[4:]),
    ) + sorted(
        (synth_root / problem / "bc").glob("case*"),
        key=lambda x: int(x.name[4:]),
    )
    ds = build_auto_dataset(
        problem, case_dirs, norm_props=True, norm_bc=True,
        # cylinder: data_delta_time=0.001 → stride 2 on 12-frame cases
        delta_time=0.002 if problem == "cylinder" else 0.1,
    )
    assert len(ds) == data["inputs"].shape[0]
    np.testing.assert_allclose(ds.inputs, data["inputs"], atol=1e-6)
    np.testing.assert_allclose(ds.labels, data["labels"], atol=1e-6)
    np.testing.assert_allclose(ds.masks, data["mask"], atol=1e-6)
    np.testing.assert_array_equal(ds.case_ids, data["case_ids"])
    np.testing.assert_allclose(
        ds.case_params, data["case_params"], atol=1e-6
    )


def test_fno_adam_trajectory_matches_reference():
    """Same 5-step trajectory with Adam — the optimizer the trainers
    use. optax.adam (b1=.9, b2=.999, eps=1e-8, eps_root=0) implements
    torch.optim.Adam's exact update."""
    import optax

    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.fno import Fno2d

    model = Fno2d(
        in_chan=2, out_chan=2, n_case_params=5, num_layers=2,
        modes1=4, modes2=4, hidden_dim=8,
    )
    params, _, _, _, _, _ = load_case("fno")
    traj = dict(np.load(GOLDEN / "fno_sgd_trajectory.npz"))  # batches
    exp = np.load(GOLDEN / "fno_adam_trajectory.npz")
    loss_fn = loss_name_to_fn("nmse")
    tx = optax.adam(float(exp["lr"]))
    opt_state = tx.init(params)

    def lf(p, b):
        preds = model.apply(
            {"params": p}, traj[f"b{b}_input"],
            traj[f"b{b}_case_params"], traj[f"b{b}_mask"], train=False,
        )
        return loss_fn(
            preds,
            jnp.asarray(traj[f"b{b}_label"])
            * jnp.asarray(traj[f"b{b}_mask"]),
        )["nmse"]

    for step, exp_loss in enumerate(exp["losses"]):
        loss, grads = jax.value_and_grad(lf)(params, step % 2)
        assert np.isclose(float(loss), exp_loss, rtol=2e-5), (
            step, float(loss), exp_loss
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)


def test_unet_adam_trajectory_matches_reference():
    """5 Adam steps of the UNet in TRAIN mode (BatchNorm batch-stat
    normalization + running-stat updates) over two alternating fixed
    batches: per-step losses must track the torch reference —
    training-dynamics parity for the conv family."""
    import optax

    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.unet import UNet

    model = UNet(
        in_chan=2, out_chan=2, n_case_params=5,
        insert_case_params_at="input", dim=4,
    )
    params, stats, _, _, _, _ = load_case("unet_input")
    traj = dict(np.load(GOLDEN / "unet_adam_trajectory.npz"))
    loss_fn = loss_name_to_fn("nmse")
    tx = optax.adam(float(traj["lr"]))
    opt_state = tx.init(params)

    def lf(p, bs, b):
        preds, new_vars = model.apply(
            {"params": p, "batch_stats": bs},
            traj[f"b{b}_input"], traj[f"b{b}_case_params"],
            traj[f"b{b}_mask"], train=True, mutable=["batch_stats"],
        )
        loss = loss_fn(
            preds,
            jnp.asarray(traj[f"b{b}_label"])
            * jnp.asarray(traj[f"b{b}_mask"]),
        )["nmse"]
        return loss, new_vars["batch_stats"]

    for step, exp_loss in enumerate(traj["losses"]):
        (loss, stats), grads = jax.value_and_grad(lf, has_aux=True)(
            params, stats, step % 2
        )
        # Step 0 is pure forward parity (tight). Later steps diverge
        # exponentially: BatchNorm's per-batch normalization amplifies
        # f32 rounding differences through the Adam rsqrt each step
        # (measured: 1e-7 -> 1e-6 -> 1e-4 -> 4e-3 -> 1.2e-2 relative)
        # — trajectory *tracking*, not bitwise parity, is the contract
        # for training dynamics (SURVEY.md §7 hard part e). A semantic
        # error (wrong BN momentum/eps, wrong masking, wrong optimizer)
        # shows up at steps 0-1 far above these bounds.
        rtol = (1e-5, 1e-4, 1e-3, 1.5e-2, 4e-2)[step]
        assert np.isclose(float(loss), exp_loss, rtol=rtol), (
            step, float(loss), exp_loss
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)


def test_resnet_adam_trajectory_matches_reference():
    """5 Adam steps of the ResNet over two alternating fixed batches
    (eval mode: dropout off; the reference's forward never calls its
    BatchNorms — ``src/models/resnet.py:55-77`` — so nothing else
    differs from train mode). Per-step losses must track the torch
    reference — training-dynamics parity for the input-residual conv
    family. Init params come from the resnet forward golden (same
    seed/config)."""
    import optax

    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.resnet import ResNet

    model = ResNet(
        in_chan=2, out_chan=2, n_case_params=5, hidden_chan=8,
        num_blocks=2, kernel_size=5, padding=2,
    )
    params, _, _, _, _, _ = load_case("resnet")
    traj = dict(np.load(GOLDEN / "resnet_adam_trajectory.npz"))
    loss_fn = loss_name_to_fn("nmse")
    tx = optax.adam(float(traj["lr"]))
    opt_state = tx.init(params)

    def lf(p, b):
        preds = model.apply(
            {"params": p}, traj[f"b{b}_input"],
            traj[f"b{b}_case_params"], traj[f"b{b}_mask"], train=False,
        )
        return loss_fn(
            preds,
            jnp.asarray(traj[f"b{b}_label"])
            * jnp.asarray(traj[f"b{b}_mask"]),
        )["nmse"]

    for step, exp_loss in enumerate(traj["losses"]):
        loss, grads = jax.value_and_grad(lf)(params, step % 2)
        assert np.isclose(float(loss), exp_loss, rtol=3e-5), (
            step, float(loss), exp_loss
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)


def test_auto_deeponet_adam_trajectory_matches_reference():
    """5 Adam steps of AutoDeepONet on the full-lattice query loss —
    training-dynamics parity for the point/operator family. The auto
    trainer's forward path scores the full H*W lattice (query_idxs is
    None, ``src/models/auto_deeponet.py:119-125``) with loss against
    flat u labels (``:137-141``): no query sampling, so the torch
    trajectory is exactly reproducible. Init params come from the
    auto_deeponet forward golden (same seed/config)."""
    import optax

    from cfdbench_tpu.metrics import loss_name_to_fn
    from cfdbench_tpu.models.point import AutoDeepONet

    model = AutoDeepONet(
        branch_dim=16 * 16 + 5, width=16,
        branch_depth=2, trunk_depth=2, act_name="relu",
    )
    params, _, _, _, _, _ = load_case("auto_deeponet")
    traj = dict(np.load(GOLDEN / "auto_deeponet_adam_trajectory.npz"))
    loss_fn = loss_name_to_fn("nmse")
    tx = optax.adam(float(traj["lr"]))
    opt_state = tx.init(params)

    def lf(p, b):
        # (B, H*W) preds at the row-major lattice; labels = flat u —
        # exactly AutoTask.loss_scores' pointwise branch.
        preds = model.apply(
            {"params": p}, traj[f"b{b}_input"],
            traj[f"b{b}_case_params"], traj[f"b{b}_mask"], train=False,
        )
        labels = traj[f"b{b}_label"][..., 0].reshape(preds.shape[0], -1)
        return loss_fn(preds, jnp.asarray(labels))["nmse"]

    for step, exp_loss in enumerate(traj["losses"]):
        loss, grads = jax.value_and_grad(lf)(params, step % 2)
        assert np.isclose(float(loss), exp_loss, rtol=2e-5), (
            step, float(loss), exp_loss
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)


def test_golden_params_load_into_init_structure():
    """Converted trees are structurally identical to model.init's."""
    from cfdbench_tpu.models.fno import Fno2d

    model = Fno2d(
        in_chan=2, out_chan=2, n_case_params=5, num_layers=2,
        modes1=4, modes2=4, hidden_dim=8,
    )
    params, _, inputs, case_params, mask, _ = load_case("fno")
    ref = model.init(
        jax.random.PRNGKey(0), inputs, case_params, mask
    )["params"]
    ref_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(ref)[0]
    }
    got_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    assert ref_paths == got_paths
