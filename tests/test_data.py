"""Dataset loaders: padding, masks, splits, truncation, packing."""

import numpy as np
import pytest

from cfdbench_tpu.data import get_auto_dataset, get_dataset
from cfdbench_tpu.data.core import (
    collect_case_dirs,
    load_case,
    normalize_bc,
    normalize_physics_props,
    split_cases,
)


def test_split_is_seed0_reproducible(synth_root):
    dirs = collect_case_dirs(synth_root / "cavity", "prop_bc_geo")
    assert len(dirs) == 12
    tr1, dv1, te1 = split_cases(dirs, seed=0)
    tr2, dv2, te2 = split_cases(dirs, seed=0)
    assert tr1 == tr2 and dv1 == dv2 and te1 == te2
    assert len(tr1) == round(12 * 0.8)
    assert len(dv1) == round(12 * 0.1)
    assert len(te1) + len(dv1) + len(tr1) == 12
    # Case-level split: no overlap
    assert not (set(tr1) & set(dv1)) and not (set(tr1) & set(te1))


def test_cavity_no_padding(synth_root):
    dirs = collect_case_dirs(synth_root / "cavity", "prop")
    case = load_case("cavity", dirs[0])
    assert case.features.shape == (12, 16, 16, 3)
    assert (case.features[..., 2] == 1).all()  # mask all ones


def test_tube_padding(synth_root):
    dirs = collect_case_dirs(synth_root / "tube", "prop")
    case = load_case("tube", dirs[0])
    # (rows+2, cols+1) per src/dataset/tube.py:34-51
    assert case.features.shape == (12, 18, 17, 3)
    u, v, mask = (case.features[..., i] for i in range(3))
    # left column (inside top/bottom pad rows) is vel_in for u, 0 for v/mask
    assert np.allclose(u[:, 1:-1, 0], case.params["vel_in"])
    assert np.allclose(v[:, :, 0], 0)
    assert np.allclose(mask[:, :, 0], 0)
    assert np.allclose(mask[:, 0, :], 0) and np.allclose(mask[:, -1, :], 0)
    assert (mask[:, 1:-1, 1:] == 1).all()


def test_dam_padding_and_params(synth_root):
    dirs = collect_case_dirs(synth_root / "dam", "prop")
    case = load_case("dam", dirs[0])
    assert case.features.shape == (12, 18, 17, 3)
    assert list(case.params.keys()) == [
        "velocity", "density", "viscosity", "height", "width",
    ]
    u = case.features[..., 0]
    barrier_top_idx = int(0.1 / (0.4 / 16))  # barrier_height / dy = 4
    # u left column: velocity below barrier top (shifted by 1 top pad row)
    assert np.allclose(u[:, 1: 1 + barrier_top_idx, 0],
                       case.params["velocity"])
    assert np.allclose(u[:, 1 + barrier_top_idx: -1, 0], 0)


def test_dam_fixed_barrier_mask(synth_root):
    dirs = collect_case_dirs(synth_root / "dam", "prop")
    fixed = load_case("dam", dirs[0], fix_barrier_mask=True)
    default = load_case("dam", dirs[0])
    # Reference behavior (defect #3): barrier never masked.
    assert (default.features[..., 2][:, 1:-1, 1:] == 1).all()
    # Fixed behavior: some interior zeros where the barrier is.
    assert (fixed.features[..., 2][:, 1:-1, 1:] == 0).any()


def test_cylinder_mask(synth_root):
    dirs = collect_case_dirs(synth_root / "cylinder", "geo")
    case = load_case("cylinder", dirs[0])
    assert case.features.shape == (12, 16, 16, 3)  # unpadded
    mask = case.features[0, :, :, 2]
    assert mask[0, :].sum() == 0 and mask[-1, :].sum() == 0
    assert mask[:, 0].sum() == 0
    # circular obstacle in the middle
    assert mask[7:9, 7:9].sum() == 0
    assert case.params["height"] == 4.0 and case.params["width"] == 4.0
    assert "x_min" not in case.params


def test_normalization_constants():
    p = {"density": 5.0, "viscosity": 0.00238, "vel_top": 50.0}
    normalize_physics_props(p)
    assert p["density"] == 0.0 and p["viscosity"] == 0.0
    normalize_bc(p, "vel_top")
    assert p["vel_top"] == 0.5


@pytest.mark.parametrize("problem", ["cavity", "tube", "dam", "cylinder"])
def test_auto_dataset_builds(synth_root, problem):
    train, dev, test = get_auto_dataset(
        data_dir=synth_root,
        data_name=f"{problem}_prop_bc_geo",
        delta_time=0.1 if problem != "cylinder" else 0.001,
        norm_props=True,
        norm_bc=True,
    )
    for ds in (train, dev, test):
        assert len(ds) > 0
        n = len(ds)
        assert ds.inputs.shape[0] == n and ds.inputs.shape[-1] == 2
        assert ds.labels.shape == ds.inputs.shape
        assert ds.masks.shape == ds.inputs.shape[:3] + (1,)
        assert ds.case_params.shape[0] == n
        assert not np.isnan(ds.inputs).any()
    expected_p = 8 if problem == "cylinder" else 5
    assert train.n_case_params == expected_p


def test_auto_dataset_pair_alignment(synth_root):
    train, _, _ = get_auto_dataset(
        data_dir=synth_root,
        data_name="cavity_prop",
        delta_time=0.2,  # stride 2
        norm_props=False,
        norm_bc=False,
        load_splits=["train"],
    )
    # label of pair i is frame t+2 of the same case; verify via
    # all_features for the first case present in the packed arrays
    cid = train.case_ids[0]
    feats = train.all_features[cid]
    n0 = (train.case_ids == cid).sum()
    np.testing.assert_allclose(
        train.inputs[:n0], feats[:n0, :, :, :2], rtol=1e-6
    )
    np.testing.assert_allclose(
        train.labels[:n0], feats[2: n0 + 2, :, :, :2], rtol=1e-6
    )


def test_frame_dataset_builds(synth_root):
    train, dev, test = get_dataset(
        data_name="cavity_prop_bc_geo",
        data_dir=synth_root,
        norm_props=True,
        norm_bc=True,
    )
    assert len(train) > len(dev)
    assert train.frames.shape[-1] == 3
    assert train.n_case_params == 5
    # frame_t restarts per case
    assert train.frame_t[0] == 0.0


def test_load_splits_subset(synth_root):
    train, dev, test = get_auto_dataset(
        data_dir=synth_root,
        data_name="cavity_prop",
        delta_time=0.1,
        norm_props=True,
        norm_bc=True,
        load_splits=["test"],
    )
    assert train is None and dev is None and test is not None


def test_auto_dataset_cache_roundtrip(synth_root, tmp_path):
    from cfdbench_tpu.data.core import collect_case_dirs, split_cases
    from cfdbench_tpu.data.datasets import build_auto_dataset

    dirs = split_cases(collect_case_dirs(synth_root / "cavity", "prop"))[0]
    kw = dict(norm_props=True, norm_bc=True, delta_time=0.1)
    fresh = build_auto_dataset("cavity", dirs, **kw)
    cached1 = build_auto_dataset(
        "cavity", dirs, cache_dir=tmp_path / "cache", **kw
    )
    cached2 = build_auto_dataset(
        "cavity", dirs, cache_dir=tmp_path / "cache", **kw
    )
    np.testing.assert_array_equal(fresh.inputs, cached2.inputs)
    np.testing.assert_array_equal(fresh.case_params, cached2.case_params)
    assert len(fresh.all_features) == len(cached2.all_features)
    np.testing.assert_array_equal(
        fresh.all_features[0], cached2.all_features[0]
    )
    assert fresh.case_params_list[0] == cached2.case_params_list[0]
    # Different settings produce a different cache key (no stale hit).
    other = build_auto_dataset(
        "cavity", dirs, norm_props=False, norm_bc=True, delta_time=0.1,
        cache_dir=tmp_path / "cache",
    )
    assert not np.allclose(other.case_params, cached2.case_params)


def test_frame_dataset_point_examples(synth_root):
    train, _, _ = get_dataset(
        "cavity_prop_bc_geo", synth_root, norm_props=False, norm_bc=False
    )
    h, w = train.field_shape
    assert train.num_points == len(train) * h * w
    idxs = np.array([0, 1, w, h * w])  # first pixel, next col, next row,
    cp, query, vals = train.point_examples(idxs)  # second frame
    assert cp.shape == (4, 5) and query.shape == (4, 3)
    # point 0: frame 0 at (x=0, y=0)
    assert query[0].tolist() == [0.0, 0.0, 0.0]
    assert vals[0] == train.frames[0, 0, 0, 0]
    # idx=1 -> x=1 (col), y=0; idx=w -> y=1 (row)
    assert query[1][1] == 1.0 and query[1][2] == 0.0
    assert query[2][1] == 0.0 and query[2][2] == 1.0
    assert query[3][0] == train.frame_t[1]


def test_reference_pt_cache_roundtrip(synth_root, tmp_path):
    """A reference-format torch cache (cylinder.py:477-541 layout)
    loads into an AutoDataset identical to the directly-built one."""
    import numpy as np
    import torch

    from cfdbench_tpu.data.compat import auto_dataset_from_reference_cache
    from cfdbench_tpu.data.core import collect_case_dirs
    from cfdbench_tpu.data.datasets import build_auto_dataset

    case_dirs = collect_case_dirs(synth_root / "cylinder", "prop")
    ds = build_auto_dataset(
        "cylinder", case_dirs, norm_props=True, norm_bc=True,
        delta_time=0.002,
    )
    # Write a cache exactly as the reference does (NCHW tensors,
    # per-case params dicts, list of per-case feature arrays).
    d = tmp_path / "cache" / "train"
    d.mkdir(parents=True)
    feats3 = np.concatenate([ds.inputs, ds.masks], axis=-1)
    labels3 = np.concatenate([ds.labels, ds.masks], axis=-1)
    torch.save(
        torch.tensor(feats3.transpose(0, 3, 1, 2)), d / "inputs.pt"
    )
    torch.save(
        torch.tensor(labels3.transpose(0, 3, 1, 2)), d / "labels.pt"
    )
    torch.save(list(map(int, ds.case_ids)), d / "case_ids.pt")
    torch.save(ds.case_params_list, d / "case_params.pt")
    torch.save(
        [f.transpose(0, 3, 1, 2) for f in ds.all_features],
        d / "all_features.pt",
    )

    loaded = auto_dataset_from_reference_cache(d)
    np.testing.assert_array_equal(loaded.inputs, ds.inputs)
    np.testing.assert_array_equal(loaded.labels, ds.labels)
    np.testing.assert_array_equal(loaded.masks, ds.masks)
    np.testing.assert_array_equal(loaded.case_ids, ds.case_ids)
    np.testing.assert_allclose(loaded.case_params, ds.case_params)
    for a, b in zip(loaded.all_features, ds.all_features):
        np.testing.assert_array_equal(a, b)


def test_karman_legacy_loader(tmp_path):
    """Legacy Karman dataset (reference ``src/dataset/base.py:10-87``):
    BC padding (1 on top/bottom/left), flipped+padded mask, u boundary
    columns forced to 0.5, pairs offset by time_step_size."""
    from cfdbench_tpu.data.karman import build_karman_dataset

    rng = np.random.default_rng(7)
    T, H, W = 25, 6, 8
    np.save(tmp_path / "u.npy", rng.standard_normal((T, H, W)))
    np.save(tmp_path / "v.npy", rng.standard_normal((T, H, W)))
    np.save(tmp_path / "mask.npy",
            rng.integers(0, 2, (H, W)).astype(np.float64))
    ds = build_karman_dataset(tmp_path, time_step_size=10)
    assert len(ds) == T - 10
    assert ds.features.shape == (T - 10, H + 2, W + 1, 2)
    assert ds.labels.shape == ds.features.shape
    # pairs offset by exactly time_step_size frames
    np.testing.assert_array_equal(ds.features[10], ds.labels[0])
    # u boundary columns forced to 0.5 on interior rows, both edges
    assert np.all(ds.features[0, 1:-1, 0, 0] == 0.5)
    assert np.all(ds.features[0, 1:-1, -1, 0] == 0.5)
    # padded rows are zero for v; mask is flipped (boundaries -> 0)
    assert np.all(ds.features[0, 0, :, 1] == 0)
    assert ds.mask.shape == (H + 2, W + 1)
    assert np.all(ds.mask[0, :] == 0) and np.all(ds.mask[:, 0] == 0)
