"""Native C++ npy reader: correctness vs np.load + loader integration."""

import numpy as np
import pytest

from cfdbench_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native library unavailable (no C++ toolchain)",
)


def _write(path, arr):
    np.save(path, arr)
    return path


def test_read_f32_matches_np_load(tmp_path, rng):
    arr = rng.standard_normal((7, 16, 16)).astype(np.float32)
    p = _write(tmp_path / "a.npy", arr)
    got = native.read_npy_f32(p)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, arr)
    assert native.npy_shape(p) == arr.shape


def test_read_f64_converts(tmp_path, rng):
    arr = rng.standard_normal((5, 8, 8))  # float64, the raw-data dtype
    p = _write(tmp_path / "b.npy", arr)
    got = native.read_npy_f32(p)
    np.testing.assert_array_equal(got, arr.astype(np.float32))


def test_batch_read_parallel(tmp_path, rng):
    arrs = [
        rng.standard_normal((3 + i, 4, 4)).astype(np.float32)
        for i in range(24)
    ]
    paths = [
        _write(tmp_path / f"f{i}.npy", a) for i, a in enumerate(arrs)
    ]
    got = native.read_npy_f32_batch(paths, n_threads=8)
    for g, a in zip(got, arrs):
        np.testing.assert_array_equal(g, a)


def test_unsupported_dtype_raises(tmp_path):
    p = _write(tmp_path / "i.npy", np.arange(6, dtype=np.int32))
    with pytest.raises(ValueError, match="dtype"):
        native.read_npy_f32(p)


def test_fast_io_prefetch_and_fallback(tmp_path, rng):
    from cfdbench_tpu.data import fast_io

    fast_io.clear_cache()
    arr = rng.standard_normal((4, 6, 6)).astype(np.float32)
    p = _write(tmp_path / "c.npy", arr)
    n = fast_io.prefetch_npy([p, tmp_path / "missing.npy"])
    assert n == 1
    np.testing.assert_array_equal(fast_io.load_npy(p), arr)
    # Cache entries are consumed; second load falls back to np.load.
    np.testing.assert_array_equal(fast_io.load_npy(p), arr)


def test_dataset_identical_with_and_without_native(synth_root):
    """The prefetch path must not change a single byte of the packed
    dataset arrays."""
    from cfdbench_tpu.data import fast_io, get_auto_dataset

    fast_io.clear_cache()
    with_native, _, _ = get_auto_dataset(
        synth_root, "cavity_prop", 0.1, True, True, load_splits=["train"]
    )
    orig = native.available
    try:
        native.available = lambda: False
        fast_io.clear_cache()
        without, _, _ = get_auto_dataset(
            synth_root, "cavity_prop", 0.1, True, True,
            load_splits=["train"],
        )
    finally:
        native.available = orig
    np.testing.assert_array_equal(with_native.inputs, without.inputs)
    np.testing.assert_array_equal(with_native.labels, without.labels)
    np.testing.assert_array_equal(with_native.masks, without.masks)
    np.testing.assert_array_equal(
        with_native.case_params, without.case_params
    )
