"""Metric semantics: parity with torch.nn.functional and weighted-padding
exactness."""

import numpy as np
import torch
import torch.nn.functional as F

from cfdbench_tpu.metrics import loss_name_to_fn, score_dict


def test_score_dict_matches_torch(rng):
    preds = rng.standard_normal((4, 2, 8, 8)).astype(np.float32)
    labels = rng.standard_normal((4, 2, 8, 8)).astype(np.float32)
    ours = score_dict(preds, labels, normalize=True)
    tp, tl = torch.tensor(preds), torch.tensor(labels)
    mse = F.mse_loss(tp, tl).item()
    mae = F.l1_loss(tp, tl).item()
    nmse = mse / torch.square(tl).mean().item()
    assert np.isclose(float(ours["mse"]), mse, rtol=1e-6)
    assert np.isclose(float(ours["mae"]), mae, rtol=1e-6)
    assert np.isclose(float(ours["rmse"]), np.sqrt(mse), rtol=1e-6)
    assert np.isclose(float(ours["nmse"]), nmse, rtol=1e-6)


def test_weighted_padding_is_exact(rng):
    preds = rng.standard_normal((5, 3, 4, 4)).astype(np.float32)
    labels = rng.standard_normal((5, 3, 4, 4)).astype(np.float32)
    # Pad to 8 with garbage rows, weight them 0.
    pad = np.full((3, 3, 4, 4), 7.7, dtype=np.float32)
    p8 = np.concatenate([preds, pad])
    l8 = np.concatenate([labels, -pad])
    w = np.array([1, 1, 1, 1, 1, 0, 0, 0], dtype=np.float32)
    a = score_dict(preds, labels, normalize=True)
    b = score_dict(p8, l8, normalize=True, sample_weights=w)
    for k in a:
        assert np.isclose(float(a[k]), float(b[k]), rtol=1e-6), k


def test_loss_name_factory():
    assert loss_name_to_fn("mse").normalize is False
    assert loss_name_to_fn("nmse").normalize is True
    assert loss_name_to_fn("nmse").get_score_names() == [
        "mse", "rmse", "mae", "nmse",
    ]
    assert loss_name_to_fn("mse").get_score_names() == ["mse", "rmse", "mae"]


def test_nmae_is_normalized_and_zero_weight_batches_are_finite():
    """nmae = mae / mean|labels| (the reference advertises nmae but
    never implements it — defect #7); an all-padding batch (weights
    all zero) yields finite zeros, not 0/0 NaN (round-4 review)."""
    rng = np.random.default_rng(3)
    preds = rng.standard_normal((4, 3, 3)).astype(np.float32)
    labels = rng.standard_normal((4, 3, 3)).astype(np.float32)
    fn = loss_name_to_fn("nmae")
    assert fn.objective == "nmae"
    assert fn.get_score_names() == ["mse", "rmse", "mae", "nmse", "nmae"]
    s = fn(preds, labels)
    expect = np.abs(preds - labels).mean() / np.abs(labels).mean()
    assert np.isclose(float(s["nmae"]), expect, rtol=1e-6)

    w0 = np.zeros((4,), dtype=np.float32)
    s0 = score_dict(preds, labels, normalize=True, sample_weights=w0)
    for k, v in s0.items():
        assert np.isfinite(float(v)), (k, v)


def test_tiny_nonzero_label_energy_divides_exactly():
    """Labels with energy below 1e-30 (tiny but normal f32) must divide
    by the TRUE energy, matching the reference's unguarded
    mse/mean(labels**2) — a maximum()-style clamp would silently
    inflate the denominator (ADVICE r4 #2). Only the exact all-padding
    lab==0 case is guarded (to 0, not NaN)."""
    preds = np.full((2, 3, 3), 2e-17, dtype=np.float32)
    labels = np.full((2, 3, 3), 1e-17, dtype=np.float32)  # energy 1e-34
    s = score_dict(preds, labels, normalize=True)
    assert np.isclose(float(s["nmse"]), 1.0, rtol=1e-5)  # (2x-x)^2/x^2
    assert np.isclose(float(s["nmae"]), 1.0, rtol=1e-5)

    z = np.zeros((2, 3, 3), dtype=np.float32)
    s0 = score_dict(z, z, normalize=True)
    assert float(s0["nmse"]) == 0.0 and float(s0["nmae"]) == 0.0


def test_underflowed_label_energy_is_not_scored_perfect():
    """Nonzero labels whose SQUARED energy underflows f32 (or flushes
    to zero under the TPU's FTZ) must not come back as nmse=0
    ("perfect"): the all-zero guard keys on max|label| — which cannot
    underflow — so this case takes the reference's unguarded division
    and explodes instead of silently passing (round-5 review finding)."""
    labels = np.full((2, 3, 3), 1e-24, dtype=np.float32)  # sq -> 1e-48
    preds = np.full((2, 3, 3), 3e-24, dtype=np.float32)
    s = score_dict(preds, labels, normalize=True)
    nmse = float(s["nmse"])
    # CPU keeps subnormals (huge finite ratio); TPU flushes to 0 (inf).
    # Either way: emphatically not a perfect score.
    assert not np.isclose(nmse, 0.0)
    assert nmse > 1e6 or np.isinf(nmse) or np.isnan(nmse)
    # nmae divides by mean|label| = 1e-24 (normal): exact ratio 2.
    assert np.isclose(float(s["nmae"]), 2.0, rtol=1e-5)
