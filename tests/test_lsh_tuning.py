"""Unit tests for the driver-side LSH parameter tuner (pure Python)."""

import pytest

from logstash_spark.operators.dataprep import lsh_tuning


def test_classic_128_at_half():
    # MMDS classic: 128 hashes targeting ~0.5 -> b=32, r=4
    # ((1/32)^(1/4) = 0.42) vs b=16, r=8 ((1/16)^(1/8) = 0.707):
    # closest to 0.5 is b=32.
    out = lsh_tuning(128, 0.5)
    assert out["bands"] * out["rows_per_band"] == 128
    assert (out["bands"], out["rows_per_band"]) == (32, 4)
    # no other factorization of 128 sits closer to 0.5
    others = [
        (1.0 / b) ** (b / 128.0)
        for b in range(1, 129)
        if 128 % b == 0 and b != 32
    ]
    assert all(abs(t - 0.5) >= abs(out["threshold"] - 0.5) for t in others)


def test_eight_hashes_repo_default():
    # the repo's minhash uses 8 hashes; a 0.6 target picks b=4, r=2
    out = lsh_tuning(8, 0.6)
    assert (out["bands"], out["rows_per_band"]) == (4, 2)
    assert 0 < out["p_at_target"] < 1


def test_threshold_monotone_in_rows():
    lo = lsh_tuning(64, 0.2)
    hi = lsh_tuning(64, 0.9)
    assert lo["rows_per_band"] < hi["rows_per_band"]


def test_degenerate_and_validation():
    out = lsh_tuning(1, 0.5)
    assert (out["bands"], out["rows_per_band"]) == (1, 1)
    with pytest.raises(ValueError):
        lsh_tuning(0, 0.5)
    with pytest.raises(ValueError):
        lsh_tuning(8, 1.5)
