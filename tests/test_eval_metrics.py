"""Sanity pins for the SWD/FID tooling (tools/eval_metrics.py).

The paper table (BASELINE.md) reports FID + SWD; the reference repo ships no
evaluation code, so these tests pin OUR implementation's invariants: zero on
identical distributions, monotone under growing corruption, permutation-
invariant.
"""

import numpy as np
import pytest

from tools.eval_metrics import fid_from_features, swd


def _imgs(seed, n=16, size=64):
    rs = np.random.RandomState(seed)
    # smooth-ish random images (tile gradients + noise) so pyramid bands
    # are non-degenerate
    base = rs.rand(n, 8, 8, 3).astype(np.float32)
    up = np.repeat(np.repeat(base, size // 8, 1), size // 8, 2)
    return np.clip((up + 0.1 * rs.rand(n, size, size, 3)) * 255, 0, 255)


def test_swd_zero_on_identical():
    x = _imgs(0)
    d = swd(x, x.copy(), n_patches=1024, n_proj=32)
    assert d["avg"] < 1e-4


def test_swd_monotone_in_noise():
    x = _imgs(1)
    rs = np.random.RandomState(2)
    noise = rs.randn(*x.shape).astype(np.float32)
    d_small = swd(x, np.clip(x + 8 * noise, 0, 255),
                  n_patches=1024, n_proj=32)["avg"]
    d_big = swd(x, np.clip(x + 64 * noise, 0, 255),
                n_patches=1024, n_proj=32)["avg"]
    assert 0 < d_small < d_big


def test_fid_zero_identical_and_monotone():
    rs = np.random.RandomState(0)
    f1 = rs.randn(256, 16).astype(np.float64)
    assert fid_from_features(f1, f1.copy()) == pytest.approx(0.0, abs=1e-6)
    f2 = f1 + 0.5
    f3 = f1 + 2.0
    a, b = fid_from_features(f1, f2), fid_from_features(f1, f3)
    assert 0 < a < b
    # mean shift of m in D dims -> FID ~ m^2 * D
    assert a == pytest.approx(0.25 * 16, rel=0.2)


def test_fid_permutation_invariant():
    rs = np.random.RandomState(3)
    f1 = rs.randn(128, 8)
    f2 = rs.randn(128, 8) + 1.0
    d1 = fid_from_features(f1, f2)
    d2 = fid_from_features(f1[::-1], f2[rs.permutation(128)])
    assert d1 == pytest.approx(d2, rel=1e-6)
