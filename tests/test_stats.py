"""Statistics helpers: calibration checks against known distributions."""

import numpy as np

from gnngls_tpu.stats import (bootstrap_mean_ci, paired_compare,
                              paired_permutation_test)


def test_bootstrap_ci_covers_true_mean():
    rng = np.random.default_rng(0)
    hits = 0
    for s in range(40):
        x = rng.normal(loc=2.0, scale=1.0, size=200)
        _, lo, hi = bootstrap_mean_ci(x, n_boot=2000, seed=s)
        hits += lo <= 2.0 <= hi
    assert hits >= 34  # ~95% coverage, generous slack for 40 trials


def test_bootstrap_ci_shrinks_with_n():
    rng = np.random.default_rng(1)
    x_small = rng.normal(size=50)
    x_big = rng.normal(size=5000)
    _, lo_s, hi_s = bootstrap_mean_ci(x_small, n_boot=2000, seed=0)
    _, lo_b, hi_b = bootstrap_mean_ci(x_big, n_boot=2000, seed=0)
    assert (hi_b - lo_b) < (hi_s - lo_s)


def test_permutation_null_uniform_p():
    """Under H0 (identical paired distributions) p should not be small."""
    rng = np.random.default_rng(2)
    ps = []
    for s in range(20):
        base = rng.normal(size=150)
        a = base + rng.normal(scale=0.1, size=150)
        b = base + rng.normal(scale=0.1, size=150)
        _, p = paired_permutation_test(a, b, n_perm=2000, seed=s)
        ps.append(p)
    assert np.mean(np.asarray(ps) < 0.05) <= 0.25  # no gross anti-conservatism
    assert np.median(ps) > 0.15


def test_permutation_detects_shift():
    rng = np.random.default_rng(3)
    base = rng.normal(size=200)
    a = base - 0.15 + rng.normal(scale=0.05, size=200)  # a better by 0.15
    b = base + rng.normal(scale=0.05, size=200)
    d, p = paired_permutation_test(a, b, n_perm=5000, seed=0)
    assert d < -0.1
    assert p < 0.01


def test_paired_compare_bundle():
    rng = np.random.default_rng(4)
    base = np.abs(rng.normal(size=300))
    a = base * 0.9
    b = base
    out = paired_compare(a, b, n_boot=2000, n_perm=2000)
    assert out["mean_diff"] < 0
    assert out["diff_ci95"][0] <= out["mean_diff"] <= out["diff_ci95"][1]
    assert out["p_value_paired_sign_flip"] < 0.01
    assert out["n_instances"] == 300
    assert out["frac_a_strictly_better"] > 0.9
