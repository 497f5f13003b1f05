"""Unit tests for survival-function and statistical helpers."""

import numpy as np
import pytest

from basicrta_tpu.ops.surv import (
    survival_function, survival_bins, empirical_ci, ci_bars, infer_timestep,
    decimals_of, start_stop_frames, simulate_hyperexp, discretize_times,
    unique_rate_count)


def test_infer_timestep():
    x = np.array([0.3, 0.1, 0.1, 0.5, 0.2])
    assert infer_timestep(x) == pytest.approx(0.1)
    # all-equal falls back to the minimum (reference gibbs.py:150-151)
    assert infer_timestep(np.full(5, 0.4)) == pytest.approx(0.4)


def test_survival_bins():
    # edges at multiples of ts covering max(x) (reference util.py:653-660)
    bins = survival_bins(np.array([0.1, 0.5]), 0.1)
    assert bins[0] == pytest.approx(0.1)
    assert bins[-1] >= 0.5 + 0.1
    assert np.allclose(np.diff(bins), 0.1)


def test_survival_function_monotone():
    x = np.array([0.1] * 5 + [0.2] * 3 + [0.5] * 2)
    t, s = survival_function(x, 0.1)
    assert t[0] == 0.0 and s[0] == 1.0
    assert np.all(np.diff(s) <= 0)
    assert s[-1] == pytest.approx(0.0)
    # S just after 0 excludes the five 0.1-events
    assert s[1] == pytest.approx(1 - 5 / 10)


def test_empirical_ci():
    data = np.arange(1, 1001, dtype=float)
    lo, hi = empirical_ci(data)
    assert lo == pytest.approx(25.0)
    assert hi == pytest.approx(975.0)
    # tiny samples fall back to the data range (reference util.py:84-89)
    lo, hi = empirical_ci(np.array([3.0, 5.0]))
    assert (lo, hi) == (3.0, 5.0)


def test_ci_bars():
    tau = np.array([[1.0, 2.0, 4.0], [0.5, 1.0, 1.5]])
    bars = ci_bars(tau)
    assert bars.shape == (2, 2)
    assert np.allclose(bars[0], [1.0, 0.5])
    assert np.allclose(bars[1], [2.0, 0.5])


def test_decimals_of():
    assert decimals_of(0.1) == 1
    assert decimals_of(0.25) == 2
    # integral timesteps round at the unit scale (the reference's get_dec,
    # util.py:508-513, returns -2 for float 1.0 via str(1.0) = '1.0',
    # which collapses every time below 50 ns to zero; deliberate fix)
    assert decimals_of(1.0) == 0
    assert decimals_of(2.0) == 0
    assert decimals_of(10.0) == -1
    assert decimals_of(1e-5) == 5


def test_infer_timestep_takes_minimum_gap():
    # diffs of a sorted array are not sorted: the first nonzero gap here
    # is 0.3 but the timestep-recovering smallest gap is 0.1
    assert infer_timestep(np.array([0.3, 0.6, 0.7])) == pytest.approx(0.1)


def test_start_stop_frames_integral_ts():
    # ts = 1.0 previously rounded times to -2 decimals, zeroing them
    first, last = start_stop_frames(np.array([0.0, 5.0, 123.0]),
                                    np.array([3.0, 1.0, 7.0]), 1.0)
    assert np.array_equal(first, [0, 5, 123])
    assert np.array_equal(last, [2, 5, 129])


def test_start_stop_frames():
    first, last = start_stop_frames(np.array([0.5, 1.0]),
                                    np.array([0.3, 0.1]), 0.1)
    assert np.array_equal(first, [5, 10])
    assert np.array_equal(last, [7, 10])  # inclusive ranges


def test_simulate_hyperexp_unique(rng):
    # mirrors the reference's only active statistical test
    # (tests/test_functions.py:40-45)
    x = simulate_hyperexp(1e5, [0.9, 0.09, 0.01], [5, 0.05, 0.001], rng)
    assert len(np.unique(x)) == len(x)
    assert np.all(np.diff(x) >= 0)


def test_simulate_hyperexp_moments(rng):
    w = np.array([0.7, 0.3])
    r = np.array([2.0, 0.1])
    x = simulate_hyperexp(2e5, w, r, rng)
    assert x.mean() == pytest.approx(float(np.sum(w / r)), rel=0.05)


def test_discretize_times():
    x = discretize_times(np.array([0.01, 0.149, 0.15001, 1.0]), 0.1)
    assert np.allclose(x, [0.1, 0.1, 0.2, 1.0])
    assert x.min() >= 0.1


def test_unique_rate_count():
    rng = np.random.default_rng(0)
    # two well-separated rates + one duplicate pair -> 1 unique among 3? The
    # duplicated pair overlaps mutually, so only the separated one counts.
    mc = np.stack([rng.normal(5.0, 0.01, 1000),
                   rng.normal(0.1, 0.001, 1000),
                   rng.normal(0.1, 0.001, 1000)], axis=1)
    assert unique_rate_count(3, mc) == 1
