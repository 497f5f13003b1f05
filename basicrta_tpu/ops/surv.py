"""Survival-function and small statistical helpers (host-side numpy).

These reproduce the observable behavior of the reference's utility layer
(empirical survival function: reference util.py:116-120, 611-620, 653-660;
empirical CI: util.py:78-91; timestep decimals: util.py:508-513; frame
conversion: util.py:516-520; synthetic hyperexponential data: util.py:596-608;
error bars: util.py:94-99; degenerate-rate count: util.py:102-113) with
vectorized implementations. They are deliberately numpy, not jax: they run
once per residue on tiny data and feed plots/tests, not the device hot path.
"""

from __future__ import annotations

import numpy as np


def infer_timestep(times: np.ndarray) -> float:
    """Smallest nonzero gap between sorted residence times.

    Residence times are integer multiples of the trajectory output interval,
    so the smallest nonzero gap recovers that interval. Falls back to the
    minimum time when all values are identical (reference gibbs.py:146-153).
    """
    ts_sorted = np.sort(np.asarray(times))
    diffs = np.diff(ts_sorted)
    nonzero = diffs[diffs != 0]
    if nonzero.size:
        # diffs of a sorted array are not themselves sorted: take the
        # minimum, not the first (the first gap can be any multiple)
        return float(nonzero.min())
    return float(ts_sorted.min())


def survival_bins(x: np.ndarray, ts: float) -> np.ndarray:
    """Histogram bin edges at multiples of the timestep.

    Edges run ``ts, 2*ts, ..., (floor(max/ts)+2)*ts`` (reference
    util.py:653-660), so every discrete residence time falls in its own bin.
    """
    x = np.asarray(x)
    return np.arange(1, int(x.max() // ts) + 3) * ts


def survival_function(x: np.ndarray, ts: float):
    """Empirical survival function S(t) of residence times.

    Histogram the times on the timestep grid, cumulate, normalize, and return
    ``(t, s)`` with a leading (0, 1) point and empty bins dropped — matching
    the reference's get_s/make_surv pipeline (util.py:116-120, 611-620).
    """
    x = np.asarray(x, dtype=np.float64)
    counts, edges = np.histogram(x, bins=survival_bins(x, ts))
    nonzero = counts != 0
    t = edges[:-1][nonzero]
    y = np.cumsum(counts[nonzero]).astype(np.float64)
    t = np.insert(t, 0, 0.0)
    y = np.insert(y, 0, 0.0)
    y /= y[-1]
    return t, 1.0 - y


def empirical_ci(data: np.ndarray, percentage: float = 95.0):
    """Empirical-CDF credible interval ``[lo, hi]``.

    lo is the largest sorted value whose empirical CDF is <= (100-p)/200 and
    hi the smallest whose CDF is >= the upper quantile, falling back to the
    data range for tiny samples (reference util.py:78-91).
    """
    ds = np.sort(np.asarray(data))
    n = ds.size
    perc = np.arange(1, n + 1) / n
    lower = (100.0 - percentage) / 200.0
    upper = (percentage + (100.0 - percentage) / 2.0) / 100.0
    lo_idx = np.where(perc <= lower)[0]
    hi_idx = np.where(perc >= upper)[0]
    lo = ds[lo_idx[-1]] if lo_idx.size else ds[0]
    hi = ds[hi_idx[0]] if hi_idx.size else ds[-1]
    return [float(lo), float(hi)]


def ci_bars(tau: np.ndarray) -> np.ndarray:
    """Convert rows ``[lo, max, hi]`` into errorbar offsets
    ``[[max-lo...], [hi-max...]]`` (reference util.py:94-99)."""
    tau = np.asarray(tau)
    return np.array([tau[:, 1] - tau[:, 0], tau[:, 2] - tau[:, 1]])


def decimals_of(ts: float) -> int:
    """Rounding precision that preserves multiples of the timestep.

    The count of decimal digits for fractional timesteps (0.1 -> 1,
    0.25 -> 2) and minus the count of trailing zeros for integral ones
    (1.0 -> 0, 10.0 -> -1). The reference's get_dec (util.py:508-513)
    intends the same but mis-handles integral FLOAT timesteps
    (str(1.0) = '1.0' makes it return -2, so np.round(times, -2)
    collapses every time below 50 ns to zero); Decimal normalization
    gives the exact exponent for every representation, including
    scientific notation.
    """
    from decimal import Decimal
    return -Decimal(str(float(ts))).normalize().as_tuple().exponent


def start_stop_frames(start_times: np.ndarray, durations: np.ndarray,
                      ts: float):
    """Convert event (start time, duration) to inclusive frame ranges.

    ``first = round(start)/ts``, ``last = first + round(duration)/ts - 1``
    (reference util.py:516-520). The quotients are integers by construction
    (times are multiples of ts); we round them to the nearest integer rather
    than truncate, which avoids the reference's latent float hazard
    (e.g. 0.3/0.1 -> 2.9999... -> 2 under truncation).
    """
    dec = decimals_of(ts)
    nframes = np.rint(np.round(durations, dec) / ts).astype(np.int64)
    first = np.rint(np.round(start_times, dec) / ts).astype(np.int64)
    return first, first + nframes - 1


def simulate_hyperexp(n: int, weights, rates, rng=None,
                      sort: bool = True) -> np.ndarray:
    """Draw ``n`` samples from a hyperexponential mixture.

    Component picked by a uniform against the cumulative weights, waiting
    time by inverse-CDF of the exponential (reference util.py:596-608). Used
    to build synthetic datasets with known parameters for recovery tests.
    """
    rng = np.random.default_rng() if rng is None else rng
    weights = np.asarray(weights, dtype=np.float64)
    rates = np.asarray(rates, dtype=np.float64)
    comp = rng.choice(len(weights), size=int(n), p=weights / weights.sum())
    x = -np.log(rng.random(int(n))) / rates[comp]
    if sort:
        x.sort()
    return x


def unique_rate_count(ncomp: int, mcrates: np.ndarray) -> int:
    """Count mixture components with statistically distinct rates.

    Over the last 10% of samples, components whose mean rate falls within
    one standard deviation of another component's mean are degenerate; the
    count of non-degenerate components is returned (reference
    util.py:102-113).
    """
    tail = mcrates[len(mcrates) * 9 // 10:]
    means, stds = tail.mean(axis=0), tail.std(axis=0)
    lb, ub = means - stds, means + stds
    overlap = (means[:, None] < ub[None, :]) & (means[:, None] > lb[None, :])
    sums = overlap.sum(axis=0)
    return int(ncomp - np.count_nonzero(sums != 1))


def discretize_times(times: np.ndarray, ts: float) -> np.ndarray:
    """Snap continuous times to the timestep grid (>= ts).

    Synthetic data generators produce continuous samples; real residence
    times are integer multiples of the trajectory interval. Rounding to the
    grid makes synthetic data share the duplicate-heavy structure the
    collapsed sampler exploits.
    """
    times = np.asarray(times, dtype=np.float64)
    k = np.maximum(np.round(times / ts), 1.0)
    return k * ts
