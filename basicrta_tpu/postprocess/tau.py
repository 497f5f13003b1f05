"""Cluster parameter point estimates and residence-time (tau) estimation.

Reproduces ``Gibbs._estimate_params`` (reference gibbs.py:667-689) and
``Gibbs.estimate_tau`` (gibbs.py:691-715): per-cluster point estimates are
the left edge of the tallest bin of a 20-bin log-spaced histogram; tau of the
slowest process is the midpoint of the tallest of 15 linear bins of
``1/rate`` samples of the slowest non-noise cluster, with an empirical-CDF
95% credible interval.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from basicrta_tpu.ops.surv import empirical_ci
from basicrta_tpu.postprocess.clustering import ClusterResult


class AllNoiseError(RuntimeError):
    """Raised when every cluster is classified as noise (the reference would
    raise from an empty argmin and the caller records tau = 0;
    cf. cluster.py:109-117)."""


def _log_hist_mode(samples: np.ndarray, nbins: int = 20) -> float:
    """Left edge of the tallest log-spaced histogram bin
    (reference gibbs.py:672-686)."""
    bins = np.exp(np.linspace(np.log(samples.min()), np.log(samples.max()),
                              nbins))
    hist, edges = np.histogram(samples, bins=bins)
    return float(edges[np.argmax(hist)])


def estimate_params(result: ClusterResult):
    """Per-cluster (weight, rate) point estimates and 95% CIs.

    Returns:
        params (lmode, 2): [weight, rate] modes per cluster.
        intervals (2, lmode, 2): CI bounds for weights then rates.
    """
    w, r, labels = result.data[:, 0], result.data[:, 1], result.labels
    params, wits, rits = [], [], []
    for i in range(result.lmode):
        wi, ri = w[labels == i], r[labels == i]
        if wi.size == 0:
            params.append([np.nan, np.nan])
            wits.append([np.nan, np.nan])
            rits.append([np.nan, np.nan])
            continue
        params.append([_log_hist_mode(wi), _log_hist_mode(ri)])
        wits.append(empirical_ci(wi))
        rits.append(empirical_ci(ri))
    return np.asarray(params), np.asarray([wits, rits])


def estimate_tau(result: ClusterResult, noise_cutoff: float,
                 params: Optional[np.ndarray] = None,
                 nbins: int = 15) -> Tuple[float, float, float]:
    """Posterior maximum and 95% CI of tau for the slowest process.

    The slowest process is the non-noise cluster with the smallest rate
    point estimate; its tau samples are the reciprocal rates of all posterior
    pairs assigned to it (reference gibbs.py:691-715).

    Returns:
        (ci_lo, tau_max, ci_hi)
    """
    if params is None:
        params, _ = estimate_params(result)
    imaxs = result.pindicator_values.max(axis=0)
    all_clusters = np.arange(result.lmode)
    present = np.isin(all_clusters, np.unique(result.labels))
    # candidates: clusters that (a) hold surviving pairs — empty clusters
    # carry NaN point estimates and no tau samples, (b) clear the noise
    # cutoff, and (c) have a finite rate estimate (NaN would win the argmin)
    candidates = all_clusters[present & (imaxs >= noise_cutoff)]
    candidates = candidates[np.isfinite(params[candidates, 1])]
    if candidates.size == 0:
        raise AllNoiseError("all clusters classified as noise")
    slowest = candidates[np.argmin(params[candidates, 1])]

    taus = 1.0 / result.data[result.labels == slowest, 1]
    lo, hi = empirical_ci(taus)
    hist, edges = np.histogram(taus, bins=nbins)
    imax = int(np.argmax(hist))
    val = 0.5 * (edges[imax] + edges[imax + 1])
    return float(lo), float(val), float(hi)


def estimate_tau_all(result: ClusterResult, noise_cutoff: float,
                     params: Optional[np.ndarray] = None,
                     nbins: int = 15) -> np.ndarray:
    """tau + 95% CI for EVERY non-noise cluster.

    The reference's ``estimate_tau`` declares per-cluster taus as intended
    future work (reference gibbs.py:693-698 docstring) and returns only
    the slowest process; here the same histogram-mode/empirical-CI
    estimator runs over each non-noise cluster.

    Returns:
        (C, 4) float array, one row ``[cluster, ci_lo, tau_max, ci_hi]``
        per non-noise cluster, ordered slowest process first (descending
        tau). Raises AllNoiseError when no cluster survives.
    """
    if params is None:
        params, _ = estimate_params(result)
    imaxs = result.pindicator_values.max(axis=0)
    all_clusters = np.arange(result.lmode)
    present = np.isin(all_clusters, np.unique(result.labels))
    candidates = all_clusters[present & (imaxs >= noise_cutoff)]
    candidates = candidates[np.isfinite(params[candidates, 1])]
    if candidates.size == 0:
        raise AllNoiseError("all clusters classified as noise")
    rows = []
    for c in candidates[np.argsort(params[candidates, 1])]:
        taus = 1.0 / result.data[result.labels == c, 1]
        lo, hi = empirical_ci(taus)
        hist, edges = np.histogram(taus, bins=nbins)
        imax = int(np.argmax(hist))
        rows.append([float(c), float(lo),
                     0.5 * (edges[imax] + edges[imax + 1]), float(hi)])
    return np.asarray(rows, np.float64)
