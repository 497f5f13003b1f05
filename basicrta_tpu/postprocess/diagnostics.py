"""MCMC convergence diagnostics over parallel chains.

The reference runs a single chain per residue (gibbs.py:191) and has no
convergence checks; running many chains per residue is nearly free on TPU
(extra batch lanes), so split-R-hat and effective sample size come with it
(Vehtari et al. 2021, "Rank-normalization, folding, and localization: an
improved R-hat").
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def split_rhat(samples: np.ndarray) -> np.ndarray:
    """Split-R-hat per parameter.

    Args:
        samples: (chains, draws, ...params).
    Returns:
        R-hat with shape (...params); values near 1 indicate convergence.
    """
    s = np.asarray(samples, np.float64)
    c, n = s.shape[:2]
    half = n // 2
    s = np.concatenate([s[:, :half], s[:, half:2 * half]], axis=0)
    m, n = s.shape[:2]
    chain_mean = s.mean(axis=1)                      # (m, ...)
    chain_var = s.var(axis=1, ddof=1)                # (m, ...)
    B = n * chain_mean.var(axis=0, ddof=1)
    W = chain_var.mean(axis=0)
    var_hat = (n - 1) / n * W + B / n
    with np.errstate(divide="ignore", invalid="ignore"):
        rhat = np.sqrt(var_hat / W)
    return np.where(W > 0, rhat, 1.0)


def effective_sample_size(samples: np.ndarray, max_lag: int = 100
                          ) -> np.ndarray:
    """Bulk effective sample size per parameter via autocorrelation sums
    (Geyer initial monotone sequence, truncated at ``max_lag``)."""
    s = np.asarray(samples, np.float64)
    c, n = s.shape[:2]
    flatshape = s.shape[2:]
    s = s.reshape(c, n, -1)
    ess = np.empty(s.shape[-1])
    for p in range(s.shape[-1]):
        x = s[:, :, p]
        x = x - x.mean(axis=1, keepdims=True)
        denom = np.mean(np.sum(x * x, axis=1) / n)
        if denom == 0:
            ess[p] = c * n
            continue
        rho_sum = 0.0
        prev = 1.0
        for lag in range(1, min(max_lag, n - 1)):
            rho = np.mean(np.sum(x[:, lag:] * x[:, :-lag], axis=1) / n)
            rho /= denom
            if rho + prev < 0:
                break
            rho_sum += rho
            prev = rho
        ess[p] = c * n / (1.0 + 2.0 * rho_sum)
    return ess.reshape(flatshape)


def chain_report(mcweights: np.ndarray, mcrates: np.ndarray,
                 burnin_samples: int = 0) -> Dict[str, np.ndarray]:
    """Convenience report for a residue's (chains, S, K) samples."""
    W = mcweights[:, burnin_samples:]
    R = mcrates[:, burnin_samples:]
    return {
        "rhat_weights": split_rhat(W),
        "rhat_rates": split_rhat(R),
        "ess_weights": effective_sample_size(W),
        "ess_rates": effective_sample_size(R),
    }
