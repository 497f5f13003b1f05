"""MCMC convergence diagnostics (compatibility surface).

Canonical implementations live in :mod:`basicrta_tpu.ops.diagnostics`
(FFT autocovariance ESS, split-R-hat with split-halved chains, and the
wcutoff-aware ``convergence_report`` used by ``Gibbs.diagnostics()`` and
the CLI). This module re-exports them plus the original ``chain_report``
convenience wrapper.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from basicrta_tpu.ops.diagnostics import (convergence_report,  # noqa: F401
                                          effective_sample_size,
                                          split_rhat)

__all__ = ["split_rhat", "effective_sample_size", "convergence_report",
           "chain_report"]


def chain_report(mcweights: np.ndarray, mcrates: np.ndarray,
                 burnin_samples: int = 0) -> Dict[str, np.ndarray]:
    """Per-component R-hat/ESS for a residue's (chains, S, K) samples."""
    W = np.asarray(mcweights)[:, burnin_samples:]
    R = np.asarray(mcrates)[:, burnin_samples:]
    return {
        "rhat_weights": split_rhat(W),
        "rhat_rates": split_rhat(R),
        "ess_weights": effective_sample_size(W),
        "ess_rates": effective_sample_size(R),
    }
