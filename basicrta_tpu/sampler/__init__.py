"""Exponential-mixture Gibbs sampler (the framework's north-star workload)."""

from basicrta_tpu.sampler.kernels import (
    init_mixture_params,
    dense_sweep,
    collapsed_sweep,
    run_chain,
    run_chains,
    sample_indicator_counts,
    dedup_times,
)
__all__ = [
    "init_mixture_params",
    "dense_sweep",
    "collapsed_sweep",
    "run_chain",
    "run_chains",
    "sample_indicator_counts",
    "dedup_times",
    "Gibbs",
]

from basicrta_tpu.sampler.gibbs import Gibbs  # noqa: E402 (circular-safe)
