"""Simulation-based calibration (Talts et al. 2018) of the sampler:
ranks of identifiable functionals of prior-drawn truths among posterior
draws must be uniform — a whole-posterior correctness check. The full-size
run lives in scripts/sbc.py (VALIDATION.md); this is a reduced fixed-seed
version sized for CI."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "scripts"))


@pytest.mark.slow
def test_sbc_ranks_uniform():
    from sbc import run_sbc
    pvals, ranks = run_sbc(M=32, n_events=400, ncomp=3, niter=3000,
                           g=50, burnin=500, seed=11, engine="xla",
                           progress=lambda *_: None)
    # fixed seed -> deterministic; far above any plausible failure line
    assert all(p > 0.01 for p in pvals.values()), pvals
    assert ranks.shape == (32, 4)
