"""End-to-end parameter-recovery tests.

This is the test spine the reference intended but left commented out
(reference tests/test_functions.py:6-38): simulate a hyperexponential with
known (weights, rates), run the sampler, and assert the truth is recovered
within posterior credible intervals.
"""

import numpy as np
import pytest

from basicrta_tpu.config import GibbsConfig
from basicrta_tpu.ops.surv import simulate_hyperexp, discretize_times
from basicrta_tpu.sampler.gibbs import Gibbs, run_residue

# full sampling pipeline on a module-scoped 190s fixture (run with -m slow)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    rng = np.random.default_rng(77)
    x = simulate_hyperexp(30000, [0.85, 0.13, 0.02], [4.0, 0.2, 0.01], rng)
    x = discretize_times(x, 0.1)
    cfg = GibbsConfig(ncomp=8, niter=4000, g=10, burnin=1000, gmm_n_init=17,
                      seed=3)
    root = tmp_path_factory.mktemp("gibbs")
    return run_residue(x, "W313", 7.0, cfg, root=str(root)), x


def test_recovery_within_ci(fitted):
    g, _ = fitted
    # slowest true process: rate 0.01 -> tau 100 ns (discretization shifts
    # the effective tau slightly; CI must cover a widened window)
    lo, tau, hi = g.tau
    assert lo < hi
    assert 80 < tau < 130
    assert lo < 110 and hi > 95


def test_recovery_parameters(fitted):
    g, _ = fitted
    # dominant cluster (label 0 = fastest non-noise) matches (0.85, 4.0)
    p = g.parameters
    assert p[0, 0] == pytest.approx(0.85, rel=0.1)
    assert p[0, 1] == pytest.approx(4.0, rel=0.25)
    # number of non-noise clusters equals the true component count
    imaxs = g.processed.pindicator_values.max(axis=0)
    assert np.count_nonzero(imaxs >= g.cfg.noise_cutoff) == 3


def test_pindicator_rows_stochastic(fitted):
    g, _ = fitted
    pv = g.processed.pindicator_values
    assert np.allclose(pv.sum(axis=1), 1.0, atol=1e-5)
    pe = g.pindicator_per_event()
    assert pe.shape == (len(g.times), g.processed.lmode)
    # long residence times must belong to the slowest non-noise cluster
    imaxs = pv.max(axis=0)
    non_noise = np.where(imaxs >= g.cfg.noise_cutoff)[0]
    slowest = non_noise[-1]  # labels sorted by decreasing rate
    longest_event = np.argmax(g.times)
    assert pe[longest_event].argmax() == slowest


def test_save_load_roundtrip(fitted, tmp_path):
    g, _ = fitted
    g.root = str(tmp_path)
    path = g.save()
    g2 = Gibbs.load(path)
    assert g2.processed.lmode == g.processed.lmode
    assert np.allclose(g2.mcweights, g.mcweights)
    assert np.allclose(g2.parameters, g.parameters)
    assert np.allclose(np.asarray(g2.tau), np.asarray(g.tau))
    assert g2.residue == "W313" and g2.cutoff == 7.0
    # bak rotation on re-save (reference gibbs.py:343-344)
    g2.root = str(tmp_path)
    g2.save()
    import os
    assert os.path.exists(path + ".bak")


def test_survival_attributes(fitted):
    g, _ = fitted
    assert g.t[0] == 0.0 and g.s[0] == 1.0
    assert np.all(np.diff(g.s) <= 0)
