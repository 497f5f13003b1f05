"""Convergence diagnostics (split-R-hat, bulk ESS) — a multi-chain
capability upgrade over the reference's single undiagnosed chain
(reference gibbs.py:191)."""

import numpy as np
import pytest

from basicrta_tpu.ops.diagnostics import (convergence_report,
                                          effective_sample_size, split_rhat)


class TestSplitRhat:
    def test_mixed_chains_near_one(self, rng):
        x = rng.normal(0.0, 1.0, (4, 500, 3))
        r = split_rhat(x)
        assert r.shape == (3,)
        assert np.all(r < 1.02)

    def test_shifted_chain_detected(self, rng):
        x = rng.normal(0.0, 1.0, (4, 500))
        x[0] += 5.0  # one chain stuck elsewhere
        assert split_rhat(x) > 1.5

    def test_within_chain_drift_detected_single_chain(self, rng):
        # the split halves turn a one-chain trend into a between-"chain"
        # discrepancy
        x = (np.linspace(0.0, 4.0, 600)
             + rng.normal(0.0, 0.1, 600))[None, :]
        assert split_rhat(x) > 1.5

    def test_constant_parameter_is_converged(self):
        x = np.ones((2, 100, 2))
        np.testing.assert_allclose(split_rhat(x), 1.0)

    def test_too_few_draws_raises(self, rng):
        with pytest.raises(ValueError):
            split_rhat(rng.normal(size=(2, 3)))


class TestEffectiveSampleSize:
    def test_iid_ess_near_total(self, rng):
        x = rng.normal(size=(4, 500))
        ess = effective_sample_size(x)
        assert 0.5 * 2000 < ess <= 2000

    def test_ar1_matches_theory(self, rng):
        rho = 0.9
        C, S = 4, 4000
        x = np.empty((C, S))
        x[:, 0] = rng.normal(size=C)
        eps = rng.normal(size=(C, S)) * np.sqrt(1 - rho ** 2)
        for t in range(1, S):
            x[:, t] = rho * x[:, t - 1] + eps[:, t]
        ess = effective_sample_size(x)
        expect = C * S * (1 - rho) / (1 + rho)  # ~ N / 19
        assert 0.5 * expect < ess < 2.0 * expect

    def test_vectorized_over_parameters(self, rng):
        x = rng.normal(size=(2, 300, 4, 5))
        assert effective_sample_size(x).shape == (4, 5)


class TestConvergenceReport:
    def test_report_keys_and_live_filter(self, rng):
        C, S, K = 3, 400, 6
        W = np.abs(rng.normal(0.2, 0.01, (C, S, K)))
        W[..., 3:] = 1e-9           # dead components
        R = np.abs(rng.normal(1.0, 0.05, (C, S, K)))
        rep = convergence_report(W, R, burnin_samples=50, wcutoff=1e-3)
        assert rep["rhat_weights"].shape == (3,)  # only live components
        assert rep["max_rhat"] < 1.05
        assert rep["min_ess"] > 100

    @pytest.mark.slow
    def test_gibbs_method(self, rng):
        from basicrta_tpu.config import GibbsConfig
        from basicrta_tpu.ops.surv import (discretize_times,
                                           simulate_hyperexp)
        from basicrta_tpu.sampler.gibbs import Gibbs

        x = discretize_times(simulate_hyperexp(
            2000, [0.8, 0.2], [2.0, 0.1], rng), 0.1)
        cfg = GibbsConfig(ncomp=4, niter=2000, g=10, burnin=400, n_chains=2,
                          seed=5)
        g = Gibbs(x, residue="T42", cutoff=7.0, cfg=cfg).run(save=False)
        rep = g.diagnostics()
        assert np.isfinite(rep["max_rhat"]) and np.isfinite(rep["min_ess"])
        # the dominant component must be well mixed on this easy problem;
        # near-dead components may legitimately flag as unconverged in a
        # short run — that is the diagnostic doing its job
        b = cfg.burnin_samples
        dom = g.mcweights[:, b:].mean(axis=(0, 1)).argmax()
        live = (g.mcweights[:, b:].mean(axis=(0, 1))
                > cfg.wcutoff(len(g.times)))
        dom_live = int(np.where(live)[0].tolist().index(int(dom)))
        assert rep["rhat_weights"][dom_live] < 1.2
        assert rep["ess_weights"][dom_live] > 30
