"""Edge-case regressions for posterior post-processing.

Covers empty GMM clusters (possible whenever predict assigns nothing to a
component): parameter estimation yields NaN rows for them, label sorting and
tau estimation must index clusters by *value* and skip the NaN rows instead
of letting NaN win the slowest-rate argmin (reference gibbs.py:691-715
semantics for the populated-cluster case).
"""

import numpy as np
import pytest

from basicrta_tpu.postprocess.clustering import (ClusterResult,
                                                 sort_labels_by_rate)
from basicrta_tpu.postprocess.tau import (AllNoiseError, estimate_params,
                                          estimate_tau)


def _result_with_empty_cluster():
    """3 clusters declared, cluster 1 empty; cluster 0 fast, cluster 2 slow."""
    rng = np.random.default_rng(7)
    w = rng.uniform(0.1, 0.9, 40)
    r = np.concatenate([rng.uniform(5.0, 8.0, 20),     # fast cluster 0
                        rng.uniform(0.01, 0.02, 20)])  # slow cluster 2
    labels = np.array([0] * 20 + [2] * 20, np.int32)
    data = np.stack([w, r], axis=1)
    # membership: columns 0 and 2 confident somewhere, column 1 never
    pind = np.zeros((10, 3))
    pind[:5, 0] = 0.9
    pind[5:, 2] = 0.8
    pind[:, 1] = 0.05
    return ClusterResult(lmode=3, labels=labels,
                         inds=(np.arange(40), np.zeros(40, np.int64)),
                         data=data, pindicator_values=pind)


class TestEmptyClusterHandling:
    def test_estimate_params_nan_rows(self):
        params, intervals = estimate_params(_result_with_empty_cluster())
        assert params.shape == (3, 2)
        assert np.isnan(params[1]).all()
        assert np.isfinite(params[[0, 2]]).all()

    def test_estimate_tau_skips_nan_cluster(self):
        res = _result_with_empty_cluster()
        lo, tau, hi = estimate_tau(res, noise_cutoff=0.4)
        # slowest populated non-noise cluster is 2 (rates ~0.01-0.02)
        assert 1.0 / 0.02 <= tau <= 1.0 / 0.01
        assert lo <= tau <= hi
        assert np.isfinite([lo, tau, hi]).all()

    def test_estimate_tau_all_noise_raises(self):
        res = _result_with_empty_cluster()
        res.pindicator_values = res.pindicator_values * 0.1  # all below 0.4
        with pytest.raises(AllNoiseError):
            estimate_tau(res, noise_cutoff=0.4)

    def test_sort_labels_treats_empty_as_noise(self):
        res = sort_labels_by_rate(_result_with_empty_cluster(),
                                  noise_cutoff=0.4)
        # populated clusters sorted by decreasing rate: old 0 (fast) -> 0,
        # old 2 (slow) -> 1; empty cluster 1 lands last as noise
        assert res.presorts.tolist() == [0, 2, 1]
        assert set(np.unique(res.labels)) == {0, 1}
        rates = res.data[:, 1]
        assert rates[res.labels == 0].mean() > rates[res.labels == 1].mean()
        # pindicator columns permuted consistently
        assert res.pindicator_values[:, 2].max() == pytest.approx(0.05)

    def test_sort_labels_unchanged_for_full_clusters(self):
        """The common case (every cluster populated) keeps the reference
        ordering semantics: non-noise by decreasing mean rate, noise last."""
        rng = np.random.default_rng(3)
        labels = np.array([0] * 10 + [1] * 10 + [2] * 10, np.int32)
        rates = np.concatenate([rng.uniform(0.01, 0.02, 10),
                                rng.uniform(5.0, 8.0, 10),
                                rng.uniform(0.5, 0.7, 10)])
        data = np.stack([np.full(30, 0.3), rates], axis=1)
        pind = np.zeros((6, 3))
        pind[:2, 0] = 0.9
        pind[2:4, 1] = 0.9
        pind[4:, 2] = 0.2   # cluster 2 is noise
        res = ClusterResult(lmode=3, labels=labels,
                            inds=(np.arange(30), np.zeros(30, np.int64)),
                            data=data, pindicator_values=pind)
        res = sort_labels_by_rate(res, noise_cutoff=0.4)
        assert res.presorts.tolist() == [1, 0, 2]


class TestTauAllClusters:
    def test_rows_and_order(self):
        from basicrta_tpu.postprocess.tau import estimate_tau_all
        res = _result_with_empty_cluster()
        table = estimate_tau_all(res, noise_cutoff=0.4)
        # clusters 0 (fast) and 2 (slow) survive; slowest first
        assert table.shape == (2, 4)
        assert list(table[:, 0]) == [2.0, 0.0]
        assert 1.0 / 0.02 <= table[0, 2] <= 1.0 / 0.01
        assert 1.0 / 8.0 <= table[1, 2] <= 1.0 / 5.0
        for _, lo, tau, hi in table:
            assert lo <= tau <= hi
        # the slowest row must agree with estimate_tau
        lo, tau, hi = estimate_tau(res, noise_cutoff=0.4)
        assert table[0, 1:].tolist() == [lo, tau, hi]

    def test_all_noise_raises(self):
        from basicrta_tpu.postprocess.tau import estimate_tau_all
        res = _result_with_empty_cluster()
        res.pindicator_values = res.pindicator_values * 0.1
        with pytest.raises(AllNoiseError):
            estimate_tau_all(res, noise_cutoff=0.4)
