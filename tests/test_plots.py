"""Smoke tests of the plotting surface (figures written, sane content)."""

import os

import matplotlib.pyplot as plt
import numpy as np
import pytest

from basicrta_tpu.config import GibbsConfig
from basicrta_tpu.ops.surv import simulate_hyperexp, discretize_times
from basicrta_tpu.sampler.gibbs import Gibbs


@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    rng = np.random.default_rng(13)
    x = discretize_times(simulate_hyperexp(
        8000, [0.85, 0.15], [3.0, 0.1], rng), 0.1)
    cfg = GibbsConfig(ncomp=4, niter=1500, g=10, burnin=500, gmm_n_init=6,
                      seed=5)
    root = str(tmp_path_factory.mktemp("plots"))
    g = Gibbs(x, residue="W9", cutoff=7.0, cfg=cfg, root=root)
    g.run(save=False)
    g.process_gibbs(save=False)
    os.makedirs(g.savedir, exist_ok=True)
    return g


def test_gibbs_plot_methods(fitted):
    g = fitted
    for method, outfile in [(g.plot_surv, "s_vs_t.png"),
                            (g.plot_gibbs, "plot_results.png"),
                            (g.plot_hist, "hist_results.png"),
                            (g.plot_tau_hist, "tau_hist.png"),
                            (g.result_plot,
                             "weight_vs_rate_results_all.png")]:
        fig = method()
        plt.close(fig)
        assert os.path.exists(os.path.join(g.savedir, outfile))


def test_cluster_reprocess(fitted):
    g = fitted
    lmode_before = g.processed.lmode
    g.cluster(gmm_n_init=4)
    assert g.processed.lmode in (lmode_before, lmode_before - 1,
                                 lmode_before + 1)
    assert g.cfg.gmm_n_init == 4


def test_tm_dict_loader(tmp_path):
    from basicrta_tpu.plots import load_tm_dict
    d = load_tm_dict()
    assert "b2ar" in d and "tm1" in d["b2ar"]["helices"]
    # reference literal format also parses (util.py:403-412)
    p = tmp_path / "tm_dict.txt"
    p.write_text("{'x': {'helices': {'tm1': [1, 5]}}}")
    d2 = load_tm_dict(str(p))
    assert d2["x"]["helices"]["tm1"] == [1, 5]


def test_check_results_placeholder(tmp_path, rng, monkeypatch):
    from basicrta_tpu.plots import check_results_placeholder
    monkeypatch.chdir(tmp_path)
    fig = check_results_placeholder("W5", rng.exponential(1.0, 100) + 0.1,
                                    0.1)
    plt.close(fig)
    assert os.path.exists("result_check/W5-s-vs-t.png")