"""Smoke tests of the plotting surface (figures written, sane content)."""

import os

import matplotlib.pyplot as plt
import numpy as np
import pytest

from basicrta_tpu.config import GibbsConfig
from basicrta_tpu.ops.surv import simulate_hyperexp, discretize_times
from basicrta_tpu.sampler.gibbs import Gibbs

# figure surface over a module-scoped full Gibbs run (run with -m slow)
pytestmark = pytest.mark.slow


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


def test_mixture_and_plot_families(fitted):
    """Every train/validate/all figure family is written
    (reference util.py:694-1198 parity)."""
    g = fitted
    all_labels, presorts = g.mixture_and_plot()
    assert len(all_labels) == len(g.processed.labels)
    assert presorts is not None
    for subset in ("train", "validate", "all"):
        for fam in ("combined_results", "result_hist", "weight_results",
                    "rate_results", "weight_vs_rate_results"):
            for ext in ("png", "pdf"):
                path = os.path.join(g.savedir, f"{fam}_{subset}.{ext}")
                assert os.path.exists(path), path
    # noise-removed variant writes the _noiserm set
    g.mixture_and_plot(remove_noise=True)
    assert os.path.exists(os.path.join(
        g.savedir, "combined_results_all_noiserm.png"))


def test_residue_plot_family(fitted):
    g = fitted
    from basicrta_tpu.plots import (all_post_hist, make_residue_plots,
                                    plot_post, plot_r_vs_w)
    make_residue_plots(g)
    K = len(np.unique(g.processed.labels))
    Kc = g.cfg.ncomp   # traces show every chain column
    figdir = os.path.join(g.savedir, "figs")
    for fam in (f"k{K}-ml_results", f"k{K}-mean_results",
                f"k{Kc}-trace_weights", f"k{Kc}-trace_rates",
                f"k{K}-posterior_weights_comp-0"):
        assert os.path.exists(os.path.join(figdir, f"{fam}.png")), fam
    all_post_hist(g)
    assert os.path.exists(os.path.join(
        figdir, f"k{K}-posterior_rates_comp-all.png"))
    plot_post(g, "rates", comp=[0])
    assert os.path.exists(os.path.join(
        figdir, f"k{K}-posterior_rates_comps-0.png"))
    plot_r_vs_w(g)
    assert os.path.exists(os.path.join(figdir, "r_vs_w.png"))
    plt.close("all")


def test_collect_n_plot(fitted):
    g = fitted
    g.save()
    from basicrta_tpu.plots import collect_n_plot
    done = collect_n_plot(cutoff=g.cutoff, niter=g.cfg.niter, root=g.root)
    assert done == ["W9"]
    # resid filter excludes everything else
    assert collect_n_plot(resids=[1], cutoff=g.cutoff, niter=g.cfg.niter,
                          root=g.root) == []
    plt.close("all")


def test_plot_hists(fitted, tmp_path, monkeypatch):
    from basicrta_tpu.plots import plot_hists
    monkeypatch.chdir(tmp_path)
    g = fitted
    pind = g.pindicator_per_event()       # (N, lmode)
    figs = plot_hists([g.times], [pind.T], ["W9"])
    plt.close("all")
    assert len(figs) == 1
    lmode = g.processed.lmode
    assert os.path.exists(f"result_check/W9_hists_{lmode}.png")
    assert os.path.exists(f"result_check/W9_hists_{lmode}.pdf")


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