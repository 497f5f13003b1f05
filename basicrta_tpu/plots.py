"""Plotting: per-residue posterior figures and protein-level tau maps.

Covers the reference's plotting surface (reference util.py:123-454,694-1198;
gibbs.py:383-778; cluster.py:136-155) with a leaner, non-interactive (Agg)
implementation: every function writes PNG+PDF and returns the figure.
"""

from __future__ import annotations

import ast
import json
import os
from typing import Optional

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

_TM_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                        "tm_dict.json")


def load_tm_dict(path: Optional[str] = None) -> dict:
    """TM helix ranges; reads the bundled JSON or a user tm_dict.txt in the
    reference's Python-literal format (reference util.py:403-412)."""
    if path is None:
        path = _TM_JSON
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
        d.pop("_comment", None)
        return d
    except json.JSONDecodeError:
        return ast.literal_eval(text)


def _save(fig, basename: Optional[str]):
    if basename:
        os.makedirs(os.path.dirname(basename) or ".", exist_ok=True)
        fig.savefig(f"{basename}.png", bbox_inches="tight", dpi=150)
        fig.savefig(f"{basename}.pdf", bbox_inches="tight")
    return fig


def plot_protein(residues, taus, bars, prot: Optional[str] = None,
                 label_cutoff: float = 3.0, ylim=None, scale: float = 1.0,
                 tm_path: Optional[str] = None, basename="figs/t_slow"):
    """Tau vs residue with error bars and TM-helix bars
    (reference util.py:403-454, cluster.py:136-155)."""
    from matplotlib.patches import Rectangle

    resids = np.array([int(str(r)[1:]) if str(r)[0].isalpha() else int(r)
                       for r in residues])
    taus = np.asarray(taus)
    bars = np.asarray(bars)

    fig, axs = plt.subplots(2, 1, figsize=(4 * scale, 3 * scale),
                            sharex=True,
                            gridspec_kw={"height_ratios": [8, 1]})
    axs[0].plot(resids, taus, ".", color="C0")
    axs[0].errorbar(resids, taus, yerr=bars, fmt="none", color="C0",
                    alpha=0.5)
    if taus.size:
        for ind in np.where(taus > label_cutoff * taus.mean())[0]:
            axs[0].text(resids[ind], taus[ind], str(residues[ind]))
    axs[0].set_ylabel(r"$\tau$ [ns]")
    if ylim is not None:
        axs[0].set_ylim(ylim)
    axs[1].set_xlabel("residue")
    axs[1].set_yticks([])
    if prot is not None:
        try:
            helices = load_tm_dict(tm_path)[prot]["helices"]
            for rng in helices.values():
                axs[1].add_patch(Rectangle((rng[0], 0), rng[1] - rng[0], 1,
                                           color="C0"))
            axs[1].set_xlim(axs[0].get_xlim())
        except (FileNotFoundError, KeyError):
            import warnings
            warnings.warn("TM ranges unavailable; bars not drawn")
    fig.subplots_adjust(hspace=0.05)
    return _save(fig, basename)


def plot_surv(gibbs, remove_noise=False, scale=1.0, xlim=None,
              ylim=(1e-6, 5), basename=None):
    """Survival function with per-cluster exponential components
    (reference gibbs.py:717-778)."""
    rp = gibbs.processed
    imaxs = rp.pindicator_values.max(axis=0)
    labels = np.unique(rp.labels)
    if remove_noise:
        labels = labels[imaxs[labels] >= gibbs.cfg.noise_cutoff]
    fig, ax = plt.subplots(figsize=(4 * scale, 3 * scale))
    ax.plot(gibbs.t, gibbs.s, ".", ms=3, label="data")
    for i in labels:
        w, r = gibbs.parameters[i]
        ax.plot(gibbs.t, w * np.exp(-r * gibbs.t), label=f"{i}",
                color=f"C{(i % 9) + 1}")
    ax.set_yscale("log")
    ax.set_ylim(ylim)
    if xlim:
        ax.set_xlim(xlim)
    ax.set_xlabel("$t$ [ns]")
    ax.set_ylabel("survival function $s$")
    ax.legend(title="cluster", fontsize=7)
    basename = basename or os.path.join(gibbs.savedir, "s_vs_t")
    return _save(fig, basename)


def plot_gibbs_traces(gibbs, chain=0, sparse=1, scale=1.5, basename=None):
    """Thinned weight/rate traces (reference gibbs.py:640-665)."""
    W, R = gibbs.mcweights[chain], gibbs.mcrates[chain]
    fig, ax = plt.subplots(2, figsize=(4 * scale, 3 * scale), sharex=True)
    it = np.arange(W.shape[0])[::sparse]
    for k in range(W.shape[1]):
        ax[0].plot(it, W[::sparse, k], ".", ms=2)
        ax[1].plot(it, R[::sparse, k], ".", ms=2)
    ax[0].set_yscale("log")
    ax[0].set_ylabel(r"$\pi_k$")
    ax[1].set_yscale("log")
    ax[1].set_ylabel(r"$\lambda_k$ [ns$^{-1}$]")
    ax[1].set_xlabel("sample")
    basename = basename or os.path.join(gibbs.savedir, "plot_results")
    return _save(fig, basename)


def plot_cluster_scatter(gibbs, scale=2.0, remove_noise=False,
                         basename=None):
    """Posterior (weight, rate) pairs colored by cluster — the essential
    panel of the reference's mixture_and_plot figure set
    (reference util.py:1030-1124). ``remove_noise`` drops clusters whose
    membership probability never reaches the noise cutoff
    (reference gibbs.py:310-319)."""
    rp = gibbs.processed
    labels = np.unique(rp.labels)
    if remove_noise:
        imaxs = rp.pindicator_values.max(axis=0)
        labels = labels[imaxs[labels] >= gibbs.cfg.noise_cutoff]
    fig, ax = plt.subplots(figsize=(4 * scale, 3 * scale))
    for i in labels:
        sel = rp.labels == i
        ax.plot(rp.data[sel, 1], rp.data[sel, 0], ".", ms=3,
                label=f"{i}", color=f"C{i % 10}")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel(r"$\lambda_k$ [ns$^{-1}$]")
    ax.set_ylabel(r"$\pi_k$")
    ax.legend(title="cluster", fontsize=7)
    basename = basename or os.path.join(gibbs.savedir,
                                        "weight_vs_rate_results_all")
    return _save(fig, basename)


def plot_tau_hist(gibbs, scale=1.0, basename=None):
    """Histogram of tau samples of the slowest non-noise cluster
    (reference gibbs.py:383-425)."""
    rp = gibbs.processed
    imaxs = rp.pindicator_values.max(axis=0)
    non_noise = np.where(imaxs >= gibbs.cfg.noise_cutoff)[0]
    slowest = non_noise[np.argmin(gibbs.parameters[non_noise, 1])]
    taus = 1.0 / rp.data[rp.labels == slowest, 1]
    fig, ax = plt.subplots(figsize=(4 * scale, 3 * scale))
    ax.hist(taus, bins=15, alpha=0.6, color=f"C{slowest % 10}")
    ax.set_xlabel(r"$\tau$ [ns]")
    ax.set_ylabel("count")
    basename = basename or os.path.join(gibbs.savedir, "tau_hist")
    return _save(fig, basename)


def plot_hist_results(gibbs, bins=15, scale=1.0, basename=None):
    """Posterior weight/rate/tau histograms per cluster
    (reference gibbs.py:427-638, simplified layout)."""
    rp = gibbs.processed
    fig, axs = plt.subplots(1, 3, figsize=(9 * scale, 3 * scale))
    for i in np.unique(rp.labels):
        sel = rp.labels == i
        axs[0].hist(rp.data[sel, 0], bins=bins, alpha=0.5, density=True,
                    label=f"{i}", color=f"C{i % 10}")
        axs[1].hist(rp.data[sel, 1], bins=bins, alpha=0.5, density=True,
                    color=f"C{i % 10}")
        axs[2].hist(1.0 / rp.data[sel, 1], bins=bins, alpha=0.5,
                    density=True, color=f"C{i % 10}")
    axs[0].set_xlabel(r"$\pi_k$")
    axs[1].set_xlabel(r"$\lambda_k$ [ns$^{-1}$]")
    axs[2].set_xlabel(r"$\tau$ [ns]")
    axs[0].set_ylabel("p")
    axs[0].legend(title="cluster", fontsize=7)
    basename = basename or os.path.join(gibbs.savedir, "hist_results")
    return _save(fig, basename)


def check_results_placeholder(residue, times, ts, outdir="result_check"):
    """'Results unavailable' survival plot for residues without results
    (reference util.py:488-505)."""
    from basicrta_tpu.ops.surv import survival_function
    os.makedirs(outdir, exist_ok=True)
    t, s = survival_function(np.asarray(times), ts)
    fig, ax = plt.subplots(figsize=(4, 3))
    ax.scatter(t, s, label="data", s=8)
    ax.set_xlabel("t (ns)")
    ax.set_ylabel("s")
    ax.set_title("Results unavailable")
    ax.legend()
    return _save(fig, os.path.join(outdir, f"{residue}-s-vs-t"))
