"""Tests of the all-residue driver and cross-residue tau aggregation."""

import os

import numpy as np
import pytest

from basicrta_tpu.config import GibbsConfig
from basicrta_tpu.contacts.records import ContactEvents, ContactMeta
from basicrta_tpu.ops.surv import simulate_hyperexp, discretize_times
from basicrta_tpu.protein.driver import (ParallelGibbs, ProcessProtein,
                                         cutoff_from_filename)

# ParallelGibbs/ProcessProtein over a module-scoped 2000-sweep run
# (run with -m slow)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def events():
    """Synthetic event table: two residues with different slow taus."""
    rng = np.random.default_rng(2024)
    ts = 0.1
    per_res = {
        10: discretize_times(simulate_hyperexp(
            6000, [0.8, 0.2], [3.0, 0.05], rng), ts),      # tau ~ 20
        11: discretize_times(simulate_hyperexp(
            4000, [0.9, 0.1], [4.0, 0.2], rng), ts),       # tau ~ 5
    }
    s1, s2, starts, durs = [], [], [], []
    t0 = 0.0
    for resid, times in per_res.items():
        for d in times:
            s1.append(resid)
            s2.append(100)
            starts.append(t0)
            durs.append(d)
            t0 += d + ts
    return ContactEvents(
        np.asarray(s1, np.int32), np.asarray(s2, np.int32),
        np.asarray(starts), np.asarray(durs),
        ContactMeta(ts=ts, cutoff=7.0, sel1="protein"))


@pytest.fixture(scope="module")
def protein_run(events, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("protein"))
    cfg = GibbsConfig(ncomp=5, niter=2000, g=10, burnin=500, gmm_n_init=8,
                      seed=1)
    driver = ParallelGibbs(events, cfg=cfg, root=root)
    results = driver.run()
    return root, cfg, results


def test_cutoff_from_filename():
    assert cutoff_from_filename("/a/b/contacts_7.0.npz") == 7.0
    assert cutoff_from_filename("contacts_10.0.pkl") == 10.0


def test_parallel_gibbs_taus(protein_run):
    _, _, results = protein_run
    assert set(results) == {"X10", "X11"}
    tau10 = results["X10"].tau[1]
    tau11 = results["X11"].tau[1]
    assert 14 < tau10 < 26    # truth 20
    assert 3.5 < tau11 < 6.5  # truth 5


def test_results_on_disk(protein_run):
    root, cfg, _ = protein_run
    for label in ("X10", "X11"):
        assert os.path.exists(os.path.join(
            root, "basicrta-7.0", label, f"gibbs_{cfg.niter}.npz"))


def test_process_protein(protein_run):
    root, cfg, results = protein_run
    pp = ProcessProtein(cfg=cfg, cutoff=7.0, root=root)
    found = pp.collect_results()
    assert list(found) == ["X10", "X11"]  # sorted by resid
    taus, bars = pp.get_taus()
    assert taus[0] == pytest.approx(results["X10"].tau[1], rel=1e-6)
    assert np.all(bars >= 0)

    out = pp.write_data()
    data = np.load(out)
    assert data.shape == (2, 4)
    assert data[0, 0] == 10 and data[1, 0] == 11
    assert data[0, 2] <= data[0, 1] <= data[0, 3]  # lo <= tau <= hi


def test_plot_protein(protein_run):
    root, cfg, _ = protein_run
    pp = ProcessProtein(cfg=cfg, cutoff=7.0, root=root, prot="b2ar")
    fig = pp.plot_protein()
    assert os.path.exists(os.path.join(root, "figs", "t_slow.png"))
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_b_color_structure(protein_run, tmp_path):
    from basicrta_tpu.io.topology import Topology, write_pdb
    root, cfg, results = protein_run
    names = np.array(["CA", "CA"])
    resids = np.array([10, 11], np.int32)
    resnames = np.array(["TRP", "ALA"])
    top = Topology(names, resids, resnames,
                   np.zeros((2, 3), np.float32))
    struct = write_pdb(str(tmp_path / "s.pdb"), top)
    pp = ProcessProtein(cfg=cfg, cutoff=7.0, root=root)
    out = pp.b_color_structure(struct)
    with open(out) as f:
        lines = [ln for ln in f if ln.startswith("ATOM")]
    assert len(lines) == 2
    # b-factor column holds tau (rounded)
    b10 = float(lines[0][60:66])
    assert b10 == pytest.approx(results["X10"].tau[1], abs=0.5)


def test_tiny_residue_skipped_with_sentinel(tmp_path, rng):
    """Residues with <= wcutoff-rule events get the .dataset_too_small
    sentinel instead of a result (reference scripts sentinel contract)."""
    ts = 0.1
    times = discretize_times(simulate_hyperexp(
        3000, [0.8, 0.2], [2.0, 0.1], rng), ts)
    s1 = np.concatenate([np.full(len(times), 20, np.int32),
                         np.full(4, 21, np.int32)])
    durs = np.concatenate([times, [0.1, 0.2, 0.1, 0.3]])
    ev = ContactEvents(
        s1, np.full(len(s1), 100, np.int32),
        np.arange(len(s1), dtype=float), durs,
        ContactMeta(ts=ts, cutoff=7.0))
    cfg = GibbsConfig(ncomp=4, niter=400, g=10, burnin=100, gmm_n_init=4)
    out = ParallelGibbs(ev, cfg=cfg, root=str(tmp_path)).run()
    assert set(out) == {"X20"}
    assert os.path.exists(os.path.join(
        str(tmp_path), "basicrta-7.0", "X21", ".dataset_too_small"))
    pp = ProcessProtein(cfg=cfg, cutoff=7.0, root=str(tmp_path))
    pp.collect_results()
    assert pp.missing_residues() == []  # skipped, not missing


def test_missing_residue_gets_zero_tau(protein_run):
    root, cfg, _ = protein_run
    os.makedirs(os.path.join(root, "basicrta-7.0", "G12"), exist_ok=True)
    pp = ProcessProtein(cfg=cfg, cutoff=7.0, root=root)
    pp.collect_results()
    assert pp.residues["G12"] is None
    taus, _ = pp.get_taus()
    assert taus[-1] == 0.0


def test_tau_all_clusters_table_and_plot(protein_run):
    """All-cluster tau table + stacked figure (VERDICT round 2 item 7;
    the reference declares per-cluster taus as future work,
    gibbs.py:693-698)."""
    root, cfg, results = protein_run
    pp = ProcessProtein(cfg=cfg, cutoff=7.0, root=root)
    pp.collect_results()
    tables = pp.get_taus_all()
    assert set(tables) == {"X10", "X11"}
    for label, table in tables.items():
        assert table.ndim == 2 and table.shape[1] == 4
        assert len(table) >= 1
        # slowest first; slowest row agrees with the single-tau estimate
        assert np.all(np.diff(table[:, 2]) <= 1e-9)
        assert table[0, 2] == pytest.approx(results[label].tau[1],
                                            rel=1e-6)
    out = pp.write_data(all_clusters=True)
    allp = out[:-4] + "_all.npy"
    assert os.path.exists(allp)
    rows = np.load(allp)
    assert rows.shape[1] == 5
    assert set(rows[:, 0]) == {10.0, 11.0}
    fig = pp.plot_taus_all()
    assert os.path.exists(os.path.join(root, "figs", "tau_clusters.png"))
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_protein_diagnostics_table(protein_run):
    """cluster --diagnostics surface: per-residue split-R-hat/ESS table,
    persisted with flagging thresholds."""
    root, cfg, _ = protein_run
    pp = ProcessProtein(cfg=cfg, cutoff=7.0, root=root)
    labels, rows = pp.diagnostics_table()
    assert labels == ["X10", "X11"]
    assert rows.shape == (2, 2)
    assert np.all(rows[:, 0] >= 1.0)      # R-hat >= 1 by construction
    assert np.all(rows[:, 1] > 0)         # ESS positive
    path, flagged = pp.write_diagnostics()
    z = np.load(path)
    assert list(z["labels"]) == labels
    assert np.allclose(z["max_rhat"], rows[:, 0])
    assert np.allclose(z["min_ess"], rows[:, 1])
    # absurd thresholds flag everything / nothing
    _, all_flagged = pp.write_diagnostics(rhat_warn=0.0)
    assert sorted(all_flagged) == sorted(labels)
    _, none_flagged = pp.write_diagnostics(rhat_warn=1e9, ess_warn=0.0)
    assert none_flagged == []
