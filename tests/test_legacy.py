"""Importers for the reference package's pickled artifacts (io.legacy).

Real reference pickles require basicrta + MDAnalysis to unpickle; these
tests fabricate byte-identical pickle structures (same module paths, same
dtype-metadata layout, reference contacts.py:79-94 / gibbs.py:336-349)
with throwaway stand-in modules, then REMOVE those modules so the loaders
must succeed without any legacy package importable — exactly the migration
scenario.
"""

import pickle
import sys
import types

import numpy as np
import pytest

from basicrta_tpu.contacts.records import ContactEvents, ContactRecords
from basicrta_tpu.io.legacy import (load_reference_contacts,
                                    load_reference_gibbs,
                                    load_reference_pickle)


def _fake_modules():
    """Install throwaway basicrta/MDAnalysis modules for pickling."""
    mods = {}
    basicrta = types.ModuleType("basicrta")
    gibbs_mod = types.ModuleType("basicrta.gibbs")

    class Gibbs:
        pass

    class Results:
        pass

    gibbs_mod.Gibbs = Gibbs
    gibbs_mod.Results = Results
    Gibbs.__module__ = Results.__module__ = "basicrta.gibbs"
    Gibbs.__qualname__, Results.__qualname__ = "Gibbs", "Results"
    basicrta.gibbs = gibbs_mod

    mda = types.ModuleType("MDAnalysis")
    groups = types.ModuleType("MDAnalysis.core.groups")

    class AtomGroup:
        def __init__(self, tag):
            self.tag = tag

    groups.AtomGroup = AtomGroup
    AtomGroup.__module__ = "MDAnalysis.core.groups"
    AtomGroup.__qualname__ = "AtomGroup"
    core = types.ModuleType("MDAnalysis.core")
    core.groups = groups
    mda.core = core

    mods = {"basicrta": basicrta, "basicrta.gibbs": gibbs_mod,
            "MDAnalysis": mda, "MDAnalysis.core": core,
            "MDAnalysis.core.groups": groups}
    sys.modules.update(mods)
    return mods, Gibbs, Results, AtomGroup


def _cleanup(mods):
    for name in mods:
        sys.modules.pop(name, None)


def _pickle_and_forget(obj, path):
    data = pickle.dumps(obj, protocol=5)
    with open(path, "wb") as f:
        f.write(data)


class TestReferenceContacts:
    def _write(self, tmp_path, ncols):
        mods, _, _, AtomGroup = _fake_modules()
        try:
            dtype = np.dtype(np.float64, metadata={
                "top": "top.gro", "traj": "traj.xtc",
                "ag1": AtomGroup("p"), "ag2": AtomGroup("l"),
                "ts": 0.1, "cutoff": 10.0})
            if ncols == 5:
                rows = np.array([[0, 1, 9, 3.5, 0.0],
                                 [1, 1, 9, 2.0, 0.1],
                                 [4, 2, 9, 6.0, 0.4]])
            else:
                rows = np.array([[1, 9, 0.0, 0.2],
                                 [2, 9, 0.4, 0.1]])
            arr = rows.astype(dtype)
            p = str(tmp_path / f"contacts_{ncols}.pkl")
            _pickle_and_forget(arr, p)
        finally:
            _cleanup(mods)
        return p

    def test_primary_map(self, tmp_path):
        p = self._write(tmp_path, 5)
        rec = load_reference_contacts(p)
        assert isinstance(rec, ContactRecords)
        assert rec.meta.ts == pytest.approx(0.1)
        assert rec.meta.cutoff == pytest.approx(10.0)
        assert rec.meta.top == "top.gro"
        np.testing.assert_array_equal(rec.frames, [0, 1, 4])
        np.testing.assert_array_equal(rec.sel1_resids, [1, 1, 2])
        np.testing.assert_allclose(rec.min_dist, [3.5, 2.0, 6.0])

    def test_event_table_feeds_sampler(self, tmp_path):
        p = self._write(tmp_path, 4)
        ev = load_reference_contacts(p)
        assert isinstance(ev, ContactEvents)
        np.testing.assert_allclose(ev.times_for_residue(1), [0.2])
        np.testing.assert_allclose(ev.durations, [0.2, 0.1])

    def test_blocked_class_refused(self, tmp_path):
        p = str(tmp_path / "evil.pkl")
        with open(p, "wb") as f:
            pickle.dump({"x": pickle.dumps}, f)  # a pickle module function
        with pytest.raises(pickle.UnpicklingError):
            load_reference_pickle(p)


class TestReferenceGibbs:
    def test_roundtrip_and_process(self, tmp_path, rng):
        mods, Gibbs_ref, Results, _ = _fake_modules()
        try:
            S, K = 60, 5
            g = Gibbs_ref()
            g.times = np.round(rng.exponential(1.0, 3000), 1) + 0.1
            g.residue = "W313"
            g.ncomp, g.niter, g.g, g.burnin = K, (S - 1) * 10, 10, 100
            g.cutoff = 7.0
            g.ts = 0.1
            W = rng.dirichlet(np.ones(K), S)
            g.mcweights = W
            g.mcrates = rng.gamma(2.0, 1.0, (S, K))
            g.processed_results = Results()
            p = str(tmp_path / "gibbs_590.pkl")
            _pickle_and_forget(g, p)
        finally:
            _cleanup(mods)

        ours = load_reference_gibbs(p, root=str(tmp_path))
        assert ours.residue == "W313"
        assert ours.cfg.ncomp == K and ours.cfg.g == 10
        assert ours.mcweights.shape == (1, S, K)
        np.testing.assert_allclose(ours.mcweights[0], W)
        # the imported chain drives the full device post-processing
        ours.process_gibbs(save=False)
        assert ours.processed is not None
        assert ours.parameters.shape[1] == 2


def test_parallel_gibbs_accepts_reference_pickle(tmp_path, rng):
    """The driver consumes a reference contacts_{cutoff}.pkl directly."""
    from basicrta_tpu.protein.driver import ParallelGibbs

    mods, _, _, AtomGroup = _fake_modules()
    try:
        dtype = np.dtype(np.float64, metadata={
            "top": "top.gro", "traj": "traj.xtc",
            "ag1": AtomGroup("p"), "ag2": AtomGroup("l"),
            "ts": 0.1, "cutoff": 7.0})
        rows = np.stack([
            np.repeat([5, 8], 20),                      # sel1 resids
            np.full(40, 900),                           # sel2 resid
            np.arange(40, dtype=float),                 # start times
            np.round(rng.exponential(0.5, 40), 1) + .1  # durations
        ], axis=1)
        p = str(tmp_path / "contacts_7.0.pkl")
        _pickle_and_forget(rows.astype(dtype), p)
    finally:
        _cleanup(mods)

    pg = ParallelGibbs(p, root=str(tmp_path))
    assert pg.cutoff == pytest.approx(7.0)
    assert len(pg.events.times_for_residue(5)) == 20


@pytest.mark.slow
def test_process_protein_over_reference_tree(tmp_path, rng):
    """A reference-package results tree (per-residue gibbs_{niter}.pkl)
    drives ProcessProtein collect/reprocess/get_taus unchanged."""
    from basicrta_tpu.config import GibbsConfig
    from basicrta_tpu.protein.driver import ProcessProtein

    S, K = 60, 5
    mods, Gibbs_ref, Results, _ = _fake_modules()
    try:
        for label in ("W5", "L8"):
            g = Gibbs_ref()
            g.times = np.round(rng.exponential(1.0, 2000), 1) + 0.1
            g.residue = label
            g.ncomp, g.niter, g.g, g.burnin = K, (S - 1) * 10, 10, 100
            g.cutoff = 7.0
            g.ts = 0.1
            g.mcweights = rng.dirichlet(np.ones(K), S)
            g.mcrates = rng.gamma(2.0, 1.0, (S, K))
            g.processed_results = Results()
            d = tmp_path / "basicrta-7.0" / label
            d.mkdir(parents=True)
            _pickle_and_forget(g, str(d / "gibbs_590.pkl"))
    finally:
        _cleanup(mods)

    pp = ProcessProtein(cfg=GibbsConfig(ncomp=K, niter=590, g=10,
                                        burnin=100, gmm_n_init=8),
                        cutoff=7.0, root=str(tmp_path))
    found = pp.collect_results()
    assert all(p is not None and p.endswith(".pkl") for p in found.values())
    pp.reprocess()
    taus, bars = pp.get_taus()
    assert taus.shape == (2,) and np.all(np.isfinite(taus))


def test_builtins_gadgets_refused(tmp_path):
    """builtins callables (eval/exec/getattr...) must NOT resolve — the
    classic pickle code-execution gadgets."""
    import pickletools  # noqa: F401  (documentation of intent)

    class Evil:
        def __reduce__(self):
            return (eval, ("1+1",))

    p = str(tmp_path / "gadget.pkl")
    with open(p, "wb") as f:
        pickle.dump(Evil(), f)
    with pytest.raises(pickle.UnpicklingError):
        load_reference_pickle(p)


def test_numpy_gadgets_refused(tmp_path):
    """Top-level numpy callables (numpy.save = arbitrary file write,
    numpy.fromfile) and dotted attribute paths must NOT resolve — only
    the exact array-reconstruction pairs are allowlisted."""
    for target in ((np.save, (str(tmp_path / "pwned.npy"), [1])),
                   (np.fromfile, (str(tmp_path / "x"),))):
        class Evil:
            def __reduce__(self, _t=target):
                return _t

        p = str(tmp_path / "np_gadget.pkl")
        with open(p, "wb") as f:
            pickle.dump(Evil(), f)
        with pytest.raises(pickle.UnpicklingError):
            load_reference_pickle(p)
        assert not (tmp_path / "pwned.npy").exists()

    # protocol-4 dotted-name resolution (module attr chains) is refused:
    # craft PROTO 4; SHORT_BINUNICODE x2; STACK_GLOBAL; EMPTY_TUPLE;
    # REDUCE; STOP by hand (pickle.dumps never emits dotted names itself)
    def short_unicode(s):
        b = s.encode()
        return b"\x8c" + bytes([len(b)]) + b

    evil = (b"\x80\x04" + short_unicode("numpy")
            + short_unicode("random.default_rng")
            + b"\x93" + b")" + b"R" + b".")
    p2 = str(tmp_path / "dotted.pkl")
    with open(p2, "wb") as f:
        f.write(evil)
    with pytest.raises(pickle.UnpicklingError):
        load_reference_pickle(p2)
