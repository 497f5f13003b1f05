"""Tests of kinetic mapping and weighted densities."""

import os

import numpy as np
import pytest

from basicrta_tpu.io.dx import read_dx, write_dx
from basicrta_tpu.kinetics.density import (Density, WDensity,
                                           weighted_histogram_3d,
                                           fixedwidth_bins)


class TestDX:
    def test_roundtrip(self, tmp_path, rng):
        grid = rng.uniform(0, 1, (5, 6, 7))
        p = write_dx(str(tmp_path / "g.dx"), grid, origin=[1.0, 2.0, 3.0],
                     delta=1.0)
        g2, origin, delta = read_dx(p)
        assert np.allclose(g2, grid, atol=1e-9)
        assert np.allclose(origin, [1.0, 2.0, 3.0])
        assert np.allclose(delta, 1.0)


class TestWeightedHistogram:
    def test_matches_histogramdd(self, rng):
        """Cross-check against the reference's numpy histogramdd loop
        (reference pwdensity.py:257-264 semantics)."""
        F, A, K = 20, 30, 3
        pos = rng.uniform(0, 40, (F, A, 3)).astype(np.float32)
        w = rng.uniform(0, 1, (F, K)).astype(np.float32)
        grids, edges = weighted_histogram_3d(
            pos, w, gridcenter=[20.0, 20.0, 20.0], xdim=40, ydim=40,
            zdim=40, delta=1.0)
        bins = [len(e) - 1 for e in edges]
        rng_ = [(e[0], e[-1]) for e in edges]
        for k in range(K):
            expect = np.zeros(bins)
            for f in range(F):
                h, _ = np.histogramdd(pos[f], bins=bins, range=rng_)
                expect += h * w[f, k]
            assert np.allclose(grids[k], expect, atol=1e-3)

    def test_out_of_grid_warns_with_fraction(self):
        """Out-of-grid atoms are dropped WITH a warning naming the lost
        fraction (reference wdensity.py:206-218 contract; VERDICT round 2
        missing item 3 — silent loss in a science tool)."""
        pos = np.array([[[100.0, 100.0, 100.0], [5.0, 5.0, 5.0]]],
                       np.float32)
        with pytest.warns(UserWarning, match="50.0%.*outside"):
            grids, _ = weighted_histogram_3d(
                pos, np.ones((1, 1), np.float32),
                gridcenter=[5.0, 5.0, 5.0], xdim=10, ydim=10, zdim=10)
        assert grids.sum() == pytest.approx(1.0)  # only the inside atom

    def test_in_grid_does_not_warn(self, recwarn):
        pos = np.array([[[5.0, 5.0, 5.0]]], np.float32)
        import warnings as _w
        with _w.catch_warnings():
            _w.simplefilter("error")
            grids, _ = weighted_histogram_3d(
                pos, np.ones((1, 1), np.float32),
                gridcenter=[5.0, 5.0, 5.0], xdim=10, ydim=10, zdim=10)
        assert grids.sum() == pytest.approx(1.0)

    def test_fixedwidth_bins(self):
        n, lo, hi = fixedwidth_bins(1.0, np.array([0.25]), np.array([9.75]))
        assert n[0] == 10
        assert lo[0] == pytest.approx(0.0) and hi[0] == pytest.approx(10.0)

    def test_density_normalization(self, rng):
        pos = rng.uniform(0, 10, (4, 5, 3)).astype(np.float32)
        d = WDensity(pos, np.ones((4, 1), np.float32),
                     gridcenter=[5.0] * 3, xdim=10, ydim=10, zdim=10,
                     delta=0.5)
        den = d.density
        # sum(density * voxel_volume) = mean atoms per frame inside grid
        total = den.grid.sum() * np.prod(den.delta)
        assert total == pytest.approx(5.0, rel=1e-4)
        # make_density is idempotent
        before = den.grid.copy()
        den.make_density()
        assert np.allclose(den.grid, before)


class TestDensityUnits:
    """Unit conversion parity with the reference's vendored Density
    (reference wdensity.py:440-627)."""

    @staticmethod
    def _unit_density(value):
        from basicrta_tpu.kinetics.density import Density
        edges = [np.linspace(0, 4, 5)] * 3
        d = Density(np.full((4, 4, 4), value, np.float64), edges,
                    is_density=True, density_unit="Angstrom^{-3}")
        return d

    def test_water_units(self):
        # bulk water is 0.997 g/cm^3 * N_A / 18.016 = 0.033327... A^-3;
        # converting that density to 'water' units must give ~1.0
        d = self._unit_density(0.0334)
        d.convert_density("water")
        assert d.grid.flat[0] == pytest.approx(1.0, abs=0.01)
        # round trip back
        d.convert_density("Angstrom^{-3}")
        assert d.grid.flat[0] == pytest.approx(0.0334, rel=1e-6)

    def test_tip4p_and_molar(self):
        d = self._unit_density(1.0)
        d.convert_density("nm^{-3}")
        assert d.grid.flat[0] == pytest.approx(1000.0)
        d.convert_density("Molar")
        # 1 A^-3 = 1e27/N_A Molar = 1660.54 M
        assert d.grid.flat[0] == pytest.approx(1660.54, rel=1e-3)
        d.convert_density("TIP4P")
        d.convert_density("Angstrom^{-3}")
        assert d.grid.flat[0] == pytest.approx(1.0, rel=1e-5)

    def test_convert_length(self):
        d = self._unit_density(1.0)
        d.convert_length("nm")
        assert d.delta[0] == pytest.approx(0.1)
        assert d.length_unit == "nm"
        d.convert_length("Angstrom")
        assert d.delta[0] == pytest.approx(1.0)

    def test_requires_density(self):
        from basicrta_tpu.kinetics.density import Density
        d = Density(np.ones((2, 2, 2)), [np.linspace(0, 2, 3)] * 3)
        with pytest.raises(RuntimeError):
            d.convert_density("water")
        d.make_density()
        with pytest.raises(ValueError):
            d.convert_density("parsecs^{-3}")


class TestMapKinetics:
    @pytest.fixture(scope="class")
    def system(self, tmp_path_factory):
        """Tiny system with a processed Gibbs result and real files."""
        from basicrta_tpu.config import GibbsConfig, ContactConfig
        from basicrta_tpu.contacts.mapper import MapContacts, ProcessContacts
        from basicrta_tpu.contacts.records import ContactMeta
        from basicrta_tpu.io.topology import Topology, write_gro
        from basicrta_tpu.io.native import XTCWriter
        from basicrta_tpu.io.universe import Universe
        from basicrta_tpu.sampler.gibbs import Gibbs
        from basicrta_tpu.postprocess.tau import AllNoiseError

        rng = np.random.default_rng(42)
        root = str(tmp_path_factory.mktemp("kin"))
        names = np.array(["CA", "CB", "C1", "C2", "C1", "C2"])
        resids = np.array([5, 5, 100, 100, 101, 101], np.int32)
        resnames = np.array(["TRP", "TRP", "CHOL", "CHOL", "CHOL", "CHOL"])
        top = Topology(names, resids, resnames,
                       np.zeros((6, 3), np.float32),
                       np.array([60.0] * 3, np.float32))
        F, ts = 400, 0.1
        pos = np.zeros((F, 6, 3), np.float32)
        pos[:, 0:2] = [10.0, 10.0, 10.0]
        pos[:, 1, 0] = 11.0
        pos[:, 2:4] = [40.0, 40.0, 40.0]
        pos[:, 4:6] = [50.0, 50.0, 50.0]
        # CHOL 100 binds in several windows with mixed lengths
        state = False
        f = 0
        windows = []
        while f < F - 30:
            length = int(rng.integers(1, 25))
            if state:
                for i in range(f, f + length):
                    pos[i, 2:4] = [13.0, 10.0, 10.0]
                windows.append((f, length))
            state = not state
            f += length
        gro = os.path.join(root, "top.gro")
        write_gro(gro, top)
        xtc = os.path.join(root, "traj.xtc")
        XTCWriter(xtc).write(pos, np.arange(F) * ts,
                             np.tile([60.0] * 3, (F, 1)))

        u = Universe(gro, xtc)
        i1, i2 = u.select_atoms("protein"), u.select_atoms("resname CHOL")
        meta = ContactMeta(top=gro, traj=xtc, sel1="protein",
                           sel2="resname CHOL", ts=ts)
        rec = MapContacts(i1, u.topology.resids[i1], i2,
                          u.topology.resids[i2],
                          cfg=ContactConfig(map_cutoff=10.0),
                          meta=meta).run(u.iter_batches(64))
        ev = ProcessContacts(7.0).run(rec)

        cfg = GibbsConfig(ncomp=3, niter=600, g=10, burnin=200,
                          gmm_n_init=4, seed=0)
        g = Gibbs(ev.times_for_residue(5), residue="W5", cutoff=7.0,
                  cfg=cfg, root=root)
        g.run(save=False)
        g.process_gibbs(save=False)
        try:
            g.estimate_tau()
        except AllNoiseError:
            g.tau = (0.0, 0.0, 0.0)
        g.save()
        return root, g, ev, windows

    def test_frame_table(self, system):
        from basicrta_tpu.kinetics.mapper import MapKinetics
        root, g, ev, windows = system
        mk = MapKinetics(g, ev)
        table = mk.frame_table()
        total_frames = sum(length for _, length in windows)
        assert table.shape == (total_frames,
                               2 + g.processed.lmode)
        assert np.allclose(table[:, 2:].sum(axis=1), 1.0, atol=1e-4)
        # frames listed are exactly the bound frames
        bound = sorted(np.concatenate(
            [np.arange(f, f + n) for f, n in windows]))
        assert np.array_equal(np.sort(table[:, 0].astype(int)), bound)

    def test_frame_table_memmap_matches_ram(self, system):
        from basicrta_tpu.kinetics.mapper import MapKinetics
        root, g, ev, windows = system
        ram = MapKinetics(g, ev).frame_table(memmap=False)
        mk = MapKinetics(g, ev)
        mm = mk.frame_table(memmap=True, event_chunk=3)
        assert isinstance(mm, np.memmap)
        assert os.path.exists(os.path.join(g.savedir, "den_write_data.npy"))
        assert np.allclose(np.asarray(mm), ram)

    def test_frame_table_bounded_ram(self, tmp_path):
        """A multi-million-row expansion must not materialize in heap: the
        memmap chunked fill keeps peak allocations at the chunk scale (the
        reference memmaps for the same reason, kinetics.py:46-77)."""
        import tracemalloc
        from basicrta_tpu.contacts.records import ContactEvents, ContactMeta
        from basicrta_tpu.kinetics.mapper import MapKinetics

        ts = 0.1
        n_events, frames_per = 30000, 100   # expands to 3,000,000 rows
        starts = np.arange(n_events, dtype=np.float64) * (frames_per * ts)
        ev = ContactEvents(
            sel1_resids=np.full(n_events, 5, np.int32),
            sel2_resids=np.full(n_events, 100, np.int32),
            start_times=starts,
            durations=np.full(n_events, frames_per * ts),
            meta=ContactMeta(ts=ts))

        class StubGibbs:              # only what frame_table touches
            residue = "W5"
            root = str(tmp_path)
            savedir = str(tmp_path)
            ts = 0.1

            def pindicator_per_event(self):
                return np.tile([0.5, 0.3, 0.2], (n_events, 1))

        mk = MapKinetics.__new__(MapKinetics)
        mk.gibbs = StubGibbs()
        mk.events = ev
        mk.meta = ev.meta
        mk.savedir = str(tmp_path)
        mk._frame_table = None
        tracemalloc.start()
        table = mk.frame_table(memmap=True, event_chunk=1024)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        nbytes = table.shape[0] * table.shape[1] * 8
        assert table.shape == (3_000_000, 5)
        assert nbytes > 100e6            # the table itself is >100 MB
        assert peak < 40e6, peak         # heap stayed at chunk scale
        assert table[0, 0] == 0 and table[-1, 0] == n_events * frames_per - 1
        assert np.allclose(table[:5, 2:], [0.5, 0.3, 0.2])

    def test_create_traj_all(self, system):
        from basicrta_tpu.kinetics.mapper import MapKinetics
        from basicrta_tpu.io.native import XTCReader
        root, g, ev, windows = system
        mk = MapKinetics(g, ev)
        written = mk.create_traj()
        assert os.path.exists(os.path.join(g.savedir, "reduced.gro"))
        r = XTCReader(written[0])
        assert r.natoms == 4  # 2 protein + 2 CHOL atoms
        assert r.nframes == sum(n for _, n in windows)
        c, _, _, _ = r.read([0])
        # CHOL near the residue in every written frame
        assert np.abs(c[0, 2] - [13.0, 10.0, 10.0]).max() < 0.1
        # existing file refuses overwrite (reference kinetics.py:94-95)
        import pytest as _pt
        with _pt.raises(FileExistsError):
            mk.create_traj()

    def test_write_component_trajs(self, system):
        from basicrta_tpu.kinetics.mapper import MapKinetics
        from basicrta_tpu.io.native import XTCReader
        root, g, ev, windows = system
        mk = MapKinetics(g, ev)
        written = mk.write_component_trajs()
        assert 1 <= len(written) <= g.processed.lmode
        total = sum(XTCReader(w).nframes for w in written)
        # every bound frame is assigned to exactly one component
        assert total == sum(n for _, n in windows)
        # striding reduces frame counts
        strided = MapKinetics(g, ev)
        s2 = strided.write_component_trajs(step=2)
        assert sum(XTCReader(w).nframes for w in s2) <= -(-total // 2) + len(s2)

    def test_create_traj_topn(self, system):
        from basicrta_tpu.kinetics.mapper import MapKinetics
        from basicrta_tpu.io.native import XTCReader
        root, g, ev, _ = system
        mk = MapKinetics(g, ev)
        written = mk.create_traj(top_n=5)
        assert len(written) == g.processed.lmode
        for w in written:
            assert XTCReader(w).nframes == 5

    def test_weighted_densities_custom_grid(self, system):
        """gridcenter/dims/delta pass through to the accumulator
        (reference _set_user_grid surface, wdensity.py:154-218)."""
        from basicrta_tpu.kinetics.mapper import MapKinetics
        root, g, ev, _ = system
        mk = MapKinetics(g, ev)
        outs = mk.weighted_densities(gridcenter=[13.0, 10.0, 10.0],
                                     xdim=20.0, ydim=20.0, zdim=10.0,
                                     delta=0.5)
        grid, origin, delta = read_dx(outs[0])
        assert grid.shape == (40, 40, 20)      # dims / delta
        assert np.allclose(delta, 0.5)
        assert np.allclose(origin + 0.25,      # voxel center offset
                           [13.0 - 10.0, 10.0 - 10.0, 10.0 - 5.0],
                           atol=0.5)
        for o in outs:
            os.remove(o)

    def test_traj_format_trr_dcd_nc(self, system):
        """create_traj honors traj_format: TRR/DCD/NetCDF reduced
        trajectories carry the same coordinates as the XTC default."""
        from basicrta_tpu.io.amber import NCDFReader
        from basicrta_tpu.io.native import DCDReader, TRRReader, XTCReader
        from basicrta_tpu.kinetics.mapper import MapKinetics
        root, g, ev, _ = system
        with pytest.raises(ValueError, match="traj_format"):
            MapKinetics(g, ev, traj_format="pdb")
        outs = {}
        for fmt in ("xtc", "trr", "dcd", "nc"):
            mk = MapKinetics(g, ev, traj_format=fmt)
            written = mk.create_traj(top_n=4)
            assert all(w.endswith("." + fmt) for w in written)
            outs[fmt] = written
        readers = {"xtc": XTCReader, "trr": TRRReader, "dcd": DCDReader,
                   "nc": NCDFReader}
        for fmt in ("trr", "dcd", "nc"):
            for ref, w in zip(outs["xtc"], outs[fmt]):
                c_ref = readers["xtc"](ref).read()[0]
                c = readers[fmt](w).read()[0]
                assert c.shape == c_ref.shape
                # XTC is quantized at 0.001 nm; the others are exact f32
                assert np.abs(c - c_ref).max() < 0.012

    def test_weighted_densities(self, system):
        from basicrta_tpu.kinetics.mapper import MapKinetics
        root, g, ev, _ = system
        mk = MapKinetics(g, ev)
        outs = mk.weighted_densities()
        assert len(outs) == g.processed.lmode
        grid, origin, delta = read_dx(outs[0])
        assert grid.shape == (40, 40, 40)
        # density mass concentrates at the binding site (13, 10, 10)
        total = np.zeros_like(grid)
        for o in outs:
            gk, _, _ = read_dx(o)
            total += gk
        peak = np.unravel_index(np.argmax(total), total.shape)
        peak_pos = origin + np.asarray(peak) * delta
        assert np.abs(peak_pos - [13.0, 10.0, 10.0]).max() < 2.0

    def test_weighted_densities_topn(self, system):
        from basicrta_tpu.kinetics.mapper import MapKinetics
        root, g, ev, _ = system
        mk = MapKinetics(g, ev)
        outs = mk.weighted_densities(top_n=10)
        assert len(outs) >= 1
        for o in outs:
            grid, _, _ = read_dx(o)
            assert grid.sum() > 0


class TestKineticsRegressions:
    """Regressions from the kinetics/postprocess/protein code review."""

    @pytest.fixture(scope="class")
    def ragged_system(self, tmp_path_factory):
        """sel2 mixes a 2-atom CHOL with a 1-atom ION (differing atom
        counts), both contacting residue 5."""
        from basicrta_tpu.config import GibbsConfig, ContactConfig
        from basicrta_tpu.contacts.mapper import MapContacts, ProcessContacts
        from basicrta_tpu.contacts.records import ContactMeta
        from basicrta_tpu.io.topology import Topology, write_gro
        from basicrta_tpu.io.native import XTCWriter
        from basicrta_tpu.io.universe import Universe
        from basicrta_tpu.sampler.gibbs import Gibbs
        from basicrta_tpu.postprocess.tau import AllNoiseError

        root = str(tmp_path_factory.mktemp("ragged"))
        names = np.array(["CA", "CB", "C1", "C2", "NA"])
        resids = np.array([5, 5, 100, 100, 200], np.int32)
        resnames = np.array(["TRP", "TRP", "CHOL", "CHOL", "ION"])
        top = Topology(names, resids, resnames,
                       np.zeros((5, 3), np.float32),
                       np.array([60.0] * 3, np.float32))
        F, ts = 400, 0.1
        pos = np.zeros((F, 5, 3), np.float32)
        pos[:, 0:2] = [10.0, 10.0, 10.0]
        pos[:, 2:4] = [40.0, 40.0, 40.0]
        pos[:, 4] = [50.0, 50.0, 50.0]
        # CHOL 100 and ION 200 bind in several windows of mixed length
        rng = np.random.default_rng(42)
        f = 0
        state = False
        while f < F - 30:
            length = int(rng.integers(1, 25))
            if state:
                if rng.random() < 0.5:
                    pos[f:f + length, 2:4] = [13.0, 10.0, 10.0]
                else:
                    pos[f:f + length, 4] = [12.0, 10.0, 10.0]
            state = not state
            f += length
        gro = os.path.join(root, "top.gro")
        write_gro(gro, top)
        xtc = os.path.join(root, "traj.xtc")
        XTCWriter(xtc).write(pos, np.arange(F) * ts,
                             np.tile([60.0] * 3, (F, 1)))
        u = Universe(gro, xtc)
        i1 = u.select_atoms("protein")
        i2 = u.select_atoms("resname CHOL ION")
        meta = ContactMeta(top=gro, traj=xtc, sel1="protein",
                           sel2="resname CHOL ION", ts=ts)
        rec = MapContacts(i1, u.topology.resids[i1], i2,
                          u.topology.resids[i2],
                          cfg=ContactConfig(map_cutoff=10.0),
                          meta=meta).run(u.iter_batches(64))
        ev = ProcessContacts(7.0).run(rec)
        cfg = GibbsConfig(ncomp=3, niter=600, g=10, burnin=200,
                          gmm_n_init=4, seed=0)
        g = Gibbs(ev.times_for_residue(5), residue="W5", cutoff=7.0,
                  cfg=cfg, root=root)
        g.run(save=False)
        g.process_gibbs(save=False)
        try:
            g.estimate_tau()
        except AllNoiseError:
            g.tau = (0.0, 0.0, 0.0)
        return root, g, ev

    def test_ragged_densities_mask(self, ragged_system):
        """Mixed sel2 atom counts flow through the padded+masked density
        path; total grid mass equals sum(weight x live atoms)."""
        from basicrta_tpu.kinetics.mapper import MapKinetics
        root, g, ev = ragged_system
        mk = MapKinetics(g, ev, root=root)
        table = mk.frame_table()
        outs = mk.weighted_densities()
        assert len(outs) > 0
        # recompute expected mass: each row contributes w * n_atoms(lip)
        n_atoms = {100: 2, 200: 1}
        atoms = np.asarray([n_atoms[int(l)] for l in table[:, 1]])
        expected = (table[:, 2:] * atoms[:, None]).sum()
        from basicrta_tpu.io.dx import read_dx
        total = 0.0
        for p in outs:
            grid, origin, delta = read_dx(p)
            # densities are counts/voxel-volume/n_frames
            total += grid.sum() * np.prod(delta) * len(table)
        assert total == pytest.approx(expected, rel=1e-4)

    def test_reduced_traj_heterogeneous_sel2_is_loud(self, ragged_system):
        from basicrta_tpu.kinetics.mapper import MapKinetics
        root, g, ev = ragged_system
        mk = MapKinetics(g, ev, root=root)
        with pytest.raises(ValueError, match="differing atom counts"):
            mk.create_traj()

    def test_event_table_mismatch_is_loud(self, ragged_system):
        import dataclasses
        from basicrta_tpu.contacts.records import ContactEvents
        from basicrta_tpu.kinetics.mapper import MapKinetics
        root, g, ev = ragged_system
        trunc = ContactEvents(ev.sel1_resids[:-1], ev.sel2_resids[:-1],
                              ev.start_times[:-1], ev.durations[:-1],
                              ev.meta)
        mk = MapKinetics(g, trunc, root=root)
        with pytest.raises(ValueError, match="different "):
            mk.frame_table()

    def test_resid_parse(self):
        from basicrta_tpu.kinetics.mapper import _resid_of
        assert _resid_of("W313") == 313
        assert _resid_of("313") == 313
        assert _resid_of(313) == 313
        assert _resid_of("HSD42") == 42
        with pytest.raises(ValueError, match="residue id"):
            _resid_of("XYZ")

    def test_reduced_xtc_steps_monotonic(self, ragged_system):
        """Chunked reduced-trajectory writes must carry monotonic step
        numbers (previously restarted at 0 every chunk)."""
        from basicrta_tpu.io.native import XTCReader
        from basicrta_tpu.kinetics.mapper import MapKinetics
        root, g, ev = ragged_system
        mk = MapKinetics(g, ev, root=root)
        u = mk._open_universe()
        i1 = u.select_atoms("protein")
        i2 = u.select_atoms("resname CHOL ION")
        table = mk.frame_table()
        rows = np.flatnonzero(table[:, 1] == 100)[:20]  # one residue type
        assert len(rows) >= 15
        out = os.path.join(root, "steps_check.xtc")
        mk._write_reduced(u, i1, i2, table[rows, 0].astype(int),
                          table[rows, 1].astype(int), out, chunk=7)
        _, _, _, steps = XTCReader(out).read()
        assert np.array_equal(steps, np.arange(len(rows)))

