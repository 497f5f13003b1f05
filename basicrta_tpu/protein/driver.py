"""All-residue sampling driver and cross-residue tau aggregation.

``ParallelGibbs`` (reference gibbs.py:20-88 parity) consumes the residence-
event table and runs every residue's Gibbs chains as lanes of one batched
device program — replacing the reference's one-OS-process-per-residue pool
and its Slurm job-array escape hatch (reference scripts/). ``ProcessProtein``
(reference cluster.py:15-192 parity) loads per-residue results, estimates
tau for the slowest process of each, writes the tau table, plots tau vs
residue, and exports b-factor-colored structures.
"""

from __future__ import annotations

import os
import re
import warnings
from glob import glob
from typing import Dict, List, Optional, Union

import numpy as np

from basicrta_tpu.config import GibbsConfig
from basicrta_tpu.contacts.records import ContactEvents
from basicrta_tpu.ops.surv import ci_bars
from basicrta_tpu.postprocess.tau import AllNoiseError
from basicrta_tpu.sampler.batch import run_residues
from basicrta_tpu.sampler.gibbs import Gibbs


def finish_batch(gibbs_by_label: Dict[str, Gibbs], chain=0,
                 save: bool = True, progress_cb=None,
                 sharding=None) -> None:
    """Post-process many residues' sampler outputs as bucketed device
    batches (one compile + one vmapped program per shape bucket instead of
    a fresh compile per residue) and fill each Gibbs with processed results,
    parameters, and tau. Replaces the reference's per-residue reprocess pool
    (cluster.py:54-76) at device speed. ``sharding`` splits the residue
    axis of every bucket program over a device mesh (residues are
    independent, so the partition is collective-free)."""
    if not gibbs_by_label:
        return
    from basicrta_tpu.postprocess.batched import process_residues_batched
    from basicrta_tpu.postprocess.tau import estimate_params
    from basicrta_tpu.postprocess.tau import estimate_tau as _etau
    items = {}
    for lab, g in gibbs_by_label.items():
        items[lab] = (g.mcweights, g.mcrates, g._values, g._counts)
    cfg = next(iter(gibbs_by_label.values())).cfg
    results = process_residues_batched(items, cfg, chain=chain,
                                       progress_cb=progress_cb,
                                       sharding=sharding)
    for lab, g in gibbs_by_label.items():
        g.processed = results[lab]
        g.parameters, g.intervals = estimate_params(g.processed)
        try:
            g.tau = _etau(g.processed, g.cfg.noise_cutoff, g.parameters)
        except AllNoiseError:
            g.tau = (0.0, 0.0, 0.0)
        if save:
            g.save()


def cutoff_from_filename(path: str) -> float:
    """Parse the analysis cutoff out of a contacts filename, the reference's
    filename-as-config convention (reference gibbs.py:35-36,
    kinetics.py:24-25)."""
    stem = os.path.basename(path)
    for ext in (".npz", ".pkl", ".npy"):
        if stem.endswith(ext):
            stem = stem[: -len(ext)]
    return float(stem.split("_")[-1])


def residue_labels_for(events: ContactEvents,
                       resids: np.ndarray) -> List[str]:
    """Labels like 'W313' from the topology named in the metadata; falls
    back to 'X{resid}' when no topology is available
    (reference gibbs.py:62-67 uses pickled AtomGroups instead)."""
    top_path = events.meta.top
    if top_path and os.path.exists(top_path):
        try:
            from basicrta_tpu.io.topology import convert_aa_code
            from basicrta_tpu.io.universe import read_topology
            top = read_topology(top_path)
            out = []
            for resid in resids:
                rn = top.resnames[top.resids == resid]
                try:
                    out.append(f"{convert_aa_code(str(rn[0]))}{resid}"
                               if len(rn) else f"X{resid}")
                except ValueError:
                    out.append(f"X{resid}")
            return out
        except Exception as e:  # noqa: BLE001
            # falling back to X-prefixed labels changes the result
            # directory names (basicrta-{cutoff}/X313 vs W313): say so
            # loudly instead of silently splitting the results tree
            # between reruns
            warnings.warn(
                f"could not read {top_path} for residue labels "
                f"({type(e).__name__}: {e}); falling back to X-prefixed "
                "labels — result directories will be named X<resid>",
                stacklevel=2)
    return [f"X{r}" for r in resids]


class ParallelGibbs:
    """Run Gibbs samplers for every sel1 residue in a contact-event table.

    :param contacts: path to a ``contacts_{cutoff}.npz`` event table or a
        ContactEvents instance.
    :param cfg: sampler configuration (ncomp/niter defaults match the
        reference, gibbs.py:34).
    """

    def __init__(self, contacts: Union[str, ContactEvents],
                 cfg: GibbsConfig = GibbsConfig(), root: str = "."):
        if isinstance(contacts, str):
            if not os.path.exists(contacts):
                raise FileNotFoundError(
                    f"contacts file not found: {contacts}")
            self.cutoff = cutoff_from_filename(contacts)
            if contacts.endswith(".pkl"):
                # the reference's pickled event table works directly
                # (migration path; io/legacy.py restricted unpickler)
                from basicrta_tpu.io.legacy import load_reference_contacts
                self.events = load_reference_contacts(contacts)
                if not isinstance(self.events, ContactEvents):
                    raise ValueError(
                        f"{contacts} is a primary contact map; run "
                        "ProcessContacts (or the reference's) to produce "
                        "the residence-event table first")
            else:
                self.events = ContactEvents.load(contacts)
            if self.events.meta.cutoff is not None:
                self.cutoff = self.events.meta.cutoff
        else:
            self.events = contacts
            self.cutoff = self.events.meta.cutoff
            if self.cutoff is None:
                raise ValueError(
                    "the ContactEvents instance carries no cutoff "
                    "metadata (meta.cutoff is None) — results would be "
                    "written to 'basicrta-None/'; set events.meta.cutoff "
                    "or load from a contacts_{cutoff} file")
        self.cfg = cfg
        self.root = root

    def run(self, run_resids=None, mode: str = "batched",
            engine: str = "auto", n_devices: Optional[int] = None,
            progress_cb=None) -> Dict[str, Gibbs]:
        """Sample all residues (or ``run_resids``) and post-process each.

        ``mode='batched'`` runs every residue as device lanes of one
        program; ``mode='sequential'`` runs one residue at a time (lower
        peak memory, matches the single-residue code path exactly).

        ``n_devices`` shards the residue/chain lanes over a
        ('lanes', 'events') device mesh — the product path of the multi-chip
        backend (replaces the reference's Slurm job array,
        scripts/create_jobs.sh). ``n_devices=0`` uses every visible device;
        ``None`` (default) runs unsharded on one device. Both engines
        compose with lane sharding.
        """
        all_resids = np.unique(self.events.sel1_resids)
        if run_resids is None:
            resids = all_resids
        else:
            run_resids = np.atleast_1d(run_resids)
            resids = all_resids[np.isin(all_resids, run_resids)]
        labels = residue_labels_for(self.events, resids)
        times = {lab: self.events.times_for_residue(int(r))
                 for lab, r in zip(labels, resids)}

        # residues with too few events are skipped with the sentinel the
        # failure-detection sweep honors (reference
        # scripts/get_rerun_residues.py:23-34); the weight cutoff rule
        # wcutoff = 10/N makes N <= 10 degenerate
        min_events = max(2, int(self.cfg.weight_cut_events))
        for lab in list(times):
            if len(times[lab]) < min_events:
                d = os.path.join(self.root, f"basicrta-{self.cutoff}", lab)
                os.makedirs(d, exist_ok=True)
                open(os.path.join(d, ".dataset_too_small"), "w").close()
                del times[lab]

        sharding = None
        if n_devices is not None:
            import jax
            from basicrta_tpu.parallel.mesh import make_mesh, lane_sharding
            # local devices: on a multi-host pod each host runs its own
            # residue subset on its own chips (parallel/distributed.py);
            # a mesh over the global device list would mix non-addressable
            # chips into a per-host program
            devs = jax.local_devices()
            n = n_devices if n_devices > 0 else len(devs)
            sharding = lane_sharding(make_mesh(n_lanes=n, devices=devs[:n]))

        out: Dict[str, Gibbs] = {}
        if mode == "batched":
            ckpt_dir = os.path.join(self.root, f"basicrta-{self.cutoff}",
                                    ".checkpoints")
            samples = run_residues(times, self.cfg,
                                   n_chains=self.cfg.n_chains,
                                   checkpoint_dir=ckpt_dir,
                                   engine=engine,
                                   sharding=sharding,
                                   progress_cb=progress_cb)
            for lab in samples:
                W, R = samples[lab]
                g = Gibbs(times[lab], residue=lab, cutoff=self.cutoff,
                          cfg=self.cfg, root=self.root)
                g.mcweights, g.mcrates = W, R
                out[lab] = g
            finish_batch(out, sharding=sharding)
        else:
            for lab in times:
                g = Gibbs(times[lab], residue=lab, cutoff=self.cutoff,
                          cfg=self.cfg, root=self.root)
                g.run(save=False)
                self._finish(g)
                out[lab] = g
        return out

    @staticmethod
    def _finish(g: Gibbs):
        g.process_gibbs(save=False)
        try:
            g.estimate_tau()
        except AllNoiseError:
            g.tau = (0.0, 0.0, 0.0)
        g.save()


class ProcessProtein:
    """Collect per-residue results and aggregate tau across the protein
    (reference cluster.py:15-192)."""

    def __init__(self, cfg: GibbsConfig = GibbsConfig(),
                 prot: Optional[str] = None, cutoff: float = 7.0,
                 root: str = "."):
        self.cfg = cfg
        self.prot = prot
        self.cutoff = cutoff
        self.root = root
        self.residues: Dict[str, Optional[str]] = {}

    def __getitem__(self, item):
        """Attribute access by name (reference cluster.py:37-38)."""
        return getattr(self, item)

    @property
    def _basedir(self) -> str:
        return os.path.join(self.root, f"basicrta-{self.cutoff}")

    def _result_dirs(self) -> List[str]:
        dirs = [d for d in glob(os.path.join(self._basedir, "?[0-9]*"))
                if re.match(r"^[A-Za-z]\d+$", os.path.basename(d))]
        return sorted(dirs, key=lambda d: int(os.path.basename(d)[1:]))

    def collect_results(self) -> Dict[str, Optional[str]]:
        """Map residue label -> result path (None when missing), sorted by
        resid (reference cluster.py:78-94)."""
        self.residues = {}
        for adir in self._result_dirs():
            label = os.path.basename(adir)
            path = os.path.join(adir, f"gibbs_{self.cfg.niter}.npz")
            if not os.path.exists(path):
                # a reference-package results tree works directly
                # (Gibbs.load dispatches .pkl to io/legacy)
                legacy = os.path.join(adir, f"gibbs_{self.cfg.niter}.pkl")
                path = legacy if os.path.exists(legacy) else None
            self.residues[label] = path
        return self.residues

    def missing_residues(self) -> List[str]:
        """Residues lacking a result and not skipped as too-small — the
        rerun set of the reference's failure-detection sweep
        (scripts/get_rerun_residues.py:23-34). A '.dataset_too_small'
        sentinel in a residue directory marks it intentionally skipped."""
        if not self.residues:
            self.collect_results()
        missing = []
        for label, path in self.residues.items():
            if path is not None:
                continue
            sentinel = os.path.join(self._basedir, label,
                                    ".dataset_too_small")
            if not os.path.exists(sentinel):
                missing.append(label)
        return missing

    def reprocess(self) -> None:
        """Re-run posterior processing for every residue as one bucketed
        batch (reference cluster.py:54-76 runs an OS pool instead)."""
        if not self.residues:
            self.collect_results()
        loaded = {}
        for label, path in self.residues.items():
            if path is None:
                continue
            g = Gibbs.load(path)
            g.root = self.root
            loaded[label] = g
        if loaded:
            finish_batch(loaded)

    def get_taus(self):
        """(taus, bars): slowest-process tau and CI offsets per residue;
        zeros where results are missing or degenerate
        (reference cluster.py:96-120)."""
        if not self.residues:
            self.collect_results()
        taus = []
        for label, path in self.residues.items():
            if path is None:
                taus.append([0.0, 0.0, 0.0])
                continue
            try:
                g = Gibbs.load(path)
                g.root = self.root
                if g.tau is not None:
                    taus.append(list(g.tau))
                else:
                    taus.append(g.estimate_tau())
            except (AllNoiseError, KeyError, ValueError):
                taus.append([0.0, 0.0, 0.0])
        taus = np.asarray(taus, np.float64).reshape(-1, 3)
        return taus[:, 1], ci_bars(taus)

    def get_taus_all(self):
        """{label: (C, 4) rows [cluster, ci_lo, tau, ci_hi]} for every
        residue with results — tau of EVERY non-noise process, not just
        the slowest (reference gibbs.py:693-698 future-work note)."""
        if not self.residues:
            self.collect_results()
        out = {}
        for label, path in self.residues.items():
            if path is None:
                continue
            try:
                g = Gibbs.load(path)
                g.root = self.root
                out[label] = g.estimate_tau_all()
            except (AllNoiseError, KeyError, ValueError):
                continue
        return out

    def diagnostics_table(self):
        """(labels, (R, 2) rows [max_rhat, min_ess]) over every residue
        with results: split-R̂ / bulk-ESS convergence screening across the
        whole protein (the reference runs one unchecked chain per residue,
        gibbs.py:191; SURVEY section 5 'no convergence checks')."""
        if not self.residues:
            self.collect_results()
        labels, rows = [], []
        for label, path in self.residues.items():
            if path is None:
                continue
            try:
                g = Gibbs.load(path)
                g.root = self.root
                d = g.diagnostics()
            except (KeyError, ValueError):
                continue
            labels.append(label)
            rows.append([d["max_rhat"], d["min_ess"]])
        return labels, np.asarray(rows, np.float64).reshape(-1, 2)

    def write_diagnostics(self, fname: str = "diagnostics",
                          rhat_warn: float = 1.05,
                          ess_warn: float = 100.0):
        """Persist the convergence table and return
        (path, flagged labels). A residue is flagged when its worst
        split-R̂ exceeds ``rhat_warn`` or its smallest bulk ESS falls
        below ``ess_warn`` — rerun those with more chains/sweeps before
        trusting their tau."""
        labels, rows = self.diagnostics_table()
        # NaN diagnostics (degenerate/too-short chains) must flag, not
        # pass: express the healthy condition and negate it
        flagged = [lab for lab, (r, e) in zip(labels, rows)
                   if not (r <= rhat_warn and e >= ess_warn)]
        path = os.path.join(self.root, f"{fname}.npz")
        np.savez(path, labels=np.asarray(labels),
                 max_rhat=rows[:, 0], min_ess=rows[:, 1],
                 rhat_warn=rhat_warn, ess_warn=ess_warn,
                 flagged=np.asarray(flagged))
        return path, flagged

    def write_data(self, fname: str = "tausout",
                   all_clusters: bool = False) -> str:
        """[resid, tau, CI_lo, CI_hi] table as .npy
        (reference cluster.py:122-134). With ``all_clusters``, also write
        ``{fname}_all.npy`` with one row [resid, cluster, ci_lo, tau,
        ci_hi] per non-noise cluster per residue."""
        taus, bars = self.get_taus()
        resids = np.array([int(label[1:]) for label in self.residues])
        data = np.stack((resids, taus, taus - bars[0], taus + bars[1])).T
        out = os.path.join(self.root, f"{fname}.npy")
        np.save(out, data)
        if all_clusters:
            rows = []
            for label, table in self.get_taus_all().items():
                resid = int(label[1:])
                for row in table:
                    rows.append([resid, *row])
            np.save(os.path.join(self.root, f"{fname}_all.npy"),
                    np.asarray(rows, np.float64).reshape(-1, 5))
        return out

    def plot_taus_all(self, basename: Optional[str] = None):
        """Stacked per-cluster tau figure: every residue's non-noise
        process taus with CIs on a log axis."""
        from basicrta_tpu.plots import plot_tau_stack
        tables = self.get_taus_all()
        if basename is None:
            basename = os.path.join(self.root, "figs", "tau_clusters")
        return plot_tau_stack(tables, basename=basename)

    def plot_protein(self, **kwargs):
        """Tau vs residue figure (reference cluster.py:136-155)."""
        from basicrta_tpu.plots import plot_protein
        taus, bars = self.get_taus()
        residues = np.asarray(list(self.residues.keys()))
        exclude = np.unique(np.where(bars < 0)[1])
        taus = np.delete(taus, exclude)
        bars = np.delete(bars, exclude, axis=1)
        residues = np.delete(residues, exclude)
        basename = kwargs.pop("basename",
                              os.path.join(self.root, "figs", "t_slow"))
        return plot_protein(residues, taus, bars, self.prot,
                            basename=basename, **kwargs)

    def b_color_structure(self, structure: str,
                          out: str = "tau_bcolored.pdb") -> str:
        """Write tau into b-factors and tau/CI-width into occupancies
        (reference cluster.py:157-175)."""
        from basicrta_tpu.io.topology import write_pdb
        from basicrta_tpu.io.universe import read_topology
        taus, bars = self.get_taus()
        widths = bars[0] + bars[1]
        with np.errstate(divide="ignore", invalid="ignore"):
            errs = np.where(widths > 0, taus / widths, 0.0)
        top = read_topology(structure)
        tempfactors, occupancies = {}, {}
        for label, tau, err in zip(self.residues, taus, errs):
            resid = int(label[1:])
            tempfactors[resid] = round(float(tau), 2)
            occupancies[resid] = round(float(err), 2)
        out_path = os.path.join(self.root, out)
        return write_pdb(out_path, top, indices=top.select("protein"),
                         tempfactors=tempfactors, occupancies=occupancies)
