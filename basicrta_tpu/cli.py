"""Command-line interface.

Four subcommands mirror the reference's module entry points
(reference contacts.py:234-252, gibbs.py:781-795, cluster.py:178-192,
kinetics.py:207-222) so existing workflows translate one to one::

    basicrta-tpu contacts --top t.gro --traj t.xtc --sel1 protein \
        --sel2 "resname CHOL" --cutoff 7.0
    basicrta-tpu gibbs --contacts contacts_7.0.npz [--resid 313]
    basicrta-tpu cluster --cutoff 7.0 [--prot b2ar] [--structure s.pdb]
    basicrta-tpu kinetics --gibbs basicrta-7.0/W313/gibbs_110000.npz \
        --contacts contacts_7.0.npz [--top_n N] [--wdensity]
"""

from __future__ import annotations

import argparse
import sys
import time


def _cmd_contacts(args):
    from basicrta_tpu.config import ContactConfig
    from basicrta_tpu.contacts.mapper import MapContacts, ProcessContacts
    from basicrta_tpu.contacts.records import ContactMeta
    from basicrta_tpu.io.universe import Universe

    cutoffs = args.cutoff
    bad = [c for c in cutoffs if c > args.map_cutoff]
    if bad:
        raise SystemExit(f"analysis cutoff(s) {bad} exceed the map cutoff "
                         f"{args.map_cutoff}; rows beyond it were never "
                         "recorded (raise --map-cutoff)")
    traj = args.traj if len(args.traj) > 1 else args.traj[0]
    u = Universe(args.top, traj, dt_ns=args.dt)
    idx1 = u.select_atoms(args.sel1)
    idx2 = u.select_atoms(args.sel2)
    upload = args.upload
    if upload == "auto":
        # XTC natively stores a 0.01 A fixed-point grid, so the u16 wire
        # format (<= ~0.002 A grid at typical boxes) adds nothing to an
        # XTC trajectory's error budget while halving the upload bytes;
        # any other format gets the exact f32 path (config.upload_dtype)
        upload = ("u16" if all(str(t).lower().endswith(".xtc")
                               for t in args.traj) else "f32")
    cfg = ContactConfig(map_cutoff=args.map_cutoff, cutoff=cutoffs[0],
                        frames_per_batch=args.batch, upload_dtype=upload)
    # ts=None unless --dt was given: MapContacts then infers the frame
    # interval from the FULL frame-time vector with a regularity check
    # (mapper.py); seeding it from u.timestep_ns() (frames 0-1 only)
    # would disable that validation for irregular strides
    meta = ContactMeta(top=args.top, traj=traj, sel1=args.sel1,
                       sel2=args.sel2, ts=args.dt)
    mapper = MapContacts(idx1, u.topology.resids[idx1], idx2,
                         u.topology.resids[idx2], cfg=cfg, meta=meta,
                         n_devices=args.ndevices)
    t0 = time.time()
    nframes = u.n_frames

    def progress(done):
        rate = done / max(time.time() - t0, 1e-9)
        print(f"\rcontacts: frame {done}/{nframes} ({rate:,.0f} frames/s)",
              end="", file=sys.stderr)

    ckpt_dir = "contacts.npz.ckpt" if args.checkpoint_every > 0 else None
    records = mapper.run(u.iter_batches(cfg.frames_per_batch),
                         progress_cb=progress, checkpoint_dir=ckpt_dir,
                         checkpoint_every=max(args.checkpoint_every, 1))
    print(file=sys.stderr)
    records.save("contacts.npz")
    print('Saved contacts as "contacts.npz"')
    # one scan serves any number of analysis cutoffs (the reference
    # reruns ProcessContacts per cutoff over the pickled map,
    # contacts.py:154-195; here each is a filter pass on the records)
    for cutoff in cutoffs:
        events = ProcessContacts(cutoff=cutoff).run(records)
        out = f"contacts_{cutoff}.npz"
        events.save(out)
        print(f'Saved contacts to "{out}"')
    if ckpt_dir is not None:
        # only now that every artifact is durably on disk
        MapContacts.remove_checkpoint(ckpt_dir)


def _cmd_gibbs(args):
    from basicrta_tpu.config import GibbsConfig
    from basicrta_tpu.protein.driver import ParallelGibbs

    # the reference hardcodes burnin=10000 (gibbs.py:141); keep that for
    # full-length runs but scale it down for short ones
    burnin = args.burnin if args.burnin is not None else min(
        10_000, max(args.g, args.niter // 10))
    cfg = GibbsConfig(ncomp=args.ncomp, niter=args.niter, g=args.g,
                      burnin=burnin, n_chains=args.nchains, seed=args.seed)
    t0 = time.time()

    def progress(done, total):
        rate = done / max(time.time() - t0, 1e-9)
        print(f"\rgibbs: sweep {done}/{total} ({rate:,.0f} sweeps/s/lane)",
              end="", file=sys.stderr)

    if args.multihost:
        # must precede anything that could initialize an XLA backend
        from basicrta_tpu.parallel.distributed import initialize
        initialize()
    driver = ParallelGibbs(args.contacts, cfg=cfg)
    run_resids = args.resid
    rerun: set = set()
    if args.rerun_missing:
        # failure-detection sweep: run only residues without results
        # (reference scripts/get_rerun_residues.py + create_jobs.sh --rerun)
        from basicrta_tpu.protein.driver import ProcessProtein
        pp = ProcessProtein(cfg=cfg, cutoff=driver.cutoff)
        missing = pp.missing_residues()
        rerun |= set(missing)
        print(f"{len(missing)} missing residues"
              + (f": {' '.join(missing)}" if missing else ""),
              file=sys.stderr)
    if args.rerun_flagged:
        # convergence-recovery sweep: rerun the residues cluster
        # --diagnostics flagged; combine with --nchains/--niter/--seed,
        # else the deterministic sampler reproduces the same chains.
        # Unions with --rerun-missing when both are given.
        import numpy as np
        try:
            with np.load(args.rerun_flagged) as z:
                if "flagged" in getattr(z, "files", ()):
                    flagged = [str(lab) for lab in z["flagged"]]
                else:
                    # diagnostics.npz from before the 'flagged' key:
                    # recompute from the per-residue stats it does carry
                    flagged = [str(lab) for lab, r, e in zip(
                        z["labels"], z["max_rhat"], z["min_ess"])
                        if not (r <= float(z["rhat_warn"])
                                and e >= float(z["ess_warn"]))]  # NaN flags
        except (KeyError, AttributeError, IndexError) as e:
            raise SystemExit(
                f"{args.rerun_flagged} is not a diagnostics archive: "
                f"expected a diagnostics.npz from `cluster --diagnostics` "
                f"with keys flagged (or labels/max_rhat/min_ess/"
                f"rhat_warn/ess_warn); got {type(e).__name__}: {e}")
        rerun |= set(flagged)
        print(f"{len(flagged)} flagged residues"
              + (f": {' '.join(flagged)}" if flagged else ""),
              file=sys.stderr)
    if args.rerun_missing or args.rerun_flagged:
        if not rerun:
            print("nothing to rerun", file=sys.stderr)
            return
        labels = sorted(rerun, key=lambda s: int(s[1:]))
        run_resids = [int(lab[1:]) for lab in labels]
        print(f"rerunning {len(labels)} residues: {' '.join(labels)}",
              file=sys.stderr)
    if args.multihost:
        # pod mapping: same command on every host; each host samples its
        # own residue subset with its local chips (the reference's Slurm
        # array shape, scripts/create_jobs.sh, at device speed). Applies
        # AFTER --rerun-missing so the rerun set also partitions instead
        # of every host redoing (and racing on) the same residues.
        import numpy as np
        from basicrta_tpu.parallel.distributed import host_residue_partition
        if run_resids is None:
            run_resids = [int(r) for r in np.unique(
                driver.events.sel1_resids)]
        run_resids = host_residue_partition([int(r) for r in run_resids])
    if args.profile:
        # device trace viewable with TensorBoard / xprof
        # (the reference's only observability is tqdm bars + Slurm logs,
        # SURVEY.md section 5)
        import jax
        with jax.profiler.trace(args.profile):
            results = driver.run(run_resids=run_resids, mode=args.mode,
                                 engine=args.engine,
                                 n_devices=args.ndevices,
                                 progress_cb=progress)
    else:
        results = driver.run(run_resids=run_resids, mode=args.mode,
                             engine=args.engine, n_devices=args.ndevices,
                             progress_cb=progress)
    print(file=sys.stderr)
    for label, g in results.items():
        lo, tau, hi = g.tau
        line = f"{label}: tau = {tau:.2f} ns  95% CI [{lo:.2f}, {hi:.2f}]"
        if args.nchains > 1:
            # cross-chain convergence summary (no reference analogue — it
            # runs one chain without diagnostics, gibbs.py:191)
            try:
                d = g.diagnostics()
                line += (f"  [R-hat {d['max_rhat']:.3f}, "
                         f"ESS {d['min_ess']:,.0f}]")
                if d["max_rhat"] > 1.1:
                    line += "  NOT CONVERGED"
            except ValueError as e:
                # e.g. too few post-burn-in draws on a short run — never
                # let the diagnostic abort the results printout
                line += f"  [diagnostics unavailable: {e}]"
        print(line)


def _cmd_cluster(args):
    from basicrta_tpu.config import GibbsConfig
    from basicrta_tpu.protein.driver import ProcessProtein

    cfg = GibbsConfig(niter=args.niter)
    pp = ProcessProtein(cfg=cfg, prot=args.prot, cutoff=args.cutoff)
    if args.reprocess:
        pp.reprocess()
    found = pp.collect_results()
    if not found:
        print(f"no residue results under basicrta-{args.cutoff}/ for "
              f"niter={args.niter}; run the gibbs subcommand first",
              file=sys.stderr)
        sys.exit(1)
    out = pp.write_data(all_clusters=args.all_clusters)
    print(f"wrote {out}")
    if args.all_clusters:
        print(f"wrote {out[:-4]}_all.npy")
    pp.plot_protein()
    print("wrote figs/t_slow.png")
    if args.all_clusters:
        pp.plot_taus_all()
        print("wrote figs/tau_clusters.png")
    if args.diagnostics:
        path, flagged = pp.write_diagnostics()
        print(f"wrote {path}")
        if flagged:
            print(f"convergence warning ({len(flagged)} residues with "
                  "split-R-hat > 1.05 or bulk ESS < 100 — rerun with more "
                  "chains/sweeps): " + " ".join(flagged), file=sys.stderr)
    if args.structure:
        path = pp.b_color_structure(args.structure)
        print(f"wrote {path}")


def _cmd_status(args):
    """Per-residue completion report (the reference tails Slurm logs for
    this, scripts/status_update.sh)."""
    from basicrta_tpu.config import GibbsConfig
    from basicrta_tpu.protein.driver import ProcessProtein

    pp = ProcessProtein(cfg=GibbsConfig(niter=args.niter),
                        cutoff=args.cutoff)
    found = pp.collect_results()
    missing = set(pp.missing_residues())
    done = [k for k, v in found.items() if v is not None]
    skipped = [k for k, v in found.items()
               if v is None and k not in missing]
    print(f"done: {len(done)}  missing: {len(missing)}  "
          f"skipped: {len(skipped)}")
    if missing:
        print("missing:", " ".join(sorted(missing)))


def _cmd_kinetics(args):
    from basicrta_tpu.kinetics.mapper import MapKinetics
    from basicrta_tpu.sampler.gibbs import Gibbs

    g = Gibbs.load(args.gibbs)
    mk = MapKinetics(g, args.contacts, traj_format=args.traj_format)
    written = mk.create_traj(top_n=args.top_n)
    for w in written:
        print(f"wrote {w}")
    if args.comp_trajs:
        for w in mk.write_component_trajs(step=args.step):
            print(f"wrote {w}")
    if args.wdensity:
        for w in mk.weighted_densities(step=args.step, top_n=args.top_n,
                                       filterP=args.filterP,
                                       xdim=args.grid_dim,
                                       ydim=args.grid_dim,
                                       zdim=args.grid_dim,
                                       delta=args.grid_delta):
            print(f"wrote {w}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="basicrta-tpu",
        description="TPU-native Bayesian residence-time analysis")
    from basicrta_tpu import __version__
    p.add_argument("--version", action="version",
                   version=f"%(prog)s {__version__}")
    sub = p.add_subparsers(dest="command", required=True)

    c = sub.add_parser("contacts", help="extract the contact map and "
                       "residence events from a trajectory")
    c.add_argument("--top", required=True)
    c.add_argument("--traj", required=True, nargs="+",
                   help="trajectory file, or several segment files read "
                        "as one continuous trajectory")
    c.add_argument("--sel1", required=True)
    c.add_argument("--sel2", required=True)
    c.add_argument("--cutoff", type=float, default=[7.0], nargs="+",
                   help="analysis cutoff(s) [A]; several values write one "
                        "event table each from the single scan")
    c.add_argument("--map-cutoff", type=float, default=10.0)
    c.add_argument("--dt", type=float, default=None,
                   help="frame interval [ns] for trajectories without a "
                        "time axis (DCD, mdcrd, time-less NetCDF)")
    c.add_argument("--batch", type=int, default=32,
                   help="trajectory frames per device batch")
    c.add_argument("--ndevices", type=int, default=None,
                   help="shard frame batches over this many devices "
                        "(0: all visible; default: unsharded)")
    c.add_argument("--upload", choices=["auto", "f32", "u16"],
                   default="auto",
                   help="coordinate wire format for the device upload: "
                        "u16 halves bytes at a <=0.002 A grid error "
                        "(auto: u16 for XTC inputs — coarser than their "
                        "native 0.01 A storage grid — else exact f32)")
    c.add_argument("--checkpoint-every", type=int, default=0,
                   dest="checkpoint_every", metavar="FRAMES",
                   help="checkpoint the scan every FRAMES frames into "
                        "contacts.npz.ckpt/ and resume from it on rerun "
                        "(0: off)")
    c.set_defaults(fn=_cmd_contacts)

    g = sub.add_parser("gibbs", help="run Gibbs samplers for all residues")
    g.add_argument("--contacts", required=True)
    g.add_argument("--resid", type=int, default=None, nargs="*")
    g.add_argument("--niter", type=int, default=110_000)
    g.add_argument("--ncomp", type=int, default=15)
    g.add_argument("--g", type=int, default=100, help="thinning interval")
    g.add_argument("--burnin", type=int, default=None,
                   help="burn-in sweeps (default: min(10000, niter/10))")
    g.add_argument("--nchains", type=int, default=2,
                   help="independent chains per residue (default 2: "
                        "~12%% measured wall-clock over 1 chain buys "
                        "cross-chain split-R-hat/ESS for every residue, "
                        "printed per residue and screened by cluster "
                        "--diagnostics; --nchains 1 reproduces the "
                        "reference's single-chain semantics)")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--mode", choices=["batched", "sequential"],
                   default="batched")
    g.add_argument("--engine", choices=["auto", "pallas", "xla"],
                   default="auto",
                   help="sweep engine for batched mode (auto: pallas on "
                        "TPU)")
    g.add_argument("--ndevices", type=int, default=None,
                   help="shard residue lanes over this many devices "
                        "(0: all visible devices; default: unsharded)")
    g.add_argument("--multihost", action="store_true",
                   help="join the pod's global runtime and sample this "
                        "host's residue subset (run the same command on "
                        "every host)")
    g.add_argument("--rerun-missing", action="store_true",
                   help="run only residues without results (failure-"
                        "detection sweep)")
    g.add_argument("--rerun-flagged", type=str, default=None,
                   metavar="DIAGNOSTICS_NPZ",
                   help="rerun only the residues a cluster --diagnostics "
                        "pass flagged as unconverged; combine with "
                        "--nchains/--niter/--seed to actually change the "
                        "chains")
    g.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="write a jax.profiler device trace to DIR")
    g.set_defaults(fn=_cmd_gibbs)

    st = sub.add_parser("status", help="report per-residue result status")
    st.add_argument("--cutoff", type=float, required=True)
    st.add_argument("--niter", type=int, default=110_000)
    st.set_defaults(fn=_cmd_status)

    cl = sub.add_parser("cluster", help="aggregate tau across residues")
    cl.add_argument("--cutoff", type=float, required=True)
    cl.add_argument("--niter", type=int, default=110_000)
    cl.add_argument("--prot", type=str, default=None)
    cl.add_argument("--structure", type=str, default=None)
    cl.add_argument("--reprocess", action="store_true")
    cl.add_argument("--all-clusters", action="store_true",
                    help="also write tau + CI for every non-noise cluster "
                         "(tausout_all.npy) and the stacked tau figure")
    cl.add_argument("--diagnostics", action="store_true",
                    help="write per-residue split-R-hat / bulk-ESS "
                         "convergence table (diagnostics.npz) and flag "
                         "unconverged residues")
    cl.set_defaults(fn=_cmd_cluster)

    k = sub.add_parser("kinetics", help="write component trajectories and "
                       "weighted densities")
    k.add_argument("--gibbs", required=True)
    k.add_argument("--contacts", required=True)
    k.add_argument("--top_n", type=int, default=None)
    k.add_argument("--step", type=int, default=1)
    k.add_argument("--wdensity", action="store_true")
    k.add_argument("--filterP", type=float, default=0.0,
                   help="zero membership weights below this before "
                        "density accumulation (reference kinetics.py:127)")
    k.add_argument("--comp-trajs", action="store_true",
                   help="also write per-component assigned-event "
                        "trajectories (comp{k}_traj.xtc)")
    k.add_argument("--traj-format", choices=("xtc", "trr", "dcd", "nc"),
                   default="xtc", dest="traj_format",
                   help="format of the reduced trajectories (nc = Amber "
                        "NetCDF)")
    k.add_argument("--grid-dim", type=float, default=40.0, dest="grid_dim",
                   help="density grid edge length [A] centered on the "
                        "residue (reference kinetics.py:167)")
    k.add_argument("--grid-delta", type=float, default=1.0,
                   dest="grid_delta", help="density grid resolution [A]")
    k.set_defaults(fn=_cmd_kinetics)
    return p


def enable_compilation_cache():
    """Persist XLA compilations next to the repo/package.

    Device compiles through the TPU tunnel cost minutes; the cache makes
    every CLI invocation after the first fast.
    """
    import os

    import jax
    import jaxlib.version
    # scope the cache per jaxlib version — including under a user-set
    # BASICRTA_TPU_CACHE base: entries serialized by a different jaxlib
    # can crash the deserializer outright (observed: SIGSEGV in
    # compilation_cache.get_executable_and_time), and the version never
    # appears in the cache key. Old jax-<ver> siblings are left in place
    # (cheap disk, and pruning a shared directory under concurrent use
    # is its own hazard) — delete them manually after upgrades.
    base = os.environ.get(
        "BASICRTA_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "basicrta_tpu"))
    cache = os.path.join(base, f"jax-{jaxlib.version.__version__}")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)


def main(argv=None):
    args = build_parser().parse_args(argv)
    import os
    platform = os.environ.get("BASICRTA_PLATFORM")
    if platform:
        # the TPU-tunnel sitecustomize pins the platform before env vars are
        # honored, so route the override through the config API
        import jax
        jax.config.update("jax_platforms", platform)
    enable_compilation_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
