"""Measured sweep of lane-layout endpoints on the real chip (round-3
VERDICT item 3: prove the calibrated DP layout is near layout-optimal).

The host-side analysis (docs/design.md "Layout optimality") shows the
calibrated cost model ranks every reachable layout class within ~2% of
the production DP+mixed layout, and that the remaining modeled work
waste is structural: tier rows are static per kernel launch, so a
bucket's head-row count is the max over its members, and the idealized
per-lane-tier cost (~227 us/sweep vs ~334) is unreachable without both
per-lane dynamic tier dispatch AND zero quantization. This script
validates the model's ranking by MEASURING the endpoints, interleaved
across reps (the axon tunnel drifts run to run).

Variants:
  dp_mixed    production default (calibrated DP + mixed-width pairing)
  dp_uniform  calibrated DP, uniform 64-column split (no mixed pass)
  ext_classes DP over config classes extended with multi-row 16/32-col
              segments (pack 4/8 at any V — the kernel's to_phys layout
              is generic; round-3 shipped them only single-row)
  greedy      the raw fine ladder (consolidate=False)
  pow2        coarse power-of-two unpacked ladder

Usage:
    python scripts/layout_sweep.py [--reps 3] [--sweeps 10000]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import bench as B  # noqa: E402
from basicrta_tpu.config import GibbsConfig  # noqa: E402
from basicrta_tpu.sampler import batch as bt  # noqa: E402
from basicrta_tpu.sampler.batch import (bucket_residues, finalize_batch,  # noqa: E402
                                        run_batch)
from basicrta_tpu.sampler.kernels import SMALL_NMAX  # noqa: E402


_ORIG_CFGS = bt._dp_configs


def ext_configs(Vm):
    """_dp_configs plus multi-row sub-width segment classes."""
    out = _ORIG_CFGS(Vm)
    for w in (16, 32):
        width = w * -(-Vm // w)
        if (width, 128 // w) not in out:
            out.append((width, 128 // w))
    return out


def make_batches(residues, variant):
    if variant == "dp_mixed":
        return bucket_residues(residues)
    if variant == "dp_uniform":
        return bucket_residues(residues, mixed_pack=False)
    if variant == "ext_classes":
        bt._dp_configs = ext_configs
        try:
            return bucket_residues(residues)
        finally:
            bt._dp_configs = _ORIG_CFGS
    if variant == "greedy":
        return bucket_residues(residues, consolidate=False)
    if variant == "pow2":
        return bucket_residues(residues, ladder="pow2")
    raise ValueError(variant)


def modeled_cost(batches):
    tot = 0.0
    for b in batches:
        if b.bounds is not None:
            tot += bt._mixed_cost([(None, None, c) for c in b.counts],
                                  b.bounds, b.phys_rows)
        else:
            he = int(max(np.sum(c > SMALL_NMAX) for c in b.counts))
            s1 = int(max(np.sum(c > 1) for c in b.counts))
            tot += bt._layout_cost(b.size, b.values.shape[1], b.pack,
                                   he, s1)
    return tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sweeps", type=int, default=10_000)
    ap.add_argument("--variants", type=str,
                    default="dp_mixed,dp_uniform,ext_classes,greedy,pow2")
    args = ap.parse_args()
    variants = args.variants.split(",")

    B._preflight()
    residues = B.make_workload()
    cfg = GibbsConfig(ncomp=15, niter=args.sweeps, g=100)
    total_lanes = len(residues)

    layouts = {v: make_batches(residues, v) for v in variants}
    for v, batches in layouts.items():
        print(f"{v}: model {modeled_cost(batches):7.1f} us/sweep, "
              f"waste {bt.modeled_work_waste(batches):.3f}, "
              f"{[(b.size, b.values.shape[1], b.pack) for b in batches]}",
              flush=True)
        for b in batches:        # compile + warm
            run_batch(b, cfg, engine="pallas")

    times = {v: [] for v in variants}
    for rep in range(args.reps):
        for v in variants:
            t0 = time.time()
            outs = [run_batch(b, cfg, engine="pallas",
                              defer_transfer=True)
                    for b in layouts[v]]
            for o in outs:
                finalize_batch(o)
            dt = time.time() - t0
            times[v].append(dt)
            print(f"rep {rep} {v:12s} "
                  f"{total_lanes * cfg.niter / dt:12,.0f} sweeps/s",
                  flush=True)

    print("\n== medians ==")
    meds = {v: float(np.median(ts)) for v, ts in times.items()}
    best = min(meds.values())
    for v, m in sorted(meds.items(), key=lambda kv: kv[1]):
        agg = total_lanes * cfg.niter / m
        print(f"{v:12s} {agg:12,.0f} sweeps/s  "
              f"({m / best - 1.0:+.1%} vs best)")


if __name__ == "__main__":
    main()
