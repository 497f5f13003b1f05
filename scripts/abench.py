"""Interleaved A/B timing of fused-kernel variants on the real chip.

Times ``segment_pallas`` directly, per DP-layout bucket of the canonical
300-residue bench workload, with variants interleaved across reps (the
axon tunnel drifts +-6%; see docs/design.md on timing methodology).

Usage:
    python scripts/abench.py [--sweeps 2000] [--reps 5] [--variants a,b,...]

Variants are named kwarg sets for segment_pallas.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from basicrta_tpu.config import GibbsConfig  # noqa: E402
from basicrta_tpu.sampler.batch import bucket_residues  # noqa: E402
from basicrta_tpu.sampler.kernels import init_mixture_params, MixtureState  # noqa: E402

VARIANTS = {
    # production default: inversion straight-line, BTRS early-exit
    "base": dict(early_exit=(False, True, True)),
    # BTRS unrolled straight-line too
    "btrs_sl": dict(early_exit=(False, False, True)),
    # everything early-exit (round-2 loser, re-baseline)
    "all_ee": dict(early_exit=(True, True, True)),
    # binary-splitting multinomial (log2 K sequential levels)
    "tree": dict(early_exit=(False, True, True), tree=True),
    "tree_sl": dict(early_exit=(False, False, True), tree=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--residues", type=int, default=300)
    ap.add_argument("--variants", default="base,btrs_sl")
    ap.add_argument("--g", type=int, default=100)
    args = ap.parse_args()

    from bench import make_workload
    residues = make_workload(args.residues)
    cfg = GibbsConfig(ncomp=15, niter=args.sweeps, g=args.g)
    batches = bucket_residues(residues)
    print("buckets:", [(b.values.shape, b.pack, b.tiers) for b in batches],
          file=sys.stderr)

    from basicrta_tpu.sampler.pallas_sweep import (packed_row_tiers,
                                                   pad_tiers_to_rows,
                                                   segment_pallas)

    np.asarray(jnp.ones((8,)) * 2)  # absorb tunnel warm-up

    n_blocks = args.sweeps // args.g
    variants = args.variants.split(",")
    runs = {}   # (variant, bucket_idx) -> callable returning a device array
    for bi, b in enumerate(batches):
        if b.pack > 1:
            seg_w = 128 // b.pack
            tiers = packed_row_tiers(b.tiers, seg_w,
                                     b.values.shape[1] // seg_w)
        else:
            tiers = pad_tiers_to_rows(b.tiers, b.values.shape[1])
        st0 = init_mixture_params(cfg.ncomp)
        state = MixtureState(jnp.tile(st0.weights, (b.size, 1)),
                             jnp.tile(st0.rates, (b.size, 1)))
        values = jnp.asarray(b.values, jnp.float32)
        counts = jnp.asarray(b.counts, jnp.float32)

        def make(bi=bi, b=b, tiers=tiers, state=state, values=values,
                 counts=counts):
            def go(vkw):
                return segment_pallas(jnp.int32(bi + 1), jnp.int32(0),
                                      state, values, counts, cfg, n_blocks,
                                      tiers, pack=b.pack, **vkw)
            return go
        runs[bi] = make()

    # compile + warm every (variant, bucket) once
    for v in variants:
        for bi in runs:
            t0 = time.time()
            st, W, R = runs[bi](VARIANTS[v])
            np.asarray(W[:1, :1])
            print(f"warm {v} b{bi}: {time.time() - t0:.1f}s",
                  file=sys.stderr)

    # interleaved timed reps
    times = {(v, bi): [] for v in variants for bi in runs}
    for rep in range(args.reps):
        for v in variants:
            for bi in runs:
                t0 = time.time()
                st, W, R = runs[bi](VARIANTS[v])
                np.asarray(W[:1, :1])   # sync (block_until_ready no-op)
                times[(v, bi)].append(time.time() - t0)

    total_lanes = sum(b.size for b in batches)
    print(f"\n{'variant':10s} " + " ".join(
        f"b{bi}[B={batches[bi].size:3d}]" for bi in runs) + "  agg_sweeps/s")
    for v in variants:
        per = []
        for bi in runs:
            dt = min(times[(v, bi)])
            per.append(dt / args.sweeps * 1e6)   # us/sweep
        tot_t = sum(min(times[(v, bi)]) for bi in runs)
        agg = total_lanes * args.sweeps / tot_t
        print(f"{v:10s} " + " ".join(f"{p:9.1f}us" for p in per)
              + f"  {agg:,.0f}")


if __name__ == "__main__":
    main()
