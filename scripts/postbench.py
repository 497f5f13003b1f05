"""Warm post-processing attribution + A/B on the real chip.

Times ``process_residues_batched`` on the same 64-residue live workload
BENCH's ``post_warm_s_per_residue`` uses, split into its stages via the
``timings`` hook (host prep / GMM buckets / vote buckets / host finish),
interleaved over reps. Drives round-5 VERDICT item 7 (warm
<= 0.025 s/residue with bitwise-identical outputs).

Usage:
    python scripts/postbench.py [--reps 3] [--residues 64]
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
from basicrta_tpu.postprocess.batched import process_residues_batched  # noqa: E402
from basicrta_tpu.sampler.batch import bucket_residues, run_batch  # noqa: E402


def make_items(n_residues, seed=0):
    """The exact residue subset BENCH's post_warm_s_per_residue uses
    (bench.py: first n of the workload dict, collected from whichever
    bucket they land in). Sampler outputs are cached on disk so repeated
    profiling runs skip the sampling pass."""
    from bench import make_workload, TIMED_SWEEPS
    cfg = GibbsConfig(ncomp=15, niter=TIMED_SWEEPS, g=100)
    cache = f"/tmp/postbench_items_{n_residues}_{TIMED_SWEEPS}.npz"
    if os.path.exists(cache):
        z = np.load(cache, allow_pickle=True)
        return {k: tuple(v) for k, v in z["items"].item().items()}, cfg
    residues = make_workload(300)
    sub_names = set(list(residues)[:n_residues])
    items = {}
    for b in bucket_residues(residues):
        picked = [i for i, n in enumerate(b.names) if n in sub_names]
        if not picked:
            continue
        res = run_batch(b, cfg, engine="pallas")
        for i in picked:
            live = b.counts[i] > 0
            items[b.names[i]] = (res.mcweights[i][None],
                                 res.mcrates[i][None],
                                 b.values[i][live], b.counts[i][live])
    np.savez(cache, items=np.array(items, dtype=object))
    return items, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--residues", type=int, default=64)
    args = ap.parse_args()

    np.asarray(jnp.ones((8,)) * 2)     # tunnel warm-up
    items, cfg = make_items(args.residues)
    pcfg = GibbsConfig(ncomp=15, niter=cfg.niter, g=100,
                       burnin=cfg.niter // 10)
    process_residues_batched(items, pcfg)        # cold (compiles)

    stages = {}
    best_total = np.inf
    for rep in range(args.reps):
        t = {}
        t0 = time.time()
        process_residues_batched(items, pcfg, timings=t)
        total = time.time() - t0
        if total < best_total:
            best_total, stages = total, t
    n = len(items)
    print(f"\n{n} residues, warm total {best_total:.3f} s "
          f"({best_total / n * 1e3:.1f} ms/residue)")
    for k, v in stages.items():
        print(f"  {k:12s} {v:7.3f} s  ({v / n * 1e3:5.1f} ms/residue)")


if __name__ == "__main__":
    main()
