#!/usr/bin/env python
"""Simulation-based calibration of the Gibbs sampler.

SBC (Talts et al. 2018): draw parameters from the model prior, simulate a
dataset from them, sample the posterior, and record the rank of the true
parameter among the posterior draws. If the sampler targets the correct
posterior, ranks are uniform over {0..S} across replicates — a whole-
posterior correctness check, far stronger than point-estimate recovery.

Mixture labels are not identifiable (label switching), so ranks are taken
on identifiable functionals of the parameters:

- mean residence time  E[x] = sum_k w_k / r_k
- survival probabilities S(t) = sum_k w_k exp(-r_k t) at several t

Every replicate dataset runs as one LANE of a single batched device
program — M replicates cost roughly one residue's wall-clock.

Usage: python scripts/sbc.py [--replicates 64] [--events 2000]
       [--niter 20000] [--ncomp 5]
Prints per-functional chi-square uniformity p-values; p > 0.01 for all
functionals passes.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def functionals(w, r, ts_probe):
    """Identifiable functionals of mixture params; w/r (..., K)."""
    mean = np.sum(w / r, axis=-1)
    surv = [np.sum(w * np.exp(-r * t), axis=-1) for t in ts_probe]
    return np.stack([mean] + surv, axis=-1)   # (..., 1+T)


def run_sbc(M=64, n_events=2000, ncomp=5, niter=20_000, g=100,
            burnin=4000, seed=0, engine="auto", progress=print,
            mixed_sizes=False):
    from basicrta_tpu.config import GibbsConfig
    from basicrta_tpu.sampler.batch import bucket_residues, run_batch

    rng = np.random.default_rng(seed)
    cfg = GibbsConfig(ncomp=ncomp, niter=niter, g=g, burnin=burnin,
                      seed=seed + 1)
    ts_probe = (0.5, 2.0, 10.0)

    # prior draws (the sampler's own prior: Dirichlet(alpha), Gamma(a, b))
    w_true = rng.dirichlet(np.full(ncomp, cfg.alpha_eff), M)
    r_true = rng.gamma(cfg.gamma_shape, 1.0 / cfg.gamma_rate, (M, ncomp))
    datasets = {}
    for m in range(M):
        n_m = n_events
        if mixed_sizes:
            # heterogeneous replicate sizes force the mixed-width packed
            # layout (per-lane slot widths, batch._mixed_kpack):
            # rank uniformity then certifies the seg-id kernel path on
            # the whole posterior, not just moments
            n_m = int(10 ** rng.uniform(np.log10(n_events / 4),
                                        np.log10(n_events)))
        comp = rng.choice(ncomp, n_m, p=w_true[m])
        datasets[f"S{m}"] = rng.exponential(1.0 / r_true[m][comp])

    # all replicates as lanes of one batched program (continuous times:
    # every value unique, the collapsed formulation degrades gracefully)
    batches = bucket_residues(datasets)
    if mixed_sizes:
        n_mixed = sum(b.bounds is not None for b in batches)
        progress(f"SBC layout: {len(batches)} buckets, {n_mixed} mixed")
    names, W, R = [], [], []
    for b in batches:
        res = run_batch(b, cfg, engine=engine)
        names += res.names
        W.append(res.mcweights)
        R.append(res.mcrates)
    W = np.concatenate(W, axis=0)    # (M, S, K)
    R = np.concatenate(R, axis=0)
    order = np.argsort([int(n[1:]) for n in names])
    W, R = W[order], R[order]

    b = cfg.burnin_samples
    post = functionals(W[:, b:], R[:, b:], ts_probe)   # (M, S', F)
    true = functionals(w_true, r_true, ts_probe)       # (M, F)
    S = post.shape[1]
    ranks = np.sum(post < true[:, None, :], axis=1)    # (M, F) in 0..S

    # chi-square uniformity per functional, ranks binned to B cells
    from scipy import stats
    B = 8
    labels = ["mean"] + [f"S({t})" for t in ts_probe]
    pvals = {}
    for f, lab in enumerate(labels):
        binned = np.bincount(np.minimum(ranks[:, f] * B // (S + 1), B - 1),
                             minlength=B)
        chi2 = np.sum((binned - M / B) ** 2 / (M / B))
        pvals[lab] = float(stats.chi2.sf(chi2, B - 1))
        progress(f"SBC {lab:8s}: ranks {binned.tolist()}  "
                 f"chi2 p={pvals[lab]:.3f}")
    return pvals, ranks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicates", type=int, default=64)
    ap.add_argument("--events", type=int, default=2000)
    ap.add_argument("--ncomp", type=int, default=5)
    ap.add_argument("--niter", type=int, default=20_000)
    ap.add_argument("--engine", default="auto")
    ap.add_argument("--mixed-sizes", action="store_true",
                    help="heterogeneous replicate sizes: calibrates the "
                         "mixed-width packed kernel path")
    ap.add_argument("--seed", type=int, default=0,
                    help="prior/data/sampler seed: a borderline fixed-"
                         "seed p-value is one random instance — check "
                         "uniformity ACROSS seeds before reading it as "
                         "miscalibration")
    args = ap.parse_args()
    pvals, _ = run_sbc(M=args.replicates, n_events=args.events,
                       ncomp=args.ncomp, niter=args.niter, seed=args.seed,
                       engine=args.engine, mixed_sizes=args.mixed_sizes)
    ok = all(p > 0.01 for p in pvals.values())
    print("SBC:", "PASS" if ok else "FAIL", pvals)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
