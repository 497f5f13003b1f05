"""Interleaved A/B timing of fused-kernel variants on the real chip.

Times ``segment_pallas`` directly, per DP-layout bucket of the canonical
300-residue bench workload, with variants interleaved across reps (the
axon tunnel drifts +-6%; see docs/design.md on timing methodology).

Usage:
    python scripts/abench.py [--sweeps 2000] [--reps 5] [--variants a,b,...]

Variants are named kwarg sets for segment_pallas; a variant may also pin
its bucket layout ("mixed" per-pair boundaries vs the "uniform"
64-column split) so layouts interleave in the same process.
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
    # pre-2026-08-19 default: inversion straight-line, BTRS early-exit
    "base": dict(early_exit=(False, True, True)),
    # BTRS unrolled straight-line too
    "btrs_sl": dict(early_exit=(False, False, True)),
    # everything early-exit (round-2 loser, re-baseline)
    "all_ee": dict(early_exit=(True, True, True)),
    # binary-splitting multinomial (log2 K sequential levels)
    "tree": dict(early_exit=(False, True, True), tree=True),
    "tree_sl": dict(early_exit=(False, False, True), tree=True),
    # BTRD regrouped accept test (early-exit / straight-line)
    "btrd": dict(early_exit=(False, "btrd", True)),
    "btrd_sl": dict(early_exit=(False, "btrd_sl", True)),
    # BTRD with native ratio logs (GOF-gated; see _binom_btrs)
    "btrd_nat": dict(early_exit=(False, "btrd_nat", True)),
    "btrd_nat_sl": dict(early_exit=(False, "btrd_nat_sl", True)),
    # layout A/B: k-way mixed-width bin-packing vs uniform 64-col
    # segments; kmaxN caps members per physical lane (kmax2 ~ the
    # round-3 pairwise layout's class, kmax8 the production default)
    "mixed": dict(layout="mixed", early_exit=(False, True, True)),
    "uniform": dict(layout="uniform", early_exit=(False, True, True)),
    "kmax2": dict(layout="kmax2", early_exit=(False, True, True)),
    "kmax4": dict(layout="kmax4", early_exit=(False, True, True)),
    "kmax6": dict(layout="kmax6", early_exit=(False, True, True)),
    "kmax8": dict(layout="kmax8", early_exit=(False, True, True)),
    # critical-path attribution ladder (round-5): production kernel with
    # cumulative stage ablations (pallas_sweep._Ablate); all at the
    # production early_exit default, adjacent differences attribute one
    # stage's serial cost
    "full": dict(),
    "abl_empty": dict(ablate="empty"),
    "abl_suffix": dict(ablate="suffix"),
    "abl_sconj": dict(ablate="suffix_conj"),
    "abl_single": dict(ablate="chain_single"),
    "abl_small": dict(ablate="chain_small"),
    "abl_inv": dict(ablate="chain_inv"),
    # lane-group width: fewer, wider sequential grid programs
    "g96": dict(group_cap=96),
    "g128": dict(group_cap=128),
    # binary-splitting multinomial at the production accept test
    "tree_nat": dict(tree=True),
    # small-tier inversion unrolled straight-line (vs early-exit default)
    "smallsl": dict(early_exit=(False, "btrd_nat", False)),
    # conjugate state orientation: legacy (.., G, K) lanes-on-K layout
    "conj_gk": dict(conj_kfirst=False),
    # round-5 production candidate: K-first conjugate + straight-line
    # small tier (both bitwise/distributionally safe)
    "prod5": dict(early_exit=(False, "btrd_nat", False)),
    "c_gk_ssl": dict(early_exit=(False, "btrd_nat", False),
                     conj_kfirst=False),
    # early-exit conjugate Gamma rounds (4th early_exit slot)
    "conj_ee": dict(early_exit=(False, "btrd_nat", False, True)),
    # BTRS round-loop shape at the new production base
    "btrs_h4": dict(early_exit=(False, "btrd_nat_h4", False, True)),
    "btrs_sl2": dict(early_exit=(False, "btrd_nat_sl", False, True)),
    # K-first conjugate retried on top of the early-exit rounds
    "kf_ee": dict(conj_kfirst=True),
}


def _layout_batches(residues, lay):
    if lay == "uniform":
        return bucket_residues(residues, mixed_pack=False)
    if lay.startswith("kmax"):
        return bucket_residues(residues, kmax=int(lay[4:]))
    return bucket_residues(residues)


def _build_runs(batches, cfg, n_blocks):
    """Per-bucket closures calling segment_pallas with the right packing
    inputs (mixed buckets are host-packed to their physical layout)."""
    from basicrta_tpu.sampler.batch import _mixed_row_tiers, _pack_mixed
    from basicrta_tpu.sampler.pallas_sweep import (packed_row_tiers,
                                                   pad_tiers_to_rows,
                                                   segment_pallas)
    runs = {}
    for bi, b in enumerate(batches):
        seg_mask = None
        B = b.size
        if b.bounds is not None:
            Bph = len(b.bounds)
            B = Bph * b.pack          # slot-ordered logical lanes
            v_ph, c_ph, seg_id, _ = _pack_mixed(
                np.asarray(b.values, np.float32),
                np.asarray(b.counts, np.float32), b.bounds, b.phys_rows)
            tiers = _mixed_row_tiers(c_ph)
            values = jnp.asarray(v_ph.reshape(Bph, -1))
            counts = jnp.asarray(c_ph.reshape(Bph, -1))
            seg_mask = jnp.asarray(seg_id)
        else:
            if b.pack > 1:
                seg_w = 128 // b.pack
                tiers = packed_row_tiers(b.tiers, seg_w,
                                         b.values.shape[1] // seg_w)
            else:
                tiers = pad_tiers_to_rows(b.tiers, b.values.shape[1])
            values = jnp.asarray(b.values, jnp.float32)
            counts = jnp.asarray(b.counts, jnp.float32)
        st0 = init_mixture_params(cfg.ncomp)
        state = MixtureState(jnp.tile(st0.weights, (B, 1)),
                             jnp.tile(st0.rates, (B, 1)))

        on_cpu = jax.devices()[0].platform != "tpu"

        def make(bi=bi, b=b, tiers=tiers, state=state, values=values,
                 counts=counts, seg_mask=seg_mask, on_cpu=on_cpu):
            def go(vkw):
                return segment_pallas(jnp.int32(bi + 1), jnp.int32(0),
                                      state, values, counts, cfg, n_blocks,
                                      tiers, pack=b.pack, seg_mask=seg_mask,
                                      interpret=on_cpu, **vkw)
            return go
        runs[bi] = make()
    return runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--residues", type=int, default=300)
    ap.add_argument("--variants", default="base,btrs_sl")
    ap.add_argument("--g", type=int, default=100)
    ap.add_argument("--layout", default="mixed",
                    choices=["mixed", "uniform"],
                    help="default bucket layout for variants without one")
    args = ap.parse_args()

    from bench import make_workload
    residues = make_workload(args.residues)
    cfg = GibbsConfig(ncomp=15, niter=args.sweeps, g=args.g)
    n_blocks = args.sweeps // args.g
    variants = args.variants.split(",")
    # any kmaxN is a valid layout variant even if not pre-listed
    vkw = {v: dict(VARIANTS.get(v, dict(layout=v,
                                        early_exit=(False, True, True))))
           for v in variants}
    vlayout = {v: vkw[v].pop("layout", args.layout) for v in variants}

    np.asarray(jnp.ones((8,)) * 2)  # absorb tunnel warm-up

    layouts = {}
    for lay in set(vlayout.values()):
        batches = _layout_batches(residues, lay)
        print(f"[{lay}] buckets:",
              [(b.values.shape, b.pack,
                b.phys_rows if b.bounds is not None else "-")
               for b in batches], file=sys.stderr)
        layouts[lay] = (batches, _build_runs(batches, cfg, n_blocks))

    # compile + warm every (variant, bucket) once
    for v in variants:
        _, runs = layouts[vlayout[v]]
        for bi in runs:
            t0 = time.time()
            st, W, R = runs[bi](vkw[v])
            np.asarray(W[:1, :1])
            print(f"warm {v} b{bi}: {time.time() - t0:.1f}s",
                  file=sys.stderr)

    # interleaved timed reps
    times = {}
    for rep in range(args.reps):
        for v in variants:
            _, runs = layouts[vlayout[v]]
            for bi in runs:
                t0 = time.time()
                st, W, R = runs[bi](vkw[v])
                np.asarray(W[:1, :1])   # sync (block_until_ready no-op)
                times.setdefault((v, bi), []).append(time.time() - t0)

    print(f"\n{'variant':10s} per-bucket us/sweep        agg_sweeps/s")
    for v in variants:
        batches, runs = layouts[vlayout[v]]
        total_lanes = sum(b.size for b in batches)
        per = [min(times[(v, bi)]) / args.sweeps * 1e6 for bi in runs]
        tot_t = sum(min(times[(v, bi)]) for bi in runs)
        agg = total_lanes * args.sweeps / tot_t
        print(f"{v:10s} " + " ".join(f"{p:9.1f}" for p in per)
              + f"  {agg:,.0f}")


if __name__ == "__main__":
    main()
