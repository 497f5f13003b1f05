"""Re-calibrate the layout DP's per-bucket cost model on the real chip.

The coefficients in sampler/batch.py (_COST_PER_BUCKET etc.) price a
bucket's per-sweep wall-clock from its physical layout; the DP and the
mixed-width packer arbitrate layouts with them. They are KERNEL-
dependent: round 5's sweep-kernel changes (straight-line small tier,
hybrid BTRS rounds, early-exit conjugate) moved every term, so the
round-4 fit no longer ranks layouts correctly.

Method: build the canonical 300-residue workload under many layout
endpoints (mixed kmax2..12, uniform, pow2, greedy), wall-time EVERY
distinct bucket at two sweep depths — per-sweep cost is the slope
(T(S2) - T(S1)) / (S2 - S1), which cancels the ~40 ms fixed per-call
tunnel/dispatch overhead — interleaving layouts across reps, then
least-squares fit

    T_sweep = c_bucket * NG + c_row * lanes * SL
              + c_head * lanes * head + c_small * lanes * (small - head)
              + c_lane * lanes * pack

and print the refit constants next to the current ones with per-bucket
residuals.

Usage:
    python scripts/calibrate_layout.py [--reps 3] [--s1 2000] [--s2 8000]
        [--layouts mixed,kmax2,...] [--json out.json]
"""

import argparse
import json
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
from basicrta_tpu.sampler import batch as bt  # noqa: E402
from basicrta_tpu.sampler.batch import bucket_residues  # noqa: E402
from basicrta_tpu.sampler.kernels import init_mixture_params, MixtureState  # noqa: E402


def _layout_batches(residues, lay):
    if lay == "uniform":
        return bucket_residues(residues, mixed_pack=False)
    if lay == "pow2":
        return bucket_residues(residues, ladder="pow2", mixed_pack=False)
    if lay == "greedy":
        return bucket_residues(residues, consolidate=False)
    if lay.startswith("kmax"):
        return bucket_residues(residues, kmax=int(lay[4:]))
    return bucket_residues(residues)


def _bucket_geometry(b):
    """Physical layout params the cost model charges: (Bph, SL, head,
    small, pack)."""
    from basicrta_tpu.sampler.batch import _mixed_row_tiers, _pack_mixed
    from basicrta_tpu.sampler.pallas_sweep import (packed_row_tiers,
                                                   pad_tiers_to_rows)
    if b.bounds is not None:
        Bph = len(b.bounds)
        _, c_ph, _, _ = _pack_mixed(
            np.asarray(b.values, np.float32),
            np.asarray(b.counts, np.float32), b.bounds, b.phys_rows)
        head, small = _mixed_row_tiers(c_ph)
        return Bph, b.phys_rows, head, small, b.pack
    if b.pack > 1:
        seg_w = 128 // b.pack
        SL = b.values.shape[1] // seg_w
        head, small = packed_row_tiers(b.tiers, seg_w, SL)
        return b.size // b.pack, SL, head, small, b.pack
    SL = max(b.values.shape[1] // 128, 1)
    head, small = pad_tiers_to_rows(b.tiers, b.values.shape[1])
    return b.size, SL, head, small, 1


def _make_run(b, cfg, n_blocks):
    from basicrta_tpu.sampler.batch import _mixed_row_tiers, _pack_mixed
    from basicrta_tpu.sampler.pallas_sweep import (packed_row_tiers,
                                                   pad_tiers_to_rows,
                                                   segment_pallas)
    seg_mask = None
    B = b.size
    if b.bounds is not None:
        Bph = len(b.bounds)
        B = Bph * b.pack
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

    def go():
        st, W, R = segment_pallas(jnp.int32(7), jnp.int32(0), state,
                                  values, counts, cfg, n_blocks, tiers,
                                  pack=b.pack, seg_mask=seg_mask,
                                  interpret=on_cpu)
        np.asarray(W[:1, :1])       # sync via transfer (tunnel)
    return go


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--s1", type=int, default=2000)
    ap.add_argument("--s2", type=int, default=8000)
    ap.add_argument("--residues", type=int, default=300)
    ap.add_argument("--layouts",
                    default="mixed,kmax2,kmax4,kmax8,uniform,pow2,greedy")
    ap.add_argument("--json", default="calibration_r05.json")
    ap.add_argument("--fit-only", action="store_true",
                    help="skip measurement; refit from --json")
    args = ap.parse_args()

    rows = []
    if args.fit_only:
        for p in args.json.split(","):
            rows.extend(json.load(open(p)))
    else:
        from bench import make_workload
        residues = make_workload(args.residues)
        g = 100
        runs = {}    # (layout, bi, S) -> (go, geometry)
        for lay in args.layouts.split(","):
            batches = _layout_batches(residues, lay)
            for bi, b in enumerate(batches):
                geom = _bucket_geometry(b)
                for S in (args.s1, args.s2):
                    cfg = GibbsConfig(ncomp=15, niter=S, g=g)
                    runs[(lay, bi, S)] = (_make_run(b, cfg, S // g), geom)
            print(f"[{lay}] {[(_bucket_geometry(b)) for b in batches]}",
                  file=sys.stderr)

        np.asarray(jnp.ones((8,)) * 2)          # tunnel warm-up
        for key, (go, _) in runs.items():
            t0 = time.time()
            go()
            print(f"warm {key}: {time.time() - t0:.1f}s", file=sys.stderr,
                  flush=True)
        times = {k: [] for k in runs}
        for rep in range(args.reps):
            for key, (go, _) in runs.items():
                t0 = time.time()
                go()
                times[key].append(time.time() - t0)
        seen = {}
        for (lay, bi, S), (go, geom) in runs.items():
            seen.setdefault((lay, bi), {})[S] = min(times[(lay, bi, S)])
        for (lay, bi), by_s in seen.items():
            geom = runs[(lay, bi, args.s1)][1]
            slope = ((by_s[args.s2] - by_s[args.s1])
                     / (args.s2 - args.s1) * 1e6)     # us/sweep
            rows.append({"layout": lay, "bucket": bi,
                         "Bph": geom[0], "SL": geom[1], "head": geom[2],
                         "small": geom[3], "pack": geom[4],
                         "us_per_sweep": slope})
        json.dump(rows, open(args.json, "w"), indent=1)

    # fit: T = c0*NG + c1*lanes*SL + c2*lanes*head + c3*lanes*(small-head)
    #          + c4*lanes*pack
    A, y = [], []
    for r in rows:
        NG, G = bt._phys_groups(r["Bph"], r["SL"], r["pack"])
        lanes = NG * G
        A.append([NG, lanes * r["SL"], lanes * r["head"],
                  lanes * (r["small"] - r["head"]), lanes * r["pack"]])
        y.append(r["us_per_sweep"])
    A, y = np.asarray(A), np.asarray(y)
    # nonnegative least squares: the terms are physical costs, and the
    # plain lstsq goes unphysical (negative dispatch constant) when the
    # sampled shapes leave features collinear
    from scipy.optimize import nnls
    coef, _ = nnls(A, y)
    pred = A @ coef
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    names = ["_COST_PER_BUCKET", "_COST_ROW", "_COST_HEAD_PREM",
             "_COST_SMALL_PREM", "_COST_LANE_LOG"]
    cur = [bt._COST_PER_BUCKET, bt._COST_ROW, bt._COST_HEAD_PREM,
           bt._COST_SMALL_PREM, bt._COST_LANE_LOG]
    print(f"\n{len(rows)} bucket timings, R^2 = {1 - ss_res / ss_tot:.3f}")
    print(f"{'coef':18s} {'current':>9s} {'refit':>9s}")
    for n, c, f in zip(names, cur, coef):
        print(f"{n:18s} {c:9.3f} {f:9.3f}")
    print("\nper-bucket (us/sweep): measured vs model")
    for r, p in zip(rows, pred):
        print(f"  {r['layout']:8s} b{r['bucket']} Bph={r['Bph']:<4d} "
              f"SL={r['SL']:<3d} h={r['head']} s={r['small']} "
              f"p={r['pack']:<2d}: {r['us_per_sweep']:7.1f} vs {p:7.1f}")


if __name__ == "__main__":
    main()
