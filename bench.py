"""Headline benchmark: aggregated Gibbs sweeps/sec/chip on an all-residue run.

Workload: a full-protein-scale batch — 300 residues whose event counts span
1e2 .. 4.5e5 (one flagship residue matches the bundled W313 dataset's scale:
446,605 events) with K=15 mixture components, the reference's canonical
configuration (reference gibbs.py:133, BASELINE.md). Data is synthetic but
matched to the real dataset's computational shape (unique-value count and
multiplicity skew; W313 has V=870 unique times for 446k events).

Baseline: 2.11 sweeps/s measured for the reference's inner loop
(gibbs.py:196-211) on one CPU core on the flagship residue (BASELINE.md).
``vs_baseline`` is aggregate device sweeps/s divided by that number.

Prints ONE JSON line to stdout.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))

from basicrta_tpu.config import GibbsConfig  # noqa: E402
from basicrta_tpu.ops.surv import (discretize_times,  # noqa: E402
                                   simulate_hyperexp)
from basicrta_tpu.sampler.batch import (bucket_residues,  # noqa: E402
                                        finalize_batch, run_batch)

BASELINE_SWEEPS_PER_SEC = 2.11  # reference inner loop, 1 CPU core (BASELINE.md)
# reference-semantics contacts baseline: cKDTree periodic capped-distance
# search + vectorized per-residue-pair min reduction, 1 CPU core, measured
# by scripts/cpu_contacts_baseline.py on these exact workloads (BASELINE.md)
BASELINE_CONTACTS_FPS = 26.1        # membrane workload (14,800 atoms)
BASELINE_CONTACTS_LARGE_FPS = 7.57  # bilayer workload (101,400 atoms)
# overridable for smoke runs (e.g. BENCH_RESIDUES=8 BENCH_SWEEPS=200)
N_RESIDUES = int(os.environ.get("BENCH_RESIDUES", "300"))
# one full production segment (segment_blocks=100 x g=100): short enough to
# keep the bench fast, long enough that per-bucket dispatch/upload/sync
# overheads amortize as they do in a real 110k-sweep run
TIMED_SWEEPS = int(os.environ.get("BENCH_SWEEPS", "10000"))


def make_workload(n_residues=N_RESIDUES, seed=0):
    """Synthetic all-residue workload matched to the W313 dataset shape."""
    rng = np.random.default_rng(seed)
    # W313-posterior-like mixture: concentrated, V ~ 900 at N ~ 4.5e5
    w = np.array([0.87, 0.09, 0.03, 0.009, 0.001])
    r = np.array([4.7, 1.3, 0.33, 0.06, 0.009])
    residues = {}
    sizes = np.concatenate([
        [446605],  # flagship residue at the bundled dataset's size
        (10 ** rng.uniform(2.0, 5.3, n_residues - 1)).astype(int)])
    for i, n in enumerate(sizes):
        scale = rng.uniform(0.7, 1.5)
        residues[f"R{i}"] = discretize_times(
            simulate_hyperexp(int(n), w, r * scale, rng), 0.1)
    return residues


# regression floors: pallas raised after the round-4 k-way mixed-width
# layout (measured 1.244M on-chip 2026-08-20; r03 mixed layout measured
# 1.15M — floor ~0.8x the current measurement); xla/flagship are
# round-2 floors (measured 626-650k/179k/32k); warn loudly on regression.
# contacts floor raised after the 2026-08-20 host-layout + jitted-pass
# redesign (measured 78-138 f/s across sessions; the tunnel's share of
# the wall-clock swings ~2x with ambient load — see the breakdown's
# upload_s_per_frame — so the floor sits at ~0.6x the low end rather
# than 0.8x the mean).
# regression floors: ~78% of each metric's round-5 measured value
# (pallas 2.0M after the critical-path work, design.md round-5 section)
_GUARDS = {"pallas": 1_550_000.0, "xla": 140_000.0, "flagship": 30_000.0,
           "contacts": 45.0}


def make_membrane_frames(n_frames=96, batch=16, seed=7):
    """Membrane-scale synthetic contact workload: 300 protein residues x
    16 atoms against 200 lipids x 50 atoms (14,800 atoms in the two
    selections; VERDICT round-2 item 2 scale) in a 120x120x90 A box,
    residues as compact clusters so bounding-sphere pruning reflects a
    real bilayer's contact sparsity."""
    from basicrta_tpu.contacts.mapper import FrameBatch

    rng = np.random.default_rng(seed)
    R1, P1, R2, P2 = 300, 16, 200, 50
    box_l = np.array([120.0, 120.0, 90.0], np.float32)
    c1 = rng.uniform(0, 1, (R1, 3)) * box_l
    c2 = rng.uniform(0, 1, (R2, 3)) * box_l
    resids1 = np.repeat(np.arange(R1), P1)
    resids2 = np.repeat(np.arange(R2) + 1000, P2)
    batches = []
    for lo in range(0, n_frames, batch):
        F = min(batch, n_frames - lo)
        drift1 = c1[None] + rng.normal(0, 0.4, (F, R1, 3))
        drift2 = c2[None] + rng.normal(0, 0.4, (F, R2, 3))
        p1 = (drift1[:, :, None] + rng.normal(0, 2.0, (F, R1, P1, 3)))
        p2 = (drift2[:, :, None] + rng.normal(0, 2.5, (F, R2, P2, 3)))
        pos = np.concatenate([p1.reshape(F, -1, 3), p2.reshape(F, -1, 3)],
                             axis=1).astype(np.float32)
        batches.append(FrameBatch(
            np.arange(lo, lo + F), np.arange(lo, lo + F) * 0.1, pos,
            box=np.tile(box_l, (F, 1))))
    return batches, resids1, resids2, R1 * P1


def make_membrane_frames_large(n_frames=48, batch=16, seed=11):
    """Bilayer-scale synthetic contact workload: 400 protein residues x
    16 atoms against 1,900 lipids x 50 atoms — 101,400 atoms in the two
    selections (round-3 VERDICT item 1: a >=100k-atom datapoint) in a
    240x240x155 A box at the same ~88 A^3/atom density as the membrane
    workload. 608M atom pairs/frame puts it past
    ``prefilter_auto_pairs``, so this exercises the bounding-sphere
    pruned path the 14.8k-atom workload never reaches."""
    from basicrta_tpu.contacts.mapper import FrameBatch

    rng = np.random.default_rng(seed)
    R1, P1, R2, P2 = 400, 16, 1900, 50
    box_l = np.array([240.0, 240.0, 155.0], np.float32)
    c1 = rng.uniform(0, 1, (R1, 3)) * box_l
    c2 = rng.uniform(0, 1, (R2, 3)) * box_l
    resids1 = np.repeat(np.arange(R1), P1)
    resids2 = np.repeat(np.arange(R2) + 10000, P2)
    batches = []
    for lo in range(0, n_frames, batch):
        F = min(batch, n_frames - lo)
        drift1 = c1[None] + rng.normal(0, 0.4, (F, R1, 3))
        drift2 = c2[None] + rng.normal(0, 0.4, (F, R2, 3))
        p1 = (drift1[:, :, None] + rng.normal(0, 2.0, (F, R1, P1, 3)))
        p2 = (drift2[:, :, None] + rng.normal(0, 2.5, (F, R2, P2, 3)))
        pos = np.concatenate([p1.reshape(F, -1, 3), p2.reshape(F, -1, 3)],
                             axis=1).astype(np.float32)
        batches.append(FrameBatch(
            np.arange(lo, lo + F), np.arange(lo, lo + F) * 0.1, pos,
            box=np.tile(box_l, (F, 1))))
    return batches, resids1, resids2, R1 * P1


def bench_contacts(large=False, upload="f32"):
    """Frames/s through MapContacts (prefilter auto: dense at membrane
    scale, bounding-sphere pruned at the 101k-atom bilayer scale).
    ``upload='u16'`` measures the quantized wire format an XTC user gets
    (CLI --upload auto; halves the host->device bytes)."""
    from basicrta_tpu.config import ContactConfig
    from basicrta_tpu.contacts.mapper import MapContacts
    from basicrta_tpu.contacts.records import ContactMeta

    batches, resids1, resids2, A1 = (make_membrane_frames_large()
                                     if large else make_membrane_frames())
    n_frames = sum(len(b.frame_ids) for b in batches)
    A2 = len(resids2)
    mc = MapContacts(indices1=np.arange(A1), resids1=resids1,
                     indices2=np.arange(A1, A1 + A2), resids2=resids2,
                     cfg=ContactConfig(upload_dtype=upload),
                     meta=ContactMeta(ts=0.1))
    rec = mc.run(batches)             # cold (compiles)
    t0 = time.time()
    rec = mc.run(batches)             # warm
    elapsed = time.time() - t0
    return n_frames / elapsed, len(rec.frames), n_frames


def _bilayer_xtc_path(n_frames=48):
    """Write (once, cached) the bilayer workload as a real XTC file: the
    decode-inclusive stage-1 measurement the reference pays inline
    (reference contacts.py:100-132 iterates the trajectory reader in the
    hot loop). 101,400 atoms x n_frames through the native C codec."""
    from basicrta_tpu.io.native import XTCWriter
    path = os.path.join("/tmp", f"basicrta_bench_bilayer_{n_frames}.xtc")
    if os.path.exists(path):
        return path
    batches, _, _, _ = make_membrane_frames_large(n_frames=n_frames)
    tmp = path + ".tmp"
    w = XTCWriter(tmp)                # subsequent write() calls append
    for b in batches:
        w.write(np.asarray(b.positions, np.float32),
                np.asarray(b.times, np.float64),
                np.asarray(b.box, np.float32),
                steps=np.asarray(b.frame_ids, np.int32))
    os.replace(tmp, path)
    return path


def _file_batches(path, batch=16):
    """FrameBatch generator decoding an XTC chunk-by-chunk — the exact
    shape MapContacts.run consumes from Universe.iter_batches, so decode
    lands on the pipeline's main thread and overlaps device compute."""
    from basicrta_tpu.contacts.mapper import FrameBatch
    from basicrta_tpu.io.native import XTCReader

    rd = XTCReader(path)
    for lo in range(0, rd.nframes, batch):
        idx = np.arange(lo, min(lo + batch, rd.nframes))
        coords, times, box, _ = rd.read(idx)
        yield FrameBatch(idx, times,
                         coords, box=np.stack([np.diag(b) for b in box]))


def bench_contacts_e2e_file(n_frames=48, upload="u16"):
    """End-to-end frames/s from a real trajectory FILE at bilayer scale
    (round-5 VERDICT item 2): XTC decode + host layout/quantize + upload
    + device kernel + transfer + host assembly, nothing composed from
    parts. Returns (fps, decode_s_per_frame, rows).

    ``upload='u16'`` is what the CLI auto-selects for XTC input (the
    file's native storage grid is 0.01 A, so quantization adds nothing).
    """
    from basicrta_tpu.config import ContactConfig
    from basicrta_tpu.contacts.mapper import MapContacts
    from basicrta_tpu.contacts.records import ContactMeta

    path = _bilayer_xtc_path(n_frames)
    _, resids1, resids2, A1 = make_membrane_frames_large(n_frames=16)
    A2 = len(resids2)
    mc = MapContacts(indices1=np.arange(A1), resids1=resids1,
                     indices2=np.arange(A1, A1 + A2), resids2=resids2,
                     cfg=ContactConfig(upload_dtype=upload),
                     meta=ContactMeta(ts=0.1))
    # decode share: a dedicated pass through the reader alone
    t0 = time.time()
    for b in _file_batches(path):
        pass
    decode_s = (time.time() - t0) / n_frames
    mc.run(_file_batches(path))                  # cold (compiles)
    t0 = time.time()
    rec = mc.run(_file_batches(path))            # warm
    fps = n_frames / (time.time() - t0)
    return fps, decode_s, len(rec.frames)


def bench_contacts_e2e_file_cpu(n_frames=8):
    """File-driven CPU baseline: same XTC, native decode + the
    reference-semantics cKDTree contact search inline per frame (the
    shape of the reference's single-core stage 1). Few frames — the
    point is a per-frame rate."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    from cpu_contacts_baseline import cpu_contacts
    _, resids1, resids2, A1 = make_membrane_frames_large(n_frames=16)
    path = _bilayer_xtc_path()
    t0 = time.time()
    done = 0
    for b in _file_batches(path, batch=4):
        take = min(len(b.frame_ids), n_frames - done)
        b.positions = b.positions[:take]
        b.frame_ids, b.times = b.frame_ids[:take], b.times[:take]
        b.box = b.box[:take]
        cpu_contacts([b], resids1, resids2, A1)
        done += take
        if done >= n_frames:
            break
    return done / (time.time() - t0)


def bench_contacts_breakdown(reps=3, large=False, upload="f32"):
    """Attribute the contacts wall-clock (round-3 VERDICT item 5): the
    production device pass (MapContacts._device_pass — dense+compact at
    membrane scale, bounding-sphere pruned at bilayer scale) decomposed
    into host layout/quantize, host->device upload, device kernel compute,
    device->host link transfer of the fused buffer, and host row assembly
    — measured sequentially (no pipeline) so each phase syncs alone.
    Compare the phase sum against the pipelined bench_contacts number for
    overlap efficiency, and (device + host) alone for the local-attach
    projection (PCIe moves these buffers in ~0.1 ms/frame; the tunnel is
    a dev-environment artifact)."""
    import jax.numpy as jnp
    from basicrta_tpu.config import ContactConfig
    from basicrta_tpu.contacts.mapper import MapContacts
    from basicrta_tpu.contacts.records import ContactMeta

    cfg = ContactConfig(upload_dtype=upload)
    batches, resids1, resids2, A1 = (make_membrane_frames_large()
                                     if large else make_membrane_frames())
    n_frames = sum(len(b.frame_ids) for b in batches)
    A2 = len(resids2)
    mc = MapContacts(indices1=np.arange(A1), resids1=resids1,
                     indices2=np.arange(A1, A1 + A2), resids2=resids2,
                     cfg=cfg, meta=ContactMeta(ts=0.1))
    R1, R2 = len(mc.uniq_resids1), len(mc.uniq_resids2)
    prefilter = mc._prefilter_active()
    cap = int(cfg.prefilter_cap if prefilter else cfg.transfer_cap)
    mode = "pruned" if prefilter else "dense"
    if prefilter:
        # size the cap as the adaptive production loop would: the exact
        # fit's pow2 with the 1.25x margin
        rec = mc.run(batches)    # also warms the compile cache
        peak = 0
        for b in batches:
            pos, box, scale, use_pbc, tric, q = _bd_prepare(b, cfg)
            out = mc._jit_pass(pos, box, scale, mode="pruned",
                               cap=int(cfg.prefilter_cap), use_pbc=use_pbc,
                               triclinic=tric, quantized=q)
            n_pl = np.asarray(out)[:, 0].astype(np.int64)
            peak = max(peak, int(n_pl.max()))
        cap = 1 << (max((5 * peak) // 4, 16) - 1).bit_length()

    def sync(x):
        # the axon tunnel ignores block_until_ready; a 1-element transfer
        # is the only reliable sync (verify SKILL.md timing notes)
        np.asarray(jnp.ravel(x)[0])

    def run_pass(pos, box, scale, use_pbc, tric, q):
        out = mc._jit_pass(pos, box, scale, mode=mode, cap=cap,
                           use_pbc=use_pbc, triclinic=tric, quantized=q)
        return out[1] if mode == "dense" else out

    # warm everything once
    for b in batches:
        sync(run_pass(*_bd_prepare(b, cfg)))

    t_prep = t_up = t_dev = t_xfer = t_host = float("inf")
    for _ in range(reps):
        prep_s = up = dev = xfer = host = 0.0
        outs = []
        for b in batches:
            t0 = time.time()
            hostargs = _bd_prepare(b, cfg, host_only=True)
            prep_s += time.time() - t0
            t0 = time.time()
            pos = jnp.asarray(hostargs[0])
            box = (jnp.asarray(hostargs[1]) if hostargs[1] is not None
                   else None)
            scale = (jnp.asarray(hostargs[2]) if hostargs[2] is not None
                     else None)
            sync(pos)
            up += time.time() - t0
            t0 = time.time()
            out = run_pass(pos, box, scale, *hostargs[3:])
            sync(out)
            dev += time.time() - t0
            t0 = time.time()
            arr = np.asarray(out)
            xfer += time.time() - t0
            outs.append((arr, b))
        t0 = time.time()
        for arr, b in outs:
            c = (arr.shape[1] - 1) // 2
            cidx = arr[:, 1:1 + c].astype(np.int64)
            cd = arr[:, 1 + c:]
            fk, kk = np.nonzero(cd <= cfg.map_cutoff)
            flat = cidx[fk, kk]
            order = np.lexsort((flat, fk))
            fk, flat = fk[order], flat[order]
            _ = (np.asarray(b.frame_ids)[fk], mc.uniq_resids1[flat // R2],
                 mc.uniq_resids2[flat % R2], cd[fk, kk[order]],
                 np.asarray(b.times)[fk])
        host += time.time() - t0
        t_prep, t_up = min(t_prep, prep_s), min(t_up, up)
        t_dev = min(t_dev, dev)
        t_xfer, t_host = min(t_xfer, xfer), min(t_host, host)
    return {"prep_s_per_frame": t_prep / n_frames,
            "upload_s_per_frame": t_up / n_frames,
            "device_s_per_frame": t_dev / n_frames,
            "transfer_s_per_frame": t_xfer / n_frames,
            "host_s_per_frame": t_host / n_frames}


def _bd_prepare(b, cfg, host_only=False):
    """Host-side batch prep mirroring MapContacts.run's prepare (identity
    layout — the bench workloads' atoms are already residue-ordered)."""
    import jax.numpy as jnp
    positions = np.asarray(b.positions)
    boxarr = np.asarray(b.box)
    quantized = cfg.upload_dtype == "u16"
    scale = None
    if quantized:
        # the exact production quantizer (shared helper; wrap-safety
        # bound lives with it in contacts/quantize.py)
        from basicrta_tpu.contacts.quantize import quantize_u16
        positions, scale = quantize_u16(positions)
    else:
        positions = positions.astype(np.float32)
    boxarr = boxarr.astype(np.float32)
    if host_only:
        return positions, boxarr, scale, True, False, quantized
    return (jnp.asarray(positions), jnp.asarray(boxarr),
            None if scale is None else jnp.asarray(scale),
            True, False, quantized)


def transcendental_ceiling():
    """Measured pure-exp throughput ceiling of this chip's VPU [ops/s]:
    a Pallas kernel advancing 64 independent (256, 128) exp chains —
    deep enough ILP to be throughput- not latency-bound (the same
    kernel at 16 x (64, 128) measures 4-13x lower, which is the
    latency-vs-throughput gap the fused sweep kernel itself sits in;
    see docs/design.md). The roofline denominator for
    ``vpu_transcendental_util``."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS, TILES, R, L = 2000, 64, 256, 128

    def kernel(o_ref):
        xs = [jnp.full((R, L), 0.5 + 0.1 * t, jnp.float32)
              for t in range(TILES)]

        def body(i, xs):
            return tuple(jnp.exp(x * 1e-9) for x in xs)

        xs = jax.lax.fori_loop(0, ITERS, body, tuple(xs))
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[...] = acc

    @jax.jit
    def run():
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32))()

    np.asarray(run())                       # compile + warm
    # best-of-3 blocks of 5 pipelined reps: a single tunnel stall in a
    # block only discards that block instead of halving the measured
    # ceiling (observed 22 vs 43 GOPS session drift with one block)
    reps, best_dt = 5, float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = run()
        np.asarray(out)
        best_dt = min(best_dt, (time.time() - t0) / reps)
    return ITERS * TILES * R * L / best_dt


def _timed_agg(residues, cfg, engine, mixed_pack=True):
    """Aggregate sweeps/s for one engine (after its own warmup pass).
    Buckets are laid out per engine (packed fine ladder for pallas,
    coarse pow2 for xla — run_residues' policy) and dispatch with
    deferred transfers: bucket i+1 computes while bucket i streams
    back."""
    batches = bucket_residues(residues,
                              ladder=None if engine == "pallas" else "pow2",
                              mixed_pack=mixed_pack)
    for b in batches:
        run_batch(b, cfg, engine=engine)
    t0 = time.time()
    outs = [run_batch(b, cfg, engine=engine, defer_transfer=True)
            for b in batches]
    for o in outs:
        finalize_batch(o)
    elapsed = time.time() - t0
    return sum(b.size for b in batches) * cfg.niter / elapsed


def _preflight(timeout_s=240):
    """Fail fast (instead of hanging forever) when the device backend is
    unreachable: a wedged TPU tunnel blocks PJRT client init
    indefinitely, so probe it in a subprocess with a timeout before the
    in-process first device use."""
    import subprocess
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"bench preflight: device backend unreachable after "
              f"{timeout_s}s (wedged TPU tunnel?); aborting instead of "
              f"hanging", file=sys.stderr)
        sys.exit(1)
    if proc.returncode != 0:
        print(f"bench preflight: backend probe failed:\n{proc.stderr}",
              file=sys.stderr)
        sys.exit(1)
    print(f"bench preflight: platform {proc.stdout.strip()}",
          file=sys.stderr)


def main():
    _preflight()
    residues = make_workload()
    cfg = GibbsConfig(ncomp=15, niter=TIMED_SWEEPS, g=100)

    # headline engine (pallas with the mixed-width layout; degrade to the
    # uniform pallas layout, then xla, rather than losing the benchmark
    # if a kernel fails to build on this device)
    engine = "pallas"
    layout = "mixed"
    try:
        agg = _timed_agg(residues, cfg, engine)
    except Exception as e:  # noqa: BLE001
        print(f"mixed-layout pallas unavailable ({type(e).__name__}: "
              f"{e}); falling back to the uniform layout",
              file=sys.stderr)
        layout = "uniform"
        try:
            agg = _timed_agg(residues, cfg, engine, mixed_pack=False)
        except Exception as e2:  # noqa: BLE001
            print(f"pallas engine unavailable ({type(e2).__name__}); "
                  f"falling back to xla", file=sys.stderr)
            engine = "xla"
            agg = _timed_agg(residues, cfg, engine)

    # layout metrics from the SAME batches the headline number ran on
    # (a fallback must not report the default layout's waste/roofline)
    batches = bucket_residues(residues,
                              ladder=None if engine == "pallas" else "pow2",
                              mixed_pack=layout == "mixed")
    info = [(b.values.shape, b.tiers) for b in batches]
    # padding waste, two views: the raw column fraction (count-0 value
    # columns — the round-2 metric) and the calibrated WORK fraction
    # (what the padding actually costs per sweep; the DP layout
    # deliberately trades cheap padded columns for fewer ~30us-critical-
    # path dispatches, so the column fraction RISES while throughput
    # rises — see batch.modeled_work_waste and docs/design.md)
    from basicrta_tpu.sampler.batch import modeled_work_waste
    cols = sum(b.values.size for b in batches)
    live = sum(int((b.counts > 0).sum()) for b in batches)
    waste = 1.0 - live / cols
    work_waste = modeled_work_waste(batches)
    # physical-column waste: count-0 fraction of the (Bph, SL, 128) tiles
    # the kernel actually walks (the mixed-width layout shrinks the
    # physical rows, which the logical column fraction cannot see)
    phys_cols = phys_live = 0
    for b in batches:
        if b.bounds is not None:
            phys_cols += len(b.bounds) * b.phys_rows * 128
        elif b.pack > 1:
            phys_cols += (-(-b.size // b.pack)) * b.values.size // b.size * b.pack
        else:
            phys_cols += b.values.size
        phys_live += int((b.counts > 0).sum())
    phys_waste = 1.0 - phys_live / phys_cols
    print(f"buckets: {info}  col waste: {waste:.1%}  "
          f"phys col waste: {phys_waste:.1%}  "
          f"work waste: {work_waste:.1%}", file=sys.stderr)

    extras = {"engine": engine, "layout": layout,
              "padding_waste": round(waste, 4),
              "phys_padding_waste": round(phys_waste, 4),
              "modeled_work_waste": round(work_waste, 4)}

    # roofline: achieved transcendental ops/s in the fused kernel vs the
    # measured pure-exp VPU ceiling (substantiates docs/design.md's
    # "compute-bound"; VERDICT round-2 item 5)
    if engine == "pallas":
        try:
            from basicrta_tpu.sampler.pallas_sweep import (
                transcendentals_per_sweep)
            from basicrta_tpu.sampler.batch import (_mixed_row_tiers,
                                                    _pack_mixed)

            def _phys(b):
                if b.bounds is None:
                    return None
                _, c_ph, _, _ = _pack_mixed(
                    np.asarray(b.values, np.float32),
                    np.asarray(b.counts, np.float32), b.bounds,
                    b.phys_rows)
                return (b.phys_rows, *_mixed_row_tiers(c_ph),
                        len(b.bounds))

            per_sweep = sum(transcendentals_per_sweep(
                b.size, b.values.shape[1], b.pack, b.tiers, cfg.ncomp,
                phys=_phys(b))
                for b in batches)
            ceiling = transcendental_ceiling()
            achieved = per_sweep * agg / sum(b.size for b in batches)
            extras["vpu_transcendental_util"] = round(achieved / ceiling, 3)
            extras["transc_ceiling_gops"] = round(ceiling / 1e9, 1)
        except Exception as e:  # noqa: BLE001
            print(f"roofline failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    try:
        extras["xla_sweeps_per_sec"] = round(_timed_agg(residues, cfg,
                                                        "xla"), 1)
    except Exception as e:  # noqa: BLE001
        print(f"xla timing failed: {type(e).__name__}", file=sys.stderr)

    # flagship single-residue throughput (the W313-size lane alone); a
    # longer window so per-call dispatch latency doesn't dominate the
    # sub-100ms single-lane run
    try:
        fcfg = GibbsConfig(ncomp=15, niter=10 * TIMED_SWEEPS, g=100)
        fagg = _timed_agg({"R0": residues["R0"]}, fcfg, engine)
        extras["flagship_sweeps_per_sec"] = round(fagg, 1)
    except Exception as e:  # noqa: BLE001
        print(f"flagship timing failed: {type(e).__name__}", file=sys.stderr)

    # the SHIPPING CLI default is --nchains 2 (split-R-hat/ESS needs
    # >= 2 chains; library default stays 1 for exact reference
    # semantics — config.py n_chains). Measure the same 300-residue
    # workload with every residue doubled into two chain lanes, exactly
    # as run_residues expands it, so the ~12% two-chain cost is a
    # driver-recorded number rather than a design.md quote.
    # agg_sweeps_2chain counts LANE-sweeps (600 lanes); two_chain_cost
    # is the wall-clock overhead vs the single-chain headline.
    try:
        expanded = {}
        for name, t in residues.items():
            expanded[f"{name}#0"] = t
            expanded[f"{name}#1"] = t
        agg2 = _timed_agg(expanded, cfg, engine, mixed_pack=layout == "mixed")
        extras["agg_sweeps_2chain"] = round(agg2, 1)
        extras["two_chain_cost"] = round(2.0 * agg / agg2 - 1.0, 3)
    except Exception as e:  # noqa: BLE001
        print(f"2-chain timing failed: {type(e).__name__}", file=sys.stderr)

    # batched post-processing datapoint (round-1 VERDICT weak item 2: the
    # serial per-residue loop would have dominated full-protein runs);
    # warm pass = steady state once bucket programs are compiled
    try:
        from basicrta_tpu.postprocess.batched import process_residues_batched
        pcfg = GibbsConfig(ncomp=15, niter=TIMED_SWEEPS, g=100,
                           burnin=TIMED_SWEEPS // 10)
        sub_names = set(list(residues)[:64])
        items = {}
        for b in batches:
            picked = [i for i, n in enumerate(b.names) if n in sub_names]
            if not picked:
                continue
            # one extra (already-compiled) sampling pass to generate post
            # inputs; ~1/3 of one engine pass — acceptable for a live
            # datapoint instead of canned inputs
            res = run_batch(b, cfg, engine=engine)
            for i in picked:
                live = b.counts[i] > 0
                items[b.names[i]] = (res.mcweights[i][None],
                                     res.mcrates[i][None],
                                     b.values[i][live], b.counts[i][live])
        process_residues_batched(items, pcfg)       # cold (compiles)
        t0 = time.time()
        process_residues_batched(items, pcfg)       # warm
        t_post = time.time() - t0
        extras["post_warm_s_per_residue"] = round(t_post / len(items), 4)
    except Exception as e:  # noqa: BLE001
        print(f"post timing failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # contacts stage at membrane scale (round-3 VERDICT item 2) with the
    # measured reference-semantics CPU baseline ratio (round-4 item 1;
    # scripts/cpu_contacts_baseline.py, BASELINE.md)
    try:
        fps, n_rows, n_frames = bench_contacts()
        extras["contacts_frames_per_sec"] = round(fps, 1)
        extras["contacts_rows"] = int(n_rows)
        extras["contacts_vs_baseline"] = round(
            fps / BASELINE_CONTACTS_FPS, 2)
    except Exception as e:  # noqa: BLE001
        print(f"contacts timing failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # 101k-atom bilayer datapoint: the bounding-sphere pruned path's
    # scaling regime (round-3 VERDICT item 1), in both wire formats —
    # f32 (library default, exact) and u16 (what the CLI picks for XTC
    # inputs; halves the upload bytes, which bound throughput on this
    # tunnel-attached host)
    try:
        fps_l, rows_l, _ = bench_contacts(large=True)
        extras["contacts_large_frames_per_sec"] = round(fps_l, 1)
        extras["contacts_large_atoms"] = 101_400
        extras["contacts_large_vs_baseline"] = round(
            fps_l / BASELINE_CONTACTS_LARGE_FPS, 2)
        fps_lq, _, _ = bench_contacts(large=True, upload="u16")
        extras["contacts_large_u16_frames_per_sec"] = round(fps_lq, 1)
        extras["contacts_large_u16_vs_baseline"] = round(
            fps_lq / BASELINE_CONTACTS_LARGE_FPS, 2)
    except Exception as e:  # noqa: BLE001
        print(f"large contacts timing failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # end-to-end FILE-driven contacts at bilayer scale (round-5 VERDICT
    # item 2): decode-inclusive, nothing composed from parts; the CPU
    # row is the same XTC through native decode + the cKDTree
    # reference-semantics search (the reference's single-core stage-1
    # shape, contacts.py:100-132)
    try:
        fps_e2e, dec_s, rows_e2e = bench_contacts_e2e_file()
        extras["contacts_e2e_file_fps"] = round(fps_e2e, 1)
        extras["contacts_e2e_decode_s_per_frame"] = round(dec_s, 5)
        extras["contacts_e2e_rows"] = int(rows_e2e)
        cpu_fps = bench_contacts_e2e_file_cpu()
        extras["contacts_e2e_file_cpu_fps"] = round(cpu_fps, 2)
        extras["contacts_e2e_file_vs_cpu"] = round(fps_e2e / cpu_fps, 2)
    except Exception as e:  # noqa: BLE001
        print(f"file e2e contacts failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # wall-clock attribution of the contacts stage (round-3 VERDICT
    # item 5): host prep / upload / device / link transfer / host
    # assembly, plus overlap efficiency of the pipelined production path
    # and the local-attach projection (on a PCIe-attached host the upload
    # and transfer phases shrink to ~0.1 ms/frame; the prefetch thread
    # overlaps prep+upload with device compute, so steady-state wall is
    # the max of the phases, not their sum)
    try:
        bd = bench_contacts_breakdown()
        for k, v in bd.items():
            extras[f"contacts_{k}"] = round(v, 5)
        if "contacts_frames_per_sec" in extras:
            seq = sum(bd.values())
            pipe = 1.0 / extras["contacts_frames_per_sec"]
            extras["contacts_overlap_eff"] = round(seq / pipe, 3)
        extras["contacts_localattach_fps_proj"] = round(
            1.0 / max(bd["device_s_per_frame"], bd["prep_s_per_frame"],
                      bd["host_s_per_frame"]), 1)
        bdl = bench_contacts_breakdown(large=True, upload="u16")
        for k, v in bdl.items():
            extras[f"contacts_large_{k}"] = round(v, 5)
        # local-attach projection from the f32 wire: a PCIe-attached host
        # moves the f32 buffer in ~0.1 ms/frame, so the right production
        # choice there is f32 (no quantization prep at all) — u16 exists
        # for thin host links. Projection = slowest non-link phase.
        bdl32 = bench_contacts_breakdown(reps=2, large=True, upload="f32")
        extras["contacts_large_f32_prep_s_per_frame"] = round(
            bdl32["prep_s_per_frame"], 5)
        extras["contacts_large_f32_device_s_per_frame"] = round(
            bdl32["device_s_per_frame"], 5)
        # both wire formats' projections under explicit keys so
        # round-over-round comparisons stay like-for-like (the r04
        # contacts_large_localattach_fps_proj silently switched from the
        # u16- to the f32-derived figure; the ambiguous key is retired)
        extras["contacts_large_localattach_f32_fps_proj"] = round(
            1.0 / max(bdl32["device_s_per_frame"],
                      bdl32["prep_s_per_frame"],
                      bdl32["host_s_per_frame"]), 1)
        extras["contacts_large_localattach_u16_fps_proj"] = round(
            1.0 / max(bdl["device_s_per_frame"], bdl["prep_s_per_frame"],
                      bdl["host_s_per_frame"]), 1)
    except Exception as e:  # noqa: BLE001
        print(f"contacts breakdown failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # the north-star projection: 300 residues x 110k sweeps on a v5e-8
    # with lanes sharded over 8 chips (lane parallel, collective-free)
    extras["projected_v5e8_wallclock_s"] = round(
        N_RESIDUES * 110_000 / (agg * 8), 1)

    for key, guard in [("pallas" if engine == "pallas" else "xla", agg),
                       ("xla", extras.get("xla_sweeps_per_sec", np.inf)),
                       ("flagship",
                        extras.get("flagship_sweeps_per_sec", np.inf)),
                       ("contacts",
                        extras.get("contacts_frames_per_sec", np.inf))]:
        if guard < _GUARDS[key]:
            print(f"REGRESSION: {key} {guard:,.0f} < round-2 floor "
                  f"{_GUARDS[key]:,.0f} sweeps/s", file=sys.stderr)
    # post-processing is a time (lower is better): ceiling at ~2x the
    # r03/r04 measurements (0.047/0.063 s/residue warm)
    if extras.get("post_warm_s_per_residue", 0.0) > 0.13:
        print(f"REGRESSION: post_warm_s_per_residue "
              f"{extras['post_warm_s_per_residue']} > 0.13 ceiling",
              file=sys.stderr)

    print(json.dumps({
        "metric": "gibbs_sweeps_per_sec_per_chip",
        "value": round(agg, 1),
        "unit": f"sweeps/s/chip (aggregate, {N_RESIDUES}-residue batch, K=15)",
        "vs_baseline": round(agg / BASELINE_SWEEPS_PER_SEC, 1),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
