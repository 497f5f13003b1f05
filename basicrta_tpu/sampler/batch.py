"""Batched multi-residue Gibbs sampling.

The reference fans out one OS process per residue
(reference gibbs.py:73-88, scripts/create_jobs.sh) — 300+ single-core Python
loops. Here every residue (x every chain) is one lane of a single batched
device program: residues are bucketed by unique-value count, padded, stacked,
and swept together under ``vmap``; per-sweep latency is amortized across the
whole batch and the VPU runs full.

Sampling proceeds in host-level *segments* of whole thinning blocks so long
runs can report progress and checkpoint (the reference has no mid-run
checkpointing; a preempted 110k-sweep job restarts from zero,
cf. SURVEY.md section 5).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from basicrta_tpu.config import GibbsConfig
from basicrta_tpu.sampler.kernels import (MixtureState, collapsed_sweep,
                                          compute_tiers, dedup_times,
                                          init_mixture_params)


def _next_pow2(n: int, floor: int = 128, step: int = 2) -> int:
    """Smallest floor * step^k >= n (the geometric ladder every padded
    compile signature in the package quantizes to)."""
    b = floor
    while b < n:
        b *= step
    return b


@dataclasses.dataclass
class ResidueBatch:
    """A padded, stacked bucket of residues ready for batched sampling.

    Value columns are sorted by multiplicity descending per lane so the
    multiplicity-tiered multinomial sampler applies (kernels.SMALL_NMAX).

    ``pack > 1`` marks a *packed* bucket: ``values``/``counts`` have width
    ``128 // pack`` and the fused kernel lays ``pack`` consecutive logical
    lanes side by side in one physical 128-column lane, sharing the
    expensive per-row binomial draws while keeping one independent
    (weights, rates) chain per logical lane. The XLA engine runs the
    logical lanes directly (no 128-column requirement).
    """
    names: List[str]               # residue labels, length B
    values: np.ndarray             # (B, V) unique residence times
    counts: np.ndarray             # (B, V) multiplicities, 0 marks padding
    n_events: np.ndarray           # (B,) true event count per residue
    tiers: Tuple[int, int] = (0, 0)  # static tier boundaries
    pack: int = 1                  # logical lanes per physical kernel lane
    # mixed-width k-way packing: (Bph, pack) per-slot column WIDTHS —
    # physical lane g packs up to ``pack`` members side by side, slot s
    # owning the next widths[g, s] columns of all phys_rows rows (0 marks
    # an empty slot). Members are stored lane-major in slot order, set by
    # _mixed_kpack. None = uniform 128 // pack segments.
    bounds: Optional[np.ndarray] = None
    phys_rows: int = 0             # rows per physical lane (mixed only)

    @property
    def size(self) -> int:
        return len(self.names)


# packed segment widths: a residue with V <= 16/32 shares a physical lane
# 8/4-up; V <= 64 pairs into one row; larger residues pair into 64-column
# segments spanning r = ceil(V/64) rows when r is odd, else stay unpacked
_PACK_WIDTHS = (16, 32)
_PACK2_W = 64


def _pack_choice(V: int):
    """(width, pack) of the RAW fine ladder (``consolidate=False``) — the
    per-residue tightest class, kept for layout-pinning tests and as the
    fallback when the calibrated DP is bypassed. The production layout
    is :func:`_dp_layout`."""
    for w in _PACK_WIDTHS:
        if V <= w:
            return (w, 128 // w)
    r = -(-V // _PACK2_W)
    if r == 1 or r % 2 == 1:
        return (_PACK2_W * r, 2)
    return (-(-V // 128) * 128, 1)


# Calibrated per-sweep cost model [us/sweep on v5e], re-fit for the
# round-5 kernel (scripts/calibrate_layout.py: NNLS over 16 per-bucket
# slope timings across 6 layouts, R^2 = 0.995; slope of T(8000 sweeps)
# vs T(2000) cancels the fixed per-call cost). THE REGIME FLIPPED vs
# round 4: the ~30 us per-dispatch serial-latency constant that made
# few/deep buckets optimal measured ZERO after the round-5 loop-shape
# changes (straight-line small tier, hybrid BTRS, early-exit
# conjugate) — cost now scales with padded LANES times per-row work,
# i.e. the kernel moved from latency- to throughput-bound and padding
# is no longer nearly-free. _COST_PER_BUCKET now charges only the
# measured ~38 ms fixed per-call (tunnel dispatch + transfer) overhead
# amortized over the production 10k-sweep segment; _COST_ROW keeps a
# small floor (the fit assigns singleton rows ~0, but a free-rows model
# lets the DP pad rows without bound).
_COST_PER_BUCKET = 3.8      # us/sweep: per-call overhead / segment len
_COST_ROW = 0.020           # us/sweep per padded physical row (floor)
_COST_HEAD_PREM = 0.635     # per head-tier row x lane (BTRS + inversion)
_COST_SMALL_PREM = 0.109    # per small-tier row x lane (table inversion)
_COST_LANE_LOG = 0.120      # per logical lane (conjugate Gamma/Dirichlet)


def _phys_groups(Bph: int, SL: int, pack: int) -> Tuple[int, int]:
    """(NG, G) grid layout of a bucket of Bph physical lanes — mirrors the
    kernel's VMEM fit (pallas_sweep layout: ~12 MB of (K+12) live
    (SL, G, 128) rows + thinned tiles at the production K=15,
    n_blocks=100) so deep-SL configs are charged their real extra grid
    programs instead of the 64-lane ideal."""
    K_nom, nb_nom = 15, 100
    per_lane = (K_nom + 12) * SL * 128 * 4 + 2 * nb_nom * pack * K_nom * 4
    g_fit = max(8, ((12 * 2 ** 20) // per_lane) // 8 * 8)
    cap = min(64, g_fit)
    NG = -(-Bph // cap)
    G = max(8, (-(-Bph // NG) + 7) // 8 * 8)
    return NG, G


def _cost_terms(Bph: int, SL: int, head: int, small: int,
                pack: int) -> float:
    """Calibrated us/sweep from a bucket's PHYSICAL layout: per-grid-
    program constant + per-row terms over the padded lane count. The
    critical path is paid once per GRID PROGRAM: pallas grid steps run
    serially on the core (every calibration bucket had NG=1, so charging
    NG * const is the conservative extrapolation)."""
    NG, G = _phys_groups(Bph, SL, pack)
    lanes = NG * G
    return (_COST_PER_BUCKET * NG
            + lanes * SL * _COST_ROW
            + lanes * head * _COST_HEAD_PREM
            + lanes * (small - head) * _COST_SMALL_PREM
            + lanes * pack * _COST_LANE_LOG)


def _layout_cost(B: int, width: int, pack: int, head_end: int,
                 single_start: int) -> float:
    """Modeled us/sweep for one bucket of B lanes whose worst member has
    ``head_end`` head-tier and ``single_start`` multi-count columns --
    the objective _dp_layout minimizes (the column-padding fraction is
    NOT the work metric: rows are the kernel's work unit, lanes pad to
    8-sublane groups, and every bucket pays ~30 us of serial critical
    path regardless of size)."""
    seg_w = 128 // pack if pack > 1 else 128
    SL = max(1, width // seg_w)
    head = min(-(-head_end // seg_w), SL)
    small = min(max(-(-single_start // seg_w), head), SL)
    return _cost_terms(-(-B // pack), SL, head, small, pack)


def _bucket_cost(members, width: int, pack: int) -> float:
    """_layout_cost of a concrete member list."""
    if not members:
        return 0.0
    from basicrta_tpu.sampler.kernels import SMALL_NMAX
    head_end = max(int(np.sum(c > SMALL_NMAX)) for _, _, c in members)
    single_start = max(int(np.sum(c > 1)) for _, _, c in members)
    return _layout_cost(len(members), width, pack, head_end, single_start)


def modeled_work_waste(batches: Sequence["ResidueBatch"]) -> float:
    """Fraction of modeled per-sweep kernel WORK spent on padding, under
    the calibrated _layout_cost row terms (the per-bucket dispatch
    constant is critical path, not padding, and is excluded).

    The raw column fraction (count-0 columns / columns) overstates waste
    for the DP layout on purpose: the layout trades padded columns for
    fewer, deeper buckets because a padded singleton row costs 0.08
    us/lane-sweep while each extra bucket costs ~30 us/sweep of serial
    critical path. This metric weighs every padded row/lane by what it
    actually costs: live work counts a residue's live columns at the
    per-column rate of its tier (a row of 128 columns costs the row
    rate), padded work is the layout's physical rows/lanes at the same
    rates."""
    from basicrta_tpu.sampler.kernels import SMALL_NMAX
    padded = live = 0.0
    for b in batches:
        if b.bounds is not None:
            # mixed-width layout: cost from the actual physical rows
            Bph, SL = len(b.bounds), b.phys_rows
            cost = _mixed_cost([(None, None, c) for c in b.counts],
                               b.bounds, b.phys_rows)
        else:
            Bph = -(-b.size // b.pack)
            seg_w = 128 // b.pack if b.pack > 1 else 128
            SL = max(1, b.values.shape[1] // seg_w)
            head_end = int(max((np.sum(c > SMALL_NMAX) for c in b.counts),
                               default=0))
            single_start = int(max((np.sum(c > 1) for c in b.counts),
                                   default=0))
            cost = _layout_cost(b.size, b.values.shape[1], b.pack,
                                head_end, single_start)
        padded += cost - _COST_PER_BUCKET * _phys_groups(Bph, SL,
                                                         b.pack)[0]
        for c in b.counts:
            n_head = float(np.sum(c > SMALL_NMAX))
            n_multi = float(np.sum(c > 1))
            n_live = float(np.sum(c > 0))
            live += (n_live * _COST_ROW
                     + n_head * _COST_HEAD_PREM
                     + (n_multi - n_head) * _COST_SMALL_PREM) / 128.0
            live += _COST_LANE_LOG
    return 1.0 - live / padded if padded > 0 else 0.0


def _mixed_kpack(group, kmax: int = 12):
    """Mixed-width k-way layout of one bucket: bin-pack members into
    128-column physical lanes, member i owning ceil(V_i / SL) columns of
    all SL rows, up to ``kmax`` members per lane (default 12 — the
    measured on-chip plateau: the canonical 300-residue workload runs
    uniform 927k / kmax2 950k / kmax4 1.111M / kmax8 1.148M / kmax12
    1.190M agg sweeps/s in the interleaved abench sweep, and the
    modeled layout for kmax=16 is identical to kmax=12).

    For every candidate (SL, k) the members are packed best-fit in
    decreasing width order (BFD sits within 11/9 of the optimal lane
    count) and the calibrated cost model arbitrates across candidates:
    deeper SL narrows every member's segment but adds rows to every lane;
    more members per lane cuts lanes but grows the per-lane state and
    mask blends. Supersedes the round-3 head-tail pack=2 pairing — a
    bucket of V<=82 members packs 4-8 residues per lane where pairing
    left half of every 128-column row as count-0 padding.

    ``kmax`` caps the O(pack) per-(G, 128)-tile mask blends in the
    kernel's suffix pass (per sweep, not per row: negligible to ~8).

    Returns (ordered_members, widths, SL): members lane-major in slot
    order, widths (Bph, pack) per-slot column widths (0 = empty slot,
    pack = max fill), SL physical rows per lane.
    """
    Vs = [len(v) for _, v, _ in group]
    Vmax = max(Vs)
    min_sl = max(1, -(-Vmax // 128))
    cand_sl = sorted(set(list(range(min_sl, 3 * min_sl + 1))
                         + [(min_sl * f) // 2 for f in (7, 8)]))
    order = sorted(range(len(group)), key=lambda i: -Vs[i])
    best = None
    for SL in cand_sl:
        ws = [-(-V // SL) for V in Vs]
        if max(ws) > 128:
            continue
        for k in range(2, kmax + 1):
            lanes = []                     # [free_cols, [member_idx, ...]]
            for i in order:
                w = ws[i]
                fit = None
                for L in lanes:
                    if L[0] >= w and len(L[1]) < k and (
                            fit is None or L[0] < fit[0]):
                        fit = L            # best (tightest) fit
                if fit is None:
                    lanes.append([128 - w, [i]])
                else:
                    fit[0] -= w
                    fit[1].append(i)
            pack = max(len(L[1]) for L in lanes)
            if pack < 2:
                continue
            widths = np.zeros((len(lanes), pack), np.int64)
            members = []
            for g, (_, idxs) in enumerate(lanes):
                for s, i in enumerate(idxs):
                    members.append(group[i])
                    widths[g, s] = ws[i]
            cost = _mixed_cost(members, widths, SL)
            if best is None or cost < best[0]:
                best = (cost, members, widths, SL)
    if best is None:                       # single member or none fit
        m = group[0]
        return [m], np.asarray([[128]], np.int64), -(-len(m[1]) // 128)
    return best[1], best[2], best[3]


def _mixed_cost(members, widths: np.ndarray, SL: int) -> float:
    """Calibrated modeled us/sweep of a mixed-width k-way bucket: same
    row terms as _layout_cost but with the packing's actual physical rows
    and per-member segment widths (member i's head/multi columns occupy
    its first ceil(H_i / w_i) rows of its own segment)."""
    from basicrta_tpu.sampler.kernels import SMALL_NMAX
    ws = widths[widths > 0]       # row-major nonzero == member order
    head = small = 0
    for (name, v, c), w in zip(members, ws):
        H = int(np.sum(c > SMALL_NMAX))
        S1 = int(np.sum(c > 1))
        head = max(head, -(-H // int(w)))
        small = max(small, -(-S1 // int(w)))
    small = min(max(small, head), SL)
    head = min(head, SL)
    return _cost_terms(len(widths), SL, head, small, widths.shape[1])


def _pack_mixed(values_np: np.ndarray, counts_np: np.ndarray,
                widths: np.ndarray, SL: int):
    """Host-side physical packing of a mixed-width k-way bucket.

    values/counts: (B_true, V) TRUE members, lane-major in slot order
    (the order _mixed_kpack returns); widths: (Bph, pack) per-slot column
    widths, 0 marking empty slots (all-zero rows are whole padding lanes).
    Returns (v_ph, c_ph, seg_id, slot_idx): physical (Bph, SL, 128) row
    layouts, the (Bph, 128) f32 per-column owning-slot-index tile the
    kernel consumes (pallas_sweep segment_pallas), and the (B_true,)
    logical slot index g * pack + s of each member — the gather map from
    the kernel's (Bph * pack, ...) slot-ordered outputs back to members.
    """
    Bph, pack = widths.shape
    B, V = values_np.shape
    v_ph = np.ones((Bph, SL, 128), np.float32)
    c_ph = np.zeros((Bph, SL, 128), np.float32)
    seg_id = np.zeros((Bph, 128), np.float32)
    slot_idx = []
    i = 0
    for g in range(Bph):
        off = 0
        for s in range(pack):
            w = int(widths[g, s])
            if w == 0:
                continue
            if i >= B:
                raise ValueError("mixed-pack underflow: widths name more "
                                 f"slots than the {B} members provided")
            cap = SL * w
            n = min(cap, V)
            if counts_np[i, cap:].any():
                # a plain assert would vanish under python -O and the
                # min(cap, V) copy below would then silently DROP events
                raise ValueError(
                    f"mixed-pack overflow: member {i} has live columns "
                    f"beyond its segment capacity {cap} (SL={SL}, "
                    f"width={w}) — widths/layout inconsistency")
            va = np.ones((cap,), np.float32)
            ca = np.zeros((cap,), np.float32)
            va[:n] = values_np[i, :n]
            ca[:n] = counts_np[i, :n]
            v_ph[g, :, off:off + w] = va.reshape(SL, w)
            c_ph[g, :, off:off + w] = ca.reshape(SL, w)
            seg_id[g, off:off + w] = s
            slot_idx.append(g * pack + s)
            off += w
            i += 1
    if i != B:
        raise ValueError(f"mixed-pack underflow: {B} members but widths "
                         f"name only {i} slots")
    return v_ph, c_ph, seg_id, np.asarray(slot_idx, np.int64)


def _mixed_row_tiers(c_ph: np.ndarray) -> Tuple[int, int]:
    """Physical-row tier boundaries of a mixed-packed bucket: each segment
    is multiplicity-sorted row-major, so per-row maxima are non-increasing
    and the tier samplers stay exact on whole rows."""
    from basicrta_tpu.sampler.kernels import SMALL_NMAX
    rowmax = c_ph.max(axis=(0, 2)) if c_ph.size else np.zeros((0,))
    head = int((rowmax > SMALL_NMAX).sum())
    small = max(int((rowmax > 1).sum()), head)
    return head, small


def _dp_configs(Vm: int):
    """Every kernel-supported (width, pack) class that fits a bucket whose
    largest member has Vm live columns: sub-row sharing for the small
    widths, 2-up 64-column segments at ANY row count (the kernel's
    packed path is parity-agnostic; even row counts halve the
    head-tier's column reach vs the 128-wide row), and the unpacked
    128-quantized lane."""
    out = []
    for w in _PACK_WIDTHS:
        if Vm <= w:
            out.append((w, 128 // w))
    out.append((_PACK2_W * -(-Vm // _PACK2_W), 2))
    out.append((-(-Vm // 128) * 128, 1))
    return out


def _dp_layout(items) -> List[Tuple[Tuple[int, int], list]]:
    """Minimum-cost contiguous partition of the V-sorted residue list.

    Exact DP over the _layout_cost objective with every _dp_configs
    class as a per-bucket candidate, under the CALIBRATED _layout_cost
    model. Because every bucket's sweep pays ~30 us of serial sampling
    critical path that extra lanes merely ride under, the optimum is a
    few DEEP buckets, not many tight ones. Measured endpoints on the
    canonical 300-residue bench (v5e, interleaved reps, agg sweeps/s):
    greedy ladder + counter-move consolidation (8 buckets) 737k; a
    row-minimizing 12-bucket DP under the old rows-only objective 624k;
    this calibrated DP (3 buckets: (128,2) x128, (384,2) x110,
    (768,2) x62) 990k; forced 2 buckets 866k; forced 1 bucket 590k --
    the U-shape the per-grid-program constant + padded-row terms
    predict. Supersedes the greedy _pack_choice ladder + consolidation.

    Returns [(key=(width, pack), members), ...]; several buckets may
    share a key, so the result is a list, not a dict.
    """
    from basicrta_tpu.sampler.kernels import SMALL_NMAX
    items = sorted(items, key=lambda it: len(it[1]))
    n = len(items)
    H = [int(np.sum(c > SMALL_NMAX)) for _, _, c in items]
    S1 = [int(np.sum(c > 1)) for _, _, c in items]
    dp = [0.0] + [float("inf")] * n    # dp[j]: min cost of items[:j]
    cut = [0] * (n + 1)
    cfg = [None] * (n + 1)
    for j in range(1, n + 1):
        Vm = len(items[j - 1][1])
        hmax = smax = 0
        for i in range(j - 1, -1, -1):
            hmax = max(hmax, H[i])
            smax = max(smax, S1[i])
            best, bkey = float("inf"), None
            for (w, p) in _dp_configs(Vm):
                c = _layout_cost(j - i, w, p, hmax, smax)
                if c < best:
                    best, bkey = c, (w, p)
            tot = dp[i] + best
            if tot < dp[j]:
                dp[j], cut[j], cfg[j] = tot, i, bkey
    groups = []
    j = n
    while j > 0:
        i = cut[j]
        groups.append((cfg[j], items[i:j]))
        j = i
    groups.reverse()
    return groups


def _kpack_or_uniform_cost(key, group, kmax: int = 12) -> float:
    """Modeled cost of a bucket under its best layout: the uniform
    (width, pack) class or the k-way mixed packing, whichever is
    cheaper (mirrors the adoption rule in bucket_residues)."""
    c = _bucket_cost(group, key[0], key[1])
    if len(group) > 1:
        m, w, sl = _mixed_kpack(group, kmax=kmax)
        c = min(c, _mixed_cost(m, w, sl))
    return c


def _merge_adjacent(groups, kmax: int = 12):
    """Greedy merge pass over the DP partition under the k-way cost.

    The DP partitions under UNIFORM width classes (its per-bucket cost
    upper bounds), where splitting heterogeneous ranges is often worth a
    30 us dispatch constant; k-way mixed packing changes that calculus —
    a V=88 member can fill a V=740 lane's slack columns — so adjacent
    buckets whose merged k-way layout models cheaper than the pair are
    merged until no merge improves. Cuts both grid-program constants and
    padded rows; modeled_work_waste 0.44 -> ~0.29 on the canonical
    300-residue workload.
    """
    groups = list(groups)
    costs = [_kpack_or_uniform_cost(k, g, kmax) for k, g in groups]
    while len(groups) > 1:
        best = None
        for i in range(len(groups) - 1):
            merged = groups[i][1] + groups[i + 1][1]
            Vm = max(len(v) for _, v, _ in merged)
            key = (-(-Vm // 128) * 128, 1)
            c = _kpack_or_uniform_cost(key, merged, kmax)
            gain = costs[i] + costs[i + 1] - c
            if gain > 1e-9 and (best is None or gain > best[0]):
                best = (gain, i, key, merged, c)
        if best is None:
            break
        _, i, key, merged, c = best
        groups[i:i + 2] = [(key, merged)]
        costs[i:i + 2] = [c]
    return groups


def bucket_residues(times_per_residue: Dict[str, np.ndarray],
                    floor: Optional[int] = None,
                    pack_small: bool = True,
                    ladder: Optional[str] = None,
                    consolidate: bool = True,
                    mixed_pack: bool = True,
                    kmax: int = 12) -> List[ResidueBatch]:
    """Group residues into 128-column-quantized unique-count buckets.

    Residence times are multiples of the trajectory interval, so the unique
    count V is small even for huge residues (the bundled 446,605-event W313
    dataset has V = 870). ``floor=None`` (default) uses the 128-column
    ladder: per-sweep cost in the fused kernel scales with a lane's value
    rows, so letting small residues run in small-V buckets beats one
    max-V bucket whose padding columns all lanes must walk (remeasured
    with transfer-synced timing on v5e: ladder 684k vs single-bucket 513k
    agg sweeps/s on the 300-residue bench; an earlier single-bucket win
    was an artifact of ``block_until_ready`` not blocking on the
    remote-attached device). Widths quantize to whole 128-lane rows — the
    fused kernel's work unit — rather than powers of two: a V=300 residue
    walks 3 rows, not 4. Tier widths — the expensive rows — are set by
    each bucket's multiplicity profile, so small buckets also carry fewer
    heavy-sampler rows.

    With ``pack_small`` (default, applies only to the default ladder —
    an explicit ``floor`` keeps the caller's single-bucket layout),
    residues go to *packed* buckets: V <= 16/32 shares a physical
    128-column lane 8/4-up, and everything larger packs 2-up into
    64-column segments spanning ceil(V/64) rows — work quantizes to
    64-column granularity instead of 128, and each packed row's
    expensive binomial draws are shared between the paired residues
    (round-2 bench: 37.6% of value columns were count-0 padding; the
    16/32/64 ladder alone still left 19.6%).

    ``ladder='pow2'`` restores the coarse power-of-two, unpacked layout —
    the right shape for the XLA engine, whose per-sweep graph pays a
    fixed dispatch/fusion overhead per bucket that the fine packed
    ladder multiplies (measured 197k -> 130k agg sweeps/s on v5e when
    the XLA engine ran the 14-bucket packed layout).
    """
    items = []
    for name, t in times_per_residue.items():
        if len(t) == 0:
            continue
        v, c = dedup_times(t)
        items.append((name, v, c))
    packing = pack_small and floor is None and ladder != "pow2"
    if floor is None:
        floor = 128
    if packing and consolidate:
        groups = _dp_layout(items)
        if mixed_pack:
            groups = _merge_adjacent(groups, kmax=kmax)
    else:
        buckets: Dict[Tuple[int, int], list] = {}
        for name, v, c in items:
            if packing:
                key = _pack_choice(len(v))
            elif ladder == "pow2":
                key = (_next_pow2(len(v), floor), 1)
            else:
                key = (max(floor, -(-len(v) // 128) * 128), 1)
            buckets.setdefault(key, []).append((name, v, c))
        groups = sorted(buckets.items())

    out = []
    for (V, pack), group in groups:
        bounds, phys_rows = None, 0
        if mixed_pack and packing and consolidate and len(group) > 1:
            # mixed-width post-pass: the DP partitions under its uniform
            # width classes (upper bounds); k-way per-lane widths then
            # shrink a bucket's physical rows wherever member sizes vary
            # (the uniform 64-column split makes a V=385 member walk its
            # V=768 partner's 12 rows; and a lane can hold up to 8 small
            # members instead of 2). Adopted when the calibrated cost
            # model says the packing beats the bucket's uniform class —
            # including converting unpacked buckets whose heterogeneity
            # the DP could not see.
            m_members, m_widths, m_rows = _mixed_kpack(group, kmax=kmax)
            if (_mixed_cost(m_members, m_widths, m_rows)
                    < _bucket_cost(group, V, pack)):
                group = m_members
                bounds, phys_rows = m_widths, m_rows
                pack = int(m_widths.shape[1])
                V = max(len(v) for _, v, _ in group)
        B = len(group)
        values = np.zeros((B, V), np.float64)
        counts = np.zeros((B, V), np.float64)
        names, n_events = [], []
        for i, (name, v, c) in enumerate(group):
            # padded rows keep value 1.0 (any positive finite) with count 0
            values[i, :len(v)] = v
            values[i, len(v):] = 1.0
            counts[i, :len(c)] = c
            names.append(name)
            n_events.append(int(c.sum()))
        order, tiers = compute_tiers(counts)
        values = np.take_along_axis(values, order, axis=-1)
        counts = np.take_along_axis(counts, order, axis=-1)
        out.append(ResidueBatch(names, values, counts,
                                np.asarray(n_events), tiers, pack=pack,
                                bounds=bounds, phys_rows=phys_rows))
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "n_blocks", "tiers"))
def _segment(keys: jax.Array, state: MixtureState, values: jax.Array,
             counts: jax.Array, cfg: GibbsConfig, n_blocks: int,
             tiers: Optional[Tuple[int, int]] = None):
    """Advance every lane by ``n_blocks`` thinning blocks (n_blocks*g sweeps).

    keys: (B,) per-lane keys for this segment. Returns the advanced states
    and the (B, n_blocks, K) thinned samples.
    """
    def lane(key, st, v, c):
        def block(st, block_key):
            sweep_keys = jax.random.split(block_key, cfg.g)
            st, _ = jax.lax.scan(
                lambda s, k: (collapsed_sweep(k, s, v, c, cfg,
                                              tiers=tiers)[0], None),
                st, sweep_keys)
            return st, (st.weights, st.rates)

        block_keys = jax.random.split(key, n_blocks)
        st, (W, R) = jax.lax.scan(block, st, block_keys)
        return st, W, R

    return jax.vmap(lane)(keys, state, values, counts)


@dataclasses.dataclass
class BatchResult:
    names: List[str]
    mcweights: np.ndarray   # (B, S, K)
    mcrates: np.ndarray     # (B, S, K)
    n_events: np.ndarray    # (B,)


def _checkpoint_key(batch: ResidueBatch, cfg: GibbsConfig,
                    engine: str = "xla") -> str:
    import hashlib
    h = hashlib.sha1()
    h.update(",".join(batch.names).encode())
    h.update(cfg.to_json().encode())
    h.update(engine.encode())
    h.update(np.ascontiguousarray(batch.counts).tobytes())
    # values too: the same residues re-extracted with a different timestep
    # scale keep their multiplicities but change every residence time
    h.update(np.ascontiguousarray(batch.values).tobytes())
    return h.hexdigest()[:16]


def save_checkpoint(path: str, batch: ResidueBatch, cfg: GibbsConfig,
                    done_blocks: int, seg_idx: int, state: MixtureState,
                    Ws: List[np.ndarray], Rs: List[np.ndarray],
                    engine: str = "xla") -> str:
    """Persist mid-run sampler state; atomic via rename."""
    if not path.endswith(".npz"):
        path += ".npz"
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp, key=_checkpoint_key(batch, cfg, engine),
        done_blocks=done_blocks,
        seg_idx=seg_idx,
        weights=np.asarray(state.weights), rates=np.asarray(state.rates),
        W=np.concatenate(Ws, axis=1) if Ws else np.zeros((batch.size, 0, 1)),
        R=np.concatenate(Rs, axis=1) if Rs else np.zeros((batch.size, 0, 1)))
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, batch: ResidueBatch, cfg: GibbsConfig,
                    engine: str = "xla"):
    """Returns (done_blocks, seg_idx, state, Ws, Rs) or None when absent or
    mismatched.

    A checkpoint only resumes the exact same workload (same residues,
    counts, and config) — guarded by a content hash.
    """
    if not path.endswith(".npz"):
        path += ".npz"
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        if str(z["key"]) != _checkpoint_key(batch, cfg, engine):
            return None
        state = MixtureState(jnp.asarray(z["weights"]),
                             jnp.asarray(z["rates"]))
        done = int(z["done_blocks"])
        seg_idx = int(z["seg_idx"])
        Ws = [z["W"]] if z["W"].shape[1] else []
        Rs = [z["R"]] if z["R"].shape[1] else []
    return done, seg_idx, state, Ws, Rs


def run_batch(batch: ResidueBatch, cfg: GibbsConfig,
              segment_blocks: int = 100,
              checkpoint_path: Optional[str] = None,
              checkpoint_cb=None,
              sharding: Optional[jax.sharding.NamedSharding] = None,
              progress_cb=None, engine: str = "xla",
              defer_transfer: bool = False):
    """Run full chains for one bucket of residues.

    Args:
        segment_blocks: thinning blocks per host-level segment (checkpoint /
            progress granularity; 100 blocks = 10,000 sweeps by default).
        checkpoint_path: when set, sampler state is persisted there after
            every segment and a matching checkpoint is resumed from — an
            upgrade over the reference, whose preempted 110k-sweep jobs
            restart from zero (SURVEY.md section 5 checkpoint/resume). The
            RNG is segment-keyed (fold_in of lane key and segment index), so
            a resumed run reproduces the uninterrupted chain exactly.
        checkpoint_cb: optional ``f(segment_idx, state, samples_so_far)``.
        sharding: optional NamedSharding to lay lanes out across a mesh
            (batch axis sharded; see basicrta_tpu.parallel).
        progress_cb: optional ``f(done_sweeps, total_sweeps)``.
        engine: 'xla' (vmapped sweep graph), 'pallas' (fused VMEM kernel
            for the per-sweep sufficient statistics; ~3.5x faster on real
            TPUs), or 'auto' (pallas on TPU, xla elsewhere).
        defer_transfer: return a ``_DeferredBatch`` whose thinned samples
            are still on device — pass it to :func:`finalize_batch`. Lets
            a caller running several buckets dispatch the next bucket's
            segments before this one's results transfer.

    Returns:
        :class:`BatchResult`, or a ``_DeferredBatch`` when
        ``defer_transfer=True``.
    """
    if engine == "auto":
        engine = ("pallas" if jax.devices()[0].platform == "tpu"
                  else "xla")
    if engine not in ("xla", "pallas"):
        raise ValueError(f"unknown engine {engine!r}; use 'xla', 'pallas' "
                         "or 'auto'")
    mesh = sharding.mesh if sharding is not None else None
    n_lanes = 1
    if mesh is not None:
        n_lanes = mesh.shape.get("lanes", mesh.devices.size)
        if engine == "pallas" and mesh.shape.get("events", 1) > 1:
            raise ValueError(
                "the fused pallas engine keeps each lane's full value axis "
                "in VMEM and cannot shard it; use an events=1 mesh (lane "
                "sharding) or engine='xla' for event sharding")
    if checkpoint_path is not None and not checkpoint_path.endswith(".npz"):
        checkpoint_path += ".npz"
    B = batch.size
    pack = batch.pack
    tiers = batch.tiers
    mixed = batch.bounds is not None and engine == "pallas"
    seg_mask = None
    slot_take = None                # mixed: member <- kernel-slot gather
    if mixed:
        # mixed-width k-way packed bucket: pack physical (Bph, SL, 128)
        # layouts on the host (per-lane widths make this a per-member
        # reshape no static device op expresses) and hand the kernel the
        # segment-id tile; tiers become physical-row tiers. The kernel's
        # state/outputs are SLOT-ordered (Bph * pack logical rows, empty
        # slots included), so results gather through slot_take.
        widths = np.asarray(batch.bounds, np.int64)
        Bph = widths.shape[0]
        # pad whole physical lanes so each lane shard gets whole lanes;
        # all-zero width rows are pure padding lanes (no live columns)
        Bph_s = -(-Bph // n_lanes) * n_lanes
        widths_s = np.zeros((Bph_s, pack), np.int64)
        widths_s[:Bph] = widths
        v_ph, c_ph, seg_id, slot_np = _pack_mixed(
            np.asarray(batch.values, np.float32),
            np.asarray(batch.counts, np.float32),
            widths_s, batch.phys_rows)
        mixed_tiers = _mixed_row_tiers(c_ph)
        values_np = v_ph.reshape(Bph_s, -1)
        counts_np = c_ph.reshape(Bph_s, -1)
        seg_mask = jnp.asarray(seg_id)
        slot_take = jnp.asarray(slot_np)
        Bs = Bph_s * pack           # logical slots incl. empties
    else:
        # pad lanes to a multiple of the lane-shard count (and of the
        # packing factor, so each shard reshapes whole physical lanes);
        # padded lanes carry zero counts and are sliced off the results
        Bs = -(-B // (n_lanes * pack)) * (n_lanes * pack)
        values_np = np.ones((Bs, batch.values.shape[1]), np.float32)
        values_np[:B] = batch.values
        counts_np = np.zeros((Bs, batch.counts.shape[1]), np.float32)
        counts_np[:B] = batch.counts
    n_events_shards = 1
    if (mesh is not None and engine == "xla"
            and mesh.shape.get("events", 1) > 1
            and sharding.spec and len(sharding.spec) > 1
            and sharding.spec[1] == "events"):
        # explicit event sharding: deal sorted columns cyclically so one
        # static tier pair covers every shard, then run the shard_map step
        # with per-sweep psum of the sufficient statistics
        from basicrta_tpu.parallel.mesh import deal_columns
        n_events_shards = mesh.shape["events"]
        values_np, counts_np, tiers = deal_columns(
            values_np, counts_np, n_events_shards, batch.tiers)
    values = jnp.asarray(values_np)
    counts = jnp.asarray(counts_np)
    state_sharding = sharding
    if sharding is not None:
        values = jax.device_put(values, sharding)
        counts = jax.device_put(counts, sharding)
        if seg_mask is not None:
            seg_mask = jax.device_put(seg_mask, sharding)
        if n_events_shards > 1:
            # the (Bs, K) state replicates over 'events' (K is not dealt
            # onto event shards); only the lane axis is split
            from jax.sharding import NamedSharding, PartitionSpec as P
            state_sharding = NamedSharding(mesh, P("lanes"))

    st0 = init_mixture_params(cfg.ncomp)
    state = MixtureState(jnp.tile(st0.weights, (Bs, 1)),
                         jnp.tile(st0.rates, (Bs, 1)))
    if state_sharding is not None:
        state = MixtureState(jax.device_put(state.weights, state_sharding),
                             jax.device_put(state.rates, state_sharding))
    total_blocks = cfg.niter // cfg.g
    # salt the stream by the bucket's residue set: lanes at the same index
    # of DIFFERENT buckets (the default ladder yields several per protein)
    # must not consume identical streams, or their posteriors correlate
    import zlib
    bucket_salt = zlib.crc32(",".join(batch.names).encode()) & 0x7FFFFFFF
    key = jax.random.fold_in(jax.random.key(cfg.seed), bucket_salt)
    lane_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(Bs))

    # sharded runs draw different (per-shard) streams, so checkpoints are
    # keyed by the sharding layout and never resume across mesh shapes
    ckpt_engine = engine
    if n_lanes > 1:
        ckpt_engine += f"-l{n_lanes}"
    if n_events_shards > 1:
        ckpt_engine += f"-ev{n_events_shards}"
    if pack > 1:
        ckpt_engine += f"-p{pack}"
    if mixed:
        # the width layout reshuffles which uniform feeds which draw,
        # so checkpoints never resume across mixed/uniform layouts
        import zlib as _zlib
        ckpt_engine += f"-mx{_zlib.crc32(widths_s.tobytes()) & 0xffff:04x}"
    Ws, Rs = [], []
    done = 0
    seg_idx = 0
    if checkpoint_path is not None:
        resumed = load_checkpoint(checkpoint_path, batch, cfg, ckpt_engine)
        if resumed is not None:
            done, seg_idx, ck_state, Ws, Rs = resumed
            if mixed:
                # checkpoints store the true-B member state; scatter it
                # back into the kernel's slot-ordered layout
                state = MixtureState(
                    jnp.ones((Bs, cfg.ncomp), jnp.float32)
                       .at[slot_take].set(ck_state.weights),
                    jnp.ones((Bs, cfg.ncomp), jnp.float32)
                       .at[slot_take].set(ck_state.rates))
            else:
                # checkpoints store the true-B state; re-pad to the
                # shard count
                pad = Bs - ck_state.weights.shape[0]
                state = MixtureState(
                    jnp.pad(ck_state.weights, ((0, pad), (0, 0)),
                            constant_values=1.0),
                    jnp.pad(ck_state.rates, ((0, pad), (0, 0)),
                            constant_values=1.0))
            if state_sharding is not None:
                state = MixtureState(
                    jax.device_put(state.weights, state_sharding),
                    jax.device_put(state.rates, state_sharding))
    if engine == "pallas":
        from basicrta_tpu.sampler.pallas_sweep import (packed_row_tiers,
                                                       pad_tiers_to_rows,
                                                       segment_pallas)
        if mixed:
            p_tiers = mixed_tiers
        elif pack > 1:
            seg_w = 128 // pack
            p_tiers = packed_row_tiers(batch.tiers, seg_w,
                                       values.shape[1] // seg_w)
        else:
            p_tiers = pad_tiers_to_rows(batch.tiers, values.shape[1])
        on_cpu = jax.devices()[0].platform == "cpu"
        seed0 = jnp.int32((cfg.seed ^ bucket_salt) & 0x7FFFFFFF)

        if mesh is not None and n_lanes > 1:
            from jax.sharding import PartitionSpec as P

            def run_segment(offset, state, nb):
                def _body(seed, off, w, r, v, c, m):
                    shard = jax.lax.axis_index("lanes")
                    # decorrelate shards by seed (in-kernel lanes
                    # decorrelate via program id, which restarts at 0 on
                    # every shard)
                    local_seed = seed + shard.astype(jnp.int32) * jnp.int32(
                        0x3504F333)
                    st, W, R = segment_pallas(
                        local_seed, off, MixtureState(w, r), v, c, cfg,
                        nb, p_tiers, interpret=on_cpu, pack=pack,
                        seg_mask=m)
                    return st.weights, st.rates, W, R

                sharded = jax.shard_map(
                    _body, mesh=mesh,
                    in_specs=(P(), P(), P("lanes"), P("lanes"), P("lanes"),
                              P("lanes"),
                              P("lanes") if seg_mask is not None else P()),
                    out_specs=(P("lanes"), P("lanes"), P("lanes"),
                               P("lanes")),
                    check_vma=False)
                w, r, W, R = sharded(seed0, jnp.int32(offset),
                                     state.weights, state.rates,
                                     values, counts, seg_mask)
                return MixtureState(w, r), W, R
        else:
            def run_segment(offset, state, nb):
                return segment_pallas(seed0, jnp.int32(offset), state,
                                      values, counts, cfg, nb, p_tiers,
                                      interpret=on_cpu, pack=pack,
                                      seg_mask=seg_mask)
    event_steps: Dict[int, object] = {}
    while done < total_blocks:
        nb = min(segment_blocks, total_blocks - done)
        if engine == "pallas":
            state, W, R = run_segment(done * cfg.g, state, nb)
            if mixed:
                # slot-ordered kernel outputs -> true members (the
                # downstream [:B] slices then see exactly B member rows)
                W = jnp.take(W, slot_take, axis=0)
                R = jnp.take(R, slot_take, axis=0)
        else:
            seg_keys = jax.vmap(
                lambda k: jax.random.fold_in(k, seg_idx))(lane_keys)
            if n_events_shards > 1:
                if nb not in event_steps:
                    from basicrta_tpu.parallel.mesh import (
                        event_sharded_blocks)
                    event_steps[nb] = event_sharded_blocks(mesh, cfg, nb,
                                                           tiers)
                state, W, R = event_steps[nb](seg_keys, state, values,
                                              counts)
            else:
                state, W, R = _segment(seg_keys, state, values, counts,
                                       cfg, nb, tiers)
        if checkpoint_path is not None or checkpoint_cb is not None:
            # checkpointing needs host copies now; otherwise keep the
            # thinned samples on device so the next segment dispatches
            # without a host sync (the transfer stall per segment is pure
            # pipeline bubble on remote-attached devices)
            W, R = np.asarray(W)[:B], np.asarray(R)[:B]
        Ws.append(W)
        Rs.append(R)
        done += nb
        seg_idx += 1
        if checkpoint_path is not None:
            if mixed:
                ck = MixtureState(np.asarray(state.weights)[slot_np],
                                  np.asarray(state.rates)[slot_np])
            else:
                ck = MixtureState(np.asarray(state.weights)[:B],
                                  np.asarray(state.rates)[:B])
            save_checkpoint(checkpoint_path, batch, cfg, done, seg_idx,
                            ck, Ws, Rs, ckpt_engine)
        if checkpoint_cb is not None:
            checkpoint_cb(seg_idx, state, (Ws, Rs))
        if progress_cb is not None:
            # with deferred transfers the loop would otherwise report
            # dispatch progress, not execution progress; a tiny state
            # transfer syncs on the segment actually finishing
            # (block_until_ready is not reliable on remote-attached
            # platforms)
            np.asarray(state.weights)
            progress_cb(done * cfg.g, cfg.niter)

    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        os.remove(checkpoint_path)
    deferred = _DeferredBatch(batch.names, Ws, Rs, batch.n_events, B)
    if defer_transfer:
        # caller pipelines several buckets: the thinned samples stay on
        # device until finalize_batch, so the next bucket's segments
        # dispatch without waiting for this one's transfer
        return deferred
    return finalize_batch(deferred)


@dataclasses.dataclass
class _DeferredBatch:
    """run_batch output with samples still on device (defer_transfer)."""
    names: List[str]
    Ws: list
    Rs: list
    n_events: np.ndarray
    B: int


def finalize_batch(deferred) -> BatchResult:
    """Transfer a ``defer_transfer=True`` result to host."""
    if isinstance(deferred, BatchResult):
        return deferred
    Ws = [np.asarray(w)[:deferred.B] for w in deferred.Ws]
    Rs = [np.asarray(r)[:deferred.B] for r in deferred.Rs]
    return BatchResult(deferred.names, np.concatenate(Ws, axis=1),
                       np.concatenate(Rs, axis=1), deferred.n_events)


def run_residues(times_per_residue: Dict[str, np.ndarray], cfg: GibbsConfig,
                 n_chains: int = 1, checkpoint_dir: Optional[str] = None,
                 **kwargs) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """All-residue driver: bucket, batch, and sweep everything on device.

    Multiple chains per residue are expressed as extra lanes (residue
    repeated with distinct fold-in indices via lane position). With
    ``checkpoint_dir`` set, each bucket checkpoints per segment and resumes
    after interruption.

    Returns:
        {residue: (mcweights (chains, S, K), mcrates (chains, S, K))}
    """
    # residues with no events are omitted, matching the reference's
    # '.dataset_too_small' skip sentinel (scripts/get_rerun_residues.py:23-34)
    nonempty = {name: t for name, t in times_per_residue.items()
                if len(t) > 0}
    expanded = {}
    for name, t in nonempty.items():
        for ch in range(n_chains):
            expanded[f"{name}#{ch}"] = t
    out: Dict[str, list] = {name: [None] * n_chains for name in nonempty}
    # bucket layout per engine: the fused kernel wants the fine packed
    # ladder (64-column work quantization); the XLA engine wants few,
    # coarse buckets (per-bucket dispatch overhead dominates its ladder
    # gains — see bucket_residues)
    engine = kwargs.get("engine", "xla")
    if engine == "auto":
        engine = ("pallas" if jax.devices()[0].platform == "tpu"
                  else "xla")
        kwargs["engine"] = engine
    ladder = None if engine == "pallas" else "pow2"
    # one-deep pipeline: dispatch bucket i+1's segments (async), then
    # finalize bucket i while the device works on i+1. Bucket i's results
    # stream back under compute, but at most one bucket's thinned samples
    # are deferred on device at a time — deferring ALL buckets to the end
    # would hold every bucket's sample buffers in HBM simultaneously.
    # (With checkpointing the per-segment syncs dominate and the deferral
    # is a no-op.)
    kwargs.pop("defer_transfer", None)   # pipelining is managed here
    results, prev = [], None
    for batch in bucket_residues(expanded, ladder=ladder):
        ckpt = None
        if checkpoint_dir is not None:
            os.makedirs(checkpoint_dir, exist_ok=True)
            ckpt = os.path.join(
                checkpoint_dir, f"ckpt_{_checkpoint_key(batch, cfg)}.npz")
        cur = run_batch(batch, cfg, checkpoint_path=ckpt,
                        defer_transfer=True, **kwargs)
        if prev is not None:
            results.append(finalize_batch(prev))
        prev = cur
    if prev is not None:
        results.append(finalize_batch(prev))
    for res in results:
        for i, lane_name in enumerate(res.names):
            name, ch = lane_name.rsplit("#", 1)
            out[name][int(ch)] = (res.mcweights[i], res.mcrates[i])
    return {name: (np.stack([w for w, _ in chains]),
                   np.stack([r for _, r in chains]))
            for name, chains in out.items()}
