"""Contact-map extraction driver (MapContacts / ProcessContacts parity).

The reference forks a process pool over trajectory slices, each worker
running a C neighbor search per frame and writing text shards that the
parent re-parses into a memmap (reference contacts.py:57-132). Here frame
batches stream through the device distance kernel and sparse rows accumulate
in memory; there is no text round-trip and no fork.

The trajectory source is any iterable of ``FrameBatch`` — provided by
``basicrta_tpu.io`` readers (XTC/DCD) or synthetic generators in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from basicrta_tpu.config import ContactConfig
from basicrta_tpu.contacts.distances import (compact_contacts,
                                             contacts_from_batch,
                                             gather_grouped,
                                             group_by_residue,
                                             min_dist_per_residue_pair)
from basicrta_tpu.contacts.events import merge_events
from basicrta_tpu.contacts.records import (ContactEvents, ContactMeta,
                                           ContactRecords)


@dataclasses.dataclass
class FrameBatch:
    """One streamed chunk of trajectory."""
    frame_ids: np.ndarray   # (F,) int64
    times: np.ndarray       # (F,) float64 [ns]
    positions: np.ndarray   # (F, A, 3) float32 [A]
    # (F, 3) orthorhombic box lengths, or (F, 3, 3) triclinic box matrix
    # (GROMACS-reduced rows) [A]
    box: Optional[np.ndarray] = None


class MapContacts:
    """Compute the primary contact map between two atom groups.

    :param indices1/indices2: atom indices of the two groups (the reference's
        ag1/ag2 AtomGroups, contacts.py:53-55).
    :param resids1/resids2: per-atom residue ids for each group.
    :param cfg: ContactConfig (map cutoff default 10.0 A, contacts.py:51).
    """

    def __init__(self, indices1: np.ndarray, resids1: np.ndarray,
                 indices2: np.ndarray, resids2: np.ndarray,
                 cfg: ContactConfig = ContactConfig(),
                 meta: Optional[ContactMeta] = None,
                 n_devices: Optional[int] = None):
        self.indices1 = np.asarray(indices1)
        self.indices2 = np.asarray(indices2)
        self.cfg = cfg
        self.meta = meta or ContactMeta()
        self.group_idx1, self.uniq_resids1 = group_by_residue(
            np.zeros((len(indices1), 3)), np.asarray(resids1))
        self.group_idx2, self.uniq_resids2 = group_by_residue(
            np.zeros((len(indices2), 3)), np.asarray(resids2))
        # frame-axis data parallelism over chips: the TPU equivalent of the
        # reference's trajectory-slice pool fan-out (contacts.py:60-75;
        # SURVEY.md section 2 parallelism item 1). Each device computes the
        # distance kernel for its frame shard; no collectives needed.
        self._sharding = None
        if n_devices is not None:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            devs = jax.local_devices()   # per-host chips (pod-safe)
            n = n_devices if n_devices > 0 else len(devs)
            mesh = Mesh(np.asarray(devs[:n]), ("frames",))
            self._sharding = NamedSharding(mesh, PartitionSpec("frames"))

    def run(self, trajectory: Iterable[FrameBatch],
            progress_cb=None) -> ContactRecords:
        """Stream frame batches through the distance kernel and collect all
        residue pairs within the map cutoff."""
        cols = {k: [] for k in ("frames", "s1", "s2", "dist", "times")}
        last_time = None
        frame_diffs: list = []   # every consecutive frame-time gap
        nominal = None
        pending = None  # (device result, real frame count, batch)

        def dispatch(batch):
            nonlocal nominal
            F_real = len(batch.frame_ids)
            # pad the trailing partial batch to the first batch's size so
            # the kernel compiles for a single shape (device compiles are
            # expensive; the padded frames' rows are sliced off below)
            if nominal is None:
                nominal = F_real
            positions = batch.positions
            boxarr = batch.box
            if F_real < nominal:
                pad = nominal - F_real
                positions = np.concatenate(
                    [positions, np.repeat(positions[-1:], pad, axis=0)])
                if boxarr is not None:
                    boxarr = np.concatenate(
                        [boxarr, np.repeat(boxarr[-1:], pad, axis=0)])
            if self._sharding is not None:
                # pad the frame axis to the device count and lay each
                # shard's frames on its chip (padded frames' rows are
                # sliced off by collect)
                n = self._sharding.mesh.devices.size
                fpad = -(-len(positions) // n) * n - len(positions)
                if fpad:
                    positions = np.concatenate(
                        [positions, np.repeat(positions[-1:], fpad, axis=0)])
                    if boxarr is not None:
                        boxarr = np.concatenate(
                            [boxarr, np.repeat(boxarr[-1:], fpad, axis=0)])
            pos = jnp.asarray(positions, jnp.float32)
            box = None
            use_pbc = self.cfg.use_pbc and boxarr is not None
            if use_pbc:
                box = jnp.asarray(boxarr, jnp.float32)
            if self._sharding is not None:
                pos = jax.device_put(pos, self._sharding)
                if box is not None:
                    box = jax.device_put(box, self._sharding)
            p1, m1 = gather_grouped(pos[:, self.indices1, :], self.group_idx1)
            p2, m2 = gather_grouped(pos[:, self.indices2, :], self.group_idx2)
            triclinic = use_pbc and boxarr.ndim == 3
            dmin = min_dist_per_residue_pair(
                p1, p2, box, use_pbc=use_pbc, mask1=m1, mask2=m2,
                triclinic=triclinic)
            # compact on device: only sub-cutoff entries cross the host
            # link (the dense (F, R1, R2) transfer, not the kernel, bounds
            # throughput on tunnel/PCIe-attached hosts). dmin stays on
            # device as the exact fallback for overflowing frames. Small
            # systems (n_pairs <= cap) skip compaction — the packed
            # idx+dist buffers would be LARGER than the dense matrix.
            n_pairs = len(self.uniq_resids1) * len(self.uniq_resids2)
            cap = int(self.cfg.transfer_cap)
            if n_pairs <= cap:
                return dmin, None, None, None
            nhit, cidx, cdist = compact_contacts(dmin, self.cfg.map_cutoff,
                                                 cap)
            return dmin, nhit, cidx, cdist

        def collect(pack, F_real, batch):
            nonlocal last_time
            dmin_dev, nhit_dev, cidx_dev, cdist_dev = pack
            R2 = len(self.uniq_resids2)
            if nhit_dev is not None:
                nhit = np.asarray(nhit_dev)[:F_real]
                cap = cidx_dev.shape[1]
            if nhit_dev is None or (nhit > cap).any():
                # small system (no compaction) or pathologically dense
                # frame (cap overflow): exact dense transfer
                dmin = np.asarray(dmin_dev)[:F_real]
                f, s1, s2, dist, t = contacts_from_batch(
                    dmin, batch.frame_ids, batch.times, self.uniq_resids1,
                    self.uniq_resids2, self.cfg.map_cutoff)
            else:
                cidx = np.asarray(cidx_dev)[:F_real]
                cd = np.asarray(cdist_dev)[:F_real]
                fk, kk = np.nonzero(cd <= self.cfg.map_cutoff)
                flat = cidx[fk, kk]
                # re-sort within frames by pair index: identical row order
                # (and bit-identical distances) to the dense path
                order = np.lexsort((flat, fk))
                fk, flat = fk[order], flat[order]
                dist = cd[fk, kk[order]].astype(np.float32)
                i, j = flat // R2, flat % R2
                s1 = self.uniq_resids1[i].astype(np.int32)
                s2 = self.uniq_resids2[j].astype(np.int32)
                f = np.asarray(batch.frame_ids)[fk].astype(np.int64)
                t = np.asarray(batch.times, np.float64)[fk]
            cols["frames"].append(f)
            cols["s1"].append(s1)
            cols["s2"].append(s2)
            cols["dist"].append(dist)
            cols["times"].append(t)
            bt = np.asarray(batch.times, np.float64)[:F_real]
            if len(bt) > 0:
                if last_time is not None:
                    frame_diffs.append(bt[0] - last_time)
                if len(bt) > 1:
                    frame_diffs.append(np.diff(bt))
                last_time = float(bt[-1])
            if progress_cb is not None:
                progress_cb(int(batch.frame_ids[-1]) + 1)

        # one-batch pipeline: while the device works on batch i, the host
        # decodes batch i+1 from the trajectory (dispatch is async; the
        # sync happens in collect)
        for batch in trajectory:
            pack = dispatch(batch)
            if pending is not None:
                collect(*pending)
            pending = (pack, len(batch.frame_ids), batch)
        if pending is not None:
            collect(*pending)

        meta = dataclasses.replace(self.meta, cutoff=self.cfg.map_cutoff)
        if meta.ts is None and frame_diffs:
            # infer ts from the *full* frame-time vector — a first-two-frames
            # guess silently corrupts event merging on 1-frame first batches
            # or irregular strides (events.py:33-40 keys durations off ts).
            # Trajectory times are stored as float32, so gaps between late
            # frames carry ~|t| * 2^-23 of quantization jitter: take the
            # median gap (jitter-unbiased, unlike the minimum) and size the
            # regularity tolerance to the quantum.
            d = np.hstack(frame_diffs)
            ts = float(np.median(d))
            quantum = 4.0 * abs(last_time) * 2.0 ** -23
            tol = 1e-4 * ts + quantum
            if ts <= 0 or float(np.abs(d - ts).max()) > tol:
                raise ValueError(
                    f"irregular frame-time stride (gaps span {d.min():g} to "
                    f"{d.max():g} ns); event durations would be wrong. Pass "
                    "an explicit ContactMeta(ts=...) for this trajectory.")
            meta.ts = ts
        cat = {k: (np.concatenate(v) if v else np.zeros(0))
               for k, v in cols.items()}
        return ContactRecords(cat["frames"], cat["s1"], cat["s2"],
                              cat["dist"], cat["times"], meta)


class ProcessContacts:
    """Impose the analysis cutoff and merge contacts into residence events
    (reference contacts.py:135-231)."""

    def __init__(self, cutoff: float = 7.0):
        self.cutoff = cutoff

    def run(self, records: ContactRecords) -> ContactEvents:
        return merge_events(records, self.cutoff)
