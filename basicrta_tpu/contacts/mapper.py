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
import hashlib
import json
import os
import shutil
import tempfile
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from basicrta_tpu.config import ContactConfig
from basicrta_tpu.contacts.distances import (compact_contacts,
                                             contacts_from_batch,
                                             group_by_residue,
                                             min_dist_per_residue_pair,
                                             min_dist_pruned)
from basicrta_tpu.contacts.events import merge_events
from basicrta_tpu.contacts.quantize import quantize_u16
from basicrta_tpu.contacts.records import (ContactEvents, ContactMeta,
                                           ContactRecords)

_COLUMN_SPEC = (("frames", np.int64), ("s1", np.int32), ("s2", np.int32),
                ("dist", np.float32), ("times", np.float64))


class _ColumnStore:
    """Contact-row accumulator with a host-memory valve.

    Rows accumulate in RAM lists; past ``budget_rows`` they spill to
    anonymous on-disk files that finalize as ``np.memmap`` columns — the
    reference streams shards into a disk memmap with ``nslices`` as the
    explicit memory valve (contacts.py:45-48,86-92); this is the same
    valve without the text round-trip. Spill files are unlinked immediately
    after mapping, so nothing is left behind on any exit path.
    """

    def __init__(self, budget_rows: int = 0,
                 spill_dir: Optional[str] = None):
        self.budget = int(budget_rows)
        self.spill_dir = spill_dir
        self.lists = {k: [] for k, _ in _COLUMN_SPEC}
        self.ram_rows = 0
        self.total_rows = 0
        self.spilled = False
        self._files = {}

    def append(self, frames, s1, s2, dist, times):
        for (k, dt), col in zip(_COLUMN_SPEC,
                                (frames, s1, s2, dist, times)):
            self.lists[k].append(np.asarray(col, dt))
        self.ram_rows += len(frames)
        self.total_rows += len(frames)
        if self.budget and self.ram_rows > self.budget:
            self._flush()

    def _flush(self):
        if not self._files:
            for k, dt in _COLUMN_SPEC:
                fd, path = tempfile.mkstemp(prefix=f".contacts_{k}_",
                                            suffix=".bin",
                                            dir=self.spill_dir)
                self._files[k] = (os.fdopen(fd, "wb"), path)
        for k, dt in _COLUMN_SPEC:
            for arr in self.lists[k]:
                self._files[k][0].write(
                    np.ascontiguousarray(arr, dt).tobytes())
            self.lists[k].clear()
        self.ram_rows = 0
        self.spilled = True

    def finalize(self):
        """Return the concatenated columns; memmap-backed when spilled."""
        if not self._files:
            return {k: (np.concatenate(v) if v
                        else np.zeros(0, dict(_COLUMN_SPEC)[k]))
                    for k, v in self.lists.items()}
        self._flush()
        out = {}
        for k, dt in _COLUMN_SPEC:
            f, path = self._files[k]
            f.close()
            if self.total_rows:
                out[k] = np.memmap(path, dtype=dt, mode="r",
                                   shape=(self.total_rows,))
            else:
                out[k] = np.zeros(0, dt)
            os.unlink(path)   # mapping stays valid; leaves no file behind
        self._files.clear()
        return out


class _Checkpointer:
    """Durable mid-scan checkpoints for :meth:`MapContacts.run`.

    Contact rows accumulate into append-only ``shard_{k:06d}.npz`` files
    under the checkpoint directory with an atomically-replaced
    ``state.json`` recording the next unprocessed frame, so a preempted
    trajectory scan resumes where the last checkpoint left off instead of
    frame 0 (the reference restarts contact extraction from scratch — its
    worker shards are per-run temporaries, reference contacts.py:86-98).
    The state carries a fingerprint of the selections/config; resuming
    with different inputs is refused. The directory is removed by the
    caller (``MapContacts.remove_checkpoint``) once the records artifact
    is durably saved.
    """

    STATE = "state.json"

    # rows pending in RAM between flushes are capped independently of the
    # frame interval, so dense systems don't re-create the host-memory
    # problem _ColumnStore's valve solves (an early flush just writes a
    # smaller shard; the state stays consistent)
    PENDING_ROW_BUDGET = 4_000_000

    def __init__(self, ckpt_dir: str, fingerprint: str, every: int):
        self.dir = ckpt_dir
        self.fp = fingerprint
        self.every = max(int(every), 1)
        self.pending = {k: [] for k, _ in _COLUMN_SPEC}
        self.pending_diffs: list = []
        self.pending_rows = 0
        self.n_shards = 0
        self.next_frame = 0
        self.last_time = None
        self._last_ckpt_frame = 0

    def load(self):
        """Restore prior progress; (columns, diffs, last_time, next_frame)
        or None when starting fresh."""
        path = os.path.join(self.dir, self.STATE)
        if not os.path.exists(path):
            os.makedirs(self.dir, exist_ok=True)
            return None
        with open(path) as fh:
            state = json.load(fh)
        if state["fingerprint"] != self.fp:
            raise ValueError(
                f"checkpoint {self.dir} was written by a run with "
                "different selections/cutoff/trajectory/--dt; remove "
                f"that directory (or pass a different checkpoint_dir) "
                "to start the scan over")
        cols = {k: [] for k, _ in _COLUMN_SPEC}
        diffs = []
        for i in range(state["shards"]):
            with np.load(os.path.join(self.dir,
                                      f"shard_{i:06d}.npz")) as z:
                for k, _ in _COLUMN_SPEC:
                    cols[k].append(z[k])
                diffs.append(z["diffs"])
        self.n_shards = state["shards"]
        self.next_frame = int(state["next_frame"])
        self.last_time = state["last_time"]
        self._last_ckpt_frame = self.next_frame
        out = {k: (np.concatenate(v) if v else np.zeros(0, dt))
               for (k, dt), v in zip(_COLUMN_SPEC, cols.values())}
        d = (np.concatenate(diffs) if diffs else np.zeros(0))
        return out, d, self.last_time, self.next_frame

    def add(self, rows, new_diffs, next_frame: int, last_time):
        for (k, dt), col in zip(_COLUMN_SPEC, rows):
            self.pending[k].append(np.asarray(col, dt))
        self.pending_rows += len(rows[0])
        self.pending_diffs.extend(np.atleast_1d(d) for d in new_diffs)
        self.next_frame = int(next_frame)
        self.last_time = last_time
        if (self.next_frame - self._last_ckpt_frame >= self.every
                or self.pending_rows >= self.PENDING_ROW_BUDGET):
            self.flush()

    def flush(self):
        if self.next_frame == self._last_ckpt_frame:
            return
        payload = {k: (np.concatenate(v) if v else np.zeros(0, dt))
                   for (k, dt), v in zip(_COLUMN_SPEC,
                                         self.pending.values())}
        payload["diffs"] = (np.concatenate(self.pending_diffs)
                            if self.pending_diffs
                            else np.zeros(0, np.float64))
        shard = os.path.join(self.dir, f"shard_{self.n_shards:06d}.npz")
        tmp = shard + ".tmp"
        with open(tmp, "wb") as fh:
            np.savez(fh, **payload)
        os.replace(tmp, shard)   # shard first, then the state naming it:
        self.n_shards += 1       # a crash in between leaves an orphan
        for v in self.pending.values():
            v.clear()
        self.pending_diffs.clear()
        self.pending_rows = 0
        self._write_state()
        self._last_ckpt_frame = self.next_frame

    def _write_state(self):
        path = os.path.join(self.dir, self.STATE)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"fingerprint": self.fp, "shards": self.n_shards,
                       "next_frame": self.next_frame,
                       "last_time": self.last_time}, fh)
        os.replace(tmp, path)


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
            np.asarray(resids1))
        self.group_idx2, self.uniq_resids2 = group_by_residue(
            np.asarray(resids2))
        # host-side residue-padded upload layout: the host lays each frame
        # out as (R1*P1 + R2*P2, 3) with atoms grouped by residue, so the
        # device pass is a pure reshape — a device gather over ~1e5
        # scattered atom rows measures ~100x the whole distance kernel on
        # TPU (scattered HBM reads don't vectorize), and an eager gather
        # additionally re-uploads its index constants every batch on
        # tunnel/PCIe-attached hosts. Pad slots replicate the group's
        # first atom and are masked out of every distance min.
        gi1, gi2 = self.group_idx1, self.group_idx2
        lay1 = self.indices1[np.where(gi1 < 0, 0, gi1)].ravel()
        lay2 = self.indices2[np.where(gi2 < 0, 0, gi2)].ravel()
        self._host_layout = np.concatenate([lay1, lay2])
        self._mask1 = jnp.asarray(gi1 >= 0)
        self._mask2 = jnp.asarray(gi2 >= 0)
        self._R1, self._P1 = gi1.shape
        self._R2, self._P2 = gi2.shape
        # skip the host gather when the trajectory already IS the layout
        self._layout_is_identity = (
            len(self._host_layout) == len(self.indices1) + len(self.indices2)
            and np.array_equal(self._host_layout,
                               np.arange(len(self._host_layout))))
        n_pairs_total = self._R1 * self._R2
        self._fuse_transfer = n_pairs_total < 2 ** 24
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
        self._jit_pass = jax.jit(
            self._device_pass,
            static_argnames=("mode", "cap", "use_pbc", "triclinic",
                             "quantized"))

    def _device_pass(self, pos, box, scale, *, mode: str, cap: int,
                     use_pbc: bool, triclinic: bool, quantized: bool):
        """The whole per-batch device computation as ONE compiled program:
        optional u16 dequantization, reshape into residue groups, distance
        kernel (pruned or dense), device-side compaction, and fusion of the
        (n, idx, dist) outputs into one transfer buffer. Selection
        masks/shapes are compile-time constants — nothing but coordinates
        crosses the host link per batch."""
        if quantized:
            pos = (pos.astype(jnp.float32) * scale[:, :1, :]
                   + scale[:, 1:, :])
        F = pos.shape[0]
        A1 = self._R1 * self._P1
        p1 = pos[:, :A1].reshape(F, self._R1, self._P1, 3)
        p2 = pos[:, A1:].reshape(F, self._R2, self._P2, 3)
        if mode == "pruned":
            n, cidx, cdist = min_dist_pruned(
                p1, p2, self.cfg.map_cutoff, box, cap_pairs=cap,
                use_pbc=use_pbc, mask1=self._mask1, mask2=self._mask2,
                triclinic=triclinic)
            return self._fuse(n, cidx, cdist)
        dmin = min_dist_per_residue_pair(
            p1, p2, box, use_pbc=use_pbc, mask1=self._mask1,
            mask2=self._mask2, triclinic=triclinic)
        if mode == "dense_raw":
            # small system: the packed idx+dist buffers would be LARGER
            # than the dense matrix — transfer dmin itself
            return dmin
        n, cidx, cdist = compact_contacts(dmin, self.cfg.map_cutoff, cap)
        return dmin, self._fuse(n, cidx, cdist)

    def _fuse(self, n, cidx, cdist):
        # pack (n, idx, dist) into ONE buffer when the pair indices are
        # f32-exact: each host sync is a full link round-trip on
        # tunnel/PCIe-attached hosts, so one transfer instead of three is
        # a direct throughput win for the streaming loop
        if not self._fuse_transfer:
            return (n, cidx, cdist)
        return jnp.concatenate([n.astype(jnp.float32)[:, None],
                                cidx.astype(jnp.float32), cdist], axis=1)

    def _unfuse(self, packed, F_real):
        if not self._fuse_transfer:
            n, cidx, cdist = packed
            return (np.asarray(n)[:F_real], np.asarray(cidx)[:F_real],
                    np.asarray(cdist)[:F_real])
        arr = np.asarray(packed)[:F_real]
        cap = (arr.shape[1] - 1) // 2
        return (arr[:, 0].astype(np.int64),
                arr[:, 1:1 + cap].astype(np.int64),
                arr[:, 1 + cap:])

    def _fingerprint(self) -> str:
        """Identity of this scan for checkpoint validation: the selections
        and every config field that changes the output rows."""
        h = hashlib.sha256()
        for arr in (self.indices1, self.indices2,
                    self.group_idx1, self.group_idx2,
                    self.uniq_resids1, self.uniq_resids2):
            h.update(np.ascontiguousarray(arr).tobytes())
        h.update(repr((self.cfg.map_cutoff, self.cfg.use_pbc,
                       self.cfg.upload_dtype,
                       self.meta.top, self.meta.traj,
                       self.meta.ts)).encode())
        return h.hexdigest()

    def _prefilter_active(self) -> bool:
        """Bounding-sphere pruning on/off (ContactConfig.prefilter)."""
        mode = self.cfg.prefilter
        if mode == "auto":
            P1 = self.group_idx1.shape[1]
            P2 = self.group_idx2.shape[1]
            pairs = (len(self.uniq_resids1) * P1
                     * len(self.uniq_resids2) * P2)
            return pairs > int(self.cfg.prefilter_auto_pairs)
        return bool(mode)

    def run(self, trajectory: Iterable[FrameBatch], progress_cb=None,
            spill_dir: Optional[str] = None,
            checkpoint_dir: Optional[str] = None,
            checkpoint_every: int = 200_000) -> ContactRecords:
        """Stream frame batches through the distance kernel and collect all
        residue pairs within the map cutoff.

        ``checkpoint_dir`` enables durable mid-scan checkpoints every
        ``checkpoint_every`` frames: a preempted scan rerun with the same
        arguments resumes from the last checkpoint and produces the
        identical ContactRecords (the trajectory iterable must yield the
        same frames in the same monotonic order). The directory survives
        the run — remove it with :meth:`remove_checkpoint` once the
        records are durably saved.
        """
        cols = _ColumnStore(self.cfg.host_row_budget, spill_dir)
        last_time = None
        frame_diffs: list = []   # every consecutive frame-time gap
        nominal = None
        pending = None  # (device result, real frame count, batch)
        prefilter = self._prefilter_active()

        ckpt = None
        start_frame = 0
        if checkpoint_dir is not None:
            ckpt = _Checkpointer(checkpoint_dir, self._fingerprint(),
                                 checkpoint_every)
            loaded = ckpt.load()
            if loaded is not None:
                lcols, ldiffs, last_time, start_frame = loaded
                if lcols["frames"].size:
                    cols.append(lcols["frames"], lcols["s1"], lcols["s2"],
                                lcols["dist"], lcols["times"])
                if ldiffs.size:
                    frame_diffs.append(ldiffs)

        n_pairs_total = len(self.uniq_resids1) * len(self.uniq_resids2)

        def prepare(batch):
            """Host-side batch preparation: residue-padded layout, frame
            padding, optional u16 quantization, and the device upload.
            Runs on the prefetch thread so the upload of batch i+1
            overlaps the device compute of batch i."""
            nonlocal nominal
            F_real = len(batch.frame_ids)
            # pad the trailing partial batch to the first batch's size so
            # the kernel compiles for a single shape (device compiles are
            # expensive; the padded frames' rows are sliced off below)
            if nominal is None:
                nominal = F_real
            positions = np.asarray(batch.positions)
            boxarr = batch.box
            if not self._layout_is_identity:
                positions = positions[:, self._host_layout, :]
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
            use_pbc = self.cfg.use_pbc and boxarr is not None
            triclinic = use_pbc and boxarr.ndim == 3
            # u16 wire format: shared shifted-domain quantizer (see
            # contacts/quantize.py for the wire format and the |lo|-
            # independent wrap-safety bound)
            quantized = self.cfg.upload_dtype == "u16"
            scale = None
            if quantized:
                q, scale_np = quantize_u16(positions)
                pos = jnp.asarray(q)
                # one (F, 2, 3) buffer: row 0 the grid step, row 1 the
                # offset — the device dequant is pos * step + lo
                scale = jnp.asarray(scale_np)
            else:
                pos = jnp.asarray(positions, jnp.float32)
            box = jnp.asarray(boxarr, jnp.float32) if use_pbc else None
            if self._sharding is not None:
                pos = jax.device_put(pos, self._sharding)
                if box is not None:
                    box = jax.device_put(box, self._sharding)
                if scale is not None:
                    scale = jax.device_put(scale, self._sharding)
            return pos, box, scale, use_pbc, triclinic, quantized

        def exec_pass(prep, mode, cap):
            pos, box, scale, use_pbc, triclinic, quantized = prep
            return self._jit_pass(pos, box, scale, mode=mode, cap=cap,
                                  use_pbc=use_pbc, triclinic=triclinic,
                                  quantized=quantized)

        unfuse = self._unfuse

        def dense_pack(prep):
            # compact on device: only sub-cutoff entries cross the host
            # link (the dense (F, R1, R2) transfer, not the kernel, bounds
            # throughput on tunnel/PCIe-attached hosts). dmin stays on
            # device as the exact fallback for overflowing frames. Small
            # systems (n_pairs <= cap) skip compaction — the packed
            # idx+dist buffers would be LARGER than the dense matrix.
            cap = int(self.cfg.transfer_cap)
            if n_pairs_total <= cap:
                return "dense", (exec_pass(prep, "dense_raw", 0), None)
            return "dense", exec_pass(prep, "dense", cap)

        # adaptive prefilter cap: the exact atom sweep and the host
        # transfer both scale with cap_pairs, so batches run at the
        # smallest power-of-two cap that held every frame so far (1.25x
        # margin). Undershoots are redone at the exact fit (n_pl is the
        # true per-frame count, independent of the cap), so adaptation
        # never changes the rows — only the work. The pow2 ladder bounds
        # recompiles at log2(cap_max/cap_min) kernels, all cached.
        cap_max = int(self.cfg.prefilter_cap)
        cap0 = min(max(int(self.cfg.prefilter_cap_min), 16), cap_max)
        cap_state = {"cap": cap0, "peak": 0}

        def _pow2ceil(x: int) -> int:
            return 1 << (max(int(x), 1) - 1).bit_length()

        def dispatch(prep):
            if prefilter:
                return "pruned", exec_pass(prep, "pruned",
                                           cap_state["cap"])
            return dense_pack(prep)

        def decode_compact(cidx, cd, batch, F_real, R2):
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
            return f, s1, s2, dist, t

        def collect(kind, pack, F_real, batch, prep):
            nonlocal last_time
            R2 = len(self.uniq_resids2)
            if kind == "pruned":
                n_pl, cidx, cdist = unfuse(pack, F_real)
                peak = int(n_pl.max()) if len(n_pl) else 0
                cap_state["peak"] = max(cap_state["peak"], peak)
                if peak > cidx.shape[1]:
                    if peak > cap_max:
                        # past the cap ceiling: redo the batch densely
                        # (exactness guard; the prefilter only ever drops
                        # pairs that are provably beyond the cutoff)
                        kind, pack = dense_pack(prep)
                    else:
                        need = min(_pow2ceil(peak), cap_max)
                        # the adaptive cap undershot this batch: redo at
                        # the exact fit (n_pl is the true count, so one
                        # retry always holds every frame)
                        ret = exec_pass(prep, "pruned", need)
                        n_pl, cidx, cdist = unfuse(ret, F_real)
                        rows = decode_compact(cidx, cdist, batch,
                                              F_real, R2)
                else:
                    rows = decode_compact(cidx, cdist, batch, F_real, R2)
                cap_state["cap"] = min(
                    max(_pow2ceil((5 * cap_state["peak"]) // 4), cap0),
                    cap_max)
            if kind == "dense":
                dmin_dev, fused = pack
                if fused is not None:
                    nhit, cidx, cdist = unfuse(fused, F_real)
                    cap = cidx.shape[1]
                if fused is None or (nhit > cap).any():
                    # small system (no compaction) or pathologically dense
                    # frame (cap overflow): exact dense transfer
                    dmin = np.asarray(dmin_dev)[:F_real]
                    rows = contacts_from_batch(
                        dmin, batch.frame_ids, batch.times,
                        self.uniq_resids1, self.uniq_resids2,
                        self.cfg.map_cutoff)
                else:
                    rows = decode_compact(cidx, cdist, batch, F_real, R2)
            bt = np.asarray(batch.times, np.float64)[:F_real]
            bf = np.asarray(batch.frame_ids)[:F_real]
            if start_frame and len(bf) and bf[0] < start_frame:
                # resume landed mid-batch: drop rows/times of frames the
                # checkpoint already covers
                keep = rows[0] >= start_frame
                rows = tuple(c[keep] for c in rows)
                bt = bt[bf >= start_frame]
            cols.append(*rows)
            new_diffs = []
            if len(bt) > 0:
                if last_time is not None:
                    new_diffs.append(bt[0] - last_time)
                if len(bt) > 1:
                    new_diffs.append(np.diff(bt))
                last_time = float(bt[-1])
            frame_diffs.extend(new_diffs)
            if ckpt is not None and len(bf):
                ckpt.add(rows, new_diffs, int(bf[-1]) + 1, last_time)
            if progress_cb is not None:
                progress_cb(int(batch.frame_ids[-1]) + 1)

        # two-stage pipeline: a prefetch thread prepares + uploads batch
        # i+1 (host layout, quantization, the host->device copy — the
        # dominant per-batch cost on tunnel/PCIe-attached hosts) while the
        # device computes batch i and the main thread decodes batch i-1's
        # results; kernel dispatch is async, the sync happens in collect
        from concurrent.futures import ThreadPoolExecutor

        def batches():
            for batch in trajectory:
                if start_frame and int(batch.frame_ids[-1]) < start_frame:
                    # checkpoint already covers this whole batch
                    if progress_cb is not None:
                        progress_cb(int(batch.frame_ids[-1]) + 1)
                    continue
                yield batch

        with ThreadPoolExecutor(max_workers=1) as ex:
            it = batches()
            nxt = next(it, None)
            fut = ex.submit(prepare, nxt) if nxt is not None else None
            while nxt is not None:
                batch, prep = nxt, fut.result()
                nxt = next(it, None)
                if nxt is not None:
                    fut = ex.submit(prepare, nxt)
                kind, pack = dispatch(prep)
                if pending is not None:
                    collect(*pending)
                pending = (kind, pack, len(batch.frame_ids), batch, prep)
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
        cat = cols.finalize()
        # the checkpoint directory is intentionally NOT removed here: the
        # records only exist in memory until the caller persists them, and
        # deleting the checkpoint first would lose the scan to a failed
        # save. Call remove_checkpoint(checkpoint_dir) once the artifact
        # is durably written (a rerun before that resumes idempotently).
        return ContactRecords(cat["frames"], cat["s1"], cat["s2"],
                              cat["dist"], cat["times"], meta)

    @staticmethod
    def remove_checkpoint(checkpoint_dir: str) -> None:
        """Discard a scan checkpoint — call after the records artifact is
        durably saved."""
        shutil.rmtree(checkpoint_dir, ignore_errors=True)


class ProcessContacts:
    """Impose the analysis cutoff and merge contacts into residence events
    (reference contacts.py:135-231)."""

    def __init__(self, cutoff: float = 7.0):
        self.cutoff = cutoff

    def run(self, records: ContactRecords) -> ContactEvents:
        return merge_events(records, self.cutoff)
