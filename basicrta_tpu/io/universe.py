"""Universe: topology + trajectory, streaming frame batches to the pipeline.

The minimal analogue of the MDAnalysis Universe the reference builds at the
top of each stage (reference contacts.py:246-249, kinetics.py:103): parse a
topology (GRO/PDB/PSF/PRMTOP), attach a trajectory (XTC/TRR/DCD/NetCDF/
mdcrd), select atom groups, and iterate device-sized frame batches.
"""

from __future__ import annotations

import os
import warnings
from typing import Iterator, Optional, Sequence

import numpy as np

from basicrta_tpu.contacts.mapper import FrameBatch
from basicrta_tpu.io.amber import (InpcrdReader, MDCRDReader, NCDFReader,
                                   read_prmtop)
from basicrta_tpu.io.native import DCDReader, TRRReader, XTCReader
from basicrta_tpu.io.topology import (PDBModelReader, Topology, read_gro,
                                      read_pdb, read_psf)


def read_topology(path: str) -> Topology:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".gro":
        return read_gro(path)
    if ext == ".pdb":
        return read_pdb(path)
    if ext == ".psf":
        return read_psf(path)
    if ext in (".prmtop", ".parm7"):
        return read_prmtop(path)
    raise ValueError(f"unsupported topology format: {path}")


def _box_from_matrix(boxmat: np.ndarray) -> np.ndarray:
    """XTC box matrices -> (F, 3) diagonal lengths when orthorhombic, or
    the full (F, 3, 3) matrix when any off-diagonal is nonzero (triclinic
    minimum image in the distance kernel; round-1 silently dropped the
    off-diagonals, corrupting distances for dodecahedral/octahedral boxes)."""
    diag = np.stack([boxmat[:, 0, 0], boxmat[:, 1, 1], boxmat[:, 2, 2]],
                    axis=1)
    off = boxmat - np.einsum("fi,ij->fij", diag, np.eye(3,
                                                        dtype=boxmat.dtype))
    if np.abs(off).max() > 1e-5 * max(np.abs(diag).max(), 1.0):
        return boxmat
    return diag


def _box_from_unitcell(cell: np.ndarray) -> np.ndarray:
    """DCD unitcell rows [A, g, B, b, C... as stored: A, cos(gamma), B,
    cos(beta), cos(alpha), C] -> (F, 3) lengths or (F, 3, 3) triclinic
    matrix. Angle slots hold cosines (CHARMM) when |x| <= 1, degrees
    otherwise."""
    A, B, C = cell[:, 0], cell[:, 2], cell[:, 5]
    raw = cell[:, [4, 3, 1]]  # cos(alpha), cos(beta), cos(gamma) order
    if np.any((np.abs(raw) <= 1.0) & (raw != 0.0)):
        # the cosine-vs-degrees convention is ambiguous for |x| <= 1: a
        # genuine 1-degree angle stored in degrees would be misread as a
        # cosine. Pathological, but say so instead of silently guessing.
        warnings.warn(
            "DCD unitcell angle fields with |value| <= 1 are interpreted "
            "as cosines (CHARMM convention); boxes with genuine angles "
            "<= 1 degree stored in degrees would be misread",
            stacklevel=3)
    cosv = np.where(np.abs(raw) <= 1.0, raw, np.cos(np.radians(raw)))
    ca, cb, cg = cosv[:, 0], cosv[:, 1], cosv[:, 2]
    if np.abs(cosv).max() < 1e-6:
        return np.stack([A, B, C], axis=1).astype(np.float32)
    sg = np.sqrt(np.maximum(1.0 - cg * cg, 1e-12))
    H = np.zeros((len(cell), 3, 3), np.float32)
    H[:, 0, 0] = A
    H[:, 1, 0] = B * cg
    H[:, 1, 1] = B * sg
    H[:, 2, 0] = C * cb
    H[:, 2, 1] = C * (ca - cb * cg) / sg
    H[:, 2, 2] = np.sqrt(np.maximum(
        C * C - H[:, 2, 0] ** 2 - H[:, 2, 1] ** 2, 1e-12))
    return H


class Universe:
    """Topology + trajectory pair."""

    def __init__(self, top_path: str, traj_path: Optional[str] = None,
                 dcd_dt_ns: Optional[float] = None,
                 dt_ns: Optional[float] = None):
        self.top_path = top_path
        self.traj_path = traj_path
        self.topology = read_topology(top_path)
        self._traj = None
        # dt_ns: explicit frame interval for formats without a time axis
        # (DCD, mdcrd, time-less NetCDF); dcd_dt_ns kept as the original
        # spelling of the same knob
        self._dt_ns = dt_ns if dt_ns is not None else dcd_dt_ns
        if traj_path is not None:
            ext = os.path.splitext(traj_path)[1].lower()
            if ext == ".xtc":
                self._traj = XTCReader(traj_path)
            elif ext == ".trr":
                self._traj = TRRReader(traj_path)
            elif ext == ".dcd":
                self._traj = DCDReader(traj_path)
            elif ext in (".nc", ".ncdf"):
                self._traj = NCDFReader(traj_path)
            elif ext == ".mdcrd":
                self._traj = MDCRDReader(traj_path, self.topology.natoms)
            elif ext == ".pdb":
                self._traj = PDBModelReader(traj_path)
            elif ext in (".inpcrd", ".rst7", ".rst"):
                self._traj = InpcrdReader(traj_path)
            else:
                raise ValueError(f"unsupported trajectory format: "
                                 f"{traj_path}")
            if self._traj.natoms != self.topology.natoms:
                raise ValueError(
                    f"topology has {self.topology.natoms} atoms but "
                    f"trajectory has {self._traj.natoms}")
            if self.topology.positions is None:
                # PSF/PRMTOP carry no coordinates: seed the topology
                # with frame 0 so position-dependent selections
                # ('around', 'prop x/y/z') work, MDAnalysis-style
                coords, _, box = self._read_frames([0])
                self.topology.positions = coords[0]
                if self.topology.box is None and box is not None \
                        and box.ndim == 2:
                    self.topology.box = box[0]

    @property
    def n_frames(self) -> int:
        return len(self._traj) if self._traj is not None else 1

    def select_atoms(self, expr: str) -> np.ndarray:
        return self.topology.select(expr)

    # CHARMM DCD headers store the integration step in AKMA time units
    _AKMA_PS = 0.04888821

    def _read_frames(self, frames: Sequence[int]):
        """Normalize every reader to (coords, times_ns or None, box or
        None)."""
        if self._traj is None:
            coords = np.tile(self.topology.positions[None],
                             (len(frames), 1, 1))
            box = (np.tile(self.topology.box, (len(frames), 1))
                   if self.topology.box is not None else None)
            return coords, None, box
        if isinstance(self._traj, (XTCReader, TRRReader)):
            coords, times, boxmat, _ = self._traj.read(frames)
            return coords, times, _box_from_matrix(boxmat)
        if isinstance(self._traj, DCDReader):
            coords, cell = self._traj.read(frames)
            return coords, None, _box_from_unitcell(cell)
        if isinstance(self._traj, NCDFReader):
            return self._traj.read(frames)
        coords, box = self._traj.read(frames)   # MDCRD / PDB models
        return coords, None, box

    def timestep_ns(self) -> float:
        """Frame interval in ns (the reference's ts = dt/1000,
        contacts.py:83)."""
        if self._traj is not None and len(self._traj) > 1:
            _, t, _ = self._read_frames([0, 1])
            if t is not None:
                return float(t[1] - t[0])
        if self._dt_ns is not None:
            return self._dt_ns
        if isinstance(self._traj, DCDReader):
            if self._traj.charmm:
                # header delta [AKMA] x frames-between-saves -> ns
                return float(self._traj.delta * max(self._traj.nsavc, 1)
                             * self._AKMA_PS / 1000.0)
            raise ValueError(
                "cannot infer the frame interval from a non-CHARMM DCD "
                "header (delta units are writer-dependent); pass "
                "Universe(..., dcd_dt_ns=...) explicitly")
        if isinstance(self._traj, (MDCRDReader, NCDFReader,
                                   PDBModelReader)):
            raise ValueError(
                f"{type(self._traj).__name__} carries no usable time "
                "axis; pass Universe(..., dt_ns=...) explicitly")
        return 1.0

    def frame_positions(self, frames: Sequence[int]) -> np.ndarray:
        """(F, A, 3) coordinates [Angstrom] of the given frames."""
        return self._read_frames(frames)[0]

    def iter_batches(self, batch_size: int = 32,
                     frames: Optional[Sequence[int]] = None
                     ) -> Iterator[FrameBatch]:
        """Yield FrameBatch chunks for the contact mapper."""
        if frames is None:
            frames = np.arange(self.n_frames)
        frames = np.asarray(frames)
        ts = self.timestep_ns()
        for lo in range(0, len(frames), batch_size):
            chunk = frames[lo:lo + batch_size]
            coords, times, box = self._read_frames(chunk)
            if times is None:
                times = chunk * ts
            yield FrameBatch(frame_ids=chunk.astype(np.int64),
                             times=np.asarray(times, np.float64),
                             positions=coords, box=box)
