"""Universe: topology + trajectory, streaming frame batches to the pipeline.

The minimal analogue of the MDAnalysis Universe the reference builds at the
top of each stage (reference contacts.py:246-249, kinetics.py:103): parse a
topology (GRO/PDB), attach a trajectory (XTC/DCD), select atom groups, and
iterate device-sized frame batches.
"""

from __future__ import annotations

import os
import warnings
from typing import Iterator, Optional, Sequence

import numpy as np

from basicrta_tpu.contacts.mapper import FrameBatch
from basicrta_tpu.io.native import DCDReader, TRRReader, XTCReader
from basicrta_tpu.io.topology import (Topology, read_gro, read_pdb,
                                      read_psf)


def read_topology(path: str) -> Topology:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".gro":
        return read_gro(path)
    if ext == ".pdb":
        return read_pdb(path)
    if ext == ".psf":
        return read_psf(path)
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
                 dcd_dt_ns: Optional[float] = None):
        self.top_path = top_path
        self.traj_path = traj_path
        self.topology = read_topology(top_path)
        self._traj = None
        self._dcd_dt_ns = dcd_dt_ns
        if traj_path is not None:
            ext = os.path.splitext(traj_path)[1].lower()
            if ext == ".xtc":
                self._traj = XTCReader(traj_path)
            elif ext == ".trr":
                self._traj = TRRReader(traj_path)
            elif ext == ".dcd":
                self._traj = DCDReader(traj_path)
            else:
                raise ValueError(f"unsupported trajectory format: "
                                 f"{traj_path}")
            if self._traj.natoms != self.topology.natoms:
                raise ValueError(
                    f"topology has {self.topology.natoms} atoms but "
                    f"trajectory has {self._traj.natoms}")

    @property
    def n_frames(self) -> int:
        return len(self._traj) if self._traj is not None else 1

    def select_atoms(self, expr: str) -> np.ndarray:
        return self.topology.select(expr)

    # CHARMM DCD headers store the integration step in AKMA time units
    _AKMA_PS = 0.04888821

    def timestep_ns(self) -> float:
        """Frame interval in ns (the reference's ts = dt/1000,
        contacts.py:83)."""
        if (isinstance(self._traj, (XTCReader, TRRReader))
                and len(self._traj) > 1):
            _, t, _, _ = self._traj.read([0, 1])
            return float(t[1] - t[0])
        if isinstance(self._traj, DCDReader):
            if self._dcd_dt_ns is not None:
                return self._dcd_dt_ns
            if self._traj.charmm:
                # header delta [AKMA] x frames-between-saves -> ns
                return float(self._traj.delta * max(self._traj.nsavc, 1)
                             * self._AKMA_PS / 1000.0)
            raise ValueError(
                "cannot infer the frame interval from a non-CHARMM DCD "
                "header (delta units are writer-dependent); pass "
                "Universe(..., dcd_dt_ns=...) explicitly")
        return 1.0

    def frame_positions(self, frames: Sequence[int]) -> np.ndarray:
        """(F, A, 3) coordinates [Angstrom] of the given frames."""
        if self._traj is None:
            return np.tile(self.topology.positions[None], (len(frames), 1, 1))
        if isinstance(self._traj, (XTCReader, TRRReader)):
            coords, _, _, _ = self._traj.read(frames)
        else:
            coords, _ = self._traj.read(frames)
        return coords

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
            if self._traj is None:
                coords = self.frame_positions(chunk)
                box = (np.tile(self.topology.box, (len(chunk), 1))
                       if self.topology.box is not None else None)
                times = chunk * ts
            elif isinstance(self._traj, (XTCReader, TRRReader)):
                coords, times, boxmat, _ = self._traj.read(chunk)
                box = _box_from_matrix(boxmat)
            else:
                coords, cell = self._traj.read(chunk)
                box = _box_from_unitcell(cell)
                times = chunk * ts
            yield FrameBatch(frame_ids=chunk.astype(np.int64),
                             times=np.asarray(times, np.float64),
                             positions=coords, box=box)
