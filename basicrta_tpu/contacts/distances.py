"""Batched per-residue-pair minimum-distance kernel.

Replaces the reference's per-frame ``MDAnalysis.lib.distances.capped_distance``
C neighbor search + Counter reduction (reference contacts.py:112-127) with a
device kernel: atoms are grouped by residue (padded to the widest residue),
a frame batch of coordinates is streamed to the device, and a chunked,
fused broadcast-subtract/min-reduce produces the (frame, R1, R2) matrix of
minimum atomic distances under the orthorhombic minimum-image convention.
Semantics match 'any atom within cutoff, record the pair's minimum
distance'.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# padding coordinate far from any real atom; pairs involving padding get
# huge distances and never pass a cutoff
_PAD = 1.0e6


def group_by_residue(positions: np.ndarray,
                     resids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Group an (A, 3) atom array into (R, P, 3) padded residue blocks.

    Returns the per-residue atom-index matrix (R, P) with -1 padding and the
    sorted unique resids (R,). Use the index matrix to gather coordinates per
    frame: ``pos[idx]`` with padding rows pointing at a sentinel atom.
    """
    uniq, inverse = np.unique(resids, return_inverse=True)
    counts = np.bincount(inverse)
    P = int(counts.max())
    R = len(uniq)
    idx = np.full((R, P), -1, dtype=np.int64)
    slot = np.zeros(R, dtype=np.int64)
    for a, r in enumerate(inverse):
        idx[r, slot[r]] = a
        slot[r] += 1
    return idx, uniq


def gather_grouped(positions: jnp.ndarray, idx: np.ndarray):
    """(..., A, 3) positions -> ((..., R, P, 3), (R, P) validity mask).

    Padding slots point at atom 0 (harmless coordinates); the mask excludes
    them from distance minima. A coordinate sentinel would be wrapped back
    into the box by the minimum-image convention, so masking is the only
    correct padding under PBC.
    """
    gathered = positions[..., np.where(idx < 0, 0, idx), :]
    return gathered, jnp.asarray(idx >= 0)


@functools.partial(jax.jit, static_argnames=("chunk", "use_pbc",
                                             "triclinic"))
def min_dist_per_residue_pair(pos1: jnp.ndarray, pos2: jnp.ndarray,
                              box: Optional[jnp.ndarray] = None,
                              chunk: int = 32,
                              use_pbc: bool = True,
                              mask1: Optional[jnp.ndarray] = None,
                              mask2: Optional[jnp.ndarray] = None,
                              triclinic: bool = False
                              ) -> jnp.ndarray:
    """Minimum atomic distance for every residue pair in a frame batch.

    Args:
        pos1: (F, R1, P1, 3) grouped coordinates of group 1 [A].
        pos2: (F, R2, P2, 3) grouped coordinates of group 2 [A].
        box: (F, 3) orthorhombic box lengths, or — with ``triclinic`` —
            the (F, 3, 3) GROMACS-reduced box matrix (rows are the lattice
            vectors; a = (ax,0,0), b = (bx,by,0), c = (cx,cy,cz)) [A];
            required when use_pbc.
        chunk: R1-axis chunk size bounding transient memory.
        use_pbc: apply the minimum-image convention.
        mask1/mask2: (R1, P1)/(R2, P2) validity masks for padded atom slots.
        triclinic: general minimum image (staircase reduction + 27-image
            search, exact for GROMACS-reduced boxes) matching
            ``capped_distance`` semantics on triclinic dimensions
            (reference contacts.py:115-117). The orthorhombic path is a
            single per-axis round.

    Returns:
        (F, R1, R2) float32 minimum distances.
    """
    F, R1, P1, _ = pos1.shape
    _, R2, P2, _ = pos2.shape
    if mask1 is None:
        mask1 = jnp.ones((R1, P1), bool)
    if mask2 is None:
        mask2 = jnp.ones((R2, P2), bool)
    nchunks = -(-R1 // chunk)
    pad_r1 = nchunks * chunk - R1
    pos1p = jnp.pad(pos1, ((0, 0), (0, pad_r1), (0, 0), (0, 0)))
    m1p = jnp.pad(mask1, ((0, pad_r1), (0, 0)))
    pos1c = pos1p.reshape(F, nchunks, chunk, P1, 3)
    m1c = m1p.reshape(nchunks, chunk, P1)

    def per_chunk(args):
        p1, m1 = args
        # p1: (F, chunk, P1, 3); broadcast against (F, R2, P2, 3)
        d = (p1[:, :, :, None, None, :] - pos2[:, None, None, :, :, :])
        if use_pbc and triclinic:
            # staircase reduction: lattice rows are lower-triangular, so
            # reducing components in c, b, a order leaves each within half
            # a diagonal element of zero
            H = box                                # (F, 3, 3)
            for i in (2, 1, 0):
                hvec = H[:, i, :][:, None, None, None, None, :]
                hii = H[:, i, i][:, None, None, None, None]
                d = d - hvec * jnp.round(d[..., i] / hii)[..., None]
            valid = (m1[None, :, :, None, None]
                     & mask2[None, None, None, :, :])
            # exact minimum image for reduced boxes lies within one shift
            # of the staircase-reduced vector: take the min over 27 images
            d2 = jnp.full(d.shape[:-1], jnp.inf)
            for sa in (-1, 0, 1):
                for sb in (-1, 0, 1):
                    for sc in (-1, 0, 1):
                        s = (sa * H[:, 0] + sb * H[:, 1]
                             + sc * H[:, 2])       # (F, 3)
                        dd = d + s[:, None, None, None, None, :]
                        d2 = jnp.minimum(d2, jnp.sum(dd * dd, axis=-1))
        else:
            if use_pbc:
                b = box[:, None, None, None, None, :]
                d = d - b * jnp.round(d / b)
            d2 = jnp.sum(d * d, axis=-1)           # (F, chunk, P1, R2, P2)
            valid = (m1[None, :, :, None, None]
                     & mask2[None, None, None, :, :])
        d2 = jnp.where(valid, d2, jnp.inf)
        return jnp.min(d2, axis=(2, 4))            # (F, chunk, R2)

    # scan over R1 chunks keeps the transient pairwise tensor bounded
    d2 = jax.lax.map(per_chunk, (jnp.moveaxis(pos1c, 1, 0), m1c))
    d2 = jnp.moveaxis(d2, 0, 1).reshape(F, nchunks * chunk, R2)[:, :R1]
    return jnp.sqrt(d2).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cap",))
def compact_contacts(dmin: jnp.ndarray, cutoff: float, cap: int):
    """Device-side sparsification of the dense (F, R1, R2) distance batch.

    Contacts are sparse (tens to hundreds of sub-cutoff pairs per frame out
    of R1*R2), but the dense matrix is what crosses the host link — on
    PCIe/tunnel-attached hosts that transfer, not the kernel, bounds
    contact throughput. ``top_k`` on the hit-masked negated distances packs
    every sub-cutoff entry (exact f32 values) into a fixed (F, cap) buffer.

    Returns:
        (n_hits (F,) int32, flat_idx (F, cap) int32 into R1*R2,
        dist (F, cap) f32 — slots beyond a frame's hits carry +inf).
        A frame with ``n_hits > cap`` overflowed: the caller must fall
        back to the dense transfer for that batch (exactness guard).
    """
    F = dmin.shape[0]
    flat = dmin.reshape(F, -1)
    hit = flat <= cutoff
    n = jnp.sum(hit, axis=-1).astype(jnp.int32)
    score = jnp.where(hit, -flat, -jnp.inf)
    vals, idx = jax.lax.top_k(score, cap)
    return n, idx.astype(jnp.int32), -vals


def contacts_from_batch(min_dists: np.ndarray, frame_ids: np.ndarray,
                        frame_times: np.ndarray, resids1: np.ndarray,
                        resids2: np.ndarray, cutoff: float):
    """Extract sparse contact rows from a dense (F, R1, R2) distance batch.

    Returns column arrays (frames, sel1_resids, sel2_resids, min_dist,
    times) for rows with distance <= cutoff — the schema of the reference's
    shard rows (contacts.py:125-127).
    """
    f, i, j = np.nonzero(min_dists <= cutoff)
    return (frame_ids[f].astype(np.int64),
            resids1[i].astype(np.int32),
            resids2[j].astype(np.int32),
            min_dists[f, i, j].astype(np.float32),
            frame_times[f].astype(np.float64))
