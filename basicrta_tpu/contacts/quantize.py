"""u16 wire-format quantizer shared by MapContacts and bench.py.

Per-frame affine quantization onto the 16-bit grid spanning each axis's
coordinate extent — HALF the upload bytes for a coordinate error
<= extent/65535/2 (~0.002 A for a 240 A box; XTC itself stores a 0.01 A
grid, so reference trajectories carry no finer information; the
reference's stage 1 uploads nothing — it runs `capped_distance` on host,
/root/reference/basicrta/contacts.py:115-117). The affine offset
preserves atom locality — wrapping into [0, box) instead would split
boundary-straddling residues and blow their bounding spheres up to box
scale, silently defeating the pruned kernel. Geometry-independent:
orthorhombic, triclinic, or no box.
"""
from __future__ import annotations

import numpy as np

__all__ = ["quantize_u16"]


def quantize_u16(positions: np.ndarray):
    """Quantize ``(F, A, 3)`` coordinates to the per-frame u16 grid.

    Returns ``(q, scale)``: ``q`` is ``(F, A, 3) uint16``, ``scale`` is
    ``(F, 2, 3) float32`` with row 0 the grid step and row 1 the frame
    offset ``lo`` — the device dequant is ``q * step + lo``.

    The grid mapping runs in the SHIFTED domain,
    ``(positions - lo) * inv + 0.5`` — not the fused absolute-coordinate
    form ``positions * inv + (0.5 - lo * inv)``, whose float32 rounding
    scales with ``|lo| / extent`` and can reach 65536.0 (a wrapping,
    silently full-extent-wrong uint16 cast, and C-UB for the negative
    values the fused form can also produce) once coordinates sit
    thousands of Angstroms from the origin with a small axis extent —
    exactly the unwrapped/drifted trajectories the affine offset exists
    to support. Shifted-domain bound, independent of ``|lo|``: the
    subtraction is exact and >= 0 elementwise (``lo`` is the elementwise
    min), ``fl(shifted) * fl(1/step) <= 65535 * (1 + ~4 eps) < 65535.04``,
    plus 0.5 rounds to at most ~65535.6 < 65536, so the truncating cast
    can neither wrap nor go negative (tests:
    test_u16_extremes_never_wrap, test_u16_far_from_origin_never_wraps).

    Three elementwise passes + the cast; runs per frame on the prefetch
    thread (BENCH contacts_large_prep_s_per_frame attributes it).
    """
    lo = positions.min(axis=1, keepdims=True)           # (F, 1, 3)
    shifted = (positions - lo).astype(np.float32, copy=False)  # >= 0 exact
    ext = shifted.max(axis=1, keepdims=True)
    step = np.maximum(ext / 65535.0, 1e-12).astype(np.float32)
    inv = (1.0 / step).astype(np.float32)
    # round-half-up via +0.5 and the truncating cast (vs rint's
    # ties-to-even: half a grid step, below the format's error bound).
    # In-place on the shifted temp: the (F, A, 3) buffers are tens of MB
    # at bilayer scale and this runs per batch on the prefetch thread —
    # two allocations total instead of one per elementwise op
    np.multiply(shifted, inv, out=shifted)
    np.add(shifted, np.float32(0.5), out=shifted)
    q = shifted.astype(np.uint16)
    scale = np.concatenate([step, lo.astype(np.float32)], axis=1)
    return q, scale
