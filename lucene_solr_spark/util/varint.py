"""Vectorized varint (Lucene vInt) codec over numpy arrays.

Wire format matches ``L/store/DataOutput.java#writeVInt`` / ``readVInt``:
little-endian 7-bit groups, high bit = continuation (set on every byte
except the last of each value). Extended to 64-bit values (vLong) — same
format, up to 9 bytes for the 63-bit non-negative range used here.

Both directions are numpy-vectorized (no per-value Python loop): encode
loops over at most 9 *byte positions*, decode uses reduceat over
continuation-bit boundaries.
"""

from __future__ import annotations

import numpy as np

_MASK7 = np.uint64(0x7F)
_CONT = np.uint8(0x80)


def _encode_core(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """→ (uint8 buffer, per-value end byte offsets)."""
    vals = np.asarray(values)
    if vals.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    if np.any(vals < 0):
        raise ValueError("varint values must be non-negative")
    vals = vals.astype(np.uint64)
    # number of 7-bit groups per value
    nbytes = np.ones(vals.shape, dtype=np.int64)
    tmp = vals >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp != 0)
        tmp >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    for k in range(9):
        sel = nbytes > k
        if not sel.any():
            break
        b = ((vals[sel] >> np.uint64(7 * k)) & _MASK7).astype(np.uint8)
        b[(nbytes[sel] - 1) > k] |= _CONT
        out[starts[sel] + k] = b
    return out, ends


def encode_varints(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints to concatenated varints."""
    out, _ = _encode_core(values)
    return out.tobytes()


def encode_varints_sliced(values: np.ndarray, bounds: np.ndarray) -> list[bytes]:
    """ONE vectorized encode of ``values``, returned as per-slice byte
    strings for the value ranges ``bounds[i]:bounds[i+1]`` — the hot-path
    replacement for calling ``encode_varints`` once per (small) block."""
    out, ends = _encode_core(values)
    buf = out.tobytes()
    offs = np.zeros(len(values) + 1, dtype=np.int64)
    if len(values):
        offs[1:] = ends
    return [buf[offs[bounds[i]]:offs[bounds[i + 1]]] for i in range(len(bounds) - 1)]


def decode_varints(buf: bytes) -> np.ndarray:
    """Decode concatenated varints back to an int64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.int64)
    is_last = (raw & _CONT) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    shifts = (np.arange(raw.size, dtype=np.int64) - np.repeat(starts, lengths)) * 7
    contrib = (raw & np.uint8(0x7F)).astype(np.uint64) << shifts.astype(np.uint64)
    vals = np.add.reduceat(contrib, starts)
    return vals.astype(np.int64)
