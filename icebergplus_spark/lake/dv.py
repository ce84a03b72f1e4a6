"""Deletion vectors (Iceberg v3 bitmap position deletes).

One compact bitmap per data file replaces the pile of position-delete
rows MoR otherwise accumulates: v2 scans anti-join EVERY live
position-delete file against the data (read amplification grows with
delete-commit count); v3 scans load at most ONE vector per data file
and apply it as a vectorized membership test. This module is the
codec; the write/scan/compact integration lives in table.py
(``delete_where`` under ``delete.representation=dv``).

Format (roaring-bitmap-inspired, little-endian):

    magic  b"DV1\\0"
    u32    container count
    repeat per container (sorted by ``high``):
        u32  high       (position >> 16 — supports 2^48 rows/file)
        u8   kind       (0 = sorted uint16 array, 1 = 8 KiB bitmap)
        u32  cardinality
        payload: kind 0 → cardinality * u16 (sorted, unique)
                 kind 1 → 8192 bytes, bit (low) set ⇔ position deleted

Containers flip from array to bitmap at 4096 entries — past that the
bitmap (fixed 8 KiB per 65 536 positions) is smaller AND O(1) per
lookup, the same density trade roaring makes. All hot paths are
vectorized numpy; nothing here touches Spark.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"DV1\x00"
_ARRAY_MAX = 4096  # flip threshold, roaring's classic cutoff
_BITMAP_BYTES = 8192  # 65536 bits


def encode_dv(positions) -> bytes:
    """Serialize an iterable of row positions (any order, duplicates
    tolerated) into a deletion vector."""
    pos = np.unique(np.asarray(list(positions) if not isinstance(
        positions, np.ndarray) else positions, dtype=np.int64))
    if pos.size and pos[0] < 0:
        raise ValueError("negative row position in deletion vector")
    out = [_MAGIC]
    highs = (pos >> 16).astype(np.uint32)
    lows = (pos & 0xFFFF).astype(np.uint16)
    uniq, starts = np.unique(highs, return_index=True)
    out.append(struct.pack("<I", uniq.size))
    bounds = list(starts) + [pos.size]
    for i, h in enumerate(uniq):
        lo = lows[bounds[i]:bounds[i + 1]]
        if lo.size <= _ARRAY_MAX:
            out.append(struct.pack("<IBI", int(h), 0, lo.size))
            out.append(lo.tobytes())
        else:
            bits = np.zeros(_BITMAP_BYTES, dtype=np.uint8)
            np.bitwise_or.at(
                bits, lo >> 3, (1 << (lo & 7)).astype(np.uint8)
            )
            out.append(struct.pack("<IBI", int(h), 1, lo.size))
            out.append(bits.tobytes())
    return b"".join(out)


def _containers(blob: bytes):
    """Yield (high, kind, cardinality, payload-ndarray)."""
    if blob[:4] != _MAGIC:
        raise ValueError("not a deletion vector (bad magic)")
    (n,) = struct.unpack_from("<I", blob, 4)
    off = 8
    for _ in range(n):
        high, kind, card = struct.unpack_from("<IBI", blob, off)
        off += 9
        if kind == 0:
            payload = np.frombuffer(blob, dtype=np.uint16, count=card, offset=off)
            off += 2 * card
        else:
            payload = np.frombuffer(
                blob, dtype=np.uint8, count=_BITMAP_BYTES, offset=off
            )
            off += _BITMAP_BYTES
        yield high, kind, card, payload


def cardinality(blob: bytes) -> int:
    return sum(card for _, _, card, _ in _containers(blob))


def decode_positions(blob: bytes) -> np.ndarray:
    """All deleted positions, sorted ascending (int64)."""
    parts = []
    for high, kind, _card, payload in _containers(blob):
        base = np.int64(high) << 16
        if kind == 0:
            parts.append(base + payload.astype(np.int64))
        else:
            lows = np.flatnonzero(np.unpackbits(payload, bitorder="little"))
            parts.append(base + lows.astype(np.int64))
    return (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    )


def contains(blob: bytes, positions: np.ndarray) -> np.ndarray:
    """Vectorized membership: bool mask aligned with ``positions``."""
    pos = np.asarray(positions, dtype=np.int64)
    mask = np.zeros(pos.size, dtype=bool)
    if pos.size == 0:
        return mask
    highs = (pos >> 16).astype(np.uint32)
    lows = (pos & 0xFFFF).astype(np.uint16)
    for high, kind, _card, payload in _containers(blob):
        sel = highs == high
        if not sel.any():
            continue
        lo = lows[sel]
        if kind == 0:
            hit = np.isin(lo, payload)
        else:
            hit = (payload[lo >> 3] >> (lo & 7).astype(np.uint8)) & 1 == 1
        mask[sel] |= hit
    return mask


def merge(*blobs: bytes) -> bytes:
    """Union of deletion vectors (the at-most-one-DV-per-file invariant:
    a new delete merges into the file's existing vector)."""
    return encode_dv(
        np.concatenate([decode_positions(b) for b in blobs])
        if blobs
        else np.empty(0, dtype=np.int64)
    )
