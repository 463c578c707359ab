"""Ragged piece packing into fixed-shape device tiles.

Regex pieces are short (SURVEY.md §5 long-context: merges never cross
piece boundaries, so any document decomposes into independent pieces).
The packer buckets unique pieces by byte length into column-major
``[L, B]`` int32 tiles — the LANE dimension is the batch so the VPU
vectorizes the merge loop across pieces, and the sublane dimension L
stays a multiple of 8 (int32 tile = 8x128).

Bucket L in {16, 64, 128}; pieces longer than 128 bytes (pathological
p50k digit runs / no-whitespace runs, SURVEY.md §7 'oversized-piece
tail') are routed to the host oracle and counted, never silently
truncated.  Length-1 pieces skip the kernel entirely (their id is
``byte_to_id[b]``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["PackedBatch", "PackPlan", "pack_pieces", "BUCKETS", "LANE"]

#: Piece-length buckets (sublane-aligned). Device path covers <= 128 bytes.
BUCKETS: Tuple[int, ...] = (16, 64, 128)
#: Lane width — batch dims are padded to a multiple of this.
LANE = 128


@dataclass
class PackedBatch:
    """One bucket's packed tile: ids[L, B] (pad -1) + lengths[B] (pad 0)."""

    l_max: int
    ids: np.ndarray  # int32 [L, B]
    lengths: np.ndarray  # int32 [B]
    n_real: int  # columns that carry real pieces (<= B)


@dataclass
class PackPlan:
    """Routing of a unique-piece list into buckets / direct / host paths.

    ``route[i]`` for unique piece i is one of:
      ('direct', token_id)            — length-1 piece
      ('bucket', bucket_idx, column)  — packed into batches[bucket_idx]
      ('host', host_idx)              — host-oracle fallback
    """

    batches: List[PackedBatch]
    route: List[tuple]
    host_pieces: List[bytes]

    @property
    def n_host_fallback(self) -> int:
        return len(self.host_pieces)


def pack_pieces(
    pieces: Sequence[bytes],
    byte_to_id: np.ndarray,
    buckets: Tuple[int, ...] = BUCKETS,
    lane: int = LANE,
    force_host: Optional[set] = None,
    b_quantum: Optional[int] = None,
) -> PackPlan:
    """Pack unique piece byte-strings into per-bucket [L, B] tiles.

    ``force_host`` is the (normally empty) set of pieces that must take
    the host oracle — the pair-merge-unreachable vocab tokens from
    :meth:`PairTable.verify_merge_closure`.

    ``b_quantum`` (default: ``lane``) is the smallest batch tier; B is
    always ``b_quantum * 2**k``.  The sharded merge path passes
    ``mesh_size * lane`` so every tile divides evenly into lane-aligned
    per-device shards (SURVEY.md §2.3 DP row).
    """
    per_bucket: List[List[int]] = [[] for _ in buckets]
    route: List[tuple] = [None] * len(pieces)  # type: ignore[list-item]
    host_pieces: List[bytes] = []

    for i, p in enumerate(pieces):
        n = len(p)
        if n == 0:
            route[i] = ("direct", -1)
            continue
        if force_host is not None and p in force_host:
            route[i] = ("host", len(host_pieces))
            host_pieces.append(p)
            continue
        if n == 1:
            route[i] = ("direct", int(byte_to_id[p[0]]))
            continue
        for bi, L in enumerate(buckets):
            if n <= L:
                route[i] = ("bucket", bi, len(per_bucket[bi]))
                per_bucket[bi].append(i)
                break
        else:
            route[i] = ("host", len(host_pieces))
            host_pieces.append(p)

    batches: List[PackedBatch] = []
    for bi, L in enumerate(buckets):
        idxs = per_bucket[bi]
        n_real = len(idxs)
        if n_real == 0:
            batches.append(
                PackedBatch(
                    l_max=L,
                    ids=np.empty((L, 0), dtype=np.int32),
                    lengths=np.empty((0,), dtype=np.int32),
                    n_real=0,
                )
            )
            continue
        # Pad B to a power-of-two tier (>= b_quantum >= lane): the merge
        # kernel is jit-compiled per (L, B) shape, so quantizing B bounds
        # the number of compilations at ~log2(max batch) per bucket
        # instead of one per distinct piece count.
        B = b_quantum or lane
        while B < n_real:
            B *= 2
        ids = np.full((L, B), -1, dtype=np.int32)
        lengths = np.zeros((B,), dtype=np.int32)
        for col, pi in enumerate(idxs):
            p = pieces[pi]
            arr = np.frombuffer(p, dtype=np.uint8)
            ids[: len(p), col] = byte_to_id[arr]
            lengths[col] = len(p)
        batches.append(
            PackedBatch(l_max=L, ids=ids, lengths=lengths, n_real=n_real)
        )

    return PackPlan(batches=batches, route=route, host_pieces=host_pieces)
