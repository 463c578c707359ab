"""NumPy model of the packed merge kernel (SURVEY.md §7 stage 3).

Bit-exact vectorized implementation of the tiktoken merge loop over a
packed ``[L, B]`` tile — the executable specification for the XLA and
Pallas kernels (identical state layout, identical update rules), and
the validation target proving packed == oracle on the conformance
corpus.

State per column (one piece per column):
  ids[L]  — current segment ids (ids[0:n] valid, -1 beyond)
  rank[L] — rank[i] = merged id of segments (i, i+1) for i < n-1, else
            MAX_RANK (a merged token's id IS its rank, so the argmin
            value doubles as the new segment id — no extra probe on the
            merge itself)
  n       — live segment count

Each iteration applies ONE merge per column (the reference's strict
global-min / first-index semantics, BytePairEncoder.cs:45-64), shifting
the tail up and re-probing only the (j-1, j) and (j, j+1) pairs.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .pair_table import MAX_RANK, PairTable

__all__ = ["merge_packed_numpy"]


def _initial_ranks(ids: np.ndarray, n: np.ndarray, table: PairTable) -> np.ndarray:
    L, B = ids.shape
    rank = np.full((L, B), MAX_RANK, dtype=np.int32)
    if L >= 2:
        rank[:-1, :] = table.lookup(ids[:-1, :], ids[1:, :])
    row = np.arange(L)[:, None]
    rank[row >= (n[None, :] - 1)] = MAX_RANK
    return rank


def merge_packed_numpy(
    ids: np.ndarray, lengths: np.ndarray, table: PairTable
) -> Tuple[np.ndarray, np.ndarray]:
    """Run the merge loop on a packed tile. Returns (out_ids, out_n).

    ``out_ids[:out_n[b], b]`` are the token ids of column b's piece in
    order; rows beyond are -1.
    """
    ids = ids.copy()
    n = lengths.astype(np.int32).copy()
    L, B = ids.shape
    rank = _initial_ranks(ids, n, table)
    row = np.arange(L)[:, None]  # [L, 1]

    for _ in range(max(L - 1, 0)):
        j = np.argmin(rank, axis=0)  # first min index per column
        minrank = rank[j, np.arange(B)]
        active = minrank != MAX_RANK
        if not active.any():
            break

        jb = j[None, :]  # [1, B]
        new_id = minrank  # merged token id == its rank

        # ids update: row j <- new_id; rows > j shift up; pad with -1.
        ids_shift = np.concatenate([ids[1:], np.full((1, B), -1, np.int32)])
        ids_new = np.where(
            row < jb, ids, np.where(row == jb, new_id[None, :], ids_shift)
        )
        ids = np.where(active[None, :], ids_new, ids)
        n = np.where(active, n - 1, n)

        # rank update: rows < j-1 keep; j-1 and j re-probe; rows > j shift.
        rank_shift = np.concatenate(
            [rank[1:], np.full((1, B), MAX_RANK, np.int32)]
        )
        cols = np.arange(B)
        jm1 = np.maximum(j - 1, 0)
        jp1 = np.minimum(j + 1, L - 1)
        left_l = ids[jm1, cols]
        left_r = ids[j, cols]
        right_l = ids[j, cols]
        right_r = ids[jp1, cols]
        probe_left = table.lookup(left_l, left_r)  # pair (j-1, j)
        probe_right = table.lookup(right_l, right_r)  # pair (j, j+1)
        # Out-of-range guards (BytePairEncoder.cs:57-63 bounds).
        probe_left = np.where(j > 0, probe_left, MAX_RANK)
        probe_right = np.where(j < n - 1, probe_right, MAX_RANK)

        rank_new = np.where(
            row < jb - 1,
            rank,
            np.where(
                row == jb - 1,
                probe_left[None, :],
                np.where(row == jb, probe_right[None, :], rank_shift),
            ),
        )
        # Kill ranks at/after the last pair.
        rank_new = np.where(row >= (n[None, :] - 1), MAX_RANK, rank_new)
        rank = np.where(active[None, :], rank_new, rank)

    return ids, n
