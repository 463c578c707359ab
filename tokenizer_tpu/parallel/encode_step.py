"""The sharded merge step: shard_map over the data mesh + psum counters.

The packed tile's batch dimension (lanes = pieces) shards across
``("data",)``; the pair table is replicated (in_spec ``P()``), matching
SURVEY.md §2.3: TP is N/A, the rank table is never sharded.  Each shard
runs the identical merge program on its local columns — no cross-shard
communication exists in the merge itself; the only collectives are the
``psum`` of the observability counters (tokens out, live columns),
which ride ICI on a pod slice.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.merge_jax import merge_packed_jax
from ..ops.pair_table import PairTable

__all__ = ["sharded_merge_step", "make_sharded_merge_fn"]


def sharded_merge_step(
    tab,
    ids: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    slot_bits: int,
    max_probes: int,
):
    """Single-shard body: merge local columns, psum global counters."""
    out_ids, out_n = merge_packed_jax(
        tab, ids, lengths, slot_bits=slot_bits, max_probes=max_probes
    )
    local_tokens = jnp.sum(out_n)
    local_pieces = jnp.sum((lengths > 0).astype(jnp.int32))
    counters = jnp.stack([local_tokens, local_pieces])
    counters = jax.lax.psum(counters, axis_name="data")
    return out_ids, out_n, counters


def make_sharded_merge_fn(table: PairTable, mesh: "jax.sharding.Mesh"):
    """Jitted fn(tab, ids[L, B], lengths[B]) sharded on B over the mesh.

    Returns (out_ids [L, B], out_n [B], counters[2]) where counters are
    the globally psum-reduced (tokens_out, pieces) — identical on every
    shard.  B must be divisible by the mesh size.
    """
    body = partial(
        sharded_merge_step,
        slot_bits=table.slot_bits,
        max_probes=table.max_probes,
    )
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, "data"), P("data")),
        out_specs=(P(None, "data"), P("data"), P()),
    )
    return jax.jit(mapped)
