"""EXPERIMENT: real-vocab pair-table probe inside Pallas (VERDICT r2 #6).

Question: can the (left_id, right_id) -> merged_id probe against a
full-vocabulary table (gpt2: 2^19 slots / 9 max probes; cl100k-scale:
2^20 / 12) run inside a Pallas TPU kernel, where Mosaic's dynamic
gather reaches only the 128 lanes of one vreg (measured in
ops/merge_pallas.py)?

Formulation tested here — (a) of the round-2 review's list: decompose
``slot = row * 128 + lane``; fetch the row with a ONE-HOT MATMUL on the
MXU (``one_hot(row) @ table2d`` — dynamic row addressing expressed as
dense linear algebra, the only primitive Mosaic scales past a vreg),
then resolve the lane with the supported vreg-local
``take_along_axis``.  Bit-exact vs PairTable.lookup (tests/
test_exp_pallas_bigtable.py runs it in interpret mode).

Status: BIT-EXACT vs the host PairTable oracle (interpret mode,
tests/test_exp_pallas_bigtable.py).

MEASURED on-chip record (TPU v5e via the CI tunnel, jax 0.9.0,
2026-08-20, block_until_ready timing, gpt2 table = 2^19 slots /
9 probe rounds; rerun via tools/exp_pallas_bigtable.py):

  [2, 128] tile (256 probes):
    XLA native gather lookup:     0.064 ms
    Pallas one-hot (int8 planes): 0.101 ms   (1.6x; both dispatch-bound)
    2026-08-21 rerun, same tile, post-stall transport: XLA 25.28 ms vs
    Pallas 27.96 ms (1.1x) — both arms swallowed by the ~24 ms/RPC
    tunnel tax, same verdict; bit-exact re-confirmed on chip.
  [16, 128] tile (2048 probes, one merge wave's worth):
    XLA native gather lookup:     ~0.07 ms
    Pallas one-hot:               compile DID NOT COMPLETE within a
    500 s budget — the statically-unrolled 9 rounds x 16 sublane rows
    x 4 byte planes = 576 MXU calls blow up Mosaic compile time; the
    f32-halves variant of the same kernel OOMs scoped VMEM instead
    (measured 23.4 MB vs the 16 MB budget; the int8-plane form fits at
    16.11 MB only with an explicit vmem_limit_bytes raise).

Arithmetic expectation, independent of measurement: each probe round
streams a [128, n_rows] int8 one-hot per 128 probes through the MXU
plus the whole [4, n_rows, 384] byte-plane table, where the gather
touches ~3*4B of actually-needed bytes per probe.  The MXU formulation
pays a bandwidth/FLOP overfetch of order n_rows (4096 for gpt2) BY
CONSTRUCTION, serialized over max_probes rounds; no tiling removes
that factor — it is the cost of expressing sparse addressing as dense
linear algebra.

Conclusion: the XLA kernel (ops/merge_jax.py), whose large-table
dynamic gather XLA:TPU lowers natively, stays the production merge
path for real vocabularies — the one-hot formulation is correct and
close at toy probe counts but cannot reach wave scale (compile blowup
/ VMEM), and its bandwidth overfetch grows with table size by
construction.  The Pallas path serves vreg-sized tables
(ops/merge_pallas.py) and takes the production slot if/when Mosaic
exposes a wider dynamic gather.  This module is retained as the
experiment record (not wired into production).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pair_table import MAX_RANK, PairTable

__all__ = [
    "bigtable_device_table",
    "lookup_onehot_pallas",
    "lookup_xla",
]

LANES = 128


def bigtable_device_table(table: PairTable) -> np.ndarray:
    """Pack (key_left, key_right, values) as [4, n_rows, 3*128] INT8.

    Row r holds slots [r*128, (r+1)*128): kl in lanes 0-127, kr in
    128-255, vv in 256-383 — one one-hot matmul per byte plane fetches
    all three arrays of a slot's row at once.  int32 entries are split
    into four int8 byte planes because the selection must ride the MXU
    EXACTLY and within VMEM: f32 halves held any 16-bit value but cost
    2x4B per entry and blew the 16 MB VMEM budget at gpt2 scale
    (measured: 23.4 MB scoped-vmem OOM); int8 planes cost 4B total and
    int8 matmul accumulates exactly into int32.
    """
    n_rows = table.n_slots // LANES
    assert n_rows * LANES == table.n_slots
    t32 = np.empty((n_rows, 3 * LANES), dtype=np.int32)
    t32[:, 0 * LANES : 1 * LANES] = table.key_left.reshape(n_rows, LANES)
    t32[:, 1 * LANES : 2 * LANES] = table.key_right.reshape(n_rows, LANES)
    t32[:, 2 * LANES : 3 * LANES] = table.values.reshape(n_rows, LANES)
    out = np.empty((4, n_rows, 3 * LANES), dtype=np.int8)
    for k in range(4):
        out[k] = ((t32 >> (8 * k)) & 0xFF).astype(np.uint8).view(np.int8)
    return out


_C1 = np.uint32(0x85EBCA6B)
_C2 = np.uint32(0xC2B2AE35)
_FIB = np.uint32(0x9E3779B9)


def _slots_of(left, right, slot_bits):
    valid = (left >= 0) & (right >= 0)
    l = jnp.where(valid, left, 0).astype(jnp.uint32)
    r = jnp.where(valid, right, 0).astype(jnp.uint32)
    h = (l * _C1) ^ (r * _C2)
    h = h ^ (h >> jnp.uint32(16))
    slot = ((h * _FIB) >> jnp.uint32(32 - slot_bits)).astype(jnp.int32)
    return valid, slot


def _onehot_lookup_kernel(
    tab_ref, left_ref, right_ref, out_ref, *, slot_bits, max_probes, n_rows
):
    """Probe a [S, 128] tile of pairs against the [n_rows, 384] table.

    Per probe round and sublane row: one-hot(row) [128, n_rows] @ table
    — the MXU is the dynamic row-address engine — then the supported
    vreg-local lane gather inside the fetched rows.

    Exactness through the matmul: table entries are arbitrary int32
    (keys include -1, values up to MAX_RANK), carried as four int8 byte
    planes — a 0/1 one-hot int8 matmul accumulates the selected byte
    exactly into int32, and the planes reassemble bitwise.
    """
    left = left_ref[:]
    right = right_ref[:]
    S, B = left.shape
    valid, slot = _slots_of(left, right, slot_bits)
    mask = jnp.int32((1 << slot_bits) - 1)

    tab8 = tab_ref[:]  # [4, n_rows, 384] int8 byte planes

    out = jnp.full((S, B), MAX_RANK, dtype=jnp.int32)
    unresolved = valid
    for _ in range(max_probes):
        row = slot >> jnp.int32(7)
        lane = slot & jnp.int32(127)
        kls, krs, vvs = [], [], []
        for s in range(S):  # [128, n_rows] one-hot keeps VMEM bounded
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (B, n_rows), 1)
                == row[s][:, None]
            ).astype(jnp.int8)
            planes = [
                jnp.dot(oh, tab8[k], preferred_element_type=jnp.int32)
                & jnp.int32(0xFF)
                for k in range(4)
            ]
            f = (
                planes[0]
                | (planes[1] << 8)
                | (planes[2] << 16)
                | (planes[3] << 24)
            )
            ln = jnp.broadcast_to(lane[s][:, None], (B, LANES))
            kls.append(jnp.take_along_axis(f[:, 0:128], ln, axis=1)[:, 0])
            krs.append(
                jnp.take_along_axis(f[:, 128:256], ln, axis=1)[:, 0]
            )
            vvs.append(
                jnp.take_along_axis(f[:, 256:384], ln, axis=1)[:, 0]
            )
        kl = jnp.stack(kls)
        kr = jnp.stack(krs)
        vv = jnp.stack(vvs)
        hit = unresolved & (kl == left) & (kr == right)
        out = jnp.where(hit, vv, out)
        unresolved = unresolved & (kl != -1) & ~hit
        slot = (slot + 1) & mask
    out_ref[:] = out


@partial(
    jax.jit, static_argnames=("slot_bits", "max_probes", "interpret")
)
def lookup_onehot_pallas(
    tab2d: jnp.ndarray,
    left: jnp.ndarray,
    right: jnp.ndarray,
    *,
    slot_bits: int,
    max_probes: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[S, 128] pair probe via the one-hot-matmul Pallas kernel."""
    S, B = left.shape
    n_rows = tab2d.shape[1]  # tab2d: [4 byte planes, n_rows, 384]
    kernel = partial(
        _onehot_lookup_kernel,
        slot_bits=slot_bits,
        max_probes=max_probes,
        n_rows=n_rows,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, B), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        # The byte-plane table + unrolled probe intermediates sit just
        # over the 16 MB default scoped budget (measured 16.11M);
        # raising the cap trades scheduling freedom for fitting.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(tab2d, left, right)


@partial(jax.jit, static_argnames=("slot_bits", "max_probes"))
def lookup_xla(table_arrays, left, right, *, slot_bits, max_probes):
    """The production probe: XLA's native large-table dynamic gather
    (same math as ops/merge_jax._pair_rank; baseline for the A/B)."""
    kl_t, kr_t, vv_t = table_arrays
    valid, slot = _slots_of(left, right, slot_bits)
    mask = jnp.int32((1 << slot_bits) - 1)
    out = jnp.full(left.shape, MAX_RANK, dtype=jnp.int32)
    unresolved = valid
    for _ in range(max_probes):
        kl = kl_t[slot]
        kr = kr_t[slot]
        vv = vv_t[slot]
        hit = unresolved & (kl == left) & (kr == right)
        out = jnp.where(hit, vv, out)
        unresolved = unresolved & (kl != -1) & ~hit
        slot = (slot + 1) & mask
    return out
