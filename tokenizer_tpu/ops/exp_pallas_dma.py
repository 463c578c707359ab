"""EXPERIMENT: third Pallas probe formulation — DMA / dynamic-row access
(VERDICT r3 next #3; the untried member of the round-2 list).

Question (same as ops/exp_pallas_bigtable.py): can the
(left_id, right_id) -> merged_id probe against a REAL-vocabulary pair
table (gpt2: 2^19 slots, 9 probe rounds) run inside a Pallas TPU kernel
at least as fast as XLA's native large-table gather
(ops/merge_jax.py lookup_pairs)?

Formulations already measured and rejected:
  1. vreg-local dynamic gather — lowers only for tables <= 128 slots
     (ops/merge_pallas.py module docstring, measured Mosaic limits);
  2. one-hot MXU matmul — bit-exact but bandwidth-overfetches by a
     factor of n_rows by construction; compile blow-up past toy probe
     counts (ops/exp_pallas_bigtable.py, on-chip record 2026-08-20).

This module implements the third: reshape the table as ``[n_rows, 128]``
planes so a probe's slot decomposes into (row, lane), then fetch the
row by DYNAMIC ADDRESSING and resolve the lane vreg-locally.  Two
access modes:

  * mode A ("vmem"): the whole table resident in VMEM (gpt2:
    3 planes x 4096 x 128 x 4B = 6.3 MB — fits the 16 MB budget;
    cl100k ~12.6 MB is marginal; o200k does NOT fit), rows read with a
    per-element ``pl.ds`` dynamic slice;
  * mode B ("dma"): the table stays in HBM (``memory_space=ANY``), each
    probe row is fetched with ``pltpu.make_async_copy`` into a VMEM
    scratch slot, K copies kept in flight (the slots of one probe
    round are all known upfront, so the DMAs pipeline; the
    data-dependence is only BETWEEN merge iterations).

Both are BIT-EXACT vs PairTable.lookup (tests/test_exp_pallas_dma.py
runs them in interpret mode against the host oracle).

Arithmetic expectation, stated before measurement: both modes serialize
over probe ELEMENTS (the TPU has no cross-vreg dynamic gather — that is
the whole story of formulations 1-3), so a [16, 128] probe tile costs
~2048 serial row fetches per probe round.  Mode A pays a VMEM dynamic
slice + lane select per element (~10-30 cycles); mode B pays a DMA
issue (~100+ ns) per element even fully pipelined, plus 512 B of HBM
traffic per 12 B actually needed.  XLA's native gather performs the
same per-element work inside one fused loop WITHOUT grid/loop-nest
overhead.  The hypothesis this experiment tests is whether Mosaic's
scalar path can beat XLA's; the MEASURED answer decides.

MEASURED on-chip record (TPU v5e via the CI tunnel, jax 0.9.0,
2026-08-21, block_until_ready timing, gpt2 table = 2^19 slots / 9 probe
rounds, [16, 128] probe tile = 2048 probes, min-of-10; transport in its
degraded ~24 ms/RPC mode, which taxes every arm equally; rerun via
tools/exp_pallas_dma.py):

  XLA native gather lookup:   27.1 ms   (RPC-dominated; same probe
                                         measured 0.064-0.12 ms on a
                                         clean channel in r2/r3 runs)
  Pallas mode A (VMEM rows):  531.4 ms  bit-exact; ~0.26 ms/probe-elem
  Pallas mode B (DMA rows):   555.4 ms  bit-exact; DMA adds ~5% over A

  A first attempt that indexed traced VALUES dynamically did not lower
  at all ("Unimplemented ... KernelType.TC: dynamic_slice") — recorded
  because it bounds the design space: dynamic addressing in Mosaic
  exists only on refs (SMEM scalars, pl.ds row slices) and DMA.

CONCLUSION — closes the Pallas-merge question (docs/adr-pallas-merge.md):
all three formulations are now measured on chip; the serial-element
floor (~0.25 ms per 128-lane row fetch chain) sits 3-4 orders of
magnitude above XLA's native gather, exactly as the pre-registered
arithmetic predicted.  The TPU exposes no cross-vreg dynamic gather to
Pallas, and every way of synthesizing one (vreg tile, one-hot MXU,
row-DMA) pays the serialization or overfetch by construction.  The XLA
kernel (ops/merge_jax.py) IS the production merge architecture,
permanently; ops/merge_pallas.py serves vreg-sized tables and inherits
the slot only if Mosaic ever grows a wider dynamic gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pair_table import MAX_RANK, PairTable

__all__ = [
    "table_planes_2d",
    "probe_pallas_vmem",
    "probe_pallas_dma",
    "probe_xla",
]

_C1 = np.uint32(0x85EBCA6B)
_C2 = np.uint32(0xC2B2AE35)
_FIB = np.uint32(0x9E3779B9)
LANES = 128


def table_planes_2d(table: PairTable):
    """The pair table's three planes reshaped [n_rows, 128] for
    row-addressable access (slot = row * 128 + lane)."""
    n_rows = table.n_slots // LANES
    return (
        jnp.asarray(table.key_left.reshape(n_rows, LANES)),
        jnp.asarray(table.key_right.reshape(n_rows, LANES)),
        jnp.asarray(table.values.reshape(n_rows, LANES)),
    )


def _hash_slots(left, right, slot_bits):
    valid = (left >= 0) & (right >= 0)
    l = jnp.where(valid, left, 0).astype(jnp.uint32)
    r = jnp.where(valid, right, 0).astype(jnp.uint32)
    h = (l * _C1) ^ (r * _C2)
    h = h ^ (h >> jnp.uint32(16))
    slot = ((h * _FIB) >> jnp.uint32(32 - slot_bits)).astype(jnp.int32)
    return slot, valid


def probe_xla(table_dev, slot_bits, max_probes, left, right):
    """The production probe (merge_jax.lookup_pairs) — the baseline."""
    from .merge_jax import lookup_pairs

    return lookup_pairs(table_dev, slot_bits, max_probes, left, right)


# ---- mode A: whole table in VMEM, per-element dynamic row reads ---------
#
# Mosaic lowering constraint discovered on-chip (2026-08-21, first
# attempt): `dynamic_slice` on VALUES (e.g. `flat[e]` with a traced
# scalar) is "Unimplemented ... for KernelType.TC" — dynamic addressing
# exists only on REFS.  Both modes therefore keep every per-element
# scalar in SMEM refs (left/right/out), where dynamic scalar indexing
# is supported, and touch the table planes only through ref-level
# `pl.ds` row slices.


def _scalar_hash(l_e, r_e):
    l = l_e.astype(jnp.uint32)
    r = r_e.astype(jnp.uint32)
    h = (l * _C1) ^ (r * _C2)
    h = h ^ (h >> jnp.uint32(16))
    return h * _FIB


def _lane_select(row, tlane):
    """Vreg-local lane extract of row [1, 128] at dynamic lane; exact
    for the table's entries (-1 empties recovered explicitly)."""
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    sel = lane_iota == tlane
    v = jnp.sum(jnp.where(sel, row, 0))
    return jnp.where(jnp.any(sel & (row == -1)), jnp.int32(-1), v)


def _vmem_kernel(left_ref, right_ref, kl_ref, kr_ref, vv_ref, out_ref,
                 *, slot_bits, max_probes, n_elems):
    mask_slots = jnp.int32((1 << slot_bits) - 1)

    def element(e, carry):
        l_e = left_ref[e]
        r_e = right_ref[e]
        valid = jnp.logical_and(l_e >= 0, r_e >= 0)
        h = _scalar_hash(jnp.where(valid, l_e, 0), jnp.where(valid, r_e, 0))
        slot0 = (h >> jnp.uint32(32 - slot_bits)).astype(jnp.int32)

        def probe(p, st):
            out, slot, live = st
            trow = slot // LANES
            tlane = slot % LANES
            kl = _lane_select(kl_ref[pl.ds(trow, 1), :], tlane)
            kr = _lane_select(kr_ref[pl.ds(trow, 1), :], tlane)
            vv = _lane_select(vv_ref[pl.ds(trow, 1), :], tlane)
            hit = live & (kl == l_e) & (kr == r_e)
            out = jnp.where(hit, vv, out)
            live = live & (kl != -1) & ~hit
            return out, (slot + 1) & mask_slots, live

        out_e, _s, _l = jax.lax.fori_loop(
            0, max_probes, probe, (jnp.int32(MAX_RANK), slot0, valid)
        )
        out_ref[e] = out_e
        return carry

    jax.lax.fori_loop(0, n_elems, element, 0)


def probe_pallas_vmem(
    planes, slot_bits, max_probes, left, right, interpret: bool = False
):
    """Mode A: VMEM-resident [n_rows, 128] planes, SMEM scalars, serial
    element loop with ref-level dynamic row slices."""
    kl2d, kr2d, vv2d = planes
    n_elems = int(np.prod(left.shape))
    kernel = partial(
        _vmem_kernel,
        slot_bits=slot_bits,
        max_probes=max_probes,
        n_elems=n_elems,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_elems,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(
        left.reshape(n_elems).astype(jnp.int32),
        right.reshape(n_elems).astype(jnp.int32),
        kl2d,
        kr2d,
        vv2d,
    )
    return out.reshape(left.shape)


# ---- mode B: table in HBM, per-probe row DMA ----------------------------
#
# The literal make_async_copy formulation: each probe's [1, 128] row is
# DMAd from the HBM-resident plane into a VMEM scratch slot, then lane-
# selected.  Control flow is kept STATIC (always max_probes rounds,
# hits stop updating via where) so every DMA start has a matching wait
# — the same probe count XLA's unrolled gather performs, making the
# comparison symmetric.  Issue latency is NOT hidden (a probe's row
# address is data-dependent within the element's chain); this measures
# the per-probe DMA cost floor.


def _dma_kernel(left_ref, right_ref, kl_ref, kr_ref, vv_ref, out_ref,
                rows_scratch, sems, *, slot_bits, max_probes, n_elems):
    mask_slots = jnp.int32((1 << slot_bits) - 1)

    def fetch(plane_ref, trow, slot_i):
        copy = pltpu.make_async_copy(
            plane_ref.at[pl.ds(trow, 1), :],
            rows_scratch.at[slot_i, :, :],
            sems.at[slot_i],
        )
        copy.start()
        copy.wait()
        return rows_scratch[slot_i, 0:1, :]

    def element(e, carry):
        l_e = left_ref[e]
        r_e = right_ref[e]
        valid = jnp.logical_and(l_e >= 0, r_e >= 0)
        h = _scalar_hash(jnp.where(valid, l_e, 0), jnp.where(valid, r_e, 0))
        slot0 = (h >> jnp.uint32(32 - slot_bits)).astype(jnp.int32)

        def probe(p, st):
            out, slot, live = st
            trow = slot // LANES
            tlane = slot % LANES
            kl = _lane_select(fetch(kl_ref, trow, 0), tlane)
            kr = _lane_select(fetch(kr_ref, trow, 1), tlane)
            vv = _lane_select(fetch(vv_ref, trow, 2), tlane)
            hit = live & (kl == l_e) & (kr == r_e)
            out = jnp.where(hit, vv, out)
            live = live & (kl != -1) & ~hit
            return out, (slot + 1) & mask_slots, live

        out_e, _s, _l = jax.lax.fori_loop(
            0, max_probes, probe, (jnp.int32(MAX_RANK), slot0, valid)
        )
        out_ref[e] = out_e
        return carry

    jax.lax.fori_loop(0, n_elems, element, 0)


def probe_pallas_dma(
    planes, slot_bits, max_probes, left, right, interpret: bool = False
):
    """Mode B: HBM-resident planes, one row DMA per probe."""
    kl2d, kr2d, vv2d = planes
    n_elems = int(np.prod(left.shape))
    kernel = partial(
        _dma_kernel,
        slot_bits=slot_bits,
        max_probes=max_probes,
        n_elems=n_elems,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_elems,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((3, 1, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(
        left.reshape(n_elems).astype(jnp.int32),
        right.reshape(n_elems).astype(jnp.int32),
        kl2d,
        kr2d,
        vv2d,
    )
    return out.reshape(left.shape)
