"""Bit-exactness of the third Pallas probe formulation (DMA/dynamic-row)
against the host PairTable oracle, interpret mode (no TPU needed).

See ops/exp_pallas_dma.py for the experiment record; this test is the
parity arbiter for both access modes.
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import require_vocab


@pytest.fixture(scope="module")
def table():
    require_vocab("gpt2")
    from tokenizer_tpu.vocab import Vocabulary

    return Vocabulary.for_encoding("gpt2", allow_fetch=False).pair_table()


@pytest.fixture(scope="module")
def probes(table):
    """A probe set mixing real pairs (hits), random pairs (mostly
    misses), and invalid (-1) lanes — [8, 128]."""
    rng = np.random.default_rng(42)
    n = 8 * 128
    filled = np.nonzero(table.key_left != -1)[0]
    pick = rng.choice(filled, size=n // 2)
    left = np.empty(n, np.int32)
    right = np.empty(n, np.int32)
    left[: n // 2] = table.key_left[pick]
    right[: n // 2] = table.key_right[pick]
    left[n // 2 :] = rng.integers(0, 50000, n // 2)
    right[n // 2 :] = rng.integers(0, 50000, n // 2)
    left[::37] = -1  # invalid lanes
    return left.reshape(8, 128), right.reshape(8, 128)


def _oracle(table, left, right):
    from tokenizer_tpu.ops.pair_table import MAX_RANK

    out = np.full(left.shape, MAX_RANK, np.int32)
    for idx in np.ndindex(left.shape):
        l, r = int(left[idx]), int(right[idx])
        if l < 0 or r < 0:
            continue
        v = table.lookup(l, r)
        if v is not None:
            out[idx] = v
    return out


def test_vmem_mode_parity(table, probes):
    from tokenizer_tpu.ops.exp_pallas_dma import (
        probe_pallas_vmem,
        table_planes_2d,
    )

    left, right = probes
    planes = table_planes_2d(table)
    got = np.asarray(
        probe_pallas_vmem(
            planes,
            table.slot_bits,
            table.max_probes,
            left,
            right,
            interpret=True,
        )
    )
    want = _oracle(table, left, right)
    assert np.array_equal(got, want)


def test_dma_mode_parity(table, probes):
    from tokenizer_tpu.ops.exp_pallas_dma import (
        probe_pallas_dma,
        table_planes_2d,
    )

    left, right = probes
    planes = table_planes_2d(table)
    got = np.asarray(
        probe_pallas_dma(
            planes,
            table.slot_bits,
            table.max_probes,
            left,
            right,
            interpret=True,
        )
    )
    want = _oracle(table, left, right)
    assert np.array_equal(got, want)


def test_xla_baseline_parity(table, probes):
    from tokenizer_tpu.ops.exp_pallas_dma import probe_xla
    from tokenizer_tpu.ops.merge_jax import device_table

    left, right = probes
    got = np.asarray(
        probe_xla(
            device_table(table),
            table.slot_bits,
            table.max_probes,
            left,
            right,
        )
    )
    want = _oracle(table, left, right)
    assert np.array_equal(got, want)
