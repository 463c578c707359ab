"""Pallas merge kernel parity vs the NumPy model (interpret mode).

The Pallas kernel must be bit-exact with merge_packed_numpy (itself
bit-exact with the host oracle, tests/test_packed_merge.py) on every
tile it supports.  Interpret mode validates semantics on the CPU mesh;
the on-chip compile + XLA-vs-Pallas benchmark runs on real hardware in
bench.py.  The production full-vocab path stays on the XLA kernel — see
ops/merge_pallas.py's module docstring for the measured Mosaic
dynamic-gather constraints (vreg-local only) that force that split.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tokenizer_tpu.ops.merge_numpy import merge_packed_numpy
from tokenizer_tpu.vocab import Vocabulary


@pytest.fixture(scope="module")
def toy():
    enc = {bytes([b]): b for b in range(256)}
    nxt = 256
    for tok in [
        b"ab", b"cd", b"ef", b"abcd", b"cdef", b"abc", b"abcdef",
        b"he", b"ll", b"llo", b"hello", b" h", b" hello",
        b"12", b"123", b"1234", b"  ", b"    ",
    ]:
        enc[tok] = nxt
        nxt += 1
    v = Vocabulary(enc, name="toy")
    return v, v.pair_table()


def _pack(pieces, table, L, B):
    ids = np.full((L, B), -1, np.int32)
    lengths = np.zeros(B, np.int32)
    for c, p in enumerate(pieces):
        ids[: len(p), c] = table.byte_to_id[np.frombuffer(p, np.uint8)]
        lengths[c] = len(p)
    return ids, lengths


def _random_pieces(n, lo, hi, seed):
    rng = np.random.default_rng(seed)
    alphabet = b"abcdefhello 1234"
    return [
        bytes(
            alphabet[i]
            for i in rng.integers(0, len(alphabet), size=rng.integers(lo, hi))
        )
        for _ in range(n)
    ]


def test_toy_table_fits_one_vreg(toy):
    from tokenizer_tpu.ops.merge_pallas import pallas_supports_table

    _, table = toy
    assert table.n_slots <= 128
    assert pallas_supports_table(table)


@pytest.mark.parametrize("L,B", [(16, 128), (16, 512), (8, 256)])
def test_pallas_matches_numpy(toy, L, B):
    from tokenizer_tpu.ops.merge_pallas import (
        jit_pallas_merge_fn,
        pallas_device_table,
    )

    _, table = toy
    pieces = _random_pieces(B - 7, 2, L + 1, seed=L * B)
    ids, lengths = _pack(pieces, table, L, B)  # trailing cols stay empty
    tab = pallas_device_table(table, L)
    fn = jit_pallas_merge_fn(table)
    out_ids, out_n = fn(tab, ids, lengths, interpret=True)
    out_ids, out_n = np.asarray(out_ids), np.asarray(out_n)

    ref_ids, ref_n = merge_packed_numpy(ids, lengths, table)
    assert (out_n == ref_n).all()
    for c in range(B):
        assert (out_ids[: out_n[c], c] == ref_ids[: ref_n[c], c]).all(), c


def test_pallas_block_convergence_independent(toy):
    """Grid blocks converge independently: a tile whose first block is
    all empty and last block heavily merging gives identical results to
    the NumPy model (no cross-block coupling)."""
    from tokenizer_tpu.ops.merge_pallas import (
        jit_pallas_merge_fn,
        pallas_device_table,
    )

    _, table = toy
    L, B = 16, 384  # 3 blocks
    pieces = [b""] * 128 + [b"ab"] * 128 + [b"  hello 1234cdef"] * 128
    ids, lengths = _pack(pieces, table, L, B)
    fn = jit_pallas_merge_fn(table)
    tab = pallas_device_table(table, L)
    out_ids, out_n = fn(tab, ids, lengths, interpret=True)
    ref_ids, ref_n = merge_packed_numpy(ids, lengths, table)
    assert (np.asarray(out_n) == ref_n).all()
    out_ids = np.asarray(out_ids)
    for c in range(B):
        assert (out_ids[: ref_n[c], c] == ref_ids[: ref_n[c], c]).all()


def test_pallas_rejects_large_table(gpt2_vocab):
    from tokenizer_tpu.ops.merge_pallas import (
        pallas_device_table,
        pallas_supports_table,
    )

    table = gpt2_vocab.pair_table()
    assert not pallas_supports_table(table)
    with pytest.raises(ValueError, match="use the XLA kernel"):
        pallas_device_table(table, 16)


def test_pallas_table_shape_check(toy):
    from tokenizer_tpu.ops.merge_pallas import (
        jit_pallas_merge_fn,
        pallas_device_table,
    )

    _, table = toy
    fn = jit_pallas_merge_fn(table)
    ids = np.full((16, 256), -1, np.int32)
    lengths = np.zeros(256, np.int32)
    with pytest.raises(ValueError, match="!="):
        fn(pallas_device_table(table, 8), ids, lengths, interpret=True)
    out_ids, out_n = fn(
        pallas_device_table(table, 16), ids, lengths, interpret=True
    )
    assert (np.asarray(out_n) == 0).all()
