"""Packed merge kernels (NumPy model + XLA) vs the host oracle.

Proves packed == oracle (SURVEY.md §7 stage 3-4) on adversarial toy
vocabs, fuzzed gpt2 pieces, and the full conformance corpus piece set.
"""

import numpy as np
import pytest

import regex as _regex

from conftest import has_vocab

from tokenizer_tpu.bpe import byte_pair_encode
from tokenizer_tpu.models.registry import REGEX_PATTERN_1
from tokenizer_tpu.ops.packing import pack_pieces
from tokenizer_tpu.ops.merge_numpy import merge_packed_numpy
from tokenizer_tpu.ops.pair_table import PairTable
from tokenizer_tpu.vocab import Vocabulary


def _pack_single_bucket(pieces, table, L):
    """Pack pieces (all <= L bytes, >= 2 bytes) into one [L, B] tile."""
    B = max(len(pieces), 1)
    B = -(-B // 128) * 128
    ids = np.full((L, B), -1, dtype=np.int32)
    lengths = np.zeros((B,), dtype=np.int32)
    for col, p in enumerate(pieces):
        arr = np.frombuffer(p, dtype=np.uint8)
        ids[: len(p), col] = table.byte_to_id[arr]
        lengths[col] = len(p)
    return ids, lengths


def _unpack(out_ids, out_n, count):
    return [list(out_ids[: out_n[c], c]) for c in range(count)]


def _check_pieces(pieces, vocab, table, merge_fn, L=16):
    ids, lengths = _pack_single_bucket(pieces, table, L)
    out_ids, out_n = merge_fn(ids, lengths)
    out_ids = np.asarray(out_ids)
    out_n = np.asarray(out_n)
    got = _unpack(out_ids, out_n, len(pieces))
    want = [byte_pair_encode(p, vocab.encoder) for p in pieces]
    assert got == want, [
        (p, g, w) for p, g, w in zip(pieces, got, want) if g != w
    ]


@pytest.fixture(scope="module")
def toy():
    enc = {bytes([b]): b for b in range(256)}
    # A rich merge DAG over "abcdef".
    extra = [b"ab", b"cd", b"ef", b"abcd", b"cdef", b"abc", b"bc", b"bcd"]
    for i, tok in enumerate(extra):
        enc[tok] = 256 + i
    v = Vocabulary(enc, name="toy")
    return v, PairTable.build(v, verify_closure=False)


NUMPY_AND_JAX = ["numpy", "jax"]


def _merge_fn(kind, table):
    if kind == "numpy":
        return lambda ids, lengths: merge_packed_numpy(ids, lengths, table)
    import jax.numpy as jnp

    from tokenizer_tpu.ops.merge_jax import device_table, jit_merge_fn

    tab = device_table(table)
    f = jit_merge_fn(table)
    return lambda ids, lengths: f(tab, jnp.asarray(ids), jnp.asarray(lengths))


@pytest.mark.parametrize("kind", NUMPY_AND_JAX)
def test_toy_pieces(toy, kind):
    vocab, table = toy
    pieces = [
        b"ab",
        b"abc",
        b"abcd",
        b"abcdef",
        b"fedcba",
        b"aabbcc",
        b"xyz",
        b"bcd",
        b"abcdabcd",
        b"aaaaaaa",
    ]
    _check_pieces(pieces, vocab, table, _merge_fn(kind, table), L=16)


@pytest.mark.parametrize("kind", NUMPY_AND_JAX)
def test_tie_break_first_index(kind):
    # "aaa...": equal ranks everywhere — first-index merges only.
    enc = {bytes([b]): b for b in range(256)}
    enc[b"aa"] = 256
    enc[b"aaaa"] = 257
    v = Vocabulary(enc, name="ties")
    t = PairTable.build(v, verify_closure=False)
    pieces = [b"aa", b"aaa", b"aaaa", b"aaaaa", b"aaaaaa", b"a" * 15]
    _check_pieces(pieces, v, t, _merge_fn(kind, t), L=16)


@pytest.mark.skipif(not has_vocab("gpt2"), reason="gpt2 vocab unavailable")
@pytest.mark.parametrize("kind", NUMPY_AND_JAX)
def test_gpt2_fuzz_pieces(gpt2_vocab, gpt2_pair_table, kind):
    import random

    rng = random.Random(42)
    merge = _merge_fn(kind, gpt2_pair_table)
    # Random byte pieces (2..16 bytes) — stress every merge path.
    pieces = [
        bytes(rng.randrange(256) for _ in range(rng.randint(2, 16)))
        for _ in range(512)
    ]
    _check_pieces(pieces, gpt2_vocab, gpt2_pair_table, merge, L=16)
    # Random vocab tokens — must merge back to themselves (closure).
    toks = [t for t in gpt2_vocab.encoder if 2 <= len(t) <= 16]
    pieces = rng.sample(toks, 512)
    _check_pieces(pieces, gpt2_vocab, gpt2_pair_table, merge, L=16)


@pytest.mark.skipif(not has_vocab("gpt2"), reason="gpt2 vocab unavailable")
@pytest.mark.parametrize("kind", NUMPY_AND_JAX)
def test_gpt2_conformance_pieces(
    gpt2_vocab, gpt2_pair_table, lib_rs_text, kind
):
    """Every unique piece of the conformance corpus through the kernel."""
    pat = _regex.compile(REGEX_PATTERN_1)
    pieces = sorted(
        {
            m.group(0).encode("utf-8")
            for m in pat.finditer(lib_rs_text)
        }
    )
    pieces = [p for p in pieces if 2 <= len(p) <= 64]
    merge = _merge_fn(kind, gpt2_pair_table)
    _check_pieces(pieces, gpt2_vocab, gpt2_pair_table, merge, L=64)


def test_pack_pieces_routing(toy):
    vocab, table = toy
    pieces = [b"", b"a", b"ab", b"x" * 16, b"y" * 17, b"z" * 128, b"w" * 513]
    plan = pack_pieces(pieces, table.byte_to_id)
    kinds = [r[0] for r in plan.route]
    assert kinds == [
        "direct",
        "direct",
        "bucket",
        "bucket",
        "bucket",
        "bucket",
        "host",
    ]
    # b"ab" and b"x"*16 land in the L=16 bucket; 17 bytes → 64; 128 → 128.
    assert plan.route[2][1] == 0 and plan.route[3][1] == 0
    assert plan.route[4][1] == 1
    assert plan.route[5][1] == 2
    assert plan.host_pieces == [b"w" * 513]
    b0 = plan.batches[0]
    assert b0.ids.shape == (16, 128) and b0.n_real == 2
    assert b0.lengths[0] == 2 and b0.lengths[1] == 16
    # force_host routes listed pieces to the oracle.
    plan2 = pack_pieces(pieces, table.byte_to_id, force_host={b"ab"})
    assert plan2.route[2][0] == "host"


def test_pack_spans_matches_pack_pieces(gpt2_pair_table):
    """pack_spans must produce byte-identical tiles + routing to the
    per-piece pack_pieces loop on an arbitrary mixed wave."""
    import numpy as np

    from tokenizer_tpu.ops.packing import pack_pieces, pack_spans

    rng = np.random.default_rng(3)
    pieces = []
    for k in range(500):
        n = int(rng.choice([1, 2, 3, 5, 8, 15, 40, 100, 300, 600]))
        pieces.append(bytes(rng.integers(32, 120, n, dtype=np.uint8)))
    pieces.append(b"")  # empty -> direct -1
    buf = b"".join(pieces)
    ends = np.cumsum([len(p) for p in pieces]).astype(np.int64)
    starts = ends - np.array([len(p) for p in pieces], dtype=np.int64)
    p1 = pack_pieces(pieces, gpt2_pair_table.byte_to_id)
    p2 = pack_spans(buf, starts, ends, gpt2_pair_table.byte_to_id)
    assert len(p1.batches) == len(p2.batches)
    for a, b in zip(p1.batches, p2.batches):
        assert a.ids.shape == b.ids.shape and a.n_real == b.n_real
        assert np.array_equal(a.ids, b.ids)
        assert np.array_equal(a.lengths, b.lengths)
    # Routing parity: per-piece destination classes agree.
    for i, p in enumerate(pieces):
        r = p1.route[i]
        if r[0] == "direct":
            j = np.nonzero(p2.direct_idx == i)[0]
            assert j.size == 1 and p2.direct_ids[j[0]] == r[1]
        elif r[0] == "host":
            assert i in p2.host_idx
        else:
            _, bi, col = r
            assert p2.batch_piece_idx[bi][col] == i


def test_pack_spans_degenerate_waves(gpt2_pair_table):
    import numpy as np

    from tokenizer_tpu.ops.packing import pack_spans

    # All-direct wave: no tiles.
    buf = b"abcd"
    starts = np.arange(4, dtype=np.int64)
    ends = starts + 1
    plan = pack_spans(buf, starts, ends, gpt2_pair_table.byte_to_id)
    assert not plan.batches and plan.direct_idx.size == 4
    assert plan.host_idx.size == 0
    # All-oversized wave: everything host.
    big = b"x" * 600
    plan = pack_spans(
        big, np.array([0], np.int64), np.array([600], np.int64),
        gpt2_pair_table.byte_to_id,
    )
    assert not plan.batches and plan.host_idx.size == 1
    # Empty wave.
    plan = pack_spans(
        b"", np.empty(0, np.int64), np.empty(0, np.int64),
        gpt2_pair_table.byte_to_id,
    )
    assert not plan.batches and plan.direct_idx.size == 0
