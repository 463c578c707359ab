"""PairTable: exactness of the id-pair reformulation and the probe model."""

import numpy as np
import pytest

from conftest import has_vocab

from tokenizer_tpu.ops.pair_table import MAX_RANK, PairTable
from tokenizer_tpu.vocab import Vocabulary


def _toy_vocab():
    """Single bytes + a few merges, with a known pair structure."""
    enc = {bytes([b]): b for b in range(256)}
    enc[b"ab"] = 256
    enc[b"cd"] = 257
    enc[b"abcd"] = 258
    enc[b"abc"] = 259
    return Vocabulary(enc, name="toy")


def test_build_entries_exact():
    t = PairTable.build(_toy_vocab(), verify_closure=False)
    # ab = a+b, cd = c+d, abcd = ab+cd / a+? (no "bcd") / abc+d,
    # abc = ab+c / a+? (no "bc")
    a, b, c, d = (ord(x) for x in "abcd")
    assert t.lookup(np.array([a]), np.array([b]))[0] == 256
    assert t.lookup(np.array([c]), np.array([d]))[0] == 257
    assert t.lookup(np.array([256]), np.array([257]))[0] == 258
    assert t.lookup(np.array([259]), np.array([d]))[0] == 258
    assert t.lookup(np.array([256]), np.array([c]))[0] == 259
    # Misses.
    assert t.lookup(np.array([a]), np.array([c]))[0] == MAX_RANK
    assert t.lookup(np.array([b]), np.array([a]))[0] == MAX_RANK
    # Padding ids never match.
    assert t.lookup(np.array([-1]), np.array([b]))[0] == MAX_RANK
    assert t.lookup(np.array([a]), np.array([-1]))[0] == MAX_RANK


def test_lookup_vectorized_shapes():
    t = PairTable.build(_toy_vocab(), verify_closure=False)
    a, b = ord("a"), ord("b")
    left = np.full((4, 7), a, dtype=np.int32)
    right = np.full((4, 7), b, dtype=np.int32)
    out = t.lookup(left, right)
    assert out.shape == (4, 7)
    assert (out == 256).all()


def test_closure_detects_unreachable_token():
    # "xyz" in vocab but neither "xy" nor "yz" exists → the merge loop
    # can never form it; closure verification must flag it.
    enc = {bytes([b]): b for b in range(256)}
    enc[b"xyz"] = 256
    v = Vocabulary(enc, name="adversarial")
    t = PairTable.build(v, verify_closure=True)
    assert b"xyz" in t.unreachable_tokens


@pytest.mark.skipif(not has_vocab("gpt2"), reason="gpt2 vocab unavailable")
def test_gpt2_table_properties(gpt2_pair_table):
    t = gpt2_pair_table
    assert t.n_vocab == 50256
    assert t.n_pairs > 40000  # every multi-byte token has >= 1 split
    assert 1 <= t.max_probes <= 16
    # Real BPE vocab: merge loop reaches every token (exact whole-piece
    # parity without a dictionary).
    assert t.unreachable_tokens == ()
    # Spot-check: " the" = " t"+"he"? Use actual split scan via encoder.
    import random

    from tokenizer_tpu.vocab import load_encoding_ranks

    enc = load_encoding_ranks("gpt2", allow_fetch=False)
    rng = random.Random(7)
    toks = [t_ for t_ in enc if len(t_) >= 2]
    for tok in rng.sample(toks, 200):
        tid = enc[tok]
        found = False
        for k in range(1, len(tok)):
            ia = enc.get(tok[:k])
            ib = enc.get(tok[k:])
            if ia is not None and ib is not None:
                got = t.lookup(np.array([ia]), np.array([ib]))[0]
                assert got == tid, (tok, k)
                found = True
        assert found, f"no split found for {tok!r} (not a BPE merge?)"
