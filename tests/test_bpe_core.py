"""BPE merge-loop semantics on hand-built vocabularies.

Exercises the exact tiktoken order of operations
(BytePairEncoder.cs:13-76): first-min-index tie-breaks, rank recompute
at j and j-1 only, and final segment emission — on small adversarial
rank tables where every step is hand-checkable.
"""

from tokenizer_tpu.bpe import MAX_RANK, byte_pair_encode


def _base_vocab(extra):
    """All single bytes ranked 1000+b, plus ``extra`` multi-byte tokens."""
    v = {bytes([b]): 1000 + b for b in range(256)}
    v.update(extra)
    return v


def test_single_byte():
    v = _base_vocab({})
    assert byte_pair_encode(b"a", v) == [1000 + ord("a")]


def test_no_merges_possible():
    v = _base_vocab({})
    assert byte_pair_encode(b"abc", v) == [
        1000 + ord("a"),
        1000 + ord("b"),
        1000 + ord("c"),
    ]


def test_simple_merge_chain():
    v = _base_vocab({b"ab": 0, b"abc": 1})
    # "abc": pair(ab)=0 < pair(bc)=MAX → merge → pair(abc)=1 → merge.
    assert byte_pair_encode(b"abc", v) == [1]


def test_first_min_index_tie_break():
    # "aaa": both adjacent pairs are "aa" with equal rank → merge at the
    # FIRST index, leaving [aa, a], not [a, aa].
    v = _base_vocab({b"aa": 5})
    assert byte_pair_encode(b"aaa", v) == [5, 1000 + ord("a")]


def test_lower_rank_merges_first():
    # "abcd" with bc(0) < ab(1): merge bc first; then "abc" exists via
    # a+[bc]; ab is no longer adjacent.
    v = _base_vocab({b"ab": 1, b"bc": 0, b"abc": 2})
    assert byte_pair_encode(b"abcd", v) == [2, 1000 + ord("d")]


def test_rank_recompute_after_merge():
    # "xabz": merge ab(0); then pair (x, ab) = "xab" rank 3 exists and
    # must be discovered by the j-1 recompute.
    v = _base_vocab({b"ab": 0, b"xab": 3})
    assert byte_pair_encode(b"xabz", v) == [3, 1000 + ord("z")]


def test_right_rank_recompute_after_merge():
    # "abyz": merge ab(0); then pair (ab, y) = "aby" rank 2 via the j
    # recompute; then "abyz" does not exist.
    v = _base_vocab({b"ab": 0, b"aby": 2})
    assert byte_pair_encode(b"abyz", v) == [2, 1000 + ord("z")]


def test_global_min_ordering_affects_result():
    # Ranks force merge order cd(0) then ab(1); "abc" would only form if
    # ab merged while c was still solo — ensure it does NOT.
    v = _base_vocab({b"cd": 0, b"ab": 1, b"abc": 2})
    assert byte_pair_encode(b"abcd", v) == [1, 0]


def test_emitted_ids_are_segment_ranks():
    v = _base_vocab({b"ab": 7, b"cd": 8})
    assert byte_pair_encode(b"abcd", v) == [7, 8]


def test_long_all_same_byte():
    # "aaaaaa" with aa(0), aaaa(1): merges left-to-right on ties:
    # aa,aa,aa → aaaa(merge of first two aa pairs? step through):
    # a a a a a a → [aa] a a a a (first tie) → wait, pairs recompute uses
    # only j/j-1; trust the oracle loop and assert stability instead.
    v = _base_vocab({b"aa": 0, b"aaaa": 1})
    out = byte_pair_encode(b"aaaaaa", v)
    # Step-by-step: merges at first-min repeatedly → [aaaa, aa].
    assert out == [1, 0]


def test_max_rank_never_emitted():
    v = _base_vocab({})
    out = byte_pair_encode(bytes(range(10)), v)
    assert all(r != MAX_RANK for r in out)
    assert len(out) == 10
