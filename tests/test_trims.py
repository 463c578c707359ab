"""Token-budget trim semantics (TS semantics, per SURVEY.md §3.3/3.4).

The structural invariants below follow from the TS implementation:
``encode_trim_suffix(text, k).token_ids == encode(text)[:k]`` (pieces are
appended whole and the overflowing piece is sliced —
tikTokenizer.ts:246-249,275-281), and trim-prefix drops whole-piece
boundaries with a naive exact fallback (tikTokenizer.ts:439-462).
The cl100k cases from tikTokenizer.test.ts:100-230 run when the vocab
is present.
"""

import pytest

from conftest import has_vocab


def test_trim_suffix_no_trim_needed(gpt2_tokenizer):
    r = gpt2_tokenizer.encode_trim_suffix("Hello World", 10)
    assert r.token_ids == [15496, 2159]
    assert r.text == "Hello World"


def test_trim_suffix_exact_budget(gpt2_tokenizer):
    r = gpt2_tokenizer.encode_trim_suffix("Hello World", 2)
    assert r.token_ids == [15496, 2159]
    assert r.text == "Hello World"


def test_trim_suffix_cuts_whole_piece(gpt2_tokenizer):
    r = gpt2_tokenizer.encode_trim_suffix("Hello World", 1)
    assert r.token_ids == [15496]
    assert r.text == "Hello"


def test_trim_suffix_prefix_invariant(gpt2_tokenizer):
    text = "The quick brown fox jumps over the lazy dog; ⭐ 42 times!"
    full = gpt2_tokenizer.encode(text)
    for k in range(1, len(full) + 2):
        r = gpt2_tokenizer.encode_trim_suffix(text, k)
        assert r.token_ids == full[: min(k, len(full))]
        # Decoded trimmed text must be a prefix of the original text.
        assert text.startswith(r.text)


def test_trim_suffix_mid_piece_slicing(gpt2_tokenizer):
    # A 4000-char piece (one giant word) must slice mid-piece
    # (tikTokenizer.test.ts:132-138 semantics).
    text = "x" * 4000
    full = gpt2_tokenizer.encode(text)
    assert len(full) > 5
    r = gpt2_tokenizer.encode_trim_suffix(text, 5)
    assert r.token_ids == full[:5]
    # encodeLength counts the WHOLE overflowing piece (ts:248).
    assert r.text == text


def test_trim_suffix_with_specials(gpt2_tokenizer):
    text = "Hello<|endoftext|>World"
    allowed = ["<|endoftext|>"]
    full = gpt2_tokenizer.encode(text, allowed)
    for k in range(1, len(full) + 1):
        r = gpt2_tokenizer.encode_trim_suffix(text, k, allowed)
        assert r.token_ids == full[:k]


def test_trim_suffix_special_does_not_fit(gpt2_tokenizer):
    # "Hello" = 1 token; budget 1 → the special must NOT be appended.
    r = gpt2_tokenizer.encode_trim_suffix(
        "Hello<|endoftext|>", 1, ["<|endoftext|>"]
    )
    assert r.token_ids == [15496]
    assert r.text == "Hello"


def test_trim_prefix_no_trim_needed(gpt2_tokenizer):
    r = gpt2_tokenizer.encode_trim_prefix("Hello World", 5)
    assert r.token_ids == [15496, 2159]
    assert r.text == "Hello World"


def test_trim_prefix_drops_leading_tokens(gpt2_tokenizer):
    text = "a b c d e"
    full = gpt2_tokenizer.encode(text)
    assert len(full) == 5
    r = gpt2_tokenizer.encode_trim_prefix(text, 2)
    assert r.token_ids == full[3:]
    assert r.text == " d e"


def test_trim_prefix_suffix_of_full_encode(gpt2_tokenizer):
    text = "The quick brown fox jumps over the lazy dog 1234567890 times."
    full = gpt2_tokenizer.encode(text)
    for k in range(1, len(full) + 2):
        r = gpt2_tokenizer.encode_trim_prefix(text, k)
        kk = min(k, len(full))
        # Piece-boundary semantics: result length ≤ k, and the ids are a
        # suffix of the full encode (or the exact k-suffix via fallback).
        assert len(r.token_ids) <= kk
        assert r.token_ids == full[len(full) - len(r.token_ids) :]
        assert text.endswith(r.text) or r.text == gpt2_tokenizer.decode(
            r.token_ids
        )


def test_trim_prefix_mid_piece_fallback(gpt2_tokenizer):
    # One giant piece: boundary overshoots → naive fallback slices the
    # exact last k ids and re-decodes (tikTokenizer.ts:454-462).
    text = "y" * 4000
    full = gpt2_tokenizer.encode(text)
    assert len(full) > 5
    r = gpt2_tokenizer.encode_trim_prefix(text, 5)
    assert r.token_ids == full[-5:]
    assert r.text == gpt2_tokenizer.decode(full[-5:])


def test_trim_prefix_with_specials(gpt2_tokenizer):
    text = "<|endoftext|>Hello World"
    allowed = ["<|endoftext|>"]
    full = gpt2_tokenizer.encode(text, allowed)
    assert full[0] == 50256
    r = gpt2_tokenizer.encode_trim_prefix(text, 2, allowed)
    assert r.token_ids == full[1:]
    assert r.text == "Hello World"


def test_trim_zero_budget(gpt2_tokenizer):
    rs = gpt2_tokenizer.encode_trim_suffix("Hello World", 0)
    assert rs.token_ids == []
    # Reference quirk: the overflowing piece still contributes its length
    # to encodeLength even when zero of its tokens fit
    # (tikTokenizer.ts:275-281), so budget 0 returns the first piece's text.
    assert rs.text == "Hello"
    rp = gpt2_tokenizer.encode_trim_prefix("Hello World", 0)
    assert rp.token_ids == []


@pytest.mark.skipif(
    not has_vocab("cl100k_base"), reason="cl100k rank file not available offline"
)
class TestCl100kTrims:
    """Exact ported expectations from tikTokenizer.test.ts:100-230 and
    TikTokenizerUnitTest.cs:128-225."""

    @pytest.fixture(autouse=True)
    def _tok(self):
        from tokenizer_tpu import create_by_encoder_name

        self.tok = create_by_encoder_name(
            "cl100k_base",
            extra_special_tokens={"<|im_start|>": 100264, "<|im_end|>": 100265},
            allow_fetch=False,
        )
        self.allowed = ["<|im_start|>", "<|im_end|>"]

    def test_trim_suffix_basic(self):
        # TikTokenizerUnitTest.cs:128-139 (budget 5 keeps everything
        # through "Hello": [100264, 9906]+...): "<|im_start|>Hello World<|im_end|>"
        r = self.tok.encode_trim_suffix(
            "<|im_start|>Hello World<|im_end|>", 3, self.allowed
        )
        assert r.token_ids == [100264, 9906, 4435]
        assert r.text == "<|im_start|>Hello World"

    def test_trim_suffix_budget_4(self):
        r = self.tok.encode_trim_suffix(
            "<|im_start|>Hello World<|im_end|>", 4, self.allowed
        )
        assert r.token_ids == [100264, 9906, 4435, 100265]
        assert r.text == "<|im_start|>Hello World<|im_end|>"

    def test_trim_prefix_basic(self):
        r = self.tok.encode_trim_prefix(
            "<|im_start|>Hello World<|im_end|>", 3, self.allowed
        )
        assert r.token_ids == [9906, 4435, 100265]
        assert r.text == "Hello World<|im_end|>"


# -- C# trim-suffix mode: whole-piece drop (TikTokenizer.cs:289-342) -----
# Ported shapes of TestEncodeTrimSuffix/TestEncodeTrimSuffix2
# (TikTokenizerUnitTest.cs:128-176), run on gpt2 with the same custom
# specials; the exact-cl100k variants run when that vocab is vendored.

CS_SPECIALS = {"<|im_start|>": 100264, "<|im_end|>": 100265}


@pytest.fixture(scope="module")
def gpt2_cs_tokenizer():
    from conftest import require_vocab

    require_vocab("gpt2")
    from tokenizer_tpu import create_by_encoder_name

    return create_by_encoder_name(
        "gpt2", extra_special_tokens=CS_SPECIALS, allow_fetch=False
    )


def test_cs_trim_suffix_whole_piece_drop(gpt2_cs_tokenizer):
    """Budget 3 on specials + 'Hello' + 2-token ' TempWorld': the
    overflowing piece is dropped whole (TestEncodeTrimSuffix2 shape)."""
    tok = gpt2_cs_tokenizer
    text = "<|im_start|>Hello TempWorld<|im_end|>"
    r = tok.encode_trim_suffix(text, 3, allowed_special="all", mode="cs")
    assert r.token_ids == [100264, 15496]  # im_start, Hello
    assert r.text == "<|im_start|>Hello"
    assert tok.decode(r.token_ids) == r.text
    # TS mode slices mid-piece instead.
    r_ts = tok.encode_trim_suffix(text, 3, allowed_special="all", mode="ts")
    assert r_ts.token_ids == [100264, 15496, 24189]
    assert r_ts.text == "<|im_start|>Hello TempWorld"


def test_cs_trim_suffix_exact_and_over_budget(gpt2_cs_tokenizer):
    tok = gpt2_cs_tokenizer
    text = "<|im_start|>Hello TempWorld<|im_end|>"
    # Budget 5 fits everything exactly (TestEncodeTrimSuffix2 budget 5).
    r = tok.encode_trim_suffix(text, 5, allowed_special="all", mode="cs")
    assert r.token_ids == [100264, 15496, 24189, 10603, 100265]
    assert r.text == text
    # Budget 6 > total: unchanged (budget 6 case).
    r = tok.encode_trim_suffix(text, 6, allowed_special="all", mode="cs")
    assert len(r.token_ids) == 5 and r.text == text


def test_cs_trim_suffix_piece_boundary_invariant(gpt2_cs_tokenizer):
    """cs-mode ids always end at a regex-piece boundary and the text
    round-trips through decode."""
    tok = gpt2_cs_tokenizer
    text = "The quick brown fox jumps over the lazy dog; ⭐ 42 times!"
    full = tok.encode(text)
    for k in range(1, len(full) + 2):
        r = tok.encode_trim_suffix(text, k, mode="cs")
        # prefix of the full encode...
        assert r.token_ids == full[: len(r.token_ids)]
        assert len(r.token_ids) <= k
        # ...and decodes exactly to the surviving text.
        assert tok.decode(r.token_ids) == r.text
        assert text.startswith(r.text)


def test_cs_trim_suffix_special_budget_edge(gpt2_cs_tokenizer):
    """Special token that exactly fills / overflows the budget
    (TestEncodeTrimSuffix budgets 3/4/5 shape)."""
    tok = gpt2_cs_tokenizer
    text = "<|im_start|>Hello World<|im_end|>"
    r = tok.encode_trim_suffix(text, 4, allowed_special="all", mode="cs")
    assert r.token_ids == [100264, 15496, 2159, 100265]
    assert r.text == text
    r = tok.encode_trim_suffix(text, 5, allowed_special="all", mode="cs")
    assert len(r.token_ids) == 4 and r.text == text
    r = tok.encode_trim_suffix(text, 3, allowed_special="all", mode="cs")
    assert r.token_ids == [100264, 15496, 2159]
    assert r.text == "<|im_start|>Hello World"


@pytest.mark.skipif(
    not has_vocab("cl100k_base"), reason="cl100k rank file not vendored"
)
class TestCsTrimsCl100k:
    """Exact ports of TikTokenizerUnitTest.cs:128-176 (cl100k_base)."""

    @pytest.fixture(autouse=True)
    def _tok(self):
        from tokenizer_tpu import create_by_encoder_name

        self.tok = create_by_encoder_name(
            "cl100k_base", extra_special_tokens=CS_SPECIALS, allow_fetch=False
        )

    def test_encode_trim_suffix(self):
        text = "<|im_start|>Hello World<|im_end|>"
        r = self.tok.encode_trim_suffix(text, 4, allowed_special="all", mode="cs")
        assert len(r.token_ids) == 4 and r.text == text
        r = self.tok.encode_trim_suffix(text, 4, mode="cs")
        assert len(r.token_ids) == 4 and r.text == "<|im_start"
        r = self.tok.encode_trim_suffix(text, 5, allowed_special="all", mode="cs")
        assert len(r.token_ids) == 4 and r.text == text
        r = self.tok.encode_trim_suffix(text, 3, allowed_special="all", mode="cs")
        assert len(r.token_ids) == 3 and r.text == "<|im_start|>Hello World"
        assert self.tok.decode(r.token_ids) == "<|im_start|>Hello World"

    def test_encode_trim_suffix_2(self):
        text = "<|im_start|>Hello TempWorld<|im_end|>"
        r = self.tok.encode_trim_suffix(text, 5, allowed_special="all", mode="cs")
        assert len(r.token_ids) == 5 and r.text == text
        r = self.tok.encode_trim_suffix(text, 6, allowed_special="all", mode="cs")
        assert len(r.token_ids) == 5 and r.text == text
        r = self.tok.encode_trim_suffix(text, 3, allowed_special="all", mode="cs")
        assert len(r.token_ids) == 2 and r.text == "<|im_start|>Hello"
        assert self.tok.decode(r.token_ids) == "<|im_start|>Hello"


def test_trim_fuzz_invariants(gpt2_tokenizer):
    """Randomized texts x budgets: structural invariants of all trim
    modes against the full encode (tikTokenizer.ts:225-291,370-468;
    TikTokenizer.cs:289-342,437-583)."""
    import random

    rng = random.Random(1234)
    atoms = [
        "hello", " world", "⭐", " étoile", "123", "9" * 40, "\n",
        "  ", "<|endoftext|>", "tokenizer", " the quick", "好好好好",
        "'re", "'LL", "x" * 30, "\t",
    ]
    tok = gpt2_tokenizer
    for _ in range(40):
        text = "".join(rng.choice(atoms) for _ in range(rng.randint(0, 12)))
        allowed = rng.choice([None, ["<|endoftext|>"], "all"])
        full = tok.encode(text, allowed)
        for k in (0, 1, 2, 3, 5, 8, len(full), len(full) + 3):
            ts = tok.encode_trim_suffix(text, k, allowed, mode="ts")
            # TS: exact prefix slice of the full encode.
            assert ts.token_ids == full[: min(k, len(full))], (text, k)
            cs = tok.encode_trim_suffix(text, k, allowed, mode="cs")
            # C#: prefix of full, at most k, ends on a piece boundary
            # (=> decodes exactly to the surviving text).
            assert cs.token_ids == full[: len(cs.token_ids)]
            assert len(cs.token_ids) <= k
            assert tok.decode(cs.token_ids) == cs.text or (
                # specials decode back to their literal text too
                cs.text == tok.decode(cs.token_ids)
            )
            tp = tok.encode_trim_prefix(text, k, allowed)
            # prefix-trim: a suffix of the full encode, at most k ids.
            assert len(tp.token_ids) <= max(k, 0)
            if tp.token_ids:
                assert tp.token_ids == full[-len(tp.token_ids):], (text, k)
