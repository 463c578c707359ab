"""Micro engine tests: exact ids, specials, unicode, empty input.

Ports the reference's micro assertions (TikTokenizerUnitTest.cs:39-126,
tikTokenizer.test.ts:16-60) to the offline-available gpt2 vocab, plus
the cl100k originals guarded by vocab availability.
"""

import pytest

from conftest import has_vocab


def test_empty_string(gpt2_tokenizer):
    # TikTokenizerUnitTest.cs:103-109.
    assert gpt2_tokenizer.encode("") == []
    assert gpt2_tokenizer.decode([]) == ""


def test_hello_world_gpt2(gpt2_tokenizer):
    ids = gpt2_tokenizer.encode("Hello World")
    assert ids == [15496, 2159]
    assert gpt2_tokenizer.decode(ids) == "Hello World"


def test_bang_is_zero_gpt2(gpt2_tokenizer):
    # "!" → [0] holds for gpt2 like cl100k (tikTokenizer.test.ts:22-27).
    assert gpt2_tokenizer.encode("!") == [0]


def test_unicode_star(gpt2_tokenizer):
    # TikTokenizerUnitTest.cs:112-126 uses ⭐ (U+2B50, 3 UTF-8 bytes).
    ids = gpt2_tokenizer.encode("⭐")
    assert gpt2_tokenizer.decode(ids) == "⭐"
    assert len(ids) >= 1


def test_special_token_disallowed_is_plain_text(gpt2_tokenizer):
    text = "Hello<|endoftext|>World"
    ids_plain = gpt2_tokenizer.encode(text)
    assert 50256 not in ids_plain
    assert gpt2_tokenizer.decode(ids_plain) == text


def test_special_token_allowed(gpt2_tokenizer):
    text = "Hello<|endoftext|>World"
    ids = gpt2_tokenizer.encode(text, allowed_special=["<|endoftext|>"])
    assert 50256 in ids
    assert gpt2_tokenizer.decode(ids) == text
    i = ids.index(50256)
    assert gpt2_tokenizer.decode(ids[:i]) == "Hello"
    assert gpt2_tokenizer.decode(ids[i + 1 :]) == "World"


def test_special_token_all_sentinel(gpt2_tokenizer):
    # C# applySpecialTokens=true overload (TikTokenizer.cs:193-199).
    ids = gpt2_tokenizer.encode("<|endoftext|>", allowed_special="all")
    assert ids == [50256]


def test_special_at_start_and_end(gpt2_tokenizer):
    ids = gpt2_tokenizer.encode(
        "<|endoftext|>mid<|endoftext|>", allowed_special="all"
    )
    assert ids[0] == 50256 and ids[-1] == 50256
    assert gpt2_tokenizer.decode(ids) == "<|endoftext|>mid<|endoftext|>"


def test_adjacent_specials(gpt2_tokenizer):
    ids = gpt2_tokenizer.encode(
        "<|endoftext|><|endoftext|>", allowed_special="all"
    )
    assert ids == [50256, 50256]


def test_extra_special_tokens_via_builder():
    # Custom <|im_start|>/<|im_end|> specials pattern
    # (TikTokenizerUnitTest.cs:24-27,52-64 uses 100264/100265 on cl100k).
    if not has_vocab("gpt2"):
        pytest.skip("gpt2 rank file not available offline")
    from tokenizer_tpu import create_by_encoder_name

    tok = create_by_encoder_name(
        "gpt2",
        extra_special_tokens={"<|im_start|>": 50257, "<|im_end|>": 50258},
        allow_fetch=False,
    )
    ids = tok.encode(
        "<|im_start|>Hello World<|im_end|>",
        allowed_special=["<|im_start|>", "<|im_end|>"],
    )
    assert ids == [50257, 15496, 2159, 50258]
    assert tok.decode(ids) == "<|im_start|>Hello World<|im_end|>"


def test_cache_populates_and_hits(gpt2_tokenizer):
    gpt2_tokenizer.cache.clear()
    gpt2_tokenizer.encode("caching caching caching")
    assert gpt2_tokenizer.num_cache_entries >= 2  # "caching", " caching"
    # Second encode must return identical ids through the cache path.
    a = gpt2_tokenizer.encode("caching caching caching")
    b = gpt2_tokenizer.encode("caching caching caching")
    assert a == b


def test_decode_skips_unknown_ids(gpt2_tokenizer):
    # TikTokenizer.cs:591-599: unknown ids silently dropped.
    assert gpt2_tokenizer.decode([15496, 999999, 2159]) == "Hello World"


def test_decode_invalid_utf8_replacement(gpt2_tokenizer):
    # A lone continuation byte decodes to U+FFFD (TextDecoder non-fatal).
    bad = gpt2_tokenizer.vocab.encoder[bytes([0xFF])]
    assert gpt2_tokenizer.decode([bad]) == "�"


@pytest.mark.skipif(
    not has_vocab("cl100k_base"), reason="cl100k rank file not available offline"
)
class TestCl100kMicro:
    """The original cl100k micro tests (run when the vocab is present)."""

    @pytest.fixture(autouse=True)
    def _tok(self):
        from tokenizer_tpu import create_by_encoder_name

        self.tok = create_by_encoder_name("cl100k_base", allow_fetch=False)

    def test_hello_world(self):
        # TikTokenizerUnitTest.cs:39-49.
        assert self.tok.encode("Hello World") == [9906, 4435]

    def test_bang(self):
        # tikTokenizer.test.ts:22-27.
        assert self.tok.encode("!") == [0]

    def test_im_chat_format(self):
        # TikTokenizerUnitTest.cs:52-64 with custom specials.
        from tokenizer_tpu import create_by_encoder_name

        tok = create_by_encoder_name(
            "cl100k_base",
            extra_special_tokens={"<|im_start|>": 100264, "<|im_end|>": 100265},
            allow_fetch=False,
        )
        ids = tok.encode(
            "<|im_start|>Hello World<|im_end|>",
            allowed_special=["<|im_start|>", "<|im_end|>"],
        )
        assert ids == [100264, 9906, 4435, 100265]
