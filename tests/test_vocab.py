"""Rank-file parsing and asset resolution (LoadTikTokenBpe parity)."""

import base64

import pytest

from tokenizer_tpu.vocab import (
    Vocabulary,
    parse_tiktoken_data,
    resolve_vocab_file,
)


def _line(tok: bytes, rank: int) -> bytes:
    return base64.b64encode(tok) + b" " + str(rank).encode()


def test_parse_basic():
    data = b"\n".join([_line(b"a", 0), _line(b"b", 1), b"", _line(b"ab", 2)])
    ranks = parse_tiktoken_data(data)
    assert ranks == {b"a": 0, b"b": 1, b"ab": 2}


def test_parse_rejects_bad_field_count():
    # TikTokenizer.cs:115-124 / tikTokenizer.ts:31-33.
    with pytest.raises(ValueError, match="Invalid format"):
        parse_tiktoken_data(b"YQ== 0 extra")


def test_parse_rejects_bad_rank():
    # TikTokenizer.cs:126-135 / tikTokenizer.ts:36-40.
    with pytest.raises(ValueError, match="Can't parse"):
        parse_tiktoken_data(b"YQ== notanint")


def test_vocab_size_mismatch_raises():
    # Duplicate rank value → encoder/decoder size mismatch
    # (TikTokenizer.cs:84-87, tikTokenizer.ts:113-115).
    with pytest.raises(ValueError, match="sizes don't match"):
        Vocabulary({b"a": 0, b"b": 0})


def test_unknown_encoder_raises():
    with pytest.raises(ValueError, match=r"Doesn't support this encoder"):
        resolve_vocab_file("bogus_base")


def test_gpt2_vocab_properties():
    pytest.importorskip("numpy")
    try:
        path = resolve_vocab_file("gpt2", allow_fetch=False)
    except FileNotFoundError:
        pytest.skip("gpt2 rank file not available offline")
    vocab = Vocabulary.for_encoding("gpt2", allow_fetch=False)
    # model/gpt2.tiktoken has 50,256 mergeable entries (SURVEY.md §1 L1).
    assert len(vocab) == 50256
    assert vocab.n_vocab == 50256
    # All 256 single-byte tokens exist.
    b2i = vocab.byte_to_id
    assert b2i.shape == (256,)
    assert (b2i >= 0).all()
    # Round-trip through decoder.
    assert vocab.decoder[vocab.encoder[b"hello"]] == b"hello"


def test_p50k_derivation_offline():
    """p50k_base materializes offline from the vendored gpt2 asset.

    The derivation (gpt2 ranks + space runs of length 2..25 at ranks
    50257..50280) is proven against the reference golden
    tokens_p50k_base.json by test_conformance.py; this pins the table
    shape so a regression is caught even without the golden corpus.
    """
    from tokenizer_tpu.vocab import load_encoding_ranks

    ranks = load_encoding_ranks("p50k_base", allow_fetch=False)
    assert len(ranks) == 50256 + 24
    assert max(ranks.values()) == 50280
    for i, n in enumerate(range(2, 26)):
        assert ranks[b" " * n] == 50257 + i
    # The base table is untouched gpt2.
    gpt2 = load_encoding_ranks("gpt2", allow_fetch=False)
    assert all(ranks[t] == r for t, r in gpt2.items())


def test_vendored_gz_resolves_without_reference_mount(tmp_path, monkeypatch):
    """The in-repo vocab/gpt2.tiktoken.gz is found and parses."""
    from tokenizer_tpu import vocab as V

    monkeypatch.setenv("TOKENIZER_TPU_CACHE_DIR", str(tmp_path))
    p = V.resolve_vocab_file("gpt2", allow_fetch=False)
    assert p.name == "gpt2.tiktoken.gz"
    assert "reference" not in str(p)
    ranks = V.load_tiktoken_file(p)
    assert len(ranks) == 50256 and ranks[b" "] == 220
