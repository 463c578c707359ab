"""UTF-16 bookkeeping helpers (SURVEY.md §7 'UTF-16 code-unit bookkeeping')."""

from tokenizer_tpu.utils.text import (
    utf16_len,
    utf16_prefix_to_codepoints,
    utf16_slice,
)


def test_bmp_lengths():
    assert utf16_len("") == 0
    assert utf16_len("hello") == 5
    assert utf16_len("⭐") == 1  # U+2B50 is BMP: one UTF-16 unit


def test_astral_lengths():
    assert utf16_len("💩") == 2  # U+1F4A9 → surrogate pair
    assert utf16_len("a💩b") == 4
    assert utf16_len("👨‍👩‍👧") == 8  # family ZWJ sequence: 3 astral + 2 ZWJ


def test_slice_matches_js_semantics():
    s = "a💩b"
    assert utf16_slice(s, 0, 1) == "a"
    assert utf16_slice(s, 0, 3) == "a💩"
    assert utf16_slice(s, 3, 4) == "b"
    assert utf16_slice(s, 1, 3) == "💩"
    # Mid-surrogate offsets round down to code-point boundaries.
    assert utf16_slice(s, 0, 2) == "a"


def test_prefix_to_codepoints():
    s = "x💩y"
    assert utf16_prefix_to_codepoints(s, 0) == 0
    assert utf16_prefix_to_codepoints(s, 1) == 1
    assert utf16_prefix_to_codepoints(s, 3) == 2
    assert utf16_prefix_to_codepoints(s, 4) == 3
    assert utf16_prefix_to_codepoints(s, 99) == 3


def test_utf8_bytes_lone_surrogates():
    """JS TextEncoder (textEncoder.ts:24) and C# Encoding.UTF8.GetBytes
    (TikTokenizer.cs:261) replace an UNPAIRED surrogate with U+FFFD;
    Python's str.encode raises.  utf8_bytes must match the references."""
    from tokenizer_tpu.utils.text import utf8_bytes

    assert utf8_bytes("abc") == b"abc"
    assert utf8_bytes("\ud800") == "�".encode()
    assert utf8_bytes("a\udfffb") == b"a" + "�".encode() + b"b"
    # A VALID pair must stay a pair, not two replacements.
    assert utf8_bytes("\U0001d11e") == "𝄞".encode()
    assert utf8_bytes("x\ud800\U0001f4a9y") == (
        b"x" + "�".encode() + "💩".encode() + b"y"
    )


def test_encode_lone_surrogates_end_to_end():
    """Lone surrogates tokenize as U+FFFD (not an exception) through
    the host engine, the device bulk paths, and the trims — and the
    trimmed TEXT preserves the ORIGINAL surrogate, exactly like the
    references' substring-of-input behavior."""
    import pytest

    pytest.importorskip("numpy")
    from conftest import require_vocab

    require_vocab("gpt2")
    from tokenizer_tpu import create_by_encoder_name

    host = create_by_encoder_name("gpt2", allow_fetch=False)
    tpu = create_by_encoder_name("gpt2", allow_fetch=False, use_tpu=True)
    docs = [
        "\ud800",
        "a\udfffb",
        "x \ud800\ud800 y",
        "trim\ud800tail more words",
        "word \udc00 soup " * 200,  # crosses the batch-delegate threshold
    ]
    for t in docs:
        clean = t.encode("utf-16-le", "surrogatepass").decode(
            "utf-16-le", "replace"
        )
        assert host.encode(t) == host.encode(clean)
        assert tpu.encode(t) == host.encode(t)
    got = tpu.encode_batch(docs)
    for g, t in zip(got, docs):
        assert list(g) == host.encode(t)
    rs = tpu.encode_trim_suffix_batch(docs, 2)
    rp = tpu.encode_trim_prefix_batch(docs, 2)
    for t, s_, p_ in zip(docs, rs, rp):
        assert (s_.token_ids, s_.text) == tuple(host.encode_trim_suffix(t, 2))
        assert (p_.token_ids, p_.text) == tuple(host.encode_trim_prefix(t, 2))
    r = host.encode_trim_suffix("abc\ud800def", 2)
    assert r.text == "abc\ud800"  # original surrogate survives in TEXT
