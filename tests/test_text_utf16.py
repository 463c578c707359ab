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
