"""Golden-file conformance against the reference's committed token arrays.

Mirrors the reference conformance suites
(`TikTokenizerUnitTest.cs:66-87,227-305`,
`tokenizer_ts/test/tikTokenizerGpt4o.test.ts:22-38`): encode
``lib.rs.txt`` and compare element-wise with the committed golden ids,
then assert lossless decode round-trip.  Encodings whose rank files are
not available offline are skipped (cl100k/o200k/p50k require a network
fetch the CI image does not allow).
"""

import json

import pytest

from conftest import find_testdata, has_vocab

GOLDENS = [
    # (encoding, golden file, expected id count, special token for the
    #  <|endoftext|> variant test)
    ("gpt2", "tokens_gpt2.json", 11378),
    ("r50k_base", "tokens_r50k_base.json", 11378),
    ("p50k_base", "tokens_p50k_base.json", 7230),
    ("p50k_edit", "tokens_p50k_edit.json", 7230),
    ("cl100k_base", "tokens_gpt_3.5_turbo.json", 5584),
    ("o200k_base", "tokens_gpt_4o.json", 5609),
]


@pytest.mark.parametrize("encoding,golden,count", GOLDENS)
def test_lib_rs_conformance(encoding, golden, count, lib_rs_text):
    if not has_vocab(encoding):
        pytest.skip(f"{encoding} rank file not available offline")
    gpath = find_testdata(golden)
    if gpath is None:
        pytest.skip(f"golden {golden} not available")
    expected = json.loads(gpath.read_text())

    from tokenizer_tpu import create_by_encoder_name

    tok = create_by_encoder_name(encoding, allow_fetch=False)
    ids = tok.encode(lib_rs_text)
    assert len(ids) == count == len(expected)
    assert ids == expected
    # Lossless round-trip (TikTokenizerUnitTest.cs:84-86).
    assert tok.decode(ids) == lib_rs_text


@pytest.mark.parametrize("encoding,golden,count", GOLDENS)
def test_lib_rs_conformance_tpu_path(encoding, golden, count, lib_rs_text):
    """Same goldens through the packed device pipeline (CPU backend)."""
    if not has_vocab(encoding):
        pytest.skip(f"{encoding} rank file not available offline")
    gpath = find_testdata(golden)
    if gpath is None:
        pytest.skip(f"golden {golden} not available")
    pytest.importorskip("jax")
    expected = json.loads(gpath.read_text())

    from tokenizer_tpu import create_by_encoder_name

    tok = create_by_encoder_name(encoding, allow_fetch=False, use_tpu=True)
    (ids,) = tok.encode_batch([lib_rs_text])
    assert list(ids) == expected
    assert tok.decode(ids) == lib_rs_text
