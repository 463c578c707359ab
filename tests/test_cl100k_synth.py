"""Conformance of the REAL-SCALE synthetic encodings.

The real cl100k_base/o200k_base rank files are unreachable offline
(zero egress), so the north-star shapes — REGEX_PATTERN_2 + the real
cl100k special table + a 100,256-rank pair table, and REGEX_PATTERN_3 +
the real o200k special table + a 199,998-rank table — are exercised
with the vendored offline-trained vocabularies
(tools/train_synth_vocab.py, vocab/{cl100k,o200k}_synth.tiktoken.gz)
and cross-validated against Rust tiktoken built from the SAME ranks:
tiktoken's byte_pair_merge is the algorithm the reference
transliterated (TikTokenizer.cs:14-18), so agreement here is
end-to-end validation of the pattern-2/3 scanners, the special
scanning, and the merge loop at real vocabulary scale, on the host
engine AND the device batch path.
"""

from __future__ import annotations

import numpy as np
import pytest

tiktoken = pytest.importorskip("tiktoken")

from conftest import require_vocab

_SHAPES = {
    "cl100k_synth": ("cl100k_base", 100_256, 100_257),
    "o200k_synth": ("o200k_base", 199_998, 199_999),
}


@pytest.fixture(scope="module", params=["cl100k_synth", "o200k_synth"])
def synth(request):
    name = request.param
    require_vocab(name)
    from tokenizer_tpu import create_by_encoder_name
    from tokenizer_tpu.models.registry import (
        get_encoding_spec,
        get_special_tokens_by_encoder,
    )
    from tokenizer_tpu.vocab import load_encoding_ranks

    real_name, _, _ = _SHAPES[name]
    spec = get_encoding_spec(name)
    ranks = load_encoding_ranks(name, allow_fetch=False)
    specials = get_special_tokens_by_encoder(real_name)
    rust = tiktoken.Encoding(
        name=name,
        pat_str=spec.pattern,
        mergeable_ranks=ranks,
        special_tokens=dict(specials),
    )
    host = create_by_encoder_name(name, allow_fetch=False, use_tpu=False)
    tpu = create_by_encoder_name(name, allow_fetch=False, use_tpu=True)
    return name, host, tpu, rust


def test_vocab_shape(synth):
    name, host, _tpu, _rust = synth
    _real, n_ranks, eot = _SHAPES[name]
    # Real-encoding mergeable-rank counts; dense ids 0..n-1.
    assert len(host.encoder) == n_ranks
    assert sorted(host.decoder) == list(range(n_ranks))
    # The real special table rides on top (registry values).
    assert host.special_tokens_encoder["<|endoftext|>"] == eot


CORPUS = [
    "",
    "!",
    "Hello World",
    "MixedCASE WordS aNd ACRONYMS NASA iPhone",
    "don't CAN'T it'S I'Ll we'Ve they'D THEY'RE y'eR",
    "numbers 1 22 333 4444 55555 1234 12345678",
    "  leading spaces   and   runs  ",
    "line\nbreaks\r\nand\rreturns \n \n mixed \n\n\n",
    "space before\n newline and spaces \n",
    "punct!@# $%^ &*()[]{} //path/to/file// a//b",
    "unicode ⭐ étoile Straße ñandú",
    "CJK 你好世界 こんにちは 안녕하세요",
    "emoji 💩 👍🏽 flags 🇺🇸",
    "a" * 300,
    " 123456 digits run " + "9" * 40,
    "\t\t tabs \t ",
]


def test_host_matches_rust_tiktoken_micro(synth):
    _name, host, tpu, rust = synth
    for text in CORPUS:
        expect = rust.encode(text, disallowed_special=())
        assert host.encode(text) == expect, repr(text)
        # Single-string device-tokenizer path (native scanner + host
        # piece resolution) agrees too.
        assert tpu.encode(text) == expect, repr(text)
        assert host.decode(expect) == text or "�" in host.decode(expect)


def test_host_matches_rust_tiktoken_corpus(synth):
    """1 MB of out-of-sample diverse documents, id-for-id."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import gen_corpus

    _name, host, _tpu, rust = synth
    docs = gen_corpus(1.0, seed=20260820)
    for d in docs:
        assert host.encode(d) == rust.encode(d, disallowed_special=()), (
            repr(d[:80])
        )


def test_device_batch_matches_rust(synth):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import gen_corpus

    _name, _host, tpu, rust = synth
    docs = gen_corpus(0.5, seed=31337) + CORPUS
    out = tpu.encode_batch(docs)
    for d, ids in zip(docs, out):
        assert list(ids) == rust.encode(d, disallowed_special=()), repr(
            d[:80]
        )
    # And the streaming path agrees with the batch path.
    chunks = [docs[i : i + 40] for i in range(0, len(docs), 40)]
    flat = [ids for batch in tpu.encode_batch_stream(chunks) for ids in batch]
    assert len(flat) == len(out)
    for a, b in zip(flat, out):
        assert np.array_equal(a, b)


def test_specials_match_rust(synth):
    name, host, tpu, rust = synth
    texts = [
        "a<|endoftext|>b",
        "plain <|endofprompt|>",
        "<|endoftext|><|endoftext|>",
    ]
    if name == "cl100k_synth":  # FIM specials exist only on cl100k
        texts.append("<|fim_prefix|>head<|fim_suffix|>tail<|fim_middle|>mid")
    for t in texts:
        expect = rust.encode(t, allowed_special="all")
        assert host.encode(t, allowed_special="all") == expect, repr(t)
        got = tpu.encode_batch([t], allowed_special="all")[0]
        assert list(got) == expect, repr(t)
    # Disallowed specials encode as plain text (reference skip-from+1
    # semantics, TikTokenizer.cs:230-241).
    t = "x<|endoftext|>y"
    assert host.encode(t) == rust.encode(t, disallowed_special=())


def test_trims_on_synth_vocab(synth):
    _name, host, _tpu, _rust = synth
    text = "The quick brown fox jumps over the lazy dog 你好 1234!"
    full = host.encode(text)
    for budget in (1, 3, 5, 8, len(full), len(full) + 5):
        # TS trim-suffix semantics: the ids are the first <=budget
        # tokens of the full encoding (mid-piece slice allowed,
        # tikTokenizer.ts:246-249), and the reported text is a prefix.
        ids, trimmed = host.encode_trim_suffix(text, budget)
        assert len(ids) <= budget
        assert ids == full[: len(ids)]
        assert text.startswith(trimmed)
        ids_p, trimmed_p = host.encode_trim_prefix(text, budget)
        assert len(ids_p) <= budget
        assert ids_p == full[len(full) - len(ids_p) :]
        # The TS exact-slice fallback decodes the kept ids; a cut
        # inside a multi-byte char yields U+FFFD (tikTokenizer.ts:454-462).
        assert text.endswith(trimmed_p) or "�" in trimmed_p


def test_conformance_corpus_golden(synth, lib_rs_text):
    """Pin the whole-corpus encoding so silent vocab-file or merge-path
    regressions show up as a diff (the synthetic analogue of the
    reference's committed id arrays, TikTokenizerUnitTest.cs:66-87)."""
    _name, host, tpu, rust = synth
    ids = host.encode(lib_rs_text)
    expect = rust.encode(lib_rs_text, disallowed_special=())
    assert ids == expect
    assert host.decode(ids) == lib_rs_text
    batch = tpu.encode_batch([lib_rs_text])[0]
    assert list(batch) == expect
