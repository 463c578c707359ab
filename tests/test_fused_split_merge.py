"""Fused scan+intern+merge path (tt_ctx_split_merge_batch).

The cold-path fusion (ROADMAP item 4): first-seen pieces merge ON the
native scanning threads and land directly in the row matrix, instead of
a separate register -> wave -> batched merge -> numpy scatter pass.
Correctness contract: bit-parity with the host oracle, with graceful
deferral to the ordinary wave path whenever a piece cannot be fused
(row/uid capacity, oversized merges).
"""

from __future__ import annotations

import numpy as np
import pytest

from tokenizer_tpu import create_by_encoder_name
from tokenizer_tpu.runtime import native


def _host_routed_tok(monkeypatch):
    monkeypatch.setenv("TOKENIZER_TPU_NO_DEVICE", "1")
    return create_by_encoder_name("gpt2", allow_fetch=False, use_tpu=True)


DOCS = [
    "hello world " * 8,
    "def f(x):\n    return x + 1  # comment ⭐",
    "好" * 100,  # single 300-byte piece -> 200 ids > row width: deferred
    "the quick brown fox 12345 jumps over 67890",
    "",
    "<|endoftext|>tail",
    "  mixed   whitespace\t\truns\n\n\nand 'contractions aren't rare",
    "𝄞 astral π≈3.14159 🎉🎉",
]


@pytest.fixture(scope="module")
def host():
    return create_by_encoder_name("gpt2", allow_fetch=False)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_fused_batch_parity(monkeypatch, host):
    tok = _host_routed_tok(monkeypatch)
    got = tok.encode_batch(DOCS, allowed_special="all")
    for t, g in zip(DOCS, got):
        assert list(g) == host.encode(t, allowed_special="all"), t[:40]
    # The host-routed fused path resolved everything (no device).
    assert tok.stats.unique_pieces > 0
    assert tok.stats.host_wave_pieces == tok.stats.unique_pieces
    # Second pass is warm: no new uniques, identical output.
    before = tok.stats.unique_pieces
    got2 = tok.encode_batch(DOCS, allowed_special="all")
    assert tok.stats.unique_pieces == before
    for a, b in zip(got, got2):
        assert np.array_equal(a, b)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_fused_capacity_deferral(monkeypatch, host):
    """Starve the pre-reserve so most pieces defer to the wave path."""
    tok = _host_routed_tok(monkeypatch)
    # No headroom: the fused call sees only the rows already present.
    monkeypatch.setattr(
        tok, "_prepare_fused_capacity", lambda nbytes: None
    )
    got = tok.encode_batch(DOCS, allowed_special="all")
    for t, g in zip(DOCS, got):
        assert list(g) == host.encode(t, allowed_special="all"), t[:40]


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_fused_u16_units_match_python(monkeypatch, host):
    """The C++ UTF-16 unit counts drive the trims — compare exactly."""
    tok = _host_routed_tok(monkeypatch)
    texts = ["ascii only", "café ⭐", "𝄞𝄞 astral", "好好好 mixed π"]
    tok.encode_batch(texts)
    # The trims consume row_u16 directly: bulk trims over the fused
    # rows must match the host loop on BMP + astral + CJK mixes.
    for t in texts:
        for budget in (1, 2, 3, 5, 50):
            got = tok.encode_trim_suffix_batch([t], budget)[0]
            want = host.encode_trim_suffix(t, budget)
            assert got.token_ids == want.token_ids, (t, budget)
            assert got.text == want.text, (t, budget)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_fused_stream_parity(monkeypatch, host):
    tok = _host_routed_tok(monkeypatch)
    chunks = [DOCS[i : i + 3] for i in range(0, len(DOCS), 3)]
    out = []
    for batch in tok.encode_batch_stream(iter(chunks), allowed_special="all"):
        out.extend(batch)
    flat_docs = [d for c in chunks for d in c]
    assert len(out) == len(flat_docs)
    for t, g in zip(flat_docs, out):
        assert list(g) == host.encode(t, allowed_special="all"), t[:40]


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
@pytest.mark.parametrize("enc", ["cl100k_synth", "o200k_synth"])
def test_fused_parity_patterns_2_3(monkeypatch, enc):
    """Patterns 2/3 drive different native scanners; the fused merge
    must stay bit-exact there too (synthetic 100k/200k-rank vocabs)."""
    monkeypatch.setenv("TOKENIZER_TPU_NO_DEVICE", "1")
    try:
        tok = create_by_encoder_name(enc, allow_fetch=False, use_tpu=True)
    except Exception:
        pytest.skip(f"{enc} vocab unavailable")
    host2 = create_by_encoder_name(enc, allow_fetch=False)
    got = tok.encode_batch(DOCS, allowed_special="all")
    for t, g in zip(DOCS, got):
        assert list(g) == host2.encode(t, allowed_special="all"), t[:40]
    assert tok.stats.unique_pieces > 0


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_fused_fuzz_vs_oracle(monkeypatch, host):
    """Seeded random unicode/byte soup through the fused path."""
    import random

    rng = random.Random(0xF05E)
    pools = [
        lambda: "".join(
            chr(rng.choice([32, 10, 9] + list(range(97, 123))))
            for _ in range(rng.randint(1, 40))
        ),
        lambda: "".join(
            chr(rng.randint(0x4E00, 0x9FFF)) for _ in range(rng.randint(1, 60))
        ),
        lambda: "".join(
            chr(rng.randint(0x1F300, 0x1F64F)) for _ in range(rng.randint(1, 8))
        ),
        lambda: str(rng.randint(0, 10**rng.randint(1, 12))),
        lambda: " '" + rng.choice(["s", "t", "re", "ve", "LL", "D"]),
    ]
    docs = [
        "".join(rng.choice(pools)() for _ in range(rng.randint(1, 12)))
        for _ in range(80)
    ]
    tok = _host_routed_tok(monkeypatch)
    got = tok.encode_batch(docs)
    for t, g in zip(docs, got):
        assert list(g) == host.encode(t), repr(t[:50])
    assert tok.stats.fused_pieces > 0  # the fused path actually engaged


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_split_merge_batch_low_level(host):
    """Direct contract test of the native entry point."""
    vocab_tok = create_by_encoder_name("gpt2", allow_fetch=False, use_tpu=True)
    table = vocab_tok.table
    ctx = native.SplitContext(1)
    data = b"hello world hello brave new world"
    rows = np.zeros((64, 16), np.int32)
    row_len = np.zeros(64, np.int32)
    row_u16 = np.zeros(64, np.int32)
    uid_rows = np.full(64, -9, np.int32)
    uids, offs, counts, news, n_rows, n_fused, n_copied = ctx.split_merge_batch(
        data,
        np.array([0]),
        np.array([len(data)]),
        table,
        rows,
        row_len,
        row_u16,
        uid_rows,
        0,
    )
    assert len(news[0]) == 0  # everything fit -> fully fused
    assert n_fused == n_rows > 0
    n = int(counts[0])
    # Reconstruct the token stream from the fused rows and compare.
    got = []
    for u in uids[:n]:
        r = uid_rows[u]
        got.extend(rows[r, : row_len[r]].tolist())
    assert got == host.encode(data.decode())
    # Dedup: repeated pieces share uids; fused rows count the uniques.
    assert n_fused == len(set(uids[:n].tolist()))


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_giant_segment_item_parallel_assemble(monkeypatch, host):
    """One >131k-piece segment (multiple uid-range assembly items)
    containing overflow-pool rows must assemble bit-exactly."""
    import hashlib

    def word(i):
        h = hashlib.blake2b(str(i).encode(), digest_size=4).digest()
        return "".join(chr(97 + b % 26) for b in h)

    parts = []
    for i in range(70000):  # ~2 pieces/word -> >140k pieces, one segment
        parts.append(word(i))
        if i % 9000 == 0:
            parts.append("好" * 120)  # merges to >128 ids: overflow row
    doc = " ".join(parts)
    tok = _host_routed_tok(monkeypatch)
    got = tok.encode_batch([doc])[0]
    want = host.encode(doc)
    assert list(got) == want
    # The overflow pool was actually exercised.
    assert (tok._row_len[: tok._n_rows] < 0).sum() > 0
