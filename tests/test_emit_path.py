"""The fused scan+merge+EMIT path (one native pass, no assemble).

Differential tests against the host oracle AND the classic two-phase
path: the emit route must be bit-identical through holes (deferred
pieces), overflow rows, specials, generational rotation, and the
patch-overflow fallback.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from conftest import require_vocab


@pytest.fixture()
def toks(gpt2_vocab):
    from tokenizer_tpu.engine import TikTokenizer
    from tokenizer_tpu.models.registry import get_encoding_spec
    from tokenizer_tpu.tpu import TpuTokenizer

    spec = get_encoding_spec("gpt2")
    tpu = TpuTokenizer(
        gpt2_vocab, spec.special_tokens, spec.pattern, mesh=None
    )
    host = TikTokenizer(gpt2_vocab, spec.special_tokens, spec.pattern)
    return tpu, host


def _word(tag, j):
    h = hashlib.blake2b(f"{tag}:{j}".encode(), digest_size=6).digest()
    return "".join(chr(97 + b % 26) for b in h)


def test_emit_route_taken_and_exact(toks):
    tpu, host = toks
    texts = [
        "Hello World, the emit path encodes in one pass.",
        "",
        "unicode ⭐ étoile 你好 💩 12345 'll 'VE",
        " ".join(_word("a", j) for j in range(300)),
        "trailing spaces   \n\n mixed \r\n",
    ]
    got = tpu.encode_batch(texts)
    for g, t in zip(got, texts):
        assert list(g) == host.encode(t), t[:40]
    # The route was actually the emit one: zero assemble calls means
    # tokens_out was counted by the emit path (fused pieces > 0).
    assert tpu.stats.fused_pieces > 0


def test_emit_specials_interleaved(toks):
    tpu, host = toks
    texts = [
        "x<|endoftext|>y<|endoftext|>z tail",
        "<|endoftext|>",
        "<|endoftext|>lead",
        "no specials here",
        "tail<|endoftext|>",
    ]
    got = tpu.encode_batch(texts, allowed_special="all")
    for g, t in zip(got, texts):
        assert list(g) == host.encode(t, allowed_special="all"), t


def test_emit_overflow_rows(toks):
    """Long CJK pieces produce overflow rows (> row width ids); the
    emit path must read them from the pool inline."""
    tpu, host = toks
    big = "好" * 400  # one ~1200-byte piece, low merge rate on gpt2
    texts = [f"before {big} after", big]
    got = tpu.encode_batch(texts)
    for g, t in zip(got, texts):
        assert list(g) == host.encode(t)
    # Second sight: the overflow row resolves from the pool (steady).
    got2 = tpu.encode_batch(texts)
    for g, t in zip(got2, texts):
        assert list(g) == host.encode(t)


def test_emit_holes_via_capacity_pressure(toks, monkeypatch):
    """Force deferrals: clamp the fused row reserve so first-seen
    pieces can't all fuse inline -> holes -> backfill+compact."""
    tpu, host = toks
    import tokenizer_tpu.tpu as T

    # Make _prepare_fused_capacity reserve almost nothing.
    def tiny_prepare(nbytes):
        pass  # no pre-grow: the C++ defers once rows/uids fill

    monkeypatch.setattr(tpu, "_prepare_fused_capacity", tiny_prepare)
    # Exhaust current row capacity margin first.
    texts = [" ".join(_word(f"h{k}", j) for j in range(400)) for k in range(6)]
    got = tpu.encode_batch(texts)
    for g, t in zip(got, texts):
        assert list(g) == host.encode(t), "hole backfill parity"


def test_emit_patch_overflow_falls_back(toks, monkeypatch):
    """A patch-scratch overflow must recover: news still registered,
    classic path redone, output exact, and later calls keep working."""
    tpu, host = toks
    ctx_cls = type(tpu._native.SplitContext(1))
    monkeypatch.setattr(ctx_cls, "_PATCH_CAP", 1)
    monkeypatch.setattr(tpu, "_prepare_fused_capacity", lambda n: None)
    texts = [" ".join(_word(f"p{k}", j) for j in range(300)) for k in range(4)]
    got = tpu.encode_batch(texts)
    for g, t in zip(got, texts):
        assert list(g) == host.encode(t)
    # Steady retry works (uids all have rows).
    got2 = tpu.encode_batch(texts)
    for g, t in zip(got2, texts):
        assert list(g) == host.encode(t)


def test_emit_with_generational_rotation(toks):
    tpu, host = toks
    tpu._max_unique_rows = 1200  # per-gen bound 600
    hot = [_word("hot", j) for j in range(250)]
    for ci in range(6):
        fresh = [_word(f"r{ci}", j) for j in range(200)]
        text = " ".join(hot + fresh)
        got = tpu.encode_batch([text])[0]
        assert list(got) == host.encode(text), f"chunk {ci}"
    assert tpu.stats.dedup_resets >= 1
    assert tpu.stats.dedup_gen_copies > 0


def test_emit_stream_matches_classic(toks):
    tpu, host = toks
    rng = np.random.default_rng(5)
    alphabet = "abc ABC 123 \n\r\t ⭐你好 é 💩 '! .,<|endoftext|>"
    batches = []
    for _ in range(4):
        batch = [
            "".join(
                alphabet[rng.integers(0, len(alphabet))]
                for _ in range(rng.integers(0, 120))
            )
            for _ in range(40)
        ]
        batches.append(batch)
    flat = [
        ids
        for b in tpu.encode_batch_stream(iter(batches), allowed_special="all")
        for ids in b
    ]
    want = [
        host.encode(t, allowed_special="all") for b in batches for t in b
    ]
    assert len(flat) == len(want)
    for g, w in zip(flat, want):
        assert list(g) == w


def test_emit_outputs_own_their_storage(toks):
    """Returned arrays must survive ring recycling: encode many more
    batches than the ring depth, then re-check the FIRST result."""
    tpu, host = toks
    text = "ring ownership check ⭐ 123"
    first = tpu.encode_batch([text])[0]
    want = list(first)
    for k in range(10):  # > ring depth
        tpu.encode_batch([f"filler {k} " * 50])
    assert list(first) == want == host.encode(text)


def test_emit_thread_storm(gpt2_vocab, monkeypatch):
    """Oversubscribed scan threads + tiny subsegments: maximal
    cross-thread first-seen traffic through the emit acquire/release
    protocol, with generational rotation active."""
    monkeypatch.setenv("TOKENIZER_TPU_THREADS", "8")
    monkeypatch.setenv("TOKENIZER_TPU_SUBSEG_BYTES", "4096")
    import hashlib

    from tokenizer_tpu.engine import TikTokenizer
    from tokenizer_tpu.models.registry import get_encoding_spec
    from tokenizer_tpu.tpu import TpuTokenizer

    spec = get_encoding_spec("gpt2")
    host = TikTokenizer(gpt2_vocab, spec.special_tokens, spec.pattern)

    def word(j):
        h = hashlib.blake2b(f"s:{j}".encode(), digest_size=6).digest()
        return "".join(chr(97 + b % 26) for b in h)

    big = " ".join(word(j) for j in range(40000))  # ~280 KB, ~40k uniques
    want = host.encode(big)
    for trial in range(2):
        tok = TpuTokenizer(
            gpt2_vocab,
            spec.special_tokens,
            spec.pattern,
            mesh=None,
            max_unique_rows=30000,  # forces a rotation mid-doc
        )
        got = tok.encode_batch([big])[0]
        assert list(got) == want, f"trial {trial}"
        got2 = tok.encode_batch([big])[0]
        assert list(got2) == want, f"trial {trial} steady"


def test_emit_device_route_no_fuse(toks):
    """The no-fuse emit (device-preferred route): every first-seen
    piece defers to one wave, holes backfill natively, and — the
    regression this guards — the row high-water mark must NOT be wiped
    by the fuse gate (row_cap=0), which would recycle resolved rows
    still referenced by uid_rows on LATER calls."""
    tpu, host = toks
    tpu._should_fuse = lambda n: False  # force the device-route shape
    for ci in range(4):  # repeated calls: later rows must not alias
        texts = [
            " ".join(_word(f"d{ci}:{k}", j) for j in range(150))
            for k in range(4)
        ]
        got = tpu.encode_batch(texts)
        for g, t in zip(got, texts):
            assert list(g) == host.encode(t), (ci, t[:40])
    # Steady re-encode of the FIRST chunk still exact (its rows intact).
    texts0 = [
        " ".join(_word(f"d0:{k}", j) for j in range(150)) for k in range(4)
    ]
    got = tpu.encode_batch(texts0)
    for g, t in zip(got, texts0):
        assert list(g) == host.encode(t)
    assert tpu.stats.fused_pieces == 0  # fusing was really off


def test_stream_router_flip_dev_to_emit(gpt2_vocab):
    """A classic DEVICE-deferred chunk followed by a host-routed EMIT
    chunk that repeats its pieces: the stream must drain the in-flight
    wave before the emit scan reads those rows (uid_rows publishes at
    registration, before the wave resolves)."""
    import hashlib

    from tokenizer_tpu.engine import TikTokenizer
    from tokenizer_tpu.models.registry import get_encoding_spec
    from tokenizer_tpu.tpu import TpuTokenizer

    spec = get_encoding_spec("gpt2")
    tok = TpuTokenizer(gpt2_vocab, spec.special_tokens, spec.pattern, mesh=None)
    host = TikTokenizer(gpt2_vocab, spec.special_tokens, spec.pattern)
    # Force the adaptive router into a device-favoring state on the CPU
    # backend (single-device jit path).
    tok._ensure_device()
    tok._dev_ready = True
    tok._dev_probe_started = True
    tok._dev_event.set()
    tok._dev_pp = 1e-12
    tok._host_pp = 1.0

    def word(tag, j):
        h = hashlib.blake2b(f"{tag}:{j}".encode(), digest_size=6).digest()
        return "".join(chr(97 + b % 26) for b in h)

    # Chunk 1: >1024 uniques -> device wave, deferred by the stream.
    big = [" ".join(word("flip", j) for j in range(1500))]
    # Chunk 2: repeats chunk 1's pieces (+ a couple new) at a size the
    # router sends to the host -> emit route.
    rep = [" ".join(word("flip", j) for j in range(40)) + " fresh bits"]
    # High initial news estimate -> chunk 1 predicts a >1024-piece wave
    # (device); the post-chunk EMA then drops the estimate so chunk 2
    # predicts host -> the flip under test.
    tok._news_per_byte = 1.0
    got = [
        ids
        for b in tok.encode_batch_stream(iter([big, rep]))
        for ids in b
    ]
    want = [host.encode(big[0]), host.encode(rep[0])]
    assert list(got[0]) == want[0]
    assert list(got[1]) == want[1]
    assert tok.stats.device_pieces > 0, "chunk 1 never took the device"


def test_stream_alternating_routes_chain(gpt2_vocab):
    """Alternating device/host chunks through the deferred-emit stream:
    later host chunks hole-reference earlier in-flight waves' pieces
    (must_defer token chaining), everything resolves in order."""
    import hashlib

    from tokenizer_tpu.engine import TikTokenizer
    from tokenizer_tpu.models.registry import get_encoding_spec
    from tokenizer_tpu.tpu import TpuTokenizer

    spec = get_encoding_spec("gpt2")
    tok = TpuTokenizer(gpt2_vocab, spec.special_tokens, spec.pattern, mesh=None)
    host = TikTokenizer(gpt2_vocab, spec.special_tokens, spec.pattern)
    tok._ensure_device()
    tok._dev_ready = True
    tok._dev_probe_started = True
    tok._dev_event.set()
    tok._dev_pp = 1e-12
    tok._host_pp = 1.0

    def word(tag, j):
        h = hashlib.blake2b(f"{tag}:{j}".encode(), digest_size=6).digest()
        return "".join(chr(97 + b % 26) for b in h)

    batches = []
    for r in range(3):
        # Big unique chunk -> device wave (estimate pushed high first).
        batches.append([" ".join(word(f"r{r}", j) for j in range(1400))])
        # Small chunk repeating the previous chunk's pieces -> host/emit
        # with holes referencing the (possibly in-flight) wave.
        batches.append(
            [" ".join(word(f"r{r}", j) for j in range(30)) + " tail bit"]
        )
    tok._news_per_byte = 1.0
    got = [
        ids for b in tok.encode_batch_stream(iter(batches)) for ids in b
    ]
    want = [host.encode(b[0]) for b in batches]
    for i, (g, w) in enumerate(zip(got, want)):
        assert list(g) == w, f"chunk {i}"
    assert tok.stats.device_pieces > 0


def test_stream_patch_overflow_with_deferred_wave(gpt2_vocab, monkeypatch):
    """Patch-scratch overflow on chunk k+1 while chunk k's device wave
    is still deferred: the classic fallback must drain the pending wave
    first (its uids are unpublished by design; the native assembler
    now fails loudly with -7 instead of reading row_len[-1])."""
    import hashlib

    from tokenizer_tpu.engine import TikTokenizer
    from tokenizer_tpu.models.registry import get_encoding_spec
    from tokenizer_tpu.tpu import TpuTokenizer

    spec = get_encoding_spec("gpt2")
    tok = TpuTokenizer(gpt2_vocab, spec.special_tokens, spec.pattern, mesh=None)
    host = TikTokenizer(gpt2_vocab, spec.special_tokens, spec.pattern)
    tok._ensure_device()
    tok._dev_ready = True
    tok._dev_probe_started = True
    tok._dev_event.set()
    tok._dev_pp = 1e-12
    tok._host_pp = 1.0
    tok._news_per_byte = 1.0
    ctx_cls = type(tok._native.SplitContext(1))
    monkeypatch.setattr(ctx_cls, "_PATCH_CAP", 8)

    def word(tag, j):
        h = hashlib.blake2b(f"{tag}:{j}".encode(), digest_size=6).digest()
        return "".join(chr(97 + b % 26) for b in h)

    big = [" ".join(word("ov", j) for j in range(1500))]  # dev wave
    # Repeats >8 of chunk 1's pieces -> every one a hole -> overflow.
    rep = [" ".join(word("ov", j) for j in range(200))]
    got = [
        ids for b in tok.encode_batch_stream(iter([big, rep])) for ids in b
    ]
    assert list(got[0]) == host.encode(big[0])
    assert list(got[1]) == host.encode(rep[0])
    assert tok.stats.device_pieces > 0
