"""Tokenizer builders: model/encoder name -> configured tokenizer.

Mirrors the reference builder layer (`Tokenizer_C#/TokenizerLib/
TokenizerBuilder.cs:82-216`, `tokenizer_ts/src/tokenizerBuilder.ts:210-309`):
resolve the encoding for a model name, pick its regex pattern / rank file /
special tokens, merge user-supplied extra specials, and construct the
engine.  Rank files resolve offline-first through
:func:`tokenizer_tpu.vocab.resolve_vocab_file` (vendored/ cached /
reference-mounted assets before any network fetch, mirroring the TS
disk cache at tokenizerBuilder.ts:269-285).

``use_tpu=True`` returns the device-accelerated
:class:`~tokenizer_tpu.tpu.TpuTokenizer`, which shares this exact
construction path and the host engine's semantics.
"""

from __future__ import annotations

from typing import Mapping, Optional

from .engine import TikTokenizer
from .models.registry import (
    ENCODINGS,
    encoding_name_for_model,
    get_encoding_spec,
)
from .utils.lru import BUILDER_CACHE_SIZE
from .vocab import Vocabulary, load_encoding_ranks

__all__ = [
    "create_by_model_name",
    "create_by_encoder_name",
    "create_tokenizer",
]


def _merged_specials(
    base: Mapping[str, int], extra: Optional[Mapping[str, int]]
) -> dict:
    """Merge extra specials over the encoding's table.

    Mirrors createByEncoderName's spread (tokenizerBuilder.ts:238-258) /
    the C# dictionary union (TokenizerBuilder.cs:121-126).
    """
    merged = dict(base)
    if extra:
        merged.update(extra)
    return merged


def create_tokenizer(
    vocab: "Vocabulary | Mapping[bytes, int] | str",
    special_tokens: Mapping[str, int],
    pattern: str,
    cache_size: int = BUILDER_CACHE_SIZE,
    use_tpu: bool = False,
    **tpu_options,
) -> TikTokenizer:
    """createTokenizer (tokenizerBuilder.ts:296-309, TokenizerBuilder.cs:210).

    ``**tpu_options`` forwards device-tokenizer construction options
    (``mesh=``, ``max_unique_rows=``, ...) to
    :class:`~tokenizer_tpu.tpu.TpuTokenizer`; they are rejected when
    ``use_tpu`` is false (the host engine takes none).
    """
    if use_tpu:
        from .tpu import TpuTokenizer

        return TpuTokenizer(
            vocab, special_tokens, pattern, cache_size, **tpu_options
        )
    if tpu_options:
        raise TypeError(
            "device-tokenizer options require use_tpu=True: "
            + ", ".join(sorted(tpu_options))
        )
    return TikTokenizer(vocab, special_tokens, pattern, cache_size)


def create_by_encoder_name(
    encoder_name: str,
    extra_special_tokens: Optional[Mapping[str, int]] = None,
    cache_size: int = BUILDER_CACHE_SIZE,
    allow_fetch: bool = True,
    use_tpu: bool = False,
    **tpu_options,
) -> TikTokenizer:
    """createByEncoderName (tokenizerBuilder.ts:226-289, TokenizerBuilder.cs:107-191)."""
    spec = get_encoding_spec(encoder_name)
    ranks = load_encoding_ranks(encoder_name, allow_fetch=allow_fetch)
    vocab = Vocabulary(ranks, name=encoder_name)
    specials = _merged_specials(spec.special_tokens, extra_special_tokens)
    return create_tokenizer(
        vocab, specials, spec.pattern, cache_size, use_tpu=use_tpu,
        **tpu_options,
    )


def create_by_model_name(
    model_name: str,
    extra_special_tokens: Optional[Mapping[str, int]] = None,
    cache_size: int = BUILDER_CACHE_SIZE,
    allow_fetch: bool = True,
    use_tpu: bool = False,
    **tpu_options,
) -> TikTokenizer:
    """createByModelName (tokenizerBuilder.ts:210-219, TokenizerBuilder.cs:82-100)."""
    encoder = encoding_name_for_model(model_name)
    return create_by_encoder_name(
        encoder,
        extra_special_tokens,
        cache_size,
        allow_fetch=allow_fetch,
        use_tpu=use_tpu,
        **tpu_options,
    )
