"""Registry tables: model→encoding resolution, patterns, special tokens.

Ports the registry behaviors asserted implicitly throughout the
reference's builder and tests (tokenizerBuilder.ts:6-175,
TokenizerBuilder.cs:14-181).
"""

import pytest

from tokenizer_tpu.models.registry import (
    ENCODINGS,
    REGEX_PATTERN_1,
    REGEX_PATTERN_2,
    REGEX_PATTERN_3,
    encoding_name_for_model,
    get_encoding_spec,
    get_regex_by_encoder,
    get_regex_by_model,
    get_special_tokens_by_encoder,
    get_special_tokens_by_model,
)


@pytest.mark.parametrize(
    "model,encoding",
    [
        ("gpt-4o", "o200k_base"),
        ("gpt-4o-2024-05-13", "o200k_base"),
        ("gpt-4", "cl100k_base"),
        ("gpt-4-0314", "cl100k_base"),
        ("gpt-3.5-turbo", "cl100k_base"),
        ("gpt-3.5-turbo-0301", "cl100k_base"),
        ("gpt-35-turbo-16k", "cl100k_base"),  # Azure prefix (TS-only)
        ("text-embedding-ada-002", "cl100k_base"),
        ("text-davinci-003", "p50k_base"),
        ("code-davinci-002", "p50k_base"),
        ("text-davinci-edit-001", "p50k_edit"),
        ("code-davinci-edit-001", "p50k_edit"),
        ("text-davinci-001", "r50k_base"),
        ("davinci", "r50k_base"),
        ("text-similarity-curie-001", "r50k_base"),
        ("gpt2", "gpt2"),
    ],
)
def test_model_to_encoding(model, encoding):
    assert encoding_name_for_model(model) == encoding


def test_unknown_model_resolves_empty_then_raises():
    assert encoding_name_for_model("no-such-model") == ""
    with pytest.raises(ValueError, match=r"Doesn't support this encoder"):
        get_encoding_spec("")


def test_patterns_by_encoder():
    assert get_regex_by_encoder("o200k_base") == REGEX_PATTERN_3
    assert get_regex_by_encoder("cl100k_base") == REGEX_PATTERN_2
    for enc in ("p50k_base", "p50k_edit", "r50k_base", "gpt2", "unknown"):
        assert get_regex_by_encoder(enc) == REGEX_PATTERN_1
    assert get_regex_by_model("gpt-4") == REGEX_PATTERN_2
    assert get_regex_by_model("gpt-4o-mini") == REGEX_PATTERN_3


def test_special_token_tables():
    # cl100k: TokenizerBuilder.cs:114-120.
    cl = get_special_tokens_by_encoder("cl100k_base")
    assert cl == {
        "<|endoftext|>": 100257,
        "<|fim_prefix|>": 100258,
        "<|fim_middle|>": 100259,
        "<|fim_suffix|>": 100260,
        "<|endofprompt|>": 100276,
    }
    # o200k: tokenizerBuilder.ts:133-137.
    assert get_special_tokens_by_encoder("o200k_base") == {
        "<|endoftext|>": 199999,
        "<|endofprompt|>": 200018,
    }
    # p50k_edit FIM: tokenizerBuilder.ts:148-154.
    assert get_special_tokens_by_encoder("p50k_edit") == {
        "<|endoftext|>": 50256,
        "<|fim_prefix|>": 50281,
        "<|fim_middle|>": 50282,
        "<|fim_suffix|>": 50283,
    }
    for enc in ("gpt2", "r50k_base", "p50k_base"):
        assert get_special_tokens_by_encoder(enc) == {"<|endoftext|>": 50256}
    # Unknown encoder falls back to the gpt2 table (TS default case).
    assert get_special_tokens_by_encoder("nope") == {"<|endoftext|>": 50256}
    assert get_special_tokens_by_model("gpt-4")["<|endoftext|>"] == 100257


def test_every_encoding_has_spec():
    for name, spec in ENCODINGS.items():
        assert spec.name == name
        assert spec.pattern
        # Reference encodings fetch over https; framework-added
        # synthetic encodings are vendored-only (empty URL).
        assert spec.vocab_url.startswith("https://") or (
            spec.vocab_url == "" and "synth" in name
        )
        assert "<|endoftext|>" in spec.special_tokens


def test_model_to_encoding_exported_like_ts():
    """index.ts exports MODEL_TO_ENCODING (tokenizer_ts/src/index.ts:2-4)."""
    import tokenizer_tpu as tt

    assert tt.MODEL_TO_ENCODING["gpt-4"] == "cl100k_base"
    assert tt.MODEL_TO_ENCODING["gpt2"] == "gpt2"


def test_builder_forwards_tpu_options():
    """Device construction options (mesh=, max_unique_rows=) ride the
    builder layer; the host engine rejects them loudly."""
    import pytest
    from conftest import require_vocab

    require_vocab("gpt2")
    from tokenizer_tpu import create_by_encoder_name

    tok = create_by_encoder_name(
        "gpt2", allow_fetch=False, use_tpu=True,
        max_unique_rows=600, mesh=None,
    )
    assert tok.encode("hi there") == [5303, 612]
    with pytest.raises(TypeError, match="max_unique_rows"):
        create_by_encoder_name("gpt2", allow_fetch=False, max_unique_rows=600)
