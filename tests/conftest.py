"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``) so the multi-chip sharding
paths are exercised without TPU hardware, per SURVEY.md §4.  The env vars
must be set before jax is first imported, hence this conftest sets them
at collection time.  Set TOKENIZER_TPU_TEST_TPU=1 to run device tests on
the real chip instead.
"""

import os
import sys
from pathlib import Path

import pytest

if not os.environ.get("TOKENIZER_TPU_TEST_TPU"):
    # The CI image's sitecustomize registers the tunneled-TPU ("axon")
    # PJRT plugin in every process and calls
    # jax.config.update("jax_platforms", "axon,cpu") — a programmatic
    # override, so setting the env var alone is NOT enough.  Unit tests
    # must run on the virtual 8-device CPU mesh: force the config back.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except ImportError:
        pass

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

# Golden conformance data is vendored in-repo (tests/testdata — the
# conformance corpus and committed id arrays, the same shared constants
# the reference commits in its test trees), with the reference checkout
# as a secondary source when mounted.
TESTDATA_DIRS = [
    REPO / "tests" / "testdata",
    REFERENCE / "tokenizer_ts" / "test" / "testdata",
    REFERENCE / "Tokenizer_C#" / "TokenizerTest" / "testData",
]


def find_testdata(name: str):
    for d in TESTDATA_DIRS:
        p = d / name
        if p.is_file():
            return p
    return None


@pytest.fixture(scope="session")
def lib_rs_text():
    p = find_testdata("lib.rs.txt")
    if p is None:
        pytest.skip("reference conformance corpus not available")
    return p.read_text(encoding="utf-8")


def has_vocab(encoding: str) -> bool:
    from tokenizer_tpu.vocab import resolve_vocab_file

    try:
        resolve_vocab_file(encoding, allow_fetch=False)
        return True
    except (FileNotFoundError, ValueError):
        return False


def require_vocab(encoding: str):
    if not has_vocab(encoding):
        pytest.skip(f"{encoding} rank file not available offline")


@pytest.fixture(scope="session")
def gpt2_vocab():
    require_vocab("gpt2")
    from tokenizer_tpu.vocab import Vocabulary

    return Vocabulary.for_encoding("gpt2", allow_fetch=False)


@pytest.fixture(scope="session")
def gpt2_pair_table(gpt2_vocab):
    return gpt2_vocab.pair_table()


@pytest.fixture(scope="session")
def gpt2_tokenizer():
    require_vocab("gpt2")
    from tokenizer_tpu import create_by_encoder_name

    return create_by_encoder_name("gpt2", allow_fetch=False)
