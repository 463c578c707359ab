"""Correctness of the big-table Pallas probe experiment.

The one-hot-matmul formulation (ops/exp_pallas_bigtable.py) must be
bit-exact vs the host PairTable oracle — on the full gpt2-scale table,
in interpret mode (the experiment's perf verdict is produced by
tools/exp_pallas_bigtable.py on a real chip).
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import require_vocab


@pytest.fixture(scope="module")
def gpt2_table():
    require_vocab("gpt2")
    from tokenizer_tpu.vocab import Vocabulary

    return Vocabulary.for_encoding("gpt2", allow_fetch=False).pair_table()


def test_onehot_lookup_bit_exact(gpt2_table):
    import jax.numpy as jnp

    from tokenizer_tpu.ops.exp_pallas_bigtable import (
        bigtable_device_table,
        lookup_onehot_pallas,
        lookup_xla,
    )

    table = gpt2_table
    S, B = 2, 128
    rng = np.random.default_rng(5)
    pick = rng.integers(0, len(table.key_left), size=S * B)
    left = np.where(
        np.arange(S * B) % 2 == 0,
        table.key_left[pick],
        rng.integers(0, 50257, size=S * B),
    ).astype(np.int32)
    right = np.where(
        np.arange(S * B) % 2 == 0,
        table.key_right[pick],
        rng.integers(0, 50257, size=S * B),
    ).astype(np.int32)
    left = np.where(left < 0, 0, left).reshape(S, B)
    right = np.where(right < 0, 0, right).reshape(S, B)

    expect = np.array(
        [
            [table.lookup(int(left[i, j]), int(right[i, j])) for j in range(B)]
            for i in range(S)
        ],
        np.int32,
    )
    kw = dict(slot_bits=table.slot_bits, max_probes=table.max_probes)
    got_x = np.asarray(lookup_xla(
        (
            jnp.asarray(table.key_left),
            jnp.asarray(table.key_right),
            jnp.asarray(table.values),
        ),
        jnp.asarray(left),
        jnp.asarray(right),
        **kw,
    ))
    assert (got_x == expect).all()
    got_p = np.asarray(
        lookup_onehot_pallas(
            jnp.asarray(bigtable_device_table(table)),
            jnp.asarray(left),
            jnp.asarray(right),
            interpret=True,
            **kw,
        )
    )
    assert (got_p == expect).all()
