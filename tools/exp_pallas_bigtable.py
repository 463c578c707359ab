"""Runner for the real-vocab Pallas probe experiment (VERDICT r2 #6).

Usage:
  python tools/exp_pallas_bigtable.py            # on-chip A/B (TPU)
  JAX_PLATFORMS=cpu python tools/exp_pallas_bigtable.py --interpret
                                                 # correctness only

Prints one JSON line with the measured lookup times; the conclusion is
recorded in ops/exp_pallas_bigtable.py's docstring.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    interpret = "--interpret" in sys.argv
    import jax

    if interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tokenizer_tpu.ops.exp_pallas_bigtable import (
        bigtable_device_table,
        lookup_onehot_pallas,
        lookup_xla,
    )
    from tokenizer_tpu.vocab import Vocabulary

    vocab = Vocabulary.for_encoding("gpt2", allow_fetch=False)
    table = vocab.pair_table()
    print(
        f"table: {table.n_slots} slots, {table.max_probes} probes",
        file=sys.stderr,
    )

    # On-chip default is the [2, 128] tile: the measured record
    # (ops/exp_pallas_bigtable.py docstring) shows the [16, 128] tile's
    # statically-unrolled one-hot rounds blow up Mosaic compile time
    # (>500 s); pass --tile 16 to reproduce that blowup deliberately.
    S = 2
    for k, a in enumerate(sys.argv):
        if a == "--tile" and k + 1 < len(sys.argv):
            S = int(sys.argv[k + 1])
    B = 128
    rng = np.random.default_rng(5)
    # Half real pairs (hits), half random (mostly misses).
    n_pairs = len(table.key_left)
    pick = rng.integers(0, n_pairs, size=S * B)
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
    # Mask the empty-slot picks (key -1) as invalid probes.
    left = np.where(left < 0, 0, left).reshape(S, B)
    right = np.where(right < 0, 0, right).reshape(S, B)

    # Host oracle.
    expect = np.empty((S, B), np.int32)
    for i in range(S):
        for j in range(B):
            expect[i, j] = table.lookup(int(left[i, j]), int(right[i, j]))

    tab2d = jnp.asarray(bigtable_device_table(table))
    arrays = (
        jnp.asarray(table.key_left),
        jnp.asarray(table.key_right),
        jnp.asarray(table.values),
    )
    l_d, r_d = jnp.asarray(left), jnp.asarray(right)

    kw = dict(slot_bits=table.slot_bits, max_probes=table.max_probes)
    if "--no-verify" in sys.argv:
        # Timing-only mode for transports whose d2h stalls (correctness
        # is covered by the interpret-mode run / test suite; this mode
        # uses block_until_ready only, which such transports serve).
        print("verify skipped (--no-verify)", file=sys.stderr)
    else:
        got_x = np.asarray(lookup_xla(arrays, l_d, r_d, **kw))
        assert (got_x == expect).all(), "XLA lookup mismatch"
        got_p = np.asarray(
            lookup_onehot_pallas(tab2d, l_d, r_d, interpret=interpret, **kw)
        )
        assert (got_p == expect).all(), "Pallas one-hot lookup mismatch"
        print("bit-exact: ok", file=sys.stderr)

    def bench(fn, *args, **kws):
        jax.block_until_ready(fn(*args, **kws))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args, **kws))
            best = min(best, time.perf_counter() - t0)
        return best

    rec = {
        "probes": S * B,
        "slots": table.n_slots,
        "max_probes": table.max_probes,
        "interpret": interpret,
    }
    if not interpret:
        tx = bench(lookup_xla, arrays, l_d, r_d, **kw)
        tp = bench(lookup_onehot_pallas, tab2d, l_d, r_d, **kw)
        rec.update(
            {
                "xla_gather_ms": round(tx * 1e3, 3),
                "pallas_onehot_ms": round(tp * 1e3, 3),
                "slowdown_x": round(tp / tx, 1),
            }
        )
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
