"""Runner for the third Pallas probe formulation (VERDICT r3 next #3).

Usage:
  python tools/exp_pallas_dma.py                 # on-chip A/B (TPU)
  JAX_PLATFORMS=cpu python tools/exp_pallas_dma.py --interpret
                                                 # correctness only

Prints one JSON line per arm with measured probe times at a real-vocab
bucket shape; results are transcribed into ops/exp_pallas_dma.py's
docstring and docs/adr-pallas-merge.md.  Each arm runs in a bounded
alarm so a Mosaic compile blow-up (seen with the one-hot formulation)
reports instead of hanging the run.
"""

from __future__ import annotations

import json
import signal
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHAPE = (16, 128)  # one merge wave's worth of probes (2048)
ARM_TIMEOUT_S = 420


class _ArmTimeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _ArmTimeout()


def run_arm(name, fn, left, right, want):
    import jax

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(ARM_TIMEOUT_S)
    try:
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(left, right))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(10):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(left, right))
            best = min(best, time.perf_counter() - t0)
        ok = bool(np.array_equal(np.asarray(out), want))
        rec = {
            "arm": name,
            "ms": round(best * 1e3, 3),
            "compile_s": round(compile_s, 1),
            "bit_exact": ok,
        }
    except _ArmTimeout:
        rec = {"arm": name, "error": f"did not finish in {ARM_TIMEOUT_S}s"}
    except Exception as ex:
        rec = {"arm": name, "error": f"{type(ex).__name__}: {str(ex)[:200]}"}
    finally:
        signal.alarm(0)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    interpret = "--interpret" in sys.argv
    import jax

    if interpret:
        jax.config.update("jax_platforms", "cpu")

    from tokenizer_tpu.ops.exp_pallas_dma import (
        probe_pallas_dma,
        probe_pallas_vmem,
        probe_xla,
        table_planes_2d,
    )
    from tokenizer_tpu.ops.merge_jax import device_table
    from tokenizer_tpu.ops.pair_table import MAX_RANK
    from tokenizer_tpu.vocab import Vocabulary

    table = Vocabulary.for_encoding("gpt2", allow_fetch=False).pair_table()
    rng = np.random.default_rng(7)
    n = SHAPE[0] * SHAPE[1]
    filled = np.nonzero(table.key_left != -1)[0]
    pick = rng.choice(filled, size=n // 2)
    left = np.empty(n, np.int32)
    right = np.empty(n, np.int32)
    left[: n // 2] = table.key_left[pick]
    right[: n // 2] = table.key_right[pick]
    left[n // 2 :] = rng.integers(0, 50000, n // 2)
    right[n // 2 :] = rng.integers(0, 50000, n // 2)
    left = left.reshape(SHAPE)
    right = right.reshape(SHAPE)

    want = np.full(SHAPE, MAX_RANK, np.int32)
    for idx in np.ndindex(SHAPE):
        v = table.lookup(int(left[idx]), int(right[idx]))
        if v is not None:
            want[idx] = v

    print(
        json.dumps(
            {
                "table_slots": table.n_slots,
                "max_probes": table.max_probes,
                "probe_shape": list(SHAPE),
                "backend": jax.devices()[0].platform,
            }
        ),
        flush=True,
    )

    tab = device_table(table)
    planes = table_planes_2d(table)
    sb, mp = table.slot_bits, table.max_probes

    run_arm("xla", lambda l, r: probe_xla(tab, sb, mp, l, r), left, right, want)
    run_arm(
        "pallas_vmem",
        lambda l, r: probe_pallas_vmem(planes, sb, mp, l, r, interpret),
        left,
        right,
        want,
    )
    run_arm(
        "pallas_dma",
        lambda l, r: probe_pallas_dma(planes, sb, mp, l, r, interpret),
        left,
        right,
        want,
    )
    import os

    os._exit(0)  # probe threads may be wedged on a stalled transport


if __name__ == "__main__":
    main()
