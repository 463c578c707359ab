"""JAX environment knobs for production runs.

The merge kernels compile a handful of static shapes (one per packing
bucket).  On environments where XLA compilation is expensive — notably
the tunneled-TPU CI image, whose remote-compile round trip can take
minutes — the persistent compilation cache makes every shape a
once-per-machine cost.  Safe to call unconditionally; opt out with
TOKENIZER_TPU_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os
from pathlib import Path

_done = False


def ensure_compile_cache() -> None:
    global _done
    if _done or os.environ.get("TOKENIZER_TPU_NO_COMPILE_CACHE"):
        return
    _done = True
    import jax

    # Partition by requested platform: AOT artifacts are machine/
    # backend-specific, and a shared dir makes the CPU loader warn
    # (or worse) on entries compiled elsewhere.
    platform = (os.environ.get("JAX_PLATFORMS") or "default").split(",")[0]
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        str(Path.home() / ".cache" / "tokenizer_tpu" / "xla_cache" / platform),
    )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these knobs: not fatal
