"""Multi-host job plumbing (SURVEY.md §2.3 collective backend row).

Thin wrappers over ``jax.distributed`` + collectives for the pod-slice
deployment: initialize the process group over DCN, psum small counter
vectors over the global device mesh, and gather per-shard metadata.
Bulk token ids never cross hosts (shards are independent; order is
restored by stable shard indices — SURVEY.md §5 multi-host
determinism).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["initialize", "all_sum", "process_info"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` with env-based defaults.

    No-op when running single-process (the common dev case), so callers
    can invoke it unconditionally.
    """
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info() -> tuple:
    import jax

    return jax.process_index(), jax.process_count()


def all_sum(values: Sequence[float]) -> np.ndarray:
    """Global sum of a small counter vector across all hosts' devices.

    Implemented as a psum over the full device mesh (ICI intra-slice,
    DCN across slices).  Single-process: returns the input unchanged.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    arr = np.asarray(values, dtype=np.float64)
    if jax.process_count() == 1 and len(jax.devices()) == 1:
        return arr
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("data",))

    def _sum(x):
        return jax.lax.psum(x, axis_name="data")

    fn = jax.jit(
        jax.shard_map(
            _sum, mesh=mesh, in_specs=P(), out_specs=P()
        )
    )
    # Each device contributes the (replicated) local value once per
    # process: divide by local device count so the reduction counts
    # every PROCESS once.
    local = arr / len(jax.local_devices())
    return np.asarray(fn(jnp.asarray(local)))
