"""Mesh construction for the 1-D data-parallel layout (SURVEY.md §2.3)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

__all__ = ["data_mesh", "local_batch_size"]


def data_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> "jax.sharding.Mesh":
    """A 1-D ``("data",)`` mesh over the given (default: all) devices.

    Multi-host: ``jax.devices()`` already enumerates the global device
    set after ``jax.distributed.initialize`` (see
    :mod:`tokenizer_tpu.parallel.multihost`), so the same call shape
    covers single-chip, single-host and pod-slice runs.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.sharding.Mesh(np.asarray(devices), ("data",))


def local_batch_size(global_b: int, mesh: "jax.sharding.Mesh") -> int:
    n = mesh.shape["data"]
    if global_b % n:
        raise ValueError(f"batch {global_b} not divisible by mesh size {n}")
    return global_b // n
