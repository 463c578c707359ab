"""Runtime services: JAX environment setup, pipelines, perf harness."""

from .jaxenv import ensure_compile_cache

__all__ = ["ensure_compile_cache"]
