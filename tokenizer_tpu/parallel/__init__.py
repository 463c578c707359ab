"""Distributed execution: data-parallel sharding over a device mesh.

SURVEY.md §2.3 is the design contract: data parallelism is the primary
(and only semantically meaningful) axis for tokenization — corpus
shards per chip over a 1-D ``("data",)`` mesh, the pair table
REPLICATED per chip, token/byte counters reduced with ``jax.lax.psum``
over ICI/DCN.  Merges never cross regex-piece boundaries, so shards
never exchange token data; order is restored by stable shard indices.
"""

from .mesh import data_mesh, local_batch_size
from .encode_step import sharded_merge_step, make_sharded_merge_fn

__all__ = [
    "data_mesh",
    "local_batch_size",
    "sharded_merge_step",
    "make_sharded_merge_fn",
]
