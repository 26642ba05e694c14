"""Multi-chip scaling: mesh construction and the sharded ICP pipeline.

The reference has no distributed layer at all (SURVEY.md §5 — its only
parallelism is a KD-tree thread pool). Everything here is new TPU-native
design: point clouds sharded over a 1-D `jax.sharding.Mesh`, nearest-neighbor
reductions combined with `all_gather`/`psum`, the overlap gate as a ring pass
over movable-cloud shards (`ppermute`), and the whole ICP loop running SPMD
inside `shard_map`.
"""

from .mesh import make_mesh
from .multihost import initialize_multihost, process_info
from .sharded import icp_register_sharded

__all__ = [
    "icp_register_sharded",
    "initialize_multihost",
    "make_mesh",
    "process_info",
]
