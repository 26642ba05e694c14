"""Multi-host initialization.

On a multi-host TPU pod slice each host runs the same program; JAX needs a
one-time distributed handshake so `jax.devices()` spans the whole slice and
the `points` mesh axis covers every chip. After `initialize_multihost`, the
existing single-controller code (`make_mesh()` + `icp_register_sharded`)
works unchanged: XLA routes the pipeline's collectives (`ppermute` ring
gate, `all_gather` NN merges, `psum` reductions) over ICI within a slice and
DCN across slices.

Host-local data loading: each host should read/generate only its own point
shard and `jax.make_array_from_process_local_data` them onto the global
mesh; `icp_register_sharded` also accepts already-global arrays.

The reference has no multi-process concept of any kind; fail-fast on host
loss is acceptable (SURVEY.md §5 — no elasticity required).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """One-time jax.distributed handshake (no-op if already initialized).

    With no arguments, relies on the TPU environment's auto-detection
    (GKE/TPU-VM metadata). Pass explicit values for bare-metal clusters.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized: keep going
        if "already initialized" not in str(e):
            raise


def process_info() -> tuple[int, int]:
    """(process_index, process_count) of this host."""
    return jax.process_index(), jax.process_count()
