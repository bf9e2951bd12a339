"""Multi-host runtime initialization.

The reference detects torchrun env vars and opens a NCCL process group
(reference: main.py:36-38,110-115); every rank then runs different code
(pipeline stages, rank-0 I/O). The TPU-native equivalent is
``jax.distributed.initialize`` + one SPMD program: every host runs the same
code; meshes span all hosts' devices; XLA emits ICI/DCN collectives.

Call ``init_distributed()`` once at startup on every host of a pod slice
(it is a no-op on a single host or when already initialized). Then build a
mesh over ``jax.devices()`` (all hosts) as usual — parallel.mesh.make_mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host JAX runtime. Arguments default to the
    standard env vars (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
    or TPU pod metadata, which jax reads natively). Returns True when a
    multi-process runtime is active."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    in_pod = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    if explicit or in_pod:
        kw = {}
        if coordinator_address:
            kw["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kw["num_processes"] = num_processes
        if process_id is not None:
            kw["process_id"] = process_id
        jax.distributed.initialize(**kw)
    _initialized = True
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the host that should do I/O (logging, tokenization echo).
    Unlike the reference's rank-0 broadcast dance (main.py:161-170), no data
    needs broadcasting — all hosts compute identical programs."""
    return jax.process_index() == 0
