"""Multi-controller (multi-host) data movement helpers.

In a multi-process JAX runtime every host runs the same program, but a
host can only materialize the shards it addresses. The reference's
rank-0-broadcast torchrun dance (reference: main.py:161-170) maps to two
tiny primitives here:

  * ``to_global(x, mesh)`` — place identical host data as a REPLICATED
    global array over a (possibly multi-host) mesh. On a single controller
    this is just ``jnp.asarray``.
  * ``fetch(x)`` — bring a device array back as numpy on every host, even
    when its shards live on other hosts' devices (process_allgather).

The generation host loop only ever moves O(B) scalars per step through
these, so the DCN traffic they imply is negligible next to the program's
own collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def multi_controller() -> bool:
    try:
        return jax.process_count() > 1
    except RuntimeError:
        return False


def to_global(x, mesh: Optional[jax.sharding.Mesh]):
    """Host data (identical on every process) → device array usable as a
    jit input under ``mesh``. Replicated over the mesh when one is active;
    plain ``jnp.asarray`` otherwise."""
    if mesh is None or not multi_controller():
        return jnp.asarray(x)
    return jax.device_put(
        np.asarray(x),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )


def fetch(x) -> np.ndarray:
    """Device array → numpy on every host. Fully-addressable arrays (single
    controller, or replicated outputs) take the direct path; cross-host
    sharded arrays are allgathered into the global value."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
