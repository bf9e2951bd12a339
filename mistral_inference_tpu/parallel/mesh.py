"""Device-mesh construction for GSPMD sharding.

The reference's only parallelism is NCCL pipeline parallelism — explicit
P2P ``dist.send/recv`` of activations between layer slices
(reference: transformer.py:94-98,194-215). The TPU-native replacement is a
single-program, multi-device (SPMD) design: one jitted program partitioned
over a ``jax.sharding.Mesh`` whose collectives XLA inserts automatically.

Axes:
  * ``data``   — batch-parallel replication (reference has none; DP is a new
    capability for throughput serving).
  * ``seq``    — sequence (context) parallelism: prefill-chunk tokens are
    sharded over this axis (parallel/sharding.py seq_axis), splitting the
    quadratic attention and all per-token FLOPs of a long-prompt prefill
    across chips. Weights and the KV ring carry no ``seq`` axis in their
    specs, so they replicate over it; XLA all-gathers only the chunk's
    K/V per layer. Decode (T=1) and Mamba prefill (sequential recurrence)
    ignore the axis. The reference scales sequence only by window
    truncation (SURVEY §2.3).
  * ``expert`` — MoE expert parallelism (reference runs experts serially on
    one device, moe.py:29-31).
  * ``tensor`` — Megatron-style tensor parallelism over heads / FFN hidden
    (reference has none; replaces its pipeline parallelism as the intra-host
    strategy, riding ICI).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_SEQ = "seq"
AXIS_EXPERT = "expert"
AXIS_TENSOR = "tensor"
MESH_AXES = (AXIS_DATA, AXIS_SEQ, AXIS_EXPERT, AXIS_TENSOR)


def make_mesh(
    data: int = 1,
    expert: int = 1,
    tensor: int = 1,
    seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """4-D mesh over the given (or all) devices.

    Axis order is (data, seq, expert, tensor) — tensor innermost so TP
    collectives ride the fastest ICI links on real slices; seq next to data
    because both are outer, low-traffic axes.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = data * seq * expert * tensor
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    arr = np.asarray(devs[:n]).reshape(data, seq, expert, tensor)
    return Mesh(arr, MESH_AXES)


def auto_factorize(
    n_devices: int, n_kv_heads: int = 8, n_experts: int = 0
) -> Tuple[int, int, int]:
    """Pick a (data, expert, tensor) factorization of n_devices.

    Heuristic: tensor as large as divides n_kv_heads (TP shards KV heads),
    then expert up to n_experts, remainder to data.
    """
    tensor = math.gcd(n_devices, n_kv_heads)
    rem = n_devices // tensor
    expert = math.gcd(rem, n_experts) if n_experts else 1
    data = rem // expert
    return data, expert, tensor


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
