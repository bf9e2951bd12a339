"""Pallas grouped (per-expert) fused dequant(INT8/INT4) + matmul for MoE.

Decode-path MoE must stream each live expert's QUANTIZED weights exactly
once per step (VERDICT r1 #2). The XLA path (`dequant` + einsum over all E,
models/transformer.py::_moe_ffn_dispatch) materializes a full bf16 copy of
every expert's weights in HBM — 2x the bytes of int8 written *and* read
back, 4x for int4. This kernel dequantizes per-tile in VMEM next to the MXU
instead: grid (E, N/TN), program (e, n) streams expert e's (K, TN) int tile
and computes buf[e] (C, K) @ W[e][:, tile] with grouped scales.

Layout contract matches ops/linear.py stacked leaves:
    q int8 (E, K, N) or packed q4 (E, K/2, N), scale fp32 (E, ng, N),
    activations (E, C, K) per-expert dispatch buffers (C = capacity).

Reference for behavior: /root/reference/src/mistral_inference/moe.py:16-32
(per-expert loop over only assigned tokens).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mistral_inference_tpu.ops.pallas.attention import _resolve_interpret


def _kernel(x_ref, q_ref, s_ref, o_ref, *, bits: int, group: int):
    x = x_ref[0]  # (C, K)
    q = q_ref[0]  # (K, TN) int8 | (K/2, TN) packed int4
    if bits == 4:
        qi = q.astype(jnp.int32)
        hi = jnp.right_shift(qi, 4)
        lo = jnp.right_shift(jnp.left_shift(qi, 28), 28)
        q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.int8)
    K, TN = q.shape
    ng = K // group
    w = q.astype(x.dtype)
    scales = s_ref[0]  # (ng, TN)
    acc = jnp.zeros((x.shape[0], TN), jnp.float32)
    for g in range(ng):
        pg = jax.lax.dot_general(
            x[:, g * group : (g + 1) * group],
            w[g * group : (g + 1) * group, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + pg * scales[g, :][None, :]
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def moe_matmul_quant(
    x: jax.Array,  # (E, C, K) per-expert activation buffers
    q: jax.Array,  # (E, K, N) int8 | (E, K/2, N) packed int4
    scale: jax.Array,  # (E, ng, N) fp32
    interpret: bool = None,
) -> jax.Array:  # (E, C, N) fp32
    E, C, K = x.shape
    N = q.shape[-1]
    bits = 4 if q.shape[-2] * 2 == K else 8
    ng = scale.shape[-2]
    group = K // ng
    rows_stored = q.shape[-2]
    TN = next(
        t
        for t in (1024, 512, 256, 128)
        if N % t == 0 and rows_stored * t <= 4 * 1024 * 1024
    )

    out = pl.pallas_call(
        functools.partial(_kernel, bits=bits, group=group),
        grid=(E, N // TN),
        in_specs=[
            pl.BlockSpec((1, C, K), lambda e, n: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, rows_stored, TN), lambda e, n: (e, 0, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, ng, TN), lambda e, n: (e, 0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, C, TN), lambda e, n: (e, 0, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((E, C, N), jnp.float32),
        interpret=_resolve_interpret(interpret),
    )(x, q, scale)
    return out.astype(x.dtype)


class _Squeeze:
    """Adapter presenting a (1, 1, ...) block ref as the (1, ...) ref
    _kernel expects (its ``ref[0]`` reads drop one more leading unit dim)."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        return self._ref[0][idx]

    @property
    def shape(self):
        return self._ref.shape[1:]


def _kernel_stacked(li_ref, x_ref, q_ref, s_ref, o_ref, *, bits: int, group: int):
    del li_ref  # consumed by the index maps
    _kernel(x_ref, _Squeeze(q_ref), _Squeeze(s_ref), o_ref, bits=bits, group=group)


@functools.partial(jax.jit, static_argnames=("interpret",))
def moe_matmul_quant_stacked(
    x: jax.Array,  # (E, C, K) per-expert activation buffers (this layer)
    q: jax.Array,  # (L, E, K, N) int8 | (L, E, K/2, N) packed int4
    scale: jax.Array,  # (L, E, ng, N) fp32
    li: jax.Array,  # scalar int32 — layer index into the stack
    interpret: bool = None,
) -> jax.Array:  # (E, C, N) fp32
    """Layer-stacked grouped expert matmul: indexes the (L, E, ...) expert
    weight stack with a prefetched scalar layer index, so the scan body
    never materializes a per-layer (E, K, N) slice copy (for Mixtral that
    slice is ~350 MB int4 of w1+w2+w3 per layer per step — the same
    custom-calls-can't-fuse-dynamic-slices cost matmul_quant_stacked kills
    on the dense path)."""
    E, C, K = x.shape
    L = q.shape[0]
    N = q.shape[-1]
    bits = 4 if q.shape[-2] * 2 == K else 8
    ng = scale.shape[-2]
    group = K // ng
    rows_stored = q.shape[-2]
    TN = next(
        t
        for t in (1024, 512, 256, 128)
        if N % t == 0 and rows_stored * t <= 4 * 1024 * 1024
    )
    li = jnp.asarray(li, jnp.int32).reshape((1,))

    out = pl.pallas_call(
        functools.partial(_kernel_stacked, bits=bits, group=group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(E, N // TN),
            in_specs=[
                pl.BlockSpec((1, C, K), lambda e, n, li: (e, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, rows_stored, TN),
                    lambda e, n, li: (li[0], e, 0, n),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, ng, TN),
                    lambda e, n, li: (li[0], e, 0, n),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, C, TN), lambda e, n, li: (e, 0, n), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((E, C, N), jnp.float32),
        interpret=_resolve_interpret(interpret),
    )(li, x, q, scale)
    return out.astype(x.dtype)
