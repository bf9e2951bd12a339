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


def _kernel_ragged(tg_ref, x_ref, q_ref, s_ref, o_ref, *, bits: int, group: int):
    """Sorted-grouped (megablox-style) tile: x block (TM, K) vs the expert
    tile the PREFETCHED per-M-tile group index selected in the BlockSpec
    index maps. Same grouped-dequant dot as _kernel."""
    del tg_ref  # consumed by the index maps
    x = x_ref[...]  # (TM, K)
    q = q_ref[0]  # (K|K/2, TN)
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
    o_ref[...] = acc.astype(o_ref.dtype)


def _kernel_ragged_stacked(li_ref, tg_ref, x_ref, q_ref, s_ref, o_ref, *,
                           bits: int, group: int):
    del li_ref
    _kernel_ragged(tg_ref, x_ref, _Squeeze(q_ref), _Squeeze(s_ref), o_ref,
                   bits=bits, group=group)


@functools.partial(jax.jit, static_argnames=("interpret",))
def moe_matmul_quant_ragged(
    x: jax.Array,  # (Mp, K) expert-SORTED rows, groups padded to TM tiles
    q: jax.Array,  # (E, K, N) int8 | (E, K/2, N) int4 — or (L, E, ...) + li
    scale: jax.Array,  # (E, ng, N) fp32 — or (L, E, ng, N)
    tile_group: jax.Array,  # (Mp/TM,) int32 expert id of each M-tile
    li: jax.Array = None,  # () int32 layer index for stacked leaves
    interpret: bool = None,
) -> jax.Array:  # (Mp, N) in x.dtype
    """Drop-free PREFILL-scale grouped expert matmul (r5, VERDICT r4 #1).

    The decode kernels above stage the whole (C, K) buffer per expert —
    fine at decode capacities (C tens), impossible at prefill (C
    thousands). Here the sorted-by-expert rows are tiled (TM, K) like a
    plain GEMM and each M-tile's weight tile is selected by a prefetched
    per-tile expert index (the megablox convention — the same
    scalar-prefetch trick matmul_quant_stacked uses for layers). INT
    weights stream from HBM with NO bf16 materialization — the XLA
    dequant einsum alternative costs ~13-25 ms/layer of pure dequant at
    Mixtral prefill shapes (benchmarks/results/moe_prefill_decomp_r5.log).
    Group padding is the caller's job (transformer._moe_ffn_ragged):
    pad rows compute garbage that the caller's gather-back discards.
    """
    Mp, K = x.shape
    n_tiles = tile_group.shape[0]
    TM = Mp // n_tiles
    assert TM * n_tiles == Mp, (Mp, n_tiles)
    N = scale.shape[-1]
    rows_stored = q.shape[-2]
    bits = 4 if rows_stored * 2 == K else 8
    ng = scale.shape[-2]
    group = K // ng
    TN = next(
        t
        for t in (1024, 512, 256, 128)
        if N % t == 0 and rows_stored * t <= 4 * 1024 * 1024
    )
    tile_group = tile_group.astype(jnp.int32)

    if li is None:
        out = pl.pallas_call(
            functools.partial(_kernel_ragged, bits=bits, group=group),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles, N // TN),
                in_specs=[
                    pl.BlockSpec((TM, K), lambda m, n, tg: (m, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (1, rows_stored, TN),
                        lambda m, n, tg: (tg[m], 0, n),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, ng, TN),
                        lambda m, n, tg: (tg[m], 0, n),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec((TM, TN), lambda m, n, tg: (m, n),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_resolve_interpret(interpret),
        )(tile_group, x, q, scale)
        return out.astype(x.dtype)

    li = jnp.asarray(li, jnp.int32).reshape((1,))
    out = pl.pallas_call(
        functools.partial(_kernel_ragged_stacked, bits=bits, group=group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles, N // TN),
            in_specs=[
                pl.BlockSpec((TM, K), lambda m, n, li, tg: (m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, rows_stored, TN),
                    lambda m, n, li, tg: (li[0], tg[m], 0, n),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, ng, TN),
                    lambda m, n, li, tg: (li[0], tg[m], 0, n),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda m, n, li, tg: (m, n),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_resolve_interpret(interpret),
    )(li, tile_group, x, q, scale)
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
