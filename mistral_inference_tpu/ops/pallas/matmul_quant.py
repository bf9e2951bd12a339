"""Pallas fused dequant(INT8/INT4) + matmul.

The decode hot path is GEMV-shaped ``x (B, K) @ W (K, N)`` with B ≤ ~32 —
memory-bound on streaming W from HBM. Quantized weights already halve /
quarter the bytes (ops/linear.py); this kernel additionally guarantees the
dequantization happens in VMEM registers right before the MXU, never
materializing a bf16 copy of W in HBM, and lets the grid stream N-tiles
while x stays resident.

Layout contract == ops/linear.py: q int8 (K, N) or packed q4 (K/2, N), fp32
scales (n_groups, N) with group size g along K.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mistral_inference_tpu.ops.pallas.attention import _resolve_interpret


def _mm_kernel(x_ref, q_ref, s_ref, o_ref, *, bits: int, group: int):
    """Group-wise: acc += (x_g @ cast(q_g)) · scale_g.

    Folding the scale AFTER the group matmul moves the per-element scale
    multiply (K·TN VPU ops in fp32) to a per-group output scale (ng·B·TN) —
    the kernel becomes cast-bound instead of multiply-bound, roughly
    halving VPU work per weight byte. int8→bf16 cast is exact (≤ 7
    mantissa bits needed)."""
    _mm_body(x_ref[...], q_ref[...], s_ref[...], o_ref, bits=bits, group=group)


def _mm_body(x, q, scales, o_ref, *, bits: int, group: int):
    if bits == 4:
        # Split-halves packing (ops/linear.py): unpack is a concat along K —
        # no sublane interleave. Mosaic has no i8 vector shifts → i32 math.
        qi = q.astype(jnp.int32)
        hi = jnp.right_shift(qi, 4)  # arithmetic: high nibble sign-extends
        lo = jnp.right_shift(jnp.left_shift(qi, 28), 28)
        q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.int8)
    K, TN = q.shape
    ng = K // group
    B = x.shape[0]
    w = q.astype(x.dtype)  # exact cast, no scale multiply

    acc = jnp.zeros((B, TN), jnp.float32)
    for g in range(ng):
        pg = jax.lax.dot_general(
            x[:, g * group : (g + 1) * group],
            w[g * group : (g + 1) * group, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + pg * scales[g, :][None, :]
    o_ref[...] = acc.astype(o_ref.dtype)


def _mm_kernel_2d(x_ref, q_ref, s_ref, o_ref, *, group: int):
    """2D (N, K) grid variant (int8 only): K-tiles accumulate into the
    revisited output block — deeper DMA pipelining across both axes."""
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[...]  # (B, TK)
    q = q_ref[...]  # (TK, TN)
    TK, TN = q.shape
    ngl = TK // group
    w = q.astype(x.dtype)
    acc = jnp.zeros((x.shape[0], TN), jnp.float32)
    for g in range(ngl):
        pg = jax.lax.dot_general(
            x[:, g * group : (g + 1) * group],
            w[g * group : (g + 1) * group, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + pg * s_ref[g, :][None, :]
    o_ref[...] += acc


def _mm_kernel_2d_int4(
    xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, o_ref, *, group: int
):
    """2D (N, K-stored) grid for split-halves INT4: each program takes a
    (TK, TN) block of PACKED rows. Stored row r holds logical rows r (lo
    nibble) and r + K/2 (hi nibble), so the matching x rows come in as two
    separate half blocks and the group scales as two pre-sliced halves —
    no (2·TK, TN) concat buffer is ever materialized (the 1D kernel's
    concat is two extra VMEM copies per weight byte)."""
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    q = q_ref[...]  # (TK, TN) packed
    qi = q.astype(jnp.int32)
    hi = jnp.right_shift(qi, 4)
    lo = jnp.right_shift(jnp.left_shift(qi, 28), 28)
    TK, TN = q.shape
    B = xlo_ref.shape[0]
    acc = jnp.zeros((B, TN), jnp.float32)
    for x_ref, part, s_ref in ((xlo_ref, lo, slo_ref), (xhi_ref, hi, shi_ref)):
        x = x_ref[...]
        w = part.astype(x.dtype)
        for g in range(TK // group):
            pg = jax.lax.dot_general(
                x[:, g * group : (g + 1) * group],
                w[g * group : (g + 1) * group, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + pg * s_ref[g, :][None, :]
    o_ref[...] += acc


def _matmul_quant_2d_int4(x, q, scale, TN: int, TK: int, interpret: bool = None):
    B, K = x.shape
    N = q.shape[-1]
    rows = q.shape[0]  # K // 2
    ng = scale.shape[0]
    group = K // ng
    half = K // 2
    xspec = pl.BlockSpec((B, TK), lambda n, kk: (0, kk), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(
        (TK // group, TN), lambda n, kk: (kk, n), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_mm_kernel_2d_int4, group=group),
        grid=(N // TN, rows // TK),
        in_specs=[
            xspec,
            xspec,
            pl.BlockSpec((TK, TN), lambda n, kk: (kk, n), memory_space=pltpu.VMEM),
            sspec,
            sspec,
        ],
        out_specs=pl.BlockSpec((B, TN), lambda n, kk: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        interpret=_resolve_interpret(interpret),
    )(x[:, :half], x[:, half:], q, scale[: ng // 2], scale[ng // 2 :])
    return out.astype(x.dtype)


def _matmul_quant_2d(x, q, scale, TN: int, TK: int, interpret: bool = None):
    B, K = x.shape
    N = q.shape[-1]
    ng = scale.shape[0]
    group = K // ng
    out = pl.pallas_call(
        functools.partial(_mm_kernel_2d, group=group),
        interpret=_resolve_interpret(interpret),
        grid=(N // TN, K // TK),
        in_specs=[
            pl.BlockSpec((B, TK), lambda n, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN), lambda n, kk: (kk, n), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TK // group, TN), lambda n, kk: (kk, n), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda n, kk: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(x, q, scale)
    return out.astype(x.dtype)


def _mm_kernel_2d_stacked(li_ref, x_ref, q_ref, s_ref, o_ref, *, group: int):
    """Layer-stacked int8 2D kernel: blocks carry a leading (1,) layer dim
    selected by the prefetched scalar index (see matmul_quant_stacked)."""
    del li_ref  # consumed by the index maps
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[...]  # (B, TK)
    q = q_ref[0]  # (TK, TN)
    TK, TN = q.shape
    w = q.astype(x.dtype)
    acc = jnp.zeros((x.shape[0], TN), jnp.float32)
    for g in range(TK // group):
        pg = jax.lax.dot_general(
            x[:, g * group : (g + 1) * group],
            w[g * group : (g + 1) * group, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + pg * s_ref[0, g, :][None, :]
    o_ref[...] += acc


def _mm_kernel_2d_int4_stacked(
    li_ref, xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, o_ref, *, group: int
):
    del li_ref
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    q = q_ref[0]  # (TK, TN) packed
    qi = q.astype(jnp.int32)
    hi = jnp.right_shift(qi, 4)
    lo = jnp.right_shift(jnp.left_shift(qi, 28), 28)
    TK, TN = q.shape
    B = xlo_ref.shape[0]
    acc = jnp.zeros((B, TN), jnp.float32)
    for x_ref, part, s_ref in ((xlo_ref, lo, slo_ref), (xhi_ref, hi, shi_ref)):
        x = x_ref[...]
        w = part.astype(x.dtype)
        for g in range(TK // group):
            pg = jax.lax.dot_general(
                x[:, g * group : (g + 1) * group],
                w[g * group : (g + 1) * group, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + pg * s_ref[0, g, :][None, :]
    o_ref[...] += acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def matmul_quant_stacked(
    x: jax.Array,  # (B, K)
    q: jax.Array,  # (L, K, N) int8  |  (L, K/2, N) packed int4
    scale: jax.Array,  # (L, ng, N) fp32
    li: jax.Array,  # scalar int32 — layer index into the stack
    interpret: bool = None,
) -> jax.Array:
    """``x @ dequant(q[li])`` reading the layer's weights DIRECTLY from the
    (L, ...) stack via a prefetched scalar index.

    Why this exists: the layer loop is one ``lax.scan`` over stacked
    weights. Feeding the per-layer slice to a pallas call (weights in scan
    xs, or an explicit ``dynamic_index_in_dim``) materializes the slice —
    custom calls can't fuse dynamic-slices — which re-writes and re-reads
    EVERY weight byte each decode step (~3.5 GB/step extra HBM traffic at
    7B int4, measured as s8 dynamic-slice fusions in the step's HLO). With
    the index prefetched, the kernel's block DMAs address the stack in HBM
    directly and the copy disappears. Same trick as
    ops/pallas/attention.decode_attention on the KV ring."""
    B, K = x.shape
    L, rows, N = q.shape
    bits = 4 if rows * 2 == K else 8
    ng = scale.shape[1]
    group = K // ng
    li = jnp.asarray(li, jnp.int32).reshape((1,))

    if bits == 4 and rows % 1024 == 0 and N % 512 == 0:
        TN, TK = 512, 1024
        half = K // 2
        ngb = TK // group  # scale groups per TK block
        hi_off = (ng // 2) // ngb  # hi-half offset in blocks
        xspec = pl.BlockSpec((B, TK), lambda n, kk, li: (0, kk),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_mm_kernel_2d_int4_stacked, group=group),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(N // TN, rows // TK),
                in_specs=[
                    xspec,
                    xspec,
                    pl.BlockSpec((1, TK, TN), lambda n, kk, li: (li[0], kk, n),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, ngb, TN), lambda n, kk, li: (li[0], kk, n),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (1, ngb, TN),
                        lambda n, kk, li: (li[0], hi_off + kk, n),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec((B, TN), lambda n, kk, li: (0, n),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
            interpret=_resolve_interpret(interpret),
        )(li, x[:, :half], x[:, half:], q, scale, scale)
        return out.astype(x.dtype)

    if bits == 8 and K % 2048 == 0 and N % 512 == 0:
        TN, TK = 512, 2048
        ngb = TK // group
        out = pl.pallas_call(
            functools.partial(_mm_kernel_2d_stacked, group=group),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(N // TN, K // TK),
                in_specs=[
                    pl.BlockSpec((B, TK), lambda n, kk, li: (0, kk),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TK, TN), lambda n, kk, li: (li[0], kk, n),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, ngb, TN), lambda n, kk, li: (li[0], kk, n),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, TN), lambda n, kk, li: (0, n),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
            interpret=_resolve_interpret(interpret),
        )(li, x, q, scale)
        return out.astype(x.dtype)

    # General fallback: 1D N-grid, whole-K weight blocks from the stack.
    def kernel(li_ref, x_ref, q_ref, s_ref, o_ref):
        del li_ref
        _mm_body(x_ref[...], q_ref[0], s_ref[0], o_ref, bits=bits, group=group)

    TN = next(
        t for t in (1024, 512, 256, 128)
        if N % t == 0 and rows * t <= 4 * 1024 * 1024
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // TN,),
            in_specs=[
                pl.BlockSpec((B, K), lambda n, li: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, TN), lambda n, li: (li[0], 0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ng, TN), lambda n, li: (li[0], 0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, TN), lambda n, li: (0, n),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        interpret=_resolve_interpret(interpret),
    )(li, x, q, scale)
    return out.astype(x.dtype)


import os

# Default ON since r2: full-model A/B (7B int4 B=32) measured 1509 (1D) vs
# 1572 tok/s (2D). Set MISTRAL_MM2D=0 to fall back to the 1D N-grid.
_MM2D = os.environ.get("MISTRAL_MM2D", "1") == "1"


@functools.partial(jax.jit, static_argnames=("interpret",))
def matmul_quant(
    x: jax.Array,  # (B, K)
    q: jax.Array,  # (K, N) int8  |  (K/2, N) packed int4
    scale: jax.Array,  # (ng, N) fp32
    interpret: bool = None,
) -> jax.Array:
    B, K = x.shape
    N = q.shape[-1]
    bits = 4 if q.shape[0] * 2 == K else 8
    if _MM2D and bits == 8 and K % 2048 == 0 and N % 512 == 0:
        return _matmul_quant_2d(x, q, scale, TN=512, TK=2048)
    if _MM2D and bits == 4 and q.shape[0] % 1024 == 0 and N % 512 == 0:
        return _matmul_quant_2d_int4(x, q, scale, TN=512, TK=1024)
    ng = scale.shape[0]
    group = K // ng

    # Largest tile whose double-buffered weight block fits VMEM comfortably
    # (stored rows × TN bytes ≤ 4MB leaves room for x, scales, output, and
    # pipelining; int4 stores K/2 rows, so its tiles can be twice as wide).
    rows_stored = q.shape[0]
    TN = next(
        t
        for t in (1024, 512, 256, 128)
        if N % t == 0 and rows_stored * t <= 4 * 1024 * 1024
    )
    assert N % TN == 0, (N, TN)

    out = pl.pallas_call(
        functools.partial(_mm_kernel, bits=bits, group=group),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((B, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (q.shape[0], TN), lambda n: (0, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((ng, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        interpret=_resolve_interpret(interpret),
    )(x, q, scale)
    return out.astype(x.dtype)
