"""On-chip probe: does the v5e MXU run s8 x s8 -> s32 dots at 2x bf16 rate
from pallas, and what does the W4A8 decode GEMV look like end-to-end?

The public v5e spec is 197 bf16 TFLOPs / 394.7 int8 TOPS — if Mosaic
lowers integer dots to the MXU's int8 mode, the decode weight-tile floor
halves, which is worth more than every remaining XLA-fusion trim combined
(docs/DECODE_PERF.md). If instead int8 dots are emulated (converted to
bf16/f32), the variant will measure AT or BELOW the bf16 baseline and the
W4A8 path is not worth building.

Variants (one jitted lax.scan of NITER serial kernel calls each, weights
re-streamed from HBM every iteration — same methodology as kernel_ab.py):
  bf16:   x bf16 (B, K) @ W bf16 (K, N)        — MXU bf16 baseline
  s8s32:  x s8   (B, K) @ W s8  (K, N) -> s32  — the int8 MXU question
  w4a8:   W int4 split-halves -> s8 unpack (int ops only), x s8, grouped
          s32 dots, per-(row, group, col-tile) f32 scale fold — the real
          decode kernel shape
Prints GB/s of weight bytes streamed + implied cycles/tile.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NITER = 96
B, K, N = 32, 4096, 14336
TN = 512
GROUP = 128


def _kern_bf16(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kern_s8(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _kern_w4a8(x_ref, q_ref, s_ref, xs_ref, o_ref):
    """x s8 (B, K); q int4 split-halves packed as s8 (K//2, TN) lo|hi<<4;
    s (K//GROUP, TN) f32 weight scales; xs (B, 1) f32 activation scales.
    Grouped s32 dots so the scale fold stays per (group, col)."""
    x = x_ref[...]
    q = q_ref[...]
    Kh = q.shape[0]
    lo = jnp.left_shift(q.astype(jnp.int32), 4)  # sign-extend low nibble
    lo = jnp.right_shift(lo, 4).astype(jnp.int8)
    hi = jnp.right_shift(q.astype(jnp.int32), 4).astype(jnp.int8)
    w = jnp.concatenate([lo, hi], axis=0)  # (K, TN) s8 — halves layout
    ng = (2 * Kh) // GROUP
    acc = jnp.zeros((x.shape[0], q.shape[1]), jnp.float32)
    for g in range(ng):
        pg = jax.lax.dot_general(
            x[:, g * GROUP : (g + 1) * GROUP],
            w[g * GROUP : (g + 1) * GROUP, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + pg.astype(jnp.float32) * s_ref[g, :][None, :]
    o_ref[...] = acc * xs_ref[...]


def _kern_w4a16(x_ref, q_ref, s_ref, o_ref):
    """Production-style comparator: same int4 packing, same grouping, but
    dequant to bf16 and bf16 MXU dots with the scale on the accumulator —
    the math of ops/pallas/matmul_quant.py in this harness's structure, so
    the w4a8 delta isolates (dot dtype + unpack arithmetic) alone."""
    x = x_ref[...]
    q = q_ref[...]
    lo = jnp.left_shift(q.astype(jnp.int32), 4)
    lo = jnp.right_shift(lo, 4)
    hi = jnp.right_shift(q.astype(jnp.int32), 4)
    w = jnp.concatenate([lo, hi], axis=0).astype(x.dtype)  # (K, TN) bf16
    ng = w.shape[0] // GROUP
    acc = jnp.zeros((x.shape[0], q.shape[1]), jnp.float32)
    for g in range(ng):
        pg = jax.lax.dot_general(
            x[:, g * GROUP : (g + 1) * GROUP],
            w[g * GROUP : (g + 1) * GROUP, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + pg * s_ref[g, :][None, :]
    o_ref[...] = acc


def _time(fn, carry_init, label, weight_bytes):
    stepped = jax.jit(
        lambda c: jax.lax.scan(lambda cc, _: (fn(cc), None), c, None, length=NITER)[0]
    )
    out = stepped(carry_init)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    t0 = time.perf_counter()
    out = stepped(carry_init)
    jax.tree.map(np.asarray, out)
    dt = time.perf_counter() - t0
    per_iter = dt / NITER
    tiles = K * N / 128 / 128
    cyc_per_tile = per_iter * 1.5e9 * 4 / tiles  # 4 MXUs
    print(json.dumps({
        "variant": label,
        "us_per_iter": round(per_iter * 1e6, 1),
        "weight_GBps": round(weight_bytes / per_iter / 1e9, 1),
        "cycles_per_tile_per_mxu": round(cyc_per_tile, 1),
    }))
    return per_iter


def main():
    rng = np.random.default_rng(0)
    grid = (N // TN,)

    xb = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    call_bf16 = pl.pallas_call(
        _kern_bf16, grid=grid,
        in_specs=[
            pl.BlockSpec((B, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )

    def step_bf16(x):
        o = call_bf16(x, wb)
        return (x + o[:, :K].astype(jnp.bfloat16) * 1e-6).astype(jnp.bfloat16)

    _time(step_bf16, xb, "bf16xbf16", K * N * 2)

    xs8 = jnp.asarray(rng.integers(-127, 127, (B, K)), jnp.int8)
    ws8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    call_s8 = pl.pallas_call(
        _kern_s8, grid=grid,
        in_specs=[
            pl.BlockSpec((B, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.int32),
    )

    def step_s8(x):
        o = call_s8(x, ws8)
        return jnp.clip(x.astype(jnp.int32) + o[:, :K] % 3 - 1, -127, 127).astype(jnp.int8)

    _time(step_s8, xs8, "s8xs8->s32", K * N)

    q4 = jnp.asarray(rng.integers(-128, 127, (K // 2, N)), jnp.int8)
    sw = jnp.asarray(rng.random((K // GROUP, N)) + 0.5, jnp.float32)
    xsc = jnp.asarray(rng.random((B, 1)) + 0.5, jnp.float32)
    call_w4a8 = pl.pallas_call(
        _kern_w4a8, grid=grid,
        in_specs=[
            pl.BlockSpec((B, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // GROUP, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda n: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )

    def step_w4a8(x):
        o = call_w4a8(x, q4, sw, xsc)
        return jnp.clip(
            x.astype(jnp.int32) + o[:, :K].astype(jnp.int32) % 3 - 1, -127, 127
        ).astype(jnp.int8)

    _time(step_w4a8, xs8, "w4a8-grouped", K * N // 2)

    call_w4a16 = pl.pallas_call(
        _kern_w4a16, grid=grid,
        in_specs=[
            pl.BlockSpec((B, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // GROUP, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )

    def step_w4a16(x):
        o = call_w4a16(x, q4, sw)
        return (x + o[:, :K].astype(jnp.bfloat16) * 1e-6).astype(jnp.bfloat16)

    _time(step_w4a16, xb, "w4a16-grouped (production math)", K * N // 2)

    # XLA comparator: the same bf16 GEMV WITHOUT pallas — measures what the
    # XLA matmul emitter gets from the MXUs for this shape. If this beats
    # the pallas bf16 kernel materially, Mosaic dots are not engaging the
    # MXUs the way XLA does and the kernel strategy must change.
    def step_xla(x):
        o = jax.lax.dot_general(
            x, wb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return (x + o[:, :K].astype(jnp.bfloat16) * 1e-6).astype(jnp.bfloat16)

    _time(step_xla, xb, "bf16xbf16-XLA-no-pallas", K * N * 2)

    # XLA int8 comparator: does the XLA emitter use the int8 MXU mode?
    def step_xla_s8(x):
        o = jax.lax.dot_general(
            x, ws8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return jnp.clip(x.astype(jnp.int32) + o[:, :K] % 3 - 1, -127, 127).astype(jnp.int8)

    _time(step_xla_s8, xs8, "s8xs8-XLA-no-pallas", K * N)


if __name__ == "__main__":
    sys.exit(main())
