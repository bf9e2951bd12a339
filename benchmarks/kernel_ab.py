"""On-chip A/B microbench for the fused dequant-matmul kernel variants.

Goal (VERDICT r1 #1): find where the decode GEMV loses HBM bandwidth.
Each variant streams the same quantized weight bytes; we measure effective
GB/s of weight traffic. A no-MXU "stream" kernel per layout bounds what the
DMA engine can deliver for that block shape, separating DMA-limited from
MXU-limited regimes.

Methodology (memory: axon tunnel, 28ms RTT): every measurement is ONE jitted
lax.scan of NITER kernel calls with a serial dependency through the carry so
iterations can't be hoisted/CSE'd; weights re-stream from HBM every
iteration. Times are wall-clock around a final np.asarray fetch. Within-run
rankings are meaningful; absolute numbers are ±noise.

Usage:  python benchmarks/kernel_ab.py [stage1|stage2|batch]
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

NITER = 192


# ---------------------------------------------------------------------------
# Variant kernels. All compute out = x (B,K) @ W (K,N) with grouped int8
# dequant; layouts differ in how W is stored/streamed.
# ---------------------------------------------------------------------------


def _kern_1d_group(x_ref, q_ref, s_ref, o_ref, *, group):
    """Current production kernel: 1D grid over N-tiles, per-group dots."""
    x = x_ref[...]
    q = q_ref[...]
    K, TN = q.shape
    ng = K // group
    w = q.astype(x.dtype)
    acc = jnp.zeros((x.shape[0], TN), jnp.float32)
    for g in range(ng):
        pg = jax.lax.dot_general(
            x[:, g * group : (g + 1) * group],
            w[g * group : (g + 1) * group, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + pg * s_ref[g, :][None, :]
    o_ref[...] = acc


def run_1d_group(x, q, s, TN):
    B, K = x.shape
    N = q.shape[1]
    ng = s.shape[0]
    return pl.pallas_call(
        functools.partial(_kern_1d_group, group=K // ng),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((B, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(x, q, s)


def _kern_prescale(x_ref, q_ref, s_ref, o_ref, *, group):
    """Scale W in VPU (K·TN multiplies) then ONE full-K dot."""
    x = x_ref[...]
    q = q_ref[...]
    K, TN = q.shape
    ng = K // group
    w = q.astype(jnp.float32).reshape(ng, group, TN) * s_ref[...][:, None, :]
    w = w.reshape(K, TN).astype(x.dtype)
    o_ref[...] = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def run_prescale(x, q, s, TN):
    B, K = x.shape
    N = q.shape[1]
    ng = s.shape[0]
    return pl.pallas_call(
        functools.partial(_kern_prescale, group=K // ng),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((B, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(x, q, s)


def _kern_tr(xt_ref, qt_ref, st_ref, o_ref, *, group):
    """Transposed layout: W stored (N, K) so each (TN, K) block is TN fully
    contiguous HBM rows. Compute out^T (TN, B) = Wt @ x^T — a standard
    (M,K)@(K,B) matmul, no in-kernel transposes."""
    qt = qt_ref[...]  # (TN, K)
    TN, K = qt.shape
    ng = K // group
    w = qt.astype(jnp.bfloat16)
    xt = xt_ref[...]  # (K, B)
    acc = jnp.zeros((TN, xt.shape[1]), jnp.float32)
    for g in range(ng):
        pg = jax.lax.dot_general(
            w[:, g * group : (g + 1) * group],
            xt[g * group : (g + 1) * group, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + pg * st_ref[:, g][:, None]
    o_ref[...] = acc


def run_tr(xt, qt, st, TN):
    K, B = xt.shape
    N = qt.shape[0]
    ng = st.shape[1]
    return pl.pallas_call(
        functools.partial(_kern_tr, group=K // ng),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((K, B), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, K), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, ng), lambda n: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, B), lambda n: (n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
    )(xt, qt, st)


def _kern_tr2d(xt_ref, qt_ref, st_ref, o_ref, *, group):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    qt = qt_ref[...]  # (TN, TK)
    TN, TK = qt.shape
    ngl = TK // group
    w = qt.astype(jnp.bfloat16)
    xt = xt_ref[...]  # (TK, B)
    acc = jnp.zeros((TN, xt.shape[1]), jnp.float32)
    for g in range(ngl):
        pg = jax.lax.dot_general(
            w[:, g * group : (g + 1) * group],
            xt[g * group : (g + 1) * group, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + pg * st_ref[:, g][:, None]
    o_ref[...] += acc


def run_tr2d(xt, qt, st, TN, TK):
    K, B = xt.shape
    N = qt.shape[0]
    ng = st.shape[1]
    group = K // ng
    return pl.pallas_call(
        functools.partial(_kern_tr2d, group=group),
        grid=(N // TN, K // TK),
        in_specs=[
            pl.BlockSpec((TK, B), lambda n, kk: (kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TK), lambda n, kk: (n, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TN, TK // group), lambda n, kk: (n, kk), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((TN, B), lambda n, kk: (n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(xt, qt, st)


def _kern_2d(x_ref, q_ref, s_ref, o_ref, *, group):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[...]
    q = q_ref[...]
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


def run_2d(x, q, s, TN, TK):
    B, K = x.shape
    N = q.shape[1]
    ng = s.shape[0]
    group = K // ng
    return pl.pallas_call(
        functools.partial(_kern_2d, group=group),
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(x, q, s)


def _kern_bdot(x_ref, q_ref, s_ref, o_ref, *, group):
    """ALL groups in ONE batched dot_general: (ng,B,g)@(ng,g,TN)->(ng,B,TN),
    then scale-weighted sum over ng on the VPU. One MXU instruction stream
    amortizes pipeline latency that ng separate small dots pay per group."""
    x = x_ref[...]  # (B, K)
    q = q_ref[...]  # (K, TN)
    K, TN = q.shape
    ng = K // group
    B = x.shape[0]
    w = q.astype(x.dtype).reshape(ng, group, TN)
    xg = x.reshape(B, ng, group).transpose(1, 0, 2)  # (ng, B, group)
    pg = jax.lax.dot_general(
        xg, w, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (ng, B, TN)
    o_ref[...] = jnp.sum(pg * s_ref[...][:, None, :], axis=0)


def run_bdot(x, q, s, TN):
    B, K = x.shape
    N = q.shape[1]
    ng = s.shape[0]
    return pl.pallas_call(
        functools.partial(_kern_bdot, group=K // ng),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((B, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(x, q, s)


def _kern_lazycast(x_ref, q_ref, s_ref, o_ref, *, group):
    """Per-group cast INSIDE the dot loop: the bf16 copy of the weight block
    never exceeds (group, TN) in VMEM, leaving room to double-buffer the
    int8 tile DMA (VMEM is ~16MB/core; a whole-block cast of a (4096,1024)
    tile is 8MB and serializes DMA with compute)."""
    x = x_ref[...]
    K, TN = q_ref.shape
    ng = K // group
    acc = jnp.zeros((x.shape[0], TN), jnp.float32)
    for g in range(ng):
        wg = q_ref[g * group : (g + 1) * group, :].astype(x.dtype)
        pg = jax.lax.dot_general(
            x[:, g * group : (g + 1) * group],
            wg,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + pg * s_ref[g, :][None, :]
    o_ref[...] = acc


def run_lazycast(x, q, s, TN):
    B, K = x.shape
    N = q.shape[1]
    ng = s.shape[0]
    return pl.pallas_call(
        functools.partial(_kern_lazycast, group=K // ng),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((B, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(x, q, s)


def _kern_bdot2d(x_ref, q_ref, s_ref, o_ref, *, group):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[...]  # (B, TK)
    q = q_ref[...]  # (TK, TN)
    TK, TN = q.shape
    ngl = TK // group
    B = x.shape[0]
    w = q.astype(x.dtype).reshape(ngl, group, TN)
    xg = x.reshape(B, ngl, group).transpose(1, 0, 2)
    pg = jax.lax.dot_general(
        xg, w, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[...] += jnp.sum(pg * s_ref[...][:, None, :], axis=0)


def run_bdot2d(x, q, s, TN, TK):
    B, K = x.shape
    N = q.shape[1]
    ng = s.shape[0]
    group = K // ng
    return pl.pallas_call(
        functools.partial(_kern_bdot2d, group=group),
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(x, q, s)


# -- pure streaming (no MXU): bounds DMA rate per layout --------------------


def _kern_stream(q_ref, o_ref):
    o_ref[...] = jnp.zeros((1, 128), jnp.float32) + jnp.sum(
        q_ref[...].astype(jnp.float32)
    )


def run_stream_kn(q, TN):
    """Stream (K, TN) strided blocks of a (K, N) array."""
    K, N = q.shape
    return pl.pallas_call(
        _kern_stream,
        grid=(N // TN,),
        in_specs=[pl.BlockSpec((K, TN), lambda n: (0, n), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda n: (n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // TN, 128), jnp.float32),
    )(q)


def run_stream_nk(qt, TN):
    """Stream (TN, K) contiguous blocks of an (N, K) array."""
    N, K = qt.shape
    return pl.pallas_call(
        _kern_stream,
        grid=(N // TN,),
        in_specs=[pl.BlockSpec((TN, K), lambda n: (n, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda n: (n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // TN, 128), jnp.float32),
    )(qt)


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------


def timed_loop(fn_weights_only, x0, n_iter=NITER):
    """One jitted scan of n_iter calls with a serial carry dependency."""

    @jax.jit
    def loop(x0):
        def body(c, _):
            x = x0 + (c * jnp.asarray(1e-9, x0.dtype)).astype(x0.dtype)
            o = fn_weights_only(x)
            return o.reshape(-1)[0].astype(x0.dtype) * 0, None

        c, _ = jax.lax.scan(body, jnp.asarray(0, x0.dtype), None, length=n_iter)
        return c

    r = loop(x0)
    np.asarray(r)  # compile+first run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(x0))
        best = min(best, time.perf_counter() - t0)
    return best / n_iter


def measure(name, fn, x0, weight_bytes, results, n_iter=NITER):
    try:
        dt = timed_loop(fn, x0, n_iter=n_iter)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)
        return
    gbps = weight_bytes / dt / 1e9
    results[name] = gbps
    print(
        json.dumps({"variant": name, "gbps": round(gbps, 1), "us": round(dt * 1e6, 1)}),
        flush=True,
    )


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "stage1"
    B, K, N, G = 32, 4096, 14336, 128
    ng = K // G
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)
    xt = jnp.asarray(np.asarray(x).T)
    q = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    qt = jnp.asarray(np.asarray(q).T)
    s = jnp.full((ng, N), 0.01, jnp.float32)
    st = jnp.asarray(np.asarray(s).T)
    WB = K * N  # int8 bytes
    results = {}

    if stage == "stage1":
        measure("stream_kn_tn512", lambda xx: run_stream_kn(q, 512) + xx[0, 0], x, WB, results)
        measure("stream_nk_tn256", lambda xx: run_stream_nk(qt, 256) + xx[0, 0], x, WB, results)
        measure("cur1d_tn512", lambda xx: run_1d_group(xx, q, s, 512), x, WB, results)
        measure("cur1d_tn1024", lambda xx: run_1d_group(xx, q, s, 1024), x, WB, results)
        measure("prescale_tn512", lambda xx: run_prescale(xx, q, s, 512), x, WB, results)
        measure("tr_tn256", lambda xx: run_tr(xx, qt, st, 256), xt, WB, results)
        measure("tr_tn512", lambda xx: run_tr(xx, qt, st, 512), xt, WB, results)
        measure("tr2d_tn512_tk2048", lambda xx: run_tr2d(xx, qt, st, 512, 2048), xt, WB, results)
        measure("2d_tn512_tk2048", lambda xx: run_2d(xx, q, s, 512, 2048), x, WB, results)
    elif stage == "stage2":
        # Hypotheses after stage1 (all matmul variants ~220-270 GB/s):
        # (a) single-stream DMA cap → split weights into 2/4 operands
        # (b) per-block throughput cap → bigger tiles (raised vmem limit)
        # (c) cast/dequant VPU cost → dot with no scales at all
        # (d) HBM sanity → raw XLA int8 copy
        measure("stream_kn_tn512", lambda xx: run_stream_kn(q, 512) + xx[0, 0], x, WB, results)
        measure("stream_nk_tn256", lambda xx: run_stream_nk(qt, 256) + xx[0, 0], x, WB, results)
        q2a, q2b = q[: K // 2], q[K // 2 :]
        s2a, s2b = s[: ng // 2], s[ng // 2 :]
        measure(
            "split2_tn512",
            lambda xx: run_1d_group(xx[:, : K // 2], q2a, s2a, 512)
            + run_1d_group(xx[:, K // 2 :], q2b, s2b, 512),
            x, WB, results,
        )
        q4 = [q[i * K // 4 : (i + 1) * K // 4] for i in range(4)]
        s4 = [s[i * ng // 4 : (i + 1) * ng // 4] for i in range(4)]
        def run_split4(xx):
            o = run_1d_group(xx[:, : K // 4], q4[0], s4[0], 512)
            for i in range(1, 4):
                o = o + run_1d_group(
                    xx[:, i * K // 4 : (i + 1) * K // 4], q4[i], s4[i], 512
                )
            return o
        measure("split4_tn512", run_split4, x, WB, results)
        measure("big_tn2048", lambda xx: run_1d_group(xx, q, s, 2048), x, WB, results)
        def run_nodeq(xx):
            def kern(x_ref, q_ref, o_ref):
                o_ref[...] = jax.lax.dot_general(
                    x_ref[...], q_ref[...].astype(x_ref.dtype),
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
            return pl.pallas_call(
                kern,
                grid=(N // 512,),
                in_specs=[
                    pl.BlockSpec((B, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, 512), lambda n: (0, n), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, 512), lambda n: (0, n), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
            )(xx, q)
        measure("nodeq_tn512", run_nodeq, x, WB, results)
        measure("rawsum_xla", lambda xx: jnp.sum(q.astype(jnp.float32) * xx[0, 0]).reshape(1), x, WB, results)
    elif stage == "stage3":
        # New hypotheses: (a) ng small per-group dots pay MXU pipeline
        # latency per dot → one batched dot (bdot); (b) whole-block bf16
        # cast bloats VMEM and serializes DMA → lazy per-group cast; plus
        # the DMA-only stream bound that errored in stage1.
        measure("stream_kn_tn512", lambda xx: run_stream_kn(q, 512) + xx[0, 0], x, WB, results)
        measure("stream_nk_tn512", lambda xx: run_stream_nk(qt, 512) + xx[0, 0], x, WB, results)
        measure("cur1d_tn512", lambda xx: run_1d_group(xx, q, s, 512), x, WB, results)
        measure("bdot_tn512", lambda xx: run_bdot(xx, q, s, 512), x, WB, results)
        measure("bdot_tn1024", lambda xx: run_bdot(xx, q, s, 1024), x, WB, results)
        measure("lazycast_tn512", lambda xx: run_lazycast(xx, q, s, 512), x, WB, results)
        measure("lazycast_tn1024", lambda xx: run_lazycast(xx, q, s, 1024), x, WB, results)
        measure("bdot2d_tn512_tk1024", lambda xx: run_bdot2d(xx, q, s, 512, 1024), x, WB, results)
        measure("rawsum_xla", lambda xx: jnp.sum(q.astype(jnp.float32) * xx[0, 0]).reshape(1), x, WB, results)
    elif stage == "stage4":
        # stage3: EVERY variant incl. XLA's own int8 rawsum lands ~255 GB/s.
        # Either (a) int8 convert is VPU-bound at ~255 GB/s, or (b) this
        # chip's effective HBM rate is ~255. Decide: stream f32/bf16 (no
        # convert needed for sum), HBM->HBM copy, bf16-weight matmul (no
        # cast), fp8-weight dequant matmul (float->float cast).
        f32arr = jnp.asarray(rng.standard_normal((K, N // 4)), jnp.float32)
        bf16arr = jnp.asarray(rng.standard_normal((K, N // 2)), jnp.bfloat16)
        measure("rawsum_f32", lambda xx: jnp.sum(f32arr * xx[0, 0].astype(jnp.float32)).reshape(1), x, WB, results)
        measure("rawsum_bf16", lambda xx: jnp.sum((bf16arr * xx[0, 0]).astype(jnp.float32)).reshape(1), x, WB, results)
        measure("rawsum_int8", lambda xx: jnp.sum(q.astype(jnp.float32) * xx[0, 0]).reshape(1), x, WB, results)
        # HBM->HBM copy: report read+write bytes.
        measure("copy_f32", lambda xx: (f32arr + xx[0, 0].astype(jnp.float32)).reshape(-1)[:1], x, 2 * WB, results)
        wb16 = jnp.asarray(rng.standard_normal((K, N // 2)), jnp.bfloat16)
        def run_bf16_plain(xx):
            def kern(x_ref, w_ref, o_ref):
                o_ref[...] = jax.lax.dot_general(
                    x_ref[...], w_ref[...],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
            return pl.pallas_call(
                kern,
                grid=(N // 2 // 512,),
                in_specs=[
                    pl.BlockSpec((B, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, 512), lambda n: (0, n), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, 512), lambda n: (0, n), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, N // 2), jnp.float32),
            )(xx, wb16)
        measure("bf16_matmul_tn512", run_bf16_plain, x, WB, results)  # same bytes: N/2 cols x 2B
        qf8 = q.astype(jnp.float8_e4m3fn)
        def run_fp8_deq(xx):
            def kern(x_ref, q_ref, s_ref, o_ref, *, group):
                xl = x_ref[...]
                Kl, TN = q_ref.shape
                ngl = Kl // group
                w = q_ref[...].astype(xl.dtype)
                acc = jnp.zeros((xl.shape[0], TN), jnp.float32)
                for g in range(ngl):
                    pg = jax.lax.dot_general(
                        xl[:, g * group : (g + 1) * group],
                        w[g * group : (g + 1) * group, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = acc + pg * s_ref[g, :][None, :]
                o_ref[...] = acc
            return pl.pallas_call(
                functools.partial(kern, group=G),
                grid=(N // 512,),
                in_specs=[
                    pl.BlockSpec((B, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, 512), lambda n: (0, n), memory_space=pltpu.VMEM),
                    pl.BlockSpec((ng, 512), lambda n: (0, n), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, 512), lambda n: (0, n), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
            )(xx, qf8, s)
        measure("fp8_deq_tn512", run_fp8_deq, x, WB, results)
        def run_nodeq(xx):
            def kern(x_ref, q_ref, o_ref):
                o_ref[...] = jax.lax.dot_general(
                    x_ref[...], q_ref[...].astype(x_ref.dtype),
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
            return pl.pallas_call(
                kern,
                grid=(N // 512,),
                in_specs=[
                    pl.BlockSpec((B, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, 512), lambda n: (0, n), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, 512), lambda n: (0, n), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
            )(xx, q)
        measure("int8_nodeq_tn512", run_nodeq, x, WB, results)
    elif stage == "stage5":
        # Size sweep: distinguishes a true ~255 GB/s bandwidth ceiling from a
        # fixed per-iteration overhead masquerading as one. If GB/s is flat
        # across 14MB→896MB the cap is real; if it climbs with size the small
        # arrays were overhead-dominated. Arrays are built on-device (jitted
        # iota math) so nothing ships through the tunnel.
        for mb in (14, 56, 224, 896):
            n_el = mb * 1024 * 1024 // 4
            arr = jax.jit(
                lambda n=n_el: (jnp.arange(n, dtype=jnp.float32) * 1e-9).reshape(
                    n // 1024, 1024
                )
            )()
            np.asarray(arr[0, 0])
            n_iter = max(8, min(96, int(96 * 56 / mb)))
            measure(
                f"rawsum_f32_{mb}mb",
                lambda xx, a=arr: jnp.sum(a * xx[0, 0].astype(jnp.float32)).reshape(1),
                x,
                mb * 1024 * 1024,
                results,
                n_iter=n_iter,
            )
            del arr
        # HBM->HBM copy at one mid size (read+write bytes)
        n_el = 224 * 1024 * 1024 // 4
        arr = jax.jit(
            lambda n=n_el: (jnp.arange(n, dtype=jnp.float32) * 1e-9).reshape(
                n // 1024, 1024
            )
        )()
        np.asarray(arr[0, 0])
        # optimization_barrier forces the full copy to materialize — a bare
        # [:1] slice would let XLA DCE everything but one element.
        measure(
            "copy_f32_224mb",
            lambda xx, a=arr: jax.lax.optimization_barrier(
                a + xx[0, 0].astype(jnp.float32)
            ).reshape(-1)[:1],
            x,
            2 * 224 * 1024 * 1024,
            results,
            n_iter=24,
        )
    elif stage == "batch":
        # best variant vs batch size (set VARIANT env to pick)
        for Bi in (32, 64, 128, 256):
            xi = jnp.asarray(rng.standard_normal((Bi, K)), jnp.bfloat16)
            xti = jnp.asarray(np.asarray(xi).T)
            measure(f"tr_tn256_b{Bi}", lambda xx: run_tr(xx, qt, st, 256), xti, WB, results)
            measure(f"cur1d_tn512_b{Bi}", lambda xx: run_1d_group(xx, q, s, 512), xi, WB, results)

    print(json.dumps({"summary": {k: round(v, 1) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
