"""Pallas TPU flash attention (prefill + decode), S-tiled with online softmax.

Replaces the reference's xformers ``memory_efficient_attention`` CUDA kernel
(reference: transformer_layers.py:87-93) and the XLA fallback in
ops/attention.py. One kernel covers every reference mask regime
(BlockDiagonalCausal / local / padded-keys, reference: cache.py:240-254):
the mask is position arithmetic — ``0 <= q_pos - kv_pos < window`` — checked
in-kernel from position vectors, so no (B, T, S) mask or logits tensor is
ever materialized in HBM.

Design:
  * head-major layout (B, H, T, D); grid (B, H, T/BT, S/BS) with the S axis
    innermost — Mosaic runs it sequentially per (b, h, t), so VMEM scratch
    (running max / sum / output accumulator) implements the classic online
    softmax. VMEM holds only one (BS, D) K/V tile at a time: S is unbounded
    (32k+ contexts stream tile by tile).
  * GQA: query head h reads KV head h // (H / Hkv) via BlockSpec index_map —
    grouped heads share K/V tiles, nothing is repeated (the reference
    materializes repeat_interleave'd K/V, transformer_layers.py:16-19).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# MISTRAL_PALLAS_INTERPRET=1: every kernel whose caller leaves
# ``interpret`` unset runs in pallas interpret mode — the CPU-backend
# escape hatch that lets tests drive the MODEL-level pallas paths
# (including under a mesh, parallel/shmap.py) without TPU hardware.
# Resolved at trace time; set the env var before the first trace of a
# given shape (jit caches include only the static ``interpret`` value).


def _resolve_interpret(interpret) -> bool:
    if interpret is not None:
        return interpret
    return os.environ.get("MISTRAL_PALLAS_INTERPRET", "0") == "1"


# Decode-attention tile knobs (see decode_attention): on-chip A/B levers.
# BS = ring columns per block, RB = batch rows per program. Defaults sized
# for ~8 programs/layer at the 7B/4096-ring B=32 config with ~32 MB of
# double-buffered K+V blocks in the 128 MB v5e VMEM.
_DECODE_BS = int(os.environ.get("MISTRAL_DECODE_BS", "1024"))
_DECODE_RB = int(os.environ.get("MISTRAL_DECODE_RB", "8"))


def _attn_kernel(
    window_ref,  # SMEM (1, 1) int32
    q_ref,  # (1, 1, BT, D)
    k_ref,  # (1, 1, BS, D)
    v_ref,  # (1, 1, BS, D)
    qpos_ref,  # (B, BT) int32 — T-tile block
    kpos_ref,  # (B, BS) int32 — S-tile block
    qvalid_ref,  # (B, BT) int32
    kvalid_ref,  # (B, BS) int32
    o_ref,  # (1, 1, BT, D)
    om_ref,  # (1, 1, BT, 1) fp32 — running-max stat ((B, H, T, 1) layout)
    ol_ref,  # (1, 1, BT, 1) fp32 — sum-of-exp stat
    m_scr,  # VMEM (BT, 128) fp32 — running max (col 0 used)
    l_scr,  # VMEM (BT, 128) fp32 — running sum
    acc_scr,  # VMEM (BT, D) fp32
    *,
    scale: float,
):
    b = pl.program_id(0)
    s = pl.program_id(3)
    num_s = pl.num_programs(3)

    @pl.when(s == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # (BT, D)
    k = k_ref[0, 0]  # (BS, D)
    v = v_ref[0, 0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BT, BS)

    qp = qpos_ref[b, :]
    kp = kpos_ref[b, :]
    qv = qvalid_ref[b, :]
    kv = kvalid_ref[b, :]
    delta = qp[:, None] - kp[None, :]
    w = window_ref[0, 0]
    ok = (delta >= 0) & (delta < w) & (qv[:, None] > 0) & (kv[None, :] > 0)
    scores = jnp.where(ok, scores, _NEG_INF)

    m_prev = m_scr[:, :1]  # (BT, 1)
    m_cur = jnp.max(scores, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # guard fully-masked-so-far rows (m == -inf): exp(-inf - -inf) -> use 0
    alpha = jnp.where(m_prev > _NEG_INF / 2, jnp.exp(m_prev - m_new), 0.0)
    p = jnp.exp(scores - m_new)  # masked entries: exp(-1e30 - m) == 0
    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:, :1] = m_new
    l_scr[:, :1] = l_new

    @pl.when(s == num_s - 1)
    def _finish():
        l = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)
        om_ref[0, 0] = m_scr[:, :1]
        ol_ref[0, 0] = l_scr[:, :1]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def merge_attention_parts(o1, m1, l1, o2, m2, l2):
    """Exactly combine two online-softmax partial attentions over disjoint
    key sets (each oi normalized within its part; mi/li the part's running
    max / sum-of-exp): softmax(concat) == weighted merge with
    w_i = exp(m_i - max(m)) * l_i. Rows empty in both parts return 0, the
    flash kernels' convention. oi: (B, T, H, D); mi/li: (B, T, H)."""
    m = jnp.maximum(m1, m2)
    w1 = jnp.where(l1 > 0, jnp.exp(m1 - m), 0.0) * l1
    w2 = jnp.where(l2 > 0, jnp.exp(m2 - m), 0.0) * l2
    denom = jnp.maximum(w1 + w2, 1e-30)[..., None]
    merged = (
        o1.astype(jnp.float32) * w1[..., None]
        + o2.astype(jnp.float32) * w2[..., None]
    ) / denom
    return merged.astype(o1.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "return_stats"))
def flash_attention(
    q: jax.Array,  # (B, T, H, D)
    k: jax.Array,  # (B, S, Hkv, D)
    v: jax.Array,  # (B, S, Hkv, D)
    q_pos: jax.Array,  # (B, T) int32
    kv_pos: jax.Array,  # (B, S) int32
    q_valid: jax.Array,  # (B, T) bool
    kv_valid: jax.Array,  # (B, S) bool
    window: jax.Array,  # scalar int32
    interpret: bool = None,
    return_stats: bool = False,
) -> jax.Array:
    """Returns (B, T, H*D), matching ops.attention.attend numerics on every
    row that can see at least one key. With ``return_stats``, returns
    ((B, T, H, D) out, (B, T, H) m, (B, T, H) l) for merge_attention_parts."""
    B, T, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    scale = D**-0.5

    BT = min(128, _ceil_to(T, 8))
    Tp = _ceil_to(T, BT)
    BS = min(512, _ceil_to(S, 128))
    Sp = _ceil_to(S, BS)

    qh = jnp.moveaxis(q, 2, 1)  # (B, H, T, D)
    kh = jnp.moveaxis(k, 2, 1)  # (B, Hkv, S, D)
    vh = jnp.moveaxis(v, 2, 1)

    if Tp != T:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        q_pos = jnp.pad(q_pos, ((0, 0), (0, Tp - T)))
        q_valid = jnp.pad(q_valid, ((0, 0), (0, Tp - T)))
    if Sp != S:
        kh = jnp.pad(kh, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        kv_pos = jnp.pad(kv_pos, ((0, 0), (0, Sp - S)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, Sp - S)))

    grid = (B, H, Tp // BT, Sp // BS)

    out, om, ol = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, h, t, s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, BT, D), lambda b, h, t, s: (b, h, t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, BS, D),
                lambda b, h, t, s: (b, h // G, s, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, BS, D),
                lambda b, h, t, s: (b, h // G, s, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((B, BT), lambda b, h, t, s: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, BS), lambda b, h, t, s: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, BT), lambda b, h, t, s: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, BS), lambda b, h, t, s: (0, s), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, BT, D), lambda b, h, t, s: (b, h, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, BT, 1), lambda b, h, t, s: (b, h, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, BT, 1), lambda b, h, t, s: (b, h, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tp, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Tp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, 128), jnp.float32),
            pltpu.VMEM((BT, 128), jnp.float32),
            pltpu.VMEM((BT, D), jnp.float32),
        ],
        interpret=_resolve_interpret(interpret),
    )(
        jnp.asarray(window, jnp.int32).reshape(1, 1),
        qh,
        kh,
        vh,
        q_pos.astype(jnp.int32),
        kv_pos.astype(jnp.int32),
        q_valid.astype(jnp.int32),
        kv_valid.astype(jnp.int32),
    )
    if return_stats:
        o4 = jnp.moveaxis(out[:, :, :T], 1, 2)  # (B, T, H, D)
        return (
            o4,
            jnp.moveaxis(om[:, :, :T, 0], 1, 2),
            jnp.moveaxis(ol[:, :, :T, 0], 1, 2),
        )
    return jnp.moveaxis(out[:, :, :T], 1, 2).reshape(B, T, H * D)


def _decode_attn_kernel(
    scalar_ref,  # SMEM (2,) int32 — [layer index (used by index_maps), window]
    q_ref,  # (RB, H, D)
    k_ref,  # (1, RB, BS, Hkv*D) fp8/bf16 — layer-li block of the FULL stack
    v_ref,  # (1, RB, BS, Hkv*D)
    ks_ref,  # (1, RB, Hkv, BS) fp32 — absent when scaled=False (bf16 ring)
    vs_ref,  # (1, RB, Hkv, BS) fp32
    qpos_ref,  # SMEM (RB, 1) int32
    kpos_ref,  # (RB, BS) int32
    kvalid_ref,  # (RB, BS) int32
    o_ref,  # (RB, H, D)
    m_scr,  # VMEM (RB*H, 128) fp32
    l_scr,  # VMEM (RB*H, 128) fp32
    acc_scr,  # VMEM (RB*H, D) fp32
    *,
    scale: float,
    n_kv: int,
    n_rows: int,
    s_total: int,
    scaled: bool,
):
    """Decode (T == 1) attention: ONE program per (RB batch rows, S tile)
    covering ALL heads of all RB rows. Program-count amortization is the
    whole game at decode shapes: per-program fixed overhead dominated both
    the (B, H) flash grid (r1: 368 vs 1017 tok/s) and the first (B, S-tile)
    version of this kernel (r2: 245 vs 370 tok/s at the 4096 ring with 256
    programs/layer) — multi-row blocks cut the 7B/4096-ring program count
    to (B/RB)·(S/BS) = 8 per layer at RB=8, BS=2048.

    The kernel reads the FULL STACKED (L, B, S, Hkv*D) ring with the layer
    index as a PREFETCHED SCALAR feeding the index_maps: a per-layer
    `dynamic_index_in_dim` slice cannot fuse into a custom call, so XLA
    materialized a (B, S, Hkv, D) copy of the layer's ring per layer per
    step — 2×277 MB at the 7B/4096-ring config, ~43 ms/step of pure copies
    (the dominant term in the first long-ring measurement, 139 tok/s).

    ``s_total`` is the true (unpadded) ring length: the grid rounds S up to
    the tile size and Mosaic pads out-of-bounds reads with unspecified bytes,
    so the tail tile masks columns >= s_total in-register (scores -> -inf,
    V rows zeroed — 0·garbage could be NaN otherwise). No jnp.pad of the
    ring, which would copy it per layer per step.

    K/V arrive flat-head (..., BS, Hkv*D) so per-head access is a contiguous
    lane slice — a (BS, Hkv, D) block sliced at [:, j, :] is a strided
    sublane gather that Mosaic materializes on the vector stack (22 MB at
    BS=1024: scoped-vmem OOM at the 4096-slot ring).

    ``scaled=False`` (bf16 rings) omits the scale operands entirely instead
    of streaming all-ones arrays from HBM."""
    s = pl.program_id(1)
    num_s = pl.num_programs(1)

    @pl.when(s == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    H, D = q_ref.shape[1], q_ref.shape[2]
    BS = k_ref.shape[2]
    G = H // n_kv
    w = scalar_ref[1]
    col = s * BS + jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)[0]
    in_bounds = col < s_total  # (BS,) — masks the padded tail tile
    guard_v = s_total % BS != 0

    for r in range(n_rows):
        q = q_ref[r]  # (H, D)
        qp = qpos_ref[r, 0]
        kp = kpos_ref[r, :]
        kval = kvalid_ref[r, :]
        delta = qp - kp
        ok = in_bounds & (delta >= 0) & (delta < w) & (kval > 0)  # (BS,)
        rsl = slice(r * H, (r + 1) * H)

        m_prev = m_scr[rsl, :1]  # (H, 1)
        # scores for all heads: Hkv dots of (G, D) @ (D, BS)
        # Cast the row's WHOLE K/V block once and slice heads from the
        # casted value: lane slices of a live value are vreg views, while
        # per-head `ref[...].astype` materialized a fresh (BS, D) cast per
        # head on the Mosaic vector stack — 16 such temporaries per row
        # blew the 16 MB scoped-vmem limit at BS=2048 (caught by AOT
        # compiling for the v5e topology, no chip needed).
        k_all = k_ref[0, r].astype(q.dtype)  # (BS, Hkv*D)
        v_all = v_ref[0, r].astype(q.dtype)
        # V rows need a NaN guard ONLY where the tile can cover
        # out-of-bounds memory (Mosaic pads OOB reads with unspecified
        # bytes; 0·NaN = NaN). In-bounds-but-invalid slots hold finite ring
        # bytes and their p is already 0 via the score mask.
        if guard_v:
            ok_i = ok.astype(jnp.int32)  # Mosaic: no minor-dim reshape on i1
            v_all = jnp.where(ok_i[:, None] > 0, v_all, jnp.zeros_like(v_all))

        rows = []
        for j in range(n_kv):
            sj = jax.lax.dot_general(
                q[j * G : (j + 1) * G, :], k_all[:, j * D : (j + 1) * D],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (G, BS)
            if scaled:
                sj = sj * (ks_ref[0, r, j, :][None, :] * scale)
            else:
                sj = sj * scale
            rows.append(sj)
        scores = jnp.concatenate(rows, axis=0)  # (H, BS)
        scores = jnp.where(ok[None, :], scores, _NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.where(m_prev > _NEG_INF / 2, jnp.exp(m_prev - m_new), 0.0)
        p = jnp.exp(scores - m_new)  # (H, BS)
        l_new = alpha * l_scr[rsl, :1] + jnp.sum(p, axis=-1, keepdims=True)

        outs = []
        for j in range(n_kv):
            pg = p[j * G : (j + 1) * G, :]
            if scaled:
                pg = pg * vs_ref[0, r, j, :][None, :]
            pj = jnp.where(ok[None, :], pg, 0.0).astype(q.dtype)
            outs.append(
                jax.lax.dot_general(
                    pj, v_all[:, j * D : (j + 1) * D], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        acc_scr[rsl, :] = acc_scr[rsl, :] * alpha + jnp.concatenate(outs, axis=0)
        m_scr[rsl, :1] = m_new
        l_scr[rsl, :1] = l_new

    @pl.when(s == num_s - 1)
    def _finish():
        for r in range(n_rows):
            rsl = slice(r * H, (r + 1) * H)
            o_ref[r] = (
                acc_scr[rsl, :] / jnp.maximum(l_scr[rsl, :1], 1e-30)
            ).astype(o_ref.dtype)


def _ring_chunk_kernel(
    window_ref,  # SMEM (1, 1) int32
    q_ref,  # (1, BT, G*D) — flat-head (B, T, H*D) layout, one group's cols
    k_ref,  # (1, BS, D) fp8/bf16 — flat-head (B, S, Hkv*D) ring layout
    v_ref,  # (1, BS, D)
    ks_ref,  # (1, Hkv, BS) fp32 — (B, Hkv, S) pre-transposed scales
    vs_ref,  # (1, Hkv, BS)
    qpos_ref,  # (B, BT) int32
    kpos_ref,  # (B, BS) int32
    qvalid_ref,  # (B, BT) int32
    kvalid_ref,  # (B, BS) int32
    o_ref,  # (1, BT, G*D)
    om_ref,  # (1, G, BT, 1) fp32 — running-max stat, (B, H, T, 1) layout
    ol_ref,  # (1, G, BT, 1) fp32 — sum-of-exp stat
    m_scr,  # VMEM (G*BT, 128) fp32
    l_scr,  # VMEM (G*BT, 128) fp32
    acc_scr,  # VMEM (G*BT, D) fp32
    *,
    scale: float,
    n_group: int,
    s_total: int,
):
    """Prefill-chunk attention over the quantized ring in its NATIVE
    (B, S, Hkv, D) layout, emitting online-softmax stats (m, l) so the
    caller can exactly merge with the current chunk's self-attention.

    Why this exists: the flash kernels above want head-major (B, H, S, D)
    operands, so attending [ring ++ chunk] required moveaxis + dequant +
    concat copies of the ring per layer — and XLA then kept the layer-scan
    cache carry in the transposed layout, inserting a full-stack (L,B,W,H,D)
    layout copy at program entry (4 GB at the 4096-ring 7B config: the
    allocation that OOMed long prefill). Reading the ring natively keeps
    one layout end-to-end: no copies, no dequantized cache, no concat.

    Grid (B, Hkv, T-tiles, S-tiles): one program attends a BT-query tile of
    one GQA group (G heads sharing one KV head) over one ring tile. Scales
    fold after the dots (decode_attention's scheme — identical numerics to
    the XLA decode path, preserving the prefill==decode logprob contract)."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    s = pl.program_id(3)
    num_s = pl.num_programs(3)

    @pl.when(s == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    BT = q_ref.shape[1]
    BS = k_ref.shape[1]
    D = k_ref.shape[2]
    kj = k_ref[0]  # (BS, D)
    vj = v_ref[0]
    k_sc = ks_ref[0, j, :]  # (BS,)
    v_sc = vs_ref[0, j, :]

    qp = qpos_ref[b, :]  # (BT,)
    kp = kpos_ref[b, :]
    qv = qvalid_ref[b, :]
    kval = kvalid_ref[b, :]
    w = window_ref[0, 0]
    col = s * BS + jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)[0]
    okc = (col < s_total) & (kval > 0)  # (BS,) — in-bounds, live slot
    delta = qp[:, None] - kp[None, :]
    ok = okc[None, :] & (delta >= 0) & (delta < w) & (qv[:, None] > 0)

    compute_dtype = q_ref.dtype
    kq_t = kj.astype(compute_dtype)
    # Zero OOB/garbage V rows: exp(-masked)=0 exactly, but 0·NaN is NaN.
    # (int32 round-trip: Mosaic can't minor-dim-reshape 1-bit vectors.)
    okc_i = okc.astype(jnp.int32)
    vq_t = jnp.where(okc_i[:, None] > 0, vj.astype(compute_dtype), 0)
    v_scc = jnp.where(okc, v_sc, 0.0)
    for g in range(n_group):
        q = q_ref[0, :, g * D : (g + 1) * D]  # (BT, D)
        sl = slice(g * BT, (g + 1) * BT)
        scores = jax.lax.dot_general(
            q, kq_t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (k_sc[None, :] * scale)
        scores = jnp.where(ok, scores, _NEG_INF)

        m_prev = m_scr[sl, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.where(m_prev > _NEG_INF / 2, jnp.exp(m_prev - m_new), 0.0)
        p = jnp.exp(scores - m_new)
        l_new = alpha * l_scr[sl, :1] + jnp.sum(p, axis=-1, keepdims=True)
        pj = (p * v_scc[None, :]).astype(compute_dtype)
        acc_scr[sl, :] = acc_scr[sl, :] * alpha + jax.lax.dot_general(
            pj, vq_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[sl, :1] = m_new
        l_scr[sl, :1] = l_new

    @pl.when(s == num_s - 1)
    def _finish():
        for g in range(n_group):
            sl = slice(g * BT, (g + 1) * BT)
            l = jnp.maximum(l_scr[sl, :1], 1e-30)
            o_ref[0, :, g * D : (g + 1) * D] = (
                acc_scr[sl, :] / l
            ).astype(o_ref.dtype)
            om_ref[0, g] = m_scr[sl, :1]
            ol_ref[0, g] = l_scr[sl, :1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ring_attention_stats(
    q: jax.Array,  # (B, T, H, D)
    kq: jax.Array,  # (B, S, Hkv*D) fp8/bf16 ring, STORED flat-head layout
    vq: jax.Array,
    k_scale: jax.Array,  # (B, Hkv, S) fp32 (stored layout) — ones for bf16
    v_scale: jax.Array,
    q_pos: jax.Array,  # (B, T)
    kv_pos: jax.Array,  # (B, S)
    q_valid: jax.Array,  # (B, T) bool
    kv_valid: jax.Array,  # (B, S) bool
    window: jax.Array,
    interpret: bool = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Chunk-queries-over-ring attention, native ring layout, with
    (out, m, l) online-softmax stats for exact merging against the chunk's
    self-attention (merge_attention_parts). out is (B, T, H, D) normalized
    within the ring part; m/l are (B, T, H) fp32."""
    B, T, H, D = q.shape
    S, Hkv = kq.shape[1], kq.shape[2] // D
    G = H // Hkv
    scale = D**-0.5

    BT = min(128, _ceil_to(T, 8))
    BS = min(512, _ceil_to(S, 128))
    nT = _ceil_to(T, BT) // BT
    nS = _ceil_to(S, BS) // BS

    ks = k_scale.astype(jnp.float32)  # (B, Hkv, S) — the stored layout
    vs = v_scale.astype(jnp.float32)

    Tp = nT * BT
    Sp = nS * BS
    # Position/valid vectors are padded host-side (they're tiny); the big
    # ring/q tensors are NOT padded — the kernel masks the ragged tail.
    if Tp != T:
        q_pos = jnp.pad(q_pos, ((0, 0), (0, Tp - T)))
        q_valid = jnp.pad(q_valid, ((0, 0), (0, Tp - T)))
    if Sp != S:
        kv_pos = jnp.pad(kv_pos, ((0, 0), (0, Sp - S)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, Sp - S)))
    out, om, ol = pl.pallas_call(
        functools.partial(
            _ring_chunk_kernel, scale=scale, n_group=G, s_total=S
        ),
        grid=(B, Hkv, nT, nS),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, j, t, s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, BT, G * D),
                lambda b, j, t, s: (b, t, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BS, D),
                lambda b, j, t, s: (b, s, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BS, D),
                lambda b, j, t, s: (b, s, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Hkv, BS), lambda b, j, t, s: (b, 0, s), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, Hkv, BS), lambda b, j, t, s: (b, 0, s), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((B, BT), lambda b, j, t, s: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, BS), lambda b, j, t, s: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, BT), lambda b, j, t, s: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, BS), lambda b, j, t, s: (0, s), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, BT, G * D),
                lambda b, j, t, s: (b, t, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, G, BT, 1), lambda b, j, t, s: (b, j, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, G, BT, 1), lambda b, j, t, s: (b, j, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, H * D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tp, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Tp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G * BT, 128), jnp.float32),
            pltpu.VMEM((G * BT, 128), jnp.float32),
            pltpu.VMEM((G * BT, D), jnp.float32),
        ],
        interpret=_resolve_interpret(interpret),
    )(
        jnp.asarray(window, jnp.int32).reshape(1, 1),
        q.reshape(B, T, H * D),
        kq,
        vq,
        ks,
        vs,
        q_pos.astype(jnp.int32),
        kv_pos.astype(jnp.int32),
        q_valid.astype(jnp.int32),
        kv_valid.astype(jnp.int32),
    )
    out = out[:, :T].reshape(B, T, H, D)
    om = jnp.moveaxis(om[:, :, :T, 0], 1, 2)  # (B, T, H)
    ol = jnp.moveaxis(ol[:, :, :T, 0], 1, 2)
    return out, om, ol


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(
    q: jax.Array,  # (B, 1, H, D)
    CK: jax.Array,  # (L, B, S, Hkv*D) fp8/bf16 FULL stacked flat-head ring
    CV: jax.Array,
    KS,  # (L, B, Hkv, S) fp32 scales, or None for bf16 rings
    VS,
    li: jax.Array,  # scalar int32 — layer index into the stack
    q_pos: jax.Array,  # (B, 1)
    kv_pos: jax.Array,  # (B, S)
    kv_valid: jax.Array,  # (B, S) bool
    window: jax.Array,
    interpret: bool = None,
) -> jax.Array:
    """T==1 ring attention over layer ``li`` of the stacked ring cache,
    (B/RB, S-tiles) grid, all heads of RB batch rows per program.
    Returns (B, 1, H*D).

    Takes the WHOLE (L, ...) stack IN ITS STORED LAYOUT (cache.KVCache:
    flat-head K/V, W-minor scales) + a prefetched scalar layer index: the
    caller slicing out its layer first would materialize a full ring copy
    per layer per step (custom calls can't fuse dynamic-slices), and any
    reshape between storage and kernel is a physical relayout on TPU."""
    B, T, H, D = q.shape
    assert T == 1, "decode_attention is the T==1 fast path"
    L, S = CK.shape[0], CK.shape[2]
    Hkv = CK.shape[3] // D
    scale = D**-0.5
    scaled = KS is not None

    # Ragged tail handled IN-KERNEL (col >= S masked): no jnp.pad here —
    # padding would copy the whole ring per layer per step.
    # Tile sizes trade per-program fixed overhead (the dominant cost of the
    # first kernel version: 256 programs/layer at RB=1, BS=512) against
    # VMEM block footprint (2·RB·BS·Hkv·D bytes double-buffered); tunable
    # for on-chip A/B via MISTRAL_DECODE_BS / MISTRAL_DECODE_RB.
    BS = min(_DECODE_BS, _ceil_to(S, 128))
    RB = _DECODE_RB
    while B % RB:
        RB //= 2
    RB = max(RB, 1)

    kv_spec = pl.BlockSpec(
        (1, RB, BS, Hkv * D),
        lambda b, s, sref: (sref[0], b, s, 0),
        memory_space=pltpu.VMEM,
    )
    sc_spec = pl.BlockSpec(
        (1, RB, Hkv, BS),
        lambda b, s, sref: (sref[0], b, 0, s),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec((RB, H, D), lambda b, s, sref: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        kv_spec,
        kv_spec,
    ]
    operands = [q[:, 0], CK, CV]
    if scaled:
        in_specs += [sc_spec, sc_spec]
        operands += [KS.astype(jnp.float32), VS.astype(jnp.float32)]
    in_specs += [
        pl.BlockSpec((RB, 1), lambda b, s, sref: (b, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((RB, BS), lambda b, s, sref: (b, s),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, BS), lambda b, s, sref: (b, s),
                     memory_space=pltpu.VMEM),
    ]
    operands += [
        q_pos.astype(jnp.int32),
        kv_pos.astype(jnp.int32),
        kv_valid.astype(jnp.int32),
    ]

    kernel = functools.partial(
        _decode_attn_kernel, scale=scale, n_kv=Hkv, n_rows=RB, s_total=S,
        scaled=scaled,
    )
    if not scaled:
        # keep one kernel signature: splice dummy refs for ks/vs
        base = kernel

        def kernel(sref, qr, kr, vr, qpr, kpr, kvr, o, m, l, a):  # noqa: ANN001
            return base(sref, qr, kr, vr, None, None, qpr, kpr, kvr, o, m, l, a)

    scalars = jnp.stack(
        [jnp.asarray(li, jnp.int32), jnp.asarray(window, jnp.int32)]
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // RB, _ceil_to(S, BS) // BS),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (RB, H, D), lambda b, s, sref: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((RB * H, 128), jnp.float32),
                pltpu.VMEM((RB * H, 128), jnp.float32),
                pltpu.VMEM((RB * H, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        # Mosaic's default scoped-vmem cap is 16 MB, but it counts the
        # DOUBLE-BUFFERED pipeline blocks: 2·RB·BS·Hkv·D bytes each for K
        # and V (64 MB at RB=8, BS=2048 fp8). v5e VMEM is 128 MB — grant
        # the kernel most of it so the tile sweep can go big.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_resolve_interpret(interpret),
    )(scalars, *operands)
    return out.reshape(B, 1, H * D)


# ---------------------------------------------------------------------------
# Fused update + decode attention (round 3)
# ---------------------------------------------------------------------------

# Fused-decode tile knobs. Unset -> adaptive defaults chosen from the r4
# on-chip B-sweep (docs/DECODE_PERF.md round-4 table): short rings take
# BS=128 so live-fill tile skipping can drop dead/padding tiles (B=64:
# 0.66 -> 0.725 of roofline; B=128: 0.50 -> 0.57), long rings keep the
# BS=1024 streaming tuned in r3 (4096-ring 0.75); RB=16 wins at B>=128.
_FUSED_BS = (
    int(os.environ["MISTRAL_FUSED_BS"])
    if os.environ.get("MISTRAL_FUSED_BS")
    else None
)
_FUSED_RB = (
    int(os.environ["MISTRAL_FUSED_RB"])
    if os.environ.get("MISTRAL_FUSED_RB")
    else None
)


def _fused_decode_kernel(
    scalar_ref,  # SMEM (3 + 2B,) int32 —
    # [li, window, write_slot(B), qpos(B), live_fill]
    # VMEM-blocked small operands:
    q_ref,  # (RB, H, D)
    xk_ref,  # (RB, Hkv, D) bf16 — new keys, pre-quantization
    xv_ref,  # (RB, Hkv, D)
    kpos_ref,  # (RB, S) int32 — slot positions AFTER the write
    kvalid_ref,  # (RB, S) int32
    # *refs — ANY-space stack inputs (aliased), outputs, o_ref, scratches;
    # unpacked below by ``scaled``/``n_rows`` (per-row scratch refs keep
    # every write-DMA source a FULL (1, HD) memref: Mosaic rejects size-1
    # slices along tiled dims, e.g. (RB, 1, HD) i8 scratch -> .at[r]).
    *refs,
    scale: float,
    n_kv: int,
    n_rows: int,
    s_total: int,
    bs: int,
    scaled: bool,
    qmax: float,
    is_int: bool,
):
    """One program per RB batch rows: (1) quantize this step's K/V rows and
    DMA-write them into layer ``li`` of the stacked ring IN PLACE (the
    stacks are aliased outputs), then (2) attend ring-only with the v2
    online-softmax math, streaming S tiles through double-buffered manual
    DMA.

    Why fused: with the scatter (cache.update_stacked) and the attention in
    separate ops, the XLA scatter and the pallas call disagree on the
    stacks' layout and XLA inserts FULL-STACK relayout copies into the
    decode loop (round-3 AOT profile: s8[L,B,S,HD] copies per step; on-chip
    the kernel path measured 400 vs 1898 tok/s at the 258 ring). With BOTH
    the write and the read inside one kernel, the stacks' only consumers
    are pallas calls with one layout — no scatter, no slice, no relayout.

    Numerics contract: the write math is cache._quantize_ring / _ring_writes
    bit-for-bit (absmax/qmax per (token, head), round+clip for int8); the
    attention math is decode_attention's (scales folded AFTER the dots) —
    preserving the decode ≡ prefill logprob invariant."""
    n_stack = 4 if scaled else 2
    # refs[:n_stack] are the aliased stack INPUTS — same memory as the out
    # refs; never touched (reads/writes all go through the out refs).
    pos = n_stack
    if scaled:
        ck_ref, cv_ref, ks_ref, vs_ref = refs[pos : pos + 4]
        pos += 4
    else:
        ck_ref, cv_ref = refs[pos : pos + 2]
        ks_ref = vs_ref = None
        pos += 2
    o_ref = refs[pos]
    scr = list(refs[pos + 1 :])
    gk_scrs = scr[:n_rows]
    gv_scrs = scr[n_rows : 2 * n_rows]
    del scr[: 2 * n_rows]
    if scaled:
        gks_scrs = scr[:n_rows]
        gvs_scrs = scr[n_rows : 2 * n_rows]
        del scr[: 2 * n_rows]
    k_buf, v_buf = scr[0], scr[1]
    del scr[:2]
    if scaled:
        ksb_buf, vsb_buf = scr[0], scr[1]
        del scr[:2]
    w_sem, r_sem, m_scr, l_scr, acc_scr = scr

    pid = pl.program_id(0)
    B = pl.num_programs(0) * n_rows
    li = scalar_ref[0]
    w = scalar_ref[1]
    H, D = q_ref.shape[1], q_ref.shape[2]
    HD = n_kv * D

    # ---- 1. quantize + RMW-write this step's K/V rows ----------------------
    # Mosaic DMA slices must be tile-SHAPE-aligned: a single ring slot —
    # (1, HD) on the sublane-tiled S dim, or a width-1 lane slice of the
    # (Hkv, S) scale planes — cannot be DMA'd directly ("Slice shape along
    # dimension N must be aligned to tiling"). Each row therefore
    # read-modify-writes the ALIGNED GROUP containing its slot: the 8-slot
    # sublane group of the K/V rings and the 128-wide lane group of the
    # scale planes (on-chip probe: dynamic 8-/128-aligned offsets lower
    # fine). Extra traffic ~48 KB per (row, layer) — noise against the
    # S-tile streaming below. Only this program's rows are touched, so the
    # RMW is race-free across the grid.
    xk = xk_ref[...].astype(jnp.float32)  # (RB, Hkv, D)
    xv = xv_ref[...].astype(jnp.float32)
    if scaled:
        k_s = jnp.maximum(jnp.max(jnp.abs(xk), axis=-1) / qmax, 1e-8)
        v_s = jnp.maximum(jnp.max(jnp.abs(xv), axis=-1) / qmax, 1e-8)
        yk = xk / k_s[..., None]
        yv = xv / v_s[..., None]
        if is_int:
            yk = jnp.clip(jnp.round(yk), -qmax, qmax)
            yv = jnp.clip(jnp.round(yv), -qmax, qmax)
    else:
        yk, yv = xk, xv

    def _kv_group_copies(r, row, g8, to_hbm):
        ksl = ck_ref.at[li, row, pl.ds(g8, 8), :]
        vsl = cv_ref.at[li, row, pl.ds(g8, 8), :]
        if to_hbm:
            return [
                pltpu.make_async_copy(gk_scrs[r], ksl, w_sem.at[r, 0]),
                pltpu.make_async_copy(gv_scrs[r], vsl, w_sem.at[r, 1]),
            ]
        return [
            pltpu.make_async_copy(ksl, gk_scrs[r], w_sem.at[r, 0]),
            pltpu.make_async_copy(vsl, gv_scrs[r], w_sem.at[r, 1]),
        ]

    def _sc_group_copies(r, row, gl, to_hbm):
        ksl = ks_ref.at[li, row, :, pl.ds(gl, 128)]
        vsl = vs_ref.at[li, row, :, pl.ds(gl, 128)]
        if to_hbm:
            return [
                pltpu.make_async_copy(gks_scrs[r], ksl, w_sem.at[r, 2]),
                pltpu.make_async_copy(gvs_scrs[r], vsl, w_sem.at[r, 3]),
            ]
        return [
            pltpu.make_async_copy(ksl, gks_scrs[r], w_sem.at[r, 2]),
            pltpu.make_async_copy(vsl, gvs_scrs[r], w_sem.at[r, 3]),
        ]

    for r in range(n_rows):  # start the group reads for every live row
        row = pid * n_rows + r
        slot = scalar_ref[2 + row]

        @pl.when(slot >= 0)
        def _start_read(r=r, row=row, slot=slot):
            for c in _kv_group_copies(r, row, (slot // 8) * 8, False):
                c.start()
            if scaled:
                for c in _sc_group_copies(r, row, (slot // 128) * 128, False):
                    c.start()

    i8 = jax.lax.broadcasted_iota(jnp.int32, (8, HD), 0)
    il = jax.lax.broadcasted_iota(jnp.int32, (n_kv, 128), 1)
    for r in range(n_rows):  # wait read -> merge the new row -> start write
        row = pid * n_rows + r
        slot = scalar_ref[2 + row]

        @pl.when(slot >= 0)
        def _merge_write(r=r, row=row, slot=slot):
            g8 = (slot // 8) * 8
            for c in _kv_group_copies(r, row, g8, False):
                c.wait()
            # f32 select keeps every ring dtype exact: int8 holds +-127
            # integers, fp8/bf16 round-trip f32 losslessly.
            sel = i8 == (slot - g8)
            gk_scrs[r][...] = jnp.where(
                sel, yk[r].reshape(1, HD), gk_scrs[r][...].astype(jnp.float32)
            ).astype(gk_scrs[r].dtype)
            gv_scrs[r][...] = jnp.where(
                sel, yv[r].reshape(1, HD), gv_scrs[r][...].astype(jnp.float32)
            ).astype(gv_scrs[r].dtype)
            for c in _kv_group_copies(r, row, g8, True):
                c.start()
            if scaled:
                gl = (slot // 128) * 128
                for c in _sc_group_copies(r, row, gl, False):
                    c.wait()
                scl = il == (slot - gl)
                gks_scrs[r][...] = jnp.where(scl, k_s[r][:, None], gks_scrs[r][...])
                gvs_scrs[r][...] = jnp.where(scl, v_s[r][:, None], gvs_scrs[r][...])
                for c in _sc_group_copies(r, row, gl, True):
                    c.start()

    for r in range(n_rows):  # writes must land before the S-tile streaming
        row = pid * n_rows + r
        slot = scalar_ref[2 + row]

        @pl.when(slot >= 0)
        def _wait_write(r=r, row=row, slot=slot):
            for c in _kv_group_copies(r, row, (slot // 8) * 8, True):
                c.wait()
            if scaled:
                for c in _sc_group_copies(r, row, (slot // 128) * 128, True):
                    c.wait()

    # ---- 2. attend ring-only, S tiles double-buffered ----------------------
    m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    tiles = []
    t0 = 0
    while t0 < s_total:
        tiles.append((t0, min(bs, s_total - t0)))
        t0 += bs


    # Live-fill bound (r4): ring slots at index >= min(max(new_total),
    # window) are invalid for EVERY row — non-wrapped rows have written
    # only [0, new_total) (slot == position while pos < window), wrapped
    # rows force the bound to window, and the 128-padding slots
    # [window, S) are never valid. Tiles whose start is past the bound are
    # skipped entirely: no DMA, no compute — without this the kernel
    # streams dead ring bytes every step (B-scaled; at a 384-slot ring
    # filled to 192 it is half the attention traffic). Exact: skipped
    # slots would have contributed _NEG_INF scores only.
    live_fill = scalar_ref[2 + 2 * B]

    rows0 = pid * n_rows

    def _tile_copies(t_idx, buf):
        start, size = tiles[t_idx]
        cps = [
            pltpu.make_async_copy(
                ck_ref.at[li, pl.ds(rows0, n_rows), pl.ds(start, size), :],
                k_buf.at[buf, :, pl.ds(0, size), :],
                r_sem.at[buf, 0],
            ),
            pltpu.make_async_copy(
                cv_ref.at[li, pl.ds(rows0, n_rows), pl.ds(start, size), :],
                v_buf.at[buf, :, pl.ds(0, size), :],
                r_sem.at[buf, 1],
            ),
        ]
        if scaled:
            cps += [
                pltpu.make_async_copy(
                    ks_ref.at[li, pl.ds(rows0, n_rows), :, pl.ds(start, size)],
                    ksb_buf.at[buf, :, :, pl.ds(0, size)],
                    r_sem.at[buf, 2],
                ),
                pltpu.make_async_copy(
                    vs_ref.at[li, pl.ds(rows0, n_rows), :, pl.ds(start, size)],
                    vsb_buf.at[buf, :, :, pl.ds(0, size)],
                    r_sem.at[buf, 3],
                ),
            ]
        return cps

    for c in _tile_copies(0, 0):
        c.start()

    G = H // n_kv
    for t_idx, (start, size) in enumerate(tiles):
        buf = t_idx % 2
        if t_idx + 1 < len(tiles):
            # Prefetch the next tile only if it is live; its wait below is
            # gated on the same predicate, so starts/waits stay paired.
            @pl.when(tiles[t_idx + 1][0] < live_fill)
            def _prefetch_next(t_idx=t_idx, buf=buf):
                for c in _tile_copies(t_idx + 1, 1 - buf):
                    c.start()

        def _tile_work(t_idx=t_idx, buf=buf, start=start, size=size):
            _fused_tile_attend(
                t_idx, buf, start, size, _tile_copies, q_ref, kpos_ref,
                kvalid_ref, scalar_ref, k_buf, v_buf,
                ksb_buf if scaled else None, vsb_buf if scaled else None,
                m_scr, l_scr, acc_scr, pid=pid, B=B, w=w, G=G, H=H, D=D,
                n_kv=n_kv, n_rows=n_rows, scale=scale, scaled=scaled,
            )

        if t_idx == 0:
            _tile_work()  # fill >= 1 after the write: tile 0 is always live
        else:
            pl.when(start < live_fill)(_tile_work)

    for r in range(n_rows):
        rsl = slice(r * H, (r + 1) * H)
        o_ref[r] = (
            acc_scr[rsl, :] / jnp.maximum(l_scr[rsl, :1], 1e-30)
        ).astype(o_ref.dtype)


def _fused_tile_attend(
    t_idx, buf, start, size, _tile_copies, q_ref, kpos_ref, kvalid_ref,
    scalar_ref, k_buf, v_buf, ksb_buf, vsb_buf, m_scr, l_scr, acc_scr,
    *, pid, B, w, G, H, D, n_kv, n_rows, scale, scaled,
):
    """One live S-tile of the fused decode kernel's online-softmax loop
    (split out so the tile-skip pl.when wraps the whole body)."""
    for c in _tile_copies(t_idx, buf):
        c.wait()

    for r in range(n_rows):
            row = pid * n_rows + r
            q = q_ref[r]  # (H, D)
            qp = scalar_ref[2 + B + row]
            kp = kpos_ref[r, pl.ds(start, size)]
            kval = kvalid_ref[r, pl.ds(start, size)]
            delta = qp - kp
            ok = (delta >= 0) & (delta < w) & (kval > 0)  # (size,)
            rsl = slice(r * H, (r + 1) * H)

            k_all = k_buf[buf, r, pl.ds(0, size), :].astype(q.dtype)
            v_all = v_buf[buf, r, pl.ds(0, size), :].astype(q.dtype)

            m_prev = m_scr[rsl, :1]
            rows_s = []
            for j in range(n_kv):
                sj = jax.lax.dot_general(
                    q[j * G : (j + 1) * G, :], k_all[:, j * D : (j + 1) * D],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (G, size)
                if scaled:
                    sj = sj * (ksb_buf[buf, r, j, pl.ds(0, size)][None, :] * scale)
                else:
                    sj = sj * scale
                rows_s.append(sj)
            scores = jnp.concatenate(rows_s, axis=0)  # (H, size)
            scores = jnp.where(ok[None, :], scores, _NEG_INF)

            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
            alpha = jnp.where(m_prev > _NEG_INF / 2, jnp.exp(m_prev - m_new), 0.0)
            p = jnp.exp(scores - m_new)
            l_new = alpha * l_scr[rsl, :1] + jnp.sum(p, axis=-1, keepdims=True)

            outs = []
            for j in range(n_kv):
                pg = p[j * G : (j + 1) * G, :]
                if scaled:
                    pg = pg * vsb_buf[buf, r, j, pl.ds(0, size)][None, :]
                pj = jnp.where(ok[None, :], pg, 0.0).astype(q.dtype)
                outs.append(
                    jax.lax.dot_general(
                        pj, v_all[:, j * D : (j + 1) * D],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            acc_scr[rsl, :] = acc_scr[rsl, :] * alpha + jnp.concatenate(outs, 0)
            m_scr[rsl, :1] = m_new
            l_scr[rsl, :1] = l_new


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_update_decode_attention(
    xq: jax.Array,  # (B, 1, H, D)
    xk: jax.Array,  # (B, 1, Hkv, D) — post-rope, pre-quantization
    xv: jax.Array,
    CK: jax.Array,  # (L, B, S, Hkv*D) ring dtype — returned updated
    CV: jax.Array,
    KS,  # (L, B, Hkv, S) f32, or None for bf16 rings
    VS,
    li: jax.Array,  # scalar int32
    window: jax.Array,  # scalar int32
    write_slot: jax.Array,  # (B,) int32 — target slot, -1 = skip (dead slot)
    q_pos: jax.Array,  # (B,) int32
    kv_pos: jax.Array,  # (B, S) int32 — AFTER-write slot positions
    kv_valid: jax.Array,  # (B, S) bool
    interpret: bool = None,
):
    """Returns (out (B, 1, H*D), CK', CV', KS', VS') with the stacks updated
    IN PLACE (donated/aliased). See _fused_decode_kernel."""
    B, T, H, D = xq.shape
    assert T == 1
    L, S = CK.shape[0], CK.shape[2]
    Hkv = CK.shape[3] // D
    assert S % 128 == 0, "ring buffer must be 128-padded (KVCache.alloc)"
    scaled = KS is not None
    is_int = jnp.dtype(CK.dtype) == jnp.int8
    qmax = 127.0 if is_int else 448.0

    RB = _FUSED_RB if _FUSED_RB else (16 if B >= 64 else 8)
    while B % RB:
        RB //= 2
    RB = max(RB, 1)
    BS = min(_FUSED_BS if _FUSED_BS else (128 if S <= 512 else 1024), S)

    # live_fill: one-past the highest possibly-valid ring slot across the
    # batch (min(max(new_total), window); padding slots [window, S) are
    # never valid) — the kernel skips S-tiles past it (exact, see
    # _fused_decode_kernel).
    fill = jnp.minimum(
        jnp.max(q_pos.astype(jnp.int32)) + 1, jnp.asarray(window, jnp.int32)
    )
    scalars = jnp.concatenate([
        jnp.stack([jnp.asarray(li, jnp.int32), jnp.asarray(window, jnp.int32)]),
        write_slot.astype(jnp.int32),
        q_pos.astype(jnp.int32).reshape(B),
        fill.reshape(1),
    ])

    kernel = functools.partial(
        _fused_decode_kernel, scale=D**-0.5, n_kv=Hkv, n_rows=RB,
        s_total=S, bs=BS, scaled=scaled, qmax=qmax, is_int=is_int,
    )

    in_specs = [
        pl.BlockSpec((RB, H, D), lambda b, sref: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, Hkv, D), lambda b, sref: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, Hkv, D), lambda b, sref: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, S), lambda b, sref: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, S), lambda b, sref: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),  # CK
        pl.BlockSpec(memory_space=pltpu.HBM),  # CV
    ]
    operands = [
        xq[:, 0], xk[:, 0], xv[:, 0],
        kv_pos.astype(jnp.int32), kv_valid.astype(jnp.int32), CK, CV,
    ]
    if scaled:
        in_specs += [pl.BlockSpec(memory_space=pltpu.HBM)] * 2
        operands += [KS, VS]

    out_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),  # CK'
        pl.BlockSpec(memory_space=pltpu.HBM),  # CV'
    ]
    out_shape = [
        jax.ShapeDtypeStruct(CK.shape, CK.dtype),
        jax.ShapeDtypeStruct(CV.shape, CV.dtype),
    ]
    if scaled:
        out_specs += [pl.BlockSpec(memory_space=pltpu.HBM)] * 2
        out_shape += [
            jax.ShapeDtypeStruct(KS.shape, jnp.float32),
            jax.ShapeDtypeStruct(VS.shape, jnp.float32),
        ]
    out_specs.append(
        pl.BlockSpec((RB, H, D), lambda b, sref: (b, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    out_shape.append(jax.ShapeDtypeStruct((B, H, D), xq.dtype))

    rdt = CK.dtype
    # Per-row aligned-group RMW scratches (see _fused_decode_kernel): the
    # 8-slot K/V sublane groups and the 128-wide scale lane groups
    # containing each row's write slot. Separate refs per row keep every
    # DMA operand a FULL memref — Mosaic rejects size-1 slices along tiled
    # dims (e.g. (RB, 1, HD) i8 scratch -> .at[r]).
    scratch = (
        [pltpu.VMEM((8, Hkv * D), rdt) for _ in range(RB)]  # gk_scrs
        + [pltpu.VMEM((8, Hkv * D), rdt) for _ in range(RB)]  # gv_scrs
    )
    if scaled:
        scratch += [pltpu.VMEM((Hkv, 128), jnp.float32) for _ in range(2 * RB)]
    scratch += [
        pltpu.VMEM((2, RB, BS, Hkv * D), rdt),  # k_buf
        pltpu.VMEM((2, RB, BS, Hkv * D), rdt),  # v_buf
    ]
    if scaled:
        scratch += [
            pltpu.VMEM((2, RB, Hkv, BS), jnp.float32),
            pltpu.VMEM((2, RB, Hkv, BS), jnp.float32),
        ]
    scratch += [
        pltpu.SemaphoreType.DMA((RB, 4)),
        pltpu.SemaphoreType.DMA((2, 4)),
        pltpu.VMEM((RB * H, 128), jnp.float32),
        pltpu.VMEM((RB * H, 128), jnp.float32),
        pltpu.VMEM((RB * H, D), jnp.float32),
    ]

    # input_output_aliases indexes FLATTENED operands INCLUDING the
    # scalar-prefetch arg (megablox gmm.py convention: {6: 0} with
    # num_scalar_prefetch=2 over a 3-array metadata tuple):
    # scalars=0, xq=1, xk=2, xv=3, kv_pos=4, kv_valid=5, CK=6, CV=7, ...
    n_alias = 4 if scaled else 2
    aliases = {6 + i: i for i in range(n_alias)}

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // RB,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_resolve_interpret(interpret),
    )(scalars, *operands)
    if scaled:
        ck, cv, ks, vs, out = outs
    else:
        (ck, cv, out), ks, vs = outs, KS, VS
    return out.reshape(B, 1, H * D), ck, cv, ks, vs

def _fused_verify_kernel(
    scalar_ref,  # SMEM (2 + B,) int32 — [li, window, first_write_slot(B)]
    # VMEM-blocked small operands:
    q_ref,  # (RB, Hkv, G*T, D) — (j, g, t)-major query rows
    xk_ref,  # (RB, T, Hkv*D) bf16/f32 — new keys, pre-quantization
    xv_ref,  # (RB, T, Hkv*D)
    qpos_ref,  # (RB, G*T) int32 — per-score-row query positions (g*T + t)
    kpos_ref,  # (RB, S) int32 — slot positions AFTER the chunk write
    kvalid_ref,  # (RB, S) int32
    *refs,  # aliased stack inputs, outputs, o_ref, scratches (see below)
    scale: float,
    n_kv: int,
    n_rows: int,
    n_tok: int,
    s_total: int,
    bs: int,
    lwin: int,
    scaled: bool,
    qmax: float,
    is_int: bool,
):
    """T-token generalization of _fused_decode_kernel for speculative
    VERIFY chunks (T = K+1 candidate tokens per row, T <= 8): quantize and
    write ALL T candidate K/V rows into consecutive ring slots IN PLACE,
    then attend every query token over the ring only — causality inside
    the chunk falls out of position arithmetic (query t at position p0+t
    sees chunk token u at p0+u iff delta >= 0 iff u <= t).

    Validity contract (caller-enforced, speculative.py): the ring NEVER
    wraps (every position < min(windows)), so the T chunk slots are
    consecutive [s0, s0+T) and rejected tokens are committed by simply NOT
    advancing kv_len past them — their slots read as invalid to the next
    iteration (slot_positions) and are overwritten when real tokens reach
    those positions (slot = pos is injective on a non-wrapping ring).

    Why fused: with the verify forward reading per-layer ring slices
    (layer_ring dynamic-slice feeding ring_attention_stats) and the commit
    scattering through XLA (cache.scatter_chunk), the stacks have mixed
    pallas/XLA consumers and XLA inserts full-stack relayout copies into
    the spec loop — serving measured ~128 ms per verify iteration at B=32
    vs ~13 ms for a fused decode step. With write AND read inside one
    pallas call the stacks' only consumers are pallas calls of one layout.

    Write math is cache._quantize_ring bit-for-bit per (token, head);
    attention folds scales AFTER the dots (decode_attention's scheme)."""
    n_stack = 4 if scaled else 2
    pos = n_stack  # refs[:n_stack] are the aliased stack INPUTS (untouched)
    if scaled:
        ck_ref, cv_ref, ks_ref, vs_ref = refs[pos : pos + 4]
        pos += 4
    else:
        ck_ref, cv_ref = refs[pos : pos + 2]
        ks_ref = vs_ref = None
        pos += 2
    o_ref = refs[pos]
    scr = list(refs[pos + 1 :])
    gk_scrs = scr[:n_rows]
    gv_scrs = scr[n_rows : 2 * n_rows]
    del scr[: 2 * n_rows]
    if scaled:
        gks_scrs = scr[:n_rows]
        gvs_scrs = scr[n_rows : 2 * n_rows]
        del scr[: 2 * n_rows]
    k_buf, v_buf = scr[0], scr[1]
    del scr[:2]
    if scaled:
        ksb_buf, vsb_buf = scr[0], scr[1]
        del scr[:2]
    w_sem, r_sem, m_scr, l_scr, acc_scr = scr

    pid = pl.program_id(0)
    li = scalar_ref[0]
    w = scalar_ref[1]
    T = n_tok
    GT = q_ref.shape[2]  # G * T
    D = q_ref.shape[3]
    G = GT // T
    H = n_kv * G
    HD = n_kv * D

    # ---- 1. quantize + RMW-write the T chunk K/V rows ----------------------
    # The T consecutive slots [s0, s0+T) with T <= 8 span at most two
    # aligned 8-slot sublane groups of the K/V rings: one 16-slot window at
    # g0 = min(8*(s0//8), S-16) covers them all (offset s0-g0 in [0,8),
    # +T-1 < 16). Scale planes: one lwin-lane window at
    # l0 = min(128*(s0//128), S-lwin) (lwin = 256 when S >= 256, else
    # S = 128 and offsets cannot overflow). Read-modify-write per row,
    # exactly like _fused_decode_kernel's single-slot groups.
    xk = xk_ref[...].astype(jnp.float32).reshape(n_rows, T, n_kv, D)
    xv = xv_ref[...].astype(jnp.float32).reshape(n_rows, T, n_kv, D)
    if scaled:
        k_s = jnp.maximum(jnp.max(jnp.abs(xk), axis=-1) / qmax, 1e-8)
        v_s = jnp.maximum(jnp.max(jnp.abs(xv), axis=-1) / qmax, 1e-8)
        yk = xk / k_s[..., None]
        yv = xv / v_s[..., None]
        if is_int:
            yk = jnp.clip(jnp.round(yk), -qmax, qmax)
            yv = jnp.clip(jnp.round(yv), -qmax, qmax)
    else:
        yk, yv = xk, xv
    yk = yk.reshape(n_rows, T, HD)
    yv = yv.reshape(n_rows, T, HD)

    def _kv_group_copies(r, row, g16, to_hbm):
        ksl = ck_ref.at[li, row, pl.ds(g16, 16), :]
        vsl = cv_ref.at[li, row, pl.ds(g16, 16), :]
        if to_hbm:
            return [
                pltpu.make_async_copy(gk_scrs[r], ksl, w_sem.at[r, 0]),
                pltpu.make_async_copy(gv_scrs[r], vsl, w_sem.at[r, 1]),
            ]
        return [
            pltpu.make_async_copy(ksl, gk_scrs[r], w_sem.at[r, 0]),
            pltpu.make_async_copy(vsl, gv_scrs[r], w_sem.at[r, 1]),
        ]

    def _sc_group_copies(r, row, gl, to_hbm):
        ksl = ks_ref.at[li, row, :, pl.ds(gl, lwin)]
        vsl = vs_ref.at[li, row, :, pl.ds(gl, lwin)]
        if to_hbm:
            return [
                pltpu.make_async_copy(gks_scrs[r], ksl, w_sem.at[r, 2]),
                pltpu.make_async_copy(gvs_scrs[r], vsl, w_sem.at[r, 3]),
            ]
        return [
            pltpu.make_async_copy(ksl, gks_scrs[r], w_sem.at[r, 2]),
            pltpu.make_async_copy(vsl, gvs_scrs[r], w_sem.at[r, 3]),
        ]

    def _g16(s0):
        # == min((s0//8)*8, S-16) since S-16 is a multiple of 8, but in a
        # form whose 8-alignment Mosaic can PROVE for the DMA slice index
        # (min-of-two-multiples is rejected: "Failed to prove that a tile
        # index ... is divisible by the tiling").
        return (jnp.minimum(s0, s_total - 16) // 8) * 8

    def _gl(s0):
        return (jnp.minimum(s0, s_total - lwin) // 128) * 128

    for r in range(n_rows):  # start the group reads for every live row
        row = pid * n_rows + r
        s0 = scalar_ref[2 + row]

        @pl.when(s0 >= 0)
        def _start_read(r=r, row=row, s0=s0):
            for c in _kv_group_copies(r, row, _g16(s0), False):
                c.start()
            if scaled:
                for c in _sc_group_copies(r, row, _gl(s0), False):
                    c.start()

    i16 = jax.lax.broadcasted_iota(jnp.int32, (16, HD), 0)
    il = jax.lax.broadcasted_iota(jnp.int32, (n_kv, lwin), 1)
    for r in range(n_rows):  # wait read -> merge the T rows -> start write
        row = pid * n_rows + r
        s0 = scalar_ref[2 + row]

        @pl.when(s0 >= 0)
        def _merge_write(r=r, row=row, s0=s0):
            g16 = _g16(s0)
            for c in _kv_group_copies(r, row, g16, False):
                c.wait()
            gk = gk_scrs[r][...].astype(jnp.float32)
            gv = gv_scrs[r][...].astype(jnp.float32)
            for t in range(T):
                sel = i16 == (s0 - g16 + t)
                gk = jnp.where(sel, yk[r, t].reshape(1, HD), gk)
                gv = jnp.where(sel, yv[r, t].reshape(1, HD), gv)
            gk_scrs[r][...] = gk.astype(gk_scrs[r].dtype)
            gv_scrs[r][...] = gv.astype(gv_scrs[r].dtype)
            for c in _kv_group_copies(r, row, g16, True):
                c.start()
            if scaled:
                gl = _gl(s0)
                for c in _sc_group_copies(r, row, gl, False):
                    c.wait()
                gks = gks_scrs[r][...]
                gvs = gvs_scrs[r][...]
                for t in range(T):
                    scl = il == (s0 - gl + t)
                    gks = jnp.where(scl, k_s[r, t][:, None], gks)
                    gvs = jnp.where(scl, v_s[r, t][:, None], gvs)
                gks_scrs[r][...] = gks
                gvs_scrs[r][...] = gvs
                for c in _sc_group_copies(r, row, gl, True):
                    c.start()

    for r in range(n_rows):  # writes must land before the S-tile streaming
        row = pid * n_rows + r
        s0 = scalar_ref[2 + row]

        @pl.when(s0 >= 0)
        def _wait_write(r=r, row=row, s0=s0):
            for c in _kv_group_copies(r, row, _g16(s0), True):
                c.wait()
            if scaled:
                for c in _sc_group_copies(r, row, _gl(s0), True):
                    c.wait()

    # ---- 2. attend ring-only, S tiles double-buffered ----------------------
    m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    tiles = []
    t0 = 0
    while t0 < s_total:
        tiles.append((t0, min(bs, s_total - t0)))
        t0 += bs

    rows0 = pid * n_rows

    def _tile_copies(t_idx, buf):
        start, size = tiles[t_idx]
        cps = [
            pltpu.make_async_copy(
                ck_ref.at[li, pl.ds(rows0, n_rows), pl.ds(start, size), :],
                k_buf.at[buf, :, pl.ds(0, size), :],
                r_sem.at[buf, 0],
            ),
            pltpu.make_async_copy(
                cv_ref.at[li, pl.ds(rows0, n_rows), pl.ds(start, size), :],
                v_buf.at[buf, :, pl.ds(0, size), :],
                r_sem.at[buf, 1],
            ),
        ]
        if scaled:
            cps += [
                pltpu.make_async_copy(
                    ks_ref.at[li, pl.ds(rows0, n_rows), :, pl.ds(start, size)],
                    ksb_buf.at[buf, :, :, pl.ds(0, size)],
                    r_sem.at[buf, 2],
                ),
                pltpu.make_async_copy(
                    vs_ref.at[li, pl.ds(rows0, n_rows), :, pl.ds(start, size)],
                    vsb_buf.at[buf, :, :, pl.ds(0, size)],
                    r_sem.at[buf, 3],
                ),
            ]
        return cps

    for c in _tile_copies(0, 0):
        c.start()

    for t_idx, (start, size) in enumerate(tiles):
        buf = t_idx % 2
        if t_idx + 1 < len(tiles):
            for c in _tile_copies(t_idx + 1, 1 - buf):
                c.start()
        for c in _tile_copies(t_idx, buf):
            c.wait()

        for r in range(n_rows):
            qp = qpos_ref[r]  # (G*T,)
            kp = kpos_ref[r, pl.ds(start, size)]
            kval = kvalid_ref[r, pl.ds(start, size)]
            delta = qp[:, None] - kp[None, :]  # (G*T, size)
            ok1 = (delta >= 0) & (delta < w) & (kval > 0)[None, :]

            k_all = k_buf[buf, r, pl.ds(0, size), :].astype(q_ref.dtype)
            v_all = v_buf[buf, r, pl.ds(0, size), :].astype(q_ref.dtype)

            HT = H * T
            rsl = slice(r * HT, (r + 1) * HT)
            m_prev = m_scr[rsl, :1]
            rows_s = []
            for j in range(n_kv):
                sj = jax.lax.dot_general(
                    q_ref[r, j], k_all[:, j * D : (j + 1) * D],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (G*T, size)
                if scaled:
                    sj = sj * (ksb_buf[buf, r, j, pl.ds(0, size)][None, :] * scale)
                else:
                    sj = sj * scale
                rows_s.append(jnp.where(ok1, sj, _NEG_INF))
            scores = jnp.concatenate(rows_s, axis=0)  # (Hkv*G*T, size)

            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
            alpha = jnp.where(m_prev > _NEG_INF / 2, jnp.exp(m_prev - m_new), 0.0)
            p = jnp.exp(scores - m_new)
            l_new = alpha * l_scr[rsl, :1] + jnp.sum(p, axis=-1, keepdims=True)

            ok_col = (kval > 0)[None, :]
            outs = []
            for j in range(n_kv):
                pg = p[j * GT : (j + 1) * GT, :]
                if scaled:
                    pg = pg * vsb_buf[buf, r, j, pl.ds(0, size)][None, :]
                pj = jnp.where(ok_col, pg, 0.0).astype(q_ref.dtype)
                outs.append(
                    jax.lax.dot_general(
                        pj, v_all[:, j * D : (j + 1) * D],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            acc_scr[rsl, :] = acc_scr[rsl, :] * alpha + jnp.concatenate(outs, 0)
            m_scr[rsl, :1] = m_new
            l_scr[rsl, :1] = l_new

    for r in range(n_rows):
        for j in range(n_kv):
            for g in range(G):
                base = r * H * T + j * GT + g * T
                blk = acc_scr[pl.ds(base, T), :]
                l = jnp.maximum(l_scr[pl.ds(base, T), :1], 1e-30)
                h = j * G + g
                o_ref[r, :, pl.ds(h * D, D)] = (blk / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_verify_chunk_attention(
    xq: jax.Array,  # (B, T, H, D)
    xk: jax.Array,  # (B, T, Hkv, D) — post-rope, pre-quantization
    xv: jax.Array,
    CK: jax.Array,  # (L, B, S, Hkv*D) ring dtype — returned updated
    CV: jax.Array,
    KS,  # (L, B, Hkv, S) f32, or None for bf16 rings
    VS,
    li: jax.Array,  # scalar int32
    window: jax.Array,  # scalar int32
    write_slot0: jax.Array,  # (B,) int32 — FIRST token's slot, -1 = dead row
    q_pos: jax.Array,  # (B, T) int32
    kv_pos: jax.Array,  # (B, S) int32 — AFTER-write slot positions
    kv_valid: jax.Array,  # (B, S) bool — AFTER-write
    interpret: bool = None,
):
    """Returns (out (B, T, H*D), CK', CV', KS', VS') with the stacks updated
    IN PLACE. See _fused_verify_kernel for the contract (non-wrapping ring,
    T consecutive slots per live row, T <= 8)."""
    B, T, H, D = xq.shape
    assert 1 <= T <= 8, "verify chunks are K+1 <= 8 tokens"
    L, S = CK.shape[0], CK.shape[2]
    Hkv = CK.shape[3] // D
    G = H // Hkv
    assert S % 128 == 0 and S >= 128
    scaled = KS is not None
    is_int = jnp.dtype(CK.dtype) == jnp.int8
    qmax = 127.0 if is_int else 448.0

    RB = _FUSED_RB if _FUSED_RB else 8
    while B % RB:
        RB //= 2
    RB = max(RB, 1)
    BS = min(_FUSED_BS if _FUSED_BS else 1024, S)
    LWIN = 256 if S >= 256 else 128

    scalars = jnp.concatenate([
        jnp.stack([jnp.asarray(li, jnp.int32), jnp.asarray(window, jnp.int32)]),
        write_slot0.astype(jnp.int32),
    ])

    # (j, g, t)-major query rows: per (row, kv-head) the kernel runs ONE
    # (G*T, D) x (D, size) dot; per-score-row positions tile as g*T + t.
    qr = (
        xq.reshape(B, T, Hkv, G, D)
        .transpose(0, 2, 3, 1, 4)
        .reshape(B, Hkv, G * T, D)
    )
    qpos_gt = jnp.tile(q_pos.astype(jnp.int32), (1, G))  # (B, G*T)

    kernel = functools.partial(
        _fused_verify_kernel, scale=D**-0.5, n_kv=Hkv, n_rows=RB, n_tok=T,
        s_total=S, bs=BS, lwin=LWIN, scaled=scaled, qmax=qmax, is_int=is_int,
    )

    in_specs = [
        pl.BlockSpec((RB, Hkv, G * T, D), lambda b, sref: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, T, Hkv * D), lambda b, sref: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, T, Hkv * D), lambda b, sref: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, G * T), lambda b, sref: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, S), lambda b, sref: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, S), lambda b, sref: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),  # CK
        pl.BlockSpec(memory_space=pltpu.HBM),  # CV
    ]
    operands = [
        qr, xk.reshape(B, T, Hkv * D), xv.reshape(B, T, Hkv * D),
        qpos_gt, kv_pos.astype(jnp.int32), kv_valid.astype(jnp.int32),
        CK, CV,
    ]
    if scaled:
        in_specs += [pl.BlockSpec(memory_space=pltpu.HBM)] * 2
        operands += [KS, VS]

    out_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),  # CK'
        pl.BlockSpec(memory_space=pltpu.HBM),  # CV'
    ]
    out_shape = [
        jax.ShapeDtypeStruct(CK.shape, CK.dtype),
        jax.ShapeDtypeStruct(CV.shape, CV.dtype),
    ]
    if scaled:
        out_specs += [pl.BlockSpec(memory_space=pltpu.HBM)] * 2
        out_shape += [
            jax.ShapeDtypeStruct(KS.shape, jnp.float32),
            jax.ShapeDtypeStruct(VS.shape, jnp.float32),
        ]
    out_specs.append(
        pl.BlockSpec((RB, T, H * D), lambda b, sref: (b, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    out_shape.append(jax.ShapeDtypeStruct((B, T, H * D), xq.dtype))

    rdt = CK.dtype
    scratch = (
        [pltpu.VMEM((16, Hkv * D), rdt) for _ in range(RB)]  # gk_scrs
        + [pltpu.VMEM((16, Hkv * D), rdt) for _ in range(RB)]  # gv_scrs
    )
    if scaled:
        scratch += [pltpu.VMEM((Hkv, LWIN), jnp.float32) for _ in range(2 * RB)]
    scratch += [
        pltpu.VMEM((2, RB, BS, Hkv * D), rdt),  # k_buf
        pltpu.VMEM((2, RB, BS, Hkv * D), rdt),  # v_buf
    ]
    if scaled:
        scratch += [
            pltpu.VMEM((2, RB, Hkv, BS), jnp.float32),
            pltpu.VMEM((2, RB, Hkv, BS), jnp.float32),
        ]
    scratch += [
        pltpu.SemaphoreType.DMA((RB, 4)),
        pltpu.SemaphoreType.DMA((2, 4)),
        pltpu.VMEM((RB * H * T, 128), jnp.float32),
        pltpu.VMEM((RB * H * T, 128), jnp.float32),
        pltpu.VMEM((RB * H * T, D), jnp.float32),
    ]

    # flattened-operand aliasing incl. the scalar-prefetch arg:
    # scalars=0, qr=1, xk=2, xv=3, qpos=4, kv_pos=5, kv_valid=6, CK=7, ...
    n_alias = 4 if scaled else 2
    aliases = {7 + i: i for i in range(n_alias)}

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // RB,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_resolve_interpret(interpret),
    )(scalars, *operands)
    if scaled:
        ck, cv, ks, vs, out = outs
    else:
        (ck, cv, out), ks, vs = outs, KS, VS
    return out, ck, cv, ks, vs
