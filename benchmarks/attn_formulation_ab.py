"""On-chip A/B of ONE LAYER's decode attention formulations at the long
ring (B=32, Hkv=8, G=4, D=128, S=4224, int8 ring + f32 scales).

Why: every existing path is 6-10x off the true decode-attention floor.
GQA decode gives each (row, kv-head) dot only G = H/Hkv = 4 useful MXU
rows out of 128, so the MXU streams the whole ring per kv-head at ~3%
utilization — the per-layer MXU cost is ~2.1 ms where the VPU
multiply-reduce cost of the same arithmetic is ~0.7 ms (v5e VPU ~6.1T
f32 ops/s). The VPU score pass wants K stored TRANSPOSED ((Hkv*D, S):
S on lanes, contraction on sublanes); the VPU V pass wants V in the
current native layout ((S, Hkv*D)). This harness measures, per layer:

  mxu:    the production decode kernel formulation (per-kv-head MXU dots,
          K/V native layout) — distilled copy of _decode_attn_kernel
  vpu:    VPU broadcast-multiply + sublane-reduce for BOTH passes
          (K transposed block, V native block)
  xla:    attend_scaled on a PRE-SLICED ring (XLA fusions; excludes the
          per-layer slice copy the real path pays)

Methodology as kernel_ab.py: one jitted lax.scan of NITER serial calls,
carry-dependent so iterations can't fuse; ring re-streamed from HBM.
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

NITER = 64
B, H, Hkv, D = 32, 32, 8, 128
G = H // Hkv
S = 4096  # the deployed long-context window (tiles must be 128-multiples)
RB = 8
BS = 2048  # S/2 — two S-tiles per row-block
_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Variant "mxu": production formulation (per-kv-head dots over native K/V)
# ---------------------------------------------------------------------------


def _mxu_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, m_scr, l_scr, a_scr):
    s = pl.program_id(1)
    num_s = pl.num_programs(1)

    @pl.when(s == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        a_scr[...] = jnp.zeros_like(a_scr)

    for r in range(RB):
        q = q_ref[r]  # (H, D)
        rsl = slice(r * H, (r + 1) * H)
        m_prev = m_scr[rsl, :1]
        k_all = k_ref[r].astype(q.dtype)  # (BS, Hkv*D)
        v_all = v_ref[r].astype(q.dtype)
        rows = []
        for j in range(Hkv):
            sj = jax.lax.dot_general(
                q[j * G : (j + 1) * G, :], k_all[:, j * D : (j + 1) * D],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            rows.append(sj * (ks_ref[r, j, :][None, :] * (D ** -0.5)))
        scores = jnp.concatenate(rows, axis=0)  # (H, BS)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.where(m_prev > _NEG_INF / 2, jnp.exp(m_prev - m_new), 0.0)
        p = jnp.exp(scores - m_new)
        l_new = alpha * l_scr[rsl, :1] + jnp.sum(p, axis=-1, keepdims=True)
        outs = []
        for j in range(Hkv):
            pg = (p[j * G : (j + 1) * G, :] * vs_ref[r, j, :][None, :]).astype(q.dtype)
            outs.append(
                jax.lax.dot_general(
                    pg, v_all[:, j * D : (j + 1) * D], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        a_scr[rsl, :] = a_scr[rsl, :] * alpha + jnp.concatenate(outs, axis=0)
        m_scr[rsl, :1] = m_new
        l_scr[rsl, :1] = l_new

    @pl.when(s == num_s - 1)
    def _fin():
        for r in range(RB):
            rsl = slice(r * H, (r + 1) * H)
            o_ref[r] = (a_scr[rsl, :] / jnp.maximum(l_scr[rsl, :1], 1e-30)).astype(
                o_ref.dtype
            )


def make_mxu(qd):
    return pl.pallas_call(
        _mxu_kernel,
        grid=(B // RB, S // BS),
        in_specs=[
            pl.BlockSpec((RB, H, D), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, BS, Hkv * D), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, BS, Hkv * D), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, Hkv, BS), lambda b, s: (b, 0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, Hkv, BS), lambda b, s: (b, 0, s), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, H, D), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((RB * H, 128), jnp.float32),
            pltpu.VMEM((RB * H, 128), jnp.float32),
            pltpu.VMEM((RB * H, D), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, H, D), qd),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )


# ---------------------------------------------------------------------------
# Variant "vpu": multiply + sublane-reduce, K transposed / V native
# ---------------------------------------------------------------------------


def _vpu_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, m_scr, l_scr, a_scr):
    """VPU formulation over the NATIVE (BS, Hkv*D) ring layout — no MXU,
    no transposed storage:

      score pass  s_t[s, g] = sum_d K_j[s, d] * q[g, d]
        -> broadcast q row (1, D) over sublanes, multiply K_j (BS, D),
           reduce over LANES (d) -> (BS, 1); concat G lanes -> (BS, G).
      softmax runs transposed: stats are sublane-reductions -> (1, G).
      V pass      out[g, d] = sum_s p_t[s, g] * V_j[s, d]
        -> broadcast p column (BS, 1) over lanes, multiply V_j (BS, D),
           reduce over SUBLANES (s) -> (1, D) row of the output.

    The (1, G) -> (G, 1) alpha flip per (row, kv-head, tile) is the only
    cross-layout move, on a 4-element vector."""
    s = pl.program_id(1)
    num_s = pl.num_programs(1)

    @pl.when(s == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        a_scr[...] = jnp.zeros_like(a_scr)

    scale = D ** -0.5
    for r in range(RB):
        q = q_ref[r].astype(jnp.float32) * scale  # (H, D)
        for j in range(Hkv):
            kj = k_ref[r, :, j * D : (j + 1) * D].astype(jnp.float32)  # (BS, D)
            ks_col = ks_ref[r, j, :][:, None]  # (BS, 1)
            cols = []
            for g in range(G):
                qg = q[j * G + g : j * G + g + 1, :]  # (1, D)
                cols.append(jnp.sum(kj * qg, axis=1, keepdims=True))  # (BS, 1)
            st = jnp.concatenate(cols, axis=1) * ks_col  # (BS, G)

            row = r * Hkv + j
            m_prev = m_scr[row : row + 1, :G]  # (1, G)
            m_new = jnp.maximum(m_prev, jnp.max(st, axis=0, keepdims=True))
            alpha = jnp.where(m_prev > _NEG_INF / 2, jnp.exp(m_prev - m_new), 0.0)
            pt = jnp.exp(st - m_new)  # (BS, G)
            l_new = alpha * l_scr[row : row + 1, :G] + jnp.sum(
                pt, axis=0, keepdims=True
            )
            pt = pt * vs_ref[r, j, :][:, None]  # fold per-slot V scale

            vj = v_ref[r, :, j * D : (j + 1) * D].astype(jnp.float32)  # (BS, D)
            outs = []
            for g in range(G):
                pg = pt[:, g : g + 1]  # (BS, 1)
                outs.append(jnp.sum(pg * vj, axis=0, keepdims=True))  # (1, D)
            block = jnp.concatenate(outs, axis=0)  # (G, D)

            asl = slice((r * H + j * G), (r * H + j * G) + G)
            alpha_col = alpha[0][:, None]  # (G, 1) — the tiny relayout
            a_scr[asl, :] = a_scr[asl, :] * alpha_col + block
            m_scr[row : row + 1, :G] = m_new
            l_scr[row : row + 1, :G] = l_new

    @pl.when(s == num_s - 1)
    def _fin():
        for r in range(RB):
            for j in range(Hkv):
                row = r * Hkv + j
                asl = slice((r * H + j * G), (r * H + j * G) + G)
                l_col = l_scr[row, :G][:, None]  # (G, 1)
                o_ref[r, j * G : (j + 1) * G, :] = (
                    a_scr[asl, :] / jnp.maximum(l_col, 1e-30)
                ).astype(o_ref.dtype)


def make_vpu(qd):
    return pl.pallas_call(
        _vpu_kernel,
        grid=(B // RB, S // BS),
        in_specs=[
            pl.BlockSpec((RB, H, D), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, BS, Hkv * D), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, BS, Hkv * D), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, Hkv, BS), lambda b, s: (b, 0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, Hkv, BS), lambda b, s: (b, 0, s), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, H, D), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((RB * Hkv, 128), jnp.float32),
            pltpu.VMEM((RB * Hkv, 128), jnp.float32),
            pltpu.VMEM((RB * H, D), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, H, D), qd),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )



# ---------------------------------------------------------------------------
# MXU probes: how many MXUs does a pallas dot engage on v5e?
#   bigdot:   one (128, 1024) @ (1024, BS) dot per program — N huge, should
#             split across all 4 MXUs if Mosaic can.
#   smalldots: Hkv independent (G, D) @ (D, BS) dots per program — the
#             production score-dot shape; measures whether independent tiny
#             dots pipeline in parallel across MXUs.
# Grid/blocks mirror the mxu variant so DMA traffic is identical.
# ---------------------------------------------------------------------------


def _bigdot_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, acc_scr):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    for r in range(RB):
        k_all = k_ref[r].astype(jnp.bfloat16)  # (BS, Hkv*D)
        # 128 loaded rows against the SAME streamed K bytes as the 8 small
        # dots combined: contraction over the shared Hkv*D lane dim.
        q128 = jnp.broadcast_to(
            q_ref[r].reshape(1, H * D)[:, : Hkv * D], (128, Hkv * D)
        ).astype(jnp.bfloat16)
        big = jax.lax.dot_general(  # (128, Hkv*D) x (BS, Hkv*D) -> (128, BS)
            q128, k_all, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[r * H : (r + 1) * H, :1] += jnp.sum(
            big[:H], -1, keepdims=True
        )

    @pl.when(s == pl.num_programs(1) - 1)
    def _fin():
        for r in range(RB):
            o_ref[r] = acc_scr[r * H : (r + 1) * H, :D].astype(o_ref.dtype)


def _smalldots_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, acc_scr):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    for r in range(RB):
        q = q_ref[r]  # (H, D)
        k_all = k_ref[r].astype(q.dtype)
        for j in range(Hkv):
            sj = jax.lax.dot_general(
                q[j * G : (j + 1) * G, :], k_all[:, j * D : (j + 1) * D],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )  # (G, BS)
            acc_scr[r * H + j * G : r * H + (j + 1) * G, :1] += jnp.sum(
                sj, -1, keepdims=True
            )

    @pl.when(s == pl.num_programs(1) - 1)
    def _fin():
        for r in range(RB):
            o_ref[r] = acc_scr[r * H : (r + 1) * H, :D].astype(o_ref.dtype)



def _stream_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, acc_scr):
    """DMA ceiling probe: touch every K/V block with near-zero compute.
    If this also lands at ~300 GB/s, the bound is block-shape DMA
    pipelining, not the MXU dots."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    for r in range(RB):
        ksub = k_ref[r, :8, :128].astype(jnp.float32)   # (8, 128)
        vsub = v_ref[r, :8, :128].astype(jnp.float32)
        acc_scr[r * H : r * H + 8, :] += ksub + vsub

    @pl.when(s == pl.num_programs(1) - 1)
    def _fin():
        for r in range(RB):
            o_ref[r] = acc_scr[r * H : (r + 1) * H, :D].astype(o_ref.dtype)



def _s8dots_kernel(q8_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, acc_scr):
    """Score pass with NATIVE int8 MXU dots: q pre-quantized to s8, ring K
    already s8, dot -> s32. If the v5e int8 MXU mode engages from Mosaic,
    this should measure ~2x the bf16 smalldots probe."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    for r in range(RB):
        q = q8_ref[r]  # (H, D) s8
        k_all = k_ref[r]  # (BS, Hkv*D) s8 — NO cast
        for j in range(Hkv):
            sj = jax.lax.dot_general(
                q[j * G : (j + 1) * G, :], k_all[:, j * D : (j + 1) * D],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
            )  # (G, BS) s32
            acc_scr[r * H + j * G : r * H + (j + 1) * G, :1] += jnp.sum(
                sj, -1, keepdims=True
            ).astype(jnp.float32)

    @pl.when(s == pl.num_programs(1) - 1)
    def _fin():
        for r in range(RB):
            o_ref[r] = acc_scr[r * H : (r + 1) * H, :D].astype(o_ref.dtype)


def make_probe(kern, qd):
    return pl.pallas_call(
        kern,
        grid=(B // RB, S // BS),
        in_specs=[
            pl.BlockSpec((RB, H, D), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, BS, Hkv * D), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, BS, Hkv * D), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, Hkv, BS), lambda b, s: (b, 0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, Hkv, BS), lambda b, s: (b, 0, s), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, H, D), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((RB * H, 128), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((B, H, D), qd),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )


# ---------------------------------------------------------------------------


def _time(fn, q0, label, *operands):
    """fn(q, *operands) — operands are explicit jit args, NOT closure
    constants: closed-over device arrays are embedded into the lowered
    module, and a 134 MB ring in the payload overflows the remote-compile
    tunnel (HTTP 413)."""
    stepped = jax.jit(
        lambda q, *ops: jax.lax.scan(
            lambda c, _: ((c + fn(c, *ops)[..., :D] * 1e-6).astype(c.dtype), None),
            q, None, length=NITER,
        )[0]
    )
    out = stepped(q0, *operands)
    out.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(stepped(q0, *operands))
    dt = time.perf_counter() - t0
    us = dt / NITER * 1e6
    print(json.dumps({
        "variant": label, "us_per_layer": round(us, 1),
        "ring_GBps": round(2 * B * S * Hkv * D / (dt / NITER) / 1e9, 1),
    }), flush=True)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.integers(-127, 127, (B, S, Hkv * D)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 127, (B, S, Hkv * D)), jnp.int8)
    ks = jnp.asarray(rng.random((B, Hkv, S)) * 0.01 + 0.005, jnp.float32)
    vs = jnp.asarray(rng.random((B, Hkv, S)) * 0.01 + 0.005, jnp.float32)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("check",):
        # numerics cross-check in interpret mode on tiny shapes is covered
        # by the real kernels' tests; here cross-check the full (B, H, D)
        # mxu vs vpu outputs on-device. Neither AB kernel applies
        # ring-validity masking, so the tolerance is only meaningful on the
        # fully-valid synthetic ring used here.
        mxu = make_mxu(q.dtype)
        vpu = make_vpu(q.dtype)
        a = mxu(q, k, v, ks, vs)
        b_ = vpu(q, k, v, ks, vs)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32))))
        print(json.dumps({"cross_check_max_abs_err": round(err, 6)}))
    if which in ("all", "mxu"):
        mxu = make_mxu(q.dtype)
        _time(lambda qq, *o: mxu(qq, *o), q, "mxu-per-kvhead-dots", k, v, ks, vs)
    if which in ("vpu",):
        vpu = make_vpu(q.dtype)
        _time(lambda qq, *o: vpu(qq, *o), q, "vpu-mult-reduce", k, v, ks, vs)
    if which in ("all", "bigdot"):
        _time(lambda qq, *o: make_probe(_bigdot_kernel, qq.dtype)(qq, *o), q, "probe-bigdot-128row", k, v, ks, vs)
    if which in ("all", "smalldots"):
        _time(lambda qq, *o: make_probe(_smalldots_kernel, qq.dtype)(qq, *o), q, "probe-smalldots-G4", k, v, ks, vs)
    if which in ("all", "s8dots"):
        q8 = jnp.asarray(np.random.default_rng(2).integers(-127, 127, (B, H, D)), jnp.int8)
        _time(lambda qq, *o: make_probe(_s8dots_kernel, jnp.bfloat16)(qq, *o), q8,
              "probe-s8dots-score", k, v, ks, vs)
    if which in ("all", "stream"):
        _time(lambda qq, *o: make_probe(_stream_kernel, qq.dtype)(qq, *o), q, "probe-stream-only", k, v, ks, vs)
    if which in ("all", "xla"):
        from mistral_inference_tpu.ops.attention import attend_scaled

        def xla_fn(qq, k, v, ks, vs):
            return attend_scaled(
                qq[:, None], k.reshape(B, S, Hkv, D), v.reshape(B, S, Hkv, D),
                jnp.moveaxis(ks, 1, 2), jnp.moveaxis(vs, 1, 2), None,
            ).reshape(B, H, D)

        _time(xla_fn, q, "xla-attend-scaled-presliced", k, v, ks, vs)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
