"""Quantized-weight linear application (INT8 / packed INT4 weight-only).

New capability vs the reference (which is bf16/fp16-only; quantization is
the framework's north-star perf path, see BASELINE.md).

Representation of a quantized weight — a dict leaf in the params pytree:
    INT8:  {"q":  int8 (..., in,   out), "scale": fp32 (..., n_groups, out)}
    INT4:  {"q4": int8 (..., in/2, out), "scale": fp32 (..., n_groups, out)}
Grouped symmetric quantization along the reduction axis (group size G along
``in``), no zero points. INT4 packs two signed nibbles per int8 in
**split-halves** layout: byte row r holds element r (low nibble) and element
r + in/2 (high nibble) — unpacking is then a plain concat along the
reduction axis, with no sublane interleave (which is expensive on the TPU
VPU). The key name ("q" vs "q4") carries the packing statically — it
survives ``lax.scan`` over stacked layers, where array metadata would be
traced.

The XLA path dequantizes in-registers next to the matmul — HBM traffic (the
decode bottleneck) is int8/int4 + small scales. The Pallas fused
dequant-matmul kernel (ops/pallas) replaces this on the hot path.
"""

from __future__ import annotations

import os
from typing import Dict, Union

import jax
import jax.numpy as jnp

QuantWeight = Dict[str, jax.Array]
Weight = Union[jax.Array, QuantWeight]

DEFAULT_GROUP = 128


def is_quantized(w: Weight) -> bool:
    return isinstance(w, dict) and ("q" in w or "q4" in w)


def quantize_weight(w: jax.Array, bits: int, group: int = DEFAULT_GROUP) -> QuantWeight:
    """(..., in, out) fp → grouped symmetric int. Scales are fp32."""
    assert bits in (8, 4)
    *lead, K, N = w.shape
    g = min(group, K)
    assert K % g == 0, (K, g)
    ng = K // g
    wf = w.astype(jnp.float32).reshape(*lead, ng, g, N)
    qmax = 127.0 if bits == 8 else 7.0
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # (..., ng, 1, N)
    scale = jnp.maximum(absmax / qmax, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -qmax, qmax).astype(jnp.int8)
    q = q.reshape(*lead, K, N)
    scale = scale[..., 0, :]  # (..., ng, N)
    if bits == 4:
        assert K % 2 == 0
        half = K // 2
        lo = q[..., :half, :]
        hi = q[..., half:, :]
        return {"q4": ((lo & 0x0F) | (hi << 4)).astype(jnp.int8), "scale": scale}
    return {"q": q, "scale": scale}


def _unpack_int4(q: jax.Array) -> jax.Array:
    """(..., K/2, N) split-halves packed → (..., K, N) signed int8 in [-8, 7]."""
    qi = q.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(qi, 28), 28)  # sign-extend low nibble
    hi = jnp.right_shift(qi, 4)  # arithmetic: high nibble sign-extends
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.int8)


def dequant(w: Weight, dtype: jnp.dtype) -> jax.Array:
    """Materialize a (possibly quantized) weight as a dense array."""
    if not is_quantized(w):
        return w.astype(dtype)
    if "li" in w:  # layer-stacked leaf: slice this layer first
        w = {
            k: jax.lax.dynamic_index_in_dim(v, w["li"], 0, keepdims=False)
            for k, v in w.items()
            if k != "li"
        }
    q = _unpack_int4(w["q4"]) if "q4" in w else w["q"]
    *lead, K, N = q.shape
    ng = w["scale"].shape[-2]
    g = K // ng
    deq = q.reshape(*lead, ng, g, N).astype(jnp.float32) * w["scale"][..., :, None, :]
    return deq.reshape(*lead, K, N).astype(dtype)


_ON_TPU = None


def _on_tpu() -> bool:
    global _ON_TPU
    if _ON_TPU is None:
        try:
            _ON_TPU = jax.devices()[0].platform == "tpu"
        except RuntimeError:
            _ON_TPU = False
    return _ON_TPU


DECODE_ROWS_MAX = 256  # pallas-kernel gate; prefill rows (B·T) go to XLA


def _hbm_dequant_rows(pallas: bool, rows: int) -> bool:
    """Gate for the materialize-bf16-weights-then-GEMM prefill path (see
    linear below): large row counts on an accelerator, default >= 8192
    (r4 A/B: CTX=512 prefill MFU 0.514 -> 0.590; CTX=128 chunks lose),
    MISTRAL_PREFILL_DEQUANT=hbm|fused overrides."""
    on_accel = _on_tpu() or os.environ.get("MISTRAL_PALLAS_INTERPRET") == "1"
    deq_env = os.environ.get("MISTRAL_PREFILL_DEQUANT")
    return (
        pallas and on_accel and rows > DECODE_ROWS_MAX
        and (deq_env == "hbm" or (deq_env is None and rows >= 8192))
    )


def linear_fused(
    x: jax.Array, ws: list, pallas: bool = True, mesh=None, tag: str = ""
) -> list:
    """Several x @ W_i sharing the same input, computed as ONE wide-N GEMM
    against the concatenated (barriered) weights, outputs split back per
    weight. v5e XLA GEMM efficiency scales strongly with N at prefill row
    counts (M=16384, measured r4: N=1024 -> 0.23 MFU, 4096 -> 0.55,
    6144 -> 0.62, 28672 -> 0.86), so fusing wq|wk|wv and w1|w3 recovers
    ~5.6 ms/layer of 7B prefill. Active only on the hbm-dequant prefill
    path (single device — under a mesh each weight carries its own output
    -axis sharding and GSPMD handles the separate GEMMs); other paths fall
    back to per-weight linear(). The optimization_barrier keeps XLA from
    re-splitting the concatenated GEMM back into narrow ones."""
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    # Default qkv-only: the r4 on-chip A/B measured QKV fusion ~neutral-to
    # -slightly-positive in the full prefill program (MFU 0.590 -> 0.591)
    # but w1|w3 fusion a 13% REGRESSION (0.590 -> 0.513) despite isolated
    # GEMM probes favoring both — the 940 MB fused activation and its
    # strided halves scheduled worse in-program. Ground truth is the bench.
    fuse = os.environ.get("MISTRAL_PREFILL_FUSE", "qkv")
    enabled = fuse == "all" or (tag and tag in fuse.split(","))
    if not enabled or mesh is not None or not _hbm_dequant_rows(pallas, rows):
        return [linear(x, w, pallas=pallas, mesh=mesh) for w in ws]
    parts = [dequant(w, x.dtype) if is_quantized(w) else w for w in ws]
    wd = jax.lax.optimization_barrier(jnp.concatenate(parts, axis=-1))
    y = x @ wd
    outs, o = [], 0
    for p in parts:
        outs.append(y[..., o : o + p.shape[-1]])
        o += p.shape[-1]
    return outs


def linear(x: jax.Array, w: Weight, pallas: bool = True, mesh=None) -> jax.Array:
    """x @ W for a plain or quantized (unstacked) weight leaf.

    ``pallas=False`` forces the XLA dequant path regardless of platform.
    With ``mesh`` given (and pallas on), the kernel runs per shard via
    ``jax.shard_map`` — rows on ``data``, W's output axis on ``tensor``
    (parallel/shmap.mm_quant_sharded; requires the pallas-mode param
    layout, param_specs(pallas=True)). Shapes that don't divide the mesh
    fall back to the XLA dequant path, which GSPMD partitions.

    Quantized decode shapes (≤ DECODE_ROWS_MAX rows) on TPU route to the
    Pallas fused dequant-matmul kernel — W is dequantized in VMEM next to
    the MXU, never materialized in HBM. Larger (prefill) shapes use the XLA
    path, where the matmul is compute-bound and XLA's fusion is already
    right. The r1 gate was rows <= 32, which silently dropped B >= 64
    decode onto the XLA dequant path (a full bf16 weight materialization
    per matmul per step — the B=64 throughput cliff, 1572 -> 521 tok/s).
    The x block at rows=256, K=14336 is 7.3MB VMEM — comfortable next to
    the <= 4MB weight tiles in the 128MB v5e VMEM."""
    if not is_quantized(w):
        return x @ w
    K = x.shape[-1]
    N = w["scale"].shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    on_accel = _on_tpu() or os.environ.get("MISTRAL_PALLAS_INTERPRET") == "1"
    if (
        pallas and mesh is not None and on_accel
        and rows <= DECODE_ROWS_MAX and N % 128 == 0 and K % 128 == 0
    ):
        from mistral_inference_tpu.parallel.shmap import mm_quant_sharded

        out = mm_quant_sharded(x.reshape(rows, K), w, mesh)
        if out is not None:
            return out.reshape(*x.shape[:-1], N)
        return x @ dequant(w, x.dtype)
    if _hbm_dequant_rows(pallas, rows):
        # Large prefill chunks: materialize the bf16 weight once in HBM
        # behind an optimization barrier, then run a plain GEMM. Inside
        # XLA's fused dequant-matmul the weight tile is re-dequantized for
        # every M-tile of x rows (VPU work scaling with rows/tile_M stalls
        # the MXU); the barrier trades that for one extra 2·params HBM
        # write+read, which only amortizes at enough rows (r4 on-chip A/B:
        # B=32 CTX=512 prefill MFU 0.514 -> 0.590; CTX=128 chunks LOSE,
        # 0.495 -> 0.455 — hence the 8192-row default gate;
        # MISTRAL_PREFILL_DEQUANT=hbm|fused overrides).
        wd = jax.lax.optimization_barrier(dequant(w, x.dtype))
        return x @ wd
    if (
        pallas and on_accel and mesh is None
        and DECODE_ROWS_MAX < rows and rows % 256 == 0
        and N % 128 == 0 and K % 256 == 0
        and os.environ.get("MISTRAL_PREFILL_QMM", "pallas") == "pallas"
    ):
        # Mid-band prefill rows (256 < rows < the 8192 hbm-dequant gate):
        # the r5 M-tiled direct-INT kernel (the sorted-grouped MoE kernel's
        # E=1 degenerate case) streams INT bytes straight to VMEM — no
        # per-M-tile re-dequant, no bf16 materialization. Isolated r5 A/B
        # at 4096 rows (prefill_quant_gemm_probe_r5.log): 4.97 -> 4.56 ms
        # on the w1/w3-class int4 GEMM vs XLA's fused dequant; in-program
        # full-prefill A/B in the same log's note.
        from mistral_inference_tpu.ops.pallas.moe_matmul import (
            moe_matmul_quant_ragged,
        )

        q = w["q4"] if "q4" in w else w["q"]
        if "li" in w:
            # A dense (L, K', N) layer stack is the kernel's "expert" axis:
            # a tile_group vector filled with the layer index selects layer
            # li for every M-tile — the stacked-dense case needs no extra
            # machinery.
            tg = jnp.full((rows // 256,), w["li"], jnp.int32)
            out = moe_matmul_quant_ragged(x.reshape(rows, K), q, w["scale"], tg)
        else:
            out = moe_matmul_quant_ragged(
                x.reshape(rows, K), q[None], w["scale"][None],
                jnp.zeros((rows // 256,), jnp.int32),
            )
        return out.reshape(*x.shape[:-1], N)
    if pallas and on_accel and mesh is None and rows <= DECODE_ROWS_MAX and N % 128 == 0 and K % 128 == 0:
        q = w["q4"] if "q4" in w else w["q"]
        if "li" in w:
            # Layer-stacked leaf (models/transformer.forward keeps the big
            # quantized stacks OUT of the scan xs): the kernel indexes the
            # (L, ...) stack via a prefetched scalar — no per-layer slice
            # copy of the weights is ever materialized.
            from mistral_inference_tpu.ops.pallas.matmul_quant import (
                matmul_quant_stacked,
            )

            out = matmul_quant_stacked(x.reshape(rows, K), q, w["scale"], w["li"])
        else:
            from mistral_inference_tpu.ops.pallas.matmul_quant import matmul_quant

            out = matmul_quant(x.reshape(rows, K), q, w["scale"])
        return out.reshape(*x.shape[:-1], N)
    return x @ dequant(w, x.dtype)
