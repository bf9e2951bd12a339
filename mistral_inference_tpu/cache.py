"""Functional rolling-buffer KV cache.

Reference design: per-layer ``(max_batch, cache_size, n_kv_heads, head_dim)``
ring buffers mutated in place with ``index_copy_`` and host-computed metadata
objects per step (reference: cache.py:140-263).

TPU-native redesign:
  * One stacked pair of arrays ``(L, B, W, Hkv*Dh)`` (flat-head — see the
    KVCache layout note) so the layer stack can be a single ``lax.scan``
    and the pallas ring kernels consume the carry with zero relayouts.
  * Pure-functional updates (donated by the jitted step, so XLA updates the
    buffers in place anyway — no copies).
  * All metadata (ring slots, validity, absolute positions of slots) is
    computed **inside the compiled program** from two small vectors:
    ``kv_len (B,)`` and the per-layer ``windows (L,)`` — no host round trips
    per step, unlike the reference's ``get_input_metadata``
    (reference: cache.py:197-263).
  * Per-layer sliding windows (list form) share one W = max(window) buffer;
    each layer's ring arithmetic uses its own window — same semantics as the
    reference's per-layer cache sizes (reference: cache.py:13-24) at the cost
    of a little padding, in exchange for a scannable homogeneous stack.

The equivalent of the reference's ``unrotate`` + ``interleave_kv``
(reference: cache.py:59-67,94-117) is **not needed**: attention is computed
over ``[ring slots ++ current chunk]`` with a mask built from each slot's
recovered absolute position (``slot_positions``) — softmax is permutation
invariant over keys, so chronological re-ordering is pointless work.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple, Union

import functools

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "kv_len", "windows", "k_scale", "v_scale"],
    meta_fields=[],
)
@dataclass
class KVCache:
    # STORED LAYOUTS ARE KERNEL LAYOUTS (chosen for the TPU decode path,
    # where the ring is re-read every token):
    #   k/v: (L, B, W, Hkv*Dh) flat-head. TPU tiles the last two dims
    #     (8, 128); a (..., Hkv, Dh) = (8, 128) store tiles per-slot, and
    #     any reshape to flat-head for a kernel is a PHYSICAL relayout —
    #     4 GB per decode step at the 7B/4096-ring config. Flat storage
    #     makes the pallas decode/prefill kernels' operand the carry itself.
    #   k_scale/v_scale: (L, B, Hkv, W) — W on lanes. The transposed
    #     (..., W, Hkv) form puts Hkv=8 on lanes and pads 8 -> 128 (16x:
    #     a 138 MB scale array occupied 2.2 GB of HBM).
    k: jax.Array  # (L, B, W, Hkv*Dh)
    v: jax.Array  # (L, B, W, Hkv*Dh)
    kv_len: jax.Array  # (B,) int32 — total tokens absorbed per slot so far
    windows: jax.Array  # (L,) int32 — per-layer ring size (≤ W)
    # Per-entry FP8 scales (L, B, Hkv, W) when kv dtype is fp8; else size-0.
    k_scale: jax.Array
    v_scale: jax.Array

    @property
    def size(self) -> int:
        return self.k.shape[2]

    @property
    def is_quantized(self) -> bool:
        """True for scaled (fp8 or int8) rings — per-(token, head) fp32
        scales are present and every read must fold them back in."""
        return self.k_scale.size > 0

    @classmethod
    def alloc(
        cls,
        n_layers: int,
        batch: int,
        max_seq_len: int,
        n_kv_heads: int,
        head_dim: int,
        sliding_window: Optional[Union[int, List[Optional[int]]]] = None,
        dtype: jnp.dtype = jnp.bfloat16,
        kv_quant: str = "bf16",
    ) -> "KVCache":
        sizes = _cache_sizes(n_layers, max_seq_len, sliding_window)
        # Round the shared buffer width up to a lane multiple: the fused
        # decode kernel (ops/pallas/attention.fused_update_decode_attention)
        # streams the ring in 128-aligned manual-DMA tiles. Ring semantics
        # are unchanged — ``windows`` keeps the true per-layer sizes and
        # slots ≥ window are never written or valid (slot_positions).
        W = -(-max(sizes) // 128) * 128
        kv_dtype = kv_cache_dtype(kv_quant, dtype)
        shape = (n_layers, batch, W, n_kv_heads * head_dim)
        # bf16 scales keep a leading L axis (zero-size otherwise) so they can
        # always ride the layer lax.scan as xs.
        scale_shape = (
            (n_layers, batch, n_kv_heads, W)
            if kv_quant in ("fp8", "int8")
            else (n_layers, 0, 0, 0)
        )
        return cls(
            k=jnp.zeros(shape, kv_dtype),
            v=jnp.zeros(shape, kv_dtype),
            kv_len=jnp.zeros((batch,), jnp.int32),
            windows=jnp.asarray(sizes, jnp.int32),
            k_scale=jnp.ones(scale_shape, jnp.float32),
            v_scale=jnp.ones(scale_shape, jnp.float32),
        )

    def reset(self) -> "KVCache":
        return KVCache(
            k=self.k,
            v=self.v,
            kv_len=jnp.zeros_like(self.kv_len),
            windows=self.windows,
            k_scale=self.k_scale,
            v_scale=self.v_scale,
        )


def _cache_sizes(
    n_layers: int,
    max_seq_len: int,
    sliding_window: Optional[Union[int, List[Optional[int]]]],
) -> List[int]:
    if sliding_window is None:
        return n_layers * [max_seq_len]
    if isinstance(sliding_window, int):
        return n_layers * [min(sliding_window, max_seq_len)]
    assert n_layers % len(sliding_window) == 0
    reps = n_layers // len(sliding_window)
    return reps * [
        min(w, max_seq_len) if w is not None else max_seq_len for w in sliding_window
    ]


FP8_MAX = 448.0  # float8_e4m3fn
INT8_MAX = 127.0

# Quantized ring dtypes → the scale rule's qmax. Both store 1 byte/element
# with one fp32 scale per (token, kv-head); dequant = float(q) * scale.
# int8 exists because v5e has NO hardware fp8 converts — the e4m3→bf16 cast
# is VPU-emulated and dominates long-ring decode attention (measured: a
# bf16 ring with 2x the bytes beat the fp8 ring), while int8→bf16 is a
# native single-op convert. Quality is comparable: per-slot absmax scaling
# gives int8 7 mantissa-equivalent bits vs e4m3's 3.
_RING_QMAX = {jnp.dtype(jnp.float8_e4m3fn): FP8_MAX, jnp.dtype(jnp.int8): INT8_MAX}


def kv_cache_dtype(kv_quant: str, dtype: jnp.dtype) -> jnp.dtype:
    if kv_quant not in ("bf16", "fp8", "int8"):
        # A typo'd kv_quant silently running an unquantized bf16 ring while
        # the metric name claims a quantized config is a benchmarking trap.
        raise ValueError(
            f"kv_quant must be one of 'bf16'|'fp8'|'int8', got {kv_quant!r}"
        )
    return {"fp8": jnp.float8_e4m3fn, "int8": jnp.int8}.get(kv_quant, dtype)


def is_scaled_dtype(dtype) -> bool:
    """True for scaled ring dtypes (fp8/int8): per-(token, head) fp32 scales
    accompany the ring and every read must fold them back in."""
    return jnp.dtype(dtype) in _RING_QMAX


def _quantize_ring(x: jax.Array, kv_dtype) -> Tuple[jax.Array, jax.Array]:
    """(..., Dh) → (quantized (..., Dh), fp32 scale (...,)) under the shared
    per-(token, head) absmax rule."""
    qmax = _RING_QMAX[jnp.dtype(kv_dtype)]
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / qmax, 1e-8)
    y = xf / scale[..., None]
    if jnp.dtype(kv_dtype) == jnp.int8:
        # round-to-nearest + clip: float→int converts truncate, and absmax/127
        # roundoff can push the extreme element a ulp past ±127.
        y = jnp.clip(jnp.round(y), -INT8_MAX, INT8_MAX)
    return y.astype(kv_dtype), scale


def _ring_writes(
    kv_dtype,
    xk: jax.Array,  # (B, T, Hkv, Dh)
    xv: jax.Array,
    positions: jax.Array,  # (B, T)
    token_valid: jax.Array,  # (B, T)
    new_total: jax.Array,  # (B,)
    window: jax.Array,  # scalar int32
    W: int,
):
    """Shared ring-scatter math: which slot each chunk token lands in, and
    the (possibly fp8-quantized) values to write. Slot = pos % window
    (the reference's to_cache_mask + cache_positions, reference:
    cache.py:225-235); tokens that would immediately be overwritten within
    the same chunk map to the out-of-range slot W so scatter mode='drop'
    discards them and slot writes stay unique.

    Returns (write_slot (B, T), qk, qv, k_scale, v_scale) — scales are None
    for bf16 rings."""
    slots = positions % window
    should = token_valid & (positions >= new_total[:, None] - window)
    write_slot = jnp.where(should, slots, W)
    if jnp.dtype(kv_dtype) in _RING_QMAX:
        qk, k_scale = _quantize_ring(xk, kv_dtype)  # scales (B, T, Hkv)
        qv, v_scale = _quantize_ring(xv, kv_dtype)
        return write_slot, qk, qv, k_scale, v_scale
    return write_slot, xk.astype(kv_dtype), xv.astype(kv_dtype), None, None


def update_layer(
    ck: jax.Array,  # (B, W, Hkv*Dh) — one layer's ring (bf16 or fp8)
    cv: jax.Array,
    ks: jax.Array,  # (B, Hkv, W) fp32 scales when fp8, else (0, 0, 0)
    vs: jax.Array,
    xk: jax.Array,  # (B, T, Hkv, Dh) — new keys for this chunk
    xv: jax.Array,
    positions: jax.Array,  # (B, T) absolute positions of chunk tokens
    token_valid: jax.Array,  # (B, T) bool
    new_total: jax.Array,  # (B,) kv_len + seqlens — length after this chunk
    window: jax.Array,  # scalar int32 — this layer's ring size
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Scatter this chunk's K/V into one layer's ring slice. FP8 rings
    quantize on write with one fp32 scale per (token, kv-head) — new
    capability vs the reference's bf16-only cache."""
    B, T = xk.shape[:2]
    W = ck.shape[1]
    write_slot, qk, qv, k_scale, v_scale = _ring_writes(
        ck.dtype, xk, xv, positions, token_valid, new_total, window, W
    )
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    ck = ck.at[b_idx, write_slot].set(qk.reshape(B, T, -1), mode="drop")
    cv = cv.at[b_idx, write_slot].set(qv.reshape(B, T, -1), mode="drop")
    if k_scale is not None:
        ks = ks.at[b_idx, :, write_slot].set(k_scale, mode="drop")
        vs = vs.at[b_idx, :, write_slot].set(v_scale, mode="drop")
    return ck, cv, ks, vs


def update_stacked(
    CK: jax.Array,  # (L, B, W, Hkv*Dh) — the FULL stacked ring, flat-head
    CV: jax.Array,
    KS: jax.Array,  # (L, B, Hkv, W) when fp8, else (L, 0, 0, 0)
    VS: jax.Array,
    li: jax.Array,  # scalar int32 — layer index
    xk: jax.Array,  # (B, T, Hkv, Dh)
    xv: jax.Array,
    positions: jax.Array,
    token_valid: jax.Array,
    new_total: jax.Array,
    window: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Scatter this chunk's K/V for layer ``li`` directly into the stacked
    cache. This is the layer-scan *carry* update path: writing only the
    (B, T, Hkv, Dh) delta into the carried buffer lets XLA keep the whole
    cache in place across scan iterations AND across fused decode steps.
    The round-1 design instead rode the cache through scan xs/ys, which
    forced a fresh (L, B, W, ...) ys allocation per forward and a full-cache
    copy back into the decode block's loop carry every step — ~10.6 ms/step
    of pure copies for a 32-layer B=32 fp8 cache (measured via the TPU
    backend's own estimated_cycles in the AOT-compiled HLO)."""
    B, T = xk.shape[:2]
    W = CK.shape[2]
    write_slot, qk, qv, k_scale, v_scale = _ring_writes(
        CK.dtype, xk, xv, positions, token_valid, new_total, window, W
    )
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    CK = CK.at[li, b_idx, write_slot].set(qk.reshape(B, T, -1), mode="drop")
    CV = CV.at[li, b_idx, write_slot].set(qv.reshape(B, T, -1), mode="drop")
    if k_scale is not None:
        KS = KS.at[li, b_idx, :, write_slot].set(k_scale, mode="drop")
        VS = VS.at[li, b_idx, :, write_slot].set(v_scale, mode="drop")
    return CK, CV, KS, VS


def scatter_chunk(
    cache: KVCache,
    chunk_k: jax.Array,  # (L, B, T, Hkv, Dh) rope'd keys (pre-quantization)
    chunk_v: jax.Array,  # (L, B, T, Hkv, Dh)
    accept: jax.Array,  # (B,) int32 — how many leading chunk tokens to write
) -> KVCache:
    """Write the first ``accept[b]`` tokens of an already-computed chunk's
    K/V into every layer's ring, advancing ``kv_len`` by ``accept``.

    This is the speculative-decoding commit: the verify forward ran with
    ``write_cache=False`` (attending [ring ++ chunk] without touching the
    ring) and returned these per-layer chunk K/V stacks; only the accepted
    prefix is ever written, so rejected draft tokens cannot clobber live
    ring entries even when the ring wraps. FP8 rings quantize on write with
    the same scale rule as update_stacked — the committed bytes are
    identical to what a plain decode step would have written.
    """
    B, T = chunk_k.shape[1], chunk_k.shape[2]
    positions = cache.kv_len[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    token_valid = jnp.arange(T, dtype=jnp.int32)[None, :] < accept[:, None]
    new_total = cache.kv_len + accept
    k, v, ks, vs = jax.vmap(
        update_layer, in_axes=(0, 0, 0, 0, 0, 0, None, None, None, 0)
    )(
        cache.k, cache.v, cache.k_scale, cache.v_scale,
        chunk_k, chunk_v, positions, token_valid, new_total, cache.windows,
    )
    return KVCache(
        k=k, v=v, kv_len=new_total, windows=cache.windows, k_scale=ks, v_scale=vs
    )


@functools.partial(jax.jit, donate_argnums=0)
def copy_prefix_rows(
    cache: KVCache,
    srcs: jax.Array,  # (N,) int32 — source batch rows
    dsts: jax.Array,  # (N,) int32 — destination batch rows
    qs: jax.Array,  # (N,) int32 — prefix lengths; q <= 0 entries are no-ops
) -> KVCache:
    """Prefix-cache commit: for each i, copy ring slots holding positions
    [0, qs[i]) from batch row ``srcs[i]`` to row ``dsts[i]`` and set the
    destination's kv_len to qs[i].

    ONE jitted call per admission wave (src/dst/q are dynamic operands and
    the list is padded to a power-of-two bucket, so a handful of programs
    cover every wave — eager per-copy dispatch costs ~28 ms tunnel RTT
    each) with the cache donated so every row merge happens in place.
    Copies run in array order inside a ``lax.scan``: same-wave chains
    (a copied-into row serving as a later copy's source) read their
    source AFTER it was written, matching the engine's dependency order.
    Padding entries use src=dst=0, q=0 — the merge keeps every byte of
    row 0 and kv_len is re-set to its current value.

    Valid ONLY when the source ring never wrapped past q (positions 0..q-1
    live in slots 0..q-1 — slot = pos % window); the serving engine checks
    the source's high-water mark against min(windows) before calling. The
    copied bytes (including fp8 payloads + scales) are exactly what a
    fresh prefill of the same tokens would write, so reuse is exact."""

    def one(c: KVCache, sdq):
        src, dst, q = sdq

        def cp(A, w_axis_after_index):
            row = jax.lax.dynamic_index_in_dim(A, src, 1, keepdims=False)
            cur = jax.lax.dynamic_index_in_dim(A, dst, 1, keepdims=False)
            W = row.shape[w_axis_after_index]
            shape = [1] * row.ndim
            shape[w_axis_after_index] = W
            keep = (jnp.arange(W, dtype=jnp.int32) < q).reshape(shape)
            merged = jnp.where(keep, row, cur)
            return jax.lax.dynamic_update_index_in_dim(A, merged, dst, 1)

        k = cp(c.k, 1)  # (L, B, W, HD) → row (L, W, HD), W at axis 1
        v = cp(c.v, 1)
        ks, vs = c.k_scale, c.v_scale
        if ks.shape[1]:  # fp8 scales (L, B, Hkv, W) → row (L, Hkv, W), W at 2
            ks = cp(ks, 2)
            vs = cp(vs, 2)
        new_len = jnp.where(q > 0, q, c.kv_len[dst])
        return KVCache(
            k=k, v=v, kv_len=c.kv_len.at[dst].set(new_len),
            windows=c.windows, k_scale=ks, v_scale=vs,
        ), None

    cache, _ = jax.lax.scan(
        one, cache, (srcs.astype(jnp.int32), dsts.astype(jnp.int32),
                     qs.astype(jnp.int32))
    )
    return cache


@functools.partial(jax.jit, donate_argnums=(0, 1))
def adopt_rows(
    cache: KVCache,
    carry: jax.Array,  # (B, V) fp32 — engine's last-prelogits carry
    src: KVCache,  # staging cache, batch B_s << B, SAME (L, W, Hkv*Dh)
    src_carry: jax.Array,  # (B_s, V)
    src_rows: jax.Array,  # (N,) int32 — staging rows to adopt
    dst_rows: jax.Array,  # (N,) int32 — target batch rows; >= B entries drop
) -> Tuple[KVCache, jax.Array]:
    """Whole-row adoption from a narrow staging cache into the main cache:
    ring bytes, scales, kv_len and the prelogits carry row move together,
    so a row prefilled at staging batch width is indistinguishable from
    one prefilled in place (same windows => same slot arithmetic; the ring
    copy is exact bytes, quantized payloads and scales included).

    Serving motivation (r4): an admission sweep's device cost is
    ~independent of how many rows are new — occupied rows ride along at
    seqlens=0 but still run the full chunk program. Under continuous
    batching, late admissions trickle in a few rows at a time, each paying
    a full-batch prompt prefill (~2.3 s at B=32, 512-token prompts on one
    v5e — benchmarks/serving_bench.py admission_prefill_s). Prefilling the
    trickle in a B_s-row staging cache and adopting the rows makes
    admission cost proportional to NEW rows. One donated call per sweep;
    ``dst_rows`` padded with B (out of range => dropped) so a few programs
    cover every wave size."""
    si = src_rows.astype(jnp.int32)
    di = dst_rows.astype(jnp.int32)

    def cp(A_dst, A_src):
        rows = jnp.take(A_src, si, axis=1)
        return A_dst.at[:, di].set(rows, mode="drop")

    k = cp(cache.k, src.k)
    v = cp(cache.v, src.v)
    ks, vs = cache.k_scale, cache.v_scale
    if ks.shape[1]:
        ks = cp(ks, src.k_scale)
        vs = cp(vs, src.v_scale)
    kv_len = cache.kv_len.at[di].set(jnp.take(src.kv_len, si), mode="drop")
    carry = carry.at[di].set(jnp.take(src_carry, si, axis=0), mode="drop")
    return (
        KVCache(
            k=k, v=v, kv_len=kv_len, windows=cache.windows,
            k_scale=ks, v_scale=vs,
        ),
        carry,
    )


def rewind(cache: KVCache, new_len: jax.Array) -> KVCache:
    """Roll ``kv_len`` back to ``new_len`` (per row). ONLY safe on a
    non-wrapping ring (window ≥ every position ever written): there the
    slots beyond ``new_len`` recover position s - W < 0 in slot_positions
    and are invalid, while slots below it still recover pos = s. On a
    wrapped ring the overwritten-then-rewound slots would resurrect stale
    positions pointing at clobbered bytes. Two callers rely on this:
    the draft cache in speculative.py (always full-context/non-wrapping),
    and the TARGET cache on the fused verify path (write_cache="spec"
    writes all K+1 candidates in-ring, then the caller advances kv_len
    past the accepted prefix via rewind) — that path is enabled only by
    speculative._spec_fused_ok, whose min(windows) >= span check IS the
    non-wrap precondition. The wrap-safe fallback keeps the target ring
    clean instead: no-write verify + scatter_chunk commit."""
    return KVCache(
        k=cache.k, v=cache.v, kv_len=new_len, windows=cache.windows,
        k_scale=cache.k_scale, v_scale=cache.v_scale,
    )


def dequant_layer(
    ck: jax.Array,  # (B, W, Hkv*Dh) flat-head ring slice
    ks: jax.Array,  # (B, Hkv, W) fp32 scales (ignored for bf16 rings)
    dtype: jnp.dtype,
    n_kv_heads: int,
) -> jax.Array:
    """Ring slots → (B, W, Hkv, Dh) attention dtype, applying fp8 scales
    when present. XLA fuses the un-flatten reshape into the consumer."""
    B, W, HD = ck.shape
    ck4 = ck.reshape(B, W, n_kv_heads, HD // n_kv_heads)
    if jnp.dtype(ck.dtype) not in _RING_QMAX:
        return ck4.astype(dtype)
    scales = jnp.moveaxis(ks, 1, 2)[..., None]  # (B, W, Hkv, 1)
    return (ck4.astype(jnp.float32) * scales).astype(dtype)


def kv_roundtrip(x: jax.Array, kv_dtype) -> jax.Array:
    """Quantize-dequantize through the ring dtype with the same
    per-(token, head) scale rule as ``update_layer``. Applied to the
    *current chunk's* K/V during prefill attention so teacher-forced logits
    see exactly the values that decode will later read back from the
    quantized ring — keeps the decode-vs-prefill equivalence invariant
    bit-consistent under fp8/int8."""
    q, scale = _quantize_ring(x, kv_dtype)
    return (q.astype(jnp.float32) * scale[..., None]).astype(x.dtype)


def fp8_roundtrip(x: jax.Array) -> jax.Array:
    return kv_roundtrip(x, jnp.float8_e4m3fn)


def slot_positions(
    kv_len: jax.Array,  # (B,) tokens currently in the ring (pre-chunk)
    window: jax.Array,  # scalar int32 — layer ring size
    W: int,  # static buffer width (≥ window)
) -> Tuple[jax.Array, jax.Array]:
    """Recover the absolute position held by each ring slot.

    For slot s with n tokens written and ring size w, the resident position is
    the unique p ≡ s (mod w) in [n - w, n):  p = s + w * floor((n-1-s)/w).
    Slots with p < 0 (ring not yet full) or s ≥ w (shared-buffer padding) are
    invalid. Replaces the reference's host-side ``unrotate``
    (reference: cache.py:59-67) with O(W) vector math inside the program.

    Returns (pos (B, W) int32, valid (B, W) bool).
    """
    s = jnp.arange(W, dtype=jnp.int32)[None, :]
    n = kv_len[:, None]
    pos = s + window * jnp.floor_divide(n - 1 - s, window)
    valid = (pos >= 0) & (s < window) & (n > 0)
    return jnp.where(valid, pos, -1), valid
