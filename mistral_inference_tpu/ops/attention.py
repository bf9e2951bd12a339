"""Attention ops — XLA reference path.

The reference delegates all attention to xformers' CUDA
``memory_efficient_attention`` with bias objects encoding block-diagonal /
local / padded-keys masking over a ragged concatenated batch
(reference: transformer_layers.py:87-93, cache.py:240-254).

TPU-native redesign: static-shape batched attention ``(B, T, H, D)`` with a
boolean mask computed from position/length vectors. GQA is expressed by
grouping query heads over KV heads — no ``repeat_interleave`` materialization
(reference: transformer_layers.py:16-19 materializes repeated K/V).

A fused Pallas flash-attention kernel lives in ``ops/pallas``; this module is
the always-correct XLA fallback and the numerics oracle for tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # finite to avoid NaNs in fully-masked (padding) rows


def attend(
    q: jax.Array,  # (B, T, n_heads, head_dim)
    k: jax.Array,  # (B, S, n_kv_heads, head_dim)
    v: jax.Array,  # (B, S, n_kv_heads, head_dim)
    mask: Optional[jax.Array],  # (B, T, S) bool, True = may attend
    scale: Optional[float] = None,
) -> jax.Array:
    """Masked GQA attention; returns (B, T, n_heads * head_dim).

    QK^T and softmax in fp32 (matching xformers' fp32 accumulation), output
    cast back to q.dtype.
    """
    B, T, H, D = q.shape
    _, S, Hkv, _ = k.shape
    G = H // Hkv
    if scale is None:
        scale = D**-0.5

    qg = q.reshape(B, T, Hkv, G, D)
    # (B, Hkv, G, T, S) logits in fp32.
    logits = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhgts,bshd->bthgd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype).reshape(B, T, H * D)


def attend_scaled(
    q: jax.Array,  # (B, T, n_heads, head_dim)
    kq: jax.Array,  # (B, S, n_kv_heads, head_dim) — quantized (e.g. fp8 ring)
    vq: jax.Array,
    k_scale: jax.Array,  # (B, S, n_kv_heads) fp32
    v_scale: jax.Array,
    mask: Optional[jax.Array],  # (B, T, S) bool
    scale: Optional[float] = None,
) -> jax.Array:
    """GQA attention over a quantized ring with scales folded AFTER the
    dots: scores·k_scale_j per key and (probs·v_scale_j)·v_raw — no
    dequantized (S, D) copy is materialized; XLA fuses the fp8→fp32 convert
    into the dot operand reads. Numerically identical to dequantize-then-
    attend (the scale is per key column)."""
    B, T, H, D = q.shape
    _, S, Hkv, _ = kq.shape
    G = H // Hkv
    if scale is None:
        scale = D**-0.5

    qg = q.reshape(B, T, Hkv, G, D)
    logits = jnp.einsum(
        "bthgd,bshd->bhgts", qg.astype(jnp.float32), kq.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    ks = jnp.transpose(k_scale, (0, 2, 1))[:, :, None, None, :]  # (B,Hkv,1,1,S)
    logits = logits * (ks * jnp.float32(scale))
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    vs = jnp.transpose(v_scale, (0, 2, 1))[:, :, None, None, :]
    out = jnp.einsum(
        "bhgts,bshd->bthgd", probs * vs, vq.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype).reshape(B, T, H * D)


def sliding_window_mask(
    q_pos: jax.Array,  # (B, T) absolute position of each query token
    kv_pos: jax.Array,  # (B, S) absolute position of each key slot
    q_valid: jax.Array,  # (B, T) bool
    kv_valid: jax.Array,  # (B, S) bool
    window: jax.Array,  # scalar int32 — sliding window (== full length if none)
) -> jax.Array:
    """Causal + local mask: allowed iff 0 <= q_pos - kv_pos < window.

    Reproduces the reference's three xformers regimes
    (BlockDiagonalCausalMask.make_local_attention and friends,
    reference: cache.py:240-254) as one position-arithmetic rule — the ring
    cache stores absolute positions implicitly, so decode/prefill/chunked
    prefill all reduce to this single predicate.
    """
    delta = q_pos[:, :, None] - kv_pos[:, None, :]
    allowed = (delta >= 0) & (delta < window)
    return allowed & q_valid[:, :, None] & kv_valid[:, None, :]
