"""Rotary position embeddings (1-D and 2-D), TPU-native.

The reference uses complex64 tensors and ``view_as_complex`` pair math
(reference: rope.py:6-23). complex dtypes map poorly to the TPU VPU, so we
keep separate fp32 cos/sin tables and do the pair rotation with real ops —
XLA fuses the whole thing into the surrounding matmul epilogue.

Pairing convention matches the reference exactly: the head dim is viewed as
adjacent (even, odd) pairs — ``x.reshape(..., -1, 2)``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def precompute_rope(head_dim: int, end: int, theta: float) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables of shape (end, head_dim // 2), float32.

    Equivalent of the reference's polar complex table (reference: rope.py:6-10).
    """
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(end, dtype=jnp.float32)
    angles = jnp.outer(t, freqs)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate adjacent pairs of the last dim.

    x: (..., n_heads, head_dim); cos/sin broadcastable to (..., 1, head_dim//2),
    typically (..., T, 1, head_dim//2) after gathering at positions.
    Computed in fp32 and cast back (reference: rope.py:13-23 upcasts to float).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xr = xf[..., 0::2]
    xi = xf[..., 1::2]
    or_ = xr * cos - xi * sin
    oi_ = xr * sin + xi * cos
    out = jnp.stack([or_, oi_], axis=-1).reshape(x.shape)
    return out.astype(dtype)


def rope_at_positions(
    cos: jax.Array, sin: jax.Array, positions: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Gather (T_table, P) tables at integer positions (B, T) →
    (B, T, 1, P) ready to broadcast over heads. Out-of-range (negative)
    positions are clamped — callers mask those tokens anyway."""
    pos = jnp.clip(positions, 0, cos.shape[0] - 1)
    c = jnp.take(cos, pos, axis=0)[..., None, :]
    s = jnp.take(sin, pos, axis=0)[..., None, :]
    return c, s


def rope_for_positions(
    positions: jax.Array, head_dim: int, theta: float
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin at integer positions (B, T) → (B, T, 1, head_dim//2),
    computed DIRECTLY (no table): angles = pos · theta^(-2i/d) is the same
    fp32 expression precompute_rope evaluates row-wise, so the results are
    bitwise identical to a table gather for in-range positions — and the
    decode loop stops carrying (and re-laying-out) a 32 MB table per step
    (2×0.35 ms/step in the 7B B=32 HLO profile). Positions past the
    reference's 128k table limit get true rope instead of a clamped row."""
    freqs = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    pos = jnp.maximum(positions, 0).astype(jnp.float32)
    angles = pos[..., None] * freqs  # (B, T, head_dim//2)
    return jnp.cos(angles)[..., None, :], jnp.sin(angles)[..., None, :]


def precompute_rope_2d(
    dim: int, height: int, width: int, theta: float
) -> Tuple[jax.Array, jax.Array]:
    """2-D RoPE tables for vision, (height, width, dim // 2) cos/sin.

    Interleaved frequency bands: even bands rotate by row index, odd bands by
    column index, concatenated [h-bands | w-bands]
    (reference: rope.py:26-51 ``precompute_freqs_cis_2d``).
    """
    freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    h = jnp.arange(height, dtype=jnp.float32)
    w = jnp.arange(width, dtype=jnp.float32)
    freqs_h = jnp.outer(h, freqs[0::2])  # (H, dim//4)
    freqs_w = jnp.outer(w, freqs[1::2])  # (W, dim//4)
    angles = jnp.concatenate(
        [
            jnp.broadcast_to(freqs_h[:, None, :], (height, width, freqs_h.shape[-1])),
            jnp.broadcast_to(freqs_w[None, :, :], (height, width, freqs_w.shape[-1])),
        ],
        axis=-1,
    )
    return jnp.cos(angles), jnp.sin(angles)
