"""RMSNorm, computed in fp32 (reference: transformer_layers.py:109-120)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """x * rsqrt(mean(x^2) + eps) * weight, normalization in fp32, output in
    x.dtype before the weight multiply — matching the reference's
    ``_norm(x.float()).type_as(x) * weight`` ordering."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return normed.astype(x.dtype) * weight
