"""Isolated probe: grouped multi-row attention dots across kv-heads (r5,
VERDICT r4 weak #5 / next-#6).

docs/DECODE_PERF.md's B=128 wall analysis ASSERTED that the G=4-row
score/V dots (1/32 MXU row occupancy) could only be amortized by "grouped
multi-row dots across kv-heads — a layout change the ring's flat-head DMA
contract forbids", without measuring that variant. This probe measures it
in isolation at the decode geometry (B=128, Hkv=8, G=4, Dh=128, S=256 —
two live ring tiles at BS=128):

  A) per-(b, kv-head) dots — the production decode kernel's formulation:
     scores = q (G, Dh) @ K^T (Dh, S); out = p (G, S) @ V (S, Dh).
  B) grouped per-b dots — all Hkv heads' queries in ONE stationary tile:
     all = K_all (Hkv*S, Dh) @ Q^T (Dh, Hkv*G) computes every (slot, qhead)
     pair in one q-stationary pass (8x the outputs, but output cost is
     streamed-row cycles, not tiles); the block-diagonal (own-head) scores
     are selected by mask-multiply, and the V pass is one
     (Hkv*G, Hkv*S) @ (Hkv*S, Dh) masked dot.

Both kernels do the same exp() normalization work so only the dot
formulations differ. The verdict number replaces the doc's assertion.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, Hkv, G, Dh, S = 128, 8, 4, 128, 256
H = Hkv * G
REPS = 64
L_EQ = 32  # report per-"layer" by analogy: 7B runs this per layer


def _kern_per_head(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # (G, Dh)
    k = k_ref[0]  # (S, Dh)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (G, S)
    p = jnp.exp(s * 0.088388)
    p = p / (jnp.sum(p, axis=-1, keepdims=True) + 1.0)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def per_head(q, k, v):
    # q (B, Hkv, G, Dh); k/v (B, Hkv, S, Dh)
    qf = q.reshape(B * Hkv, G, Dh)
    kf = k.reshape(B * Hkv, S, Dh)
    vf = v.reshape(B * Hkv, S, Dh)
    return pl.pallas_call(
        _kern_per_head,
        grid=(B * Hkv,),
        in_specs=[
            pl.BlockSpec((1, G, Dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, S, Dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, S, Dh), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, G, Dh), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Hkv, G, Dh), jnp.float32),
    )(qf, kf, vf)


def _kern_grouped(q_ref, k_ref, v_ref, m_ref, o_ref):
    q = q_ref[0]  # (H, Dh) all 32 query heads of this row
    k = k_ref[0]  # (Hkv*S, Dh) all heads' keys
    v = v_ref[0]
    m = m_ref[0]  # (H, Hkv*S) 1.0 where the slot belongs to the query's head
    alls = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Hkv*S, H) — q stationary: ONE weight tile, Hkv*S streamed rows
    s = jnp.transpose(alls) * m  # (H, Hkv*S) block-diagonal select
    p = jnp.exp(s * 0.088388) * m
    p = p / (jnp.sum(p, axis=-1, keepdims=True) + 1.0)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, Dh)
    o_ref[0] = o.astype(o_ref.dtype)


def grouped(q, k, v, mask):
    qf = q.reshape(B, H, Dh)
    kf = k.reshape(B, Hkv * S, Dh)
    vf = v.reshape(B, Hkv * S, Dh)
    return pl.pallas_call(
        _kern_grouped,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Hkv * S, Dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Hkv * S, Dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, H, Hkv * S), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, Dh), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qf, kf, vf, mask)


def chain(fn, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            o = fn(*a)
            return c + jnp.sum(o), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c

    r = run(*args)
    np.asarray(r)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, Hkv, G, Dh), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, Hkv, S, Dh), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, Hkv, S, Dh), jnp.bfloat16)
    hh = np.arange(H) // G
    sh = np.arange(Hkv * S) // S
    mask = jnp.asarray((hh[:, None] == sh[None, :]).astype(np.float32))[None]

    # numerics sanity: same block-diagonal attention
    oa = np.asarray(per_head(q, k, v)).reshape(B, Hkv, G, Dh)
    ob = np.asarray(grouped(q, k, v, mask)).reshape(B, Hkv, G, Dh)
    err = float(np.max(np.abs(oa - ob)))
    print(f"device: {jax.devices()[0].device_kind}  max|A-B| = {err:.2e}",
          flush=True)
    assert err < 1e-3

    ta = chain(per_head, q, k, v)
    tb = chain(grouped, q, k, v, mask)
    print(f"A per-(b,kv-head) dots : {ta * 1e6:9.1f} us/step-layer-eq "
          f"({ta * L_EQ * 1e3:.2f} ms per 32-layer step)", flush=True)
    print(f"B grouped-head dots    : {tb * 1e6:9.1f} us/step-layer-eq "
          f"({tb * L_EQ * 1e3:.2f} ms per 32-layer step)", flush=True)
    print(f"grouped/per-head       : {tb / ta:.3f}", flush=True)


if __name__ == "__main__":
    main()
