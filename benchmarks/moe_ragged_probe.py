"""Isolated probes for the Mixtral prefill MoE redesign (r5).

Q1: is lax.ragged_dot on v5e near plain-GEMM speed at prefill shapes?
Q2: what does a batched-einsum dispatch (cf=1.0) cost with bf16 weights?
Q3: how expensive is the XLA int4 dequant vs its 1.2 GB byte floor?

All with bf16 weights passed as jit args (no dequant in the loop) so the
GEMM engines are measured, not the dequant.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

N, D, F, E, K = 4096, 4096, 14336, 8, 2
REPS = 8
PEAK = 197e12

ks = jax.random.split(jax.random.PRNGKey(0), 8)
x0 = jax.random.normal(ks[0], (N, D), jnp.bfloat16)
gate = jax.random.normal(ks[1], (D, E), jnp.bfloat16) * 0.02
w1 = jax.random.normal(ks[2], (E, D, F), jnp.bfloat16) * 0.02
w3 = jax.random.normal(ks[3], (E, D, F), jnp.bfloat16) * 0.02
w2 = jax.random.normal(ks[4], (E, F, D), jnp.bfloat16) * 0.02

FLOPS = 2.0 * N * K * 3 * D * F


def chain(fn, *args):
    @jax.jit
    def run(x, *a):
        def body(h, _):
            return h * 0.999 + fn(h, *a) * 1e-3, ()

        h, _ = jax.lax.scan(body, x, None, length=REPS)
        # Scalar output: np.asarray of a big array crawls through the axon
        # tunnel (~28 MB/s measured) and would be billed as compute; the
        # sum is a full consumer so nothing is DCE'd.
        return jnp.sum(h.astype(jnp.float32))

    r = run(*args)
    np.asarray(r)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        r = run(*args)
        np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def report(name, secs, flops=FLOPS):
    print(f"{name:36s} {secs * 1e3:8.2f} ms   MFU {flops / secs / PEAK:.3f}",
          flush=True)


def gemm_floor(x, w1, w3, w2):
    xs = jnp.concatenate([x, x], 0)
    h = jax.nn.silu(xs @ w1[0]) * (xs @ w3[0])
    return (h @ w2[0])[:N]


def route(x, gate):
    gl = x @ gate
    top_vals, top_idx = jax.lax.top_k(gl, K)
    top_w = jax.nn.softmax(top_vals.astype(jnp.float32), axis=-1)
    return top_idx, top_w


def ragged(x, gate, w1, w3, w2):
    top_idx, top_w = route(x, gate)
    flat_e = top_idx.reshape(-1)
    order = jnp.argsort(flat_e)
    tok = order // K
    xs = jnp.take(x, tok, axis=0)
    gs = jnp.bincount(flat_e, length=E).astype(jnp.int32)
    h = jax.nn.silu(jax.lax.ragged_dot(xs, w1, gs)) * jax.lax.ragged_dot(xs, w3, gs)
    out = jax.lax.ragged_dot(h, w2, gs)
    wts = jnp.take(top_w.reshape(-1), order).astype(x.dtype)
    return jnp.zeros((N, D), x.dtype).at[tok].add(out * wts[:, None])


def ragged13(x, gate, w13, w2):
    top_idx, top_w = route(x, gate)
    flat_e = top_idx.reshape(-1)
    order = jnp.argsort(flat_e)
    tok = order // K
    xs = jnp.take(x, tok, axis=0)
    gs = jnp.bincount(flat_e, length=E).astype(jnp.int32)
    h13 = jax.lax.ragged_dot(xs, w13, gs)
    h = jax.nn.silu(h13[:, :F]) * h13[:, F:]
    out = jax.lax.ragged_dot(h, w2, gs)
    wts = jnp.take(top_w.reshape(-1), order).astype(x.dtype)
    return jnp.zeros((N, D), x.dtype).at[tok].add(out * wts[:, None])


def dispatch_bf16(x, gate, w1, w3, w2):
    top_idx, top_w = route(x, gate)
    C = N * K // E  # cf=1.0
    flat_e = top_idx.reshape(-1)
    onehot = jax.nn.one_hot(flat_e, E, dtype=jnp.int32)
    pos = jnp.cumsum(onehot, axis=0) * onehot
    slot = jnp.sum(pos, axis=-1) - 1
    keep = slot < C
    slot_c = jnp.where(keep, slot, C)
    xk = jnp.repeat(x, K, axis=0)
    buf = jnp.zeros((E, C + 1, D), x.dtype).at[flat_e, slot_c].add(xk)[:, :C]
    h = jax.nn.silu(jnp.einsum("eci,eio->eco", buf, w1)) * jnp.einsum(
        "eci,eio->eco", buf, w3)
    ob = jnp.einsum("eco,eoi->eci", h, w2)
    gathered = ob[flat_e, jnp.minimum(slot, C - 1)]
    wts = (top_w.reshape(-1) * keep.astype(jnp.float32)).astype(x.dtype)
    return jnp.sum((gathered * wts[:, None]).reshape(N, K, D), axis=1)


def glue_only(x, gate, w1):
    """Router + sort + gather + scatter-add WITHOUT the expert GEMMs —
    the non-GEMM overhead of the ragged path."""
    top_idx, top_w = route(x, gate)
    flat_e = top_idx.reshape(-1)
    order = jnp.argsort(flat_e)
    tok = order // K
    xs = jnp.take(x, tok, axis=0)
    wts = jnp.take(top_w.reshape(-1), order).astype(x.dtype)
    return jnp.zeros((N, D), x.dtype).at[tok].add(xs * wts[:, None])


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    report("gemm floor (bf16, 3 GEMMs)", chain(gemm_floor, x0, w1, w3, w2))
    report("ragged_dot path (bf16)", chain(ragged, x0, gate, w1, w3, w2))
    w13 = jnp.concatenate([w1, w3], axis=-1)
    report("ragged_dot w13-fused (bf16)", chain(ragged13, x0, gate, w13, w2))
    report("dispatch cf=1.0 einsum (bf16)", chain(dispatch_bf16, x0, gate, w1, w3, w2))
    report("glue only (route+sort+scatter)", chain(glue_only, x0, gate, w1))


if __name__ == "__main__":
    main()
