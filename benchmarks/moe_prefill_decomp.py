"""Decompose Mixtral prefill MoE cost on the real chip (VERDICT r4 #1).

Times, as scan-chained in-jit loops with full consumers (axon rules,
docs/DECODE_PERF.md):
  a) the capacity-dispatch MoE layer step at prefill rows (r4 path)
  b) the same with capacity_factor=1.0
  c) the sorted ragged grouped-GEMM path (lax.ragged_dot, drop-free — r5)
  d) pure GEMM floor: the same top-k FLOPs as plain batched matmuls
  e) dense all-experts _moe_ffn (the bit-parity fallback, 4x FLOPs)

Weights are passed as jit ARGUMENTS (a closure would bake multi-GB
constants into the program — unserializable through the axon tunnel).

Run:  nohup timeout 1200 python benchmarks/moe_prefill_decomp.py > \
          benchmarks/results/moe_prefill_decomp_r5.log 2>&1 &
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

from mistral_inference_tpu.ops.linear import dequant, quantize_weight

N = 4096          # B=32 x CTX=128 prefill chunk rows
D, F, E, K = 4096, 14336, 8, 2
REPS = 8
PEAK_TFLOPS = 197.0  # v5e bf16

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
x0 = jax.random.normal(ks[0], (N, D), jnp.bfloat16)


def qinit(k, shape):
    # Quantize on device in one jit (fp32 intermediates freed right away).
    w = jax.random.normal(k, shape, jnp.float32) * 0.02
    return jax.jit(functools.partial(quantize_weight, bits=4))(w)


W = {
    "gate": jax.random.normal(ks[1], (D, E), jnp.bfloat16) * 0.02,
    "w1": qinit(ks[2], (E, D, F)),
    "w3": qinit(ks[3], (E, D, F)),
    "w2": qinit(ks[4], (E, F, D)),
}

TOPK_FLOPS = 2.0 * N * K * 3 * D * F  # counted (top-k live) FLOPs per layer


def chain(fn, x, w):
    """Run fn REPS times as one lax.scan chain, full consumer, s/call.
    Weights ride as scan-invariant ARGUMENTS of the outer jit."""

    @jax.jit
    def run(x, w):
        def body(h, _):
            out = fn(h, w)
            h = h * 0.999 + out * 1e-3
            return h, ()

        h, _ = jax.lax.scan(body, x, None, length=REPS)
        # Scalar output: np.asarray of a big array crawls through the axon
        # tunnel (~28 MB/s measured) and would be billed as compute; the
        # sum is a full consumer so nothing is DCE'd.
        return jnp.sum(h.astype(jnp.float32))

    r = run(x, w)
    np.asarray(r)  # warm + sync
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        r = run(x, w)
        np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def report(name, secs):
    mfu = TOPK_FLOPS / secs / (PEAK_TFLOPS * 1e12)
    print(f"{name:34s} {secs * 1e3:8.2f} ms/layer   topk-MFU {mfu:.3f}", flush=True)
    return mfu


def disp(cf):
    from mistral_inference_tpu.models.transformer import _moe_ffn_dispatch

    def f(x, w):
        return _moe_ffn_dispatch(x, w, K, cf, fused_quant=True)

    return f


def dense(x, w):
    from mistral_inference_tpu.models.transformer import _moe_ffn

    return _moe_ffn(x, w, K)


def ragged(x, w):
    from mistral_inference_tpu.models.transformer import _moe_ffn_ragged

    return _moe_ffn_ragged(x, w, K)


def ragged_kernel(x, w):
    from mistral_inference_tpu.models.transformer import _moe_ffn_ragged

    return _moe_ffn_ragged(x, w, K, fused_quant=True)


def gemm_floor(x, w):
    # top-k FLOPs as 3 plain GEMMs at the same aspect: (N*k, D) @ (D, F)
    w1d = jax.lax.optimization_barrier(dequant(w["w1"], x.dtype)[0])
    w3d = jax.lax.optimization_barrier(dequant(w["w3"], x.dtype)[0])
    w2d = jax.lax.optimization_barrier(dequant(w["w2"], x.dtype)[0])
    xs = jnp.concatenate([x, x], 0)  # N*k rows
    h = jax.nn.silu(xs @ w1d) * (xs @ w3d)
    return (h @ w2d)[:N]


def main():
    import os

    which = os.environ.get("DECOMP_ONLY", "").split(",")
    cases = [
        ("gemm floor (3 plain GEMMs)", gemm_floor),
        ("pallas sorted-grouped kernel", ragged_kernel),
        ("ragged grouped GEMM", ragged),
        ("dispatch cf=2.0 (r4 path)", disp(2.0)),
        ("dispatch cf=1.0", disp(1.0)),
        ("dense all-experts", dense),
    ]
    print(f"device: {jax.devices()[0].device_kind}  N={N} D={D} F={F} E={E} k={K}")
    print(f"counted top-k FLOPs/layer: {TOPK_FLOPS / 1e12:.2f} TF", flush=True)
    for name, fn in cases:
        if which != [""] and not any(s and s in name for s in which):
            continue
        report(name, chain(fn, x0, W))


if __name__ == "__main__":
    main()
