"""Dense-prefill quantized GEMM probe (r5): can the sorted-grouped pallas
kernel (E=1 degenerate case — a plain M-tiled direct-INT4 matmul) beat
XLA's fused-dequant GEMM at 7B prefill shapes? The r4 prefill study only
compared XLA-fused vs HBM-materialized dequant; a pallas prefill matmul
that streams INT bytes straight to VMEM did not exist until the r5 MoE
kernel.

Shapes: the 7B layer GEMMs at a B=32 x CTX=128 chunk (4096 rows).
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

from mistral_inference_tpu.ops.linear import dequant, quantize_weight

REPS = 16
PEAK = 197e12


def chain(fn, *args):
    @jax.jit
    def run(x, *a):
        def body(h, _):
            out = fn(h, *a)
            # row-sum consumes every output element and broadcasts into
            # the carry regardless of N
            return h * 0.999 + jnp.sum(out, axis=1, keepdims=True) * 1e-4, ()

        h, _ = jax.lax.scan(body, x, None, length=REPS)
        return jnp.sum(h.astype(jnp.float32))

    r = run(*args)
    np.asarray(r)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def probe(M, K, N, bits):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (M, K), jnp.bfloat16)
    wq = quantize_weight(jax.random.normal(ks[1], (K, N), jnp.float32) * 0.02,
                         bits, 128)
    wbf = jax.random.normal(ks[2], (K, N), jnp.bfloat16) * 0.02
    FL = 2.0 * M * K * N

    def xla_fused(x, wq):
        return x @ dequant(wq, x.dtype)

    def xla_hbm(x, wq):
        wd = jax.lax.optimization_barrier(dequant(wq, x.dtype))
        return x @ wd

    def bf16(x, wbf):
        return x @ wbf

    def pallas(x, wq):
        from mistral_inference_tpu.ops.pallas.moe_matmul import (
            moe_matmul_quant_ragged,
        )

        q = wq.get("q4", wq.get("q"))
        tg = jnp.zeros((M // 256,), jnp.int32)
        return moe_matmul_quant_ragged(x, q[None], wq["scale"][None], tg)

    print(f"-- M={M} K={K} N={N} int{bits}  ({FL/1e12:.2f} TF)", flush=True)
    for name, fn, w in (
        ("bf16 GEMM floor", bf16, wbf),
        ("XLA fused dequant", xla_fused, wq),
        ("XLA HBM-dequant+GEMM", xla_hbm, wq),
        ("pallas direct-int (E=1 ragged)", pallas, wq),
    ):
        dt = chain(fn, x, w)
        print(f"  {name:32s} {dt*1e3:8.2f} ms  MFU {FL/dt/PEAK:.3f}",
              flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    probe(4096, 4096, 14336, 4)   # w1/w3-class
    probe(4096, 14336, 4096, 4)   # w2-class
    probe(4096, 4096, 6144, 4)    # fused qkv-class
    probe(4096, 4096, 14336, 8)   # int8 variant (Nemo serving)


if __name__ == "__main__":
    main()
