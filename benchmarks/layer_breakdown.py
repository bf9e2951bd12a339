"""On-chip decomposition of the decode step: where do the ~7 ms over the
MXU tile-load floor go?

Round-3 finding that motivates this: the int8 headline (no nibble unpack at
all) measured SLOWER than int4 (1724 vs 1898 tok/s), so the r2 theory that
~3 ms/step is int4-unpack VPU cost is wrong — the overhead is SHARED by
both weight formats. This harness times stripped-down decode-step variants
(same 64-step fused-scan methodology as the driver bench) to split the step
into: quantized-matmul chain, head+sampling, attention+ring-update, and
everything else.

Variants (7B int4 geometry, B=32, L=32):
  mm7       7 stacked-kernel matmuls/layer (wq wk wv wo w1 w3 w2), rms-ish
            carry normalization, NO attention/cache/rope/head.
  mm7head   mm7 + bf16 head matmul + greedy argmax per step.
  mm4head   the SAME GEMM bytes in 4 calls/layer (wqkv, wo, w13, w2
            pre-concatenated) + head + argmax: measures what fusing the
            projections would buy (pallas-call transition overhead).
  full      the production decode block (reference point).

Usage: python benchmarks/layer_breakdown.py [mm7|mm7head|mm4head|full|all]
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

sys.path.insert(0, "/root/repo")

from mistral_inference_tpu.ops.pallas.matmul_quant import matmul_quant_stacked

B, DIM, HID, L, V = 32, 4096, 14336, 32, 32768
HQ, HKV, DH = 32, 8, 128
STEPS = 64
GROUP = 128


def make_stack(rng, K, N):
    """Random packed-int4 (L, K/2, N) stack + (L, ng, N) scales."""
    q = jnp.asarray(
        rng.integers(-128, 128, (L, K // 2, N), dtype=np.int64), jnp.int8
    )
    s = jnp.asarray(rng.random((L, K // GROUP, N)) * 2e-3 + 1e-3, jnp.float32)
    return q, s


def normalize(h):
    return (
        h.astype(jnp.float32)
        * jax.lax.rsqrt(jnp.mean(h.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-6)
    ).astype(h.dtype)


def build_mm(n_calls: int, with_head: bool):
    rng = np.random.default_rng(0)
    if n_calls == 7:
        stacks = [
            make_stack(rng, DIM, HQ * DH),   # wq
            make_stack(rng, DIM, HKV * DH),  # wk
            make_stack(rng, DIM, HKV * DH),  # wv
            make_stack(rng, DIM, HQ * DH),   # wo
            make_stack(rng, DIM, HID),       # w1
            make_stack(rng, DIM, HID),       # w3
            make_stack(rng, HID, DIM),       # w2
        ]
    else:
        stacks = [
            make_stack(rng, DIM, (HQ + 2 * HKV) * DH),  # wqkv fused
            make_stack(rng, DIM, HQ * DH),              # wo
            make_stack(rng, DIM, 2 * HID),              # w13 fused
            make_stack(rng, HID, DIM),                  # w2
        ]
    head = jnp.asarray(rng.standard_normal((DIM, V)) * 0.02, jnp.bfloat16)

    def layer7(h, li, stacks):
        xq = matmul_quant_stacked(h, *stacks[0], li)
        xk = matmul_quant_stacked(h, *stacks[1], li)
        xv = matmul_quant_stacked(h, *stacks[2], li)
        att = xq + jnp.pad(xk + xv, ((0, 0), (0, DIM - HKV * DH)))
        h = h + matmul_quant_stacked(normalize(att), *stacks[3], li)
        x = normalize(h)
        f = jax.nn.silu(matmul_quant_stacked(x, *stacks[4], li)) * \
            matmul_quant_stacked(x, *stacks[5], li)
        return normalize(h + matmul_quant_stacked(f, *stacks[6], li)), None

    def layer4(h, li, stacks):
        qkv = matmul_quant_stacked(h, *stacks[0], li)
        att = qkv[:, : HQ * DH] + jnp.pad(
            qkv[:, HQ * DH :], ((0, 0), (0, (HQ - 2 * HKV) * DH))
        )
        h = h + matmul_quant_stacked(normalize(att), *stacks[1], li)
        x = normalize(h)
        f13 = matmul_quant_stacked(x, *stacks[2], li)
        f = jax.nn.silu(f13[:, :HID]) * f13[:, HID:]
        return normalize(h + matmul_quant_stacked(f, *stacks[3], li)), None

    layer = layer7 if n_calls == 7 else layer4

    # stacks/head are threaded through jit as ARGUMENTS — closing over them
    # would embed 3.7 GB of constants into the lowered module (and overflow
    # the remote-compile tunnel).
    def step(h, _, stacks, head):
        h, _ = jax.lax.scan(lambda hh, li: layer_p(hh, li, stacks), h,
                            jnp.arange(L, dtype=jnp.int32))
        if with_head:
            logits = (h @ head).astype(jnp.float32)
            tok = jnp.argmax(logits, -1)
            h = h + (tok[:, None] % 3).astype(h.dtype) * 1e-6
        return normalize(h), None

    layer_p = layer

    @jax.jit
    def block(h, stacks, head):
        h, _ = jax.lax.scan(lambda hh, _: step(hh, _, stacks, head), h,
                            None, length=STEPS)
        return h

    h0 = jnp.asarray(np.random.default_rng(1).standard_normal((B, DIM)),
                     jnp.bfloat16)
    return block, h0, stacks, head


def time_block(block, h0, stacks, head, label):
    out = block(h0, stacks, head)
    out.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(block(h0, stacks, head))
    dt = time.perf_counter() - t0
    ms = dt / STEPS * 1e3
    print(json.dumps({
        "variant": label,
        "ms_per_step": round(ms, 3),
        "equiv_tok_s": round(B * STEPS / dt, 1),
    }), flush=True)


def run_full():
    import os

    os.environ.setdefault("BENCH_LONG", "0")
    import bench

    args = bench.mistral_7b_args(L)
    args.quant = "int4"
    args.kv_quant = "int8"
    from mistral_inference_tpu.generate import _get_decode_block, _get_prefill
    from mistral_inference_tpu.model import Transformer
    from mistral_inference_tpu.quant.weights import init_quantized_params

    params = init_quantized_params(jax.random.PRNGKey(0), args, jnp.bfloat16,
                                   "int4", GROUP)
    model = Transformer(args, params, dtype=jnp.bfloat16)
    cache = model.alloc_cache(B, 128 + 2 * STEPS + 2)
    rng = np.random.default_rng(0)
    prompts = jnp.asarray(rng.integers(0, args.vocab_size, (B, 128)), jnp.int32)
    seqlens = jnp.full((B,), 128, jnp.int32)
    carry = jnp.zeros((B, args.vocab_size), jnp.float32)
    prefill = _get_prefill(model, attend_cache=False, with_embeds=False,
                           want_logprobs=False)
    decode = _get_decode_block(model, STEPS, temperature=0.0, top_p=0.8)
    key = jax.random.PRNGKey(0)
    _, carry, cache = prefill(model.params, model.rope, prompts, seqlens, cache, carry)
    toks, _, carry, cache = decode(model.params, model.rope, carry, cache, key, 0)
    np.asarray(toks)
    t0 = time.perf_counter()
    toks, _, carry, cache = decode(model.params, model.rope, carry, cache, key, STEPS)
    np.asarray(toks)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "variant": "full",
        "ms_per_step": round(dt / STEPS * 1e3, 3),
        "equiv_tok_s": round(B * STEPS / dt, 1),
    }), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "mm7"):
        time_block(*build_mm(7, False), "mm7")
    if which in ("all", "mm7head"):
        time_block(*build_mm(7, True), "mm7head")
    if which in ("all", "mm4head"):
        time_block(*build_mm(4, True), "mm4head")
    if which in ("all", "full"):
        run_full()


if __name__ == "__main__":
    main()
