"""Driver benchmark — prints ONE JSON line.

Headline metric: greedy decode throughput (tokens/s) of the flagship dense
model (Mistral-7B architecture: dim 4096, 32 layers, GQA 32/8, SwiGLU 14336,
sliding window 4096 — reference model envelope README.md:45-58) with random
bf16 weights on the available chip.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
comparison point is the per-chip HBM-bandwidth speed-of-light for decode —
each generated token must stream all weight bytes + the live KV window from
HBM; vs_baseline is the fraction of that roofline achieved (1.0 == SoL).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.args import TransformerArgs
from mistral_inference_tpu.generate import _get_decode_block, _get_prefill
from mistral_inference_tpu.model import Transformer

HBM_GBPS = {
    # device_kind prefix → HBM bandwidth GB/s
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v4": 1228.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
}


def mistral_7b_args(n_layers: int = 32) -> TransformerArgs:
    return TransformerArgs(
        dim=4096,
        n_layers=n_layers,
        head_dim=128,
        hidden_dim=14336,
        n_heads=32,
        n_kv_heads=8,
        norm_eps=1e-5,
        vocab_size=32_768,
        max_batch_size=8,
        rope_theta=1e6,
        sliding_window=4096,
    )


def param_count(a: TransformerArgs) -> int:
    attn = a.dim * (a.n_heads + 2 * a.n_kv_heads) * a.head_dim + a.n_heads * a.head_dim * a.dim
    ffn = 3 * a.dim * a.hidden_dim
    per_layer = attn + ffn + 2 * a.dim
    return a.n_layers * per_layer + 2 * a.vocab_size * a.dim + a.dim


def run(n_layers: int, batch: int, ctx: int, steps: int):
    args = mistral_7b_args(n_layers)
    model = Transformer.random(args, dtype=jnp.bfloat16, seed=0)
    cache = model.alloc_cache(batch, ctx + 2 * steps + 2)  # warmup block + timed block

    rng = np.random.default_rng(0)
    prompts_tok = jnp.asarray(rng.integers(0, args.vocab_size, (batch, ctx)), jnp.int32)
    seqlens = jnp.full((batch,), ctx, jnp.int32)
    carry = jnp.zeros((batch, args.vocab_size), jnp.float32)

    prefill = _get_prefill(model, attend_cache=False, with_embeds=False)
    decode = _get_decode_block(model, steps, temperature=0.0, top_p=0.8)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    _, carry, cache = prefill(model.params, model.rope, prompts_tok, seqlens, cache, carry)
    np.asarray(carry)  # full host sync (block_until_ready is unreliable over the tunnel)
    ttft = time.perf_counter() - t0

    # warmup: compile the fused decode block
    toks, _, carry, cache = decode(model.params, model.rope, carry, cache, key, 0)
    np.asarray(toks)

    t0 = time.perf_counter()
    toks, _, carry, cache = decode(model.params, model.rope, carry, cache, key, steps)
    np.asarray(toks)
    dt = time.perf_counter() - t0

    toks_per_s = batch * steps / dt
    return args, toks_per_s, ttft


def main():
    dev = jax.devices()[0]
    bw = 819.0
    for prefix, gbps in HBM_GBPS.items():
        if dev.device_kind.startswith(prefix):
            bw = gbps
            break

    batch, ctx, steps = 8, 128, 64
    try:
        args, toks_per_s, ttft = run(32, batch, ctx, steps)
        tag = "mistral-7b-bf16"
    except Exception:
        import gc

        gc.collect()
        jax.clear_caches()
        args, toks_per_s, ttft = run(16, batch, ctx, steps)
        tag = "mistral-7b-16layer-bf16"

    # Roofline: one decode step streams all weight bytes once (batch amortizes)
    # plus the live KV window per sequence.
    weight_bytes = param_count(args) * 2  # bf16
    kv_bytes = (
        args.n_layers * batch * (ctx + steps) * args.n_kv_heads * args.head_dim * 2 * 2
    )
    step_time_sol = (weight_bytes + kv_bytes) / (bw * 1e9)
    sol_toks_per_s = batch / step_time_sol

    print(
        json.dumps(
            {
                "metric": f"decode-throughput-{tag}-b{batch}",
                "value": round(toks_per_s, 2),
                "unit": "tokens/s/chip",
                "vs_baseline": round(toks_per_s / sol_toks_per_s, 4),
                "detail": {
                    "device": dev.device_kind,
                    "ttft_s": round(ttft, 4),
                    "sol_tokens_per_s": round(sol_toks_per_s, 2),
                    "hbm_gbps": bw,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
