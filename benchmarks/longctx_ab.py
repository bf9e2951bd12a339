"""On-chip A/B for the 4096-ring decode attention path.

Times ONLY the long-context decode block of the headline config
(Mistral-7B int4+fp8kv, B=32, 4096-slot ring) — skips bench.py's headline
prefill/decode timing so a kernel sweep doesn't re-measure what is already
known. The decode-attention kernel knobs (MISTRAL_DECODE_S / _RB / _BS)
are module-import constants, so run ONE CONFIG PER PROCESS:

    # XLA attention baseline (kernel off — production default)
    python benchmarks/longctx_ab.py
    # pallas decode kernel v2, RB batch-rows x BS ring-slots per program
    MISTRAL_DECODE_S=2048 MISTRAL_DECODE_RB=8 MISTRAL_DECODE_BS=2048 \
        python benchmarks/longctx_ab.py

Prints one JSON line {config, tokens_per_s, step_ms}.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from bench import mistral_7b_args
from mistral_inference_tpu.generate import _get_decode_block
from mistral_inference_tpu.model import Transformer
from mistral_inference_tpu.quant.weights import init_quantized_params

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
STEPS = 64
LONG_CTX = int(os.environ.get("BENCH_LONG_CTX", "4096"))
QUANT = os.environ.get("BENCH_QUANT", "int4")
# Ring dtype A/B (fp8 | bf16 | int8). Measured (L=16, 4096 ring): fp8
# 722.7 vs bf16 447.2 tok/s — more bytes lose, so the ring read is
# traffic-bound, not cast-bound. int8 (same bytes as fp8, native converts)
# still wins end-to-end: 1899 vs 1733 tok/s on the L=32 headline, 385 vs
# 364 long-ctx — the win is the cheaper convert work (quantize-on-write +
# score/V-path dequant), not ring bandwidth.
KV = os.environ.get("BENCH_KV", "int8")


def main() -> None:
    args = mistral_7b_args(int(os.environ.get("BENCH_LAYERS", "32")))
    args.quant = QUANT
    args.kv_quant = KV
    params = init_quantized_params(
        jax.random.PRNGKey(0), args, jnp.bfloat16, QUANT, 128
    )
    model = Transformer(args, params, dtype=jnp.bfloat16)
    decode = _get_decode_block(model, STEPS, temperature=0.0, top_p=0.8)
    key = jax.random.PRNGKey(0)

    lcache = model.alloc_cache(BATCH, LONG_CTX + 2 * STEPS + 2)
    lcache = dataclasses.replace(
        lcache, kv_len=jnp.full((BATCH,), LONG_CTX, jnp.int32)
    )
    lcarry = jnp.zeros((BATCH, args.vocab_size), jnp.float32)
    toks, _, lcarry, lcache = decode(model.params, model.rope, lcarry, lcache, key, 0)
    np.asarray(toks)
    t0 = time.perf_counter()
    toks, _, lcarry, lcache = decode(model.params, model.rope, lcarry, lcache, key, STEPS)
    np.asarray(toks)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "config": {
            "S": os.environ.get("MISTRAL_DECODE_S", "off"),
            "RB": os.environ.get("MISTRAL_DECODE_RB", "-"),
            "BS": os.environ.get("MISTRAL_DECODE_BS", "-"),
            "ring": LONG_CTX, "batch": BATCH, "quant": QUANT,
        },
        "tokens_per_s": round(BATCH * STEPS / dt, 2),
        "step_ms": round(dt / STEPS * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
