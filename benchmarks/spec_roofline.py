"""On-chip speculative-decoding roofline: what does a K+1-token verify
forward cost relative to a 1-token decode step?

Speculative speedup = (1 + E[accepted]) / (verify_cost_ratio + draft_cost),
so the whole capability rests on verify_cost_ratio ≈ 1 — which is exactly
what the MXU weight-tile-load analysis predicts for B ≤ 128 decode
(docs/DECODE_PERF.md): the verify chunk reuses the same streamed weight
tiles for K+1 tokens. This bench measures that ratio on the real chip with
random weights (it is weight-value-independent) and prints the implied
speedup curve vs draft acceptance rate.

Run:  python benchmarks/spec_roofline.py          (7B geometry, B=32, int4+fp8)
Env:  BENCH_BATCH, BENCH_QUANT (int4|int8|bf16), SPEC_K (default 3)
      SPEC_MODEL=mamba — measure the Mamba prompt-lookup iteration
      (verify + seqlens-masked commit = TWO weight streams) against the
      1-token recurrent decode step on full-depth Codestral-Mamba geometry;
      profitable when E[accepted+1] > ratio.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.args import TransformerArgs
from mistral_inference_tpu.model import Transformer
from mistral_inference_tpu.models import transformer as tf

B = int(os.environ.get("BENCH_BATCH", "32"))
QUANT = os.environ.get("BENCH_QUANT", "int4")
K = int(os.environ.get("SPEC_K", "3"))
CTX = 256
STEPS = 64


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    if os.environ.get("SPEC_SMOKE"):  # tiny CPU smoke configuration
        args = TransformerArgs(
            dim=256, n_layers=2, head_dim=64, hidden_dim=512, n_heads=4,
            n_kv_heads=2, norm_eps=1e-5, vocab_size=32_000, rope_theta=1e6,
            sliding_window=512, max_batch_size=B, kv_quant="fp8",
        )
    else:
        args = TransformerArgs(
            dim=4096, n_layers=32, head_dim=128, hidden_dim=14336, n_heads=32,
            n_kv_heads=8, norm_eps=1e-5, vocab_size=32_000, rope_theta=1e6,
            sliding_window=4096, max_batch_size=B, kv_quant="fp8",
        )
    if QUANT in ("int4", "int8"):
        from mistral_inference_tpu.quant.weights import init_quantized_params

        params = init_quantized_params(jax.random.PRNGKey(0), args, jnp.bfloat16, QUANT)
        model = Transformer(args, params, dtype=jnp.bfloat16)
        model.args.quant = QUANT
    else:
        model = Transformer.random(args, dtype=jnp.bfloat16, seed=0)

    cache = model.alloc_cache(B, CTX + (STEPS + 2) * (K + 2))
    cfg = model.cfg

    # Prefill CTX tokens so decode attends a realistic ring.
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 32000, (B, CTX)), jnp.int32)
    _, cache = model.forward(toks, jnp.full((B,), CTX, jnp.int32), cache, attend_cache=False)

    # -- fused 1-token decode blocks (the baseline denominator) --
    @jax.jit
    def decode_block(params, cache, t0):
        def step(carry, _):
            tok, cache = carry
            logits, cache = tf.forward(
                params, model.rope, tok[:, None], jnp.ones((B,), jnp.int32),
                cache, cfg, attend_cache=True,
            )
            return (jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache), None

        (tok, cache), _ = jax.lax.scan(step, (t0, cache), length=STEPS)
        return tok, cache

    # -- fused K+1-token verify blocks (no-write forward + commit) --
    from mistral_inference_tpu.cache import scatter_chunk

    @jax.jit
    def verify_block(params, cache, t0):
        def step(carry, _):
            tok, cache = carry
            chunk = jnp.tile(tok[:, None], (1, K + 1))
            vlog, chunk_kv = tf.forward(
                params, model.rope, chunk, jnp.full((B,), K + 1, jnp.int32),
                cache, cfg, attend_cache=True, write_cache=False,
            )
            # Commit a realistic mixed acceptance (half the chunk).
            cache = scatter_chunk(
                cache, chunk_kv[0], chunk_kv[1],
                jnp.full((B,), (K + 1) // 2 + 1, jnp.int32),
            )
            return (jnp.argmax(vlog[:, -1], -1).astype(jnp.int32), cache), None

        (tok, cache), _ = jax.lax.scan(step, (t0, cache), length=STEPS)
        return tok, cache

    t0 = jnp.zeros((B,), jnp.int32)

    def timeit(fn, cache):
        tok, cache = fn(model.params, cache, t0)  # compile + warm
        np.asarray(tok)
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            tok, cache = fn(model.params, cache, t0)
            np.asarray(tok)
            best = min(best, (time.perf_counter() - t) / STEPS)
        return best, cache

    t_decode, cache = timeit(decode_block, cache)
    t_verify, cache = timeit(verify_block, cache)
    ratio = t_verify / t_decode

    # Implied end-to-end speedup vs acceptance rate, for a draft costing
    # draft_frac of a target step per drafted token.
    draft_frac = 0.1
    curve = {}
    for acc in (0.0, 0.25, 0.5, 0.75, 0.9, 1.0):
        e_emit = 1 + acc * K  # expected tokens per iteration (geometric-ish, linearized)
        cost = ratio + draft_frac * (K + 1)
        curve[f"acc_{acc}"] = round(e_emit / cost, 3)

    print(json.dumps({
        "metric": "spec-verify-cost-ratio",
        "value": round(ratio, 4),
        "unit": f"verify({K + 1} tok) / decode(1 tok) step time",
        "detail": {
            "decode_step_ms": round(t_decode * 1e3, 3),
            "verify_step_ms": round(t_verify * 1e3, 3),
            "batch": B, "quant": QUANT, "K": K,
            "implied_speedup_vs_acceptance": curve,
            "note": "speedup = (1 + acc*K) / (ratio + 0.1*(K+1)); "
                    "ratio ~= 1 is the MXU weight-load-bound prediction",
        },
    }))


def main_mamba():
    """Lookup-iteration vs decode-step cost ratio for Mamba. The lookup
    iteration runs TWO full forwards (verify with state discarded + commit
    at seqlens=a+1), so the MXU/HBM prediction is ratio ≈ 2 — and the
    speculative speedup is E[accepted+1] / ratio (no draft cost at all)."""
    from functools import partial

    import bench
    from mistral_inference_tpu.generate import (
        _mamba_decode_block,
        _mamba_prefill_step,
    )
    from mistral_inference_tpu.model import Mamba
    from mistral_inference_tpu.speculative import _mamba_lookup_block

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    if os.environ.get("SPEC_SMOKE"):  # tiny CPU smoke configuration
        from mistral_inference_tpu.args import MambaArgs

        args = MambaArgs(
            dim=128, n_layers=2, vocab_size=1000, n_groups=2, rms_norm=True,
            residual_in_fp32=True, fused_add_norm=True,
            pad_vocab_size_multiple=16, tie_embeddings=False, d_state=16,
            d_conv=4, expand=2, headdim=16,
        )
    else:
        args = bench.codestral_mamba_args(int(os.environ.get("BENCH_LAYERS", "64")))

    if QUANT in ("int4", "int8"):
        from mistral_inference_tpu.quant.weights import init_quantized_mamba_params

        params = init_quantized_mamba_params(
            jax.random.PRNGKey(0), args, jnp.bfloat16, QUANT
        )
        model = Mamba(args, params, dtype=jnp.bfloat16)
        model.args.quant = QUANT
    else:
        model = Mamba.random(args, dtype=jnp.bfloat16, seed=0)
    cfg = model.cfg

    # Absorb CTX prompt tokens so timing starts from a realistic state.
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, args.vocab_size, (B, CTX)), jnp.int32)
    state = model.alloc_state(B)
    carry = jnp.zeros((B, args.vocab_size), jnp.float32)
    prefill = jax.jit(
        partial(_mamba_prefill_step, cfg=cfg, chunk=128),
        donate_argnames=("state",),
    )
    _, carry, state = prefill(
        model.params, toks, jnp.full((B,), CTX, jnp.int32), state, carry
    )

    decode = jax.jit(
        partial(
            _mamba_decode_block, cfg=cfg, n_steps=STEPS, temperature=0.0,
            top_p=0.8,
        ),
    )
    lookup = jax.jit(
        partial(
            _mamba_lookup_block, cfg=cfg, K=K, n_iters=STEPS,
            temperature=0.0, top_p=0.8, ngram=2,
        ),
    )

    key = jax.random.PRNGKey(0)
    # Periodic history: proposals resolve to real matches (timing is
    # content-independent — verify/commit do the same work either way).
    M = 4096
    hist = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None, :], (B, M // 8))
    hlen = jnp.full((B,), CTX, jnp.int32)
    t0 = jnp.zeros((B,), jnp.int32)

    def timeit(fn, *fn_args):
        out = fn(*fn_args)  # compile + warm
        np.asarray(out[0])
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            out = fn(*fn_args)
            np.asarray(out[0])
            best = min(best, (time.perf_counter() - t) / STEPS)
        return best

    t_decode = timeit(decode, model.params, carry, state, key, 0)
    t_lookup = timeit(lookup, model.params, t0, state, hist, hlen, key, 0)
    ratio = t_lookup / t_decode

    curve = {}
    for acc in (0.0, 0.25, 0.5, 0.75, 0.9, 1.0):
        curve[f"acc_{acc}"] = round((1 + acc * K) / ratio, 3)

    print(json.dumps({
        "metric": "mamba-lookup-cost-ratio",
        "value": round(ratio, 4),
        "unit": f"lookup iter (K={K}) / decode step time",
        "detail": {
            "decode_step_ms": round(t_decode * 1e3, 3),
            "lookup_iter_ms": round(t_lookup * 1e3, 3),
            "batch": B, "quant": QUANT, "K": K,
            "implied_speedup_vs_acceptance": curve,
            "note": "speedup = (1 + acc*K) / ratio; the verify+commit "
                    "iteration streams weights+state twice, so ratio ~= 2 "
                    "is the weight-stream-bound prediction",
        },
    }))


if __name__ == "__main__":
    if os.environ.get("SPEC_MODEL") == "mamba":
        main_mamba()
    else:
        main()
