"""7B-geometry quantization quality gate: teacher-forced Δlogprob vs bf16.

VERDICT r2 weak #6: the ≤0.1-Δppl bar (BASELINE.md row "quality") had only a
dim=256 toy proxy behind it. Real checkpoints aren't available in this
environment, but a FULL 7B-geometry model with random weights is runnable on
the one v5e today, and quantization error is a per-matmul numerics property
— weight/activation distributions here are gaussian init rather than
trained, so treat the numbers as a lower bound sanity gate, not a ppl claim.

Method: one bf16 7B model (fixed seed, init on HOST — 14.5 GB doesn't
leave room to quantize on-device next to itself), teacher-forced prompt
logprobs on B×T random tokens; then each quantized variant is produced on
host by `quant.weights.quantize_params` from THE SAME bf16 weights, pushed,
and diffed logprob-by-logprob. The serving configs measured:

    int8            (weights int8, KV bf16)
    int4            (weights int4, KV bf16)
    int4 + int8 KV  (the headline/serving config; prefill roundtrips K/V)
    int4 + fp8 KV

Run:  python benchmarks/quality_7b.py          (~10 min on the chip)
Env:  QUAL_BATCH (4), QUAL_T (512), QUAL_SEED (0)

Prints one JSON line per variant:
  {"metric": "quality-dlogprob-7b-<variant>", "value": <mean |Δlogprob|>,
   "detail": {"p99": ..., "max": ..., "bits_per_weight": ...}}
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from mistral_inference_tpu.args import TransformerArgs  # noqa: E402
from mistral_inference_tpu.generate import generate  # noqa: E402
from mistral_inference_tpu.model import Transformer  # noqa: E402
from mistral_inference_tpu.models.transformer import init_params  # noqa: E402
from mistral_inference_tpu.quant.weights import quantize_params  # noqa: E402

B = int(os.environ.get("QUAL_BATCH", "4"))
T = int(os.environ.get("QUAL_T", "512"))
SEED = int(os.environ.get("QUAL_SEED", "0"))


def seven_b(kv_quant: str = "bf16") -> TransformerArgs:
    return TransformerArgs(
        dim=4096, n_layers=32, head_dim=128, hidden_dim=14336, n_heads=32,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=32_000, rope_theta=1e6,
        sliding_window=4096, max_batch_size=B, kv_quant=kv_quant,
    )


def host_tree(t):
    return jax.tree_util.tree_map(np.asarray, t)


def prompt_logprobs(args: TransformerArgs, params, quant: str | None):
    """Teacher-forced logprobs for the fixed random prompts (device run)."""
    model = Transformer(args, jax.device_put(params), dtype=jnp.bfloat16)
    if quant:
        model.args.quant = quant
    rng = np.random.default_rng(SEED)
    prompts = rng.integers(1, args.vocab_size, (B, T)).tolist()
    _, lps = generate(prompts, model, max_tokens=1, temperature=0.0,
                      chunk_size=T)
    del model
    return np.asarray(lps, np.float64)[:, : T - 1]  # drop the generated tok


def main():
    with jax.default_device(jax.devices("cpu")[0]):
        bf16 = init_params(jax.random.PRNGKey(SEED), seven_b(), jnp.bfloat16)
        bf16 = host_tree(bf16)

    ref = prompt_logprobs(seven_b(), bf16, None)

    import copy

    variants = [
        ("int8", "int8", "bf16"),
        ("int4", "int4", "bf16"),
        ("int4-int8kv", "int4", "int8"),
        ("int4-fp8kv", "int4", "fp8"),
    ]
    qcache: dict[str, object] = {}
    for label, wq, kvq in variants:
        if wq not in qcache:
            with jax.default_device(jax.devices("cpu")[0]):
                qcache[wq] = host_tree(
                    quantize_params(copy.deepcopy(bf16), wq)
                )
        lps = prompt_logprobs(seven_b(kv_quant=kvq), qcache[wq], wq)
        d = np.abs(lps - ref)
        print(json.dumps({
            "metric": f"quality-dlogprob-7b-{label}",
            "value": round(float(d.mean()), 5),
            "unit": "mean |dlogprob| vs bf16 (teacher-forced)",
            "detail": {
                "p99": round(float(np.percentile(d, 99)), 5),
                "max": round(float(d.max()), 5),
                "tokens": int(d.size),
                "geometry": "7B (4096x32L, random weights)",
            },
        }), flush=True)


if __name__ == "__main__":
    main()
