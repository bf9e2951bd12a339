"""Benchmark suite — throughput, TTFT, and quantization-quality proxies.

The reference has no benchmarks at all (SURVEY §6). This harness reports:
  * decode tokens/s/chip + TTFT for the flagship dense config at several
    quant settings (bf16 / int8 / int4, fp8 KV),
  * mamba decode throughput,
  * quantization quality: mean/max |Δ logprob| vs the fp32 model over
    teacher-forced random prompts (the Δppl proxy available without real
    checkpoints: Δppl ≈ mean Δ neg-logprob).

Usage:  python benchmarks/run_all.py [--small]
``--small`` runs CPU-sized configs (CI); the default sizes target one TPU
chip. Prints one JSON document.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.args import MambaArgs, TransformerArgs
from mistral_inference_tpu.generate import (
    _get_decode_block,
    _get_prefill,
    generate,
    generate_mamba,
)
from mistral_inference_tpu.model import Mamba, Transformer


def dense_args(small: bool) -> TransformerArgs:
    if small:
        return TransformerArgs(
            dim=256, n_layers=2, head_dim=64, hidden_dim=512, n_heads=4,
            n_kv_heads=2, norm_eps=1e-5, vocab_size=1024, rope_theta=1e6,
        )
    return TransformerArgs(
        dim=4096, n_layers=32, head_dim=128, hidden_dim=14336, n_heads=32,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=32_768, rope_theta=1e6,
        sliding_window=4096,
    )


def mamba_args(small: bool) -> MambaArgs:
    if small:
        return MambaArgs(
            dim=128, n_layers=2, vocab_size=512, n_groups=2, rms_norm=True,
            residual_in_fp32=True, fused_add_norm=True,
            pad_vocab_size_multiple=16, tie_embeddings=False, d_state=16,
            headdim=16,
        )
    # Half-depth Codestral-Mamba shape: the full 64-layer model in bf16
    # (14.6GB) plus its fp32 SSM state does not fit one 16GB v5e — the
    # full model needs TP over >=2 chips (state alone is 270MB/layer at
    # B=32). Throughput per layer is depth-independent (layer lax.scan).
    return MambaArgs(
        dim=4096, n_layers=32, vocab_size=32_768, n_groups=8, rms_norm=True,
        residual_in_fp32=True, fused_add_norm=True, pad_vocab_size_multiple=16,
        tie_embeddings=False,
    )


def throughput_dense(args: TransformerArgs, quant, kv_quant, batch, ctx, steps):
    import dataclasses

    args = dataclasses.replace(args, kv_quant=kv_quant or "bf16")
    if quant:
        from mistral_inference_tpu.quant.weights import init_quantized_params

        args.quant = quant
        params = init_quantized_params(
            jax.random.PRNGKey(0), args, jnp.bfloat16, quant
        )
        model = Transformer(args, params, dtype=jnp.bfloat16)
    else:
        model = Transformer.random(args, dtype=jnp.bfloat16, seed=0)

    cache = model.alloc_cache(batch, ctx + 2 * steps + 2)
    toks = jnp.zeros((batch, ctx), jnp.int32)
    sl = jnp.full((batch,), ctx, jnp.int32)
    carry = jnp.zeros((batch, args.vocab_size), jnp.float32)
    prefill = _get_prefill(model, attend_cache=False, with_embeds=False,
                           want_logprobs=False)
    decode = _get_decode_block(model, steps, 0.0, 0.8)
    key = jax.random.PRNGKey(0)

    _, carry, cache = prefill(model.params, model.rope, toks, sl, cache, carry)
    np.asarray(carry)
    t0 = time.perf_counter()
    _, carry, cache = prefill(
        model.params, model.rope, toks, jnp.zeros_like(sl), cache, carry
    )
    np.asarray(carry)
    ttft = time.perf_counter() - t0  # steady-state prefill dispatch+run

    o, _, carry, cache = decode(model.params, model.rope, carry, cache, key, 0)
    np.asarray(o)
    t0 = time.perf_counter()
    o, _, carry, cache = decode(model.params, model.rope, carry, cache, key, steps)
    np.asarray(o)
    dt = time.perf_counter() - t0
    return {"tokens_per_s": round(batch * steps / dt, 1), "ttft_s": round(ttft, 3)}


def throughput_mamba(args: MambaArgs, batch, ctx, steps, quant=None):
    if quant:
        from mistral_inference_tpu.quant.weights import init_quantized_mamba_params

        params = init_quantized_mamba_params(
            jax.random.PRNGKey(0), args, jnp.bfloat16, quant,
            min(128, args.dim),
        )
        model = Mamba(args, params, dtype=jnp.bfloat16)
    else:
        model = Mamba.random(args, dtype=jnp.bfloat16, seed=0)
    prompts = [[(i + j) % args.vocab_size or 1 for j in range(ctx)] for i in range(batch)]
    t0 = time.perf_counter()
    generate_mamba(prompts, model, max_tokens=1, temperature=0.0, decode_block=1)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    generate_mamba(
        prompts, model, max_tokens=steps, temperature=0.0, decode_block=steps
    )
    dt = time.perf_counter() - t0
    return {"tokens_per_s": round(batch * steps / dt, 1), "compile_s": round(warm, 1)}


def quant_quality(args: TransformerArgs):
    """Mean/max |Δ teacher-forced logprob| vs fp32 — the Δppl proxy."""
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, args.vocab_size, 48)) for _ in range(4)]
    ref = Transformer.random(args, dtype=jnp.float32, seed=0)
    _, lp_ref = generate(prompts, ref, max_tokens=0, temperature=0.0)
    out = {}
    for mode, kv in [
        ("int8", "bf16"), ("int4", "bf16"),
        (None, "fp8"), (None, "int8"),
        ("int8", "fp8"), ("int4", "int8"),
    ]:
        import dataclasses

        a = dataclasses.replace(args, kv_quant=kv)
        m = Transformer.random(a, dtype=jnp.float32, seed=0)
        if mode:
            m.quantize(mode, group=min(128, args.dim))
        _, lp = generate(prompts, m, max_tokens=0, temperature=0.0)
        deltas = np.concatenate(
            [np.abs(np.array(a_) - np.array(b_)) for a_, b_ in zip(lp_ref, lp)]
        )
        out[f"{mode or 'bf16'}+kv_{kv}"] = {
            "mean_abs_dlogprob": round(float(deltas.mean()), 5),
            "max_abs_dlogprob": round(float(deltas.max()), 5),
        }
    return out


def run_one(which: str, small: bool):
    batch, ctx, steps = (4, 32, 16) if small else (32, 128, 64)
    if which.startswith("dense:"):
        label = which.split(":", 1)[1]
        q, kv = {
            "int8+fp8kv": ("int8", "fp8"),
            "int4+fp8kv": ("int4", "fp8"),
            "int4+int8kv": ("int4", "int8"),
        }[label]
        return throughput_dense(dense_args(small), q, kv, batch, ctx, steps)
    if which == "mamba":
        return throughput_mamba(mamba_args(small), min(batch, 8), ctx, steps)
    if which == "mamba:int8":
        # FULL-depth Codestral-Mamba — only possible on one chip because the
        # projections are quantized (bf16 is 14.5 GB > 16 GB HBM).
        import dataclasses

        a = mamba_args(small)
        if not small:
            a = dataclasses.replace(a, n_layers=64)
        return throughput_mamba(a, min(batch, 16), ctx, steps, quant="int8")
    if which == "quality":
        return quant_quality(dense_args(True))
    raise ValueError(which)


def main():
    import subprocess

    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--skip-quality", action="store_true")
    ap.add_argument("--one", default=None, help="internal: run a single config")
    ap.add_argument(
        "--platform", default=None,
        help="force a jax platform (the env's sitecustomize pins the TPU "
        "tunnel; env-var overrides are too late — jax.config works)",
    )
    args_ns = ap.parse_args()
    if args_ns.platform:
        jax.config.update("jax_platforms", args_ns.platform)
    small = args_ns.small

    if args_ns.one:
        out = run_one(args_ns.one, small)
        out["device"] = jax.devices()[0].device_kind
        print(json.dumps(out))
        return

    # Each config runs in its own subprocess: big-model configs don't share
    # HBM, and one wedged remote compile can't take down the whole suite.
    # The PARENT must never touch jax.devices(): one python process may own
    # the chip at a time on the axon tunnel, and a parent holding the
    # backend makes every child's init flaky ("no jellyfish device found").
    report = {"device": None, "dense": {}}
    configs = ["dense:int8+fp8kv", "dense:int4+int8kv", "mamba", "mamba:int8"]
    if not args_ns.skip_quality:
        configs.append("quality")
    for which in configs:
        # Children inherit the default (tunnel) backend; when the parent
        # was explicitly overridden (e.g. CPU), they must be too — a dead
        # tunnel would otherwise hang every subprocess at backend init.
        cmd = [sys.executable, __file__, "--one", which] + (
            ["--small"] if small else []
        ) + (["--platform", args_ns.platform] if args_ns.platform else [])
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1800, check=True
            )
            val = json.loads(out.stdout.strip().splitlines()[-1])
        except Exception as e:
            val = {"error": str(e)[:200]}
        key = which.split(":", 1)
        if report["device"] is None and isinstance(val, dict):
            report["device"] = val.get("device")
        if key[0] == "dense":
            report["dense"][key[1]] = val
        else:
            report[which.replace(":", "_")] = val
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
