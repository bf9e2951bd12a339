"""Mamba prefill probe (r5): where do the serving admission sweeps'
~1.34 s / 4096 tokens go? Times _mamba_prefill_step at the serving shape
(B=8, T=512, full-depth int8 Codestral-Mamba) across SSD chunk sizes, and
the B=16/T=128 shape the r4 bench measured at ~10k tok/s.

Timing: serial donation-linked call chains, scalar-sum consumer
(axon rules — see moe_prefill_decomp.py header).
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.args import MambaArgs
from mistral_inference_tpu.generate import _mamba_prefill_step
from mistral_inference_tpu.model import Mamba
from mistral_inference_tpu.quant.weights import init_quantized_mamba_params


def margs():
    return MambaArgs(
        dim=4096, n_layers=64, vocab_size=32_768, n_groups=8,
        rms_norm=True, residual_in_fp32=True, fused_add_norm=True,
        pad_vocab_size_multiple=16, tie_embeddings=False,
    )


def run_case(model, B, T, chunk, reps=4, want_lp=True):
    args = model.args
    prefill = jax.jit(
        partial(_mamba_prefill_step, cfg=model.cfg, chunk=chunk,
                want_logprobs=want_lp),
        donate_argnames=("state",),
    )
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, args.vocab_size, (B, T)), jnp.int32)
    seqlens = jnp.full((B,), T, jnp.int32)
    carry = jnp.zeros((B, args.vocab_size), jnp.float32)
    state = model.alloc_state(B)
    _, carry, state = prefill(model.params, tokens, seqlens, state, carry)
    np.asarray(jnp.sum(carry))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(reps):
            _, carry, state = prefill(model.params, tokens, seqlens, state, carry)
        np.asarray(jnp.sum(carry))
        best = min(best, (time.perf_counter() - t0) / reps)
    tps = B * T / best
    print(f"B={B:3d} T={T:4d} chunk={chunk:4d} lp={int(want_lp)}: "
          f"{best*1e3:8.1f} ms  {tps:9.0f} tok/s", flush=True)
    return best


def main():
    args = margs()
    params = init_quantized_mamba_params(
        jax.random.PRNGKey(0), args, jnp.bfloat16, "int8", 128
    )
    model = Mamba(args, params, dtype=jnp.bfloat16)
    args.quant = "int8"
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    import os
    cases = os.environ.get("MAMBA_PROBE_CASES", "8x512x128,8x512x512")
    for c in cases.split(","):
        parts = list(map(int, c.split("x")))
        B, T, chunk = parts[:3]
        want_lp = bool(parts[3]) if len(parts) > 3 else True
        run_case(model, B, T, chunk, want_lp=want_lp)


if __name__ == "__main__":
    main()
