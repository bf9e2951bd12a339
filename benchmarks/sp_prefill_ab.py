"""Chipless A/B of sequence-parallel prefill (VERDICT r2 #5 second half).

One real chip can't run a multi-device mesh, so this AOT-compiles the EXACT
prefill step (`generate._prefill_step`, 7B int4 geometry) for a v5e-4
topology twice — dp=4 (batch-split, the SP-less baseline) vs seq=4 (each
chip takes T/4 of the chunk) — and compares:

  * the TPU compiler's estimated_cycles for the main computation
    (per-chip compute+memory time model, no overlap), and
  * the collective inventory GSPMD inserted (SP's cost is the extra
    all-gathers around attention; its win is T/4-sized activations).

The decision case for SP is LOW-BATCH LONG-PROMPT prefill: at B=1 a dp
mesh leaves 3 chips idle (dp can't split one request), while seq=4 splits
the tokens. At B>=4·dp there is nothing to win — dp is collective-free.

Run:  python benchmarks/sp_prefill_ab.py        (~4 min, no chip)
Env:  SP_BATCH (1), SP_T (4096), SP_LAYERS (8)
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from mistral_inference_tpu.args import TransformerArgs  # noqa: E402
from mistral_inference_tpu.cache import KVCache  # noqa: E402
from mistral_inference_tpu.generate import _prefill_step  # noqa: E402
from mistral_inference_tpu.models.transformer import (  # noqa: E402
    StaticConfig,
    make_rope,
)
from mistral_inference_tpu.parallel.sharding import (  # noqa: E402
    _divisible_spec,
    _match_leaf_specs,
    cache_specs,
    param_specs,
)
from mistral_inference_tpu.quant.weights import init_quantized_params  # noqa: E402

CYC_RE = re.compile(r'"estimated_cycles":"(\d+)"')
V5E_HZ = 1.5e9

B = int(os.environ.get("SP_BATCH", "1"))
T = int(os.environ.get("SP_T", "4096"))
L = int(os.environ.get("SP_LAYERS", "8"))


def build(mesh_axes: dict):
    args = TransformerArgs(
        dim=4096, n_layers=L, head_dim=128, hidden_dim=14336, n_heads=32,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=32_000, rope_theta=1e6,
        sliding_window=4096, max_batch_size=B, kv_quant="int8",
    )
    args.quant = "int4"
    cfg = StaticConfig.from_args(args, attn_impl="xla")

    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2x1")
    from mistral_inference_tpu.parallel.mesh import MESH_AXES

    shape = tuple(mesh_axes.get(n, 1) for n in MESH_AXES)
    mesh = Mesh(np.array(topo.devices).reshape(shape), MESH_AXES)
    rep = NamedSharding(mesh, P())

    params_abs = jax.eval_shape(
        lambda k: init_quantized_params(k, args, jnp.bfloat16, "int4", 128),
        jax.random.PRNGKey(0),
    )
    pspecs = _match_leaf_specs(params_abs, param_specs(moe=False))
    params_abs = jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(
            x.shape, x.dtype,
            sharding=NamedSharding(mesh, _divisible_spec(x, s, mesh)),
        ),
        params_abs, pspecs,
        is_leaf=lambda x: not isinstance(x, dict),
    )
    rope_abs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep),
        jax.eval_shape(lambda: make_rope(args)),
    )
    cache_raw = jax.eval_shape(lambda: KVCache.alloc(
        L, B, T + 64, args.n_kv_heads, args.head_dim,
        sliding_window=args.sliding_window, kv_quant="int8"))
    cache_abs = jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(
            x.shape, x.dtype,
            sharding=NamedSharding(mesh, _divisible_spec(x, s, mesh)),
        ),
        cache_raw, cache_specs(True),
    )
    toks = jax.ShapeDtypeStruct((B, T), jnp.int32, sharding=rep)
    lens = jax.ShapeDtypeStruct((B,), jnp.int32, sharding=rep)
    carry = jax.ShapeDtypeStruct((B, args.vocab_size), jnp.float32, sharding=rep)

    f = partial(_prefill_step, cfg=cfg, attend_cache=False, mesh=mesh)
    lowered = jax.jit(f, donate_argnames=("cache",)).lower(
        params_abs, rope_abs, toks, lens, cache_abs, carry
    )
    return lowered.compile().as_text()


def analyze(txt: str):
    cur, by_comp = None, defaultdict(int)
    coll = defaultdict(int)
    for ln in txt.splitlines():
        s = ln.strip()
        if s.endswith("{") and (s.startswith("%") or s.startswith("ENTRY")):
            cur = s.split()[0]
        m = CYC_RE.search(ln)
        if m and cur:
            by_comp[cur] += int(m.group(1))
        for k in ("all-reduce", "all-gather", "all-to-all",
                  "collective-permute", "reduce-scatter"):
            if re.search(rf"= \S+ {k}", ln) or f" {k}(" in ln:
                coll[k] += 1
    total_ms = sum(by_comp.values()) / V5E_HZ * 1e3
    return total_ms, dict(coll)


def main():
    for name, axes in (("dp4", {"data": 4}), ("seq4", {"seq": 4})):
        txt = build(axes)
        ms, coll = analyze(txt)
        print(f"{name}: est {ms:8.2f} ms/chunk   collectives: {coll}",
              flush=True)


if __name__ == "__main__":
    main()
