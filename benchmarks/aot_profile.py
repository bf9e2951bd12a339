"""Chipless decode-block profiler: AOT-compile the exact decode program
for a real v5e TPU topology (jax.experimental.topologies — no chip needed)
and aggregate the TPU compiler's per-op ``estimated_cycles``.

This is how the round-2 perf sinks were found without touching hardware:
the full-cache scan-carry copies (~10.6 ms/step), and the per-layer fp8
ring relayout copies on the long-context path (docs/DECODE_PERF.md).
Estimates are coarse in absolute terms (no pipelining model) — use them
for RELATIVE ranking of while-body ops, and note two trace-time caveats:
(1) the host platform is CPU, so `ops/linear._on_tpu()` gates the pallas
matmul kernels OFF — weight matmuls appear as XLA dequant fusions here
even though the chip runs the fused kernels; (2) pallas custom calls carry
no estimated_cycles at all.

Usage:
    python benchmarks/aot_profile.py                     # 7B int4+fp8, 258-slot ring
    AOT_RING=4096 python benchmarks/aot_profile.py      # long-context config
    AOT_MODEL=mixtral python benchmarks/aot_profile.py  # dispatch-MoE config
"""

import os
import re
import sys
from collections import defaultdict
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from mistral_inference_tpu.args import MoeArgs, TransformerArgs  # noqa: E402
from mistral_inference_tpu.cache import KVCache  # noqa: E402
from mistral_inference_tpu.generate import _decode_block  # noqa: E402
from mistral_inference_tpu.models.transformer import (  # noqa: E402
    StaticConfig,
    make_rope,
)
from mistral_inference_tpu.quant.weights import init_quantized_params  # noqa: E402

CYC_RE = re.compile(r'"estimated_cycles":"(\d+)"')
V5E_HZ = 1.5e9  # public spec: 197 bf16 TFLOPs / (4 MXU x 16384 MAC x 2)


def build_args() -> TransformerArgs:
    L = int(os.environ.get("AOT_LAYERS", "4"))
    kw = dict(
        dim=4096, n_layers=L, head_dim=128, hidden_dim=14336, n_heads=32,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=32_000, rope_theta=1e6,
        sliding_window=4096, max_batch_size=int(os.environ.get("AOT_BATCH", "32")),
        kv_quant=os.environ.get("AOT_KV", "int8"),
    )
    if os.environ.get("AOT_MODEL") == "mixtral":
        kw["moe"] = MoeArgs(num_experts=8, num_experts_per_tok=2)
        kw["moe_impl"] = "dispatch"
    return TransformerArgs(**kw)


def compile_decode_block(args: TransformerArgs, ring: int, batch: int) -> str:
    """Returns the optimized TPU HLO text of the fused decode block, with
    abstract (eval_shape) params — nothing is materialized."""
    cfg = StaticConfig.from_args(args, attn_impl="pallas")
    quant = os.environ.get("AOT_QUANT", "int4")
    params_abs = jax.eval_shape(
        lambda k: init_quantized_params(k, args, jnp.bfloat16, quant),
        jax.random.PRNGKey(0),
    )
    cache_abs = jax.eval_shape(
        lambda: KVCache.alloc(
            args.n_layers, batch, ring, args.n_kv_heads, args.head_dim,
            args.sliding_window, jnp.bfloat16, args.kv_quant,
        )
    )
    rope_abs = jax.eval_shape(lambda: make_rope(args))
    # v5e:1x1x1 is rejected (chips_per_host_bounds); use one device of 2x2.
    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2x1")
    mesh = Mesh(np.array(topo.devices[:1]), ("x",))
    rep = NamedSharding(mesh, P())

    def absify(t):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep), t
        )

    f = partial(
        _decode_block, cfg=cfg, n_steps=int(os.environ.get("AOT_STEPS", "4")),
        temperature=0.0, top_p=0.8,
    )
    lowered = jax.jit(f, donate_argnames=("cache",)).lower(
        absify(params_abs), absify(rope_abs),
        jax.ShapeDtypeStruct((batch, args.vocab_size), jnp.float32, sharding=rep),
        absify(cache_abs),
        jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep),
        0,
    )
    return lowered.compile().as_text()


def report(txt: str, top: int = 14) -> None:
    cur = None
    by_comp = defaultdict(int)
    ops = defaultdict(int)
    for ln in txt.splitlines():
        s = ln.strip()
        if s.endswith("{") and (s.startswith("%") or s.startswith("ENTRY")):
            cur = s.split()[0]
        m = CYC_RE.search(ln)
        if m and cur:
            c = int(m.group(1))
            by_comp[cur] += c
            if " = " in s:
                kind = re.sub(r"[\d\.]+$", "", s.split(" = ")[0].lstrip("%").split(".")[0])
                shape = s.split(" = ")[1].split(" ")[0][:46]
                ops[(cur, kind, shape)] += c
    comps = sorted(by_comp.items(), key=lambda kv: -kv[1])
    print("computations by estimated_cycles (ms-equivalent at the v5e 1.5 GHz clock):")
    for name, c in comps[:4]:
        print(f"  {c / V5E_HZ * 1e3:9.3f}  {name[:72]}")
    body = next((n for n, _ in comps if "region" in n), comps[0][0])
    print(f"\ntop ops inside {body[:60]}:")
    rows = sorted(
        ((c, k, sh) for (comp, k, sh), c in ops.items() if comp == body),
        reverse=True,
    )
    for c, kind, shape in rows[:top]:
        print(f"  {c / V5E_HZ * 1e3:9.3f}  {kind:24s} {shape}")


if __name__ == "__main__":
    args = build_args()
    ring = int(os.environ.get("AOT_RING", "258"))
    batch = args.max_batch_size
    print(
        f"AOT-compiling decode block: L={args.n_layers} B={batch} ring={ring}"
        f" moe={bool(args.moe)}", file=sys.stderr,
    )
    report(compile_decode_block(args, ring, batch))
