"""Chipless lookup-spec-block profiler: AOT-compile the exact serving
lookup speculative block (speculative._lookup_block — the program behind
Engine(draft_model="lookup")) for a real v5e topology and aggregate the
TPU compiler's per-op ``estimated_cycles``, exactly like aot_profile.py
does for the plain decode block.

Round-3 motivation: the serving bench measured the lookup-spec config at
~128 ms per verify iteration at B=32 vs ~13 ms for a plain decode step —
~10x, far beyond the expected ~1.2x cost of a (B, K+1) verify forward.
This ranks the while-body ops to find where the time goes.

Usage:
    python benchmarks/aot_spec_profile.py
    AOT_BATCH=32 AOT_RING=768 AOT_K=4 AOT_ITERS=2 python benchmarks/aot_spec_profile.py
"""

import os
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from aot_profile import build_args, report  # noqa: E402

from mistral_inference_tpu.cache import KVCache  # noqa: E402
from mistral_inference_tpu.models.transformer import (  # noqa: E402
    StaticConfig,
    make_rope,
)
from mistral_inference_tpu.quant.weights import init_quantized_params  # noqa: E402
from mistral_inference_tpu.speculative import _lookup_block  # noqa: E402


def compile_lookup_block(args, ring: int, batch: int, K: int, n_iters: int,
                         hist_span: int) -> str:
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
    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2x1")
    mesh = Mesh(np.array(topo.devices[:1]), ("x",))
    rep = NamedSharding(mesh, P())

    def absify(t):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep), t
        )

    f = partial(
        _lookup_block, cfg_t=cfg, K=K, n_iters=n_iters, temperature=0.0,
        top_p=0.8, ngram=2, mesh_t=None,
    )
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt, sharding=rep)  # noqa: E731
    lowered = jax.jit(f, donate_argnames=("tcache", "hist")).lower(
        absify(params_abs), absify(rope_abs),
        sds((batch,), jnp.int32),            # t0
        absify(cache_abs),                   # tcache
        sds((batch, hist_span), jnp.int32),  # hist
        sds((batch,), jnp.int32),            # hlen
        sds((2,), jnp.uint32),               # base_key
        0,                                   # it0
        sds((batch,), jnp.float32),          # temps
        sds((batch,), jnp.int32),            # live
        sds((batch,), jnp.float32),          # top_ps
    )
    return lowered.compile().as_text()


if __name__ == "__main__":
    args = build_args()
    ring = int(os.environ.get("AOT_RING", "768"))
    batch = args.max_batch_size
    K = int(os.environ.get("AOT_K", "4"))
    n_iters = int(os.environ.get("AOT_ITERS", "2"))
    hist_span = int(os.environ.get("AOT_HIST", "704"))
    print(
        f"AOT-compiling lookup spec block: L={args.n_layers} B={batch} "
        f"ring={ring} K={K} iters={n_iters}", file=sys.stderr,
    )
    report(compile_lookup_block(args, ring, batch, K, n_iters, hist_span))
