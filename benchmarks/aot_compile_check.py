"""Chipless TPU compile check: AOT-compile the real decode blocks — WITH the
Pallas kernels engaged — against a v5e topology (jax.experimental.topologies;
no chip needed) and report custom-call counts.

Why: ops/linear gates the Pallas dequant-matmul kernels on `_on_tpu()`, so
CPU tests and `aot_profile.py` never trace them; the first time a kernel
meets a new weight shape is otherwise ON the chip, mid-benchmark, through a
slow remote-compile tunnel. Forcing the gate at trace time catches Mosaic
errors (e.g. the decode-attention scoped-vmem overflow, the int4 i8-shift
legalization failure — both found this way) in minutes, offline.

Usage:
    python benchmarks/aot_compile_check.py              # all configs
    AOT_MODELS=mamba python benchmarks/aot_compile_check.py
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

import mistral_inference_tpu.ops.linear as lin  # noqa: E402

lin._ON_TPU = True  # force the pallas gate at trace time

import bench  # noqa: E402
from mistral_inference_tpu.cache import KVCache  # noqa: E402
from mistral_inference_tpu.generate import (  # noqa: E402
    _decode_block,
    _mamba_decode_block,
)
from mistral_inference_tpu.models.mamba import (  # noqa: E402
    MambaState,
    MambaStaticConfig,
)
from mistral_inference_tpu.models.transformer import (  # noqa: E402
    StaticConfig,
    make_rope,
)
from mistral_inference_tpu.quant.weights import (  # noqa: E402
    init_quantized_mamba_params,
    init_quantized_params,
)


def _mesh():
    # v5e:1x1x1 is rejected (chips_per_host_bounds); one device of 2x2.
    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2x1")
    mesh = Mesh(np.array(topo.devices[:1]), ("x",))
    return NamedSharding(mesh, P())


def _absify(tree, rep):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep), tree
    )


def check_transformer(quant: str, batch: int = 32, ring: int = 258) -> int:
    args = bench.mistral_7b_args(4)
    args.max_batch_size = batch
    cfg = StaticConfig.from_args(args, attn_impl="pallas")
    rep = _mesh()
    params = jax.eval_shape(
        lambda k: init_quantized_params(k, args, jnp.bfloat16, quant),
        jax.random.PRNGKey(0),
    )
    cache = jax.eval_shape(
        lambda: KVCache.alloc(
            args.n_layers, batch, ring, args.n_kv_heads, args.head_dim,
            args.sliding_window, jnp.bfloat16, args.kv_quant,
        )
    )
    rope = jax.eval_shape(lambda: make_rope(args))
    f = partial(_decode_block, cfg=cfg, n_steps=4, temperature=0.0, top_p=0.8)
    txt = (
        jax.jit(f, donate_argnames=("cache",))
        .lower(
            _absify(params, rep), _absify(rope, rep),
            jax.ShapeDtypeStruct((batch, args.vocab_size), jnp.float32, sharding=rep),
            _absify(cache, rep),
            jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep),
            0,
        )
        .compile()
        .as_text()
    )
    return txt.count("custom-call")


def check_mamba(quant: str, batch: int = 16) -> int:
    args = bench.codestral_mamba_args(4)
    cfg = MambaStaticConfig.from_args(args, pallas=True)
    rep = _mesh()
    params = jax.eval_shape(
        lambda k: init_quantized_mamba_params(k, args, jnp.bfloat16, quant),
        jax.random.PRNGKey(0),
    )
    state = jax.eval_shape(lambda: MambaState.alloc(cfg, batch, jnp.bfloat16))
    f = partial(_mamba_decode_block, cfg=cfg, n_steps=4, temperature=0.0, top_p=0.8)
    txt = (
        jax.jit(f, donate_argnames=("state",))
        .lower(
            _absify(params, rep),
            jax.ShapeDtypeStruct((batch, args.vocab_size), jnp.float32, sharding=rep),
            _absify(state, rep),
            jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep),
            0,
        )
        .compile()
        .as_text()
    )
    return txt.count("custom-call")


def check_lookup(quant: str, batch: int = 32, ring: int = 258, K: int = 8) -> int:
    """Transformer prompt-lookup block: the verify forward runs the pallas
    matmul path at chunk width K+1 — a shape plain decode never traces."""
    from mistral_inference_tpu.speculative import _lookup_block

    args = bench.mistral_7b_args(4)
    args.max_batch_size = batch
    cfg = StaticConfig.from_args(args, attn_impl="pallas")
    rep = _mesh()
    params = jax.eval_shape(
        lambda k: init_quantized_params(k, args, jnp.bfloat16, quant),
        jax.random.PRNGKey(0),
    )
    cache = jax.eval_shape(
        lambda: KVCache.alloc(
            args.n_layers, batch, ring, args.n_kv_heads, args.head_dim,
            args.sliding_window, jnp.bfloat16, args.kv_quant,
        )
    )
    rope = jax.eval_shape(lambda: make_rope(args))
    M = 4096
    f = partial(
        _lookup_block, cfg_t=cfg, K=K, n_iters=2, temperature=0.0,
        top_p=0.8, ngram=2, mesh_t=None,
    )
    i32 = jnp.int32
    txt = (
        jax.jit(f, donate_argnames=("tcache", "hist"))
        .lower(
            _absify(params, rep), _absify(rope, rep),
            jax.ShapeDtypeStruct((batch,), i32, sharding=rep),
            _absify(cache, rep),
            jax.ShapeDtypeStruct((batch, M), i32, sharding=rep),
            jax.ShapeDtypeStruct((batch,), i32, sharding=rep),
            jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep),
            jax.ShapeDtypeStruct((), i32, sharding=rep),
        )
        .compile()
        .as_text()
    )
    return txt.count("custom-call")


def check_mamba_lookup(quant: str, batch: int = 16, K: int = 8) -> int:
    """Mamba prompt-lookup block: verify + seqlens-masked commit forwards
    at chunk width K+1 through the quantized projection kernels."""
    from mistral_inference_tpu.speculative import _mamba_lookup_block

    args = bench.codestral_mamba_args(4)
    cfg = MambaStaticConfig.from_args(args, pallas=True)
    rep = _mesh()
    params = jax.eval_shape(
        lambda k: init_quantized_mamba_params(k, args, jnp.bfloat16, quant),
        jax.random.PRNGKey(0),
    )
    state = jax.eval_shape(lambda: MambaState.alloc(cfg, batch, jnp.bfloat16))
    M = 4096
    f = partial(
        _mamba_lookup_block, cfg=cfg, K=K, n_iters=2, temperature=0.0,
        top_p=0.8, ngram=2,
    )
    i32 = jnp.int32
    txt = (
        jax.jit(f, donate_argnames=("state", "hist"))
        .lower(
            _absify(params, rep),
            jax.ShapeDtypeStruct((batch,), i32, sharding=rep),
            _absify(state, rep),
            jax.ShapeDtypeStruct((batch, M), i32, sharding=rep),
            jax.ShapeDtypeStruct((batch,), i32, sharding=rep),
            jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep),
            jax.ShapeDtypeStruct((), i32, sharding=rep),
        )
        .compile()
        .as_text()
    )
    return txt.count("custom-call")


CHECKS = {
    "transformer": check_transformer,
    "mamba": check_mamba,
    "lookup": check_lookup,
    "mamba_lookup": check_mamba_lookup,
}

if __name__ == "__main__":
    models = os.environ.get(
        "AOT_MODELS", "transformer,mamba,lookup,mamba_lookup"
    ).split(",")
    ok = True
    for m in models:
        for quant in ("int8", "int4"):
            n = CHECKS[m](quant)
            print(f"{m}/{quant}: compiled for v5e, {n} custom-call sites")
            if n == 0:
                ok = False
                print(f"  WARNING: no pallas custom calls in {m}/{quant}")
    print("AOT_COMPILE_CHECK", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)
