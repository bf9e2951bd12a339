"""Parameter / cache / activation PartitionSpecs (GSPMD tensor parallelism).

Replaces the reference's pipeline parallelism (layer slicing + P2P,
reference: transformer.py:94-98,194-215) with Megatron-style TP expressed
declaratively: weights carry NamedShardings, activations carry
``with_sharding_constraint`` hints, and XLA inserts the collectives
(all-gather / reduce-scatter / psum) over ICI.

Scheme (mesh axes data/expert/tensor):
  * wq/wk/wv: shard the fused head output dim  → attention is head-parallel,
    no communication inside the block.
  * wo: shard the reduction dim → XLA emits one psum per block (the classic
    2-collective-per-layer Megatron layout becomes 1 here because qkv+attn
    stay head-local).
  * w1/w3 shard FFN hidden, w2 shards its reduction dim → one psum.
  * MoE expert-stacked weights additionally shard the expert axis.
  * Embedding / output shard the vocab dim; logits all-gather at the end.
  * KV cache shards batch on ``data`` and kv-heads on ``tensor`` — decode
    attention is fully local.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mistral_inference_tpu.cache import KVCache
from mistral_inference_tpu.parallel.mesh import AXIS_DATA, AXIS_EXPERT, AXIS_TENSOR

Specs = Dict[str, Any]


def param_specs(moe: bool, pallas: bool = False) -> Specs:
    """PartitionSpec pytree matching ``models.transformer.init_params``.

    ``pallas=True`` is the kernels-under-mesh layout (parallel/shmap.py):
    wo / w2 shard their OUTPUT axis instead of Megatron's reduction axis.
    The reduction layout would split INT4's split-halves packing across
    shards (byte row r holds logical rows r and r+K/2, so a contiguous
    K-shard's nibbles decode to non-contiguous rows whose group scales
    live on other shards); out-axis sharding keeps K intact per shard and
    turns the per-layer psum into an all-gather of the (tiny at decode)
    activations instead. The XLA/GSPMD paths are correct under either
    layout — GSPMD just places different collectives."""
    row = P(None, None, AXIS_TENSOR) if pallas else P(None, AXIS_TENSOR, None)
    layers: Specs = {
        "attention_norm": P(),
        "ffn_norm": P(),
        "attention": {
            "wq": P(None, None, AXIS_TENSOR),
            "wk": P(None, None, AXIS_TENSOR),
            "wv": P(None, None, AXIS_TENSOR),
            "wo": row,
        },
    }
    if moe:
        layers["moe"] = {
            "gate": P(),
            "w1": P(None, AXIS_EXPERT, None, AXIS_TENSOR),
            "w2": (
                P(None, AXIS_EXPERT, None, AXIS_TENSOR)
                if pallas
                else P(None, AXIS_EXPERT, AXIS_TENSOR, None)
            ),
            "w3": P(None, AXIS_EXPERT, None, AXIS_TENSOR),
        }
    else:
        layers["feed_forward"] = {
            "w1": P(None, None, AXIS_TENSOR),
            "w2": row,
            "w3": P(None, None, AXIS_TENSOR),
        }
    return {
        # Embedding shards the FEATURE axis, not vocab: a vocab-sharded
        # gather forces GSPMD to emit select+psum of the full (B, T, D)
        # activation on every lookup — one extra all-reduce per decode step
        # (the sampled-token re-embed) and ~(B·T·D·2) bytes at prefill.
        # Dim-sharded, the gather is chip-local and the only comm is the
        # cheaper (tp-1)/tp all-gather XLA inserts where full-dim x is
        # first needed (AOT v5e:2x2 HLO evidence: docs/TP_OVERLAP.md).
        # The output head keeps vocab sharding — it is a matmul N-axis
        # there, which is communication-free until the final logits gather.
        "tok_embeddings": P(None, AXIS_TENSOR),
        "layers": layers,
        "norm": P(),
        "output": P(None, AXIS_TENSOR),
    }


def mamba_param_specs(tie_embeddings: bool, pallas: bool = False) -> Specs:
    """PartitionSpecs for models/mamba.py's split-projection layout: the
    d_inner axis shards on SSD heads, B/C on state groups, dt on heads —
    the whole mixer is head-local except out_proj's reduction (one psum per
    layer). The reference has no Mamba parallelism at all (SURVEY §2 C10).

    ``pallas=True`` (kernels-under-mesh, r5): out_proj shards its OUTPUT
    axis instead of the reduction axis — same trade and for the same reason
    as the transformer's wo/w2 (param_specs above): a contiguous K-shard of
    an INT4 split-halves payload decodes to non-contiguous logical rows
    whose group scales live on other shards."""
    col = P(None, None, AXIS_TENSOR)
    vec = P(None, AXIS_TENSOR)
    layers: Specs = {
        "norm": P(),
        "z_proj": col,
        "x_proj": col,
        "b_proj": col,
        "c_proj": col,
        "dt_proj": col,
        "conv_w_x": col,
        "conv_w_B": col,
        "conv_w_C": col,
        "conv_b_x": vec,
        "conv_b_B": vec,
        "conv_b_C": vec,
        "A_log": vec,
        "D": vec,
        "dt_bias": vec,
        "mixer_norm": vec,
        "out_proj": col if pallas else P(None, AXIS_TENSOR, None),
    }
    tree: Specs = {
        "embedding": P(AXIS_TENSOR, None),
        "layers": layers,
        "norm_f": P(),
    }
    if not tie_embeddings:
        tree["lm_head"] = P(None, AXIS_TENSOR)
    return tree


def shard_mamba_params(
    params: Any, mesh: Mesh, tie_embeddings: bool, pallas: bool = False
) -> Any:
    specs = _match_leaf_specs(params, mamba_param_specs(tie_embeddings, pallas))
    return jax.tree_util.tree_map(
        lambda x, s: _put(x, s, mesh),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def cache_specs(is_scaled: bool) -> KVCache:
    """PartitionSpec pytree matching ``cache.KVCache``: batch on data,
    kv-heads on tensor. K/V are stored flat-head (L, B, W, Hkv*Dh) — the
    flat axis shards on tensor in contiguous whole-head blocks, equivalent
    to sharding the Hkv axis of the unflattened form; scales are
    (L, B, Hkv, W) with the head axis explicit."""
    kv = P(None, AXIS_DATA, None, AXIS_TENSOR)
    scale = P(None, AXIS_DATA, AXIS_TENSOR, None) if is_scaled else P(None)
    return KVCache(
        k=kv, v=kv, kv_len=P(AXIS_DATA), windows=P(), k_scale=scale, v_scale=scale
    )


# Activation hints used inside the forward (wrapped so single-device paths
# skip them entirely).


def constrain(x: jax.Array, mesh: Optional[Mesh], *spec) -> jax.Array:
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def seq_axis(mesh: Optional[Mesh], T: int) -> Optional[str]:
    """The sequence-parallel axis name for a T-token chunk, or None when it
    doesn't apply: meshes without a ``seq`` axis (or seq=1), and chunks the
    axis doesn't divide (decode steps are T=1, so they always replicate
    over seq — SP is a prefill-only strategy)."""
    from mistral_inference_tpu.parallel.mesh import AXIS_SEQ

    if mesh is None or AXIS_SEQ not in mesh.shape:
        return None
    n = mesh.shape[AXIS_SEQ]
    return AXIS_SEQ if (n > 1 and T % n == 0) else None


def _match_leaf_specs(params: Any, specs: Any) -> Any:
    """Walk params and specs together; a P spec applies to any leaf subtree.
    A quantized weight ({"q"|"q4","scale"} from ops/linear.py) keeps its
    weight's spec on every component — q, packed q4, and grouped scales all
    share the weight's (..., reduction, out) axis order, so the same
    PartitionSpec partitions them consistently."""
    if isinstance(specs, P):
        if isinstance(params, dict):
            return {k: _match_leaf_specs(params[k], specs) for k in params}
        return specs
    # Keys absent from the spec tree (e.g. live-LoRA a/b pairs) replicate.
    return {
        k: _match_leaf_specs(params[k], specs[k] if k in specs else P())
        for k in params
    }


def _divisible_spec(x: jax.Array, spec: P, mesh: Mesh) -> P:
    """Drop spec axes the array can't be evenly split on (falls back toward
    replication per axis). Matters for quantized leaves: INT4 packs K/2 rows
    and scales have K/group rows — for small groups-per-layer the scale
    axis may not divide a large tensor axis even when the weight does
    (VERDICT r1 #5: divide evenly or fall back)."""
    names = list(spec)
    out = []
    for i, name in enumerate(names):
        if name is None or i >= x.ndim:
            out.append(name)
            continue
        axes = name if isinstance(name, tuple) else (name,)
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        out.append(name if x.shape[i] % size == 0 else None)
    return P(*out)


def _put(x: jax.Array, spec: P, mesh: Mesh) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, _divisible_spec(x, spec, mesh)))


def shard_params(params: Any, mesh: Mesh, moe: bool, pallas: bool = False) -> Any:
    """device_put the params pytree with TP/EP NamedShardings."""
    specs = _match_leaf_specs(params, param_specs(moe, pallas=pallas))
    return jax.tree_util.tree_map(
        lambda x, s: _put(x, s, mesh),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    specs = cache_specs(cache.is_quantized)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs
    )
