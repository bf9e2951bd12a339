"""Weight-only quantization of a transformer params pytree.

Quantizes the big matmul families — transformer attention wq/wk/wv/wo and
FFN/expert w1/w2/w3, plus Mamba2's z/x/b/c/out projections — to INT8 or
packed INT4 with grouped scales (ops/linear.py). Embeddings, norms, the MoE
router gate, Mamba's dt_proj/conv/SSD tails, and the output head stay in
model dtype: they are a tiny fraction of bytes and the usual
accuracy-critical tails (the ≤0.1 Δppl budget is spent where the memory
savings are).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from mistral_inference_tpu.ops.linear import DEFAULT_GROUP, quantize_weight

Params = Dict[str, Any]

_QUANT_FAMILIES = (
    ("attention", ("wq", "wk", "wv", "wo")),
    ("feed_forward", ("w1", "w2", "w3")),
    ("moe", ("w1", "w2", "w3")),
)

# Mamba2 projection leaves live directly under params["layers"]
# (models/mamba.py layout). dt_proj stays dense: it feeds softplus(Δ) — the
# recurrence's decay rates, the model's most quantization-sensitive path —
# and is <0.5% of bytes (dim × n_heads vs dim × d_inner).
_MAMBA_QUANT_LEAVES = ("z_proj", "x_proj", "b_proj", "c_proj", "out_proj")


def _quantize_stacked(w, bits: int, group: int):
    """Quantize a stacked (L, ..., K, N) weight one layer at a time so peak
    HBM stays ~one layer above the steady state (a whole-stack fp32
    intermediate would not fit next to 7B-scale weights)."""
    L = w.shape[0]
    qs, ss = [], []
    for i in range(L):
        d = quantize_weight(w[i], bits, group)
        qs.append(d["q4" if bits == 4 else "q"])
        ss.append(d["scale"])
    key = "q4" if bits == 4 else "q"
    return {key: jnp.stack(qs), "scale": jnp.stack(ss)}


def init_quantized_params(
    rng, args, dtype, mode: str, group: int = DEFAULT_GROUP
) -> Params:
    """Random params with the big linears born quantized — no transient
    full-precision copy ever exists on device (init_params + quantize_params
    would peak at fp + int sizes simultaneously; a 7B bf16 origin does not
    leave room on a 16GB chip). Used by benchmarks and tests."""
    import jax

    from mistral_inference_tpu.models.transformer import init_params

    assert mode in ("int8", "int4"), mode
    bits = 8 if mode == "int8" else 4
    qkey = "q4" if bits == 4 else "q"
    qmax = 127 if bits == 8 else 7

    # Build the structure from a 1-layer template (cheap), then synthesize
    # stacked quantized leaves with the right shapes directly.
    import dataclasses

    tpl_args = dataclasses.replace(args, n_layers=1)
    tpl = init_params(rng, tpl_args, dtype)
    L = args.n_layers

    def grow(x):  # (1, ...) → (L, ...) by tiling (values don't matter for perf)
        return jnp.broadcast_to(x, (L,) + x.shape[1:]) + 0  # +0 materializes

    keys = iter(jax.random.split(rng, 64))

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _fill_layer(buf, key, i):
        # One layer's stored bytes, generated *inside jit* so XLA fuses the
        # threefry chain straight to int8 — eager jax.random materializes
        # 4-byte intermediates per element (~30GB for a 16-layer Mixtral MoE
        # stack) and OOMs a 16GB chip during init. Donation makes the stack
        # update in-place: peak HBM = steady state + one layer.
        bits = jax.random.bits(key, buf.shape[1:], jnp.uint8)
        return buf.at[i].set(jax.lax.bitcast_convert_type(bits, jnp.int8))

    def rand_quant(shape):
        *lead, K, N = shape
        g = min(group, K)
        ng = K // g
        # Stored bytes directly: for int4 the packed (K/2, N) array is
        # generated as raw nibbles — no unpacked intermediate ever exists.
        # Values are arbitrary valid codes (perf/testing weights only).
        kq = K // 2 if bits == 4 else K
        q = jnp.zeros((L, *lead, kq, N), jnp.int8)
        for i, k in enumerate(jax.random.split(next(keys), L)):
            q = _fill_layer(q, k, i)
        scale = jnp.full((L, *lead, ng, N), 0.01, jnp.float32)
        return {qkey: q, "scale": scale}

    layers: Params = {
        "attention_norm": grow(tpl["layers"]["attention_norm"]),
        "ffn_norm": grow(tpl["layers"]["ffn_norm"]),
        "attention": {
            w: rand_quant(tpl["layers"]["attention"][w].shape[1:])
            for w in ("wq", "wk", "wv", "wo")
        },
    }
    if "moe" in tpl["layers"]:
        layers["moe"] = {
            "gate": grow(tpl["layers"]["moe"]["gate"]),
            **{
                w: rand_quant(tpl["layers"]["moe"][w].shape[1:])
                for w in ("w1", "w2", "w3")
            },
        }
    else:
        layers["feed_forward"] = {
            w: rand_quant(tpl["layers"]["feed_forward"][w].shape[1:])
            for w in ("w1", "w2", "w3")
        }
    return {
        "tok_embeddings": tpl["tok_embeddings"],
        "layers": layers,
        "norm": tpl["norm"],
        "output": tpl["output"],
    }


def init_quantized_mamba_params(
    rng, args, dtype, mode: str, group: int = DEFAULT_GROUP
) -> Params:
    """Mamba analogue of init_quantized_params: random params with the five
    big projections born quantized, so a full-depth Codestral-Mamba (7B —
    14.5 GB bf16, over one v5e's HBM) can be benchmarked on one chip with no
    full-precision transient."""
    import dataclasses
    import functools

    import jax

    from mistral_inference_tpu.models.mamba import init_mamba_params

    assert mode in ("int8", "int4"), mode
    bits = 8 if mode == "int8" else 4
    qkey = "q4" if bits == 4 else "q"

    tpl_args = dataclasses.replace(args, n_layers=1)
    tpl = init_mamba_params(rng, tpl_args, dtype)
    L = args.n_layers

    def grow(x):
        return jnp.broadcast_to(x, (L,) + x.shape[1:]) + 0

    keys = iter(jax.random.split(rng, 16))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _fill_layer(buf, key, i):
        bits_ = jax.random.bits(key, buf.shape[1:], jnp.uint8)
        return buf.at[i].set(jax.lax.bitcast_convert_type(bits_, jnp.int8))

    def rand_quant(shape):
        K, N = shape
        g = min(group, K)
        kq = K // 2 if bits == 4 else K
        q = jnp.zeros((L, kq, N), jnp.int8)
        for i, k in enumerate(jax.random.split(next(keys), L)):
            q = _fill_layer(q, k, i)
        return {qkey: q, "scale": jnp.full((L, K // g, N), 0.01, jnp.float32)}

    layers = {
        k: (
            rand_quant(v.shape[1:])
            if k in _MAMBA_QUANT_LEAVES
            else grow(v)
        )
        for k, v in tpl["layers"].items()
    }
    out: Params = {
        "embedding": tpl["embedding"],
        "layers": layers,
        "norm_f": tpl["norm_f"],
    }
    if "lm_head" in tpl:
        out["lm_head"] = tpl["lm_head"]
    return out


def quantize_params(params: Params, mode: str, group: int = DEFAULT_GROUP) -> Params:
    """mode: "int8" | "int4". Mutates (and returns) the pytree in place: big
    linears become {"q"|"q4", "scale"} dicts, the original dense stacks are
    dropped as each family converts (keeps peak HBM bounded), everything
    else is unchanged."""
    assert mode in ("int8", "int4"), mode
    bits = 8 if mode == "int8" else 4

    from mistral_inference_tpu.ops.linear import is_quantized

    layers = params["layers"]
    for group_name, leaves in _QUANT_FAMILIES:
        if group_name not in layers:
            continue
        sub = layers[group_name]
        for leaf in leaves:
            if leaf in sub:
                assert not is_quantized(sub[leaf]), (
                    f"{group_name}.{leaf} is already quantized — "
                    "re-quantizing packed payloads would be nonsense"
                )
                w = sub.pop(leaf)
                sub[leaf] = _quantize_stacked(w, bits, group)
                del w
    for leaf in _MAMBA_QUANT_LEAVES:
        if leaf in layers:
            assert not is_quantized(layers[leaf]), (
                f"{leaf} is already quantized — "
                "re-quantizing packed payloads would be nonsense"
            )
            w = layers.pop(leaf)
            layers[leaf] = _quantize_stacked(w, bits, group)
            del w
    return params
