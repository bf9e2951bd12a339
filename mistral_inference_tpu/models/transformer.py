"""Decoder-only Transformer (Mistral / Mixtral / Codestral / Pixtral LM side).

Reference: src/mistral_inference/transformer.py + transformer_layers.py + moe.py.

TPU-native redesign decisions (vs the reference's torch module graph):

  * **Pure functions over a params pytree.** No nn.Module state; the whole
    forward is one jittable function, so pjit sharding, donation, and grads
    come for free.
  * **`lax.scan` over stacked layer weights** ``(L, ...)`` instead of a Python
    loop over ModuleList (reference: transformer.py:201-209) — constant-size
    HLO regardless of depth, fast compiles for 32-88 layer models.
  * **Static-slot batching** ``(B, T)`` + ``seqlens`` vector instead of ragged
    concatenation (reference flattens to ``(ΣT, ...)``,
    transformer_layers.py:66-69) — XLA needs static shapes; padding is masked
    in attention and dropped from cache writes.
  * **One attention regime**: queries attend ``[ring-cache slots ++ current
    chunk]`` under a position-arithmetic sliding-window mask — replacing the
    reference's three xformers bias regimes and its unrotate/interleave
    (reference: cache.py:94-117,240-254).
  * **MoE as dense top-k routing + expert-stacked einsums** (reference loops
    over experts with boolean gathers, moe.py:29-31, which is
    shape-dynamic and serial). Expert-parallel sharding shards the leading
    expert axis of the stacked weights.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mistral_inference_tpu.args import TransformerArgs
from mistral_inference_tpu.cache import (
    KVCache,
    dequant_layer,
    is_scaled_dtype,
    kv_roundtrip,
    slot_positions,
    update_stacked,
)
from mistral_inference_tpu.ops.attention import attend, sliding_window_mask
from mistral_inference_tpu.ops.linear import (
    dequant,
    is_quantized,
    linear,
    linear_fused,
)
from mistral_inference_tpu.ops.norm import rms_norm
from mistral_inference_tpu.ops.rope import (
    apply_rope,
    precompute_rope,
    rope_at_positions,
    rope_for_positions,
)

Params = Dict[str, Any]

ROPE_TABLE_LEN = 128_000  # reference: transformer.py:116
DEFAULT_ROPE_THETA = 1e6  # reference: transformer.py:114

# Ring length at which decode (T==1) switches from XLA attention to the
# decode-shaped pallas kernel (ops/pallas/attention.decode_attention).
# Default OFF: with the stacked-weight kernel freeing HBM, XLA attention
# wins at every measured ring size on the v5e (4096 ring, 7B int4 B=32:
# XLA 370 tok/s vs kernel 236/245 at BS 512/1024 — XLA fuses the per-layer
# ring slice + fp8 dequant into its attention fusions, while the kernel's
# (B, S-tile) grid pays per-program overhead on G=4 arithmetic intensity).
# Override to sweep: MISTRAL_DECODE_S=2048 re-enables it from that ring up.
_DECODE_KERNEL_MIN_S = int(os.environ.get("MISTRAL_DECODE_S", str(1 << 30)))

# Fused update+attend decode kernel (round 3): quantize-on-write, ring
# write, and ring-only attention in ONE pallas call over the stacked
# carry. With the write (XLA scatter) and the read (pallas) in separate
# ops, XLA relayouts the FULL K/V stacks inside the decode loop to satisfy
# both consumers' layouts (AOT profile: s8[L,B,S,HD] copies per step; the
# v2 read-only kernel measured 400 vs 1898 tok/s because of them).
_FUSED_DECODE = os.environ.get("MISTRAL_FUSED_DECODE", "1") == "1"

# MISTRAL_MOE_DEBUG=1: stream dispatch-MoE over-capacity drop counts into
# utils.profiling.METRICS ("moe_dropped_assignments") via debug callbacks.
_MOE_DEBUG = os.environ.get("MISTRAL_MOE_DEBUG", "") not in ("", "0")


def _record_moe_drops(n) -> None:
    from mistral_inference_tpu.utils.profiling import METRICS

    METRICS.inc("moe_dropped_assignments", float(n))


class StaticConfig(NamedTuple):
    """Hashable subset of TransformerArgs needed while tracing."""

    dim: int
    n_layers: int
    head_dim: int
    hidden_dim: int
    n_heads: int
    n_kv_heads: int
    norm_eps: float
    vocab_size: int
    moe_num_experts: int  # 0 = dense FFN
    moe_top_k: int
    attn_impl: str = "xla"  # "xla" | "pallas" — set by the model handle
    lora_scaling: float = 0.0  # > 0 ⇒ live LoRA leaves present in params
    moe_impl: str = "dense"  # "dense" | "dispatch" (capacity-bounded GShard)
    moe_capacity_factor: float = 2.0
    rope_theta: float = 1e6

    @classmethod
    def from_args(cls, args: TransformerArgs, attn_impl: str = "xla") -> "StaticConfig":
        return cls(
            dim=args.dim,
            n_layers=args.n_layers,
            head_dim=args.head_dim,
            hidden_dim=args.hidden_dim,
            n_heads=args.n_heads,
            n_kv_heads=args.n_kv_heads,
            norm_eps=args.norm_eps,
            vocab_size=args.vocab_size,
            moe_num_experts=args.moe.num_experts if args.moe else 0,
            moe_top_k=args.moe.num_experts_per_tok if args.moe else 0,
            attn_impl=attn_impl,
            lora_scaling=args.lora.scaling if args.lora else 0.0,
            moe_impl=args.moe_impl,
            moe_capacity_factor=args.moe_capacity_factor,
            rope_theta=args.rope_theta or DEFAULT_ROPE_THETA,
        )


# ---------------------------------------------------------------------------
# Parameter initialization (tests / benchmarks use random weights; real
# checkpoints load via loading.py)
# ---------------------------------------------------------------------------


def init_params(
    rng: jax.Array, args: TransformerArgs, dtype: jnp.dtype = jnp.float32
) -> Params:
    """Random-weight pytree. Weights are stored (in_features, out_features)
    so application is ``x @ w`` — torch checkpoints are transposed at load."""
    cfg = StaticConfig.from_args(args)
    L, D, Dh = cfg.n_layers, cfg.dim, cfg.head_dim
    H, Hkv, F, V = cfg.n_heads, cfg.n_kv_heads, cfg.hidden_dim, cfg.vocab_size

    keys = iter(jax.random.split(rng, 32))

    def lin(key, *shape):
        # Generated directly in `dtype` — a fp32 intermediate would double
        # peak HBM at init for large models.
        fan_in = shape[-2]
        return jax.random.normal(key, shape, dtype) * jnp.asarray(fan_in**-0.5, dtype)

    layers: Params = {
        "attention_norm": jnp.ones((L, D), dtype),
        "ffn_norm": jnp.ones((L, D), dtype),
        "attention": {
            "wq": lin(next(keys), L, D, H * Dh),
            "wk": lin(next(keys), L, D, Hkv * Dh),
            "wv": lin(next(keys), L, D, Hkv * Dh),
            "wo": lin(next(keys), L, H * Dh, D),
        },
    }
    if args.lora:
        # Live adapters, zero-init (reference zero-inits lora_A/B when a
        # full checkpoint is loaded, lora.py:76-89). Adapter weights load
        # via lora.load_lora.
        r = args.lora.rank

        def lora_pair(i, o):
            return {"a": jnp.zeros((L, i, r), dtype), "b": jnp.zeros((L, r, o), dtype)}

        layers["attention"]["wq_lora"] = lora_pair(D, H * Dh)
        layers["attention"]["wk_lora"] = lora_pair(D, Hkv * Dh)
        layers["attention"]["wv_lora"] = lora_pair(D, Hkv * Dh)
        layers["attention"]["wo_lora"] = lora_pair(H * Dh, D)

    if cfg.moe_num_experts:
        E = cfg.moe_num_experts
        layers["moe"] = {
            "gate": lin(next(keys), L, D, E),
            "w1": lin(next(keys), L, E, D, F),
            "w2": lin(next(keys), L, E, F, D),
            "w3": lin(next(keys), L, E, D, F),
        }
        if args.lora:
            r = args.lora.rank

            def expert_lora(i, o):
                return {
                    "a": jnp.zeros((L, E, i, r), dtype),
                    "b": jnp.zeros((L, E, r, o), dtype),
                }

            layers["moe"]["w1_lora"] = expert_lora(D, F)
            layers["moe"]["w2_lora"] = expert_lora(F, D)
            layers["moe"]["w3_lora"] = expert_lora(D, F)
    else:
        layers["feed_forward"] = {
            "w1": lin(next(keys), L, D, F),
            "w2": lin(next(keys), L, F, D),
            "w3": lin(next(keys), L, D, F),
        }
        if args.lora:
            layers["feed_forward"]["w1_lora"] = lora_pair(D, F)
            layers["feed_forward"]["w2_lora"] = lora_pair(F, D)
            layers["feed_forward"]["w3_lora"] = lora_pair(D, F)
    params: Params = {
        "tok_embeddings": jax.random.normal(next(keys), (V, D), dtype),
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
        "output": lin(next(keys), D, V),
    }
    return params


# ---------------------------------------------------------------------------
# Layer blocks
# ---------------------------------------------------------------------------


def _split_stacked_quant(tree: Params) -> Tuple[Params, Params]:
    """Split the stacked layer weights into (scan-xs tree, closure tree).

    A quantized leaf dict whose arrays are layer-stacked — (L, K, N) dense
    weights (ndim 3) or (L, E, K, N) MoE expert stacks (ndim 4) — moves to
    the closure tree; see forward() for why. Both trees keep the original
    nesting so _merge_stacked_quant can zip them back per layer."""
    small: Params = {}
    big: Params = {}
    for k, v in tree.items():
        if isinstance(v, dict) and ("q" in v or "q4" in v):
            qa = v.get("q4", v.get("q"))
            if qa.ndim in (3, 4):
                big[k] = v
                continue
            small[k] = v
        elif isinstance(v, dict):
            s, b = _split_stacked_quant(v)
            small[k] = s
            if b:
                big[k] = b
        else:
            small[k] = v
    return small, big


def _merge_stacked_quant(small: Params, big: Params, li: jax.Array) -> Params:
    """Rebuild one layer's weight dict inside the scan body: stacked
    quantized leaves come back tagged with this layer's index ("li"), which
    ops/linear.py routes to the scalar-prefetch stacked kernel."""
    out = dict(small)
    for k, v in big.items():
        if "q" in v or "q4" in v:
            out[k] = {**v, "li": li}
        else:
            out[k] = _merge_stacked_quant(small.get(k, {}), v, li)
    return out


def _lin(
    x: jax.Array, w: Params, name: str, lora_scaling: float,
    pallas: bool = True, mesh=None,
) -> jax.Array:
    """Linear + optional live-LoRA skip (reference: lora.py:71-74
    ``linear(x) + B(A(x))·scaling``). Base weight may be quantized.
    ``mesh``: run the quantized kernel per shard (parallel/shmap.py)."""
    out = linear(x, w[name], pallas=pallas, mesh=mesh)
    lora = w.get(name + "_lora")
    if lora is not None and lora_scaling > 0:
        delta = (x @ lora["a"]) @ lora["b"]
        out = out + delta * jnp.asarray(lora_scaling, delta.dtype)
    return out


def _lin_fused(
    x: jax.Array, w: Params, names, lora_scaling: float,
    pallas: bool = True, mesh=None, tag: str = "",
) -> list:
    """Shared-input projections through ops/linear.linear_fused (one
    wide-N GEMM on the prefill hbm-dequant path, per-weight linear
    elsewhere). Live-LoRA deltas stay per-projection — they compose with
    the fused base exactly as with separate ones."""
    outs = linear_fused(x, [w[n] for n in names], pallas=pallas, mesh=mesh, tag=tag)
    for i, n in enumerate(names):
        lora = w.get(n + "_lora")
        if lora is not None and lora_scaling > 0:
            delta = (x @ lora["a"]) @ lora["b"]
            outs[i] = outs[i] + delta * jnp.asarray(lora_scaling, delta.dtype)
    return outs


def _dense_ffn(
    x: jax.Array, w: Params, lora_scaling: float = 0.0, pallas: bool = True,
    mesh=None,
) -> jax.Array:
    """SwiGLU: w2(silu(w1 x) * w3 x) (reference: transformer_layers.py:96-106).
    Weights may be INT8/INT4-quantized dict leaves (ops/linear.py).
    w1 and w3 share x — fused into one GEMM at prefill rows (_lin_fused)."""
    h1, h3 = _lin_fused(x, w, ("w1", "w3"), lora_scaling, pallas, mesh, tag="w13")
    return _lin(jax.nn.silu(h1) * h3, w, "w2", lora_scaling, pallas, mesh)


def _moe_ffn(x: jax.Array, w: Params, top_k: int, lora_scaling: float = 0.0) -> jax.Array:
    """Top-k routed SwiGLU experts (reference: moe.py:24-32).

    Softmax over the selected logits in fp32, like the reference. Round-1
    compute strategy: evaluate every expert on every token via stacked
    einsums and combine with routing weights — fully static shapes, MXU
    friendly; a grouped ragged dispatch kernel replaces this on the perf path.
    x: (N, D); expert weights (E, D, F) / (E, F, D).
    """
    E = w["gate"].shape[-1]
    gate_logits = x @ w["gate"]  # (N, E)
    top_vals, top_idx = jax.lax.top_k(gate_logits, top_k)
    top_w = jax.nn.softmax(top_vals.astype(jnp.float32), axis=-1)
    # (N, E) combine matrix
    combine = jnp.sum(
        jax.nn.one_hot(top_idx, E, dtype=jnp.float32) * top_w[..., None], axis=1
    ).astype(x.dtype)
    w1 = dequant(w["w1"], x.dtype)
    w2 = dequant(w["w2"], x.dtype)
    w3 = dequant(w["w3"], x.dtype)

    def with_lora(base, name, inp, in_spec, mid_spec):
        lora = w.get(name + "_lora")
        if lora is None or lora_scaling <= 0:
            return base
        mid = jnp.einsum(in_spec, inp, lora["a"])
        delta = jnp.einsum(mid_spec, mid, lora["b"])
        return base + delta * jnp.asarray(lora_scaling, base.dtype)

    h1 = with_lora(
        jnp.einsum("nd,edf->enf", x, w1), "w1", x, "nd,edr->enr", "enr,erf->enf"
    )
    h3 = with_lora(
        jnp.einsum("nd,edf->enf", x, w3), "w3", x, "nd,edr->enr", "enr,erf->enf"
    )
    hidden = jax.nn.silu(h1) * h3
    expert_out = with_lora(
        jnp.einsum("enf,efd->end", hidden, w2), "w2", hidden,
        "enf,efr->enr", "enr,erd->end",
    )  # (E, N, D)
    return jnp.einsum("ne,end->nd", combine, expert_out)


_MOE_RAGGED_ROWS = 256  # above this, dispatch routes to the sorted ragged path


# M-tile of the pallas sorted-grouped kernel. 256 balances group-padding
# waste (~E·TM/2 extra rows) against per-M-tile weight re-streaming
# (Mp/TM full int4 expert reads per projection); r5 A/B at Mixtral
# N=4096: TM=256 -> 27.3 ms/layer vs TM=512 -> see decomp log.
_MOE_RAGGED_TM = int(os.environ.get("MISTRAL_MOE_RAGGED_TM", "256"))


def _moe_ffn_ragged(
    x: jax.Array, w: Params, top_k: int, lora_scaling: float = 0.0,
    fused_quant: bool = False,
) -> jax.Array:
    """Drop-free sorted grouped-GEMM MoE — the prefill compute path.

    The reference's serial per-expert loop (moe.py:24-32) drops nothing and
    runs exactly N·k token-expert pairs of FFN work. Its TPU analogue: sort
    the N·k assignments by expert id, run each projection as ONE grouped
    GEMM over the sorted rows, and scatter-add the weighted outputs back
    per token. vs ``_moe_ffn_dispatch`` at prefill rows this (a) removes
    the capacity_factor× arithmetic waste (cf=2.0 doubled the executed
    FLOPs), (b) can never drop an assignment.

    Two grouped-GEMM engines (r5 A/B: moe_prefill_decomp_r5.log /
    moe_ragged_probe_r5.log):
      * quantized weights on TPU → ``moe_matmul_quant_ragged``: expert
        groups padded to TM-row tiles, each M-tile's weight selected by a
        prefetched per-tile expert index; INT bytes stream straight to
        VMEM (the XLA dequant alternative burns 13-25 ms/layer of pure
        dequant at Mixtral shapes; lax.ragged_dot itself measured MFU
        0.44 vs 0.92 for plain GEMMs).
      * otherwise → ``lax.ragged_dot`` on (barrier-dequantized) dense
        weights — the portable fallback, also the live-LoRA path.
    """
    N, D = x.shape
    E = w["gate"].shape[-1]
    gate_logits = x @ w["gate"]
    top_vals, top_idx = jax.lax.top_k(gate_logits, top_k)  # (N, k)
    top_w = jax.nn.softmax(top_vals.astype(jnp.float32), axis=-1)

    flat_e = top_idx.reshape(-1)  # (N·k,) token-major
    order = jnp.argsort(flat_e)  # stable: ties keep token order
    tok = order // top_k  # source token of each sorted row
    counts = jnp.bincount(flat_e, length=E).astype(jnp.int32)

    has_lora = lora_scaling > 0 and any(k.endswith("_lora") for k in w)
    # Kernel shape gate: D is w1/w3's K (int4 split-halves needs K even,
    # TN selection needs N % 128) and F is w2's K / w1's N — both must
    # satisfy the same constraints or the ragged_dot fallback runs.
    F_hidden = w["w1"]["scale"].shape[-1] if is_quantized(w["w1"]) else 0
    use_kernel = (
        fused_quant
        and not has_lora
        and is_quantized(w["w1"]) and is_quantized(w["w3"])
        and is_quantized(w["w2"])
        and D % 256 == 0
        and F_hidden % 256 == 0
    )

    if use_kernel:
        from mistral_inference_tpu.ops.pallas.moe_matmul import (  # noqa: PLC0415
            moe_matmul_quant_ragged,
        )

        TM = _MOE_RAGGED_TM
        NK = N * top_k
        # Static worst-case padded rows, rounded to a whole number of
        # M-tiles (sum of per-group TM-rounded sizes is <= NK + E*(TM-1)).
        Mp = (-(-NK // TM) + E) * TM
        padded = -(-counts // TM) * TM  # (E,) per-group padded sizes
        cum_pad = jnp.cumsum(padded)
        offsets = cum_pad - padded  # padded start of each group
        starts = jnp.cumsum(counts) - counts  # sorted start of each group

        # Padded layout built by GATHER (a row scatter lowers badly on
        # TPU): padded position p belongs to group g(p), rank j; invalid
        # (pad) rows read row 0 and are discarded at the gather-back.
        p = jnp.arange(Mp, dtype=jnp.int32)
        g_of_p = jnp.searchsorted(cum_pad, p, side="right").astype(jnp.int32)
        g_of_p = jnp.minimum(g_of_p, E - 1)
        j = p - offsets[g_of_p]
        sorted_idx = starts[g_of_p] + jnp.minimum(j, counts[g_of_p] - 1)
        sorted_idx = jnp.clip(sorted_idx, 0, NK - 1)
        src_tok = jnp.take(tok, sorted_idx)  # (Mp,)
        xs_p = jnp.take(x, src_tok, axis=0)  # (Mp, D) padded sorted rows

        tile_group = g_of_p[::TM]  # (Mp/TM,) — constant within each tile
        li = w["w1"].get("li")

        def mm(inp, leaf):
            q = leaf["q4"] if "q4" in leaf else leaf["q"]
            return moe_matmul_quant_ragged(
                inp, q, leaf["scale"], tile_group, li=leaf.get("li")
            )

        assert (li is None) == (w["w2"].get("li") is None)
        h1 = mm(xs_p, w["w1"])
        h3 = mm(xs_p, w["w3"])
        hidden = jax.nn.silu(h1) * h3
        out_p = mm(hidden, w["w2"])  # (Mp, D)

        # Combine WITHOUT a scatter (row scatter-adds lower terribly on
        # TPU): token t's k-th assignment (flat index f = t·k + j) sits at
        # sorted position inv[f], hence padded position
        # offsets[e_f] + (inv[f] - starts[e_f]); one gather into
        # token-major order, then a reshape-sum over the k axis.
        inv = jnp.argsort(order)  # flat -> sorted position
        pos_f = offsets[flat_e] + (inv - starts[flat_e])  # (N·k,) token-major
        out = jnp.take(out_p, pos_f, axis=0)  # (N·k, D) token-major
        wts = top_w.reshape(-1).astype(x.dtype)
        return jnp.sum(
            (out * wts[:, None]).reshape(N, top_k, D), axis=1
        )

    xs = jnp.take(x, tok, axis=0)  # (N·k, D) rows grouped by expert

    w1 = jax.lax.optimization_barrier(dequant(w["w1"], x.dtype))
    w3 = jax.lax.optimization_barrier(dequant(w["w3"], x.dtype))
    w2 = jax.lax.optimization_barrier(dequant(w["w2"], x.dtype))

    def rd(inp, wd):
        return jax.lax.ragged_dot(inp, wd, group_sizes=counts)

    def with_lora(base, name, inp):
        lora = w.get(name + "_lora")
        if lora is None or lora_scaling <= 0:
            return base
        mid = rd(inp, lora["a"].astype(inp.dtype))
        delta = rd(mid, lora["b"].astype(inp.dtype))
        return base + delta * jnp.asarray(lora_scaling, base.dtype)

    hidden = jax.nn.silu(with_lora(rd(xs, w1), "w1", xs)) * with_lora(
        rd(xs, w3), "w3", xs
    )
    out = with_lora(rd(hidden, w2), "w2", hidden)  # (N·k, D) sorted order

    # Scatter-free combine (see the kernel path above): gather back to
    # token-major order and reshape-sum over the k assignments.
    inv = jnp.argsort(order)
    out_tok = jnp.take(out, inv, axis=0)  # (N·k, D) token-major
    wts = top_w.reshape(-1).astype(x.dtype)
    return jnp.sum((out_tok * wts[:, None]).reshape(N, top_k, D), axis=1)


def _moe_ffn_dispatch(
    x: jax.Array, w: Params, top_k: int, capacity_factor: float,
    lora_scaling: float = 0.0, fused_quant: bool = False, mesh=None,
) -> jax.Array:
    """GShard-style capacity-bounded expert dispatch (SURVEY §7 step 6).

    vs ``_moe_ffn`` (dense all-experts): tokens are scattered into per-expert
    buffers of static capacity C = ceil(N·top_k/E·factor), each expert runs
    its SwiGLU on its own (C, D) batch, outputs gather back weighted by the
    router. Compute drops from E·N to E·C ≈ N·top_k·factor — the
    compute-optimal prefill path. Under an ``expert`` mesh axis the buffers
    shard on E and GSPMD inserts the all-to-alls. Assignments beyond an
    expert's capacity contribute zero (the reference's serial loop drops
    nothing, moe.py:29-31 — use the dense impl for bit-parity; with enough
    capacity the two agree exactly).
    """
    N, D = x.shape
    E = w["gate"].shape[-1]
    if (
        N > _MOE_RAGGED_ROWS
        and mesh is None
        and os.environ.get("MISTRAL_MOE_PREFILL", "ragged") == "ragged"
    ):
        # Prefill-shaped row counts: the sorted ragged grouped-GEMM path is
        # both drop-free and capacity-waste-free (r5 A/B:
        # benchmarks/results/moe_prefill_decomp_r5.log). Under a mesh the
        # capacity buffers below stay — their (E, C, D) layout is what
        # shards on the expert axis.
        return _moe_ffn_ragged(x, w, top_k, lora_scaling,
                               fused_quant=fused_quant)
    C = max(8, int(-(-N * top_k * capacity_factor // E)))
    C = min(C, N)

    gate_logits = x @ w["gate"]
    top_vals, top_idx = jax.lax.top_k(gate_logits, top_k)  # (N, k)
    top_w = jax.nn.softmax(top_vals.astype(jnp.float32), axis=-1)

    flat_e = top_idx.reshape(-1)  # (N·k,) row-major: token-major order
    onehot = jax.nn.one_hot(flat_e, E, dtype=jnp.int32)  # (N·k, E)
    pos = jnp.cumsum(onehot, axis=0) * onehot  # rank within expert, 1-based
    slot = jnp.sum(pos, axis=-1) - 1  # (N·k,) 0-based slot in its expert
    keep = slot < C
    slot_c = jnp.where(keep, slot, C)  # C = out-of-range ⇒ dropped scatter
    if _MOE_DEBUG:
        # Over-capacity drops are silent by design (zero contribution);
        # MISTRAL_MOE_DEBUG=1 streams the count into the metrics registry
        # per dispatch so capacity_factor can be tuned on real traffic.
        jax.debug.callback(_record_moe_drops, jnp.sum(~keep))

    # scatter tokens into (E, C, D)
    xk = jnp.repeat(x, top_k, axis=0)  # (N·k, D) token-major matches flat_e
    buf = jnp.zeros((E, C + 1, D), x.dtype).at[flat_e, slot_c].add(xk)[:, :C]

    def expert_mm(inp, leaf):
        # (E, C, I) @ (E, I, O) with a possibly-quantized weight leaf. On
        # single-chip TPU quantized leaves route to the grouped Pallas fused
        # dequant-matmul: each live expert's INT weights are streamed from
        # HBM exactly once and dequantized in VMEM — the XLA dequant path
        # writes + re-reads a full bf16 copy (3× int8 / 5× int4 the bytes),
        # which dominated MoE decode (VERDICT r1 #2).
        if fused_quant and is_quantized(leaf):
            out_f = leaf["scale"].shape[-1]
            # C cap: the kernel stages the whole (C, K) expert buffer in
            # VMEM next to an 8MB-ish weight tile — decode capacities
            # (C = ceil(B·k/E·cf), tens) fit; prefill capacities
            # (thousands) do not, and prefill is compute-bound where the
            # XLA dequant einsum is the right path anyway.
            if inp.shape[-2] <= 128 and inp.shape[-1] % 256 == 0 and out_f % 128 == 0:
                q = leaf["q4"] if "q4" in leaf else leaf["q"]
                if mesh is not None:
                    # Per-shard grouped kernel: experts on the ``expert``
                    # axis, output features on ``tensor`` (shmap.py). Falls
                    # back to the GSPMD einsum when shapes don't divide.
                    if "li" in leaf:
                        from mistral_inference_tpu.parallel.shmap import (
                            moe_mm_quant_sharded,
                        )

                        out = moe_mm_quant_sharded(
                            inp, q, leaf["scale"], leaf["li"], mesh
                        )
                        if out is not None:
                            return out
                    return jnp.einsum(
                        "eci,eio->eco", inp, dequant(leaf, inp.dtype)
                    )
                from mistral_inference_tpu.ops.pallas.moe_matmul import (
                    moe_matmul_quant,
                    moe_matmul_quant_stacked,
                )

                if "li" in leaf:  # (L, E, ...) stack — no per-layer slice copy
                    return moe_matmul_quant_stacked(
                        inp, q, leaf["scale"], leaf["li"]
                    )
                return moe_matmul_quant(inp, q, leaf["scale"])
        return jnp.einsum("eci,eio->eco", inp, dequant(leaf, inp.dtype))

    def with_lora(base, name, inp):
        # Live-LoRA on the dispatched (E, C, ·) buffers — same adapters the
        # dense path applies (ADVICE r1: dispatch must not silently drop them).
        lora = w.get(name + "_lora")
        if lora is None or lora_scaling <= 0:
            return base
        mid = jnp.einsum("eci,eir->ecr", inp, lora["a"])
        delta = jnp.einsum("ecr,ero->eco", mid, lora["b"])
        return base + delta * jnp.asarray(lora_scaling, base.dtype)

    hidden = jax.nn.silu(
        with_lora(expert_mm(buf, w["w1"]), "w1", buf)
    ) * with_lora(expert_mm(buf, w["w3"]), "w3", buf)
    out_buf = with_lora(
        expert_mm(hidden, w["w2"]), "w2", hidden
    )  # (E, C, D)

    gathered = out_buf[flat_e, jnp.minimum(slot, C - 1)]  # (N·k, D)
    weights = (top_w.reshape(-1) * keep.astype(jnp.float32)).astype(x.dtype)
    y = gathered * weights[:, None]
    return jnp.sum(y.reshape(N, top_k, D), axis=1)


def _attention_block(
    h: jax.Array,  # (B, T, D)
    w: Params,
    CK: jax.Array,  # (L, B, W, Hkv, Dh) FULL stacked ring (bf16 or fp8)
    CV: jax.Array,
    KS: jax.Array,  # (L, B, W, Hkv) fp8 scales (zero-size when bf16)
    VS: jax.Array,
    li: jax.Array,  # scalar int32 — this layer's index into the stack
    window: jax.Array,  # scalar int32
    positions: jax.Array,  # (B, T)
    token_valid: jax.Array,  # (B, T)
    kv_len: jax.Array,  # (B,) pre-chunk cache fill
    new_total: jax.Array,  # (B,) kv_len + seqlens
    rope_cs: Tuple[jax.Array, jax.Array],
    cfg: StaticConfig,
    attend_cache: bool,
    write_cache: bool = True,
    mesh=None,
    sp=None,  # seq-parallel axis name for this chunk (forward computes it)
) -> Tuple[jax.Array, ...]:
    """The stacked cache is a layer-scan CARRY, not xs/ys: this block
    scatters only the (B, T, Hkv, Dh) delta into the carried buffers
    (cache.update_stacked) and reads its own layer's ring with a dynamic
    slice. Round 1 rode per-layer slices through scan xs/ys, which cost a
    full-cache ys materialization per forward plus a full-cache copy into
    the decode loop carry every step (~10.6 ms/step at 7B B=32 fp8 — see
    update_stacked's docstring)."""
    B, T, _ = h.shape
    H, Hkv, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    ls = cfg.lora_scaling
    # With a mesh, pallas matmuls run per shard via parallel/shmap.py
    # (r4 — prior rounds forced the XLA path under any mesh).
    pal = cfg.attn_impl == "pallas"
    xq, xk, xv = _lin_fused(h, w, ("wq", "wk", "wv"), ls, pal, mesh, tag="qkv")
    xq = xq.reshape(B, T, H, Dh)
    xk = xk.reshape(B, T, Hkv, Dh)
    xv = xv.reshape(B, T, Hkv, Dh)
    cos, sin = rope_cs
    xq = apply_rope(xq, cos, sin)
    xk = apply_rope(xk, cos, sin)

    # scaled (fp8 or int8) ring — per-slot fp32 scales present
    is_scaled = is_scaled_dtype(CK.dtype)
    use_pallas = cfg.attn_impl == "pallas" and Dh % 128 == 0
    # Decode path precedence (T == 1, measured on v5e, docs/DECODE_PERF.md):
    #   1. fused update+attend kernel (round 3, default on TPU): write +
    #      ring-only attention in ONE pallas call — no scatter/slice/
    #      relayout in the decode loop. B=32 headline 0.77 of roofline,
    #      4096-ring 0.75 of SoL.
    #   2. XLA scatter + XLA attention: CPU, meshes (GSPMD-partitionable),
    #      or MISTRAL_FUSED_DECODE=0.
    #   3. XLA scatter + standalone decode kernel: A/B tool only
    #      (MISTRAL_DECODE_S) — it loses to both (the scatter and the
    #      kernel fight over the stacks' layout; 400 vs 1898 tok/s).

    def layer_ring(A):
        return jax.lax.dynamic_index_in_dim(A, li, 0, keepdims=False)

    if attend_cache and write_cache == "spec":
        # Speculative-verify fast path (speculative.py): write ALL T
        # candidate K/V tokens into consecutive ring slots, then attend
        # every query ring-only — causality within the chunk is position
        # arithmetic. Valid ONLY on a never-wrapping ring (the caller sets
        # spec_fused after checking min(windows) covers every position):
        # there is no eviction, rejected slots stay invisible (kv_len is
        # advanced by the caller only past accepted tokens) and are
        # overwritten when real tokens reach those positions. This keeps
        # the stacks' consumers pallas-only inside the spec loop — the
        # separate no-write verify + scatter_chunk commit re-created the
        # scatter/kernel layout war (serving measured ~128 ms per verify
        # iteration at B=32 vs ~13 ms for a fused decode step).
        S_buf = CK.shape[2]
        slot_pos, slot_valid = slot_positions(new_total, window, S_buf)
        if use_pallas and _FUSED_DECODE and S_buf % 128 == 0 and T <= 8:
            write_slot0 = jnp.where(
                token_valid[:, 0], positions[:, 0] % window, -1
            )
            vargs = (
                xq, xk, xv, CK, CV,
                KS if is_scaled else None, VS if is_scaled else None,
                li, window, write_slot0, positions, slot_pos, slot_valid,
            )
            if mesh is not None:
                from mistral_inference_tpu.parallel.shmap import (
                    fused_verify_attention_sharded,
                )

                out, CK, CV, nKS, nVS = fused_verify_attention_sharded(
                    *vargs, mesh=mesh
                )
            else:
                from mistral_inference_tpu.ops.pallas.attention import (
                    fused_verify_chunk_attention,
                )

                out, CK, CV, nKS, nVS = fused_verify_chunk_attention(*vargs)
            if is_scaled:
                KS, VS = nKS, nVS
            return _lin(out, w, "wo", ls, pal, mesh), CK, CV, KS, VS, xk, xv
        # XLA fallback (CPU, meshes, T > 8): same semantics — write the
        # full chunk, attend ring-only at the post-write fill.
        CK, CV, KS, VS = update_stacked(
            CK, CV, KS, VS, li, xk, xv, positions, token_valid, new_total,
            window,
        )
        new_ck, new_cv = layer_ring(CK), layer_ring(CV)
        new_ks, new_vs = layer_ring(KS), layer_ring(VS)
        mask = sliding_window_mask(
            positions, slot_pos, token_valid, slot_valid, window
        )
        if is_scaled:
            from mistral_inference_tpu.ops.attention import attend_scaled

            out = attend_scaled(
                xq,
                new_ck.reshape(B, S_buf, Hkv, Dh),
                new_cv.reshape(B, S_buf, Hkv, Dh),
                jnp.moveaxis(new_ks, 1, 2),
                jnp.moveaxis(new_vs, 1, 2),
                mask,
            )
        else:
            out = attend(
                xq,
                dequant_layer(new_ck, new_ks, xq.dtype, Hkv),
                dequant_layer(new_cv, new_vs, xq.dtype, Hkv),
                mask,
            )
        return _lin(out, w, "wo", ls, pal, mesh), CK, CV, KS, VS, xk, xv

    if attend_cache and T == 1:
        # Decode fast path: update the ring FIRST, then attend over the ring
        # only (SURVEY §7 step 4b). Safe exactly when T == 1: the query's
        # own key can never be evicted by later tokens of the same chunk.
        assert write_cache, "no-write (speculative verify) requires T > 1"
        S_buf = CK.shape[2]
        if use_pallas and _FUSED_DECODE and S_buf % 128 == 0:
            # write metadata (cache._ring_writes semantics, T == 1)
            slots = positions[:, 0] % window
            should = token_valid[:, 0] & (
                positions[:, 0] >= new_total - window
            )
            write_slot = jnp.where(should, slots, -1)
            slot_pos, slot_valid = slot_positions(new_total, window, S_buf)
            dargs = (
                xq, xk, xv, CK, CV,
                KS if is_scaled else None, VS if is_scaled else None,
                li, window, write_slot, positions[:, 0], slot_pos,
                slot_valid,
            )
            if mesh is not None:
                from mistral_inference_tpu.parallel.shmap import (
                    fused_decode_attention_sharded,
                )

                out, CK, CV, nKS, nVS = fused_decode_attention_sharded(
                    *dargs, mesh=mesh
                )
            else:
                from mistral_inference_tpu.ops.pallas.attention import (
                    fused_update_decode_attention,
                )

                out, CK, CV, nKS, nVS = fused_update_decode_attention(*dargs)
            if is_scaled:
                KS, VS = nKS, nVS
            return _lin(out, w, "wo", ls, pal, mesh), CK, CV, KS, VS, xk, xv
        CK, CV, KS, VS = update_stacked(
            CK, CV, KS, VS, li, xk, xv, positions, token_valid, new_total,
            window,
        )
        new_ck, new_cv = layer_ring(CK), layer_ring(CV)
        new_ks, new_vs = layer_ring(KS), layer_ring(VS)
        slot_pos, slot_valid = slot_positions(new_total, window, CK.shape[2])
        S_ring = new_ck.shape[1]
        if use_pallas and S_ring >= _DECODE_KERNEL_MIN_S and mesh is None:
            # Decode-shaped kernel: one program per (batch row, ring tile),
            # ALL heads in-register, ring read in its native (S, Hkv, D)
            # layout (no moveaxis pre-transpose = no full-ring HBM rewrite),
            # fp8 scales folded after the dots. The FULL stacked carry is
            # passed with li as a prefetched scalar — slicing the layer out
            # first would materialize a (B,S,Hkv,D) ring copy per layer per
            # step (custom calls can't fuse dynamic-slices).
            from mistral_inference_tpu.ops.pallas.attention import decode_attention

            out = decode_attention(
                xq, CK, CV,
                KS if is_scaled else None, VS if is_scaled else None,
                li, positions, slot_pos, slot_valid, window,
            )
        else:
            mask = sliding_window_mask(
                positions, slot_pos, token_valid, slot_valid, window
            )
            if is_scaled:
                from mistral_inference_tpu.ops.attention import attend_scaled

                out = attend_scaled(
                    xq,
                    new_ck.reshape(B, S_ring, Hkv, Dh),
                    new_cv.reshape(B, S_ring, Hkv, Dh),
                    jnp.moveaxis(new_ks, 1, 2),
                    jnp.moveaxis(new_vs, 1, 2),
                    mask,
                )
            else:
                out = attend(
                    xq,
                    dequant_layer(new_ck, new_ks, xq.dtype, Hkv),
                    dequant_layer(new_cv, new_vs, xq.dtype, Hkv),
                    mask,
                )
        return _lin(out, w, "wo", ls, pal, mesh), CK, CV, KS, VS, xk, xv

    # Under a quantized ring the current chunk attends to quantize-rounded
    # copies of its own K/V so prefill logits match what decode reads back.
    xk_att = kv_roundtrip(xk, CK.dtype) if is_scaled else xk
    xv_att = kv_roundtrip(xv, CK.dtype) if is_scaled else xv

    if attend_cache and use_pallas:
        # Chunk-over-ring prefill WITHOUT ring copies: the ring is read in
        # its native (B, S, Hkv, D) layout by ring_attention_stats (fp8
        # scales folded post-dot — same numerics as the decode paths), the
        # chunk's self-attention runs as a normal flash call, and the two
        # partial softmaxes merge exactly. The old path dequantized +
        # concatenated + moveaxis'd the ring per layer, and the transposed
        # layout propagated into the layer-scan carry — XLA then inserted a
        # full-stack (L,B,W,Hkv,D) layout copy at program entry (4 GB at
        # the 7B/4096-ring config: it OOMed the chip).
        from mistral_inference_tpu.ops.pallas.attention import (
            merge_attention_parts,
        )

        ck, cv = layer_ring(CK), layer_ring(CV)
        slot_pos, slot_valid = slot_positions(kv_len, window, CK.shape[2])
        if is_scaled:
            ks_in, vs_in = layer_ring(KS), layer_ring(VS)
        else:
            ks_in = jnp.ones((B, Hkv, ck.shape[1]), jnp.float32)
            vs_in = ks_in
        if mesh is not None:
            from mistral_inference_tpu.parallel.shmap import (
                flash_attention_sharded,
                ring_stats_sharded,
            )

            o_r, m_r, l_r = ring_stats_sharded(
                xq, ck, cv, ks_in, vs_in, positions, slot_pos, token_valid,
                slot_valid, window, mesh=mesh, sp=sp,
            )
            o_c, m_c, l_c = flash_attention_sharded(
                xq, xk_att, xv_att, positions, positions, token_valid,
                token_valid, window, mesh=mesh, sp=sp, return_stats=True,
            )
        else:
            from mistral_inference_tpu.ops.pallas.attention import (
                flash_attention,
                ring_attention_stats,
            )

            o_r, m_r, l_r = ring_attention_stats(
                xq, ck, cv, ks_in, vs_in, positions, slot_pos, token_valid,
                slot_valid, window,
            )
            o_c, m_c, l_c = flash_attention(
                xq, xk_att, xv_att, positions, positions, token_valid,
                token_valid, window, return_stats=True,
            )
        out = merge_attention_parts(o_r, m_r, l_r, o_c, m_c, l_c)
        out = out.reshape(B, T, H * Dh)
        if write_cache:
            CK, CV, KS, VS = update_stacked(
                CK, CV, KS, VS, li, xk, xv, positions, token_valid, new_total,
                window,
            )
        return _lin(out, w, "wo", ls, pal, mesh), CK, CV, KS, VS, xk, xv

    if attend_cache:
        ck, cv = layer_ring(CK), layer_ring(CV)
        ks, vs = layer_ring(KS), layer_ring(VS)
        slot_pos, slot_valid = slot_positions(kv_len, window, CK.shape[2])
        keys = jnp.concatenate([dequant_layer(ck, ks, xk.dtype, Hkv), xk_att], axis=1)
        vals = jnp.concatenate([dequant_layer(cv, vs, xv.dtype, Hkv), xv_att], axis=1)
        kv_pos = jnp.concatenate([slot_pos, positions], axis=1)
        kv_valid = jnp.concatenate([slot_valid, token_valid], axis=1)
    else:
        # First prefill on an empty cache: chunk-only attention — the ring
        # is never read (and with the carry design, never sliced either).
        keys, vals, kv_pos, kv_valid = xk_att, xv_att, positions, token_valid

    # Pallas flash kernel (S-tiled online softmax — unbounded context);
    # XLA path otherwise. Static decision — shapes are trace-time constants.
    if use_pallas and mesh is not None:
        from mistral_inference_tpu.parallel.shmap import flash_attention_sharded

        out = flash_attention_sharded(
            xq, keys, vals, positions, kv_pos, token_valid, kv_valid, window,
            mesh=mesh, sp=sp,
        )
    elif use_pallas:
        from mistral_inference_tpu.ops.pallas.attention import flash_attention

        out = flash_attention(
            xq, keys, vals, positions, kv_pos, token_valid, kv_valid, window
        )
    else:
        mask = sliding_window_mask(positions, kv_pos, token_valid, kv_valid, window)
        out = attend(xq, keys, vals, mask)  # (B, T, H*Dh)

    if write_cache:
        CK, CV, KS, VS = update_stacked(
            CK, CV, KS, VS, li, xk, xv, positions, token_valid, new_total, window
        )
    return _lin(out, w, "wo", ls, pal), CK, CV, KS, VS, xk, xv


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------


def forward(
    params: Params,
    rope: Tuple[jax.Array, jax.Array],
    tokens: jax.Array,  # (B, T) int32
    seqlens: jax.Array,  # (B,) int32 — valid tokens per row in this chunk
    cache: KVCache,
    cfg: StaticConfig,
    attend_cache: bool,
    input_embeds: Optional[jax.Array] = None,  # (B, T, D) overrides embedding
    mesh: Optional[jax.sharding.Mesh] = None,
    head: str = "full",  # "full" | "none" — static
    # static; False = speculative verify (no ring writes, chunk K/V
    # returned for scatter_chunk); "spec" = fused speculative verify
    # (ALL T candidate tokens written in-ring, kv_len left for the caller
    # to advance past the accepted prefix — non-wrapping rings only)
    write_cache: "bool | str" = True,
) -> Tuple[jax.Array, KVCache]:
    """One chunk pass (prefill chunk or single decode step).

    Returns (prelogits (B, T, V) float32, updated cache).

    ``write_cache=False`` (speculative decoding's verify pass) attends
    [ring ++ chunk] exactly like a prefill chunk but leaves the ring
    untouched, returning ``(prelogits, (chunk_k, chunk_v))`` instead —
    the per-layer rope'd K/V stacks ((L, B, T, Hkv, Dh), pre-quantization)
    that ``cache.scatter_chunk`` later writes for just the accepted prefix.
    Rejected draft tokens therefore never touch the ring, which keeps the
    rewind safe even when the ring wraps (speculative.py has the proof
    obligations).
    Equivalent of reference forward/forward_partial (transformer.py:163-242)
    minus pipeline send/recv — parallelism is GSPMD sharding, not P2P
    (activation constraints below; weight shardings in parallel/sharding.py).

    ``head="none"`` returns the final-norm hidden states (B, T, D) instead of
    prelogits: at prefill chunks the (B, T, V) fp32 logits tensor is the
    single largest allocation of the whole program (B=32, T=512, V=32k ⇒
    2 GB — it OOMed the 4096-ring bench), and callers that only need
    last-token logits or teacher-forced logprobs can apply the output head
    to far fewer positions (generate._prefill_step slices it).
    """
    from mistral_inference_tpu.parallel.sharding import constrain, seq_axis

    B, T = tokens.shape
    kv_len = cache.kv_len
    new_total = kv_len + seqlens
    positions = kv_len[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    token_valid = jnp.arange(T, dtype=jnp.int32)[None, :] < seqlens[:, None]

    # Sequence parallelism: prefill-chunk tokens shard over the mesh's
    # ``seq`` axis (parallel/mesh.py). Every per-token op (projections,
    # FFN, norms, head, this chunk's Q rows of attention) splits across
    # that axis; weights and the ring replicate over it, so XLA's only
    # seq collectives are the chunk-K/V all-gathers attention needs.
    sp = seq_axis(mesh, T)

    if input_embeds is None:
        h = jnp.take(params["tok_embeddings"], tokens, axis=0)
    else:
        h = input_embeds
    h = constrain(h, mesh, "data", sp, None)

    # Direct rope (no table gather): bitwise-identical to the table route
    # for in-range positions (ops/rope.rope_for_positions) and keeps the
    # 32 MB tables out of the decode-loop carry. ``rope`` stays in the
    # signature for API stability; XLA prunes the unused operands.
    cos, sin = rope_for_positions(positions, cfg.head_dim, cfg.rope_theta)

    layer_w = params["layers"]
    use_moe = cfg.moe_num_experts > 0

    # Keep the BIG quantized stacks out of the scan xs: scan xs are
    # dynamic-sliced per layer, and a pallas call can't fuse that slice, so
    # every weight byte would be re-written and re-read each step (~3.5
    # GB/step at 7B int4 — the dominant non-roofline cost in the r2 decode
    # profile). The stacks ride the closure instead, and ops/linear routes
    # leaves tagged with "li" to the scalar-prefetch stacked kernel.
    layer_small, layer_big = _split_stacked_quant(layer_w)

    def body(carry, xs):
        h, CK, CV, KS, VS = carry
        lw_s, window, li = xs
        lw = _merge_stacked_quant(lw_s, layer_big, li)
        attn_out, CK, CV, KS, VS, xk, xv = _attention_block(
            rms_norm(h, lw["attention_norm"], cfg.norm_eps),
            lw["attention"],
            CK,
            CV,
            KS,
            VS,
            li,
            window,
            positions,
            token_valid,
            kv_len,
            new_total,
            (cos, sin),
            cfg,
            attend_cache,
            write_cache,
            mesh,
            sp,
        )
        h = h + attn_out
        x = rms_norm(h, lw["ffn_norm"], cfg.norm_eps)
        if use_moe:
            if cfg.moe_impl == "dispatch":
                ff = _moe_ffn_dispatch(
                    x.reshape(B * T, -1), lw["moe"], cfg.moe_top_k,
                    cfg.moe_capacity_factor, cfg.lora_scaling,
                    # With a mesh the grouped kernel runs per shard via
                    # shard_map (parallel/shmap.py, r4).
                    fused_quant=cfg.attn_impl == "pallas",
                    mesh=mesh,
                ).reshape(x.shape)
            else:
                ff = _moe_ffn(
                    x.reshape(B * T, -1), lw["moe"], cfg.moe_top_k, cfg.lora_scaling
                ).reshape(x.shape)
        else:
            ff = _dense_ffn(x, lw["feed_forward"], cfg.lora_scaling,
                            pallas=cfg.attn_impl == "pallas", mesh=mesh)
        # ys only exist on the no-write (verify) variant — on the normal
        # path the scan allocates no per-layer output buffers at all.
        ys = None if write_cache else (xk, xv)
        return (h + ff, CK, CV, KS, VS), ys

    L = cache.k.shape[0]
    (h, new_k, new_v, new_ks, new_vs), chunk_kv = jax.lax.scan(
        body,
        (h, cache.k, cache.v, cache.k_scale, cache.v_scale),
        (layer_small, cache.windows, jnp.arange(L, dtype=jnp.int32)),
    )

    h = rms_norm(h, params["norm"], cfg.norm_eps)
    h = constrain(h, mesh, "data", sp, None)
    if head == "none":
        prelogits = h
    else:
        prelogits = (h @ params["output"]).astype(jnp.float32)  # softmax_fp32
        prelogits = constrain(prelogits, mesh, "data", sp, None)

    if not write_cache:
        return prelogits, chunk_kv

    if write_cache == "spec":
        # Ring bytes updated (all T candidates written), kv_len UNCHANGED:
        # the spec caller advances it by the accepted length (cache.rewind).
        return prelogits, KVCache(
            k=new_k,
            v=new_v,
            kv_len=kv_len,
            windows=cache.windows,
            k_scale=new_ks,
            v_scale=new_vs,
        )

    new_cache = KVCache(
        k=new_k,
        v=new_v,
        kv_len=new_total,
        windows=cache.windows,
        k_scale=new_ks,
        v_scale=new_vs,
    )
    return prelogits, new_cache


def make_rope(args: TransformerArgs, table_len: int = ROPE_TABLE_LEN):
    theta = args.rope_theta or DEFAULT_ROPE_THETA
    return precompute_rope(args.head_dim, table_len, theta)
