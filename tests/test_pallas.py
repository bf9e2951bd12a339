"""Pallas kernels vs XLA-path oracles (interpret mode on the CPU backend;
real compilation is exercised on-chip by bench.py / the verify drive)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mistral_inference_tpu.ops.attention import attend, sliding_window_mask
from mistral_inference_tpu.ops.linear import linear, quantize_weight
from mistral_inference_tpu.ops.pallas.attention import flash_attention
from mistral_inference_tpu.ops.pallas.matmul_quant import matmul_quant


def _attention_case(B, T, S, H, Hkv, D, window, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    # decode-like positions: queries at the end of a longer context
    kv_pos = jnp.asarray(
        np.stack([np.arange(S) + rng.integers(0, 3) for _ in range(B)]), jnp.int32
    )
    q_pos = kv_pos[:, -T:] if T <= S else jnp.tile(jnp.arange(T)[None], (B, 1))
    q_valid = jnp.ones((B, T), bool)
    kv_valid = jnp.asarray(rng.random((B, S)) > 0.2)
    w = jnp.int32(window)
    return q, k, v, q_pos, kv_pos, q_valid, kv_valid, w


@pytest.mark.parametrize(
    "B,T,S,H,Hkv,D,window",
    [
        (2, 16, 16, 4, 2, 128, 1 << 20),  # causal full-window prefill
        (2, 16, 24, 4, 2, 128, 8),  # sliding window, cache + chunk
        (3, 1, 32, 4, 4, 128, 1 << 20),  # decode step, MHA
        (1, 7, 40, 8, 2, 128, 16),  # ragged-ish odd T
        (2, 8, 1200, 4, 2, 128, 1 << 20),  # multiple S tiles (online softmax)
        (1, 200, 1200, 2, 2, 128, 300),  # multi T & S tiles + window
    ],
)
def test_flash_attention_matches_xla(B, T, S, H, Hkv, D, window):
    q, k, v, q_pos, kv_pos, q_valid, kv_valid, w = _attention_case(
        B, T, S, H, Hkv, D, window
    )
    mask = sliding_window_mask(q_pos, kv_pos, q_valid, kv_valid, w)
    ref = attend(q, k, v, mask)
    out = flash_attention(
        q, k, v, q_pos, kv_pos, q_valid, kv_valid, w, interpret=True
    )
    # compare only rows with ≥1 visible key (fully-masked rows are junk in
    # both impls, by different conventions)
    visible = np.asarray(mask.any(axis=-1))
    np.testing.assert_allclose(
        np.asarray(out)[visible], np.asarray(ref)[visible], atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("bits,B,K,N,group", [
    (8, 4, 256, 256, 128),
    (8, 1, 512, 256, 64),
    (4, 4, 256, 512, 128),
    (4, 2, 128, 256, 32),
])
def test_matmul_quant_matches_linear(bits, B, K, N, group):
    rng = np.random.default_rng(bits + K)
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((B, K)).astype(np.float32))
    qw = quantize_weight(w, bits=bits, group=group)
    ref = linear(x, qw)  # XLA dequant path — same quantized values
    out = matmul_quant(x, qw["q4" if bits == 4 else "q"], qw["scale"], interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("bits,E,C,K,N,group", [
    (8, 4, 8, 256, 512, 128),
    (4, 4, 8, 256, 512, 128),
    (8, 2, 16, 512, 256, 128),
    (4, 8, 8, 256, 384, 256),   # TN=128 fallback (384 % 256 != 0)
])
def test_moe_matmul_quant_matches_einsum(bits, E, C, K, N, group):
    """Grouped per-expert fused dequant-matmul vs the XLA dequant+einsum
    path over identical quantized values (the MoE dispatch oracle)."""
    from mistral_inference_tpu.ops.linear import dequant
    from mistral_inference_tpu.ops.pallas.moe_matmul import moe_matmul_quant

    rng = np.random.default_rng(bits + E + K)
    x = jnp.asarray(rng.standard_normal((E, C, K)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.standard_normal((E, K, N)).astype(np.float32) * 0.1)
    qw = quantize_weight(w, bits=bits, group=group)
    ref = jnp.einsum("eck,ekn->ecn", x, dequant(qw, jnp.float32))
    out = moe_matmul_quant(x, qw["q4" if bits == 4 else "q"], qw["scale"],
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("bits", [8, 4])
def test_moe_matmul_quant_stacked_matches_sliced(bits):
    """Layer-stacked grouped expert matmul (prefetched layer index into the
    (L, E, ...) stack) equals the per-layer kernel on the sliced layer."""
    from mistral_inference_tpu.ops.pallas.moe_matmul import (
        moe_matmul_quant,
        moe_matmul_quant_stacked,
    )

    rng = np.random.default_rng(bits)
    L, E, C, K, N, group = 3, 4, 8, 256, 512, 128
    x = jnp.asarray(rng.standard_normal((E, C, K)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.standard_normal((L, E, K, N)).astype(np.float32) * 0.1)
    qw = quantize_weight(w, bits=bits, group=group)
    q = qw["q4" if bits == 4 else "q"]
    for li in range(L):
        ref = moe_matmul_quant(x, q[li], qw["scale"][li], interpret=True)
        out = moe_matmul_quant_stacked(
            x, q, qw["scale"], jnp.int32(li), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4,
            err_msg=f"layer {li}",
        )


def test_moe_dispatch_quantized_matches_dense_oracle():
    """Quantized-expert dispatch MoE equals the dense all-experts oracle at
    full capacity (the fused Pallas expert matmul itself is covered by
    test_moe_matmul_quant_matches_einsum; on TPU the dispatch path routes
    through it via fused_quant=True)."""
    from mistral_inference_tpu.models.transformer import _moe_ffn_dispatch

    rng = np.random.default_rng(7)
    N, D, F, E, k = 16, 256, 512, 4, 2
    x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32) * 0.2)
    w = {
        "gate": jnp.asarray(rng.standard_normal((D, E)).astype(np.float32) * 0.1),
    }
    for name, shp in (("w1", (E, D, F)), ("w3", (E, D, F)), ("w2", (E, F, D))):
        dense = jnp.asarray(rng.standard_normal(shp).astype(np.float32) * 0.05)
        w[name] = quantize_weight(dense, bits=8, group=128)
    from mistral_inference_tpu.models.transformer import _moe_ffn

    out_dispatch = _moe_ffn_dispatch(x, w, k, capacity_factor=float(E))
    out_dense = _moe_ffn(x, w, k)
    np.testing.assert_allclose(
        np.asarray(out_dispatch), np.asarray(out_dense), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("bits,K,N,group", [
    (4, 2048, 512, 128),   # 2D int4 stacked path (rows=1024, N%512==0)
    (8, 2048, 512, 128),   # 2D int8 stacked path
    (4, 256, 384, 128),    # 1D fallback (rows % 1024 != 0)
    (8, 512, 384, 64),     # 1D fallback int8
])
def test_matmul_quant_stacked_matches_sliced(bits, K, N, group):
    """matmul_quant_stacked over a (L, ...) stack with a traced layer index
    equals the XLA dequant path on the sliced layer — the scan-body stacked
    path (no per-layer weight slice copies; docstring in matmul_quant.py)."""
    from mistral_inference_tpu.ops.pallas.matmul_quant import matmul_quant_stacked

    rng = np.random.default_rng(bits + K + N)
    L, B = 3, 4
    w = jnp.asarray(rng.standard_normal((L, K, N)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((B, K)).astype(np.float32))
    qw = quantize_weight(w, bits=bits, group=group)
    q = qw["q4" if bits == 4 else "q"]
    for li in range(L):
        leaf = {("q4" if bits == 4 else "q"): q[li], "scale": qw["scale"][li]}
        ref = linear(x, leaf)
        out = matmul_quant_stacked(
            x, q, qw["scale"], jnp.int32(li), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4,
            err_msg=f"layer {li}",
        )


def test_matmul_quant_2d_int4_matches_linear():
    """The 2D (N, K-stored) grid INT4 variant (split-halves, no concat
    buffer) must agree with the XLA dequant path at production-divisible
    shapes (stored rows % 1024 == 0, N % 512 == 0)."""
    from mistral_inference_tpu.ops.pallas.matmul_quant import (
        _matmul_quant_2d_int4,
    )

    rng = np.random.default_rng(7)
    B, K, N, group = 3, 2048, 512, 128
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((B, K)).astype(np.float32))
    qw = quantize_weight(w, bits=4, group=group)
    ref = linear(x, qw)
    out = _matmul_quant_2d_int4(x, qw["q4"], qw["scale"], TN=512, TK=1024,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


@pytest.mark.parametrize("kv_dtype", ["fp8", "int8"])
@pytest.mark.parametrize("S,Hkv,H", [(40, 2, 4), (1100, 2, 8)])
def test_decode_attention_matches_oracle(S, Hkv, H, kv_dtype):
    """(B, S-tile)-grid decode kernel (all heads per program, native ring
    layout) vs XLA attend over the dequantized ring — incl. an S > BS-pad
    case exercising the online-softmax accumulation. Parametrized over BOTH
    scaled ring dtypes (int8 is the production serving default) using the
    production quantizer (cache._quantize_ring), not a hand-rolled one."""
    from mistral_inference_tpu.cache import _quantize_ring, kv_cache_dtype

    rng = np.random.default_rng(S)
    B, T, D = 2, 1, 128
    rdt = kv_cache_dtype(kv_dtype, jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    kf = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
    vf = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
    kq, k_scale = _quantize_ring(jnp.asarray(kf), rdt)
    vq, v_scale = _quantize_ring(jnp.asarray(vf), rdt)
    k_scale = np.asarray(k_scale)
    v_scale = np.asarray(v_scale)

    kv_pos = jnp.tile(jnp.arange(S)[None], (B, 1))
    q_pos = jnp.full((B, T), S - 1, jnp.int32)
    q_valid = jnp.ones((B, T), bool)
    kv_valid = jnp.asarray(rng.random((B, S)) > 0.2)
    w = jnp.int32(S - 3)

    from mistral_inference_tpu.ops.attention import attend, sliding_window_mask
    from mistral_inference_tpu.ops.pallas.attention import decode_attention

    k_deq = jnp.asarray(kq, jnp.float32) * k_scale[..., None]
    v_deq = jnp.asarray(vq, jnp.float32) * v_scale[..., None]
    mask = sliding_window_mask(q_pos, kv_pos, q_valid, kv_valid, w)
    ref = attend(q, k_deq, v_deq, mask)

    # Stack L=3 layers with the real ring at layer 1: the kernel must pick
    # its layer through the prefetched-scalar index_map, not a pre-slice.
    # Arrays go in STORED layout: flat-head K/V, (B, Hkv, S) scales.
    def stack3(x):
        z = jnp.zeros_like(x)
        return jnp.stack([z, x, z + 1])

    def flat(x):  # (B, S, Hkv, D) -> stored (B, S, Hkv*D)
        return x.reshape(B, S, Hkv * D)

    def sc(x):  # (B, S, Hkv) -> stored (B, Hkv, S)
        return jnp.moveaxis(jnp.asarray(x), 1, 2)

    out = decode_attention(
        q, stack3(flat(kq)), stack3(flat(vq)),
        stack3(sc(k_scale)), stack3(sc(v_scale)),
        jnp.int32(1), q_pos, kv_pos, kv_valid, w, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4,
                               rtol=2e-4)

    # bf16 ring, scaled=False variant (no scale operands at all)
    out_bf = decode_attention(
        q.astype(jnp.bfloat16),
        stack3(flat(k_deq.astype(jnp.bfloat16))),
        stack3(flat(v_deq.astype(jnp.bfloat16))),
        None, None, jnp.int32(1), q_pos, kv_pos, kv_valid, w, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_bf, np.float32),
                               np.asarray(ref), atol=0.05, rtol=0.05)


@pytest.mark.parametrize("kv_dtype", ["fp8", "int8"])
@pytest.mark.parametrize("S,T,Hkv,H", [(40, 5, 2, 4), (700, 130, 2, 8)])
def test_ring_chunk_merge_matches_oracle(S, T, Hkv, H, kv_dtype):
    """ring_attention_stats (native-layout scaled ring) + flash_attention
    (chunk, return_stats) + merge_attention_parts vs one XLA attend over
    [dequantized ring ++ chunk] — the prefill-with-history contract.
    Covers ragged S/T tiles, multi-tile online-softmax accumulation, and
    both scaled ring dtypes via the production quantizer."""
    from mistral_inference_tpu.cache import _quantize_ring, kv_cache_dtype

    rng = np.random.default_rng(S + T)
    B, D = 2, 128
    rdt = kv_cache_dtype(kv_dtype, jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    kf = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
    vf = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
    kq, k_scale = _quantize_ring(jnp.asarray(kf), rdt)
    vq, v_scale = _quantize_ring(jnp.asarray(vf), rdt)
    k_scale = np.asarray(k_scale)
    v_scale = np.asarray(v_scale)
    ck = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))

    slot_pos = jnp.tile(jnp.arange(S)[None], (B, 1))
    slot_valid = jnp.asarray(rng.random((B, S)) > 0.2)
    q_pos = S + jnp.tile(jnp.arange(T)[None], (B, 1))
    q_valid = jnp.tile(jnp.arange(T)[None] < T - 1, (B, 1))  # one pad row
    w = jnp.int32(S + T - 3)

    from mistral_inference_tpu.ops.attention import attend, sliding_window_mask
    from mistral_inference_tpu.ops.pallas.attention import (
        flash_attention,
        merge_attention_parts,
        ring_attention_stats,
    )

    k_deq = jnp.asarray(kq, jnp.float32) * k_scale[..., None]
    v_deq = jnp.asarray(vq, jnp.float32) * v_scale[..., None]
    keys = jnp.concatenate([k_deq, ck], axis=1)
    vals = jnp.concatenate([v_deq, cv], axis=1)
    kv_pos = jnp.concatenate([slot_pos, q_pos], axis=1)
    kv_valid = jnp.concatenate([slot_valid, q_valid], axis=1)
    mask = sliding_window_mask(q_pos, kv_pos, q_valid, kv_valid, w)
    ref = attend(q, keys, vals, mask).reshape(B, T, H, D)

    o_r, m_r, l_r = ring_attention_stats(
        q, kq.reshape(B, S, Hkv * D), vq.reshape(B, S, Hkv * D),
        jnp.moveaxis(jnp.asarray(k_scale), 1, 2),
        jnp.moveaxis(jnp.asarray(v_scale), 1, 2),
        q_pos, slot_pos, q_valid, slot_valid, w, interpret=True,
    )
    o_c, m_c, l_c = flash_attention(
        q, ck, cv, q_pos, q_pos, q_valid, q_valid, w,
        interpret=True, return_stats=True,
    )
    out = merge_attention_parts(o_r, m_r, l_r, o_c, m_c, l_c)
    valid = np.asarray(q_valid)[..., None, None]
    np.testing.assert_allclose(
        np.asarray(out) * valid, np.asarray(ref) * valid, atol=3e-4, rtol=3e-4
    )


def test_flash_attention_stats_consistency():
    """return_stats=True output must equal the plain flash output."""
    rng = np.random.default_rng(0)
    B, T, H, Hkv, D = 2, 9, 4, 2, 128
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    pos = jnp.tile(jnp.arange(T)[None], (B, 1))
    valid = jnp.ones((B, T), bool)
    w = jnp.int32(T)

    from mistral_inference_tpu.ops.pallas.attention import flash_attention

    plain = flash_attention(q, k, v, pos, pos, valid, valid, w, interpret=True)
    o, m, l = flash_attention(
        q, k, v, pos, pos, valid, valid, w, interpret=True, return_stats=True
    )
    np.testing.assert_allclose(
        np.asarray(o.reshape(B, T, H * D)), np.asarray(plain), atol=1e-6
    )
    assert np.all(np.asarray(l) > 0)


def test_decode_attention_multi_row_blocks(monkeypatch):
    """RB < B: several row-block programs per S tile (the production grid
    shape — RB rows share each program)."""
    import mistral_inference_tpu.ops.pallas.attention as pa

    monkeypatch.setattr(pa, "_DECODE_RB", 2)
    monkeypatch.setattr(pa, "_DECODE_BS", 128)
    rng = np.random.default_rng(3)
    B, T, S, Hkv, H, D = 4, 1, 300, 2, 4, 128
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    kf = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
    vf = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
    kv_pos = jnp.tile(jnp.arange(S)[None], (B, 1))
    q_pos = jnp.full((B, T), S - 1, jnp.int32)
    kv_valid = jnp.asarray(rng.random((B, S)) > 0.1)
    w = jnp.int32(S)

    mask = sliding_window_mask(q_pos, kv_pos, jnp.ones((B, T), bool), kv_valid, w)
    ref = attend(q, jnp.asarray(kf), jnp.asarray(vf), mask)

    from mistral_inference_tpu.ops.pallas.attention import decode_attention

    k_st = jnp.asarray(kf.reshape(B, S, Hkv * D))[None].astype(jnp.bfloat16)
    v_st = jnp.asarray(vf.reshape(B, S, Hkv * D))[None].astype(jnp.bfloat16)
    out = decode_attention(
        q.astype(jnp.bfloat16), k_st, v_st, None, None,
        jnp.int32(0), q_pos, kv_pos, kv_valid, w, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref).reshape(B, T, H * D), atol=2e-2, rtol=2e-2
    )
