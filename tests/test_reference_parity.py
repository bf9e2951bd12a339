"""Differential tests against the ACTUAL reference implementation.

VERDICT r2 missing #1: the core decode≡prefill invariant is self-referential
— a consistent bug in RoPE convention, norm eps, or MoE gating order passes
it on both sides. These tests run the reference's torch code (CPU, from
/root/reference/src) against this framework on SHARED weights and compare
numerically.

The reference's only native dependency on these paths is xformers'
``memory_efficient_attention`` + its attn-bias classes (reference:
transformer_layers.py:6-7, cache.py:5-10). xformers is CUDA-only and not
installed, so a ~100-line stub materializes the exact bias semantics
(block-diagonal causal / local / bottom-right-local / offset-padded-keys)
and computes fp32 SDPA — the rest of the reference runs UNMODIFIED,
including its BufferCache ring, interleave/unrotate, chunked prefill and
generate() loop.

Covered (each maps to a VERDICT r2 #3 bullet):
  * rope: ops/rope.apply_rope vs reference apply_rotary_emb
    (reference: rope.py:13-23), incl. the 2-D vision variant (rope.py:26-51)
  * moe: models/transformer._moe_ffn vs reference MoeLayer (moe.py:16-32)
  * patch merger: models/vision.PatchMerger math vs reference
    torch.unfold-based PatchMerger (vision_encoder.py:147-228)
  * full model: teacher-forced logprobs + greedy generate() vs the
    reference Transformer end-to-end on a shared random checkpoint
    (transformer.py:221-242, generate.py:44-148) — BASELINE.md row 1.
"""

import json
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference/src"


# ---------------------------------------------------------------------------
# xformers / simple_parsing stubs (installed before importing the reference)
# ---------------------------------------------------------------------------


class _BlockDiagonalMask:
    """Dense-materializable stand-in for xformers' BlockDiagonalMask family.

    Semantics mirror the xformers docs for the three constructions the
    reference uses (cache.py:240-254):
      * from_seqlens(q).make_local_attention(w): block-diagonal, causal,
        query i sees key j iff 0 <= i - j < w (within its block)
      * from_seqlens(q, kv).make_local_attention_from_bottomright(w):
        block-diagonal, bottom-right aligned: delta = i + (nk - nq) - j,
        allowed iff 0 <= delta < w
      * CausalWithOffsetPaddedKeys.from_seqlens(q, kv_padding, kv_seqlen):
        per-block kv slab of kv_padding slots, of which j is visible iff
        j <= kv_seqlen[b] - q_len[b] + i  and  j < kv_seqlen[b]
    """

    def __init__(self, q_seqlen, kv_seqlen, kv_padding=None, causal=False,
                 window=None, bottomright=False):
        self.q_seqlen = list(q_seqlen)
        self.kv_seqlen = list(kv_seqlen)
        self.kv_padding = kv_padding
        self.causal = causal
        self.window = window
        self.bottomright = bottomright

    @classmethod
    def from_seqlens(cls, q_seqlen, kv_seqlen=None):
        return cls(q_seqlen, kv_seqlen if kv_seqlen is not None else q_seqlen,
                   causal=False)

    def make_local_attention(self, window_size):
        return type(self)(self.q_seqlen, self.kv_seqlen, self.kv_padding,
                          causal=True, window=window_size)

    def make_local_attention_from_bottomright(self, window_size):
        return type(self)(self.q_seqlen, self.kv_seqlen, self.kv_padding,
                          causal=True, window=window_size, bottomright=True)

    def allowed(self) -> torch.Tensor:
        kv_widths = ([self.kv_padding] * len(self.q_seqlen)
                     if self.kv_padding is not None else self.kv_seqlen)
        total_q, total_k = sum(self.q_seqlen), sum(kv_widths)
        out = torch.zeros((total_q, total_k), dtype=torch.bool)
        q0 = k0 = 0
        for b, (nq, nk_w) in enumerate(zip(self.q_seqlen, kv_widths)):
            nk = self.kv_seqlen[b]
            i = torch.arange(nq)[:, None]
            j = torch.arange(nk_w)[None, :]
            if self.kv_padding is not None:
                # causal-with-offset over a padded key slab
                blk = (j <= nk - nq + i) & (j < nk)
            elif self.causal:
                delta = (i + (nk - nq) - j) if self.bottomright else (i - j)
                blk = delta >= 0
                if self.window is not None:
                    blk &= delta < self.window
            else:
                blk = torch.ones((nq, nk_w), dtype=torch.bool)
            out[q0 : q0 + nq, k0 : k0 + nk_w] = blk
            q0 += nq
            k0 += nk_w
        return out


class _CausalMask(_BlockDiagonalMask):
    @classmethod
    def from_seqlens(cls, q_seqlen, kv_seqlen=None):
        return cls(q_seqlen, kv_seqlen if kv_seqlen is not None else q_seqlen,
                   causal=True)


class _OffsetPaddedKeysMask(_BlockDiagonalMask):
    @classmethod
    def from_seqlens(cls, q_seqlen, kv_padding, kv_seqlen):
        return cls(q_seqlen, kv_seqlen, kv_padding=kv_padding)


def _sdpa(q, k, v, attn_bias=None):
    """fp32 SDPA over xformers' (1, S, H, D) calling convention with a
    materialized block-diagonal bias. Matches memory_efficient_attention's
    contract: default scale 1/sqrt(D), fully-masked rows return 0."""
    scale = q.shape[-1] ** -0.5
    # The reference's BufferCache is torch.empty-allocated and decode feeds
    # the FULL padded ring here; garbage slots carry p == 0 exactly, but
    # 0·NaN = NaN, so sanitize K/V (real xformers never reads masked V).
    qf = q[0].float()
    kf = torch.nan_to_num(k[0].float())
    vf = torch.nan_to_num(v[0].float())
    scores = torch.einsum("qhd,khd->hqk", qf, kf) * scale
    if attn_bias is not None:
        allow = attn_bias.allowed()
        scores = scores.masked_fill(~allow[None], float("-inf"))
    p = torch.softmax(scores, dim=-1)
    p = torch.nan_to_num(p, nan=0.0)
    out = torch.einsum("hqk,khd->qhd", p, vf)
    # .contiguous(): the reference calls .view() on the result
    # (transformer_layers.py:89), which requires a contiguous tensor.
    return out.to(q.dtype)[None].contiguous()


def _install_stubs():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "xformers" in sys.modules:
        return
    sp = types.ModuleType("simple_parsing")
    sph = types.ModuleType("simple_parsing.helpers")

    class Serializable:
        pass

    sph.Serializable = Serializable
    sp.helpers = sph
    sys.modules["simple_parsing"] = sp
    sys.modules["simple_parsing.helpers"] = sph

    xf = types.ModuleType("xformers")
    xfo = types.ModuleType("xformers.ops")
    fmha = types.ModuleType("xformers.ops.fmha")
    bias = types.ModuleType("xformers.ops.fmha.attn_bias")
    bias.AttentionBias = _BlockDiagonalMask
    bias.BlockDiagonalMask = _BlockDiagonalMask
    bias.BlockDiagonalCausalMask = _CausalMask
    bias.BlockDiagonalCausalWithOffsetPaddedKeysMask = _OffsetPaddedKeysMask
    fmha.memory_efficient_attention = _sdpa
    fmha.attn_bias = bias
    xfo.fmha = fmha
    xf.ops = xfo
    sys.modules["xformers"] = xf
    sys.modules["xformers.ops"] = xfo
    sys.modules["xformers.ops.fmha"] = fmha
    sys.modules["xformers.ops.fmha.attn_bias"] = bias


@pytest.fixture(scope="module")
def ref():
    _install_stubs()
    import mistral_inference.generate as ref_generate
    import mistral_inference.moe as ref_moe
    import mistral_inference.rope as ref_rope
    import mistral_inference.transformer as ref_transformer
    import mistral_inference.vision_encoder as ref_vision
    from mistral_inference.args import TransformerArgs as RefArgs

    return types.SimpleNamespace(
        rope=ref_rope, moe=ref_moe, vision=ref_vision,
        transformer=ref_transformer, generate=ref_generate, Args=RefArgs,
    )


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------


def test_rope_matches_reference(ref):
    """ops/rope vs the reference's complex-multiply rotary embedding
    (reference: rope.py:6-23) on the same positions/theta."""
    from mistral_inference_tpu.ops.rope import rope_for_positions, apply_rope

    B, T, H, Hkv, D = 2, 7, 4, 2, 32
    theta = 1e6
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, T, H, D)).astype(np.float32)
    k = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
    positions = np.array([[3, 4, 5, 6, 7, 8, 9], [0, 1, 2, 3, 4, 5, 6]],
                         np.int32)

    # reference path: flat (ΣT, H, D) with freqs indexed by positions
    freqs = ref.rope.precompute_freqs_cis(D, 4096, theta)
    tq = torch.tensor(q.reshape(B * T, H, D))
    tk = torch.tensor(k.reshape(B * T, Hkv, D))
    fc = freqs[torch.tensor(positions.reshape(-1), dtype=torch.long)]
    rq, rk = ref.rope.apply_rotary_emb(tq, tk, freqs_cis=fc)

    cos, sin = rope_for_positions(jnp.asarray(positions), D, theta)
    oq = apply_rope(jnp.asarray(q), cos, sin)
    ok = apply_rope(jnp.asarray(k), cos, sin)

    np.testing.assert_allclose(
        np.asarray(oq).reshape(B * T, H, D), rq.numpy(), atol=2e-5, rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ok).reshape(B * T, Hkv, D), rk.numpy(), atol=2e-5, rtol=2e-5
    )


def test_rope_2d_matches_reference(ref):
    """2-D vision RoPE table vs reference precompute_freqs_cis_2d
    (reference: rope.py:26-51): interleaved height/width frequency bands."""
    from mistral_inference_tpu.ops.rope import precompute_rope_2d

    D, height, width, theta = 32, 5, 7, 10000.0
    ref_fc = ref.rope.precompute_freqs_cis_2d(D, height, width, theta)
    cos, sin = precompute_rope_2d(D, height, width, theta)  # (H, W, D//2)
    np.testing.assert_allclose(
        np.asarray(cos).reshape(height * width, D // 2),
        ref_fc.real.numpy().reshape(height * width, D // 2),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sin).reshape(height * width, D // 2),
        ref_fc.imag.numpy().reshape(height * width, D // 2),
        atol=1e-5, rtol=1e-5,
    )


# ---------------------------------------------------------------------------
# MoE
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("impl", ["dense", "dispatch"])
def test_moe_matches_reference(ref, impl):
    """_moe_ffn / _moe_ffn_dispatch vs the reference MoeLayer loop
    (reference: moe.py:16-32) on shared random gate + expert weights."""
    from mistral_inference_tpu.models.transformer import (
        _moe_ffn,
        _moe_ffn_dispatch,
    )

    N, D, F, E, K = 11, 32, 48, 4, 2
    g = torch.Generator().manual_seed(0)

    gate = torch.nn.Linear(D, E, bias=False)
    experts = []
    for _ in range(E):
        from mistral_inference.transformer_layers import FeedForward

        experts.append(FeedForward(D, F))
    with torch.no_grad():
        for m in [gate] + experts:
            for p in m.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.3)

    x = torch.randn((N, D), generator=g)
    layer = ref.moe.MoeLayer(experts, gate,
                             ref.moe.MoeArgs(num_experts=E, num_experts_per_tok=K))
    want = layer(x).detach().numpy()

    w = {
        "gate": jnp.asarray(gate.weight.detach().numpy().T),
        "w1": jnp.stack([jnp.asarray(e.w1.weight.detach().numpy().T) for e in experts]),
        "w2": jnp.stack([jnp.asarray(e.w2.weight.detach().numpy().T) for e in experts]),
        "w3": jnp.stack([jnp.asarray(e.w3.weight.detach().numpy().T) for e in experts]),
    }
    xj = jnp.asarray(x.numpy())
    if impl == "dense":
        got = _moe_ffn(xj, w, K, lora_scaling=0.0)
    else:
        # capacity ≥ N guarantees zero drops ⇒ exact agreement
        got = _moe_ffn_dispatch(xj, w, K, capacity_factor=float(E),
                                lora_scaling=0.0, fused_quant=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# PatchMerger
# ---------------------------------------------------------------------------


def test_patch_merger_matches_reference(ref):
    """models/vision.patch_merge vs the reference's literal torch.unfold
    sub-grid merge (reference: vision_encoder.py:147-228)."""
    from mistral_inference_tpu.models.vision import _patch_merge_one

    D, sub = 24, 2
    h1, w1 = 4, 6
    h2, w2 = 2, 2
    g = torch.Generator().manual_seed(1)
    x = torch.randn((h1 * w1 + h2 * w2, D), generator=g)
    proj = torch.nn.Linear(D * sub * sub, D, bias=False)
    with torch.no_grad():
        proj.weight.copy_(torch.randn(proj.weight.shape, generator=g) * 0.1)

    class _VA:
        spatial_merge_size = sub

    merger = ref.vision.PatchMerger.__new__(ref.vision.PatchMerger)
    torch.nn.Module.__init__(merger)
    merger.spatial_merge_size = sub
    merger.merging_layer = proj
    image_sizes = [(h1, w1), (h2, w2)]
    want = merger(x, image_sizes).detach().numpy()

    got_parts = []
    offset = 0
    for h, w in image_sizes:
        xi = jnp.asarray(x[offset : offset + h * w].numpy())
        got_parts.append(_patch_merge_one(xi, h, w, sub))
        offset += h * w
    got = np.concatenate([np.asarray(p) for p in got_parts], axis=0)
    got = got @ proj.weight.detach().numpy().T
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# Full model: teacher-forced logits + greedy generate
# ---------------------------------------------------------------------------

ARGS = dict(
    dim=64,
    n_layers=2,
    head_dim=16,
    hidden_dim=128,
    n_heads=4,
    n_kv_heads=2,
    norm_eps=1e-5,
    vocab_size=256,
    rope_theta=10000.0,
)


def _shared_checkpoint(tmp_path, ref, sliding_window=None, moe=None):
    """Build the reference model with seeded torch init, write its exact
    state_dict as a reference-format folder, load BOTH frameworks from it."""
    from safetensors.numpy import save_file

    from mistral_inference_tpu.model import Transformer as OurTransformer

    kw = dict(ARGS)
    if sliding_window is not None:
        kw["sliding_window"] = sliding_window
    ref_args = ref.Args(max_batch_size=4, **kw,
                        moe=ref.moe.MoeArgs(**moe) if moe else None)
    torch.manual_seed(42)
    ref_model = ref.transformer.Transformer(ref_args).to(torch.float32)
    with torch.no_grad():
        for p in ref_model.parameters():
            p.copy_(torch.randn(p.shape) * 0.3 / max(1, p.ndim))

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    d = dict(kw)
    if moe:
        d["moe"] = moe
    (tmp_path / "params.json").write_text(json.dumps(d))
    save_file(sd, str(tmp_path / "consolidated.safetensors"))
    our_model = OurTransformer.from_folder(tmp_path, dtype=jnp.float32)
    return ref_model, our_model


PROMPTS = [
    [1, 5, 9, 13, 17, 21],
    [2, 6, 10],
    [3, 7, 11, 15, 19, 23, 27, 31, 35],
    [4, 8],
]


@pytest.mark.parametrize(
    "sliding_window,moe,chunk",
    [
        (None, None, None),
        (4, None, None),  # ring smaller than prompts: eviction + local mask
        (None, None, 4),  # chunked prefill (reference regime 2 masks)
        (None, dict(num_experts=4, num_experts_per_tok=2), None),
    ],
)
def test_generate_matches_reference(tmp_path, ref, sliding_window, moe, chunk):
    """End-to-end: reference generate() (its own BufferCache, chunked
    prefill, greedy sampling — generate.py:44-148) vs our generate() on a
    shared checkpoint. Compares generated token ids exactly and
    teacher-forced + decode logprobs to 5e-4 (the reference's own test
    tolerance, test_generate.py:55-67)."""
    ref_model, our_model = _shared_checkpoint(
        tmp_path, ref, sliding_window=sliding_window, moe=moe
    )

    from mistral_inference_tpu.generate import generate as our_generate

    # The reference's chunked prefill asserts every prompt reaches into
    # every chunk (generate.py:94) — use long-enough prompts there.
    prompts = PROMPTS if chunk is None else [
        [1, 5, 9, 13, 17, 21],
        [2, 6, 10, 14, 18, 22, 26, 30],
        [3, 7, 11, 15, 19],
        [4, 8, 12, 16, 20, 24, 28],
    ]
    want_toks, want_lps = ref.generate.generate(
        prompts, ref_model, max_tokens=6, temperature=0.0, chunk_size=chunk,
    )
    got_toks, got_lps = our_generate(
        prompts, our_model, max_tokens=6, temperature=0.0, chunk_size=chunk,
    )
    assert got_toks == want_toks
    for got, want in zip(got_lps, want_lps):
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=0)


def test_teacher_forced_logits_match_reference(tmp_path, ref):
    """Full-sequence fp32 prelogits vs the reference forward on a fresh
    cache — the direct BASELINE.md row-1 check (logit match, not just
    logprob-of-argmax)."""
    ref_model, our_model = _shared_checkpoint(tmp_path, ref)

    from mistral_inference.cache import BufferCache

    seqlens = [len(p) for p in PROMPTS]
    flat = sum(PROMPTS, [])
    cache = BufferCache(
        ref_model.n_local_layers, ref_model.args.max_batch_size,
        max(seqlens), ref_model.args.n_kv_heads, ref_model.args.head_dim,
        ref_model.args.sliding_window,
    )
    cache.to(device=ref_model.device, dtype=ref_model.dtype)
    cache.reset()
    want = ref_model.forward(
        torch.tensor(flat, dtype=torch.long), seqlens, cache=cache
    ).detach().numpy()  # (ΣT, V) fp32

    import mistral_inference_tpu.models.transformer as tf

    B = len(PROMPTS)
    T = max(seqlens)
    toks = np.zeros((B, T), np.int32)
    for i, p in enumerate(PROMPTS):
        toks[i, : len(p)] = p
    our_cache = our_model.alloc_cache(B, T)
    prelogits, _ = tf.forward(
        our_model.params, our_model.rope, jnp.asarray(toks),
        jnp.asarray(seqlens, jnp.int32), our_cache, our_model.cfg,
        attend_cache=False,
    )
    got = np.asarray(prelogits)  # (B, T, V)
    off = 0
    for i, s in enumerate(seqlens):
        np.testing.assert_allclose(
            got[i, :s], want[off : off + s], atol=2e-4, rtol=2e-4
        )
        off += s
