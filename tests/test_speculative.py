"""Speculative decoding: greedy output must equal standard greedy decode
exactly — speculation may only change how many target forwards it takes.

No reference equivalent (the reference decodes strictly one token per
forward, generate.py:125-140); the oracle here is this repo's own
``generate``, whose decode≡prefill logprob invariant is covered in
tests/test_generate.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mistral_inference_tpu.args import MoeArgs, TransformerArgs
from mistral_inference_tpu.generate import generate
from mistral_inference_tpu.model import Transformer
from mistral_inference_tpu.speculative import generate_speculative


def _target_args(**kw):
    base = dict(
        dim=128, n_layers=3, head_dim=32, hidden_dim=256, n_heads=4,
        n_kv_heads=2, norm_eps=1e-5, vocab_size=256,
    )
    base.update(kw)
    return TransformerArgs(**base)


def _draft_args(**kw):
    base = dict(
        dim=64, n_layers=2, head_dim=16, hidden_dim=128, n_heads=4,
        n_kv_heads=2, norm_eps=1e-5, vocab_size=256,
    )
    base.update(kw)
    return TransformerArgs(**base)


PROMPTS = [[5, 17, 2, 91, 33], [7, 3], [100, 101, 102, 103, 104, 105, 106]]


def _check_match(model, draft, prompts=PROMPTS, max_tokens=24, **spec_kw):
    ref_toks, ref_lps = generate(
        prompts, model, max_tokens=max_tokens, temperature=0.0
    )
    toks, lps = generate_speculative(
        prompts, model, draft, max_tokens=max_tokens, **spec_kw
    )
    assert toks == ref_toks
    for a, b in zip(lps, ref_lps):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_spec_matches_greedy_dense():
    """Unrelated random draft (low acceptance): tokens identical anyway."""
    model = Transformer.random(_target_args(), seed=0)
    draft = Transformer.random(_draft_args(), seed=1)
    _check_match(model, draft, spec_tokens=3)


def test_spec_matches_greedy_self_draft():
    """Draft == target: every draft token accepted, output still identical."""
    model = Transformer.random(_target_args(), seed=0)
    _check_match(model, model, spec_tokens=4)


def test_spec_sliding_window_wrapping_ring():
    """Target ring wraps mid-generation (window 16 < prompt+tokens):
    the no-write verify + accepted-only commit must stay exact."""
    model = Transformer.random(_target_args(sliding_window=16), seed=2)
    draft = Transformer.random(_draft_args(), seed=3)
    _check_match(model, draft, max_tokens=32, spec_tokens=3)


def test_spec_fp8_kv_cache():
    model = Transformer.random(_target_args(kv_quant="fp8"), seed=4)
    draft = Transformer.random(_draft_args(), seed=5)
    _check_match(model, draft, spec_tokens=3)


def test_spec_quantized_target():
    model = Transformer.random(_target_args(), seed=6).quantize("int4", group=32)
    draft = Transformer.random(_draft_args(), seed=7)
    _check_match(model, draft, spec_tokens=2)


def test_spec_moe_target():
    model = Transformer.random(
        _target_args(moe=MoeArgs(num_experts=4, num_experts_per_tok=2)), seed=8
    )
    draft = Transformer.random(_draft_args(), seed=9)
    _check_match(model, draft, spec_tokens=2)


def test_spec_eos_truncation():
    """EOS stop rule must reproduce generate()'s reference semantics
    (append per global step until every row has emitted EOS)."""
    model = Transformer.random(_target_args(), seed=0)
    draft = Transformer.random(_draft_args(), seed=1)
    ref_toks, ref_lps = generate(
        PROMPTS, model, max_tokens=24, temperature=0.0
    )
    # Pick an EOS id that actually appears mid-stream in the no-EOS run so
    # the truncation path is exercised (fall back to a non-appearing id —
    # then spec must equal the plain run).
    flat = [t for row in ref_toks for t in row[2:-2]]
    eos = flat[len(flat) // 2]
    a = generate(PROMPTS, model, max_tokens=24, temperature=0.0, eos_id=eos)
    b = generate_speculative(
        PROMPTS, model, draft, max_tokens=24, eos_id=eos, spec_tokens=3
    )
    assert b[0] == a[0]
    for x, y in zip(b[1], a[1]):
        np.testing.assert_allclose(x, y, atol=1e-4, rtol=1e-4)


def test_spec_via_generate_kwarg():
    model = Transformer.random(_target_args(), seed=0)
    draft = Transformer.random(_draft_args(), seed=1)
    ref = generate(PROMPTS, model, max_tokens=12, temperature=0.0)
    out = generate(
        PROMPTS, model, max_tokens=12, temperature=0.0,
        draft_model=draft, spec_tokens=3,
    )
    assert out[0] == ref[0]


def test_spec_rejects_windowed_draft():
    model = Transformer.random(_target_args(), seed=0)
    draft = Transformer.random(_draft_args(sliding_window=8), seed=1)
    with pytest.raises(AssertionError, match="draft"):
        generate_speculative(PROMPTS, model, draft, max_tokens=8)


def test_spec_logprob_contract_lengths():
    """Logprobs: seqlen-1 prompt transitions + one per generated token."""
    model = Transformer.random(_target_args(), seed=0)
    draft = Transformer.random(_draft_args(), seed=1)
    toks, lps = generate_speculative(
        PROMPTS, model, draft, max_tokens=10, spec_tokens=3
    )
    for p, t, l in zip(PROMPTS, toks, lps):
        assert len(t) == 10
        assert len(l) == len(p) - 1 + 10


def test_spec_chunked_prefill():
    model = Transformer.random(_target_args(), seed=0)
    draft = Transformer.random(_draft_args(), seed=1)
    _check_match(model, draft, spec_tokens=3, chunk_size=3)


# ---------------------------------------------------------------------------
# Draft-free prompt-lookup speculation
# ---------------------------------------------------------------------------


def test_lookup_matches_greedy():
    """n-gram proposals (however bad) must never change greedy output."""
    from mistral_inference_tpu.speculative import generate_lookup

    model = Transformer.random(_target_args(), seed=0)
    ref, ref_lps = generate(PROMPTS, model, max_tokens=24, temperature=0.0)
    out, lps = generate_lookup(PROMPTS, model, max_tokens=24, spec_tokens=4)
    assert out == ref
    for a, b in zip(lps, ref_lps):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_lookup_proposer_finds_most_recent_match():
    """Unit check of the in-program n-gram matcher: propose the tokens
    that followed the MOST RECENT earlier occurrence of the current
    bigram; no-match rows propose t0 repeated."""
    from mistral_inference_tpu.speculative import _lookup_propose

    #          0  1  2  3  4  5  6   7  8
    hist = [[10, 11, 30, 31, 10, 11, 40, 10, 11],   # bigram (10,11) recurs
            [1, 2, 3, 4, 5, 6, 7, 8, 9]]            # no repeat anywhere
    hist = jnp.asarray(hist, jnp.int32)
    hlen = jnp.asarray([9, 9], jnp.int32)
    t0 = hist[jnp.arange(2), hlen - 1]
    prop = np.asarray(_lookup_propose(hist, hlen, t0, K=3, ngram=2))
    # Row 0: most recent earlier (10,11) ends at index 5 → propose 40,10,11.
    assert prop[0].tolist() == [40, 10, 11]
    # Row 1: no match → t0 repeated.
    assert prop[1].tolist() == [9, 9, 9]


def test_lookup_repetitive_prompt_accepts():
    """A strongly periodic prompt should actually accept lookup proposals
    (the point of the feature), while staying exactly greedy-correct."""
    from mistral_inference_tpu.speculative import generate_lookup

    model = Transformer.random(_target_args(), seed=2)
    loop = [9, 4, 7] * 8  # period-3 token loop
    ref, _ = generate([loop], model, max_tokens=16, temperature=0.0)
    out, _ = generate_lookup([loop], model, max_tokens=16, spec_tokens=4)
    assert out == ref


def test_lookup_sliding_window_and_eos():
    from mistral_inference_tpu.speculative import generate_lookup

    model = Transformer.random(_target_args(sliding_window=16), seed=5)
    ref, _ = generate(PROMPTS, model, max_tokens=20, temperature=0.0)
    flat = [t for row in ref for t in row[2:-2]]
    eos = flat[len(flat) // 2]
    a = generate(PROMPTS, model, max_tokens=20, temperature=0.0, eos_id=eos)
    b = generate_lookup(PROMPTS, model, max_tokens=20, eos_id=eos, spec_tokens=3)
    assert b[0] == a[0]


def test_lookup_sampled_deterministic():
    from mistral_inference_tpu.speculative import generate_lookup

    model = Transformer.random(_target_args(), seed=0)
    a = generate_lookup(
        PROMPTS, model, max_tokens=10, temperature=0.8, spec_tokens=3, seed=5
    )
    b = generate_lookup(
        PROMPTS, model, max_tokens=10, temperature=0.8, spec_tokens=3, seed=5
    )
    assert a == b
    for pr, t, l in zip(PROMPTS, a[0], a[1]):
        assert len(t) == 10 and len(l) == len(pr) - 1 + 10


def test_lookup_via_generate_kwarg():
    model = Transformer.random(_target_args(), seed=0)
    ref = generate(PROMPTS, model, max_tokens=12, temperature=0.0)
    out = generate(
        PROMPTS, model, max_tokens=12, temperature=0.0, draft_model="lookup"
    )
    assert out[0] == ref[0]


# ---------------------------------------------------------------------------
# temperature > 0: rejection sampling
# ---------------------------------------------------------------------------


def test_rejection_sampling_unbiased():
    """The accept/residual math must reproduce the target distribution
    EXACTLY (Leviathan speculative sampling): draw d ~ q, accept with
    min(1, p(d)/q(d)), else sample from norm(max(p - q, 0)) — the output
    marginal is p. Empirical check over many keys against fixed p, q."""
    import jax

    from mistral_inference_tpu.speculative import _residual_dist

    V = 8
    rng = np.random.default_rng(0)
    p = rng.dirichlet(np.ones(V)).astype(np.float32)
    q = rng.dirichlet(np.ones(V)).astype(np.float32)
    pj, qj = jnp.asarray(p), jnp.asarray(q)
    res = jnp.log(_residual_dist(pj, qj))

    def trial(key):
        k1, k2, k3 = jax.random.split(key, 3)
        d = jax.random.categorical(k1, jnp.log(qj))
        u = jax.random.uniform(k2)
        accept = u * qj[d] < pj[d]
        fallback = jax.random.categorical(k3, res)
        return jnp.where(accept, d, fallback)

    n = 200_000
    toks = jax.jit(jax.vmap(trial))(jax.random.split(jax.random.PRNGKey(1), n))
    emp = np.bincount(np.asarray(toks), minlength=V) / n
    # TV distance; 200k samples over 8 bins → sampling noise ~0.003
    assert 0.5 * np.abs(emp - p).sum() < 0.01, (emp, p)


def test_spec_sampling_deterministic_and_contract():
    """temperature > 0 speculation: deterministic per seed, seed-sensitive,
    and honors the logprob/EOS contracts."""
    model = Transformer.random(_target_args(), seed=0)
    draft = Transformer.random(_draft_args(), seed=1)
    a = generate_speculative(
        PROMPTS, model, draft, max_tokens=12, temperature=0.7, spec_tokens=3,
        seed=11,
    )
    b = generate_speculative(
        PROMPTS, model, draft, max_tokens=12, temperature=0.7, spec_tokens=3,
        seed=11,
    )
    c = generate_speculative(
        PROMPTS, model, draft, max_tokens=12, temperature=0.7, spec_tokens=3,
        seed=12,
    )
    assert a[0] == b[0] and a[1] == b[1]
    assert a[0] != c[0]  # astronomically unlikely to collide
    for pr, t, l in zip(PROMPTS, a[0], a[1]):
        assert len(t) == 12 and len(l) == len(pr) - 1 + 12


def test_spec_sampling_near_zero_temp_is_greedy():
    """temperature → 0 limit of the rejection path = greedy decode."""
    model = Transformer.random(_target_args(), seed=0)
    draft = Transformer.random(_draft_args(), seed=1)
    ref, _ = generate(PROMPTS, model, max_tokens=12, temperature=0.0)
    out = generate_speculative(
        PROMPTS, model, draft, max_tokens=12, temperature=1e-6, spec_tokens=3
    )
    assert out[0] == ref


def test_spec_sampling_exact_distribution_tiny_model():
    """End-to-end distributional check: with B identical prompts the first
    SPECULATIVE token (stream position 2) must follow the target's true
    sampling distribution. Conditioning on the most likely first token
    keeps the test exact without freezing the sampler."""
    import jax

    args = _target_args(vocab_size=16, n_layers=1)
    model = Transformer.random(args, seed=3)
    draft = Transformer.random(_draft_args(vocab_size=16, n_layers=1), seed=4)
    B = 256
    prompt = [3, 7, 1]
    reps = 48
    temp, top_p = 1.0, 0.95

    # Ground truth: p(t2 | prompt, t1) for the modal t1, via teacher forcing.
    from mistral_inference_tpu.generate import top_p_probs

    t1_probs = None
    counts = np.zeros(16)
    seen = 0
    t1_star = None
    for rep in range(reps):
        toks, _ = generate_speculative(
            [prompt] * B, model, draft, max_tokens=2, temperature=temp,
            spec_tokens=2, top_p=top_p, seed=100 + rep,
        )
        arr = np.array(toks)  # (B, 2)
        if t1_star is None:
            vals, cnts = np.unique(arr[:, 0], return_counts=True)
            t1_star = int(vals[np.argmax(cnts)])
        sel = arr[:, 0] == t1_star
        for t in arr[sel, 1]:
            counts[t] += 1
        seen += sel.sum()

    cache = model.alloc_cache(1, 8)
    logits, cache = model.forward(
        jnp.asarray([prompt + [t1_star]], jnp.int32),
        jnp.asarray([4], jnp.int32), cache, attend_cache=False,
    )
    p_true = np.asarray(
        top_p_probs(jax.nn.softmax(logits[:, -1].astype(jnp.float32) / temp), top_p)
    )[0]

    emp = counts / max(seen, 1)
    tv = 0.5 * np.abs(emp - p_true).sum()
    # seen ≈ reps·B·max(p(t1*)); tolerance sized for ~2-6k samples
    assert seen > 1500, seen
    assert tv < 0.06, (tv, emp, p_true)


def test_spec_quantized_draft():
    """An int8-quantized draft model proposes through the fused paths."""
    model = Transformer.random(_target_args(), seed=0)
    draft = Transformer.random(_draft_args(), seed=1).quantize("int8", group=32)
    _check_match(model, draft, spec_tokens=2, max_tokens=12)


def test_spec_live_lora_target():
    """Speculation over a live-LoRA target (adapters applied per forward)
    must equal that target's standard greedy decode."""
    from mistral_inference_tpu.args import LoraArgs

    args = _target_args(lora=LoraArgs(rank=4, scaling=2.0))
    model = Transformer.random(args, seed=2)
    # give the adapters non-zero weight so they actually change outputs
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(model.params)
    key = jax.random.PRNGKey(0)
    new = []
    for x in leaves:
        key, sub = jax.random.split(key)
        new.append(
            x + 0.01 * jax.random.normal(sub, x.shape, x.dtype)
            if x.ndim >= 2 else x
        )
    model.params = jax.tree_util.tree_unflatten(treedef, new)
    draft = Transformer.random(_draft_args(), seed=3)
    _check_match(model, draft, spec_tokens=2, max_tokens=12)


# ---------------------------------------------------------------------------
# Mamba prompt-lookup speculation (no reference equivalent: the reference's
# mamba path decodes one token per forward via mamba_ssm's CUDA-graph
# generator, generate.py:22-32). Oracle: this repo's generate_mamba, whose
# decode==prefill invariant is covered in tests/test_mamba.py.
# ---------------------------------------------------------------------------


def _tiny_mamba(seed=0, **over):
    from tests.test_mamba import tiny_mamba_args
    from mistral_inference_tpu.model import Mamba

    return Mamba.random(tiny_mamba_args(**over), dtype=jnp.float32, seed=seed)


def test_mamba_lookup_matches_greedy():
    """n-gram proposals (however bad) must never change Mamba greedy output,
    and the committed recurrent state must track the accepted prefix exactly
    (the seqlens-masked commit in _mamba_lookup_block)."""
    from mistral_inference_tpu.generate import generate_mamba
    from mistral_inference_tpu.speculative import generate_lookup_mamba

    model = _tiny_mamba(seed=0)
    ref, ref_lps = generate_mamba(
        PROMPTS, model, max_tokens=24, temperature=0.0
    )
    out, lps = generate_lookup_mamba(
        PROMPTS, model, max_tokens=24, spec_tokens=4
    )
    assert out == ref
    for a, b in zip(lps, ref_lps):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_mamba_lookup_repetitive_prompt_accepts():
    """Periodic prompt: proposals should actually be accepted (multi-token
    commits exercise seqlens > 1 state absorption), output stays exact."""
    from mistral_inference_tpu.generate import generate_mamba
    from mistral_inference_tpu.speculative import generate_lookup_mamba

    model = _tiny_mamba(seed=2)
    loop = [9, 4, 7] * 8
    ref, _ = generate_mamba([loop], model, max_tokens=16, temperature=0.0)
    out, _ = generate_lookup_mamba([loop], model, max_tokens=16, spec_tokens=4)
    assert out == ref


def test_mamba_lookup_eos_truncation():
    from mistral_inference_tpu.generate import generate_mamba
    from mistral_inference_tpu.speculative import generate_lookup_mamba

    model = _tiny_mamba(seed=5)
    ref, _ = generate_mamba(PROMPTS, model, max_tokens=20, temperature=0.0)
    flat = [t for row in ref for t in row[2:-2]]
    eos = flat[len(flat) // 2]
    a = generate_mamba(PROMPTS, model, max_tokens=20, temperature=0.0, eos_id=eos)
    b = generate_lookup_mamba(
        PROMPTS, model, max_tokens=20, eos_id=eos, spec_tokens=3
    )
    assert b[0] == a[0]


def test_mamba_lookup_sampled_deterministic_and_contract():
    from mistral_inference_tpu.speculative import generate_lookup_mamba

    model = _tiny_mamba(seed=0)
    a = generate_lookup_mamba(
        PROMPTS, model, max_tokens=10, temperature=0.8, spec_tokens=3, seed=5
    )
    b = generate_lookup_mamba(
        PROMPTS, model, max_tokens=10, temperature=0.8, spec_tokens=3, seed=5
    )
    assert a == b
    for pr, t, l in zip(PROMPTS, a[0], a[1]):
        assert len(t) == 10 and len(l) == len(pr) - 1 + 10


def test_mamba_lookup_via_generate_kwarg():
    from mistral_inference_tpu.generate import generate_mamba

    model = _tiny_mamba(seed=0)
    ref = generate_mamba(PROMPTS, model, max_tokens=12, temperature=0.0)
    out = generate_mamba(
        PROMPTS, model, max_tokens=12, temperature=0.0, draft_model="lookup"
    )
    assert out[0] == ref[0]


def test_mamba_lookup_quantized():
    """INT8 projections under the lookup path (verify and commit both
    stream the same quantized weights)."""
    from mistral_inference_tpu.generate import generate_mamba
    from mistral_inference_tpu.speculative import generate_lookup_mamba

    model = _tiny_mamba(seed=1)
    model.quantize("int8")
    ref, _ = generate_mamba(PROMPTS, model, max_tokens=12, temperature=0.0)
    out, _ = generate_lookup_mamba(PROMPTS, model, max_tokens=12, spec_tokens=3)
    assert out == ref


def test_spec_fused_write_semantics_match_scatter(monkeypatch):
    """The fused in-ring verify mode (write_cache="spec": ALL K+1 candidate
    tokens written, commit = kv_len advance — XLA fallback path on CPU)
    must emit exactly what the no-write verify + scatter_chunk path emits.
    Forced on here via _spec_fused_ok; on TPU the same semantics run inside
    fused_verify_chunk_attention (tests/test_fused_verify.py)."""
    import mistral_inference_tpu.speculative as sp

    model = Transformer.random(_target_args(), seed=0)
    draft = Transformer.random(_draft_args(), seed=1)
    ref_toks, ref_lps = generate_speculative(
        PROMPTS, model, draft, max_tokens=20
    )
    model._jitted.clear()
    monkeypatch.setattr(sp, "_spec_fused_ok", lambda *a, **k: True)
    toks, lps = generate_speculative(PROMPTS, model, draft, max_tokens=20)
    assert toks == ref_toks
    for a, b in zip(lps, ref_lps):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_lookup_fused_write_matches_greedy(monkeypatch):
    """Lookup speculation under the fused in-ring verify mode stays
    bit-identical to standard greedy decode (int8 ring: the committed
    bytes quantize identically on both paths)."""
    import mistral_inference_tpu.speculative as sp
    from mistral_inference_tpu.speculative import generate_lookup

    model = Transformer.random(_target_args(kv_quant="int8"), seed=3)
    ref_toks, _ = generate(PROMPTS, model, max_tokens=20, temperature=0.0)
    monkeypatch.setattr(sp, "_spec_fused_ok", lambda *a, **k: True)
    toks, _ = generate_lookup(PROMPTS, model, max_tokens=20, spec_tokens=3)
    assert toks == ref_toks
