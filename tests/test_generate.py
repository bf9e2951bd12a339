"""Core generation tests.

Strategy mirrors the reference's logits-equivalence testing
(reference: tests/test_generate.py:36-230): build a tiny random-weight model,
generate greedily, then re-run the whole (prompt + output) sequence as a
single prefill with max_tokens=0 — the teacher-forced logprobs must match the
decode-time logprobs. This one invariant exercises the ring cache, masks,
RoPE positions, chunked prefill, and the decode loop against each other.

Unlike the reference (which hard-requires CUDA), these run on the CPU backend
with 8 virtual devices (see conftest.py).
"""

import numpy as np
import pytest

from mistral_inference_tpu.args import MoeArgs, TransformerArgs
from mistral_inference_tpu.generate import generate
from mistral_inference_tpu.model import Transformer

import jax.numpy as jnp


def tiny_args(**overrides) -> TransformerArgs:
    kw = dict(
        dim=128,
        n_layers=2,
        head_dim=32,
        hidden_dim=256,
        n_heads=4,
        n_kv_heads=2,
        norm_eps=1e-5,
        vocab_size=512,
        max_batch_size=4,
        rope_theta=10000.0,
    )
    kw.update(overrides)
    return TransformerArgs(**kw)


PROMPTS = [
    [1, 5, 9, 13, 17, 21],
    [2, 6, 10],
    [3, 7, 11, 15, 19, 23, 27, 31, 35],
    [4, 8],
]


def check_decode_prefill_equivalence(model, prompts, max_tokens=7, chunk_size=None, atol=5e-4):
    generated, logprobs = generate(
        prompts, model, max_tokens=max_tokens, temperature=0.0, chunk_size=chunk_size
    )
    assert all(len(g) == max_tokens for g in generated)
    full = [list(p) + g for p, g in zip(prompts, generated)]
    _, logprobs_ref = generate(full, model, max_tokens=0, temperature=0.0)
    for lp, lp_ref in zip(logprobs, logprobs_ref):
        assert len(lp) == len(lp_ref)
        np.testing.assert_allclose(lp, lp_ref, atol=atol, rtol=0)
    return generated, logprobs


def test_generation_transformer():
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    check_decode_prefill_equivalence(model, PROMPTS)


def test_generation_single_row():
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=3)
    check_decode_prefill_equivalence(model, [[7, 3, 5, 2]])


def test_chunks_transformer():
    """Chunked prefill must equal full prefill (reference: test_generate.py:199-230)."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    prompts = [list(range(1, 12)), list(range(2, 9)), list(range(3, 19)), [5, 6]]
    gen_full, lp_full = generate(prompts, model, max_tokens=5, temperature=0.0)
    gen_chunk, lp_chunk = generate(prompts, model, max_tokens=5, temperature=0.0, chunk_size=5)
    assert gen_full == gen_chunk
    for a, b in zip(lp_full, lp_chunk):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=0)


def test_sliding_window():
    """Decode-vs-prefill equivalence with a ring cache smaller than the
    sequence — exercises eviction, slot position recovery, and local masks."""
    model = Transformer.random(tiny_args(sliding_window=4), dtype=jnp.float32, seed=7)
    check_decode_prefill_equivalence(model, PROMPTS, max_tokens=6)


def test_sliding_window_per_layer():
    """Per-layer window list (reference: cache.py:13-24 list form)."""
    model = Transformer.random(
        tiny_args(sliding_window=[3, None]), dtype=jnp.float32, seed=11
    )
    check_decode_prefill_equivalence(model, PROMPTS, max_tokens=6)


def test_sliding_window_chunked():
    model = Transformer.random(tiny_args(sliding_window=4), dtype=jnp.float32, seed=13)
    prompts = [list(range(1, 14)), list(range(2, 10))]
    gen_full, lp_full = generate(prompts, model, max_tokens=4, temperature=0.0)
    gen_chunk, lp_chunk = generate(prompts, model, max_tokens=4, temperature=0.0, chunk_size=5)
    assert gen_full == gen_chunk
    for a, b in zip(lp_full, lp_chunk):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=0)


def test_generation_moe():
    model = Transformer.random(
        tiny_args(moe=MoeArgs(num_experts=4, num_experts_per_tok=2)),
        dtype=jnp.float32,
        seed=42,
    )
    check_decode_prefill_equivalence(model, PROMPTS)


def test_eos_early_exit():
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    generated, _ = generate(PROMPTS, model, max_tokens=5, temperature=0.0)
    eos = generated[0][2]
    generated2, _ = generate(PROMPTS, model, max_tokens=5, temperature=0.0, eos_id=eos)
    # Generation stops strictly earlier only if every row hit eos; at minimum
    # output lengths never exceed the unrestricted run.
    assert all(len(g2) <= len(g1) for g1, g2 in zip(generated2, generated))


def test_sampling_temperature():
    """Temperature sampling must produce valid tokens and stay deterministic
    for a fixed seed."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    g1, lp1 = generate(PROMPTS, model, max_tokens=4, temperature=0.8, seed=123)
    g2, lp2 = generate(PROMPTS, model, max_tokens=4, temperature=0.8, seed=123)
    assert g1 == g2
    g3, _ = generate(PROMPTS, model, max_tokens=4, temperature=0.8, seed=321)
    assert all(0 <= t < model.args.vocab_size for row in g1 for t in row)
    assert g1 != g3 or True  # different seed may coincide; just must not crash


def test_moe_dispatch_equals_dense():
    """Capacity-dispatch MoE (GShard path) must match dense all-experts
    exactly when no assignment exceeds capacity."""
    import dataclasses

    args_dense = tiny_args(moe=MoeArgs(num_experts=4, num_experts_per_tok=2))
    args_disp = dataclasses.replace(
        args_dense, moe_impl="dispatch", moe_capacity_factor=4.0
    )
    dense = Transformer.random(args_dense, dtype=jnp.float32, seed=42)
    disp = Transformer.random(args_disp, dtype=jnp.float32, seed=42)
    gen_d, lp_d = generate(PROMPTS, dense, max_tokens=6, temperature=0.0)
    gen_s, lp_s = generate(PROMPTS, disp, max_tokens=6, temperature=0.0)
    assert gen_d == gen_s
    for a, b in zip(lp_d, lp_s):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=0)


def test_moe_dispatch_equivalence():
    model = Transformer.random(
        tiny_args(
            moe=MoeArgs(num_experts=4, num_experts_per_tok=2),
            moe_impl="dispatch",
            moe_capacity_factor=4.0,
        ),
        dtype=jnp.float32,
        seed=7,
    )
    check_decode_prefill_equivalence(model, PROMPTS)


def test_moe_dispatch_drop_counter(monkeypatch):
    """MISTRAL_MOE_DEBUG streams over-capacity drop counts into METRICS."""
    import jax.numpy as jnp
    import numpy as np

    import mistral_inference_tpu.models.transformer as tf_mod
    from mistral_inference_tpu.models.transformer import _moe_ffn_dispatch
    from mistral_inference_tpu.utils.profiling import METRICS

    monkeypatch.setattr(tf_mod, "_MOE_DEBUG", True)
    rng = np.random.default_rng(0)
    N, D, F, E = 16, 64, 128, 4
    w = {
        "gate": jnp.asarray(rng.standard_normal((D, E)).astype(np.float32)),
        "w1": jnp.asarray(rng.standard_normal((E, D, F)).astype(np.float32) * 0.05),
        "w2": jnp.asarray(rng.standard_normal((E, F, D)).astype(np.float32) * 0.05),
        "w3": jnp.asarray(rng.standard_normal((E, D, F)).astype(np.float32) * 0.05),
    }
    x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    before = METRICS.counters.get("moe_dropped_assignments", 0.0)
    # capacity_factor tiny -> C small -> guaranteed drops
    out = _moe_ffn_dispatch(x, w, top_k=2, capacity_factor=0.25)
    out.block_until_ready()
    assert METRICS.counters.get("moe_dropped_assignments", 0.0) > before


def test_top_p_sortfree_matches_argsort_oracle():
    """top_p_probs/_nucleus_threshold (31-step radix bisection, sort-free)
    against the classic argsort+cumsum formulation it replaced. Exact-equal
    on tie-free inputs for scalar and per-row traced p; on an exact tie
    that straddles the nucleus edge the sort-free rule keeps the whole tie
    group (documented departure)."""
    import jax

    from mistral_inference_tpu.generate import _p_col, top_p_probs

    def oracle(probs, p):
        order = jnp.argsort(-probs, axis=-1)
        ps = jnp.take_along_axis(probs, order, axis=-1)
        cum = jnp.cumsum(ps, axis=-1)
        ps = jnp.where(cum - ps > _p_col(p, probs), 0.0, ps)
        inv = jnp.argsort(order, axis=-1)
        filt = jnp.take_along_axis(ps, inv, axis=-1)
        return filt / jnp.sum(filt, axis=-1, keepdims=True)

    rng = np.random.default_rng(7)
    for shape in ((4, 512), (2, 3, 257)):
        logits = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 3
        probs = jax.nn.softmax(logits, axis=-1)
        for p in (0.0, 0.2, 0.8, 0.97):
            a = np.asarray(top_p_probs(probs, p))
            b = np.asarray(oracle(probs, p))
            np.testing.assert_array_equal(a > 0, b > 0)
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
        # p = 1.0 sits exactly at the total-mass crossing, where the two
        # implementations' fp summation orders may disagree about tokens
        # of ~1e-7 mass: require the kept mass and the distribution to
        # agree, not the exact boundary support.
        a = np.asarray(top_p_probs(probs, 1.0))
        pr = np.asarray(probs)
        assert pr[a == 0].sum() < 1e-5
        np.testing.assert_allclose(a[a > 0], pr[a > 0], rtol=1e-4, atol=1e-7)
    # per-row traced p over a (B,) vector
    probs = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((5, 401)).astype(np.float32)) * 2, -1
    )
    pv = jnp.asarray([0.05, 0.3, 0.6, 0.9, 1.0], jnp.float32)
    a = np.asarray(top_p_probs(probs, pv))
    b = np.asarray(oracle(probs, pv))
    np.testing.assert_array_equal(a > 0, b > 0)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    # tiny p keeps exactly the argmax
    a = np.asarray(top_p_probs(probs, 1e-6))
    assert (np.count_nonzero(a, axis=-1) == 1).all()
    assert (np.argmax(a, -1) == np.argmax(np.asarray(probs), -1)).all()
    # exact tie at the boundary: [0.4, 0.3, 0.3] with p=0.5 — sorted-prefix
    # keeps 0.4 + one 0.3; the threshold rule keeps the whole 0.3 tie group
    t = np.asarray(top_p_probs(jnp.asarray([[0.4, 0.3, 0.3]]), 0.5))[0]
    assert np.count_nonzero(t) == 3 and abs(t.sum() - 1.0) < 1e-6


def test_sample_top_p_sortfree_distribution():
    """sample_top_p draws land only inside the nucleus, and a tiny p is
    deterministic argmax (the serving engines' top_p->0 greedy contract)."""
    import jax

    from mistral_inference_tpu.generate import sample_top_p, top_p_probs

    rng = np.random.default_rng(3)
    probs = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((6, 128)).astype(np.float32)) * 2, -1
    )
    support = np.asarray(top_p_probs(probs, 0.7)) > 0
    for seed in range(20):
        toks = np.asarray(sample_top_p(probs, 0.7, jax.random.PRNGKey(seed)))
        assert support[np.arange(6), toks].all()
    toks = np.asarray(sample_top_p(probs, 1e-6, jax.random.PRNGKey(0)))
    assert (toks == np.argmax(np.asarray(probs), -1)).all()
