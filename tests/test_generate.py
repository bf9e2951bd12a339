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
