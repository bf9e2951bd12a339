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
