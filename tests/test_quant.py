"""Quantization tests: INT8/INT4 weight-only + FP8 KV cache.

Quality gate mirrors BASELINE.md: quantized logprobs must track the fp
model closely (tiny models quantize *harder* than 7B-scale ones relative to
their logit gaps, so tolerances here are the smoke-level check; Δppl gates
run in benchmarks on real checkpoints)."""

import jax
import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.generate import generate
from mistral_inference_tpu.model import Transformer
from mistral_inference_tpu.ops.linear import dequant, linear, quantize_weight

from test_generate import PROMPTS, check_decode_prefill_equivalence, tiny_args


def test_quantize_roundtrip_int8():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((2, 64, 32)).astype(np.float32) * 0.1)
    q = quantize_weight(w, bits=8, group=16)
    assert q["q"].dtype == jnp.int8 and q["q"].shape == (2, 64, 32)
    assert q["scale"].shape == (2, 4, 32)
    err = np.abs(np.asarray(dequant(q, jnp.float32)) - np.asarray(w))
    # max error ≤ scale/2 per group
    assert err.max() <= np.asarray(q["scale"]).max() * 0.51


def test_quantize_roundtrip_int4():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    q = quantize_weight(w, bits=4, group=32)
    assert q["q4"].shape == (32, 32)  # packed pairs
    deq = np.asarray(dequant(q, jnp.float32))
    assert np.abs(deq - np.asarray(w)).max() <= np.asarray(q["scale"]).max() * 0.51
    # int4 grid has 15 levels: dequantized values per group-column are coarse
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    y = linear(x, q)
    assert y.shape == (4, 32)
    rel = np.linalg.norm(np.asarray(y) - np.asarray(x @ w)) / np.linalg.norm(
        np.asarray(x @ w)
    )
    assert rel < 0.1


def test_int8_generation_quality():
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    _, lp_ref = generate(PROMPTS, model, max_tokens=0, temperature=0.0)
    model.quantize("int8", group=32)
    _, lp_q = generate(PROMPTS, model, max_tokens=0, temperature=0.0)
    for a, b in zip(lp_ref, lp_q):
        np.testing.assert_allclose(a, b, atol=0.15, rtol=0)


def test_int8_decode_prefill_equivalence():
    """The core cache/mask invariant must survive quantized weights."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    model.quantize("int8", group=32)
    check_decode_prefill_equivalence(model, PROMPTS)


def test_int4_runs():
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    model.quantize("int4", group=32)
    gen, lp = generate(PROMPTS, model, max_tokens=5, temperature=0.0)
    assert all(len(g) == 5 for g in gen)
    assert all(np.isfinite(l).all() for l in lp)


def test_fp8_kv_cache_equivalence():
    """FP8 ring cache: decode-vs-prefill must still agree (both paths
    quantize identically), and track the bf16-cache model closely."""
    args = tiny_args(kv_quant="fp8")
    model = Transformer.random(args, dtype=jnp.float32, seed=42)
    check_decode_prefill_equivalence(model, PROMPTS, atol=2e-3)

    ref = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    _, lp_ref = generate(PROMPTS, ref, max_tokens=0, temperature=0.0)
    _, lp_fp8 = generate(PROMPTS, model, max_tokens=0, temperature=0.0)
    for a, b in zip(lp_ref, lp_fp8):
        np.testing.assert_allclose(a, b, atol=0.05, rtol=0)


def test_fp8_kv_sliding_window():
    model = Transformer.random(
        tiny_args(kv_quant="fp8", sliding_window=4), dtype=jnp.float32, seed=7
    )
    check_decode_prefill_equivalence(model, PROMPTS, max_tokens=6, atol=2e-3)


def test_int8_fp8_combined():
    model = Transformer.random(tiny_args(kv_quant="fp8"), dtype=jnp.float32, seed=42)
    model.quantize("int8", group=32)
    check_decode_prefill_equivalence(model, PROMPTS, atol=2e-3)


def test_int8_kv_cache_equivalence():
    """INT8 ring cache (the v5e fast scaled ring — native int->float
    converts, unlike the VPU-emulated fp8 casts): decode-vs-prefill must
    agree exactly like fp8, and track the bf16-cache model closely."""
    args = tiny_args(kv_quant="int8")
    model = Transformer.random(args, dtype=jnp.float32, seed=42)
    check_decode_prefill_equivalence(model, PROMPTS, atol=2e-3)

    ref = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    _, lp_ref = generate(PROMPTS, ref, max_tokens=0, temperature=0.0)
    _, lp_i8 = generate(PROMPTS, model, max_tokens=0, temperature=0.0)
    for a, b in zip(lp_ref, lp_i8):
        np.testing.assert_allclose(a, b, atol=0.05, rtol=0)


def test_int8_kv_sliding_window():
    model = Transformer.random(
        tiny_args(kv_quant="int8", sliding_window=4), dtype=jnp.float32, seed=7
    )
    check_decode_prefill_equivalence(model, PROMPTS, max_tokens=6, atol=2e-3)


def test_int4_weights_int8_kv_combined():
    model = Transformer.random(tiny_args(kv_quant="int8"), dtype=jnp.float32, seed=42)
    model.quantize("int4", group=32)
    check_decode_prefill_equivalence(model, PROMPTS, atol=2e-3)


def test_requantize_raises():
    """quantize() on an already-quantized model must fail loud for BOTH
    families (silent relabeling int8->'int4' and the dict.shape crash were
    code-review findings)."""
    import pytest

    from test_generate import tiny_args
    from test_mamba import tiny_mamba_args

    from mistral_inference_tpu.model import Mamba, Transformer

    t = Transformer.random(tiny_args(), dtype=jnp.float32, seed=0).quantize("int8")
    with pytest.raises(AssertionError, match="already quantized"):
        t.quantize("int4")

    m = Mamba.random(tiny_mamba_args(), dtype=jnp.float32, seed=0).quantize("int8")
    with pytest.raises(AssertionError, match="already quantized"):
        m.quantize("int4")


def test_linear_fused_matches_separate(monkeypatch):
    """ops/linear.linear_fused (wide-N concatenated GEMM on the prefill
    hbm-dequant path) against per-weight linear(): same math, split
    outputs. Forced active via MISTRAL_PREFILL_DEQUANT=hbm +
    MISTRAL_PALLAS_INTERPRET (rows > DECODE_ROWS_MAX)."""
    import numpy as np

    from mistral_inference_tpu.ops.linear import (
        linear,
        linear_fused,
        quantize_weight,
    )

    monkeypatch.setenv("MISTRAL_PREFILL_DEQUANT", "hbm")
    monkeypatch.setenv("MISTRAL_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(0)
    M, K = 512, 256
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    ws = [
        quantize_weight(
            jnp.asarray(rng.standard_normal((K, N)).astype(np.float32)),
            bits, 64,
        )
        for N, bits in ((256, 4), (64, 8), (64, 4))
    ]
    ws.append(jnp.asarray(rng.standard_normal((K, 128)).astype(np.float32)))
    fused = linear_fused(x, ws)
    assert len(fused) == 4
    for f, w in zip(fused, ws):
        sep = linear(x, w)
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(sep), rtol=1e-5, atol=1e-5
        )
    # (B, T, K) input keeps leading shape
    x3 = x.reshape(2, 256, K)
    f3 = linear_fused(x3, ws[:2])
    assert f3[0].shape == (2, 256, 256) and f3[1].shape == (2, 256, 64)
