"""Mamba2 tests.

Invariants:
  1. Decode-vs-prefill equivalence — the recurrent single-token path must
     reproduce the chunked-SSD prefill exactly (mirrors the transformer
     suite's core invariant; reference golden-token test is
     test_generate.py:174-196).
  2. Chunked SSD == naive per-token recurrence (numpy oracle).
  3. Chunked prefill (several chunk sizes) == full prefill.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.args import MambaArgs
from mistral_inference_tpu.generate import generate_mamba
from mistral_inference_tpu.model import Mamba
from mistral_inference_tpu.models.mamba import (
    MambaState,
    MambaStaticConfig,
    _ssd_chunked,
    forward,
    init_mamba_params,
)


def tiny_mamba_args(**over) -> MambaArgs:
    kw = dict(
        dim=64,
        n_layers=2,
        vocab_size=256,
        n_groups=2,
        rms_norm=True,
        residual_in_fp32=True,
        fused_add_norm=True,
        pad_vocab_size_multiple=16,
        tie_embeddings=False,
        d_state=16,
        d_conv=4,
        expand=2,
        headdim=16,
    )
    kw.update(over)
    return MambaArgs(**kw)


PROMPTS = [
    [1, 5, 9, 13, 17, 21],
    [2, 6, 10],
    [3, 7, 11, 15, 19, 23, 27, 31, 35],
    [4, 8],
]


def test_ssd_vs_naive_recurrence():
    """Chunked SSD must equal the literal h_t = exp(ΔA)h + ΔB⊗x recurrence."""
    rng = np.random.default_rng(0)
    B, T, nh, hd, ng, ds = 2, 13, 4, 8, 2, 16
    x = rng.standard_normal((B, T, nh, hd)).astype(np.float32)
    dt = np.abs(rng.standard_normal((B, T, nh))).astype(np.float32) * 0.5
    A = -np.abs(rng.standard_normal(nh)).astype(np.float32)
    Bm = rng.standard_normal((B, T, ng, ds)).astype(np.float32)
    Cm = rng.standard_normal((B, T, ng, ds)).astype(np.float32)
    h0 = rng.standard_normal((B, nh, hd, ds)).astype(np.float32) * 0.1

    # naive oracle
    rep = nh // ng
    y_ref = np.zeros_like(x)
    h = h0.copy()
    for t in range(T):
        for head in range(nh):
            g = head // rep
            a = np.exp(dt[:, t, head] * A[head])  # (B,)
            upd = (
                dt[:, t, head, None, None]
                * np.einsum("bp,bd->bpd", x[:, t, head], Bm[:, t, g])
            )
            h[:, head] = a[:, None, None] * h[:, head] + upd
            y_ref[:, t, head] = np.einsum("bpd,bd->bp", h[:, head], Cm[:, t, g])

    for chunk in (4, 5, 16):
        y, h_fin = _ssd_chunked(
            jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A), jnp.asarray(Bm),
            jnp.asarray(Cm), jnp.asarray(h0), chunk,
        )
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(h_fin), h, atol=1e-4, rtol=1e-4)


def test_mamba_decode_prefill_equivalence():
    model = Mamba.random(tiny_mamba_args(), dtype=jnp.float32, seed=42)
    generated, logprobs = generate_mamba(
        PROMPTS, model, max_tokens=7, temperature=0.0
    )
    assert all(len(g) == 7 for g in generated)
    full = [list(p) + g for p, g in zip(PROMPTS, generated)]
    _, logprobs_ref = generate_mamba(full, model, max_tokens=0, temperature=0.0)
    for lp, lp_ref in zip(logprobs, logprobs_ref):
        assert len(lp) == len(lp_ref)
        np.testing.assert_allclose(lp, lp_ref, atol=5e-4, rtol=0)


def test_mamba_chunked_prefill():
    model = Mamba.random(tiny_mamba_args(), dtype=jnp.float32, seed=7)
    prompts = [list(range(1, 15)), list(range(2, 10))]
    g_full, lp_full = generate_mamba(prompts, model, max_tokens=4, temperature=0.0)
    g_chunk, lp_chunk = generate_mamba(
        prompts, model, max_tokens=4, temperature=0.0, chunk_size=5
    )
    assert g_full == g_chunk
    for a, b in zip(lp_full, lp_chunk):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=0)


def test_mamba_tied_embeddings():
    model = Mamba.random(tiny_mamba_args(tie_embeddings=True), dtype=jnp.float32)
    assert "lm_head" not in model.params
    g, lp = generate_mamba([[1, 2, 3, 4]], model, max_tokens=3, temperature=0.0)
    assert len(g[0]) == 3 and np.isfinite(lp[0]).all()


def test_mamba_vocab_padding():
    """padded_vocab_size > vocab_size: logits must be cut to vocab_size."""
    args = tiny_mamba_args(vocab_size=250, pad_vocab_size_multiple=64)
    assert args.padded_vocab_size == 256
    model = Mamba.random(args, dtype=jnp.float32)
    state = model.alloc_state(1)
    logits, _ = forward(
        model.params, jnp.asarray([[1, 2, 3]]), jnp.asarray([3]), state, model.cfg
    )
    assert logits.shape == (1, 3, 250)


def test_mamba_eos():
    model = Mamba.random(tiny_mamba_args(), dtype=jnp.float32, seed=42)
    g1, _ = generate_mamba(PROMPTS, model, max_tokens=5, temperature=0.0)
    eos = g1[0][1]
    g2, _ = generate_mamba(PROMPTS, model, max_tokens=5, temperature=0.0, eos_id=eos)
    assert all(len(b) <= len(a) for a, b in zip(g1, g2))


def test_mamba_data_parallel_mesh():
    """DP-sharded mamba must match single-device outputs exactly."""
    from mistral_inference_tpu.parallel.mesh import make_mesh

    args = tiny_mamba_args()
    ref = Mamba.random(args, dtype=jnp.float32, seed=42)
    shd = Mamba.random(args, dtype=jnp.float32, seed=42, mesh=make_mesh(data=2))
    g_ref, lp_ref = generate_mamba(PROMPTS, ref, max_tokens=5, temperature=0.0)
    g_shd, lp_shd = generate_mamba(PROMPTS, shd, max_tokens=5, temperature=0.0)
    assert g_ref == g_shd
    for a, b in zip(lp_ref, lp_shd):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=0)
