"""Fused Mamba-2 SSD decode-step kernel (ops/pallas/ssd_step.py) vs the
chunked-SSD XLA oracle (models/mamba._ssd_chunked at T=1) — the op the
reference outsources to mamba_ssm's selective_state_update CUDA kernel
(reference: mamba.py:71-86)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mistral_inference_tpu.models.mamba import _ssd_chunked
from mistral_inference_tpu.ops.pallas.ssd_step import (
    fused_ssd_step,
    fused_ssd_step_stacked,
)

L, B, NH, HD, DS, NG = 3, 2, 8, 16, 32, 4


def _case(seed=0, dead_row=None):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, 1, NH, HD)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.1, 1.0, (B, 1, NH)), jnp.float32)
    if dead_row is not None:
        dt = dt.at[dead_row].set(0.0)  # invalid tokens arrive with Δ=0
    A = -jnp.asarray(rng.uniform(0.5, 2.0, (NH,)), jnp.float32)
    Bm = jnp.asarray(rng.normal(size=(B, 1, NG, DS)), jnp.float32)
    Cm = jnp.asarray(rng.normal(size=(B, 1, NG, DS)), jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(B, NH, HD, DS)), jnp.float32)
    a = jnp.exp(dt[:, 0] * A[None, :])
    dtx = dt[:, 0, :, None] * x[:, 0]
    return x, dt, A, Bm, Cm, h0, a, dtx


def test_fused_step_matches_chunked_oracle():
    x, dt, A, Bm, Cm, h0, a, dtx = _case()
    y_ref, h_ref = _ssd_chunked(x, dt, A, Bm, Cm, h0, 1)
    y, h = fused_ssd_step(a, dtx, Bm[:, 0], Cm[:, 0], h0, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref[:, 0]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               atol=1e-6, rtol=1e-6)


def test_fused_step_bf16_state_rounds_at_store_only():
    """bf16-stored state computes in fp32 and rounds once at the store —
    the same contract as the XLA path's astype pair."""
    x, dt, A, Bm, Cm, h0, a, dtx = _case()
    h0b = h0.astype(jnp.bfloat16)
    y_ref, h_ref = _ssd_chunked(x, dt, A, Bm, Cm,
                                h0b.astype(jnp.float32), 1)
    y, h = fused_ssd_step(a, dtx, Bm[:, 0], Cm[:, 0], h0b, interpret=True)
    assert h.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(h.astype(jnp.float32)),
                               np.asarray(h_ref.astype(jnp.bfloat16)
                                          .astype(jnp.float32)),
                               atol=0, rtol=0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref[:, 0]),
                               atol=1e-5, rtol=1e-5)


def test_fused_step_dead_slot_state_bit_unchanged():
    """Δ=0 rows (dead serving slots) must leave the state BIT-identical:
    exp(0)=1 multiply + 0 add (engine contract, server/mamba_engine.py)."""
    x, dt, A, Bm, Cm, h0, a, dtx = _case(dead_row=1)
    y, h = fused_ssd_step(a, dtx, Bm[:, 0], Cm[:, 0], h0, interpret=True)
    assert bool((np.asarray(h[1]) == np.asarray(h0[1])).all())


def test_stacked_updates_only_li_in_place():
    x, dt, A, Bm, Cm, h0, a, dtx = _case()
    ssm = jnp.stack([h0 + i for i in range(L)])
    keep = np.asarray(ssm).copy()
    li = 1
    y_ref, h_ref = _ssd_chunked(x, dt, A, Bm, Cm, ssm[li], 1)
    y, ssm2 = fused_ssd_step_stacked(
        a, dtx, Bm[:, 0], Cm[:, 0], ssm, jnp.int32(li), interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref[:, 0]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ssm2[li]), np.asarray(h_ref),
                               atol=1e-6, rtol=1e-6)
    for other in (0, 2):
        assert bool((np.asarray(ssm2[other]) == keep[other]).all())


@pytest.mark.parametrize("ssm_dtype", [jnp.float32, jnp.bfloat16])
def test_forward_fused_decode_equals_xla_path(monkeypatch, ssm_dtype):
    """Full-model decode step: cfg.pallas (fused stacked kernel, interpret)
    must match the scan-xs chunked path — logits, SSM state, conv taps."""
    monkeypatch.setenv("MISTRAL_PALLAS_INTERPRET", "1")
    from mistral_inference_tpu.args import MambaArgs
    from mistral_inference_tpu.models import mamba as mm

    args = MambaArgs(
        dim=64, n_layers=3, vocab_size=97, n_groups=2, rms_norm=True,
        residual_in_fp32=True, fused_add_norm=True,
        pad_vocab_size_multiple=16, tie_embeddings=False,
    )
    cfg0 = mm.MambaStaticConfig.from_args(args, pallas=False)
    cfg1 = mm.MambaStaticConfig.from_args(args, pallas=True)
    params = mm.init_mamba_params(jax.random.PRNGKey(0), args, jnp.float32)
    Bsz = 2
    state0 = mm.MambaState.alloc(cfg0, Bsz, jnp.float32, ssm_dtype=ssm_dtype)
    rng = np.random.default_rng(0)
    ptoks = jnp.asarray(rng.integers(0, 97, (Bsz, 6)), jnp.int32)
    _, state_p = mm.forward(
        params, ptoks, jnp.full((Bsz,), 6, jnp.int32), state0, cfg0, chunk=4
    )
    tok = jnp.asarray([[5], [7]], jnp.int32)
    live = jnp.asarray([1, 0], jnp.int32)  # row 1 is a dead slot
    copy = lambda s: jax.tree.map(lambda x: x.copy(), s)  # noqa: E731
    lg0, st0 = mm.forward(params, tok, live, copy(state_p), cfg0, chunk=1)
    lg1, st1 = mm.forward(params, tok, live, copy(state_p), cfg1, chunk=1)
    np.testing.assert_allclose(np.asarray(lg0), np.asarray(lg1), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(st0.ssm, np.float32), np.asarray(st1.ssm, np.float32),
        atol=2e-6,
    )
    np.testing.assert_allclose(np.asarray(st0.conv_x), np.asarray(st1.conv_x),
                               atol=2e-5)
    # dead slot: state bit-unchanged on the fused path
    assert bool((np.asarray(st1.ssm[:, 1]) == np.asarray(state_p.ssm[:, 1])).all())
