"""Fused verify-chunk kernel vs the two-op oracle.

The kernel (ops/pallas/attention.fused_verify_chunk_attention) writes ALL
T candidate K/V tokens into consecutive ring slots and attends each query
token ring-only (causality = position arithmetic). It must equal
cache.update_stacked over the full T-token chunk followed by XLA ring-only
attention with the sliding-window mask — ring side effects (values AND
scales) and attention output — across ring dtypes, fill levels, and dead
rows. Same contract family as tests/test_fused_decode.py, plus the
speculative-specific parts: T > 1 queries, slot windows near the ring's
end, and the non-wrapping-ring precondition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mistral_inference_tpu.cache import (
    kv_cache_dtype,
    _quantize_ring,
    slot_positions,
    update_stacked,
)
from mistral_inference_tpu.ops.attention import (
    attend,
    attend_scaled,
    sliding_window_mask,
)
from mistral_inference_tpu.ops.pallas.attention import (
    fused_verify_chunk_attention,
)


def _setup(kv_quant, rng, L, B, T, S, Hkv, H, D):
    rdt = kv_cache_dtype(kv_quant, jnp.float32)
    kf = jnp.asarray(rng.standard_normal((L, B, S, Hkv, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((L, B, S, Hkv, D)), jnp.float32)
    if kv_quant == "bf16":
        CK = kf.reshape(L, B, S, Hkv * D)
        CV = vf.reshape(L, B, S, Hkv * D)
        KS = VS = jnp.ones((L, 0, 0, 0), jnp.float32)
    else:
        CKq, KSs = _quantize_ring(kf, rdt)
        CVq, VSs = _quantize_ring(vf, rdt)
        CK = CKq.reshape(L, B, S, Hkv * D)
        CV = CVq.reshape(L, B, S, Hkv * D)
        KS = jnp.moveaxis(KSs, 2, 3)  # (L, B, Hkv, S)
        VS = jnp.moveaxis(VSs, 2, 3)
    xq = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    xk = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    xv = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    return CK, CV, KS, VS, xq, xk, xv


def _run_case(kv_quant, kv_len, live, L=2, B=4, T=5, S=256, Hkv=2, H=4,
              D=128, window=None, li=0):
    """Oracle = update_stacked (all T tokens of live rows) + XLA ring-only
    attention at the post-write fill; the non-wrap precondition holds
    (kv_len + T <= window <= S)."""
    rng = np.random.default_rng(11)
    window = jnp.int32(S if window is None else window)
    li = jnp.int32(li)
    kv_len = jnp.asarray(kv_len, jnp.int32)
    live = jnp.asarray(live, jnp.int32)
    CK, CV, KS, VS, xq, xk, xv = _setup(kv_quant, rng, L, B, T, S, Hkv, H, D)

    seqlens = jnp.where(live > 0, T, 0)
    positions = kv_len[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    token_valid = jnp.arange(T, dtype=jnp.int32)[None, :] < seqlens[:, None]
    new_total = kv_len + seqlens

    CK2, CV2, KS2, VS2 = update_stacked(
        CK, CV, KS, VS, li, xk, xv, positions, token_valid, new_total, window
    )
    slot_pos, slot_valid = slot_positions(new_total, window, S)
    mask = sliding_window_mask(positions, slot_pos, token_valid, slot_valid, window)
    if kv_quant == "bf16":
        ref = attend(
            xq, CK2[li].reshape(B, S, Hkv, D), CV2[li].reshape(B, S, Hkv, D),
            mask,
        )
    else:
        ref = attend_scaled(
            xq,
            CK2[li].reshape(B, S, Hkv, D),
            CV2[li].reshape(B, S, Hkv, D),
            jnp.moveaxis(KS2[li], 1, 2),
            jnp.moveaxis(VS2[li], 1, 2),
            mask,
        )

    write_slot0 = jnp.where(live > 0, positions[:, 0] % window, -1)
    out, CK3, CV3, KS3, VS3 = fused_verify_chunk_attention(
        xq, xk, xv, CK, CV,
        KS if kv_quant != "bf16" else None,
        VS if kv_quant != "bf16" else None,
        li, window, write_slot0, positions, slot_pos, slot_valid,
        interpret=True,
    )

    assert jnp.array_equal(CK2, CK3), "ring K values must match exactly"
    assert jnp.array_equal(CV2, CV3)
    if kv_quant != "bf16":
        np.testing.assert_allclose(np.asarray(KS2), np.asarray(KS3), rtol=2e-7)
        np.testing.assert_allclose(np.asarray(VS2), np.asarray(VS3), rtol=2e-7)
    live_rows = np.asarray(live) > 0
    np.testing.assert_allclose(
        np.asarray(out)[live_rows],
        np.asarray(ref).reshape(B, T, H * D)[live_rows],
        atol=3e-5, rtol=3e-5,
    )


@pytest.mark.parametrize("kv_quant", ["int8", "fp8", "bf16"])
def test_fused_verify_matches_two_op_oracle(kv_quant):
    # fills: empty, mid, near-end (slot window clamps at S-16), dead row
    _run_case(kv_quant, kv_len=[0, 100, 251, 40], live=[1, 1, 1, 0])


def test_fused_verify_group_straddle_and_li():
    # slots straddling an 8-slot group boundary and a 128-lane scale group,
    # on a non-zero layer of the stack
    _run_case("int8", kv_len=[6, 126, 127, 250], live=[1, 1, 1, 1], li=1)


def test_fused_verify_multi_tile_t8():
    # T = 8 (max), several S tiles, small window (< S) still non-wrapping
    import mistral_inference_tpu.ops.pallas.attention as pa

    old_bs, old_rb = pa._FUSED_BS, pa._FUSED_RB
    pa._FUSED_BS, pa._FUSED_RB = 256, 2
    try:
        _run_case("int8", kv_len=[0, 300, 631, 200], live=[1, 1, 1, 1],
                  T=8, S=640, window=640)
    finally:
        pa._FUSED_BS, pa._FUSED_RB = old_bs, old_rb


def test_fused_verify_t1_matches_decode_semantics():
    # degenerate T = 1: the verify kernel must agree with the oracle the
    # same way fused_update_decode_attention does
    _run_case("fp8", kv_len=[0, 17, 255, 128], live=[1, 1, 1, 1], T=1)
