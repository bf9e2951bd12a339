"""Fused update+attend decode kernel vs the two-op oracle.

The kernel (ops/pallas/attention.fused_update_decode_attention) must equal
cache.update_stacked followed by XLA ring-only attention — both the ring
side effects (values AND scales) and the attention output — across ring
dtypes, fill levels (empty / partial / wrapped), dead slots, and window <
buffer. Scales may differ by 1 fp32 ulp (Mosaic vs XLA division); ring
VALUES must be exact.
"""

import jax

import jax.numpy as jnp
import numpy as np
import pytest

from mistral_inference_tpu.cache import (
    _quantize_ring,
    kv_cache_dtype,
    slot_positions,
    update_stacked,
)
from mistral_inference_tpu.ops.attention import attend, attend_scaled, sliding_window_mask
from mistral_inference_tpu.ops.pallas.attention import (
    fused_update_decode_attention,
)


def _setup(kv_quant, rng, L=3, B=4, S=256, Hkv=2, H=4, D=128):
    rdt = kv_cache_dtype(kv_quant, jnp.float32)
    kf = jnp.asarray(rng.standard_normal((L, B, S, Hkv, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((L, B, S, Hkv, D)), jnp.float32)
    if kv_quant == "bf16":
        CK = kf.astype(jnp.float32).reshape(L, B, S, Hkv * D)
        CV = vf.astype(jnp.float32).reshape(L, B, S, Hkv * D)
        KS = VS = jnp.ones((L, 0, 0, 0), jnp.float32)
    else:
        CKq, KSs = _quantize_ring(kf, rdt)
        CVq, VSs = _quantize_ring(vf, rdt)
        CK = CKq.reshape(L, B, S, Hkv * D)
        CV = CVq.reshape(L, B, S, Hkv * D)
        KS = jnp.moveaxis(KSs, 2, 3)  # (L, B, Hkv, S)
        VS = jnp.moveaxis(VSs, 2, 3)
    xq = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    xk = jnp.asarray(rng.standard_normal((B, 1, Hkv, D)), jnp.float32)
    xv = jnp.asarray(rng.standard_normal((B, 1, Hkv, D)), jnp.float32)
    return CK, CV, KS, VS, xq, xk, xv


@pytest.mark.parametrize("kv_quant", ["int8", "fp8", "bf16"])
def test_fused_decode_matches_two_op_oracle(kv_quant):
    rng = np.random.default_rng(7)
    L, B, S, Hkv, H, D = 3, 4, 256, 2, 4, 128
    li = jnp.int32(1)
    window = jnp.int32(200)  # < S: exercises buffer padding slots
    kv_len = jnp.asarray([5, 199, 230, 0], jnp.int32)  # near-full, wrapped, empty
    live = jnp.asarray([1, 1, 1, 0], jnp.int32)  # one dead slot

    CK, CV, KS, VS, xq, xk, xv = _setup(kv_quant, rng, L, B, S, Hkv, H, D)
    positions = kv_len[:, None]
    token_valid = live[:, None] > 0
    new_total = kv_len + live

    CK2, CV2, KS2, VS2 = update_stacked(
        CK, CV, KS, VS, li, xk, xv, positions, token_valid, new_total, window
    )
    slot_pos, slot_valid = slot_positions(new_total, window, S)
    mask = sliding_window_mask(positions, slot_pos, token_valid, slot_valid, window)
    if kv_quant == "bf16":
        ref = attend(
            xq, CK2[li].reshape(B, S, Hkv, D), CV2[li].reshape(B, S, Hkv, D), mask
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

    slots = positions[:, 0] % window
    should = token_valid[:, 0] & (positions[:, 0] >= new_total - window)
    write_slot = jnp.where(should, slots, -1)
    out, CK3, CV3, KS3, VS3 = fused_update_decode_attention(
        xq, xk, xv, CK, CV,
        KS if kv_quant != "bf16" else None,
        VS if kv_quant != "bf16" else None,
        li, window, write_slot, positions[:, 0], slot_pos, slot_valid,
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
        np.asarray(ref)[live_rows],
        atol=3e-5, rtol=3e-5,
    )


def test_fused_decode_multi_tile():
    """S spanning several manual-DMA tiles (tail tile smaller than BS),
    multi-row-block grid."""
    import mistral_inference_tpu.ops.pallas.attention as pa

    rng = np.random.default_rng(3)
    L, B, S, Hkv, H, D = 2, 4, 640, 2, 4, 128
    old_bs, old_rb = pa._FUSED_BS, pa._FUSED_RB
    pa._FUSED_BS, pa._FUSED_RB = 256, 2
    try:
        li = jnp.int32(0)
        window = jnp.int32(640)
        kv_len = jnp.asarray([640, 300, 17, 639], jnp.int32)
        live = jnp.ones((B,), jnp.int32)
        CK, CV, KS, VS, xq, xk, xv = _setup("int8", rng, L, B, S, Hkv, H, D)
        positions = kv_len[:, None]
        token_valid = live[:, None] > 0
        new_total = kv_len + live
        CK2, CV2, KS2, VS2 = update_stacked(
            CK, CV, KS, VS, li, xk, xv, positions, token_valid, new_total, window
        )
        slot_pos, slot_valid = slot_positions(new_total, window, S)
        mask = sliding_window_mask(
            positions, slot_pos, token_valid, slot_valid, window
        )
        ref = attend_scaled(
            xq, CK2[li].reshape(B, S, Hkv, D), CV2[li].reshape(B, S, Hkv, D),
            jnp.moveaxis(KS2[li], 1, 2), jnp.moveaxis(VS2[li], 1, 2), mask,
        )
        slots = positions[:, 0] % window
        should = token_valid[:, 0] & (positions[:, 0] >= new_total - window)
        write_slot = jnp.where(should, slots, -1)
        out, CK3, CV3, KS3, VS3 = fused_update_decode_attention(
            xq, xk, xv, CK, CV, KS, VS, li, window, write_slot,
            positions[:, 0], slot_pos, slot_valid, interpret=True,
        )
        assert jnp.array_equal(CK2, CK3) and jnp.array_equal(CV2, CV3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)
    finally:
        pa._FUSED_BS, pa._FUSED_RB = old_bs, old_rb


@pytest.mark.parametrize("kv_quant", ["int8", "bf16"])
def test_fused_decode_tile_skip(kv_quant, monkeypatch):
    """Live-fill tile skipping (r4): with BS < S the kernel must skip
    S-tiles past min(max(new_total), window) — no DMA, no compute — and
    still equal the two-op oracle exactly. Covers: all rows short (last
    tiles skipped), and a wrapped row forcing the full ring."""
    import mistral_inference_tpu.ops.pallas.attention as pattn

    monkeypatch.setattr(pattn, "_FUSED_BS", 128)
    rng = np.random.default_rng(11)
    L, B, S, Hkv, H, D = 2, 4, 384, 2, 4, 128
    li = jnp.int32(0)
    window = jnp.int32(384)
    for kv_len_v in ([3, 60, 100, 17], [3, 60, 370, 17]):
        kv_len = jnp.asarray(kv_len_v, jnp.int32)
        live = jnp.asarray([1, 1, 1, 1], jnp.int32)

        CK, CV, KS, VS, xq, xk, xv = _setup(kv_quant, rng, L, B, S, Hkv, H, D)
        positions = kv_len[:, None]
        token_valid = live[:, None] > 0
        new_total = kv_len + live

        CK2, CV2, KS2, VS2 = update_stacked(
            CK, CV, KS, VS, li, xk, xv, positions, token_valid, new_total,
            window,
        )
        slot_pos, slot_valid = slot_positions(new_total, window, S)
        mask = sliding_window_mask(
            positions, slot_pos, token_valid, slot_valid, window
        )
        if kv_quant == "bf16":
            ref = attend(
                xq, CK2[li].reshape(B, S, Hkv, D),
                CV2[li].reshape(B, S, Hkv, D), mask,
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

        slots = positions[:, 0] % window
        should = token_valid[:, 0] & (positions[:, 0] >= new_total - window)
        write_slot = jnp.where(should, slots, -1)
        out, CK3, CV3, KS3, VS3 = fused_update_decode_attention(
            xq, xk, xv, CK, CV,
            KS if kv_quant != "bf16" else None,
            VS if kv_quant != "bf16" else None,
            li, window, write_slot, positions[:, 0], slot_pos, slot_valid,
            interpret=True,
        )
        assert jnp.array_equal(CK2, CK3)
        assert jnp.array_equal(CV2, CV3)
        np.testing.assert_allclose(
            np.asarray(out).reshape(B, H, D),
            np.asarray(ref).reshape(B, H, D),
            atol=2e-5, rtol=1e-5,
        )
