"""Ring-cache internals: slot arithmetic and eviction dedup (unit level;
the generate suites cover them end-to-end)."""

import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.cache import KVCache, slot_positions, update_layer


def test_slot_positions_partial_fill():
    pos, valid = slot_positions(jnp.asarray([3]), jnp.int32(8), 8)
    np.testing.assert_array_equal(np.asarray(pos[0, :3]), [0, 1, 2])
    assert not np.asarray(valid)[0, 3:].any()


def test_slot_positions_wrapped():
    """After 11 tokens in a window of 4, slots hold positions 8..10 and 7."""
    pos, valid = slot_positions(jnp.asarray([11]), jnp.int32(4), 4)
    # slot s holds the unique p ≡ s (mod 4) in [7, 11)
    np.testing.assert_array_equal(np.asarray(pos[0]), [8, 9, 10, 7])
    assert np.asarray(valid)[0].all()


def test_slot_positions_shared_buffer_padding():
    """Layers with window < buffer width mark the padding slots invalid."""
    pos, valid = slot_positions(jnp.asarray([5]), jnp.int32(2), 4)
    v = np.asarray(valid)[0]
    assert v[:2].all() and not v[2:].any()


def test_update_layer_intra_chunk_eviction():
    """A chunk longer than the window writes only its last `window` tokens —
    earlier ones must not clobber the survivors' slots."""
    B, W, H, D = 1, 4, 1, 4
    ck = jnp.zeros((B, W, H * D))  # flat-head stored layout
    cv = jnp.zeros((B, W, H * D))
    ks = jnp.zeros((B, 0, 0))
    T = 6  # positions 0..5, window 4 → only 2..5 stored
    xk = jnp.arange(T, dtype=jnp.float32)[None, :, None, None] * jnp.ones((B, T, H, D))
    positions = jnp.arange(T, dtype=jnp.int32)[None, :]
    valid = jnp.ones((B, T), bool)
    new_total = jnp.asarray([T])
    nck, _, _, _ = update_layer(
        ck, cv, ks, ks, xk, xk, positions, valid, new_total, jnp.int32(W)
    )
    got = np.asarray(nck[0, :, 0])
    # slot s holds position p ≡ s (mod 4) among {2,3,4,5}: [4, 5, 2, 3]
    np.testing.assert_array_equal(got, [4, 5, 2, 3])


def test_cache_alloc_per_layer_windows():
    c = KVCache.alloc(4, 2, 32, 1, 4, sliding_window=[4, None])
    np.testing.assert_array_equal(np.asarray(c.windows), [4, 32, 4, 32])
    # buffer width is lane-padded for the fused decode kernel's 128-aligned
    # manual-DMA tiles; ring semantics still follow `windows`
    assert c.size == 128
