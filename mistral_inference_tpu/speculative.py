"""Speculative decoding: draft-model speculation with exact greedy verify.

No reference equivalent (mistral-inference decodes strictly one token per
forward, generate.py:125-140) — this is a beyond-parity capability. On TPU
it attacks the measured decode bottleneck directly: at B ≤ 128 decode is
MXU weight-tile-load bound (docs/DECODE_PERF.md), so a verify forward over
K+1 tokens costs nearly the same as a 1-token step while emitting up to
K+1 accepted tokens — the weight tiles stream once either way.

Design (all static shapes, fused iterations in one ``lax.scan`` program):

  Loop invariant: both caches hold tokens [0..n-1]; ``t0`` is token n,
  known-correct, K/V not yet in either cache.

  1. Draft: forward t0 then K greedy single-token steps on the draft model
     (normal writing decode path) → drafts d_1..d_K.
  2. Verify: one target forward over the (B, K+1) chunk [t0, d_1..d_K] with
     ``write_cache=False`` — attends [ring ++ chunk] like a prefill chunk
     but leaves the ring untouched, returning the chunk's per-layer K/V.
  3. Accept: a = longest prefix with d_{j+1} == argmax(target logits_j).
     Emit [d_1..d_a, g_a] (g_a is the target's own next token — the
     "bonus" token, so every iteration emits ≥ 1 token and the output
     equals standard greedy decode EXACTLY).
  4. Commit: ``cache.scatter_chunk`` writes K/V for [t0, d_1..d_a] only —
     rejected drafts never touch the target ring, so this is safe even
     when the sliding-window ring wraps.
  5. Rewind the draft cache to n + a + 1. The draft wrote speculatively, so
     rewind is only safe on a non-wrapping ring — ``generate_speculative``
     allocates the draft cache full-context and asserts the draft model
     has no smaller sliding window.

temperature == 0 output is bit-identical to standard greedy decode;
temperature > 0 uses Leviathan rejection sampling against both models'
nucleus-filtered distributions (lossless — exactly the target's sampling
distribution, on a different RNG stream than generate()'s per-step
fold_in). A draft-free variant, generate_lookup, replaces the draft with
an in-program n-gram history matcher. Design notes: docs/SPECULATIVE.md.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.cache import rewind, scatter_chunk
from mistral_inference_tpu.model import Transformer
from mistral_inference_tpu.models import transformer as tf
from mistral_inference_tpu.parallel.multihost import fetch, to_global


def _residual_dist(p: jax.Array, q: jax.Array) -> jax.Array:
    """The rejection-sampling fallback distribution norm(max(p - q, 0)),
    with a fallback to p itself when the residual has (numerically) no
    mass — which only happens when p == q, where sampling from p is the
    correct limit. Shapes (..., V)."""
    r = jnp.clip(p - q, 0.0, None)
    s = jnp.sum(r, axis=-1, keepdims=True)
    return jnp.where(s > 1e-9, r / jnp.maximum(s, 1e-30), p)


def _spec_block(
    params_t, params_d, rope_t, rope_d, t0, tcache, dcache, base_key, it0,
    temps=None, live=None, top_ps=None, *,
    cfg_t, cfg_d, K: int, n_iters: int, temperature: float, top_p: float,
    mesh_t, mesh_d, spec_fused: bool = False,
):
    """n_iters fused speculative iterations. Returns per-iteration
    (emitted tokens (n_iters, B, K+1), their logprobs, accept counts (B,))
    plus the carried state.

    temperature == 0 (static): greedy — drafts accepted while they match
    the target argmax; output tokens are bit-identical to standard greedy
    decode. temperature > 0: Leviathan-style rejection sampling against the
    nucleus-filtered distributions of both models — the emitted tokens are
    distributed EXACTLY as sequential sampling from the target's filtered
    distribution (lossless), though the RNG stream differs from
    generate()'s per-step fold_in, so per-seed transcripts differ.

    ``temps`` (traced (B,) vector, serving engines) overrides the static
    ``temperature`` per row: rows with temps == 0 take the greedy rule,
    rows with temps > 0 the rejection rule — both are computed and selected
    per row, the same contract as generate.sample's vector form.

    ``live`` ((B,) int32 0/1, serving engines): dead slots run every
    forward with seqlens 0 and commit 0 tokens — neither ring is written
    and both kv_lens freeze."""
    B = t0.shape[0]
    ones = jnp.ones((B,), jnp.int32) if live is None else live
    live_b = jnp.ones((B,), bool) if live is None else live > 0
    sampled = temps is not None or temperature > 0
    p_eff = top_p if top_ps is None else top_ps  # float or traced (B,)

    def _temp_col():  # (B, 1) fp32, clamped away from 0 for the math
        t = temps if temps is not None else jnp.full((B,), temperature)
        return jnp.maximum(t.astype(jnp.float32), 1e-6)[:, None]

    def _greedy_rows():  # (B,) bool — rows taking the argmax rule
        if temps is None:
            return jnp.full((B,), temperature <= 0)
        return temps <= 0

    def iteration(carry, it_idx):
        t0, tc, dc = carry
        n = tc.kv_len  # (B,) — tokens in both caches; t0 is token n
        key_it = jax.random.fold_in(base_key, it0 + it_idx)

        # -- draft: t0 then K steps (writes its own cache) --
        dlog, dc = tf.forward(
            params_d, rope_d, t0[:, None], ones, dc, cfg_d,
            attend_cache=True, mesh=mesh_d,
        )
        last = dlog[:, 0]

        def draft_step(c, j):
            last, dc = c
            d_greedy = jnp.argmax(last, axis=-1).astype(jnp.int32)
            if sampled:
                from mistral_inference_tpu.generate import top_p_probs

                q = top_p_probs(
                    jax.nn.softmax(last.astype(jnp.float32) / _temp_col(), -1),
                    p_eff,
                )
                kq = jax.random.fold_in(jax.random.fold_in(key_it, 1), j)
                d = jax.random.categorical(kq, jnp.log(q), axis=-1)
                d = jnp.where(_greedy_rows(), d_greedy, d.astype(jnp.int32))
            else:
                q = jnp.zeros((B, 1), jnp.float32)  # unused placeholder
                d = d_greedy
            dl, dc = tf.forward(
                params_d, rope_d, d[:, None], ones, dc, cfg_d,
                attend_cache=True, mesh=mesh_d,
            )
            return (dl[:, 0], dc), (d, q)

        (_, dc), (drafts, qs) = jax.lax.scan(
            draft_step, (last, dc), jnp.arange(K, dtype=jnp.int32)
        )
        drafts = drafts.T  # (B, K)

        # -- verify: one target forward over [t0, d_1..d_K] (no-write +
        # scatter commit, or the fused in-ring write when spec_fused —
        # see _lookup_block for the contract) --
        chunk = jnp.concatenate([t0[:, None], drafts], axis=1)  # (B, K+1)
        vlog, ret = tf.forward(
            params_t, rope_t, chunk, jnp.where(live_b, K + 1, 0), tc,
            cfg_t, attend_cache=True, mesh=mesh_t,
            write_cache="spec" if spec_fused else False,
        )

        g = jnp.argmax(vlog, axis=-1).astype(jnp.int32)  # (B, K+1)
        match = (drafts == g[:, :K]).astype(jnp.int32)
        a_greedy = jnp.sum(jnp.cumprod(match, axis=1), axis=1)
        if sampled:
            from mistral_inference_tpu.generate import top_p_probs

            qs = jnp.moveaxis(qs, 0, 1)  # (B, K, V)
            p = top_p_probs(
                jax.nn.softmax(
                    vlog.astype(jnp.float32) / _temp_col()[:, :, None], -1
                ),
                p_eff,
            )  # (B, K+1, V)
            # Accept d_{j+1} w.p. min(1, p_j(d)/q_j(d)): u·q_d < p_d.
            p_d = jnp.take_along_axis(p[:, :K], drafts[..., None], -1)[..., 0]
            q_d = jnp.take_along_axis(qs, drafts[..., None], -1)[..., 0]
            u = jax.random.uniform(jax.random.fold_in(key_it, 2), (B, K))
            acc = (u * q_d < p_d).astype(jnp.int32)
            a_sampled = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)
            a = jnp.where(_greedy_rows(), a_greedy, a_sampled)  # (B,)
            # Fallback at the first rejected position a: residual
            # norm(max(p_a - q_a, 0)); after K acceptances: p_K itself.
            res = jnp.concatenate(
                [_residual_dist(p[:, :K], qs), p[:, K:]], axis=1
            )  # (B, K+1, V)
            r_a = jnp.take_along_axis(res, a[:, None, None], axis=1)[:, 0]
            b_sampled = jax.random.categorical(
                jax.random.fold_in(key_it, 3), jnp.log(r_a), axis=-1
            ).astype(jnp.int32)[:, None]
            b_greedy = jnp.take_along_axis(g, a[:, None], axis=1)
            bonus = jnp.where(_greedy_rows()[:, None], b_greedy, b_sampled)
        else:
            a = a_greedy  # (B,) in [0, K]
            bonus = jnp.take_along_axis(g, a[:, None], axis=1)  # (B, 1)

        # -- emit accepted drafts + the bonus/fallback token --
        jidx = jnp.arange(K + 1, dtype=jnp.int32)[None, :]
        drafts_pad = jnp.concatenate(
            [drafts, jnp.zeros((B, 1), jnp.int32)], axis=1
        )
        emit = jnp.where(jidx < a[:, None], drafts_pad, 0)
        emit = jnp.where(jidx == a[:, None], bonus, emit)  # (B, K+1)
        lp = jnp.take_along_axis(
            jax.nn.log_softmax(vlog, axis=-1), emit[..., None], axis=-1
        )[..., 0]  # (B, K+1)

        # -- commit accepted K/V to the target ring; rewind the draft --
        # Dead rows commit 0 tokens and both kv_lens stay frozen at n.
        adv = jnp.where(live_b, a + 1, 0)
        if spec_fused:
            tc = rewind(ret, ret.kv_len + adv)
        else:
            tc = scatter_chunk(tc, ret[0], ret[1], adv)
        dc = rewind(dc, n + adv)
        return (bonus[:, 0], tc, dc), (emit, lp, a)

    (t0, tcache, dcache), (emits, lps, accepts) = jax.lax.scan(
        iteration, (t0, tcache, dcache), jnp.arange(n_iters, dtype=jnp.int32)
    )
    return t0, tcache, dcache, emits, lps, accepts


def _lookup_propose(hist, hlen, t0, K: int, ngram: int):
    """In-program prompt-lookup proposer: find the most recent earlier
    occurrence of the last ``ngram`` tokens of ``hist`` (which end in t0 at
    index hlen-1) and propose the K tokens that followed it. Rows with no
    match propose t0 repeated (harmless — verification rejects them).
    hist (B, M) int32, hlen (B,) int32 → (B, K) proposals."""
    B, M = hist.shape
    idx = jnp.arange(M, dtype=jnp.int32)[None, :]
    m = (idx >= ngram - 1) & (idx < hlen[:, None] - 1)
    for o in range(ngram):
        tail = jnp.take_along_axis(
            hist, jnp.maximum(hlen - 1 - o, 0)[:, None], axis=1
        )  # (B, 1) — o-th token from the end
        shifted = jnp.pad(hist, ((0, 0), (o, 0)))[:, :M]  # hist[j - o] at col j
        m = m & (shifted == tail)
    j_star = jnp.max(jnp.where(m, idx, -1), axis=1)  # (B,) most recent match
    found = j_star >= 0
    prop_idx = jnp.clip(
        j_star[:, None] + 1 + jnp.arange(K, dtype=jnp.int32)[None, :], 0, M - 1
    )
    prop = jnp.take_along_axis(hist, prop_idx, axis=1)
    return jnp.where(found[:, None], prop, t0[:, None])


def _onehot_verify_accept(
    vlog, drafts, key_it, *, sampled, greedy_rows, temp_col, p_eff
):
    """Accept/emit math shared by the transformer and Mamba lookup blocks.
    Given target logits ``vlog`` (B, K+1, V) over [t0, d_1..d_K] and one-hot
    (n-gram) proposals ``drafts`` (B, K), returns (a, emit, lp, bonus):
    the per-row accepted-prefix length a in [0, K], the emitted tokens
    (B, K+1) = [d_1..d_a, bonus, 0…], their target logprobs, and the bonus
    token. For a one-hot proposal distribution Leviathan acceptance reduces
    to u < p(d) and the rejection fallback to p with d's mass removed —
    still exactly lossless; ``greedy_rows`` selects the argmax rule per
    row."""
    B, K = drafts.shape
    g = jnp.argmax(vlog, axis=-1).astype(jnp.int32)  # (B, K+1)
    match = (drafts == g[:, :K]).astype(jnp.int32)
    a_greedy = jnp.sum(jnp.cumprod(match, axis=1), axis=1)
    if sampled:
        from mistral_inference_tpu.generate import top_p_probs

        p = top_p_probs(
            jax.nn.softmax(vlog.astype(jnp.float32) / temp_col, -1), p_eff
        )  # (B, K+1, V)
        p_d = jnp.take_along_axis(p[:, :K], drafts[..., None], -1)[..., 0]
        u = jax.random.uniform(jax.random.fold_in(key_it, 2), (B, K))
        acc = (u < p_d).astype(jnp.int32)  # one-hot q: accept w.p. p(d)
        a_sampled = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)
        a = jnp.where(greedy_rows, a_greedy, a_sampled)
        # Fallback: p with the proposed token's mass removed (the residual
        # of a one-hot proposal); after K acceptances, p_K itself.
        V = vlog.shape[-1]
        vocab = jnp.arange(V, dtype=jnp.int32)[None, None, :]
        res_k = jnp.where(vocab == drafts[..., None], 0.0, p[:, :K])
        res_k = res_k / jnp.maximum(
            jnp.sum(res_k, axis=-1, keepdims=True), 1e-30
        )
        res = jnp.concatenate([res_k, p[:, K:]], axis=1)
        r_a = jnp.take_along_axis(res, a[:, None, None], axis=1)[:, 0]
        b_sampled = jax.random.categorical(
            jax.random.fold_in(key_it, 3), jnp.log(r_a), axis=-1
        ).astype(jnp.int32)[:, None]
        b_greedy = jnp.take_along_axis(g, a[:, None], axis=1)
        bonus = jnp.where(greedy_rows[:, None], b_greedy, b_sampled)
    else:
        a = a_greedy
        bonus = jnp.take_along_axis(g, a[:, None], axis=1)

    jidx = jnp.arange(K + 1, dtype=jnp.int32)[None, :]
    drafts_pad = jnp.concatenate(
        [drafts, jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    emit = jnp.where(jidx < a[:, None], drafts_pad, 0)
    emit = jnp.where(jidx == a[:, None], bonus, emit)
    lp = jnp.take_along_axis(
        jax.nn.log_softmax(vlog, axis=-1), emit[..., None], axis=-1
    )[..., 0]
    return a, emit, lp, bonus


def _append_hist(hist, hlen, emit, a, adv, live_b):
    """Append each row's accepted+bonus tokens to the lookup history buffer
    (OOB slots drop silently)."""
    B, K1 = emit.shape
    jidx = jnp.arange(K1, dtype=jnp.int32)[None, :]
    slots = hlen[:, None] + jidx  # (B, K+1)
    ok = (jidx <= a[:, None]) & live_b[:, None]
    write = jnp.where(ok, slots, hist.shape[1])  # OOB ⇒ dropped
    hist = hist.at[
        jnp.arange(B, dtype=jnp.int32)[:, None], write
    ].set(emit, mode="drop")
    return hist, hlen + adv


def _lookup_block(
    params_t, rope_t, t0, tcache, hist, hlen, base_key, it0,
    temps=None, live=None, top_ps=None, *,
    cfg_t, K: int, n_iters: int, temperature: float, top_p: float,
    ngram: int, mesh_t, spec_fused: bool = False,
):
    """Draft-FREE speculative iterations: the proposer is an in-program
    n-gram lookup over the row's own token history (prompt-lookup
    decoding) — strong on repetitive continuations (code, quoting,
    retrieval) and costs no draft forwards at all. Same no-write verify +
    accepted-only commit as the draft path; greedy output is bit-identical
    to standard decode. The history buffer rides the scan carry, so the
    whole block is one compiled program with no host round trips.

    For temperature > 0 the proposal distribution is the one-hot at the
    proposed token, so Leviathan acceptance reduces to u < p(d) and the
    fallback distribution to p with d's mass removed — still exactly
    lossless.

    ``temps``/``live``: per-row overrides for serving engines, same
    contracts as _spec_block."""
    B = t0.shape[0]
    live_b = jnp.ones((B,), bool) if live is None else live > 0
    sampled = temps is not None or temperature > 0
    p_eff = top_p if top_ps is None else top_ps  # float or traced (B,)

    def _temp_col():
        t = temps if temps is not None else jnp.full((B,), temperature)
        return jnp.maximum(t.astype(jnp.float32), 1e-6)[:, None, None]

    def _greedy_rows():
        if temps is None:
            return jnp.full((B,), temperature <= 0)
        return temps <= 0

    def iteration(carry, it_idx):
        t0, tc, hist, hlen = carry
        key_it = jax.random.fold_in(base_key, it0 + it_idx)

        drafts = _lookup_propose(hist, hlen, t0, K, ngram)  # (B, K)

        chunk = jnp.concatenate([t0[:, None], drafts], axis=1)  # (B, K+1)
        # spec_fused (pallas, non-wrapping ring — the caller checked
        # min(windows) covers every reachable position): ALL K+1 candidate
        # K/V are written in-ring by the fused verify kernel and commit is
        # just the kv_len advance (rejected slots stay invisible and are
        # overwritten by the real tokens at those positions). Otherwise:
        # no-write verify + scatter_chunk of the accepted prefix.
        vlog, ret = tf.forward(
            params_t, rope_t, chunk, jnp.where(live_b, K + 1, 0), tc,
            cfg_t, attend_cache=True, mesh=mesh_t,
            write_cache="spec" if spec_fused else False,
        )

        a, emit, lp, bonus = _onehot_verify_accept(
            vlog, drafts, key_it, sampled=sampled,
            greedy_rows=_greedy_rows(), temp_col=_temp_col(), p_eff=p_eff,
        )

        adv = jnp.where(live_b, a + 1, 0)
        if spec_fused:
            tc = rewind(ret, ret.kv_len + adv)
        else:
            tc = scatter_chunk(tc, ret[0], ret[1], adv)
        hist, hlen = _append_hist(hist, hlen, emit, a, adv, live_b)
        return (bonus[:, 0], tc, hist, hlen), (emit, lp, a)

    (t0, tcache, hist, hlen), (emits, lps, accepts) = jax.lax.scan(
        iteration, (t0, tcache, hist, hlen),
        jnp.arange(n_iters, dtype=jnp.int32),
    )
    return t0, tcache, hist, hlen, emits, lps, accepts


def _mamba_lookup_block(
    params, t0, state, hist, hlen, base_key, it0,
    temps=None, live=None, top_ps=None, *,
    cfg, K: int, n_iters: int, temperature: float, top_p: float, ngram: int,
):
    """Mamba twin of _lookup_block. A recurrent state has no KV ring to
    scatter into, so accepted-prefix commit works differently: the verify
    forward scores the whole (B, K+1) chunk with the state DISCARDED, then a
    second forward over the same chunk with ``seqlens = a+1`` absorbs exactly
    the accepted prefix — models/mamba.py's seqlens masking guarantees
    tokens ≥ seqlens neither decay nor write SSM state nor enter the conv
    window (Δ=0 + zeroed conv inputs), so the committed state is identical
    to having decoded the accepted tokens one-by-one. Two weight streams per
    iteration vs one per token in plain decode: profitable once the expected
    accepted length E[a]+1 exceeds 2 (decode is weight-stream-bound,
    docs/DECODE_PERF.md). Greedy output is bit-identical to generate_mamba.

    ``temps``/``live``/``top_ps``: per-row serving overrides, same contracts
    as _spec_block (dead rows verify with seqlens 0 and commit 0 tokens —
    their state and hlen freeze)."""
    from mistral_inference_tpu.models import mamba as mm

    B = t0.shape[0]
    live_b = jnp.ones((B,), bool) if live is None else live > 0
    sampled = temps is not None or temperature > 0
    p_eff = top_p if top_ps is None else top_ps  # float or traced (B,)

    def _temp_col():
        t = temps if temps is not None else jnp.full((B,), temperature)
        return jnp.maximum(t.astype(jnp.float32), 1e-6)[:, None, None]

    def _greedy_rows():
        if temps is None:
            return jnp.full((B,), temperature <= 0)
        return temps <= 0

    def iteration(carry, it_idx):
        t0, st, hist, hlen = carry
        key_it = jax.random.fold_in(base_key, it0 + it_idx)

        drafts = _lookup_propose(hist, hlen, t0, K, ngram)  # (B, K)
        chunk = jnp.concatenate([t0[:, None], drafts], axis=1)  # (B, K+1)

        # Verify: score all K+1 positions; the returned state is dropped
        # (it would correspond to absorbing unverified drafts).
        vlog, _ = mm.forward(
            params, chunk, jnp.where(live_b, K + 1, 0), st, cfg, chunk=K + 1
        )

        a, emit, lp, bonus = _onehot_verify_accept(
            vlog, drafts, key_it, sampled=sampled,
            greedy_rows=_greedy_rows(), temp_col=_temp_col(), p_eff=p_eff,
        )

        # Commit: absorb exactly [t0, d_1..d_a] into the recurrent state.
        adv = jnp.where(live_b, a + 1, 0)
        _, st = mm.forward(params, chunk, adv, st, cfg, chunk=K + 1, head="none")
        hist, hlen = _append_hist(hist, hlen, emit, a, adv, live_b)
        return (bonus[:, 0], st, hist, hlen), (emit, lp, a)

    (t0, state, hist, hlen), (emits, lps, accepts) = jax.lax.scan(
        iteration, (t0, state, hist, hlen),
        jnp.arange(n_iters, dtype=jnp.int32),
    )
    return t0, state, hist, hlen, emits, lps, accepts


def _spec_fused_ok(model, tcache, K: int, span: int) -> bool:
    """Gate for the fused in-ring verify path (write_cache="spec"): pallas
    attention (single-chip TPU), verify chunks of K+1 <= 8 tokens, a
    128-padded ring buffer, and a ring that can NEVER wrap — every
    per-layer window must cover ``span``, the caller's bound on reachable
    positions (including in-block overshoot past max_tokens). When False
    the spec blocks keep the wrap-safe no-write verify + scatter commit."""
    import numpy as np

    return (
        model.cfg.attn_impl == "pallas"
        and K + 1 <= 8
        and tcache.k.shape[2] % 128 == 0
        and int(np.min(np.asarray(tcache.windows))) >= span
    )


def _get_spec_block(
    model, draft, K: int, n_iters: int, temperature: float, top_p: float,
    per_row_temps: bool = False, spec_fused: bool = False,
):
    key = ("spec_block", K, n_iters, temperature, top_p, per_row_temps,
           draft.cfg, spec_fused)
    if key not in model._jitted:
        from functools import partial

        f = partial(
            _spec_block, cfg_t=model.cfg, cfg_d=draft.cfg, K=K,
            n_iters=n_iters, temperature=temperature, top_p=top_p,
            mesh_t=model.mesh, mesh_d=draft.mesh, spec_fused=spec_fused,
        )
        model._jitted[key] = jax.jit(f, donate_argnames=("tcache", "dcache"))
    return model._jitted[key]


def _prefill_cache(model, encoded_prompts, cache, chunk_size, want_logprobs):
    """Prompt prefill shared by target (logprobs kept) and draft (skipped).
    Returns (per-row teacher-forced logprobs, final prelogits, cache)."""
    from mistral_inference_tpu.generate import _get_prefill

    B = len(encoded_prompts)
    seqlens = [len(p) for p in encoded_prompts]
    max_prompt_len = max(seqlens)
    if chunk_size is None:
        chunk_size = max_prompt_len
    V = model.args.vocab_size
    carry = to_global(np.zeros((B, V), np.float32), model.mesh)
    logprobs: List[List[float]] = [[] for _ in range(B)]
    for s in range(0, max_prompt_len, chunk_size):
        first = s == 0
        chunk_lens = np.array(
            [min(max(l - s, 0), chunk_size) for l in seqlens], np.int32
        )
        chunk_tok = np.zeros((B, chunk_size), np.int32)
        for i, p in enumerate(encoded_prompts):
            row = p[s : s + chunk_size]
            chunk_tok[i, : len(row)] = row
        prefill = _get_prefill(
            model, attend_cache=not first, with_embeds=False,
            want_logprobs=want_logprobs,
        )
        lp_d, carry, cache = prefill(
            model.params, model.rope, to_global(chunk_tok, model.mesh),
            to_global(chunk_lens, model.mesh), cache, carry,
        )
        if want_logprobs:
            lp = fetch(lp_d)
            for i in range(B):
                li = int(chunk_lens[i])
                if li:
                    logprobs[i].extend(lp[i, (1 if first else 0) : li].tolist())
    return logprobs, carry, cache


def _walk_emits(emits, lps_h, acc, streams, stream_lps, eos_step, eos_id, B):
    """Append each iteration's accepted+bonus tokens to the host streams,
    recording first-EOS positions."""
    for it in range(emits.shape[0]):
        for i in range(B):
            for j in range(int(acc[it, i]) + 1):
                tok = int(emits[it, i, j])
                streams[i].append(tok)
                stream_lps[i].append(float(lps_h[it, i, j]))
                if eos_id is not None and eos_step[i] is None and tok == eos_id:
                    eos_step[i] = len(streams[i]) - 1


def _finalize_streams(
    streams, stream_lps, logprobs, eos_step, eos_id, max_tokens, B
):
    """Replicate the reference's stop rule (generate.py:129-134): tokens
    are appended per GLOBAL step until every row has emitted EOS; the step
    on which the last row finishes is not appended. The streams here are
    identical to sequential decode, so truncating to that step count
    reproduces standard generate() exactly."""
    if eos_id is not None and all(e is not None for e in eos_step):
        cut = min(max_tokens, max(e for e in eos_step))
    else:
        cut = max_tokens
    generated = [s[:cut] for s in streams]
    for i in range(B):
        logprobs[i].extend(stream_lps[i][:cut])
    return generated, logprobs


def _lookup_start(
    model, carry, encoded_prompts, temperature, top_p, max_tokens, K,
    n_iters, seed, eos_id,
):
    """Host-side startup shared by the transformer and Mamba lookup
    generators: sample the first token from the prefill carry, seed the
    per-row output streams, and build the device history buffer (prompt +
    first token) the in-program n-gram proposer searches."""
    from mistral_inference_tpu.generate import sample

    B = len(encoded_prompts)
    max_prompt_len = max(len(p) for p in encoded_prompts)
    base_key = jax.random.PRNGKey(seed)
    first_key, loop_key = jax.random.split(base_key)

    t0 = sample(carry, float(temperature), top_p, first_key)
    lp0 = jnp.take_along_axis(
        jax.nn.log_softmax(carry, axis=-1), t0[:, None], axis=-1
    )[:, 0]
    streams: List[List[int]] = [[int(t)] for t in fetch(t0)]
    stream_lps: List[List[float]] = [[float(l)] for l in fetch(lp0)]

    M = max_prompt_len + max_tokens + n_iters * (K + 1) + 4
    hist_np = np.zeros((B, M), np.int32)
    for i, p in enumerate(encoded_prompts):
        hist_np[i, : len(p)] = p
        hist_np[i, len(p)] = streams[i][0]
    hist = to_global(hist_np, model.mesh)
    hlen = to_global(
        np.asarray([len(p) + 1 for p in encoded_prompts], np.int32), model.mesh
    )

    eos_step: List[Optional[int]] = [None] * B
    if eos_id is not None:
        for i in range(B):
            if streams[i][0] == eos_id:
                eos_step[i] = 0
    return t0, loop_key, streams, stream_lps, hist, hlen, eos_step


def generate_lookup(
    encoded_prompts: Sequence[Sequence[int]],
    model: Transformer,
    *,
    max_tokens: int,
    temperature: float = 0.0,
    spec_tokens: int = 8,
    ngram: int = 2,
    chunk_size: Optional[int] = None,
    eos_id: Optional[int] = None,
    block_iters: int = 8,
    top_p: float = 0.8,
    seed: int = 0,
) -> Tuple[List[List[int]], List[List[float]]]:
    """Draft-free speculative decoding via prompt-lookup (n-gram)
    proposals. Same output contract as ``generate``; greedy output tokens
    are bit-identical. Shines when continuations repeat earlier text
    (code edits, quoting, structured data) — and never does worse than
    +1 token per verify forward."""
    K = int(spec_tokens)
    assert K >= 1
    B = len(encoded_prompts)
    assert B > 0
    seqlens = [len(p) for p in encoded_prompts]
    assert all(s > 0 for s in seqlens)
    max_prompt_len = max(seqlens)

    n_iters = int(block_iters)
    # Span covers the worst in-block overshoot past max_tokens (a row that
    # finishes in a block's first iteration keeps verifying until the
    # block ends; done rows are frozen BETWEEN blocks via ``live``), so on
    # window-free models the ring never wraps and the fused in-ring verify
    # path applies (models/transformer.py write_cache="spec").
    span = max_prompt_len + max_tokens + n_iters * (K + 1) + K + 2
    tcache = model.alloc_cache(B, span)
    spec_fused = _spec_fused_ok(model, tcache, K, span)
    logprobs, carry, tcache = _prefill_cache(
        model, encoded_prompts, tcache, chunk_size, want_logprobs=True
    )

    t0, loop_key, streams, stream_lps, hist, hlen, eos_step = _lookup_start(
        model, carry, encoded_prompts, temperature, top_p, max_tokens, K,
        n_iters, seed, eos_id,
    )

    key = ("lookup_block", K, n_iters, float(temperature), top_p, ngram,
           spec_fused)
    if key not in model._jitted:
        from functools import partial

        f = partial(
            _lookup_block, cfg_t=model.cfg, K=K, n_iters=n_iters,
            temperature=float(temperature), top_p=top_p, ngram=ngram,
            mesh_t=model.mesh, spec_fused=spec_fused,
        )
        model._jitted[key] = jax.jit(f, donate_argnames=("tcache", "hist"))
    block = model._jitted[key]

    iters_done = 0

    def row_done(i):
        return len(streams[i]) >= max_tokens or eos_step[i] is not None

    while not all(row_done(i) for i in range(B)):
        # Freeze rows only at max_tokens (their tail is always truncated):
        # EOS'd rows must KEEP generating real tokens — the reference stop
        # rule returns their continuation up to the last row's finish
        # (_finalize_streams). Bounds ring positions to ``span``.
        live = jnp.asarray(
            [0 if len(streams[i]) >= max_tokens else 1 for i in range(B)],
            jnp.int32,
        )
        t0, tcache, hist, hlen, emits, lps, accepts = block(
            model.params, model.rope, t0, tcache, hist, hlen, loop_key,
            jnp.int32(iters_done), None, live,
        )
        iters_done += n_iters
        _walk_emits(
            fetch(emits), fetch(lps), fetch(accepts),
            streams, stream_lps, eos_step, eos_id, B,
        )

    return _finalize_streams(
        streams, stream_lps, logprobs, eos_step, eos_id, max_tokens, B
    )


def generate_lookup_mamba(
    encoded_prompts: Sequence[Sequence[int]],
    model,
    *,
    max_tokens: int,
    temperature: float = 0.0,
    spec_tokens: int = 8,
    ngram: int = 2,
    chunk_size: Optional[int] = None,
    eos_id: Optional[int] = None,
    block_iters: int = 8,
    top_p: float = 0.8,
    seed: int = 0,
) -> Tuple[List[List[int]], List[List[float]]]:
    """Prompt-lookup speculative decoding for Mamba models (model.Mamba).
    Same output contract as ``generate_mamba``; greedy output tokens are
    bit-identical. The reference has no speculative path at all — and a
    recurrent model benefits even more than a transformer: plain decode
    re-streams every weight AND the full SSD state per token, while a
    verify+commit iteration streams them twice for up to K+1 accepted
    tokens (see _mamba_lookup_block for the seqlens-masked state-commit
    trick that replaces the KV-ring scatter)."""
    K = int(spec_tokens)
    assert K >= 1
    B = len(encoded_prompts)
    assert B > 0
    assert all(len(p) > 0 for p in encoded_prompts)
    n_iters = int(block_iters)

    from mistral_inference_tpu.generate import _prefill_mamba

    logprobs, carry, state = _prefill_mamba(model, encoded_prompts, chunk_size)

    t0, loop_key, streams, stream_lps, hist, hlen, eos_step = _lookup_start(
        model, carry, encoded_prompts, temperature, top_p, max_tokens, K,
        n_iters, seed, eos_id,
    )

    key = ("mamba_lookup_block", K, n_iters, float(temperature), top_p, ngram)
    if key not in model._jitted:
        from functools import partial

        f = partial(
            _mamba_lookup_block, cfg=model.cfg, K=K, n_iters=n_iters,
            temperature=float(temperature), top_p=top_p, ngram=ngram,
        )
        model._jitted[key] = jax.jit(f, donate_argnames=("state", "hist"))
    block = model._jitted[key]

    iters_done = 0

    def row_done(i):
        return len(streams[i]) >= max_tokens or eos_step[i] is not None

    while not all(row_done(i) for i in range(B)):
        t0, state, hist, hlen, emits, lps, accepts = block(
            model.params, t0, state, hist, hlen, loop_key,
            jnp.int32(iters_done),
        )
        iters_done += n_iters
        _walk_emits(
            fetch(emits), fetch(lps), fetch(accepts),
            streams, stream_lps, eos_step, eos_id, B,
        )

    return _finalize_streams(
        streams, stream_lps, logprobs, eos_step, eos_id, max_tokens, B
    )


def generate_speculative(
    encoded_prompts: Sequence[Sequence[int]],
    model: Transformer,
    draft_model: Transformer,
    *,
    max_tokens: int,
    temperature: float = 0.0,
    spec_tokens: int = 4,
    chunk_size: Optional[int] = None,
    eos_id: Optional[int] = None,
    block_iters: int = 8,
    top_p: float = 0.8,  # reference decode-loop default (generate.py:126)
    seed: int = 0,
) -> Tuple[List[List[int]], List[List[float]]]:
    """Same output contract as ``generate`` — and for temperature == 0 the
    SAME OUTPUT TOKENS, bit-for-bit: speculation only changes how many
    target forwards it takes to produce them. temperature > 0 uses
    rejection sampling against both models' nucleus-filtered distributions:
    lossless (output tokens are distributed exactly as sequential sampling
    from the target), deterministic per seed, but a different RNG stream
    than generate()'s per-step fold_in."""
    assert isinstance(draft_model, Transformer), "draft must be a Transformer"
    assert model.args.vocab_size == draft_model.args.vocab_size, (
        "draft and target must share a vocabulary"
    )
    K = int(spec_tokens)
    assert K >= 1
    B = len(encoded_prompts)
    assert B > 0
    seqlens = [len(p) for p in encoded_prompts]
    assert all(s > 0 for s in seqlens)
    max_prompt_len = max(seqlens)

    # Target ring: sized for the worst in-block overshoot past max_tokens
    # (done rows freeze between blocks via ``live``) so that on window-free
    # models it never wraps and the fused in-ring verify applies; the
    # scatter-commit fallback stays wrap-safe regardless. Draft ring: must
    # NEVER wrap (rewind safety) — full-context with the same slack.
    overshoot = block_iters * (K + 1) + K + 2
    span = max_prompt_len + max_tokens + overshoot
    tcache = model.alloc_cache(B, span)
    spec_fused = _spec_fused_ok(model, tcache, K, span)
    draft_span = max_prompt_len + max_tokens + K + 1 + overshoot
    dw = draft_model.args.sliding_window
    dws = [w for w in (dw if isinstance(dw, list) else [dw]) if w is not None]
    assert not dws or min(dws) >= draft_span, (
        f"draft sliding window {dws} < {draft_span}: the draft cache would "
        "wrap, making speculative rewind unsafe — use a full-context draft"
    )
    dcache = draft_model.alloc_cache(B, draft_span)

    # Prompt prefill: target keeps the teacher-forced logprobs (API
    # contract); the draft only needs its cache filled.
    logprobs, carry, tcache = _prefill_cache(
        model, encoded_prompts, tcache, chunk_size, want_logprobs=True
    )
    _, _, dcache = _prefill_cache(
        draft_model, encoded_prompts, dcache, chunk_size, want_logprobs=False
    )

    # First token comes straight from the prefill carry (the spec loop's
    # invariant needs t0 = a correct token whose K/V is not yet cached).
    base_key = jax.random.PRNGKey(seed)
    first_key, loop_key = jax.random.split(base_key)
    from mistral_inference_tpu.generate import sample

    t0 = sample(carry, float(temperature), top_p, first_key)
    lp0 = jnp.take_along_axis(
        jax.nn.log_softmax(carry, axis=-1), t0[:, None], axis=-1
    )[:, 0]
    streams: List[List[int]] = [[int(t)] for t in fetch(t0)]
    stream_lps: List[List[float]] = [[float(l)] for l in fetch(lp0)]

    block = _get_spec_block(
        model, draft_model, K, block_iters, float(temperature), top_p,
        spec_fused=spec_fused,
    )
    iters_done = 0
    eos_step = [None] * B  # 0-based index of each row's first EOS

    def row_done(i):
        return len(streams[i]) >= max_tokens or eos_step[i] is not None

    if eos_id is not None:
        for i in range(B):
            if streams[i][0] == eos_id:
                eos_step[i] = 0
    while not all(row_done(i) for i in range(B)):
        # Freeze rows only at max_tokens (their tail is always truncated):
        # EOS'd rows must KEEP generating real tokens — the reference stop
        # rule returns their continuation up to the last row's finish
        # (_finalize_streams). Bounds ring positions to ``span``.
        live = jnp.asarray(
            [0 if len(streams[i]) >= max_tokens else 1 for i in range(B)],
            jnp.int32,
        )
        t0, tcache, dcache, emits, lps, accepts = block(
            model.params, draft_model.params, model.rope, draft_model.rope,
            t0, tcache, dcache, loop_key, jnp.int32(iters_done), None, live,
        )
        iters_done += block_iters
        _walk_emits(
            fetch(emits), fetch(lps), fetch(accepts),
            streams, stream_lps, eos_step, eos_id, B,
        )

    return _finalize_streams(
        streams, stream_lps, logprobs, eos_step, eos_id, max_tokens, B
    )
