"""Batched generation: chunked prefill + autoregressive decode.

Reference: src/mistral_inference/generate.py. API parity: returns
``(generated_tokens, logprobs)`` where logprobs covers teacher-forced prompt
transitions followed by one entry per generated token
(reference: generate.py:101-136).

TPU-native structure: exactly two compiled programs per (B, chunk) signature —
``prefill_step`` (forward + teacher-forced logprob gather + last-token
extraction fused in one jit) and ``decode_step`` (sample + logprob + next
forward fused). The host loop only moves O(B) scalars per token; all O(V)
work stays on device. Cache buffers are donated so XLA updates them in place.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.cache import KVCache
from mistral_inference_tpu.model import Mamba, Transformer
from mistral_inference_tpu.models import transformer as tf
from mistral_inference_tpu.parallel.multihost import fetch, to_global

DEFAULT_TOP_P = 0.8  # reference hardcodes top_p=0.8 in the decode loop (generate.py:126)


# ---------------------------------------------------------------------------
# Sampling (reference: generate.py:151-170)
# ---------------------------------------------------------------------------


def sample(
    prelogits: jax.Array, temperature, top_p, key: Optional[jax.Array]
) -> jax.Array:
    """Greedy when temperature == 0, else temperature-scaled top-p sampling.
    ``temperature`` may be a python float (static branch, one compiled
    program) or a (B,) array (per-row mix of greedy and sampled rows inside
    one batch — used by the serving engine). ``top_p`` likewise: float, or
    a traced (B,) vector for per-request nucleus sizes. Returns (B,) int32."""
    greedy = jnp.argmax(prelogits, axis=-1).astype(jnp.int32)
    if isinstance(temperature, (int, float)):
        if temperature <= 0:
            return greedy
        assert key is not None
        probs = jax.nn.softmax(prelogits.astype(jnp.float32) / temperature, axis=-1)
        return sample_top_p(probs, top_p, key)
    assert key is not None

    # Vector temps: the serving engines pass (B,) temperatures
    # unconditionally, and an all-greedy batch (the common serving default)
    # was paying the full softmax + 31-step radix nucleus search + sampler
    # EVERY decode step. lax.cond executes only the taken branch at
    # runtime, so greedy batches skip the sampler entirely; mixed batches
    # behave exactly as before.
    def _sampled(_):
        temp = jnp.maximum(temperature.astype(jnp.float32), 1e-6)[:, None]
        probs = jax.nn.softmax(prelogits.astype(jnp.float32) / temp, axis=-1)
        sampled = sample_top_p(probs, top_p, key)
        return jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)

    return jax.lax.cond(
        jnp.any(temperature > 0), _sampled, lambda _: greedy, None
    )


def _p_col(p, probs) -> jax.Array:
    """top_p as a broadcastable column: float stays scalar; a traced (B,)
    vector (per-request nucleus sizes, serving engines) gains a lane axis."""
    if isinstance(p, (int, float)):
        return jnp.float32(p)
    return p.astype(jnp.float32).reshape(probs.shape[0], *([1] * (probs.ndim - 1)))


def _nucleus_threshold(probs: jax.Array, p_col) -> jax.Array:
    """Sort-free nucleus boundary: the largest float t whose strictly-above
    mass sum(probs[probs > t]) still exceeds p. The kept set {probs > t} is
    then exactly the nucleus {i : mass of strictly-greater tokens <= p} —
    the sorted-prefix rule, with whole tie groups kept together (the only
    departure from an argsort implementation, which can split a tie group
    at the boundary; exact fp ties at the nucleus edge are the one place
    the two differ).

    Found by a 31-step radix bisection on the fp32 BIT pattern (uint32
    order is float order for non-negative floats), building the largest
    bit pattern whose strictly-above mass is still > p. 31 masked-sum
    passes over the vocab replace TWO full argsorts: on a v5e, argsorting
    (32, 5, 32k) costs ~75 ms while this runs in ~1 ms — the difference
    between speculative serving losing 6.5x to plain decode and beating
    it (benchmarks/results/spec_fix_r4.md)."""
    def body(t, bit):
        cand = t | (jnp.uint32(1) << bit)
        thr = jax.lax.bitcast_convert_type(cand, jnp.float32)
        g = jnp.sum(jnp.where(probs > thr, probs, 0.0), -1, keepdims=True)
        return jnp.where(g > p_col, cand, t), None

    # Bits 30..0 only: probs are non-negative, and uint32 order is float
    # order only on the sign-bit-clear half (bit 31 would bitcast to
    # negative/NaN patterns and wreck the ordering).
    t0 = jnp.zeros(probs.shape[:-1] + (1,), jnp.uint32)
    tF, _ = jax.lax.scan(body, t0, jnp.arange(30, -1, -1, dtype=jnp.uint32))
    return jax.lax.bitcast_convert_type(tF, jnp.float32)


def top_p_probs(probs: jax.Array, p) -> jax.Array:
    """The renormalized nucleus distribution: keep the smallest set of
    highest-probability tokens with cumulative mass > p, zero the rest,
    renormalize. Exposed separately from sampling because speculative
    rejection sampling (speculative.py) needs the actual filtered
    distributions of both models, not just a draw. Sort-free — see
    _nucleus_threshold."""
    probs = probs.astype(jnp.float32)
    thr = _nucleus_threshold(probs, _p_col(p, probs))
    filtered = jnp.where(probs > thr, probs, 0.0)
    return filtered / jnp.sum(filtered, axis=-1, keepdims=True)


def sample_top_p(probs: jax.Array, p, key: jax.Array) -> jax.Array:
    """Nucleus sampling: keep the smallest set of highest-probability
    tokens with cumulative mass > p, renormalize, sample. ``p`` may be a
    float or a traced (B,) vector. Sort-free — see _nucleus_threshold."""
    probs = probs.astype(jnp.float32)
    thr = _nucleus_threshold(probs, _p_col(p, probs))
    logits = jnp.where(probs > thr, jnp.log(probs), -jnp.inf)
    choice = jax.random.categorical(key, logits, axis=-1)
    return choice.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Fused steps
# ---------------------------------------------------------------------------


def _prefill_step(
    params, rope, tokens, seqlens, cache, carry_prelogits, *, cfg, attend_cache,
    input_embeds=None, mesh=None, want_logprobs=True,
):
    """Forward one prompt chunk; gather teacher-forced logprobs.

    Entry t of the returned (B, T) logprobs is
    log P(tokens[t] | context up to t-1), with the t=0 conditional coming from
    ``carry_prelogits`` (the previous chunk's final prelogits). Also returns
    each row's final valid prelogits (carried forward when a row has no
    tokens in this chunk, i.e. its prompt is already exhausted).

    The output head is applied in T-slices, never to the whole chunk: a
    (B, T, V) fp32 logits tensor is the largest allocation of a prefill
    program (B=32, T=512, V=32k ⇒ 2 GB, and log_softmax doubled it — this
    OOMed the 16 GB chip at the 4096-slot ring). The slice scan is exact:
    the inter-slice carry is the previous slice's final prelogits row,
    identical to the shift-by-one concatenate it replaces.
    ``want_logprobs=False`` (serving admission, benches) skips the sweep
    entirely and returns zero logprobs.
    """
    hidden, cache = tf.forward(
        params, rope, tokens, seqlens, cache, cfg, attend_cache,
        input_embeds=input_embeds, mesh=mesh, head="none",
    )
    B, T, D = hidden.shape

    def head_fp32(h):  # (B, S, D) -> (B, S, V) fp32 — softmax_fp32 contract
        return (h @ params["output"]).astype(jnp.float32)

    last_idx = jnp.maximum(seqlens - 1, 0)
    h_last = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)
    last = head_fp32(h_last)[:, 0, :]
    last = jnp.where((seqlens > 0)[:, None], last, carry_prelogits)

    if not want_logprobs:
        return jnp.zeros((B, T), jnp.float32), last, cache

    logprobs = _sliced_teacher_logprobs(hidden, tokens, carry_prelogits, head_fp32)
    return logprobs, last, cache


def _sliced_teacher_logprobs(hidden, tokens, carry_prelogits, head_fp32, TS=64):
    """Teacher-forced log P(tokens[t] | …t-1) from final-norm hidden states,
    applying the vocab head ``TS`` positions at a time (scan) so no (B, T, V)
    tensor ever exists. Exact: the inter-slice carry is the previous slice's
    final prelogits row — identical to a shift-by-one over the full tensor."""
    B, T, D = hidden.shape
    TS = min(T, TS)
    n = -(-T // TS)
    pad = n * TS - T
    hp = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0))) if pad else hidden
    tp = jnp.pad(tokens, ((0, 0), (0, pad))) if pad else tokens
    hp = jnp.swapaxes(hp.reshape(B, n, TS, D), 0, 1)  # (n, B, TS, D)
    tp = jnp.swapaxes(tp.reshape(B, n, TS), 0, 1)  # (n, B, TS)

    def slice_step(carry_last, xs):
        h_s, t_s = xs
        pl = head_fp32(h_s)  # (B, TS, V)
        prev = jnp.concatenate([carry_last[:, None, :], pl[:, :-1, :]], axis=1)
        lp = jnp.take_along_axis(
            jax.nn.log_softmax(prev, axis=-1),
            t_s[:, :, None].astype(jnp.int32), axis=-1,
        )[..., 0]
        return pl[:, -1, :], lp

    _, lps = jax.lax.scan(slice_step, carry_prelogits, (hp, tp))
    return jnp.swapaxes(lps, 0, 1).reshape(B, n * TS)[:, :T]


def _decode_block(
    params, rope, prelogits, cache, base_key, step_offset, temps=None,
    live=None, top_ps=None, budget=None, *,
    cfg, n_steps, temperature, top_p, mesh=None,
):
    """Fused n_steps of autoregressive decode in ONE compiled program:
    ``lax.scan`` over [sample → logprob → forward]. The host only sees O(B·n)
    int/float results per block — critical on TPU where per-dispatch latency
    would otherwise dominate decode (the reference instead re-enters Python
    every token, generate.py:125-140, relying on CUDA-graph-free low-latency
    launches).

    ``live`` ((B,) int32 0/1, serving engines): dead slots run with
    seqlens=0, so they never write the ring and their kv_len freezes —
    their bytes stay intact for prefix reuse and their positions bounded.
    generate() itself always passes all-live (the reference keeps decoding
    finished rows until every row finishes, generate.py:129-134).

    ``budget`` ((B,) int32, serving engines, r5): per-row REMAINING token
    budget — a row freezes IN-PROGRAM once the scan counter reaches its
    budget (seqlens 0 from that step on). The pipelined engine dispatches
    block N+1 before block N's events are processed, so host-side liveness
    is one block stale; the in-program cap guarantees a row can never
    write past prompt+max_tokens even then (its ring cannot wrap, keeping
    finished rows valid prefix-cache sources)."""
    B = prelogits.shape[0]
    base_live = jnp.ones((B,), jnp.int32) if live is None else live

    def step(carry, i):
        prelogits, cache = carry
        seqlens = (
            base_live
            if budget is None
            else base_live * (i < budget).astype(jnp.int32)
        )
        key = jax.random.fold_in(base_key, step_offset + i)
        tok = sample(
            prelogits,
            temps if temps is not None else temperature,
            top_ps if top_ps is not None else top_p,
            key,
        )
        lp = jnp.take_along_axis(
            jax.nn.log_softmax(prelogits, axis=-1), tok[:, None], axis=-1
        )[:, 0]
        new_prelogits, cache = tf.forward(
            params, rope, tok[:, None], seqlens, cache, cfg,
            attend_cache=True, mesh=mesh,
        )
        return (new_prelogits[:, 0, :], cache), (tok, lp)

    (prelogits, cache), (toks, lps) = jax.lax.scan(
        step, (prelogits, cache), jnp.arange(n_steps, dtype=jnp.int32)
    )
    return toks, lps, prelogits, cache  # toks/lps: (n_steps, B)


def _get_decode_block(
    model: Transformer, n_steps: int, temperature: float, top_p: float,
    per_row_temps: bool = False,
):
    """per_row_temps=True compiles a block taking a (B,) temperature vector
    as a traced ``temps`` argument plus a (B,) ``live`` mask (serving
    engines batch requests with different sampling settings and dead
    slots)."""
    key = ("decode_block", n_steps, temperature, top_p, per_row_temps)
    if key not in model._jitted:
        from functools import partial

        f = partial(
            _decode_block, cfg=model.cfg, n_steps=n_steps, temperature=temperature,
            top_p=top_p, mesh=model.mesh,
        )
        model._jitted[key] = jax.jit(f, donate_argnames=("cache",))
    return model._jitted[key]


def _get_prefill(
    model: Transformer, attend_cache: bool, with_embeds: bool,
    want_logprobs: bool = True,
):
    key = ("prefill", attend_cache, with_embeds, want_logprobs)
    if key not in model._jitted:
        from functools import partial

        f = partial(
            _prefill_step, cfg=model.cfg, attend_cache=attend_cache,
            mesh=model.mesh, want_logprobs=want_logprobs,
        )
        model._jitted[key] = jax.jit(f, donate_argnames=("cache",))
    return model._jitted[key]


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def generate(
    encoded_prompts: Sequence[Sequence[int]],
    model: Transformer,
    images: Sequence[Sequence[np.ndarray]] = (),
    *,
    max_tokens: int,
    temperature: float,
    chunk_size: Optional[int] = None,
    eos_id: Optional[int] = None,
    seed: int = 0,
    decode_block: int = 32,
    draft_model: Optional[Transformer] = None,
    spec_tokens: int = 4,
) -> Tuple[List[List[int]], List[List[float]]]:
    """Reference-parity generate (generate.py:44-148).

    Returns (generated tokens per row, logprobs per row) where logprobs holds
    the seqlen-1 teacher-forced prompt transitions followed by one entry per
    generated token.

    ``draft_model`` switches decoding to speculative decoding
    (speculative.py): same output tokens, fewer target forwards. A
    Transformer uses draft-model speculation; the string "lookup" (or
    "ngram") uses draft-free prompt-lookup proposals.
    """
    if draft_model is not None:
        assert not any(len(im) > 0 for im in images), (
            "speculative decoding does not take image inputs yet"
        )
        if isinstance(draft_model, str):
            assert draft_model in ("lookup", "ngram"), draft_model
            from mistral_inference_tpu.speculative import generate_lookup

            return generate_lookup(
                encoded_prompts, model, max_tokens=max_tokens,
                temperature=temperature, spec_tokens=spec_tokens,
                chunk_size=chunk_size, eos_id=eos_id, seed=seed,
            )
        from mistral_inference_tpu.speculative import generate_speculative

        return generate_speculative(
            encoded_prompts, model, draft_model, max_tokens=max_tokens,
            temperature=temperature, spec_tokens=spec_tokens,
            chunk_size=chunk_size, eos_id=eos_id, seed=seed,
        )
    B = len(encoded_prompts)
    assert B > 0
    seqlens = [len(p) for p in encoded_prompts]
    assert all(s > 0 for s in seqlens)
    V_args = model.args.vocab_size
    assert all(
        0 <= t < V_args for p in encoded_prompts for t in p
    ), f"prompt token id out of range [0, {V_args})"
    max_prompt_len = max(seqlens)
    V = model.args.vocab_size

    input_embeds = None
    if any(len(im) > 0 for im in images):
        from mistral_inference_tpu.models.vision import embed_multimodal

        # Vision features are computed once for the full prompts; chunked
        # prefill slices the combined embedding matrix per chunk.
        input_embeds = embed_multimodal(model, encoded_prompts, images)

    cache = model.alloc_cache(B, max_prompt_len + max_tokens)

    if chunk_size is None:
        chunk_size = max_prompt_len

    logprobs: List[List[float]] = [[] for _ in range(B)]
    # Host-side inputs route through to_global: in a multi-controller
    # (multi-host) run they become replicated global arrays; on one
    # controller it is a plain jnp.asarray.
    carry = to_global(np.zeros((B, V), np.float32), model.mesh)

    # ---- chunked prefill (reference: generate.py:92-118) ----
    for s in range(0, max_prompt_len, chunk_size):
        first = s == 0
        chunk_lens = np.array([min(max(l - s, 0), chunk_size) for l in seqlens], np.int32)
        chunk_tok = np.zeros((B, chunk_size), np.int32)
        for i, p in enumerate(encoded_prompts):
            row = p[s : s + chunk_size]
            chunk_tok[i, : len(row)] = row

        prefill = _get_prefill(model, attend_cache=not first, with_embeds=input_embeds is not None)
        if input_embeds is not None:
            chunk_embeds = input_embeds[:, s : s + chunk_size]
            if chunk_embeds.shape[1] < chunk_size:
                chunk_embeds = jnp.pad(
                    chunk_embeds,
                    ((0, 0), (0, chunk_size - chunk_embeds.shape[1]), (0, 0)),
                )
            lp_d, carry, cache = prefill(
                model.params, model.rope, to_global(chunk_tok, model.mesh),
                to_global(chunk_lens, model.mesh), cache, carry,
                input_embeds=chunk_embeds,
            )
        else:
            lp_d, carry, cache = prefill(
                model.params, model.rope, to_global(chunk_tok, model.mesh),
                to_global(chunk_lens, model.mesh), cache, carry,
            )
        lp = fetch(lp_d)
        for i in range(B):
            li = int(chunk_lens[i])
            if li == 0:
                continue
            start_t = 1 if first else 0  # t=0 needs a previous-chunk conditional
            logprobs[i].extend(lp[i, start_t:li].tolist())

    # ---- decode (reference: generate.py:120-140) ----
    # Fused blocks: n tokens per device dispatch; the host replays the
    # reference's per-step append/EOS logic on the returned (n, B) arrays, so
    # outputs are identical to a per-token loop (including the reference's
    # sample-then-break-before-append behavior on the all-finished step).
    # PRNGKey(seed) is identical on every process; to_global makes it a
    # replicated global input under a multi-host mesh (legacy uint32 keys).
    base_key = to_global(np.asarray(jax.random.PRNGKey(seed)), model.mesh)
    generated: List[List[int]] = [[] for _ in range(B)]
    is_finished = np.zeros((B,), bool)
    done = 0
    while done < max_tokens:
        n = max_tokens - done if eos_id is None else min(decode_block, max_tokens - done)
        block = _get_decode_block(model, n, temperature, DEFAULT_TOP_P)
        toks_d, lps_d, carry, cache = block(
            model.params, model.rope, carry, cache, base_key, done
        )
        toks = fetch(toks_d)
        lps = fetch(lps_d)
        stop = False
        for t in range(n):
            if eos_id is not None:
                is_finished |= toks[t] == eos_id
                if is_finished.all():
                    stop = True
                    break
            for i in range(B):
                generated[i].append(int(toks[t, i]))
                logprobs[i].append(float(lps[t, i]))
        done += n
        if stop:
            break

    return generated, logprobs


# ---------------------------------------------------------------------------
# Mamba generation (reference: generate.py:12-41 delegates to mamba_ssm's
# CUDA-graph generator; here it's the same fused-block machinery as the
# transformer, driving models/mamba.py's recurrent state)
# ---------------------------------------------------------------------------


def _mamba_prefill_step(params, tokens, seqlens, state, carry_prelogits, *,
                        cfg, chunk, want_logprobs=True):
    """``want_logprobs=False`` (serving admission, r5): skip the
    teacher-forced vocab head over ALL T positions — ~1.1 TF of head
    matmul plus a (B·T, V) fp32 log_softmax per 8x512 admission sweep that
    no caller reads (the transformer prefill has gated this via
    _get_prefill(want_logprobs=...) since r3; Mamba lacked the knob)."""
    from mistral_inference_tpu.models import mamba as mm

    hidden, state = mm.forward(
        params, tokens, seqlens, state, cfg, chunk, head="none"
    )

    def head_fp32(h):
        return mm.apply_head(h, params, cfg)

    last_idx = jnp.maximum(seqlens - 1, 0)
    h_last = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)
    last = head_fp32(h_last)[:, 0, :]
    last = jnp.where((seqlens > 0)[:, None], last, carry_prelogits)
    if want_logprobs:
        logprobs = _sliced_teacher_logprobs(
            hidden, tokens, carry_prelogits, head_fp32
        )
    else:
        logprobs = jnp.zeros((tokens.shape[0], 1), jnp.float32)
    return logprobs, last, state


def _mamba_decode_block(
    params, prelogits, state, base_key, step_offset, temps=None, live=None,
    top_ps=None, budget=None, *,
    cfg, n_steps, temperature, top_p,
):
    """Mamba twin of _decode_block: same temps/live/top_ps/budget serving
    contracts (dead or budget-exhausted slots run with seqlens 0 — the
    masked mixer leaves their recurrent state untouched)."""
    from mistral_inference_tpu.models import mamba as mm

    B = prelogits.shape[0]
    base_live = jnp.ones((B,), jnp.int32) if live is None else live

    def step(carry, i):
        prelogits, state = carry
        seqlens = (
            base_live
            if budget is None
            else base_live * (i < budget).astype(jnp.int32)
        )
        key = jax.random.fold_in(base_key, step_offset + i)
        tok = sample(
            prelogits,
            temps if temps is not None else temperature,
            top_ps if top_ps is not None else top_p,
            key,
        )
        lp = jnp.take_along_axis(
            jax.nn.log_softmax(prelogits, axis=-1), tok[:, None], axis=-1
        )[:, 0]
        new_prelogits, state = mm.forward(
            params, tok[:, None], seqlens, state, cfg, chunk=1
        )
        return (new_prelogits[:, 0, :], state), (tok, lp)

    (prelogits, state), (toks, lps) = jax.lax.scan(
        step, (prelogits, state), jnp.arange(n_steps, dtype=jnp.int32)
    )
    return toks, lps, prelogits, state


def _prefill_mamba(model, encoded_prompts, chunk_size):
    """Chunked Mamba prompt absorption shared by generate_mamba and the
    speculative path: returns (teacher-forced prompt logprobs, last-token
    prelogits, recurrent state)."""
    from functools import partial

    B = len(encoded_prompts)
    seqlens = [len(p) for p in encoded_prompts]
    max_prompt_len = max(seqlens)
    V = model.cfg.vocab_size
    state = model.alloc_state(B)
    if chunk_size is None:
        chunk_size = max_prompt_len

    logprobs: List[List[float]] = [[] for _ in range(B)]
    carry = to_global(np.zeros((B, V), np.float32), model.mesh)

    key = ("mamba_prefill", chunk_size)
    if key not in model._jitted:
        model._jitted[key] = jax.jit(
            partial(_mamba_prefill_step, cfg=model.cfg, chunk=min(128, chunk_size)),
            donate_argnames=("state",),
        )
    prefill = model._jitted[key]

    for s in range(0, max_prompt_len, chunk_size):
        first = s == 0
        chunk_lens = np.array(
            [min(max(l - s, 0), chunk_size) for l in seqlens], np.int32
        )
        chunk_tok = np.zeros((B, chunk_size), np.int32)
        for i, p in enumerate(encoded_prompts):
            row = p[s : s + chunk_size]
            chunk_tok[i, : len(row)] = row
        lp_d, carry, state = prefill(
            model.params, to_global(chunk_tok, model.mesh),
            to_global(chunk_lens, model.mesh), state, carry,
        )
        lp = fetch(lp_d)
        for i in range(B):
            li = int(chunk_lens[i])
            if li == 0:
                continue
            start_t = 1 if first else 0
            logprobs[i].extend(lp[i, start_t:li].tolist())
    return logprobs, carry, state


def generate_mamba(
    encoded_prompts: Sequence[Sequence[int]],
    model: Mamba,
    *,
    max_tokens: int,
    temperature: float,
    chunk_size: Optional[int] = None,
    eos_id: Optional[int] = None,
    seed: int = 0,
    decode_block: int = 32,
    draft_model: Optional[str] = None,
    spec_tokens: int = 8,
) -> Tuple[List[List[int]], List[List[float]]]:
    """Same output contract as ``generate`` (prompt teacher-forced logprobs +
    per-generated-token logprobs). The reference's mamba path returns raw
    logit scores instead of logprobs (generate.py:35-39) and no prompt
    logprobs; this implementation unifies the two paths.

    ``draft_model="lookup"`` (or "ngram") switches to draft-free
    prompt-lookup speculative decoding (speculative.generate_lookup_mamba):
    same greedy output tokens, fewer sequential forwards. Mamba has no
    draft-model mode — a recurrent draft would need its own state rewind;
    n-gram proposals are free."""
    from functools import partial

    if draft_model is not None:
        assert draft_model in ("lookup", "ngram"), (
            f"mamba speculation is draft-free only (got {draft_model!r})"
        )
        from mistral_inference_tpu.speculative import generate_lookup_mamba

        return generate_lookup_mamba(
            encoded_prompts, model, max_tokens=max_tokens,
            temperature=temperature, spec_tokens=spec_tokens,
            chunk_size=chunk_size, eos_id=eos_id, seed=seed,
        )

    B = len(encoded_prompts)
    assert B > 0
    seqlens = [len(p) for p in encoded_prompts]
    assert all(s > 0 for s in seqlens)
    max_prompt_len = max(seqlens)
    V = model.cfg.vocab_size

    logprobs, carry, state = _prefill_mamba(model, encoded_prompts, chunk_size)

    base_key = to_global(np.asarray(jax.random.PRNGKey(seed)), model.mesh)
    generated: List[List[int]] = [[] for _ in range(B)]
    is_finished = np.zeros((B,), bool)
    done = 0
    while done < max_tokens:
        n = max_tokens - done if eos_id is None else min(decode_block, max_tokens - done)
        key = ("mamba_decode", n, temperature)
        if key not in model._jitted:
            model._jitted[key] = jax.jit(
                partial(
                    _mamba_decode_block, cfg=model.cfg, n_steps=n,
                    temperature=temperature, top_p=DEFAULT_TOP_P,
                ),
                donate_argnames=("state",),
            )
        toks_d, lps_d, carry, state = model._jitted[key](
            model.params, carry, state, base_key, done
        )
        toks = fetch(toks_d)
        lps = fetch(lps_d)
        stop = False
        for t in range(n):
            if eos_id is not None:
                is_finished |= toks[t] == eos_id
                if is_finished.all():
                    stop = True
                    break
            for i in range(B):
                generated[i].append(int(toks[t, i]))
                logprobs[i].append(float(lps[t, i]))
        done += n
        if stop:
            break

    return generated, logprobs
