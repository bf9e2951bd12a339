"""Continuous-batching serving engine (slot-based, static shapes).

New capability vs the reference, whose only batching is one static
``generate()`` call (reference: generate.py:44-148) and whose deploy story
shells out to vLLM (reference: deploy/entrypoint.sh:11). SURVEY §7 step 7.

TPU-native design: the compiled programs never change shape —
  * a fixed slot batch B; each slot owns one row of the ring KV cache
    (per-slot ``kv_len`` already lives in the cache);
  * **admission** runs the normal prefill program with per-row seqlens where
    occupied slots get 0 (their rows are no-ops: validity masks drop both
    attention writes and cache writes, and the carry logits pass through);
    freed slots just reset ``kv_len`` — stale ring contents become
    invisible because slot validity is derived from ``kv_len``;
  * **decode** is the same fused n-token block as generate(); finished slots
    keep decoding garbage until reused (static shapes beat ragged
    bookkeeping on TPU — the row costs nothing extra in the fused step).

The engine is host-side control logic only; all O(model) work stays in the
two jitted programs. SPMD-safe by construction: admission decisions are pure
functions of (queue, slot states) which every host replicates.
"""

from __future__ import annotations

import itertools
import os
from collections import deque
from dataclasses import dataclass, field
from typing import Deque, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.cache import KVCache
from mistral_inference_tpu.generate import DEFAULT_TOP_P, _get_decode_block, _get_prefill
from mistral_inference_tpu.utils.profiling import METRICS
from mistral_inference_tpu.model import Transformer


@dataclass
class Request:
    request_id: int
    prompt: List[int]
    max_tokens: int
    temperature: float = 0.0
    top_p: float = 0.8  # reference decode-loop default (generate.py:126)
    # Any of these token ids finishes the request (like extra EOS ids; the
    # matched token is not appended). Multi-token stop STRINGS are handled
    # by the HTTP layer (text matching + cancel).
    stop_ids: Tuple[int, ...] = ()
    images: List = field(default_factory=list)  # preprocessed (3, H, W) arrays
    generated: List[int] = field(default_factory=list)
    # teacher-forced prompt transitions (len(prompt)-1 entries) + one entry
    # per generated token — the generate() logprob contract, now in serving
    prompt_logprobs: List[float] = field(default_factory=list)
    gen_logprobs: List[float] = field(default_factory=list)
    # Prompt logprobs cost a vocab-head sweep over every prefill position;
    # requests that don't ask for them shouldn't pay it (admission batches
    # sharing a prefill pay it if ANY member wants them).
    want_logprobs: bool = False
    t_submit: float = 0.0
    t_first_token: float = 0.0
    done: bool = False
    # Numerical-failure detection: set when the slot's logits went NaN —
    # the request fails loudly (HTTP 500) instead of streaming garbage,
    # and the slot is freed for reuse (admission re-prefills its carry).
    error: Optional[str] = None


@dataclass
class StepEvent:
    request_id: int
    token: int
    finished: bool
    logprob: float = 0.0


@jax.jit
def _t0_update(carry, temps, top_ps, key, mask, t0_prev):
    """Speculative-admission t0 tail in ONE compiled program: sample each
    row's first token from the target carry, its logprob, and merge into
    the resident t0 vector. Eager execution of this tail cost ~1.7 s per
    admission sweep through the axon tunnel (dozens of per-op dispatches
    for the radix top-p sampler) — the dominant term of the r4
    speculative-serving regression (VERDICT r4 weak #1)."""
    from mistral_inference_tpu.generate import sample  # noqa: PLC0415

    t0_all = sample(carry, temps, top_ps, key)
    lp_all = jnp.take_along_axis(
        jax.nn.log_softmax(carry, axis=-1), t0_all[:, None], axis=-1
    )[:, 0]
    return jnp.where(mask, t0_all, t0_prev), t0_all, lp_all


class Engine:
    def __init__(
        self,
        model: Transformer,
        batch_size: int,
        max_seq_len: int,
        *,
        temperature: float = 0.0,
        eos_id: Optional[int] = None,
        decode_block: int = 8,
        admit_chunk: int = 512,
        seed: int = 0,
        draft_model: Optional[Transformer] = None,
        spec_tokens: int = 4,
        prefix_cache: bool = True,
        prefix_min: int = 16,
        admit_waterline: Optional[int] = None,
        staging_batch: Optional[int] = None,
    ):
        self.model = model
        self.B = batch_size
        self.max_seq_len = max_seq_len
        self.temperature = temperature
        self.eos_id = eos_id
        self.decode_block = decode_block
        self.admit_chunk = admit_chunk
        # Admission batching: an admission sweep runs full-batch prefill
        # chunks whose device cost is ~independent of HOW MANY rows are
        # new (occupied rows ride along at seqlens=0), so admitting freed
        # slots one at a time under load pays a whole prompt-length
        # prefill per request. Wait until min(queued, waterline) slots
        # are free before sweeping; 1 restores eager admission. The r4
        # serving bench measured speculative mode (whose rows finish at
        # staggered times, unlike greedy lockstep) spending ~2x the plain
        # engine's time in admission sweeps through this effect.
        self.admit_waterline = (
            max(1, batch_size // 8) if admit_waterline is None
            else max(1, admit_waterline)
        )
        # Proportional-cost admission (cache.adopt_rows): sweeps admitting
        # <= staging_batch rows prefill in a narrow staging cache and
        # whole-row-adopt into the main one, so a trickle admission costs
        # ~B_s/B of a full sweep instead of a full one. The staging cache
        # (same ring geometry, B_s rows ~= +B_s/B of KV memory) is
        # allocated lazily on the first staged sweep. 0 disables.
        self._staging_B = (
            max(1, batch_size // 8) if staging_batch is None
            else max(0, staging_batch)
        )
        if self._staging_B >= batch_size:
            self._staging_B = 0
        self._stage_cache: Optional[KVCache] = None

        # Speculative engines need a wider ring (span, below) — compute the
        # target width BEFORE allocating so the cache is allocated exactly
        # once (ADVICE r3: alloc-at-max_seq_len then re-alloc-at-span held
        # both rings live transiently, ~2x KV footprint at startup).
        self.lookup = isinstance(draft_model, str)
        if self.lookup:
            assert draft_model in ("lookup", "ngram"), draft_model
            draft_model = None
        self.draft = draft_model
        self.K = spec_tokens
        self._spec = self.lookup or draft_model is not None
        if self._spec and admit_waterline is None:
            # Speculative rows finish STAGGERED (variable accepted tokens
            # per iteration), so eager per-slot admission fires a ~1 s
            # sweep per freed slot — 7 sweeps vs greedy lockstep's 3 at
            # B=8 was the r4 end-to-end spec regression's main term
            # (serving_b8 instrumented runs). Batch re-admissions harder
            # by default in spec mode.
            self.admit_waterline = max(2, batch_size // 4)
        if self._spec and staging_batch is None and self._staging_B:
            # A waterline-sized spec re-admission sweep should take the
            # proportional-cost staging path, not a full-batch prefill:
            # with the default staging_B (B//8) below the spec waterline
            # (B//4), every re-admission ran at full-sweep cost — the
            # residual term of the r4 spec regression (r5 serving_b8: 6
            # sweeps x ~0.6 s against plain's 3, decode split already
            # +35%). Size staging to the waterline so the common sweep
            # costs ~waterline/B of a full one. +1: one long spec block
            # (several multi-token iterations) often frees waterline+1
            # rows at once (measured at B=8: the repetitive config's
            # sweeps all admitted 3 and skipped a width-2 staging path).
            self._staging_B = min(batch_size - 1, self.admit_waterline + 1)
        self._spec_fused = False
        span = max_seq_len
        if self._spec:
            # ≥1 token per iteration per block keeps per-step emission close
            # to the plain engine's decode_block contract.
            self._spec_iters = max(1, decode_block // (spec_tokens + 1))
            slack = self._spec_iters * (spec_tokens + 1) + spec_tokens + 2
            span = max_seq_len + slack

        self.cache: KVCache = model.alloc_cache(batch_size, span)
        self.carry = jnp.zeros((batch_size, model.args.vocab_size), jnp.float32)
        self._temps = jnp.zeros((batch_size,), jnp.float32)
        self._top_ps = jnp.full((batch_size,), DEFAULT_TOP_P, jnp.float32)
        self.slots: List[Optional[Request]] = [None] * batch_size
        self.queue: Deque[Request] = deque()
        self._ids = itertools.count()
        self._key = jax.random.PRNGKey(seed)
        self._step_count = 0
        # Pipelined decode (see step): the in-flight block's device arrays
        # + width + per-row request-id tags, drained one step later.
        self._pending = None
        self._pipeline = os.environ.get("MISTRAL_ENGINE_PIPELINE", "1") == "1"
        # Finished requests whose slot was reused this step (see _request):
        # pipelined steps admit before the caller reads the step's events.
        self._evicted: Dict[int, Request] = {}

        # Prefix cache (beyond reference; the reference's cache is
        # per-generate-call only): each slot's ring retains its admitted
        # prompt's K/V bytes — dead slots no longer write (see _live) — so
        # a new request sharing a prompt prefix with any resident slot
        # copies those ring slots instead of re-prefilling them. Exact:
        # the copied bytes are what a fresh prefill would write.
        self.prefix_cache = prefix_cache
        self.prefix_min = prefix_min
        self._slot_prompt: List[Optional[List[int]]] = [None] * batch_size
        self._min_window = int(np.min(np.asarray(self.cache.windows)))

        # Speculative serving (speculative.py): decode steps become fused
        # [propose K -> verify -> commit] iterations. Each live slot
        # advances 1..spec_tokens+1 tokens per iteration; the host loop
        # below handles the ragged emission. Per-request temperatures are
        # honored (greedy rows take the match rule, sampled rows lossless
        # rejection). draft_model is a Transformer (draft speculation) or
        # the string "lookup"/"ngram" (draft-free prompt-lookup proposals).
        if self._spec:
            # Fused in-ring verify (fused_verify_chunk_attention): needs a
            # TARGET ring that can never wrap — positions are bounded by
            # span (admission asserts prompt+max_tokens <= max_seq_len;
            # in-block overshoot past max_tokens is < slack), hence the
            # span-wide target cache allocated above, and every per-layer
            # window must cover it. Sliding-window models whose window is
            # smaller fall back to the no-write verify + scatter commit.
            # The gate is speculative._spec_fused_ok — the ONE site that
            # owns the fused-verify preconditions (ADVICE r3: an inline
            # re-implementation here could silently diverge from it).
            from mistral_inference_tpu.speculative import _spec_fused_ok

            self._spec_fused = _spec_fused_ok(
                model, self.cache, spec_tokens, span
            )
            if draft_model is not None:
                assert draft_model.args.vocab_size == model.args.vocab_size
                dw = draft_model.args.sliding_window
                dws = [
                    w for w in (dw if isinstance(dw, list) else [dw])
                    if w is not None
                ]
                assert not dws or min(dws) >= span, (
                    f"draft sliding window {dws} < {span}: the draft ring "
                    "would wrap, making speculative rewind unsafe — use a "
                    "full-context draft model"
                )
                self.dcache: KVCache = draft_model.alloc_cache(batch_size, span)
                self.dcarry = jnp.zeros(
                    (batch_size, model.args.vocab_size), jnp.float32
                )
            if self.lookup:
                self._hist = jnp.zeros((batch_size, span), jnp.int32)
                self._hlen = jnp.zeros((batch_size,), jnp.int32)
            self._t0 = jnp.zeros((batch_size,), jnp.int32)
            self._spec_done = 0  # cumulative iteration count (RNG stream)
            self._admissions = 0
            self._spec_key, self._t0_key = jax.random.split(
                jax.random.fold_in(self._key, 1)
            )
            self._pending_events: List[StepEvent] = []

    # -- client API ---------------------------------------------------------

    def submit(
        self,
        prompt: Sequence[int],
        max_tokens: int = 256,
        temperature: Optional[float] = None,
        images: Sequence = (),
        want_logprobs: bool = False,
        top_p: Optional[float] = None,
        stop_ids: Sequence[int] = (),
    ) -> int:
        """temperature/top_p=None inherit the engine defaults; per-request
        values are honored within one batched decode (vectorized sampling).
        ``images``: preprocessed (3, H, W) arrays matching the prompt's
        [IMG] token grids (images.encode_user_content output). ``stop_ids``:
        extra stop tokens beyond eos_id (matched token not emitted)."""
        assert len(prompt) > 0
        assert len(prompt) + max_tokens <= self.max_seq_len, "request exceeds max_seq_len"
        if images:
            assert self.model.args.vision_encoder is not None, "text-only model"
        import time

        temp = self.temperature if temperature is None else temperature
        req = Request(
            next(self._ids), list(prompt), max_tokens, temperature=temp,
            top_p=DEFAULT_TOP_P if top_p is None else float(top_p),
            stop_ids=tuple(stop_ids),
            images=list(images), want_logprobs=want_logprobs,
            t_submit=time.perf_counter(),
        )
        self.queue.append(req)
        return req.request_id

    def cancel(self, request_id: int) -> bool:
        """Finish a live request early (client disconnect, stop-string
        match). The slot frees for reuse; queued requests are removed."""
        for i, r in enumerate(list(self.queue)):
            if r.request_id == request_id:
                del self.queue[i]
                return True
        for s in self.slots:
            if s is not None and s.request_id == request_id and not s.done:
                s.done = True
                return True
        return False

    @property
    def has_work(self) -> bool:
        return bool(self.queue) or any(
            s is not None and not s.done for s in self.slots
        )

    def run_to_completion(self) -> Dict[int, List[int]]:
        """Drain queue + slots; returns {request_id: generated tokens}."""
        results: Dict[int, List[int]] = {}
        while self.has_work:
            for ev in self.step():
                if ev.finished:
                    results[ev.request_id] = self._result(ev.request_id)
        return results

    # -- engine internals ---------------------------------------------------

    def _result(self, request_id: int) -> List[int]:
        return self._request(request_id).generated

    def _request(self, request_id: int) -> Request:
        for s in self.slots:
            if s is not None and s.request_id == request_id:
                return s
        # A finished request's slot may have been reused by this step's
        # admission before the caller read the step's events; evicted
        # requests stay resolvable until the next step.
        if request_id in self._evicted:
            return self._evicted[request_id]
        raise KeyError(request_id)

    def _admit(self) -> None:
        """Fill free slots from the queue, then prefill the new rows in
        fixed-width chunks (occupied rows ride along with seqlens=0).

        Chunking (reference contract: generate.py:92-118) bounds compiled
        program width: a 32k prompt runs max_seq_len/admit_chunk passes of
        one admit_chunk-wide program instead of compiling a 32k-wide one.
        Teacher-forced prompt logprobs are collected per chunk — the same
        numbers generate() returns."""
        import time

        new: List[Tuple[int, Request]] = []
        free = [
            i for i in range(self.B)
            if self.slots[i] is None or self.slots[i].done
        ]
        # Batched admission (see admit_waterline in __init__): defer the
        # sweep until enough slots have freed to amortize its full-batch
        # prefill cost — unless nothing is running, in which case waiting
        # would deadlock progress.
        any_live = any(
            s is not None and not s.done for s in self.slots
        )
        if (
            self.queue
            and any_live
            and len(free) < min(len(self.queue), self.admit_waterline)
        ):
            return
        while free and self.queue:
            r = self.queue.popleft()
            empties = [i for i in free if self.slots[i] is None]
            if empties:
                i = empties[0]
            else:
                # Evicting a done slot destroys its ring as a prefix
                # source — pick the one least useful for THIS request.
                def _common(i):
                    src = self._slot_prompt[i] or []
                    q = 0
                    while q < min(len(src), len(r.prompt)) and src[q] == r.prompt[q]:
                        q += 1
                    return q

                i = min(free, key=_common)
            free.remove(i)
            if self.slots[i] is not None:
                self._evicted[self.slots[i].request_id] = self.slots[i]
            self.slots[i] = r
            new.append((i, r))
        if not new:
            return
        if self._pending is not None:
            # Pipelined mode: an in-flight decode block precedes this
            # admission on the device queue (and _plan_prefix_reuse's
            # kv_len fetch would transparently wait for it anyway). Sync
            # it BEFORE starting the admission timer so decode time isn't
            # charged to admission_prefill_s (the serving bench's
            # wall-minus-admission split).
            jax.block_until_ready(self._pending[0])
        t_admit = time.perf_counter()

        offs, copies = self._plan_prefix_reuse(new)
        maxT = max(len(r.prompt) - offs.get(i, 0) for i, r in new)
        # Power-of-two chunk width, capped: short prompts compile narrow
        # programs, long prompts reuse the single admit_chunk-wide program.
        width = 16
        while width < min(maxT, self.admit_chunk):
            width *= 2

        temps = np.array(self._temps)  # copy: np.asarray views are read-only
        tops = np.array(self._top_ps)
        reset = np.zeros((self.B,), bool)
        for i, r in new:
            temps[i] = r.temperature
            tops[i] = r.top_p
            reset[i] = True
        self._temps = jnp.asarray(temps)
        self._top_ps = jnp.asarray(tops)

        # reset kv_len for reclaimed rows — stale ring data becomes invisible
        self.cache = KVCache(
            k=self.cache.k,
            v=self.cache.v,
            kv_len=jnp.where(jnp.asarray(reset), 0, self.cache.kv_len),
            windows=self.cache.windows,
            k_scale=self.cache.k_scale,
            v_scale=self.cache.v_scale,
        )
        if self.draft is not None:
            self.dcache = KVCache(
                k=self.dcache.k,
                v=self.dcache.v,
                kv_len=jnp.where(jnp.asarray(reset), 0, self.dcache.kv_len),
                windows=self.dcache.windows,
                k_scale=self.dcache.k_scale,
                v_scale=self.dcache.v_scale,
            )
        self._apply_prefix_copies(copies)
        for i, r in new:  # registry AFTER planning: this wave can't self-source
            self._slot_prompt[i] = list(r.prompt)

        # Vision features are computed once over the full prompts; chunked
        # prefill slices the combined embedding matrix (mirrors generate()).
        with_embeds = any(r.images for _, r in new)

        # Proportional-cost trickle admission: few new rows, no prefix
        # copies (adoption would race the in-place row merges), text-only,
        # no draft cache to mirror => prefill at staging width and adopt.
        if (
            self._staging_B
            and len(new) <= self._staging_B
            and not copies
            and not with_embeds
            and self.draft is None
        ):
            self._admit_staged(new, maxT, width)
            t_stage = time.perf_counter()
            METRICS.observe("admission_staged_s", t_stage - t_admit)
            if self._spec:
                self._admit_spec(new, maxT, width, offs)
                METRICS.observe(
                    "admission_spec_s", time.perf_counter() - t_stage
                )
            jax.block_until_ready(self.carry)
            METRICS.observe(
                "admission_prefill_s", time.perf_counter() - t_admit
            )
            METRICS.inc("requests_admitted", len(new))
            METRICS.inc("staged_admissions", 1)
            return

        input_embeds = None
        if with_embeds:
            from mistral_inference_tpu.models.vision import embed_multimodal

            prompts = [[] for _ in range(self.B)]
            imgs = [[] for _ in range(self.B)]
            for i, r in new:
                prompts[i] = r.prompt
                imgs[i] = r.images
            input_embeds = embed_multimodal(self.model, prompts, imgs)

        want_lp = any(r.want_logprobs for _, r in new)

        def _prefill_for(chunk_start: int):
            # The FIRST chunk of a fresh admission attends an EMPTY ring
            # (new slots were just reset; dead rows run with seqlens 0 and
            # write nothing), so the ring-attending program variant's extra
            # attention work (+35% measured at B=32/512-token sweeps) buys
            # nothing — use the plain in-chunk program. Later chunks, and
            # any sweep with prefix-cache hits (pre-populated rings), need
            # attend_cache=True.
            return _get_prefill(
                self.model,
                attend_cache=chunk_start > 0 or bool(offs),
                with_embeds=with_embeds,
                want_logprobs=want_lp,
            )

        for s in range(0, maxT, width):
            tokens = np.zeros((self.B, width), np.int32)
            seqlens = np.zeros((self.B,), np.int32)
            for i, r in new:
                base = offs.get(i, 0)  # prefix-cache hit: prefill suffix only
                row = r.prompt[base + s : base + s + width]
                tokens[i, : len(row)] = row
                seqlens[i] = len(row)
            pf_args = [
                self.model.params, self.model.rope, jnp.asarray(tokens),
                jnp.asarray(seqlens), self.cache, self.carry,
            ]
            prefill = _prefill_for(s)
            if with_embeds:
                chunk_embeds = input_embeds[:, s : s + width]
                if chunk_embeds.shape[1] < width:
                    chunk_embeds = jnp.pad(
                        chunk_embeds,
                        ((0, 0), (0, width - chunk_embeds.shape[1]), (0, 0)),
                    )
                lp_d, self.carry, self.cache = prefill(
                    *pf_args, input_embeds=chunk_embeds
                )
            else:
                lp_d, self.carry, self.cache = prefill(*pf_args)
            if want_lp:
                lp = np.asarray(lp_d)
                for i, r in new:
                    if not r.want_logprobs:
                        continue
                    li = int(seqlens[i])
                    if li == 0:
                        continue
                    start_t = 1 if s == 0 else 0  # t=0: no prior conditional
                    r.prompt_logprobs.extend(lp[i, start_t:li].tolist())

        if self._spec:
            t_spec = time.perf_counter()
            METRICS.observe("admission_full_prefill_s", t_spec - t_admit)
            self._admit_spec(new, maxT, width, offs)
            METRICS.observe("admission_spec_s", time.perf_counter() - t_spec)

        # Drain the device queue before observing: prefill dispatch is
        # async, and without a sync its device time leaks into whatever
        # op next blocks (the serving bench's decode split was charging
        # admission work to decode).
        jax.block_until_ready(self.carry)
        METRICS.observe("admission_prefill_s", time.perf_counter() - t_admit)
        METRICS.inc("requests_admitted", len(new))

    def _admit_staged(self, new, maxT, width) -> None:
        """Trickle-admission fast path: prefill the <= staging_batch new
        rows at staging width, then whole-row-adopt them into the main
        cache (cache.adopt_rows — exact bytes: the adopted ring/carry is
        bit-identical to the staging prefill's output). The staging
        prefill itself runs at B_s rather than B, which on TPU bf16 can
        round matmul accumulations differently than a full-batch sweep —
        the same class of fp variation as any admit_chunk width choice;
        exactness contracts are CPU-fp32 scoped (tests/test_engine.py).
        Callers checked: no prefix copies, no images, no draft cache."""
        from mistral_inference_tpu.cache import adopt_rows

        Bs = self._staging_B
        V = self.model.args.vocab_size
        if self._stage_cache is None:
            self._stage_cache = self.model.alloc_cache(Bs, self.cache.size)
        sc = self._stage_cache
        # Fresh rows: stale staging ring bytes are invisible at kv_len 0.
        sc = KVCache(
            k=sc.k, v=sc.v, kv_len=jnp.zeros((Bs,), jnp.int32),
            windows=sc.windows, k_scale=sc.k_scale, v_scale=sc.v_scale,
        )
        scarry = jnp.zeros((Bs, V), jnp.float32)
        want_lp = any(r.want_logprobs for _, r in new)
        for s in range(0, maxT, width):
            # The staging ring is freshly reset (kv_len 0, no prefix copies
            # reach this path), so the first chunk attends an empty ring —
            # the plain in-chunk program skips that wasted attention work
            # (+35% on the sweep; see _admit's full-batch path).
            prefill = _get_prefill(
                self.model, attend_cache=s > 0, with_embeds=False,
                want_logprobs=want_lp,
            )
            tokens = np.zeros((Bs, width), np.int32)
            seqlens = np.zeros((Bs,), np.int32)
            for j, (_, r) in enumerate(new):
                row = r.prompt[s : s + width]
                tokens[j, : len(row)] = row
                seqlens[j] = len(row)
            lp_d, scarry, sc = prefill(
                self.model.params, self.model.rope, jnp.asarray(tokens),
                jnp.asarray(seqlens), sc, scarry,
            )
            if want_lp:
                lp = np.asarray(lp_d)
                for j, (_, r) in enumerate(new):
                    if not r.want_logprobs:
                        continue
                    li = int(seqlens[j])
                    if li == 0:
                        continue
                    start_t = 1 if s == 0 else 0  # t=0: no prior conditional
                    r.prompt_logprobs.extend(lp[j, start_t:li].tolist())
        self._stage_cache = sc
        src = np.arange(Bs, dtype=np.int32)
        dst = np.full((Bs,), self.B, np.int32)  # B = out of range: dropped
        for j, (i, _) in enumerate(new):
            dst[j] = i
        self.cache, self.carry = adopt_rows(
            self.cache, self.carry, sc, scarry,
            jnp.asarray(src), jnp.asarray(dst),
        )

    def _admit_spec(self, new, maxT, width, offs) -> None:
        """Speculative-mode admission tail: prime the proposer state (the
        draft cache gets the same prompts; lookup mode loads each row's
        token history), then sample each new row's first token from the
        target carry — the spec loop's invariant needs t0 = a correct
        token whose K/V is in NEITHER cache. The first token is emitted
        here (pending events), so TTFT is an admission-time quantity."""
        import time

        assert not any(r.images for _, r in new), (
            "speculative serving is text-only"
        )
        if self.draft is not None:
            prefill = _get_prefill(
                self.draft, attend_cache=True, with_embeds=False,
                want_logprobs=False,
            )
            for s in range(0, maxT, width):
                tokens = np.zeros((self.B, width), np.int32)
                seqlens = np.zeros((self.B,), np.int32)
                for i, r in new:
                    base = offs.get(i, 0)
                    row = r.prompt[base + s : base + s + width]
                    tokens[i, : len(row)] = row
                    seqlens[i] = len(row)
                _, self.dcarry, self.dcache = prefill(
                    self.draft.params, self.draft.rope, jnp.asarray(tokens),
                    jnp.asarray(seqlens), self.dcache, self.dcarry,
                )

        key = jax.random.fold_in(self._t0_key, self._admissions)
        self._admissions += 1
        mask = np.zeros((self.B,), bool)
        for i, _ in new:
            mask[i] = True
        # ONE jitted program for the whole t0 tail (r5): the eager version
        # built the per-row sampler op by op through the tunnel — dozens of
        # ~28 ms dispatches, measured ~1.7 s PER SWEEP and 12.2 of the
        # 13.9 s total spec admission at B=8 (serving_b8 instrumented run).
        self._t0, t0_all, lp_all = _t0_update(
            self.carry, self._temps, self._top_ps, key,
            jnp.asarray(mask), self._t0,
        )
        if self.lookup:
            # Load each new row's token history (prompt + t0) for the
            # n-gram proposer — including any prefix-cached region, which
            # is exactly where lookup matches pay off. One batched fetch
            # (each host round trip costs a full tunnel RTT).
            t0_h, lp_h, hist, hlen = jax.device_get(
                (t0_all, lp_all, self._hist, self._hlen)
            )
            hist = np.array(hist)
            hlen = np.array(hlen)
            for i, r in new:
                hist[i, :] = 0
                hist[i, : len(r.prompt)] = r.prompt
                hist[i, len(r.prompt)] = int(t0_h[i])
                hlen[i] = len(r.prompt) + 1
            self._hist = jnp.asarray(hist)
            self._hlen = jnp.asarray(hlen)
        else:
            t0_h, lp_h = jax.device_get((t0_all, lp_all))
        now = time.perf_counter()
        for i, r in new:
            tok, lp = int(t0_h[i]), float(lp_h[i])
            r.t_first_token = now
            if r.t_submit:
                METRICS.observe("ttft_s", now - r.t_submit)
            hit_eos = self.eos_id is not None and tok == self.eos_id
            if not hit_eos:
                r.generated.append(tok)
                r.gen_logprobs.append(lp)
            if hit_eos or len(r.generated) >= r.max_tokens:
                r.done = True
                self._pending_events.append(
                    StepEvent(r.request_id, tok, True, lp)
                )
            else:
                self._pending_events.append(
                    StepEvent(r.request_id, tok, False, lp)
                )

    def _plan_prefix_reuse(self, new) -> Tuple[Dict[int, int], List[Tuple[int, int, int]]]:
        """For each new request, find the resident slot sharing the longest
        prompt prefix whose ring bytes are still intact. Returns
        ({dst_slot: offset}, [(src, dst, q)]).

        Validity: positions [0, q) live in slots [0, q) iff the source ring
        never wrapped — checked against its kv_len high-water (dead slots
        are frozen by _live, so finished requests stay reusable). Rows that
        want prompt logprobs skip reuse (the copied region's teacher-forced
        logprobs were never computed for THIS request)."""
        offs: Dict[int, int] = {}
        copies: List[Tuple[int, int, int]] = []
        if not self.prefix_cache or not new:
            return offs, copies
        if any(r.images for _, r in new):
            # Multimodal admission chunks slice a shared embedding matrix
            # positionally; per-row offsets would misalign it. Skip reuse
            # for the whole wave.
            return offs, copies
        kvlen = np.asarray(self.cache.kv_len)
        dsts = {i for i, _ in new}
        for i, r in new:
            if r.want_logprobs or r.images:
                continue
            best_j, best_q = -1, 0
            for j in range(self.B):
                if j == i or self._slot_prompt[j] is None:
                    continue
                if kvlen[j] > self._min_window:
                    continue  # source ring wrapped: low slots clobbered
                src = self._slot_prompt[j]
                q = 0
                limit = min(len(src), len(r.prompt) - 1, self._min_window)
                while q < limit and src[q] == r.prompt[q]:
                    q += 1
                # Prefer sources outside this admission wave (no ordering
                # constraints); same-wave sources are handled below.
                if q > best_q or (q == best_q and best_j in dsts and j not in dsts):
                    best_j, best_q = j, q
            if best_q >= self.prefix_min:
                offs[i] = best_q
                copies.append((best_j, i, best_q))

        # A same-wave source's OLD bytes must be read before any copy
        # overwrites them: a copy may run only once no pending copy still
        # READS its destination row. Break cycles by dropping the
        # smallest-q copy (its dst falls back to a full prefill).
        ordered: List[Tuple[int, int, int]] = []
        pending = list(copies)
        while pending:
            pend_srcs = {s for s, _, _ in pending}
            ready = [c for c in pending if c[1] not in pend_srcs]
            if not ready:
                drop = min(pending, key=lambda c: c[2])
                pending.remove(drop)
                offs.pop(drop[1], None)
                continue
            for c in ready:
                ordered.append(c)
                pending.remove(c)
        return offs, ordered

    def _apply_prefix_copies(self, copies) -> None:
        if not copies:
            return
        from mistral_inference_tpu.cache import copy_prefix_rows

        # Pad to a power-of-two bucket: a handful of compiled programs cover
        # every wave size, and the whole wave commits in ONE donated call
        # (per-copy dispatch costs ~28 ms tunnel RTT each; see
        # cache.copy_prefix_rows).
        n = 1
        while n < len(copies):
            n *= 2
        padded = list(copies) + [(0, 0, 0)] * (n - len(copies))
        srcs, dsts, qs = (
            jnp.asarray(col, jnp.int32) for col in zip(*padded)
        )
        self.cache = copy_prefix_rows(self.cache, srcs, dsts, qs)
        if self.draft is not None:
            self.dcache = copy_prefix_rows(self.dcache, srcs, dsts, qs)
        for _src, _dst, q in copies:
            METRICS.inc("prefix_hits")
            METRICS.inc("prefix_tokens_reused", q)

    def _block_size(self) -> int:
        """Adaptive decode-block width: when every live slot is near its
        token budget, shrink to the smallest power of two that covers the
        longest remaining request — finished batches stop burning full
        blocks of dead compute (VERDICT r1). Program count stays bounded:
        one compile per power of two ≤ decode_block."""
        max_rem = max(
            (s.max_tokens - len(s.generated))
            for s in self.slots
            if s is not None and not s.done
        )
        n = 1
        while n < min(self.decode_block, max_rem):
            n *= 2
        return min(n, self.decode_block)

    def step(self) -> List[StepEvent]:
        """Admit waiting requests, decode one block, emit per-slot tokens.

        Pipelined (r5, VERDICT r4 #4): the next decode block is DISPATCHED
        before the previous block's results are fetched and fanned out, so
        per-block host work (the ~28 ms tunnel fetch, token/EOS
        bookkeeping, admission planning) overlaps the chip's next block
        instead of serializing with it — the measured 20% engine-vs-raw
        decode gap was exactly this host glue (serving_r4b.log A/B).
        Cost: slot liveness at dispatch is one block stale — rows that
        finished in the in-flight block decode one extra block whose
        tokens are dropped at drain (per-row request-id tags make the drop
        exact; a freed-and-reused slot can never inherit stale tokens).
        ``MISTRAL_ENGINE_PIPELINE=0`` restores the serial order."""
        self._evicted.clear()
        if self._spec:
            return self._step_spec()

        if not self._pipeline:
            self._admit()
            if not any(s is not None and not s.done for s in self.slots):
                return []
            self._dispatch_block()
            return self._drain_pending()

        # Dispatch first (stale-by-one-block liveness), then process the
        # PREVIOUS block's events while the chip runs this one, then admit
        # with fresh slot states (prefill programs queue behind the block
        # via cache/carry data dependencies). Skip the dispatch when no row
        # can outlive the in-flight block (max_tokens is an exact upper
        # bound — EOS only finishes rows EARLIER), so a lockstep tail never
        # burns a whole garbage block.
        prev, self._pending = self._pending, None
        if any(r > 0 for r in self._remaining(prev)):
            self._dispatch_block(prev)  # installs the new in-flight block
        events = self._drain_one(prev)
        self._admit()
        return events

    def _remaining(self, prev) -> list:
        """Per-row remaining-token budgets for the NEXT block, minus tokens
        already in flight for THIS request. The in-flight width is
        subtracted ONLY when the slot still belongs to the request the
        block was dispatched for — a row admitted after that dispatch has
        nothing in flight (the block's output for its slot is rid-dropped
        at drain), and subtracting blanket prev_n froze fresh short
        requests early (caught by
        test_engine_pipeline_stale_block_never_leaks)."""
        prev_n = prev[2] if prev is not None else 0
        prev_rids = prev[3] if prev is not None else [None] * self.B
        out = []
        for i, s in enumerate(self.slots):
            if s is None or s.done:
                out.append(0)
                continue
            ahead = prev_n if prev_rids[i] == s.request_id else 0
            out.append(max(0, s.max_tokens - len(s.generated) - ahead))
        return out

    def _dispatch_block(self, prev=None) -> None:
        """Dispatch one fused decode block asynchronously; record it with
        per-row request ids (the drain-time validity tags). ``prev`` is the
        still-pending previous block (per-row in-flight accounting — the
        in-program budgets freeze each row's ring/kv_len the moment its
        budget is spent, so pipelined overshoot can never wrap a finished
        row's ring nor write past prompt+max_tokens)."""
        n = self._block_size()
        decode = _get_decode_block(
            self.model, n, self.temperature, DEFAULT_TOP_P, per_row_temps=True
        )
        budget = jnp.asarray(np.array(self._remaining(prev), np.int32))
        toks_d, lps_d, self.carry, self.cache = decode(
            self.model.params, self.model.rope, self.carry, self.cache,
            self._key, self._step_count, self._temps, self._live(),
            self._top_ps, budget,
        )
        self._step_count += n
        rids = [
            s.request_id if (s is not None and not s.done) else None
            for s in self.slots
        ]
        self._pending = (toks_d, lps_d, n, rids)

    def _drain_pending(self) -> List[StepEvent]:
        prev, self._pending = self._pending, None
        return self._drain_one(prev)

    def _drain_one(self, pending) -> List[StepEvent]:
        import time

        if pending is None:
            return []
        toks_d, lps_d, n, rids = pending
        # One batched transfer: through the axon tunnel each host fetch
        # costs a full round trip, so fetch both arrays in one device_get.
        toks, lps = jax.device_get((toks_d, lps_d))  # (n, B) each
        now = time.perf_counter()

        # A row is valid only while the slot still belongs to the request
        # that was live at dispatch — a slot freed and re-admitted between
        # dispatch and drain must not receive the stale block's tokens.
        valid = np.array(
            [
                rids[i] is not None
                and self.slots[i] is not None
                and self.slots[i].request_id == rids[i]
                for i in range(self.B)
            ]
        )
        events: List[StepEvent] = []
        bad = np.isnan(lps).any(axis=0) & valid
        events.extend(self._fail_nan_rows(bad, now))
        for t in range(n):
            for i, slot in enumerate(self.slots):
                if slot is None or slot.done or not valid[i]:
                    continue
                tok = int(toks[t, i])
                lp = float(lps[t, i])
                if not slot.generated and slot.t_submit:
                    slot.t_first_token = now
                    METRICS.observe("ttft_s", now - slot.t_submit)
                hit_eos = (
                    self.eos_id is not None and tok == self.eos_id
                ) or tok in slot.stop_ids
                if not hit_eos:
                    slot.generated.append(tok)
                    slot.gen_logprobs.append(lp)
                if hit_eos or len(slot.generated) >= slot.max_tokens:
                    slot.done = True
                    if slot.t_submit:
                        METRICS.observe("request_latency_s", now - slot.t_submit)
                    events.append(StepEvent(slot.request_id, tok, True, lp))
                else:
                    events.append(StepEvent(slot.request_id, tok, False, lp))

        return events

    def _fail_nan_rows(self, bad, now) -> List[StepEvent]:
        """Fail any live slot whose block produced NaN logprobs (poisoned
        logits): finish the request with an error instead of emitting
        garbage forever. The freed slot's carry is re-prefilled on reuse."""
        events: List[StepEvent] = []
        if not bad.any():
            return events
        for i, slot in enumerate(self.slots):
            if slot is None or slot.done or not bad[i]:
                continue
            slot.done = True
            slot.error = "numerical failure: NaN logits in decode"
            METRICS.inc("numerical_failures")
            if slot.t_submit:
                METRICS.observe("request_latency_s", now - slot.t_submit)
            events.append(StepEvent(slot.request_id, -1, True, 0.0))
        return events

    def _live(self) -> jnp.ndarray:
        """(B,) 0/1 — dead slots run fused blocks with seqlens 0: no ring
        writes (bytes stay intact for prefix reuse) and kv_len frozen
        (bounded positions — the ADVICE r1 unbounded-growth fix, without
        the old reset-to-0 which clobbered low ring slots with garbage)."""
        return jnp.asarray(
            np.array(
                [s is not None and not s.done for s in self.slots], np.int32
            )
        )

    def _step_spec(self) -> List[StepEvent]:
        """Speculative decode step: one fused block of _spec_iters
        [draft -> verify -> commit] iterations; each live slot emits
        1..K+1 tokens per iteration (its accepted drafts + the target's
        bonus/fallback token).

        Admission runs AFTER the block is dispatched (r5): its host-side
        planning and its prefill programs (queued behind the block via the
        cache/carry/t0 data deps) overlap the chip's spec iterations
        instead of serializing with them — admission was the whole r4
        end-to-end spec regression. Per-row request-id tags captured at
        dispatch keep a freed-and-reused slot from absorbing the in-flight
        block's emissions; rows the block ran for were marked live at
        dispatch, so a slot freed by the PREVIOUS drain ran frozen
        (live=0) and writes nothing."""
        import time

        rids = [
            s.request_id if (s is not None and not s.done) else None
            for s in self.slots
        ]
        have_live = any(r is not None for r in rids)
        if not have_live:
            self._admit()
            events = self._pending_events
            self._pending_events = []
            return events

        if self.lookup:
            from functools import partial

            from mistral_inference_tpu.speculative import _lookup_block

            key = ("lookup_block", self.K, self._spec_iters, True,
                   self._spec_fused)
            if key not in self.model._jitted:
                self.model._jitted[key] = jax.jit(
                    partial(
                        _lookup_block, cfg_t=self.model.cfg, K=self.K,
                        n_iters=self._spec_iters, temperature=0.0,
                        top_p=DEFAULT_TOP_P, ngram=2, mesh_t=self.model.mesh,
                        spec_fused=self._spec_fused,
                    ),
                    donate_argnames=("tcache", "hist"),
                )
            out = self.model._jitted[key](
                self.model.params, self.model.rope, self._t0, self.cache,
                self._hist, self._hlen, self._spec_key,
                jnp.int32(self._spec_done), self._temps, self._live(),
                self._top_ps,
            )
            self._t0, self.cache, self._hist, self._hlen = out[:4]
            emits, lps, accepts = out[4:]
        else:
            from mistral_inference_tpu.speculative import _get_spec_block

            block = _get_spec_block(
                self.model, self.draft, self.K, self._spec_iters, 0.0,
                DEFAULT_TOP_P, per_row_temps=True,
                spec_fused=self._spec_fused,
            )
            self._t0, self.cache, self.dcache, emits, lps, accepts = block(
                self.model.params, self.draft.params, self.model.rope,
                self.draft.rope, self._t0, self.cache, self.dcache,
                self._spec_key, jnp.int32(self._spec_done), self._temps,
                self._live(), self._top_ps,
            )
        self._spec_done += self._spec_iters
        # Admission overlaps the in-flight block (see docstring); its
        # first-token events join this step's output.
        self._admit()
        events = self._pending_events
        self._pending_events = []
        # One batched transfer (single tunnel round trip for all three).
        emits_h, lps_h, acc_h = jax.device_get(
            (emits, lps, accepts)
        )  # (n_iters, B, K+1) x2, (n_iters, B)
        now = time.perf_counter()
        valid = np.array(
            [
                rids[i] is not None
                and self.slots[i] is not None
                and self.slots[i].request_id == rids[i]
                for i in range(self.B)
            ]
        )
        events.extend(
            self._fail_nan_rows(np.isnan(lps_h).any(axis=(0, 2)) & valid, now)
        )
        total_emitted = 0
        total_iter_rows = 0

        for it in range(emits_h.shape[0]):
            for i, slot in enumerate(self.slots):
                if slot is None or slot.done or not valid[i]:
                    continue
                total_iter_rows += 1
                for j in range(int(acc_h[it, i]) + 1):
                    tok = int(emits_h[it, i, j])
                    lp = float(lps_h[it, i, j])
                    total_emitted += 1
                    hit_eos = (
                        self.eos_id is not None and tok == self.eos_id
                    ) or tok in slot.stop_ids
                    if not hit_eos:
                        slot.generated.append(tok)
                        slot.gen_logprobs.append(lp)
                    if hit_eos or len(slot.generated) >= slot.max_tokens:
                        slot.done = True
                        if slot.t_submit:
                            METRICS.observe(
                                "request_latency_s", now - slot.t_submit
                            )
                        events.append(StepEvent(slot.request_id, tok, True, lp))
                        break
                    events.append(StepEvent(slot.request_id, tok, False, lp))

        if total_iter_rows:
            METRICS.observe(
                "spec_tokens_per_forward", total_emitted / total_iter_rows
            )
        return events
