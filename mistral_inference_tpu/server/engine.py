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


@dataclass
class StepEvent:
    request_id: int
    token: int
    finished: bool
    logprob: float = 0.0


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
    ):
        self.model = model
        self.B = batch_size
        self.max_seq_len = max_seq_len
        self.temperature = temperature
        self.eos_id = eos_id
        self.decode_block = decode_block
        self.admit_chunk = admit_chunk

        self.cache: KVCache = model.alloc_cache(batch_size, max_seq_len)
        self.carry = jnp.zeros((batch_size, model.args.vocab_size), jnp.float32)
        self._temps = jnp.zeros((batch_size,), jnp.float32)
        self.slots: List[Optional[Request]] = [None] * batch_size
        self.queue: Deque[Request] = deque()
        self._ids = itertools.count()
        self._key = jax.random.PRNGKey(seed)
        self._step_count = 0

    # -- client API ---------------------------------------------------------

    def submit(
        self,
        prompt: Sequence[int],
        max_tokens: int = 256,
        temperature: Optional[float] = None,
        images: Sequence = (),
        want_logprobs: bool = False,
    ) -> int:
        """temperature=None inherits the engine default; per-request values
        are honored within one batched decode (vectorized sampling).
        ``images``: preprocessed (3, H, W) arrays matching the prompt's
        [IMG] token grids (images.encode_user_content output)."""
        assert len(prompt) > 0
        assert len(prompt) + max_tokens <= self.max_seq_len, "request exceeds max_seq_len"
        if images:
            assert self.model.args.vision_encoder is not None, "text-only model"
        import time

        temp = self.temperature if temperature is None else temperature
        req = Request(
            next(self._ids), list(prompt), max_tokens, temperature=temp,
            images=list(images), want_logprobs=want_logprobs,
            t_submit=time.perf_counter(),
        )
        self.queue.append(req)
        return req.request_id

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
        for i in range(self.B):
            if (self.slots[i] is None or self.slots[i].done) and self.queue:
                self.slots[i] = self.queue.popleft()
                new.append((i, self.slots[i]))
        if not new:
            return
        t_admit = time.perf_counter()

        maxT = max(len(r.prompt) for _, r in new)
        # Power-of-two chunk width, capped: short prompts compile narrow
        # programs, long prompts reuse the single admit_chunk-wide program.
        width = 16
        while width < min(maxT, self.admit_chunk):
            width *= 2

        temps = np.array(self._temps)  # copy: np.asarray views are read-only
        reset = np.zeros((self.B,), bool)
        for i, r in new:
            temps[i] = r.temperature
            reset[i] = True
        self._temps = jnp.asarray(temps)

        # reset kv_len for reclaimed rows — stale ring data becomes invisible
        self.cache = KVCache(
            k=self.cache.k,
            v=self.cache.v,
            kv_len=jnp.where(jnp.asarray(reset), 0, self.cache.kv_len),
            windows=self.cache.windows,
            k_scale=self.cache.k_scale,
            v_scale=self.cache.v_scale,
        )

        # Vision features are computed once over the full prompts; chunked
        # prefill slices the combined embedding matrix (mirrors generate()).
        with_embeds = any(r.images for _, r in new)
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
        prefill = _get_prefill(
            self.model, attend_cache=True, with_embeds=with_embeds,
            want_logprobs=want_lp,
        )
        for s in range(0, maxT, width):
            tokens = np.zeros((self.B, width), np.int32)
            seqlens = np.zeros((self.B,), np.int32)
            for i, r in new:
                row = r.prompt[s : s + width]
                tokens[i, : len(row)] = row
                seqlens[i] = len(row)
            pf_args = [
                self.model.params, self.model.rope, jnp.asarray(tokens),
                jnp.asarray(seqlens), self.cache, self.carry,
            ]
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

        METRICS.observe("admission_prefill_s", time.perf_counter() - t_admit)
        METRICS.inc("requests_admitted", len(new))

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
        """Admit waiting requests, decode one block, emit per-slot tokens."""
        import time

        self._admit()
        if not any(s is not None and not s.done for s in self.slots):
            return []

        n = self._block_size()
        decode = _get_decode_block(
            self.model, n, self.temperature, DEFAULT_TOP_P, per_row_temps=True
        )
        toks_d, lps_d, self.carry, self.cache = decode(
            self.model.params, self.model.rope, self.carry, self.cache,
            self._key, self._step_count, self._temps,
        )
        self._step_count += n
        toks = np.asarray(toks_d)  # (n, B)
        lps = np.asarray(lps_d)
        now = time.perf_counter()

        events: List[StepEvent] = []
        for t in range(n):
            for i, slot in enumerate(self.slots):
                if slot is None or slot.done:
                    continue
                tok = int(toks[t, i])
                lp = float(lps[t, i])
                if not slot.generated and slot.t_submit:
                    slot.t_first_token = now
                    METRICS.observe("ttft_s", now - slot.t_submit)
                hit_eos = self.eos_id is not None and tok == self.eos_id
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

        # Freeze dead rows: done/empty slots keep decoding garbage inside the
        # fused block (static shapes), but their kv_len must not advance
        # without bound — a long-lived server would walk positions past the
        # 128k RoPE table (ADVICE r1). Resetting to 0 here keeps dead-row
        # positions ≤ decode_block between resets and makes reuse free.
        dead = np.array(
            [s is None or s.done for s in self.slots], bool
        )
        if dead.any():
            self.cache = KVCache(
                k=self.cache.k,
                v=self.cache.v,
                kv_len=jnp.where(jnp.asarray(dead), 0, self.cache.kv_len),
                windows=self.cache.windows,
                k_scale=self.cache.k_scale,
                v_scale=self.cache.v_scale,
            )
        return events
