"""Continuous-batching engine for Mamba2 models (Codestral-Mamba).

Same slot-based static-shape design and client contract as
``server.engine.Engine`` (submit / step / cancel / run_to_completion /
StepEvent), so ``server.api.Server`` serves Mamba unchanged — the
reference cannot serve Mamba at all (its deploy story is vLLM, and its
mamba path has no batching beyond one generate() call; reference
generate.py:12-41).

Differences from the transformer engine, all consequences of recurrent
state replacing the ring KV cache:
  * slot state is a MambaState row (conv taps + SSM state); admission
    zeroes reclaimed rows and chunk-prefills with per-row seqlens
    (occupied rows ride along at seqlens 0 — the masked mixer leaves
    their state untouched, the same no-op trick as the transformer's
    validity masks);
  * the live mask freezes dead slots by the same seqlens=0 route;
  * no prefix cache (a slot's state is post-prompt+generation — the
    intermediate prefix state no longer exists to copy);
  * speculative serving is draft-free prompt-lookup only
    (``draft_model="lookup"``): _mamba_lookup_block's seqlens-masked
    commit re-absorbs the accepted prefix instead of rolling back state,
    so no per-token state checkpoints are needed. Draft-model speculation
    stays unsupported (a recurrent draft would need real rewind).
"""

from __future__ import annotations

import itertools
import os
from collections import deque
from typing import Deque, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.generate import DEFAULT_TOP_P
from mistral_inference_tpu.model import Mamba
from mistral_inference_tpu.server.engine import Request, StepEvent
from mistral_inference_tpu.utils.profiling import METRICS


def _reset_rows(state, mask: jnp.ndarray):
    """Zero the batch rows of every state leaf where mask is True. The
    batch axis is 1 for the (L, B, ...) stacked leaves and 0 for seen."""
    from mistral_inference_tpu.models.mamba import MambaState

    def z(x, axis):
        m = mask.reshape([1] * axis + [-1] + [1] * (x.ndim - axis - 1))
        return jnp.where(m, jnp.zeros_like(x), x)

    return MambaState(
        conv_x=z(state.conv_x, 1),
        conv_B=z(state.conv_B, 1),
        conv_C=z(state.conv_C, 1),
        ssm=z(state.ssm, 1),
        seen=jnp.where(mask, 0, state.seen),
    )


class MambaEngine:
    def __init__(
        self,
        model: Mamba,
        batch_size: int,
        max_seq_len: int,
        *,
        temperature: float = 0.0,
        eos_id: Optional[int] = None,
        decode_block: int = 8,
        admit_chunk: int = 512,
        seed: int = 0,
        draft_model: Optional[str] = None,
        spec_tokens: int = 8,
    ):
        self.model = model
        self.B = batch_size
        self.max_seq_len = max_seq_len
        self.temperature = temperature
        self.eos_id = eos_id
        self.decode_block = decode_block
        self.admit_chunk = admit_chunk

        self.state = model.alloc_state(batch_size)
        V = model.cfg.vocab_size
        self.carry = jnp.zeros((batch_size, V), jnp.float32)
        self._temps = jnp.zeros((batch_size,), jnp.float32)
        self._top_ps = jnp.full((batch_size,), DEFAULT_TOP_P, jnp.float32)
        self.slots: List[Optional[Request]] = [None] * batch_size
        self.queue: Deque[Request] = deque()
        self._ids = itertools.count()
        self._key = jax.random.PRNGKey(seed)
        self._step_count = 0
        # Pipelined decode (see step): in-flight block + per-row rid tags.
        self._pending = None
        self._pipeline = os.environ.get("MISTRAL_ENGINE_PIPELINE", "1") == "1"
        # Finished requests whose slot was reused this step (see _request).
        self._evicted: Dict[int, Request] = {}

        # Prompt-lookup speculative serving (see module docstring). Same
        # client contract and host-side emission as Engine._step_spec.
        self.lookup = draft_model is not None
        if self.lookup:
            assert draft_model in ("lookup", "ngram"), (
                f"mamba speculation is draft-free only (got {draft_model!r})"
            )
        self.K = spec_tokens
        if self.lookup:
            self._spec_iters = max(1, decode_block // (spec_tokens + 1))
            span = max_seq_len + self._spec_iters * (spec_tokens + 1) + spec_tokens + 2
            self._hist = jnp.zeros((batch_size, span), jnp.int32)
            self._hlen = jnp.zeros((batch_size,), jnp.int32)
            self._t0 = jnp.zeros((batch_size,), jnp.int32)
            self._spec_done = 0  # cumulative iteration count (RNG stream)
            self._admissions = 0
            self._spec_key, self._t0_key = jax.random.split(
                jax.random.fold_in(self._key, 1)
            )
            self._pending_events: List[StepEvent] = []

    # -- client API (same contract as Engine) -------------------------------

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
        assert len(prompt) > 0
        assert not images, "mamba models are text-only"
        import time

        temp = self.temperature if temperature is None else temperature
        req = Request(
            next(self._ids), list(prompt), max_tokens, temperature=temp,
            top_p=DEFAULT_TOP_P if top_p is None else float(top_p),
            stop_ids=tuple(stop_ids), want_logprobs=want_logprobs,
            t_submit=time.perf_counter(),
        )
        self.queue.append(req)
        return req.request_id

    def cancel(self, request_id: int) -> bool:
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
        results: Dict[int, List[int]] = {}
        while self.has_work:
            for ev in self.step():
                if ev.finished:
                    results[ev.request_id] = self._result(ev.request_id)
        return results

    def _result(self, request_id: int) -> List[int]:
        return self._request(request_id).generated

    def _request(self, request_id: int) -> Request:
        for s in self.slots:
            if s is not None and s.request_id == request_id:
                return s
        # Pipelined steps admit BEFORE the caller reads the step's events:
        # a finished request's slot may already be reused — evicted requests
        # stay resolvable until the next step (engine.py precedent).
        if request_id in self._evicted:
            return self._evicted[request_id]
        raise KeyError(request_id)

    # -- internals -----------------------------------------------------------

    def _admit(self) -> None:
        import time

        from functools import partial

        from mistral_inference_tpu.generate import _mamba_prefill_step

        new: List[Tuple[int, Request]] = []
        for i in range(self.B):
            if (self.slots[i] is None or self.slots[i].done) and self.queue:
                if self.slots[i] is not None:
                    self._evicted[self.slots[i].request_id] = self.slots[i]
                self.slots[i] = self.queue.popleft()
                new.append((i, self.slots[i]))
        if not new:
            return
        if self._pending is not None:
            # Sync the in-flight decode block before the admission timer
            # starts — decode time must not be charged to
            # admission_prefill_s (engine.py._admit precedent).
            jax.block_until_ready(self._pending[0])
        t_admit = time.perf_counter()

        maxT = max(len(r.prompt) for _, r in new)
        width = 16
        while width < min(maxT, self.admit_chunk):
            width *= 2

        temps = np.array(self._temps)
        tops = np.array(self._top_ps)
        reset = np.zeros((self.B,), bool)
        for i, r in new:
            temps[i] = r.temperature
            tops[i] = r.top_p
            reset[i] = True
        self._temps = jnp.asarray(temps)
        self._top_ps = jnp.asarray(tops)
        self.state = _reset_rows(self.state, jnp.asarray(reset))

        want_lp = any(r.want_logprobs for _, r in new)
        key = ("mamba_admit", width, want_lp)
        if key not in self.model._jitted:
            self.model._jitted[key] = jax.jit(
                partial(
                    _mamba_prefill_step, cfg=self.model.cfg,
                    chunk=min(128, width), want_logprobs=want_lp,
                ),
                donate_argnames=("state",),
            )
        prefill = self.model._jitted[key]
        for s in range(0, maxT, width):
            tokens = np.zeros((self.B, width), np.int32)
            seqlens = np.zeros((self.B,), np.int32)
            for i, r in new:
                row = r.prompt[s : s + width]
                tokens[i, : len(row)] = row
                seqlens[i] = len(row)
            lp_d, self.carry, self.state = prefill(
                self.model.params, jnp.asarray(tokens), jnp.asarray(seqlens),
                self.state, self.carry,
            )
            if want_lp:
                lp = np.asarray(lp_d)
                for i, r in new:
                    if not r.want_logprobs:
                        continue
                    li = int(seqlens[i])
                    if li == 0:
                        continue
                    start_t = 1 if s == 0 else 0
                    r.prompt_logprobs.extend(lp[i, start_t:li].tolist())

        if self.lookup:
            self._admit_spec(new)

        # Drain the device queue before observing (engine.py precedent):
        # prefill dispatch is async — without this sync its DEVICE time
        # (~0.4 s/sweep at 8x512 tokens) was charged to whatever blocked
        # next, understating admission 8x and overstating the serving
        # bench's decode split.
        jax.block_until_ready(self.carry)
        METRICS.observe("admission_prefill_s", time.perf_counter() - t_admit)
        METRICS.inc("requests_admitted", len(new))

    def _admit_spec(self, new) -> None:
        """Lookup-mode admission tail (mirror of Engine._admit_spec): load
        each new row's token history, sample its first token from the
        prefill carry — the spec loop's invariant needs t0 = a correct
        token not yet absorbed into the state — and emit it as a pending
        event (TTFT becomes admission-time)."""
        import time

        from mistral_inference_tpu.server.engine import _t0_update

        key = jax.random.fold_in(self._t0_key, self._admissions)
        self._admissions += 1
        mask = np.zeros((self.B,), bool)
        for i, _ in new:
            mask[i] = True
        # One jitted program for the t0 tail — the eager sampler cost
        # ~1.7 s/sweep through the tunnel (engine.py _t0_update).
        self._t0, t0_all, lp_all = _t0_update(
            self.carry, self._temps, self._top_ps, key,
            jnp.asarray(mask), self._t0,
        )
        # one batched transfer (4 fetches = 4 tunnel RTTs otherwise)
        t0_h, hist, hlen, lp_h = jax.device_get(
            (t0_all, self._hist, self._hlen, lp_all)
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
                self._pending_events.append(StepEvent(r.request_id, tok, True, lp))
            else:
                self._pending_events.append(StepEvent(r.request_id, tok, False, lp))

    def _live(self) -> jnp.ndarray:
        return jnp.asarray(
            np.array(
                [s is not None and not s.done for s in self.slots], np.int32
            )
        )

    def _block_size(self) -> int:
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
        """Pipelined exactly like Engine.step (r5, VERDICT r4 #4): dispatch
        block N+1 before fanning out block N's host events; per-row
        request-id tags make stale rows droppable after slot reuse.
        ``MISTRAL_ENGINE_PIPELINE=0`` restores the serial order."""
        self._evicted.clear()
        if self.lookup:
            return self._step_spec()

        if not self._pipeline:
            self._admit()
            if not any(s is not None and not s.done for s in self.slots):
                return []
            self._dispatch_block()
            pending, self._pending = self._pending, None
            return self._drain_one(pending)

        prev, self._pending = self._pending, None
        if any(r > 0 for r in self._remaining(prev)):
            self._dispatch_block(prev)  # installs the new in-flight block
        events = self._drain_one(prev)
        self._admit()
        return events

    def _remaining(self, prev) -> list:
        """Per-row remaining-token budgets minus tokens in flight for THIS
        request only (engine.py._remaining — blanket prev_n froze freshly
        admitted short requests early)."""
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
        from functools import partial

        from mistral_inference_tpu.generate import _mamba_decode_block

        n = self._block_size()
        key = ("mamba_serve_decode", n)
        if key not in self.model._jitted:
            self.model._jitted[key] = jax.jit(
                partial(
                    _mamba_decode_block, cfg=self.model.cfg, n_steps=n,
                    temperature=0.0, top_p=DEFAULT_TOP_P,
                ),
                donate_argnames=("state",),
            )
        budget = jnp.asarray(np.array(self._remaining(prev), np.int32))
        toks_d, lps_d, self.carry, self.state = self.model._jitted[key](
            self.model.params, self.carry, self.state, self._key,
            self._step_count, self._temps, self._live(), self._top_ps,
            budget,
        )
        self._step_count += n
        rids = [
            s.request_id if (s is not None and not s.done) else None
            for s in self.slots
        ]
        self._pending = (toks_d, lps_d, n, rids)

    def _drain_one(self, pending) -> List[StepEvent]:
        import time

        if pending is None:
            return []
        toks_d, lps_d, n, rids = pending
        # One batched transfer: each host fetch through the axon tunnel
        # costs a full round trip (engine.py step precedent).
        toks, lps = jax.device_get((toks_d, lps_d))
        now = time.perf_counter()

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
        for i, slot in enumerate(self.slots):
            if slot is None or slot.done or not bad[i]:
                continue
            slot.done = True
            slot.error = "numerical failure: NaN logits in decode"
            METRICS.inc("numerical_failures")
            events.append(StepEvent(slot.request_id, -1, True, 0.0))

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

    def _step_spec(self) -> List[StepEvent]:
        """Prompt-lookup decode step: one fused block of _spec_iters
        [propose -> verify -> seqlens-masked commit] iterations; each live
        slot emits 1..K+1 tokens per iteration (mirror of
        Engine._step_spec's host loop)."""
        import time

        from functools import partial

        from mistral_inference_tpu.speculative import _mamba_lookup_block

        # Admission runs AFTER the block dispatch (Engine._step_spec r5):
        # planning + prefill overlap the in-flight block; rid tags guard
        # slot reuse.
        rids = [
            s.request_id if (s is not None and not s.done) else None
            for s in self.slots
        ]
        if not any(r is not None for r in rids):
            self._admit()
            events = self._pending_events
            self._pending_events = []
            return events

        key = ("mamba_lookup_block", self.K, self._spec_iters, True)
        if key not in self.model._jitted:
            self.model._jitted[key] = jax.jit(
                partial(
                    _mamba_lookup_block, cfg=self.model.cfg, K=self.K,
                    n_iters=self._spec_iters, temperature=0.0,
                    top_p=DEFAULT_TOP_P, ngram=2,
                ),
                donate_argnames=("state", "hist"),
            )
        out = self.model._jitted[key](
            self.model.params, self._t0, self.state, self._hist, self._hlen,
            self._spec_key, jnp.int32(self._spec_done), self._temps,
            self._live(), self._top_ps,
        )
        self._t0, self.state, self._hist, self._hlen = out[:4]
        emits, lps, accepts = out[4:]
        self._spec_done += self._spec_iters
        self._admit()  # overlaps the in-flight block
        events = self._pending_events
        self._pending_events = []
        emits_h, lps_h, acc_h = jax.device_get((emits, lps, accepts))
        now = time.perf_counter()

        valid = np.array(
            [
                rids[i] is not None
                and self.slots[i] is not None
                and self.slots[i].request_id == rids[i]
                for i in range(self.B)
            ]
        )
        bad = np.isnan(lps_h).any(axis=(0, 2)) & valid
        for i, slot in enumerate(self.slots):
            if slot is None or slot.done or not bad[i]:
                continue
            slot.done = True
            slot.error = "numerical failure: NaN logits in decode"
            METRICS.inc("numerical_failures")
            events.append(StepEvent(slot.request_id, -1, True, 0.0))

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
