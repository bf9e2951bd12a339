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
    intermediate prefix state no longer exists to copy) and no
    speculative mode (rolling back recurrent state would need per-token
    state checkpoints, which at Mamba2 state sizes defeats the point).
"""

from __future__ import annotations

import itertools
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
        raise KeyError(request_id)

    # -- internals -----------------------------------------------------------

    def _admit(self) -> None:
        import time

        from functools import partial

        from mistral_inference_tpu.generate import _mamba_prefill_step

        new: List[Tuple[int, Request]] = []
        for i in range(self.B):
            if (self.slots[i] is None or self.slots[i].done) and self.queue:
                self.slots[i] = self.queue.popleft()
                new.append((i, self.slots[i]))
        if not new:
            return
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

        key = ("mamba_admit", width)
        if key not in self.model._jitted:
            self.model._jitted[key] = jax.jit(
                partial(
                    _mamba_prefill_step, cfg=self.model.cfg,
                    chunk=min(128, width),
                ),
                donate_argnames=("state",),
            )
        prefill = self.model._jitted[key]
        want_lp = any(r.want_logprobs for _, r in new)
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

        METRICS.observe("admission_prefill_s", time.perf_counter() - t_admit)
        METRICS.inc("requests_admitted", len(new))

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
        import time

        from functools import partial

        from mistral_inference_tpu.generate import _mamba_decode_block

        self._admit()
        if not any(s is not None and not s.done for s in self.slots):
            return []

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
        toks_d, lps_d, self.carry, self.state = self.model._jitted[key](
            self.model.params, self.carry, self.state, self._key,
            self._step_count, self._temps, self._live(), self._top_ps,
        )
        self._step_count += n
        toks = np.asarray(toks_d)
        lps = np.asarray(lps_d)
        now = time.perf_counter()

        events: List[StepEvent] = []
        bad = np.isnan(lps).any(axis=0)
        for i, slot in enumerate(self.slots):
            if slot is None or slot.done or not bad[i]:
                continue
            slot.done = True
            slot.error = "numerical failure: NaN logits in decode"
            METRICS.inc("numerical_failures")
            events.append(StepEvent(slot.request_id, -1, True, 0.0))

        for t in range(n):
            for i, slot in enumerate(self.slots):
                if slot is None or slot.done:
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
