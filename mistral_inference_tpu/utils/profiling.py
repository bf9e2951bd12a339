"""Tracing / metrics subsystem.

The reference has no profiling at all (SURVEY §5: "Tracing: ABSENT").
Here: a ``jax.profiler`` trace context for XLA/TPU timelines, lightweight
step timers with RTT-aware throughput accounting, and a metrics registry
the generation loop and serving engine publish into.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Wall-clock timing for prefill/decode phases.

    ``tokens_per_s`` uses only decode time; ``ttft`` is the first
    prefill-to-logits latency. Block-level timing amortizes per-dispatch
    latency (important behind high-RTT device transports)."""

    prefill_s: float = 0.0
    decode_s: float = 0.0
    decode_tokens: int = 0
    _t0: float = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def end_prefill(self) -> None:
        self.prefill_s += time.perf_counter() - self._t0

    def end_decode(self, n_tokens: int) -> None:
        self.decode_s += time.perf_counter() - self._t0
        self.decode_tokens += n_tokens

    @property
    def ttft(self) -> float:
        return self.prefill_s

    @property
    def tokens_per_s(self) -> float:
        return self.decode_tokens / self.decode_s if self.decode_s else 0.0

    def summary(self) -> Dict[str, float]:
        return {
            "ttft_s": round(self.prefill_s, 4),
            "decode_s": round(self.decode_s, 4),
            "decode_tokens": self.decode_tokens,
            "tokens_per_s": round(self.tokens_per_s, 2),
        }


class Metrics:
    """Process-wide counters/gauges/latency-samples; JSON-line dumpable."""

    MAX_SAMPLES = 1024  # per-series ring: bounded memory on long-lived servers

    def __init__(self) -> None:
        self.counters: Dict[str, float] = defaultdict(float)
        self.gauges: Dict[str, float] = {}
        self.samples: Dict[str, List[float]] = defaultdict(list)

    def inc(self, name: str, v: float = 1.0) -> None:
        self.counters[name] += v

    def set(self, name: str, v: float) -> None:
        self.gauges[name] = v

    def observe(self, name: str, v: float) -> None:
        """Record a latency/size sample (e.g. per-request TTFT)."""
        s = self.samples[name]
        s.append(v)
        if len(s) > self.MAX_SAMPLES:
            del s[: len(s) - self.MAX_SAMPLES]

    def _pct(self, s: List[float], q: float) -> float:
        return sorted(s)[min(len(s) - 1, int(q * len(s)))]

    def dump(self) -> str:
        stats = {
            name: {
                "count": len(s),
                "p50": round(self._pct(s, 0.5), 4),
                "p90": round(self._pct(s, 0.9), 4),
                "max": round(max(s), 4),
            }
            for name, s in self.samples.items()
            if s
        }
        return json.dumps(
            {"counters": dict(self.counters), "gauges": self.gauges, "stats": stats}
        )


METRICS = Metrics()
