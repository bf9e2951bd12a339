"""utils/profiling: step timers + metrics registry."""

import json
import time

from mistral_inference_tpu.utils.profiling import Metrics, StepTimer


def test_step_timer():
    t = StepTimer()
    t.start()
    time.sleep(0.01)
    t.end_prefill()
    t.start()
    time.sleep(0.02)
    t.end_decode(10)
    assert t.ttft >= 0.01
    assert t.decode_tokens == 10
    assert 0 < t.tokens_per_s < 10_000
    s = t.summary()
    assert set(s) == {"ttft_s", "decode_s", "decode_tokens", "tokens_per_s"}


def test_metrics():
    m = Metrics()
    m.inc("requests")
    m.inc("requests", 2)
    m.set("batch", 8)
    d = json.loads(m.dump())
    assert d["counters"]["requests"] == 3
    assert d["gauges"]["batch"] == 8


def test_lazy_package_exports():
    import mistral_inference_tpu as mit
    import mistral_inference_tpu.generate  # submodule import must not break exports

    assert mit.Transformer is not None
    assert callable(mit.load_tokenizer)
    assert callable(mit.from_folder)
