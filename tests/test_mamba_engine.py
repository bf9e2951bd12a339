"""Mamba serving engine: outputs must equal standalone generate_mamba for
each request, with slot isolation under staggered admission — the
reference cannot serve (or even batch-recycle) Mamba at all."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.generate import generate_mamba
from mistral_inference_tpu.model import Mamba
from mistral_inference_tpu.server.mamba_engine import MambaEngine

from test_mamba import tiny_mamba_args

PROMPTS = [
    [1, 5, 9, 13, 17, 21],
    [2, 6, 10],
    [3, 7, 11, 15, 19, 23, 27],
    [4, 8],
]


def _reference(model, prompts, max_tokens):
    return [
        generate_mamba([p], model, max_tokens=max_tokens, temperature=0.0)[0][0]
        for p in prompts
    ]


def test_mamba_engine_matches_generate():
    model = Mamba.random(tiny_mamba_args(), dtype=jnp.float32, seed=42)
    ref = _reference(model, PROMPTS[:2], 6)

    eng = MambaEngine(model, batch_size=2, max_seq_len=64, temperature=0.0)
    ids = [eng.submit(p, max_tokens=6) for p in PROMPTS[:2]]
    results = eng.run_to_completion()
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect


def test_mamba_engine_staggered_and_state_isolation():
    """More requests than slots: recycled slots carry RESET recurrent state
    — outputs must match isolated generation exactly."""
    model = Mamba.random(tiny_mamba_args(), dtype=jnp.float32, seed=7)
    ref = _reference(model, PROMPTS, 5)

    eng = MambaEngine(
        model, batch_size=2, max_seq_len=64, temperature=0.0, decode_block=4
    )
    ids = [eng.submit(p, max_tokens=5) for p in PROMPTS]
    results = eng.run_to_completion()
    assert len(results) == len(PROMPTS)
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect


def test_mamba_engine_eos_stop_and_logprobs():
    model = Mamba.random(tiny_mamba_args(), dtype=jnp.float32, seed=3)
    gen, lps = generate_mamba(
        [PROMPTS[0]], model, max_tokens=8, temperature=0.0
    )
    eos = gen[0][3]
    eng = MambaEngine(
        model, batch_size=1, max_seq_len=64, temperature=0.0, eos_id=eos
    )
    rid = eng.submit(PROMPTS[0], max_tokens=8, want_logprobs=True)
    results = eng.run_to_completion()
    assert results[rid] == gen[0][:3]
    req = eng._request(rid)
    assert len(req.prompt_logprobs) == len(PROMPTS[0]) - 1
    np.testing.assert_allclose(
        req.prompt_logprobs, lps[0][: len(PROMPTS[0]) - 1], atol=1e-4, rtol=0
    )


def test_mamba_engine_http_server():
    """The HTTP API serves a MambaEngine unchanged (same contract)."""
    from mistral_inference_tpu.server.api import Server, _make_handler

    class DummyTok:
        bos_id, eos_id = 1, 2

        def encode(self, text, bos=True, eos=False):
            ids = [3 + (ord(c) % 100) for c in text][:16] or [5]
            return ([self.bos_id] if bos else []) + ids

        def decode(self, ids):
            return " ".join(map(str, ids))

    model = Mamba.random(tiny_mamba_args(), dtype=jnp.float32, seed=42)
    eng = MambaEngine(model, batch_size=2, max_seq_len=64, temperature=0.0)
    srv = Server(eng, DummyTok())
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(srv))
    srv.start()
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    req = urllib.request.Request(
        url + "/v1/completions",
        data=json.dumps({"prompt": "hello", "max_tokens": 5}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    httpd.shutdown()
    srv.stop()
    assert len(out["choices"][0]["tokens"]) == 5


def test_mamba_engine_quantized():
    """Continuous batching over an int8-quantized Mamba: engine results must
    equal standalone generate_mamba on the same quantized model."""
    model = Mamba.random(tiny_mamba_args(), dtype=jnp.float32, seed=42)
    model.quantize("int8")
    ref = _reference(model, PROMPTS[:3], 5)
    eng = MambaEngine(model, batch_size=2, max_seq_len=64, temperature=0.0)
    ids = [eng.submit(p, max_tokens=5) for p in PROMPTS[:3]]
    results = eng.run_to_completion()
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect


def test_mamba_engine_lookup_matches_generate():
    """Prompt-lookup speculative serving: greedy outputs must equal the
    plain engine / standalone generate_mamba exactly (speculation only
    changes how many fused forwards it takes)."""
    model = Mamba.random(tiny_mamba_args(), dtype=jnp.float32, seed=42)
    ref = _reference(model, PROMPTS[:2], 6)
    eng = MambaEngine(
        model, batch_size=2, max_seq_len=64, temperature=0.0,
        draft_model="lookup", spec_tokens=3,
    )
    ids = [eng.submit(p, max_tokens=6) for p in PROMPTS[:2]]
    results = eng.run_to_completion()
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect


def test_mamba_engine_lookup_staggered_and_eos():
    """Slot recycling under lookup serving: recycled slots reset both the
    recurrent state AND the lookup history; EOS truncates mid-block."""
    model = Mamba.random(tiny_mamba_args(), dtype=jnp.float32, seed=7)
    ref = _reference(model, PROMPTS, 5)
    eos = ref[0][2]
    eng = MambaEngine(
        model, batch_size=2, max_seq_len=64, temperature=0.0,
        draft_model="lookup", spec_tokens=2, eos_id=eos,
    )
    ids = [eng.submit(p, max_tokens=5) for p in PROMPTS]
    results = eng.run_to_completion()
    assert len(results) == len(PROMPTS)
    for rid, expect in zip(ids, ref):
        cut = expect.index(eos) if eos in expect else len(expect)
        assert results[rid] == expect[:cut]


def test_mamba_engine_lookup_mixed_temperatures():
    """Greedy and sampled requests share one lookup batch: greedy rows must
    still match standalone greedy decode exactly."""
    model = Mamba.random(tiny_mamba_args(), dtype=jnp.float32, seed=9)
    ref = _reference(model, [PROMPTS[0]], 6)[0]
    eng = MambaEngine(
        model, batch_size=2, max_seq_len=64, temperature=0.0,
        draft_model="lookup", spec_tokens=2,
    )
    rid_g = eng.submit(PROMPTS[0], max_tokens=6, temperature=0.0)
    rid_s = eng.submit(PROMPTS[1], max_tokens=6, temperature=0.9)
    results = eng.run_to_completion()
    assert results[rid_g] == ref
    assert len(results[rid_s]) == 6


def test_mamba_engine_pipeline_staggered_budgets():
    """Per-row in-flight accounting (engine.py._remaining): staggered
    max_tokens force slot reuse while blocks are in flight; every
    request's output must equal isolated generation."""
    model = Mamba.random(tiny_mamba_args(), dtype=jnp.float32, seed=29)
    lens = [3, 9, 5, 7]
    refs = []
    for p, n in zip(PROMPTS[:4], lens):
        g, _ = generate_mamba([p], model, max_tokens=n, temperature=0.0)
        refs.append(g[0])
    eng = MambaEngine(model, batch_size=2, max_seq_len=64, temperature=0.0,
                      decode_block=4)
    ids = [eng.submit(p, max_tokens=n) for p, n in zip(PROMPTS[:4], lens)]
    results = eng.run_to_completion()
    for rid, expect in zip(ids, refs):
        assert results[rid] == expect
