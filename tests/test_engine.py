"""Continuous-batching engine tests: outputs must equal standalone
generate() for each request, including under staggered admission — slots
must be perfectly isolated."""

import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.generate import generate
from mistral_inference_tpu.model import Transformer
from mistral_inference_tpu.server.engine import Engine

from test_generate import tiny_args

PROMPTS = [
    [1, 5, 9, 13, 17, 21],
    [2, 6, 10],
    [3, 7, 11, 15, 19, 23, 27],
    [4, 8],
    [9, 9, 9, 1],
]


def _reference_outputs(model, prompts, max_tokens):
    outs = []
    for p in prompts:
        g, _ = generate([p], model, max_tokens=max_tokens, temperature=0.0)
        outs.append(g[0])
    return outs


def test_engine_matches_generate():
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    ref = _reference_outputs(model, PROMPTS[:3], 6)

    eng = Engine(model, batch_size=3, max_seq_len=64, temperature=0.0)
    ids = [eng.submit(p, max_tokens=6) for p in PROMPTS[:3]]
    results = eng.run_to_completion()
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect


def test_engine_staggered_admission():
    """More requests than slots: later requests ride recycled slots whose
    rings hold stale data — outputs must still match isolated generation."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=7)
    ref = _reference_outputs(model, PROMPTS, 5)

    eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0, decode_block=4)
    ids = [eng.submit(p, max_tokens=5) for p in PROMPTS]
    results = eng.run_to_completion()
    assert len(results) == len(PROMPTS)
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect


def test_engine_mid_run_submit():
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=3)
    ref = _reference_outputs(model, PROMPTS[:2], 6)

    eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0, decode_block=2)
    id0 = eng.submit(PROMPTS[0], max_tokens=6)
    eng.step()  # r0 alone for a couple of tokens
    id1 = eng.submit(PROMPTS[1], max_tokens=6)
    results = eng.run_to_completion()
    assert results[id0] == ref[0]
    assert results[id1] == ref[1]


def test_engine_eos():
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    g, _ = generate([PROMPTS[0]], model, max_tokens=8, temperature=0.0)
    eos = g[0][3]
    eng = Engine(model, batch_size=1, max_seq_len=64, temperature=0.0, eos_id=eos)
    rid = eng.submit(PROMPTS[0], max_tokens=8)
    results = eng.run_to_completion()
    assert results[rid] == g[0][:3]  # stops at (and excludes) eos


def test_engine_sliding_window():
    model = Transformer.random(tiny_args(sliding_window=4), dtype=jnp.float32, seed=11)
    ref = _reference_outputs(model, PROMPTS[:4], 5)
    eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0)
    ids = [eng.submit(p, max_tokens=5) for p in PROMPTS[:4]]
    results = eng.run_to_completion()
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect


def test_engine_per_request_temperature():
    """A greedy request batched with a sampled request: the greedy row must
    still match standalone greedy generate exactly."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    ref = _reference_outputs(model, [PROMPTS[0]], 6)[0]

    eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0)
    rid_greedy = eng.submit(PROMPTS[0], max_tokens=6, temperature=0.0)
    rid_sampled = eng.submit(PROMPTS[1], max_tokens=6, temperature=0.9)
    results = eng.run_to_completion()
    assert results[rid_greedy] == ref
    assert len(results[rid_sampled]) == 6
    assert all(0 <= t < model.args.vocab_size for t in results[rid_sampled])


def test_engine_quantized_fp8():
    """Serving in the production config (int8 weights + fp8 KV): outputs
    must match the same quantized model under standalone generate()."""
    model = Transformer.random(tiny_args(kv_quant="fp8"), dtype=jnp.float32, seed=42)
    model.quantize("int8", group=32)
    ref = _reference_outputs(model, PROMPTS[:3], 5)
    eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0)
    ids = [eng.submit(p, max_tokens=5) for p in PROMPTS[:3]]
    results = eng.run_to_completion()
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect


def test_engine_chunked_admission_long_prompt():
    """A prompt longer than admit_chunk is admitted in fixed-width chunks
    (VERDICT r1: serving-side chunked prefill) — outputs and prompt
    logprobs must match standalone generate()."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=21)
    long_prompt = [1 + (i * 7) % 200 for i in range(50)]

    gen_ref, lp_ref = generate([long_prompt], model, max_tokens=5, temperature=0.0)

    eng = Engine(
        model, batch_size=2, max_seq_len=128, temperature=0.0, admit_chunk=16
    )
    rid = eng.submit(long_prompt, max_tokens=5, want_logprobs=True)
    results = eng.run_to_completion()
    assert results[rid] == gen_ref[0]

    req = eng._request(rid)
    # generate() logprobs = (seqlen-1) prompt transitions + per-token
    assert len(req.prompt_logprobs) == len(long_prompt) - 1
    np.testing.assert_allclose(
        req.prompt_logprobs, lp_ref[0][: len(long_prompt) - 1], atol=1e-4, rtol=0
    )
    np.testing.assert_allclose(
        req.gen_logprobs, lp_ref[0][len(long_prompt) - 1 :], atol=1e-4, rtol=0
    )


def test_engine_adaptive_block_and_metrics():
    """Near-complete batches shrink the decode block; latency metrics are
    published."""
    from mistral_inference_tpu.utils.profiling import METRICS

    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=5)
    eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0, decode_block=8)
    eng.submit(PROMPTS[0], max_tokens=3)
    eng._admit()
    assert eng._block_size() == 4  # smallest pow2 covering 3 < decode_block
    eng.submit(PROMPTS[1], max_tokens=30)
    results = eng.run_to_completion()
    assert len(results) == 2
    assert METRICS.samples["ttft_s"]
    assert METRICS.samples["request_latency_s"]
    assert "admission_prefill_s" in METRICS.samples


# ---------------------------------------------------------------------------
# Speculative serving
# ---------------------------------------------------------------------------


def _draft_for(vocab):
    from test_generate import tiny_args as _t

    return Transformer.random(
        _t(dim=64, n_layers=1, head_dim=16, hidden_dim=128, vocab_size=vocab),
        dtype=jnp.float32, seed=99,
    )


def test_engine_speculative_matches_generate():
    """Greedy speculative serving must produce exactly the plain engine /
    generate() outputs — speculation only changes forward counts."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    ref = _reference_outputs(model, PROMPTS[:3], 8)

    eng = Engine(
        model, batch_size=3, max_seq_len=64, temperature=0.0,
        draft_model=_draft_for(model.args.vocab_size), spec_tokens=2,
    )
    ids = [eng.submit(p, max_tokens=8) for p in PROMPTS[:3]]
    results = eng.run_to_completion()
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect


def test_engine_speculative_staggered_and_eos():
    """Slot recycling + EOS under speculative serving."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=7)
    ref = _reference_outputs(model, PROMPTS, 6)
    eos = ref[0][3]  # appears mid-stream in request 0

    def truncate(row):
        return row[: row.index(eos)] if eos in row else row

    eng = Engine(
        model, batch_size=2, max_seq_len=64, temperature=0.0, eos_id=eos,
        draft_model=_draft_for(model.args.vocab_size), spec_tokens=3,
        decode_block=8,
    )
    ids = [eng.submit(p, max_tokens=6) for p in PROMPTS]
    results = eng.run_to_completion()
    assert len(results) == len(PROMPTS)
    for rid, expect in zip(ids, ref):
        assert results[rid] == truncate(expect)


def test_engine_speculative_mixed_temperatures():
    """Greedy and sampled requests share one speculative batch: greedy rows
    must still match generate() exactly; sampled rows must complete with
    the right token counts."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=5)
    ref = _reference_outputs(model, PROMPTS[:2], 7)

    eng = Engine(
        model, batch_size=3, max_seq_len=64, temperature=0.0,
        draft_model=_draft_for(model.args.vocab_size), spec_tokens=2,
    )
    g0 = eng.submit(PROMPTS[0], max_tokens=7)                      # greedy
    s0 = eng.submit(PROMPTS[2], max_tokens=7, temperature=0.9)     # sampled
    g1 = eng.submit(PROMPTS[1], max_tokens=7)                      # greedy
    results = eng.run_to_completion()
    assert results[g0] == ref[0]
    assert results[g1] == ref[1]
    assert len(results[s0]) == 7
    assert all(0 <= t < model.args.vocab_size for t in results[s0])


def test_engine_speculative_first_token_eos():
    """A request whose very first sampled token is EOS must finish at
    admission with zero generated tokens."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=11)
    ref = _reference_outputs(model, [PROMPTS[0]], 1)
    eos = ref[0][0]
    eng = Engine(
        model, batch_size=2, max_seq_len=64, temperature=0.0, eos_id=eos,
        draft_model=_draft_for(model.args.vocab_size), spec_tokens=2,
    )
    rid = eng.submit(PROMPTS[0], max_tokens=5)
    results = eng.run_to_completion()
    assert results[rid] == []


# ---------------------------------------------------------------------------
# Prefix caching
# ---------------------------------------------------------------------------


def _metric(name):
    from mistral_inference_tpu.utils.profiling import METRICS

    return METRICS.counters.get(name, 0.0)


def test_engine_prefix_cache_exact_and_hits():
    """Requests sharing a long system prefix must reuse resident ring
    bytes (prefix_hits increments) with outputs EXACTLY equal to isolated
    generate()."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    sys_p = [(37 * k + 5) % 512 for k in range(32)]
    prompts = [sys_p + [1, 2, 3], sys_p + [7, 8], sys_p + [9, 10, 11, 12]]
    ref = _reference_outputs(model, prompts, 6)

    eng = Engine(model, batch_size=2, max_seq_len=96, temperature=0.0)
    h0 = _metric("prefix_hits")
    ids = []
    for p in prompts:  # sequential: later requests source earlier slots
        rid = eng.submit(p, max_tokens=6)
        ids.append(rid)
        eng.run_to_completion()
        assert eng._result(rid) == ref[len(ids) - 1]
    assert _metric("prefix_hits") >= h0 + 2
    assert _metric("prefix_tokens_reused") >= 2 * 31


def test_engine_prefix_cache_fp8():
    model = Transformer.random(
        tiny_args(kv_quant="fp8"), dtype=jnp.float32, seed=9
    )
    sys_p = [(11 * k + 3) % 512 for k in range(24)]
    prompts = [sys_p + [1, 2], sys_p + [5]]
    ref = _reference_outputs(model, prompts, 5)

    eng = Engine(model, batch_size=2, max_seq_len=96, temperature=0.0)
    h0 = _metric("prefix_hits")
    r0 = eng.submit(prompts[0], max_tokens=5)
    eng.run_to_completion()
    r1 = eng.submit(prompts[1], max_tokens=5)
    eng.run_to_completion()
    assert eng._result(r0) == ref[0]
    assert eng._result(r1) == ref[1]
    assert _metric("prefix_hits") >= h0 + 1


def test_engine_prefix_cache_speculative():
    """Prefix reuse must also fill the draft ring (both caches share the
    loop invariant)."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=4)
    sys_p = [(7 * k + 1) % 512 for k in range(24)]
    prompts = [sys_p + [1, 2, 3], sys_p + [8, 9]]
    ref = _reference_outputs(model, prompts, 6)

    eng = Engine(
        model, batch_size=2, max_seq_len=96, temperature=0.0,
        draft_model=_draft_for(model.args.vocab_size), spec_tokens=2,
    )
    h0 = _metric("prefix_hits")
    r0 = eng.submit(prompts[0], max_tokens=6)
    eng.run_to_completion()
    r1 = eng.submit(prompts[1], max_tokens=6)
    eng.run_to_completion()
    assert eng._result(r0) == ref[0]
    assert eng._result(r1) == ref[1]
    assert _metric("prefix_hits") >= h0 + 1


def test_engine_prefix_skipped_for_logprob_requests():
    """want_logprobs rows must take the full prefill (their prompt
    logprobs cover every position)."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=3)
    sys_p = [(5 * k + 2) % 512 for k in range(24)]
    p0, p1 = sys_p + [1, 2], sys_p + [3, 4]

    eng = Engine(model, batch_size=2, max_seq_len=96, temperature=0.0)
    eng.submit(p0, max_tokens=4)
    eng.run_to_completion()
    h0 = _metric("prefix_hits")
    rid = eng.submit(p1, max_tokens=4, want_logprobs=True)
    eng.run_to_completion()
    assert _metric("prefix_hits") == h0  # no reuse
    req = eng._request(rid)
    assert len(req.prompt_logprobs) == len(p1) - 1  # full teacher-forced sweep


def test_engine_lookup_speculative_matches_generate():
    """Draft-free lookup speculation in the engine: exact greedy parity,
    including slot recycling."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    ref = _reference_outputs(model, PROMPTS, 7)

    eng = Engine(
        model, batch_size=2, max_seq_len=64, temperature=0.0,
        draft_model="lookup", spec_tokens=3,
    )
    ids = [eng.submit(p, max_tokens=7) for p in PROMPTS]
    results = eng.run_to_completion()
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect


def test_engine_lookup_with_prefix_cache():
    """Lookup serving + prefix caching together: the history includes the
    prefix-cached region and outputs stay exact."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=4)
    sys_p = [(13 * k + 2) % 512 for k in range(24)]
    prompts = [sys_p + [1, 2, 3], sys_p + [8, 9]]
    ref = _reference_outputs(model, prompts, 6)

    eng = Engine(
        model, batch_size=2, max_seq_len=96, temperature=0.0,
        draft_model="lookup", spec_tokens=2,
    )
    h0 = _metric("prefix_hits")
    r0 = eng.submit(prompts[0], max_tokens=6)
    eng.run_to_completion()
    r1 = eng.submit(prompts[1], max_tokens=6)
    eng.run_to_completion()
    assert eng._result(r0) == ref[0]
    assert eng._result(r1) == ref[1]
    assert _metric("prefix_hits") >= h0 + 1


def test_engine_lookup_staged_admission_matches_generate():
    """Speculative (lookup) serving through the proportional-cost staging
    path: trickle re-admissions of spec rows must stay exactly greedy
    (staged prefill + adopt_rows + spec t0/history priming), with staged
    sweeps actually taken. This is the r5 default for spec engines
    (staging_B is widened to the spec waterline)."""
    from mistral_inference_tpu.utils.profiling import METRICS

    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=23)
    ref = _reference_outputs(model, PROMPTS, 6)

    METRICS.counters.pop("staged_admissions", None)
    eng = Engine(
        model, batch_size=2, max_seq_len=64, temperature=0.0,
        draft_model="lookup", spec_tokens=2, admit_waterline=1,
        staging_batch=1, prefix_cache=False,
    )
    ids = [eng.submit(p, max_tokens=6) for p in PROMPTS]
    results = eng.run_to_completion()
    assert METRICS.counters.get("staged_admissions", 0) >= 1
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect


def test_engine_spec_staging_default_widened():
    """A spec engine's default staging batch tracks the spec waterline so
    waterline-sized re-admissions take the proportional-cost path."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=23)
    eng = Engine(
        model, batch_size=8, max_seq_len=64,
        draft_model="lookup", spec_tokens=2,
    )
    assert eng.admit_waterline == 2
    assert eng._staging_B == 3
    # explicit values stay explicit
    eng2 = Engine(
        model, batch_size=8, max_seq_len=64,
        draft_model="lookup", spec_tokens=2, staging_batch=3,
    )
    assert eng2._staging_B == 3


def test_engine_nan_failure_detection():
    """A slot whose logits go NaN must fail its request loudly (error set,
    finished event) and free the slot, while healthy slots continue."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    ref = _reference_outputs(model, [PROMPTS[1]], 6)[0]

    eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0)
    bad = eng.submit(PROMPTS[0], max_tokens=6)
    ok = eng.submit(PROMPTS[1], max_tokens=6)
    eng._admit()
    # Poison slot 0's carry logits (simulates a device numerical fault).
    carry = np.array(eng.carry)
    carry[0, :] = np.nan
    eng.carry = jnp.asarray(carry)

    results = eng.run_to_completion()
    bad_req = eng._request(bad)
    assert bad_req.error and "NaN" in bad_req.error
    assert results[ok] == ref  # healthy slot unaffected
    from mistral_inference_tpu.utils.profiling import METRICS

    assert METRICS.counters.get("numerical_failures", 0) >= 1


def test_engine_prefix_same_wave_sources():
    """All slots replaced in one admission wave: later dsts may source a
    same-wave slot's OLD ring bytes — exactness must hold under the
    read-before-write copy ordering."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=6)
    sys_p = [(3 * k + 7) % 512 for k in range(24)]
    wave1 = [sys_p + [1], sys_p + [2]]
    wave2 = [sys_p + [3, 4], sys_p + [5, 6]]
    ref = _reference_outputs(model, wave1 + wave2, 5)

    eng = Engine(model, batch_size=2, max_seq_len=96, temperature=0.0)
    ids1 = [eng.submit(p, max_tokens=5) for p in wave1]
    res1 = eng.run_to_completion()
    h0 = _metric("prefix_hits")
    ids2 = [eng.submit(p, max_tokens=5) for p in wave2]  # both slots replaced
    res2 = eng.run_to_completion()
    results = {**res1, **res2}
    for rid, expect in zip(ids1 + ids2, ref):
        assert results[rid] == expect
    assert _metric("prefix_hits") >= h0 + 1


def test_engine_per_request_top_p_and_stop_ids():
    """top_p -> 0 keeps only the argmax: a sampled request with a tiny
    nucleus must reproduce greedy decode exactly. stop_ids end a request
    like extra EOS tokens (matched token not emitted)."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    ref = _reference_outputs(model, [PROMPTS[0]], 8)[0]

    eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0)
    tiny_p = eng.submit(PROMPTS[0], max_tokens=8, temperature=0.9, top_p=1e-6)
    stop = eng.submit(PROMPTS[0], max_tokens=8, stop_ids=[ref[3]])
    results = eng.run_to_completion()
    assert results[tiny_p] == ref
    assert results[stop] == ref[:3]


def test_engine_cancel():
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0,
                 decode_block=2)
    rid = eng.submit(PROMPTS[0], max_tokens=30)
    queued = eng.submit(PROMPTS[1], max_tokens=30)
    eng.step()
    assert eng.cancel(queued)  # still in queue
    assert eng.cancel(rid)     # live slot
    assert not eng.has_work


def test_engine_under_mesh():
    """Continuous batching over a GSPMD-sharded model (the deploy
    entrypoint's TENSOR/SEQ/DATA path): engine results must equal
    single-device generate, including staggered slot recycling. The seq
    axis shards admission-prefill chunks; decode replicates over it."""
    from mistral_inference_tpu.parallel.mesh import make_mesh

    model_ref = Transformer.random(tiny_args(), dtype=jnp.float32, seed=31)
    ref = _reference_outputs(model_ref, PROMPTS, 5)

    mesh = make_mesh(data=1, seq=2, tensor=2)
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=31, mesh=mesh)
    eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0,
                 decode_block=4)
    ids = [eng.submit(p, max_tokens=5) for p in PROMPTS]
    results = eng.run_to_completion()
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect


def test_engine_lookup_under_mesh():
    """Speculative lookup serving over a sharded model."""
    from mistral_inference_tpu.parallel.mesh import make_mesh

    model_ref = Transformer.random(tiny_args(), dtype=jnp.float32, seed=33)
    ref = _reference_outputs(model_ref, PROMPTS[:2], 6)

    mesh = make_mesh(tensor=2)
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=33, mesh=mesh)
    eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0,
                 draft_model="lookup", spec_tokens=2)
    ids = [eng.submit(p, max_tokens=6) for p in PROMPTS[:2]]
    results = eng.run_to_completion()
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect


def test_engine_admission_waterline():
    """Batched admission: with a waterline of 2, a single freed slot does
    not trigger an admission sweep while other rows are live and >=2
    requests are queued; the deferred request is still served correctly
    once enough slots free (or the workload drains). Output correctness
    must be unaffected by the deferral."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=11)
    # 3 slots, 5 requests of differing lengths so slots free at
    # different times; waterline 2 forces deferred (batched) admissions.
    ref = _reference_outputs(model, PROMPTS, 5)
    eng = Engine(
        model, batch_size=3, max_seq_len=64, temperature=0.0,
        decode_block=2, admit_waterline=2,
    )
    ids = [eng.submit(p, max_tokens=5) for p in PROMPTS]
    results = eng.run_to_completion()
    assert len(results) == len(PROMPTS)
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect
    # The gate itself: one free slot + two queued + others live => defer.
    eng2 = Engine(
        model, batch_size=3, max_seq_len=64, temperature=0.0,
        decode_block=2, admit_waterline=2,
    )
    for p in PROMPTS[:3]:
        eng2.submit(p, max_tokens=5)
    eng2.step()  # admit wave 1
    # force one slot free, two live
    eng2.slots[0].done = True
    for p in PROMPTS[3:]:
        eng2.submit(p, max_tokens=5)
    eng2._admit()
    # queue untouched: one free slot < min(2 queued, waterline 2) => defer
    assert len(eng2.queue) == 2
    # with a second slot freed the sweep proceeds
    eng2.slots[1].done = True
    eng2._admit()
    assert len(eng2.queue) == 0


def test_engine_staged_admission_matches_direct():
    """Trickle admissions through the staging cache (cache.adopt_rows)
    must be byte-equivalent to full-batch sweeps: same outputs AND same
    prompt logprobs, with staged sweeps actually taken."""
    from mistral_inference_tpu.utils.profiling import METRICS

    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=19)
    ref = _reference_outputs(model, PROMPTS, 5)

    METRICS.counters.pop("staged_admissions", None)
    eng = Engine(
        model, batch_size=2, max_seq_len=64, temperature=0.0,
        decode_block=2, staging_batch=1, prefix_cache=False,
    )
    ids = [eng.submit(p, max_tokens=5, want_logprobs=True) for p in PROMPTS]
    results = eng.run_to_completion()
    assert METRICS.counters.get("staged_admissions", 0) >= 1
    for rid, expect in zip(ids, ref):
        assert results[rid] == expect
    eng2 = Engine(
        model, batch_size=2, max_seq_len=64, temperature=0.0,
        decode_block=2, staging_batch=0, prefix_cache=False,
    )
    ids2 = [eng2.submit(p, max_tokens=5, want_logprobs=True) for p in PROMPTS]
    results2 = eng2.run_to_completion()
    for rid, rid2 in zip(ids, ids2):
        assert results[rid] == results2[rid2]
    # Logprobs through a staged sweep: admit one row mid-run (trickle) so
    # it takes the staging path, and compare against standalone generate.
    gen_ref, lp_ref = generate(
        [PROMPTS[2]], model, max_tokens=4, temperature=0.0
    )
    eng3 = Engine(
        model, batch_size=2, max_seq_len=64, temperature=0.0,
        decode_block=2, staging_batch=1, prefix_cache=False,
    )
    eng3.submit(PROMPTS[0], max_tokens=8)
    eng3.step()
    rid3 = eng3.submit(PROMPTS[2], max_tokens=4, want_logprobs=True)
    eng3.run_to_completion()
    req = eng3._request(rid3)
    np.testing.assert_allclose(
        req.prompt_logprobs, lp_ref[0][: len(PROMPTS[2]) - 1],
        atol=1e-5, rtol=0,
    )


# ---------------------------------------------------------------------------
# Pipelined-dispatch semantics (r5): block N+1 dispatched before block N's
# host fan-out. These pin the properties the pipeline must preserve.
# ---------------------------------------------------------------------------


def test_engine_pipeline_no_ring_overshoot():
    """In-program per-row budgets: a finished row's kv_len stops at EXACTLY
    prompt+max_tokens even though blocks keep flying past its end — the
    property that keeps finished rows valid prefix-cache sources (the
    first pipelined build without budgets wrapped every finished ring)."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=11)
    eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0,
                 decode_block=8)
    # max_tokens NOT a multiple of the block: the final 8-wide block must
    # freeze the row after 3 tokens in-program.
    ids = [eng.submit(p, max_tokens=11) for p in PROMPTS[:2]]
    results = eng.run_to_completion()
    kvlen = np.asarray(eng.cache.kv_len)
    for i, (rid, p) in enumerate(zip(ids, PROMPTS[:2])):
        assert len(results[rid]) == 11
        assert kvlen[i] == len(p) + 11, (kvlen[i], len(p))


def test_engine_pipeline_matches_serial(monkeypatch):
    """Pipelined and serial step orders must produce identical greedy
    tokens for every request, including slot reuse across waves."""
    args = tiny_args()
    outs = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("MISTRAL_ENGINE_PIPELINE", mode)
        model = Transformer.random(args, dtype=jnp.float32, seed=13)
        eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0,
                     decode_block=4)
        ids = [eng.submit(p, max_tokens=5) for p in PROMPTS]
        res = eng.run_to_completion()
        outs[mode] = [res[r] for r in ids]
    assert outs["1"] == outs["0"]


def test_engine_pipeline_prefix_cache_survives_waves():
    """A second-wave request sharing a first-wave prompt's prefix must HIT
    the prefix cache under pipelining (finished rings stay un-wrapped)."""
    from mistral_inference_tpu.utils.profiling import METRICS

    model = Transformer.random(tiny_args(sliding_window=48), dtype=jnp.float32,
                               seed=17)
    # batch 2: the finished slot is the prefix SOURCE for the second-wave
    # request landing in the other slot (_plan_prefix_reuse skips j == i).
    eng = Engine(model, batch_size=2, max_seq_len=48, temperature=0.0,
                 decode_block=4, prefix_min=8, staging_batch=0)
    base = list(range(1, 21))
    ref = _reference_outputs(model, [base, base + [30]], 4)
    h0 = METRICS.counters.get("prefix_hits", 0)
    i1 = eng.submit(base, max_tokens=4)
    r1 = eng.run_to_completion()
    i2 = eng.submit(base + [30], max_tokens=4)
    r2 = eng.run_to_completion()
    assert r1[i1] == ref[0] and r2[i2] == ref[1]
    assert METRICS.counters.get("prefix_hits", 0) > h0


def test_engine_pipeline_stale_block_never_leaks(monkeypatch):
    """A block dispatched for request A must never emit into a slot that
    request B inherited: staggered lengths force mid-flight slot reuse;
    every request's output must still equal isolated generation."""
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=23)
    prompts = PROMPTS
    lens = [3, 9, 5, 7, 4]
    refs = {}
    for p, n in zip(prompts, lens):
        g, _ = generate([p], model, max_tokens=n, temperature=0.0)
        refs[tuple(p)] = g[0]
    eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0,
                 decode_block=4)
    ids = [eng.submit(p, max_tokens=n) for p, n in zip(prompts, lens)]
    results = eng.run_to_completion()
    for rid, p in zip(ids, prompts):
        assert results[rid] == refs[tuple(p)]


def test_engine_pipeline_randomized_stress():
    """Randomized staggered workload: random prompts, random max_tokens
    spanning sub-block to multi-block, an eos_id that fires at
    unpredictable times, three waves of slot reuse — every request must
    equal isolated generation. A property net over the pipeline's
    budget/rid/eviction edge cases."""
    rng = np.random.default_rng(123)
    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=31)
    V = model.args.vocab_size
    prompts = [
        [int(t) for t in rng.integers(1, V, int(rng.integers(2, 12)))]
        for _ in range(9)
    ]
    lens = [int(rng.integers(1, 13)) for _ in prompts]
    eos = 7  # random-logit models emit small ids often enough to matter
    refs = []
    for p, n in zip(prompts, lens):
        g, _ = generate([p], model, max_tokens=n, temperature=0.0, eos_id=eos)
        refs.append(g[0])
    eng = Engine(model, batch_size=3, max_seq_len=64, temperature=0.0,
                 decode_block=4, eos_id=eos)
    ids = [eng.submit(p, max_tokens=n) for p, n in zip(prompts, lens)]
    results = eng.run_to_completion()
    for rid, expect in zip(ids, refs):
        assert results[rid] == expect
