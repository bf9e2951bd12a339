"""Corpus-perplexity harness — the ≤0.1 Δppl quantization gate (BASELINE.md).

Teacher-forces a text corpus through a loaded checkpoint at each precision
and reports perplexity plus Δppl vs the bf16 baseline. Runnable the moment
real weights are mounted:

    python benchmarks/ppl.py <model_dir> --text corpus.txt \
        --quants bf16,int8,int4 --kv_quant fp8

With no --text it uses a built-in English sample (enough for a smoke
number; the gate should be run on a real held-out corpus). The math: ppl =
exp(-mean log p(token | prefix)) over all teacher-forced transitions, using
the same prompt-logprob path generate() exposes (reference contract:
generate.py:101-111).
"""

from __future__ import annotations

import argparse
import json
import math
from typing import List, Sequence

import numpy as np

SAMPLE_TEXT = (
    "The quick brown fox jumps over the lazy dog. "
    "Machine learning systems map inputs to outputs by composing linear "
    "transformations with simple nonlinearities, trained by gradient "
    "descent over large corpora. Language models estimate the probability "
    "of the next token given its prefix, and perplexity measures how well "
    "that estimate compresses held-out text. "
) * 8


def compute_ppl(
    model, rows: Sequence[Sequence[int]], chunk_size: int = 512, batch: int = 4
) -> float:
    """exp(-mean teacher-forced logprob) over all transitions in ``rows``.
    Uses generate(max_tokens=0) (or generate_mamba for Mamba checkpoints):
    the logprob output is exactly the seqlen-1 teacher-forced prompt
    transitions per row."""
    from mistral_inference_tpu.generate import generate, generate_mamba
    from mistral_inference_tpu.model import Mamba

    total, count = 0.0, 0
    B = getattr(model.args, "max_batch_size", batch) or batch
    gen = generate_mamba if isinstance(model, Mamba) else generate
    rows = [list(r) for r in rows if len(r) >= 2]
    for i in range(0, len(rows), B):
        _, lps = gen(
            rows[i : i + B], model, max_tokens=0, temperature=0.0,
            chunk_size=chunk_size,
        )
        for lp in lps:
            total += float(np.sum(lp))
            count += len(lp)
    assert count > 0, "no transitions"
    return math.exp(-total / count)


def make_rows(token_ids: List[int], seq_len: int) -> List[List[int]]:
    """Split a token stream into non-overlapping rows of ``seq_len``."""
    rows = [token_ids[i : i + seq_len] for i in range(0, len(token_ids), seq_len)]
    return [r for r in rows if len(r) >= 2]


def run(
    model_dir: str,
    text: str,
    quants: List[str],
    kv_quant: str | None,
    seq_len: int,
    batch: int,
) -> dict:
    import jax.numpy as jnp

    from mistral_inference_tpu.model import Transformer, get_model_cls
    from mistral_inference_tpu.tokenizers import load_tokenizer

    tok = load_tokenizer(model_dir)
    ids = tok.encode(text, bos=True, eos=False)
    rows = make_rows(ids, seq_len)

    results = {}
    baseline = None
    for mode in quants:
        # "label=/path/to/export" loads that folder AS-IS — a stacked
        # quantized export from `mistral-quantize` (loading.save_stacked):
        # params.json carries its quant mode, so no re-quantization happens
        # and the gate is one command:
        #   python benchmarks/ppl.py /ckpt/7b --quants bf16,int4=/ckpt/7b-int4
        if "=" in mode:
            label, d = mode.split("=", 1)
        else:
            label, d = mode, model_dir
        cls = get_model_cls(d)
        kw = dict(dtype=jnp.bfloat16)
        if "=" not in mode and label != "bf16":
            kw["quant"] = label
        if cls is Transformer:
            kw.update(
                max_batch_size=batch,
                kv_quant=None if label == "bf16" else kv_quant,
            )
        model = cls.from_folder(d, **kw)
        ppl = compute_ppl(model, rows, chunk_size=seq_len, batch=batch)
        entry = {"ppl": round(ppl, 4)}
        if label == "bf16":
            baseline = ppl
        elif baseline is not None:
            entry["delta_ppl_vs_bf16"] = round(ppl - baseline, 4)
            entry["gate_0.1"] = "PASS" if abs(ppl - baseline) <= 0.1 else "FAIL"
        results[label] = entry
        del model  # free HBM before the next precision loads
    return results


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("model_dir")
    p.add_argument("--text", default=None, help="path to a text corpus")
    p.add_argument("--quants", default="bf16,int8,int4")
    p.add_argument("--kv_quant", default="fp8", choices=["fp8", "int8", "none"])
    p.add_argument("--seq_len", type=int, default=512)
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args()

    text = SAMPLE_TEXT
    if args.text:
        with open(args.text) as f:
            text = f.read()
    kv = None if args.kv_quant == "none" else args.kv_quant
    results = run(
        args.model_dir, text, args.quants.split(","), kv, args.seq_len, args.batch
    )
    print(json.dumps({"metric": "delta_ppl", "results": results}))


if __name__ == "__main__":
    main()
