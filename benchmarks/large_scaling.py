"""Chipless placement study for the BIG reference checkpoints (VERDICT r3
missing #3): dense Mistral-Large-2 123B and Mixtral-8x22B — the two models
the reference can only run via pipeline stages
(/root/reference/src/mistral_inference/transformer.py:94-98,194-215).

Same methodology as benchmarks/moe_scaling.py: AOT-compile the EXACT fused
decode block for real v5e topologies (jax.experimental.topologies, no
chips) with the production NamedShardings, and report

  * per-chip HBM fit: int4 weight bytes/chip + KV ring bytes/chip + bf16
    head/embed — against the v5e's 16 GB;
  * the GSPMD collective inventory of the optimized HLO;
  * estimated_cycles of the decode loop body, projected to full depth →
    tokens/s/chip (RELATIVE numbers: same caveats as moe_scaling.py — XLA
    dequant path, pallas custom calls carry no cycles).

Geometries (reference params.json contracts, models/registry.py):
  Large-2 123B: dim 12288, 88 layers, 96/8 heads, hidden 28672, vocab 32768
  8x22B:        dim 6144,  56 layers, 48/8 heads, hidden 16384, 8 experts top-2

Usage:  python benchmarks/large_scaling.py        (~10 min)
        LARGE_LAYERS=2 LARGE_MODELS=large2 python benchmarks/large_scaling.py
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from mistral_inference_tpu.args import MoeArgs, TransformerArgs  # noqa: E402
from mistral_inference_tpu.parallel.inspect import (  # noqa: E402
    aot_decode_collective_inventory,
)
from mistral_inference_tpu.utils.chip import V5E  # noqa: E402

CYC_RE = re.compile(r'"estimated_cycles":"(\d+)"')
L = int(os.environ.get("LARGE_LAYERS", "2"))
BATCH = int(os.environ.get("LARGE_BATCH", "16"))
N_STEPS = 4
GROUP = 128


def large2_args(n_layers: int) -> TransformerArgs:
    return TransformerArgs(
        dim=12288, n_layers=n_layers, head_dim=128, hidden_dim=28672,
        n_heads=96, n_kv_heads=8, norm_eps=1e-5, vocab_size=32_768,
        rope_theta=1e6, max_batch_size=BATCH, kv_quant="int8",
    )


def mixtral22_args(n_layers: int) -> TransformerArgs:
    return TransformerArgs(
        dim=6144, n_layers=n_layers, head_dim=128, hidden_dim=16384,
        n_heads=48, n_kv_heads=8, norm_eps=1e-5, vocab_size=32_768,
        rope_theta=1e6, max_batch_size=BATCH, kv_quant="int8",
        moe=MoeArgs(num_experts=8, num_experts_per_tok=2),
        moe_impl="dispatch",
    )


def fit_gb(args: TransformerArgs, full_depth: int, n_chips: int,
           ring_slots: int, ep: int, tp: int) -> dict:
    """Per-chip HBM bytes at full depth: int4 matmul weights (sharded),
    fp32 group scales, bf16 embed+head (vocab-sharded), int8 KV ring
    (batch+head sharded). Mirrors bench.decode_step_bytes accounting."""
    a = args
    attn = a.dim * (a.n_heads + 2 * a.n_kv_heads) * a.head_dim \
        + a.n_heads * a.head_dim * a.dim
    ffn = 3 * a.dim * a.hidden_dim
    e = a.moe.num_experts if a.moe else 1
    q_params = full_depth * (attn + ffn * e)
    w_gb = q_params * 0.5 / n_chips / 1e9  # int4, evenly sharded
    s_gb = q_params / GROUP * 4 / n_chips / 1e9
    head_gb = 2 * a.vocab_size * a.dim * 2 / n_chips / 1e9  # embed + head
    # Ring shards batch over data and heads over tensor; the expert axis
    # replicates it — so it divides by n_chips/ep.
    kv_raw = (
        full_depth * BATCH * ring_slots * a.n_kv_heads * a.head_dim
        * (1 + 4 / GROUP) * 2  # int8 payload + fp32/slot scales, K and V
    ) / 1e9
    kv_gb = kv_raw * ep / n_chips
    total = w_gb + s_gb + head_gb + kv_gb
    return {
        "weights_gb_chip": round(w_gb + s_gb, 2),
        "kv_gb_chip": round(kv_gb, 2),
        "embed_head_gb_chip": round(head_gb, 2),
        "total_gb_chip": round(total, 2),
        "fits_16gb": bool(total < 13.5),  # leave room for activations
    }


def body_cycles(txt: str) -> int:
    cur = None
    by_comp: dict = defaultdict(int)
    for ln in txt.splitlines():
        s = ln.strip()
        if s.endswith("{") and (s.startswith("%") or s.startswith("ENTRY")):
            cur = s.split()[0]
        m = CYC_RE.search(ln)
        if m and cur:
            by_comp[cur] += int(m.group(1))
    regions = [(c, n) for n, c in by_comp.items() if "region" in n or "body" in n]
    return max(regions)[0] if regions else max(by_comp.values(), default=0)


# name: (args_fn, full_depth, [(topology, (data, expert, tensor), label)])
CONFIGS = {
    "large2": (large2_args, 88, [
        ("v5e:4x2x1", (1, 1, 8), "v5e-8  TP8"),
        ("v5e:4x4x1", (2, 1, 8), "v5e-16 DP2xTP8"),
    ]),
    "mixtral22": (mixtral22_args, 56, [
        ("v5e:4x2x1", (1, 8, 1), "v5e-8  EP8"),
        ("v5e:4x4x1", (1, 8, 2), "v5e-16 EP8xTP2"),
    ]),
}


def main() -> None:
    want = os.environ.get("LARGE_MODELS", "large2,mixtral22").split(",")
    ring = 258
    rows = []
    for name in want:
        args_fn, full_depth, meshes = CONFIGS[name]
        for topo, shape, label in meshes:
            n_chips = shape[0] * shape[1] * shape[2]
            row = {
                "model": name, "mesh": label,
                "hbm": fit_gb(args_fn(full_depth), full_depth, n_chips,
                              4096 + 2 * 64, shape[1], shape[2]),
            }
            try:
                counts, txt = aot_decode_collective_inventory(
                    args_fn(L), topology_name=topo, mesh_shape=shape,
                    n_steps=N_STEPS, batch=BATCH, cache_slots=ring,
                    return_hlo=True, attn_impl="xla", quant="int4",
                )
                cyc = body_cycles(txt)
                step_ms = cyc / N_STEPS / V5E.clock_hz * 1e3 * (full_depth / L)
                row["collectives"] = {k: v for k, v in counts.items() if v}
                row["est_step_ms_full_depth"] = round(step_ms, 2)
                row["est_tokens_per_s"] = round(BATCH / (step_ms / 1e3), 1)
            except Exception as e:  # noqa: BLE001 — keep reporting fits
                row["error"] = str(e)[-240:]
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"summary": rows}, indent=1))


if __name__ == "__main__":
    main()
