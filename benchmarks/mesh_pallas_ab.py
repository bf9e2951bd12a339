"""Chipless A/B: kernels-under-mesh (pallas + shard_map) vs the XLA path
at the multi-chip north-star configs (VERDICT r3 next-#2 "Done" evidence).

AOT-compiles the EXACT fused decode block for real v5e topologies
(jax.experimental.topologies — no chips needed) twice per config:

  * ``attn_impl="xla"``   — the GSPMD path rounds 1-3 forced under any mesh
    (Megatron param layout, XLA dequant fusions stream a bf16 copy of every
    weight through HBM each step);
  * ``attn_impl="pallas"`` — the r4 shard_map path (parallel/shmap.py):
    fused update+attend decode attention, stacked dequant matmuls and the
    grouped MoE expert kernel all run per shard, with the pallas-mode
    param layout (parallel/sharding.param_specs(pallas=True)).

Reported per program: GSPMD collective inventory, pallas custom-call count
inside the decode loop, and the TPU compiler's estimated_cycles of the
loop body. Cycle caveat: pallas custom calls carry NO estimated_cycles, so
the pallas rows undercount kernel time — the honest reading is (a) the
collective inventories are comparable (shard_map introduced no resharding
storm), and (b) the XLA rows' dequant-fusion cycles disappear from the
pallas rows because that work moved into kernels measured on-chip at
3-20x faster (docs/DECODE_PERF.md round-1 A/B; the single-chip fused
kernel A/B is BENCH_r04).

Usage: python benchmarks/mesh_pallas_ab.py           (~5-10 min)
       AB_LAYERS=2 AB_CONFIGS=mixtral16 python benchmarks/mesh_pallas_ab.py
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

import mistral_inference_tpu.ops.linear as lin  # noqa: E402

lin._ON_TPU = True  # force the pallas gates at trace time (host is CPU)

from mistral_inference_tpu.args import MoeArgs, TransformerArgs  # noqa: E402
from mistral_inference_tpu.parallel.inspect import (  # noqa: E402
    aot_decode_collective_inventory,
)
from mistral_inference_tpu.utils.chip import V5E  # noqa: E402

CYC_RE = re.compile(r'"estimated_cycles":"(\d+)"')
L = int(os.environ.get("AB_LAYERS", "2"))
BATCH = int(os.environ.get("AB_BATCH", "32"))
N_STEPS = 4


def mixtral_args() -> TransformerArgs:
    return TransformerArgs(
        dim=4096, n_layers=L, head_dim=128, hidden_dim=14336, n_heads=32,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=32_000, rope_theta=1e6,
        sliding_window=4096, max_batch_size=BATCH, kv_quant="int8",
        moe=MoeArgs(num_experts=8, num_experts_per_tok=2),
        moe_impl="dispatch",
    )


def dense7b_args() -> TransformerArgs:
    return TransformerArgs(
        dim=4096, n_layers=L, head_dim=128, hidden_dim=14336, n_heads=32,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=32_768, rope_theta=1e6,
        sliding_window=4096, max_batch_size=BATCH, kv_quant="int8",
    )


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


# name: (args_fn, topology, mesh_shape (data, expert, tensor), full_depth)
CONFIGS = {
    "mixtral16": (mixtral_args, "v5e:4x4x1", (1, 8, 2), 32),
    "dense7b8": (dense7b_args, "v5e:4x2x1", (2, 1, 4), 32),
}


def main() -> None:
    want = os.environ.get("AB_CONFIGS", "mixtral16,dense7b8").split(",")
    rows = []
    for name in want:
        args_fn, topo, shape, full_depth = CONFIGS[name]
        for impl in ("xla", "pallas"):
            args = args_fn()
            try:
                counts, txt = aot_decode_collective_inventory(
                    args, topology_name=topo, mesh_shape=shape,
                    n_steps=N_STEPS, batch=BATCH, cache_slots=258,
                    return_hlo=True, attn_impl=impl, quant="int4",
                )
            except Exception as e:  # noqa: BLE001 — per-config report
                rows.append({"config": name, "impl": impl,
                             "error": str(e)[-300:]})
                print(json.dumps(rows[-1]), flush=True)
                continue
            cyc = body_cycles(txt)
            step_ms = cyc / N_STEPS / V5E.clock_hz * 1e3 * (full_depth / L)
            rows.append({
                "config": name, "impl": impl,
                "collectives": {k: v for k, v in counts.items() if v},
                "custom_calls": txt.count("custom-call"),
                "est_xla_cycles_step_ms_full_depth": round(step_ms, 2),
                "note": "pallas custom calls carry no estimated_cycles; "
                        "cycle column counts XLA ops only",
            })
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"summary": rows}, indent=1))


if __name__ == "__main__":
    main()
