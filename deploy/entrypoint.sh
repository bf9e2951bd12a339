#!/bin/sh
# Serve MODEL_PATH with the in-repo continuous-batching engine + HTTP API.
set -e
exec python - <<'EOF'
import os
import jax.numpy as jnp
from mistral_inference_tpu.model import from_folder
from mistral_inference_tpu.server.api import Server
from mistral_inference_tpu.server.engine import Engine
from mistral_inference_tpu.tokenizers import load_tokenizer

model_path = os.environ["MODEL_PATH"]
batch = int(os.environ.get("BATCH_SIZE", "8"))
max_seq = int(os.environ.get("MAX_SEQ_LEN", "8192"))
quant = os.environ.get("QUANT") or None
kv_quant = os.environ.get("KV_QUANT") or None

tok = load_tokenizer(model_path)
kw = {"dtype": jnp.bfloat16, "max_batch_size": batch}
if quant:
    kw["quant"] = quant
if kv_quant:
    kw["kv_quant"] = kv_quant
# Multi-chip serving: TENSOR (TP degree), SEQ (sequence-parallel prefill),
# DATA (batch replication) build a GSPMD mesh over the visible devices.
tp = int(os.environ.get("TENSOR", "1"))
seq = int(os.environ.get("SEQ", "1"))
data = int(os.environ.get("DATA", "1"))
if tp * seq * data > 1:
    from mistral_inference_tpu.parallel.mesh import make_mesh

    kw["mesh"] = make_mesh(data=data, seq=seq, tensor=tp)
model = from_folder(model_path, **kw)
from mistral_inference_tpu.model import Mamba
if isinstance(model, Mamba):
    from mistral_inference_tpu.server.mamba_engine import MambaEngine

    mkw = {}
    if os.environ.get("DRAFT_PATH"):  # mamba speculation is draft-free only
        mkw["draft_model"] = os.environ["DRAFT_PATH"]  # "lookup" | "ngram"
        mkw["spec_tokens"] = int(os.environ.get("SPEC_TOKENS", "8"))
    engine = MambaEngine(
        model, batch_size=batch, max_seq_len=max_seq, eos_id=tok.eos_id, **mkw
    )
else:
    ekw = {}
    if os.environ.get("DRAFT_PATH"):  # speculative serving: a same-vocab draft
        dp = os.environ["DRAFT_PATH"]  # folder, or "lookup" for draft-free n-gram
        ekw["draft_model"] = dp if dp in ("lookup", "ngram") else from_folder(
            dp, dtype=jnp.bfloat16, max_batch_size=batch
        )
        ekw["spec_tokens"] = int(os.environ.get("SPEC_TOKENS", "4"))
    engine = Engine(
        model, batch_size=batch, max_seq_len=max_seq, eos_id=tok.eos_id, **ekw
    )
Server(engine, tok).serve(port=int(os.environ.get("PORT", "8000")))
EOF
