"""True multi-controller (multi-host) validation on CPU.

The driver's dryrun and tests/test_sharding.py exercise 8-device meshes in
ONE process; this test runs generate() across TWO separate JAX processes
(4 virtual CPU devices each) joined by jax.distributed — the same runtime
shape as a real multi-host TPU pod slice (one controller per host, global
mesh, collectives crossing the process boundary, host loop moving O(B)
scalars via allgather). Output must equal the single-process run exactly.

Reference contract being replaced: torchrun + NCCL pipeline ranks
(reference: main.py:36-38,110-115) — here every process runs the same SPMD
program over a global mesh.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = """
import json, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid, port = int(sys.argv[1]), sys.argv[2]
from mistral_inference_tpu.parallel.distributed import init_distributed
active = init_distributed(f"127.0.0.1:{{port}}", num_processes=2, process_id=pid)
assert active and jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.devices()

from mistral_inference_tpu.args import TransformerArgs
from mistral_inference_tpu.generate import generate
from mistral_inference_tpu.model import Transformer
from mistral_inference_tpu.parallel.mesh import make_mesh

mesh = make_mesh(data=2, expert=1, tensor=4)
args = TransformerArgs(
    dim=128, n_layers=2, head_dim=32, hidden_dim=256, n_heads=4,
    n_kv_heads=4, norm_eps=1e-5, vocab_size=256, sliding_window=32,
)
model = Transformer.random(args, dtype=jax.numpy.float32, seed=0, mesh=mesh)
prompts = [[5, 17, 2, 91], [7, 3, 11], [100, 101], [42, 43, 44, 45]]
out, lps = generate(prompts, model, max_tokens=8, temperature=0.0)
print("RESULT " + json.dumps({{"pid": pid, "out": out}}), flush=True)
"""


MAMBA_WORKER = """
import json, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid, port = int(sys.argv[1]), sys.argv[2]
from mistral_inference_tpu.parallel.distributed import init_distributed
assert init_distributed(f"127.0.0.1:{{port}}", num_processes=2, process_id=pid)
assert jax.device_count() == 8

from mistral_inference_tpu.args import MambaArgs
from mistral_inference_tpu.generate import generate_mamba
from mistral_inference_tpu.model import Mamba
from mistral_inference_tpu.parallel.mesh import make_mesh

mesh = make_mesh(data=2, expert=1, tensor=4)
args = MambaArgs(
    dim=64, n_layers=2, vocab_size=256, n_groups=2, rms_norm=True,
    residual_in_fp32=True, fused_add_norm=True, pad_vocab_size_multiple=16,
    tie_embeddings=False, d_state=16, d_conv=4, expand=2, headdim=16,
)
model = Mamba.random(args, dtype=jax.numpy.float32, seed=0, mesh=mesh)
prompts = [[5, 17, 2, 91], [7, 3, 11], [100, 101], [42, 43, 44, 45]]
out, lps = generate_mamba(prompts, model, max_tokens=6, temperature=0.0)
print("RESULT " + json.dumps({{"pid": pid, "out": out}}), flush=True)
"""


MOE_WORKER = """
import json, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid, port = int(sys.argv[1]), sys.argv[2]
from mistral_inference_tpu.parallel.distributed import init_distributed
assert init_distributed(f"127.0.0.1:{{port}}", num_processes=2, process_id=pid)

from mistral_inference_tpu.args import MoeArgs, TransformerArgs
from mistral_inference_tpu.generate import generate
from mistral_inference_tpu.model import Transformer
from mistral_inference_tpu.parallel.mesh import make_mesh

# Expert axis spans the process boundary: ep=4 over 2 hosts x 4 devices.
mesh = make_mesh(data=2, expert=4, tensor=1)
args = TransformerArgs(
    dim=128, n_layers=2, head_dim=32, hidden_dim=256, n_heads=4,
    n_kv_heads=2, norm_eps=1e-5, vocab_size=256,
    moe=MoeArgs(num_experts=4, num_experts_per_tok=2),
)
model = Transformer.random(args, dtype=jax.numpy.float32, seed=0, mesh=mesh)
prompts = [[5, 17, 2, 91], [7, 3, 11], [100, 101], [42, 43, 44, 45]]
out, lps = generate(prompts, model, max_tokens=6, temperature=0.0)
print("RESULT " + json.dumps({{"pid": pid, "out": out}}), flush=True)
"""

SPEC_WORKER = """
import json, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid, port = int(sys.argv[1]), sys.argv[2]
from mistral_inference_tpu.parallel.distributed import init_distributed
assert init_distributed(f"127.0.0.1:{{port}}", num_processes=2, process_id=pid)

from mistral_inference_tpu.args import TransformerArgs
from mistral_inference_tpu.model import Transformer
from mistral_inference_tpu.parallel.mesh import make_mesh
from mistral_inference_tpu.speculative import generate_speculative

mesh = make_mesh(data=2, expert=1, tensor=4)
t_args = TransformerArgs(
    dim=128, n_layers=2, head_dim=32, hidden_dim=256, n_heads=4,
    n_kv_heads=4, norm_eps=1e-5, vocab_size=256,
)
d_args = TransformerArgs(
    dim=64, n_layers=1, head_dim=16, hidden_dim=128, n_heads=4,
    n_kv_heads=4, norm_eps=1e-5, vocab_size=256,
)
target = Transformer.random(t_args, dtype=jax.numpy.float32, seed=0, mesh=mesh)
draft = Transformer.random(d_args, dtype=jax.numpy.float32, seed=1, mesh=mesh)
prompts = [[5, 17, 2, 91], [7, 3, 11], [100, 101], [42, 43, 44, 45]]
out, lps = generate_speculative(prompts, target, draft, max_tokens=6, spec_tokens=2)
print("RESULT " + json.dumps({{"pid": pid, "out": out}}), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, template) -> list:
    worker = tmp_path / "worker.py"
    worker.write_text(template.format(repo=str(REPO)))
    port = _free_port()
    env = dict(os.environ)
    # The workers build their own 4-device CPU clients; drop the test
    # session's 8-device forcing so it can't fight jax_num_cpu_devices.
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{stdout[-4000:]}"
        line = [l for l in stdout.splitlines() if l.startswith("RESULT ")][-1]
        outs.append(json.loads(line[len("RESULT "):]))
    return outs


def test_two_process_generate_matches_single(tmp_path):
    outs = _run_workers(tmp_path, WORKER)

    # Both controllers observed the same global result.
    assert outs[0]["out"] == outs[1]["out"]

    # And it equals the single-process (no-mesh) run.
    from mistral_inference_tpu.args import TransformerArgs
    from mistral_inference_tpu.generate import generate
    from mistral_inference_tpu.model import Transformer

    args = TransformerArgs(
        dim=128, n_layers=2, head_dim=32, hidden_dim=256, n_heads=4,
        n_kv_heads=4, norm_eps=1e-5, vocab_size=256, sliding_window=32,
    )
    model = Transformer.random(args, dtype=jax.numpy.float32, seed=0)
    prompts = [[5, 17, 2, 91], [7, 3, 11], [100, 101], [42, 43, 44, 45]]
    ref, _ = generate(prompts, model, max_tokens=8, temperature=0.0)
    assert outs[0]["out"] == ref


def test_two_process_moe_expert_parallel(tmp_path):
    """Expert-parallel MoE with the expert axis spanning the process
    boundary (the reference's multi-GPU MoE story, minus pipeline ranks):
    outputs must equal the single-process run exactly."""
    outs = _run_workers(tmp_path, MOE_WORKER)
    assert outs[0]["out"] == outs[1]["out"]

    from mistral_inference_tpu.args import MoeArgs, TransformerArgs
    from mistral_inference_tpu.generate import generate
    from mistral_inference_tpu.model import Transformer

    args = TransformerArgs(
        dim=128, n_layers=2, head_dim=32, hidden_dim=256, n_heads=4,
        n_kv_heads=2, norm_eps=1e-5, vocab_size=256,
        moe=MoeArgs(num_experts=4, num_experts_per_tok=2),
    )
    model = Transformer.random(args, dtype=jax.numpy.float32, seed=0)
    prompts = [[5, 17, 2, 91], [7, 3, 11], [100, 101], [42, 43, 44, 45]]
    ref, _ = generate(prompts, model, max_tokens=6, temperature=0.0)
    assert outs[0]["out"] == ref


def test_two_process_speculative_matches_single(tmp_path):
    """Speculative decoding across two controllers: greedy spec output must
    equal the single-process PLAIN greedy run (spec is exact)."""
    outs = _run_workers(tmp_path, SPEC_WORKER)
    assert outs[0]["out"] == outs[1]["out"]

    from mistral_inference_tpu.args import TransformerArgs
    from mistral_inference_tpu.generate import generate
    from mistral_inference_tpu.model import Transformer

    args = TransformerArgs(
        dim=128, n_layers=2, head_dim=32, hidden_dim=256, n_heads=4,
        n_kv_heads=4, norm_eps=1e-5, vocab_size=256,
    )
    model = Transformer.random(args, dtype=jax.numpy.float32, seed=0)
    prompts = [[5, 17, 2, 91], [7, 3, 11], [100, 101], [42, 43, 44, 45]]
    ref, _ = generate(prompts, model, max_tokens=6, temperature=0.0)
    assert outs[0]["out"] == ref


def test_two_process_mamba_matches_single(tmp_path):
    outs = _run_workers(tmp_path, MAMBA_WORKER)
    assert outs[0]["out"] == outs[1]["out"]

    from mistral_inference_tpu.args import MambaArgs
    from mistral_inference_tpu.generate import generate_mamba
    from mistral_inference_tpu.model import Mamba

    args = MambaArgs(
        dim=64, n_layers=2, vocab_size=256, n_groups=2, rms_norm=True,
        residual_in_fp32=True, fused_add_norm=True, pad_vocab_size_multiple=16,
        tie_embeddings=False, d_state=16, d_conv=4, expand=2, headdim=16,
    )
    model = Mamba.random(args, dtype=jax.numpy.float32, seed=0)
    prompts = [[5, 17, 2, 91], [7, 3, 11], [100, 101], [42, 43, 44, 45]]
    ref, _ = generate_mamba(prompts, model, max_tokens=6, temperature=0.0)
    assert outs[0]["out"] == ref
