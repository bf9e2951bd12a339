"""Golden token-id sequences for the chat/tool/FIM templates (VERDICT r2 #7).

The reference delegates templating to mistral-common
(reference: main.py:141-159); its v3 wire format is what real checkpoints
were trained on. These goldens pin encode_chat / encode_fim output EXACTLY
— any change to special-token placement, JSON payload shapes (tool-call
ids, [TOOL_RESULTS] call_id), whitespace handling, or EOS placement fails
the suite.

Two tokenizer fixtures mirror the two production special-token layouts:
  * SPM v3: specials are CONTROL pieces at the ids the real
    tokenizer.model.v3 uses (3 [INST] … 9 [TOOL_CALLS]); text goes through
    byte-fallback pieces so goldens don't depend on a trained vocab.
  * Tekken: 20-slot special prefix (tekken.json convention).
"""

import base64
import json
import struct

import pytest

from mistral_inference_tpu.tokenizers.chat import (
    ChatRequest,
    Message,
    encode_chat,
    encode_fim,
)
from mistral_inference_tpu.tokenizers.spm import SentencePieceBPE, parse_model_proto
from mistral_inference_tpu.tokenizers.tekken import Tekken


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _piece(piece: str, score: float, ptype: int = 1) -> bytes:
    p = piece.encode()
    body = b"\x0a" + _varint(len(p)) + p
    body += b"\x15" + struct.pack("<f", score)
    body += b"\x18" + _varint(ptype)
    return b"\x0a" + _varint(len(body)) + body


# The real v3 SPM special layout: ids 0..9 in this exact order, then the
# FIM controls (Codestral), then byte fallback. CONTROL type (3) so plain
# text can never alias them; [INST]-class markers reachable via special().
V3_SPECIALS = [
    "<unk>", "<s>", "</s>", "[INST]", "[/INST]", "[AVAILABLE_TOOLS]",
    "[/AVAILABLE_TOOLS]", "[TOOL_RESULTS]", "[/TOOL_RESULTS]", "[TOOL_CALLS]",
    "[IMG]", "[PREFIX]", "[MIDDLE]", "[SUFFIX]",
]


def spm_v3_model() -> bytes:
    CONTROL, BYTE, UNK = 3, 6, 2
    pieces = [_piece("<unk>", 0.0, UNK)]
    pieces += [_piece(sp, 0.0, CONTROL) for sp in V3_SPECIALS[1:]]
    pieces += [_piece(f"<0x{b:02X}>", -30.0, BYTE) for b in range(256)]
    return b"".join(pieces)


@pytest.fixture(scope="module")
def spm():
    return SentencePieceBPE(parse_model_proto(spm_v3_model()))


@pytest.fixture(scope="module")
def tekken(tmp_path_factory):
    vocab = [
        {"rank": i, "token_bytes": base64.b64encode(bytes([i])).decode()}
        for i in range(256)
    ]
    cfg = {
        "config": {
            "pattern": r"\s+|\S+",
            "default_vocab_size": 256 + 20,
            "default_num_special_tokens": 20,
            "version": "v3",
        },
        "vocab": vocab,
    }
    p = tmp_path_factory.mktemp("tek") / "tekken.json"
    p.write_text(json.dumps(cfg))
    return Tekken.from_file(p)


def _b(tok, s: str):
    """Expected byte-fallback ids for raw text under the SPM fixture: every
    byte maps to its <0xNN> piece at id 14 + byte (13 specials after unk)."""
    off = len(V3_SPECIALS)
    return [off + c for c in s.encode()]


def test_golden_instruct_spm(spm):
    req = ChatRequest(messages=[
        Message("system", "S"),
        Message("user", "hi"),
        Message("assistant", "ok"),
        Message("user", "go"),
    ])
    ids = encode_chat(spm, req)
    # <s>[INST] ▁hi [/INST] ▁ok</s>[INST] ▁S\n\n▁go [/INST]
    # (SPM dummy prefix: content gets one leading ▁ = 0xE2 0x96 0x81).
    # The system prompt attaches to the LAST user message — mistral-common
    # InstructTokenizerV2/V3 encode_user_message: `if is_last and
    # system_prompt` (v1 attaches to the first).
    ws = _b(spm, "▁")
    want = (
        [1, 3] + ws + _b(spm, "hi") + [4]
        + ws + _b(spm, "ok") + [2]
        + [3] + ws + _b(spm, "S\n\ngo") + [4]
    )
    assert ids == want


def test_golden_tool_round_spm(spm):
    """One full function-calling round in v3 wire format: tools attach
    before the LAST user message; the assistant's call carries its 9-char
    id; the tool result payload is {"content", "call_id"}."""
    tools = [{"function": {"name": "add", "parameters": {}}}]
    req = ChatRequest(
        messages=[
            Message("user", "hi"),
            Message("assistant",
                    tool_calls=[{"name": "add", "arguments": '{"a": 1}',
                                 "id": "AbCd56789"}]),
            Message("tool", content="2", tool_call_id="AbCd56789"),
        ],
        tools=tools,
    )
    ids = encode_chat(spm, req)
    ws = _b(spm, "▁")
    # pydantic Tool.model_dump() emits description even when "" (field default)
    tools_json = ('[{"type": "function", "function": {"name": "add", '
                  '"description": "", "parameters": {}}}]')
    calls_json = '[{"name": "add", "arguments": {"a": 1}, "id": "AbCd56789"}]'
    result_json = '{"content": 2, "call_id": "AbCd56789"}'
    # SPM normalization maps every interior space to ▁ before BPE
    def norm(t):
        return t.replace(" ", "▁")

    want = (
        [1]
        + [5] + ws + _b(spm, norm(tools_json)) + [6]    # [AVAILABLE_TOOLS]
        + [3] + ws + _b(spm, "hi") + [4]                # [INST] hi [/INST]
        + [9] + ws + _b(spm, norm(calls_json)) + [2]    # [TOOL_CALLS] …</s>
        + [7] + ws + _b(spm, norm(result_json)) + [8]   # [TOOL_RESULTS]
    )
    assert ids == want


def test_golden_tool_history_tokenized(spm):
    """Tool calls/results from turns BEFORE the last user message ARE
    re-tokenized in the v3 wire format (mistral-common
    InstructTokenizerV3.encode_tool_message: "history is tokenized also";
    v2 dropped them — no shipping checkpoint uses v2 tool calling)."""
    history = [
        Message("user", "hi"),
        Message("assistant",
                tool_calls=[{"name": "add", "arguments": {}, "id": "AbCd56789"}]),
        Message("tool", content="2", tool_call_id="AbCd56789"),
        Message("assistant", "two"),
        Message("user", "go"),
    ]
    ids = encode_chat(spm, ChatRequest(messages=history))
    ws = _b(spm, "▁")

    def norm(t):
        return t.replace(" ", "▁")

    calls_json = '[{"name": "add", "arguments": {}, "id": "AbCd56789"}]'
    result_json = '{"content": 2, "call_id": "AbCd56789"}'
    want = (
        [1]
        + [3] + ws + _b(spm, "hi") + [4]                # [INST] hi [/INST]
        + [9] + ws + _b(spm, norm(calls_json)) + [2]    # [TOOL_CALLS] …</s>
        + [7] + ws + _b(spm, norm(result_json)) + [8]   # [TOOL_RESULTS] …
        + ws + _b(spm, "two") + [2]                     # assistant</s>
        + [3] + ws + _b(spm, "go") + [4]
    )
    assert ids == want


def test_golden_tool_call_id_validation(spm):
    bad = ChatRequest(messages=[
        Message("user", "hi"),
        Message("assistant", tool_calls=[{"name": "f", "arguments": {},
                                          "id": "short"}]),
    ])
    with pytest.raises(ValueError, match="9 alphanumeric"):
        encode_chat(spm, bad)


def test_golden_instruct_tekken(tekken):
    req = ChatRequest(messages=[Message("user", "hi")])
    ids = encode_chat(tekken, req)
    # Tekken: no dummy prefix; raw bytes at 20 + byte.
    want = [1, tekken.special("[INST]")] + [20 + c for c in b"hi"] + [
        tekken.special("[/INST]")
    ]
    assert ids == want


def test_golden_fim_spm(spm):
    ids = encode_fim(spm, prefix="a", suffix="b")
    # <s>[SUFFIX]{suffix}[PREFIX] {prefix} — v3 control ids 13/11
    ws = _b(spm, "▁")
    want = [1, 13] + ws + _b(spm, "b") + [11] + ws + _b(spm, "a")
    assert ids == want


def test_golden_fim_tekken(tekken):
    ids = encode_fim(tekken, prefix="a", suffix="b")
    want = [1, tekken.special("[SUFFIX]")] + [20 + c for c in b"b"] + [
        tekken.special("[PREFIX]")
    ] + [20 + c for c in b"a"]
    assert ids == want


def test_golden_system_without_user_message(spm):
    """A request with a system prompt but no user turn must not silently
    drop the instructions: a leading user turn is synthesized from them
    (leniency beyond mistral-common, whose request validator rejects
    conversations that don't end on a user/tool turn)."""
    req = ChatRequest(messages=[
        Message("system", "S"),
        Message("assistant", "partial"),
    ])
    ids = encode_chat(spm, req)
    ws = _b(spm, "▁")
    want = [1, 3] + ws + _b(spm, "S") + [4] + ws + _b(spm, "partial") + [2]
    assert ids == want
