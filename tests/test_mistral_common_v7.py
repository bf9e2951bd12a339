"""Vendored mistral-common v7 wire-format vectors (VERDICT r4 missing #1).

The reference pins ``mistral_common >= 1.5.4`` (reference:
pyproject.toml:30), which ships ``InstructTokenizerV7`` — the template
Small-3.1, Large-2.x (2411+) and Pixtral-Large were trained on. As with
the v3 vectors (test_mistral_common_v3.py), mistral-common is not
installable here (zero egress), so these are re-derived by hand from
public sources and pinned at the algorithm level;
``benchmarks/diff_mistral_common.py`` byte-diffs the real package the
moment one is available.

Provenance map:
  * Mistral's public Large-2411 / Small-3.1 model cards document the chat
    template as ``<s>[SYSTEM_PROMPT] <system>[/SYSTEM_PROMPT][INST]
    <user>[/INST] <answer></s>[INST] <user>[/INST]`` — the system prompt
    is a dedicated control-token block at the START of the conversation,
    no longer folded into the last user message (the leading spaces in
    the rendered card are SPM's ▁ dummy-prefix, not literal spaces).
    [STRONG — published template.]
  * mistral_common/tokens/tokenizers/sentencepiece.py @ v1.5.x,
    ``InstructTokenizerV7``:
      - ``encode_system_message`` → [SYSTEM_PROMPT] + encode(content) +
        [/SYSTEM_PROMPT]; the v7 normalizer keeps system messages in
        conversation order instead of aggregating them into one prompt.
      - ``encode_tool_message`` → [TOOL_RESULTS] + encode(tool_call_id) +
        [TOOL_CONTENT] + encode(content) + [/TOOL_RESULTS]; the v3 JSON
        {"content", "call_id"} wrapper is gone and the call id is
        REQUIRED (it is the only delimiter on the wire).
        [MEDIUM — derived from the public source; transcription risk
        noted, diff harness staged.]
      - assistant [TOOL_CALLS] payloads keep the v3 JSON-list shape
        ({"name","arguments"[,"id"]}); the name[ARGS] split arrived only
        with v11 (mistral-common >= 1.6), which no reference-supported
        checkpoint uses.
  * SpecialTokens enum @ v1.5.x adds ``begin_system = "[SYSTEM_PROMPT]"``,
    ``end_system = "[/SYSTEM_PROMPT]"``,
    ``begin_tool_content = "[TOOL_CONTENT]"`` — the detection key
    tokenizers/chat.py uses (a v7 tokenizer file carries these control
    tokens; v3 files do not).

The SPM fixture appends the three v7 control pieces after the v3 layout —
fixture-local ids (the real tokenizer.model.v7 id layout is irrelevant to
the TEMPLATE logic under test; real-vocab goldens need real files).
"""

import pytest

from mistral_inference_tpu.tokenizers.chat import (
    ChatRequest,
    Message,
    encode_chat,
)
from mistral_inference_tpu.tokenizers.spm import SentencePieceBPE, parse_model_proto

from test_chat_golden import V3_SPECIALS, _piece

V7_SPECIALS = V3_SPECIALS + [
    "[SYSTEM_PROMPT]", "[/SYSTEM_PROMPT]", "[TOOL_CONTENT]",
]
SYS, ESYS, TCONT = 14, 15, 16  # fixture ids of the three new controls


def spm_v7_model() -> bytes:
    CONTROL, BYTE, UNK = 3, 6, 2
    pieces = [_piece("<unk>", 0.0, UNK)]
    pieces += [_piece(sp, 0.0, CONTROL) for sp in V7_SPECIALS[1:]]
    pieces += [_piece(f"<0x{b:02X}>", -30.0, BYTE) for b in range(256)]
    return b"".join(pieces)


@pytest.fixture(scope="module")
def spm7():
    return SentencePieceBPE(parse_model_proto(spm_v7_model()))


def _b(s: str):
    off = len(V7_SPECIALS)
    return [off + c for c in s.encode()]


WS = _b("▁")  # SPM dummy-prefix piece bytes


def _norm(t: str) -> str:
    return t.replace(" ", "▁")


def test_v7_system_prompt_is_leading_block(spm7):
    """The system prompt is its own [SYSTEM_PROMPT] block at the start —
    NOT folded into the last user message (the v3 rule)."""
    req = ChatRequest(messages=[
        Message("system", "Be terse."),
        Message("user", "2+2?"),
        Message("assistant", "4"),
        Message("user", "3+3?"),
    ])
    want = (
        [1, SYS] + WS + _b(_norm("Be terse.")) + [ESYS]
        + [3] + WS + _b(_norm("2+2?")) + [4]
        + WS + _b("4") + [2]
        + [3] + WS + _b(_norm("3+3?")) + [4]
    )
    assert encode_chat(spm7, req) == want


def test_v7_system_message_keeps_position(spm7):
    """InstructRequestNormalizerV7 does NOT aggregate system messages to
    one prompt: a mid-conversation system message encodes at its place."""
    req = ChatRequest(messages=[
        Message("system", "A"),
        Message("user", "u1"),
        Message("assistant", "a1"),
        Message("system", "B"),
        Message("user", "u2"),
    ])
    want = (
        [1, SYS] + WS + _b("A") + [ESYS]
        + [3] + WS + _b("u1") + [4]
        + WS + _b("a1") + [2]
        + [SYS] + WS + _b("B") + [ESYS]
        + [3] + WS + _b("u2") + [4]
    )
    assert encode_chat(spm7, req) == want


def test_v7_consecutive_system_messages_merge(spm7):
    """Consecutive same-role runs merge "\\n\\n"-joined (base normalizer
    aggregation, unchanged in v7)."""
    req = ChatRequest(messages=[
        Message("system", "A"),
        Message("system", "B"),
        Message("user", "u"),
    ])
    assert encode_chat(spm7, req) == encode_chat(
        spm7, ChatRequest(messages=[Message("system", "A\n\nB"),
                                    Message("user", "u")])
    )


def test_v7_tool_result_raw_content(spm7):
    """V7.encode_tool_message: [TOOL_RESULTS]{id}[TOOL_CONTENT]{content}
    [/TOOL_RESULTS] — no JSON {"content","call_id"} wrapper (that is the
    v3 shape)."""
    req = ChatRequest(messages=[
        Message("user", "go"),
        Message("assistant", tool_calls=[{
            "name": "f", "arguments": {}, "id": "AbCd56789",
        }]),
        Message("tool", content="42", tool_call_id="AbCd56789"),
        Message("user", "and?"),
    ])
    ids = encode_chat(spm7, req)
    mid = (
        [7] + WS + _b("AbCd56789")
        + [TCONT] + WS + _b("42")
        + [8]
    )
    s = ",".join(map(str, ids))
    assert ",".join(map(str, mid)) in s


def test_v7_tool_result_requires_call_id(spm7):
    req = ChatRequest(messages=[
        Message("user", "go"),
        Message("assistant", tool_calls=[{"name": "f", "arguments": {}}]),
        Message("tool", content="42"),
    ])
    with pytest.raises(ValueError, match="tool_call_id"):
        encode_chat(spm7, req)


def test_v7_tool_calls_keep_v3_json_shape(spm7):
    """Assistant [TOOL_CALLS] payloads are unchanged from v3: a JSON list
    of {"name","arguments"[,"id"]} (the name[ARGS] split is v11+)."""
    req = ChatRequest(messages=[
        Message("user", "go"),
        Message("assistant", tool_calls=[{"name": "f", "arguments": {}}]),
    ])
    calls_json = '[{"name": "f", "arguments": {}}]'
    want = (
        [1, 3] + WS + _b("go") + [4]
        + [9] + WS + _b(_norm(calls_json)) + [2]
    )
    assert encode_chat(spm7, req) == want


def test_v7_tools_precede_last_user_message(spm7):
    """[AVAILABLE_TOOLS] placement is unchanged from v3: immediately before
    the LAST user message."""
    req = ChatRequest(
        messages=[
            Message("system", "S"),
            Message("user", "u1"),
            Message("assistant", "a1"),
            Message("user", "u2"),
        ],
        tools=[{"function": {"name": "add", "parameters": {}}}],
    )
    tools_json = ('[{"type": "function", "function": {"name": "add", '
                  '"description": "", "parameters": {}}}]')
    want = (
        [1, SYS] + WS + _b("S") + [ESYS]
        + [3] + WS + _b("u1") + [4]
        + WS + _b("a1") + [2]
        + [5] + WS + _b(_norm(tools_json)) + [6]
        + [3] + WS + _b("u2") + [4]
    )
    assert encode_chat(spm7, req) == want


def test_v3_tokenizer_unaffected(spm7):
    """Regression guard: a v3 tokenizer (no [SYSTEM_PROMPT] control) still
    folds the system prompt into the last user message — the whole v3
    golden suite (test_mistral_common_v3.py) runs against the same code."""
    from test_chat_golden import spm_v3_model

    spm3 = SentencePieceBPE(parse_model_proto(spm_v3_model()))
    req = ChatRequest(messages=[
        Message("system", "S"),
        Message("user", "u"),
    ])
    ids3 = encode_chat(spm3, req)
    off3 = len(V3_SPECIALS)

    def b3(s):
        return [off3 + c for c in s.encode()]

    assert ids3 == [1, 3] + b3("▁") + b3(_norm("S\n\nu")) + [4]
