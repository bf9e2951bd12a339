"""Tokenizer subsystem tests: hand-built SentencePiece ModelProto bytes and a
tiny tekken.json — no external tokenizer files needed (mirrors the
reference's DebugTokenizer strategy, reference: test_generate.py:12-33)."""

import base64
import json
import struct

import pytest

from mistral_inference_tpu.tokenizers import load_tokenizer
from mistral_inference_tpu.tokenizers.chat import (
    ChatRequest,
    Message,
    encode_chat,
    encode_fim,
)
from mistral_inference_tpu.tokenizers.spm import WS, SentencePieceBPE, parse_model_proto
from mistral_inference_tpu.tokenizers.tekken import Tekken


# -- protobuf construction helpers -----------------------------------------


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
    body = b"\x0a" + _varint(len(p)) + p  # field 1, wire 2
    body += b"\x15" + struct.pack("<f", score)  # field 2, wire 5
    body += b"\x18" + _varint(ptype)  # field 3, wire 0
    return b"\x0a" + _varint(len(body)) + body  # ModelProto field 1


def tiny_spm_model() -> bytes:
    CONTROL, USER, BYTE = 3, 4, 6
    pieces = [
        _piece("<unk>", 0.0, 2),
        _piece("<s>", 0.0, CONTROL),
        _piece("</s>", 0.0, CONTROL),
        _piece("[INST]", 0.0, USER),
        _piece("[/INST]", 0.0, USER),
        _piece(WS + "hello", -1.0),
        _piece(WS + "world", -1.5),
        _piece(WS, -10.0),
        _piece("h", -20.0),
        _piece("e", -20.0),
        _piece("l", -20.0),
        _piece("o", -20.0),
        _piece("w", -20.0),
        _piece("r", -20.0),
        _piece("d", -20.0),
        _piece("he", -5.0),
        _piece("ll", -7.0),
        _piece("llo", -6.0),
        _piece(WS + "he", -4.0),
        _piece(WS + "w", -8.0),
        _piece("or", -8.2),
        _piece("ld", -8.4),
        _piece("orld", -7.5),
    ] + [_piece(f"<0x{b:02X}>", -30.0, BYTE) for b in range(256)]
    return b"".join(pieces)


def test_spm_parse_and_roundtrip():
    tok = SentencePieceBPE(parse_model_proto(tiny_spm_model()))
    assert tok.bos_id == 1 and tok.eos_id == 2
    ids = tok.encode("hello world")
    assert ids[0] == tok.bos_id
    assert tok.piece_to_id[WS + "hello"] in ids
    assert tok.decode(ids) == "hello world"


def test_spm_byte_fallback():
    tok = SentencePieceBPE(parse_model_proto(tiny_spm_model()))
    ids = tok.encode("héllo")  # é not in vocab → utf-8 byte pieces
    assert tok.decode(ids) == "héllo"


def test_spm_greedy_merge_order():
    tok = SentencePieceBPE(parse_model_proto(tiny_spm_model()))
    # "▁he" (-4.0) outranks "he" (-5.0) after ▁+h merge is possible;
    # encoding of "he" alone must pick [▁he] (dummy prefix) as one piece.
    ids = tok.encode("he", bos=False)
    assert ids == [tok.piece_to_id[WS + "he"]]


# -- tekken -----------------------------------------------------------------


def tiny_tekken_cfg() -> dict:
    # byte-level ranks: 256 single bytes + a few merges
    vocab = [
        {"rank": i, "token_bytes": base64.b64encode(bytes([i])).decode()}
        for i in range(256)
    ]
    vocab.append({"rank": 256, "token_bytes": base64.b64encode(b"he").decode()})
    vocab.append({"rank": 257, "token_bytes": base64.b64encode(b"llo").decode()})
    return {
        "config": {
            "pattern": r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+|[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n/]*|\s*[\r\n]+|\s+(?!\S)|\s+",
            "default_vocab_size": 256 + 2 + 20,
            "default_num_special_tokens": 20,
            "version": "v3",
        },
        "vocab": vocab,
    }


def test_tekken_roundtrip(tmp_path):
    p = tmp_path / "tekken.json"
    p.write_text(json.dumps(tiny_tekken_cfg()))
    tok = Tekken.from_file(p)
    assert tok.bos_id == 1 and tok.eos_id == 2
    ids = tok.encode("hello world")
    assert ids[0] == tok.bos_id
    assert all(i >= 20 for i in ids[1:])  # specials offset
    assert tok.decode(ids) == "hello world"


def test_tekken_autodiscovery(tmp_path):
    (tmp_path / "tekken.json").write_text(json.dumps(tiny_tekken_cfg()))
    tok = load_tokenizer(tmp_path)
    assert isinstance(tok, Tekken)


def test_spm_autodiscovery(tmp_path):
    (tmp_path / "tokenizer.model.v3").write_bytes(tiny_spm_model())
    tok = load_tokenizer(tmp_path)
    assert isinstance(tok, SentencePieceBPE)
    with pytest.raises(FileNotFoundError):
        load_tokenizer(tmp_path / "nope")


# -- chat templating --------------------------------------------------------


def test_chat_instruct_control_tokens():
    tok = SentencePieceBPE(parse_model_proto(tiny_spm_model()))
    req = ChatRequest(messages=[Message("user", "hello")])
    ids = encode_chat(tok, req)
    inst, end_inst = tok.piece_to_id["[INST]"], tok.piece_to_id["[/INST]"]
    assert ids[0] == tok.bos_id
    assert inst in ids and end_inst in ids
    assert ids.index(inst) < ids.index(end_inst)
    assert ids[-1] == end_inst  # ends ready for assistant generation


def test_chat_multiturn_ends_with_last_inst():
    tok = SentencePieceBPE(parse_model_proto(tiny_spm_model()))
    req = ChatRequest(
        messages=[
            Message("system", "world"),
            Message("user", "hello"),
            Message("assistant", "world"),
            Message("user", "hello hello"),
        ]
    )
    ids = encode_chat(tok, req)
    assert ids.count(tok.piece_to_id["[INST]"]) == 2
    assert ids.count(tok.eos_id) == 1  # one closed assistant turn
    assert ids[-1] == tok.piece_to_id["[/INST]"]


def test_chat_tools_attached_before_last_user(tmp_path):
    p = tmp_path / "tekken.json"
    p.write_text(json.dumps(tiny_tekken_cfg()))
    tok = Tekken.from_file(p)
    tools = [{"type": "function", "function": {"name": "f"}}]
    req = ChatRequest(messages=[Message("user", "hello")], tools=tools)
    ids = encode_chat(tok, req)
    at = tok.special("[AVAILABLE_TOOLS]")
    inst = tok.special("[INST]")
    assert at in ids and ids.index(at) < ids.index(inst)


def test_fim(tmp_path):
    p = tmp_path / "tekken.json"
    p.write_text(json.dumps(tiny_tekken_cfg()))
    tok = Tekken.from_file(p)
    ids = encode_fim(tok, prefix="hello", suffix="world")
    assert ids[0] == tok.bos_id
    assert ids[1] == tok.special("[SUFFIX]")
    assert tok.special("[PREFIX]") in ids


# -- native core ------------------------------------------------------------


def test_native_bpe_matches_python():
    """C++ merge loop (native/bpe.cc) must segment identically to the
    pure-Python reference path."""
    from mistral_inference_tpu import native

    if native.lib() is None:
        pytest.skip("no C++ toolchain")
    tok = SentencePieceBPE(parse_model_proto(tiny_spm_model()))
    texts = ["hello world", "he", "héllo wörld", "", "hello hello hello world w o r"]
    for t in texts:
        norm = WS + t.replace(" ", WS)
        assert tok._bpe_segment(norm) == tok._bpe_segment_py(norm), t


def test_spm_special_pieces_match_in_encode():
    """USER_DEFINED pieces ([INST] etc) must encode as single ids when they
    appear in raw text (sentencepiece user_defined_symbols behavior)."""
    tok = SentencePieceBPE(parse_model_proto(tiny_spm_model()))
    ids = tok.encode("[INST] hello [/INST]", bos=False)
    assert tok.piece_to_id["[INST]"] in ids
    assert tok.piece_to_id["[/INST]"] in ids
    assert ids[0] == tok.piece_to_id["[INST]"]


def test_chat_no_double_space():
    """Control-token chat encoding must encode content verbatim (the SPM
    dummy prefix supplies the leading ▁; an explicit space would double it)."""
    tok = SentencePieceBPE(parse_model_proto(tiny_spm_model()))
    req = ChatRequest(messages=[Message("user", "hello")])
    ids = encode_chat(tok, req)
    inst = tok.piece_to_id["[INST]"]
    after = ids[ids.index(inst) + 1]
    assert after == tok.piece_to_id[WS + "hello"]  # not [▁, ▁hello]


def test_spm_control_pieces_not_encoded_from_text():
    """CONTROL pieces must never be produced from plain text (sentencepiece
    parity + prompt-injection hardening, ADVICE r1); USER_DEFINED pieces
    still match verbatim. Control ids remain reachable via special()."""
    tok = SentencePieceBPE(parse_model_proto(tiny_spm_model()))
    # "</s>" is CONTROL: must byte/BPE-encode as text, not inject eos_id
    ids = tok.encode("hello </s> world", bos=False)
    assert tok.eos_id not in ids
    # "[INST]" is USER_DEFINED in this vocab: still matches verbatim
    ids2 = tok.encode("x [INST] y", bos=False)
    assert tok.special("[INST]") in ids2
    # explicit lookup exposes CONTROL ids
    assert tok.special("</s>") == tok.eos_id
    with pytest.raises(KeyError):
        tok.special("[NOPE]")
