"""SPM golden tests against independent implementations (VERDICT r1 #9).

No sentencepiece library and no network in this environment, so the golden
references are:

  * the REAL protobuf serializer (transformers' vendored
    ``sentencepiece_model_pb2_new`` schema) writes the ``tokenizer.model``
    file — validating our hand-rolled wire-format parser against genuine
    proto output, not against bytes we synthesized ourselves;
  * HuggingFace ``tokenizers``' Rust BPE engine applies the same merges —
    an independent implementation of score-ordered BPE segmentation to
    differential-test our encoder on real-text corpora.
"""

import os
import tempfile

import pytest

pytest.importorskip("transformers")
pytest.importorskip("tokenizers")

from mistral_inference_tpu.tokenizers.spm import (  # noqa: E402
    SentencePieceBPE,
    parse_model_proto,
)

WORDS = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "language", "models", "estimate", "token", "probability", "prefix",
]


def _build_real_proto(path: str) -> None:
    """Write a BPE ModelProto with the real protobuf library: specials,
    byte fallback, single chars, and all multi-char prefixes of WORDS with
    strictly descending scores (longer pieces score higher)."""
    from transformers.utils import sentencepiece_model_pb2_new as sp_pb2

    m = sp_pb2.ModelProto()
    T = sp_pb2.ModelProto.SentencePiece.Type

    def add(piece, score, t=T.NORMAL):
        p = m.pieces.add()
        p.piece = piece
        p.score = score
        p.type = t

    add("<unk>", 0.0, T.UNKNOWN)
    add("<s>", 0.0, T.CONTROL)
    add("</s>", 0.0, T.CONTROL)
    for b in range(256):
        add(f"<0x{b:02X}>", 0.0, T.BYTE)

    pieces = set()
    for w in WORDS:
        w = "▁" + w
        for i in range(1, len(w) + 1):
            pieces.add(w[:i])
        for ch in w:
            pieces.add(ch)
    # strictly distinct scores: longer pieces first (greedy prefix growth)
    ordered = sorted(pieces, key=lambda p: (-len(p), p))
    for i, piece in enumerate(ordered):
        add(piece, -float(i + 1))

    m.trainer_spec.model_type = sp_pb2.TrainerSpec.ModelType.BPE
    m.trainer_spec.unk_id = 0
    m.trainer_spec.unk_piece = "<unk>"
    m.trainer_spec.byte_fallback = True
    m.normalizer_spec.add_dummy_prefix = True
    with open(path, "wb") as f:
        f.write(m.SerializeToString())


@pytest.fixture(scope="module")
def spm_file():
    d = tempfile.mkdtemp()
    path = os.path.join(d, "tokenizer.model")
    _build_real_proto(path)
    return path


def test_parse_real_proto(spm_file):
    """Our wire-format parser must read what the real proto library wrote."""
    tok = SentencePieceBPE.from_file(spm_file)
    assert tok.bos_id == 1 and tok.eos_id == 2 and tok.unk_id == 0
    assert tok.id_to_piece(3) == "<0x00>"
    assert "▁the" in tok.piece_to_id
    # scores survived the float32 round-trip
    pid = tok.piece_to_id["▁the"]
    assert tok.scores[pid] < 0


def _hf_bpe(spm_file):
    """Independent merge engine: tokenizers' Rust BPE with merges ordered by
    descending merged-piece score (score order == merge-rank order when
    scores are strictly distinct, which _build_real_proto guarantees)."""
    from tokenizers import Tokenizer
    from tokenizers.models import BPE

    tok = SentencePieceBPE.from_file(spm_file)
    vocab = {p: i for i, (p, _, _) in enumerate(tok.pieces)}
    candidates = []
    for piece, pid in vocab.items():
        if piece.startswith("<0x") or piece in ("<unk>", "<s>", "</s>"):
            continue
        if len(piece) < 2:
            continue
        for split in range(1, len(piece)):
            a, b = piece[:split], piece[split:]
            if a in vocab and b in vocab:
                candidates.append((tok.scores[pid], a, b))
    candidates.sort(key=lambda t: -t[0])
    merges = [(a, b) for _, a, b in candidates]
    return Tokenizer(BPE(vocab, merges, unk_token="<unk>", byte_fallback=True, fuse_unk=True))


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "language models estimate the probability of the token prefix",
    "dog dog dog",
    "quicklazy foxdog",          # concatenations force partial merges
    "thequickbrownfox",
    "over over over the fox",
]


def test_encode_matches_independent_bpe(spm_file):
    ours = SentencePieceBPE.from_file(spm_file)
    hf = _hf_bpe(spm_file)
    WS = "▁"
    for text in CORPUS:
        norm = WS + text.replace(" ", WS)  # add_dummy_prefix normalization
        expect = hf.encode(norm, add_special_tokens=False).ids
        got = ours.encode(text, bos=False)
        assert got == expect, (text, got, expect)


def test_decode_roundtrip(spm_file):
    ours = SentencePieceBPE.from_file(spm_file)
    for text in CORPUS:
        assert ours.decode(ours.encode(text, bos=False)) == text


def test_byte_fallback_on_oov(spm_file):
    ours = SentencePieceBPE.from_file(spm_file)
    ids = ours.encode("héllo", bos=False)
    assert ours.decode(ids) == "héllo"
