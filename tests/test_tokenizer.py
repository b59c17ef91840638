"""CLIP BPE tokenizer tests: merge algorithm, HF-call parity semantics,
fallback mode."""

import json
import os

import numpy as np
import pytest

from t2igan.data.tokenizer import (BOS_TOKEN, EOS_TOKEN, VOCAB_SIZE,
                                   ClipTokenizer, bytes_to_unicode)


@pytest.fixture
def tiny_bpe(tmp_path):
    """A miniature vocab/merges pair exercising real merge ordering."""
    b2u = bytes_to_unicode()
    syms = [b2u[i] for i in range(256)]
    vocab = {}
    for i, s in enumerate(syms):
        vocab[s] = i
        vocab[s + "</w>"] = 256 + i
    # merge 'l o' -> 'lo', then 'lo w</w>' -> 'low</w>'
    merges = ["#version: 0.2", "l o", "lo w</w>", "h e", "he y</w>"]
    nid = 512
    for tok in ["lo", "low</w>", "he", "hey</w>"]:
        vocab[tok] = nid
        nid += 1
    vocab[BOS_TOKEN] = VOCAB_SIZE - 2
    vocab[EOS_TOKEN] = VOCAB_SIZE - 1
    vj = tmp_path / "vocab.json"
    mt = tmp_path / "merges.txt"
    vj.write_text(json.dumps(vocab))
    mt.write_text("\n".join(merges))
    return ClipTokenizer.from_files(str(vj), str(mt))


def test_bpe_merges_apply_in_rank_order(tiny_bpe):
    assert tiny_bpe.tokenize("low") == ["low</w>"]
    assert tiny_bpe.tokenize("hey") == ["hey</w>"]
    # 'lot': 'l o' merges but 'lo t</w>' is not a merge
    assert tiny_bpe.tokenize("lot") == ["lo", "t</w>"]


def test_lowercase_and_whitespace(tiny_bpe):
    assert tiny_bpe.tokenize("LOW   low") == ["low</w>", "low</w>"]


def test_specials_and_padding(tiny_bpe):
    out = tiny_bpe(["low", "hey low"], max_length=8)
    ids, mask = out["input_ids"], out["attention_mask"]
    assert ids.shape == (2, 8)
    assert ids[0, 0] == tiny_bpe.bos_id
    assert ids[0, 2] == tiny_bpe.eos_id
    # padding with eos id, mask marks real tokens only
    assert (ids[0, 3:] == tiny_bpe.pad_id).all()
    np.testing.assert_array_equal(mask[0], [1, 1, 1, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(mask[1], [1, 1, 1, 1, 0, 0, 0, 0])


def test_truncation(tiny_bpe):
    out = tiny_bpe(["low " * 50], max_length=10)
    ids = out["input_ids"][0]
    assert len(ids) == 10
    assert ids[-1] == tiny_bpe.eos_id
    assert out["attention_mask"][0].sum() == 10


def test_decode_roundtrip(tiny_bpe):
    ids = tiny_bpe.encode("hey low")
    assert tiny_bpe.decode(ids) == "hey low"


def test_fallback_mode_runs():
    tok = ClipTokenizer.load(None)
    out = tok(["a small bird with red wings"], max_length=30)
    assert out["input_ids"].shape == (1, 30)
    assert out["input_ids"][0, 0] == VOCAB_SIZE - 2
    assert out["attention_mask"][0].sum() > 5
    assert tok.decode(tok.encode("red bird")) == "red bird"


def test_load_from_env(tmp_path, tiny_bpe, monkeypatch):
    monkeypatch.setenv("T2IGAN_CLIP_TOKENIZER", str(tmp_path))
    tok = ClipTokenizer.load(None)
    assert tok.tokenize("low") == ["low</w>"]


@pytest.mark.slow
def test_matches_hf_tokenizer_if_cached():
    """Parity against HF CLIPTokenizer when its files are available locally
    (skipped in sealed environments)."""
    try:
        from transformers import CLIPTokenizer as HFTok
        hf = HFTok.from_pretrained("openai/clip-vit-base-patch32",
                                   local_files_only=True)
    except Exception:
        pytest.skip("HF tokenizer files not cached")
    tok = ClipTokenizer(
        {k: v for k, v in hf.get_vocab().items()},
        {tuple(m.split()): i
         for i, m in enumerate(hf.backend_tokenizer.model.__getstate__())})
    text = "A small yellow bird with black wings, 42 feathers!"
    assert tok.encode(text) == hf(text)["input_ids"]
