"""BPE-algorithm parity vs HuggingFace's real CLIPTokenizer.

The production vocab files (openai/clip-vit-large-patch14) are not in this
environment, but the *algorithm* — byte-level encoding, merge ranking, the
token regex, sot/eot wrapping, eot-padding and truncation, and added-token
handling — is vocab-independent. This builds a tiny byte-complete vocab in
the standard HF format (vocab.json + merges.txt), instantiates
transformers.CLIPTokenizer on it, and compares ids with
ClipTokenizer.from_hf_files on a battery of strings.

(Reference consumes HF CLIPTokenizer directly:
sgm/modules/encoders/modules.py:397,417-431.)
"""
import json
import os

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from custom_diffusion360_tpu.data.tokenizer import (  # noqa: E402
    ClipTokenizer,
    bytes_to_unicode,
)

MERGES = [
    ("h", "e"),
    ("l", "l"),
    ("he", "ll"),
    ("hell", "o</w>"),
    ("c", "a"),
    ("ca", "r</w>"),
    ("1", "2"),
    ("'", "s</w>"),
    ("w", "o"),
    ("wo", "r"),
    ("wor", "l"),
    ("worl", "d</w>"),
    ("!", "!"),
]

TEXTS = [
    "hello world",
    "a photo of a car",
    "hello   hello!!",         # whitespace collapse + punct run merge
    "it's 12 o'clock, 123",    # contraction split + digit-by-digit
    "HELLO World",             # lowercasing
    "",                        # empty -> sot eot only
    " hello ",                 # strip
    "hello " * 30,             # truncation forces eot at the end
    "x<new1>y <new1>car",      # added special token splits the stream
]


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_vocab")
    be = bytes_to_unicode()
    v = list(be.values())
    v = v + [x + "</w>" for x in v]
    for m in MERGES:
        v.append("".join(m))
    v.extend(["<|startoftext|>", "<|endoftext|>"])
    vocab = {t: i for i, t in enumerate(v)}
    vp, mp = str(d / "vocab.json"), str(d / "merges.txt")
    with open(vp, "w") as f:
        json.dump(vocab, f)
    with open(mp, "w") as f:
        f.write(
            "#version: 0.2\n"
            + "\n".join(" ".join(m) for m in MERGES)
            + "\n"
        )
    return vp, mp


def test_ids_match_hf(vocab_files):
    vp, mp = vocab_files
    hf = transformers.CLIPTokenizer(vp, mp)
    hf.add_tokens(["<new1>"])
    ours = ClipTokenizer.from_hf_files(
        vp, mp, additional_special_tokens=["<new1>"], context_length=77
    )
    assert ours.encoder["<new1>"] == len(hf) - 1

    for text in TEXTS:
        got = ours(text)[0]
        want = hf(
            text, padding="max_length", max_length=77, truncation=True
        )["input_ids"]
        np.testing.assert_array_equal(
            got, np.asarray(want, np.int32), err_msg=f"text={text!r}"
        )


def test_decode_roundtrip(vocab_files):
    vp, mp = vocab_files
    ours = ClipTokenizer.from_hf_files(vp, mp, context_length=16)
    ids = ours("hello car")[0]
    body = [i for i in ids if i not in (ours.sot, ours.eot)]
    assert ours.decode(body).strip() == "hello car"
