"""Tiny REAL transformers CLIPTokenizer built from locally-written vocab
files — lets zero-egress tests exercise the actual empty-prompt tokenization
the reference relies on (denoise_ppo.py:39-48): "" -> [BOS, EOS, EOS, ...],
never all-zero ids."""

import json
import os


def make_tiny_clip_tokenizer(tmp_dir, save_dir=None):
    """Build a CLIPTokenizer over a 54-token lowercase-letters vocab.
    ``save_dir`` additionally saves it in AutoTokenizer-loadable form."""
    from transformers import CLIPTokenizer

    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[ch] = 2 + i
        vocab[ch + "</w>"] = 28 + i
    os.makedirs(tmp_dir, exist_ok=True)
    vpath = os.path.join(tmp_dir, "vocab.json")
    mpath = os.path.join(tmp_dir, "merges.txt")
    with open(vpath, "w") as f:
        json.dump(vocab, f)
    with open(mpath, "w") as f:
        f.write("#version: 0.2\n")
    tok = CLIPTokenizer(vpath, mpath)
    if save_dir is not None:
        tok.save_pretrained(save_dir)
    return tok
