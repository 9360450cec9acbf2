"""CLIP BPE tokenizer.

Equivalent of the CLIPTokenizer the reference pulls from transformers
(reference: nerf/sd.py:42,72-78) and clip.tokenize (nerf/clip.py:30).
Implements the byte-pair-encoding scheme from scratch; the merge table
loads from a local `bpe_simple_vocab_16e6.txt[.gz]` (or HF `merges.txt`)
when available. In a weights-free environment a deterministic
hash-bucket fallback keeps the pipeline runnable (paired with random
encoder weights, exactness is moot; determinism is what tests need).
"""

from __future__ import annotations

import gzip
import html
import os
import re
from functools import lru_cache
from typing import List, Optional

import numpy as np


@lru_cache()
def bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class CLIPTokenizer:
    VOCAB_SIZE = 49408
    SOT = 49406
    EOT = 49407

    def __init__(self, bpe_path: Optional[str] = None, context_length: int = 77,
                 pad_token_id: int = 0):
        """pad_token_id: 0 ('!') for SD2/OpenCLIP, EOT (49407) for the
        SD1.5 CLIP tokenizer (diffusers pads with EOT there)."""
        self.context_length = context_length
        self.pad_token_id = pad_token_id
        self.byte_encoder = bytes_to_unicode()
        # CLIP's pre-tokenizer uses unicode letter/number classes; the
        # `regex` module supports \p{L}/\p{N}. ASCII classes are only a
        # degraded fallback (non-Latin text would tokenize differently).
        try:
            import regex as _regex

            self.pat = _regex.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
                _regex.IGNORECASE,
            )
        except ImportError:  # pragma: no cover
            self.pat = re.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
                re.IGNORECASE,
            )
        self.bpe_ranks = None
        self.encoder = None
        if bpe_path and os.path.exists(bpe_path):
            self._load_bpe(bpe_path)

    def _load_bpe(self, path: str):
        if path.endswith(".gz"):
            merges = gzip.open(path).read().decode("utf-8").split("\n")
        else:
            merges = open(path, encoding="utf-8").read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges if m]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self._cache = {}

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1e10))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = whitespace_clean(basic_clean(text)).lower()
        ids: List[int] = []
        for token in self.pat.findall(text):
            if self.encoder is not None:
                tok = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
                ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
            else:
                # deterministic fallback: hash each word into the BPE id
                # range (excluding specials)
                h = 0
                for ch in token:
                    h = (h * 131 + ord(ch)) % (self.VOCAB_SIZE - 2 - 1000)
                ids.append(1000 + h)
        return ids

    def __call__(self, texts, truncate: bool = True) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), self.context_length), self.pad_token_id,
                      np.int64)
        for i, t in enumerate(texts):
            ids = [self.SOT] + self.encode(t) + [self.EOT]
            if len(ids) > self.context_length:
                if not truncate:
                    raise ValueError(f"too long: {t!r}")
                ids = ids[: self.context_length]
                ids[-1] = self.EOT
            out[i, : len(ids)] = ids
        return out
