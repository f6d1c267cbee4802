"""Host-side text tokenizer wrapper (reference: src/sopro/tokenizer.py).

The Llama-3.2 BPE vocabulary ships inside the sopro HF repo and is loaded
from the snapshot directory (reference: src/sopro/model.py:441). Tokenization
stays on host by design (BASELINE.json north star)."""

from __future__ import annotations

from typing import List


class TextTokenizer:
    def __init__(self, model_name: str, add_bos_eos: bool = True):
        from transformers import AutoTokenizer
        from transformers import logging as hf_logging

        hf_logging.set_verbosity_error()
        self.tok = AutoTokenizer.from_pretrained(model_name, use_fast=True)
        self.add_bos_eos = add_bos_eos

        # add <|pad|> if the vocab lacks one (reference: tokenizer.py:22-23)
        if self.tok.pad_token_id is None:
            self.tok.add_special_tokens({"pad_token": "<|pad|>"})

        self.pad_id = int(self.tok.pad_token_id)
        self.bos_id = (
            int(self.tok.bos_token_id) if self.tok.bos_token_id is not None else None
        )
        self.eos_id = (
            int(self.tok.eos_token_id) if self.tok.eos_token_id is not None else None
        )
        # base + added vocab (reference: tokenizer.py:32)
        self.vocab_size = int(self.tok.vocab_size + len(self.tok.get_added_vocab()))

    def encode(self, text: str) -> List[int]:
        """BPE ids wrapped with BOS/EOS (reference: tokenizer.py:34-38)."""
        ids = self.tok.encode(text, add_special_tokens=False)
        if self.add_bos_eos and self.bos_id is not None and self.eos_id is not None:
            ids = [self.bos_id] + ids + [self.eos_id]
        return ids


class SimpleCharTokenizer:
    """Dependency-free fallback (tests/benches without a tokenizer snapshot):
    byte-level ids offset by 3, BOS=1, EOS=2, PAD=0."""

    def __init__(self, add_bos_eos: bool = True):
        self.add_bos_eos = add_bos_eos
        self.pad_id = 0
        self.bos_id = 1
        self.eos_id = 2
        self.vocab_size = 256 + 3

    def encode(self, text: str) -> List[int]:
        ids = [b + 3 for b in text.encode("utf-8")]
        if self.add_bos_eos:
            ids = [self.bos_id] + ids + [self.eos_id]
        return ids
