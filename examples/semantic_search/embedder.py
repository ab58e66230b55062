"""Text embedders for the semantic-search example.

The reference example uses sentence-transformers/all-MiniLM-L6-v2 (384-dim).
This example uses the same model when it is installed and its weights are
available locally; otherwise it falls back to a deterministic offline
embedder (hashed character-n-gram random projection, 384-dim, L2-normalized)
so the example runs in air-gapped environments. The fallback is not a
language model — it captures lexical similarity only — but it exercises the
identical storage/quantize/search pipeline.
"""

from __future__ import annotations

import hashlib

import numpy as np

DIM = 384


class HashEmbedder:
    """Deterministic offline embedder: hashed 3-5-gram random projection."""

    name = "hashed-ngram-384"

    def __init__(self, dim: int = DIM, seed: int = 1234):
        self.dim = dim
        self._seed = seed

    def _gram_vector(self, gram: str) -> np.ndarray:
        h = hashlib.blake2b(gram.encode(), digest_size=8).digest()
        rng = np.random.default_rng(
            int.from_bytes(h, "little") ^ self._seed
        )
        return rng.standard_normal(self.dim).astype(np.float32)

    def encode(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, text in enumerate(texts):
            t = " ".join(text.lower().split())
            acc = np.zeros(self.dim, np.float32)
            count = 0
            for n in (3, 4, 5):
                for j in range(max(len(t) - n + 1, 0)):
                    acc += self._gram_vector(t[j : j + n])
                    count += 1
            if count:
                acc /= np.linalg.norm(acc) or 1.0
            out[i] = acc
        return out


class SentenceTransformerEmbedder:
    """The reference example's model (needs local weights)."""

    name = "all-MiniLM-L6-v2"

    def __init__(self):
        from sentence_transformers import SentenceTransformer

        self.model = SentenceTransformer("all-MiniLM-L6-v2")

    def encode(self, texts: list[str]) -> np.ndarray:
        return np.asarray(self.model.encode(texts), np.float32)


def get_embedder():
    try:
        return SentenceTransformerEmbedder()
    except Exception:
        return HashEmbedder()
