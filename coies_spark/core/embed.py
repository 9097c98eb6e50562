"""Deterministic embeddings + collocation phrases.

The reference trains gensim word2vec/doc2vec models
(word2vec_models.py:38-47, context_based_models.py:85-116), which are
nondeterministic across runs.  Parity is therefore defined on *frozen
seeded vectors* consumed by both the single-node oracle and the Spark
pipeline (FIXTURES.md §4).  ``HashEmbedding`` derives a stable gaussian
vector per token from a salted md5 — the same bytes on every machine,
every run, with no trained artifact to ship.  In production the vocab
table is swapped for real word2vec output (pyspark.ml.feature.Word2Vec)
without touching any downstream stage: everything consumes a plain
``{token: float32[d]}`` mapping.

Phrase detection replicates the *public* collocation-scoring algorithm
gensim implements (Mikolov et al. 2013, "Distributed Representations of
Words and Phrases"): score(a,b) = (count(ab) - delta) * V / (count(a) *
count(b)); merge greedily left-to-right when score > threshold
(reference usage: aaer_corpus.py:105-134).

Doc/gram vector composition parity:
* sum / mean of word vectors  — context_based_models.py:166-180
  (DocVecByWESum / DocVecByWEMean), the flagship context model.
* phrase-token lookup with re-phrase + mean fallback —
  context_based_models.py:184-218 (PhraseVecBigrams), the flagship gram
  model.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Mapping, Sequence

import numpy as np

PHRASE_DELIM = "_"  # gensim-compatible joiner (constants.py:52)


def _seed_for(token: str, salt: str) -> int:
    digest = hashlib.md5((salt + "\x1f" + token).encode("utf-8")).digest()
    return int.from_bytes(digest[:4], "little")


def hash_vector(token: str, dim: int, salt: str = "coies") -> np.ndarray:
    """Stable gaussian float32 vector for a token."""
    rng = np.random.RandomState(_seed_for(token, salt))
    return rng.standard_normal(dim).astype(np.float32)


class HashEmbedding:
    """Lazy deterministic token→vector mapping with a materializable vocab.

    The memo is size-capped (clear-on-cap) so an open vocabulary cannot
    leak memory in a long-lived executor; recompute after a clear is a
    pure function of the token, so eviction is semantics-free.
    """

    CACHE_CAP = 500_000

    def __init__(self, dim: int = 16, salt: str = "coies"):
        self.dim = dim
        self.salt = salt
        self._cache: dict[str, np.ndarray] = {}

    def __getitem__(self, token: str) -> np.ndarray:
        vec = self._cache.get(token)
        if vec is None:
            if len(self._cache) >= self.CACHE_CAP:
                self._cache.clear()
            vec = hash_vector(token, self.dim, self.salt)
            self._cache[token] = vec
        return vec

    def matrix(self, tokens: Sequence[str]) -> np.ndarray:
        """(len(tokens), dim) float32 gather."""
        return np.stack([self[t] for t in tokens]) if tokens else np.zeros((0, self.dim), np.float32)

    def vocab_items(self, tokens: Iterable[str]) -> list[tuple[str, list[float]]]:
        """Materialize (token, vector) rows, e.g. for a broadcast table."""
        return [(t, self[t].tolist()) for t in dict.fromkeys(tokens)]


class MappedEmbedding(HashEmbedding):
    """Production embedding slot: a trained ``{token: vector}`` table
    (e.g. pyspark.ml Word2Vec output, ops/embedding_train.py) with a
    deterministic hash-vector fallback for OOV tokens — replacing the
    reference's nondeterministic incremental vocab update
    (context_based_models.py:161-164; SURVEY.md §2.9 M6)."""

    def __init__(
        self,
        mapping: Mapping[str, Sequence[float]],
        dim: int,
        salt: str = "coies",
    ):
        super().__init__(dim, salt)
        # trained vectors live in _base, NOT the evictable memo — a
        # clear-on-cap of the OOV memo must never drop trained entries
        self._base: dict[str, np.ndarray] = {}
        for tok, vec in mapping.items():
            arr = np.asarray(vec, dtype=np.float32)
            if arr.shape != (dim,):
                raise ValueError(f"vector for {tok!r} has shape {arr.shape}")
            self._base[tok] = arr

    def __getitem__(self, token: str) -> np.ndarray:
        vec = self._base.get(token)
        if vec is not None:
            return vec
        if PHRASE_DELIM in token:
            # OOV phrase token → mean of its constituent tokens — the
            # reference's PhraseVec fallback (context_based_models.py:
            # 196-207: KeyError → re-phrase → mean of member vectors).
            # Memoized in the evictable OOV cache like hash fallbacks.
            memo = self._cache.get(token)
            if memo is not None:
                return memo
            parts = [p for p in token.split(PHRASE_DELIM) if p]
            if parts:
                vec = np.mean([self[p] for p in parts], axis=0).astype(
                    np.float32
                )
                if len(self._cache) >= self.CACHE_CAP:
                    self._cache.clear()
                self._cache[token] = vec
                return vec
        return super().__getitem__(token)


class PhraseTable:
    """Bigram collocation merger (trained from corpus sentence tokens)."""

    def __init__(self, merges: Mapping[tuple[str, str], str]):
        self.merges = dict(merges)

    @classmethod
    def train(
        cls,
        sentences: Iterable[Sequence[str]],
        min_count: int = 5,
        threshold: float = 10.0,
    ) -> "PhraseTable":
        uni: dict[str, int] = {}
        bi: dict[tuple[str, str], int] = {}
        for sent in sentences:
            for tok in sent:
                uni[tok] = uni.get(tok, 0) + 1
            for a, b in zip(sent, sent[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        # gensim's original_scorer uses len(Phrases.vocab), which holds
        # unigrams AND bigram keys — unigrams alone would roughly halve
        # every score and under-merge near the threshold
        vocab_size = len(uni) + len(bi)
        merges: dict[tuple[str, str], str] = {}
        for (a, b), n_ab in bi.items():
            if n_ab < min_count:
                continue
            score = (n_ab - min_count) * vocab_size / (uni[a] * uni[b])
            if score > threshold:
                merges[(a, b)] = a + PHRASE_DELIM + b
        return cls(merges)

    def merge(self, tokens: Sequence[str]) -> list[str]:
        """Greedy left-to-right non-overlapping bigram merge."""
        out: list[str] = []
        i = 0
        n = len(tokens)
        while i < n:
            if i + 1 < n and (tokens[i], tokens[i + 1]) in self.merges:
                out.append(self.merges[(tokens[i], tokens[i + 1])])
                i += 2
            else:
                out.append(tokens[i])
                i += 1
        return out

    def to_rows(self) -> list[tuple[str, str, str]]:
        return [(a, b, m) for (a, b), m in sorted(self.merges.items())]

    @classmethod
    def from_rows(cls, rows: Iterable[tuple[str, str, str]]) -> "PhraseTable":
        return cls({(a, b): m for a, b, m in rows})


class StackedPhraseTable:
    """Multi-pass collocation merger — the reference's trigram family
    (AAERParserPhrases, aaer_corpus.py:105-134: ``trigrams =
    Phrases(bigrams[sentences])`` applied as ``trigrams[bigrams[s]]``;
    consumed by PhraseVecTrigrams, context_based_models.py:203-218).

    ``tables[0]`` is trained on the raw corpus, ``tables[i]`` on the
    corpus transformed by tables[0..i-1] — so a second pass can merge a
    merged bigram with a neighbour into a trigram, exactly gensim's
    stacked-Phrases construction.  Drop-in wherever ``PhraseTable`` is
    accepted (the whole surface is ``.merge(tokens)``).
    """

    def __init__(self, tables: Sequence[PhraseTable]):
        self.tables = list(tables)

    @classmethod
    def train(
        cls,
        sentences: Iterable[Sequence[str]],
        passes: int = 2,
        min_count: int = 5,
        threshold: float = 10.0,
    ) -> "StackedPhraseTable":
        sents = [list(s) for s in sentences]
        tables: list[PhraseTable] = []
        for _ in range(passes):
            t = PhraseTable.train(sents, min_count, threshold)
            tables.append(t)
            sents = [t.merge(s) for s in sents]
        return cls(tables)

    def merge(self, tokens: Sequence[str]) -> list[str]:
        out = list(tokens)
        for t in self.tables:
            out = t.merge(out)
        return out

    def to_rows(self) -> list[tuple[int, str, str, str]]:
        return [
            (i, a, b, m)
            for i, t in enumerate(self.tables)
            for (a, b), m in sorted(t.merges.items())
        ]

    @classmethod
    def from_rows(
        cls, rows: Iterable[tuple[int, str, str, str]]
    ) -> "StackedPhraseTable":
        by_pass: dict[int, dict[tuple[str, str], str]] = {}
        for i, a, b, m in rows:
            by_pass.setdefault(i, {})[(a, b)] = m
        return cls(
            [PhraseTable(by_pass[i]) for i in sorted(by_pass)]
        )


def doc_vector(
    emb: HashEmbedding, tokens: Sequence[str], mode: str = "sum"
) -> np.ndarray:
    """Compose a document/window vector from word vectors (sum|mean)."""
    if not tokens:
        return np.zeros(emb.dim, np.float32)
    mat = emb.matrix(list(tokens))
    return mat.mean(axis=0) if mode == "mean" else mat.sum(axis=0)


def gram_vector(
    emb: HashEmbedding, phrases: PhraseTable, gram: Sequence[str]
) -> np.ndarray:
    """Vector of a candidate gram under the phrase-token model.

    Single phrase-token lookup when the joined form is a known unit;
    otherwise re-phrase the tokens and take the MEAN of their vectors
    (context_based_models.py:196-207 fallback semantics).  With hash
    embeddings every token has a vector, so "known unit" is defined as
    len(gram) == 1 (already a phrase token); multi-token grams take the
    fallback path exactly like OOV joined forms do in the reference.
    """
    if len(gram) == 1:
        return emb[gram[0]]
    if len(gram) == 0:
        # zero vector, matching doc_vector's empty-input convention
        # (mean of an empty matrix would be NaN)
        return np.zeros(emb.dim, np.float32)
    merged = phrases.merge(list(gram))
    mat = emb.matrix(merged)
    return mat.mean(axis=0)


def gram_vectors_batch(
    emb: HashEmbedding, phrases: PhraseTable, grams: Sequence[Sequence[str]]
) -> np.ndarray:
    """(len(grams), dim) float32 — batched ``gram_vector`` with identical
    per-gram results (single-token lookup; multi-token mean of merged
    tokens, summed in float32 like ``np.mean`` over these short lists).
    One ``reduceat`` replaces per-gram stack+mean allocations."""
    out = np.empty((len(grams), emb.dim), np.float32)
    multi_idx: list[int] = []
    offsets: list[int] = []
    flat: list[str] = []
    for i, g in enumerate(grams):
        if len(g) == 1:
            out[i] = emb[g[0]]
        elif len(g) == 0:
            # empty gram → zero vector (the doc_vector empty-input
            # convention); routing it through the reduceat batch would
            # create a zero-length segment (NaN row or IndexError)
            out[i] = 0.0
        else:
            multi_idx.append(i)
            offsets.append(len(flat))
            flat.extend(phrases.merge(list(g)))
    if multi_idx:
        mat = emb.matrix(flat)
        off = np.array(offsets)
        sums = np.add.reduceat(mat, off, axis=0)
        counts = np.diff(np.append(off, len(flat))).astype(np.float32)
        out[multi_idx] = sums / counts[:, None]
    return out


def cosine(u: np.ndarray, v: np.ndarray) -> float:
    """Plain cosine; callers take abs() per utilities.py:28-32."""
    nu = float(np.dot(u, u)) ** 0.5
    nv = float(np.dot(v, v)) ** 0.5
    if nu == 0.0 or nv == 0.0:
        return 0.0
    return float(np.dot(u, v)) / (nu * nv)


def unit_rows(mat: np.ndarray) -> np.ndarray:
    """Row-normalized float64 copy (zero rows stay zero)."""
    m = mat.astype(np.float64)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return m / n


def abs_cosine_matrix(queries: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """|cosine| of every query row vs every key row → (nq, nk) float64."""
    return np.abs(unit_rows(queries) @ unit_rows(keys).T)
