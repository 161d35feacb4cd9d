"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (SURVEY.md §4 + ray_guide aggregation patterns):

- exact dedup: content-digest inside ``map_batches`` (vectorized), then
  ``groupby(digest)`` keeps the min doc_id — only (digest, doc_id) shuffle,
  never the text bodies.
- MinHash-LSH: shingle -> 64 minhashes -> 16 bands × 4 rows; explode to
  (band_id, band_hash, doc_id) rows; ``groupby([band_id, band_hash])`` emits
  candidate pairs per bucket; a verify stage recomputes exact shingle Jaccard
  (small side broadcast via ray.put at test scale; hash-join at 100 TB —
  documented partitioning assumption).
- SimHash: 64-bit sign-aggregated token hashes; near-dup candidates = equal
  16-bit band keys (4 bands, Hamming<=3-ish recall).
"""

from __future__ import annotations

import zlib
from typing import List, Set, Tuple

import numpy as np
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)
_N_HASHES = 64
_N_BANDS = 16
_ROWS_PER_BAND = _N_HASHES // _N_BANDS


def _hash_params(seed: int = 1234) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=_N_HASHES, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=_N_HASHES, dtype=np.uint64)
    return a, b


def word_shingles(text: str, k: int = 3) -> Set[int]:
    toks = text.split()
    if len(toks) < k:
        return {zlib.crc32(" ".join(toks).encode())} if toks else set()
    return {zlib.crc32(" ".join(toks[i : i + k]).encode()) for i in range(len(toks) - k + 1)}


def jaccard(a: Set[int], b: Set[int]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


class MinHasher:
    """Actor stage: doc -> 64 minhashes -> (band_id, band_hash) rows.

    Hash params are built once per actor; the per-batch kernel is numpy
    (shingle crc32s -> (a*s + b) % p -> column-min)."""

    def __init__(self, shingle_k: int = 3, seed: int = 1234):
        self.k = shingle_k
        self.a, self.b = _hash_params(seed)

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text, self.k)
        if not sh:
            return np.zeros(_N_HASHES, dtype=np.uint64)
        s = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        # (a*s + b) mod p, vectorized over shingles × hash functions
        vals = (np.outer(s, self.a) + self.b) % _MERSENNE
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: List[int] = []
        band_ids: List[int] = []
        band_hashes: List[int] = []
        ids = batch.column("doc_id").to_pylist()
        for doc_id, text in zip(ids, batch.column("text").to_pylist()):
            sig = self.signature(text)
            for band in range(_N_BANDS):
                chunk = sig[band * _ROWS_PER_BAND : (band + 1) * _ROWS_PER_BAND]
                h = zlib.crc32(chunk.tobytes())
                doc_ids.append(doc_id)
                band_ids.append(band)
                band_hashes.append(h)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(band_hashes, type=pa.int64()),
            }
        )


class PairVerifier:
    """Actor stage: exact shingle-Jaccard verification of candidate pairs.

    ``texts_ref`` is a ray.put broadcast of {doc_id: text} — read once per
    actor. At 100 TB the texts side becomes a hash-join on doc_id instead;
    the verification kernel is unchanged.
    """

    def __init__(self, texts_ref, shingle_k: int = 3, threshold: float = 0.8):
        import ray

        self.texts = ray.get(texts_ref) if not isinstance(texts_ref, dict) else texts_ref
        self.k = shingle_k
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_a = batch.column("doc_a").to_pylist()
        doc_b = batch.column("doc_b").to_pylist()
        keep_a, keep_b, jac = [], [], []
        cache = {}
        for a, b in zip(doc_a, doc_b):
            for d in (a, b):
                if d not in cache:
                    cache[d] = word_shingles(self.texts.get(d, ""), self.k)
            j = jaccard(cache[a], cache[b])
            if j >= self.threshold:
                keep_a.append(a)
                keep_b.append(b)
                jac.append(j)
        return pa.table(
            {
                "doc_a": pa.array(keep_a, type=pa.int64()),
                "doc_b": pa.array(keep_b, type=pa.int64()),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
        )


class SimHasher:
    """Actor stage: 64-bit SimHash per doc + 4×16-bit band keys for bucketing.

    Token hash = first 8 bytes of md5, little-endian — exactly DuckDB's
    ``md5_number_upper``, which makes the whole signature SQL-expressible
    (the driver oracle recomputes the per-bit votes bit-for-bit)."""

    def __init__(self):
        self.bits = np.arange(64, dtype=np.uint64)

    @staticmethod
    def token_hash(tok: str) -> int:
        import hashlib

        return int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")

    def __call__(self, batch: pa.Table) -> pa.Table:
        sims: List[int] = []
        for text in batch.column("text").to_pylist():
            toks = text.split()
            if not toks:
                sims.append(0)
                continue
            hashes = np.array([self.token_hash(t) for t in toks], dtype=np.uint64)
            bits = (hashes[:, None] >> self.bits) & np.uint64(1)
            # int64 BEFORE the subtraction: a uint64 vote count underflows
            # for minority bits (2*sum < n), silently setting every bit —
            # caught by the SQL vote oracle, not the determinism test
            votes = bits.sum(axis=0).astype(np.int64) * 2 - len(toks)
            sim = int(((votes > 0).astype(np.uint64) << self.bits).sum())
            sims.append(sim & 0x7FFFFFFFFFFFFFFF)
        out = batch.select(["doc_id"]).append_column(
            "simhash", pa.array(sims, type=pa.int64())
        )
        for band in range(4):
            key = [(s >> (band * 16)) & 0xFFFF for s in sims]
            out = out.append_column(f"band{band}", pa.array(key, type=pa.int32()))
        return out
