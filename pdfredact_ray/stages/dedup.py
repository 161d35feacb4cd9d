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

import os
import zlib
from typing import List, Set, Tuple

import numpy as np
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)
_N_HASHES = 64
_N_BANDS = 16
_ROWS_PER_BAND = _N_HASHES // _N_BANDS


def _make_crc32_table() -> np.ndarray:
    """The reflected-poly 0xEDB88320 byte table zlib.crc32 uses."""
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, np.uint32(0xEDB88320) ^ (t >> 1), t >> 1).astype(np.uint32)
    return t


_CRC32_TABLE = _make_crc32_table()


def crc32_rows(rows: np.ndarray) -> np.ndarray:
    """Vectorized zlib.crc32 over every row of a (n, w) uint8 matrix —
    w table-lookup steps over all n rows at once instead of n Python-level
    zlib calls (pytest-pinned equal to zlib.crc32 byte for byte)."""
    n, w = rows.shape
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    for j in range(w):
        crc = _CRC32_TABLE[(crc ^ rows[:, j]) & np.uint32(0xFF)] ^ (crc >> np.uint32(8))
    return crc ^ np.uint32(0xFFFFFFFF)


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
        """Batch-vectorized signatures: shingle hashes for ALL docs flatten
        into one array, the universal-hash matrix ``(s*a + b) % p`` is one
        numpy op over (total_shingles, 64), and per-doc column-mins come
        from one ``np.minimum.reduceat`` over the doc boundaries — identical
        output to the per-doc ``signature()`` path (pytest-pinned), ~no
        per-doc Python except the string shingling itself. Band hashes stay
        crc32 over the packed 4-uint64 chunk (the SQL-sidecar contract)."""
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        texts = batch.column("text").to_pylist()
        n = len(texts)
        counts = np.zeros(n, dtype=np.int64)
        chunks: List[np.ndarray] = []
        for i, text in enumerate(texts):
            sh = word_shingles(text, self.k)
            counts[i] = len(sh)
            if sh:
                chunks.append(np.fromiter(sh, dtype=np.uint64, count=len(sh)))
        sigs = np.zeros((n, _N_HASHES), dtype=np.uint64)
        if chunks:
            s = np.concatenate(chunks)
            nonempty = np.flatnonzero(counts > 0)
            ne_counts = counts[nonempty]
            ends = np.cumsum(ne_counts)
            starts = ends - ne_counts
            # Chunk the (shingles x 64) universal-hash matrix at a
            # cache-friendly size, aligned to doc boundaries: one flat
            # matrix over the whole batch is 100s of MB of temporaries and
            # runs MEMORY-bound — measured 14x slower (1.3k vs 17.7k
            # docs/s) than ~1k-shingle chunks whose temporaries stay in L2
            # (sweep: 512->16.4k, 1024->17.7k, 8192->10.6k docs/s).
            target = 1_024
            d0 = 0
            while d0 < len(nonempty):
                d1 = d0 + 1
                while d1 < len(nonempty) and ends[d1 - 1] - starts[d0] < target:
                    d1 += 1
                sl = s[starts[d0] : ends[d1 - 1]]
                vals = (sl[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
                local_starts = (starts[d0:d1] - starts[d0]).astype(np.int64)
                sigs[nonempty[d0:d1]] = np.minimum.reduceat(vals, local_starts, axis=0)
                d0 = d1
        # band hashes: one vectorized crc32 sweep over the (n*16, 32)-byte
        # packed-chunk matrix instead of n x 16 Python-level zlib calls
        # (identical values — crc32_rows is pinned against zlib.crc32; the
        # '<u8' view pins the byte order the old .tobytes() path used on LE)
        chunk_bytes = (
            np.ascontiguousarray(sigs.reshape(n * _N_BANDS, _ROWS_PER_BAND))
            .astype("<u8")
            .view(np.uint8)
            .reshape(n * _N_BANDS, 8 * _ROWS_PER_BAND)
        )
        band_hashes = crc32_rows(chunk_bytes).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, _N_BANDS), type=pa.int64()),
                "band_id": pa.array(
                    np.tile(np.arange(_N_BANDS, dtype=np.int32), n), type=pa.int32()
                ),
                "band_hash": pa.array(band_hashes, type=pa.int64()),
            }
        )


class PairVerifier:
    """Actor stage: exact shingle-Jaccard verification of candidate pairs.

    ``texts_ref`` is a ray.put broadcast of {doc_id: text} — read once per
    actor. At 100 TB the texts side becomes a hash-join on doc_id instead;
    the verification kernel is unchanged.
    """

    # Per-actor shingle-cache bound: dict insertion order gives cheap FIFO
    # eviction; candidates repeat within a bucket neighborhood so locality
    # is short-range and FIFO loses almost nothing.
    CACHE_MAX = 65_536

    def __init__(self, texts_ref, shingle_k: int = 3, threshold: float = 0.8):
        import ray

        self.texts = ray.get(texts_ref) if not isinstance(texts_ref, dict) else texts_ref
        self.k = shingle_k
        self.threshold = threshold
        self._cache: dict = {}

    def _shingles(self, d) -> Set[int]:
        sh = self._cache.get(d)
        if sh is None:
            sh = word_shingles(self.texts.get(d, ""), self.k)
            if len(self._cache) >= self.CACHE_MAX:
                self._cache.pop(next(iter(self._cache)))
            self._cache[d] = sh
        return sh

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_a = batch.column("doc_a").to_pylist()
        doc_b = batch.column("doc_b").to_pylist()
        keep_a, keep_b, jac = [], [], []
        for a, b in zip(doc_a, doc_b):
            j = jaccard(self._shingles(a), self._shingles(b))
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


def verify_pairs_with_texts(
    batch: pa.Table, shingle_k: int = 3, threshold: float = 0.8
) -> pa.Table:
    """Stateless verify kernel for the HASH-JOIN shape: each row already
    carries both texts (doc_a, doc_b, text_a, text_b) — the 100 TB path
    where candidate texts arrive via ``Dataset.join`` on doc_id instead of
    a driver-broadcast dict. Task-based ``map_batches`` (no actor pool: a
    one-shot verify stage shouldn't pay actor startup, and the per-batch
    cache below bounds recompute)."""
    keep_a, keep_b, jac = [], [], []
    cache: dict = {}

    def sh_of(d, text):
        s = cache.get(d)
        if s is None:
            s = word_shingles(text if text is not None else "", shingle_k)
            cache[d] = s
        return s

    for a, b, ta, tb in zip(
        batch.column("doc_a").to_pylist(),
        batch.column("doc_b").to_pylist(),
        batch.column("text_a").to_pylist(),
        batch.column("text_b").to_pylist(),
    ):
        j = jaccard(sh_of(a, ta), sh_of(b, tb))
        if j >= threshold:
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

    # Cross-batch unique-token md5 cache: token vocabularies are Zipfian,
    # so most of a batch's unique tokens were already hashed by an earlier
    # batch. FIFO eviction via dict insertion order (the PairVerifier
    # pattern).
    CACHE_MAX = 262_144

    def __init__(self):
        self.bits = np.arange(64, dtype=np.uint64)
        self._hcache: dict = {}

    @staticmethod
    def token_hash(tok: str) -> int:
        import hashlib

        return int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")

    def _hash_tokens(self, flat: List[str]) -> np.ndarray:
        """One dict-cache lookup per occurrence (a cached hit is ~5x cheaper
        than the md5 it replaces; np.unique over object strings measured
        SLOWER than just hashing — the sort dominates)."""
        cache = self._hcache
        th = self.token_hash
        cap = self.CACHE_MAX

        def get(tok: str) -> int:
            h = cache.get(tok)
            if h is None:
                h = th(tok)
                if len(cache) >= cap:
                    cache.pop(next(iter(cache)))
                cache[tok] = h
            return h

        return np.fromiter((get(t) for t in flat), dtype=np.uint64, count=len(flat))

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch-vectorized signatures, pytest-pinned equal to the per-doc
        reference path: md5 runs once per unique token (cross-batch FIFO
        cache), the (tokens × 64) bit matrix comes from one
        ``np.unpackbits`` over the little-endian hash bytes, and the
        per-bit ±1 vote sums are ``np.add.reduceat`` over ~1k-row
        doc-aligned chunks (the MinHasher L2 lesson: 1024-row chunks
        measured 25x faster than one flat matrix)."""
        texts = batch.column("text").to_pylist()
        n = len(texts)
        tok_lists = [t.split() for t in texts]
        counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
        sims = np.zeros(n, dtype=np.uint64)
        total = int(counts.sum())
        if total:
            flat = [t for toks in tok_lists for t in toks]
            hashes = self._hash_tokens(flat)
            bits = np.unpackbits(
                hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )
            nonempty = np.flatnonzero(counts > 0)
            ends = np.cumsum(counts[nonempty])
            starts = ends - counts[nonempty]
            target = 1_024
            votes = np.empty((len(nonempty), 64), dtype=np.int64)
            d0 = 0
            while d0 < len(nonempty):
                d1 = d0 + 1
                while d1 < len(nonempty) and ends[d1 - 1] - starts[d0] < target:
                    d1 += 1
                sl = bits[starts[d0] : ends[d1 - 1]].astype(np.int32)
                local_starts = (starts[d0:d1] - starts[d0]).astype(np.int64)
                # int64 BEFORE the subtraction: a uint64 vote count
                # underflows for minority bits (2*sum < n), silently
                # setting every bit — caught by the SQL vote oracle
                ones = np.add.reduceat(sl, local_starts, axis=0).astype(np.int64)
                votes[d0:d1] = ones * 2 - counts[nonempty[d0:d1]][:, None]
                d0 = d1
            pow2 = np.uint64(1) << self.bits
            sims[nonempty] = ((votes > 0).astype(np.uint64) * pow2[None, :]).sum(axis=1)
        sims &= np.uint64(0x7FFFFFFFFFFFFFFF)
        out = batch.select(["doc_id"]).append_column(
            "simhash", pa.array(sims.astype(np.int64), type=pa.int64())
        )
        for band in range(4):
            key = (sims >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            out = out.append_column(
                f"band{band}", pa.array(key.astype(np.int32), type=pa.int32())
            )
        return out

    def signature_ref(self, text: str) -> Tuple[int, List[int]]:
        """Scalar per-doc reference path (the ORIGINAL implementation),
        kept for the batch-equivalence pin test."""
        toks = text.split()
        if not toks:
            return 0, [0, 0, 0, 0]
        hashes = np.array([self.token_hash(t) for t in toks], dtype=np.uint64)
        bits = (hashes[:, None] >> self.bits) & np.uint64(1)
        votes = bits.sum(axis=0).astype(np.int64) * 2 - len(toks)
        sim = int(((votes > 0).astype(np.uint64) << self.bits).sum())
        sim &= 0x7FFFFFFFFFFFFFFF
        return sim, [(sim >> (b * 16)) & 0xFFFF for b in range(4)]


# ---------------------------------------------------------------------------
# Connected components over a near-dup pair list (the clustering step that
# turns pairwise near-dups into dedup groups).
#
# Two paths, size-gated like embed_cosine_near_dup:
# - driver union-find (path-halving): the pair table is O(near-dups) — tiny
#   relative to the corpus — so below the gate one numpy/Python pass is both
#   exact and faster than any shuffle.
# - distributed alternating large-star / small-star (Kiveris et al. 2014,
#   "Connected Components in MapReduce and Beyond"): each round is TWO
#   bucketed groupbys over the edge list (bucket = src % CC_N_BUCKETS, so
#   the star logic runs as one segmented numpy pass per bucket — O(buckets)
#   Python calls, never O(nodes) — and in-bucket pair dedup replaces the
#   dedup exchange); converges in O(log^2 n) rounds to per-component stars
#   centered at the min node. This is the 100 TB path when the pair list
#   itself outgrows one machine (e.g. crawl-scale exact-dup clusters); its
#   only shuffle key is the src hash bucket.
# ---------------------------------------------------------------------------


def union_find_components(doc_a: np.ndarray, doc_b: np.ndarray) -> pa.Table:
    """(node, component) for every node in the edge list; component = min
    member id. Path-halving union-find on a compacted id space."""
    nodes = np.unique(np.concatenate([doc_a, doc_b]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in zip(doc_a, doc_b):
        ra, rb = find(idx[int(a)]), find(idx[int(b)])
        if ra != rb:
            # union by smaller ORIGINAL id so the root is the min member
            if nodes[ra] < nodes[rb]:
                parent[rb] = ra
            else:
                parent[ra] = rb
    comp = np.array([nodes[find(i)] for i in range(len(nodes))], dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(nodes.astype(np.int64), pa.int64()),
            "component": pa.array(comp, pa.int64()),
        }
    )


CC_N_BUCKETS = int(os.environ.get("GRAFT_CC_BUCKETS", 256))


def _star_segments(g: pa.Table):
    """Shared prep for the bucketed star kernels: lexsort the bucket's
    (src, dst) rows, drop duplicate pairs (a bucket holds EVERY row of its
    srcs, so per-bucket dedup of (src, dst) is globally complete), and
    return the per-src segment geometry. The whole bucket is one vectorized
    pass — O(buckets) Python calls per round, never O(nodes)."""
    s = g.column("src").to_numpy().astype(np.int64, copy=False)
    d = g.column("dst").to_numpy().astype(np.int64, copy=False)
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
    s, d = s[keep], d[keep]
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    seg_len = np.diff(np.r_[starts, len(s)])
    return s, d, starts, seg_len


def _large_star_bucket(g: pa.Table) -> pa.Table:
    """Large-star over one hash bucket of the doubled adjacency: for every
    src u emit (v, min(min_nbr, u)) for each neighbor v > u."""
    if g.num_columns == 0 or g.num_rows == 0:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    s, d, starts, seg_len = _star_segments(g)
    m_full = np.repeat(np.minimum(d[starts], s[starts]), seg_len)
    mask = d > s
    return pa.table(
        {"src": pa.array(d[mask], pa.int64()), "dst": pa.array(m_full[mask], pa.int64())}
    )


def _small_star_bucket(g: pa.Table) -> pa.Table:
    """Small-star over one hash bucket of hi->lo oriented edges: for every
    src u with neighbors N (all < u) and m = min(N), emit (v, m) for
    v in N \\ {m} plus (u, m). src != dst by construction (u > m and the
    deduped min occurs exactly once per segment), so no post-filter and —
    because the next large-star kernel dedups in-bucket — no dedup
    exchange after this phase either."""
    if g.num_columns == 0 or g.num_rows == 0:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    s, d, starts, seg_len = _star_segments(g)
    m = d[starts]
    m_full = np.repeat(m, seg_len)
    mask = d != m_full
    return pa.table(
        {
            "src": pa.array(np.concatenate([d[mask], s[starts]]), pa.int64()),
            "dst": pa.array(np.concatenate([m_full[mask], m]), pa.int64()),
        }
    )


def _edge_sig_partial(t: pa.Table) -> pa.Table:
    """Per-batch (count, xor-checksum) partial for the convergence check —
    one 2-int row per block, so the driver's per-round reduce sees O(blocks)
    rows instead of the full O(edges) list."""
    if t.num_columns == 0 or t.num_rows == 0:
        return pa.table(
            {"n": pa.array([0], pa.int64()), "x": pa.array([0], pa.int64())}
        )
    s = t.column("src").to_numpy().astype(np.int64)
    d = t.column("dst").to_numpy().astype(np.int64)
    x = int(np.bitwise_xor.reduce((s * 1000003 + d) % (1 << 61), initial=0))
    return pa.table(
        {"n": pa.array([t.num_rows], pa.int64()), "x": pa.array([x], pa.int64())}
    )


def _edge_signature(ds) -> Tuple[int, int]:
    """Distributed edge-multiset signature: xor is associative/commutative,
    so per-block partials combine exactly in any order."""
    import ray

    n_tot, x_tot = 0, 0
    for blk in ray.get(
        ds.map_batches(_edge_sig_partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if blk.num_columns == 0 or blk.num_rows == 0:
            continue
        n_tot += int(np.sum(blk.column("n").to_numpy()))
        x_tot ^= int(np.bitwise_xor.reduce(blk.column("x").to_numpy(), initial=0))
    return n_tot, x_tot


def _star_labels_batch(t: pa.Table) -> pa.Table:
    """Fixpoint star edges (v, root) -> label rows for v AND the root
    itself, tagged with the doc_id hash bucket; the downstream bucketed
    min-kernel dedups the root copies."""
    if t.num_columns == 0:
        return t
    s = t.column("src").to_numpy().astype(np.int64, copy=False)
    d = t.column("dst").to_numpy().astype(np.int64, copy=False)
    ids = np.concatenate([s, d])
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "component": pa.array(np.concatenate([d, d]), pa.int64()),
            "bucket": pa.array(ids % CC_N_BUCKETS, pa.int64()),
        }
    )


def _label_min_bucket(g: pa.Table) -> pa.Table:
    """Per-bucket segmented min(component) by doc_id — the bucketed
    replacement for groupby(doc_id).min on O(nodes) keys."""
    if g.num_columns == 0 or g.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
        )
    ids = g.column("doc_id").to_numpy().astype(np.int64, copy=False)
    comp = g.column("component").to_numpy().astype(np.int64, copy=False)
    order = np.lexsort((comp, ids))
    ids, comp = ids[order], comp[order]
    starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
    return pa.table(
        {
            "doc_id": pa.array(ids[starts], pa.int64()),
            "component": pa.array(comp[starts], pa.int64()),
        }
    )


def connected_components_distributed(edges, max_iters: int = 32):
    """Large-star/small-star over a Ray Dataset built from the (doc_a,
    doc_b) pair table; returns a DATASET with the same (doc_id, component)
    rows as ``union_find_components`` — labels never land on the driver
    (callers behind the ``CC_DRIVER_MAX_EDGES`` gate use the union-find
    table instead). Convergence = the edge multiset (count, xor-checksum)
    signature is stable across a full large+small round (both phases are
    monotone toward the star fixpoint, so a stable multiset is a fixpoint;
    and because each kernel dedups its INPUT pairs in-bucket, a round's
    output multiset is a pure function of the input edge SET — so the
    multiset stabilizes at most one round after the set does, despite the
    round carrying no dedup exchange); the signature is a distributed
    per-block partial aggregate — O(blocks) driver rows per round, never
    the O(edges) list.

    ``edges`` is a pa.Table OR an already-distributed Dataset with
    (doc_a, doc_b) columns — the latter keeps the crawl-scale pair list
    off the driver end to end (pairs come straight from the bucketed
    map_groups emission in ``minhash_near_dup_pairs``)."""
    import ray.data as rd

    empty = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
        )
    )
    if isinstance(edges, pa.Table):
        if edges.num_rows == 0:
            return empty
        ds = rd.from_arrow(
            pa.table(
                {
                    "src": edges.column("doc_a").cast(pa.int64()),
                    "dst": edges.column("doc_b").cast(pa.int64()),
                }
            )
        )
    else:
        ds = edges.map_batches(
            lambda t: pa.table(
                {
                    "src": t.column("doc_a").cast(pa.int64()),
                    "dst": t.column("doc_b").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        if ds.count() == 0:
            return empty
    nb = CC_N_BUCKETS
    prev_sig = None
    for _ in range(max_iters):
        # large-star over UNDIRECTED adjacency: emit both directions, tag
        # each row with its src hash bucket (map-only; Ray fuses the two)
        both = ds.map_batches(
            lambda t: (
                lambda s, d: pa.table(
                    {
                        "src": pa.array(np.concatenate([s, d]), pa.int64()),
                        "dst": pa.array(np.concatenate([d, s]), pa.int64()),
                        "bucket": pa.array(
                            np.concatenate([s, d]) % nb, pa.int64()
                        ),
                    }
                )
            )(
                t.column("src").to_numpy().astype(np.int64, copy=False),
                t.column("dst").to_numpy().astype(np.int64, copy=False),
            ),
            batch_format="pyarrow",
        )
        # ONE exchange per star phase: groupby(bucket) co-locates every row
        # of a src (bucket = src % nb) into O(nb) groups; the kernel runs
        # the per-src logic as one segmented numpy pass. No dedup exchange
        # anywhere in the round — each kernel drops duplicate (src, dst)
        # pairs in-bucket, which is a complete global dedup of its INPUT,
        # and cross-group duplicate emissions are absorbed by the next
        # kernel the same way. (The old shape — per-src map_groups + a
        # groupby(src, dst) dedup — paid 3 all-to-alls and O(nodes) Python
        # calls per round; this pays 2 and O(nb).)
        ds = both.groupby("bucket").map_groups(_large_star_bucket, batch_format="pyarrow")
        # small-star over hi -> lo orientation, bucketed the same way
        hi_lo = ds.map_batches(
            lambda t: (
                lambda s, d: (
                    lambda hi, lo: pa.table(
                        {
                            "src": pa.array(hi, pa.int64()),
                            "dst": pa.array(lo, pa.int64()),
                            "bucket": pa.array(hi % nb, pa.int64()),
                        }
                    )
                )(np.maximum(s, d), np.minimum(s, d))
            )(
                t.column("src").to_numpy().astype(np.int64, copy=False),
                t.column("dst").to_numpy().astype(np.int64, copy=False),
            ),
            batch_format="pyarrow",
        ).filter(expr="src != dst")
        ds = hi_lo.groupby("bucket").map_groups(
            _small_star_bucket, batch_format="pyarrow"
        ).materialize()
        sig = _edge_signature(ds)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected components did not converge in {max_iters} rounds")
    # fixpoint edges are stars (v, root): labels = edges + the roots
    # themselves, deduped with one BUCKETED min exchange (a plain
    # groupby(doc_id).min pays the per-partition sort-aggregate tax on
    # O(nodes) keys — measured 36s of a 119s run at 2M docs) — the label
    # table stays a Dataset end to end
    labels = (
        ds.map_batches(_star_labels_batch, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_label_min_bucket, batch_format="pyarrow")
    )
    return labels
