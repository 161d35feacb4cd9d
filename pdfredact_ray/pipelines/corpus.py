"""Training-data / corpus pipelines over the driver testdata tables
(documents, embeddings, events, lineitem) plus the synthetic transcript
corpus — the "beyond the reference" operations a 100 TB training-data
pipeline needs (dedup, similarity search, text analysis, windowed
aggregates), each expressed Ray-Data-first.

Scale notes (100 TB posture) are attached per function. Everything here
returns a LAZY Dataset unless the result is provably tiny (top-k merges,
per-rule counts), in which case a small materialized table is fine.

Nothing here calls ray.init().
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from pdfredact_ray.pipelines.redact import default_concurrency
from pdfredact_ray.stages.dedup import MinHasher, PairVerifier, SimHasher, jaccard, word_shingles
from pdfredact_ray.stages.embed import (
    BruteForceTopK,
    CellAssigner,
    CosinePairFinder,
    IVFTopK,
    build_ivf_centroids,
    cell_cosine_pairs,
    final_topk,
    normalize,
)
from pdfredact_ray.stages.multimodal import FrameSampler, ImageDecoder, ImageResizer
from pdfredact_ray.stages.taskstage import stage_call
from pdfredact_ray.stages.textops import (
    LangId,
    bpe_token_counts,
    chunk_documents,
    fingerprints,
    quality_scores,
    repetition_signals,
    rolling_fingerprints,
    token_counts,
)


def _docs(sf_dir: str, columns: Optional[Sequence[str]] = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=list(columns) if columns else None)


# --------------------------------------------------------------------- dedup

def dedup_exact(sf_dir: str, n_buckets: int = 64) -> rd.Dataset:
    """Exact dedup: md5 digest inside map_batches (only (digest, doc_id)
    rows ever shuffle — never the text bodies), then keep the min doc_id
    per digest via a digest-bucket groupby (hash prefix mod n_buckets) with
    a vectorized per-bucket min — a fixed group count instead of a
    sort-aggregate keyed on O(corpus) digest strings. At 100 TB the digest
    shuffle is ~64B/row either way; the bucket shape only changes the
    reduce-side key count."""
    import hashlib

    def digest(batch: pa.Table) -> pa.Table:
        d = [hashlib.md5(t.encode()).hexdigest() for t in batch.column("text").to_pylist()]
        b = [int(h[:8], 16) % n_buckets for h in d]
        return pa.table(
            {
                "digest": pa.array(d, pa.string()),
                "doc_id": batch.column("doc_id"),
                "bucket": pa.array(b, pa.int64()),
            }
        )

    def min_per_digest(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return g
        dg = np.asarray(g.column("digest").to_pylist(), dtype=object)
        did = g.column("doc_id").to_numpy()
        order = np.lexsort((did, dg))
        ds_, ids_ = dg[order], did[order]
        first = np.r_[True, ds_[1:] != ds_[:-1]]
        return pa.table(
            {
                "digest": pa.array(ds_[first], pa.string()),
                "doc_id": pa.array(ids_[first], pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(digest, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(min_per_digest, batch_format="pyarrow")
    )


def _fused_bucket_key(t: pa.Table) -> pa.Array:
    """band_id * 2^33 + band_hash as one int64 column (collision-free:
    band_hash is a crc32 < 2^32, band_id < 16)."""
    key = pc.add(
        pc.multiply(pc.cast(t.column("band_id"), pa.int64()), np.int64(1) << 33),
        pc.cast(t.column("band_hash"), pa.int64()),
    )
    return key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key


def _doc_id_key(t: pa.Table) -> pa.Array:
    k = pc.cast(t.column("doc_id"), pa.int64())
    return k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k


def _semi_join(t: pa.Table, values_ref, key_fn, invert: bool = False) -> pa.Table:
    """Task-based vectorized semi/anti-join: keep (or drop) rows whose
    derived key is in a broadcast value set. Used via plain-function
    ``map_batches(_semi_join, fn_args=(ref, key_fn))`` — a TASK pool, not a
    fixed actor pool: one-shot filter stages paid seconds of actor startup
    for a single ``pc.is_in`` pass (the round-2 minhash/dedup_filter bench
    regression). ``ray.get`` of a ``ray.put`` ref inside a task is one
    local object-store read (zero-copy for Arrow arrays)."""
    values = values_ref if isinstance(values_ref, pa.Array) else ray.get(values_ref)
    m = pc.is_in(key_fn(t), value_set=values)
    return t.filter(pc.invert(m) if invert else m)


def _drop_empty_blocks(ds: rd.Dataset) -> Optional[rd.Dataset]:
    """Rebuild a MATERIALIZED dataset without Ray's zero-column empty
    blocks (sort/groupby exchanges emit them; they BYPASS map_batches
    UDFs entirely and Acero joins reject them as missing the key column).
    Metadata-only: block refs are re-listed via the bundle metadata, no
    block data touches the driver. None when every block is empty."""
    refs = [
        ref
        for bundle in ds.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows is None or meta.num_rows > 0
    ]
    return rd.from_arrow_refs(refs) if refs else None


def _collect(ds: rd.Dataset) -> Optional[pa.Table]:
    """Materialize a (small) dataset driver-side, tolerating the empty
    zero-column blocks Ray aggregates sometimes emit; None when nothing
    schema-bearing survives (e.g. a degenerate empty input)."""
    tbls = [t for t in ray.get(ds.materialize().to_arrow_refs()) if len(t.schema)]
    return pa.concat_tables(tbls) if tbls else None


def exact_dup_ids(sf_dir: str, n_buckets: int = 64) -> pa.Array:
    """Non-canonical exact-duplicate doc_ids (the DROP set for exact dedup):
    O(dups), never O(corpus) — the broadcastable side by construction.

    ONE text pass (digest + bucket) and ONE skinny shuffle: digests land in
    hash-prefix buckets (fixed group count, same bucketed-combine shape as
    ``dedup_exact`` — the former ``groupby(digest).count()`` sort-aggregate
    keyed on O(corpus) digest strings measured 15.7s at 2M docs vs ~3s for
    the bucket shape), and each bucket emits the non-min members of every
    >1 digest group directly — so the hot-digest collect, the second
    semi-join text pass and the driver-side group dict all disappear. The
    driver pulls only the O(dups) id column."""
    import hashlib

    def digest(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        d = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        b = [int(h[:8], 16) % n_buckets for h in d]
        return pa.table(
            {
                "digest": pa.array(d, pa.string()),
                "doc_id": batch.column("doc_id"),
                "bucket": pa.array(b, pa.int64()),
            }
        )

    def dup_members(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return g
        dg = np.asarray(g.column("digest").to_pandas(), dtype=object)
        ids = g.column("doc_id").to_numpy()
        order = np.lexsort((ids, dg))
        dg_s, ids_s = dg[order], ids[order]
        is_first = np.ones(len(dg_s), dtype=bool)
        is_first[1:] = dg_s[1:] != dg_s[:-1]
        return pa.table({"doc_id": pa.array(ids_s[~is_first], pa.int64())})

    out = _collect(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(digest, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dup_members, batch_format="pyarrow")
    )
    if out is None or out.num_rows == 0:
        return pa.array([], type=pa.int64())
    return pa.array(sorted(out.column("doc_id").to_pylist()), type=pa.int64())


def dedup_filter(sf_dir: str) -> rd.Dataset:
    """Exact-dedup FILTER: the documents table minus non-canonical
    duplicates. Scale shape: the digest groupby emits only (digest, keeper)
    rows; the DUPLICATE doc_id set (``exact_dup_ids``, O(dups) not
    O(corpus)) is broadcast and removed with a vectorized anti-join — never
    broadcast the keeper set, which is corpus-sized at 100 TB."""
    dup_ids = exact_dup_ids(sf_dir)
    docs = _docs(sf_dir, ["doc_id", "text"])
    if len(dup_ids) == 0:
        return docs
    return docs.map_batches(
        _semi_join,
        fn_args=(ray.put(dup_ids), _doc_id_key),
        fn_kwargs={"invert": True},
        batch_format="pyarrow",
    )


def doc_split(sf_dir: str, train_pct: int = 90) -> rd.Dataset:
    """Deterministic train/val split by content-independent id hash
    (md5(doc_id || ':split')[:8] little-endian % 100) — stable under
    resharding/reordering, exactly reproducible in SQL via
    md5_number_upper. The assignment is embarrassingly per-row."""
    import hashlib

    def assign(batch: pa.Table) -> pa.Table:
        buckets = [
            int.from_bytes(hashlib.md5(f"{d}:split".encode()).digest()[:8], "little") % 100
            for d in batch.column("doc_id").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "bucket": pa.array(buckets, pa.int32()),
                "split": pa.array(
                    ["train" if b < train_pct else "val" for b in buckets], pa.string()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id"]).map_batches(assign, batch_format="pyarrow")


def top_tokens(sf_dir: str, k: int = 50) -> pa.Table:
    """Corpus vocabulary top-k: per-batch partial token counts (the
    map-side combiner — only distinct (token, count) partials shuffle, never
    token instances), groupby-sum, driver-side top-k of the tiny result.
    Deterministic tie-break (count desc, token asc)."""
    from collections import Counter

    def partial_counts(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(t.split())
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    # the vocabulary histogram lands on the driver for top-k REGARDLESS, so
    # the partials combine during collection (vectorized unique/add.at)
    # instead of a Ray sort-aggregate whose fixed micro-block cost dwarfs
    # the vocabulary-sized table; driver memory bound is O(vocab) either way
    parts = pa.concat_tables(
        [
            t
            for t in ray.get(
                _docs(sf_dir, ["doc_id", "text"])
                .map_batches(partial_counts, batch_format="pyarrow")
                .materialize().to_arrow_refs()
            )
            if len(t.schema)
        ]
    )
    toks = np.asarray(parts.column("token").to_pylist(), dtype=object)
    uniq, inv = np.unique(toks, return_inverse=True)
    tot = np.zeros(len(uniq), np.int64)
    np.add.at(tot, inv, parts.column("n").to_numpy())
    order = sorted(zip(tot.tolist(), uniq.tolist()), key=lambda x: (-x[0], x[1]))[:k]
    return pa.table(
        {
            "token": pa.array([t for _, t in order], pa.string()),
            "n": pa.array([n for n, _ in order], pa.int64()),
        }
    )


# Banded-signature rows (3 small ints each) up to this count are bucketed
# driver-side in one numpy pass; larger corpora use the groupby shuffle.
# 50M rows ~ 1.2 GB on the driver — comfortable; at 10^10 docs the banded
# table is ~1.6e11 rows and takes the distributed path.
DRIVER_BUCKET_MAX_ROWS = int(
    os.environ.get("GRAFT_DRIVER_BUCKET_MAX_ROWS", 50_000_000)
)

# Above this many candidate pairs the exact-Jaccard verify runs as an
# actor-pool map_batches instead of one driver call (the measured 2M-doc
# pipeline floor); below it actor startup dominates.
PAIR_VERIFY_MIN_PARALLEL = 20_000
PAIR_VERIFY_BATCH = 8_192

# Per-bucket member cap: a bucket with more identical-band docs than this is
# the exact-duplicate pathology (run dedup_exact first); members beyond the
# cap are dropped from pair generation and the truncation is SURFACED via
# the returned table's schema metadata + a log line (no silent caps).
BUCKET_MEMBER_CAP = 64

_log = __import__("logging").getLogger("pdfredact_ray.corpus")


def _buckets_to_pairs(key_s: np.ndarray, did_s: np.ndarray, cap: int = BUCKET_MEMBER_CAP):
    """Candidate pairs from a bucket-key-sorted (key, doc_id) run list.
    Returns (pairs, n_capped_buckets, n_dropped_members) where ``pairs``
    is a deduped (M, 2) int64 array sorted lexicographically, doc_a <
    doc_b per row.

    By LSH construction almost every multi-member bucket has exactly TWO
    members, so that case is fully vectorized (the former Python loop over
    buckets was the measured driver floor: 54s at 32M banded rows for a
    pathological dup density, now sub-second); buckets of 3+ members go
    through a small loop whose inner pair expansion is ``triu_indices``."""
    bounds = np.flatnonzero(np.concatenate(([True], key_s[1:] != key_s[:-1])))
    bounds = np.append(bounds, len(key_s))
    lens = np.diff(bounds)
    capped_buckets = 0
    dropped_members = 0

    los: List[np.ndarray] = []
    his: List[np.ndarray] = []
    # the dominant case: exactly two members per hot bucket
    two_starts = bounds[:-1][lens == 2]
    if len(two_starts):
        a2 = did_s[two_starts]
        b2 = did_s[two_starts + 1]
        lo = np.minimum(a2, b2)
        hi = np.maximum(a2, b2)
        m = lo != hi
        los.append(lo[m])
        his.append(hi[m])
    # 3..cap-member buckets, vectorized PER LENGTH CLASS (<= 62 classes):
    # all buckets of length L become one (n_L, L) row-sorted matrix whose
    # pairs come from a single triu gather — no per-bucket numpy calls
    # (a per-bucket loop measured 2x slower than even the per-bucket
    # PYTHON list ops at 2.9M small buckets)
    for L in np.unique(lens[(lens >= 3) & (lens <= cap)]):
        starts_L = bounds[:-1][lens == L]
        mat = np.sort(did_s[starts_L[:, None] + np.arange(int(L))], axis=1)
        ii, jj = np.triu_indices(int(L), k=1)
        lo = mat[:, ii].ravel()
        hi = mat[:, jj].ravel()
        m = lo != hi
        los.append(lo[m])
        his.append(hi[m])
    # past the cap: the exact-dup pathology — rare by definition, loop
    for bi in np.flatnonzero(lens > cap):
        ids = np.unique(did_s[bounds[bi] : bounds[bi + 1]])
        if len(ids) > cap:
            capped_buckets += 1
            dropped_members += len(ids) - cap
            ids = ids[:cap]
        if len(ids) < 2:
            continue
        ii, jj = np.triu_indices(len(ids), k=1)
        los.append(ids[ii])
        his.append(ids[jj])

    if not los:
        return np.empty((0, 2), dtype=np.int64), capped_buckets, dropped_members
    lo_all = np.concatenate(los).astype(np.int64)
    hi_all = np.concatenate(his).astype(np.int64)
    order = np.lexsort((hi_all, lo_all))
    lo_s, hi_s = lo_all[order], hi_all[order]
    keep = np.r_[True, (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])]
    return (
        np.stack([lo_s[keep], hi_s[keep]], axis=1),
        capped_buckets,
        dropped_members,
    )


def _emit_bucket_pairs(g: pa.Table) -> pa.Table:
    """Per-salt-group candidate-pair emission (the distributed leg of
    ``minhash_near_dup_pairs``): every (bucket_key, doc_id) row of the
    band-buckets hashing to this salt arrives together — a bucket never
    spans salt groups because salt = bucket_key % n_salts — so one sorted
    numpy sweep reuses ``_buckets_to_pairs`` verbatim (same 64-member
    sorted-doc_id cap as the driver path and the SQL oracle). Capped-bucket
    truncation is surfaced as ONE marker row (doc_a = -capped_buckets,
    doc_b = -dropped_members), filtered and summed by the caller — the
    no-silent-caps contract survives distribution."""
    if g.num_columns == 0:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    key = g.column("bucket_key").to_numpy().astype(np.int64)
    did = g.column("doc_id").to_numpy().astype(np.int64)
    if len(did) and did.min() < 0:
        # the marker convention reserves negative ids — a corpus with real
        # negative doc_ids would have pairs silently reclassified as markers
        raise ValueError(
            "minhash_near_dup_pairs requires doc_id >= 0 (negative doc_a/doc_b "
            "rows carry the capped-bucket truncation counts in-band)"
        )
    order = np.argsort(key, kind="stable")
    pairs, capped, dropped = _buckets_to_pairs(key[order], did[order])
    da = pairs[:, 0]
    db = pairs[:, 1]
    if capped:
        da = np.append(da, -capped)
        db = np.append(db, -dropped)
    return pa.table(
        {"doc_a": pa.array(da, pa.int64()), "doc_b": pa.array(db, pa.int64())}
    )


# Target (bucket_key, doc_id) rows per salt group in the distributed pair
# emission — bounds any one group's memory no matter the corpus size.
SALT_GROUP_TARGET_ROWS = 2_000_000


def _minhash_pairs_distributed(
    banded: rd.Dataset, docs: rd.Dataset, n_banded: int, threshold: float
):
    """Fully-distributed candidate generation + verification — nothing
    O(candidates) ever lands on the driver:

    1. salt = fused bucket key % n_salts (n_salts sized so a salt group
       holds ~SALT_GROUP_TARGET_ROWS banded rows); ``groupby(salt).
       map_groups`` emits each bucket's pairs with the same vectorized
       sweep as the driver path — the ONLY corpus-sized exchange, and it
       moves 3 small ints per (doc, band).
    2. cross-band pair dedup via ``groupby([doc_a, doc_b]).count()`` —
       O(candidate pairs), already tiny by LSH construction.
    3. verify via TWO hash joins against the docs table on doc_id (texts
       reach the verify kernel co-partitioned — no driver text dict, no
       broadcast; the joins move only candidate-matching doc texts), then a
       task-based exact-Jaccard ``map_batches``
       (``stages/dedup.verify_pairs_with_texts``).

    Returns (verified_pairs_dataset, capped_buckets, dropped_members)."""
    from pdfredact_ray.stages.dedup import verify_pairs_with_texts

    n_salts = max(64, n_banded // SALT_GROUP_TARGET_ROWS)

    def keyed(t: pa.Table, n=np.int64(n_salts)) -> pa.Table:
        key = _fused_bucket_key(t)
        knp = key.to_numpy()
        return pa.table(
            {
                "salt": pa.array(knp % n, pa.int64()),
                "bucket_key": key,
                "doc_id": t.column("doc_id"),
            }
        )

    pairs_all = (
        banded.map_batches(keyed, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(_emit_bucket_pairs, batch_format="pyarrow")
        .materialize()  # O(candidate pairs); also kills the filter double-run
    )
    markers = _collect(pairs_all.filter(expr="doc_a < 0"))
    capped_buckets = dropped_members = 0
    if markers is not None and markers.num_rows:
        capped_buckets = -int(pc.sum(markers.column("doc_a")).as_py())
        dropped_members = -int(pc.sum(markers.column("doc_b")).as_py())

    pairs_nonneg = pairs_all.filter(expr="doc_a >= 0").materialize()
    if pairs_nonneg.count() == 0:
        return None, capped_buckets, dropped_members
    distinct = (
        pairs_nonneg.groupby(["doc_a", "doc_b"])
        .count()
        .map_batches(
            lambda t: t if t.num_columns == 0 else t.drop_columns(["count()"]),
            batch_format="pyarrow",
        )
    )
    # Few partitions on the pre-reduced pair side (measured: 8 beat 24 at
    # 150k rows); the docs side streams through the same partition count.
    num_partitions = max(8, default_concurrency() // 3)
    docs_a = docs.map_batches(
        lambda t: pa.table({"doc_a": t.column("doc_id"), "text_a": t.column("text")}),
        batch_format="pyarrow",
    )
    docs_b = docs.map_batches(
        lambda t: pa.table({"doc_b": t.column("doc_id"), "text_b": t.column("text")}),
        batch_format="pyarrow",
    )
    j1 = distinct.join(
        docs_a, join_type="inner", num_partitions=num_partitions, on=("doc_a",)
    )
    j2 = j1.join(
        docs_b, join_type="inner", num_partitions=num_partitions, on=("doc_b",)
    )
    verified = j2.map_batches(
        verify_pairs_with_texts,
        fn_kwargs={"threshold": threshold},
        batch_format="pyarrow",
    )
    return verified, capped_buckets, dropped_members


def minhash_near_dup_pairs(sf_dir: str, threshold: float = 0.5) -> pa.Table:
    """MinHash+LSH near-dup: shingle → 64 minhashes → 16 bands → explode to
    (band, band_hash, doc_id) → bucket → candidate pairs → exact
    shingle-Jaccard verify. Returns the verified pair table
    (doc_a, doc_b, jaccard) deduped across bands.

    Size-adaptive: the banded table is 3 small ints per (doc, band) —
    orders of magnitude lighter than the text. Up to
    ``DRIVER_BUCKET_MAX_ROWS`` it is collected and bucketed driver-side
    with one numpy argsort (~0.02s vs seconds of tiny-block shuffle
    overhead at test scale), and the verify side broadcasts candidate
    texts (ray.put once). Past the gate the 100 TB shape takes over:
    ``_minhash_pairs_distributed`` — salted ``groupby.map_groups`` pair
    emission, distributed cross-band dedup, and hash-join verification, so
    neither the pair set nor any text dict ever materializes driver-side
    (only the final verified near-dup table does, and only because the
    API returns a table; ``near_dup_components`` can consume the Dataset).
    Both paths are pytest-pinned equal."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    # Size-adaptive banding stage: the fixed actor pool measured 35%
    # faster at 2M docs (59.6s vs 80s whole-pipeline — persistent actors
    # amortize better over thousands of CPU-heavy batches) but its ~2s
    # startup dominates small corpora (sf0.1: task path 1.7s vs 2.9s).
    import pyarrow.dataset as pads

    n_docs_est = pads.dataset(
        os.path.join(sf_dir, "documents.parquet"), format="parquet"
    ).count_rows()
    if n_docs_est > 200_000:
        banded_lazy = docs.map_batches(
            MinHasher, batch_format="pyarrow", concurrency=default_concurrency()
        )
    else:
        banded_lazy = docs.map_batches(
            stage_call, fn_args=(MinHasher, {}), batch_format="pyarrow"
        )
    banded = banded_lazy.materialize()  # (doc_id, band_id, band_hash) ints

    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )

    n_banded = banded.count()
    if n_banded > DRIVER_BUCKET_MAX_ROWS:
        verified, capped_buckets, dropped_members = _minhash_pairs_distributed(
            banded, docs, n_banded, threshold
        )
        if capped_buckets:
            _log.warning(
                "minhash_near_dup_pairs: %d bucket(s) over %d members; %d member(s) "
                "dropped from pair generation (exact-dup pathology — run dedup first)",
                capped_buckets, BUCKET_MEMBER_CAP, dropped_members,
            )
        meta = {
            b"minhash.capped_buckets": str(capped_buckets).encode(),
            b"minhash.dropped_members": str(dropped_members).encode(),
        }
        out = _collect(verified) if verified is not None else None
        if out is None or out.num_rows == 0:
            return empty.replace_schema_metadata(meta)
        return out.sort_by(
            [("doc_a", "ascending"), ("doc_b", "ascending")]
        ).replace_schema_metadata(meta)

    tbl = pa.concat_tables(ray.get(banded.to_arrow_refs()))
    band = tbl.column("band_id").to_numpy().astype(np.int64)
    bhash = tbl.column("band_hash").to_numpy().astype(np.int64)
    did = tbl.column("doc_id").to_numpy().astype(np.int64)
    key = band * (np.int64(1) << np.int64(33)) + bhash  # band_hash < 2^32
    order = np.argsort(key, kind="stable")
    cand_pairs, capped_buckets, dropped_members = _buckets_to_pairs(
        key[order], did[order]
    )

    if capped_buckets:
        _log.warning(
            "minhash_near_dup_pairs: %d bucket(s) over %d members; %d member(s) "
            "dropped from pair generation (exact-dup pathology — run dedup first)",
            capped_buckets, BUCKET_MEMBER_CAP, dropped_members,
        )
    meta = {
        b"minhash.capped_buckets": str(capped_buckets).encode(),
        b"minhash.dropped_members": str(dropped_members).encode(),
    }

    if len(cand_pairs) == 0:
        return empty.replace_schema_metadata(meta)
    cand_tbl = pa.table(
        {
            "doc_a": pa.array(cand_pairs[:, 0], pa.int64()),
            "doc_b": pa.array(cand_pairs[:, 1], pa.int64()),
        }
    )
    # pull only the candidate docs' texts (O(near-dups), not O(corpus)) —
    # a one-shot task-based is_in semi-join against the broadcast id set
    cand_ids = pa.array(np.unique(cand_pairs), type=pa.int64())
    cand_docs = _collect(
        docs.map_batches(
            _semi_join,
            fn_args=(ray.put(cand_ids), _doc_id_key),
            batch_format="pyarrow",
        )
    )
    texts = dict(
        zip(cand_docs.column("doc_id").to_pylist(), cand_docs.column("text").to_pylist())
    )
    # Parallel verify: the exact-Jaccard pass was the measured pipeline
    # floor at 2M docs — 180k candidate pairs verified on ONE driver core
    # while 31 sat idle (the 17.4k docs/s family floor of round 3). Past a
    # small pair count the candidate table splits into blocks verified by a
    # PairVerifier actor pool (texts ray.put once, per-actor shingle
    # cache); below it, actor startup costs more than the verify.
    if cand_tbl.num_rows >= PAIR_VERIFY_MIN_PARALLEL:
        texts_ref = ray.put(texts)
        slices = [
            cand_tbl.slice(i, PAIR_VERIFY_BATCH)
            for i in range(0, cand_tbl.num_rows, PAIR_VERIFY_BATCH)
        ]
        verified = rd.from_arrow(slices).map_batches(
            PairVerifier,
            fn_constructor_args=(texts_ref,),
            fn_constructor_kwargs={"threshold": threshold},
            batch_size=PAIR_VERIFY_BATCH,
            concurrency=min(default_concurrency(), len(slices)),
            batch_format="pyarrow",
        )
        out = _collect(verified)
        if out is None or out.num_rows == 0:
            return empty.replace_schema_metadata(meta)
        return out.sort_by(
            [("doc_a", "ascending"), ("doc_b", "ascending")]
        ).replace_schema_metadata(meta)
    verifier = PairVerifier(texts, threshold=threshold)
    return verifier(cand_tbl).replace_schema_metadata(meta)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5, k: int = 3) -> pa.Table:
    """Exact all-pairs n-gram Jaccard above threshold — the small-scale
    oracle for the MinHash path (quadratic; at 100 TB you never run this,
    you run minhash_near_dup_pairs). Driver-side on purpose: it IS the
    brute-force baseline."""
    tbl = pa.concat_tables(ray.get(_docs(sf_dir, ["doc_id", "text"]).materialize().to_arrow_refs()))
    ids = tbl.column("doc_id").to_pylist()
    shingles = [word_shingles(t, k) for t in tbl.column("text").to_pylist()]
    a_out, b_out, j_out = [], [], []
    order = np.argsort(ids)
    for ii in range(len(order)):
        for jj in range(ii + 1, len(order)):
            i, j = order[ii], order[jj]
            val = jaccard(shingles[i], shingles[j])
            if val >= threshold:
                a_out.append(ids[i])
                b_out.append(ids[j])
                j_out.append(val)
    return pa.table(
        {
            "doc_a": pa.array(a_out, pa.int64()),
            "doc_b": pa.array(b_out, pa.int64()),
            "jaccard": pa.array(j_out, pa.float64()),
        }
    )


def decontaminate(sf_dir: str, k: int = 3, min_overlap: int = 2) -> rd.Dataset:
    """Benchmark decontamination: flag training docs sharing >= min_overlap
    distinct k-gram shingles with the eval set (here the deterministic
    doc_id % 50 == 0 subset stands in for an external benchmark).

    Scale shape: the eval side is small BY NATURE (benchmarks are), so its
    shingle set broadcasts once (ray.put, read per actor); the training side
    streams through map_batches computing one set intersection per doc —
    no shuffle at all. Returns (doc_id, n_overlap, contaminated) for
    non-eval docs."""
    def _mod50(col) -> pa.Array:
        # pyarrow in this env has no modulo kernel: x - (x // 50) * 50
        x = pc.cast(col, pa.int64())
        return pc.subtract(x, pc.multiply(pc.divide(x, 50), 50))

    docs = _docs(sf_dir, ["doc_id", "text"])
    eval_tbl = pa.concat_tables(
        ray.get(
            docs.map_batches(
                lambda t: t.filter(pc.equal(_mod50(t.column("doc_id")), 0)),
                batch_format="pyarrow",
            ).materialize().to_arrow_refs()
        )
    )
    eval_shingles: set = set()
    for text in eval_tbl.column("text").to_pylist():
        eval_shingles |= word_shingles(text, k)
    eval_ref = ray.put(frozenset(eval_shingles))

    class _Overlap:
        def __init__(self):
            self.eval_set = ray.get(eval_ref)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.not_equal(_mod50(t.column("doc_id")), 0))
            n_overlap = [
                len(word_shingles(text, self.k) & self.eval_set)
                for text in t.column("text").to_pylist()
            ]
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "n_overlap": pa.array(n_overlap, pa.int64()),
                    "contaminated": pa.array(
                        [n >= min_overlap for n in n_overlap], pa.bool_()
                    ),
                }
            )

    return docs.map_batches(
        stage_call, fn_args=(_Overlap, {}), batch_format="pyarrow"
    )


def simhash_signatures(sf_dir: str) -> rd.Dataset:
    """64-bit SimHash + 4×16-bit band keys per doc (near-dup bucketing)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stage_call, fn_args=(SimHasher, {}), batch_format="pyarrow"
    )


# Default sensitive-content rules for the corpus PII scan: raw RE2 strings
# shared verbatim with the SQL oracles (word-shaped because the synthetic
# documents corpus is digit-free; real deployments pass SSN/email/CC
# patterns — the kernels are pattern-agnostic).
SENSITIVE_PATTERNS = (
    r"key \w+ row",
    r"hash value",
    r"spark[a-z]*",
    r"table (scan|sort|window)",
)


def doc_pii_density(
    sf_dir: str, patterns: Sequence[str] = SENSITIVE_PATTERNS
) -> rd.Dataset:
    """Rule-driven sensitive-text detection as a corpus scoring pass — the
    redaction engine's regex-rule semantics (M4, ``functions/rules.py``;
    reference ``RedactionPlanner.cs`` regex path) applied per document to
    grade training data for PII density.

    Per doc and per rule: non-overlapping leftmost RE2 match count
    (``pc.count_substring_regex``) and matched-char mass via the length
    delta of ``pc.replace_substring_regex`` — both pure Arrow kernels, so
    the hot path has zero per-row Python. Summed over rules;
    ``density_permille`` = (1000 * matched_chars) // n_chars is exact
    integer per the repo invariant. Scale shape: one streaming map, no
    shuffle, no state — at 100 TB this is a straight pass over blocks."""

    def scan(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        nm = np.zeros(t.num_rows, np.int64)
        mc = np.zeros(t.num_rows, np.int64)
        base = pc.utf8_length(txt).to_numpy().astype(np.int64)
        for p in patterns:
            nm += pc.count_substring_regex(txt, pattern=p).to_numpy().astype(np.int64)
            stripped = pc.replace_substring_regex(txt, pattern=p, replacement="")
            mc += base - pc.utf8_length(stripped).to_numpy().astype(np.int64)
        nch = t.column("n_chars").to_numpy()
        dens = np.where(nch > 0, (1000 * mc) // np.maximum(nch, 1), np.int64(0))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_matches": pa.array(nm, pa.int64()),
                "matched_chars": pa.array(mc, pa.int64()),
                "density_permille": pa.array(dens, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text", "n_chars"]).map_batches(
        scan, batch_format="pyarrow"
    )


def pii_clean_filter(
    sf_dir: str,
    max_permille: int = 10,
    patterns: Sequence[str] = SENSITIVE_PATTERNS,
) -> rd.Dataset:
    """Corpus gate on the PII scan: keep docs whose sensitive-match density
    is at most ``max_permille``. Same zero-shuffle streaming map as
    ``doc_pii_density`` with the threshold fused into the batch kernel —
    dropped rows never leave the task."""

    def gate(t: pa.Table) -> pa.Table:
        keep = pc.less_equal(t.column("density_permille"), max_permille)
        return t.filter(keep)

    return doc_pii_density(sf_dir, patterns=patterns).map_batches(
        gate, batch_format="pyarrow"
    )


# ------------------------------------------------------------- text analysis

def doc_token_counts(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(token_counts, batch_format="pyarrow")


def doc_bpe_token_counts(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(bpe_token_counts, batch_format="pyarrow")


def doc_quality(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(quality_scores, batch_format="pyarrow")


def doc_repetition(sf_dir: str) -> rd.Dataset:
    """Per-doc repetition quality signals (Gopher-style duplicate-content
    flags): word/bigram totals, distinct counts, most-repeated item + count.
    Pure map, zero shuffle — one doc is one row, so the whole signal
    computes inside the batch at any corpus size."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        repetition_signals, batch_format="pyarrow"
    )


def doc_chunks(sf_dir: str) -> rd.Dataset:
    """Training-window chunking: every doc split into 200-char windows with
    50-char overlap (stride 150), 1 -> N rows. flat_map shape via
    map_batches; output size ~4/3 of input, no shuffle."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunk_documents, batch_format="pyarrow"
    )


def corpus_char_pair_counts(sf_dir: str, k: int = 50) -> rd.Dataset:
    """Corpus-wide adjacent character-pair frequencies, top-k — the counting
    step of one BPE merge iteration (the tokenizer-training primitive).

    Scale shape: each batch concatenates its docs' codepoint arrays with a
    sentinel between docs (so no cross-doc pairs form) and collapses to
    distinct (a, b, n) rows with one np.unique over 42-bit composite keys —
    the partial is bounded by the batch's distinct-pair count, which at any
    corpus size is at most |alphabet|^2, NOT row count. The final combine
    sums those bounded histograms in one block and takes the top k with a
    deterministic (count desc, pair asc) tie-break."""
    SENT = np.int64(0x10FFFF + 1)  # outside Unicode: kills cross-doc pairs

    def pair_partial(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        if not texts:
            return pa.table(
                {"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        parts = []
        for s in texts:
            parts.append(np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64))
            parts.append(np.array([SENT], dtype=np.int64))
        cp = np.concatenate(parts)
        a, b = cp[:-1], cp[1:]
        m = (a != SENT) & (b != SENT)
        comp = a[m] * (np.int64(1) << np.int64(21)) + b[m]
        uniq, counts = np.unique(comp, return_counts=True)
        hi = (uniq >> np.int64(21)).astype(np.uint32)
        lo = (uniq & ((np.int64(1) << np.int64(21)) - 1)).astype(np.uint32)
        pairs = [
            chr(int(x)) + chr(int(y)) for x, y in zip(hi, lo)
        ]
        return pa.table(
            {
                "pair": pa.array(pairs, pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        p = np.asarray(t.column("pair").to_pandas(), dtype=object)
        n = t.column("n").to_numpy()
        uniq, inv = np.unique(p, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, n)
        order = np.lexsort((uniq, -tot))[:k]
        return pa.table(
            {
                "pair": pa.array(uniq[order], pa.string()),
                "n": pa.array(tot[order], pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(pair_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow", batch_size=None)
    )


BLOOM_BITS = 1 << 16  # m: filter width in bits (8 KiB of memory)
BLOOM_K = 4  # hash functions


def _bloom_bits_of(text: str, m_bits: int = BLOOM_BITS, k: int = BLOOM_K) -> list:
    """The k bit positions for one text: md5(text || ':bloom' || i)
    upper-64 little-endian mod m — the same md5_number_upper convention as
    doc_split, so the SQL oracle reproduces every bit exactly."""
    return [
        int.from_bytes(hashlib.md5(f"{text}:bloom{i}".encode()).digest()[:8], "little")
        % m_bits
        for i in range(k)
    ]


def bloom_geometry(n_ref: int, bits_per_elem: int = 10, floor_bits: int = BLOOM_BITS) -> int:
    """Auto-sized filter width: the smallest power of two >= 10 bits per
    expected reference element (~1% FP at k=4), floored at the 8 KiB
    default. Geometry is part of the SQL-reproducible contract — the
    oracle derives the SAME m from the SAME reference count via a
    recursive doubling CTE, so power-of-two + integer arithmetic only
    (version: bloom-geom-v2; v1 was the fixed 2^16, which measurably
    saturates at 200k reference docs — nearly every candidate reads
    maybe-dup)."""
    target = max(floor_bits, bits_per_elem * max(int(n_ref), 1))
    m = floor_bits
    while m < target:
        m *= 2
    return m


def bloom_new_docs(
    sf_dir: str, m_bits: int | None = None, k: int = BLOOM_K
) -> rd.Dataset:
    """Bloom-filter INCREMENTAL dedup — the cross-run membership gate: docs
    already ingested (here: the doc_id % 10 == 0 shard, standing in for a
    previous run's corpus) populate a fixed-size bit array; the incoming
    stream keeps only docs the filter can PROVE are new (at least one of
    their k bits unset). Bloom guarantees no false negatives, so the kept
    set provably contains no exact text duplicate of the reference shard;
    false positives (conservatively dropped docs) are deterministic because
    the hashes are md5-derived — which is what makes this hash-green
    checkable rather than approximate-by-construction.

    Scale shape: the build side reduces each batch to ONE fixed 8 KiB
    bitmap row (never a bit-index table, which would be O(k·|ref|)); the
    driver ORs the handful of bitmaps and ``ray.put``s the result once; the
    candidate stream gates in a TASK-based map_batches against the
    broadcast bitmap. Memory is O(m) regardless of corpus size — the whole
    point of a Bloom gate at 10^12 rows.

    m IS SIZED TO THE REFERENCE CARDINALITY by default
    (``bloom_geometry``: smallest power of two >= 10 bits per reference
    element, floored at 2^16) — measured at 2M docs with 200k references,
    the old fixed 2^16 saturated (nearly every candidate read maybe-dup,
    the textbook undersized-filter failure) while the auto-sized 2^21
    restores the expected pass-through at 32 KB of broadcast state. The
    reference count comes from one doc_id-only columnar scan; the SQL
    oracle derives the identical m with a recursive doubling CTE over the
    same count.
    """
    if m_bits is None:
        def ref_count(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            return pa.table(
                {"n": pa.array([int((ids % 10 == 0).sum())], pa.int64())}
            )

        counts = _collect(
            _docs(sf_dir, ["doc_id"]).map_batches(ref_count, batch_format="pyarrow")
        )
        n_ref = int(pc.sum(counts.column("n")).as_py() or 0) if counts is not None else 0
        m_bits = bloom_geometry(n_ref)
    n_words = m_bits // 64

    def bitmap_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        words = np.zeros(n_words, dtype=np.uint64)
        for txt in t.column("text").filter(pa.array(ids % 10 == 0)).to_pylist():
            for b in _bloom_bits_of(txt, m_bits, k):
                words[b >> 6] |= np.uint64(1) << np.uint64(b & 63)
        return pa.table({"bitmap": pa.array([words.tobytes()], pa.binary())})

    parts = _collect(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(bitmap_partial, batch_format="pyarrow")
    )
    words = np.zeros(n_words, dtype=np.uint64)
    if parts is not None:
        for buf in parts.column("bitmap").to_pylist():
            words |= np.frombuffer(buf, dtype=np.uint64)
    words_ref = ray.put(words)

    def gate(t: pa.Table, ref) -> pa.Table:
        w = ray.get(ref) if not isinstance(ref, np.ndarray) else ref
        ids = t.column("doc_id").to_numpy()
        cand = t.filter(pa.array(ids % 10 != 0))
        keep = []
        for txt in cand.column("text").to_pylist():
            bits = _bloom_bits_of(txt, m_bits, k)
            keep.append(
                not all((w[b >> 6] >> np.uint64(b & 63)) & np.uint64(1) for b in bits)
            )
        return pa.table(
            {"doc_id": cand.column("doc_id").filter(pa.array(keep, type=pa.bool_()))}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        gate, fn_args=(words_ref,), batch_format="pyarrow"
    )


def top_quality_docs(sf_dir: str, k: int = 100) -> pa.Table:
    """Global top-k documents by stopword density (integer permille, so the
    ordering is exact), tie-broken by doc_id — the percentile-gate shape of
    a quality-filtered corpus selection.

    Scale shape: NOT a global sort. Each batch prunes to its local top-k
    (quality signals are per-row Arrow kernels), so only
    O(k x n_batches) skinny rows ever leave the map stage; the driver
    finishes with one lexsort of that tiny partial table."""

    def local_topk(t: pa.Table) -> pa.Table:
        q = quality_scores(t)
        permille = np.floor_divide(
            q.column("n_stopwords").to_numpy() * 1000,
            np.maximum(q.column("n_tokens").to_numpy(), 1),
        )
        ids = q.column("doc_id").to_numpy()
        order = np.lexsort((ids, -permille))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "stop_permille": pa.array(permille[order], pa.int64()),
                "n_tokens": pa.array(q.column("n_tokens").to_numpy()[order], pa.int64()),
            }
        )

    parts = _docs(sf_dir, ["doc_id", "text"]).map_batches(local_topk, batch_format="pyarrow")
    tbl = pa.concat_tables(ray.get(parts.materialize().to_arrow_refs()))
    ids = tbl.column("doc_id").to_numpy()
    order = np.lexsort((ids, -tbl.column("stop_permille").to_numpy()))[:k]
    return tbl.take(order)


def events_rollup(sf_dir: str) -> rd.Dataset:
    """ROLLUP aggregate over (event_type, day): counts + int-cents sums at
    three levels — (type, day), (type, ALL), (ALL, ALL) — with the literal
    sentinel 'ALL' marking rolled-up dimensions (a string sentinel rather
    than NULL so the driver's value-hash compare is unambiguous).

    Scale shape: the map side collapses each batch to distinct
    (type, day) partials (one lexsort + RLE), so the single exchange moves
    |types| x |days| skinny rows per batch — a tiny, bounded domain — into
    ONE block where the final combine and the two coarser levels are
    derived from the finest table (never a second pass over raw events)."""
    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pandas(), dtype=object)
        day = np.asarray(
            pc.strftime(pc.floor_temporal(t.column("ts"), unit="day"), format="%Y-%m-%d").to_pandas(),
            dtype=object,
        )
        cents = pc.cast(
            pc.floor(pc.multiply(t.column("value"), 100.0)), pa.int64()
        ).to_numpy()
        key = et + "\x00" + day
        order = np.argsort(key, kind="stable")
        k_s = key[order]
        new = np.ones(len(k_s), dtype=bool)
        new[1:] = k_s[1:] != k_s[:-1]
        gid = np.cumsum(new) - 1
        n = np.bincount(gid).astype(np.int64)
        s = np.zeros(len(n), np.int64)
        np.add.at(s, gid, cents[order])
        sel = order[new]
        return pa.table(
            {
                "event_type": pa.array(et[sel], pa.string()),
                "day": pa.array(day[sel], pa.string()),
                "n_events": pa.array(n, pa.int64()),
                "sum_cents": pa.array(s, pa.int64()),
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        import pandas as pd

        df = t.to_pandas()
        finest = (
            df.groupby(["event_type", "day"], as_index=False)[["n_events", "sum_cents"]].sum()
        )
        by_type = finest.groupby("event_type", as_index=False)[["n_events", "sum_cents"]].sum()
        by_type["day"] = "ALL"
        total = pd.DataFrame(
            {
                "event_type": ["ALL"],
                "day": ["ALL"],
                "n_events": [finest["n_events"].sum()],
                "sum_cents": [finest["sum_cents"].sum()],
            }
        )
        out = pd.concat([finest, by_type, total], ignore_index=True)
        return pa.Table.from_pandas(
            out[["event_type", "day", "n_events", "sum_cents"]], preserve_index=False
        )

    parts = ev.map_batches(partial, batch_format="pyarrow")
    # one block: the rollup levels need every finest-key partial together
    return parts.repartition(1).map_batches(finalize, batch_format="pyarrow", batch_size=None)


def doc_fingerprints(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fingerprints, batch_format="pyarrow")


def doc_rolling_fingerprints(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(rolling_fingerprints, batch_format="pyarrow")


def doc_langid(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stage_call, fn_args=(LangId, {}), batch_format="pyarrow"
    )


# --------------------------------------------------------- similarity search

def _query_set(sf_dir: str, n_queries: int = 8):
    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    q_tbl = pa.concat_tables(
        ray.get(
            emb.map_batches(
                lambda t: t.filter(pc.less(t.column("vec_id"), n_queries)),
                batch_format="pyarrow",
            ).materialize().to_arrow_refs()
        )
    )
    ids = q_tbl.column("vec_id").to_pylist()
    order = np.argsort(ids)
    vecs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in q_tbl.column("embedding").to_pylist()]
    )[order]
    return emb, {"ids": [ids[i] for i in order], "vecs": vecs}


def ann_topk_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 8) -> rd.Dataset:
    """Exact cosine top-k: broadcast query matrix (ray.put once), one dense
    GEMM per batch emitting per-batch top-k partials, tiny groupby(query_id)
    merge to the global top-k. The partials shuffle is n_queries×k per block
    regardless of corpus size — the scale baseline."""
    emb, q = _query_set(sf_dir, n_queries)
    q_ref = ray.put(q)
    partials = emb.map_batches(
        stage_call,
        fn_args=(BruteForceTopK, {"queries_ref": q_ref, "k": k}),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return partials.groupby("query_id").map_groups(
        lambda g: final_topk(g, k=k), batch_format="pyarrow"
    )


def ann_topk_ivf(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 8,
    n_cells: int = 16,
    nprobe: int = 6,
    n_assign: int = 2,
) -> rd.Dataset:
    """IVF-bucketed ANN: seeded centroids from a driver sample, batches score
    only rows with a cell among each query's nprobe nearest. ``n_assign=2``
    multi-assignment (IVF spill) holds recall@10 ≥ 0.9 on the
    weakly-clustered test embeddings (see IVFTopK); bench tracks the number.
    Approximate by construction — the oracle SQL replicates this exact
    parameterization from the shared centroids."""
    emb, q = _query_set(sf_dir, n_queries)
    sample_tbl = pa.concat_tables(ray.get(emb.limit(2048).materialize().to_arrow_refs()))
    sample = np.stack([np.asarray(v, np.float64) for v in sample_tbl.column("embedding").to_pylist()])
    cents = build_ivf_centroids(sample, n_cells)
    partials = emb.map_batches(
        stage_call,
        fn_args=(
            IVFTopK,
            {
                "queries_ref": ray.put(q),
                "centroids_ref": ray.put(cents),
                "k": k,
                "nprobe": nprobe,
                "n_assign": n_assign,
            },
        ),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return partials.groupby("query_id").map_groups(
        lambda g: final_topk(g, k=k), batch_format="pyarrow"
    )


def ann_topk_lsh(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 8,
    n_bands: int = 12,
    bits_per_band: int = 3,
) -> rd.Dataset:
    """LSH-bucketed ANN — the third similarity-search path (brute-force =
    exact baseline, IVF = centroid cells, LSH = signed random projection):
    n_bands · bits_per_band md5-derived ±1 hyperplanes (36 at the 12-band ×
    3-bit defaults — the oracle's generate_series(0, 35)) over the
    2^20-quantized vectors, packed into per-band bit keys; a vector is
    scored for a query iff they share a band bucket in >= 1 band (a few %
    of the corpus at these widths).

    Scale shape: the sign matrix and query buckets are per-actor state;
    per batch one int64 GEMM buckets the rows and one small float GEMM
    scores the candidate slice, emitting k-row partials — no shuffle but
    the tiny groupby(query_id) merge. Unlike IVF there is no training
    sample or centroid build: the bucketer is data-independent, which is
    what a streaming 100 TB ingest wants. Deterministic md5 hyperplanes +
    exact-int bit decisions make the candidate set SQL-reproducible, so
    the driver oracle is exact (not rows-only)."""
    from pdfredact_ray.stages.embed import LSHTopK

    emb, q = _query_set(sf_dir, n_queries)
    partials = emb.map_batches(
        stage_call,
        fn_args=(
            LSHTopK,
            {
                "queries_ref": ray.put(q),
                "k": k,
                "n_bands": n_bands,
                "bits_per_band": bits_per_band,
            },
        ),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return partials.groupby("query_id").map_groups(
        lambda g: final_topk(g, k=k), batch_format="pyarrow"
    )


def doc_pack_sequences(
    sf_dir: str, budget: int = 512, n_ranges: int = 64
) -> rd.Dataset:
    """Training sequence packing: documents concatenated in doc_id order
    into fixed ``budget``-token sequences; each doc is assigned the
    sequence containing its FIRST token — ``seq_id = floor(exclusive
    prefix-sum of tokens / budget)``. Emits (doc_id, n_tokens, seq_id),
    all ints; SQL oracle is one window sum.

    This is the distributed EXCLUSIVE PREFIX-SCAN primitive, done in the
    classic two-sweep shape with ONE tiny barrier: docs land in doc_id
    RANGES (range = doc_id // width, width from parquet min/max stats, so
    range order == doc order); sweep 1 is a map-only pass emitting per-
    batch (range, partial token sum) rows — a few ints per batch — whose
    driver cumsum yields each range's global starting offset (broadcast
    once); sweep 2 sorts WITHIN each range group and adds the offset.
    Group count is fixed at n_ranges and per-group size is bounded by the
    id-range width, never by a hot key — there is no whale dimension.
    The sequential dependency (every doc's seq depends on all prior
    tokens) costs exactly one K-integer collect, not a global sort."""
    import pyarrow.dataset as pads

    # doc_id min/max from parquet FOOTER statistics only (no data scan);
    # falls back to a single-column scan if a writer omitted stats
    dset = pads.dataset(os.path.join(sf_dir, "documents.parquet"), format="parquet")
    los: List[int] = []
    his: List[int] = []
    for frag in dset.get_fragments():
        md = frag.metadata
        ci = md.schema.to_arrow_schema().get_field_index("doc_id")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                los.clear()
                his.clear()
                break
            los.append(int(st.min))
            his.append(int(st.max))
        else:
            continue
        break
    if not los:
        ids_np = dset.to_table(columns=["doc_id"]).column("doc_id").to_numpy()
        if len(ids_np) == 0:
            return rd.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "n_tokens": pa.array([], pa.int64()),
                        "seq_id": pa.array([], pa.int64()),
                    }
                )
            )
        lo, hi = int(ids_np.min()), int(ids_np.max())
    else:
        lo, hi = min(los), max(his)
    width = max(1, (hi - lo + n_ranges) // n_ranges)

    def counted(t: pa.Table) -> pa.Table:
        n = [len(x.split()) for x in t.column("text").to_pylist()]
        did = t.column("doc_id").to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "rng": pa.array((did - lo) // width, pa.int64()),
            }
        )

    counts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(counted, batch_format="pyarrow")
        .materialize()  # consumed by both sweeps
    )

    def range_partial(t: pa.Table) -> pa.Table:
        r = t.column("rng").to_numpy()
        uniq, inv = np.unique(r, return_inverse=True)
        from pdfredact_ray.functions.ints import group_sum

        return pa.table(
            {
                "rng": pa.array(uniq, pa.int64()),
                "tok": pa.array(group_sum(inv, len(uniq), t.column("n_tokens").to_numpy()), pa.int64()),
            }
        )

    parts = _collect(counts.map_batches(range_partial, batch_format="pyarrow"))
    totals = np.zeros(n_ranges + 1, dtype=np.int64)
    if parts is not None:
        np.add.at(
            totals,
            parts.column("rng").to_numpy().astype(np.int64),
            parts.column("tok").to_numpy().astype(np.int64),
        )
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    off_ref = ray.put(offsets)

    def assign_seq(g: pa.Table, ref) -> pa.Table:
        if g.num_columns == 0:
            return g
        offs = ref if isinstance(ref, np.ndarray) else ray.get(ref)
        did = g.column("doc_id").to_numpy().astype(np.int64)
        n = g.column("n_tokens").to_numpy().astype(np.int64)
        order = np.argsort(did, kind="stable")
        did_s, n_s = did[order], n[order]
        rng = int(g.column("rng")[0].as_py())
        excl = offs[rng] + np.concatenate(([0], np.cumsum(n_s)[:-1]))
        return pa.table(
            {
                "doc_id": pa.array(did_s, pa.int64()),
                "n_tokens": pa.array(n_s, pa.int64()),
                "seq_id": pa.array(excl // np.int64(budget), pa.int64()),
            }
        )

    return counts.groupby("rng").map_groups(
        assign_seq, fn_args=(off_ref,), batch_format="pyarrow"
    )


def corpus_mixture_sample(
    sf_dir: str, char_budget: int = 3000, n_buckets: int = 256
) -> rd.Dataset:
    """Training-data mixture sampling: per source, keep documents in
    deterministic ``md5(str(doc_id))`` rank order until the source's char
    budget is spent — keep a doc while the EXCLUSIVE running char sum of
    its ranked predecessors is still under ``char_budget``. Emits
    (doc_id, source, n_chars, prev_chars); the SQL oracle is one window
    sum over the same md5 rank (hex compares identically both sides).

    Scale shape — the ``doc_pack_sequences`` two-sweep prefix scan, keyed
    by rank instead of doc_id: the md5 hex PREFIX is an order-preserving
    bucketing of the rank order, so docs land in (source, hash-prefix
    bucket) groups whose sizes are corpus/256 per source — fixed group
    count, no whale key, no global sort. Sweep 1 is map-only per-batch
    (source, bucket, chars) partials whose driver cumsum yields each
    bucket's base offset (a K×256-int collect, broadcast once); sweep 2
    sorts WITHIN each group by (hash, doc_id), adds the base, and applies
    the budget cut — one bounded-group exchange total."""
    if not 1 <= n_buckets <= 256 or 256 % n_buckets:
        raise ValueError("n_buckets must divide 256")
    div = 256 // n_buckets  # first hash byte -> bucket, order-preserving

    def hashed(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy().astype(np.int64)
        h = np.asarray(
            [hashlib.md5(str(int(d)).encode()).hexdigest() for d in did],
            dtype=object,
        )
        b = np.asarray([int(x[:2], 16) for x in h], dtype=np.int64) // div
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        gk = np.asarray(
            [f"{s}:{int(bb):03d}" for s, bb in zip(src, b)], dtype=object
        )
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "source": pa.array(src, pa.string()),
                "n_chars": t.column("n_chars").cast(pa.int64()),
                "h": pa.array(h, pa.string()),
                "bucket": pa.array(b, pa.int64()),
                "gk": pa.array(gk, pa.string()),
            }
        )

    rows = (
        _docs(sf_dir, ["doc_id", "source", "n_chars"])
        .map_batches(hashed, batch_format="pyarrow")
        .materialize()  # consumed by both sweeps
    )

    def bucket_partial(t: pa.Table) -> pa.Table:
        from pdfredact_ray.functions.ints import group_sum

        gk = np.asarray(t.column("gk").to_pylist(), dtype=object)
        uniq, inv = np.unique(gk, return_inverse=True)
        return pa.table(
            {
                "gk": pa.array(uniq, pa.string()),
                "chars": pa.array(
                    group_sum(inv, len(uniq), t.column("n_chars").to_numpy()),
                    pa.int64(),
                ),
            }
        )

    parts = _collect(rows.map_batches(bucket_partial, batch_format="pyarrow"))
    base: dict = {}
    if parts is not None:
        gks = parts.column("gk").to_pylist()
        chars = parts.column("chars").to_numpy()
        totals: dict = {}
        for gk, c in zip(gks, chars):
            s, b = gk.rsplit(":", 1)
            arr = totals.setdefault(s, np.zeros(n_buckets, np.int64))
            arr[int(b)] += int(c)
        for s, arr in totals.items():
            base[s] = np.concatenate(([0], np.cumsum(arr)[:-1]))
    base_ref = ray.put(base)

    def pick(g: pa.Table, ref) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "n_chars": pa.array([], pa.int64()),
                    "prev_chars": pa.array([], pa.int64()),
                }
            )
        d = ref if isinstance(ref, dict) else ray.get(ref)
        src = g.column("source")[0].as_py()
        b = int(g.column("bucket")[0].as_py())
        did = g.column("doc_id").to_numpy()
        nch = g.column("n_chars").to_numpy()
        h = np.asarray(g.column("h").to_pylist(), dtype=object)
        order = np.lexsort((did, h))
        excl = d[src][b] + np.concatenate(([0], np.cumsum(nch[order])[:-1]))
        keep = excl < char_budget
        sel = order[keep]
        return pa.table(
            {
                "doc_id": pa.array(did[sel], pa.int64()),
                "source": pa.array(np.full(len(sel), src, dtype=object), pa.string()),
                "n_chars": pa.array(nch[sel], pa.int64()),
                "prev_chars": pa.array(excl[keep], pa.int64()),
            }
        )

    return rows.groupby("gk").map_groups(
        pick, fn_args=(base_ref,), batch_format="pyarrow"
    )


def _cross_doc_ngrams_joined(
    sf_dir: str, hot_ds: rd.Dataset, hash_doc_rows, k: int, n_buckets: int
) -> rd.Dataset:
    """Above-gate leg of ``cross_doc_repeated_ngrams``: the hot-shingle set
    stays a Dataset and pass 2 hash-joins against it on the shingle hash —
    the same co-partitioned shape as the minhash verify join
    (corpus.py ``_minhash_pairs_distributed`` step 3), so no driver
    collect and no broadcast of an unbounded set anywhere:

    1. distinct (h, doc_id) shingle rows ⋈ hot(h)  [inner hash join — the
       one corpus-sized exchange, 2 ints per row];
    2. per-doc shared counts via per-batch partials + a fixed-bucket
       vectorized combine (the dedup_exact shape);
    3. per-doc distinct counts (no shuffle) LEFT-OUTER join the shared
       counts on doc_id — absent rows are unshared docs (n_shared=0)."""
    import pyarrow.dataset as pads

    from pdfredact_ray.pipelines.relational import join_partitions

    docs = _docs(sf_dir, ["doc_id", "text"])

    def distinct_counts(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        nd = [len(word_shingles(text, k)) for text in t.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_distinct": pa.array(nd, pa.int64()),
            }
        )

    n_docs_est = pads.dataset(
        os.path.join(sf_dir, "documents.parquet"), format="parquet"
    ).count_rows()
    shingle_parts = join_partitions(n_docs_est * 64, row_bytes=16)

    shingles = (
        docs.map_batches(hash_doc_rows, batch_format="pyarrow")
        .map_batches(
            lambda t: t if t.num_columns == 0 else t.select(["h", "doc_id"]),
            batch_format="pyarrow",
        )
    )
    joined = shingles.join(
        hot_ds, join_type="inner", num_partitions=shingle_parts, on=("h",)
    )

    NBC = np.int64(1024)

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "cbucket": pa.array([], pa.int64()),
                }
            )
        d = t.column("doc_id").to_numpy().astype(np.int64)
        uniq, counts = np.unique(d, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
                "cbucket": pa.array(uniq % NBC, pa.int64()),
            }
        )

    def count_combine(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_shared": pa.array([], pa.int64())}
            )
        d = g.column("doc_id").to_numpy().astype(np.int64)
        n = g.column("n").to_numpy().astype(np.int64)
        uniq, inv = np.unique(d, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, n)
        return pa.table(
            {"doc_id": pa.array(uniq, pa.int64()), "n_shared": pa.array(tot, pa.int64())}
        )

    shared = (
        joined.map_batches(count_partial, batch_format="pyarrow")
        .groupby("cbucket")
        .map_groups(count_combine, batch_format="pyarrow")
    )
    out = docs.map_batches(distinct_counts, batch_format="pyarrow").join(
        shared,
        join_type="left_outer",
        num_partitions=join_partitions(n_docs_est, row_bytes=16),
        on=("doc_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        ns = pc.fill_null(t.column("n_shared"), 0).cast(pa.int64())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_distinct": t.column("n_distinct"),
                "n_shared": ns,
                "flagged": pc.greater_equal(ns, 1),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


# Hot-shingle rows up to this count are collected and ray.put-broadcast to
# pass 2 (a sorted int64 array — 50M rows ~ 400 MB object-store, read
# zero-copy per task). A crawl-scale dup rate grows the hot set past any
# broadcast; above the gate it stays a Dataset and pass 2 hash-joins it.
HOTSET_MAX_ROWS = int(os.environ.get("GRAFT_HOTSET_MAX_ROWS", 50_000_000))


def cross_doc_repeated_ngrams(
    sf_dir: str, k: int = 8, n_buckets: int = 64
) -> rd.Dataset:
    """Exact cross-document repeated-n-gram detection — the substring-dedup
    primitive (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): per doc, how many of its distinct k-token
    shingles also occur in at least one OTHER document, plus a flag. The
    flagged spans are what substring-level dedup removes; this operator is
    the detection pass.

    Scale shape: pass 1 collapses each batch to distinct (shingle-crc32,
    doc_id) int rows bucketed by hash (the dedup_exact combine shape —
    fixed group count, vectorized per-bucket sweep) and emits only hashes
    seen in >= 2 distinct docs. Size-gated like minhash_near_dup_pairs:
    up to ``HOTSET_MAX_ROWS`` that HOT set broadcasts once via ray.put and
    pass 2 re-streams the corpus counting each doc's members with one
    sorted ``searchsorted``; ABOVE the gate (crawl-scale dup rates) the
    hot set stays a Dataset and pass 2's distinct shingle rows HASH-JOIN
    it on the crc32 hash ``h`` (the minhash verify-join shape), with
    per-doc shared counts from a bucketed combine and a left-outer join
    back onto the per-doc distinct counts — nothing O(hot set) ever lands
    on the driver. Both paths are pytest-pinned equal. Engine hashes
    shingles with crc32; the oracle intersects shingle STRINGS — identical
    absent crc collisions (the documented ngram_jaccard equivalence,
    bit-for-bit green on this corpus)."""

    def hash_doc_rows(t: pa.Table) -> pa.Table:
        hs: List[np.ndarray] = []
        ds_: List[np.ndarray] = []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            sh = word_shingles(text, k)
            if not sh:
                continue
            arr = np.fromiter(sh, dtype=np.int64, count=len(sh))
            hs.append(arr)
            ds_.append(np.full(len(arr), doc_id, dtype=np.int64))
        if not hs:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        h = np.concatenate(hs)
        d = np.concatenate(ds_)
        return pa.table(
            {
                "h": pa.array(h, pa.int64()),
                "doc_id": pa.array(d, pa.int64()),
                "bucket": pa.array(h % np.int64(n_buckets), pa.int64()),
            }
        )

    def hot_hashes(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return g
        h = g.column("h").to_numpy()
        d = g.column("doc_id").to_numpy()
        order = np.lexsort((d, h))
        h_s, d_s = h[order], d[order]
        # distinct (h, doc) then h with >= 2 members
        first = np.r_[True, (h_s[1:] != h_s[:-1]) | (d_s[1:] != d_s[:-1])]
        h_u = h_s[first]
        starts = np.r_[True, h_u[1:] != h_u[:-1]]
        idx = np.flatnonzero(starts)
        lens = np.diff(np.append(idx, len(h_u)))
        return pa.table({"h": pa.array(h_u[idx][lens >= 2], pa.int64())})

    hot_ds = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(hash_doc_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(hot_hashes, batch_format="pyarrow")
        .materialize()
    )
    if hot_ds.count() > HOTSET_MAX_ROWS:
        # shed the groupby's zero-column empty blocks before the Acero
        # join (they bypass map_batches and lack the key column); hot is
        # non-empty here by the gate, so the rebuild never returns None
        return _cross_doc_ngrams_joined(
            sf_dir, _drop_empty_blocks(hot_ds), hash_doc_rows, k, n_buckets
        )
    hot = _collect(hot_ds)
    hot_arr = (
        np.sort(hot.column("h").to_numpy().astype(np.int64))
        if hot is not None and hot.num_rows
        else np.empty(0, dtype=np.int64)
    )
    hot_ref = ray.put(hot_arr)

    def per_doc(t: pa.Table, ref) -> pa.Table:
        ha = ref if isinstance(ref, np.ndarray) else ray.get(ref)
        n_dist, n_shared = [], []
        for text in t.column("text").to_pylist():
            sh = word_shingles(text, k)
            if sh:
                arr = np.fromiter(sh, dtype=np.int64, count=len(sh))
                shared = int(
                    np.count_nonzero(
                        ha[np.clip(np.searchsorted(ha, arr), 0, max(len(ha) - 1, 0))]
                        == arr
                    )
                    if len(ha)
                    else 0
                )
            else:
                arr = np.empty(0, dtype=np.int64)
                shared = 0
            n_dist.append(len(arr))
            n_shared.append(shared)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_distinct": pa.array(n_dist, pa.int64()),
                "n_shared": pa.array(n_shared, pa.int64()),
                "flagged": pa.array([n >= 1 for n in n_shared], pa.bool_()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        per_doc, fn_args=(hot_ref,), batch_format="pyarrow"
    )


def knn_label_vote(sf_dir: str, k: int = 10, n_queries: int = 8) -> pa.Table:
    """k-NN majority-vote label prediction — the standard embedding-quality
    eval / label-propagation primitive: each query vector's label predicted
    by the majority label of its k nearest neighbors (cosine, self
    excluded), deterministic tie-break (votes desc, label asc). Emits
    (query_id, predicted_label, votes, true_label, correct) — all ints.

    Scale shape: the neighbor search is the brute-force broadcast-GEMM
    partials (per-batch top-(k+1) so dropping a self-hit can't starve the
    global top-k), a tiny groupby(query_id) merge, then labels fetched for
    ONLY the k x n_queries winners via the task-based semi-join — never a
    corpus-wide label broadcast. The vote itself is n_queries x k rows on
    the driver. Swap the partials stage for ``IVFTopK``/``LSHTopK`` when
    the corpus outgrows exact search; the vote plumbing is unchanged."""
    emb, q = _query_set(sf_dir, n_queries)
    partials = emb.map_batches(
        stage_call,
        fn_args=(BruteForceTopK, {"queries_ref": ray.put(q), "k": k + 1}),
        batch_format="pyarrow",
        batch_size=4096,
    ).map_batches(
        lambda t: t.filter(pc.not_equal(t.column("query_id"), t.column("vec_id"))),
        batch_format="pyarrow",
    )
    topk = _collect(
        partials.groupby("query_id").map_groups(
            lambda g: final_topk(g, k=k), batch_format="pyarrow"
        )
    )
    if topk is None or topk.num_rows == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "predicted_label": pa.array([], pa.int64()),
                "votes": pa.array([], pa.int64()),
                "true_label": pa.array([], pa.int64()),
                "correct": pa.array([], pa.int64()),
            }
        )
    win_ids = pa.array(
        sorted(set(topk.column("vec_id").to_pylist()) | set(q["ids"])), pa.int64()
    )
    lab_tbl = _collect(
        rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "label"]
        ).map_batches(
            _semi_join,
            fn_args=(ray.put(win_ids), lambda t: _vec_id_key(t)),
            batch_format="pyarrow",
        )
    )
    labels = dict(
        zip(lab_tbl.column("vec_id").to_pylist(), lab_tbl.column("label").to_pylist())
    )
    out_q, out_p, out_v, out_t, out_c = [], [], [], [], []
    tk = topk.to_pandas()
    for qid, grp in tk.groupby("query_id"):
        votes: dict = {}
        for v in grp["vec_id"]:
            lb = int(labels[int(v)])
            votes[lb] = votes.get(lb, 0) + 1
        pred, nv = sorted(votes.items(), key=lambda x: (-x[1], x[0]))[0]
        true_lb = int(labels[int(qid)])
        out_q.append(int(qid))
        out_p.append(pred)
        out_v.append(nv)
        out_t.append(true_lb)
        out_c.append(1 if pred == true_lb else 0)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "predicted_label": pa.array(out_p, pa.int64()),
            "votes": pa.array(out_v, pa.int64()),
            "true_label": pa.array(out_t, pa.int64()),
            "correct": pa.array(out_c, pa.int64()),
        }
    )


def _vec_id_key(t: pa.Table) -> pa.Array:
    k = pc.cast(t.column("vec_id"), pa.int64())
    return k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k


# Above this corpus size the exact broadcast-GEMM near-dup path (O(corpus)
# broadcast per actor + O(N²) similarity work) stops being viable and the
# IVF-bucketed path takes over — mirroring MinHash's size-adaptive split.
BROADCAST_EMB_MAX_ROWS = 200_000


def embed_dedup_filter(sf_dir: str, threshold: float = 0.4) -> rd.Dataset:
    """Embedding-level dedup FILTER — completes the family
    (pairs -> components -> filter, exactly the near_dup_dedup_filter
    shape on the text side): cosine near-dup pairs from
    ``embed_cosine_near_dup`` collapse into connected components (driver
    union-find under CC_DRIVER_MAX_EDGES, large-star/small-star above),
    keep the min vec_id per component, and the embeddings table streams
    through one task-based broadcast anti-join of the O(near-dups) DROP
    set. Emits the survivors' (vec_id, label) — all ints, exact oracle
    via recursive-CTE reachability over the same pair predicate."""
    from pdfredact_ray.stages.dedup import (
        connected_components_distributed,
        union_find_components,
    )

    pairs = _collect(embed_cosine_near_dup(sf_dir, threshold))
    drop_ids = pa.array([], type=pa.int64())
    if pairs is not None and pairs.num_rows:
        a = pairs.column("id_a").to_numpy().astype(np.int64)
        b = pairs.column("id_b").to_numpy().astype(np.int64)
        labels = (
            union_find_components(a, b)
            if pairs.num_rows <= CC_DRIVER_MAX_EDGES
            else connected_components_distributed(
                pa.table({"doc_a": pairs.column("id_a"), "doc_b": pairs.column("id_b")})
            )
        )
        drop_ids = _noncanonical_ids(labels)
    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "label"]
    )
    if len(drop_ids) == 0:
        return emb
    return emb.map_batches(
        _semi_join,
        fn_args=(ray.put(drop_ids), _vec_id_key),
        fn_kwargs={"invert": True},
        batch_format="pyarrow",
    )


def embed_cosine_near_dup(
    sf_dir: str,
    threshold: float = 0.4,
    bucketed: Optional[bool] = None,
    n_cells: int = 16,
    nprobe: int = 8,
) -> rd.Dataset:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= threshold).

    Size-adaptive: up to ``BROADCAST_EMB_MAX_ROWS`` the exact path broadcasts
    the normalized corpus matrix once and does one GEMM per batch (the
    oracle). Above it — the 100 TB shape — vectors are replicated into their
    ``nprobe`` nearest IVF cells and pairs are scored in-cell only, bounding
    both broadcast (centroids, not corpus) and GEMM (per-cell); recall
    depends on nprobe/n_cells (a pair is caught iff its vectors share a
    probe cell — with nprobe=n_cells/2 the bucketed path reproduces the
    exact pair set on the test corpora, pytest-pinned)."""
    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    if bucketed is None:
        bucketed = emb.count() > BROADCAST_EMB_MAX_ROWS
    if not bucketed:
        full = pa.concat_tables(ray.get(emb.materialize().to_arrow_refs()))
        ids = full.column("vec_id").to_pylist()
        vecs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in full.column("embedding").to_pylist()]
        )
        corpus_ref = ray.put({"ids": ids, "vecs": vecs})
        pairs = emb.map_batches(
            stage_call,
            fn_args=(
                CosinePairFinder,
                {"corpus_ref": corpus_ref, "threshold": threshold},
            ),
            batch_format="pyarrow",
            batch_size=4096,
        )
        return pairs.sort(["id_a", "id_b"])

    sample_tbl = pa.concat_tables(ray.get(emb.limit(4096).materialize().to_arrow_refs()))
    sample = np.stack(
        [np.asarray(v, np.float64) for v in sample_tbl.column("embedding").to_pylist()]
    )
    cents = build_ivf_centroids(sample, n_cells)
    assigned = emb.map_batches(
        stage_call,
        fn_args=(CellAssigner, {"centroids_ref": ray.put(cents), "nprobe": nprobe}),
        batch_format="pyarrow",
        batch_size=4096,
    )
    pairs = assigned.groupby("cell_id").map_groups(
        lambda g: cell_cosine_pairs(g, threshold), batch_format="pyarrow"
    )
    # a pair sharing >1 probe cell is emitted once per shared cell: dedup
    dedup = pairs.groupby(["id_a", "id_b"]).count().map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
    )
    return dedup.sort(["id_a", "id_b"])


# ------------------------------------------------- main-content extraction

def _html_extracted(sf_dir: str, pool: int) -> rd.Dataset:
    from pdfredact_ray.sources.htmldocs import ensure_html_docs
    from pdfredact_ray.stages.extract import HtmlExtractor

    path = ensure_html_docs(sf_dir)
    pages = rd.read_parquet(path, columns=["doc_id", "html"]).map_batches(
        lambda t: t.rename_columns(["doc_id", "text"]), batch_format="pyarrow"
    )
    return pages.map_batches(
        stage_call, fn_args=(HtmlExtractor, {}), batch_format="pyarrow"
    )


def html_extract_text(sf_dir: str) -> rd.Dataset:
    """Main-content extraction alone: (doc_id, main_text). The generator
    records the expected main text per page, so this has an exact SQL oracle
    (SELECT doc_id, expected_main) — the extraction leg's hash-green check."""
    extracted = _html_extracted(sf_dir, pool=default_concurrency())
    return extracted.map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("doc_id"), "main_text": t.column("text")}
        ),
        batch_format="pyarrow",
    )


def html_extract_links(sf_dir: str) -> rd.Dataset:
    """Outlink extraction (the URL-graph primitive): every <a href> of every
    page in document order, 1 -> N flat rows (doc_id, link_idx, href). The
    parser is the stdlib HTMLParser walking the real markup; the oracle
    unnests the generator's construction-knowledge expected_links column —
    the two agree only if the engine actually parses anchors correctly.
    Pure per-doc map, zero shuffle."""
    from pdfredact_ray.functions.htmlx import extract_links
    from pdfredact_ray.sources.htmldocs import ensure_html_docs

    docs = rd.read_parquet(ensure_html_docs(sf_dir), columns=["doc_id", "html"])

    def links(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        out_id, out_idx, out_href = [], [], []
        for d, h in zip(ids, t.column("html").to_pylist()):
            for j, href in enumerate(extract_links(h)):
                out_id.append(int(d))
                out_idx.append(j)
                out_href.append(href)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "link_idx": pa.array(out_idx, pa.int32()),
                "href": pa.array(out_href, pa.string()),
            }
        )

    return docs.map_batches(links, batch_format="pyarrow")


def html_extract_redact(sf_dir: str) -> rd.Dataset:
    """Main-content extraction pipeline (the north-star HTML leg): synthetic
    HTML pages → DOM-heuristic boilerplate strip (HtmlExtractor actor pool)
    → fused rule redaction over the EXTRACTED text. Extraction and redaction
    compose as Dataset stages sharing the streaming executor. Hash-checked
    end to end: the generator stores construction-knowledge redaction ground
    truth (``expected_redacted`` / ``expected_n_redactions`` — a page's only
    sensitive material is what the generator injected) next to each page,
    the same sidecar pattern as ``expected_main`` and the turns corpus."""
    from pdfredact_ray.functions.rules import default_rules
    from pdfredact_ray.stages.detect import RuleMatcher

    # TWO fixed actor pools share this pipeline: size each to half the usual
    # pool so their sum still fits the cluster (two full-size fixed pools
    # can't all start on a small cluster and the executor stalls).
    pool = max(1, default_concurrency() // 2)
    extracted = _html_extracted(sf_dir, pool=pool)

    class _Redact:
        """Redact the extracted main text via RuleMatcher's public
        redact_texts composition API; emit a compact result schema."""

        def __init__(self):
            self.rm = RuleMatcher(
                rules=[r.to_dict() for r in default_rules()], mode="redact"
            )

        def __call__(self, t: pa.Table) -> pa.Table:
            red, _, nred = self.rm.redact_texts(t.column("text").to_pylist())
            # block-count diagnostics stay pytest territory (html_extract
            # tests); the driver-checked surface is the redacted text itself
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "main_text_redacted": pa.array(red, type=pa.string()),
                    "n_redactions": pa.array(nred, type=pa.int32()),
                }
            )

    return extracted.map_batches(_Redact, batch_format="pyarrow", concurrency=pool)


# ----------------------------------------------------------------- multimodal

def multimodal_decode(sf_dir: str) -> rd.Dataset:
    """Binary-image decode: REAL 24-bit BMP payloads (sources.binimg) through
    the header-parse + unpad + reorder decoder; the projected output
    (doc_id, width, height, n_bytes, checksum) is oracle-checked against the
    generator's stored decode ground truth. Small batches for big payloads —
    the 100 TB memory shape; the feature column (per-channel moments) is
    pytest-covered and projected out here so the SQL oracle is exact."""
    from pdfredact_ray.sources.binimg import ensure_images

    path = ensure_images(sf_dir)
    decoded = rd.read_parquet(path, columns=["doc_id", "payload"]).map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=default_concurrency(),
    )
    return decoded.map_batches(
        lambda t: t.select(["doc_id", "width", "height", "n_bytes", "checksum"]),
        batch_format="pyarrow",
    )


def multimodal_resize(sf_dir: str) -> rd.Dataset:
    """Image resize (decode -> nearest-neighbor 32x32 -> checksum):
    oracle-checked against the generator's independently-computed resized
    ground truth."""
    from pdfredact_ray.sources.binimg import ensure_images

    path = ensure_images(sf_dir)
    return rd.read_parquet(path, columns=["doc_id", "payload"]).map_batches(
        ImageResizer,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=default_concurrency(),
    )


def multimodal_frames(sf_dir: str) -> rd.Dataset:
    """Frame sampling over concatenated fixed-size pseudo-frames: every 4th
    frame's crc32 — oracle-checked against the generator's per-frame
    checksum list (unnest + stride filter)."""
    from pdfredact_ray.sources.binimg import ensure_videos

    path = ensure_videos(sf_dir)
    return rd.read_parquet(path, columns=["doc_id", "payload"]).map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=default_concurrency(),
    )


def multimodal_audio(sf_dir: str) -> rd.Dataset:
    """Audio decode + feature extraction: REAL RIFF/WAVE PCM16 payloads
    (sources.binimg.ensure_audio, written by the stdlib wave encoder)
    through the manual chunk-walk parser; integer waveform features (peak,
    rms_floor, duration) oracle-checked against the generator's pure-Python
    ground truth. Small batches for big binary payloads — the same 100 TB
    memory shape as the image stages."""
    from pdfredact_ray.sources.binimg import ensure_audio
    from pdfredact_ray.stages.multimodal import AudioDecoder

    path = ensure_audio(sf_dir)
    return rd.read_parquet(path, columns=["doc_id", "payload"]).map_batches(
        AudioDecoder,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=default_concurrency(),
    )


# ------------------------------------------------------------------- events

def _uw_runs(uid: np.ndarray, win: np.ndarray):
    """Sorted run detection over (user, window) pairs: returns (order,
    first-of-run mask, run ids) — the vectorized substitute for a 2-key
    np.unique (the pair doesn't pack into one int64: window epochs use the
    full range)."""
    order = np.lexsort((win, uid))
    u, w = uid[order], win[order]
    new = np.r_[True, (u[1:] != u[:-1]) | (w[1:] != w[:-1])]
    return order, new, np.cumsum(new) - 1


def _window_agg(keyed: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """Shared (user, window) aggregate: map-side partial combine collapses
    each batch to distinct (user, window, n, cents) rows tagged with a hash
    bucket, then ONE ``groupby(bucket)`` with a vectorized per-bucket final
    combine. Replaces ``groupby([user, window]).aggregate(...)``: Ray's
    sort-based aggregate pays a fixed micro-block cost that dwarfs these
    skinny partials, and its key count here is |users|×|windows| versus the
    fixed n_buckets groups of the bucket shape (same measured 3× as the
    revenue join combine). Input: (user_id, window_start, cents) rows."""

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        win = t.column("window_start").to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = t.column("cents").to_numpy()
        order, new, gid = _uw_runs(uid, win)
        n = np.bincount(gid).astype(np.int64)
        s = np.zeros(len(n), np.int64)
        np.add.at(s, gid, cents[order])
        sel = order[new]
        u_sel, w_sel = uid[sel], win[sel]
        bucket = (
            u_sel.astype(np.uint64) * np.uint64(2654435761) + w_sel.astype(np.uint64)
        ) % np.uint64(n_buckets)
        return pa.table(
            {
                "user_id": pa.array(u_sel, pa.int64()),
                "window_start": pa.array(w_sel, pa.timestamp("us")),
                "n_events": pa.array(n, pa.int64()),
                "sum_cents": pa.array(s, pa.int64()),
                "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return g
        uid = g.column("user_id").to_numpy()
        win = g.column("window_start").to_numpy().astype("datetime64[us]").astype(np.int64)
        order, new, gid = _uw_runs(uid, win)
        n = np.zeros(int(gid[-1]) + 1 if len(gid) else 0, np.int64)
        s = np.zeros_like(n)
        np.add.at(n, gid, g.column("n_events").to_numpy()[order])
        np.add.at(s, gid, g.column("sum_cents").to_numpy()[order])
        sel = order[new]
        return pa.table(
            {
                "user_id": pa.array(uid[sel], pa.int64()),
                "window_start": pa.array(win[sel], pa.timestamp("us")),
                "n_events": pa.array(n, pa.int64()),
                "sum_cents": pa.array(s, pa.int64()),
            }
        )

    return (
        keyed.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
    )


def events_tumbling_window(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window per user: vectorized window-key derivation in
    map_batches, then the shared bucketed (user, window) combine
    (``_window_agg``). Money sums use floor(value*100) int64 cents so the
    aggregate is order-independent (exact under any shuffle/combine order —
    float sums are not)."""
    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"])

    def keys(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        win = pc.floor_temporal(ts, unit="hour")
        cents = pc.cast(pc.floor(pc.multiply(batch.column("value"), 100.0)), pa.int64())
        return pa.table({"user_id": batch.column("user_id"), "window_start": win, "cents": cents})

    return _window_agg(ev.map_batches(keys, batch_format="pyarrow"))


def sessionize(ev: rd.Dataset, gap_minutes: int = 30) -> rd.Dataset:
    """Skew-hardened two-stage sessionization (a new session starts when the
    gap to the previous event exceeds the threshold).

    Stage 1 groups by (user_id, day): each sub-group computes a tiny partial
    (n_events, breaks-within, first/last ts) — a WHALE user's events split
    across days, so no single group ever materializes their full history
    (the round-1 single-group-per-user shape did).
    Stage 2 groups the per-day partials by user (rows = active days, not
    events) and stitches: a break also falls between consecutive sub-groups
    whose boundary gap exceeds the threshold. Exactly equal to the
    single-sweep lag semantics because splitting a sorted sequence at day
    boundaries partitions the set of gaps."""
    gap_us = gap_minutes * 60 * 1_000_000

    def day_key(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "day": pc.floor_temporal(batch.column("ts"), unit="day"),
                "ts": batch.column("ts"),
            }
        )

    def day_partial(group: pa.Table) -> pa.Table:
        ts = np.sort(group.column("ts").cast(pa.int64()).to_numpy())
        breaks = int((np.diff(ts) > gap_us).sum()) if len(ts) > 1 else 0
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "n_events": pa.array([len(ts)], pa.int64()),
                "n_breaks": pa.array([breaks], pa.int64()),
                "first_ts": pa.array([int(ts[0])], pa.int64()),
                "last_ts": pa.array([int(ts[-1])], pa.int64()),
            }
        )

    def stitch(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column("first_ts").to_numpy())
        first = group.column("first_ts").to_numpy()[order]
        last = group.column("last_ts").to_numpy()[order]
        boundary_breaks = int((first[1:] - last[:-1] > gap_us).sum())
        n_breaks = int(pc.sum(group.column("n_breaks")).as_py()) + boundary_breaks
        n_events = int(pc.sum(group.column("n_events")).as_py())
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "n_sessions": pa.array([1 + n_breaks], pa.int64()),
                "n_events": pa.array([n_events], pa.int64()),
            }
        )

    part = (
        ev.map_batches(day_key, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .map_groups(day_partial, batch_format="pyarrow")
    )
    return part.groupby("user_id").map_groups(stitch, batch_format="pyarrow")


def events_hopping_window(sf_dir: str) -> rd.Dataset:
    """Hopping window (1h length, 30min hop): each event replicates into
    the 2 windows covering it INSIDE map_batches (vectorized key
    derivation + table concat — the flat-map stays on the map side, only
    distinct (user, window, n, cents) partials shuffle), then the shared
    bucketed combine (``_window_agg``). Money as floor-cents int64 for
    order-independent exactness."""
    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"])
    hop_us = 30 * 60 * 1_000_000

    def keys(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        base = pc.floor_temporal(ts, multiple=30, unit="minute")
        prev = pc.cast(
            pc.subtract(pc.cast(base, pa.int64()), hop_us), pa.timestamp("us")
        )
        cents = pc.cast(pc.floor(pc.multiply(batch.column("value"), 100.0)), pa.int64())
        one = pa.table(
            {"user_id": batch.column("user_id"), "window_start": base, "cents": cents}
        )
        two = pa.table(
            {"user_id": batch.column("user_id"), "window_start": prev, "cents": cents}
        )
        return pa.concat_tables([one, two])

    return _window_agg(ev.map_batches(keys, batch_format="pyarrow"))


def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])
    return sessionize(ev, gap_minutes=gap_minutes)


# ------------------------------------------------------------------ lineitem

def lineitem_agg(sf_dir: str) -> rd.Dataset:
    """TPC-H-q1-style pricing summary with order-independent integer sums
    (quantities are integral; prices aggregated as floor-cents)."""
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        qty = pc.cast(batch.column("l_quantity"), pa.int64())
        cents = pc.cast(pc.floor(pc.multiply(batch.column("l_extendedprice"), 100.0)), pa.int64())
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": qty,
                "price_cents": cents,
            }
        )

    agg = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("qty"), Sum("price_cents"), Count())
    )
    return agg.map_batches(
        lambda t: t.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "n_rows"]
        ),
        batch_format="pyarrow",
    )


# Edge-count gate for driver-side union-find over near-dup pairs: the pair
# list is O(near-dups), so one machine handles millions of edges in
# milliseconds; past the gate the alternating large-star/small-star rounds
# (stages/dedup.py) take over — the shape for crawl-scale dup clusters.
CC_DRIVER_MAX_EDGES = int(os.environ.get("GRAFT_CC_DRIVER_MAX_EDGES", 5_000_000))


def _noncanonical_ids(labels) -> pa.Array:
    """Sorted drop-id array (doc_id != component) from a (doc_id, component)
    label table OR Dataset. The Dataset path (the above-gate CC output)
    filters non-canonicals DISTRIBUTEDLY and collects only the surviving
    skinny id column — the driver never sees the full label set. The drop
    list itself must land driver-side regardless: every downstream filter
    broadcasts it via ``ray.put`` into a vectorized anti-join (at dup rates
    where even the drop list outgrows broadcast, the filter becomes a
    Dataset hash-join on doc_id — the minhash-verify join shape)."""
    if isinstance(labels, pa.Table):
        d = labels.column("doc_id").to_numpy().astype(np.int64)
        c = labels.column("component").to_numpy().astype(np.int64)
        return pa.array(np.sort(d[d != c]), type=pa.int64())

    def _drops(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        keep = pc.invert(pc.equal(t.column("doc_id"), t.column("component")))
        return pa.table({"doc_id": t.column("doc_id").filter(keep)})

    tbl = _collect(labels.map_batches(_drops, batch_format="pyarrow"))
    if tbl is None or tbl.num_rows == 0:
        return pa.array([], type=pa.int64())
    return pa.array(
        np.sort(tbl.column("doc_id").to_numpy().astype(np.int64)), type=pa.int64()
    )


def near_dup_components(sf_dir: str, threshold: float = 0.5):
    """Near-dup clustering: MinHash+LSH verified pairs -> connected
    components; (doc_id, component) for every doc in at least one pair,
    component = min member id. The composition that turns pairwise
    near-dups into dedup GROUPS (a pair list alone can't drive a filter —
    transitive chains a~b~c must collapse to one group).

    Returns a pa.Table below ``CC_DRIVER_MAX_EDGES`` (the pair list is tiny
    — one union-find pass) and a Ray DATASET above it (large-star/small-star
    labels never land on the driver)."""
    from pdfredact_ray.stages.dedup import (
        connected_components_distributed,
        union_find_components,
    )

    pairs = minhash_near_dup_pairs(sf_dir, threshold)
    a = pairs.column("doc_a").to_numpy().astype(np.int64)
    b = pairs.column("doc_b").to_numpy().astype(np.int64)
    if pairs.num_rows <= CC_DRIVER_MAX_EDGES:
        return union_find_components(a, b)
    return connected_components_distributed(pairs)


def near_dup_dedup_filter(sf_dir: str, threshold: float = 0.5) -> rd.Dataset:
    """Near-dup dedup FILTER: documents minus non-canonical members of each
    near-dup component (keep the min doc_id per component). Same broadcast
    discipline as ``dedup_filter``: the DROP set is O(near-dups); the
    corpus streams through one task-based vectorized anti-join."""
    drop_ids = _noncanonical_ids(near_dup_components(sf_dir, threshold))
    docs = _docs(sf_dir, ["doc_id", "text"])
    if len(drop_ids) == 0:
        return docs
    return docs.map_batches(
        _semi_join,
        fn_args=(ray.put(drop_ids), _doc_id_key),
        fn_kwargs={"invert": True},
        batch_format="pyarrow",
    )


# Fixed-point k-means: embedding components quantized to a 2^20 integer
# grid up front, ALL arithmetic exact int64 after that — the same
# determinism discipline as the int-cents money sums (float partial sums
# are order-dependent under distributed combining; integer sums are not),
# and what makes an iterative ML algorithm bit-exactly SQL-oracle-checkable.
KMEANS_SCALE = np.int64(1 << 20)


def _quantize_embeddings(m: np.ndarray) -> np.ndarray:
    # round-half-up (floor(x*S + 0.5)) — mirrored verbatim in the SQL
    # oracle; np.round's banker's rounding is NOT (differs on exact .5)
    return np.floor(m * float(KMEANS_SCALE) + 0.5).astype(np.int64)


def kmeans_clusters(sf_dir: str, k: int = 8, iters: int = 2) -> rd.Dataset:
    """Lloyd's k-means over the embeddings table, fixed-point and fully
    deterministic: init centroids = the quantized vectors of the k smallest
    vec_ids, then ``iters`` assignment rounds with an integer centroid
    update (elementwise floor(sum/n), empty cluster keeps its centroid)
    between them; returns the final (vec_id, cluster) assignment.

    Scale shape per round: centroids broadcast via ``ray.put`` (k × dim
    ints); each batch computes assignments with one integer GEMM and
    emits only k partial rows (per-cluster dim-sums + count) — the driver
    combines O(k · batches) partials, never the vectors. The assignment
    pass of the LAST round is the output pass (no extra sweep)."""
    from pdfredact_ray.stages.embed import _to_matrix

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    # init: global min-k by vec_id via per-batch partial top-k (k rows per
    # batch cross the wire, never the table)
    def initk(t: pa.Table) -> pa.Table:
        vid = t.column("vec_id").to_numpy()
        order = np.argsort(vid)[:k]
        return t.take(pa.array(order))

    seed_tbl = _collect(emb.map_batches(initk, batch_format="pyarrow"))
    vid = seed_tbl.column("vec_id").to_numpy()
    order = np.argsort(vid)[:k]
    cents = _quantize_embeddings(_to_matrix(seed_tbl.column("embedding"))[order])

    def assign(q: np.ndarray, c: np.ndarray) -> np.ndarray:
        d2 = (
            (q * q).sum(axis=1)[:, None]
            - 2 * (q @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        return np.argmin(d2, axis=1)  # first min -> smallest cluster id

    def partials(t: pa.Table, cref) -> pa.Table:
        c = cref if isinstance(cref, np.ndarray) else ray.get(cref)
        q = _quantize_embeddings(_to_matrix(t.column("embedding")))
        a = assign(q, c)
        js, sums, ns = [], [], []
        for j in np.unique(a):
            m = a == j
            js.append(int(j))
            sums.append(q[m].sum(axis=0).tolist())
            ns.append(int(m.sum()))
        return pa.table(
            {
                "j": pa.array(js, pa.int64()),
                "sums": pa.array(sums, pa.list_(pa.int64())),
                "n": pa.array(ns, pa.int64()),
            }
        )

    for _ in range(iters - 1):
        part = _collect(
            emb.map_batches(partials, fn_args=(ray.put(cents),), batch_format="pyarrow")
        )
        dim = cents.shape[1]
        sums = np.zeros((k, dim), dtype=np.int64)
        ns = np.zeros(k, dtype=np.int64)
        flat = np.asarray(part.column("sums").combine_chunks().flatten().to_numpy(), np.int64)
        mat = flat.reshape(part.num_rows, dim)
        for row, j in enumerate(part.column("j").to_numpy()):
            sums[j] += mat[row]
            ns[j] += int(part.column("n")[row].as_py())
        nz = ns > 0
        new_c = cents.copy()
        new_c[nz] = sums[nz] // ns[nz][:, None]  # floor division, exact
        cents = new_c

    def assign_out(t: pa.Table, cref) -> pa.Table:
        c = cref if isinstance(cref, np.ndarray) else ray.get(cref)
        q = _quantize_embeddings(_to_matrix(t.column("embedding")))
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "cluster": pa.array(assign(q, c).astype(np.int64), pa.int64()),
            }
        )

    return emb.map_batches(assign_out, fn_args=(ray.put(cents),), batch_format="pyarrow")


_CLEAN_LANGID: Optional[LangId] = None


def _clean_batch(
    t: pa.Table, drop_ref, min_stop: float, max_digit: float, lang: str
) -> pa.Table:
    """Task-based stage for ``corpus_clean``: one streaming pass that applies
    the broadcast drop set (exact + near-dup non-canonicals) with a
    vectorized anti-join, then quality gates (Arrow kernel ratios) and the
    marker language vote to the survivors.

    A plain task, not a fixed actor pool: the only per-task setup is one
    zero-copy object-store read of the drop set plus the tiny LangId marker
    tables (cached per worker process) — the round-2 lesson that pool
    startup (seconds for a 24-actor pool) dwarfs trivial setup on one-shot
    filter stages."""
    global _CLEAN_LANGID
    if _CLEAN_LANGID is None:
        _CLEAN_LANGID = LangId()
    drop = drop_ref if isinstance(drop_ref, pa.Array) else ray.get(drop_ref)
    t = t.filter(pc.invert(pc.is_in(_doc_id_key(t), value_set=drop)))
    if t.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    q = quality_scores(t)
    keep = pc.and_(
        pc.greater_equal(q.column("stopword_ratio"), min_stop),
        pc.less_equal(q.column("digit_ratio"), max_digit),
    )
    t = t.filter(keep)
    if t.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    pred = _CLEAN_LANGID(t).column("pred_lang")
    return pa.table({"doc_id": t.filter(pc.equal(pred, lang)).column("doc_id")})


def corpus_clean(
    sf_dir: str,
    min_stopword_ratio: float = 0.05,
    max_digit_ratio: float = 0.30,
    lang: str = "en",
) -> rd.Dataset:
    """The end-to-end corpus-cleaning composition a training-data pipeline
    actually runs: documents minus exact duplicates (keep min doc_id per
    digest), minus near-dup component non-canonicals (MinHash+LSH →
    connected components), minus low-quality docs (stopword ratio below /
    digit ratio above threshold), minus non-target-language docs (marker
    vote). Returns the kept doc_ids.

    Scale shape: the two dedup precomputations each pull only O(dups) ids
    to the driver; their UNION broadcasts once (``ray.put``); the corpus
    then streams through ONE actor-pool pass that applies all four gates —
    no extra sweep per filter, no shuffle at all in the filtering pass."""
    exact_drop = set(exact_dup_ids(sf_dir).to_pylist())
    near_drop = set(_noncanonical_ids(near_dup_components(sf_dir)).to_pylist())
    drop = pa.array(sorted(exact_drop | near_drop), type=pa.int64())
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _clean_batch,
        fn_args=(ray.put(drop), min_stopword_ratio, max_digit_ratio, lang),
        batch_format="pyarrow",
    )
