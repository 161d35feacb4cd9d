"""Corpus-operator tests at sf0.001: dedup family, similarity search,
text analysis, multimodal plumbing, windowed events — each checked against
an independent in-process recompute (numpy / pandas / duckdb), mirroring
the driver's oracle comparison for the non-SQL-expressible kernels."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

SF = "/root/testdata/sf0.001"


def _pdf(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else res


@pytest.fixture(scope="module")
def docs():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


@pytest.fixture(scope="module")
def embs():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    M = np.stack([np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()])
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, M / norms


def test_dedup_exact_keeps_min_doc_per_digest(ray_session, docs):
    from pdfredact_ray.pipelines.corpus import dedup_exact

    got = _pdf(dedup_exact(SF)).sort_values("digest").reset_index(drop=True)
    import hashlib

    docs = docs.assign(digest=[hashlib.md5(t.encode()).hexdigest() for t in docs.text])
    want = (
        docs.groupby("digest", as_index=False)["doc_id"].min().sort_values("digest").reset_index(drop=True)
    )
    assert got.digest.tolist() == want.digest.tolist()
    assert got.doc_id.tolist() == want.doc_id.tolist()


def test_minhash_pairs_are_true_near_dups_and_find_exact_dups(ray_session, docs):
    from pdfredact_ray.pipelines.corpus import minhash_near_dup_pairs
    from pdfredact_ray.stages.dedup import jaccard, word_shingles

    pairs = minhash_near_dup_pairs(SF, threshold=0.5).to_pandas()
    texts = dict(zip(docs.doc_id, docs.text))
    # every verified pair really clears the Jaccard threshold
    for a, b, j in pairs.itertuples(index=False):
        true_j = jaccard(word_shingles(texts[a]), word_shingles(texts[b]))
        assert true_j >= 0.5 and abs(true_j - j) < 1e-12
    # exact duplicates (jaccard 1.0) can never be missed by MinHash LSH
    by_text = docs.groupby("text")["doc_id"].agg(list)
    exact = {
        (min(a, b), max(a, b))
        for ids in by_text
        if len(ids) > 1
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
    }
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert exact <= got


def test_ngram_jaccard_matches_bruteforce(ray_session, docs):
    from pdfredact_ray.pipelines.corpus import ngram_jaccard_pairs
    from pdfredact_ray.stages.dedup import jaccard, word_shingles

    got = _pdf(ngram_jaccard_pairs(SF, threshold=0.5, k=3))
    got_pairs = set(zip(got.doc_a, got.doc_b))
    sub = docs.sort_values("doc_id").head(120)  # brute force O(n²) on a slice
    sh = {d: word_shingles(t, 3) for d, t in zip(sub.doc_id, sub.text)}
    ids = sub.doc_id.tolist()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            expect = jaccard(sh[a], sh[b]) >= 0.5
            assert ((a, b) in got_pairs) == expect, (a, b)


def test_decontaminate_matches_set_arithmetic(ray_session, docs):
    from pdfredact_ray.pipelines.corpus import decontaminate
    from pdfredact_ray.stages.dedup import word_shingles

    got = _pdf(decontaminate(SF)).set_index("doc_id").sort_index()
    ev = set()
    for r in docs.itertuples(index=False):
        if int(r.doc_id) % 50 == 0:
            ev |= word_shingles(r.text, 3)
    for r in docs.itertuples(index=False):
        d = int(r.doc_id)
        if d % 50 == 0:
            assert d not in got.index
            continue
        n = len(word_shingles(r.text, 3) & ev)
        assert int(got.loc[d, "n_overlap"]) == n
        assert bool(got.loc[d, "contaminated"]) == (n >= 2)
    assert got.contaminated.any()  # duplicate-heavy corpus overlaps the eval set


def test_conv_assemble_matches_pandas(ray_session):
    from pdfredact_ray.pipelines.turnqueries import conv_assemble
    from pdfredact_ray.sources.turns import ensure_turns

    got = _pdf(conv_assemble(SF)).set_index("conv_id").sort_index()
    src = pq.read_table(ensure_turns(SF)).to_pandas().sort_values(["conv_id", "turn_idx"])
    want = src.groupby("conv_id").apply(
        lambda g: "\n".join(f"{r}: {t}" for r, t in zip(g.role, g.text)),
        include_groups=False,
    )
    assert got.conv_text.to_dict() == want.to_dict()
    assert got.n_turns.to_dict() == src.groupby("conv_id").size().astype(int).to_dict()


def test_conv_assemble_whale_conversation(ray_session, monkeypatch):
    """A 10^5-turn conversation assembles correctly through the two-stage
    path: with the stage-1 bound shrunk, no map_groups group ever holds the
    whole conversation — correctness comes from bucket-ordered stitching."""
    import ray.data as rd

    import pdfredact_ray.pipelines.turnqueries as TQ

    monkeypatch.setattr(TQ, "_CONV_BUCKET", 256)
    n = 100_000
    tbl = pa.table(
        {
            "conv_id": pa.array(["whale"] * n + ["c2", "c2"]),
            "turn_idx": pa.array(list(range(n)) + [1, 0], pa.int32()),
            "role": pa.array(["user" if i % 2 == 0 else "assistant" for i in range(n)] + ["user", "user"]),
            "text": pa.array([f"t{i}" for i in range(n)] + ["b", "a"]),
        }
    )
    out = _pdf(TQ.assemble_conversations(rd.from_arrow(tbl))).set_index("conv_id")
    assert int(out.loc["whale", "n_turns"]) == n
    want = "\n".join(
        f"{'user' if i % 2 == 0 else 'assistant'}: t{i}" for i in range(n)
    )
    assert out.loc["whale", "conv_text"] == want
    assert out.loc["c2", "conv_text"] == "user: a\nuser: b"


def test_doc_split_deterministic_and_balanced(ray_session):
    from pdfredact_ray.pipelines.corpus import doc_split

    a = _pdf(doc_split(SF)).sort_values("doc_id").reset_index(drop=True)
    b = _pdf(doc_split(SF)).sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    frac = (a.split == "train").mean()
    assert 0.8 < frac < 0.97  # ~90% by construction
    assert ((a.bucket < 90) == (a.split == "train")).all()


def test_dedup_filter_keeps_canonical_rows(ray_session, docs):
    from pdfredact_ray.pipelines.corpus import dedup_filter

    got = _pdf(dedup_filter(SF)).sort_values("doc_id").reset_index(drop=True)
    keepers = docs.groupby("text")["doc_id"].min().sort_values().tolist()
    assert got.doc_id.tolist() == sorted(keepers)
    # surviving rows carry their original text
    src = docs.set_index("doc_id")["text"]
    assert all(src[d] == t for d, t in zip(got.doc_id, got.text))


def test_top_tokens_matches_counter(ray_session, docs):
    from collections import Counter

    from pdfredact_ray.pipelines.corpus import top_tokens

    got = top_tokens(SF, k=20)
    c: Counter = Counter()
    for t in docs.text:
        c.update(t.split())
    want = sorted(c.items(), key=lambda x: (-x[1], x[0]))[:20]
    assert list(zip(got.column("token").to_pylist(), got.column("n").to_pylist())) == want


def test_simhash_signatures_deterministic_and_duplicate_consistent(ray_session, docs):
    from pdfredact_ray.pipelines.corpus import simhash_signatures

    got = _pdf(simhash_signatures(SF)).set_index("doc_id")
    assert len(got) == len(docs)
    sig = dict(zip(got.index, got.simhash))
    # identical text => identical signature
    for _, ids in docs.groupby("text")["doc_id"].agg(list).items():
        assert len({sig[d] for d in ids}) == 1
    # signatures are real majority votes, not near-all-ones (the uint64
    # vote-underflow bug the SQL oracle caught set every non-tie bit)
    ones = [bin(s).count("1") for s in got.simhash]
    assert 8 < sum(ones) / len(ones) < 56


def test_crc32_rows_matches_zlib():
    import zlib

    from pdfredact_ray.stages.dedup import crc32_rows

    rng = np.random.default_rng(5)
    for w in (1, 4, 32, 57):
        rows = rng.integers(0, 256, size=(200, w)).astype(np.uint8)
        got = crc32_rows(rows)
        want = [zlib.crc32(rows[i].tobytes()) for i in range(rows.shape[0])]
        assert got.tolist() == want


def test_simhash_batch_equals_per_doc_reference():
    """The vectorized batch kernel (unique-token md5 cache + reduceat vote
    sums) must reproduce the scalar per-doc path bit for bit, including
    empty docs, repeated tokens, and the bit-63 mask."""
    from pdfredact_ray.stages.dedup import SimHasher

    texts = [
        "the quick brown fox",
        "",
        "a a a a b",  # duplicate occurrences each vote
        "ze ZE Ze zE",  # case-distinct tokens
        " \t ",  # whitespace-only -> no tokens
        "one-token",
        ("tok%d " % 7) * 300,  # long doc crossing the reduceat chunk target
    ]
    sh = SimHasher()
    tbl = sh(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    ref = SimHasher()
    for i, text in enumerate(texts):
        sim, bands = ref.signature_ref(text)
        assert tbl.column("simhash")[i].as_py() == sim, text
        for b in range(4):
            assert tbl.column(f"band{b}")[i].as_py() == bands[b], (text, b)
    # cache survives across batches and stays bounded
    sh.CACHE_MAX = 8
    sh2 = SimHasher()
    sh2.CACHE_MAX = 8
    big = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array([f"w{i} w{i+1} shared" for i in range(30)], pa.string()),
        }
    )
    out1 = sh2(big)
    assert len(sh2._hcache) <= 8
    assert out1.equals(SimHasher()(big))


def test_simhash_vote_semantics():
    """Hand-computed majority vote on a 3-token doc."""
    from pdfredact_ray.stages.dedup import SimHasher

    toks = ["alpha", "beta", "gamma"]
    h = [SimHasher.token_hash(t) for t in toks]
    expect = 0
    for b in range(64):
        votes = sum(1 if (x >> b) & 1 else -1 for x in h)
        if votes > 0:
            expect |= 1 << b
    expect &= 0x7FFFFFFFFFFFFFFF
    tbl = SimHasher()(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": [" ".join(toks)]})
    )
    assert tbl.column("simhash").to_pylist() == [expect]


def test_embed_cosine_near_dup_matches_numpy(ray_session, embs):
    from pdfredact_ray.pipelines.corpus import embed_cosine_near_dup

    ids, M = embs
    got = _pdf(embed_cosine_near_dup(SF, threshold=0.4))
    sims = M @ M.T
    ai, bi = np.nonzero((sims >= 0.4) & (ids[:, None] < ids[None, :]))
    want = sorted(zip(ids[ai].tolist(), ids[bi].tolist()))
    assert list(zip(got.id_a, got.id_b)) == want


def test_ann_bruteforce_matches_numpy_topk(ray_session, embs):
    from pdfredact_ray.pipelines.corpus import ann_topk_bruteforce

    ids, M = embs
    got = _pdf(ann_topk_bruteforce(SF, k=10, n_queries=4))
    for qid in range(4):
        q = M[ids == qid][0]
        sims = M @ q
        order = sorted(zip(-sims, ids))[:10]  # sim desc, vec_id asc tie-break
        want = [int(v) for _, v in order]
        g = got[got.query_id == qid].sort_values("rank")
        assert g.vec_id.tolist() == want


def test_ann_ivf_recall_against_bruteforce(ray_session, embs):
    from pdfredact_ray.pipelines.corpus import ann_topk_ivf

    ids, M = embs
    got = _pdf(ann_topk_ivf(SF, k=10, n_queries=4, n_cells=8, nprobe=4))
    hits = total = 0
    for qid in range(4):
        q = M[ids == qid][0]
        true = set(ids[np.argsort(-(M @ q))[:10]].tolist())
        approx = set(got[got.query_id == qid].vec_id.tolist())
        hits += len(true & approx)
        total += 10
    assert hits / total >= 0.5  # nprobe=4 of 8 cells: recall well above chance


def test_ann_recall_meets_bench_floors(ray_session):
    """The bench's hard quality floors (bench.py raises below them) must
    hold at the bench-default parameters on the sf0.01 corpus — so a
    recall regression fails HERE before it fails a 10-minute bench run."""
    from bench import RECALL_FLOOR_IVF, RECALL_FLOOR_LSH
    from pdfredact_ray.pipelines.corpus import (
        ann_topk_bruteforce,
        ann_topk_ivf,
        ann_topk_lsh,
    )

    def pairs(ds):
        df = _pdf(ds)
        return set(zip(df["query_id"], df["vec_id"]))

    bf = pairs(ann_topk_bruteforce(SF))
    assert bf
    ivf_recall = len(bf & pairs(ann_topk_ivf(SF))) / len(bf)
    lsh_recall = len(bf & pairs(ann_topk_lsh(SF))) / len(bf)
    assert ivf_recall >= RECALL_FLOOR_IVF, ivf_recall
    assert lsh_recall >= RECALL_FLOOR_LSH, lsh_recall


def test_ann_ivf_multi_assign_recall_and_exhaustive_equality(ray_session, embs):
    """n_assign=2 (IVF spill): default params hold recall >= 0.8 on the
    weakly-clustered corpus, and probing EVERY cell must reproduce brute
    force exactly whatever the assignment multiplicity."""
    from pdfredact_ray.pipelines.corpus import ann_topk_ivf

    ids, M = embs
    got = _pdf(ann_topk_ivf(SF, k=10, n_queries=4))  # defaults: nprobe=6, n_assign=2
    hits = total = 0
    for qid in range(4):
        q = M[ids == qid][0]
        true = set(ids[np.argsort(-(M @ q))[:10]].tolist())
        hits += len(true & set(got[got.query_id == qid].vec_id.tolist()))
        total += 10
    assert hits / total >= 0.8

    full = _pdf(ann_topk_ivf(SF, k=10, n_queries=4, n_cells=8, nprobe=8, n_assign=2))
    for qid in range(4):
        q = M[ids == qid][0]
        order = sorted(zip(-(M @ q), ids))[:10]
        want = [int(v) for _, v in order]
        g = full[full.query_id == qid].sort_values("rank")
        assert g.vec_id.tolist() == want


def test_doc_langid_matches_reference_heuristic(ray_session, docs):
    from pdfredact_ray.pipelines.corpus import doc_langid
    from pdfredact_ray.stages.textops import LangId

    got = _pdf(doc_langid(SF)).set_index("doc_id")
    oracle = LangId()
    import pyarrow as _pa

    want = oracle(
        pa.table({"doc_id": docs.doc_id.tolist(), "text": docs.text.tolist()})
    ).to_pandas().set_index("doc_id")
    assert got.pred_lang.to_dict() == want.pred_lang.to_dict()


def test_rolling_fingerprints_deterministic(ray_session, docs):
    from pdfredact_ray.pipelines.corpus import doc_rolling_fingerprints
    from pdfredact_ray.stages.textops import rolling_fingerprints

    got = _pdf(doc_rolling_fingerprints(SF)).set_index("doc_id")
    want = rolling_fingerprints(
        pa.table({"doc_id": docs.doc_id.tolist(), "text": docs.text.tolist()})
    ).to_pandas().set_index("doc_id")
    assert got.rollhash.to_dict() == want.rollhash.to_dict()


def test_multimodal_decode_matches_ground_truth(ray_session):
    """The REAL BMP decode path: the pipeline's decoded dims/checksums must
    equal the generator's stored decode ground truth (wrong unpadding, row
    order, or channel order all fail the crc32)."""
    from pdfredact_ray.pipelines.corpus import multimodal_decode, multimodal_frames
    from pdfredact_ray.sources.binimg import ensure_images, ensure_videos

    a = _pdf(multimodal_decode(SF)).sort_values("doc_id").reset_index(drop=True)
    truth = (
        pq.read_table(ensure_images(SF))
        .select(["doc_id", "width", "height", "n_bytes", "checksum"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a[truth.columns.tolist()].equals(truth) and len(a) == len(truth) > 0

    f = _pdf(multimodal_frames(SF)).sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
    vids = pq.read_table(ensure_videos(SF)).to_pandas()
    want = [
        (int(r.doc_id), fi, cs)
        for r in vids.itertuples(index=False)
        for fi, cs in enumerate(r.frame_checksums)
        if fi % 4 == 0
    ]
    got = list(zip(f.doc_id.astype(int), f.frame_idx.astype(int), f.checksum.astype(int)))
    assert sorted(got) == sorted(want)


def test_multimodal_resize_matches_independent_reference(ray_session):
    """Numpy fancy-index resize vs the generator's pure-Python loop."""
    from pdfredact_ray.pipelines.corpus import multimodal_resize
    from pdfredact_ray.sources.binimg import ensure_images

    got = _pdf(multimodal_resize(SF)).sort_values("doc_id").reset_index(drop=True)
    truth = pq.read_table(ensure_images(SF)).to_pandas().sort_values("doc_id")
    assert (got.width == 32).all() and (got.height == 32).all()
    assert got.checksum.tolist() == truth.resized_checksum.tolist()


def test_bpe_token_counts_matches_duckdb_re2(ray_session, docs):
    """Arrow count_substring_regex and DuckDB regexp_extract_all run the
    same RE2 engine on the same pattern — counts must agree per doc."""
    import duckdb

    from pdfredact_ray.pipelines.corpus import doc_bpe_token_counts
    from pdfredact_ray.stages.textops import BPE_TOKEN_RE

    got = _pdf(doc_bpe_token_counts(SF)).set_index("doc_id").n_bpe_tokens.to_dict()
    con = duckdb.connect()
    for d, text in zip(docs.doc_id, docs.text):
        want = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [text, BPE_TOKEN_RE]
        ).fetchone()[0]
        assert got[int(d)] == want, d
    # hand-checked shape: contraction + word + digits + punct + spaces
    from pdfredact_ray.stages.textops import bpe_token_counts

    t = bpe_token_counts(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["it's 42 ok!!  x"]})
    )
    # ["it", "'s", " 42", " ok", "!!", "  ", "x"]
    assert t.column("n_bpe_tokens").to_pylist() == [7]


def test_bmp_codec_roundtrip():
    import numpy as np

    from pdfredact_ray.sources.binimg import encode_bmp
    from pdfredact_ray.stages.multimodal import decode_bmp

    rng = np.random.default_rng(7)
    for w, h in ((1, 1), (2, 3), (5, 4), (64, 17)):  # odd widths hit padding
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        w2, h2, out = decode_bmp(encode_bmp(px))
        assert (w2, h2) == (w, h)
        assert np.array_equal(out, px)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_bmp(b"not a bmp at all" * 10)
    with _pytest.raises(ValueError):
        decode_bmp(encode_bmp(rng.integers(0, 256, (4, 4, 3), dtype=np.uint8))[:30])


def test_events_sessionize_matches_pandas(ray_session):
    from pdfredact_ray.pipelines.corpus import events_sessionize

    got = _pdf(events_sessionize(SF)).set_index("user_id").sort_index()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas().sort_values(["user_id", "ts"])
    brk = (
        ev.groupby("user_id")["ts"].diff() > pd.Timedelta(minutes=30)
    ).groupby(ev.user_id).sum()
    n = ev.groupby("user_id").size()
    assert got.n_sessions.to_dict() == (brk + 1).astype(int).to_dict()
    assert got.n_events.to_dict() == n.astype(int).to_dict()


def test_embed_cosine_bucketed_equals_exact(ray_session):
    """The IVF-bucketed near-dup scale path must reproduce the exact
    broadcast-GEMM pair set on the test corpus (VERDICT round-1 #6: the
    exact path must not be the unconditional default)."""
    from pdfredact_ray.pipelines.corpus import embed_cosine_near_dup

    exact = _pdf(embed_cosine_near_dup(SF, bucketed=False)).reset_index(drop=True)
    bucketed = _pdf(embed_cosine_near_dup(SF, bucketed=True)).reset_index(drop=True)
    assert len(exact) > 0
    assert exact.equals(bucketed)


def test_hopping_window_covers_each_event_twice(ray_session):
    from pdfredact_ray.pipelines.corpus import events_hopping_window, events_tumbling_window

    hop = _pdf(events_hopping_window(SF))
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    # every event lands in exactly 2 windows
    assert hop.n_events.sum() == 2 * len(ev)
    # per-user totals double the tumbling mass as well (cents conserved)
    tum = _pdf(events_tumbling_window(SF))
    assert hop.sum_cents.sum() == 2 * tum.sum_cents.sum()
    # spot-check one (user, window): count via pandas
    row = hop.sort_values(["user_id", "window_start"]).iloc[len(hop) // 2]
    lo = row.window_start
    hi = lo + pd.Timedelta(hours=1)
    sub = ev[(ev.user_id == row.user_id) & (ev.ts >= lo) & (ev.ts < hi)]
    assert row.n_events == len(sub)


def test_sessionize_whale_user(ray_session):
    """One user with 1M events: the two-stage (user, day) sub-grouping must
    process it without a single per-user group materializing all events, and
    the stitched session count must equal the single-sweep lag semantics."""
    import ray.data as rd

    from pdfredact_ray.pipelines.corpus import sessionize

    rng = np.random.default_rng(3)
    n = 1_000_000
    gaps = rng.integers(1, 120, size=n).astype(np.int64)
    big = rng.random(n) < 0.0005
    gaps = np.where(big, 2 * 3600, gaps)  # sprinkled 2h gaps -> session breaks
    ts = np.cumsum(gaps) * 1_000_000  # µs since epoch
    tbl = pa.table(
        {
            "user_id": pa.array(np.zeros(n, dtype=np.int64)),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
        }
    )
    out = sessionize(rd.from_arrow(tbl)).to_pandas()
    expect_breaks = int((np.diff(np.sort(ts)) > 30 * 60 * 1_000_000).sum())
    assert len(out) == 1
    assert int(out.n_sessions.iloc[0]) == 1 + expect_breaks
    assert int(out.n_events.iloc[0]) == n


def test_minhash_driver_and_distributed_paths_agree(ray_session):
    import pdfredact_ray.pipelines.corpus as cc

    fast = cc.minhash_near_dup_pairs(SF, threshold=0.5)
    saved = cc.DRIVER_BUCKET_MAX_ROWS
    try:
        cc.DRIVER_BUCKET_MAX_ROWS = 0  # force the distributed groupby path
        dist = cc.minhash_near_dup_pairs(SF, threshold=0.5)
    finally:
        cc.DRIVER_BUCKET_MAX_ROWS = saved
    assert fast.equals(dist)


def test_sharded_turns_generation(ray_session, tmp_path):
    from pdfredact_ray.sources.turns import ensure_turns_sharded
    import pyarrow.dataset as pads

    p1 = ensure_turns_sharded("shardtest", 2000, n_shards=4, base_dir=str(tmp_path / "a"))
    p2 = ensure_turns_sharded("shardtest", 2000, n_shards=4, base_dir=str(tmp_path / "b"))
    t1 = pads.dataset(p1, format="parquet").to_table()
    t2 = pads.dataset(p2, format="parquet").to_table()
    assert t1.num_rows == 2000
    # deterministic across regenerations
    assert t1.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]).equals(
        t2.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    )
    # shard-unique conv prefixes: no conv id can span two shards
    prefixes = {c.split("-")[0] for c in t1.column("conv_id").to_pylist()}
    assert prefixes == {"c0000", "c0001", "c0002", "c0003"}


def test_minhash_bucket_cap_unit():
    """_buckets_to_pairs surfaces truncation: a 70-member bucket caps at
    BUCKET_MEMBER_CAP and reports (capped_buckets, dropped_members)."""
    from pdfredact_ray.pipelines.corpus import BUCKET_MEMBER_CAP, _buckets_to_pairs

    n = 70
    key = np.concatenate([np.zeros(n, np.int64), np.ones(3, np.int64)])
    did = np.concatenate([np.arange(n, dtype=np.int64), np.array([100, 101, 102])])
    pairs, capped, dropped = _buckets_to_pairs(key, did)
    assert capped == 1
    assert dropped == n - BUCKET_MEMBER_CAP
    cap = BUCKET_MEMBER_CAP
    assert len(pairs) == cap * (cap - 1) // 2 + 3
    # members beyond the cap never appear in a pair
    assert not any(a >= cap and a < 100 or (b >= cap and b < 100) for a, b in pairs)


def test_minhash_bucket_cap_metadata_surfaced(ray_session, tmp_path):
    """A corpus with >cap identical docs yields a capped-bucket count in the
    result's schema metadata (no silent caps)."""
    from pdfredact_ray.pipelines.corpus import BUCKET_MEMBER_CAP, minhash_near_dup_pairs

    n_dup = BUCKET_MEMBER_CAP + 8
    text = "the same exact duplicated document body repeated many times over"
    rows = {
        "doc_id": pa.array(list(range(n_dup)) + [900, 901], pa.int64()),
        "text": pa.array(
            [text] * n_dup
            + ["something entirely different one", "another unrelated text two"],
            pa.string(),
        ),
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    out = minhash_near_dup_pairs(str(tmp_path), threshold=0.5)
    meta = out.schema.metadata or {}
    assert int(meta[b"minhash.capped_buckets"]) >= 1
    assert int(meta[b"minhash.dropped_members"]) >= 8


# ----------------------------------------------------- repetition / chunking


def test_repetition_signals_edge_cases():
    from pdfredact_ray.stages.textops import repetition_signals

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "",  # splits to [''] -> one empty-string word, no bigrams
                    "solo",  # one word, zero bigrams
                    "a b a b a",  # top word 'a' x3; top bigram 'a b' x2
                    "z z z z",  # degenerate repeat: top bigram 'z z' x3
                ],
                pa.string(),
            ),
        }
    )
    out = repetition_signals(batch).to_pydict()
    assert out["n_words"] == [1, 1, 5, 4]
    assert out["n_distinct_words"] == [1, 1, 2, 1]
    assert out["top_word"] == ["", "solo", "a", "z"]
    assert out["top_word_count"] == [1, 1, 3, 4]
    assert out["n_bigrams"] == [0, 0, 4, 3]
    assert out["top_bigram"] == ["", "", "a b", "z z"]
    assert out["top_bigram_count"] == [0, 0, 2, 3]


def test_repetition_tie_break_is_lexicographic():
    from pdfredact_ray.stages.textops import repetition_signals

    batch = pa.table(
        {"doc_id": pa.array([0], pa.int64()), "text": pa.array(["b a b a"], pa.string())}
    )
    out = repetition_signals(batch).to_pydict()
    # 'a' and 'b' both appear twice -> lexicographically smallest wins
    assert out["top_word"] == ["a"]
    # bigrams 'b a' x2, 'a b' x1 -> count wins before lexicographic order
    assert out["top_bigram"] == ["b a"]


def test_chunk_documents_boundaries():
    from pdfredact_ray.stages.textops import chunk_documents

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["", "x" * 150, "y" * 151, "z" * 350], pa.string()),
        }
    )
    out = chunk_documents(batch, size=200, stride=150).to_pydict()
    by_doc = {}
    for d, i, c in zip(out["doc_id"], out["chunk_idx"], out["chunk_text"]):
        by_doc.setdefault(d, []).append((i, c))
    assert by_doc[0] == [(0, "")]  # empty doc -> one empty chunk
    assert by_doc[1] == [(0, "x" * 150)]  # exactly one stride -> one chunk
    assert by_doc[2] == [(0, "y" * 151), (1, "y")]  # one char past -> 2 chunks
    # 350 chars: [0:200], [150:350], overlap of 50 between consecutive chunks
    assert by_doc[3][0][1][-50:] == by_doc[3][1][1][:50]
    assert len(by_doc[3]) == 3 and by_doc[3][2] == (2, "z" * 50)


def test_top_quality_docs_deterministic(ray_session):
    from pdfredact_ray.pipelines.corpus import top_quality_docs

    t1 = top_quality_docs("/root/testdata/sf0.001", k=20)
    t2 = top_quality_docs("/root/testdata/sf0.001", k=20)
    assert t1.equals(t2)
    pm = t1.column("stop_permille").to_pylist()
    assert pm == sorted(pm, reverse=True)
    assert t1.num_rows == 20


def test_events_rollup_levels_consistent(ray_session):
    from pdfredact_ray.pipelines.corpus import events_rollup

    tbl = pa.concat_tables(ray.get(events_rollup("/root/testdata/sf0.001").to_arrow_refs()))
    rows = tbl.to_pylist()
    finest = [r for r in rows if r["event_type"] != "ALL" and r["day"] != "ALL"]
    by_type = {r["event_type"]: r for r in rows if r["event_type"] != "ALL" and r["day"] == "ALL"}
    total = [r for r in rows if r["event_type"] == "ALL"]
    assert len(total) == 1 and total[0]["day"] == "ALL"
    # every rollup level must re-sum exactly from the finest level
    assert total[0]["n_events"] == sum(r["n_events"] for r in finest)
    assert total[0]["sum_cents"] == sum(r["sum_cents"] for r in finest)
    for et, agg in by_type.items():
        mine = [r for r in finest if r["event_type"] == et]
        assert agg["n_events"] == sum(r["n_events"] for r in mine)
        assert agg["sum_cents"] == sum(r["sum_cents"] for r in mine)


def test_semi_and_anti_join_partition_customers(ray_session):
    from pdfredact_ray.pipelines.relational import (
        customers_with_orders,
        customers_without_orders,
    )

    sf = "/root/testdata/sf0.001"
    with_o = {r["c_custkey"] for r in customers_with_orders(sf).take_all()}
    without_o = {r["c_custkey"] for r in customers_without_orders(sf).take_all()}
    assert with_o and without_o
    assert not (with_o & without_o)
    all_cust = set(
        pq.read_table(sf + "/customer.parquet", columns=["c_custkey"])
        .column("c_custkey").to_pylist()
    )
    assert (with_o | without_o) == all_cust


def test_bloom_gate_has_no_false_negatives(ray_session, tmp_path):
    """Bloom guarantee: a candidate whose text exactly duplicates a
    reference-shard doc is ALWAYS dropped (never a false negative); a
    distinct text survives unless it collides on all k bits."""
    from pdfredact_ray.pipelines.corpus import bloom_new_docs

    rows = {
        # doc_id % 10 == 0 -> reference shard; others are candidates
        "doc_id": pa.array([0, 10, 20, 1, 2, 3], pa.int64()),
        "text": pa.array(
            [
                "alpha reference text",
                "beta reference text",
                "gamma reference text",
                "alpha reference text",  # exact dup of ref 0 -> must drop
                "totally novel text one",
                "beta reference text",  # exact dup of ref 10 -> must drop
            ],
            pa.string(),
        ),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(["t"] * 6),
        "n_chars": pa.array([1] * 6, pa.int64()),
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    kept = {r["doc_id"] for r in bloom_new_docs(str(tmp_path)).take_all()}
    assert 1 not in kept and 3 not in kept
    assert kept == {2}


def test_bloom_bits_deterministic():
    from pdfredact_ray.pipelines.corpus import BLOOM_BITS, BLOOM_K, _bloom_bits_of

    a, b = _bloom_bits_of("same text"), _bloom_bits_of("same text")
    assert a == b and len(a) == BLOOM_K
    assert all(0 <= x < BLOOM_BITS for x in a)
    assert _bloom_bits_of("other text") != a


def test_char_pair_counts_no_cross_doc_pairs(ray_session, tmp_path):
    """The sentinel between docs prevents cross-document pairs: two docs
    'ab' + 'cd' yield pairs {ab, cd} only (never 'bc'), counts sum across
    docs, and the tie-break is lexicographic among equal counts."""
    from pdfredact_ray.pipelines.corpus import corpus_char_pair_counts

    rows = {
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["ab", "cd", "ab"], pa.string()),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["t"] * 3),
        "n_chars": pa.array([2] * 3, pa.int64()),
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    got = [
        (r["pair"], r["n"])
        for r in corpus_char_pair_counts(str(tmp_path)).take_all()
    ]
    assert got == [("ab", 2), ("cd", 1)]


def test_minhasher_vectorized_matches_per_doc_signature(docs):
    """The batch-vectorized MinHasher.__call__ (flattened shingle hashes +
    one universal-hash matrix + np.minimum.reduceat) must emit the exact
    band table the per-doc signature() path implies — including empty and
    sub-k-token documents."""
    import zlib

    from pdfredact_ray.stages.dedup import MinHasher, _N_BANDS, _ROWS_PER_BAND

    mh = MinHasher()
    texts = list(docs.text.iloc[:200]) + ["", "one", "two words", "a b c d e"]
    ids = list(range(len(texts)))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    got = mh(tbl)
    exp_rows = []
    for d, t in zip(ids, texts):
        sig = mh.signature(t)
        for band in range(_N_BANDS):
            chunk = sig[band * _ROWS_PER_BAND : (band + 1) * _ROWS_PER_BAND]
            exp_rows.append((d, band, zlib.crc32(chunk.tobytes())))
    assert got.column("doc_id").to_pylist() == [r[0] for r in exp_rows]
    assert got.column("band_id").to_pylist() == [r[1] for r in exp_rows]
    assert got.column("band_hash").to_pylist() == [r[2] for r in exp_rows]


def test_near_dup_components_forced_distributed_matches(ray_session):
    """Both gates forced to the distributed path (salted map_groups pair
    emission + hash-join verify + large-star/small-star components) must
    reproduce the driver-path clustering and filter exactly."""
    import pdfredact_ray.pipelines.corpus as cc

    fast_comp = cc.near_dup_components(SF, threshold=0.5)
    fast_filter = _pdf(cc.near_dup_dedup_filter(SF, threshold=0.5)).sort_values(
        "doc_id"
    ).reset_index(drop=True)
    saved_rows, saved_edges = cc.DRIVER_BUCKET_MAX_ROWS, cc.CC_DRIVER_MAX_EDGES
    try:
        cc.DRIVER_BUCKET_MAX_ROWS = 0
        cc.CC_DRIVER_MAX_EDGES = 0
        dist_comp = cc.near_dup_components(SF, threshold=0.5)
        dist_filter = _pdf(cc.near_dup_dedup_filter(SF, threshold=0.5)).sort_values(
            "doc_id"
        ).reset_index(drop=True)
    finally:
        cc.DRIVER_BUCKET_MAX_ROWS, cc.CC_DRIVER_MAX_EDGES = saved_rows, saved_edges
    # above the (forced-zero) gate the labels come back as a Dataset —
    # the 100 TB shape where they never land on the driver
    assert not isinstance(dist_comp, pa.Table)
    dist_tbl = pa.Table.from_pandas(
        dist_comp.to_pandas(), preserve_index=False
    ).cast(fast_comp.schema)
    assert fast_comp.sort_by("doc_id").equals(dist_tbl.sort_by("doc_id"))
    pd.testing.assert_frame_equal(fast_filter, dist_filter)


def test_pair_verifier_cache_is_bounded():
    from pdfredact_ray.stages.dedup import PairVerifier

    n = 300
    texts = {i: f"doc number {i} with some shared words" for i in range(n)}
    v = PairVerifier(texts, threshold=0.0)
    v.CACHE_MAX = 64
    batch = pa.table(
        {
            "doc_a": pa.array(list(range(0, n, 2)), pa.int64()),
            "doc_b": pa.array(list(range(1, n, 2)), pa.int64()),
        }
    )
    out = v(batch)
    assert out.num_rows == n // 2  # threshold 0 keeps every pair
    assert len(v._cache) <= 64


def test_ann_lsh_recall_and_determinism(ray_session, embs):
    """LSH-bucketed ANN: recall@10 vs the exact brute-force table >= 0.8 on
    the near-uniform test embeddings, byte-identical across runs, and the
    hyperplane matrix matches its md5-parity spec."""
    import hashlib

    from pdfredact_ray.pipelines.corpus import ann_topk_bruteforce, ann_topk_lsh
    from pdfredact_ray.stages.dedup import SimHasher
    from pdfredact_ray.stages.embed import lsh_sign_matrix

    S = lsh_sign_matrix(6, 4)
    for b in range(6):
        for d in range(4):
            h = int.from_bytes(hashlib.md5(f"lshsign:{b}:{d}".encode()).digest()[:8], "little")
            assert S[b, d] == (1 if h % 2 == 0 else -1)

    lsh1 = _pdf(ann_topk_lsh(SF)).sort_values(["query_id", "rank"]).reset_index(drop=True)
    lsh2 = _pdf(ann_topk_lsh(SF)).sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(lsh1, lsh2)

    bf = _pdf(ann_topk_bruteforce(SF))
    recs = []
    for q in sorted(bf.query_id.unique()):
        b = set(bf[bf.query_id == q].vec_id)
        l = set(lsh1[lsh1.query_id == q].vec_id)
        recs.append(len(b & l) / len(b))
    assert np.mean(recs) >= 0.8, recs


def test_knn_label_vote_matches_numpy(ray_session, embs):
    """k-NN label vote vs a direct numpy recompute (self-excluded cosine
    top-10, majority vote, votes-desc/label-asc tie-break)."""
    import pyarrow.parquet as pq

    from pdfredact_ray.pipelines.corpus import knn_label_vote

    got = knn_label_vote(SF).to_pandas().sort_values("query_id").reset_index(drop=True)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist(), np.int64)
    labels = dict(zip(ids.tolist(), t.column("label").to_pylist()))
    all_ids, M = embs
    order = np.argsort(all_ids)
    for qrow in got.itertuples(index=False):
        qi = np.flatnonzero(all_ids == qrow.query_id)[0]
        sims = M @ M[qi]
        mask = all_ids != qrow.query_id
        cand_ids, cand_sims = all_ids[mask], sims[mask]
        top = np.lexsort((cand_ids, -cand_sims))[:10]
        votes: dict = {}
        for v in cand_ids[top]:
            lb = int(labels[int(v)])
            votes[lb] = votes.get(lb, 0) + 1
        pred, nv = sorted(votes.items(), key=lambda x: (-x[1], x[0]))[0]
        assert qrow.predicted_label == pred and qrow.votes == nv
        assert qrow.true_label == int(labels[int(qrow.query_id)])
        assert qrow.correct == int(pred == qrow.true_label)


def test_cross_doc_repeated_ngrams_planted(ray_session, tmp_path):
    """Planted shared 8-gram: two docs sharing one 8-token run are flagged
    with exactly one shared shingle each; a unique doc is not flagged;
    short and empty docs behave per word_shingles(k=8) semantics."""
    import os

    import pyarrow.parquet as pq

    from pdfredact_ray.pipelines.corpus import cross_doc_repeated_ngrams

    d = str(tmp_path / "ngram_sf")
    os.makedirs(d)
    run = "a b c d e f g h"
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    f"x1 y1 {run} z1",
                    f"x2 {run} z2 w2",
                    "totally unique words only here there everywhere nine ten",
                    "tiny doc",  # < 8 tokens: one whole-doc shingle
                    "",
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    got = (
        cross_doc_repeated_ngrams(d)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    by = {r.doc_id: r for r in got.itertuples(index=False)}
    assert by[1].n_shared == 1 and by[1].flagged
    assert by[2].n_shared == 1 and by[2].flagged
    assert by[3].n_shared == 0 and not by[3].flagged
    assert by[4].n_distinct == 1 and by[4].n_shared == 0
    assert by[5].n_distinct == 0 and not by[5].flagged


def test_corpus_clean_all_gates_off_matches(ray_session):
    """The 100TB-shape rehearsal in miniature: corpus_clean with EVERY
    driver gate forced off (distributed minhash bucketing, distributed
    connected components, hash-join hot set) must reproduce the gated
    composition's kept set exactly."""
    import pdfredact_ray.pipelines.corpus as cc

    fast = set(_pdf(cc.corpus_clean(SF))["doc_id"])
    saved = (cc.DRIVER_BUCKET_MAX_ROWS, cc.CC_DRIVER_MAX_EDGES, cc.HOTSET_MAX_ROWS)
    try:
        cc.DRIVER_BUCKET_MAX_ROWS = 0
        cc.CC_DRIVER_MAX_EDGES = 0
        cc.HOTSET_MAX_ROWS = 0
        dist = set(_pdf(cc.corpus_clean(SF))["doc_id"])
    finally:
        cc.DRIVER_BUCKET_MAX_ROWS, cc.CC_DRIVER_MAX_EDGES, cc.HOTSET_MAX_ROWS = saved
    assert fast == dist and fast


def test_cross_doc_ngrams_forced_join_path_matches(ray_session, tmp_path):
    """HOTSET_MAX_ROWS forced to 0 takes the hash-join leg (hot set stays a
    Dataset; per-doc shared counts via join + bucketed combine) — output
    must equal the broadcast leg row for row, including the planted-corpus
    edge cases (short doc, empty doc)."""
    import pdfredact_ray.pipelines.corpus as cc

    fast = (
        cc.cross_doc_repeated_ngrams(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    saved = cc.HOTSET_MAX_ROWS
    try:
        cc.HOTSET_MAX_ROWS = 0
        joined = (
            cc.cross_doc_repeated_ngrams(SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    finally:
        cc.HOTSET_MAX_ROWS = saved
    pd.testing.assert_frame_equal(
        fast[sorted(fast.columns)], joined[sorted(joined.columns)]
    )


def test_embed_dedup_filter_keeps_min_per_component(ray_session, embs):
    """Survivors = everything minus non-min members of cosine near-dup
    components; cross-checked against a direct numpy pair + union-find
    recompute."""
    from pdfredact_ray.pipelines.corpus import embed_dedup_filter
    from pdfredact_ray.stages.dedup import union_find_components

    got = set(embed_dedup_filter(SF).to_pandas().vec_id)
    ids, M = embs
    sims = M @ M.T
    iu, ju = np.triu_indices(len(ids), k=1)
    hit = sims[iu, ju] >= 0.4
    a = np.minimum(ids[iu[hit]], ids[ju[hit]])
    b = np.maximum(ids[iu[hit]], ids[ju[hit]])
    labels = union_find_components(a.astype(np.int64), b.astype(np.int64))
    drop = {
        int(d)
        for d, c in zip(
            labels.column("doc_id").to_pylist(), labels.column("component").to_pylist()
        )
        if d != c
    }
    assert got == set(ids.tolist()) - drop


def test_doc_pack_sequences_prefix_scan(ray_session, tmp_path):
    """Distributed prefix-scan correctness on SPARSE, gappy doc_ids (range
    math can't rely on density): seq_id equals a driver-side exclusive
    cumsum // budget, and docs never split across a wrong boundary."""
    import os

    import pyarrow.parquet as pq

    from pdfredact_ray.pipelines.corpus import doc_pack_sequences

    rng = np.random.default_rng(11)
    ids = np.unique(rng.integers(0, 10_000_000, size=3000)).astype(np.int64)
    texts = [" ".join(["w"] * int(n)) for n in rng.integers(0, 200, size=len(ids))]
    d = str(tmp_path / "pack_sf")
    os.makedirs(d)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)}),
        os.path.join(d, "documents.parquet"),
    )
    got = (
        doc_pack_sequences(d, budget=512)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = np.array([len(t.split()) for t in texts], dtype=np.int64)
    excl = np.concatenate(([0], np.cumsum(n)[:-1]))
    assert list(got.doc_id) == list(ids)
    assert list(got.n_tokens) == list(n)
    assert list(got.seq_id) == list(excl // 512)


def test_taskstage_cache_reuses_and_bounds():
    """stage_call constructs once per (class, ctor kwargs) per worker,
    distinguishes configs, and evicts FIFO at the cap."""
    import pdfredact_ray.stages.taskstage as TS

    built = []

    class Probe:
        def __init__(self, tag=0):
            built.append(tag)
            self.tag = tag

        def __call__(self, batch):
            return batch

    TS._CACHE.clear()
    t = pa.table({"x": pa.array([1, 2])})
    for _ in range(3):
        TS.stage_call(t, Probe, {"tag": 1})
    assert built == [1]  # constructed once, reused
    TS.stage_call(t, Probe, {"tag": 2})
    assert built == [1, 2]  # distinct config -> distinct instance
    for i in range(3, 3 + TS._CACHE_MAX):
        TS.stage_call(t, Probe, {"tag": i})
    assert len(TS._CACHE) <= TS._CACHE_MAX
    TS._CACHE.clear()


def test_doc_pii_density_planted(ray_session, tmp_path):
    """PII scan semantics on constructed docs: non-overlapping leftmost RE2
    counts per rule, matched-char mass via replace-delta, exact integer
    permille, and degenerate rows (empty text, n_chars=0)."""
    from pdfredact_ray.pipelines.corpus import doc_pii_density, pii_clean_filter

    texts = [
        "my ssn is 123-45-6789 and again 123-45-6789",  # 2 matches, 22 chars
        "no sensitive content here",                    # 0 matches
        "",                                             # empty text
        "999-99-9999",                                  # exact full-width match
    ]
    rows = {
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    pat = (r"\d{3}-\d{2}-\d{4}",)
    got = (
        doc_pii_density(str(tmp_path), patterns=pat)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[0, "n_matches"] == 2 and got.loc[0, "matched_chars"] == 22
    assert got.loc[0, "density_permille"] == (1000 * 22) // len(texts[0])
    assert got.loc[1, "n_matches"] == 0 and got.loc[1, "density_permille"] == 0
    assert got.loc[2, "matched_chars"] == 0 and got.loc[2, "density_permille"] == 0
    assert got.loc[3, "density_permille"] == 1000  # whole doc is one match
    kept = set(
        pii_clean_filter(str(tmp_path), max_permille=100, patterns=pat)
        .to_pandas()["doc_id"]
    )
    assert kept == {1, 2}  # both match-bearing docs exceed 100 permille


def test_doc_pii_density_multi_rule_sums(ray_session, tmp_path):
    """Counts/chars sum over rules; rules hitting the same span both count
    (per-rule semantics, matching the SQL oracle's per-pattern sum)."""
    from pdfredact_ray.pipelines.corpus import doc_pii_density

    text = "alpha beta alpha"
    rows = {
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array([text], pa.string()),
        "n_chars": pa.array([len(text)], pa.int64()),
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    got = doc_pii_density(
        str(tmp_path), patterns=(r"alpha", r"alpha beta")
    ).to_pandas()
    # rule 1: two 'alpha' (10 chars); rule 2: one 'alpha beta' (10 chars)
    assert int(got.loc[0, "n_matches"]) == 3
    assert int(got.loc[0, "matched_chars"]) == 20


def test_corpus_mixture_sample_matches_local_recompute(ray_session, tmp_path):
    """Mixture cut vs a local single-pass recompute on a corpus wide enough
    to span many hash-prefix buckets, plus boundary semantics: a doc is
    kept iff the EXCLUSIVE prefix of its ranked predecessors < budget."""
    import hashlib

    from pdfredact_ray.pipelines.corpus import corpus_mixture_sample

    rng = np.random.default_rng(7)
    n = 600
    src = [f"s{i % 3}" for i in range(n)]
    nch = rng.integers(10, 50, n).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "source": pa.array(src, pa.string()),
                "n_chars": pa.array(nch, pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    budget = 800
    got = (
        corpus_mixture_sample(str(tmp_path), char_budget=budget)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # local oracle: per source, rank by (md5(str(doc_id)), doc_id), keep
    # while the exclusive running char sum is under budget
    import pandas as pd

    df = pd.DataFrame({"doc_id": np.arange(n), "source": src, "n_chars": nch})
    df["h"] = [hashlib.md5(str(d).encode()).hexdigest() for d in df["doc_id"]]
    keep_rows = []
    for s, g in df.groupby("source"):
        g = g.sort_values(["h", "doc_id"])
        prev = g["n_chars"].cumsum().shift(fill_value=0)
        m = prev < budget
        kept = g[m].copy()
        kept["prev_chars"] = prev[m]
        keep_rows.append(kept)
    exp = (
        pd.concat(keep_rows)[["doc_id", "source", "n_chars", "prev_chars"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["doc_id", "source", "n_chars", "prev_chars"]].astype(exp.dtypes.to_dict()),
        exp,
    )
    # every source spends at least its budget or ran out of docs
    spent = got.groupby("source")["n_chars"].sum()
    for s in spent.index:
        total = df[df["source"] == s]["n_chars"].sum()
        assert spent[s] >= min(budget, total)


def test_corpus_mixture_sample_degenerate_budgets(ray_session, tmp_path):
    from pdfredact_ray.pipelines.corpus import corpus_mixture_sample

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "source": pa.array(["a", "a"], pa.string()),
                "n_chars": pa.array([5, 5], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    assert corpus_mixture_sample(str(tmp_path), char_budget=0).count() == 0
    all_kept = corpus_mixture_sample(str(tmp_path), char_budget=10**9).to_pandas()
    assert sorted(all_kept["doc_id"]) == [1, 2]
    with pytest.raises(ValueError):
        corpus_mixture_sample(str(tmp_path), n_buckets=7)
