"""Analytics operators (quantiles / range join / grouped sample / TF-IDF)
vs independent DuckDB recomputes at sf0.001, plus connected-components
equivalence: driver union-find == distributed large-star/small-star on
synthetic graphs, and the near-dup clustering pipeline end-to-end."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(SF, t + '.parquet')}')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_events_value_quantiles_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.analytics import QUANTILE_PS, events_value_quantiles

    got = _norm(events_value_quantiles(SF).to_pandas())
    union = "\nUNION ALL\n".join(
        f"""SELECT event_type, CAST({p} AS DOUBLE) AS p,
               percentile_disc({p}) WITHIN GROUP (ORDER BY cents) AS value_cents
            FROM c GROUP BY event_type"""
        for p in QUANTILE_PS
    )
    want = _norm(
        _con()
        .execute(
            "WITH c AS (SELECT event_type, CAST(FLOOR(value*100) AS BIGINT) AS cents "
            f"FROM events) {union}"
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want)


def test_quantile_index_matches_percentile_disc_small():
    # pin the discrete-index formula against DuckDB on awkward small n
    import math

    for vals in ([5], [1, 2], [1, 2, 3, 4], list(range(10))):
        for p in (0.25, 0.5, 0.75, 0.9, 0.99):
            want = duckdb.execute(
                f"SELECT percentile_disc({p}) WITHIN GROUP (ORDER BY v) "
                f"FROM (SELECT unnest({vals}) AS v)"
            ).fetchone()[0]
            n = len(vals)
            idx = max(int(math.ceil(p * n)) - 1, 0)
            assert sorted(vals)[idx] == want, (vals, p)


def test_events_band_join_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.analytics import events_band_join

    got = _norm(events_band_join(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            """
        WITH bands(tier, lo, hi) AS (VALUES
            ('micro', 0.0, 5.0), ('small', 5.0, 10.0), ('mid', 10.0, 20.0),
            ('large', 20.0, 50.0), ('huge', 50.0, 1e308))
        SELECT e.event_id, b.tier
        FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi"""
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want)
    # every event lands in exactly one band
    assert len(got) == _con().execute("SELECT COUNT(*) FROM events").fetchone()[0]


def test_doc_group_sample_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.analytics import doc_group_sample

    got = _norm(doc_group_sample(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            """
        SELECT source, doc_id, CAST(rn AS BIGINT) AS sample_rank FROM (
            SELECT source, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM documents
        ) WHERE rn <= 5"""
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want)


def test_doc_tfidf_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.analytics import doc_tfidf_top_terms

    got = _norm(doc_tfidf_top_terms(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
            FROM documents
        ),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
               CAST(df AS BIGINT) AS df, CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * ln((SELECT n_docs FROM n) / df.df) DESC,
                                tf.term) AS rank
            FROM tf JOIN df USING (term)
        ) WHERE rank <= 3"""
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want)


# --- connected components ---------------------------------------------------


def _uf(edges):
    from pdfredact_ray.stages.dedup import union_find_components

    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    t = union_find_components(a, b)
    return dict(zip(t.column("doc_id").to_pylist(), t.column("component").to_pylist()))


def test_union_find_basic():
    # chain 1-2-3-4 plus isolated pair (10, 11): two components
    labels = _uf([(1, 2), (2, 3), (3, 4), (10, 11)])
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_union_find_star_and_order_independence():
    edges = [(7, 3), (3, 9), (9, 1), (5, 6)]
    labels = _uf(edges)
    assert labels == {1: 1, 3: 1, 7: 1, 9: 1, 5: 5, 6: 5}
    assert labels == _uf(list(reversed(edges)))


def test_cc_distributed_equals_union_find(ray_session):
    from pdfredact_ray.stages.dedup import connected_components_distributed

    rng = np.random.default_rng(7)
    cases = [
        [(1, 2), (2, 3), (3, 4), (10, 11)],  # chain + pair
        [(i, i + 1) for i in range(30)],  # long chain (log^2 rounds)
        [(0, i) for i in range(1, 12)],  # star
    ]
    # random graph: 40 nodes, 35 random edges
    nodes = rng.choice(1000, size=40, replace=False)
    cases.append(
        [tuple(sorted(rng.choice(nodes, size=2, replace=False).tolist())) for _ in range(35)]
    )
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        tbl = pa.table(
            {
                "doc_a": pa.array([e[0] for e in edges], pa.int64()),
                "doc_b": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
        got = connected_components_distributed(tbl).to_pandas()
        dist = dict(zip(got["doc_id"].tolist(), got["component"].tolist()))
        assert dist == _uf(edges)


def test_cc_distributed_no_edge_list_driver_collect(ray_session):
    """The convergence check must be a distributed partial aggregate: every
    table collected to the driver DURING the star rounds is O(blocks) (one
    2-int row per block), never the O(edges) list, and the labels come back
    as a Dataset the test collects itself."""
    import ray
    import ray.data as rd

    from pdfredact_ray.stages import dedup as dd

    n = 3000  # one long chain -> log^2 rounds, edge list stays ~n per round
    tbl = pa.table(
        {
            "doc_a": pa.array(np.arange(n - 1, dtype=np.int64), pa.int64()),
            "doc_b": pa.array(np.arange(1, n, dtype=np.int64), pa.int64()),
        }
    )

    collected_rows = []
    orig = rd.Dataset.to_arrow_refs

    def spy(self):
        refs = orig(self)
        collected_rows.append(sum(t.num_rows for t in ray.get(refs)))
        return refs

    rd.Dataset.to_arrow_refs = spy
    try:
        labels_ds = dd.connected_components_distributed(tbl)
        during = list(collected_rows)  # collects before the test's own
    finally:
        rd.Dataset.to_arrow_refs = orig
    assert during, "expected per-round signature collects"
    # signature partials: one row per block — far below the edge count
    assert max(during) < 200, during
    got = labels_ds.to_pandas()
    lab = dict(zip(got["doc_id"].tolist(), got["component"].tolist()))
    assert lab == {i: 0 for i in range(n)}


def test_edge_signature_partial_aggregate(ray_session):
    """_edge_signature == the old driver-side (count, xor) on the same
    edges, regardless of block layout."""
    import ray.data as rd

    from pdfredact_ray.stages.dedup import _edge_signature

    rng = np.random.default_rng(11)
    s = rng.integers(0, 10_000, size=5_000).astype(np.int64)
    d = rng.integers(0, 10_000, size=5_000).astype(np.int64)
    want = (
        len(s),
        int(np.bitwise_xor.reduce((s * 1000003 + d) % (1 << 61), initial=0)),
    )
    tbl = pa.table({"src": pa.array(s, pa.int64()), "dst": pa.array(d, pa.int64())})
    for n_blocks in (1, 7):
        ds = rd.from_arrow(
            [tbl.slice(i * 800, 800) for i in range((5_000 + 799) // 800)][:n_blocks]
            if n_blocks > 1
            else [tbl]
        )
        if n_blocks == 1:
            assert _edge_signature(ds) == want
        else:
            # partial slices: recompute expectation on the actual rows
            sub = pa.concat_tables(
                [tbl.slice(i * 800, 800) for i in range(n_blocks)]
            )
            ss = sub.column("src").to_numpy().astype(np.int64)
            dd_ = sub.column("dst").to_numpy().astype(np.int64)
            w2 = (
                len(ss),
                int(np.bitwise_xor.reduce((ss * 1000003 + dd_) % (1 << 61), initial=0)),
            )
            assert _edge_signature(ds) == w2


def test_near_dup_components_and_filter(ray_session):
    from pdfredact_ray.pipelines.corpus import (
        minhash_near_dup_pairs,
        near_dup_components,
        near_dup_dedup_filter,
    )

    pairs = minhash_near_dup_pairs(SF)
    labels = near_dup_components(SF)
    lab = dict(
        zip(labels.column("doc_id").to_pylist(), labels.column("component").to_pylist())
    )
    # every paired doc is labeled; endpoints of a pair share a component
    for a, b in zip(pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist()):
        assert lab[a] == lab[b]
    # component id is the min member
    comp_members: dict = {}
    for d, c in lab.items():
        comp_members.setdefault(c, []).append(d)
    for c, members in comp_members.items():
        assert c == min(members)

    kept = near_dup_dedup_filter(SF).to_pandas()
    kept_ids = set(kept["doc_id"])
    dropped = {d for d, c in lab.items() if d != c}
    assert dropped.isdisjoint(kept_ids)
    assert {c for c in comp_members} <= kept_ids  # canonical member survives
    import pyarrow.parquet as pq

    all_ids = set(
        pq.read_table(os.path.join(SF, "documents.parquet"), columns=["doc_id"])
        .column("doc_id")
        .to_pylist()
    )
    assert kept_ids == all_ids - dropped


def test_events_moving_stats_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.analytics import events_moving_stats

    got = _norm(events_moving_stats(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            """
        WITH c AS (
            SELECT event_id, user_id, ts,
                   CAST(FLOOR(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT event_id,
               CAST(SUM(cents) OVER w AS BIGINT) AS win_sum_cents,
               CAST(COUNT(*) OVER w AS BIGINT) AS win_n,
               cents - LAG(cents) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS delta_cents
        FROM c
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"""
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want)


# --- audio decode -----------------------------------------------------------


def test_audio_decode_matches_ground_truth(ray_session):
    import pyarrow.parquet as pq

    from pdfredact_ray.pipelines.corpus import multimodal_audio
    from pdfredact_ray.sources.binimg import ensure_audio

    got = _norm(multimodal_audio(SF).to_pandas())
    want = _norm(
        pq.read_table(
            ensure_audio(SF),
            columns=[
                "doc_id", "n_samples", "sample_rate", "peak", "rms_floor", "duration_ms",
            ],
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, want)


def test_decode_wav_rejects_malformed():
    import struct as st

    from pdfredact_ray.stages.dedup import np as _np  # noqa: F401
    from pdfredact_ray.stages.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"nope")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + b"\x00" * 4 + b"WAVE")  # no chunks
    # stereo (channels=2) rejected
    fmt = st.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    payload = (
        b"RIFF" + st.pack("<I", 0) + b"WAVE"
        + b"fmt " + st.pack("<I", len(fmt)) + fmt
        + b"data" + st.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(ValueError):
        decode_wav(payload)


def test_decode_wav_roundtrip_int16_min():
    """|INT16_MIN| must not overflow: peak of a [-32768] signal is 32768."""
    import io
    import wave

    import numpy as np

    from pdfredact_ray.stages.multimodal import AudioDecoder, decode_wav

    s = np.array([-32768, 100, -5], dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(s.tobytes())
    rate, dec = decode_wav(buf.getvalue())
    assert rate == 8000 and dec.tolist() == s.tolist()
    out = AudioDecoder()(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "payload": pa.array([buf.getvalue()], pa.binary())})
    )
    assert out.column("peak").to_pylist() == [32768]


def test_kmeans_clusters_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.corpus import kmeans_clusters

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'embeddings.parquet')}')"
    )
    got = _norm(kmeans_clusters(SF).to_pandas())
    want = _norm(
        con.execute(
            """
        WITH q AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS d,
                   CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1048576 + 0.5)
                        AS BIGINT) AS qv
            FROM embeddings
        ),
        seed AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j
                 FROM embeddings ORDER BY vec_id LIMIT 8),
        c0 AS (SELECT s.j, q.d, q.qv AS cv FROM seed s JOIN q USING (vec_id)),
        d1 AS (SELECT q.vec_id, c.j, SUM((q.qv - c.cv) * (q.qv - c.cv)) AS dist
               FROM q JOIN c0 c ON q.d = c.d GROUP BY q.vec_id, c.j),
        a1 AS (SELECT vec_id, j FROM (
                 SELECT vec_id, j, ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY dist, j) AS rn FROM d1) WHERE rn = 1),
        u1 AS (SELECT a.j, q.d,
                      CAST(FLOOR(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
               FROM a1 a JOIN q USING (vec_id) GROUP BY a.j, q.d),
        c1 AS (SELECT c0.j, c0.d, COALESCE(u1.cv, c0.cv) AS cv
               FROM c0 LEFT JOIN u1 ON c0.j = u1.j AND c0.d = u1.d),
        d2 AS (SELECT q.vec_id, c.j, SUM((q.qv - c.cv) * (q.qv - c.cv)) AS dist
               FROM q JOIN c1 c ON q.d = c.d GROUP BY q.vec_id, c.j),
        a2 AS (SELECT vec_id, j FROM (
                 SELECT vec_id, j, ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY dist, j) AS rn FROM d2) WHERE rn = 1)
        SELECT vec_id, CAST(j AS BIGINT) AS cluster FROM a2"""
        ).df()
    )
    pd.testing.assert_frame_equal(got, want)
    # every cluster id is one of the k seeds and non-degenerate overall
    assert set(got["cluster"]) <= set(range(8))
    assert len(set(got["cluster"])) >= 2


def test_kmeans_empty_cluster_keeps_centroid(ray_session, tmp_path):
    """A far-outlier seed that captures no members must keep its centroid
    (not collapse to zeros) — pinned via a table where seed 1 is isolated."""
    import pyarrow.parquet as pq

    from pdfredact_ray.pipelines.corpus import kmeans_clusters

    rng = np.random.default_rng(3)
    base = rng.normal(0, 0.05, size=(40, 8)).astype(np.float32)
    base[1] += 100.0  # vec 1: far outlier, its own cluster
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(40, dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in base], pa.list_(pa.float32())),
            "label": pa.array(np.zeros(40, dtype=np.int32)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = kmeans_clusters(str(tmp_path), k=4, iters=3).to_pandas()
    by_vec = dict(zip(out["vec_id"], out["cluster"]))
    assert by_vec[1] == 1  # outlier stays alone in its seed cluster
    assert (out["cluster"] == 1).sum() == 1


def test_corpus_clean_equals_composed_gates(ray_session):
    """corpus_clean == (documents - exact dups - near-dup non-canonicals)
    filtered by the quality thresholds and the language vote — each leg
    reconstructed from primitives that have their own SQL oracle."""
    import pyarrow.parquet as pq

    from pdfredact_ray.pipelines.corpus import (
        corpus_clean,
        doc_langid,
        doc_quality,
        exact_dup_ids,
        near_dup_components,
    )

    got = set(corpus_clean(SF).to_pandas()["doc_id"])

    all_ids = set(
        pq.read_table(os.path.join(SF, "documents.parquet"), columns=["doc_id"])
        .column("doc_id").to_pylist()
    )
    drop = set(exact_dup_ids(SF).to_pylist())
    labels = near_dup_components(SF)
    drop |= {
        int(d)
        for d, c in zip(
            labels.column("doc_id").to_pylist(), labels.column("component").to_pylist()
        )
        if d != c
    }
    q = doc_quality(SF).to_pandas().set_index("doc_id")
    lang = doc_langid(SF).to_pandas().set_index("doc_id")
    want = {
        d
        for d in all_ids - drop
        if q.loc[d, "stopword_ratio"] >= 0.05
        and q.loc[d, "digit_ratio"] <= 0.30
        and lang.loc[d, "pred_lang"] == "en"
    }
    assert got == want
    assert 0 < len(got) < len(all_ids)  # the gates actually fire


def test_customers_without_orders_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.relational import customers_without_orders

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(SF, t + '.parquet')}')"
        )
    got = _norm(customers_without_orders(SF).to_pandas())
    want = _norm(
        con.execute(
            """SELECT c_custkey, c_mktsegment FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey
                                   AND o.o_orderpriority = '1-URGENT')"""
        ).df()
    )
    pd.testing.assert_frame_equal(got, want)
    # non-trivial on BOTH sides of the anti join
    assert 0 < len(got) < con.execute("SELECT COUNT(*) FROM customer").fetchone()[0]


def test_events_user_distinct_types_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.relational import events_user_distinct_types

    got = _norm(events_user_distinct_types(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            """SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
                      CAST(COUNT(*) AS BIGINT) AS n_events
               FROM events GROUP BY user_id"""
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want)


def test_user_top_event_type_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.analytics import user_top_event_type

    got = _norm(user_top_event_type(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            """
        WITH c AS (
            SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
        ), r AS (
            SELECT user_id, event_type, n,
                   ROW_NUMBER() OVER (
                        PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
            FROM c
        )
        SELECT user_id, event_type AS top_type, CAST(n AS BIGINT) AS n_top
        FROM r WHERE rn = 1"""
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want)


def test_user_top_event_type_tie_breaks_lexicographic(ray_session, tmp_path):
    from pdfredact_ray.pipelines.analytics import user_top_event_type
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            # user 1: 'view' x2 ties 'click' x2 -> 'click' wins (lexicographic)
            "event_type": pa.array(["view", "click", "view", "click", "zzz"]),
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, os.path.join(sf, "events.parquet"))
    got = user_top_event_type(sf).to_pandas().set_index("user_id")
    assert got.loc[1, "top_type"] == "click" and got.loc[1, "n_top"] == 2
    assert got.loc[2, "top_type"] == "zzz"


def test_event_type_user_overlap_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.analytics import event_type_user_overlap

    got = _norm(event_type_user_overlap(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            """
        WITH f AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
            FROM events WHERE event_type IN ('click', 'purchase')
            GROUP BY user_id
        )
        SELECT user_id,
               CASE WHEN a > 0 AND b > 0 THEN 'both'
                    WHEN a > 0 THEN 'only_click'
                    ELSE 'only_purchase' END AS overlap
        FROM f"""
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want)


def test_event_type_user_overlap_three_classes(ray_session, tmp_path):
    """Synthetic corpus where the three classes all occur (at sf0.001 every
    user is dense enough to hit 'both'), plus a user with NEITHER type who
    must not appear at all."""
    from pdfredact_ray.pipelines.analytics import event_type_user_overlap
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 3, 4], pa.int64()),
            "event_type": pa.array(["click", "purchase", "click", "purchase", "view"]),
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, os.path.join(sf, "events.parquet"))
    got = event_type_user_overlap(sf).to_pandas().set_index("user_id")
    assert got.loc[1, "overlap"] == "both"
    assert got.loc[2, "overlap"] == "only_click"
    assert got.loc[3, "overlap"] == "only_purchase"
    assert 4 not in got.index


def test_lineitem_cov_stats_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.analytics import lineitem_cov_stats

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{os.path.join(SF, 'lineitem.parquet')}')"
    )
    got = _norm(lineitem_cov_stats(SF).to_pandas())
    want = _norm(
        con.execute(
            """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_x,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_y,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_xy
        FROM lineitem GROUP BY l_returnflag"""
        ).df()
    )
    pd.testing.assert_frame_equal(got, want)
    # the partials must reconstruct DuckDB's own float covariance
    eng = got.set_index("l_returnflag")
    ref = con.execute(
        """
        SELECT l_returnflag, covar_pop(CAST(l_quantity AS BIGINT),
               CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS cov
        FROM lineitem GROUP BY l_returnflag"""
    ).df().set_index("l_returnflag")
    for flag in eng.index:
        n, sx, sy, sxy = (
            eng.loc[flag, "n_rows"],
            eng.loc[flag, "sum_x"],
            eng.loc[flag, "sum_y"],
            eng.loc[flag, "sum_xy"],
        )
        cov = (sxy - sx * sy / n) / n
        assert cov == pytest.approx(ref.loc[flag, "cov"], rel=1e-12)


def test_events_pivot_counts_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.analytics import events_pivot_counts

    got = _norm(events_pivot_counts(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            """
        SELECT user_id,
               CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
               CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
               CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
               CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM events GROUP BY user_id"""
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want)


def test_events_pivot_unknown_type_fails_loudly(ray_session, tmp_path):
    from pdfredact_ray.pipelines.analytics import events_pivot_counts
    import pyarrow.parquet as pq
    import ray.exceptions

    t = pa.table(
        {
            "user_id": pa.array([1, 2], pa.int64()),
            "event_type": pa.array(["click", "mystery"]),
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, os.path.join(sf, "events.parquet"))
    with pytest.raises(Exception, match="mystery"):
        events_pivot_counts(sf).materialize()


def test_trailing_hour_includes_peers_and_bound(ray_session, tmp_path):
    """RANGE-window semantics: rows exactly 1h back are IN the frame
    (inclusive lower bound) and same-timestamp peers share one frame."""
    from pdfredact_ray.pipelines.analytics import events_trailing_hour

    import pyarrow.parquet as pq

    base = np.datetime64("2026-01-01T12:00:00", "us")
    hour = np.timedelta64(1, "h")
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([7, 7, 7, 7, 7], pa.int64()),
            # e1 at t0; e2 exactly 1h later (frame includes e1);
            # e3/e4 peers at t0+90min (each sees BOTH peers + e2);
            # e5 at t0+2h31m (frame back to t0+1h31m: only itself)
            "ts": pa.array(
                [
                    base,
                    base + hour,
                    base + np.timedelta64(90, "m"),
                    base + np.timedelta64(90, "m"),
                    base + np.timedelta64(151, "m"),
                ]
            ),
            "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0]),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = {
        r["event_id"]: (r["trail_sum_cents"], r["trail_n"])
        for r in events_trailing_hour(str(tmp_path)).take_all()
    }
    assert got[1] == (100, 1)
    assert got[2] == (300, 2)  # inclusive: e1 at exactly -1h is in frame
    assert got[3] == (1400, 3) and got[4] == (1400, 3)  # peers share frame
    assert got[5] == (1600, 1)


def test_quality_percentile_filter_threshold_rule(ray_session):
    """The kept set is exactly the >= percentile_disc(p) subset, and the
    threshold value itself appears in the kept set (disc, not interpolated)."""
    from pdfredact_ray.pipelines.analytics import quality_percentile_filter

    got = quality_percentile_filter(SF, p=0.5).to_pandas()
    want = (
        _con()
        .execute(
            r"""
        WITH c AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                     '(?i)\b(the|and|of|to|a|in|is|for|on|with|as|at|by|it|that|this|be|are|was|or)\b'
                   )) * 1000 // greatest(len(regexp_extract_all(text, '\S+')), 1) AS BIGINT)
                     AS stop_permille
            FROM documents
        )
        SELECT doc_id, stop_permille FROM c
        WHERE stop_permille >= (
            SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY stop_permille) FROM c
        )"""
        )
        .df()
    )
    assert set(got["doc_id"]) == set(want["doc_id"])
    assert got["stop_permille"].min() in set(got["stop_permille"])


def test_q3_shipping_priority_deterministic_and_ordered(ray_session):
    from pdfredact_ray.pipelines.relational import q3_shipping_priority

    t1 = q3_shipping_priority(SF, k=5)
    t2 = q3_shipping_priority(SF, k=5)
    assert t1.equals(t2)
    rev = t1.column("revenue_cents").to_pylist()
    assert rev == sorted(rev, reverse=True)
    assert t1.num_rows == 5


def test_user_daily_retention_transitions(ray_session, tmp_path):
    """Hand-built calendar: day gaps break retention, consecutive days count,
    and multiple same-day events dedupe to one active user."""
    import pyarrow.parquet as pq

    d = np.datetime64("2026-02-01T08:00:00", "us")
    day = np.timedelta64(1, "D")
    rows = []
    # user 1 active on days 0,1,3 (retained on 0 only); user 2 on days 0,1,2
    # (retained on 0 and 1); user 2 has two events on day 0 (must dedupe)
    for uid, offsets in ((1, [0, 1, 3]), (2, [0, 0, 1, 2])):
        for o in offsets:
            rows.append((uid, d + o * day))
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows]),
            "event_type": pa.array(["x"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    from pdfredact_ray.pipelines.analytics import user_daily_retention

    got = {
        r["day"]: (r["n_active"], r["n_retained"])
        for r in user_daily_retention(str(tmp_path)).take_all()
    }
    assert got == {
        "2026-02-01": (2, 2),
        "2026-02-02": (2, 1),
        "2026-02-03": (1, 0),
        "2026-02-04": (1, 0),
    }


def test_user_funnel_depth_sequence_rules(ray_session, tmp_path):
    """Order matters: a click BEFORE the first view doesn't advance the
    funnel; a same-timestamp step does; step-free users report depth 0."""
    import pyarrow.parquet as pq

    t0 = np.datetime64("2026-03-01T00:00:00", "us")
    m = np.timedelta64(1, "m")
    rows = [
        # user 1: click at t0, view at t0+1, purchase t0+2 -> click precedes
        # view so depth stops at 1 (view only... no click AFTER view)
        (1, "click", t0), (1, "view", t0 + m), (1, "purchase", t0 + 2 * m),
        # user 2: full ordered funnel
        (2, "view", t0), (2, "click", t0 + m), (2, "purchase", t0 + 2 * m),
        # user 3: view and click share one timestamp -> ties progress
        (3, "view", t0), (3, "click", t0), (3, "purchase", t0),
        # user 4: only non-step events -> depth 0
        (4, "error", t0),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "ts": pa.array([r[2] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    from pdfredact_ray.pipelines.analytics import user_funnel_depth

    got = {
        r["user_id"]: r["funnel_depth"]
        for r in user_funnel_depth(str(tmp_path)).take_all()
    }
    assert got == {1: 1, 2: 3, 3: 3, 4: 0}


def test_events_type_cooccurrence_mask_math(ray_session, tmp_path):
    """Pair counts derived from the mask histogram match hand counts, a
    never-co-occurring pair emits no row, and an explicit non-strict
    domain restriction drops out-of-domain types (the default domain now
    RAISES on them — covered by test_cooccurrence_strict_raises)."""
    import pyarrow.parquet as pq

    t0 = np.datetime64("2026-04-01T00:00:00", "us")
    rows = [
        (1, "view"), (1, "click"), (1, "view"),      # user 1: view+click
        (2, "view"), (2, "purchase"),                # user 2: view+purchase
        (3, "view"), (3, "click"), (3, "purchase"),  # user 3: all three
        (4, "weird-unknown-type"),                   # ignored entirely
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "ts": pa.array([t0] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    from pdfredact_ray.pipelines.analytics import events_type_cooccurrence

    got = {
        (r["type_a"], r["type_b"]): r["n_users"]
        for r in events_type_cooccurrence(str(tmp_path), strict=False).take_all()
    }
    assert got == {
        ("click", "view"): 2,
        ("purchase", "view"): 2,
        ("click", "purchase"): 1,
    }


def test_orders_monthly_growth_deltas(ray_session, tmp_path):
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([1, 1, 1, 1], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 4),
            "o_totalprice": pa.array([10.0, 5.0, 20.0, 2.505]),
            "o_orderdate": pa.array(
                [
                    np.datetime64("2026-01-05", "us"),
                    np.datetime64("2026-01-20", "us"),
                    np.datetime64("2026-02-01", "us"),
                    np.datetime64("2026-04-15", "us"),  # month gap: delta vs Feb
                ]
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * 4),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "orders.parquet"))
    from pdfredact_ray.pipelines.analytics import orders_monthly_growth

    got = {
        r["month"]: (r["revenue_cents"], r["delta_cents"])
        for r in orders_monthly_growth(str(tmp_path)).take_all()
    }
    assert got == {
        "2026-01": (1500, 0),  # first month delta pinned to 0
        "2026-02": (2000, 500),
        "2026-04": (250, -1750),  # floor(2.505*100)=250; negative delta
    }


def test_join_partitions_scales_with_volume():
    """Exchange-volume-aware join sizing: the measured few-partitions floor
    at skinny sizes, ~cores in the middle, and unbounded growth past the
    per-partition byte ceiling (memory-bound regime)."""
    from pdfredact_ray.pipelines.relational import (
        JOIN_PARTITION_MAX_BYTES,
        join_partitions,
    )

    assert join_partitions(150_000) == 8  # sf0.1 finding preserved
    mid = join_partitions(200_000_000)
    assert 8 < mid <= 64  # grows toward cores x2
    huge_rows = 200_000_000_000
    huge = join_partitions(huge_rows)
    assert huge > 64
    assert huge_rows * 24 / huge <= JOIN_PARTITION_MAX_BYTES  # per-partition bound


def _planted_whale_events(tmp_path, n=120_000, whale_share=0.3, seed=7):
    """Synthetic events dir with one user owning ~whale_share of all rows."""
    import os

    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n_whale = int(n * whale_share)
    uid = np.concatenate(
        [np.full(n_whale, 1, np.int64), rng.integers(2, 2000, size=n - n_whale)]
    )
    types = np.array(["view", "click", "purchase", "error", "signup"], dtype=object)
    et = types[rng.integers(0, 5, size=n)]
    ts = rng.integers(1_700_000_000_000_000, 1_700_900_000_000_000, size=n)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(rng.random(n) * 40.0, pa.float64()),
        }
    )
    d = str(tmp_path / "whale_sf")
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    return d, tbl


def test_funnel_distributed_path_matches_on_planted_whale(ray_session, tmp_path):
    """Forced chained-min-join path == per-user map_groups path on a corpus
    where ONE user owns 30% of all events (the whale that motivates the
    distributed shape), and both match a pure-pandas reference."""
    import pdfredact_ray.pipelines.analytics as A

    d, tbl = _planted_whale_events(tmp_path)
    fast = (
        A.user_funnel_depth(d).to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    saved = A.FUNNEL_GROUP_MAX_EVENTS
    try:
        A.FUNNEL_GROUP_MAX_EVENTS = 0
        dist = (
            A.user_funnel_depth(d)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
    finally:
        A.FUNNEL_GROUP_MAX_EVENTS = saved
    pd.testing.assert_frame_equal(fast, dist)

    # independent reference: per-user sequential scan in pandas
    df = tbl.to_pandas()
    exp = {}
    for u, g in df.groupby("user_id"):
        g = g.sort_values("ts")
        cutoff, depth = None, 0
        for step in ("view", "click", "purchase"):
            cand = g[g.event_type == step].ts
            if cutoff is not None:
                cand = cand[cand >= cutoff]
            if len(cand) == 0:
                break
            cutoff = cand.iloc[0]
            depth += 1
        exp[u] = depth
    got = dict(zip(fast.user_id, fast.funnel_depth))
    assert got == exp


def test_asof_distributed_path_matches_on_planted_whale(ray_session, tmp_path):
    """Forced time-windowed as-of path == per-user path on the planted
    whale corpus, and both match DuckDB's native ASOF LEFT JOIN."""
    import duckdb

    import pdfredact_ray.pipelines.relational as R

    d, tbl = _planted_whale_events(tmp_path)

    def norm(df):
        return df.sort_values("event_id").reset_index(drop=True)

    fast = norm(R.events_asof_view(d).to_pandas())
    saved = R.ASOF_GROUP_MAX_EVENTS
    try:
        R.ASOF_GROUP_MAX_EVENTS = 0
        dist = norm(R.events_asof_view(d).to_pandas())
    finally:
        R.ASOF_GROUP_MAX_EVENTS = saved
    pd.testing.assert_frame_equal(fast, dist)

    con = duckdb.connect()
    con.register("events", tbl)
    exp = norm(
        con.execute(
            """
        SELECT p.event_id, p.user_id, v.ts AS last_view_ts,
               CASE WHEN v.ts IS NULL THEN NULL
                    ELSE epoch_us(p.ts) - epoch_us(v.ts) END AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts <= p.ts
        """
        ).df()
    )
    got = dist.copy()
    exp["gap_us"] = exp["gap_us"].astype("float64")
    got["gap_us"] = got["gap_us"].astype("float64")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_asof_distributed_on_real_table(ray_session):
    """Forced distributed as-of over the sf0.001 events table equals the
    per-user path row for row."""
    import pdfredact_ray.pipelines.relational as R

    sf = "/root/testdata/sf0.001"
    fast = R.events_asof_view(sf).to_pandas().sort_values("event_id").reset_index(drop=True)
    saved = R.ASOF_GROUP_MAX_EVENTS
    try:
        R.ASOF_GROUP_MAX_EVENTS = 0
        dist = R.events_asof_view(sf).to_pandas().sort_values("event_id").reset_index(drop=True)
    finally:
        R.ASOF_GROUP_MAX_EVENTS = saved
    pd.testing.assert_frame_equal(fast, dist)


def test_retention_windowed_shape_on_planted_whale(ray_session, tmp_path):
    """The composite (user, 32-day-window) retention shape — boundary-day
    shadow replication included — matches a pure-pandas reference on the
    planted whale corpus."""
    import pdfredact_ray.pipelines.analytics as A

    d, tbl = _planted_whale_events(tmp_path, n=80_000)
    got = (
        A.user_daily_retention(d).to_pandas().sort_values("day").reset_index(drop=True)
    )
    df = tbl.to_pandas()
    ud = df.assign(day=df.ts.dt.floor("D"))[["user_id", "day"]].drop_duplicates()
    active = set(zip(ud.user_id, ud.day))
    ud["retained"] = [
        int((u, dy + pd.Timedelta(days=1)) in active)
        for u, dy in zip(ud.user_id, ud.day)
    ]
    exp = (
        ud.groupby(ud.day.dt.strftime("%Y-%m-%d"))
        .agg(n_active=("user_id", "size"), n_retained=("retained", "sum"))
        .reset_index()
        .rename(columns={"day": "day"})
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert list(got.day) == list(exp.day)
    assert list(got.n_active) == list(exp.n_active)
    assert list(got.n_retained) == list(exp.n_retained)


def test_cooccurrence_strict_raises_on_unknown_type(ray_session, tmp_path):
    """The default known-domain mode fails LOUDLY when the data contains an
    event_type outside it (no silent drops); types=None derives the domain
    and succeeds."""
    import os

    import pyarrow.parquet as pq

    import pdfredact_ray.pipelines.analytics as A

    d = str(tmp_path / "cooc_sf")
    os.makedirs(d)
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "event_type": pa.array(["view", "mystery", "view"], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    with pytest.raises(Exception) as ei:
        A.events_type_cooccurrence(d).materialize()
    assert "mystery" in str(ei.value)
    out = A.events_type_cooccurrence(d, types=None).to_pandas()
    assert set(out.columns) == {"type_a", "type_b", "n_users"}
