"""Relational-join operators vs independent DuckDB recomputes at sf0.001,
plus synthetic edge/skew cases the test tables don't exercise: a user with
purchases but no views (NULL as-of match), equal timestamps (ts >= ties),
and a whale user holding most of the events."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(SF, t + '.parquet')}')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_orders_by_segment_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.relational import orders_by_segment

    got = _norm(orders_by_segment(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            """
        SELECT c_mktsegment,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
               CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"""
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want)


def test_revenue_by_priority_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.relational import revenue_by_priority

    got = _norm(revenue_by_priority(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            """
        WITH rev AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem GROUP BY l_orderkey)
        SELECT o_orderpriority, CAST(SUM(revenue_cents) AS BIGINT) AS revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM rev JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority"""
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want)


def test_events_asof_view_matches_duckdb_native_asof(ray_session):
    from pdfredact_ray.pipelines.relational import events_asof_view

    got = _norm(events_asof_view(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            """
        SELECT p.event_id, p.user_id, v.ts AS last_view_ts,
               CASE WHEN v.ts IS NULL THEN NULL
                    ELSE date_diff('microsecond', v.ts, p.ts) END AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts"""
        )
        .df()
    )
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got.astype(str), want.astype(str))
    # LEFT semantics hold: purchases survive even when a user has no views
    assert (got["last_view_ts"].isna() == got["gap_us"].isna()).all()


def _synthetic_events(tmp_path, rows):
    d = tmp_path / "sfx"
    d.mkdir()
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_asof_edges_no_view_equal_ts_whale(ray_session, tmp_path):
    """user 1: purchase before any view (NULL) + equal-ts view (>= tie
    matches); user 2: purchases only; user 3: a whale with 10k views."""
    from pdfredact_ray.pipelines.relational import events_asof_view

    us = 1_000_000  # 1s in microseconds
    rows = [
        (0, 5 * us, 1, "purchase"),   # before user 1's first view -> NULL
        (1, 10 * us, 1, "view"),
        (2, 10 * us, 1, "purchase"),  # ts == view ts -> matches (>=)
        (3, 20 * us, 1, "purchase"),  # latest view at 10s
        (4, 7 * us, 2, "purchase"),   # user 2 has no views at all
    ]
    rows += [(100 + i, i * us, 3, "view") for i in range(10_000)]
    rows.append((99_999, 10_000 * us, 3, "purchase"))
    sfx = _synthetic_events(tmp_path, rows)

    got = (
        events_asof_view(sfx)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert pd.isna(got.loc[0, "gap_us"])
    assert got.loc[2, "gap_us"] == 0  # equal ts counts as <=
    assert got.loc[3, "gap_us"] == 10 * us
    assert pd.isna(got.loc[4, "gap_us"])
    # whale: latest of 10k views (ts = 9999s) against the 10000s purchase
    assert got.loc[99_999, "gap_us"] == 1 * us
    assert len(got) == 5  # one output row per purchase, nothing dropped


def test_local_supplier_volume_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.relational import local_supplier_volume

    con = _con()
    for t in ("supplier", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(SF, t + '.parquet')}')"
        )
    got = _norm(local_supplier_volume(SF).to_pandas())
    want = _norm(
        con.execute(
            """
        SELECT n_name,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
        GROUP BY n_name"""
        ).df()
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_events_props_extract_matches_and_nulls_malformed(ray_session, tmp_path):
    from pdfredact_ray.pipelines.relational import events_props_extract

    got = _norm(events_props_extract(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events"
        )
        .df()
    )
    pd.testing.assert_frame_equal(got.astype(str), want.astype(str))

    # rows without the key (or with junk) yield NULL, never an error
    sfx = _synthetic_events(tmp_path, [(0, 0, 1, "view"), (1, 1, 1, "view")])
    t = pq.read_table(os.path.join(sfx, "events.parquet"))
    t = t.set_column(
        t.schema.get_field_index("props"),
        "props",
        pa.array(['{"other": 1}', "not json"], pa.string()),
    )
    pq.write_table(t, os.path.join(sfx, "events.parquet"))
    out = events_props_extract(sfx).to_pandas()
    assert out["k"].isna().all()


def test_top_orders_per_priority_matches_window_oracle(ray_session):
    from pdfredact_ray.pipelines.relational import top_orders_per_priority

    got = _norm(top_orders_per_priority(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            """
        SELECT o_orderpriority, o_orderkey, total_cents, rank FROM (
            SELECT o_orderpriority, o_orderkey,
                   CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS total_cents,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY CAST(FLOOR(o_totalprice * 100) AS BIGINT) DESC,
                                o_orderkey ASC) AS BIGINT) AS rank
            FROM orders) WHERE rank <= 3"""
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want)


def test_orders_by_segment_dangling_fk_fails_loudly(ray_session, tmp_path):
    """A fact key missing from the broadcast dim must raise, not silently
    mis-aggregate (searchsorted would otherwise alias a neighbor key)."""
    import ray
    from pdfredact_ray.pipelines.relational import orders_by_segment

    d = tmp_path / "sfy"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_name": pa.array(["a", "b"]),
                "c_nationkey": pa.array([0, 0], pa.int64()),
                "c_acctbal": pa.array([0.0, 0.0]),
                "c_mktsegment": pa.array(["X", "Y"]),
            }
        ),
        str(d / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10], pa.int64()),
                "o_custkey": pa.array([99], pa.int64()),  # dangling
                "o_orderstatus": pa.array(["O"]),
                "o_totalprice": pa.array([5.0]),
                "o_orderdate": pa.array(["2024-01-01"]),
                "o_orderpriority": pa.array(["1-URGENT"]),
            }
        ),
        str(d / "orders.parquet"),
    )
    with pytest.raises(ray.exceptions.RayTaskError):
        orders_by_segment(str(d)).materialize()


def test_orders_rank_in_customer_matches_window(ray_session):
    from pdfredact_ray.pipelines.relational import orders_rank_in_customer

    got = _norm(orders_rank_in_customer(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            """
        SELECT o_orderkey, o_custkey,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS total_cents,
               CAST(ROW_NUMBER() OVER (
                    PARTITION BY o_custkey
                    ORDER BY FLOOR(o_totalprice * 100) DESC, o_orderkey
               ) AS BIGINT) AS price_rank
        FROM orders"""
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want)


def test_orders_rank_ties_and_bucket_sharing(ray_session, tmp_path):
    """Two customers that land in the SAME bucket (keys 7 and 7+64), with
    exact cent ties inside one customer: ranks must restart per customer
    and break ties by orderkey ascending."""
    from pdfredact_ray.pipelines.relational import orders_rank_in_customer

    t = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 10, 11], pa.int64()),
            "o_custkey": pa.array([7, 7, 7, 71, 71], pa.int64()),
            # orders 1 and 3 tie at 5.00 -> ranks 1, 2 by orderkey
            "o_totalprice": pa.array([5.0, 1.0, 5.0, 2.0, 9.0]),
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, os.path.join(sf, "orders.parquet"))
    got = orders_rank_in_customer(sf).to_pandas().set_index("o_orderkey")
    assert got.loc[1, "price_rank"] == 1 and got.loc[3, "price_rank"] == 2
    assert got.loc[2, "price_rank"] == 3
    assert got.loc[11, "price_rank"] == 1 and got.loc[10, "price_rank"] == 2


def test_orders_above_customer_avg_matches_duckdb(ray_session):
    from pdfredact_ray.pipelines.relational import orders_above_customer_avg

    got = _norm(orders_above_customer_avg(SF).to_pandas())
    want = _norm(
        _con()
        .execute(
            """
        WITH s AS (
            SELECT o_custkey AS k, COUNT(*) AS n,
                   SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS sc
            FROM orders GROUP BY 1
        )
        SELECT o_orderkey, o_custkey,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS total_cents
        FROM orders JOIN s ON o_custkey = s.k
        WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT) * n > sc"""
        )
        .df()
    )
    pd.testing.assert_frame_equal(got, want)


def test_orders_above_avg_strict_excludes_single_order_customer(ray_session, tmp_path):
    """A single-order customer equals its own average exactly — the STRICT
    > must exclude it; a two-order customer keeps only the higher order."""
    from pdfredact_ray.pipelines.relational import orders_above_customer_avg

    t = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([5, 9, 9], pa.int64()),
            "o_totalprice": pa.array([4.0, 1.0, 3.0]),
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, os.path.join(sf, "orders.parquet"))
    got = orders_above_customer_avg(sf).to_pandas()
    assert sorted(got["o_orderkey"]) == [3]


def test_broadcast_join_gate_paths_equal(ray_session):
    """The footer-row broadcast-join gate must be a pure plan choice: each
    gated query returns identical rows on the broadcast plan (default at
    test scale) and the forced shuffle plan (gate = 0)."""
    import pdfredact_ray.pipelines.relational as R

    def snap(fn):
        # both return types (Dataset, pa.Table) expose .to_pandas()
        return _norm(fn(SF).to_pandas())

    queries = [
        R.revenue_by_priority,
        R.q3_shipping_priority,
        R.customers_with_orders,
        R.customers_without_orders,
        R.local_supplier_volume,
    ]
    saved = R.BROADCAST_JOIN_MAX_ROWS
    assert saved > 0  # default must enable the broadcast plan at test scale
    try:
        bcast = [snap(q) for q in queries]
        R.BROADCAST_JOIN_MAX_ROWS = 0  # force every query onto the shuffle plan
        shuf = [snap(q) for q in queries]
    finally:
        R.BROADCAST_JOIN_MAX_ROWS = saved
    for b, s, q in zip(bcast, shuf, queries):
        pd.testing.assert_frame_equal(b, s), q.__name__
