"""Relational operators over the TPC-H-ish tables: the three join shapes a
100 TB pipeline actually uses, each in its scale-correct Ray Data form.

- ``orders_by_segment`` — BROADCAST dim join: the small side (customer) is
  ``ray.put`` once and read from the local object store per task; the fact
  side streams through ``map_batches`` with a map-side partial aggregate, so
  the only shuffle is the tiny (segment, partials) groupby. This is the
  shape for any fact ⋈ dim at scale — never a shuffle join against a
  broadcastable side.
- ``revenue_by_priority`` — BIG-BIG shuffle join: lineitem is pre-aggregated
  per orderkey inside ``map_batches`` + a bucketed vectorized combine
  (combiner BEFORE the join, so only (orderkey, revenue_cents) int rows move
  in the all-to-all), then a hash-partitioned ``Dataset.join`` with orders,
  then a second map-side partial + tiny groupby by priority. At 100 TB both
  exchanges move two-int-column blocks, not lineitem rows.
- ``events_asof_view`` — AS-OF join (an operator Ray Data lacks natively):
  for each purchase event, the latest view event by the same user at
  ``view.ts <= purchase.ts``. Expressed as ``groupby(user_id).map_groups``
  with an in-group sort + vectorized ``np.searchsorted`` — the partitioning
  assumption is per-user locality (same as sessionize); a whale user is one
  group, acceptable because per-user event counts are bounded in this corpus
  (documented, and the sessionize two-stage split applies if that breaks).

Money is aggregated as floor-cents int64 (the ``lineitem_agg`` convention):
order-independent integer sums that the DuckDB oracles reproduce bit-exactly.
"""

from __future__ import annotations

import os

import numpy as np

from pdfredact_ray.functions.ints import group_sum
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from pdfredact_ray.pipelines.redact import default_concurrency

# ---------------------------------------------------------------- join sizing
# Exchange-volume-aware Dataset.join partition sizing (replaces the fixed
# max(8, cores // 3) that encoded only the sf0.1 measurement).
JOIN_PARTITION_TARGET_BYTES = 64 << 20  # ~64 MB of exchange per partition
JOIN_PARTITION_MAX_BYTES = 512 << 20  # hard per-partition ceiling


def _table_rows(sf_dir: str, name: str) -> int:
    """Row count from parquet footer metadata only — no data scan."""
    import pyarrow.dataset as pads

    return pads.dataset(
        os.path.join(sf_dir, f"{name}.parquet"), format="parquet"
    ).count_rows()


def join_partitions(est_rows: int, row_bytes: int = 24) -> int:
    """num_partitions from the ESTIMATED exchange volume (rows x width of
    the pre-reduced payload) instead of a fixed core fraction:

    - skinny exchanges keep the measured few-partitions floor (8 beat 24
      at 150k pre-reduced rows — fixed per-partition cost dominates);
    - medium volumes approach one partition per core, capped at 2x (the
      16M-row partition sweep in BASELINE.md);
    - past ~cores x 1 GB the count keeps growing with data so no
      partition's hash-build state outgrows a worker heap — the dial that
      was missing at 100x sf0.1.

    ``est_rows`` comes from parquet footer metadata (``_table_rows``) — an
    upper bound for pre-reduced sides, which can only over-partition,
    never under-provision memory."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    est_bytes = max(0, int(est_rows)) * row_bytes
    by_target = -(-est_bytes // JOIN_PARTITION_TARGET_BYTES)  # ceil
    by_ceiling = -(-est_bytes // JOIN_PARTITION_MAX_BYTES)
    return int(max(8, min(by_target, cpus * 2), by_ceiling))


# Broadcast-vs-shuffle join planning, Spark autoBroadcastJoinThreshold-style
# but in rows: when the parquet footer row count of the join's SMALL side
# (orders/customer here — the side the query reduces to skinny keys or a
# key -> attribute dim) is at or below this, the join runs as a ray.put
# broadcast + per-batch sorted-key lookup/is_in (zero exchanges); above it,
# the hash-partitioned ``Dataset.join`` shuffle paths below are unchanged.
# 5M skinny rows ≈ low hundreds of MB in the object store — one local read
# per task on any worker. Footer metadata only, never a scan; set
# GRAFT_BROADCAST_JOIN_MAX_ROWS=0 to force every query onto its shuffle
# shape (the forced-off equality pytest does exactly that).
BROADCAST_JOIN_MAX_ROWS = int(
    os.environ.get("GRAFT_BROADCAST_JOIN_MAX_ROWS", 5_000_000)
)



def _floor_cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.cast(pc.floor(pc.multiply(col, 100.0)), pa.int64())


def orders_by_segment(sf_dir: str) -> rd.Dataset:
    """Fact ⋈ broadcast dim + aggregate: orders joined to customer market
    segment, total floor-cents and count per segment.

    customer is the broadcast side: collected once driver-side (a dim table
    is small BY DEFINITION — that is what makes it the broadcast side),
    shipped to the object store once with ``ray.put``, and looked up per
    batch via sorted-key ``np.searchsorted`` — no shuffle touches orders."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    ).sort_by("c_custkey")
    dim = {
        "keys": cust.column("c_custkey").to_numpy(),
        "segments": np.asarray(cust.column("c_mktsegment").to_pylist(), dtype=object),
    }
    dim_ref = ray.put(dim)

    def partial(t: pa.Table, ref) -> pa.Table:
        d = ref if isinstance(ref, dict) else ray.get(ref)
        keys = t.column("o_custkey").to_numpy()
        pos = np.searchsorted(d["keys"], keys)
        # every order's custkey exists in customer (FK integrity); still
        # guard the lookup so a dangling key fails loudly, not silently
        if not np.array_equal(d["keys"][pos], keys):
            raise ValueError("o_custkey missing from customer dim")
        segs = d["segments"][pos]
        cents = _floor_cents(t.column("o_totalprice")).to_numpy()
        uniq, inv = np.unique(segs, return_inverse=True)
        return pa.table(
            {
                "c_mktsegment": pa.array(uniq, type=pa.string()),
                "total_cents": pa.array(
                    group_sum(inv, len(uniq), cents), type=pa.int64()
                ),
                "order_count": pa.array(np.bincount(inv).astype(np.int64), type=pa.int64()),
            }
        )

    partials = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(partial, fn_args=(dim_ref,), batch_format="pyarrow")
    agg = partials.groupby("c_mktsegment").aggregate(Sum("total_cents"), Sum("order_count"))
    return agg.map_batches(
        lambda t: t.rename_columns(["c_mktsegment", "total_cents", "order_count"]),
        batch_format="pyarrow",
    )


def revenue_by_priority(sf_dir: str, n_buckets: int = 64) -> rd.Dataset:
    """Big-big join with a combiner on the heavy side: per-orderkey revenue
    floor-cents ⋈ orders on orderkey (hash-partitioned ``Dataset.join``),
    then revenue + order count per o_orderpriority. Revenue =
    extendedprice × (1 − discount), floored to cents per row BEFORE
    summing — order-independent and oracle-exact.

    The pre-join combine is map-side partials + a BUCKET groupby (orderkey
    mod n_buckets, one vectorized unique+add.at per bucket) rather than
    ``groupby(l_orderkey)``: Ray's sort-based aggregate keyed on millions
    of distinct orderkeys paid 3× the bucket shape's cost at sf0.1 (8.6s
    vs 2.6s) for the identical (orderkey, cents) output. Bucket count is a
    cluster dial, not a data dial — each bucket combines rows/n_buckets
    partials vectorized. Join partition count is likewise measured: at
    this pre-reduced size 8 partitions beat 24 (2.6s vs 7.3s — fixed
    per-partition cost dominates skinny data); the 16M-row sweep in
    BASELINE.md shows partitions ≈ cores winning once data dominates."""

    def li_partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            ),
            100.0,
        )
        cents = pc.cast(pc.floor(rev), pa.int64()).to_numpy()
        keys = t.column("l_orderkey").to_numpy()
        uniq, inv = np.unique(keys, return_inverse=True)
        return pa.table(
            {
                "l_orderkey": pa.array(uniq, type=pa.int64()),
                "revenue_cents": pa.array(
                    group_sum(inv, len(uniq), cents), type=pa.int64()
                ),
                "bucket": pa.array(uniq % np.int64(n_buckets), type=pa.int64()),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return g
        k = g.column("l_orderkey").to_numpy()
        v = g.column("revenue_cents").to_numpy()
        uniq, inv = np.unique(k, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, v)
        return pa.table(
            {
                "l_orderkey": pa.array(uniq, pa.int64()),
                "revenue_cents": pa.array(tot, pa.int64()),
            }
        )

    li = (
        rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
    )
    if _table_rows(sf_dir, "orders") <= BROADCAST_JOIN_MAX_ROWS:
        # broadcast plan: orders collapses to a sorted orderkey -> priority
        # code dim (ray.put once); the pre-reduced li partials look it up
        # per batch and pre-aggregate per priority — zero join exchanges,
        # only the tiny priority groupby remains
        import pyarrow.parquet as pq

        od = pq.read_table(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority"],
        ).sort_by("o_orderkey")
        # dictionary_encode, NOT np.unique over Python strings: measured
        # 0.05s vs 3.55s at 1.5M rows — the object-dtype sort was most of
        # the broadcast plan's driver cost at 10x scale
        enc = od.column("o_orderpriority").combine_chunks().dictionary_encode()
        dim_ref = ray.put(
            {
                "keys": od.column("o_orderkey").to_numpy(),
                "codes": np.asarray(enc.indices, dtype=np.int64),
                "vals": np.asarray(enc.dictionary.to_pylist(), dtype=object),
            }
        )

        def pri_partial_bcast(t: pa.Table, ref) -> pa.Table:
            d = ref if isinstance(ref, dict) else ray.get(ref)
            keys = t.column("l_orderkey").to_numpy()
            pos = np.minimum(
                np.searchsorted(d["keys"], keys), max(len(d["keys"]) - 1, 0)
            )
            if len(keys) and not (
                len(d["keys"]) and np.array_equal(d["keys"][pos], keys)
            ):
                raise ValueError("l_orderkey missing from orders dim")
            cents = t.column("revenue_cents").to_numpy()
            uniqc, inv = np.unique(d["codes"][pos], return_inverse=True)
            return pa.table(
                {
                    "o_orderpriority": pa.array(d["vals"][uniqc], type=pa.string()),
                    "revenue_cents": pa.array(
                        group_sum(inv, len(uniqc), cents), type=pa.int64()
                    ),
                    "n_orders": pa.array(
                        np.bincount(inv).astype(np.int64), type=pa.int64()
                    ),
                }
            )

        partials = li.map_batches(
            pri_partial_bcast, fn_args=(dim_ref,), batch_format="pyarrow"
        )
    else:
        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority"],
        )
        num_partitions = join_partitions(_table_rows(sf_dir, "orders"))
        joined = li.join(
            orders,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        def pri_partial(t: pa.Table) -> pa.Table:
            pri = np.asarray(t.column("o_orderpriority").to_pylist(), dtype=object)
            cents = t.column("revenue_cents").to_numpy()
            uniq, inv = np.unique(pri, return_inverse=True)
            return pa.table(
                {
                    "o_orderpriority": pa.array(uniq, type=pa.string()),
                    "revenue_cents": pa.array(
                        group_sum(inv, len(uniq), cents), type=pa.int64()
                    ),
                    "n_orders": pa.array(
                        np.bincount(inv).astype(np.int64), type=pa.int64()
                    ),
                }
            )

        partials = joined.map_batches(pri_partial, batch_format="pyarrow")

    agg = (
        partials
        .groupby("o_orderpriority")
        .aggregate(Sum("revenue_cents"), Sum("n_orders"))
    )
    return agg.map_batches(
        lambda t: t.rename_columns(["o_orderpriority", "revenue_cents", "n_orders"]),
        batch_format="pyarrow",
    )


def local_supplier_volume(sf_dir: str, region: str = "ASIA") -> rd.Dataset:
    """TPC-H Q5 shape — the flagship multi-join: revenue per nation from
    lineitems whose supplier AND customer sit in the same nation of one
    region. Composes every join strategy in this module:

    - region → nation → supplier are BROADCAST: collapsed driver-side into
      one s_suppkey → nationkey array pair (tiny by TPC-H construction),
      ``ray.put`` once; lineitem probes it per batch and rows from
      out-of-region suppliers are dropped at the SOURCE, before any shuffle.
    - lineitem ⋈ orders and ⋈ customer are BIG-BIG hash-partitioned
      ``Dataset.join``s — at 100 TB neither side broadcasts. The lineitem
      side enters the first join pre-reduced to (l_orderkey, nationkey,
      cents) partials, so the heavy exchange moves three int columns.
    - the same-nation filter (c_nationkey == supplier nationkey) runs
      vectorized right after the customer join, then a map-side partial +
      tiny groupby(n_name) finishes.
    """
    import pyarrow.parquet as pq

    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rkeys = [
        k
        for k, name in zip(
            reg.column("r_regionkey").to_pylist(), reg.column("r_name").to_pylist()
        )
        if name == region
    ]
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nation_name = {
        int(k): n
        for k, n, r in zip(
            nat.column("n_nationkey").to_pylist(),
            nat.column("n_name").to_pylist(),
            nat.column("n_regionkey").to_pylist(),
        )
        if r in rkeys
    }
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    ).sort_by("s_suppkey")
    s_keys = sup.column("s_suppkey").to_numpy()
    s_nat = sup.column("s_nationkey").to_numpy()
    in_region = np.isin(s_nat, np.asarray(sorted(nation_name), dtype=np.int64))
    dim_ref = ray.put(
        {"keys": s_keys[in_region], "nats": s_nat[in_region], "names": nation_name}
    )

    def li_partial(t: pa.Table, ref) -> pa.Table:
        d = ref if isinstance(ref, dict) else ray.get(ref)
        keys = t.column("l_suppkey").to_numpy()
        pos = np.searchsorted(d["keys"], keys)
        pos_c = np.minimum(pos, len(d["keys"]) - 1)
        hit = (len(d["keys"]) > 0) & (d["keys"][pos_c] == keys)
        if not hit.any():
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "nationkey": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
        rev = pc.multiply(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            ),
            100.0,
        )
        cents = pc.cast(pc.floor(rev), pa.int64()).to_numpy()[hit]
        okey = t.column("l_orderkey").to_numpy()[hit]
        nkey = d["nats"][pos_c[hit]]
        # partial-combine on the compound key before the shuffle
        comp = okey * 64 + nkey  # nationkey < 25 << 64
        uniq, inv = np.unique(comp, return_inverse=True)
        return pa.table(
            {
                "l_orderkey": pa.array(uniq // 64, type=pa.int64()),
                "nationkey": pa.array(uniq % 64, type=pa.int64()),
                "revenue_cents": pa.array(
                    group_sum(inv, len(uniq), cents), type=pa.int64()
                ),
            }
        )

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, fn_args=(dim_ref,), batch_format="pyarrow")

    if (
        _table_rows(sf_dir, "orders") <= BROADCAST_JOIN_MAX_ROWS
        and _table_rows(sf_dir, "customer") <= BROADCAST_JOIN_MAX_ROWS
    ):
        # broadcast plan: orders ⋈ customer collapses driver-side into one
        # sorted o_orderkey -> c_nationkey dim (both footer gates passed,
        # ray.put once); the pre-reduced li partials probe it per batch,
        # apply the same-nation filter, and pre-aggregate per nation —
        # BOTH big-big exchanges disappear, leaving only the ≤25-row
        # groupby(n_name)
        ot = pq.read_table(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey"],
        ).sort_by("o_orderkey")
        ct = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_nationkey"],
        ).sort_by("c_custkey")
        ckeys = ct.column("c_custkey").to_numpy()
        cnats = ct.column("c_nationkey").to_numpy().astype(np.int64)
        okeys = ot.column("o_orderkey").to_numpy()
        ocust = ot.column("o_custkey").to_numpy()
        if len(ckeys):
            cpos = np.minimum(np.searchsorted(ckeys, ocust), len(ckeys) - 1)
            ohit = ckeys[cpos] == ocust  # inner join: orphan orders drop
            odim = {"keys": okeys[ohit], "cnats": cnats[cpos[ohit]]}
        else:
            odim = {"keys": okeys[:0], "cnats": cnats[:0]}
        odim_ref = ray.put(odim)

        def nat_partial_bcast(t: pa.Table, ref, oref) -> pa.Table:
            empty = pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
            if t.num_columns == 0 or t.num_rows == 0:
                return empty
            d = ref if isinstance(ref, dict) else ray.get(ref)
            od = oref if isinstance(oref, dict) else ray.get(oref)
            if len(od["keys"]) == 0:
                return empty
            keys = t.column("l_orderkey").to_numpy()
            pos = np.minimum(np.searchsorted(od["keys"], keys), len(od["keys"]) - 1)
            nkey = t.column("nationkey").to_numpy()
            same = (od["keys"][pos] == keys) & (od["cnats"][pos] == nkey)
            nkey = nkey[same]
            cents = t.column("revenue_cents").to_numpy()[same]
            uniq, inv = np.unique(nkey, return_inverse=True)
            return pa.table(
                {
                    "n_name": pa.array(
                        [d["names"][int(k)] for k in uniq], type=pa.string()
                    ),
                    "revenue_cents": pa.array(
                        group_sum(inv, len(uniq), cents), type=pa.int64()
                    ),
                }
            )

        partials = li.map_batches(
            nat_partial_bcast, fn_args=(dim_ref, odim_ref), batch_format="pyarrow"
        )
    else:
        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
        )
        # measured at the pre-reduced join sizes: 8 partitions beat 24 (fixed
        # per-partition cost dominates skinny int data); grows with cores
        num_partitions = join_partitions(
            max(_table_rows(sf_dir, "orders"), _table_rows(sf_dir, "customer"))
        )
        j1 = li.join(
            orders,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        customer = rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
        )
        j2 = j1.join(
            customer,
            join_type="inner",
            num_partitions=num_partitions,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )

        def nat_partial(t: pa.Table, ref) -> pa.Table:
            d = ref if isinstance(ref, dict) else ray.get(ref)
            same = pc.equal(t.column("nationkey"), t.column("c_nationkey"))
            t = t.filter(same)
            nkey = t.column("nationkey").to_numpy()
            cents = t.column("revenue_cents").to_numpy()
            uniq, inv = np.unique(nkey, return_inverse=True)
            return pa.table(
                {
                    "n_name": pa.array([d["names"][int(k)] for k in uniq], type=pa.string()),
                    "revenue_cents": pa.array(
                        group_sum(inv, len(uniq), cents), type=pa.int64()
                    ),
                }
            )

        partials = j2.map_batches(nat_partial, fn_args=(dim_ref,), batch_format="pyarrow")

    agg = partials.groupby("n_name").aggregate(Sum("revenue_cents"))
    return agg.map_batches(
        lambda t: t.rename_columns(["n_name", "revenue_cents"]), batch_format="pyarrow"
    )


def events_props_extract(sf_dir: str) -> rd.Dataset:
    """Semi-structured field extraction: pull the integer ``k`` out of the
    ``props`` JSON column for every event, typed BIGINT with NULL for rows
    where the key is absent/malformed. The hot path is one vectorized
    ``pc.extract_regex`` kernel over the Arrow string column — zero
    per-row Python, the scale shape for flat-schema JSON columns (a full
    parser actor-pool stage is only warranted for nested payloads)."""
    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "props"]
    )

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), pattern=r'"k"\s*:\s*(?P<v>-?\d+)')
        v = pc.if_else(
            pc.is_valid(m),
            pc.cast(pc.struct_field(m, "v"), pa.int64()),
            pa.scalar(None, pa.int64()),
        )
        return pa.table({"event_id": t.column("event_id"), "k": v})

    return ev.map_batches(extract, batch_format="pyarrow")


def top_orders_per_priority(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Grouped top-k without a global sort: per-batch partial top-k per
    priority (each batch forwards at most ``k × n_priorities`` rows), then a
    tiny ``groupby(priority).map_groups`` final top-k. The all-to-all moves
    O(k × groups × batches) rows — independent of table size — instead of
    the full orders table a naive sort-then-head would shuffle. Ties break
    (cents DESC, orderkey ASC), mirrored exactly in the SQL oracle."""
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = _floor_cents(t.column("o_totalprice")).to_numpy()
        okey = t.column("o_orderkey").to_numpy()
        pri = np.asarray(t.column("o_orderpriority").to_pylist(), dtype=object)
        keep = np.zeros(len(okey), dtype=bool)
        for p in np.unique(pri):
            idx = np.flatnonzero(pri == p)
            order = np.lexsort((okey[idx], -cents[idx]))[:k]
            keep[idx[order]] = True
        return pa.table(
            {
                "o_orderpriority": pa.array(pri[keep], type=pa.string()),
                "o_orderkey": pa.array(okey[keep], type=pa.int64()),
                "total_cents": pa.array(cents[keep], type=pa.int64()),
            }
        )

    def final(g: pa.Table) -> pa.Table:
        cents = g.column("total_cents").to_numpy()
        okey = g.column("o_orderkey").to_numpy()
        order = np.lexsort((okey, -cents))[:k]
        return pa.table(
            {
                "o_orderpriority": g.column("o_orderpriority").take(pa.array(order)),
                "o_orderkey": pa.array(okey[order], type=pa.int64()),
                "total_cents": pa.array(cents[order], type=pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1), type=pa.int64()),
            }
        )

    return (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(final, batch_format="pyarrow")
    )


# Above this many events (parquet-footer metadata), events_asof_view
# switches to the time-windowed distributed shape where no per-user group
# ever materializes.
ASOF_GROUP_MAX_EVENTS = 50_000_000

ASOF_WINDOW_US = np.int64(86_400_000_000)  # 1-day as-of windows
ASOF_SALTS = 64


def _asof_view_distributed(sf_dir: str, window_us: int = ASOF_WINDOW_US) -> rd.Dataset:
    """Whale-proof AS-OF join — (user, time-window) segments instead of
    per-user groups:

    1. ONE salted groupby over composite (user, window) segments. Inside a
       salt group, "latest view <= purchase ts" within each segment is a
       SEGMENTED running max — fully vectorized via the monotone-base trick
       ``np.maximum.accumulate(seg * BIG + view_ts_offset)`` (later
       segments' bases dominate, so no cross-segment leakage and no reset
       loop). Purchases matched in-window finish here. Every segment also
       emits a (user, window, max_view_ts) summary and its unmatched
       purchases.
    2. A tiny ``groupby(user)`` over the WINDOW SUMMARIES (rows bounded by
       time-span/window per user, never by event count) computes each
       window's strict-predecessor best view ts (prefix max + shift).
    3. Unmatched purchases HASH-JOIN that (user, window, prev_best) table —
       a join spreads a hot user's probe rows across partitions, unlike a
       group. A view in an earlier window is always <= the purchase ts, so
       the match needs no further filtering.

    Exactness is pinned against the per-user path by a forced-gate planted
    whale pytest and the shared DuckDB ASOF JOIN oracle."""
    W = np.int64(window_us)
    NS = np.int64(ASOF_SALTS)
    WBITS = np.int64(21)  # window index < 2^21 (~5700 years of days)

    def prep(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy()
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        uid = t.column("user_id").to_numpy().astype(np.int64)
        comp = uid * (np.int64(1) << WBITS) + ts // W
        is_view = pc.equal(t.column("event_type"), "view").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "comp": pa.array(comp, pa.int64()),
                "salt": pa.array(comp % NS, pa.int64()),
                "event_id": t.column("event_id"),
                "ts_i": pa.array(ts, pa.int64()),
                "is_view": pa.array(is_view.astype(np.int8), pa.int8()),
            }
        )

    def per_salt(g: pa.Table) -> pa.Table:
        """Emit kind=0 done purchases / kind=1 unmatched purchases /
        kind=2 per-segment summaries, one unified schema."""
        empty = pa.table(
            {
                "kind": pa.array([], pa.int8()),
                "comp": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "ts_i": pa.array([], pa.int64()),
                "matched": pa.array([], pa.int64()),
            }
        )
        if g.num_columns == 0 or g.num_rows == 0:
            return empty
        comp = g.column("comp").to_numpy()
        eid = g.column("event_id").to_numpy()
        ts = g.column("ts_i").to_numpy()
        isv = g.column("is_view").to_numpy().astype(bool)
        # views first at equal ts (<= semantics), segments contiguous
        order = np.lexsort((~isv, ts, comp))
        comp, eid, ts, isv = comp[order], eid[order], ts[order], isv[order]
        seg = np.cumsum(np.r_[0, comp[1:] != comp[:-1]]).astype(np.int64)
        base = ts.min()
        v_fill = np.where(isv, ts - base + 1, 0).astype(np.int64)
        big = np.int64(int(ts.max()) - int(base) + 2)
        acc = np.maximum.accumulate(seg * big + v_fill)
        last_v = acc - seg * big  # 0 = no view yet in this segment
        starts = np.flatnonzero(np.r_[True, comp[1:] != comp[:-1]])
        # per-segment summary: max view offset (0 if the window has none)
        seg_max_v = np.maximum.reduceat(v_fill, starts)
        p_mask = ~isv
        matched_off = last_v[p_mask]
        done = matched_off > 0
        out_kind = [
            np.zeros(int(done.sum()), np.int8),
            np.ones(int((~done).sum()), np.int8),
            np.full(len(starts), 2, np.int8),
        ]
        out_comp = [comp[p_mask][done], comp[p_mask][~done], comp[starts]]
        out_eid = [eid[p_mask][done], eid[p_mask][~done], np.zeros(len(starts), np.int64)]
        out_ts = [ts[p_mask][done], ts[p_mask][~done], np.zeros(len(starts), np.int64)]
        out_match = [
            (matched_off[done] + base - 1).astype(np.int64),
            np.zeros(int((~done).sum()), np.int64),
            np.where(seg_max_v > 0, seg_max_v + base - 1, np.int64(-1)),
        ]
        return pa.table(
            {
                "kind": pa.array(np.concatenate(out_kind), pa.int8()),
                "comp": pa.array(np.concatenate(out_comp), pa.int64()),
                "event_id": pa.array(np.concatenate(out_eid), pa.int64()),
                "ts_i": pa.array(np.concatenate(out_ts), pa.int64()),
                "matched": pa.array(np.concatenate(out_match), pa.int64()),
            }
        )

    staged = (
        rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        .filter(expr="event_type == 'purchase' or event_type == 'view'")
        .map_batches(prep, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(per_salt, batch_format="pyarrow")
        .materialize()  # consumed by three downstream filters
    )

    def prev_best(gu: pa.Table) -> pa.Table:
        """Per user: strict-predecessor running max of window view bests."""
        if gu.num_columns == 0 or gu.num_rows == 0:
            return pa.table(
                {"comp": pa.array([], pa.int64()), "prev": pa.array([], pa.int64())}
            )
        comp = gu.column("comp").to_numpy()
        best = gu.column("matched").to_numpy()
        order = np.argsort(comp, kind="stable")
        comp_s, best_s = comp[order], best[order]
        run = np.maximum.accumulate(best_s)
        prev = np.r_[np.int64(-1), run[:-1]]
        return pa.table(
            {"comp": pa.array(comp_s, pa.int64()), "prev": pa.array(prev, pa.int64())}
        )

    summaries = staged.filter(expr="kind == 2").map_batches(
        # groupby/map_groups stages can emit zero-column empty tables on
        # degenerate inputs — pass them through like per_salt's own guard
        lambda t: t
        if t.num_columns == 0
        else pa.table(
            {
                "comp": t.column("comp"),
                "matched": t.column("matched"),
                "user_id": pa.array(
                    t.column("comp").to_numpy() >> WBITS, pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    prev_tbl = summaries.groupby("user_id").map_groups(prev_best, batch_format="pyarrow")

    unmatched = staged.filter(expr="kind == 1")
    joined = unmatched.join(
        prev_tbl,
        join_type="inner",  # every (user, window) with a purchase has a summary
        num_partitions=join_partitions(_table_rows(sf_dir, "events") // 8, row_bytes=16),
        on=("comp",),
    )

    def finish_unmatched(t: pa.Table) -> pa.Table:
        uid = t.column("comp").to_numpy() >> WBITS
        prev = t.column("prev").to_numpy()
        ts = t.column("ts_i").to_numpy()
        ok = prev >= 0
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": pa.array(uid, pa.int64()),
                "last_view_ts": pa.array(
                    [int(p) if o else None for p, o in zip(prev, ok)],
                    pa.timestamp("us"),
                ),
                "gap_us": pa.array(
                    [int(x) if o else None for x, o in zip(ts - prev, ok)], pa.int64()
                ),
            }
        )

    def finish_done(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": pa.array(
                    t.column("comp").to_numpy() >> WBITS, pa.int64()
                ),
                "last_view_ts": pa.array(
                    t.column("matched").to_numpy(), pa.int64()
                ).cast(pa.timestamp("us")),
                "gap_us": pa.array(
                    t.column("ts_i").to_numpy() - t.column("matched").to_numpy(),
                    pa.int64(),
                ),
            }
        )

    done_ds = staged.filter(expr="kind == 0").map_batches(
        finish_done, batch_format="pyarrow"
    )
    rest_ds = joined.map_batches(finish_unmatched, batch_format="pyarrow")
    return done_ds.union(rest_ds)


def events_asof_view(sf_dir: str) -> rd.Dataset:
    """AS-OF join: each purchase event matched to the same user's latest
    view event with ``view.ts <= purchase.ts`` (DuckDB ``ASOF LEFT JOIN``
    semantics); emits the matched view ts and the exact gap in microseconds
    (NULL when the user has no prior view).

    One ``groupby(user_id).map_groups`` supplies per-user locality below
    ``ASOF_GROUP_MAX_EVENTS`` (parquet-footer row count); inside a group
    both sides sort by ts once and every purchase resolves through a
    single vectorized ``np.searchsorted``. Past the gate — the regime
    where one whale user would materialize as one giant group — the
    time-windowed ``_asof_view_distributed`` shape takes over."""
    if _table_rows(sf_dir, "events") > ASOF_GROUP_MAX_EVENTS:
        return _asof_view_distributed(sf_dir)
    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    ).filter(
        expr="event_type == 'purchase' or event_type == 'view'"
    )

    def asof(g: pa.Table) -> pa.Table:
        ts = g.column("ts").cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)
        etype = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        eid = g.column("event_id").to_numpy()
        uid = g.column("user_id").to_numpy()
        p_mask = etype == "purchase"
        v_mask = etype == "view"
        p_ts, p_id = ts[p_mask], eid[p_mask]
        v_ts = np.sort(ts[v_mask])
        if len(v_ts):
            pos = np.searchsorted(v_ts, p_ts, side="right") - 1
            matched = np.where(pos >= 0, v_ts[np.maximum(pos, 0)], 0)
            valid = pos >= 0
        else:
            matched = np.zeros(len(p_ts), dtype=np.int64)
            valid = np.zeros(len(p_ts), dtype=bool)
        gap = p_ts - matched
        return pa.table(
            {
                "event_id": pa.array(p_id, type=pa.int64()),
                "user_id": pa.array(uid[p_mask], type=pa.int64()),
                "last_view_ts": pa.array(
                    [int(m) if ok else None for m, ok in zip(matched, valid)],
                    type=pa.timestamp("us"),
                ),
                "gap_us": pa.array(
                    [int(x) if ok else None for x, ok in zip(gap, valid)],
                    type=pa.int64(),
                ),
            }
        )

    return ev.groupby("user_id").map_groups(asof, batch_format="pyarrow")


def q3_shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-15",
    k: int = 10,
    n_buckets: int = 64,
) -> pa.Table:
    """TPC-H Q3 shape (unshipped-orders revenue ranking): customers in one
    market segment ⋈ their orders placed before ``cutoff`` ⋈ lineitems
    shipped after it, revenue per order, global top-k.

    Scale shape: every side is reduced BEFORE its exchange — lineitem is
    date-filtered and collapsed to per-orderkey floor-cents revenue via the
    bucketed combine (the revenue_by_priority pattern); orders are filtered
    and projected to 4 columns before the custkey join against the
    segment's distinct keys (big-big: a segment is ~1/5 of all customers,
    never broadcastable); the final orderkey join moves only pre-reduced
    skinny rows. The top-k is per-batch pruned partials + one driver
    lexsort — never a global sort."""
    cutoff_ts = np.datetime64(f"{cutoff}T00:00:00", "us")

    def li_partial(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.timestamp("us")).to_numpy()
        m = ship > cutoff_ts
        price = t.column("l_extendedprice").to_numpy()[m]
        disc = t.column("l_discount").to_numpy()[m]
        keys = t.column("l_orderkey").to_numpy()[m]
        cents = np.floor(price * (1.0 - disc) * 100.0).astype(np.int64)
        uniq, inv = np.unique(keys, return_inverse=True)
        return pa.table(
            {
                "l_orderkey": pa.array(uniq, pa.int64()),
                "revenue_cents": pa.array(
                    group_sum(inv, len(uniq), cents), pa.int64()
                ),
                "bucket": pa.array(uniq % np.int64(n_buckets), pa.int64()),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return g
        keys = g.column("l_orderkey").to_numpy()
        v = g.column("revenue_cents").to_numpy()
        uniq, inv = np.unique(keys, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, v)
        return pa.table(
            {
                "l_orderkey": pa.array(uniq, pa.int64()),
                "revenue_cents": pa.array(tot, pa.int64()),
            }
        )

    li = (
        rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
    )

    if (
        _table_rows(sf_dir, "orders") <= BROADCAST_JOIN_MAX_ROWS
        and _table_rows(sf_dir, "customer") <= BROADCAST_JOIN_MAX_ROWS
    ):
        # broadcast plan: the segment's date-filtered orders collapse to a
        # sorted orderkey -> (date, priority) dim driver-side (both footer
        # gates passed); the pre-reduced li revenue probes it per batch and
        # prunes to a local top-k — both join exchanges disappear
        import pyarrow.parquet as pq

        cust_t = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"],
        )
        ckeys = pa.array(
            np.unique(
                cust_t.filter(pc.equal(cust_t.column("c_mktsegment"), segment))
                .column("c_custkey")
                .to_numpy()
            ),
            pa.int64(),
        )
        ot = pq.read_table(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        )
        m_date = ot.column("o_orderdate").cast(pa.timestamp("us")).to_numpy() < cutoff_ts
        m_seg = pc.is_in(ot.column("o_custkey"), value_set=ckeys).to_numpy(
            zero_copy_only=False
        )
        ot = ot.filter(pa.array(m_date & m_seg)).sort_by("o_orderkey")
        # keep the string columns Arrow-native (take() in the probe) —
        # to_pylist object arrays cost seconds at millions of rows
        dim_ref = ray.put(
            {
                "keys": ot.column("o_orderkey").to_numpy(),
                "dates": pc.strftime(
                    ot.column("o_orderdate").cast(pa.timestamp("us")),
                    format="%Y-%m-%d",
                ).combine_chunks(),
                "pris": ot.column("o_orderpriority").combine_chunks(),
            }
        )

        def topk_bcast(t: pa.Table, ref) -> pa.Table:
            empty = pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.string()),
                    "o_orderpriority": pa.array([], pa.string()),
                }
            )
            if t.num_columns == 0 or t.num_rows == 0:
                return empty
            d = ref if isinstance(ref, dict) else ray.get(ref)
            n = len(d["keys"])
            if n == 0:
                return empty
            keys = t.column("l_orderkey").to_numpy()
            rev = t.column("revenue_cents").to_numpy()
            pos = np.minimum(np.searchsorted(d["keys"], keys), n - 1)
            m = d["keys"][pos] == keys
            keys, rev, pos = keys[m], rev[m], pos[m]
            order = np.lexsort((keys, -rev))[:k]
            sel = pa.array(pos[order])
            return pa.table(
                {
                    "l_orderkey": pa.array(keys[order], pa.int64()),
                    "revenue_cents": pa.array(rev[order], pa.int64()),
                    "o_orderdate": d["dates"].take(sel),
                    "o_orderpriority": d["pris"].take(sel),
                }
            )

        topk_parts = li.map_batches(
            topk_bcast, fn_args=(dim_ref,), batch_format="pyarrow"
        )
    else:

        def orders_prep(t: pa.Table) -> pa.Table:
            od = t.column("o_orderdate").cast(pa.timestamp("us"))
            mask = pa.array(od.to_numpy() < cutoff_ts)
            t = t.filter(mask)
            return pa.table(
                {
                    "o_orderkey": t.column("o_orderkey"),
                    "o_custkey": t.column("o_custkey"),
                    "o_orderdate": pc.strftime(
                        t.column("o_orderdate").cast(pa.timestamp("us")),
                        format="%Y-%m-%d",
                    ),
                    "o_orderpriority": t.column("o_orderpriority"),
                }
            )

        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        ).map_batches(orders_prep, batch_format="pyarrow")

        cust = (
            rd.read_parquet(
                os.path.join(sf_dir, "customer.parquet"),
                columns=["c_custkey", "c_mktsegment"],
            )
            .filter(expr=f"c_mktsegment == {segment!r}")
            .map_batches(lambda t: t.select(["c_custkey"]), batch_format="pyarrow")
        )

        num_partitions = join_partitions(_table_rows(sf_dir, "orders"))
        orders_seg = orders.join(
            cust,
            join_type="inner",
            num_partitions=num_partitions,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
        joined = li.join(
            orders_seg,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        def local_topk(t: pa.Table) -> pa.Table:
            rev = t.column("revenue_cents").to_numpy()
            keys = t.column("l_orderkey").to_numpy()
            order = np.lexsort((keys, -rev))[:k]
            return pa.table(
                {
                    "l_orderkey": pa.array(keys[order], pa.int64()),
                    "revenue_cents": pa.array(rev[order], pa.int64()),
                    "o_orderdate": t.column("o_orderdate").take(pa.array(order)),
                    "o_orderpriority": t.column("o_orderpriority").take(pa.array(order)),
                }
            )

        topk_parts = joined.map_batches(local_topk, batch_format="pyarrow")

    # the sort/join exchanges can emit zero-column empty blocks that Ray
    # passes through map_batches unmapped — drop them before concat
    blocks = [
        t
        for t in ray.get(topk_parts.materialize().to_arrow_refs())
        if t.num_columns > 0
    ]
    if not blocks:
        return pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "revenue_cents": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.string()),
                "o_orderpriority": pa.array([], pa.string()),
            }
        )
    parts = pa.concat_tables(blocks)
    order = np.lexsort(
        (parts.column("l_orderkey").to_numpy(), -parts.column("revenue_cents").to_numpy())
    )[:k]
    return parts.take(order)


def _priority_buyer_keys(sf_dir: str, priority: str) -> np.ndarray:
    """Distinct o_custkey of ``priority`` orders, computed driver-side.
    Only legal when the caller's footer-row gate says orders is small
    enough to broadcast (``BROADCAST_JOIN_MAX_ROWS``)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    )
    m = pc.equal(t.column("o_orderpriority"), priority)
    return np.unique(t.filter(m).column("o_custkey").to_numpy())


def _keys_filter(t: pa.Table, keys_ref, invert: bool = False) -> pa.Table:
    """Task-based semi/anti filter of customer rows against a broadcast
    buyer-key array (one local object-store read per task)."""
    keys = keys_ref if isinstance(keys_ref, pa.Array) else ray.get(keys_ref)
    m = pc.is_in(t.column("c_custkey"), value_set=keys)
    return t.filter(pc.invert(m) if invert else m)


def customers_without_orders(sf_dir: str, priority: str = "1-URGENT") -> rd.Dataset:
    """Big-big LEFT ANTI join: customers that never placed a ``priority``
    order. The probe side is filtered at the source and reduced map-side to
    its DISTINCT keys (per-batch np.unique partial, then a skinny groupby)
    so the hash-partitioned ``Dataset.join`` exchange moves one int column
    of distinct custkeys — never order rows; the anti semantics come from
    ``left_outer`` + an IS NULL filter on a right-side marker (Ray's join
    drops the right KEY column from the output). At 100 TB neither side
    broadcasts (the distinct-buyer set is customer-table-sized), which is
    exactly when this shuffle shape is the right one — contrast
    ``dedup_filter``'s broadcast anti-join, correct there because its drop
    set is O(dups). Below ``BROADCAST_JOIN_MAX_ROWS`` (footer row count of
    orders) the whole join collapses to a broadcast is_in filter — zero
    exchanges."""
    if _table_rows(sf_dir, "orders") <= BROADCAST_JOIN_MAX_ROWS:
        keys_ref = ray.put(
            pa.array(_priority_buyer_keys(sf_dir, priority), pa.int64())
        )
        return rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"],
        ).map_batches(
            _keys_filter, fn_args=(keys_ref, True), batch_format="pyarrow"
        )

    def distinct_keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": pa.array(np.unique(t.column("o_custkey").to_numpy()), pa.int64())}
        )

    buyers = (
        rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderpriority"],
        )
        .filter(expr=f"o_orderpriority == {priority!r}")
        .map_batches(distinct_keys, batch_format="pyarrow")
        .groupby("o_custkey")
        .count()
        .map_batches(
            lambda t: t if t.num_columns == 0 else t.rename_columns(["o_custkey", "has_order"]),
            batch_format="pyarrow",
        )
    )
    customer = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    # measured at the pre-reduced join sizes: 8 partitions beat 24 (fixed
    # per-partition cost dominates skinny int data); grows with cores
    num_partitions = join_partitions(_table_rows(sf_dir, "customer"))
    joined = customer.join(
        buyers,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t.column("has_order"))).select(
            ["c_custkey", "c_mktsegment"]
        ),
        batch_format="pyarrow",
    )


def customers_with_orders(sf_dir: str, priority: str = "1-URGENT") -> rd.Dataset:
    """Big-big LEFT SEMI join — the complement of
    ``customers_without_orders``: customers that DID place a ``priority``
    order, at most once each regardless of how many such orders exist.
    Same scale shape as the anti join (probe side reduced map-side to its
    distinct keys, skinny int exchange, ``left_outer`` + marker), with the
    filter flipped to IS NOT NULL: Ray's ``Dataset.join`` has no native
    semi type, and inner-joining against the raw orders table would both
    duplicate customers per order and ship order rows through the
    exchange. Below ``BROADCAST_JOIN_MAX_ROWS`` the join collapses to a
    broadcast is_in filter, same as the anti join."""
    if _table_rows(sf_dir, "orders") <= BROADCAST_JOIN_MAX_ROWS:
        keys_ref = ray.put(
            pa.array(_priority_buyer_keys(sf_dir, priority), pa.int64())
        )
        return rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"],
        ).map_batches(
            _keys_filter, fn_args=(keys_ref, False), batch_format="pyarrow"
        )

    def distinct_keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": pa.array(np.unique(t.column("o_custkey").to_numpy()), pa.int64())}
        )

    buyers = (
        rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderpriority"],
        )
        .filter(expr=f"o_orderpriority == {priority!r}")
        .map_batches(distinct_keys, batch_format="pyarrow")
        .groupby("o_custkey")
        .count()
        .map_batches(
            lambda t: t if t.num_columns == 0 else t.rename_columns(["o_custkey", "has_order"]),
            batch_format="pyarrow",
        )
    )
    customer = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    num_partitions = join_partitions(_table_rows(sf_dir, "customer"))
    joined = customer.join(
        buyers,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )
    return joined.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("has_order"))).select(
            ["c_custkey", "c_mktsegment"]
        ),
        batch_format="pyarrow",
    )


def events_user_distinct_types(sf_dir: str, n_buckets: int = 64) -> rd.Dataset:
    """Distinct-count aggregate: per user, the number of DISTINCT event
    types and total events. Map-side partial collapses each batch to
    (user, type, n) distinct rows tagged with a user-bucket, so the ONE
    shuffle is bounded by |users| × |types| partial rows (types is a tiny
    domain) into a FIXED group count; each bucket combines the per-batch
    partials AND computes the per-user distinct/total counts in a single
    vectorized pass — event rows never cross the wire, and there is no
    second exchange (previously a 2-key sort-aggregate + a per-user
    map_groups; the bucketed fuse is the same shape as
    ``analytics.user_top_event_type``)."""

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        ety = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        tcodes, tinv = np.unique(ety, return_inverse=True)
        comp = uid.astype(np.int64) * np.int64(64) + tinv.astype(np.int64)
        uniq, inv = np.unique(comp, return_inverse=True)
        u = uniq // 64
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "event_type": pa.array(tcodes[uniq % 64], pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "bucket": pa.array(u % np.int64(n_buckets), pa.int64()),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return g
        uid = g.column("user_id").to_numpy()
        n = g.column("n").to_numpy()
        ety = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        tcodes, tinv = np.unique(ety, return_inverse=True)
        comp = uid * np.int64(64) + tinv
        uniq, inv = np.unique(comp, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, n)
        users = uniq // 64
        u_uniq, u_inv = np.unique(users, return_inverse=True)
        n_types = np.bincount(u_inv).astype(np.int64)
        n_events = np.zeros(len(u_uniq), np.int64)
        np.add.at(n_events, u_inv, tot)
        return pa.table(
            {
                "user_id": pa.array(u_uniq, pa.int64()),
                "n_types": pa.array(n_types, pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
            }
        )

    return (
        rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
    )


def orders_rank_in_customer(sf_dir: str, n_buckets: int = 64) -> rd.Dataset:
    """Window function ROW_NUMBER() OVER (PARTITION BY customer ORDER BY
    price DESC, orderkey): every order annotated with its price rank within
    its customer. Ranks by floor-cents (the repo's money convention) with
    the orderkey tie-break, so the rank is fully deterministic and the SQL
    oracle reproduces it bit-exactly.

    Scale shape: partitioning by the window key (custkey) directly would
    make one ``map_groups`` call per customer — millions of tiny Python
    invocations. Instead each row is assigned a BUCKET (custkey mod
    n_buckets); ``groupby(bucket)`` co-locates whole customers while
    keeping the group count fixed at n_buckets, and one vectorized
    ``np.lexsort`` per bucket ranks every customer in it at C speed. The
    shuffle moves (key, cents, bucket) int columns only; n_buckets scales
    with the cluster, not the data. The same bucketed-window shape serves
    any per-entity rank/cume_dist at 100 TB (entity cardinality never
    materializes as group count)."""
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def bucketize(t: pa.Table) -> pa.Table:
        cust = t.column("o_custkey").to_numpy()
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "total_cents": _floor_cents(t.column("o_totalprice")),
                "bucket": pa.array(cust % np.int64(n_buckets), pa.int64()),
            }
        )

    def rank_bucket(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return g
        cust = g.column("o_custkey").to_numpy()
        cents = g.column("total_cents").to_numpy()
        okey = g.column("o_orderkey").to_numpy()
        order = np.lexsort((okey, -cents, cust))
        cs, ks, vs = cust[order], okey[order], cents[order]
        # rank = position within each customer's run of the sorted bucket
        new_run = np.r_[True, cs[1:] != cs[:-1]]
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        rank = np.arange(len(cs), dtype=np.int64) - starts[run_id] + 1
        return pa.table(
            {
                "o_orderkey": pa.array(ks, pa.int64()),
                "o_custkey": pa.array(cs, pa.int64()),
                "total_cents": pa.array(vs, pa.int64()),
                "price_rank": pa.array(rank, pa.int64()),
            }
        )

    return (
        orders.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


def orders_above_customer_avg(sf_dir: str) -> rd.Dataset:
    """Correlated-subquery shape: orders strictly above their own
    customer's average order value. Two passes, zero float arithmetic:

    1. map-side partial (custkey, n, sum_cents) per batch → skinny groupby
       sum — the only shuffle, bounded by |customers|, two int columns.
    2. the per-customer stats broadcast once (``ray.put``) and orders
       stream through a task-based filter; "above average" is evaluated by
       integer cross-multiplication ``cents × n > sum_cents`` — exactly
       equivalent to ``cents > sum/n`` with no division, no float, no
       rounding question for the oracle to disagree on.

    The broadcast side is O(customers): fine while the per-entity stat
    table fits the object store (the usual case — it is the DIM-side
    cardinality). Past that, flip pass 2 to the hash-partitioned join of
    ``revenue_by_priority`` — the predicate itself is unchanged."""
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        cust = t.column("o_custkey").to_numpy()
        cents = _floor_cents(t.column("o_totalprice")).to_numpy()
        uniq, inv = np.unique(cust, return_inverse=True)
        return pa.table(
            {
                "o_custkey": pa.array(uniq, pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "sum_cents": pa.array(
                    group_sum(inv, len(uniq), cents), pa.int64()
                ),
            }
        )

    # The per-batch partials are already O(customers) — the exact size of the
    # broadcast we build next — so the final combine happens driver-side in
    # one vectorized pass instead of a Ray aggregate: the sort-based shuffle's
    # fixed cost (boundary sampling + 64×64 micro-blocks) dwarfs this data.
    # When |customers| outgrows the driver, the whole stats side flips to the
    # hash-partitioned join path anyway (see docstring).
    parts = [
        t
        for t in ray.get(
            orders.map_batches(partial, batch_format="pyarrow").materialize().to_arrow_refs()
        )
        if len(t.schema)
    ]
    if parts:
        pt = pa.concat_tables(parts)
        keys = pt.column("o_custkey").to_numpy()
        uniq, inv = np.unique(keys, return_inverse=True)
        # int64 accumulation (np.add.at), not bincount's float64 weights:
        # keeps the driver combine exact at any magnitude
        n = np.zeros(len(uniq), np.int64)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(n, inv, pt.column("n").to_numpy())
        np.add.at(s, inv, pt.column("sum_cents").to_numpy())
        lookup = {"keys": uniq, "n": n, "sum": s}
    else:
        lookup = {
            "keys": np.empty(0, np.int64),
            "n": np.empty(0, np.int64),
            "sum": np.empty(0, np.int64),
        }
    ref = ray.put(lookup)

    def above(t: pa.Table, r) -> pa.Table:
        d = r if isinstance(r, dict) else ray.get(r)
        cust = t.column("o_custkey").to_numpy()
        cents = _floor_cents(t.column("o_totalprice")).to_numpy()
        pos = np.searchsorted(d["keys"], cust)
        if len(d["keys"]) == 0 or not np.array_equal(d["keys"][pos], cust):
            raise ValueError("customer stats missing for some orders")
        keep = cents * d["n"][pos] > d["sum"][pos]
        kept = t.filter(pa.array(keep))
        return pa.table(
            {
                "o_orderkey": kept.column("o_orderkey"),
                "o_custkey": kept.column("o_custkey"),
                "total_cents": _floor_cents(kept.column("o_totalprice")),
            }
        )

    return orders.map_batches(above, fn_args=(ref,), batch_format="pyarrow")
