"""Analytics operators a training-data pipeline runs alongside dedup/joins:
exact distributed quantiles, a range (interval) join, deterministic grouped
sampling, and TF-IDF term scoring.

Scale shapes:

- ``events_value_quantiles`` — exact quantiles WITHOUT a global sort: the
  classic distinct-value-histogram reduction. Map-side partial counts per
  (group, value) collapse each batch to its distinct values, the only
  shuffle is the (group, cents, count) histogram — bounded by value
  CARDINALITY, not row count (money-like cents: tens of thousands of
  distinct values regardless of corpus size). The per-group quantile scan
  then runs over the tiny histogram in ``map_groups``. For genuinely
  unbounded-cardinality doubles you would pre-bucket (t-digest style) and
  accept approximation; cents are exact by construction.
- ``events_band_join`` — range join against a broadcast interval table:
  each event row lands in the [lo, hi) band containing its value via one
  vectorized ``np.searchsorted`` against the broadcast boundary array. The
  fact side streams; no shuffle at all. This is the scale shape whenever
  the interval side is small (tier tables, SLA windows, calendar ranges);
  a big-big interval join would instead partition both sides by
  range-bucket and run the same searchsorted per bucket.
- ``doc_group_sample`` — deterministic per-group k-sample: rank by
  ``md5(str(doc_id))`` (content-independent, reshard-stable — the same
  stability argument as the train/val split) and keep the k smallest per
  group. Per-batch partial top-k means each batch forwards at most
  k × groups rows, so the shuffle is O(k · groups · batches), independent
  of table size.
- ``doc_tfidf_top_terms`` — TF-IDF with a broadcast document-frequency
  table: pass 1 computes per-batch (token, partial df) with per-doc
  de-duplication map-side, so only the vocabulary-sized histogram
  shuffles; the df map is then ``ray.put`` once and pass 2 scores each
  doc's terms entirely in-batch. Vocabulary is zipfian (~10^7 entries at
  web scale — broadcastable); if it ever were not, the fallback is a
  hash-partitioned join of (doc, token, tf) against (token, df) — the df
  side stays the small one.
"""

from __future__ import annotations

import hashlib
import math
import os
import re
from collections import Counter

import numpy as np

from pdfredact_ray.functions.ints import group_sum
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum

QUANTILE_PS = (0.25, 0.5, 0.75, 0.9, 0.99)

# (tier, lo, hi) — hi exclusive; the last band is open-ended. Mirrored
# verbatim in the SQL oracle's VALUES list.
VALUE_BANDS = (
    ("micro", 0.0, 5.0),
    ("small", 5.0, 10.0),
    ("mid", 10.0, 20.0),
    ("large", 20.0, 50.0),
    ("huge", 50.0, float("inf")),
)

TOKEN_RE = re.compile(r"[a-z0-9]+")


def _events(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def _parquet_rows_events(sf_dir: str) -> int:
    """events row count from parquet footer metadata only — no data scan."""
    import pyarrow.dataset as pads

    return pads.dataset(
        os.path.join(sf_dir, "events.parquet"), format="parquet"
    ).count_rows()


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def events_value_quantiles(sf_dir: str, ps: tuple = QUANTILE_PS) -> rd.Dataset:
    """Exact per-event-type quantiles of floor-cents value via the
    distinct-value histogram: partial (event_type, cents, n) per batch →
    groupby sum → per-type discrete quantile over the cumulative histogram.

    percentile_disc semantics (Postgres/DuckDB: the smallest value whose
    cumulative fraction is >= p, i.e. sorted index ``ceil(p · n) - 1``) —
    computed from the cumulative counts of the histogram, never
    materializing the row-level values."""

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(t.column("value"), 100.0)), pa.int64()
        ).to_numpy()
        etype = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        if len(cents) and (cents < 0).any():
            raise ValueError("negative value cents: compound histogram key assumes >= 0")
        # batch-local histogram: collapse to distinct (type, cents)
        tcodes, tinv = np.unique(etype, return_inverse=True)
        comp = tinv.astype(np.int64) * (np.int64(1) << np.int64(40)) + cents
        uniq, inv = np.unique(comp, return_inverse=True)
        return pa.table(
            {
                "event_type": pa.array(tcodes[uniq >> np.int64(40)], pa.string()),
                "cents": pa.array(uniq & ((np.int64(1) << np.int64(40)) - 1), pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            }
        )

    # ONE shuffle: the per-batch histogram partials go straight to the
    # per-type group (5 groups) and duplicate cents merge inside the
    # quantile scan — group size is bounded by value cardinality × batches,
    # and the former (type, cents) sort-aggregate (high key count, fixed
    # micro-block cost) disappears.
    hist = _events(sf_dir, ["event_type", "value"]).map_batches(
        partial, batch_format="pyarrow"
    )

    def quantiles(g: pa.Table) -> pa.Table:
        raw_c = g.column("cents").to_numpy()
        raw_n = g.column("n").to_numpy()
        cents, inv = np.unique(raw_c, return_inverse=True)
        n = np.zeros(len(cents), np.int64)
        np.add.at(n, inv, raw_n)
        cum = np.cumsum(n)
        total = int(cum[-1])
        rows_p, rows_v = [], []
        for p in ps:
            # smallest value with cume_dist >= p: sorted index ceil(p*n)-1
            idx = max(int(math.ceil(p * total)) - 1, 0)
            pos = int(np.searchsorted(cum, idx + 1))
            rows_p.append(p)
            rows_v.append(int(cents[pos]))
        return pa.table(
            {
                "event_type": pa.array(
                    [g.column("event_type")[0].as_py()] * len(ps), pa.string()
                ),
                "p": pa.array(rows_p, pa.float64()),
                "value_cents": pa.array(rows_v, pa.int64()),
            }
        )

    return hist.groupby("event_type").map_groups(quantiles, batch_format="pyarrow")


def events_band_join(sf_dir: str) -> rd.Dataset:
    """Range join events.value into the broadcast [lo, hi) band table; emits
    (event_id, tier). One ``np.searchsorted`` against the boundary array per
    batch — the fact side never shuffles."""
    los = np.array([b[1] for b in VALUE_BANDS], dtype=np.float64)
    tiers = np.array([b[0] for b in VALUE_BANDS], dtype=object)
    bands_ref = ray.put({"los": los, "tiers": tiers})

    def assign(t: pa.Table, ref) -> pa.Table:
        d = ref if isinstance(ref, dict) else ray.get(ref)
        v = t.column("value").to_numpy()
        idx = np.searchsorted(d["los"], v, side="right") - 1
        if (idx < 0).any():
            raise ValueError("event value below the lowest band")
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "tier": pa.array(d["tiers"][idx], pa.string()),
            }
        )

    return _events(sf_dir, ["event_id", "value"]).map_batches(
        assign, fn_args=(bands_ref,), batch_format="pyarrow"
    )


def doc_group_sample(sf_dir: str, k: int = 5) -> rd.Dataset:
    """Deterministic k-per-group sample: per source, the k docs with the
    smallest ``md5(str(doc_id))`` (hex compares lexicographically identically
    in Python and SQL). Per-batch partial top-k → tiny final top-k per
    group; rank is 1-based in hash order."""

    def partial(t: pa.Table) -> pa.Table:
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        did = t.column("doc_id").to_numpy()
        h = np.asarray(
            [hashlib.md5(str(int(d)).encode()).hexdigest() for d in did], dtype=object
        )
        keep = np.zeros(len(did), dtype=bool)
        for s in np.unique(src):
            idx = np.flatnonzero(src == s)
            order = np.lexsort((did[idx], h[idx]))[:k]
            keep[idx[order]] = True
        return pa.table(
            {
                "source": pa.array(src[keep], pa.string()),
                "doc_id": pa.array(did[keep], pa.int64()),
                "hash": pa.array(h[keep], pa.string()),
            }
        )

    def final(g: pa.Table) -> pa.Table:
        did = g.column("doc_id").to_numpy()
        h = np.asarray(g.column("hash").to_pylist(), dtype=object)
        order = np.lexsort((did, h))[:k]
        return pa.table(
            {
                "source": g.column("source").take(pa.array(order)),
                "doc_id": pa.array(did[order], pa.int64()),
                "sample_rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final, batch_format="pyarrow")
    )


class _TfIdfScorer:
    """Actor stage for pass 2: holds the broadcast df map; per batch,
    tokenizes each doc once and emits its top-k terms by tf·idf."""

    def __init__(self, df_ref, n_docs: int, k: int):
        d = ray.get(df_ref) if not isinstance(df_ref, dict) else df_ref
        self.df = d
        self.n_docs = n_docs
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids, terms, tfs, dfs, ranks = [], [], [], [], []
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        for doc_id, text in zip(ids, texts):
            tf = Counter(TOKEN_RE.findall(text.lower()))
            if not tf:
                continue
            scored = sorted(
                (
                    (-cnt * math.log(self.n_docs / self.df[tok]), tok, cnt)
                    for tok, cnt in tf.items()
                ),
            )[: self.k]
            for r, (_, tok, cnt) in enumerate(scored, 1):
                doc_ids.append(doc_id)
                terms.append(tok)
                tfs.append(cnt)
                dfs.append(self.df[tok])
                ranks.append(r)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "df": pa.array(dfs, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
            }
        )


def doc_tfidf_top_terms(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Top-k TF-IDF terms per document (score = tf · ln(N/df), ties broken
    term-ascending). Pass 1 reduces documents to the vocabulary-sized df
    histogram (per-doc dedup map-side, so only (token, partial_df) rows
    shuffle); the df map broadcasts once; pass 2 scores in-batch."""
    from pdfredact_ray.pipelines.redact import default_concurrency

    def df_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column("text").to_pylist():
            c.update(set(TOKEN_RE.findall(text.lower())))
        return pa.table(
            {
                "term": pa.array(list(c.keys()), pa.string()),
                "df": pa.array(list(c.values()), pa.int64()),
            }
        )

    docs = _docs(sf_dir, ["doc_id", "text"])
    # The df histogram is collected driver-side for the broadcast REGARDLESS,
    # so the per-batch partials combine during collection (one vectorized
    # concat + unique/add.at) instead of paying a Ray sort-aggregate whose
    # fixed micro-block cost dwarfs this vocabulary-sized table. The scale
    # bound is unchanged: the driver holds O(vocabulary) either way.
    blocks = [
        t
        for t in ray.get(
            docs.map_batches(df_partial, batch_format="pyarrow").materialize().to_arrow_refs()
        )
        if t.num_columns
    ]
    vocab = pa.concat_tables(blocks)
    terms = np.asarray(vocab.column("term").to_pylist(), dtype=object)
    uniq, inv = np.unique(terms, return_inverse=True)
    dfs = np.zeros(len(uniq), np.int64)
    np.add.at(dfs, inv, vocab.column("df").to_numpy())
    df_map = dict(zip(uniq.tolist(), dfs.tolist()))
    n_docs = docs.count()
    df_ref = ray.put(df_map)
    from pdfredact_ray.stages.taskstage import stage_call

    return docs.map_batches(
        stage_call,
        fn_args=(_TfIdfScorer, {"df_ref": df_ref, "n_docs": n_docs, "k": k}),
        batch_format="pyarrow",
    )


def events_moving_stats(sf_dir: str, w: int = 5) -> rd.Dataset:
    """ROWS-window aggregates per user: for each event (ordered by ts,
    event_id within user), the floor-cents sum and row count over the
    current + w-1 preceding rows, plus the lag-1 delta (NULL on each user's
    first event). The row-based sliding window Ray Data has no native
    operator for, expressed as ``groupby(user_id).map_groups`` with one
    in-group sort and a cumsum-difference — no per-row Python. Per-user
    locality is the partitioning assumption (same as the as-of join; the
    sessionize two-stage split is the fallback if a whale user appears)."""

    def win(g: pa.Table) -> pa.Table:
        ts = (
            g.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy()
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        eid = g.column("event_id").to_numpy()
        cents = pc.cast(
            pc.floor(pc.multiply(g.column("value"), 100.0)), pa.int64()
        ).to_numpy()
        order = np.lexsort((eid, ts))
        eid_s, cents_s = eid[order], cents[order]
        cum = np.concatenate(([0], np.cumsum(cents_s)))
        n = len(cents_s)
        lo = np.maximum(np.arange(n) - (w - 1), 0)
        win_sum = cum[np.arange(1, n + 1)] - cum[lo]
        win_n = np.arange(1, n + 1) - lo
        delta = np.empty(n, dtype=object)
        delta[0] = None
        if n > 1:
            delta[1:] = (cents_s[1:] - cents_s[:-1]).tolist()
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "win_sum_cents": pa.array(win_sum.astype(np.int64), pa.int64()),
                "win_n": pa.array(win_n.astype(np.int64), pa.int64()),
                "delta_cents": pa.array(delta.tolist(), pa.int64()),
            }
        )

    return (
        _events(sf_dir, ["event_id", "ts", "user_id", "value"])
        .groupby("user_id")
        .map_groups(win, batch_format="pyarrow")
    )


def events_trailing_hour(sf_dir: str, minutes: int = 60) -> rd.Dataset:
    """Time-RANGE trailing window per user: for each event, the floor-cents
    sum and row count over all of that user's events in the last ``minutes``
    (inclusive lower bound, and peer rows with an identical timestamp are in
    the frame — exactly SQL's ``RANGE BETWEEN INTERVAL .. PRECEDING AND
    CURRENT ROW``). The companion to ``events_moving_stats``' ROWS window:
    one in-group sort, cumulative sums, and two vectorized ``searchsorted``
    calls for the frame bounds — no per-row Python. Same per-user-locality
    partitioning assumption as the as-of join."""
    span_us = np.int64(minutes) * np.int64(60_000_000)

    def win(g: pa.Table) -> pa.Table:
        ts = (
            g.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy()
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        eid = g.column("event_id").to_numpy()
        cents = pc.cast(
            pc.floor(pc.multiply(g.column("value"), 100.0)), pa.int64()
        ).to_numpy()
        order = np.lexsort((eid, ts))
        ts_s, eid_s, cents_s = ts[order], eid[order], cents[order]
        cum = np.concatenate(([0], np.cumsum(cents_s)))
        lo = np.searchsorted(ts_s, ts_s - span_us, side="left")
        hi = np.searchsorted(ts_s, ts_s, side="right")  # peers included
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "trail_sum_cents": pa.array((cum[hi] - cum[lo]).astype(np.int64), pa.int64()),
                "trail_n": pa.array((hi - lo).astype(np.int64), pa.int64()),
            }
        )

    return (
        _events(sf_dir, ["event_id", "ts", "user_id", "value"])
        .groupby("user_id")
        .map_groups(win, batch_format="pyarrow")
    )


def quality_percentile_filter(sf_dir: str, p: float = 0.9) -> rd.Dataset:
    """Percentile-gated corpus selection: keep documents whose stopword
    density (integer permille) is at or above the corpus-wide p-th
    percentile (percentile_disc).

    Two streaming passes, no sort and no shuffle: pass 1 reduces each batch
    to its distinct (permille, n) histogram rows — the domain is at most
    1001 values, so the collected histogram is tiny at ANY corpus size —
    the driver reads the threshold off the cumulative histogram, and pass 2
    re-streams the corpus filtering against the broadcast scalar."""
    from pdfredact_ray.stages.textops import quality_scores

    def permille_of(t: pa.Table) -> np.ndarray:
        q = quality_scores(t)
        return np.floor_divide(
            q.column("n_stopwords").to_numpy() * 1000,
            np.maximum(q.column("n_tokens").to_numpy(), 1),
        )

    def hist_partial(t: pa.Table) -> pa.Table:
        pm = permille_of(t)
        uniq, counts = np.unique(pm, return_counts=True)
        return pa.table(
            {
                "permille": pa.array(uniq, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    hist_blocks = [
        t
        for t in ray.get(
            _docs(sf_dir, ["doc_id", "text"])
            .map_batches(hist_partial, batch_format="pyarrow")
            .materialize().to_arrow_refs()
        )
        if len(t.schema) and t.num_rows
    ]
    if not hist_blocks:
        # degenerate empty corpus: the gate pass below yields zero rows for
        # ANY threshold, so pick 0 and stream through (returns the empty
        # dataset with the operator's schema instead of crashing on an
        # empty histogram)
        threshold = 0
    else:
        hist_tbl = pa.concat_tables(hist_blocks)
        raw_v = hist_tbl.column("permille").to_numpy()
        raw_n = hist_tbl.column("n").to_numpy()
        vals, inv = np.unique(raw_v, return_inverse=True)
        n = np.zeros(len(vals), np.int64)
        np.add.at(n, inv, raw_n)
        cum = np.cumsum(n)
        total = int(cum[-1])
        # percentile_disc: smallest value with cume_dist >= p (index ceil(p*n)-1)
        idx = max(int(math.ceil(p * total)) - 1, 0)
        threshold = int(vals[int(np.searchsorted(cum, idx + 1))])

    def gate(t: pa.Table) -> pa.Table:
        pm = permille_of(t)
        keep = pm >= threshold
        return pa.table(
            {
                "doc_id": t.column("doc_id").filter(pa.array(keep)),
                "stop_permille": pa.array(pm[keep], pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(gate, batch_format="pyarrow")


def user_daily_retention(sf_dir: str, n_salts: int = 64) -> rd.Dataset:
    """Next-day retention: per calendar day, how many users were active and
    how many of those were active again the following day — the temporal
    self-join every engagement pipeline runs, WITHOUT the self-join.

    Scale shape — WHALE-PROOF (no per-user group anywhere): (1) map-side
    distinct (user, day) collapse to a composite int key — the only rows
    that ever shuffle, bounded by users x days, not events; (2) ONE
    groupby over FIXED salt groups keyed by (user, 32-day window): all
    copies of a composite key land in one group, and "active tomorrow?"
    is a single vectorized ``isin(comp + 1, comps)`` because day occupies
    the key's low bits (next-day = key + 1). A day on a window's leading
    edge (day % 32 == 0) is REPLICATED into the previous window's group as
    a probe-only shadow row, so the +1 probe never crosses a group
    boundary — the map-side-replication-before-the-keyed-exchange pattern
    the hopping windows use. A whale user's days spread across windows and
    salts instead of materializing as one group; (3) per-batch day
    partials + a tiny groupby(day) sum (group count = the calendar)."""
    day_us = np.int64(86_400_000_000)
    _W = np.int64(5)  # 32-day windows: comp >> 5 is the (user, window) key

    def distinct_ud(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy()
            .astype("datetime64[D]")
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        uid = t.column("user_id").to_numpy()
        # composite key: DAY in the low 20 bits (covers ~2870 years of epoch
        # days), user id in the high 43 — user cardinality is the unbounded
        # dimension at scale, so it gets the wide field
        comp = np.unique(uid.astype(np.int64) * (np.int64(1) << np.int64(20)) + (ts // day_us))
        shadow = np.zeros(len(comp), dtype=np.int64)
        # leading-edge days also probe the PREVIOUS window: ship a shadow
        edge = comp[(comp & np.int64(31)) == 0]
        comp_all = np.concatenate([comp, edge])
        shadow_all = np.concatenate([shadow, np.ones(len(edge), dtype=np.int64)])
        wkey = np.where(shadow_all == 1, (comp_all >> _W) - 1, comp_all >> _W)
        return pa.table(
            {
                "comp": pa.array(comp_all, pa.int64()),
                "shadow": pa.array(shadow_all, pa.int64()),
                "salt": pa.array(wkey % np.int64(n_salts), pa.int64()),
            }
        )

    def per_salt(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return g
        comp = g.column("comp").to_numpy()
        shadow = g.column("shadow").to_numpy()
        universe = np.unique(comp)  # comp is globally unique per (user, day)
        emit = np.unique(comp[shadow == 0])
        retained = np.isin(emit + 1, universe)
        return pa.table(
            {
                "day_i": pa.array(emit & ((np.int64(1) << np.int64(20)) - 1), pa.int64()),
                "active": pa.array(np.ones(len(emit), np.int64), pa.int64()),
                "retained": pa.array(retained.astype(np.int64), pa.int64()),
            }
        )

    def day_partial(t: pa.Table) -> pa.Table:
        d = t.column("day_i").to_numpy()
        uniq, inv = np.unique(d, return_inverse=True)
        return pa.table(
            {
                "day_i": pa.array(uniq, pa.int64()),
                "active": pa.array(
                    group_sum(inv, len(uniq), t.column("active").to_numpy()),
                    pa.int64(),
                ),
                "retained": pa.array(
                    group_sum(inv, len(uniq), t.column("retained").to_numpy()),
                    pa.int64(),
                ),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        days = (t.column("day_i").to_numpy() * day_us).astype("datetime64[us]")
        return pa.table(
            {
                "day": pc.strftime(pa.array(days), format="%Y-%m-%d"),
                "n_active": t.column("sum(active)"),
                "n_retained": t.column("sum(retained)"),
            }
        )

    return (
        _events(sf_dir, ["user_id", "ts"])
        .map_batches(distinct_ud, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(per_salt, batch_format="pyarrow")
        .map_batches(day_partial, batch_format="pyarrow")
        .groupby("day_i")
        .aggregate(Sum("active"), Sum("retained"))
        .map_batches(finish, batch_format="pyarrow")
    )


def orders_monthly_growth(sf_dir: str) -> rd.Dataset:
    """Month-over-month revenue: total order floor-cents per calendar month
    plus the delta vs the previous month (0 for the first month — an
    explicit zero, not NULL, so the value-hash compare is unambiguous).

    The window-over-AGGREGATE shape: the raw-row windows
    (events_moving_stats / events_trailing_hour) partition by entity, but
    here the LAG runs over the aggregated series itself. Map-side (month,
    cents) partials bound the one exchange by |months| x batches; the
    series is then a single tiny block where sort + diff is trivial."""
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderdate", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        month = np.asarray(
            pc.strftime(
                pc.floor_temporal(
                    t.column("o_orderdate").cast(pa.timestamp("us")), unit="month"
                ),
                format="%Y-%m",
            ).to_pandas(),
            dtype=object,
        )
        cents = pc.cast(
            pc.floor(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
        ).to_numpy()
        uniq, inv = np.unique(month, return_inverse=True)
        return pa.table(
            {
                "month": pa.array(uniq, pa.string()),
                "cents": pa.array(group_sum(inv, len(uniq), cents), pa.int64()),
            }
        )

    def series(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "month": pa.array([], pa.string()),
                    "revenue_cents": pa.array([], pa.int64()),
                    "delta_cents": pa.array([], pa.int64()),
                }
            )
        m = np.asarray(t.column("month").to_pandas(), dtype=object)
        c = t.column("cents").to_numpy()
        uniq, inv = np.unique(m, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, c)
        delta = np.zeros(len(uniq), np.int64)
        delta[1:] = tot[1:] - tot[:-1]
        return pa.table(
            {
                "month": pa.array(uniq, pa.string()),
                "revenue_cents": pa.array(tot, pa.int64()),
                "delta_cents": pa.array(delta, pa.int64()),
            }
        )

    return (
        orders.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(series, batch_format="pyarrow", batch_size=None)
    )


COOC_TYPES = ("click", "error", "purchase", "signup", "view")

# k types -> 2^k mask histogram rows; past this the mask-histogram shape
# stops being "tiny" and the operator should fall back to a pair-keyed
# aggregation — refuse loudly rather than build a 2^20+ histogram.
COOC_MAX_TYPES = 16


def events_type_cooccurrence(
    sf_dir: str, types: tuple | None = COOC_TYPES, strict: bool = True
) -> rd.Dataset:
    """Type co-occurrence matrix: for every unordered pair of event types,
    how many users emitted BOTH — the classic audience-overlap query,
    normally a distinct self-join.

    Scale shape: the k known types become a k-bit mask. Map-side, each
    batch collapses to distinct (user, mask) partials; one groupby(user)
    ORs a user's masks into one int; a second map-side pass bincounts the
    masks — a histogram of at most 2^k rows (32 here) REGARDLESS of user
    count — and every pair count falls out of that tiny histogram with
    pure arithmetic. No self-join, no pair-keyed shuffle, nothing
    O(users) past the single user groupby.

    Domain policy (a new event_type can never be silently dropped): with
    the default known-type tuple, ``strict=True`` makes the mask pass RAISE
    on any type outside it — zero extra scans, loud on drift. Pass
    ``types=None`` to derive the domain from a distinct event_type scan
    instead (one tiny extra read, measured ~1.5s of fixed cost at sf0.1 —
    the right mode when the domain is genuinely unknown), or an explicit
    tuple with ``strict=False`` to intentionally restrict the matrix."""
    if types is None:
        def distinct_types(t: pa.Table) -> pa.Table:
            u = np.unique(np.asarray(t.column("event_type").to_pylist(), dtype=object))
            return pa.table({"event_type": pa.array(u, pa.string())})

        seen_blocks = [
            t
            for t in ray.get(
                _events(sf_dir, ["event_type"])
                .map_batches(distinct_types, batch_format="pyarrow")
                .materialize().to_arrow_refs()
            )
            if len(t.schema)
        ]
        # degenerate empty events table: no blocks survive the filter —
        # the domain is empty and the matrix below falls out as zero rows
        # (mirrors the hist_blocks guard in quality_percentile_filter)
        types = (
            tuple(sorted({s for t in seen_blocks for s in t.column("event_type").to_pylist()}))
            if seen_blocks
            else ()
        )
    if len(types) > COOC_MAX_TYPES:
        raise ValueError(
            f"{len(types)} event types exceeds COOC_MAX_TYPES={COOC_MAX_TYPES}; "
            "the 2^k mask histogram no longer bounds the reduce — use a "
            "pair-keyed aggregation instead"
        )
    tlist = list(types)
    tindex = {t: i for i, t in enumerate(tlist)}
    k = len(tlist)

    def user_mask_partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pandas(), dtype=object)
        codes = np.array([tindex.get(x, -1) for x in et], dtype=np.int64)
        if strict and (codes < 0).any():
            unseen = sorted(set(et[codes < 0]))
            raise ValueError(
                f"event_type(s) {unseen} outside the assumed co-occurrence "
                f"domain {tlist} — pass types=None to derive the domain from "
                "the data, or an explicit tuple with strict=False to restrict"
            )
        m = codes >= 0
        uid = t.column("user_id").to_numpy()[m]
        mask = np.int64(1) << codes[m]
        uniq, inv = np.unique(uid, return_inverse=True)
        agg = np.zeros(len(uniq), np.int64)
        np.bitwise_or.at(agg, inv, mask)
        return pa.table(
            {"user_id": pa.array(uniq, pa.int64()), "mask": pa.array(agg, pa.int64())}
        )

    def or_masks(g: pa.Table) -> pa.Table:
        uid = g.column("user_id")[0].as_py()
        mask = int(np.bitwise_or.reduce(g.column("mask").to_numpy()))
        return pa.table(
            {"user_id": pa.array([uid], pa.int64()), "mask": pa.array([mask], pa.int64())}
        )

    def mask_hist(t: pa.Table) -> pa.Table:
        masks = t.column("mask").to_numpy()
        hist = np.bincount(masks, minlength=1 << k).astype(np.int64)
        return pa.table(
            {
                "mask": pa.array(np.arange(1 << k, dtype=np.int64), pa.int64()),
                "n": pa.array(hist, pa.int64()),
            }
        )

    def pairs(t: pa.Table) -> pa.Table:
        masks = t.column("mask").to_numpy()
        uniq, inv = np.unique(masks, return_inverse=True)
        n = np.zeros(len(uniq), np.int64)
        np.add.at(n, inv, t.column("n").to_numpy())
        rows_a, rows_b, rows_n = [], [], []
        for i in range(k):
            for j in range(i + 1, k):
                both = (np.int64(1) << np.int64(i)) | (np.int64(1) << np.int64(j))
                cnt = int(n[(uniq & both) == both].sum())
                if cnt == 0:
                    # a never-co-occurring pair has no row (matching the SQL
                    # join's semantics, which cannot emit zero groups)
                    continue
                rows_a.append(tlist[i])
                rows_b.append(tlist[j])
                rows_n.append(cnt)
        return pa.table(
            {
                "type_a": pa.array(rows_a, pa.string()),
                "type_b": pa.array(rows_b, pa.string()),
                "n_users": pa.array(rows_n, pa.int64()),
            }
        )

    return (
        _events(sf_dir, ["user_id", "event_type"])
        .map_batches(user_mask_partial, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(or_masks, batch_format="pyarrow")
        .map_batches(mask_hist, batch_format="pyarrow")
        .repartition(1)
        .map_batches(pairs, batch_format="pyarrow", batch_size=None)
    )


FUNNEL_STEPS = ("view", "click", "purchase")


# Above this many events (parquet-footer metadata), user_funnel_depth
# switches from the per-user map_groups path to the chained-min-join path —
# the whale-proof shape where no per-user group ever materializes.
FUNNEL_GROUP_MAX_EVENTS = 50_000_000

FUNNEL_BUCKETS = 64


def _user_min_combine(g: pa.Table) -> pa.Table:
    """Per-bucket vectorized min-per-user over (user_id, t) partial rows."""
    if g.num_columns == 0:
        return g
    uid = g.column("user_id").to_numpy()
    t = g.column("t").to_numpy()
    order = np.lexsort((t, uid))
    uid_s, t_s = uid[order], t[order]
    first = np.r_[True, uid_s[1:] != uid_s[:-1]]
    return pa.table(
        {
            "user_id": pa.array(uid_s[first], pa.int64()),
            "t": pa.array(t_s[first], pa.int64()),
        }
    )


def _user_max_combine(g: pa.Table) -> pa.Table:
    """Per-bucket vectorized max-depth-per-user over (user_id, d) rows."""
    if g.num_columns == 0:
        return g
    uid = g.column("user_id").to_numpy()
    d = g.column("d").to_numpy()
    order = np.lexsort((-d, uid))
    uid_s, d_s = uid[order], d[order]
    first = np.r_[True, uid_s[1:] != uid_s[:-1]]
    return pa.table(
        {
            "user_id": pa.array(uid_s[first], pa.int64()),
            "funnel_depth": pa.array(d_s[first].astype(np.int32), pa.int32()),
        }
    )


def _funnel_depth_distributed(sf_dir: str, steps: tuple) -> rd.Dataset:
    """Funnel as k chained combinable-min rounds — the whale-proof shape
    (one user owning 30% of all events adds ONE partial row per batch, not
    one giant group):

    - t_1(user) = min ts of step-1 events: map-side per-user min partials
      into a fixed-bucket vectorized combine (min is associative, so a
      whale's events collapse map-side).
    - t_s(user) = min ts of step-s events with ts >= t_{s-1}(user):
      step-s events HASH-JOIN the skinny t_{s-1} table on user_id
      (volume-aware partition count; joins spread a hot key's probe rows,
      unlike groups), filter, same min-combine.
    - depth = max over the union of (user, s) rows from each t_s plus
      depth-0 markers from the distinct-user universe — one bucketed max.

    Exactness is pinned against the per-user path by a forced-gate pytest
    (planted whale = 30% of events) and the shared SQL oracle."""
    from pdfredact_ray.pipelines.relational import join_partitions, _table_rows

    def prep(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy()
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "ts_i": pa.array(ts, pa.int64()),
            }
        )

    step_events = (
        _events(sf_dir, ["user_id", "event_type", "ts"])
        .filter(expr=" or ".join(f"event_type == {s!r}" for s in steps))
        .map_batches(prep, batch_format="pyarrow")
        .materialize()  # consumed once per round; skinny 3-column projection
    )

    def distinct_users(t: pa.Table) -> pa.Table:
        u = np.unique(t.column("user_id").to_numpy())
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "d": pa.array(np.zeros(len(u), np.int64), pa.int64()),
                "bucket": pa.array(u % np.int64(FUNNEL_BUCKETS), pa.int64()),
            }
        )

    depth_rows = [
        _events(sf_dir, ["user_id"]).map_batches(distinct_users, batch_format="pyarrow")
    ]

    def min_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "t": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy()
        ts = t.column("ts_i").to_numpy()
        order = np.lexsort((ts, uid))
        uid_s, ts_s = uid[order], ts[order]
        first = np.r_[True, uid_s[1:] != uid_s[:-1]]
        u = uid_s[first]
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "t": pa.array(ts_s[first], pa.int64()),
                "bucket": pa.array(u % np.int64(FUNNEL_BUCKETS), pa.int64()),
            }
        )

    n_users_est = _table_rows(sf_dir, "events")
    t_prev: rd.Dataset | None = None
    for s, step in enumerate(steps, start=1):
        ev_s = step_events.filter(expr=f"event_type == {step!r}")
        if t_prev is None:
            qualifying = ev_s
        else:
            joined = ev_s.join(
                t_prev,
                join_type="inner",
                num_partitions=join_partitions(n_users_est, row_bytes=16),
                on=("user_id",),
            )
            qualifying = joined.map_batches(
                lambda t: t.filter(
                    pc.greater_equal(t.column("ts_i"), t.column("t_r"))
                ).drop_columns(["t_r"])
                if t.num_rows
                else t.drop_columns(["t_r"]),
                batch_format="pyarrow",
            )
        t_s = (
            qualifying.map_batches(min_partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_user_min_combine, batch_format="pyarrow")
            .materialize()  # consumed twice: next round's join + depth union
        )
        # t_s is downstream of map_groups, which emits zero-column empty
        # tables when a step has NO qualifying events (e.g. no purchase ever
        # follows a click) — both consumers must pass those through like
        # _user_min_combine itself does, so the funnel degrades to depth<k
        # rows instead of crashing
        depth_rows.append(
            t_s.map_batches(
                lambda t, s=s: t
                if t.num_columns == 0
                else pa.table(
                    {
                        "user_id": t.column("user_id"),
                        "d": pa.array(
                            np.full(t.num_rows, s, dtype=np.int64), pa.int64()
                        ),
                        "bucket": pa.array(
                            t.column("user_id").to_numpy() % np.int64(FUNNEL_BUCKETS),
                            pa.int64(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        # rename t -> t_r so the next join's probe filter can't collide
        # with the event column names
        t_prev = t_s.map_batches(
            lambda t: t if t.num_columns == 0 else t.rename_columns(["user_id", "t_r"]),
            batch_format="pyarrow",
        )

    union = depth_rows[0]
    for extra in depth_rows[1:]:
        union = union.union(extra)
    return union.groupby("bucket").map_groups(_user_max_combine, batch_format="pyarrow")


def user_funnel_depth(sf_dir: str, steps: tuple = FUNNEL_STEPS) -> rd.Dataset:
    """Ordered-sequence funnel: how deep each user progresses through
    view → click → purchase, where each step must occur AT OR AFTER the
    previous step's first occurrence (ties on identical timestamps count
    as progression, mirroring the SQL oracle's >= joins).

    Scale shape: only events of the funnel's step types survive the source
    filter (a large reduction on real corpora), projected to three skinny
    columns before the one groupby(user) exchange; each group then answers
    the sequence constraint with one sort and a searchsorted per step.
    Per-user locality is the partitioning assumption below
    ``FUNNEL_GROUP_MAX_EVENTS`` (parquet-footer row count); past it — or
    whenever one user could own a corpus-scale share of events — the
    chained-min-join path (``_funnel_depth_distributed``) takes over, in
    which no per-user group ever materializes."""
    if _parquet_rows_events(sf_dir) > FUNNEL_GROUP_MAX_EVENTS:
        return _funnel_depth_distributed(sf_dir, steps)
    steps_arr = list(steps)

    def keep_steps(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column("event_type"), value_set=pa.array(steps_arr))
        t = t.select(["user_id", "event_type", "ts"])
        kept = t.filter(m)
        # users whose batch rows are ALL non-step events still owe a depth-0
        # row: forward one marker row per distinct such user (event_type '')
        # instead of collecting the user universe driver-side — the exchange
        # stays O(step events + distinct users x batches)
        others = t.filter(pc.invert(m))
        if others.num_rows == 0:
            return kept
        muids = np.unique(others.column("user_id").to_numpy())
        markers = pa.table(
            {
                "user_id": pa.array(muids, pa.int64()),
                "event_type": pa.array([""] * len(muids), pa.string()),
                "ts": pa.array(
                    np.zeros(len(muids), dtype="datetime64[us]"),
                    pa.timestamp("us"),
                ),
            }
        )
        return pa.concat_tables([kept.cast(markers.schema), markers])

    def depth(g: pa.Table) -> pa.Table:
        ts = (
            g.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy()
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        et = np.asarray(g.column("event_type").to_pandas(), dtype=object)
        order = np.argsort(ts, kind="stable")
        ts_s, et_s = ts[order], et[order]
        cutoff = None
        d = 0
        for step in steps_arr:
            m = et_s == step
            cand = ts_s[m]
            if cutoff is not None:
                cand = cand[cand >= cutoff]
            if len(cand) == 0:
                break
            cutoff = cand[0]
            d += 1
        uid = g.column("user_id")[0].as_py()
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "funnel_depth": pa.array([d], pa.int32()),
            }
        )

    return (
        _events(sf_dir, ["user_id", "event_type", "ts"])
        .map_batches(keep_steps, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(depth, batch_format="pyarrow")
    )


def user_top_event_type(sf_dir: str, n_buckets: int = 64) -> rd.Dataset:
    """Mode / argmax aggregate: each user's most frequent event type, with
    a deterministic tie-break (higher count wins, then lexicographically
    smallest type — mirrored exactly in the SQL oracle's ROW_NUMBER order).

    Scale shape: map-side partial counts collapse each batch to distinct
    (user, type, n) rows tagged with a user-BUCKET (user mod n_buckets), so
    the ONE shuffle is bounded by |users| × |types| partial rows into a
    FIXED group count; each bucket then combines counts across batches AND
    takes the per-user argmax in a single vectorized lexsort pass — never
    one Python call per user, never a second exchange (the same
    bucketed-window shape as ``orders_rank_in_customer``, here doing
    combine + window in one map_groups)."""

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        ety = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        tvals, tinv = np.unique(ety, return_inverse=True)
        comp = uid.astype(np.int64) * np.int64(64) + tinv.astype(np.int64)
        uniq, inv = np.unique(comp, return_inverse=True)
        u = uniq // 64
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "event_type": pa.array(tvals[uniq % 64], pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "bucket": pa.array(u % np.int64(n_buckets), pa.int64()),
            }
        )

    def top_of_bucket(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return g
        uid = g.column("user_id").to_numpy()
        n = g.column("n").to_numpy()
        ety = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        # combine the per-batch partials: sum n over (user, type)
        tvals, tcode = np.unique(ety, return_inverse=True)
        comp = uid * np.int64(64) + tcode
        uniq, inv = np.unique(comp, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, n)
        cu, ct = uniq // 64, uniq % 64
        # argmax per user: count DESC, then type code ASC (codes of
        # np.unique are in lexicographic order == the string tie-break)
        order = np.lexsort((ct, -tot, cu))
        us = cu[order]
        first = np.r_[True, us[1:] != us[:-1]]
        sel = order[first]
        return pa.table(
            {
                "user_id": pa.array(cu[sel], pa.int64()),
                "top_type": pa.array(tvals[ct[sel]], pa.string()),
                "n_top": pa.array(tot[sel], pa.int64()),
            }
        )

    return (
        _events(sf_dir, ["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(top_of_bucket, batch_format="pyarrow")
    )


def event_type_user_overlap(
    sf_dir: str, type_a: str = "click", type_b: str = "purchase"
) -> rd.Dataset:
    """Distinct-set algebra over user ids: classify every user that emitted
    a ``type_a`` or ``type_b`` event as ``both`` (intersection),
    ``only_<a>`` or ``only_<b>`` (the two set differences) — INTERSECT /
    EXCEPT without materializing either side.

    Scale shape: the source read is filtered to the two types, each batch
    collapses map-side to distinct (user, saw_a, saw_b) flag rows, and the
    only shuffle is a Max-aggregate over those flags — bounded by the
    distinct-user count, two 0/1 int columns wide. The classification is a
    vectorized case-select over the tiny aggregate."""
    from ray.data.aggregate import Max as _Max

    ev = _events(sf_dir, ["user_id", "event_type"]).filter(
        expr=f"event_type == {type_a!r} or event_type == {type_b!r}"
    )

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        ety = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        uniq, inv = np.unique(uid, return_inverse=True)
        a = np.zeros(len(uniq), dtype=np.int64)
        b = np.zeros(len(uniq), dtype=np.int64)
        np.maximum.at(a, inv, (ety == type_a).astype(np.int64))
        np.maximum.at(b, inv, (ety == type_b).astype(np.int64))
        return pa.table(
            {
                "user_id": pa.array(uniq, pa.int64()),
                "saw_a": pa.array(a, pa.int64()),
                "saw_b": pa.array(b, pa.int64()),
            }
        )

    flags = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(_Max("saw_a"), _Max("saw_b"))
    )

    def classify(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        a = t.column("max(saw_a)").to_numpy()
        b = t.column("max(saw_b)").to_numpy()
        cls = np.where(
            (a > 0) & (b > 0), "both", np.where(a > 0, f"only_{type_a}", f"only_{type_b}")
        ).astype(object)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "overlap": pa.array(cls, pa.string()),
            }
        )

    return flags.map_batches(classify, batch_format="pyarrow")


def lineitem_cov_stats(sf_dir: str) -> rd.Dataset:
    """Distributive sufficient statistics for covariance/correlation of
    (quantity, price) per return flag: n, Σx, Σy, Σxy — the exact integer
    numerators from which cov = (Σxy − ΣxΣy/n)/n and Pearson r derive.
    Emitting the integer partials (quantities are integral by construction,
    prices as floor-cents) instead of the final float keeps the result
    order-independent and bit-exact against the SQL oracle — the same
    fixed-point discipline as ``lineitem_agg`` — and is what a multi-pass
    pipeline would persist anyway (partials compose; floats don't).

    Scale shape: one map-side pass folds each batch to |flags| rows of four
    int columns; the only shuffle is that tiny partial table. Products
    stay in int64: qty ≤ 50, cents < 2^27, 10^12-row groups ⇒ Σxy < 2^63."""
    from ray.data.aggregate import Sum as _Sum

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        flag = np.asarray(t.column("l_returnflag").to_pylist(), dtype=object)
        qty = t.column("l_quantity").to_numpy().astype(np.int64)
        cents = (
            pc.cast(pc.floor(pc.multiply(t.column("l_extendedprice"), 100.0)), pa.int64())
            .to_numpy()
        )
        uniq, inv = np.unique(flag, return_inverse=True)
        return pa.table(
            {
                "l_returnflag": pa.array(uniq, pa.string()),
                "n_rows": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "sum_x": pa.array(group_sum(inv, len(uniq), qty), pa.int64()),
                "sum_y": pa.array(group_sum(inv, len(uniq), cents), pa.int64()),
                "sum_xy": pa.array(
                    group_sum(inv, len(uniq), qty * cents), pa.int64()
                ),
            }
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(_Sum("n_rows"), _Sum("sum_x"), _Sum("sum_y"), _Sum("sum_xy"))
    )
    return agg.map_batches(
        lambda t: t
        if t.num_columns == 0
        else t.rename_columns(["l_returnflag", "n_rows", "sum_x", "sum_y", "sum_xy"]),
        batch_format="pyarrow",
    )


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_counts(sf_dir: str, types: tuple = PIVOT_TYPES, n_buckets: int = 64) -> rd.Dataset:
    """PIVOT: one row per user, one count column per event type plus the
    total — the long→wide reshape every feature-engineering pipeline runs.
    The output schema is fixed by the ``types`` parameter (schema stability
    is non-negotiable for a Dataset); an event type outside it fails loudly
    rather than silently dropping rows.

    Scale shape: the pivot happens MAP-SIDE — each batch collapses to
    |users-in-batch| wide rows (one int column per type), so the shuffle
    is bounded by |users| × |types| ints and the single exchange is the
    bucketed combine (fixed group count, vectorized add.at per column).
    A naive long-form groupby((user, type)) would shuffle the same data in
    skinny form but pay the high-cardinality sort-aggregate and a second
    reshape pass."""
    idx = {t: i for i, t in enumerate(types)}

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        ety = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        codes = np.array([idx.get(e, -1) for e in ety], dtype=np.int64)
        if (codes < 0).any():
            bad = sorted(set(ety[codes < 0]))
            raise ValueError(f"event types outside the pivot schema: {bad}")
        uniq, inv = np.unique(uid, return_inverse=True)
        counts = np.zeros((len(uniq), len(types)), np.int64)
        np.add.at(counts, (inv, codes), 1)
        cols = {"user_id": pa.array(uniq, pa.int64())}
        for i, name in enumerate(types):
            cols[f"n_{name}"] = pa.array(counts[:, i], pa.int64())
        cols["n_total"] = pa.array(counts.sum(axis=1), pa.int64())
        cols["bucket"] = pa.array(uniq % np.int64(n_buckets), pa.int64())
        return pa.table(cols)

    def combine(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return g
        uid = g.column("user_id").to_numpy()
        uniq, inv = np.unique(uid, return_inverse=True)
        cols = {"user_id": pa.array(uniq, pa.int64())}
        for name in [f"n_{t}" for t in types] + ["n_total"]:
            tot = np.zeros(len(uniq), np.int64)
            np.add.at(tot, inv, g.column(name).to_numpy())
            cols[name] = pa.array(tot, pa.int64())
        return pa.table(cols)

    return (
        _events(sf_dir, ["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
    )
