"""Pipeline builders — the Ray Data expression of the reference CLI verbs
(plan / apply / redact, /root/reference/src/PdfRedact.CLI/Commands/*.cs).

All builders return LAZY Datasets; the caller consumes (write_parquet /
iter_batches / count). Nothing here calls ray.init().

Topology (SURVEY.md §3):

- plan:   read_parquet(turns) -> map_batches(RuleMatcher[plan] actor pool)
          -> plan rows. No shuffle — detection is embarrassingly per-turn.
- apply:  read_parquet(plan) + read_parquet(turns): broadcast the plan index
          (ray.put once, read per actor) when small; hash-partitioned
          Dataset.join on (conv_id, turn_idx) when large.
- redact: fused read -> map_batches(RuleMatcher[redact]) -> (optional) plan
          tee; no materialization barrier (RedactCommand.cs:202-213).
- order_restore: sort by (conv_id, turn_idx) — the ONLY wide op in the
  flagship pipeline; run it just before an ordered sink, never mid-stream.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from pdfredact_ray.functions.rules import RedactionRule, RuleLike
from pdfredact_ray.stages.apply import Applier, build_plan_index
from pdfredact_ray.stages.detect import RuleMatcher

# Actor-pool defaults. A FIXED pool sized to the cluster starts all actors
# up front: the autoscaling (1, N) pool ramps reactively and measured only
# ~5x effective parallelism on a 17s job (163k turns/s vs 572k with a fixed
# pool on 32 CPUs). Leave headroom for read/write tasks — a pool equal to
# cluster CPUs starves the producer operators. batch ~2k turns (a few
# hundred KB of text) keeps per-batch Python overhead amortized without
# bloating actor heaps.
DEFAULT_CONCURRENCY = None  # resolved per-pipeline via default_concurrency()
DEFAULT_BATCH_SIZE = 2048


def default_concurrency() -> int:
    """Fixed actor-pool size: 3/4 of cluster CPUs, min 1.

    A PROPORTIONAL fraction (not cpus-minus-constant) keeps the actor density
    identical at every cluster size — a constant headroom gave 4 CPUs only
    2 detection actors (50%) vs 14/16 (87.5%), which made N-vs-4N scaling
    comparisons superlinear by construction. The remaining 1/4 feeds read,
    shuffle and write tasks so no stage starves the others."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(1, (3 * cpus) // 4)

# Broadcasting the plan index is cheaper than a shuffle join until the plan
# stops fitting comfortably in the object store / actor heaps.
BROADCAST_PLAN_MAX_ROWS = 2_000_000

# Plan rows per pack() partial-combine batch (module-level so tests can
# shrink it to force keys to straddle batch boundaries).
_PACK_BATCH_SIZE = 65536

# Typed span payload for the packed-plan combiner (shuffle-join path):
# mirrors the plan schema's (start, end, rule_pattern, members) with a
# nullable members list (None = envelope fallback, schema.PLAN semantics).
PACKED_SPAN = pa.struct(
    [
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("rule_pattern", pa.string()),
        ("members", pa.list_(pa.int32())),
    ]
)


def read_turns(path: Union[str, Sequence[str]], columns: Optional[Sequence[str]] = None) -> rd.Dataset:
    """Prune at the read: detection needs (conv_id, turn_idx, text) + the
    carried-through output columns; callers doing counts can prune harder."""
    return rd.read_parquet(path, columns=list(columns) if columns else None)


def plan_pipeline(
    turns: rd.Dataset,
    rules: Sequence[RuleLike],
    *,
    concurrency=DEFAULT_CONCURRENCY,
    batch_size: int = DEFAULT_BATCH_SIZE,
    strict: bool = True,
) -> rd.Dataset:
    """Detection only -> PLAN rows (PlanCommand analog)."""
    if concurrency is None:
        concurrency = default_concurrency()
    return turns.map_batches(
        RuleMatcher,
        fn_constructor_kwargs={
            "rules": _specs(rules),
            "mode": "plan",
            "strict": strict,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def apply_pipeline(
    turns: rd.Dataset,
    plan: Union[rd.Dataset, pa.Table],
    *,
    concurrency=DEFAULT_CONCURRENCY,
    batch_size: int = DEFAULT_BATCH_SIZE,
    broadcast_max_rows: int = BROADCAST_PLAN_MAX_ROWS,
) -> rd.Dataset:
    """Plan ⋈ turns -> REDACTED rows (ApplyCommand analog).

    Small plan: broadcast hash-lookup join (no shuffle). Large plan: falls
    back to a partitioned shuffle join on (conv_id, turn_idx) and applies
    spans group-wise. Left-outer either way (copy-through for matchless turns).
    """
    if concurrency is None:
        concurrency = default_concurrency()
    if isinstance(plan, pa.Table):
        plan_rows = plan.num_rows
        small = plan_rows <= broadcast_max_rows
        plan_tbl = plan if small else None
        plan_ds = rd.from_arrow(plan) if not small else None
    else:
        plan_rows = plan.count()
        small = plan_rows <= broadcast_max_rows
        plan_tbl = (
            pa.concat_tables(ray.get(plan.materialize().to_arrow_refs())) if small else None
        )
        plan_ds = plan if not small else None

    if small:
        index_ref = ray.put(build_plan_index(plan_tbl))
        return turns.map_batches(
            Applier,
            fn_constructor_kwargs={"plan_ref": index_ref},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            zero_copy_batch=True,
        )
    return _apply_shuffle_join(
        turns, plan_ds, plan_rows=plan_rows, concurrency=concurrency, batch_size=batch_size
    )


def _packed_spans_array(values) -> pa.Array:
    """list<struct> span payload for the packed-plan table: typed Arrow data
    end to end (no JSON codec per span). ``members`` stays nullable — None
    means envelope fallback, exactly as in the plan schema."""
    return pa.array(
        [
            [
                {"start": s, "end": e, "rule_pattern": r, "members": m}
                for s, e, r, m in v
            ]
            for v in values
        ],
        type=pa.list_(PACKED_SPAN),
    )


def _packed_key_col(t: pa.Table) -> pa.Array:
    k = pc.binary_join_element_wise(
        pc.cast(t.column("conv_id"), pa.string()),
        pc.cast(t.column("turn_idx"), pa.string()),
        "\x1f",
    )
    return k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k


def _split_filter(t: pa.Table, keys_ref, keep_dups: bool) -> pa.Table:
    """One-shot task-based semi/anti-join against the broadcast split-key
    set (``ray.get`` of a ``ray.put`` ref inside a task = one local
    object-store read; no actor-pool startup for a single is_in pass)."""
    keys = keys_ref if isinstance(keys_ref, pa.Array) else ray.get(keys_ref)
    m = pc.is_in(_packed_key_col(t), value_set=keys)
    return t.filter(m if keep_dups else pc.invert(m))


def _merge_packed_group(g: pa.Table) -> pa.Table:
    """map_groups kernel: final per-key combine for a boundary-split turn —
    concatenate its packed span lists into one row (distributed; the driver
    never touches span payloads)."""
    spans: list = []
    for lst in g.column("packed_spans").to_pylist():
        spans.extend(
            (d["start"], d["end"], d["rule_pattern"], d["members"]) for d in lst
        )
    spans.sort(key=lambda x: (x[0], x[1], x[2]))
    return pa.table(
        {
            "conv_id": g.column("conv_id").slice(0, 1),
            "turn_idx": g.column("turn_idx").slice(0, 1),
            "packed_spans": _packed_spans_array([spans]),
        }
    )


def _encode_packed(t: pa.Table) -> pa.Table:
    """Serialize each turn's ``list<struct>`` span payload to one binary
    cell so it can ride through ``Dataset.join`` (see the call site for the
    Acero nested-payload limitation)."""
    import pickle

    col = t.column("packed_spans")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = pa.array(
        [
            pickle.dumps(
                [(d["start"], d["end"], d["rule_pattern"], d["members"]) for d in v],
                protocol=pickle.HIGHEST_PROTOCOL,
            )
            for v in col.to_pylist()
        ],
        type=pa.binary(),
    )
    return t.set_column(
        t.schema.get_field_index("packed_spans"), "packed_spans", enc
    )


def _apply_shuffle_join(turns, plan_ds, *, plan_rows, concurrency, batch_size):
    """Large-plan path: pre-aggregate plan rows per turn into packed span
    lists (combiner before the shuffle), then a hash-partitioned left-outer
    Dataset.join on (conv_id, turn_idx), then mask per row."""

    def pack(batch: pa.Table) -> pa.Table:
        # partial combine: one row per (conv, turn) per batch
        idx = build_plan_index(batch)
        return pa.table(
            {
                "conv_id": pa.array([k[0] for k in idx], type=pa.string()),
                "turn_idx": pa.array([k[1] for k in idx], type=pa.int32()),
                "packed_spans": _packed_spans_array(idx.values()),
            }
        )

    packed = plan_ds.map_batches(
        pack, batch_format="pyarrow", batch_size=_PACK_BATCH_SIZE
    ).materialize()
    # FINAL combine: a turn whose plan rows straddle a pack-batch boundary
    # yields >1 packed row, and a left-outer join against duplicate keys
    # DUPLICATES that turn in the output (measured: 16,000,007 rows from a
    # 16,000,000-turn input). Split keys are O(number of batches), so find
    # them with one skinny groupby-count; only those rows re-shuffle through
    # a tiny groupby().map_groups combine — the driver holds the KEY LIST
    # only, never span payloads.
    dup_tbls = [
        t
        for t in ray.get(
            packed.groupby(["conv_id", "turn_idx"])
            .count()
            .map_batches(
                # aggregates can emit empty zero-column blocks: pass through
                lambda t: t
                if t.num_columns == 0
                else t.filter(pc.greater(t.column("count()"), 1)).drop_columns(
                    ["count()"]
                ),
                batch_format="pyarrow",
            )
            .materialize().to_arrow_refs()
        )
        if len(t.schema)
    ]
    dup_tbl = pa.concat_tables(dup_tbls) if dup_tbls else None
    if dup_tbl is not None and dup_tbl.num_rows > 0:
        dup_keys = _packed_key_col(dup_tbl)
        keys_ref = ray.put(dup_keys)
        split = packed.map_batches(
            _split_filter,
            fn_args=(keys_ref,),
            fn_kwargs={"keep_dups": True},
            batch_format="pyarrow",
        )
        merged = split.groupby(["conv_id", "turn_idx"]).map_groups(
            _merge_packed_group, batch_format="pyarrow"
        )
        rest = packed.map_batches(
            _split_filter,
            fn_args=(keys_ref,),
            fn_kwargs={"keep_dups": False},
            batch_format="pyarrow",
        )
        packed = rest.union(merged)
    # Join-boundary codec: Acero's hash join (which backs Dataset.join)
    # rejects nested types in non-key payload columns (ArrowInvalid: "Data
    # type list<struct<...>> is not supported in join non-key field"), so the
    # typed list<struct> payload — used end to end through pack and the
    # distributed split-key combine above — is packed into ONE binary cell
    # per turn for the join hop only. pickle round-trips members=None (the
    # envelope-fallback sentinel) and is cheaper than the per-span JSON codec
    # this replaces; only plan-HIT turns (one packed row each) pay it.
    packed = packed.map_batches(_encode_packed, batch_format="pyarrow")
    # Partition count grows with the PLAN (target ~2M rows per partition so
    # partition state stays bounded at any plan size), floored at the
    # cluster core count and capped at 2x: measured at 16M turns / 16 CPUs,
    # 8 partitions = 273s, 16 = 167s, 32 = 200s, 64 = 281s — ~one partition
    # per core is the sweet spot (fewer starves the reduce, more pays
    # per-partition scheduling), and the bound scales with the cluster on a
    # real 4N-node deployment.
    cpus = int(ray.cluster_resources().get("CPU", 8))
    by_rows = -(-max(1, plan_rows) // 2_000_000)  # ceil
    num_partitions = globals().get("_FORCE_PARTITIONS") or max(
        2, min(max(by_rows, cpus), cpus * 2)
    )
    joined = turns.join(
        packed,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("conv_id", "turn_idx"),
    )

    def mask_joined(batch: pa.Table) -> pa.Table:
        """Vectorized copy-through: matchless turns (null packed_spans —
        the vast majority at realistic hit rates) never become Python
        strings; only matched rows run the masking loop, then results
        scatter back to input order via concat + take (the same shape as
        the detect prefilter emission). Measured at 16M turns / 16 CPUs:
        the row loop over all rows cost 341s of UDF time."""
        import pickle

        import numpy as np

        from pdfredact_ray.schema import REDACTED, SPAN
        from pdfredact_ray.stages.apply import apply_spans_to_text

        n = batch.num_rows
        text_col = batch.column("text")
        if isinstance(text_col, pa.ChunkedArray):
            text_col = text_col.combine_chunks()
        text_col = text_col.cast(pa.string())
        packed = batch.column("packed_spans")
        if isinstance(packed, pa.ChunkedArray):
            packed = packed.combine_chunks()
        has = pc.fill_null(pc.is_valid(packed), False).to_numpy(zero_copy_only=False)
        hit_idx = np.flatnonzero(has)
        if len(hit_idx) == 0:
            red = text_col
            spans = pa.array([[]] * n, type=pa.list_(SPAN))
            nred = pa.array(np.zeros(n, dtype=np.int32), type=pa.int32())
        else:
            texts_sub = text_col.take(pa.array(hit_idx)).to_pylist()
            packed_sub = packed.take(pa.array(hit_idx)).to_pylist()
            red_sub, spans_sub, nred_sub = [], [], []
            for text, p in zip(texts_sub, packed_sub):
                # (start, end, rule_pattern, members-or-None) tuples from the
                # join-boundary binary codec (typed everywhere else)
                all_spans = pickle.loads(p)
                all_spans.sort(key=lambda x: (x[0], x[1], x[2]))
                red_sub.append(apply_spans_to_text(text, all_spans))
                spans_sub.append(
                    [{"start": s, "end": e, "rule_pattern": r} for s, e, r, _ in all_spans]
                )
                nred_sub.append(len(all_spans))
            pass_idx = np.flatnonzero(~has)
            perm = np.concatenate([pass_idx, hit_idx])
            inv = np.empty(n, dtype=np.int64)
            inv[perm] = np.arange(n)
            inv_arr = pa.array(inv)
            red = pa.concat_arrays(
                [text_col.take(pa.array(pass_idx)), pa.array(red_sub, type=pa.string())]
            ).take(inv_arr)
            spans = pa.concat_arrays(
                [
                    pa.array([[]] * len(pass_idx), type=pa.list_(SPAN)),
                    pa.array(spans_sub, type=pa.list_(SPAN)),
                ]
            ).take(inv_arr)
            nred = pa.concat_arrays(
                [
                    pa.array(np.zeros(len(pass_idx), dtype=np.int32), type=pa.int32()),
                    pa.array(nred_sub, type=pa.int32()),
                ]
            ).take(inv_arr)
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "role": batch.column("role"),
                "tool": batch.column("tool"),
                "ts": batch.column("ts"),
                "redacted_text": red,
                "spans": spans,
                "n_redactions": nred,
            },
            schema=REDACTED,
        )

    return joined.map_batches(mask_joined, batch_format="pyarrow", batch_size=batch_size)


def redact_pipeline(
    turns: rd.Dataset,
    rules: Sequence[RuleLike],
    *,
    concurrency=DEFAULT_CONCURRENCY,
    batch_size: int = DEFAULT_BATCH_SIZE,
    strict: bool = True,
    emit_spans: bool = True,
) -> rd.Dataset:
    """Fused detect+merge+mask (RedactCommand analog) -> REDACTED rows.

    ``emit_spans=False`` emits the REDACTED_NOSPANS shape for ordered sinks:
    span offsets are the plan's job, and skipping the list<struct> build
    removes per-row dict work plus a whole projection pass before the sort."""
    if concurrency is None:
        concurrency = default_concurrency()
    return turns.map_batches(
        RuleMatcher,
        fn_constructor_kwargs={
            "rules": _specs(rules),
            "mode": "redact",
            "strict": strict,
            "emit_spans": emit_spans,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def flatten_pipeline(
    turns: rd.Dataset,
    rules: Sequence[RuleLike],
    *,
    wrap: int = 64,
    fmt: str = "bmp1",
    concurrency=DEFAULT_CONCURRENCY,
    batch_size: int = DEFAULT_BATCH_SIZE,
    flatten_batch_size: int = 256,
    strict: bool = True,
) -> rd.Dataset:
    """Redact + flatten fused (the reference's planned `flatten` command,
    /root/reference/docs/FLATTEN_MODE.md:22-27: "applies redactions and
    flattens … in one operation"): detect+mask, then rasterize each turn's
    redacted text into a real BMP and DROP every text column — no text
    layer survives in the output, only pixels.

    ``flatten_batch_size`` is deliberately smaller than the text stages'
    batch size: bmp1 rasters are ~8x the text bytes (bmp24 ~192x), so a
    batch x concurrency of rendered payloads must still fit the worker
    heap — the same sizing rule as the multimodal stages.
    """
    from pdfredact_ray.stages.flatten import flatten_batch

    if fmt not in ("bmp1", "bmp24"):
        raise NotImplementedError(f"flatten: format {fmt!r} not supported (bmp1|bmp24)")
    red = redact_pipeline(
        turns, rules,
        concurrency=concurrency, batch_size=batch_size,
        strict=strict, emit_spans=False,
    )
    # task-based (NOT a second fixed actor pool: the RuleMatcher pool owns
    # the actor slots; two full pools deadlock on small CPU counts)
    return red.map_batches(
        flatten_batch,
        fn_kwargs={"wrap": wrap, "fmt": fmt},
        batch_format="pyarrow",
        batch_size=flatten_batch_size,
        zero_copy_batch=True,
    )


def order_restore(ds: rd.Dataset) -> rd.Dataset:
    """Stable turn ordering: sort by (conv_id, turn_idx). This is the
    all-to-all exchange of the flagship pipeline; Ray's sort sample-partitions
    the key range, which also spreads whale conversations across several
    blocks (turn_idx is part of the key), bounding skew.

    The sort is an all-to-all BARRIER: its input is fully materialized in the
    object store before any reduce runs, whichever way we feed it. Feeding it
    from the live streaming executor measured 16-36s of scheduler pathology
    on 100k rows (repartition+sort stages reporting ~36s wall against ~4s of
    task time — the upstream actor pool and the shuffle fight over the same
    CPU slots); an explicit .materialize() boundary first gets the identical
    data into the store and the same sort then takes 3-4s. Peak memory is
    unchanged at any scale, so materialize-then-sort is strictly better here.
    For the truly-huge case prefer the lineage job's hash-bucket layout
    (state/lineage.py), which replaces the global sort entirely."""
    return ds.materialize().sort(["conv_id", "turn_idx"])


def _specs(rules: Sequence[RuleLike]) -> list:
    return [r.to_dict() if isinstance(r, RedactionRule) else dict(r) for r in rules]
