"""Driver-facing redaction queries over the synthetic transcript corpus.

Each builder takes ``sf_dir`` (a /root/testdata/sfX dir — only the scale
label is used; the turns table itself is synthesized deterministically by
``sources.turns.ensure_turns`` and cached under /tmp, where the DuckDB
oracle reads the *same* parquet file).

Plain-turn filtering: the DuckDB oracles can't tokenize @@LAYOUT@@ payload
turns, so the SQL-checked queries exclude them on BOTH sides with the same
predicate (``text NOT LIKE '@@LAYOUT@@%'``). The corpus's plain turns are
single-line with single spaces, so flat searchable text == raw text and
DuckDB's non-overlapping leftmost ``regexp_extract_all`` has exactly the
engine's match semantics (SURVEY.md §2.1 #2).
"""

from __future__ import annotations

from typing import List, Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from pdfredact_ray.functions.rules import RedactionRule, default_rules
from pdfredact_ray.pipelines.redact import (
    apply_pipeline,
    order_restore,
    plan_pipeline,
    read_turns,
    redact_pipeline,
)
from pdfredact_ray.functions.runs import LAYOUT_PREFIX
from pdfredact_ray.sources.turns import ensure_turns

# The two rules whose whole-token masks are exactly SQL-expressible on this
# corpus (SSN tokens are always the 11-char ssn + '.'; CONFIDENTIAL always
# appears as a standalone token) — the masked-text-equality flagship check.
MASK_EQUALITY_RULES = [
    RedactionRule(r"\d{3}-\d{2}-\d{4}", is_regex=True, description="SSN"),
    RedactionRule("CONFIDENTIAL", description="classification keyword"),
]


def _plain(ds: rd.Dataset) -> rd.Dataset:
    def keep_plain(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.starts_with(batch.column("text"), LAYOUT_PREFIX)))

    return ds.map_batches(keep_plain, batch_format="pyarrow")


def _turns(sf_dir: str) -> rd.Dataset:
    return read_turns(ensure_turns(sf_dir))


def redact_full(sf_dir: str) -> rd.Dataset:
    """Flagship: full fused redaction (all default rules, layout turns
    included), order-restored. Rows-only driver check; byte-for-byte
    equality is covered by the pytest oracle suite."""
    # emit_spans=False: list<struct> hashes awkwardly driver-side (spans are
    # pytest-covered), and never building it is the ordered-sink fast shape
    ds = redact_pipeline(_turns(sf_dir), default_rules(), emit_spans=False)
    return order_restore(ds)


def flatten_roundtrip(sf_dir: str) -> rd.Dataset:
    """Flatten mode proven end-to-end through the PIXEL domain: redact with
    the full default ruleset, rasterize each turn's redacted text into a
    real 1-bit BMP (stages/flatten.py), then decode the BMP and
    de-rasterize the glyph grid back to text. The recovered text plus the
    image dims/byte-size must match the generator's expected_redacted
    sidecar exactly — i.e. the flattened artifact demonstrably still
    carries the redacted content, but only as pixels (the reference's
    planned flatten mode, /root/reference/docs/FLATTEN_MODE.md)."""
    from pdfredact_ray.pipelines.redact import flatten_pipeline
    from pdfredact_ray.stages.flatten import derasterize_image

    flat = flatten_pipeline(_turns(sf_dir), default_rules())

    def roundtrip(batch: pa.Table) -> pa.Table:
        payloads = batch.column("img_bmp").to_pylist()
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "text": pa.array([derasterize_image(p) for p in payloads], pa.string()),
                "img_w": batch.column("img_w"),
                "img_h": batch.column("img_h"),
                "img_nbytes": pc.cast(pc.binary_length(batch.column("img_bmp")), pa.int64()),
            }
        )

    return flat.map_batches(roundtrip, batch_format="pyarrow", batch_size=256)


def redact_mask_equality(sf_dir: str) -> rd.Dataset:
    """Per-turn masked-text equality vs a pure-SQL oracle (SSN + literal)."""
    ds = redact_pipeline(_plain(_turns(sf_dir)), MASK_EQUALITY_RULES)
    return ds.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "redacted_text"]),
        batch_format="pyarrow",
    )


def _apply_equality(sf_dir: str, broadcast_max_rows: int) -> rd.Dataset:
    """Two-phase plan -> apply (J1/F2), same oracle as redact_mask_equality:
    the apply join's masked output must be byte-identical to the fused
    pipeline's. ``broadcast_max_rows=0`` forces the partitioned shuffle-join
    path; the default exercises the broadcast-index path."""
    turns = _plain(_turns(sf_dir))
    plan = plan_pipeline(turns, MASK_EQUALITY_RULES).materialize()
    out = apply_pipeline(_plain(_turns(sf_dir)), plan, broadcast_max_rows=broadcast_max_rows)
    return out.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "redacted_text"]),
        batch_format="pyarrow",
    )


def apply_mask_equality(sf_dir: str) -> rd.Dataset:
    """Broadcast-join apply path (ApplyCommand analog)."""
    return _apply_equality(sf_dir, broadcast_max_rows=2_000_000)


def apply_mask_equality_shuffle(sf_dir: str) -> rd.Dataset:
    """Partitioned shuffle-join apply path (the large-plan 100 TB shape)."""
    return _apply_equality(sf_dir, broadcast_max_rows=0)


def plan_roundtrip_apply(sf_dir: str) -> rd.Dataset:
    """S2/S3 driver coverage: detect -> ``write_plan`` to a parquet file with
    self-binding metadata -> ``read_plan`` + ``read_plan_meta`` from disk ->
    re-bind the turns input FROM THE PLAN -> apply. Same oracle as
    apply_mask_equality, so the persisted plan round-trip (extend.py U3, the
    RedactionPlanSerializer.cs:38-82 analog) is hash-checked end-to-end."""
    import os
    import tempfile

    import ray

    from pdfredact_ray.extend import read_plan, read_plan_meta, write_plan
    from pdfredact_ray.functions.rules import compile_rules

    turns_path = ensure_turns(sf_dir)
    plan_ds = plan_pipeline(_plain(read_turns(turns_path)), MASK_EQUALITY_RULES)
    plan_tbl = pa.concat_tables(
        [t for t in ray.get(plan_ds.materialize().to_arrow_refs()) if len(t.schema)]
    )
    out_path = os.path.join(
        tempfile.gettempdir(),
        "pdfredact_plan_roundtrip",
        os.path.basename(os.path.dirname(turns_path)) + ".plan.parquet",
    )
    rs_hash = compile_rules(MASK_EQUALITY_RULES).content_hash()
    write_plan(plan_tbl, out_path, source_path=turns_path, ruleset_hash=rs_hash)

    meta = read_plan_meta(out_path)
    assert meta["source_path"] == turns_path and meta["ruleset_hash"] == rs_hash
    plan_back = read_plan(out_path)
    out = apply_pipeline(_plain(read_turns(meta["source_path"])), plan_back)
    return out.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "redacted_text"]),
        batch_format="pyarrow",
    )


def redact_match_counts(sf_dir: str) -> pa.Table:
    """Total match/region count per rule over plain turns. Partial counts
    combine inside map_batches; only (rule_pattern, count) rows shuffle."""
    plan = plan_pipeline(_plain(_turns(sf_dir)), default_rules())
    agg = plan.groupby("rule_pattern").count()
    return agg.map_batches(
        lambda t: t.rename_columns(["rule_pattern", "n_matches"]), batch_format="pyarrow"
    )


def redact_turn_counts(sf_dir: str) -> rd.Dataset:
    """(conv_id, turn_idx, n_redactions) for plain turns with >=1 region."""
    plan = plan_pipeline(_plain(_turns(sf_dir)), default_rules())
    agg = plan.groupby(["conv_id", "turn_idx"]).count()
    return agg.map_batches(
        lambda t: t.rename_columns(["conv_id", "turn_idx", "n_redactions"]),
        batch_format="pyarrow",
    )


def plan_matched_text(sf_dir: str) -> rd.Dataset:
    """Plan rows (regex rules only) as (conv_id, turn_idx, matched_text,
    rule_pattern) — the multiset of matched slices per turn."""
    regex_rules = [r for r in default_rules() if r.is_regex]
    plan = plan_pipeline(_plain(_turns(sf_dir)), regex_rules)
    return plan.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "matched_text", "rule_pattern"]),
        batch_format="pyarrow",
    )


def job_turn_counts(sf_dir: str) -> rd.Dataset:
    """The resumable lineage job (S4 sink + hash-bucket layout) through the
    driver oracle: run redact_job end-to-end (fresh, full default ruleset),
    read the bucket-partitioned output back, and project the plain turns'
    (conv_id, turn_idx, n_redactions > 0) — the same oracle as
    redact_turn_counts. Layout turns keep their @@LAYOUT@@ prefix in
    redacted_text, so plain filtering works on the output alone."""
    import os
    import tempfile

    from pdfredact_ray.functions.rules import default_rules
    from pdfredact_ray.state.lineage import redact_job

    turns_path = ensure_turns(sf_dir)
    out_dir = os.path.join(
        tempfile.gettempdir(), "pdfredact_job_query",
        os.path.basename(os.path.dirname(turns_path)),
    )
    redact_job(
        turns_path,
        [r.to_dict() for r in default_rules()],
        out_dir,
        n_buckets=16,
        resume=False,
    )
    out = rd.read_parquet(out_dir, columns=["conv_id", "turn_idx", "redacted_text", "n_redactions"])

    def shape(t: pa.Table) -> pa.Table:
        keep = t.filter(
            pc.and_(
                pc.invert(pc.starts_with(t.column("redacted_text"), LAYOUT_PREFIX)),
                pc.greater(t.column("n_redactions"), 0),
            )
        )
        return pa.table(
            {
                "conv_id": keep.column("conv_id"),
                "turn_idx": keep.column("turn_idx"),
                "n_redactions": pc.cast(keep.column("n_redactions"), pa.int64()),
            }
        )

    return out.map_batches(shape, batch_format="pyarrow")


# Stage-1 group bound for conv_assemble: a group is (conv_id, turn_idx //
# _CONV_BUCKET) so no map_groups call ever sees more than _CONV_BUCKET turn
# rows, however long the conversation (the sessionize two-stage pattern).
_CONV_BUCKET = 4096


def conv_assemble(sf_dir: str) -> rd.Dataset:
    """Conversation reassembly (the context-assembly op every LLM data
    pipeline needs), whale-proof: stage 1 assembles per-(conv, turn-range)
    partial strings over groups bounded at ``_CONV_BUCKET`` rows; stage 2
    stitches a conversation's few partials in bucket order. Bucket id is
    monotone in turn_idx, so bucket-order stitch of turn_idx-sorted partials
    equals the global turn_idx order. A 10^6-turn conversation is ~250
    partial rows in stage 2, never one million-row group. (The final
    conv_text cell still holds the whole conversation — inherent to the
    output schema, not to the grouping.)"""
    ds = read_turns(ensure_turns(sf_dir), columns=["conv_id", "turn_idx", "role", "text"])
    return assemble_conversations(ds)


def assemble_conversations(ds: rd.Dataset) -> rd.Dataset:
    """Two-stage assembly over a (conv_id, turn_idx, role, text) Dataset —
    see conv_assemble for the whale-conversation rationale."""

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "turn_bucket",
            pc.cast(pc.divide(t.column("turn_idx"), _CONV_BUCKET), pa.int32()),
        )

    def partial(group: pa.Table) -> pa.Table:
        import numpy as np

        # stable: duplicate turn_idx must not flap the joined order run-to-run
        order = np.argsort(group.column("turn_idx").to_numpy(), kind="stable")
        roles = group.column("role").to_pylist()
        texts = group.column("text").to_pylist()
        joined = "\n".join(f"{roles[i]}: {texts[i]}" for i in order)
        return pa.table(
            {
                "conv_id": group.column("conv_id").slice(0, 1),
                "turn_bucket": group.column("turn_bucket").slice(0, 1),
                "n_turns": pa.array([group.num_rows], pa.int64()),
                "part": pa.array([joined], pa.string()),
            }
        )

    def stitch(group: pa.Table) -> pa.Table:
        import numpy as np

        order = np.argsort(group.column("turn_bucket").to_numpy(), kind="stable")
        parts = group.column("part").to_pylist()
        return pa.table(
            {
                "conv_id": group.column("conv_id").slice(0, 1),
                "n_turns": pa.array(
                    [int(pc.sum(group.column("n_turns")).as_py())], pa.int64()
                ),
                "conv_text": pa.array(["\n".join(parts[i] for i in order)], pa.string()),
            }
        )

    partials = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["conv_id", "turn_bucket"])
        .map_groups(partial, batch_format="pyarrow")
    )
    return partials.groupby("conv_id").map_groups(stitch, batch_format="pyarrow")


def redact_fragment_digits(sf_dir: str) -> rd.Dataset:
    """Fragment-aware path over plain text: numeric literal rules auto-route
    through the two-pass digit-run tokenizer, so spaced pins ('1 2 3 4')
    match '1234'. Not SQL-expressible — rows-only check; kernel equality is
    pytest-covered."""
    # Explicit fragment-aware regex (the reference's own fixture shape:
    # FragmentAwareTextLocatorTests.cs:78-106 uses \d{4} + explicit flag):
    # catches boxed-digit layout payloads AND spaced-pin digit runs, so the
    # query returns nonzero rows on every generated corpus scale.
    rules = [RedactionRule(r"\d{4,}", is_regex=True, fragment_aware=True)]
    ds = redact_pipeline(_turns(sf_dir), rules)

    def shape(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.greater(t.column("n_redactions"), 0))
        return keep.select(["conv_id", "turn_idx", "redacted_text", "n_redactions"])

    return ds.map_batches(shape, batch_format="pyarrow")


CTX_RANGE_W = 256  # turn-index positions per context-window range group


def conv_context_windows(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Chat-training context assembly: for every turn, the md5 of the
    newline-joined texts of its previous turns with turn_idx in
    [ti-k, ti-1] inside the conversation — the context window an SFT data
    pipeline materializes per sample. INDEX (RANGE) semantics, not ROWS,
    precisely so distribution needs no global state: a turn's context can
    only come from k index positions back.

    Whale-proof by construction (the hopping-window replication trick — no
    size gate needed): rows land in (conv, turn_idx // CTX_RANGE_W) range
    groups salted into a fixed bucket count; the last k index positions of
    each range are REPLICATED into the next range as context-only shadow
    rows, so a cross-boundary window never needs another group and a
    10^6-turn conversation becomes ~4k independent segments instead of one
    group. Emits (conv_id, turn_idx, n_context_turns, context_md5); the
    SQL oracle is one RANGE-frame window over the same turns parquet."""
    ds = read_turns(ensure_turns(sf_dir), columns=["conv_id", "turn_idx", "text"])
    return context_windows_over(ds, k)


def context_windows_over(ds, k: int = 3):
    """Dataset-core of ``conv_context_windows``: takes any
    (conv_id, turn_idx, text) Dataset — the scale benches and the planted-
    whale tests feed synthetic corpora through here directly."""
    import hashlib

    import numpy as np

    if k >= CTX_RANGE_W:
        raise ValueError(
            f"context width k={k} must be < CTX_RANGE_W={CTX_RANGE_W}: the "
            "range groups replicate only the last k index positions forward, "
            "so a wider window would be silently truncated at range boundaries"
        )
    W = np.int64(CTX_RANGE_W)
    NB = np.int64(64)

    def replicate(t: pa.Table) -> pa.Table:
        import zlib

        conv = np.asarray(t.column("conv_id").to_pylist(), dtype=object)
        ti = t.column("turn_idx").to_numpy().astype(np.int64)
        uconv, inv = np.unique(conv, return_inverse=True)
        ccode = np.fromiter(
            (zlib.crc32(c.encode()) for c in uconv), dtype=np.int64, count=len(uconv)
        )[inv]
        rng = ti // W
        tail = (ti % W) >= (W - np.int64(k))
        texts = t.column("text")
        out = pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "text": texts,
                "rng": pa.array(rng, pa.int64()),
                "shadow": pa.array(np.zeros(len(ti), np.int8), pa.int8()),
                "salt": pa.array((ccode + rng) % NB, pa.int64()),
            }
        )
        if tail.any():
            sel = pa.array(np.flatnonzero(tail))
            shadows = pa.table(
                {
                    "conv_id": t.column("conv_id").take(sel),
                    "turn_idx": t.column("turn_idx").take(sel),
                    "text": texts.take(sel),
                    "rng": pa.array(rng[tail] + 1, pa.int64()),
                    "shadow": pa.array(np.ones(int(tail.sum()), np.int8), pa.int8()),
                    "salt": pa.array((ccode[tail] + rng[tail] + 1) % NB, pa.int64()),
                }
            )
            out = pa.concat_tables([out, shadows])
        return out

    def per_salt(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int32()),
                    "n_context_turns": pa.array([], pa.int64()),
                    "context_md5": pa.array([], pa.string()),
                }
            )
        conv = np.asarray(g.column("conv_id").to_pylist(), dtype=object)
        ti = g.column("turn_idx").to_numpy().astype(np.int64)
        rng = g.column("rng").to_numpy().astype(np.int64)
        shadow = g.column("shadow").to_numpy().astype(bool)
        texts = g.column("text").to_pylist()
        uconv, ccode = np.unique(conv, return_inverse=True)
        # segment = (conv, rng); sort by segment then turn_idx
        order = np.lexsort((ti, rng, ccode))
        seg_key = ccode[order] * (np.int64(1) << np.int64(32)) + rng[order]
        ti_s = ti[order]
        sh_s = shadow[order]
        starts = np.flatnonzero(np.r_[True, seg_key[1:] != seg_key[:-1]])
        bounds = np.append(starts, len(seg_key))
        out_c, out_t, out_n, out_m = [], [], [], []
        for a, b in zip(bounds[:-1], bounds[1:]):
            seg_ti = ti_s[a:b]
            for j in range(a, b):
                if sh_s[j]:
                    continue
                t_j = ti_s[j]
                loidx = int(np.searchsorted(seg_ti, t_j - k, side="left"))
                hiidx = int(np.searchsorted(seg_ti, t_j, side="left"))
                ctx_rows = [order[a + x] for x in range(loidx, hiidx)]
                ctx = "\n".join(texts[r] for r in ctx_rows)
                out_c.append(conv[order[j]])
                out_t.append(int(t_j))
                out_n.append(hiidx - loidx)
                out_m.append(hashlib.md5(ctx.encode()).hexdigest())
        return pa.table(
            {
                "conv_id": pa.array(out_c, pa.string()),
                "turn_idx": pa.array(np.asarray(out_t, np.int64), pa.int64()).cast(pa.int32()),
                "n_context_turns": pa.array(out_n, pa.int64()),
                "context_md5": pa.array(out_m, pa.string()),
            }
        )

    return (
        ds.map_batches(replicate, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(per_salt, batch_format="pyarrow")
    )


def turn_boilerplate_flags(
    sf_dir: str, min_convs: int = 2, k_tokens: int = 5, n_buckets: int = 64
) -> rd.Dataset:
    """Transcript-axis boilerplate detection (the north-star's boilerplate
    stripper applied to turns instead of DOM nodes): a turn is FLAGGED when
    its ``k_tokens``-token normalized prefix appears in >= ``min_convs``
    DISTINCT conversations — repeated system prompts, templated tool
    banners, canned greetings. Emits (conv_id, turn_idx, prefix, n_convs),
    O(flagged) rows; a strip pass is the inverted filter of the same hot
    set.

    Scale shape: prefix extraction is pure Arrow (`split_pattern` →
    `list_slice` → `binary_join`, zero per-row Python — plain turns are
    single-line single-space, so `' '`-split parity with the SQL oracle's
    `string_split` holds, SURVEY.md §2.1 #2). Pass 1 emits per-batch
    DISTINCT (prefix, conv) pairs into crc32(prefix) buckets — the one
    skinny all-to-all, fixed group count, the `dedup_exact` shape — and
    each bucket re-distincts and counts conversations per prefix. The hot
    prefix table is O(boilerplate templates); below `HOTSET_MAX_ROWS` it
    broadcasts once via ray.put and pass 2 is a shuffle-free `is_in`
    filter + sorted-probe count attach; above the gate it stays a Dataset
    and pass 2 inner-hash-joins it on prefix (the
    `cross_doc_repeated_ngrams` fallback shape)."""
    import binascii

    import numpy as np

    from pdfredact_ray.pipelines.corpus import (
        HOTSET_MAX_ROWS,
        _collect,
        _drop_empty_blocks,
    )

    def prefixed(t: pa.Table) -> pa.Table:
        pre = pc.binary_join(
            pc.list_slice(pc.split_pattern(t.column("text"), pattern=" "), 0, k_tokens),
            " ",
        )
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "prefix": pre,
            }
        )

    pre_ds = _plain(_turns(sf_dir)).map_batches(prefixed, batch_format="pyarrow")

    def pair_partial(t: pa.Table) -> pa.Table:
        # distinct (prefix, conv) via factorized int composites — NEVER
        # string concat with a sentinel (numpy <U dtype truncates NULs,
        # and prefixes are arbitrary text so no char is safe)
        pre = np.asarray(t.column("prefix").to_pylist(), dtype=object)
        conv = np.asarray(t.column("conv_id").to_pylist(), dtype=object)
        up, ip = np.unique(pre, return_inverse=True)
        uc, ic = np.unique(conv, return_inverse=True)
        w = max(len(uc), 1)
        comp = np.unique(ip.astype(np.int64) * w + ic)
        pres = up[comp // w]
        convs = uc[comp % w]
        b = np.asarray(
            [binascii.crc32(p.encode()) % n_buckets for p in pres], dtype=np.int64
        )
        return pa.table(
            {
                "prefix": pa.array(pres, pa.string()),
                "conv_id": pa.array(convs, pa.string()),
                "bucket": pa.array(b, pa.int64()),
            }
        )

    def hot_combine(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return pa.table(
                {
                    "prefix": pa.array([], pa.string()),
                    "n_convs": pa.array([], pa.int64()),
                }
            )
        pre = np.asarray(g.column("prefix").to_pylist(), dtype=object)
        conv = np.asarray(g.column("conv_id").to_pylist(), dtype=object)
        up, ip = np.unique(pre, return_inverse=True)
        uc, ic = np.unique(conv, return_inverse=True)
        w = max(len(uc), 1)
        comp = np.unique(ip.astype(np.int64) * w + ic)  # distinct pairs
        uniq_idx, counts = np.unique(comp // w, return_counts=True)
        keep = counts >= min_convs
        return pa.table(
            {
                "prefix": pa.array(up[uniq_idx[keep]], pa.string()),
                "n_convs": pa.array(counts[keep].astype(np.int64), pa.int64()),
            }
        )

    hot_ds = (
        pre_ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(hot_combine, batch_format="pyarrow")
        .materialize()
    )

    if hot_ds.count() > HOTSET_MAX_ROWS:
        # crawl-scale fallback: hot prefixes never leave the cluster.
        # Few partitions on pre-reduced string keys (the measured
        # join_partitions floor) — n_buckets partitions deadlock small
        # CPU counts via the join's internal actor pools. The right side
        # must shed the groupby's zero-column empty blocks first (Acero
        # rejects blocks missing the key column; metadata-only rebuild)
        hot_clean = _drop_empty_blocks(hot_ds)
        if hot_clean is None:
            hot_clean = rd.from_arrow(
                pa.table(
                    {
                        "prefix": pa.array([], pa.string()),
                        "n_convs": pa.array([], pa.int64()),
                    }
                )
            )
        return pre_ds.join(
            hot_clean, join_type="inner", num_partitions=8, on=("prefix",)
        )

    hot = _collect(hot_ds)
    if hot is None or hot.num_rows == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int32()),
                    "prefix": pa.array([], pa.string()),
                    "n_convs": pa.array([], pa.int64()),
                }
            )
        )
    hp = np.asarray(hot.column("prefix").to_pylist(), dtype=object)
    order = np.argsort(hp)
    import ray

    hot_ref = ray.put(
        {
            "prefix": hp[order],
            "n_convs": hot.column("n_convs").to_numpy()[order],
            "keys": pa.array(hp[order], pa.string()),
        }
    )

    def flag(t: pa.Table, ref) -> pa.Table:
        d = ref if isinstance(ref, dict) else ray.get(ref)
        m = pc.is_in(t.column("prefix"), value_set=d["keys"])
        t = t.filter(m)
        pre = np.asarray(t.column("prefix").to_pylist(), dtype=object)
        pos = np.searchsorted(d["prefix"], pre)
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "prefix": t.column("prefix"),
                "n_convs": pa.array(d["n_convs"][pos], pa.int64()),
            }
        )

    return pre_ds.map_batches(flag, fn_args=(hot_ref,), batch_format="pyarrow")


def turn_role_transitions(sf_dir: str) -> pa.Table:
    """Role-bigram (Markov transition) counts over ordered transcripts: for
    every adjacent turn pair inside a conversation (turn_idx exactly one
    apart — gap-aware INDEX adjacency, same contract as
    ``conv_context_windows``), count (prev_role, role). The
    agent-transcript structure primitive: who follows whom, how often a
    tool turn answers an assistant turn, etc.

    Distribution is the k=1 special case of the context-window range-group
    trick: rows land in (conv, turn_idx // CTX_RANGE_W) salt groups with the
    last index position of each range replicated forward as a context-only
    shadow row, so a boundary pair never needs a second group and a
    10^6-turn conversation is ~4k independent segments. Each group emits a
    <= |roles|^2 partial count table, so the post-exchange combine is a few
    KiB regardless of corpus size. Output (prev_role, role, n) with exact
    int64 counts."""
    ds = read_turns(ensure_turns(sf_dir), columns=["conv_id", "turn_idx", "role"])
    return role_transitions_over(ds)


def role_transitions_over(ds: rd.Dataset) -> pa.Table:
    """Dataset-core of ``turn_role_transitions`` for synthetic-corpus tests."""
    import numpy as np

    from pdfredact_ray.pipelines.corpus import _collect

    W = np.int64(CTX_RANGE_W)
    NB = np.int64(64)
    EMPTY = pa.table(
        {
            "prev_role": pa.array([], pa.string()),
            "role": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def replicate(t: pa.Table) -> pa.Table:
        import zlib

        conv = np.asarray(t.column("conv_id").to_pylist(), dtype=object)
        ti = t.column("turn_idx").to_numpy().astype(np.int64)
        uconv, inv = np.unique(conv, return_inverse=True)
        ccode = np.fromiter(
            (zlib.crc32(c.encode()) for c in uconv), dtype=np.int64, count=len(uconv)
        )[inv]
        rng = ti // W
        tail = (ti % W) == (W - 1)
        out = pa.table(
            {
                "ccode": pa.array(ccode, pa.int64()),
                "turn_idx": pa.array(ti, pa.int64()),
                "role": t.column("role"),
                "rng": pa.array(rng, pa.int64()),
                "shadow": pa.array(np.zeros(len(ti), np.int8), pa.int8()),
                "salt": pa.array((ccode + rng) % NB, pa.int64()),
            }
        )
        if tail.any():
            sel = pa.array(np.flatnonzero(tail))
            shadows = pa.table(
                {
                    "ccode": pa.array(ccode[tail], pa.int64()),
                    "turn_idx": pa.array(ti[tail], pa.int64()),
                    "role": t.column("role").take(sel),
                    "rng": pa.array(rng[tail] + 1, pa.int64()),
                    "shadow": pa.array(np.ones(int(tail.sum()), np.int8), pa.int8()),
                    "salt": pa.array((ccode[tail] + rng[tail] + 1) % NB, pa.int64()),
                }
            )
            out = pa.concat_tables([out, shadows])
        return out

    def per_salt(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return EMPTY
        ccode = g.column("ccode").to_numpy().astype(np.int64)
        ti = g.column("turn_idx").to_numpy().astype(np.int64)
        rng = g.column("rng").to_numpy().astype(np.int64)
        shadow = g.column("shadow").to_numpy().astype(bool)
        roles = np.asarray(g.column("role").to_pylist(), dtype=object)
        uroles, rcode = np.unique(roles, return_inverse=True)
        order = np.lexsort((ti, rng, ccode))
        seg = ccode[order] * (np.int64(1) << np.int64(32)) + rng[order]
        ti_s, rc_s, sh_s = ti[order], rcode[order], shadow[order]
        # adjacent-in-segment pairs exactly one index apart; the later row
        # must be real (a shadow's own pair is counted in its home range)
        valid = (seg[1:] == seg[:-1]) & (ti_s[1:] - ti_s[:-1] == 1) & ~sh_s[1:]
        if not valid.any():
            return EMPTY
        pair = rc_s[:-1][valid] * np.int64(len(uroles)) + rc_s[1:][valid]
        upair, cnt = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "prev_role": pa.array(uroles[upair // len(uroles)], pa.string()),
                "role": pa.array(uroles[upair % len(uroles)], pa.string()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    partials = (
        ds.map_batches(replicate, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(per_salt, batch_format="pyarrow")
    )
    t = _collect(partials)
    if t is None or t.num_rows == 0:
        return EMPTY
    prev = np.asarray(t.column("prev_role").to_pylist(), dtype=object)
    cur = np.asarray(t.column("role").to_pylist(), dtype=object)
    n = t.column("n").to_numpy().astype(np.int64)
    vocab, codes = np.unique(np.concatenate([prev, cur]), return_inverse=True)
    pcode, ccode = codes[: len(prev)], codes[len(prev) :]
    upair, inv = np.unique(pcode * np.int64(len(vocab)) + ccode, return_inverse=True)
    tot = np.zeros(len(upair), np.int64)
    np.add.at(tot, inv, n)
    return pa.table(
        {
            "prev_role": pa.array(vocab[upair // len(vocab)], pa.string()),
            "role": pa.array(vocab[upair % len(vocab)], pa.string()),
            "n": pa.array(tot, pa.int64()),
        }
    )
