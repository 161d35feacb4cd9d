"""End-to-end Ray Data pipeline tests: plan / apply / redact over the
synthetic transcript corpus, checked against the pure per-turn oracle."""

import pyarrow.parquet as pq
import pytest

from pdfredact_ray.functions.mask import redact_turn
from pdfredact_ray.functions.rules import RedactionRule, compile_rules, default_rules
from pdfredact_ray.pipelines.redact import (
    apply_pipeline,
    order_restore,
    plan_pipeline,
    read_turns,
    redact_pipeline,
)
from pdfredact_ray.sources.turns import ensure_turns

RULES = default_rules() + [RedactionRule("1234")]
SPECS = [r.to_dict() for r in RULES]


@pytest.fixture(scope="module")
def turns_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("turns")
    return ensure_turns("sf-test", base_dir=str(d), n_turns=1500)


@pytest.fixture(scope="module")
def oracle_map(turns_file):
    rs = compile_rules(RULES)
    tbl = pq.read_table(turns_file)
    out = {}
    for c, t, text in zip(
        tbl.column("conv_id").to_pylist(),
        tbl.column("turn_idx").to_pylist(),
        tbl.column("text").to_pylist(),
    ):
        red, regions = redact_turn(text, rs)
        out[(c, t)] = (text, red, len(regions))
    return out


def test_synth_is_deterministic(tmp_path):
    a = pq.read_table(ensure_turns("sf-det", base_dir=str(tmp_path / "a"), n_turns=300))
    b = pq.read_table(ensure_turns("sf-det", base_dir=str(tmp_path / "b"), n_turns=300))
    assert a.equals(b)


def test_synth_has_families(oracle_map):
    n_matched = sum(1 for _, _, n in oracle_map.values() if n > 0)
    assert 0.1 < n_matched / len(oracle_map) < 0.6  # corpus density sanity


def test_redact_fused_matches_oracle(ray_session, turns_file, oracle_map):
    ds = redact_pipeline(read_turns(turns_file), SPECS)
    got = ds.to_pandas()
    assert len(got) == len(oracle_map)
    for row in got.itertuples(index=False):
        text, red, n = oracle_map[(row.conv_id, row.turn_idx)]
        assert row.redacted_text == red, (row.conv_id, row.turn_idx)
        assert row.n_redactions == n


def test_plan_then_apply_equals_fused(ray_session, turns_file):
    turns = read_turns(turns_file)
    plan = plan_pipeline(turns, SPECS)
    applied = order_restore(apply_pipeline(read_turns(turns_file), plan)).to_pandas()
    fused = order_restore(redact_pipeline(read_turns(turns_file), SPECS)).to_pandas()
    assert applied["redacted_text"].tolist() == fused["redacted_text"].tolist()
    assert applied["n_redactions"].tolist() == fused["n_redactions"].tolist()
    assert applied["conv_id"].tolist() == fused["conv_id"].tolist()


def test_apply_shuffle_join_equals_broadcast(ray_session, turns_file):
    turns = read_turns(turns_file)
    plan = plan_pipeline(turns, SPECS).materialize()
    via_bcast = order_restore(
        apply_pipeline(read_turns(turns_file), plan)
    ).to_pandas()
    via_join = order_restore(
        apply_pipeline(read_turns(turns_file), plan, broadcast_max_rows=0)
    ).to_pandas()
    for col in ("conv_id", "turn_idx", "redacted_text", "n_redactions"):
        assert via_bcast[col].tolist() == via_join[col].tolist(), col


def test_shuffle_join_handles_pack_boundary_splits(ray_session, turns_file, monkeypatch):
    """A turn whose plan rows straddle a pack-batch boundary must NOT be
    duplicated by the left-outer join (measured at 16M rows: +7 output rows
    before the final-combine fix). Tiny pack batches force many splits."""
    import pdfredact_ray.pipelines.redact as R

    turns = read_turns(turns_file)
    plan = plan_pipeline(turns, SPECS).materialize()
    monkeypatch.setattr(R, "_PACK_BATCH_SIZE", 3)
    via_join = order_restore(
        apply_pipeline(read_turns(turns_file), plan, broadcast_max_rows=0)
    ).to_pandas()
    assert len(via_join) == 1500  # exactly one output row per turn
    via_bcast = order_restore(
        apply_pipeline(read_turns(turns_file), plan)
    ).to_pandas()
    for col in ("conv_id", "turn_idx", "redacted_text", "n_redactions"):
        assert via_join[col].tolist() == via_bcast[col].tolist(), col


def test_order_restore_is_stable(ray_session, turns_file):
    ds = order_restore(redact_pipeline(read_turns(turns_file), SPECS))
    df = ds.to_pandas()
    keys = list(zip(df["conv_id"], df["turn_idx"]))
    assert keys == sorted(keys)


def test_empty_ruleset_passthrough(ray_session, turns_file):
    ds = redact_pipeline(read_turns(turns_file), [])
    df = ds.to_pandas()
    src = pq.read_table(turns_file).to_pandas()
    merged = df.merge(src, on=["conv_id", "turn_idx"])
    assert (merged["redacted_text"] == merged["text"]).all()
    assert (merged["n_redactions"] == 0).all()


def test_plan_counts_match_spans(ray_session, turns_file):
    turns = read_turns(turns_file)
    plan_rows = plan_pipeline(turns, SPECS).count()
    red = redact_pipeline(read_turns(turns_file), SPECS)
    total = red.to_pandas()["n_redactions"].sum()
    assert plan_rows == total


def test_generator_ground_truth_default_rules(ray_session, turns_file):
    """The generator's construction-knowledge sidecar (expected.parquet) must
    equal the engine's fused redaction byte-for-byte — the flagship oracle
    (redact_full) exercised in-process."""
    import os

    from pdfredact_ray.sources.turns import expected_path

    exp = pq.read_table(
        expected_path("sf-test", os.path.dirname(os.path.dirname(turns_file)))
    )
    emap = {
        (c, t): (r, n)
        for c, t, r, n in zip(
            exp.column("conv_id").to_pylist(),
            exp.column("turn_idx").to_pylist(),
            exp.column("expected_redacted").to_pylist(),
            exp.column("expected_n").to_pylist(),
        )
    }
    got = redact_pipeline(read_turns(turns_file), [r.to_dict() for r in default_rules()]).to_pandas()
    assert len(got) == len(emap)
    for row in got.itertuples(index=False):
        red, n = emap[(row.conv_id, row.turn_idx)]
        assert row.redacted_text == red, (row.conv_id, row.turn_idx)
        assert row.n_redactions == n, (row.conv_id, row.turn_idx)


def test_generator_ground_truth_fragment_rule(ray_session, turns_file):
    import os

    from pdfredact_ray.sources.turns import expected_path

    exp = pq.read_table(
        expected_path("sf-test", os.path.dirname(os.path.dirname(turns_file)))
    )
    emap = {
        (c, t): (r, n)
        for c, t, r, n in zip(
            exp.column("conv_id").to_pylist(),
            exp.column("turn_idx").to_pylist(),
            exp.column("expected_frag_redacted").to_pylist(),
            exp.column("expected_frag_n").to_pylist(),
        )
    }
    rules = [RedactionRule(r"\d{4,}", is_regex=True, fragment_aware=True).to_dict()]
    got = redact_pipeline(read_turns(turns_file), rules).to_pandas()
    assert len(got) == len(emap)
    n_hit = 0
    for row in got.itertuples(index=False):
        red, n = emap[(row.conv_id, row.turn_idx)]
        assert row.redacted_text == red, (row.conv_id, row.turn_idx)
        assert row.n_redactions == n, (row.conv_id, row.turn_idx)
        n_hit += 1 if n > 0 else 0
    assert n_hit > 0  # corpus contains digit-run turns at every scale


def test_redact_sorted_write_whale_conversation(ray_session, tmp_path):
    """One conversation owning 30% of all turns rides the flagship
    pipeline end to end: the composite (conv_id, turn_idx) sort key
    range-partitions the whale across blocks, output is globally sorted,
    and masked text equals the per-turn oracle."""
    import numpy as np
    import pyarrow as pa

    n = 60_000
    n_whale = int(n * 0.3)
    rng = np.random.default_rng(5)
    convs = [f"whale"] * n_whale + [
        f"c{int(i):05d}" for i in rng.integers(0, 4000, size=n - n_whale)
    ]
    idx_by: dict = {}
    turn_idx = []
    for c in convs:
        turn_idx.append(idx_by.get(c, 0))
        idx_by[c] = turn_idx[-1] + 1
    texts = [
        f"turn {i} SSN 123-45-6789 body" if i % 7 == 0 else f"turn {i} plain body"
        for i in range(n)
    ]
    t0 = np.datetime64("2026-05-01T00:00:00", "us")
    tbl = pa.table(
        {
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array([t0] * n, pa.timestamp("us")),
        }
    )
    src = str(tmp_path / "whale_turns.parquet")
    pq.write_table(tbl, src)

    ds = order_restore(redact_pipeline(read_turns(src), RULES, emit_spans=False))
    out = str(tmp_path / "whale_out")
    ds.write_parquet(out)
    import pyarrow.dataset as pads

    got = pads.dataset(out, format="parquet").to_table()
    assert got.num_rows == n
    keys = list(zip(got.column("conv_id").to_pylist(), got.column("turn_idx").to_pylist()))
    assert keys == sorted(keys)  # global order restored despite the whale
    # masked-text equality on a sample (incl. whale rows)
    rs = compile_rules(RULES)
    red = got.column("redacted_text").to_pylist()
    orig = {
        (c, t): x
        for c, t, x in zip(
            tbl.column("conv_id").to_pylist(),
            tbl.column("turn_idx").to_pylist(),
            tbl.column("text").to_pylist(),
        )
    }
    for i in range(0, n, 997):
        c, t = keys[i]
        assert red[i] == redact_turn(orig[(c, t)], rs)[0]


def test_conv_context_windows_boundaries_and_gaps(ray_session, tmp_path, monkeypatch):
    """Context windows across range-group boundaries (shrunk CTX_RANGE_W so
    a small conv spans many ranges), with index gaps and a whale conv —
    checked against a direct per-conv recompute."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    import pdfredact_ray.pipelines.turnqueries as TQ

    monkeypatch.setattr(TQ, "CTX_RANGE_W", 8)  # force many boundary crossings
    rng = np.random.default_rng(9)
    rows = []
    # whale conv: 300 dense turns; gappy conv: strided idx; tiny conv
    for c, idxs in [
        ("whale", list(range(300))),
        ("gappy", sorted(rng.choice(200, size=40, replace=False).tolist())),
        ("tiny", [0, 1]),
    ]:
        for i in idxs:
            rows.append((c, i, f"{c}-text-{i}"))
    t0 = np.datetime64("2026-06-01T00:00:00", "us")
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
            "ts": pa.array([t0] * len(rows), pa.timestamp("us")),
        }
    )
    src = str(tmp_path / "ctx_turns.parquet")
    pq.write_table(tbl, src)
    monkeypatch.setattr(TQ, "ensure_turns", lambda sf: src)

    got = {
        (r["conv_id"], r["turn_idx"]): (r["n_context_turns"], r["context_md5"])
        for r in TQ.conv_context_windows("ignored", k=3).take_all()
    }
    assert len(got) == len(rows)
    by_conv: dict = {}
    for c, i, x in rows:
        by_conv.setdefault(c, {})[i] = x
    for c, i, _ in rows:
        ctx_idx = [j for j in range(i - 3, i) if j in by_conv[c]]
        ctx = "\n".join(by_conv[c][j] for j in ctx_idx)
        assert got[(c, i)] == (len(ctx_idx), hashlib.md5(ctx.encode()).hexdigest()), (c, i)


def test_conv_context_windows_planted_whale_at_scale(ray_session):
    """Planted whale at the REAL range width: one conversation owns 30% of
    60k turns (18k dense indices -> ~70 CTX_RANGE_W=256 range segments via
    shadow replication), the rest spread over 420 small convs. Every turn's
    (n_context, md5) must match a direct per-conv recompute — exercising the
    production shadow-replication path, not a shrunk-width toy."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pdfredact_ray.pipelines.turnqueries import context_windows_over

    n, whale_n = 60_000, 18_000
    convs = ["whale"] * whale_n
    idxs = list(range(whale_n))
    per_small = (n - whale_n) // 420
    for c in range(420):
        convs.extend([f"s{c:04d}"] * per_small)
        idxs.extend(range(per_small))
    texts = [f"{c}#{i} body" for c, i in zip(convs, idxs)]
    tbl = pa.table(
        {
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": pa.array(idxs, pa.int32()),
            "text": pa.array(texts, pa.string()),
        }
    )
    # shuffle the row order so ranges arrive interleaved across blocks
    rng = np.random.default_rng(3)
    perm = rng.permutation(tbl.num_rows)
    tbl = tbl.take(pa.array(perm))
    ds = rd.from_arrow([tbl.slice(i, 8_192) for i in range(0, tbl.num_rows, 8_192)])
    got = {
        (r["conv_id"], r["turn_idx"]): (r["n_context_turns"], r["context_md5"])
        for r in context_windows_over(ds, k=3).take_all()
    }
    assert len(got) == tbl.num_rows
    by_conv: dict = {}
    for c, i, x in zip(convs, idxs, texts):
        by_conv.setdefault(c, {})[i] = x
    for c, i in zip(convs, idxs):
        ctx_idx = [j for j in range(i - 3, i) if j in by_conv[c]]
        ctx = "\n".join(by_conv[c][j] for j in ctx_idx)
        assert got[(c, i)] == (
            len(ctx_idx),
            hashlib.md5(ctx.encode()).hexdigest(),
        ), (c, i)


def test_turn_boilerplate_flags_planted(ray_session, tmp_path, monkeypatch):
    """Planted boilerplate templates: a 5-token prefix shared by >= 2
    DISTINCT conversations flags every turn carrying it; same-conv
    repetition alone never flags; short turns (< 5 tokens) compare on the
    whole text; @@LAYOUT@@ turns are excluded before prefixing."""
    import numpy as np
    import pyarrow as pa

    import pdfredact_ray.pipelines.turnqueries as TQ

    tpl = "I am a helpful assistant"
    rows = [
        # template across three convs (one conv carries it twice)
        ("a", 0, f"{tpl} for conv a one"),
        ("a", 1, f"{tpl} for conv a two"),
        ("b", 0, f"{tpl} for conv b"),
        ("c", 0, f"{tpl} hello"),
        # same-conv-only repetition: must NOT flag
        ("d", 0, "repeated only in conv d x"),
        ("d", 1, "repeated only in conv d y"),
        # short text in two convs: whole text is the prefix
        ("a", 2, "hi"),
        ("b", 1, "hi"),
        # layout turn carrying the template: excluded by the plain filter
        ("e", 0, f"@@LAYOUT@@{tpl} payload"),
        # unique turn
        ("e", 1, "completely unique turn text here"),
    ]
    t0 = np.datetime64("2026-06-01T00:00:00", "us")
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
            "ts": pa.array([t0] * len(rows), pa.timestamp("us")),
        }
    )
    src = str(tmp_path / "boiler_turns.parquet")
    pq.write_table(tbl, src)
    monkeypatch.setattr(TQ, "ensure_turns", lambda sf: src)

    got = TQ.turn_boilerplate_flags("ignored").to_pandas()
    flagged = {(r.conv_id, r.turn_idx): (r.prefix, r.n_convs) for r in got.itertuples()}
    # the 4 template turns (3 convs) + the two 'hi' turns (2 convs)
    assert set(flagged) == {("a", 0), ("a", 1), ("b", 0), ("c", 0), ("a", 2), ("b", 1)}
    assert flagged[("a", 0)] == (tpl, 3) and flagged[("c", 0)] == (tpl, 3)
    assert flagged[("a", 2)] == ("hi", 2)
    # min_convs=3 drops the 2-conv 'hi' prefix, keeps the 3-conv template
    got3 = TQ.turn_boilerplate_flags("ignored", min_convs=3).to_pandas()
    assert set(zip(got3["conv_id"], got3["turn_idx"])) == {
        ("a", 0), ("a", 1), ("b", 0), ("c", 0)
    }
    # no hot prefixes at all -> empty result, schema preserved (Ray's
    # to_pandas drops columns on empty datasets; schema() keeps them)
    ds_hi = TQ.turn_boilerplate_flags("ignored", min_convs=10)
    assert ds_hi.count() == 0
    assert set(ds_hi.schema().names) == {"conv_id", "turn_idx", "prefix", "n_convs"}


def test_turn_boilerplate_flags_join_path_equals_broadcast(
    ray_session, tmp_path, monkeypatch
):
    """Forcing the hot-set gate to 0 routes the flag pass onto the
    Dataset-join fallback; both plans must return identical rows."""
    import numpy as np
    import pyarrow as pa

    import pdfredact_ray.pipelines.corpus as CP
    import pdfredact_ray.pipelines.turnqueries as TQ

    rng = np.random.default_rng(11)
    rows = []
    tpls = [f"template {i} shared across many convs" for i in range(4)]
    for c in range(12):
        for i in range(6):
            if rng.random() < 0.5:
                rows.append((f"c{c}", i, f"{tpls[int(rng.integers(4))]} tail {c} {i}"))
            else:
                rows.append((f"c{c}", i, f"unique text {c} {i} {rng.integers(1 << 30)}"))
    t0 = np.datetime64("2026-06-01T00:00:00", "us")
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
            "ts": pa.array([t0] * len(rows), pa.timestamp("us")),
        }
    )
    src = str(tmp_path / "gate_turns.parquet")
    pq.write_table(tbl, src)
    monkeypatch.setattr(TQ, "ensure_turns", lambda sf: src)

    def snap(ds):
        df = ds.to_pandas()
        cols = ["conv_id", "turn_idx", "prefix", "n_convs"]
        return df[cols].sort_values(cols).reset_index(drop=True)

    bcast = snap(TQ.turn_boilerplate_flags("ignored"))
    assert len(bcast) > 0  # the planted templates must actually flag
    monkeypatch.setattr(CP, "HOTSET_MAX_ROWS", 0)
    joined = snap(TQ.turn_boilerplate_flags("ignored"))
    import pandas as pd

    pd.testing.assert_frame_equal(bcast, joined.astype(bcast.dtypes.to_dict()))


def test_role_transitions_boundaries_and_gaps(ray_session):
    """Role-bigram counts across range boundaries and index gaps: one
    conversation spans several CTX_RANGE_W=256 ranges (boundary pairs must
    survive shadow replication), another has index gaps (non-adjacent pairs
    must NOT count), plus single-turn convs contributing nothing."""
    from collections import Counter

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pdfredact_ray.pipelines.turnqueries import role_transitions_over

    roles3 = ("user", "assistant", "tool")
    convs, idxs, roles = [], [], []
    # whale: 1000 dense indices -> 3 boundary pairs at 255/256, 511/512, 767/768
    for i in range(1000):
        convs.append("whale"); idxs.append(i); roles.append(roles3[i % 3])
    # gappy: even indices only -> zero adjacent pairs
    for i in range(0, 40, 2):
        convs.append("gappy"); idxs.append(i); roles.append("user")
    # singles
    for c in range(5):
        convs.append(f"solo{c}"); idxs.append(0); roles.append("assistant")
    expected = Counter()
    by_conv: dict = {}
    for c, i, r in zip(convs, idxs, roles):
        by_conv.setdefault(c, {})[i] = r
    for c, m in by_conv.items():
        for i, r in m.items():
            if i - 1 in m:
                expected[(m[i - 1], r)] += 1
    tbl = pa.table(
        {
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": pa.array(idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
        }
    )
    rng = np.random.default_rng(7)
    tbl = tbl.take(pa.array(rng.permutation(tbl.num_rows)))
    ds = rd.from_arrow([tbl.slice(i, 128) for i in range(0, tbl.num_rows, 128)])
    out = role_transitions_over(ds)
    got = {
        (p, r): n
        for p, r, n in zip(
            out.column("prev_role").to_pylist(),
            out.column("role").to_pylist(),
            out.column("n").to_pylist(),
        )
    }
    assert got == dict(expected)
    assert sum(got.values()) == 999  # whale only; gappy + solos contribute 0
