"""Property tests: the RuleMatcher batch fast path (mega-string pre-filter)
must be exactly equivalent to the per-turn pure oracle on adversarial text."""

import numpy as np
import pyarrow as pa
import pytest

from pdfredact_ray.functions.mask import redact_turn, spans_sorted
from pdfredact_ray.functions.rules import RedactionRule, compile_rules, default_rules
from pdfredact_ray.functions.runs import make_layout_payload
from pdfredact_ray.stages.detect import RuleMatcher

RULES = default_rules() + [RedactionRule("1234")]  # + auto-fragment numeric


def _adversarial_texts(n=400, seed=7):
    rng = np.random.default_rng(seed)
    pool = [
        "plain words here",
        "SSN: 123-45-6789.",
        "mail x.y9@ex0.com ok",
        "card 4532-1234-5678-9010",
        "this is CONFIDENTIAL",
        "Internal  Use   Only",  # collapsed-whitespace match (flat-only)
        "keep TOPSECRET safe",
        "pin 1 2 3 4 end",
        "pin 1  2 3 4 end",
        "a - 1 2 - 3 b",
        "multi\nline bar foo\ntext 123-45-6789",
        "",
        "   ",
        "\t\t",
        "  123-45-6789 padded",  # leading whitespace (anchored-rule repro class)
        "trailing CONFIDENTIAL   ",  # trailing whitespace
        "x a\xa0b y",  # NBSP is Python whitespace but not RE2 \s
        "v\vtab 123-45-6789",  # vertical tab token split
        "nb\xa0sp internal\xa0use\xa0only end",  # cross-token literal over NBSP
        "u2028 sep CONFIDENTIAL",  # unicode line separator (not a \n line)
        "edge CONFIDENTIAL",  # match at end of flat
        "123-45-6789",  # whole turn is the match
        "x123-45-6789y next",  # match strictly inside a token
        "a 123-45-6789 123-45-6789 b",  # two matches, adjacent tokens
        "CONFIDENTIAL",  # single-token turn, literal
        "CONFIDENTIALCONFIDENTIAL twice",  # two literal hits in one token
        "tok 4532-1234-5678-9010x trail",  # CC inside token with suffix
        "internal use only",  # cross-token literal = whole turn
        "pre internal USE only post",  # case-insensitive cross-token
        "mail a.b@c.de mail2 e.f@g.hi",  # two emails
        "SECRET SECRET SECRET",  # repeated single-token hits
        make_layout_payload([(d, 0, 100.0 + i * 15.0, 6.672, 8.7) for i, d in enumerate("1234")]),
        make_layout_payload([(d, 0, 100.0 + i * 15.0, 6.672, 8.7) for i, d in enumerate("98765")]),
    ]
    plain = pool[:-2]  # payloads are only valid as the ENTIRE turn text
    texts = []
    for _ in range(n):
        k = rng.integers(1, 4)
        texts.append(" ".join(plain[rng.integers(0, len(plain))] for _ in range(k)))
    texts.extend(pool)  # each case standalone too (incl. payloads)
    return texts


def _batch(texts):
    n = len(texts)
    return pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(n)], type=pa.string()),
            "turn_idx": pa.array(np.zeros(n, dtype=np.int32)),
            "role": pa.array(["user"] * n, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array([""] * n, type=pa.string()),
            "ts": pa.array(np.zeros(n, dtype=np.int64), type=pa.timestamp("us")),
        }
    )


@pytest.mark.parametrize("mode", ["redact", "plan"])
def test_fast_path_equals_oracle(mode):
    texts = _adversarial_texts()
    batch = _batch(texts)
    fast = RuleMatcher(rules=[r.to_dict() for r in RULES], mode=mode, fast=True)(batch)
    slow = RuleMatcher(rules=[r.to_dict() for r in RULES], mode=mode, fast=False)(batch)
    assert fast.equals(slow)


def test_redact_matches_pure_oracle_rowwise():
    texts = _adversarial_texts(n=150, seed=11)
    batch = _batch(texts)
    out = RuleMatcher(rules=[r.to_dict() for r in RULES], mode="redact")(batch)
    rs = compile_rules(RULES)
    red_col = out.column("redacted_text").to_pylist()
    n_col = out.column("n_redactions").to_pylist()
    for text, red, n in zip(texts, red_col, n_col):
        expect_red, expect_regions = redact_turn(text, rs)
        assert red == expect_red
        assert n == len(expect_regions)


def test_plan_rows_match_oracle():
    texts = _adversarial_texts(n=100, seed=13)
    batch = _batch(texts)
    plan = RuleMatcher(rules=[r.to_dict() for r in RULES], mode="plan")(batch)
    rs = compile_rules(RULES)
    expected = []
    for i, text in enumerate(texts):
        _, regions = redact_turn(text, rs)
        for r in spans_sorted(regions):
            expected.append((f"c{i}", 0, r.orig_start, r.orig_end, r.matched_text, r.rule_pattern, r.line))
    got = list(
        zip(
            plan.column("conv_id").to_pylist(),
            plan.column("turn_idx").to_pylist(),
            plan.column("start").to_pylist(),
            plan.column("end").to_pylist(),
            plan.column("matched_text").to_pylist(),
            plan.column("rule_pattern").to_pylist(),
            plan.column("line").to_pylist(),
        )
    )
    assert got == expected


def test_plan_apply_out_of_order_payload_masks_members_only():
    """ADVICE.md round-1 repro: a @@LAYOUT@@ payload listing its runs out of
    (line, col) order has non-member runs INSIDE the [min, max+1) run-index
    envelope. The plan must carry exact member indices so apply masks only
    the matched runs — identical to the fused path."""
    from pdfredact_ray.stages.apply import build_plan_index, apply_spans_to_text

    # digits of '1234' on line 0, with an unmatched 'X' on line 1 stored at
    # payload index 1 — inside the members envelope [0, 5)
    runs = [
        ("1", 0, 100.0, 6.672, 8.7),
        ("X", 1, 0.0, 6.672, 8.7),
        ("2", 0, 115.0, 6.672, 8.7),
        ("3", 0, 130.0, 6.672, 8.7),
        ("4", 0, 145.0, 6.672, 8.7),
    ]
    text = make_layout_payload(runs)
    rules = [RedactionRule("1234").to_dict()]
    fused = RuleMatcher(rules=rules, mode="redact")(_batch([text]))
    plan = RuleMatcher(rules=rules, mode="plan")(_batch([text]))
    assert plan.num_rows == 1
    members = plan.column("members").to_pylist()[0]
    assert sorted(members) == [0, 2, 3, 4]  # exact members, envelope is [0,5)
    idx = build_plan_index(plan)
    applied = apply_spans_to_text(text, idx[("c0", 0)])
    assert applied == fused.column("redacted_text").to_pylist()[0]
    assert '"X"' in applied or "X" in applied  # the non-member run survives


def test_emit_spans_false_equals_projected_output():
    """The ordered-sink shape (emit_spans=False) must equal the full output
    minus its spans column, on every tier (fast, scan, slow, payload)."""
    texts = _adversarial_texts(n=200, seed=47)
    batch = _batch(texts)
    specs = [r.to_dict() for r in RULES]
    full = RuleMatcher(rules=specs, mode="redact")(batch)
    lean = RuleMatcher(rules=specs, mode="redact", emit_spans=False)(batch)
    assert "spans" not in lean.column_names
    assert lean.equals(full.drop_columns(["spans"]))


def test_poisoned_row_policy():
    bad = "@@LAYOUT@@{broken json"
    batch = _batch(["fine text", bad, "SSN: 123-45-6789."])
    with pytest.raises(Exception):
        RuleMatcher(rules=[r.to_dict() for r in RULES], mode="redact", strict=True)(batch)
    m = RuleMatcher(rules=[r.to_dict() for r in RULES], mode="redact", strict=False)
    out = m(batch)
    assert out.column("n_redactions").to_pylist()[1] == -1
    assert out.column("redacted_text").to_pylist()[1] == bad  # copy-through
    assert m.poisoned_count == 1


ANCHORED_RULES = [
    RedactionRule(r"^\d{3}", is_regex=True),  # round-1 repro: ' 123 foo'
    RedactionRule(r"^abc", is_regex=True),
    RedactionRule(r"end$", is_regex=True),
    RedactionRule(r"\Afront", is_regex=True),
    RedactionRule(r"tail\Z", is_regex=True),
]

_ANCHOR_TEXTS = [
    " 123 foo",  # ADVICE.md verified repro: must mask ' ███ foo'
    "123 foo",
    "\t\xa0abc def",
    "abc def",
    "x abc",
    "the end",
    "the end  ",
    "the end .",
    "front matter",
    "  front matter",
    "a tail",
    "a tail ",  # thin-space padding
    "no hits here",
    "",
]


@pytest.mark.parametrize("mode", ["redact", "plan"])
def test_anchored_rules_fast_equals_oracle(mode):
    """Anchored patterns on whitespace-padded turns — the confirmed round-1
    silent-under-redaction class (VERDICT.md 'What's wrong' #1)."""
    rules = ANCHORED_RULES + default_rules()
    texts = _ANCHOR_TEXTS + _adversarial_texts(n=120, seed=29)
    batch = _batch(texts)
    fast = RuleMatcher(rules=[r.to_dict() for r in rules], mode=mode, fast=True)(batch)
    slow = RuleMatcher(rules=[r.to_dict() for r in rules], mode=mode, fast=False)(batch)
    assert fast.equals(slow)


def test_anchored_padded_repro_masks():
    """The exact ADVICE.md repro: rule '^\\d{3}' on ' 123 foo' must mask."""
    m = RuleMatcher(rules=[RedactionRule(r"^\d{3}", is_regex=True).to_dict()])
    out = m(_batch([" 123 foo"]))
    assert out.column("redacted_text").to_pylist() == [" ███ foo"]


def test_nbsp_literal_repro_masks():
    """ADVICE.md repro: literal 'a b' on 'x a\\xa0b y' must mask (NBSP is
    Python whitespace, so the searchable text is 'x a b y ')."""
    m = RuleMatcher(rules=[RedactionRule("a b").to_dict()])
    out = m(_batch(["x a\xa0b y"]))
    assert out.column("redacted_text").to_pylist() == ["x ███ y"]


def test_leading_bracket_class_rules_equal():
    """']' right after '[' / '[^' is a literal class member in both
    dialects; the rewriter must not close the class there (else later
    \\d/\\w rewrites are mis-scoped and the prefilter can under-match)."""
    rules = [
        RedactionRule(r"[]x]\d", is_regex=True),
        RedactionRule(r"[^]q]{2}z", is_regex=True),
    ] + default_rules()
    texts = ["]7 ok", "x3", "aaz", "]]z", "no match", " ]2 pad "] + _adversarial_texts(
        n=60, seed=53
    )
    batch = _batch(texts)
    specs = [r.to_dict() for r in rules]
    fast = RuleMatcher(rules=specs, mode="redact", fast=True)(batch)
    slow = RuleMatcher(rules=specs, mode="redact", fast=False)(batch)
    assert fast.equals(slow)
    m = RuleMatcher(rules=specs)
    mask = m._candidate_mask(batch)
    rs = compile_rules(rules)
    for i, text in enumerate(texts):
        if redact_turn(text, rs)[1] and mask is not None:
            assert mask[i], text


def test_nullable_pattern_no_crash_and_equal():
    """Empty-matchable patterns ('z*', '(?:x)?y*') previously crashed the
    mega-scan (IndexError at end-of-string empty match) or silently dropped
    interior empty-match token claims."""
    rules = default_rules() + [
        RedactionRule(r"z*", is_regex=True),
        RedactionRule(r"(?:x)?y*", is_regex=True),
    ]
    texts = _adversarial_texts(n=100, seed=31) + ["zebra zz", "xy yy", "plain"]
    batch = _batch(texts)
    fast = RuleMatcher(rules=[r.to_dict() for r in rules], mode="redact", fast=True)(batch)
    slow = RuleMatcher(rules=[r.to_dict() for r in rules], mode="redact", fast=False)(batch)
    assert fast.equals(slow)


def test_prefilter_is_superset_of_matches():
    """Every turn the per-turn oracle finds a region in MUST be a prefilter
    candidate — the superset contract the round-1 bug violated."""
    rules = ANCHORED_RULES + RULES
    m = RuleMatcher(rules=[r.to_dict() for r in rules], mode="redact")
    assert m._prefilter_patterns is not None
    texts = _ANCHOR_TEXTS + _adversarial_texts(n=200, seed=37)
    mask = m._candidate_mask(_batch(texts))
    rs = compile_rules(rules)
    for i, text in enumerate(texts):
        if redact_turn(text, rs)[1]:
            assert mask[i], f"row {i} has regions but was pre-filtered out: {text!r}"


def test_non_re2_rule_disables_prefilter_but_stays_exact():
    """A lookbehind rule can't run on the Arrow/RE2 pre-filter; the matcher
    must fall back to all-rows-candidate and still match the pure oracle."""
    rules = RULES + [RedactionRule(r"(?<=pin )\d", is_regex=True)]
    m = RuleMatcher(rules=[r.to_dict() for r in rules], mode="redact")
    assert m._prefilter_patterns is None
    texts = _adversarial_texts(n=80, seed=23)
    batch = _batch(texts)
    out = m(batch)
    rs = compile_rules(rules)
    for text, red in zip(texts, out.column("redacted_text").to_pylist()):
        assert red == redact_turn(text, rs)[0]
