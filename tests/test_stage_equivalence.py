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
