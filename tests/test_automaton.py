"""Aho-Corasick literal engine (M5): exact equivalence with the per-rule
escaped-regex IndexOf scan, at the automaton, ruleset, and batch levels."""

import re

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdfredact_ray.functions.automaton import AhoCorasick, LiteralScanner, nonoverlapping
from pdfredact_ray.functions.mask import redact_turn
from pdfredact_ray.functions.rules import AC_MIN_LITERALS, RedactionRule, compile_rules
from pdfredact_ray.stages.detect import RuleMatcher


def _regex_starts(pattern: str, text: str, flags: int = 0):
    return [m.start() for m in re.finditer(re.escape(pattern), text, flags)]


def test_find_all_reports_every_occurrence():
    ac = AhoCorasick(["ab", "b", "abab", "ba"])
    hits = ac.find_all("ababab")
    assert hits[0] == [0, 2, 4]  # "ab"
    assert hits[1] == [1, 3, 5]  # "b"
    assert hits[2] == [0, 2]  # "abab" overlapping occurrences
    assert hits[3] == [1, 3]  # "ba"


def test_nonoverlapping_is_indexof_semantics():
    # IndexOf("aa", "aaaa") -> 0, then from 2 -> 2 (not 1)
    assert nonoverlapping([0, 1, 2], 2) == [0, 2]
    assert nonoverlapping([], 3) == []
    assert nonoverlapping([5], 1) == [5]


def test_suffix_pattern_found_via_fail_links():
    # "she" contains "he" as suffix — classic AC output-merge case
    ac = AhoCorasick(["she", "he", "hers"])
    hits = ac.find_all("ushers")
    assert hits == {0: [1], 1: [2], 2: [2]}


@given(
    patterns=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=4), min_size=1, max_size=8
    ),
    text=st.text(alphabet="abcd ", max_size=60),
)
@settings(max_examples=300, deadline=None)
def test_automaton_equals_regex_scan_property(patterns, text):
    rules = [RedactionRule(p) for p in dict.fromkeys(patterns)]
    crules = [compile_rules([r]).rules[0] for r in rules]
    scanner = LiteralScanner(crules)
    res = scanner.scan(text)
    for c in crules:
        got = res.starts(c)
        want = nonoverlapping(_regex_starts(c.rule.pattern, text), len(c.rule.pattern))
        assert got == want, (c.rule.pattern, text)


@given(
    patterns=st.lists(
        st.text(alphabet="aAbB", min_size=1, max_size=3), min_size=1, max_size=6
    ),
    text=st.text(alphabet="aAbBcK ", max_size=50),
)
@settings(max_examples=300, deadline=None)
def test_case_insensitive_automaton_equals_ignorecase_regex(patterns, text):
    rules = [RedactionRule(p, case_sensitive=False) for p in dict.fromkeys(patterns)]
    crules = [compile_rules([r]).rules[0] for r in rules]
    scanner = LiteralScanner(crules)
    res = scanner.scan(text)
    for c in crules:
        got = res.starts(c)
        want = nonoverlapping(
            _regex_starts(c.rule.pattern, text, re.IGNORECASE), len(c.rule.pattern)
        )
        assert got == want, (c.rule.pattern, text)


def test_kelvin_sign_folds_like_re():
    # U+212A KELVIN SIGN matches 'k' under re.IGNORECASE and under casefold
    c = compile_rules([RedactionRule("kick", case_sensitive=False)]).rules[0]
    text = "a KICK b"
    assert LiteralScanner([c]).scan(text).starts(c) == [2]


def test_expanding_casefold_text_falls_back():
    # 'ß'.casefold() == 'ss' changes length -> scanner must return None so
    # the caller uses the regex path (which re.IGNORECASE handles directly)
    c = compile_rules([RedactionRule("ab", case_sensitive=False)]).rules[0]
    scanner = LiteralScanner([c])
    assert scanner.scan("straße ab").starts(c) is None


def test_eligibility_rules():
    cs = compile_rules([RedactionRule("x")]).rules[0]
    ci = compile_rules([RedactionRule("x", case_sensitive=False)]).rules[0]
    rx = compile_rules([RedactionRule(r"\d", is_regex=True)]).rules[0]
    verbose = compile_rules(
        [RedactionRule("x", regex_options=["IgnorePatternWhitespace"])]
    ).rules[0]
    non_ascii_ci = compile_rules([RedactionRule("é", case_sensitive=False)]).rules[0]
    assert LiteralScanner.handles(cs)
    assert LiteralScanner.handles(ci)
    assert not LiteralScanner.handles(rx)
    assert not LiteralScanner.handles(verbose)
    assert not LiteralScanner.handles(non_ascii_ci)


def test_auto_threshold():
    few = compile_rules([RedactionRule(f"lit{i}") for i in range(3)])
    assert few.literal_scanner is None
    many = compile_rules([RedactionRule(f"lit{i}") for i in range(AC_MIN_LITERALS)])
    assert many.literal_scanner is not None
    forced = compile_rules([RedactionRule("one")], literal_engine="automaton")
    assert forced.literal_scanner is not None


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
def test_rulematcher_automaton_equals_scan_engine(mode):
    """Full-stage equivalence: RuleMatcher output must be identical with the
    automaton forced on vs the per-rule scan — over the adversarial corpus
    including fragment payloads, digit runs, and multi-line turns."""
    from tests.test_stage_equivalence import RULES, _adversarial_texts

    specs = [r.to_dict() for r in RULES]
    texts = _adversarial_texts(n=250, seed=43)
    batch = _batch(texts)
    auto = RuleMatcher(rules=specs, mode=mode, literal_engine="automaton")(batch)
    scan = RuleMatcher(rules=specs, mode=mode, literal_engine="scan")(batch)
    assert auto.equals(scan)


def test_large_dictionary_matches_oracle():
    """200-literal dictionary (the LLM-pipeline shape): engaged automatically
    by the auto threshold, equal to the per-turn pure oracle."""
    lits = [f"TOKEN{i:03d}" for i in range(200)] + ["SECRET", "CONFIDENTIAL"]
    rules = [RedactionRule(p) for p in lits]
    rs = compile_rules(rules)
    assert rs.literal_scanner is not None  # auto-engaged
    texts = [
        "leading TOKEN007 and TOKEN199 pair",
        "a SECRET TOKEN042x suffix-embedded",
        "no hits at all here",
        "TOKEN000TOKEN000 doubled",
        "",
    ]
    m = RuleMatcher(rules=[r.to_dict() for r in rules], mode="redact")(_batch(texts))
    rs_scan = compile_rules(rules, literal_engine="scan")
    for text, red, n in zip(
        texts,
        m.column("redacted_text").to_pylist(),
        m.column("n_redactions").to_pylist(),
    ):
        want_red, want_regions = redact_turn(text, rs_scan)
        assert red == want_red
        assert n == len(want_regions)
