"""Pure-kernel tests: rule compilation/routing, tokenizer thresholds, match
semantics, interval merge, masking — ports of the reference's behavioral facts
(tests/PdfRedact.Core.Tests/*, see SURVEY.md §5) onto the transcript shape."""

import pytest

from pdfredact_ray.functions.mask import (
    MASK_CHAR,
    apply_regions,
    mask_text,
    merge_intervals,
    redact_turn,
)
from pdfredact_ray.functions.match import (
    build_searchable,
    claim_token_range,
    detect_turn,
    find_matches,
)
from pdfredact_ray.functions.rules import (
    RedactionRule,
    compile_rule,
    compile_rules,
    default_rules,
    should_use_fragment_aware,
)
from pdfredact_ray.functions.runs import (
    Run,
    fragment_tokenize,
    make_layout_payload,
    plain_text_to_runs,
    upper_median,
    word_tokenize_plain,
    word_tokenize_runs,
)


def M(n):
    return MASK_CHAR * n


# ---------------------------------------------------------------- rules


class TestRules:
    def test_defaults(self):
        # RedactionRule.cs:8-44: IsRegex=false, CaseSensitive=true
        r = RedactionRule("x")
        assert r.is_regex is False and r.case_sensitive is True
        assert r.fragment_aware is None and r.regex_options is None

    def test_fragment_routing(self):
        # explicit flag wins (PdfPigTextLocator.cs:140-143)
        assert should_use_fragment_aware(RedactionRule(r"\d+", is_regex=True, fragment_aware=True))
        assert not should_use_fragment_aware(RedactionRule("1234", fragment_aware=False))
        # regex never auto-enables (:147-151)
        assert not should_use_fragment_aware(RedactionRule(r"\d{4}", is_regex=True))
        # literal numeric auto-enables (:153-158)
        assert should_use_fragment_aware(RedactionRule("123-45-6789"))
        assert should_use_fragment_aware(RedactionRule("12 34/56"))
        assert not should_use_fragment_aware(RedactionRule("CONFIDENTIAL"))
        # C# char.IsDigit is Nd: superscript two is NOT a digit there
        assert not should_use_fragment_aware(RedactionRule("²"))
        # vacuous All on empty pattern
        assert should_use_fragment_aware(RedactionRule(""))

    def test_regex_options_override(self):
        import re

        # default: IgnoreCase iff not case_sensitive (PdfPigTextLocator.cs:262-269)
        assert compile_rule(RedactionRule("a", case_sensitive=False)).regex.flags & re.IGNORECASE
        assert not compile_rule(RedactionRule("a")).regex.flags & re.IGNORECASE
        # explicit options REPLACE defaults (:272-276): case_sensitive=False is overridden away
        c = compile_rule(
            RedactionRule("a", is_regex=True, case_sensitive=False, regex_options=["Multiline"])
        )
        assert c.regex.flags & re.MULTILINE and not (c.regex.flags & re.IGNORECASE)

    def test_ruleset_partition_and_hash(self):
        rs = compile_rules(default_rules() + [RedactionRule("1234")])
        assert [c.rule.pattern for c in rs.fragment_rules] == ["1234"]
        assert len(rs.word_rules) == 6
        assert rs.content_hash() == compile_rules(default_rules() + [RedactionRule("1234")]).content_hash()
        assert rs.content_hash() != compile_rules(default_rules()).content_hash()


# ---------------------------------------------------------------- searchable text / matching


class TestMatching:
    def test_single_space_join_and_trailing_space(self):
        toks = word_tokenize_plain("ab   cd\tef")
        flat, starts, ends = build_searchable(toks)
        assert flat == "ab cd ef "  # collapsed whitespace + trailing delimiter
        assert list(zip(starts, ends)) == [(0, 2), (3, 5), (6, 8)]

    def test_literal_nonoverlapping_advance(self):
        c = compile_rule(RedactionRule("aa"))
        ms = find_matches("aaaa", c)
        assert [(m.start, m.end) for m in ms] == [(0, 2), (2, 4)]

    def test_literal_reports_pattern_not_slice(self):
        # PdfPigTextLocator.cs:253: literal MatchInfo.Text = rule.Pattern
        c = compile_rule(RedactionRule("secret", case_sensitive=False))
        ms = find_matches("SECRET stuff", c)
        assert ms[0].text == "secret"

    def test_regex_reports_matched_slice(self):
        c = compile_rule(RedactionRule(r"[A-Z]+", is_regex=True))
        assert find_matches("xx ABC yy", c)[0].text == "ABC"

    def test_claim_is_interval_intersection(self):
        toks = word_tokenize_plain("aa bb cc")
        flat, starts, ends = build_searchable(toks)
        # match covering 'a b' (end of tok0 through start of tok1)
        assert claim_token_range(starts, ends, 1, 4) == (0, 2)
        # match covering ONLY the delimiter space claims nothing
        assert claim_token_range(starts, ends, 2, 3) == (1, 1)

    def test_delimiter_only_match_yields_no_region(self):
        rs = compile_rules([RedactionRule(r"(?<=aa) (?=bb)", is_regex=True)])
        assert detect_turn("aa bb", rs) == []

    def test_cross_token_literal(self):
        rs = compile_rules([RedactionRule("internal use only", case_sensitive=False)])
        red, regions = redact_turn("This is Internal Use Only data", rs)
        assert red == f"This is {M(17)} data"
        assert len(regions) == 1 and regions[0].matched_text == "internal use only"

    def test_whole_token_claiming(self):
        rs = compile_rules([RedactionRule("SECRET")])
        red, _ = redact_turn("a (TOPSECRET) b", rs)
        assert red == f"a {M(11)} b"

    def test_ssn_email_cc(self):
        rs = compile_rules(default_rules())
        red, regions = redact_turn(
            "SSN: 123-45-6789, card 4532-1234-5678-9010, mail a.b@c.io done", rs
        )
        pats = sorted(r.rule_pattern for r in regions)
        assert len(regions) == 3
        assert red == f"SSN: {M(12)} card {M(20)} mail {M(8)} done"

    def test_case_sensitive_default(self):
        rs = compile_rules([RedactionRule("CONFIDENTIAL")])
        red, regions = redact_turn("this is confidential", rs)
        assert red == "this is confidential" and regions == []

    def test_empty_ruleset_copy_through(self):
        rs = compile_rules([])
        assert redact_turn("anything 123-45-6789", rs) == ("anything 123-45-6789", [])

    def test_no_match_copy_through(self):
        rs = compile_rules(default_rules())
        assert redact_turn("perfectly ordinary text", rs)[0] == "perfectly ordinary text"

    def test_multiline_word_path_is_bottom_up(self):
        # word path orders lines bottom-first (OrderBy Bottom,
        # PdfPigTextLocator.cs:106): 'bar foo' matches across the line break
        rs = compile_rules([RedactionRule("bar foo")])
        red, regions = redact_turn("foo\nbar", rs)
        assert red == f"{M(3)}\n{M(3)}"
        # one region per line of the match (PdfPigTextLocator.cs:119-127)
        assert sorted(r.line for r in regions) == [0, 1]


# ---------------------------------------------------------------- plain-text digit runs


class TestPlainDigitRuns:
    def test_spaced_digits_join(self):
        rs = compile_rules([RedactionRule("1234")])  # auto fragment-aware
        red, regions = redact_turn("code 1 2 3 4 end", rs)
        assert red == f"code {M(7)} end"
        assert regions[0].matched_text == "1234"

    def test_double_space_blocks_join(self):
        rs = compile_rules([RedactionRule("1234")])
        assert redact_turn("code 1  2 3 4 end", rs)[0] == "code 1  2 3 4 end"

    def test_dash_joins_into_digit_run(self):
        rs = compile_rules([RedactionRule("12-34")])
        red, _ = redact_turn("x 1 2 - 3 4 y", rs)
        assert red == f"x {M(9)} y"

    def test_word_path_does_not_join_digits(self):
        rs = compile_rules([RedactionRule("1234", fragment_aware=False)])
        assert redact_turn("code 1 2 3 4 end", rs)[0] == "code 1 2 3 4 end"

    def test_fragment_and_word_rules_same_turn(self):
        rs = compile_rules([RedactionRule("9876"), RedactionRule("CONFIDENTIAL")])
        red, regions = redact_turn("CONFIDENTIAL 9 8 7 6 rest", rs)
        assert red == f"{M(12)} {M(7)} rest"
        assert len(regions) == 2


# ---------------------------------------------------------------- fragment-aware layout fixtures


def boxed(digits, spacing=15.0, line=0, x0=100.0, w=6.672, h=8.7):
    return [(d, line, x0 + i * spacing, w, h) for i, d in enumerate(digits)]


class TestFragmentAwareLayout:
    """Ports of FragmentAwareTextLocatorTests.cs:46-274 onto layout payloads."""

    def test_boxed_literal(self):
        payload = make_layout_payload(boxed("1234"))
        rs = compile_rules([RedactionRule("1234")])
        red, regions = redact_turn(payload, rs)
        assert len(regions) == 1
        assert regions[0].matched_text == "1234" and regions[0].rule_pattern == "1234"
        assert red.count(MASK_CHAR) == 4

    def test_boxed_regex_explicit_fragment(self):
        payload = make_layout_payload(boxed("5678"))
        rs = compile_rules([RedactionRule(r"\d{4}", is_regex=True, fragment_aware=True)])
        _, regions = redact_turn(payload, rs)
        assert len(regions) == 1 and regions[0].matched_text == "5678"

    def test_fragment_disabled_no_match(self):
        payload = make_layout_payload(boxed("4321"))
        rs = compile_rules([RedactionRule("4321", fragment_aware=False)])
        red, regions = redact_turn(payload, rs)
        assert regions == [] and red == payload

    def test_nine_digit_run(self):
        payload = make_layout_payload(boxed("123456789"))
        rs = compile_rules([RedactionRule(r"\d{9}", is_regex=True, fragment_aware=True)])
        _, regions = redact_turn(payload, rs)
        assert len(regions) == 1 and regions[0].matched_text == "123456789"

    def test_two_sequences_two_lines(self):
        payload = make_layout_payload(boxed("1234", line=0) + boxed("5678", line=1))
        rs = compile_rules([RedactionRule(r"\d{4}", is_regex=True, fragment_aware=True)])
        _, regions = redact_turn(payload, rs)
        assert len(regions) == 2
        assert sorted(r.matched_text for r in regions) == ["1234", "5678"]
        assert sorted(r.line for r in regions) == [0, 1]

    def test_mixed_content(self):
        # CONFIDENTIAL as adjacent glyphs (word) + boxed digits on another line
        word = [(c, 0, 50.0 + i * 7.0, 7.0, 8.7) for i, c in enumerate("CONFIDENTIAL")]
        payload = make_layout_payload(word + boxed("9876", line=1))
        rs = compile_rules([RedactionRule("9876"), RedactionRule("CONFIDENTIAL")])
        _, regions = redact_turn(payload, rs)
        assert len(regions) == 2
        by_rule = {r.rule_pattern: r for r in regions}
        assert set(by_rule) == {"9876", "CONFIDENTIAL"}
        # digit region stays narrow (no over-redaction): 4 glyphs only
        assert len(by_rule["9876"].members) == 4

    def test_digits_flanked_by_text_same_line(self):
        # "ID:" + boxed "1234" @20 + "Active" on one line; only the digit run
        # (plus any '-' the pass-2 join legitimately swallows) is masked
        id_part = [(c, 0, 10.0 + i * 7.0, 7.0, 8.7) for i, c in enumerate("ID:")]
        digits = boxed("1234", spacing=20.0, x0=60.0)
        tail = [(c, 0, 200.0 + i * 7.0, 7.0, 8.7) for i, c in enumerate("Active")]
        payload = make_layout_payload(id_part + digits + tail)
        rs = compile_rules([RedactionRule("1234")])
        red, regions = redact_turn(payload, rs)
        assert len(regions) == 1
        assert all(i in range(3, 7) for i in regions[0].members)  # only digit glyphs
        assert "Active" not in red or red.count(MASK_CHAR) == 4


# ---------------------------------------------------------------- tokenizer internals


class TestTokenizerInternals:
    def test_upper_median(self):
        assert upper_median([1.0, 2.0]) == 2.0  # even count -> upper element
        assert upper_median([3.0, 1.0, 2.0]) == 2.0

    def test_plain_embedding_geometry(self):
        runs = plain_text_to_runs("ab c\nd")
        assert [r.ch for r in runs] == ["a", "b", "c", "d"]
        a, b, c, d = runs
        assert b.left - a.right == 0.0
        assert c.left - b.right == pytest.approx(3.0 - 1.0 + 1.0 - 1.0 + 2.0 - 2.0, abs=10)
        assert c.left - b.right == pytest.approx(3.0)  # one space -> gap 3
        assert d.line == 1 and d.top == -10.0

    def test_word_tokenize_plain_matches_runs_path(self):
        for text in ["hello big world", "a\nbb ccc\n 1 2 3", "", "  ", "x  y\tz"]:
            fast = [(t.text, t.orig_start, t.orig_end) for t in word_tokenize_plain(text)]
            slow = [
                (t.text, t.orig_start, t.orig_end)
                for t in word_tokenize_runs(plain_text_to_runs(text))
            ]
            assert fast == slow, text

    def test_fragment_tokenize_empty(self):
        assert fragment_tokenize([]) == []


# ---------------------------------------------------------------- interval merge / mask


class TestMask:
    def test_merge_overlap_and_touch(self):
        assert merge_intervals([(5, 9), (0, 3), (3, 5), (8, 12)]) == [(0, 12)]
        assert merge_intervals([(0, 2), (4, 6)]) == [(0, 2), (4, 6)]
        assert merge_intervals([(3, 3), (1, 2)]) == [(1, 2)]  # empty dropped

    def test_mask_clamps(self):
        assert mask_text("abcde", [(-3, 2), (4, 99)]) == f"{M(2)}cd{M(1)}"

    def test_overlapping_rules_idempotent(self):
        # multi-rule precedence: CC regex + literal '1234' (word-based via
        # explicit flag) overlap on the same token -> single merged mask
        rs1 = compile_rules(
            [
                RedactionRule(r"\d{4}-\d{4}-\d{4}-\d{4}", is_regex=True),
                RedactionRule("1234", fragment_aware=False),
            ]
        )
        rs2 = compile_rules(
            [
                RedactionRule("1234", fragment_aware=False),
                RedactionRule(r"\d{4}-\d{4}-\d{4}-\d{4}", is_regex=True),
            ]
        )
        text = "card 4532-1234-5678-9010 ok"
        red1, reg1 = redact_turn(text, rs1)
        red2, reg2 = redact_turn(text, rs2)
        assert red1 == red2 == f"card {M(19)} ok"
        assert len(reg1) == len(reg2) == 2  # both rules still report spans

    def test_apply_regions_empty(self):
        assert apply_regions("text", []) == "text"
