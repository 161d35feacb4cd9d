"""Searchable-text building, matching, token claiming, line split, regions.

Reference semantics preserved (SURVEY.md §2.1):

- searchable text = token texts each followed by ONE space (trailing space
  after the last token included) — BuildSearchableText[FromTokens],
  PdfPigTextLocator.cs:165-219. Patterns may match across the injected space.
- matches are leftmost, non-overlapping, advancing past the full match for
  both regex (``Regex.Matches`` ~ ``re.finditer``) and literal (IndexOf scan,
  compiled here as an escaped regex) — PdfPigTextLocator.cs:221-259.
- a match claims every token whose span INTERSECTS it (half-open:
  ``span.End > matchStart and span.Start < matchEnd``) —
  PdfPigTextLocator.cs:280-294. A match that covers only a delimiter space
  claims no token and yields no region (``if matchingTokens.Any()``).
- claimed tokens are grouped into lines (sort by Bottom asc, greedy with fixed
  2.0pt tolerance, baseline = first token of group) and ONE region is emitted
  per line group — PdfPigTextLocator.cs:300-382; region envelope is the
  min/max fold over the group — :389-432.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right
from dataclasses import dataclass
from typing import List, Sequence, Tuple

from pdfredact_ray.functions.rules import CompiledRule, RuleSet
from pdfredact_ray.functions.runs import (
    LINE_GROUPING_TOLERANCE,
    Token,
    fragment_tokenize,
    is_layout_payload,
    parse_layout_payload,
    plain_text_to_runs,
    word_tokenize_plain,
    word_tokenize_runs,
)


def build_searchable(tokens: Sequence[Token]) -> Tuple[str, List[int], List[int]]:
    """Flatten tokens into the searchable string; return (flat, starts, ends)
    where [starts[i], ends[i]) is token i's span in flat (space-exclusive)."""
    parts = []
    starts: List[int] = []
    ends: List[int] = []
    pos = 0
    for t in tokens:
        starts.append(pos)
        pos += len(t.text)
        ends.append(pos)
        parts.append(t.text)
        parts.append(" ")
        pos += 1
    return "".join(parts), starts, ends


@dataclass(frozen=True)
class Match:
    start: int
    end: int
    text: str


def find_matches(flat: str, crule: CompiledRule) -> List[Match]:
    if crule.emit_pattern_text:
        pat = crule.rule.pattern
        return [Match(m.start(), m.end(), pat) for m in crule.regex.finditer(flat)]
    return [Match(m.start(), m.end(), m.group(0)) for m in crule.regex.finditer(flat)]


def matches_per_rule(
    flat: str, rules: Sequence[CompiledRule], scanner=None
) -> List[List[Match]]:
    """Per-rule match lists in rule order. With a LiteralScanner (M5
    automaton), all eligible literal rules share ONE automaton pass over
    ``flat``; everything else (regex rules, ineligible literals, texts with
    expanding casefolds) uses the per-rule compiled-regex scan — both yield
    identical leftmost non-overlapping matches."""
    scan_res = None
    if scanner is not None and any(id(c) in scanner._key for c in rules):
        scan_res = scanner.scan(flat)
    out: List[List[Match]] = []
    for crule in rules:
        starts = scan_res.starts(crule) if scan_res is not None else None
        if starts is None:
            out.append(find_matches(flat, crule))
        else:
            pat = crule.rule.pattern
            n = len(pat)
            out.append([Match(s, s + n, pat) for s in starts])
    return out


def claim_token_range(
    starts: Sequence[int], ends: Sequence[int], m_start: int, m_end: int
) -> Tuple[int, int]:
    """Indices [lo, hi) of tokens intersecting [m_start, m_end).

    Tokens are in flat order (starts ascending), so the claimed set is
    contiguous: lo = first token with end > m_start, hi = first token with
    start >= m_end.
    """
    lo = bisect_right(ends, m_start)
    hi = bisect_left(starts, m_end)
    return lo, hi


def group_tokens_by_line(tokens: List[Token]) -> List[List[Token]]:
    """GroupTokensByLine / GroupWordsByLine (PdfPigTextLocator.cs:300-382):
    stable sort by Bottom ascending, greedy grouping with fixed 2.0pt
    tolerance against the group's FIRST token."""
    if not tokens:
        return []
    srt = sorted(tokens, key=lambda t: t.bottom)
    groups: List[List[Token]] = []
    current = [srt[0]]
    baseline = srt[0].bottom
    for t in srt[1:]:
        if abs(t.bottom - baseline) <= LINE_GROUPING_TOLERANCE:
            current.append(t)
        else:
            groups.append(current)
            current = [t]
            baseline = t.bottom
    groups.append(current)
    return groups


@dataclass(frozen=True)
class Region:
    """Engine analog of RedactionRegion (RedactionRegion.cs:7-49): a
    char-offset span over the turn's searchable text plus masking info."""

    start: int  # flat-space envelope of the claimed line group
    end: int
    line: int  # 0-based top-down line index within the turn
    matched_text: str
    rule_pattern: str
    # masking target in origin space: (orig_start, orig_end) char envelope for
    # plain turns; tuple of payload run indices for layout turns.
    orig_start: int
    orig_end: int
    members: Tuple[int, ...]  # payload run indices; () for plain turns


def _regions_for_path(
    tokens: List[Token], rules: Sequence[CompiledRule], scanner=None
) -> List[Region]:
    if not tokens or not rules:
        return []
    flat, starts, ends = build_searchable(tokens)
    regions: List[Region] = []
    for crule, rule_matches in zip(rules, matches_per_rule(flat, rules, scanner)):
        for m in rule_matches:
            lo, hi = claim_token_range(starts, ends, m.start, m.end)
            if lo >= hi:
                continue
            claimed = tokens[lo:hi]
            # token index -> flat span, for the group envelope
            flat_span = {id(t): (starts[lo + i], ends[lo + i]) for i, t in enumerate(claimed)}
            for group in group_tokens_by_line(claimed):
                g_start = min(flat_span[id(t)][0] for t in group)
                g_end = max(flat_span[id(t)][1] for t in group)
                members: List[int] = []
                for t in group:
                    if t.members is not None:
                        members.extend(t.members)
                regions.append(
                    Region(
                        start=g_start,
                        end=g_end,
                        line=min(t.line for t in group),
                        matched_text=m.text,
                        rule_pattern=crule.rule.pattern,
                        orig_start=min(t.orig_start for t in group),
                        orig_end=max(t.orig_end for t in group),
                        members=tuple(members),
                    )
                )
    return regions


def detect_turn(text: str, ruleset: RuleSet) -> List[Region]:
    """ProcessPage (PdfPigTextLocator.cs:54-132) for one turn: fragment-aware
    rules over two-pass tokens first, then word-based rules over word tokens;
    both paths may fire on the same turn. Empty ruleset -> no regions
    (plan-empty short-circuit, PdfPigTextLocator.cs:38-41)."""
    regions: List[Region] = []
    if not (ruleset.fragment_rules or ruleset.word_rules):
        return regions
    layout = is_layout_payload(text)
    scanner = ruleset.literal_scanner
    runs = None
    if ruleset.fragment_rules:
        runs = parse_layout_payload(text) if layout else plain_text_to_runs(text)
        regions.extend(
            _regions_for_path(fragment_tokenize(runs), ruleset.fragment_rules, scanner)
        )
    if ruleset.word_rules:
        if layout:
            if runs is None:
                runs = parse_layout_payload(text)
            word_tokens = word_tokenize_runs(runs)
        else:
            word_tokens = word_tokenize_plain(text)
        regions.extend(_regions_for_path(word_tokens, ruleset.word_rules, scanner))
    return regions
