"""Interval-merge sweep + mask materialization — the "apply" kernel.

The reference draws opaque rects independently; overlap is idempotent because
paint is opaque (PdfSharpMaskApplicator.cs:74-77). In char space that
idempotence is made explicit with an interval-merge sweep (SURVEY.md K3):
sort intervals by start, merge overlapping/adjacent, then mask — output is
provably invariant to rule order and multi-rule overlap.

Mask padding is identity in char space (pad = 0; the reference's 1.0pt
inflation, PdfSharpMaskApplicator.cs:112-115, exists to beat anti-aliasing);
clamping = clip to [0, len(text)) (:118-119). Masking is length-preserving:
every covered char becomes MASK_CHAR.
"""

from __future__ import annotations

import json
from typing import Iterable, List, Sequence, Tuple

from pdfredact_ray.functions.match import Region, detect_turn
from pdfredact_ray.functions.rules import RuleSet
from pdfredact_ray.functions.runs import LAYOUT_PREFIX, is_layout_payload

MASK_CHAR = "█"  # '█'


def merge_intervals(intervals: Iterable[Tuple[int, int]]) -> List[Tuple[int, int]]:
    """Merge overlapping-or-touching half-open intervals; drops empty ones."""
    srt = sorted((s, e) for s, e in intervals if e > s)
    out: List[Tuple[int, int]] = []
    for s, e in srt:
        if out and s <= out[-1][1]:
            if e > out[-1][1]:
                out[-1] = (out[-1][0], e)
        else:
            out.append((s, e))
    return out


def mask_text(text: str, intervals: Sequence[Tuple[int, int]], mask_char: str = MASK_CHAR) -> str:
    """Length-preserving mask of merged, clamped intervals over ``text``."""
    if not intervals:
        return text
    n = len(text)
    parts: List[str] = []
    pos = 0
    for s, e in intervals:
        s = max(0, s)
        e = min(n, e)
        if e <= s:
            continue
        parts.append(text[pos:s])
        parts.append(mask_char * (e - s))
        pos = e
    parts.append(text[pos:])
    return "".join(parts)


def _mask_payload(text: str, member_indices: Iterable[int]) -> str:
    """Rewrite a layout payload, replacing masked runs' ``ch`` with MASK_CHAR.

    Re-serialization is canonical (compact separators) — identical to
    ``make_layout_payload`` output, so unmasked fields round-trip.
    """
    body = json.loads(text[len(LAYOUT_PREFIX):])
    runs = body["runs"]
    for i in set(member_indices):
        runs[i][0] = MASK_CHAR
    return LAYOUT_PREFIX + json.dumps(
        {"runs": runs}, separators=(",", ":"), ensure_ascii=False
    )


def apply_regions(text: str, regions: Sequence[Region]) -> str:
    """Materialize masks for one turn. Zero regions -> text unchanged (the
    copy-through invariant, ApplyCommand.cs:65-69)."""
    if not regions:
        return text
    if is_layout_payload(text):
        members: List[int] = []
        for r in regions:
            members.extend(r.members)
        return _mask_payload(text, members)
    return mask_text(text, merge_intervals((r.orig_start, r.orig_end) for r in regions))


def redact_turn(text: str, ruleset: RuleSet) -> Tuple[str, List[Region]]:
    """The fused per-turn kernel: detect + merge + mask. This is ALSO the
    pure-Python oracle the engine's vectorized batch path is property-tested
    against."""
    regions = detect_turn(text, ruleset)
    return apply_regions(text, regions), regions


def spans_sorted(regions: Sequence[Region]) -> List[Region]:
    """Deterministic span ordering within a turn: start asc, end asc, rule —
    the engine analog of the reference's deterministic apply order
    (PdfSharpMaskApplicator.cs:48-68)."""
    return sorted(regions, key=lambda r: (r.start, r.end, r.rule_pattern))
