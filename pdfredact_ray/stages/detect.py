"""RuleMatcher — the detection / fused-redaction batch stage.

A callable CLASS for ``map_batches(RuleMatcher, batch_format="pyarrow",
concurrency=N)``: rule compilation (regex compile, literal escaping, the
fragment-aware partition) happens ONCE per actor in ``__init__`` — the
amortized-rule-compilation requirement (the reference gets this for free
in-process; SURVEY.md §4 "State distribution").

Two modes:

- ``mode="redact"`` — fused plan+apply per turn (RedactCommand analog,
  /root/reference/src/PdfRedact.CLI/Commands/RedactCommand.cs:12-225):
  emits the REDACTED schema. Matchless turns pass through with
  ``redacted_text == text`` (copy-through, ApplyCommand.cs:65-69).
- ``mode="plan"`` — detection only (PlanCommand analog): emits PLAN rows,
  one per region, ordered (start, end, rule) within a turn.

Poisoned rows (malformed @@LAYOUT@@ payloads): ``strict=True`` re-raises
(the reference is fail-fast, PdfSharpMaskApplicator.cs:95-102); strict=False
emits copy-through with ``n_redactions = -1`` as the poisoned marker and
counts it (surfaced via lineage metrics rather than job abort).

Per-batch fast path: word-path rules whose pattern provably cannot match a
newline are run ONCE over all plain turns concatenated with '\\n' separators
(flat texts never contain '\\n', so separators are unreachable for those
patterns); match offsets map back to turns via searchsorted. The fragment
tokenizer only runs on turns that can contain digit runs (isolated single
digit/'-' tokens) — for every other turn the fragment flat text equals the
word flat text except for line ordering, but since plain synth turns are
processed per-turn in that case anyway we simply fall back per-turn. The
fast path is property-tested against the pure per-turn oracle
(tests/test_stage_equivalence.py).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from pdfredact_ray.functions.mask import apply_regions, spans_sorted
from pdfredact_ray.functions.match import Region, detect_turn
from pdfredact_ray.functions.rules import CompiledRule, RuleLike, compile_rules
from pdfredact_ray.functions.runs import is_layout_payload
from pdfredact_ray.schema import PLAN, REDACTED, SPAN

# conservative static check: can this pattern never match a '\n'?
_NEWLINE_RISK = re.compile(r"\\s|\\W|\\D|\\B|\n|\[\^|\\x0a|\\n")

# isolated single digit or '-' token → the turn needs real digit-run tokenization
_DIGIT_RUN_CANDIDATE = re.compile(r"(?<!\S)[0-9-](?!\S)")


def _newline_safe(crule: CompiledRule) -> bool:
    if crule.emit_pattern_text:  # literal: matches '\n' only if it contains one
        return "\n" not in crule.rule.pattern
    if crule.regex.flags & re.DOTALL:
        return False
    return _NEWLINE_RISK.search(crule.rule.pattern) is None


class RuleMatcher:
    def __init__(
        self,
        rules: Sequence[RuleLike],
        mode: str = "redact",
        strict: bool = True,
        fast: bool = True,
    ):
        assert mode in ("redact", "plan")
        self.ruleset = compile_rules(rules)
        self.mode = mode
        self.strict = strict
        self.fast = fast
        self.poisoned_count = 0
        # word rules eligible for the concatenated scan
        self._bulk_word_rules = [
            c for c in self.ruleset.word_rules if _newline_safe(c)
        ]
        self._slow_word_rules = [
            c for c in self.ruleset.word_rules if not _newline_safe(c)
        ]
        self._has_fragment = bool(self.ruleset.fragment_rules)

    # ------------------------------------------------------------------ core

    def _detect_many(self, texts: List[str]) -> List[List[Region]]:
        """Regions per turn, preserving the reference's per-turn region order
        (fragment rules first, then word rules, each in declaration order)."""
        n = len(texts)
        out: List[List[Region]] = [[] for _ in range(n)]
        if not self.ruleset.rules:
            return out

        if not self.fast:
            for i, t in enumerate(texts):
                out[i] = self._detect_one(t)
            return out

        # Partition turns. A turn needs the full per-turn path (no pre-filter)
        # when it's a layout payload, or — if fragment rules exist — when
        # digit-run joining or fragment line ordering can diverge from the
        # word path: isolated single digit/'-' tokens, or multi-line text.
        bulk_idx: List[int] = []
        slow_idx: List[int] = []
        for i, t in enumerate(texts):
            if is_layout_payload(t) or "\n" in t:
                # payloads need tokenization; multi-line turns have bottom-up
                # word-path flat order the natural-order pre-filter can't see
                slow_idx.append(i)
            elif self._has_fragment and _DIGIT_RUN_CANDIDATE.search(t):
                slow_idx.append(i)
            else:
                bulk_idx.append(i)

        # Bulk pre-filter over the EXACT searchable strings: for each bulk
        # turn build flat = ' '.join(text.split()) + ' ' (single-line turns
        # have identical flat for both word and fragment paths) and join with
        # '\n'. Newline-safe patterns cannot cross the separator, so one
        # finditer per rule over the mega-string yields exactly the turns
        # with >=1 match; those are then fully processed per turn.
        hit: set = set()
        if bulk_idx:
            rules_for_bulk = list(self._bulk_word_rules)
            unsafe = list(self._slow_word_rules)
            if self._has_fragment:
                for c in self.ruleset.fragment_rules:
                    (rules_for_bulk if _newline_safe(c) else unsafe).append(c)
            if unsafe:
                # a newline-unsafe rule can't use the mega-scan: no pre-filter
                hit.update(bulk_idx)
            else:
                flats = [" ".join(texts[i].split()) + " " for i in bulk_idx]
                mega = "\n".join(flats)
                bounds = np.cumsum([len(f) + 1 for f in flats])
                for crule in rules_for_bulk:
                    for m in crule.regex.finditer(mega):
                        hit.add(bulk_idx[int(np.searchsorted(bounds, m.start(), "right"))])
        hit.update(slow_idx)

        for i in sorted(hit):
            out[i] = self._detect_one(texts[i])
        return out

    def _detect_one(self, text: str) -> List[Region]:
        try:
            return detect_turn(text, self.ruleset)
        except Exception:
            if self.strict:
                raise
            self.poisoned_count += 1
            return [_POISONED]

    # ------------------------------------------------------------------ modes

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        regions_per_turn = self._detect_many(texts)
        if self.mode == "plan":
            return self._emit_plan(batch, regions_per_turn)
        return self._emit_redacted(batch, texts, regions_per_turn)

    def _emit_plan(self, batch: pa.Table, regions_per_turn) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        cols: Dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "start", "end", "matched_text", "rule_pattern", "line")}
        for i, regions in enumerate(regions_per_turn):
            for r in spans_sorted([r for r in regions if r is not _POISONED]):
                cols["conv_id"].append(conv[i])
                cols["turn_idx"].append(tidx[i])
                cols["start"].append(r.orig_start)
                cols["end"].append(r.orig_end)
                cols["matched_text"].append(r.matched_text)
                cols["rule_pattern"].append(r.rule_pattern)
                cols["line"].append(r.line)
        return pa.table(cols, schema=PLAN)

    def _emit_redacted(self, batch: pa.Table, texts, regions_per_turn) -> pa.Table:
        red_texts: List[str] = []
        spans_col: List[list] = []
        n_red: List[int] = []
        for text, regions in zip(texts, regions_per_turn):
            if regions and regions[0] is _POISONED:
                red_texts.append(text)
                spans_col.append([])
                n_red.append(-1)
                continue
            red_texts.append(apply_regions(text, regions))
            spans_col.append(
                [
                    {"start": r.orig_start, "end": r.orig_end, "rule_pattern": r.rule_pattern}
                    for r in spans_sorted(regions)
                ]
            )
            n_red.append(len(regions))
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "role": batch.column("role"),
                "tool": batch.column("tool"),
                "ts": batch.column("ts"),
                "redacted_text": pa.array(red_texts, type=pa.string()),
                "spans": pa.array(spans_col, type=pa.list_(SPAN)),
                "n_redactions": pa.array(n_red, type=pa.int32()),
            },
            schema=REDACTED,
        )


# sentinel region marking a poisoned (undetectable) turn in non-strict mode
_POISONED = Region(
    start=-1, end=-1, line=-1, matched_text="", rule_pattern="", orig_start=-1,
    orig_end=-1, members=(),
)
