"""Applier — the mask-application batch stage (apply phase of the two-phase
workflow, ApplyCommand analog: /root/reference/src/PdfRedact.CLI/Commands/ApplyCommand.cs:11-88).

The plan side is broadcast: the driver ``ray.put``s a dict
``(conv_id, turn_idx) -> [(start, end, rule_pattern, members), ...]`` ONCE; each actor
reads it from the object store in ``__init__`` (never re-shipped per batch).
For plans too large to broadcast, ``pipelines.apply`` switches to a
hash-partitioned ``Dataset.join`` instead of this stage.

Semantics:

- left-outer: turns with no plan rows pass through unchanged
  (copy-through, ApplyCommand.cs:65-69).
- plan rows referencing nonexistent (conv_id, turn_idx) keys are silently
  skipped (page-range guard analog, PdfSharpMaskApplicator.cs:57-60); the
  dropped count is recoverable as ``plan.count() - sum(n_redactions)``.
- within a turn, spans apply in deterministic (start, end, rule) order after
  the interval-merge sweep — order-invariant like opaque paint
  (PdfSharpMaskApplicator.cs:48-77).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from pdfredact_ray.functions.mask import _mask_payload, mask_text, merge_intervals
from pdfredact_ray.functions.runs import is_layout_payload
from pdfredact_ray.schema import REDACTED, SPAN

# span tuple: (start, end, rule_pattern, members-or-None). ``members`` is the
# exact payload run-index list for @@LAYOUT@@ turns (see schema.PLAN) — the
# [start, end) envelope may cover non-member runs when payload runs are listed
# out of (line, col) order, and masking range(start, end) would over-redact.
Span = Tuple[int, int, str, Optional[List[int]]]
PlanIndex = Dict[Tuple[str, int], List[Span]]


def build_plan_index(plan_table: pa.Table) -> PlanIndex:
    """Collapse a plan table into the broadcast lookup index."""
    index: PlanIndex = {}
    conv = plan_table.column("conv_id").to_pylist()
    tidx = plan_table.column("turn_idx").to_pylist()
    starts = plan_table.column("start").to_pylist()
    ends = plan_table.column("end").to_pylist()
    rules = plan_table.column("rule_pattern").to_pylist()
    if plan_table.schema.get_field_index("members") >= 0:
        members = plan_table.column("members").to_pylist()
    else:  # pre-members plan artifact: envelope fallback
        members = [None] * plan_table.num_rows
    for c, t, s, e, r, m in zip(conv, tidx, starts, ends, rules, members):
        index.setdefault((c, t), []).append((s, e, r, m))
    for v in index.values():
        v.sort(key=lambda x: (x[0], x[1], x[2]))
    return index


def apply_spans_to_text(text: str, spans: List[Span]) -> str:
    if not spans:
        return text
    if is_layout_payload(text):
        members: List[int] = []
        for s, e, _, m in spans:
            # exact member indices when the plan carries them; envelope
            # range as the legacy fallback (pre-members plan files)
            members.extend(m if m is not None else range(s, e))
        return _mask_payload(text, members)
    return mask_text(text, merge_intervals((s, e) for s, e, _, _ in spans))


class Applier:
    """map_batches actor: broadcast-plan left-outer join + mask."""

    def __init__(self, plan_ref):
        import ray

        # one object-store read per actor, not per batch
        self.plan: PlanIndex = ray.get(plan_ref) if not isinstance(plan_ref, dict) else plan_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        red: List[str] = []
        spans_col: List[list] = []
        n_red: List[int] = []
        for c, t, text in zip(conv, tidx, texts):
            spans = self.plan.get((c, t), [])
            red.append(apply_spans_to_text(text, spans))
            spans_col.append(
                [{"start": s, "end": e, "rule_pattern": r} for s, e, r, _ in spans]
            )
            n_red.append(len(spans))
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "role": batch.column("role"),
                "tool": batch.column("tool"),
                "ts": batch.column("ts"),
                "redacted_text": pa.array(red, type=pa.string()),
                "spans": pa.array(spans_col, type=pa.list_(SPAN)),
                "n_redactions": pa.array(n_red, type=pa.int32()),
            },
            schema=REDACTED,
        )
