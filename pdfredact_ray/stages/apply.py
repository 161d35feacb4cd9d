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
import pyarrow.compute as pc

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
    """map_batches actor: broadcast-plan left-outer join + mask.

    Vectorized copy-through: a fused ``conv_id\\x1fturn_idx`` key column is
    probed against the index's key set with ``pc.is_in`` (built once per
    actor), so matchless turns — the majority — never become Python values;
    only hit rows run the masking loop, then results scatter back to input
    order via concat + take."""

    def __init__(self, plan_ref):
        import ray

        # one object-store read per actor, not per batch
        self.plan: PlanIndex = ray.get(plan_ref) if not isinstance(plan_ref, dict) else plan_ref
        self.key_set = pa.array(
            [f"{c}\x1f{t}" for (c, t) in self.plan], type=pa.string()
        )

    @staticmethod
    def _key_col(batch: pa.Table) -> pa.Array:
        k = pc.binary_join_element_wise(
            pc.cast(batch.column("conv_id"), pa.string()),
            pc.cast(batch.column("turn_idx"), pa.string()),
            "\x1f",
        )
        return k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.num_rows
        text_col = batch.column("text")
        if isinstance(text_col, pa.ChunkedArray):
            text_col = text_col.combine_chunks()
        text_col = text_col.cast(pa.string())
        has = pc.is_in(self._key_col(batch), value_set=self.key_set).to_numpy(
            zero_copy_only=False
        )
        hit_idx = np.flatnonzero(has)
        if len(hit_idx) == 0:
            red: pa.Array = text_col
            spans = pa.array([[]] * n, type=pa.list_(SPAN))
            nred = pa.array(np.zeros(n, dtype=np.int32), type=pa.int32())
        else:
            take = pa.array(hit_idx)
            conv = batch.column("conv_id").take(take).to_pylist()
            tidx = batch.column("turn_idx").take(take).to_pylist()
            texts = text_col.take(take).to_pylist()
            red_sub: List[str] = []
            spans_sub: List[list] = []
            nred_sub: List[int] = []
            for c, t, text in zip(conv, tidx, texts):
                spans_for = self.plan.get((c, t), [])
                red_sub.append(apply_spans_to_text(text, spans_for))
                spans_sub.append(
                    [{"start": s, "end": e, "rule_pattern": r} for s, e, r, _ in spans_for]
                )
                nred_sub.append(len(spans_for))
            pass_idx = np.flatnonzero(~has)
            perm = np.concatenate([pass_idx, hit_idx])
            inv = np.empty(n, dtype=np.int64)
            inv[perm] = np.arange(n)
            inv_arr = pa.array(inv)
            red = pa.concat_arrays(
                [text_col.take(pa.array(pass_idx)), pa.array(red_sub, type=pa.string())]
            ).take(inv_arr)
            spans = pa.concat_arrays(
                [
                    pa.array([[]] * len(pass_idx), type=pa.list_(SPAN)),
                    pa.array(spans_sub, type=pa.list_(SPAN)),
                ]
            ).take(inv_arr)
            nred = pa.concat_arrays(
                [
                    pa.array(np.zeros(len(pass_idx), dtype=np.int32), type=pa.int32()),
                    pa.array(nred_sub, type=pa.int32()),
                ]
            ).take(inv_arr)
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "role": batch.column("role"),
                "tool": batch.column("tool"),
                "ts": batch.column("ts"),
                "redacted_text": red,
                "spans": spans,
                "n_redactions": nred,
            },
            schema=REDACTED,
        )
