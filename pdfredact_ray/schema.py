"""Declared pyarrow schemas per stage boundary (SURVEY.md §1.2).

The reference's schema system is fixed compiled C# classes; here each stage
declares its Arrow schema and validates at the boundary.
"""

from __future__ import annotations

import pyarrow as pa

# The authoritative input shape (BASELINE.json input_hint).
TURNS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Plan table: one row per region (RedactionRegion analog, RedactionRegion.cs:7-49).
# start/end are the region's envelope in ORIGIN space — char offsets for plain
# turns, run indices for @@LAYOUT@@ payload turns — the path-agnostic analog of
# the reference's geometric bbox (apply needs no re-detection). ``members``
# records the EXACT payload run indices the region claims (null for plain
# turns): the [start, end) envelope alone can cover non-member runs when a
# payload lists its runs out of (line, col) order, and apply must mask only
# the members (the fused path's apply_regions semantics).
PLAN = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("matched_text", pa.string()),
        ("rule_pattern", pa.string()),
        ("line", pa.int32()),
        ("members", pa.list_(pa.int32())),
    ]
)

SPAN = pa.struct(
    [("start", pa.int32()), ("end", pa.int32()), ("rule_pattern", pa.string())]
)

# Redacted output (FIXTURES.md §5 + carried-through turn columns).
REDACTED = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("redacted_text", pa.string()),
        ("spans", pa.list_(SPAN)),
        ("n_redactions", pa.int32()),
    ]
)

# RuleMatcher(emit_spans=False): the ordered-sink shape — span offsets are
# the plan's job, and never building the list<struct> column saves per-row
# dict construction plus a whole projection pass before the sort shuffle.
REDACTED_NOSPANS = pa.schema([f for f in REDACTED if f.name != "spans"])


def validate(table: pa.Table, schema: pa.Schema, stage: str) -> None:
    """Boundary validation: required columns exist with the declared types."""
    for f in schema:
        idx = table.schema.get_field_index(f.name)
        if idx < 0:
            raise ValueError(f"{stage}: missing column {f.name!r}")
        actual = table.schema.field(idx).type
        if actual != f.type:
            raise ValueError(
                f"{stage}: column {f.name!r} has type {actual}, expected {f.type}"
            )
