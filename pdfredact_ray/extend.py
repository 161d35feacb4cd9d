"""User-extension surface (SURVEY.md §2 U1-U3).

The reference exposes three seams and this module re-expresses each:

- U1 ``ITextLocator`` (/root/reference/src/PdfRedact.Core/Services/
  ITextLocator.cs:8-17) -> ``Detector`` protocol: per-turn region detection
  given a compiled RuleSet. Registered by name so pipelines compose
  detection backends; ``RuleMatcher(detector="...")`` resolves here.
- U2 ``IMaskApplicator`` (IMaskApplicator.cs:8-16) -> ``Masker`` protocol:
  ``(text, regions) -> redacted_text``. The default "block" masker is the
  interval-merge + opaque-fill kernel (K1-K3).
- U3 ``IRedactionPlanSerializer`` (RedactionPlanSerializer.cs:9-24) -> plan
  I/O behind ``write_plan`` / ``read_plan``: partitioned parquet by default,
  or a camelCase-JSON sidecar mirroring the reference plan format
  (RedactionPlanSerializer.cs:31-58 writes camelCase indented JSON and
  creates parent dirs; :61-82 raises on a missing file) for tiny
  human-review plans.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Protocol, Sequence

import pyarrow as pa
import pyarrow.parquet as pq

from pdfredact_ray.functions.mask import apply_regions
from pdfredact_ray.functions.match import Region, detect_turn
from pdfredact_ray.functions.rules import RuleSet
from pdfredact_ray.schema import PLAN


class Detector(Protocol):
    """U1: per-turn detection backend. Returns one region list per text."""

    def __call__(self, texts: Sequence[str], ruleset: RuleSet) -> List[List[Region]]:
        ...


class Masker(Protocol):
    """U2: mask materialization backend. Must be the identity for an empty
    region list — the batch pre-filter routes matchless turns around the
    masker entirely (copy-through, S5 semantics)."""

    def __call__(self, text: str, regions: Sequence[Region]) -> str:
        ...


_DETECTORS: Dict[str, Detector] = {}
_MASKERS: Dict[str, Masker] = {}


def register_detector(name: str) -> Callable[[Detector], Detector]:
    def deco(fn: Detector) -> Detector:
        _DETECTORS[name] = fn
        return fn

    return deco


def register_masker(name: str) -> Callable[[Masker], Masker]:
    def deco(fn: Masker) -> Masker:
        _MASKERS[name] = fn
        return fn

    return deco


def get_detector(name: str) -> Detector:
    try:
        return _DETECTORS[name]
    except KeyError:
        raise ValueError(
            f"unknown detector {name!r}; registered: {sorted(_DETECTORS)}"
        ) from None


def get_masker(name: str) -> Masker:
    try:
        return _MASKERS[name]
    except KeyError:
        raise ValueError(
            f"unknown masker {name!r}; registered: {sorted(_MASKERS)}"
        ) from None


@register_detector("rules")
def rules_detector(texts: Sequence[str], ruleset: RuleSet) -> List[List[Region]]:
    """Default backend: the reference-semantics rule matcher (M1-M8)."""
    return [detect_turn(t, ruleset) for t in texts]


@register_masker("block")
def block_masker(text: str, regions: Sequence[Region]) -> str:
    """Default backend: interval-merge sweep + opaque block fill (K1-K3)."""
    return apply_regions(text, regions)


# --------------------------------------------------------------- plan I/O (U3)

# camelCase field mapping mirroring the reference's plan JSON
# (RedactionRegion analog per row; RedactionPlanSerializer.cs:31-35).
_JSON_FIELDS = [
    ("conv_id", "convId"),
    ("turn_idx", "turnIdx"),
    ("start", "start"),
    ("end", "end"),
    ("matched_text", "matchedText"),
    ("rule_pattern", "rulePattern"),
    ("line", "line"),
    ("members", "members"),
]


def write_plan(
    plan: pa.Table,
    path: str,
    source_path: Optional[str] = None,
    ruleset_hash: Optional[str] = None,
) -> None:
    """U3 SavePlan analog: parquet unless ``path`` ends in .json (camelCase
    indented JSON sidecar). Parent directories are created, as the reference
    does (RedactionPlanSerializer.cs:44-49).

    The plan SELF-BINDS like the reference's (RedactionPlan.SourcePdfPath,
    RedactionPlan.cs:11): ``source_path`` records the turns input the plan
    was detected over and ``ruleset_hash`` the ruleset that produced it, so
    ``apply`` can re-bind its input from the plan and refuse/flag a
    mismatched pairing instead of trusting the caller."""
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    if path.endswith(".json"):
        rows = []
        # 'members' mirrors the read-side tolerance: a pre-members plan table
        # through the public U3 API emits null instead of raising KeyError.
        cols = {
            snake: (
                plan.column(snake).to_pylist()
                if snake != "members" or snake in plan.column_names
                else [None] * plan.num_rows
            )
            for snake, _ in _JSON_FIELDS
        }
        for i in range(plan.num_rows):
            rows.append({camel: cols[snake][i] for snake, camel in _JSON_FIELDS})
        doc = {
            "sourcePath": source_path,  # reference: sourcePdfPath
            "rulesetHash": ruleset_hash,
            "regions": rows,
            "totalRedactions": plan.num_rows,
        }
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)
        return
    meta = dict(plan.schema.metadata or {})
    if source_path is not None:
        meta[b"pdfredact.source_path"] = source_path.encode()
    if ruleset_hash is not None:
        meta[b"pdfredact.ruleset_hash"] = ruleset_hash.encode()
    pq.write_table(plan.replace_schema_metadata(meta), path)


def write_plan_dir_meta(
    out_dir: str, source_path: Optional[str], ruleset_hash: Optional[str]
) -> None:
    """Self-binding sidecar for DISTRIBUTED plan writes (a Ray
    ``write_parquet`` directory has no single schema-metadata carrier).
    A zero-region plan writes no parquet files at all, so the directory may
    not exist yet — a meta-only plan dir is valid (the reference's 0-region
    plan still drives a full copy-through apply, ApplyCommand.cs:65-69)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_plan_meta.json"), "w") as f:
        json.dump({"sourcePath": source_path, "rulesetHash": ruleset_hash}, f, indent=2)


def read_plan_meta(path: str) -> dict:
    """Self-binding metadata of a plan artifact (file or directory):
    ``{"source_path": ..., "ruleset_hash": ...}`` — empty dict when the
    artifact predates self-binding."""
    if os.path.isdir(path):
        sidecar = os.path.join(path, "_plan_meta.json")
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                doc = json.load(f)
            return {
                "source_path": doc.get("sourcePath"),
                "ruleset_hash": doc.get("rulesetHash"),
            }
        return {}
    if path.endswith(".json"):
        with open(path) as f:
            doc = json.load(f)
        out = {}
        if doc.get("sourcePath") is not None:
            out["source_path"] = doc["sourcePath"]
        if doc.get("rulesetHash") is not None:
            out["ruleset_hash"] = doc["rulesetHash"]
        return out
    meta = pq.read_schema(path).metadata or {}
    out = {}
    if b"pdfredact.source_path" in meta:
        out["source_path"] = meta[b"pdfredact.source_path"].decode()
    if b"pdfredact.ruleset_hash" in meta:
        out["ruleset_hash"] = meta[b"pdfredact.ruleset_hash"].decode()
    return out


def read_plan(path: str) -> pa.Table:
    """U3 LoadPlan analog: raises FileNotFoundError on a missing path, like
    the reference (RedactionPlanSerializer.cs:63-66)."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"plan not found: {path}")
    if path.endswith(".json"):
        with open(path) as f:
            doc = json.load(f)
        rows = doc["regions"]
        data = {
            # members is optional for pre-members plan files (-> null = use
            # the envelope fallback); every other field is required
            snake: [r.get(camel) if snake == "members" else r[camel] for r in rows]
            for snake, camel in _JSON_FIELDS
        }
        return pa.table(data, schema=PLAN)
    return pq.read_table(path)
