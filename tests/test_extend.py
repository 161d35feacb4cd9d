"""User-extension surface tests (SURVEY.md §2 U1-U3): detector/masker
registries plugged through RuleMatcher, and plan JSON round-trip with the
reference serializer's semantics (camelCase, parent-dir creation, missing
file raises)."""

import numpy as np
import pyarrow as pa
import pytest

from pdfredact_ray.extend import (
    read_plan,
    register_detector,
    register_masker,
    write_plan,
)
from pdfredact_ray.functions.match import Region
from pdfredact_ray.functions.rules import RedactionRule
from pdfredact_ray.schema import PLAN
from pdfredact_ray.stages.detect import RuleMatcher

RULES = [RedactionRule("SECRET").to_dict()]


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


@register_detector("first-word-test")
def _first_word(texts, ruleset):
    out = []
    for t in texts:
        tok = t.split(" ", 1)[0] if t else ""
        if tok:
            out.append(
                [
                    Region(
                        start=0, end=len(tok), line=0, matched_text=tok,
                        rule_pattern="<first>", orig_start=0, orig_end=len(tok),
                        members=(),
                    )
                ]
            )
        else:
            out.append([])
    return out


@register_masker("x-test")
def _x_masker(text, regions):
    if not regions:
        return text
    chars = list(text)
    for r in regions:
        for i in range(max(0, r.orig_start), min(len(chars), r.orig_end)):
            chars[i] = "x"
    return "".join(chars)


def test_custom_detector_routes_through_rulematcher():
    out = RuleMatcher(rules=RULES, detector="first-word-test")(_batch(["hello world", ""]))
    assert out.column("redacted_text").to_pylist() == ["█████ world", ""]
    assert out.column("n_redactions").to_pylist() == [1, 0]


def test_custom_masker_routes_through_rulematcher():
    out = RuleMatcher(rules=RULES, masker="x-test")(_batch(["a SECRET here", "none"]))
    assert out.column("redacted_text").to_pylist() == ["a xxxxxx here", "none"]


def test_unknown_names_raise():
    with pytest.raises(ValueError, match="unknown detector"):
        RuleMatcher(rules=RULES, detector="nope")
    with pytest.raises(ValueError, match="unknown masker"):
        RuleMatcher(rules=RULES, masker="nope")


def test_plan_json_roundtrip(tmp_path):
    plan = pa.table(
        {
            "conv_id": ["c1", "c2"],
            "turn_idx": pa.array([0, 3], pa.int32()),
            "start": pa.array([1, 5], pa.int32()),
            "end": pa.array([4, 11], pa.int32()),
            "matched_text": ["abc", "SECRET"],
            "rule_pattern": ["abc", "SECRET"],
            "line": pa.array([0, 0], pa.int32()),
            # one payload-style region with exact members, one plain (null)
            "members": pa.array([[1, 2, 3], None], pa.list_(pa.int32())),
        },
        schema=PLAN,
    )
    path = str(tmp_path / "nested" / "dir" / "plan.json")  # parent dirs created
    write_plan(plan, path)
    back = read_plan(path)
    assert back.equals(plan)
    import json

    doc = json.load(open(path))
    assert doc["totalRedactions"] == 2
    assert doc["regions"][0]["convId"] == "c1"  # camelCase, like the reference
    assert doc["regions"][1]["matchedText"] == "SECRET"


def test_plan_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_plan(str(tmp_path / "absent.json"))
