"""CLI tests (C1-C4): plan/apply/redact round trips in-process (the CLI only
shuts down a Ray session it started, so these share the pytest session), the
fragment-flag conflict exit, and plan self-binding re-bind semantics."""

import json
import os

import pyarrow.dataset as pads
import pytest

from pdfredact_ray.cli import main
from pdfredact_ray.extend import read_plan_meta
from pdfredact_ray.sources.turns import ensure_turns


@pytest.fixture(scope="module")
def turns_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliturns")
    return ensure_turns("sf-cli", base_dir=str(d), n_turns=800)


def test_conflicting_fragment_flags_exit_1(turns_file, tmp_path):
    with pytest.raises(SystemExit) as e:
        main(
            [
                "plan", "--input", turns_file, "--out", str(tmp_path / "p"),
                "-p", "1234", "--fragment-aware", "--no-fragment-aware",
            ]
        )
    assert e.value.code == 1


def test_reference_short_flags_and_case_sensitive(ray_session, turns_file, tmp_path):
    """Reference CLI spellings (-i/-o/-r/-c, README.md:91-97) are accepted and
    `-c false` means case-insensitive (same semantics as --ignore-case)."""
    out_ci = str(tmp_path / "ci")
    out_cs = str(tmp_path / "cs")
    assert main(["plan", "-i", turns_file, "-p", "confidential", "-c", "false", "-o", out_ci]) == 0
    assert main(["plan", "-i", turns_file, "-p", "confidential", "-c", "true", "-o", out_cs]) == 0
    n_ci = pads.dataset(out_ci, format="parquet").count_rows()
    n_cs = pads.dataset(out_cs, format="parquet").count_rows()
    assert n_ci > n_cs  # the corpus literal is uppercase CONFIDENTIAL
    # long-form equivalents produce identical counts
    out_long = str(tmp_path / "long")
    assert main(["plan", "--input", turns_file, "-p", "confidential", "--ignore-case", "--output", out_long]) == 0
    assert pads.dataset(out_long, format="parquet").count_rows() == n_ci
    # a zero-region plan still applies as a full copy-through (reference
    # semantics, ApplyCommand.cs:65-69)
    assert n_cs == 0
    red = str(tmp_path / "red_empty")
    assert main(["apply", "--plan", out_cs, "-o", red]) == 0
    import pyarrow.compute as pc

    t = pads.dataset(red, format="parquet").to_table()
    assert t.num_rows == 800
    assert pc.sum(t.column("n_redactions")).as_py() == 0


def test_ignore_case_conflicts_with_case_sensitive_true(turns_file, tmp_path):
    with pytest.raises(SystemExit) as e:
        main(["plan", "-i", turns_file, "-p", "x", "--ignore-case", "-c", "true", "-o", str(tmp_path / "p")])
    assert e.value.code == 1


def test_plan_writes_self_binding_meta(ray_session, turns_file, tmp_path):
    out = str(tmp_path / "plan_pq")
    rc = main(["plan", "--input", turns_file, "-p", r"\d{3}-\d{2}-\d{4}", "--regex", "--out", out])
    assert rc == 0
    meta = read_plan_meta(out)
    assert meta["source_path"] == turns_file
    assert len(meta["ruleset_hash"]) == 16


def test_apply_rebinds_input_from_plan(ray_session, turns_file, tmp_path):
    """Reference semantics: apply re-binds the input from the plan
    (PdfSharpMaskApplicator.cs:32-45) — no --input needed."""
    plan_out = str(tmp_path / "plan_pq")
    red_out = str(tmp_path / "red_pq")
    assert main(["plan", "--input", turns_file, "-p", "CONFIDENTIAL", "--out", plan_out]) == 0
    assert main(["apply", "--plan", plan_out, "--out", red_out]) == 0
    t = pads.dataset(red_out, format="parquet").to_table()
    assert t.num_rows == 800
    import pyarrow.compute as pc

    n_red = pc.sum(t.column("n_redactions")).as_py()
    assert n_red == pads.dataset(plan_out, format="parquet").count_rows() > 0


def test_apply_json_plan_and_redact_fused_agree(ray_session, turns_file, tmp_path):
    plan_json = str(tmp_path / "plan.json")
    a_out = str(tmp_path / "via_apply")
    r_out = str(tmp_path / "via_redact")
    assert main(["plan", "--input", turns_file, "-p", "SECRET", "--out", plan_json]) == 0
    doc = json.load(open(plan_json))
    assert doc["sourcePath"] == turns_file and doc["rulesetHash"]
    assert main(["apply", "--plan", plan_json, "--out", a_out]) == 0
    assert main(["redact", "--input", turns_file, "-p", "SECRET", "--out", r_out]) == 0
    ta = pads.dataset(a_out, format="parquet").to_table().sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    tr = pads.dataset(r_out, format="parquet").to_table().sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    assert ta.column("redacted_text").equals(tr.column("redacted_text"))


def test_apply_without_input_or_binding_errors(ray_session, tmp_path):
    import pyarrow as pa

    from pdfredact_ray.extend import write_plan
    from pdfredact_ray.schema import PLAN

    empty = pa.table(
        {f.name: pa.array([], type=f.type) for f in PLAN}, schema=PLAN
    )
    p = str(tmp_path / "unbound.json")
    write_plan(empty, p)  # no source recorded
    rc = main(["apply", "--plan", p, "--out", str(tmp_path / "o")])
    assert rc == 1
