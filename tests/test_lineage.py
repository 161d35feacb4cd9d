"""Checkpoint/resume + metrics: the lineage-tracked redaction job."""

import json
import os
import shutil

import pyarrow.dataset as pads
import pytest

from pdfredact_ray.functions.rules import RedactionRule, compile_rules, default_rules
from pdfredact_ray.sources.turns import ensure_turns
from pdfredact_ray.state.lineage import (
    LINEAGE_DIR,
    completed_buckets,
    job_metrics,
    read_bucket_ordered,
    redact_job,
)

SPECS = [r.to_dict() for r in default_rules()]
N_BUCKETS = 8


@pytest.fixture(scope="module")
def turns_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("turns")
    return ensure_turns("sf-lineage", base_dir=str(d), n_turns=800)


def _full_output(out_dir):
    rows = []
    for b in range(N_BUCKETS):
        bdir = os.path.join(out_dir, f"bucket={b}")
        if os.path.isdir(bdir):
            t = read_bucket_ordered(out_dir, b)
            rows.extend(
                zip(t.column("conv_id").to_pylist(), t.column("turn_idx").to_pylist(),
                    t.column("redacted_text").to_pylist())
            )
    return sorted(rows)


def test_job_writes_buckets_and_manifests(ray_session, turns_file, tmp_path):
    out = str(tmp_path / "out")
    metrics = redact_job(turns_file, SPECS, out, n_buckets=N_BUCKETS)
    assert metrics["n_buckets_done"] == N_BUCKETS
    assert metrics["n_rows"] == 800
    assert metrics["n_redactions"] > 0
    assert metrics["n_poisoned"] == 0
    manifests = os.listdir(os.path.join(out, LINEAGE_DIR))
    assert len(manifests) == N_BUCKETS


def test_resume_skips_completed_and_matches_oneshot(ray_session, turns_file, tmp_path):
    ref_out = str(tmp_path / "ref")
    redact_job(turns_file, SPECS, ref_out, n_buckets=N_BUCKETS)
    expected = _full_output(ref_out)

    # simulate a crash: remove data+manifest for 3 buckets, data-only for 1
    out = str(tmp_path / "resumed")
    redact_job(turns_file, SPECS, out, n_buckets=N_BUCKETS)
    for b in (1, 4, 6):
        shutil.rmtree(os.path.join(out, f"bucket={b}"), ignore_errors=True)
        os.remove(os.path.join(out, LINEAGE_DIR, f"bucket-{b:05d}.json"))
    # bucket 2: data present but NO manifest -> must be cleaned + re-run
    os.remove(os.path.join(out, LINEAGE_DIR, f"bucket-{2:05d}.json"))

    ruleset_hash = compile_rules(SPECS).content_hash()
    assert len(completed_buckets(out, turns_file, ruleset_hash)) == N_BUCKETS - 4

    metrics = redact_job(turns_file, SPECS, out, n_buckets=N_BUCKETS)
    assert metrics["n_buckets_done"] == N_BUCKETS
    assert metrics["n_rows"] == 800
    assert _full_output(out) == expected


def test_resume_refuses_changed_ruleset(ray_session, turns_file, tmp_path):
    out = str(tmp_path / "out")
    redact_job(turns_file, SPECS, out, n_buckets=N_BUCKETS)
    changed = SPECS + [RedactionRule("extra").to_dict()]
    with pytest.raises(RuntimeError, match="resume refused"):
        redact_job(turns_file, changed, out, n_buckets=N_BUCKETS)
    # no_resume wipes and reruns cleanly with the new rules
    metrics = redact_job(turns_file, changed, out, n_buckets=N_BUCKETS, resume=False)
    assert metrics["n_rows"] == 800


def test_bucket_read_is_ordered(ray_session, turns_file, tmp_path):
    out = str(tmp_path / "out")
    redact_job(turns_file, SPECS, out, n_buckets=N_BUCKETS)
    t = read_bucket_ordered(out, 0)
    keys = list(zip(t.column("conv_id").to_pylist(), t.column("turn_idx").to_pylist()))
    assert keys == sorted(keys)


def test_metrics_roundtrip(ray_session, turns_file, tmp_path):
    out = str(tmp_path / "out")
    m1 = redact_job(turns_file, SPECS, out, n_buckets=N_BUCKETS)
    assert job_metrics(out) == m1
