"""Checkpoint / resume / metrics: deterministic hash-bucket output layout
with per-partition lineage records.

The reference has no checkpointing (any exception aborts the whole run,
PlanCommand.cs:185-189); at 10^12 turns a job MUST be resumable. Design
(SURVEY.md §4 "Checkpoint / resume"):

- every output row gets ``bucket = crc32(conv_id) % n_buckets`` — a
  deterministic partition key, so re-running any subset of buckets is
  idempotent. write_parquet partitions by it (one directory per bucket).
- after the write, one lineage manifest per bucket is written under
  ``_lineage/`` recording input path, ruleset hash, row count, redaction
  count, and poisoned-row count (the detection/mask-count metrics sink).
- resume: buckets with a manifest matching the current (input, ruleset
  hash) are SKIPPED via a pushed-down filter on the bucket key; bucket
  directories without a manifest (crashed mid-write) are deleted and
  re-run. A manifest with a DIFFERENT ruleset hash aborts — a resumed run
  with changed rules must not mix outputs.
"""

from __future__ import annotations

import json
import os
import shutil
import zlib
from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray.data as rd

from pdfredact_ray.functions.rules import RuleLike, compile_rules
from pdfredact_ray.pipelines.redact import (
    DEFAULT_BATCH_SIZE,
    DEFAULT_CONCURRENCY,
    read_turns,
    redact_pipeline,
)

LINEAGE_DIR = "_lineage"
DEFAULT_N_BUCKETS = 64


def bucket_of(conv_ids: Sequence[str], n_buckets: int) -> np.ndarray:
    """crc32(conv_id) % n_buckets, hashed once per UNIQUE conv id: turns of a
    conversation cluster inside blocks (~20x repetition), so np.unique cuts
    the Python-level crc32 calls by that factor."""
    arr = np.asarray(conv_ids, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    ub = np.array(
        [zlib.crc32(c.encode()) % n_buckets for c in uniq], dtype=np.int32
    )
    return ub[inv]


def _manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, LINEAGE_DIR, f"bucket-{bucket:05d}.json")


def completed_buckets(out_dir: str, input_path: str, ruleset_hash: str) -> List[int]:
    """Buckets whose manifest matches the current job identity."""
    ldir = os.path.join(out_dir, LINEAGE_DIR)
    if not os.path.isdir(ldir):
        return []
    done = []
    for name in sorted(os.listdir(ldir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(ldir, name)) as f:
            m = json.load(f)
        if m["ruleset_hash"] != ruleset_hash:
            raise RuntimeError(
                f"resume refused: bucket manifest {name} was written with "
                f"ruleset {m['ruleset_hash']}, current ruleset is {ruleset_hash} "
                "— outputs must not mix rule versions"
            )
        if m["input_path"] == input_path:
            done.append(m["bucket"])
    return done


def _clean_incomplete(out_dir: str, done: List[int]) -> None:
    """Delete bucket dirs that have data but no manifest (crashed mid-write)."""
    if not os.path.isdir(out_dir):
        return
    done_set = set(done)
    for name in os.listdir(out_dir):
        if not name.startswith("bucket="):
            continue
        b = int(name.split("=", 1)[1])
        if b not in done_set:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)


def _write_manifests(
    out_dir: str, input_path: str, ruleset_hash: str, buckets: Sequence[int]
) -> None:
    """One manifest per freshly-written bucket, from the parquet on disk.

    Redaction/poisoned counts scan only the int32 ``n_redactions`` column.
    Buckets are processed by a thread pool: a bucket dir holds one file per
    upstream write task, and serial open-read of thousands of small files was
    measured at ~22s for 16M rows where the threaded version takes ~2s
    (pyarrow releases the GIL during reads).
    """
    os.makedirs(os.path.join(out_dir, LINEAGE_DIR), exist_ok=True)

    def account(b: int) -> None:
        bdir = os.path.join(out_dir, f"bucket={b}")
        if not os.path.isdir(bdir):
            # bucket had zero rows this run; record it so resume skips it
            n_rows, n_red, n_poisoned = 0, 0, 0
        else:
            dset = pads.dataset(bdir, format="parquet")
            tbl = dset.to_table(columns=["n_redactions"])
            col = tbl.column("n_redactions")
            n_rows = tbl.num_rows
            n_poisoned = pc.sum(pc.cast(pc.equal(col, -1), pa.int64())).as_py() or 0
            n_red = (
                pc.sum(
                    pc.if_else(pc.equal(col, -1), pa.scalar(0, pa.int32()), col)
                ).as_py()
                or 0
            )
        tmp = _manifest_path(out_dir, b) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "bucket": b,
                    "input_path": input_path,
                    "ruleset_hash": ruleset_hash,
                    "n_rows": n_rows,
                    "n_redactions": n_red,
                    "n_poisoned": n_poisoned,
                },
                f,
            )
        os.replace(tmp, _manifest_path(out_dir, b))

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(32, max(4, len(buckets)))) as ex:
        list(ex.map(account, buckets))


def redact_job(
    input_path: str,
    rules: Sequence[RuleLike],
    out_dir: str,
    *,
    n_buckets: int = DEFAULT_N_BUCKETS,
    strict: bool = False,
    resume: bool = True,
    concurrency=DEFAULT_CONCURRENCY,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> dict:
    """Resumable fused redaction: read → detect+mask → bucket → partitioned
    parquet + lineage manifests. Returns the job metrics summary.

    Note the job does NOT globally sort: within a bucket directory rows are
    in arrival order, and stable (conv_id, turn_idx) ordering is restored at
    READ time per bucket (cheap: a bucket is a small fraction of the data).
    This avoids an extra all-to-all sort on 10^12 rows — the bucket write is
    already the shuffle.
    """
    ruleset_hash = compile_rules(rules).content_hash()
    done = completed_buckets(out_dir, input_path, ruleset_hash) if resume else []
    if not resume and os.path.isdir(out_dir):
        shutil.rmtree(out_dir, ignore_errors=True)
    _clean_incomplete(out_dir, done)
    todo = sorted(set(range(n_buckets)) - set(done))
    if not todo:
        return job_metrics(out_dir)

    done_set = set(done)

    ds = redact_pipeline(
        read_turns(input_path),
        list(rules),
        concurrency=concurrency,
        batch_size=batch_size,
        strict=strict,
        emit_spans=False,  # ordered-sink shape: spans are the plan's job
    )

    def add_bucket_and_filter(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch.column("conv_id").to_pylist(), n_buckets)
        batch = batch.append_column("bucket", pa.array(b, pa.int32()))
        if not done_set:
            return batch
        keep = np.array([x not in done_set for x in b])
        return batch.filter(pa.array(keep))

    out = ds.map_batches(add_bucket_and_filter, batch_format="pyarrow")
    out.write_parquet(out_dir, partition_cols=["bucket"])
    _write_manifests(out_dir, input_path, ruleset_hash, todo)
    return job_metrics(out_dir)


def job_metrics(out_dir: str) -> dict:
    """Aggregate the per-bucket lineage records (the metrics sink)."""
    ldir = os.path.join(out_dir, LINEAGE_DIR)
    manifests = []
    if os.path.isdir(ldir):
        for name in sorted(os.listdir(ldir)):
            if name.endswith(".json"):
                with open(os.path.join(ldir, name)) as f:
                    manifests.append(json.load(f))
    return {
        "n_buckets_done": len(manifests),
        "n_rows": sum(m["n_rows"] for m in manifests),
        "n_redactions": sum(m["n_redactions"] for m in manifests),
        "n_poisoned": sum(m["n_poisoned"] for m in manifests),
    }


def read_bucket_ordered(out_dir: str, bucket: int) -> pa.Table:
    """Read one output bucket with stable (conv_id, turn_idx) ordering —
    the per-bucket order-restore that replaces a global sort."""
    tbl = pads.dataset(os.path.join(out_dir, f"bucket={bucket}"), format="parquet").to_table()
    return tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
