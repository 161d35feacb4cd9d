"""Benchmark harness — prints ONE JSON line.

Normal mode: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print
{"metric": ..., "value": <headline sec>, "unit": "sec",
 "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
 "turns": N, "turns_per_sec": N}.

--scaling: run the headline redaction job twice in FRESH processes
(num_cpus=8 then num_cpus=32) on the same input and print both throughputs
plus the scaling efficiency (sandbox stand-in for the N vs 4N node
criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_dir() -> str:
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _num_cpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base[2:]) if base.startswith("sf") else 0.1
    except ValueError:
        return 0.1


def _consume(ds) -> int:
    """Force full execution of a lazy Dataset; return its row count.

    materialize() executes the whole pipeline distributed and leaves blocks
    in the object store — unlike iter_batches, which adds a single-threaded
    driver-side fetch (~2s on 100k rows) that isn't part of the pipeline."""
    return ds.materialize().count()


def run_suite(sf_dir: str, num_cpus: int, headline_only: bool = False) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )

    from pdfredact_ray.functions.rules import default_rules
    from pdfredact_ray.pipelines import corpus as C
    from pdfredact_ray.pipelines.redact import (
        apply_pipeline,
        order_restore,
        plan_pipeline,
        read_turns,
        redact_pipeline,
    )
    from pdfredact_ray.sources.turns import ensure_turns

    turns_path = ensure_turns(sf_dir)  # cached; generation excluded from timing
    rules = default_rules()
    out_dir = f"/tmp/pdfredact_bench_out/{os.path.basename(os.path.normpath(sf_dir))}"

    timings: dict[str, float] = {}
    n_turns = 0

    def timed(name: str, fn):
        nonlocal n_turns
        t0 = time.perf_counter()
        res = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return res

    # headline: fused detect+merge+mask, order-restore shuffle, parquet sink
    def headline():
        ds = order_restore(redact_pipeline(read_turns(turns_path), rules))
        ds = ds.map_batches(lambda t: t.drop_columns(["spans"]), batch_format="pyarrow")
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        ds.write_parquet(out_dir)
        import pyarrow.dataset as pads

        return pads.dataset(out_dir).count_rows()

    n_turns = timed("redact_sorted_write", headline)

    if not headline_only:
        timed(
            "redact_fused",
            lambda: _consume(redact_pipeline(read_turns(turns_path), rules)),
        )
        timed(
            "plan_detect",
            lambda: _consume(plan_pipeline(read_turns(turns_path), rules)),
        )

        def apply_flow():
            plan = plan_pipeline(read_turns(turns_path), rules).materialize()
            return _consume(apply_pipeline(read_turns(turns_path), plan))

        timed("plan_then_apply", apply_flow)
        timed("dedup_exact", lambda: _consume(C.dedup_exact(sf_dir)))
        timed("minhash_pairs", lambda: C.minhash_near_dup_pairs(sf_dir).num_rows)
        timed("ann_bruteforce", lambda: _consume(C.ann_topk_bruteforce(sf_dir)))
        timed("doc_quality", lambda: _consume(C.doc_quality(sf_dir)))
        timed("events_window", lambda: _consume(C.events_tumbling_window(sf_dir)))
        timed("lineitem_agg", lambda: _consume(C.lineitem_agg(sf_dir)))

    headline_sec = timings["redact_sorted_write"]
    return {
        "metric": "end-to-end redaction (detect+merge+mask+order-restore+parquet sink) wall sec",
        "value": headline_sec,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / headline_sec, 1) if headline_sec else None,
    }


def run_scaling(sf_dir: str) -> dict:
    """Same headline job at two parallelism levels in fresh processes."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    thr8 = results[8]["turns_per_sec"]
    thr32 = results[32]["turns_per_sec"]
    eff = (thr32 / thr8) / (32 / 8)
    return {
        "metric": "scaling efficiency, num_cpus=8 vs 32 (stand-in for N vs 4N nodes)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "queries": {
            "turns_per_sec_cpus8": thr8,
            "turns_per_sec_cpus32": thr32,
            "sec_cpus8": results[8]["value"],
            "sec_cpus32": results[32]["value"],
        },
        "sf": _sf_of(sf_dir),
        "num_cpus": 32,
        "turns": results[32]["turns"],
    }


def main() -> None:
    sf_dir = _sf_dir()
    if "--scaling" in sys.argv:
        result = run_scaling(sf_dir)
    else:
        result = run_suite(sf_dir, _num_cpus(), headline_only="--headline-only" in sys.argv)
        import ray

        ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
