"""CLI — the engine's analog of the reference's three verbs
(/root/reference/src/PdfRedact.CLI/Commands/{Plan,Apply,Redact}Command.cs,
wired in Program.cs:4-11), plus ``job`` (resumable lineage-tracked run) and
``synth`` (corpus generation). Owns its own Ray session (the only places
allowed to: CLI, bench, test fixture).

    python -m pdfredact_ray.cli plan   --input turns.parquet --out plan_dir -p '\\d{3}-\\d{2}-\\d{4}' --regex
    python -m pdfredact_ray.cli apply  --input turns.parquet --plan plan_dir --out red_dir
    python -m pdfredact_ray.cli redact --input turns.parquet --out red_dir -p CONFIDENTIAL [--save-plan plan_dir]
    python -m pdfredact_ray.cli job    --input turns.parquet --out red_dir -p CONFIDENTIAL --buckets 64
    python -m pdfredact_ray.cli synth  --sf sf0.01

Mirrored CLI semantics: conflicting --fragment-aware/--no-fragment-aware
exits 1 (PlanCommand.cs:133-137); a plan with 0 regions still produces
full copy-through output (ApplyCommand.cs:65-69); per-conversation summary
printed like the per-page summary (PlanCommand.cs:174-183).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional


def _build_rules(args) -> List[dict]:
    if args.rules_file:
        with open(args.rules_file) as f:
            return json.load(f)
    fragment: Optional[bool] = None
    if getattr(args, "fragment_aware", False) and getattr(args, "no_fragment_aware", False):
        print("error: --fragment-aware and --no-fragment-aware are mutually exclusive", file=sys.stderr)
        raise SystemExit(1)
    if getattr(args, "fragment_aware", False):
        fragment = True
    elif getattr(args, "no_fragment_aware", False):
        fragment = False
    cs = getattr(args, "case_sensitive", None)
    if cs == "true" and args.ignore_case:
        print("error: --ignore-case conflicts with --case-sensitive true", file=sys.stderr)
        raise SystemExit(1)
    case_sensitive = cs != "false" and not args.ignore_case
    return [
        {
            "pattern": p,
            "is_regex": args.regex,
            "case_sensitive": case_sensitive,
            "fragment_aware": fragment,
        }
        for p in (args.pattern or [])
    ]


def _init_ray(num_cpus: Optional[int]) -> bool:
    """Start a local Ray session if none exists; True iff WE started it (the
    caller only shuts down a session it owns — in-process callers like the
    pytest session fixture keep theirs)."""
    import ray

    if ray.is_initialized():
        return False
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    return True


def _add_common(p: argparse.ArgumentParser, need_rules: bool = True) -> None:
    # short spellings mirror the reference CLI (README.md:91-97: -i/-o/-p/-r/-c)
    p.add_argument("-i", "--input", required=True, help="turns parquet path or dir")
    p.add_argument("--num-cpus", type=int, default=None)
    if need_rules:
        p.add_argument("-p", "--pattern", action="append", help="rule pattern (repeatable)")
        p.add_argument("-r", "--regex", action="store_true", help="patterns are regexes")
        p.add_argument("--ignore-case", action="store_true")
        p.add_argument(
            "-c",
            "--case-sensitive",
            nargs="?",
            const="true",
            choices=["true", "false"],
            default=None,
            help="case-sensitive matching (default: true; reference spelling)",
        )
        p.add_argument("--fragment-aware", action="store_true")
        p.add_argument("--no-fragment-aware", action="store_true")
        p.add_argument("--rules-file", help="JSON list of rule dicts (overrides -p)")


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="pdfredact-ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_plan = sub.add_parser("plan", help="detect only -> plan parquet")
    _add_common(p_plan)
    p_plan.add_argument("-o", "--out", "--output", required=True)

    p_apply = sub.add_parser("apply", help="plan + turns -> redacted parquet")
    p_apply.add_argument(
        "-i",
        "--input",
        help="turns parquet path or dir; defaults to the plan's recorded "
        "source (the plan self-binds like the reference's sourcePdfPath)",
    )
    p_apply.add_argument("--num-cpus", type=int, default=None)
    p_apply.add_argument("--plan", required=True)
    p_apply.add_argument("-o", "--out", "--output", required=True)

    p_red = sub.add_parser("redact", help="fused detect+mask -> redacted parquet")
    _add_common(p_red)
    p_red.add_argument("-o", "--out", "--output", required=True)
    p_red.add_argument("--save-plan", help="also write the plan table here")

    p_job = sub.add_parser("job", help="resumable lineage-tracked redaction")
    _add_common(p_job)
    p_job.add_argument("-o", "--out", "--output", required=True)
    p_job.add_argument("--buckets", type=int, default=64)
    p_job.add_argument("--no-resume", action="store_true")
    p_job.add_argument("--strict", action="store_true")

    p_flat = sub.add_parser(
        "flatten",
        help="redact + rasterize turns to bitmap images (no text layer) "
        "-> parquet of BMP payloads (the reference's planned flatten mode)",
    )
    _add_common(p_flat)
    p_flat.add_argument("-o", "--out", "--output", required=True)
    p_flat.add_argument("--wrap", type=int, default=64, help="chars per rendered line")
    p_flat.add_argument(
        "--format", dest="img_format", default="bmp1", choices=["bmp1", "bmp24"],
        help="raster format (reference plans PNG/JPEG; this container has no "
        "codec libs, so the real formats are the two BMP flavors)",
    )
    p_flat.add_argument(
        "--quality", type=int, default=None,
        help="JPEG quality (reference-planned flag; not implementable here)",
    )

    p_synth = sub.add_parser("synth", help="generate the synthetic turns corpus")
    p_synth.add_argument("--sf", default="sf0.01")
    p_synth.add_argument("--n-turns", type=int, default=None)

    args = ap.parse_args(argv)

    if args.cmd == "synth":
        from pdfredact_ray.sources.turns import ensure_turns

        path = ensure_turns(args.sf, n_turns=args.n_turns)
        print(path)
        return 0

    import ray

    owns_session = _init_ray(args.num_cpus)
    try:
        from pdfredact_ray.pipelines.redact import (
            apply_pipeline,
            order_restore,
            plan_pipeline,
            read_turns,
            redact_pipeline,
        )

        if args.cmd == "plan":
            rules = _build_rules(args)
            from pdfredact_ray.functions.rules import compile_rules

            ruleset_hash = compile_rules(rules).content_hash()
            plan = plan_pipeline(read_turns(args.input), rules)
            if args.out.endswith(".json"):
                # camelCase JSON sidecar for tiny human-review plans (U3)
                import pyarrow as pa
                import ray

                from pdfredact_ray.extend import write_plan

                tbl_full = pa.concat_tables(ray.get(plan.materialize().to_arrow_refs()))
                write_plan(
                    tbl_full, args.out,
                    source_path=args.input, ruleset_hash=ruleset_hash,
                )
                tbl = tbl_full.select(["conv_id"])
            else:
                plan.write_parquet(args.out)
                import pyarrow as pa
                import pyarrow.dataset as pads

                from pdfredact_ray.extend import write_plan_dir_meta

                # plan self-binding (RedactionPlan.SourcePdfPath analog)
                write_plan_dir_meta(args.out, args.input, ruleset_hash)
                dset = pads.dataset(args.out, format="parquet")
                # a zero-region plan dir holds only the meta sidecar
                tbl = (
                    dset.to_table(columns=["conv_id"])
                    if "conv_id" in dset.schema.names
                    else pa.table({"conv_id": pa.array([], pa.string())})
                )
            n = tbl.num_rows
            print(f"Found {n} region(s) to redact")
            import pyarrow.compute as pc

            for conv, cnt in sorted(
                zip(*(c.to_pylist() for c in pc.value_counts(tbl.column("conv_id")).flatten()))
            )[:20]:
                print(f"  {conv}: {cnt} redaction(s)")
            return 0

        if args.cmd == "apply":
            import ray.data as rd

            from pdfredact_ray.extend import read_plan_meta

            meta = read_plan_meta(args.plan)
            input_path = args.input or meta.get("source_path")
            if input_path is None:
                print(
                    "error: --input not given and the plan records no source "
                    "(pre-self-binding artifact)",
                    file=sys.stderr,
                )
                return 1
            if args.input and meta.get("source_path") and args.input != meta["source_path"]:
                print(
                    f"warning: --input {args.input!r} differs from the plan's "
                    f"recorded source {meta['source_path']!r}; using --input",
                    file=sys.stderr,
                )
            if args.plan.endswith(".json"):
                from pdfredact_ray.extend import read_plan

                plan_ds = rd.from_arrow(read_plan(args.plan))
            else:
                import pyarrow as pa
                import pyarrow.dataset as pads

                from pdfredact_ray.schema import PLAN

                if "conv_id" in pads.dataset(args.plan, format="parquet").schema.names:
                    plan_ds = rd.read_parquet(args.plan)
                else:
                    # zero-region plan (meta sidecar only): full copy-through,
                    # reference semantics (ApplyCommand.cs:65-69)
                    plan_ds = rd.from_arrow(PLAN.empty_table())
            out = apply_pipeline(read_turns(input_path), plan_ds)
            order_restore(out.drop_columns(["spans"])).write_parquet(args.out)
            print(f"Applied plan -> {args.out}")
            return 0

        if args.cmd == "redact":
            rules = _build_rules(args)
            if args.save_plan:
                plan_pipeline(read_turns(args.input), rules).write_parquet(args.save_plan)
                print(f"Plan saved -> {args.save_plan}")
            out = redact_pipeline(read_turns(args.input), rules, emit_spans=False)
            order_restore(out).write_parquet(args.out)
            print(f"Redacted -> {args.out}")
            return 0

        if args.cmd == "flatten":
            if args.quality is not None:
                print(
                    "error: --quality requires a JPEG encoder, which this "
                    "environment does not ship (reference-planned flag)",
                    file=sys.stderr,
                )
                return 1
            from pdfredact_ray.pipelines.redact import flatten_pipeline

            out = flatten_pipeline(
                read_turns(args.input), _build_rules(args),
                wrap=args.wrap, fmt=args.img_format,
            )
            order_restore(out).write_parquet(args.out)
            print(f"Flattened (text layer removed) -> {args.out}")
            return 0

        if args.cmd == "job":
            from pdfredact_ray.state.lineage import redact_job

            metrics = redact_job(
                args.input,
                _build_rules(args),
                args.out,
                n_buckets=args.buckets,
                strict=args.strict,
                resume=not args.no_resume,
            )
            print(json.dumps(metrics))
            return 0
        return 2
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
