"""Command-line interface.

Two surfaces:

* ``python -m soda_core_spark.cli contract verify -c contract.yml
  [-ds dataset=path.parquet ...]`` — contract verification, mirroring the
  reference's primary entry point (soda-core cli/cli.py:120-307, handler
  cli/handlers/contract.py) with the same exit-code contract
  (cli/exit_codes.py): 0 all passed, 1 check failures, 2 warnings only,
  3 execution/parse errors.
* the original flat form (``--input ... --output ...``) — the
  spark-submit quality-filter pipeline entry point:

      spark-submit --py-files soda_core_spark.zip cli.py \\
          --input /path/webpages --output /path/out \\
          --lineage /path/lineage --state /path/state --buckets 64
"""

from __future__ import annotations

import argparse
import enum
import json
import sys


class ExitCode(enum.IntEnum):
    """Reference cli/exit_codes.py (Cloud-specific code 4 has no Spark
    analogue — there is no Soda Cloud here)."""

    OK = 0
    CHECK_FAILURES = 1
    CHECK_WARNINGS = 2
    LOG_ERRORS = 3


def build_session(app_name: str = "soda_core_spark", cpus: str | None = None):
    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName(app_name)
    if cpus:  # local mode; on a cluster spark-submit supplies the master
        builder = builder.master(f"local[{cpus}]")
        builder = builder.config("spark.sql.shuffle.partitions", str(cpus))
        builder = builder.config("spark.driver.memory", "90g")
    spark = (
        builder.config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # TIMESTAMP_MICROS (not Spark's legacy INT96 default): INT96
        # columns carry NO footer min/max statistics, which silently
        # disables the metadata-only freshness fast path on tables this
        # engine writes; micros is also the modern cross-engine format
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark


# ---------------------------------------------------------------------------
# contract verify
# ---------------------------------------------------------------------------


def _parse_variables(pairs: list[str] | None) -> dict[str, str] | None:
    """--set KEY=VALUE list → dict; None on malformed input (reference
    cli.py:306-320 prints the error and exits LOG_ERRORS)."""
    out: dict[str, str] = {}
    for pair in pairs or []:
        if "=" not in pair:
            print(
                f"Variable {pair} is incorrectly formatted. "
                "Please use the format KEY=VALUE",
                file=sys.stderr,
            )
            return None
        k, v = pair.split("=", 1)
        out[k.strip()] = v.strip()
    return out


def contract_verify_main(args: argparse.Namespace) -> int:
    from soda_core_spark.operators.engine import verify_contracts
    from soda_core_spark.plans.model import contract_from_yaml_file
    from soda_core_spark.plans.results import CheckOutcome
    from soda_core_spark.plans.selectors import CheckSelector, CheckSelectorParseError

    if not args.contract:
        print("at least one -c/--contract file is required", file=sys.stderr)
        return ExitCode.LOG_ERRORS

    variables = _parse_variables(args.set)
    if variables is None:
        return ExitCode.LOG_ERRORS

    try:
        selectors = CheckSelector.parse_all(args.check_filter)
        # --check-path values become check_path= selectors, the wire form
        # the reference converts --check-paths into
        # (check_selector.py:84-88 from_check_paths)
        selectors += CheckSelector.parse_all(
            [f"check_path={p}" for p in (args.check_path or [])]
        )
    except CheckSelectorParseError as e:
        print(str(e), file=sys.stderr)
        return ExitCode.LOG_ERRORS

    data_timestamp = None
    if args.data_timestamp:
        from datetime import datetime

        try:
            data_timestamp = datetime.fromisoformat(args.data_timestamp)
        except ValueError as e:
            print(f"invalid --data-timestamp: {e}", file=sys.stderr)
            return ExitCode.LOG_ERRORS

    try:
        contracts = [
            contract_from_yaml_file(p, variables=variables, data_timestamp=data_timestamp)
            for p in args.contract
        ]
    except Exception as e:
        # OSError / ContractParseError / yaml.YAMLError / malformed
        # sample: blocks — ANY load failure is a parse-stage error and
        # must honour the exit-code contract (3), never a traceback
        print(f"cannot load contract: {type(e).__name__}: {e}", file=sys.stderr)
        return ExitCode.LOG_ERRORS

    try:
        from soda_core_spark.sources.session import get_session

        spark = get_session(
            use_active=args.use_active_session,
            remote=args.remote,
            token=args.token,
            cluster_id=args.cluster_id,
            local_cpus=args.local_cpus,
        )
    except Exception as e:
        print(f"cannot build Spark session: {e}", file=sys.stderr)
        return ExitCode.LOG_ERRORS
    datasets = {}
    dataset_paths = {}
    for spec in args.dataset or []:
        if "=" not in spec:
            print(
                f"dataset binding {spec!r} must be NAME=PARQUET_PATH",
                file=sys.stderr,
            )
            return ExitCode.LOG_ERRORS
        name, path = spec.split("=", 1)
        dataset_paths[name.strip()] = path.strip()
        try:
            datasets[name.strip()] = spark.read.parquet(path.strip())
        except Exception as e:
            print(f"cannot read dataset {name.strip()!r}: {e}", file=sys.stderr)
            return ExitCode.LOG_ERRORS

    if getattr(args, "metadata_only", False):
        # footer-statistics fast path: no data scan, no executors — checks
        # the footers cannot express come back NOT_EVALUATED/unavailable
        # (expected in this mode, never exit 3)
        from soda_core_spark.sources.metadata_checks import (
            verify_contract_metadata_only,
        )

        any_failed = any_warned = False
        for contract in contracts:
            p = dataset_paths.get(contract.dataset)
            if p is None:
                print(
                    f"--metadata-only needs -ds {contract.dataset}=PATH",
                    file=sys.stderr,
                )
                return ExitCode.LOG_ERRORS
            try:
                res = verify_contract_metadata_only(
                    spark, contract, p, data_timestamp=data_timestamp
                )
            except Exception as e:
                print(f"metadata verify failed: {e}", file=sys.stderr)
                return ExitCode.LOG_ERRORS
            print(res.summary())
            any_failed |= res.status == "failed"
            any_warned |= res.status == "warned"
        if any_failed:
            return ExitCode.CHECK_FAILURES
        if any_warned:
            return ExitCode.CHECK_WARNINGS
        return ExitCode.OK

    session = verify_contracts(
        spark,
        contracts,
        datasets=datasets,
        data_timestamp=data_timestamp,
        check_selectors=selectors,
    )
    print(session.summary())
    if args.verbose:
        for res in session.results:
            for m in res.measurements:
                print(f"  measurement {m.metric_id} = {m.value}")

    if args.metrics_out:
        # diagnostics-warehouse analogue (reference -dw flag, cli.py:236-243):
        # append every contract's check results (+ measurements) to parquet
        # metrics tables
        from soda_core_spark.sources.sinks import write_scan_results

        try:
            for res in session.results:
                write_scan_results(
                    spark,
                    res,
                    check_results_path=f"{args.metrics_out}/check_metrics",
                    measurements_path=f"{args.metrics_out}/measurements",
                    scan_ts=data_timestamp,
                )
        except Exception as e:
            print(f"cannot write metrics tables: {e}", file=sys.stderr)
            return ExitCode.LOG_ERRORS

    if session.errors:
        return ExitCode.LOG_ERRORS
    all_results = [r for res in session.results for r in res.check_results]
    outcomes = {r.outcome for r in all_results}
    # a NOT_EVALUATED check normally means an engine/SQL error occurred —
    # the reference surfaces those as log errors → exit 3. A check whose
    # metric is *legitimately* unavailable (NULL rows_tested denominator,
    # valid per reference failed_rows_check.py:133-140) is NOT an error.
    if any(
        r.outcome == CheckOutcome.NOT_EVALUATED and not r.metric_unavailable
        for r in all_results
    ):
        return ExitCode.LOG_ERRORS
    if CheckOutcome.FAILED in outcomes:
        return ExitCode.CHECK_FAILURES
    if CheckOutcome.WARNED in outcomes:
        return ExitCode.CHECK_WARNINGS
    return ExitCode.OK


def contract_test_main(args: argparse.Namespace) -> int:
    """Parse-only contract validation (reference `soda contract test`,
    cli.py:380-392 / handlers/contract.py:128-137): exit 0 when every
    file parses, 3 on the first parse error. No Spark session is built —
    syntax checking must be instant and offline."""
    from soda_core_spark.plans.model import contract_from_yaml_file

    if not args.contract:
        print("at least one -c/--contract file is required", file=sys.stderr)
        return ExitCode.LOG_ERRORS
    variables = _parse_variables(args.set)
    if variables is None:
        return ExitCode.LOG_ERRORS
    for path in args.contract:
        try:
            contract_from_yaml_file(path, variables=variables)
        except Exception as e:
            print(f"{path} is INVALID: {type(e).__name__}: {e}", file=sys.stderr)
            return ExitCode.LOG_ERRORS
        print(f"{path} is valid")
    return ExitCode.OK


def _contract_main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="soda_core_spark.cli contract")
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("test", help="Test contract syntax without executing it")
    t.add_argument("-c", "--contract", action="append", help="Contract YAML file path")
    t.add_argument("--set", action="append", help="Contract variable: KEY=VALUE")
    t.set_defaults(_handler=contract_test_main)

    v = sub.add_parser("verify", help="Verify one or more contracts")
    v.add_argument("-c", "--contract", action="append", help="Contract YAML file path")
    v.add_argument(
        "-ds",
        "--dataset",
        action="append",
        help="Bind a dataset name to a parquet path: NAME=PATH "
        "(unbound contract datasets resolve via spark.table)",
    )
    v.add_argument("--set", action="append", help="Contract variable: KEY=VALUE")
    v.add_argument(
        "-cf",
        "--check-filter",
        action="append",
        help="Run only matching checks: field=glob "
        "(type/name/column/path/check_path/contract_path/qualifier/attributes.<key>; "
        "AND across fields, OR within a field)",
    )
    v.add_argument(
        "-cp",
        "--check-path",
        action="append",
        help="Run only checks at this position path, e.g. "
        "columns.email.checks.missing (reference --check-paths; glob ok)",
    )
    v.add_argument(
        "-v", "--verbose", action="store_true",
        help="Also print every measurement (metric id = value)",
    )
    v.add_argument("--data-timestamp", default=None, help="ISO timestamp for freshness/NOW")
    v.add_argument("--local-cpus", default=None, help="run local[N] instead of cluster master")
    v.add_argument(
        "--remote",
        default=None,
        help="Spark Connect target: full sc:// URI, or bare host combined "
        "with --token/--cluster-id (reference sparkdf remote session mode)",
    )
    v.add_argument("--token", default=None, help="bearer token for --remote")
    v.add_argument("--cluster-id", default=None, help="cluster id for --remote")
    v.add_argument(
        "--use-active-session",
        action="store_true",
        help="reuse the thread-local active SparkSession instead of building one",
    )
    v.add_argument(
        "-dw",
        "--metrics-out",
        default=None,
        help="append check results + measurements to parquet metrics tables "
        "under this directory (diagnostics-warehouse analogue)",
    )
    v.add_argument(
        "--metadata-only",
        action="store_true",
        help="evaluate only footer-statistics-expressible checks "
        "(row_count, NULL missing, bounds-proven invalid) from parquet "
        "metadata — no data scan; other checks report NOT_EVALUATED",
    )
    v.set_defaults(_handler=contract_verify_main)
    args = p.parse_args(argv)
    return args._handler(args)


# ---------------------------------------------------------------------------
# data-source test (connection smoke test)
# ---------------------------------------------------------------------------


def _session_from_args(args: argparse.Namespace):
    """Shared session-mode resolution for the data-source subcommands:
    returns (spark, None) or (None, exit_code)."""
    from soda_core_spark.sources.session import get_session

    try:
        return (
            get_session(
                use_active=args.use_active_session,
                remote=args.remote,
                token=args.token,
                cluster_id=args.cluster_id,
                local_cpus=args.local_cpus or ("2" if not args.remote else None),
            ),
            None,
        )
    except Exception as e:
        print(f"could not build SparkSession: {type(e).__name__}: {e}", file=sys.stderr)
        return None, ExitCode.LOG_ERRORS


def data_source_test_main(args: argparse.Namespace) -> int:
    """Connection smoke test (reference ``soda data-source test``,
    cli/cli.py:487-513 → handlers/data_source.py:57-93): build the
    session per the configured mode, run a trivial query, probe each
    ``-ds`` binding readable, exit 0 on success / 3 on the first
    failure. The first thing an operator runs in a new environment."""
    spark, err = _session_from_args(args)
    if err is not None:
        return err
    try:
        spark.sql("SELECT 1").first()
    except Exception as e:
        print(f"session is not usable: {type(e).__name__}: {e}", file=sys.stderr)
        return ExitCode.LOG_ERRORS
    print("session ok")

    for spec in args.dataset or []:
        if "=" in spec:
            name, path = (s.strip() for s in spec.split("=", 1))
            reader = lambda: spark.read.parquet(path)  # noqa: E731
            target = f"{name} ({path})"
        else:
            name = spec.strip()
            reader = lambda: spark.table(name)  # noqa: E731
            target = f"{name} (catalog table)"
        try:
            df = reader()
            n_cols = len(df.schema.fields)
            df.limit(1).count()  # actually touch the data, not just metadata
        except Exception as e:
            print(f"dataset {target} NOT readable: {type(e).__name__}: {e}",
                  file=sys.stderr)
            return ExitCode.LOG_ERRORS
        print(f"dataset {target} ok: {n_cols} columns")
    print("Success! Connection tested ok.")
    return ExitCode.OK


def data_source_profile_main(args: argparse.Namespace) -> int:
    """Distribution profile of one dataset: numeric histograms for
    ``--column`` and hottest-key skew tables for ``--key``
    (operators/profiling.py) — the distribution extension of the
    reference's single-number dataset metrics (its `data-source
    discover` lists datasets; this looks inside one). Output is plain
    text; exit 0 on success, 3 on any failure."""
    from pyspark.sql import functions as F

    from soda_core_spark.operators.profiling import (
        key_skew_stats,
        numeric_histogram,
    )

    if not args.column and not args.key:
        print("nothing to profile: pass --column and/or --key", file=sys.stderr)
        return ExitCode.LOG_ERRORS
    spark, err = _session_from_args(args)
    if err is not None:
        return err
    spec = args.dataset
    try:
        if "=" in spec:
            name, path = (s.strip() for s in spec.split("=", 1))
            df = spark.read.parquet(path)
        else:
            name = spec.strip()
            df = spark.table(name)
    except Exception as e:
        print(f"dataset {spec} NOT readable: {type(e).__name__}: {e}",
              file=sys.stderr)
        return ExitCode.LOG_ERRORS
    try:
        for col in args.column or []:
            print(f"# histogram {name}.{col} ({args.bins} bins)")
            rows = numeric_histogram(df, F.col(col), args.bins).orderBy(
                "bin"
            ).collect()
            total = sum(r["n_rows"] for r in rows) or 1
            for r in rows:
                bar = "#" * round(40 * r["n_rows"] / total)
                print(
                    f"  [{r['lo']:>14.6g}, {r['hi']:>14.6g}) "
                    f"{r['n_rows']:>10} {bar}"
                )
        for key in args.key or []:
            print(f"# key skew {name}.{key} (top {args.top_k})")
            for r in key_skew_stats(df, key, args.top_k).orderBy(
                "rank"
            ).collect():
                print(
                    f"  {r['rank']:>3}. {r[key]!r:<30} n={r['n_rows']:<10}"
                    f" share={r['share']:<9} skew_x={r['skew_x']}"
                )
    except Exception as e:
        print(f"profile failed: {type(e).__name__}: {e}", file=sys.stderr)
        return ExitCode.LOG_ERRORS
    return ExitCode.OK


def data_source_metrics_main(args: argparse.Namespace) -> int:
    """Check-metric history from the local results sink (the engine's
    self-hosted twin of the reference's Cloud metric monitoring): latest
    runs per check identity, optionally filtered, with the same z-score
    the ``metric_anomaly`` check computes so drift is visible from the
    terminal before any contract encodes a band. Exit 0 on success, 3 on
    any failure."""
    from pyspark.sql import functions as F

    spark, err = _session_from_args(args)
    if err is not None:
        return err
    try:
        from soda_core_spark.operators.history import metric_history

        h = metric_history(
            spark, args.warehouse, identity=args.identity,
            dataset=args.dataset_name,
        )
        idents = [
            r["identity"]
            for r in h.select("identity").distinct().orderBy("identity").collect()
        ]
        for ident in idents:
            rows = (
                h.where(F.col("identity") == ident)
                .orderBy(F.col("scan_ts").desc())
                .limit(args.last)
                .collect()
            )
            head = rows[0]
            print(
                f"# {ident} {head['dataset']}.{head['column'] or '-'} "
                f"{head['check_type']} — last {len(rows)} run(s)"
            )
            vals = [
                float(r["metric_value"])
                for r in rows
                if r["metric_value"] is not None
            ]
            mean = sum(vals) / len(vals) if vals else None
            sd = (
                (sum((v - mean) ** 2 for v in vals) / len(vals)) ** 0.5
                if vals
                else None
            )
            for r in rows:
                v = r["metric_value"]
                z = ""
                if (
                    v is not None
                    and sd is not None
                    and sd > 0
                    and len(vals) >= 3
                ):
                    z = f" z={abs(float(v) - mean) / sd:.2f}"
                print(
                    f"  {r['scan_ts']} {r['outcome']:<13} "
                    f"value={v if v is not None else '-'}{z}"
                )
        if not idents:
            print("no matching history rows")
    except Exception as e:
        print(f"metrics read failed: {type(e).__name__}: {e}", file=sys.stderr)
        return ExitCode.LOG_ERRORS
    return ExitCode.OK


_DATA_SOURCE_TEMPLATE = """\
# soda_core_spark data-source configuration (Spark session modes —
# sources/session.py; pick exactly one mode)
type: spark
name: spark_ds
session:
  # mode 1: new local session
  local_cpus: 8
  # mode 2: Spark Connect (uncomment; secrets via env expansion)
  # remote: sc://your-host:443
  # token: ${SPARK_CONNECT_TOKEN}
  # cluster_id: your-cluster-id
  # mode 3: reuse the thread-local active session
  # use_active_session: true
"""



def data_source_audit_main(args: argparse.Namespace) -> int:
    """Driver-side parquet integrity audit (sources/tables.py
    corrupt_file_audit): footer validation only, no Spark session — safe
    to run against any corpus size before launching the real job. Exit
    0 = clean, 1 = corrupt files found, 3 = audit could not run."""
    from soda_core_spark.sources.tables import corrupt_file_audit

    try:
        name, _, path = args.dataset.partition("=")
        report = corrupt_file_audit(path or name, sample=args.sample)
    except Exception as exc:  # noqa: BLE001 — CLI boundary
        print(json.dumps({"error": str(exc)}))
        return int(ExitCode.LOG_ERRORS)
    print(json.dumps({"dataset": name if path else args.dataset, **report}))
    return int(ExitCode.CHECK_FAILURES) if report["n_corrupt"] else int(
        ExitCode.OK
    )


def data_source_create_main(args: argparse.Namespace) -> int:
    """Write a data-source YAML template (reference `soda data-source
    create`, handlers/data_source.py:22-56: refuses existing files,
    one supported type — there 'postgres', here 'spark')."""
    import os

    path = args.file
    if not path:
        print("-f/--file is required", file=sys.stderr)
        return ExitCode.LOG_ERRORS
    if os.path.exists(path):
        print(f"could not create {path!r}: file already exists", file=sys.stderr)
        return ExitCode.LOG_ERRORS
    if args.type != "spark":
        print(f"only type 'spark' is supported, got {args.type!r}", file=sys.stderr)
        return ExitCode.LOG_ERRORS
    try:
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(path, "w") as fh:
            fh.write(_DATA_SOURCE_TEMPLATE)
    except Exception as e:
        print(f"could not create {path!r}: {e}", file=sys.stderr)
        return ExitCode.LOG_ERRORS
    print(f"Created data source file {path!r}")
    return ExitCode.OK


def _like_to_regex(pattern: str):
    """SQL LIKE → anchored regex: % = any run, _ = any char, everything
    else literal (reference pushes include/exclude down as LIKE filters,
    discovery.py:19-29)."""
    import re as _re

    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return _re.compile("^" + "".join(out) + "$")


#: discovery never surfaces the engine's own temp tables (reference
#: SODA_TEMP_PREFIX filter, discovery.py:31 — filtered in Python because
#: LIKE would read the leading underscores as wildcards)
SODA_TEMP_PREFIX = "__soda_temp"


def data_source_discover_main(args: argparse.Namespace) -> int:
    """List datasets visible to the session as DQNs
    (`data_source/database/table`), with SQL-LIKE include/exclude
    filters — the local path of reference `soda data-source discover`
    (handlers/data_source.py:204-221; DQNs via dataset_identifier.py)."""
    spark, err = _session_from_args(args)
    if err is not None:
        return err
    include = [_like_to_regex(p) for p in (args.include or [])]
    exclude = [_like_to_regex(p) for p in (args.exclude or [])]
    try:
        dbs = (
            [args.database]
            if args.database
            else [d.name for d in spark.catalog.listDatabases()]
        )
        dqns = []
        for db in dbs:
            # tables AND views, like the reference's explicit all-types
            # discovery (discovery.py:24-27)
            for t in spark.catalog.listTables(db):
                name = t.name
                # session-global TEMP views appear under every database in
                # listTables but are not catalog datasets (the reference
                # discovers info-schema tables/views only) — skip them
                if (getattr(t, "tableType", "") or "").upper() == "TEMPORARY":
                    continue
                if name.lower().startswith(SODA_TEMP_PREFIX):
                    continue
                if include and not any(rx.match(name) for rx in include):
                    continue
                if exclude and any(rx.match(name) for rx in exclude):
                    continue
                # every namespace tier joins into the DQN — collapsing
                # catalog.database to the first tier would print ambiguous
                # DQNs that spark.table can't resolve back
                ns = getattr(t, "namespace", None)
                prefix = "/".join(ns) if ns else db
                dqns.append(f"{args.name}/{prefix}/{name}")
    except Exception as e:
        print(f"discovery failed: {type(e).__name__}: {e}", file=sys.stderr)
        return ExitCode.LOG_ERRORS
    for dqn in sorted(dqns):
        print(dqn)
    print(f"Discovered {len(dqns)} datasets")
    return ExitCode.OK


def _data_source_main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="soda_core_spark.cli data-source")
    sub = p.add_subparsers(dest="command", required=True)

    c = sub.add_parser("create", help="Create a data source YAML configuration file")
    c.add_argument("-f", "--file", help="Path of the YAML file to create")
    c.add_argument("-t", "--type", default="spark", help="Data source type (spark)")
    c.set_defaults(_handler=data_source_create_main)

    d = sub.add_parser("discover", help="Discover datasets in the session catalog")
    d.add_argument("--include", action="append",
                   help="Dataset name pattern to include (SQL %% wildcard)")
    d.add_argument("--exclude", action="append",
                   help="Dataset name pattern to exclude (SQL %% wildcard)")
    d.add_argument("--database", default=None,
                   help="Limit discovery to one database (default: all)")
    d.add_argument("--name", default="spark_ds",
                   help="Data-source name used as the DQN prefix")
    d.add_argument("--local-cpus", default=None)
    d.add_argument("--remote", default=None, help="Spark Connect sc:// target")
    d.add_argument("--token", default=None)
    d.add_argument("--cluster-id", default=None)
    d.add_argument("--use-active-session", action="store_true")
    d.set_defaults(_handler=data_source_discover_main)

    pr = sub.add_parser(
        "profile", help="Histogram / key-skew profile of one dataset"
    )
    pr.add_argument(
        "-ds", "--dataset", required=True,
        help="NAME=PARQUET_PATH, or a bare catalog table name",
    )
    pr.add_argument("--column", action="append",
                    help="numeric column to histogram (repeatable)")
    pr.add_argument("--key", action="append",
                    help="key column for skew diagnostics (repeatable)")
    pr.add_argument("--bins", type=int, default=20)
    pr.add_argument("--top-k", type=int, default=10)
    pr.add_argument("--local-cpus", default=None)
    pr.add_argument("--remote", default=None, help="Spark Connect sc:// target")
    pr.add_argument("--token", default=None)
    pr.add_argument("--cluster-id", default=None)
    pr.add_argument("--use-active-session", action="store_true")
    pr.set_defaults(_handler=data_source_profile_main)

    mt = sub.add_parser(
        "metrics", help="Check-metric history from a local results sink"
    )
    mt.add_argument(
        "-dw", "--warehouse", required=True,
        help="check-results sink directory (the contract verify -dw path)",
    )
    mt.add_argument("--identity", default=None, help="one check identity")
    mt.add_argument("--dataset-name", default=None, help="filter by dataset")
    mt.add_argument("--last", type=int, default=10, help="runs per check")
    mt.add_argument("--local-cpus", default=None)
    mt.add_argument("--remote", default=None, help="Spark Connect sc:// target")
    mt.add_argument("--token", default=None)
    mt.add_argument("--cluster-id", default=None)
    mt.add_argument("--use-active-session", action="store_true")
    mt.set_defaults(_handler=data_source_metrics_main)

    au = sub.add_parser(
        "audit", help="Parquet footer integrity audit (no Spark session)"
    )
    au.add_argument(
        "-ds", "--dataset", required=True,
        help="NAME=PARQUET_DIR (or a bare directory path)",
    )
    au.add_argument("--sample", type=int, default=None,
                    help="audit only the first N files")
    au.set_defaults(_handler=data_source_audit_main)

    t = sub.add_parser("test", help="Test the Spark session + dataset bindings")
    t.add_argument(
        "-ds", "--dataset", action="append",
        help="Probe a binding readable: NAME=PARQUET_PATH, or a bare "
        "catalog table name",
    )
    t.add_argument("--local-cpus", default=None, help="run local[N] instead of cluster master")
    t.add_argument("--remote", default=None, help="Spark Connect sc:// target")
    t.add_argument("--token", default=None, help="bearer token for --remote")
    t.add_argument("--cluster-id", default=None, help="cluster id for --remote")
    t.add_argument("--use-active-session", action="store_true",
                   help="reuse the thread-local active SparkSession")
    t.set_defaults(_handler=data_source_test_main)
    args = p.parse_args(argv)
    return args._handler(args)


# ---------------------------------------------------------------------------
# quality-filter pipeline (legacy flat form)
# ---------------------------------------------------------------------------


def _filter_main(argv: list[str] | None) -> int:
    p = argparse.ArgumentParser(description="webtext quality-filter pipeline")
    p.add_argument("--input", required=True, help="input web_pages table path")
    p.add_argument("--output", required=True, help="annotated output path")
    p.add_argument("--lineage", default=None, help="per-host lineage table path")
    p.add_argument("--state", default=None, help="checkpoint state dir (resumable)")
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--salt", action="store_true", help="salted repartition for host-clustered inputs")
    p.add_argument("--local-cpus", default=None, help="run local[N] instead of cluster master")
    args = p.parse_args(argv)

    from soda_core_spark.operators.filter_pipeline import QualityFilterPipeline
    from soda_core_spark.sources.checkpoint import run_resumable

    spark = build_session(cpus=args.local_cpus)
    df = spark.read.parquet(args.input)
    pipeline = QualityFilterPipeline()

    if args.state:
        states = run_resumable(
            pipeline,
            df,
            output_path=args.output,
            state_dir=args.state,
            n_buckets=args.buckets,
            lineage_path=args.lineage,
        )
        summary = {
            "buckets": len(states),
            "n_docs": sum(s.n_docs for s in states),
            "n_kept": sum(s.n_kept for s in states),
        }
    else:
        res = pipeline.run(
            df,
            output_path=args.output,
            lineage_path=args.lineage,
            salt=args.salt,
        )
        summary = {
            "n_docs": res.n_input,
            "n_kept": res.n_kept,
            "docs_per_second": round(res.docs_per_second, 1),
            "per_rule_fail": res.per_rule_fail,
        }
    print(json.dumps(summary))
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    if argv[:1] == ["contract"]:
        return _contract_main(argv[1:])
    if argv[:1] == ["data-source"]:
        return _data_source_main(argv[1:])
    return _filter_main(argv)


if __name__ == "__main__":
    sys.exit(main())
