"""Semi-structured (JSON string) column operators — the check surface
for the `props`-style payload columns every event/crawl table carries.

soda-core's checks stop at scalar columns; real event tables smuggle
half their schema inside a JSON string, and the first data-quality
questions are exactly the scalar ones one level down: does it parse,
is the key present, what are the value's stats. This module answers
them with JVM-side JSON expressions only (``from_json`` /
``get_json_object`` — codegen, no Python), so the audit costs one
fused aggregate like any scalar check.

Cross-engine parse semantics (documented contract, mirrored by the
DuckDB oracle): a value is "valid" when it parses as a JSON OBJECT —
Spark's ``from_json(col, 'map<string,string>')`` yields NULL for both
malformed JSON and non-object JSON; the oracle twin is
``json_valid(x) AND json_type(x) = 'OBJECT'``. Field extraction uses
JSONPath ``$.field`` on both engines and compares as numerics after
an explicit cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_field_profile(
    df: DataFrame,
    json_col: str,
    field: str,
    group_col: str = "event_type",
) -> DataFrame:
    """Per-group audit of one numeric field inside a JSON-string
    column. One row per group::

        group, n_rows: bigint
        n_valid_json: bigint    -- parses as a JSON object
        n_with_field: bigint    -- $.field present AND numeric
        field_null_rate: double -- 1 - n_with_field/n_rows, 6 dp
        f_min, f_max: bigint
        f_avg: double (6 dp)

    Scale shape: every predicate and extraction is a codegen JSON
    expression inside ONE map-side-combined aggregate — a single
    corpus scan, shuffle carries |groups| counter rows. NULL group
    folds to the literal '<null>' bucket so unattributed rows stay
    visible (missing-ness is the finding, not a drop). soda-core
    analogue: missing/invalid/aggregate checks applied one JSON level
    down (SURVEY §2.3), which the reference cannot express without a
    warehouse-side JSON dialect."""
    j = F.col(json_col)
    parsed = F.from_json(j, "map<string,string>")
    # try_cast, not cast: a non-numeric field value must count as
    # absent, not throw under ANSI mode (oracle twin: TRY_CAST)
    val = F.get_json_object(j, f"$.{field}").try_cast("bigint")
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("<null>"))
    return (
        df.groupBy(grp.alias("group"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(parsed.isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_valid_json"),
            F.sum(F.when(val.isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_with_field"),
            F.min(val).alias("f_min"),
            F.max(val).alias("f_max"),
            F.round(F.avg(val), 6).alias("f_avg"),
        )
        .withColumn(
            "field_null_rate",
            F.round(
                F.lit(1.0)
                - F.col("n_with_field") / F.col("n_rows").cast("double"),
                6,
            ),
        )
        .select(
            "group",
            "n_rows",
            "n_valid_json",
            "n_with_field",
            "field_null_rate",
            "f_min",
            "f_max",
            "f_avg",
        )
        .orderBy("group")
    )


def json_key_census(
    df: DataFrame,
    json_col: str,
    group_col: str = "event_type",
) -> DataFrame:
    """Key census of a JSON-string payload column: which keys occur,
    how often, per group — the schema-inference/drift report for the
    part of the table that has no declared schema. A key whose
    presence rate dives between crawls means a producer dropped a
    field; a new key appearing at 0.1% means someone is smuggling data.

    One row per (group, key)::

        group, key, n_rows: bigint     -- n_rows = group size
        n_present: bigint, presence_rate: double (6 dp)

    plus one ``key = '<invalid>'`` row per group counting rows that do
    not parse as a JSON object (NULL payloads included — they carry no
    keys and no valid object).

    Scale shape: parse once per row (``from_json`` to a map, codegen),
    explode ``map_keys`` — the explode emits |keys-per-row| elements,
    so the shuffle is keys × rows collapsed by map-side combine to the
    (group, key) grain; group sizes ride a second tiny aggregate off
    the same scan subtree (ReuseExchange-eligible). soda-core
    analogue: schema check (schema_check.py) one JSON level down."""
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("<null>"))
    parsed = F.from_json(F.col(json_col), "map<string,string>")
    base = df.select(grp.alias("group"), parsed.alias("__m"))
    keys = base.select(
        "group",
        F.explode(
            F.when(F.col("__m").isNotNull(), F.map_keys(F.col("__m")))
            .otherwise(F.array(F.lit("<invalid>")))
        ).alias("key"),
    )
    counts = keys.groupBy("group", "key").agg(
        F.count(F.lit(1)).cast("long").alias("n_present")
    )
    sizes = base.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    return (
        counts.join(F.broadcast(sizes), "group")
        .select(
            "group",
            "key",
            "n_rows",
            "n_present",
            F.round(
                F.col("n_present") / F.col("n_rows").cast("double"), 6
            ).alias("presence_rate"),
        )
        .orderBy("group", "key")
    )
