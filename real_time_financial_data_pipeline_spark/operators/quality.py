"""Data-quality validation — declarative rule evaluation in ONE pass.

A training-data pipeline gates every ingest on expectations (nullability,
ranges, set membership, uniqueness); at 100 TB the only viable shape is a
single scan that evaluates every rule as a conditional aggregate — one job,
map-side combined, no per-rule passes and no driver-side row iteration.

``check(df, rules)`` returns one row per rule: name, violation count, total
rows, pass flag.  Rules are plain SQL boolean expressions (evaluated with
``F.expr``), so the same text runs on any engine — which is what makes the
report oracle-checkable.  ``expect`` helpers build the common expressions.

Uniqueness is the one expectation a row-local expression can't state; it is
computed as ``count(*) - count(distinct ...)`` in the same aggregate pass.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named expectation: ``predicate`` is a SQL boolean expression that
    must hold for every row (violations = rows where it is false/null)."""

    name: str
    predicate: str


def not_null(col: str) -> Rule:
    return Rule(f"{col}_not_null", f"{col} IS NOT NULL")


def in_range(col: str, lo, hi) -> Rule:
    return Rule(f"{col}_in_range", f"{col} >= {lo} AND {col} <= {hi}")


def _quote(v: str) -> str:
    # SQL string literal with embedded quotes doubled — a value like
    # "o'brien" must not break (or widen) the generated predicate
    return "'" + str(v).replace("'", "''") + "'"


def in_set(col: str, values: list[str]) -> Rule:
    return Rule(f"{col}_in_set", f"{col} IN ({', '.join(_quote(v) for v in values)})")


def matches(col: str, regex: str) -> Rule:
    return Rule(f"{col}_matches", f"{col} RLIKE {_quote(regex)}")


def check(
    df: DataFrame,
    rules: list[Rule],
    unique_cols: list[str] | None = None,
) -> DataFrame:
    """Evaluate every rule in one aggregate pass.

    Output columns: ``rule`` (name), ``violations`` (rows failing the
    predicate — a null predicate result counts as a failure), ``total``
    (row count), ``passed``.  ``unique_cols`` adds a ``<cols>_unique`` rule
    whose violation count is ``total - distinct``.
    """
    # positional aliases: two rules may share a name (warning + hard band on
    # one column) — name-derived aliases would be ambiguous references.
    # coalesce: sum() over zero rows is NULL — an empty (valid) batch must
    # report 0 violations / passed=true, not nulls.
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, r in enumerate(rules):
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.expr(r.predicate), F.lit(0)).otherwise(F.lit(1))),
                F.lit(0),
            ).alias(f"_v_{i}")
        )
    if unique_cols:
        aggs.append(F.count_distinct(*[F.col(c) for c in unique_cols]).alias("_dist"))
    row = df.agg(*aggs)

    # one row per rule via explode(array(structs)) — unioning N selects of
    # the aggregate would replicate (and re-run) the agg subtree N times
    def _report(name: str, violations: Column, passed: Column) -> Column:
        return F.struct(
            F.lit(name).alias("rule"),
            violations.cast("long").alias("violations"),
            F.col("_total").cast("long").alias("total"),
            passed.alias("passed"),
        )

    reports = [
        _report(r.name, F.col(f"_v_{i}"), F.col(f"_v_{i}") == 0)
        for i, r in enumerate(rules)
    ]
    if unique_cols:
        uname = "_".join(unique_cols) + "_unique"
        reports.append(
            _report(
                uname,
                F.col("_total") - F.col("_dist"),
                F.col("_total") == F.col("_dist"),
            )
        )
    return row.select(F.explode(F.array(*reports)).alias("r")).select("r.*")
