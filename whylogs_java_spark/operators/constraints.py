"""Profile-backed data-quality constraints — the validation gate a
whylogs consumer runs over finalized profiles.

The reference produces profiles; the thing a pipeline DOES with a
profile before promoting a dataset is assert expectations against it
(deequ-style checks: completeness, ranges, type stability). These
evaluate entirely against the finalized long-format profile
(``operators/profile.profile`` output or a profile-store read-back) —
O(groups × columns) rows — so a 100 TB dataset's quality gate costs
one broadcast join over aggregate-sized rows; the scan already
happened when the profile was built.

A rule is ``(column, metric, op, threshold)``:

- ``metric``: any numeric profile atom (``count``, ``null_count``,
  ``min``, ``max``, ``sum``, ``mean``, ``stddev``, ``variance``,
  ``len_min`` …) plus the derived ``null_rate`` (null_count/count) and
  the string metric ``inferred_type``.
- ``op``: ``<=``, ``<``, ``>=``, ``>``, ``==``, ``!=`` (string metrics
  allow ``==``/``!=`` only).
- ``threshold``: number, or type name for ``inferred_type``.

``check_constraints`` returns one row per (profile group × rule) with
the observed value and a ``passed`` flag; a missing metric (NULL
observed — e.g. ``mean`` on a string column) FAILS the rule rather than
passing vacuously.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ckpt import literal_df

NUMERIC_OPS = ("<=", "<", ">=", ">", "==", "!=")
STRING_OPS = ("==", "!=")
STRING_METRICS = {"inferred_type"}


def check_constraints(
    profile_df: DataFrame,
    rules: Sequence[tuple[str, str, str, object]],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Evaluate rules against a finalized profile.

    ``keys`` are the profile's group columns (empty for a global
    profile); rules apply per group. Output: (keys..., column_name,
    metric, op, threshold, observed_num, observed_str, passed) — one
    row per group × rule, rule order preserved via the rule_id column
    ordering semantics of the join (sort on output if needed).
    """
    ks = list(keys)
    norm_rules = []
    for i, (col, metric, op, thr) in enumerate(rules):
        if metric in STRING_METRICS:
            if op not in STRING_OPS:
                raise ValueError(
                    f"rule {i}: string metric {metric!r} supports ops "
                    f"{STRING_OPS}, got {op!r}"
                )
        elif op not in NUMERIC_OPS:
            raise ValueError(f"rule {i}: unknown op {op!r}")
        norm_rules.append((i, col, metric, op, str(thr)))
    spark = profile_df.sparkSession
    rules_df = literal_df(
        spark,
        norm_rules,
        "rule_id int, column_name string, metric string, op string, "
        "threshold string",
    )

    prof_fields = {f.name for f in profile_df.schema.fields}

    def metric_value(name):
        if name == "null_rate":
            return F.try_divide(F.col("null_count"), F.col("count"))
        return F.col(name) if name in prof_fields else F.lit(None)

    numeric_metrics = sorted(
        {m for _, _, m, _, _ in norm_rules if m not in STRING_METRICS}
    )
    observed_num = F.lit(None).cast("double")
    for m in numeric_metrics:
        observed_num = F.when(
            F.col("metric") == m, metric_value(m).cast("double")
        ).otherwise(observed_num)
    observed_str = F.when(
        F.col("metric") == "inferred_type",
        F.col("inferred_type")
        if "inferred_type" in prof_fields
        else F.lit(None).cast("string"),
    )

    # RIGHT join from the rules side: a rule naming a column absent from
    # the profile must surface as a failing row (NULL observed -> FAIL),
    # not silently disappear — a typo'd expectation that vanishes reads
    # as "passed". Both sides are aggregate-sized.
    joined = profile_df.join(rules_df, on="column_name", how="right")
    thr_num = F.col("threshold").cast("double")
    o = F.round(observed_num, 6)
    num_pass = (
        F.when(F.col("op") == "<=", o <= thr_num)
        .when(F.col("op") == "<", o < thr_num)
        .when(F.col("op") == ">=", o >= thr_num)
        .when(F.col("op") == ">", o > thr_num)
        .when(F.col("op") == "==", o == thr_num)
        .when(F.col("op") == "!=", o != thr_num)
    )
    str_pass = F.when(
        F.col("op") == "==", observed_str == F.col("threshold")
    ).when(F.col("op") == "!=", observed_str != F.col("threshold"))
    passed = F.coalesce(
        F.when(F.col("metric").isin(*STRING_METRICS), str_pass).otherwise(
            num_pass
        ),
        F.lit(False),  # NULL observed -> the expectation FAILS
    )
    return joined.select(
        *ks,
        "column_name",
        "metric",
        "op",
        "threshold",
        o.alias("observed_num"),
        observed_str.alias("observed_str"),
        passed.alias("passed"),
        "rule_id",
    )


def quantile_metrics(
    df: DataFrame,
    columns: Sequence[str],
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    group_by: Sequence[str] = (),
    tier: str | None = None,
) -> DataFrame:
    """Wide quantile table for QUANTILE expectations: (keys…,
    column_name, q_50, q_90, q_99, …) — a pivot of
    ``summary.quantile_summary`` whose metric names
    (``q_<pct>``, dots → underscores) plug straight into
    ``check_constraints`` rules, e.g. ``("latency", "q_99", "<=",
    "250")``. ``tier`` as in quantile_summary (sketch default — the
    scale path; "exact" for oracle runs)."""
    from .summary import quantile_summary

    long = quantile_summary(
        df, list(columns), group_by=list(group_by),
        quantiles=list(quantiles), tier=tier,
    )

    def mname(q: float) -> str:
        return "q_" + f"{q * 100:g}".replace(".", "_")

    aggs = [
        F.max(F.when(F.col("quantile") == float(q), F.col("value"))).alias(
            mname(q)
        )
        for q in quantiles
    ]
    return long.groupBy(*group_by, "column_name").agg(*aggs)


def constraints_summary(
    checked: DataFrame, keys: Sequence[str] = ()
) -> DataFrame:
    """Collapse a ``check_constraints`` result to one row per rule:
    (column_name, metric, op, threshold, n_groups, n_failed, passed)."""
    return (
        checked.groupBy("rule_id", "column_name", "metric", "op", "threshold")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(~F.col("passed"), 1).otherwise(0)).alias("n_failed"),
        )
        .withColumn("passed", F.col("n_failed") == 0)
    )
