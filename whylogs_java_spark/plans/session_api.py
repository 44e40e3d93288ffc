"""Fluent session API mirroring the reference's Spark surface.

Reference: ``df.newProfilingSession(name).withTimeColumn(ts)
.groupBy(cols...).aggProfiles()`` — WhyLogs.scala:36-177 (immutable case
class copies; validation at :57-66, :92-106, :266-270). A user of the
reference maps 1:1 onto this builder; execution is the engine's single
declarative aggregation instead of the custom Aggregator pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..operators.model import confusion_matrix, regression_metrics
from ..operators.profile import profile, profile_atoms


@dataclass(frozen=True)
class ProfileSession:
    """Immutable profiling session builder (WhyProfileSession equivalent)."""

    df: DataFrame
    name: str = "default"
    time_column: str | None = None
    time_granularity: str | None = "day"
    group_by: tuple[str, ...] = ()
    null_strings: tuple[str, ...] = ()
    coerce_strings: bool = False
    model: tuple | None = None  # (kind, prediction, target, score|None)

    def _check_columns(self, *cols: str) -> None:
        # WhyLogs.scala:266-270
        missing = [c for c in cols if c not in self.df.columns]
        if missing:
            raise ValueError(f"columns not found in DataFrame: {missing}")

    def with_time_column(self, column: str, granularity: str | None = "day") -> ProfileSession:
        # time column must be a timestamp (WhyLogs.scala:57-66)
        self._check_columns(column)
        dt = self.df.schema[column].dataType
        if not isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            raise TypeError(
                f"time column {column!r} must be timestamp/date, got {dt.simpleString()}"
            )
        return replace(self, time_column=column, time_granularity=granularity)

    def group_by_columns(self, *cols: str) -> ProfileSession:
        self._check_columns(*cols)
        return replace(self, group_by=tuple(cols))

    def with_null_strings(self, *null_strs: str) -> ProfileSession:
        return replace(self, null_strings=tuple(null_strs))

    def with_string_coercion(self, enabled: bool = True) -> ProfileSession:
        return replace(self, coerce_strings=enabled)

    def with_classification_model(
        self, prediction: str, target: str, score: str | None = None
    ) -> ProfileSession:
        self._check_columns(prediction, target, *((score,) if score else ()))
        return replace(self, model=("classification", prediction, target, score))

    def with_regression_model(self, prediction: str, target: str) -> ProfileSession:
        # prediction/target must be numeric (WhyLogs.scala:92-106)
        self._check_columns(prediction, target)
        for c in (prediction, target):
            if not isinstance(self.df.schema[c].dataType, T.NumericType):
                raise TypeError(f"regression field {c!r} must be numeric")
        return replace(self, model=("regression", prediction, target, None))

    # -- terminal operations ----------------------------------------------

    def _model_fields(self) -> tuple[str, ...]:
        # model fields excluded from per-column profiling (WhyLogs.scala:22-26)
        return tuple(f for f in (self.model or ())[1:] if isinstance(f, str))

    def agg_profiles(self) -> DataFrame:
        cols = [
            c
            for c in self.df.columns
            if c not in self._model_fields()
        ]
        return profile(
            self.df,
            group_by=list(self.group_by),
            time_column=self.time_column,
            time_granularity=self.time_granularity,
            columns=cols,
            null_strings=self.null_strings,
            coerce_strings=self.coerce_strings,
        )

    def agg_profile_atoms(self) -> DataFrame:
        cols = [c for c in self.df.columns if c not in self._model_fields()]
        return profile_atoms(
            self.df,
            group_by=list(self.group_by),
            time_column=self.time_column,
            time_granularity=self.time_granularity,
            columns=cols,
            null_strings=self.null_strings,
            coerce_strings=self.coerce_strings,
        )

    def agg_model_metrics(self) -> DataFrame:
        if self.model is None:
            raise ValueError("no model configured on this session")
        kind, pred, target, score = self.model
        if kind == "classification":
            return confusion_matrix(
                self.df, pred, target, score=score, group_by=list(self.group_by)
            )
        return regression_metrics(self.df, pred, target, group_by=list(self.group_by))


def new_profiling_session(df: DataFrame, name: str = "default") -> ProfileSession:
    """``df.newProfilingSession(name)`` equivalent (WhyLogs.scala:305-314)."""
    return ProfileSession(df=df, name=name)
