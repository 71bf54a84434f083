"""sqlquery receiver: parameterized SQL polling with tracking-column
watermarks (receiver/sqlqueryreceiver/logs_receiver.go:220-345,
README 'Tracking processed results').

Reference behavior: each poll runs the configured SQL with ``$1``
bound to the current tracking value; every returned row becomes a log
record (``body_column`` -> body, ``attribute_columns`` -> attributes)
or a metric row (``metric_name``/``value_column``); the tracking value
advances to the tracking column of the last row and persists through
the storage extension so a restart resumes where it left off.

Spark-first shape: the query executes through a pluggable backend —
the default runs ``spark.sql`` over registered views (tests, lakehouse
tables); a production deployment swaps in ``spark.read.jdbc`` where
the tracking predicate pushes down to the database as a WHERE clause
(the one-line config flip this module documents).  The tracking
advance uses MAX(tracking_column) rather than "last row": rows have
no order across partitions, and for the monotone tracking columns the
receiver contract assumes (ids, timestamps) MAX is the same value the
reference's ordered scan lands on.
"""
from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PARAM_RE = re.compile(r"\$1|\?")

_NUMERIC_DTYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
}


def _quote_literal(v: str, dtype: str | None = None) -> str:
    """Quote the tracking value for SQL substitution.  When the
    tracking column's dtype is known (recorded at the previous poll)
    quoting follows the dtype; the regex heuristic only covers the
    first poll, before any result schema has been seen."""
    if dtype is not None:
        if dtype in _NUMERIC_DTYPES or dtype.startswith("decimal"):
            return v
        return "'" + v.replace("'", "''") + "'"
    if re.fullmatch(r"-?\d+(\.\d+)?", v):
        return v
    return "'" + v.replace("'", "''") + "'"


def spark_sql_backend(spark: SparkSession, sql: str) -> DataFrame:
    return spark.sql(sql)


@dataclass
class SQLQueryReceiver:
    """One `queries:` entry of the receiver config (config.go Query)."""

    sql: str
    tracking_column: str | None = None
    tracking_start_value: str = ""
    body_column: str | None = None
    attribute_columns: tuple[str, ...] = ()
    metric_name: str | None = None
    value_column: str | None = None
    storage_path: str | None = None  # file_storage-extension analog
    backend: object = field(default=None, repr=False)

    def __post_init__(self):
        self._tracking_dtype: str | None = None
        self._tracking = self._load_tracking()

    # -- tracking persistence (logs_receiver.go:261-325) ---------------

    def _load_tracking(self) -> str:
        if self.storage_path and os.path.exists(self.storage_path):
            with open(self.storage_path) as fh:
                state = json.load(fh)
                self._tracking_dtype = state.get("tracking_dtype")
                return state["tracking_value"]
        return self.tracking_start_value

    def _store_tracking(self) -> None:
        if self.storage_path:
            with open(self.storage_path, "w") as fh:
                json.dump(
                    {
                        "tracking_value": self._tracking,
                        "tracking_dtype": self._tracking_dtype,
                    },
                    fh,
                )

    @property
    def tracking_value(self) -> str:
        return self._tracking

    # -- polling -------------------------------------------------------

    def _bound_sql(self) -> str:
        if self.tracking_column:
            lit = _quote_literal(self._tracking, self._tracking_dtype)
            return _PARAM_RE.sub(lambda _m: lit, self.sql)
        return self.sql

    def poll(self, spark: SparkSession) -> DataFrame:
        """Run one collection cycle; returns the raw result rows and
        advances the tracking value (collect() on one aggregate row —
        bounded, not a data collect).

        The max is computed on the NATIVE column type and stringified
        afterwards — casting before aggregating would make the max
        lexicographic ('999' > '1000'), stalling the watermark every
        time a numeric id crosses a digit boundary and re-ingesting
        rows on the next poll (logs_receiver.go:261-325 advances with
        the row's native-typed value)."""
        backend = self.backend or spark_sql_backend
        rows = backend(spark, self._bound_sql())
        if self.tracking_column:
            self._tracking_dtype = dict(rows.dtypes).get(
                self.tracking_column, self._tracking_dtype
            )
            new_max = rows.agg(F.max(F.col(self.tracking_column))).first()[0]
            if new_max is not None:
                self._tracking = str(new_max)
                self._store_tracking()
        return rows

    # -- signal conversion (logs_receiver.go rowToLog:328-345) ---------

    def to_logs(self, rows: DataFrame) -> DataFrame:
        if not self.body_column:
            raise ValueError("logs conversion requires body_column")
        cols = [F.col(self.body_column).cast("string").alias("body")]
        if self.attribute_columns:
            pairs = []
            for c in self.attribute_columns:
                pairs.extend([F.lit(c), F.col(c).cast("string")])
            cols.append(F.create_map(*pairs).alias("attributes"))
        return rows.select(*cols)

    def to_metrics(self, rows: DataFrame) -> DataFrame:
        if not (self.metric_name and self.value_column):
            raise ValueError("metrics conversion requires metric_name and value_column")
        attr_cols = [c for c in self.attribute_columns]
        sel = [
            F.lit(self.metric_name).alias("metric_name"),
            F.col(self.value_column).cast("double").alias("value"),
        ] + [F.col(c).cast("string").alias(c) for c in attr_cols]
        return rows.select(*sel)
