"""JSON-extraction projections and result serialization.

Covers SURVEY.md §2.1 ops:
 #2  ``proj_json_extract_pair``   — (tag, double value) from a JSON doc
 #3  ``fn_json_get_string``       — JSON string field extraction
 #4  ``fn_cast_string_double``    — string→double cast
 #6  ``fn_scalar_min_max``        — least/greatest scalar forms
 #8  ``sink_kafka_json``          — 10-field result record → JSON string
 #9  ``proj_wrap_array``          — stats row → array<double> wrap
 #11 ``proj_json_extract_single`` — tag-only projection

Reference: ``KafkaStreamAverageCalculator.java:80-81, 201-215``
(org.json extraction + ``Double.parseDouble``),
``KafkaStreamPropertyAggregator.java:64-72``, Jackson serialization at
``KafkaStreamAverageCalculator.java:193-199`` of the POJO
``model/SparkStreamingStatisticsProcessingResult.java:5-14``, array
wrap at ``KafkaStreamAverageCalculator.java:185-186``.

All expressions are built-in Catalyst functions — codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.jsonf import json_double, json_str
from .stats import STAT_COLS


def json_extract_pair(
    df: DataFrame,
    json_col: str,
    tag_field: str,
    value_field: str,
) -> DataFrame:
    """op #2: project a JSON-doc column to (readTag_id, readValue).

    ``readValue`` follows reference Q1 semantics: the JSON field is a
    *string-encoded* double (``Double.parseDouble(getString(...))``,
    ``KafkaStreamAverageCalculator.java:210-211``) — extraction returns
    a string, then casts.
    """
    return df.select(
        json_str(json_col, tag_field).alias("readTag_id"),
        json_double(json_col, value_field).alias("readValue"),
    )


def json_extract_single(df: DataFrame, json_col: str, field: str) -> DataFrame:
    """op #11: project to just the tag string (wordcount job input)."""
    return df.select(json_str(json_col, field).alias("line"))


def wrap_stats_array(stats_df: DataFrame) -> DataFrame:
    """op #9: (readTag_id, array<double> of the 7 stats) — the
    reference's ``Arrays.asList(state)`` display shape."""
    return stats_df.select(
        "readTag_id", F.array(*[F.col(c) for c in STAT_COLS]).alias("stats")
    )


def wrap_stats_array_joined(stats_df: DataFrame) -> DataFrame:
    """op #9, driver-facing form: the stats array rendered as one
    fixed-scale comma-joined string. External comparators canonicalize
    outputs through a pandas sort where array cells are unhashable, so
    the registered query emits the array's deterministic string form
    (DECIMAL(38,4) per element — identical text in Spark and DuckDB);
    ``wrap_stats_array`` stays as the array-typed internal helper."""
    cells = F.array(
        *[F.col(c).cast("decimal(38,4)").cast("string") for c in STAT_COLS]
    )
    return stats_df.select(
        "readTag_id",
        # explicit 'null' placeholder: array_join SKIPS null elements by
        # default, silently rendering a 7-cell stats array as 2 cells
        # for a key whose every measurement is missing (round-9
        # zero-variance sweep) — a faithful display keeps the slot
        F.concat(
            F.lit("["), F.array_join(cells, ",", "null"), F.lit("]")
        ).alias("stats"),
    )


def stats_to_kafka_record(stats_df: DataFrame) -> DataFrame:
    """op #8: serialize the result record to a Kafka-shaped (key, value)
    pair, value = JSON string of the POJO fields.

    Number formatting differs between JSON writers, so the JSON is
    assembled from DECIMAL(38,4)-rendered fields — deterministic
    fixed-scale text identical in Spark and DuckDB. (The streaming path
    in ``streaming/pipelines.py`` uses idiomatic ``to_json(struct(...))``
    — this batch form exists to be oracle-checkable byte-for-byte.)
    """
    def dec(c: str) -> F.Column:
        return F.col(c).cast("decimal(38,4)").cast("string")

    value = F.concat(
        F.lit('{"readTag_id":"'), F.col("readTag_id"),
        F.lit('","summer":'), dec("summer"),
        F.lit(',"counter":'), dec("counter"),
        F.lit(',"sumsqr":'), dec("sumsqr"),
        F.lit(',"bestmin":'), dec("bestmin"),
        F.lit(',"bestmax":'), dec("bestmax"),
        F.lit(',"mean":'), dec("mean"),
        F.lit(',"var":'), dec("var"),
        F.lit("}"),
    )
    return stats_df.select(
        F.col("readTag_id").alias("key"), value.alias("value")
    )


def scalar_min_max(df: DataFrame, value: str) -> DataFrame:
    """op #6 scalar form: clamp-style least/greatest per row
    (``Math.min``/``Math.max`` in the reference's fold, ``:141-142``)."""
    v = F.col(value)
    return df.select(
        v.alias("v"),
        F.least(v, F.lit(0.0)).alias("least_zero"),
        F.greatest(v, F.lit(0.0)).alias("greatest_zero"),
    )
