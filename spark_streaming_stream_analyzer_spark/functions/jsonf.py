"""JSON scalar helpers (SURVEY.md §2.1 #3 ``fn_json_get_string``,
#4 ``fn_cast_string_double``).

The reference parses each Kafka record's JSON value with org.json and
``Double.parseDouble`` (``KafkaStreamAverageCalculator.java:201-215``),
throwing on any malformed record. The rebuild uses Catalyst's
``get_json_object`` (codegen'd, no Python) which yields NULL for
missing/malformed fields — the PERMISSIVE policy chosen in SURVEY.md
§1.3.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: JSON nesting-depth contract (round-12 JSONNEST probe): a props
#: document nested deeper than this many containers is UNPARSEABLE —
#: every extraction yields NULL, exactly like malformed JSON. This is
#: Jackson's StreamReadConstraints DoS-guard default, which every Spark
#: JSON function inherits (measured: get_json_object / json_object_keys
#: / try_parse_json all fail the WHOLE parse at 1001 containers, pass
#: at 1000 — even a healthy top-level key next to one over-deep sibling
#: extracts NULL). DuckDB's yyjson has no depth cap, so left alone the
#: engines diverge; the oracle side mirrors this constant via the
#: registry's parseable-props shadow (a string-literal-safe bracket-
#: depth scan — see registry._shadow_finite_events(shallow_props=True)).
#: Adopting the cap as the contract is the scale-correct choice: at
#: 100 TB you WANT a parser depth guard — unbounded-recursion parsing
#: of adversarial JSON is a stack-overflow DoS.
PROPS_JSON_MAX_DEPTH = 1000


def json_str(col: Column | str, field: str) -> Column:
    """Extract a string field from a JSON document column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{field}")


def json_double(col: Column | str, field: str) -> Column:
    """Extract a string-encoded double (reference Q1 semantics:
    ``Double.parseDouble(json.getString(...))``) — NULL on garbage
    instead of a task-killing exception."""
    return json_str(col, field).cast("double")


def json_corrupt_policy(spark, sf_dir):
    """Corrupt-record policy (SURVEY.md §1.2 parity decision): the
    reference dies on malformed JSON (org.json throws, no handler —
    ``KafkaStreamAverageCalculator.java:201-215``); the rebuild's
    PERMISSIVE path yields NULL and keeps the pipeline alive.

    Every 50th record is corrupted in-flight (truncated document);
    extraction must null out exactly those and the aggregate proves the
    partition: n_valid + n_corrupt = n_rows, with per-type counts.
    """
    from pyspark.sql import functions as F

    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"readTag_id": "'),
        F.col("event_type"),
        F.lit('", "readValue": "'),
        F.col("value").cast("decimal(14,2)").cast("string"),
        F.lit('"}'),
    )
    corrupted = F.when(
        F.col("event_id") % 50 == 0, F.substring(doc, 1, 20)
    ).otherwise(doc)
    parsed = ev.select(
        "event_id",
        "event_type",
        F.get_json_object(corrupted, "$.readValue").cast("double").alias("rv"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.count("rv").alias("n_valid"),
        F.sum(F.when(F.col("rv").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_corrupt"),
    )


JSON_CORRUPT_SQL = """
WITH docs AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 50 = 0
              THEN substr('{"readTag_id": "' || event_type || '", "readValue": "'
                          || CAST(CAST(value AS DECIMAL(14,2)) AS VARCHAR) || '"}', 1, 20)
              ELSE '{"readTag_id": "' || event_type || '", "readValue": "'
                   || CAST(CAST(value AS DECIMAL(14,2)) AS VARCHAR) || '"}'
         END AS doc
  FROM events
),
parsed AS (
  SELECT event_id, event_type,
         TRY_CAST(json_extract_string(TRY_CAST(doc AS JSON), '$.readValue') AS DOUBLE) AS rv
  FROM docs
)
SELECT event_type, COUNT(*) AS n_rows, COUNT(rv) AS n_valid,
       CAST(SUM(CASE WHEN rv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt
FROM parsed GROUP BY event_type
"""


def json_key_inventory(spark, sf_dir):
    """Schema-drift monitor: inventory of JSON key paths across a
    semi-structured column — per key, how many documents carry it and
    its document share. The check that catches a producer silently
    adding/dropping fields.

    Fixture ``props`` is single-key, so variable-schema documents are
    synthesized in-query (same CASE in both engines, keyed on
    event_id): three producer generations with different key sets.
    ``json_object_keys`` + explode is pure codegen; one hash-agg on
    the key; the doc total broadcasts."""
    from pyspark.sql import functions as F

    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    base = F.concat(F.lit('{"k": '), json_str("props", "k"), F.lit("}"))
    doc = (
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(
                F.lit('{"k": '), json_str("props", "k"),
                F.lit(', "extra": "'), F.col("event_type"), F.lit('"}'),
            ),
        )
        .when(
            F.col("event_id") % 3 == 1,
            F.concat(
                F.lit('{"k": '), json_str("props", "k"),
                F.lit(', "geo": "zz", "extra": "'),
                F.col("event_type"), F.lit('"}'),
            ),
        )
        .otherwise(base)
    )
    keys = ev.select(F.explode(F.json_object_keys(doc)).alias("key"))
    tot = ev.agg(F.count("*").alias("n_docs_total"))
    return (
        keys.groupBy("key")
        .agg(F.count("*").alias("n_docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n_docs",
            (
                F.col("n_docs").cast("double")
                / F.col("n_docs_total").cast("double")
            ).alias("doc_share"),
        )
    )


JSON_KEY_INVENTORY_SQL = """
WITH docs AS (
  SELECT CASE
    WHEN event_id % 3 = 0
      THEN '{"k": ' || json_extract_string(TRY_CAST(props AS JSON), '$.k')
           || ', "extra": "' || event_type || '"}'
    WHEN event_id % 3 = 1
      THEN '{"k": ' || json_extract_string(TRY_CAST(props AS JSON), '$.k')
           || ', "geo": "zz", "extra": "' || event_type || '"}'
    ELSE '{"k": ' || json_extract_string(TRY_CAST(props AS JSON), '$.k') || '}'
  END AS doc
  FROM events
),
keys AS (
  SELECT unnest(json_keys(TRY_CAST(doc AS JSON))) AS key FROM docs
),
tot AS (SELECT COUNT(*) AS n_docs_total FROM docs)
SELECT key, COUNT(*) AS n_docs,
       CAST(COUNT(*) AS DOUBLE) / CAST(MAX(n_docs_total) AS DOUBLE) AS doc_share
FROM keys CROSS JOIN tot
GROUP BY key
"""
