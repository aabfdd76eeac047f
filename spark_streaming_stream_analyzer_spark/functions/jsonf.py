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


def json_str(col: Column | str, field: str) -> Column:
    """Extract a string field from a JSON document column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{field}")


def json_double(col: Column | str, field: str) -> Column:
    """Extract a string-encoded double (reference Q1 semantics:
    ``Double.parseDouble(json.getString(...))``) — NULL on garbage
    instead of a task-killing exception."""
    return json_str(col, field).cast("double")
