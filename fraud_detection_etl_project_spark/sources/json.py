"""JSON source: schema-on-read for line-delimited and multiline JSON.

The reference touches JSON only as the Lambda event envelope
(``/root/reference/Lambda Function/lambda_function_aws.py:29-30``) and the
response body (``:59,108``); there is no JSON *data* source. This module
supplies the standard one (SURVEY.md M1): explicit-schema or inferred scans
with the same FAILFAST / PERMISSIVE policy surface as the CSV source —
PERMISSIVE keeps malformed records in ``_corrupt_record`` instead of
aborting the file, the recovery path the reference lacks.

At scale, line-delimited (jsonl) is the only layout that splits across
tasks; ``multiline=True`` (one JSON document per file) forces
one-file-one-task and is provided for small config-like inputs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType, StringType


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    mode: str = "PERMISSIVE",
    multiline: bool = False,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Scan JSON files (jsonl by default).

    With an explicit ``schema`` and ``mode="PERMISSIVE"``, rows that fail to
    parse land with nulls and the raw text in ``_corrupt_record`` (appended
    to the schema here when ``keep_corrupt``); ``mode="FAILFAST"`` aborts
    the scan on the first bad record — the zip-variant's whole-file-abort
    semantics (``zip!lambda_function_aws.py:130-132``).
    """
    reader = spark.read.option("mode", mode).option("multiLine", multiline)
    if schema is not None:
        if keep_corrupt and mode.upper() == "PERMISSIVE" and "_corrupt_record" not in schema.names:
            schema = StructType(list(schema.fields) + [StructField("_corrupt_record", StringType())])
        reader = reader.schema(schema)
    return reader.json(path)
