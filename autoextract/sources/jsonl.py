"""JSONL ingestion — the lingua franca of training-data interchange.

Corpora move between pipelines as JSON Lines (one document object per
line: Dolma, RedPajama, FineWeb all publish this shape).  Spark reads it
natively (``spark.read.json``), but a curation engine also meets JSONL as
a COLUMN — a string field inside parquet/Iceberg rows, Kafka values, WARC
response bodies — where the right tool is ``from_json`` with an explicit
schema and per-row corruption containment (the O6 stance: a malformed
line yields a flagged row, never a task failure).

Scale shape: ``from_json`` is a JVM expression — one codegen'd projection,
zero shuffles, zero Python.  Schemas are explicit (never inferred) so the
plan is stable across corpus slices, and nested field access prunes
through Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_jsonl_column"]


def parse_jsonl_column(
    lines: DataFrame,
    schema: str,
    json_col: str = "line",
    keep: bool = False,
) -> DataFrame:
    """Parse a JSON-string column against an explicit ``schema`` (DDL
    string, e.g. ``"doc_id bigint, text string, meta struct<lang:string>"``).

    Output: one column per top-level schema field, plus ``valid`` — false
    when the line is not a JSON object matching the schema shape
    (``from_json`` yields NULL for the whole struct on unparseable input,
    and NULL for individual fields that are absent or type-mismatched; a
    row whose every field is NULL on non-null input is treated as corrupt).
    ``keep=True`` retains the original string column for quarantine sinks.
    """
    parsed = F.from_json(F.col(json_col), schema)
    field_names = [f.split()[0].strip("`") for f in _split_ddl(schema)]
    out = lines.withColumn("__p", parsed)
    # PERMISSIVE from_json yields an all-NULL struct (not a NULL struct)
    # for unparseable input — corrupt = input present but no field parsed
    any_field = None
    for n in field_names:
        c = F.col(f"__p.{n}").isNotNull()
        any_field = c if any_field is None else (any_field | c)
    out = out.withColumn(
        "valid",
        F.col(json_col).isNotNull()
        & F.col("__p").isNotNull()
        & F.coalesce(any_field, F.lit(False)),
    )
    cols = [c for c in lines.columns if keep or c != json_col]
    return out.select(
        *cols,
        *[F.col(f"__p.{n}").alias(n) for n in field_names],
        "valid",
    )


def _split_ddl(schema: str) -> list[str]:
    """Split a DDL column list on top-level commas (commas inside
    ``struct<...>`` / ``array<...>`` / ``map<...>`` don't count)."""
    parts, depth, cur = [], 0, []
    for ch in schema:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def parse_csv_column(
    lines: DataFrame,
    schema: str,
    csv_col: str = "line",
    keep: bool = False,
    **options: str,
) -> DataFrame:
    """The CSV twin of :func:`parse_jsonl_column`: parse a delimited-string
    column against an explicit DDL schema via ``from_csv`` (JVM expression,
    one codegen'd projection).  Handles quoted fields with embedded
    delimiters/quotes per RFC 4180 (Spark's univocity semantics); a row
    whose every field is NULL on non-null input is flagged corrupt via the
    same ``valid`` contract.  ``options`` pass through to ``from_csv``
    (e.g. ``sep='\\t'`` for TSV).  Defaults to RFC 4180 semantics: the
    quote char escapes itself (``""`` inside a quoted field), which is
    NOT Spark's default (backslash) — override ``escape`` to opt out."""
    opts = {"escape": '"', **options}
    parsed = F.from_csv(F.col(csv_col), schema, opts)
    field_names = [f.split()[0].strip("`") for f in _split_ddl(schema)]
    out = lines.withColumn("__p", parsed)
    any_field = None
    for n in field_names:
        c = F.col(f"__p.{n}").isNotNull()
        any_field = c if any_field is None else (any_field | c)
    out = out.withColumn(
        "valid",
        F.col(csv_col).isNotNull()
        & F.col("__p").isNotNull()
        & F.coalesce(any_field, F.lit(False)),
    )
    cols = [c for c in lines.columns if keep or c != csv_col]
    return out.select(
        *cols,
        *[F.col(f"__p.{n}").alias(n) for n in field_names],
        "valid",
    )
