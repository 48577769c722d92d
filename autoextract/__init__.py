"""autoextract — a from-scratch PySpark-native document-extraction engine.

Reimplements the data-processing capabilities of
``aws-samples/sample-auto-extract-ai-ocr-app`` (the "reference", see SURVEY.md)
as idiomatic Spark: DataFrame/SQL plans, vectorized pandas/Arrow UDFs for the
layout + extraction core, explicit partitioning/skew policy, and
checkpoint/lineage-based resumability.

Canonical table (BASELINE.json ``input_hint``)::

    documents(doc_id STRING,
              spans ARRAY<STRUCT<kind:STRING, text:STRING,
                                 media_ref:STRING, offset:INT>>)

Subpackages:
  functions   pure column-expression helpers (JVM-side, no Python UDFs)
  operators   the four vectorized UDF stages + training-data operators
  sources     table readers/writers (parquet in-sandbox; Iceberg-shaped)
  plans       end-to-end pipeline DAG, checkpoint/lineage/resume
  streaming   incremental (availableNow) variant of the batch pipeline
"""

__version__ = "0.1.0"
