"""Iceberg production path (plans/iceberg.py): graceful gate in-sandbox."""

from __future__ import annotations

import pytest

from autoextract.plans import iceberg as ICE


def test_unavailable_in_sandbox(spark):
    assert ICE.iceberg_available(spark) is False
    with pytest.raises(ICE.IcebergUnavailable, match="--conf"):
        ICE.create_spans_table(spark, "autoextract.db.spans")


def test_ddl_and_merge_shapes():
    ddl = ICE.SPANS_DDL.format(table="c.db.spans", n_buckets=512)
    assert "ARRAY<STRUCT<kind: STRING" in ddl and "bucket(512, doc_id)" in ddl
    merge = ICE.MERGE_EXTRACTED_SQL.format(table="c.db.x", updates="u")
    assert "WHEN MATCHED THEN UPDATE" in merge and "WHEN NOT MATCHED THEN INSERT" in merge


def test_available_detects_configured_catalog(spark):
    # configured but jar absent → still unavailable (class can't resolve)
    spark.conf.set("spark.sql.catalog.probe", "org.apache.iceberg.spark.SparkCatalog")
    try:
        assert ICE.iceberg_available(spark, "probe") is False
    finally:
        spark.conf.unset("spark.sql.catalog.probe")
