"""Field extraction vs the reference's worked golden (extraction.py:159-207)."""

from __future__ import annotations

import json

from autoextract import corpus
from autoextract.operators.extract import extract_fields, nested_result
from autoextract.operators.layout import order_words
from autoextract.schema import SHIPPING_SCHEMA, AppSchema


def _ordered_example(spark):
    df = spark.createDataFrame(
        corpus.example_words_pdf(), schema=corpus.OCR_WORDS_SCHEMA
    )
    return order_words(df)


def test_golden_example_long_format(spark):
    got = {
        r["field_path"]: (r["value"], list(r["word_ids"]))
        for r in extract_fields(_ordered_example(spark), SHIPPING_SCHEMA).collect()
    }
    for path, value, ids in corpus.EXAMPLE_EXPECTED_FIELDS:
        assert got[path] == (value, ids), path
    assert len(got) == len(corpus.EXAMPLE_EXPECTED_FIELDS)


def test_golden_example_confidence_contract(spark):
    rows = extract_fields(_ordered_example(spark), SHIPPING_SCHEMA).collect()
    for r in rows:
        if r["value"]:
            assert 0.5 <= r["confidence"] <= 1.0
        else:
            assert r["confidence"] == 0.0


def test_nested_result_matches_reference_example(spark):
    """The unified output (extraction.py:176-206) reconstructed exactly."""
    extracted = extract_fields(_ordered_example(spark), SHIPPING_SCHEMA)
    row = nested_result(extracted, SHIPPING_SCHEMA).collect()[0]
    values = json.loads(row["extracted_json"])
    indices = json.loads(row["indices_json"])
    assert values == {
        "order_date": "2023年5月1日",
        "operation_info": {
            "contract_work": "配送業務",
            "operation_date": "2023年5月15日",
        },
        "shipment_details": [
            {
                "reception_number": "A001",
                "destination": "東京",
                "origin": "大阪",
                "vehicle_number": "",
                "fare": "",
            }
        ],
    }
    assert indices == {
        "order_date": [0],
        "operation_info": {"contract_work": [1], "operation_date": [2]},
        "shipment_details": [
            {
                "reception_number": [3],
                "destination": [4],
                "origin": [5],
                "vehicle_number": [],
                "fare": [],
            }
        ],
    }


def test_missing_fields_contract(spark):
    """Unfound fields → ("", []) — prompts.py:113 rule."""
    schema = AppSchema(
        name="t",
        fields=[{"name": "nonexistent", "display_name": "存在しない", "type": "string"}],
    )
    rows = extract_fields(_ordered_example(spark), schema).collect()
    assert [(r["value"], list(r["word_ids"]), r["confidence"]) for r in rows] == [
        ("", [], 0.0)
    ]


def test_adjacent_label_matching(spark):
    """Label word + separate value word (rule 2, confidence 0.9)."""
    import pandas as pd

    rows = []
    for i, (content, x0) in enumerate([("注文日", 50), ("2024年1月2日", 200)]):
        rows.append(
            {
                "doc_id": "adj-1",
                "page": 1,
                "word_seq": i,
                "kind": "text",
                "content": content,
                "media_ref": None,
                "rec_score": 1.0,
                "points": [[x0, 100.0], [x0 + 120, 100.0], [x0 + 120, 130.0], [x0, 130.0]],
            }
        )
    df = spark.createDataFrame(pd.DataFrame(rows), schema=corpus.OCR_WORDS_SCHEMA)
    schema = AppSchema(
        name="t", fields=[{"name": "order_date", "display_name": "注文日", "type": "string"}]
    )
    got = extract_fields(order_words(df), schema).collect()
    assert got[0]["value"] == "2024年1月2日"
    assert list(got[0]["word_ids"]) == [1]
    assert got[0]["confidence"] == 0.9


def test_header_row_column_mapping(spark):
    """A header line maps cells to columns by x-proximity, so a row with a
    missing middle cell still lands values in the right fields."""
    import pandas as pd

    rows = []
    seq = 0

    def add(content, x0, y0):
        nonlocal seq
        rows.append(
            {
                "doc_id": "hdr-1",
                "page": 1,
                "word_seq": seq,
                "kind": "text",
                "content": content,
                "media_ref": None,
                "rec_score": 1.0,
                "points": [[x0, y0], [x0 + 140.0, y0], [x0 + 140.0, y0 + 30.0], [x0, y0 + 30.0]],
            }
        )
        seq += 1

    headers = ["受付番号", "行先", "発地", "車番", "運賃"]
    for c, h in enumerate(headers):
        add(h, 50 + 160 * c, 100.0)
    # data row missing the middle (発地) cell
    add("A002", 50, 150.0)
    add("東京", 210, 150.0)
    add("品川500", 530, 150.0)
    add("8000", 690, 150.0)
    df = spark.createDataFrame(pd.DataFrame(rows), schema=corpus.OCR_WORDS_SCHEMA)
    got = {
        r["field_path"]: r["value"]
        for r in extract_fields(order_words(df), SHIPPING_SCHEMA).collect()
    }
    assert got["shipment_details[0].reception_number"] == "A002"
    assert got["shipment_details[0].destination"] == "東京"
    assert got["shipment_details[0].origin"] == ""
    assert got["shipment_details[0].vehicle_number"] == "品川500"
    assert got["shipment_details[0].fare"] == "8000"


def test_typed_nested_result(spark):
    """Schema-derived StructType columns round-trip the golden exactly."""
    from autoextract.operators.extract import typed_nested_result

    extracted = extract_fields(_ordered_example(spark), SHIPPING_SCHEMA)
    row = typed_nested_result(extracted, SHIPPING_SCHEMA).collect()[0]
    assert row["extracted"]["order_date"] == "2023年5月1日"
    assert row["extracted"]["operation_info"]["contract_work"] == "配送業務"
    item = row["extracted"]["shipment_details"][0]
    assert (item["reception_number"], item["destination"], item["origin"]) == (
        "A001", "東京", "大阪",
    )
    assert item["vehicle_number"] == "" and item["fare"] == ""
    assert list(row["indices"]["order_date"]) == [0]
    assert list(row["indices"]["shipment_details"][0]["origin"]) == [5]
    # the derived schema is real column types, not strings-in-a-blob
    dt = typed_nested_result(extracted, SHIPPING_SCHEMA).schema["extracted"].dataType
    assert dt["shipment_details"].dataType.typeName() == "array"
