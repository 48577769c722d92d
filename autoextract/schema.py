"""Extraction-schema handling (the reference's "app schema").

The reference stores a recursive field tree per app
(``lambda/api/app/app_schema.py:280-330``, ``web/src/types/app-schema.ts:7-30``)
and walks it to build JSON + indices templates
(``lambda/api/app/utils/template.py:12-148``). Here the schema is plain data —
a broadcast dict that *generates* the extraction plan — never a DataFrame.

Field node shape (verbatim from the reference):
  {"name": str, "display_name": str, "type": "string"|"map"|"list",
   "fields": [...]           # when type == "map"
   "items": {"type": "map", "fields": [...]}}  # when type == "list"

The walk order of ``flatten_fields`` defines the deterministic field order the
extractor uses (reference analogue: ``extraction.py:120-153``
``generate_extraction_fields``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class FieldSpec:
    """One leaf extraction target."""

    path: str  # dotted path, list items as `<list>[].<field>`
    name: str
    display_name: str
    parent_display: str | None = None
    in_list: str | None = None  # name of enclosing list field, if any
    list_item_index: int = -1  # position of this field inside the list item


@dataclass
class AppSchema:
    name: str
    fields: list[dict] = field(default_factory=list)

    @classmethod
    def from_json(cls, schema_json: str, name: str = "app") -> "AppSchema":
        data = json.loads(schema_json)
        return cls(name=name, fields=data["fields"])

    def to_json(self) -> str:
        return json.dumps({"fields": self.fields}, ensure_ascii=False)

    # ------------------------------------------------------------------
    def flatten(self) -> list[FieldSpec]:
        """Depth-first leaf list in schema order.

        Mirrors the reference's field enumeration
        (``extraction.py:120-153``): map children prefixed by the parent's
        display name; list items enumerated as `name[].child`.
        """
        out: list[FieldSpec] = []

        def walk(fields: list[dict], prefix: str, parent_disp: str | None) -> None:
            for f in fields:
                ftype = f.get("type", "string")
                path = f"{prefix}{f['name']}"
                if ftype == "string":
                    out.append(
                        FieldSpec(
                            path=path,
                            name=f["name"],
                            display_name=f.get("display_name", f["name"]),
                            parent_display=parent_disp,
                        )
                    )
                elif ftype == "map":
                    walk(f.get("fields", []), path + ".", f.get("display_name"))
                elif ftype == "list":
                    items = f.get("items", {})
                    for idx, child in enumerate(items.get("fields", [])):
                        out.append(
                            FieldSpec(
                                path=f"{path}[].{child['name']}",
                                name=child["name"],
                                display_name=child.get("display_name", child["name"]),
                                parent_display=f.get("display_name"),
                                in_list=f["name"],
                                list_item_index=idx,
                            )
                        )
                else:  # pragma: no cover - schema validation
                    raise ValueError(f"unknown field type: {ftype!r}")

        walk(self.fields, "", None)
        return out

    def string_and_map_specs(self) -> list[FieldSpec]:
        return [s for s in self.flatten() if s.in_list is None]

    def list_specs(self) -> dict[str, list[FieldSpec]]:
        """list field name -> its item field specs in schema order."""
        lists: dict[str, list[FieldSpec]] = {}
        for s in self.flatten():
            if s.in_list is not None:
                lists.setdefault(s.in_list, []).append(s)
        return lists

    # ------------------------------------------------------------------
    def unified_template(self) -> dict:
        """Empty nested value template, the reference's
        ``generate_unified_template`` contract (``utils/template.py:12-89``):
        string leaves -> "", map -> object, list -> [one item object]."""

        def walk(fields: list[dict]) -> dict:
            node: dict = {}
            for f in fields:
                ftype = f.get("type", "string")
                if ftype == "string":
                    node[f["name"]] = ""
                elif ftype == "map":
                    node[f["name"]] = walk(f.get("fields", []))
                elif ftype == "list":
                    node[f["name"]] = [walk(f.get("items", {}).get("fields", []))]
            return node

        return walk(self.fields)

    def value_struct_type(self):
        """Spark ``StructType`` for the extracted values — string leaves,
        map → struct, list → array<struct> (SURVEY.md §1.1 "Extracted info"
        mapping; all values are strings per the reference's prompt rule
        ``prompts.py:46-48``)."""
        from pyspark.sql import types as T

        def walk(fields: list[dict]) -> "T.StructType":
            out = []
            for f in fields:
                ftype = f.get("type", "string")
                if ftype == "string":
                    out.append(T.StructField(f["name"], T.StringType()))
                elif ftype == "map":
                    out.append(T.StructField(f["name"], walk(f.get("fields", []))))
                elif ftype == "list":
                    item = walk(f.get("items", {}).get("fields", []))
                    out.append(T.StructField(f["name"], T.ArrayType(item)))
            return T.StructType(out)

        return walk(self.fields)

    def indices_struct_type(self):
        """Same tree with ``array<int>`` leaves (the ``indices`` provenance
        shape, ``extraction.py:191-206``)."""
        from pyspark.sql import types as T

        def walk(fields: list[dict]) -> "T.StructType":
            out = []
            for f in fields:
                ftype = f.get("type", "string")
                if ftype == "string":
                    out.append(T.StructField(f["name"], T.ArrayType(T.IntegerType())))
                elif ftype == "map":
                    out.append(T.StructField(f["name"], walk(f.get("fields", []))))
                elif ftype == "list":
                    item = walk(f.get("items", {}).get("fields", []))
                    out.append(T.StructField(f["name"], T.ArrayType(item)))
            return T.StructType(out)

        return walk(self.fields)

    def indices_template(self) -> dict:
        """Same tree, leaves are ``[]`` (``utils/template.py:92-148``)."""

        def walk(fields: list[dict]) -> dict:
            node: dict = {}
            for f in fields:
                ftype = f.get("type", "string")
                if ftype == "string":
                    node[f["name"]] = []
                elif ftype == "map":
                    node[f["name"]] = walk(f.get("fields", []))
                elif ftype == "list":
                    node[f["name"]] = [walk(f.get("items", {}).get("fields", []))]
            return node

        return walk(self.fields)


# ----------------------------------------------------------------------
# The canonical fixture schema — the reference's worked example
# (lambda/api/app/extraction.py:176-206): order_date, operation_info{...},
# shipment_details[{...}]. Display names chosen to match the example OCR
# words ("注文日：2023年5月1日" etc., extraction.py:160-174).
# ----------------------------------------------------------------------
SHIPPING_SCHEMA = AppSchema(
    name="shipping_ocr",
    fields=[
        {"name": "order_date", "display_name": "注文日", "type": "string"},
        {
            "name": "operation_info",
            "display_name": "運行情報",
            "type": "map",
            "fields": [
                {"name": "contract_work", "display_name": "委託業務内容", "type": "string"},
                {"name": "operation_date", "display_name": "運行日", "type": "string"},
            ],
        },
        {
            "name": "shipment_details",
            "display_name": "配送明細",
            "type": "list",
            "items": {
                "type": "map",
                "fields": [
                    {"name": "reception_number", "display_name": "受付番号", "type": "string"},
                    {"name": "destination", "display_name": "行先", "type": "string"},
                    {"name": "origin", "display_name": "発地", "type": "string"},
                    {"name": "vehicle_number", "display_name": "車番", "type": "string"},
                    {"name": "fare", "display_name": "運賃", "type": "string"},
                ],
            },
        },
    ],
)
