"""Semi-structured JSON operators: parse_json + array explode + typed
projection.

Reference parity:
  * ``parse_json`` of a raw response string column
    (``IngestOrdersFromRawToFlat.scala:39-43``) -- T1;
  * ``jsonArrayToExplodedFields``: lateral flatten of a JSON
    array-of-objects into one row per element with typed fields
    (``snowpark/Implicits.scala:27-38``) -- T3;
  * the typed projection reuses :func:`normalize_batch` (jsonToFields,
    T2), so added/missing/widened fields follow the same
    schema-evolution rules as the CDC normalize stage.

Scale shape: one ``json.loads`` call per PAYLOAD (each payload is an
array of many records, so the per-record cost is amortized); the
exploded records become one Arrow table per batch via
``pa.Table.from_pylist`` and every downstream cast is an Arrow kernel.
A per-record Python loop never touches individual fields.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .normalize import normalize_batch


def explode_json_array(batch: pa.Table, column: str,
                       target: pa.Schema) -> pa.Table:
    """Parse a string column of JSON arrays-of-objects and explode to
    one typed row per element, projected onto `target` (case-insensitive
    field match, cast, null-fill -- T1+T3+T2 in one stage).

    Usable directly inside ``map_batches(..., batch_format="pyarrow")``
    via :class:`JsonArrayExploder`.
    """
    records: list[dict] = []
    for payload in batch[column].to_pylist():
        if not payload:
            continue
        parsed = json.loads(payload)
        if isinstance(parsed, dict):      # a single object is a 1-array
            parsed = [parsed]
        # fold case variants of a key into ONE column here (from_pylist
        # would otherwise keep `a` and `A` as distinct columns and the
        # case-insensitive projection could only pick one of them)
        records.extend({k.lower(): v for k, v in r.items()} for r in parsed)
    if not records:
        return target.empty_table()
    tbl = pa.Table.from_pylist(records)
    return normalize_batch(tbl, target)


class JsonArrayExploder:
    """map_batches callable: raw JSON-array column -> exploded typed
    rows. Stateless; a class so the target schema resolves once."""

    def __init__(self, column: str, target: pa.Schema):
        self.column = column
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        return explode_json_array(batch, self.column, self.target)
