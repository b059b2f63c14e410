"""Schema-evolution normalize stage.

Reference parity: ``jsonToFields`` (``snowpark/Implicits.scala:13-26``)
projects a VARIANT record onto a declared schema with case-insensitive
field lookup, per-field cast and NULL-fill for missing fields; extra
fields are dropped. That is exactly a schema-evolution-tolerant
projection, and it is this engine's answer to column-add and
column-widen drift (BASELINE.json north_star).

Used as a stateless ``map_batches(..., batch_format="pyarrow",
zero_copy_batch=True)`` stage: matching columns with matching types
pass through zero-copy; only added/widened columns pay a cast.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def normalize_batch(batch: pa.Table, target: pa.Schema,
                    keep_extra: tuple[str, ...] = ()) -> pa.Table:
    """Project `batch` onto `target` (case-insensitive; cast; null-fill).

    `keep_extra` columns (e.g. the lsn/op bookkeeping columns) are
    passed through in front of the target columns when present.
    """
    lower = {name.lower(): name for name in batch.schema.names}
    n = batch.num_rows
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for extra in keep_extra:
        src = lower.get(extra.lower())
        if src is not None:
            cols[extra] = batch.column(src)
    for field in target:
        src = lower.get(field.name.lower())
        if src is None:
            col: pa.Array | pa.ChunkedArray = pa.nulls(n, type=field.type)
        else:
            col = batch.column(src)
            if col.type != field.type:
                col = pc.cast(col, field.type)
        cols[field.name] = col
    # pa.table keeps chunked columns as-is: matching columns pass
    # through zero-copy (no combine/concat of the batch)
    return pa.table(cols)


class SchemaNormalizer:
    """Callable for map_batches. Stateless, but kept as a class so the
    target schema is resolved once (actor-pool friendly)."""

    def __init__(self, target: pa.Schema, keep_extra: tuple[str, ...] = ()):
        self.target = target
        self.keep_extra = tuple(keep_extra)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return normalize_batch(batch, self.target, self.keep_extra)
