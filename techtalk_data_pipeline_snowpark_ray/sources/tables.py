"""Schema-clean parquet table reads.

The driver's testdata parquet carries a ``pandas`` footer-metadata
blob. pyarrow Schemas whose metadata holds a dict are UNHASHABLE, which
defeats Ray Data's schema deduplication on every block concat/unify
(``unify_schemas`` falls back to full unification per call and logs
"Failed to hash the schemas" noise on every stage). Reading with an
explicitly metadata-stripped schema keeps every downstream block's
schema hashable, so schema comparisons across thousands of blocks stay
O(1) -- at 100-TB block counts that is the difference between a set
lookup and re-unifying per block. (Engine-written parquet is already
metadata-free; this covers the ingest boundary.)
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def read_table(sf_dir: str, table: str,
               columns: list[str] | None = None) -> ray.data.Dataset:
    """``read_parquet`` of ``{sf_dir}/{table}.parquet`` with column
    pruning at the source and a metadata-stripped (hashable) schema."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = pq.read_schema(path).remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=schema)
