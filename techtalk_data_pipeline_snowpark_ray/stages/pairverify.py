"""Distributed verification of candidate pairs (the post-LSH exact
check shared by MinHash-Jaccard and embedding-cosine near-dup).

Shape: every candidate pair is assigned to a partition by pair hash;
every item id ships its payload rows to exactly the partitions of the
pairs that reference it (pair-degree-bounded duplication, typically
1-2 copies); each partition verifies its own pairs with one vectorized
kernel. Nothing corpus-sized or payload-carrying ever lands on the
driver: the pair list is candidate-proportional (the same size class
the pair materialization itself already is) and payloads move object
store -> object store through the raw hash exchange.

This replaces the earlier driver-side verify dicts (take_all of
candidate embeddings / to_pandas of candidate shingles): honest at
moderate scale, but a dup-heavy 100-TB corpus concentrates gigabytes
of payload on the driver exactly when dedup matters most.

Routing runs in ARROW batch format (`Table.take` + appended part
column): payload columns -- including `list<float>` embeddings --
never round-trip through pandas object columns, whose ndarray elements
Ray's pandas block schema cannot unify across blocks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .exchange import exchange_map_groups
from .joins import fetch_broadcast

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def assign_pair_parts(pairs: pd.DataFrame, num_partitions: int
                      ) -> tuple[pd.DataFrame, np.ndarray, np.ndarray]:
    """Deterministically partition pairs; returns (pairs+part, and the
    routing needs as parallel arrays (ids sorted with repeats, part per
    entry): each id is needed in the partitions of its pairs."""
    a = pairs["id_a"].to_numpy(dtype=np.int64).astype(np.uint64)
    b = pairs["id_b"].to_numpy(dtype=np.int64).astype(np.uint64)
    part = (((a * _GOLDEN) ^ (b + _GOLDEN)) % np.uint64(num_partitions)) \
        .astype(np.int32)
    pairs = pairs.assign(part=part)
    need_ids = np.concatenate([a.astype(np.int64), b.astype(np.int64)])
    need_parts = np.concatenate([part, part])
    uniq = pd.DataFrame({"id": need_ids, "part": need_parts}) \
        .drop_duplicates().sort_values("id", ignore_index=True)
    return pairs, uniq["id"].to_numpy(), uniq["part"].to_numpy()


def routed_pair_verify(pairs: pd.DataFrame, items: ray.data.Dataset,
                       id_col: str, verify_fn,
                       num_partitions: int = 16,
                       as_dataset: bool = False):
    """Verify candidate `pairs` against per-item payload rows, fully
    distributed.

    ``items``: Dataset of payload rows carrying `id_col` plus payload
    columns (one or many rows per id; non-candidate ids are dropped by
    the routing join, but pre-filtering them upstream saves compute).
    ``verify_fn(payload_df, pairs_df) -> pd.DataFrame`` runs once per
    partition on that partition's payload rows (pandas; arrow list
    columns arrive as ndarray elements) and pairs; its frames are
    concatenated (and sorted by (id_a, id_b)) as the result.

    ``as_dataset=True`` keeps the verified pairs in the object store
    as a Dataset (unsorted) instead of landing them on the driver —
    the input to a downstream distributed consumer (connected
    components) on a dup-heavy corpus whose verified pair set itself
    outgrows driver comfort."""
    if pairs.empty:
        if as_dataset:
            return ray.data.from_pandas(
                pairs.iloc[0:0] if len(pairs.columns)
                else pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                   "id_b": pd.Series(dtype="int64")}))
        return pairs.iloc[0:0]
    pairs, nd_ids, nd_parts = assign_pair_parts(pairs, num_partitions)
    needs_ref = ray.put((nd_ids, nd_parts))
    pairs_ref = ray.put(pairs)

    def route(batch: pa.Table) -> pa.Table:
        ids_sorted, parts = fetch_broadcast(needs_ref)
        # a pandas-produced upstream batch carries dict-valued pandas
        # schema metadata, which makes the output schema unhashable and
        # defeats Ray's block-schema dedup (see sources/tables.py)
        batch = batch.replace_schema_metadata(None)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # for each batch row, the slice of needs entries with its id
        lo = np.searchsorted(ids_sorted, ids, side="left")
        hi = np.searchsorted(ids_sorted, ids, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            empty = batch.slice(0, 0)
            return empty.append_column("part",
                                       pa.array([], type=pa.int32()))
        take_idx = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        # flattened [lo[i], hi[i]) ranges, fully vectorized
        offs = np.arange(total, dtype=np.int64) \
            - np.repeat(np.cumsum(counts) - counts, counts)
        need_idx = np.repeat(lo, counts) + offs
        out = batch.take(pa.array(take_idx))
        return out.append_column(
            "part", pa.array(parts[need_idx].astype(np.int32)))

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        allp = fetch_broadcast(pairs_ref)
        p = int(g["part"].iloc[0])
        sub = allp[allp["part"] == p].drop(columns=["part"])
        return verify_fn(g.drop(columns=["part"]), sub)

    routed = items.map_batches(route, batch_format="pyarrow",
                               batch_size=8192, zero_copy_batch=True)
    out = exchange_map_groups(routed, "part", num_partitions,
                              verify_part, keep_part_col=True)
    if as_dataset:
        return out
    verified = out.to_pandas()
    if verified.empty:
        return verified
    return verified.sort_values(["id_a", "id_b"], ignore_index=True)


def shingle_arrays(rows: pd.DataFrame, id_col: str = "doc_id",
                   h_col: str = "h") -> dict[int, np.ndarray]:
    """(id, hash) rows -> {id: sorted distinct uint64 hash array},
    vectorized (sort + boundary split, no per-id groupby). Routed rows
    may repeat (an id needed by several of the partition's pairs ships
    once per pair-partition, and within a partition the exchange concat
    can interleave) -- dedup before splitting."""
    if rows.empty:
        return {}
    rows = rows.drop_duplicates([id_col, h_col]) \
        .sort_values([id_col, h_col], ignore_index=True)
    codes, uniq = pd.factorize(rows[id_col])
    bounds = np.flatnonzero(np.diff(codes)) + 1
    arrays = np.split(rows[h_col].to_numpy(), bounds)
    return {int(d): a for d, a in zip(uniq, arrays)}
