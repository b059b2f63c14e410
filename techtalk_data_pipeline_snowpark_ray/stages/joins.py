"""Join strategies.

Two shapes, chosen by side size (SURVEY.md §2.4 J1-J6):

* **Broadcast hash join** (small side = dimension table): the small
  side is `ray.put` into the object store ONCE; stateless map tasks
  fetch it once per worker process (module-level cache keyed by
  ObjectRef -- never re-shipped per batch) and do a vectorized pandas
  merge per batch. No shuffle, no actor-pool CPU reservation (a pool
  sized near the CPU count starves the upstream read and deadlocks the
  pipeline -- observed on a 4-CPU session). The scale-correct plan for
  dims like nation/customer (J3/J5 "broadcast small dim").

* **Partitioned hash join** (both sides large): `Dataset.join`
  (hash-partitioned, arrow acero per partition). CAVEAT pinned by
  tests: Ray 2.49's join raises ArrowInvalid when a hash partition
  receives zero rows from one side (an empty schema-less table reaches
  acero), so it is only safe when both key spaces densely cover the
  partitions; with sparse/filtered keys use the broadcast join.

`broadcast_semi_join` covers semi/anti joins: broadcast the key set
and filter inside map_batches.
"""

from __future__ import annotations

from typing import Literal

import pandas as pd

import ray
import ray.data

#: per-worker-process cache of fetched broadcast objects (ObjectRef -> value)
_BROADCAST_CACHE: dict = {}


def fetch_broadcast(ref):
    """ray.get(ref), memoized per worker process."""
    val = _BROADCAST_CACHE.get(ref)
    if val is None:
        val = ray.get(ref)
        _BROADCAST_CACHE[ref] = val
    return val


def broadcast_join(left: ray.data.Dataset, right: "ray.data.Dataset | pd.DataFrame",
                   on: list[str] | str, right_on: list[str] | str | None = None,
                   how: Literal["inner", "left"] = "inner",
                   batch_size: int | None = 65536) -> ray.data.Dataset:
    """Hash-join `left` (arbitrarily large, streamed) against a small
    `right` without any shuffle."""
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    right_df = right.to_pandas() if isinstance(right, ray.data.Dataset) else right
    ref = ray.put(right_df)
    drop = [c for c in right_on if c not in on]

    def merge_batch(batch: pd.DataFrame) -> pd.DataFrame:
        rdf = fetch_broadcast(ref)
        out = batch.merge(rdf, how=how, left_on=on, right_on=right_on)
        return out.drop(columns=[c for c in drop if c in out.columns])

    return left.map_batches(merge_batch, batch_format="pandas",
                            batch_size=batch_size)


#: right sides at or under this measured size are broadcast; larger
#: ones take the partitioned hash join. ~256MB of pandas-materialized
#: dim comfortably fits every worker heap while covering all genuine
#: dimension tables; sf-proportional tables (customer!) outgrow it and
#: switch paths instead of silently becoming a driver-memory bomb.
BROADCAST_THRESHOLD_BYTES = 256 * 1024 * 1024


def auto_join(left: ray.data.Dataset, right: ray.data.Dataset,
              on: "list[str] | str", right_on: "list[str] | str | None" = None,
              how: Literal["inner", "left"] = "inner",
              num_partitions: int = 16,
              broadcast_threshold_bytes: int = BROADCAST_THRESHOLD_BYTES,
              ) -> ray.data.Dataset:
    """Size-gated join strategy chooser: measure the right side (it is
    materialized -- measuring the candidate small side IS the point),
    broadcast it when it fits, otherwise run the partitioned hash join.

    Partitioned-path guard for the Ray 2.49 empty-partition ArrowInvalid
    (a hash partition receiving zero rows from one side reaches acero as
    a schema-less table): partition count is clamped so the right side
    averages >=64 rows per partition, which keeps empties out of any
    densely-keyed join; genuinely sparse key spaces should stay on the
    broadcast path (raise the threshold) -- see module docstring."""
    right = right.materialize()
    rbytes = right.size_bytes() or 0
    if rbytes <= broadcast_threshold_bytes:
        return broadcast_join(left, right, on, right_on, how)
    on_l = [on] if isinstance(on, str) else list(on)
    on_r = on_l if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    nparts = max(1, min(num_partitions, right.count() // 64 or 1))
    return left.join(right, join_type=how, num_partitions=nparts,
                     on=tuple(on_l),
                     right_on=tuple(on_r) if on_r != on_l else None)


def broadcast_semi_join(left: ray.data.Dataset, keys, on: str,
                        anti: bool = False) -> ray.data.Dataset:
    """Semi (keep matching) / anti (keep non-matching) join against a
    broadcast key set (a Bloom filter at larger key cardinalities)."""
    ref = ray.put(frozenset(keys))

    def filter_batch(batch: pd.DataFrame) -> pd.DataFrame:
        mask = batch[on].isin(fetch_broadcast(ref))
        return batch[~mask] if anti else batch[mask]

    return left.map_batches(filter_batch, batch_format="pandas")
