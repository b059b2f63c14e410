"""Deterministic sampling / dataset splitting for training-data
pipelines.

The split decision is a PURE FUNCTION of the record key -- bucket =
portable_hash64(key) % n_buckets -- so it is:

  * reproducible across runs, engines and cluster shapes (no RNG state,
    no coordination; the driver oracle re-derives it in SQL via DuckDB's
    ``md5_number_lower``);
  * stable under re-partitioning: a document keeps its split when data
    moves, which is the property a 100-TB train/val split actually
    needs (resumable jobs must not reshuffle membership);
  * embarrassingly parallel: one stateless ``map_batches`` stage, zero
    shuffle, zero driver state.

This is the hash-mod split every large-scale corpus pipeline uses for
held-out sets; stratified variants just salt the key with the stratum.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data

from .textstats import md5_hash64_series

#: default split layout: 100 hash buckets -> 90 train / 5 val / 5 test
SPLIT_BUCKETS = 100
SPLIT_EDGES = (("train", 90), ("val", 95), ("test", 100))


def assign_split(keys: pd.Series, buckets: int = SPLIT_BUCKETS,
                 edges=SPLIT_EDGES) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, split-label) per key -- vectorized except the inherent
    per-string digest. Keys are hashed as their decimal-string form so
    any engine can reproduce the bucket from the stored key alone."""
    b = (md5_hash64_series(keys.astype(str)) % np.uint64(buckets)) \
        .astype(np.int64)
    lab = np.empty(len(b), dtype=object)
    lo = 0
    for name, hi in edges:
        lab[(b >= lo) & (b < hi)] = name
        lo = hi
    return b, lab


def doc_split(sf_dir: str) -> ray.data.Dataset:
    """Train/val/test assignment for every document: one stateless
    zero-shuffle pass; (doc_id, bucket, split) per row."""
    from ..sources.tables import read_table
    ds = read_table(sf_dir, "documents", ["doc_id"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        bucket, split = assign_split(batch["doc_id"])
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "bucket": bucket, "split": split})

    return ds.map_batches(f, batch_format="pandas").sort("doc_id")


def doc_split_stratified(sf_dir: str) -> ray.data.Dataset:
    """Stratified split: the hash key is salted with the stratum
    (language), so each language's documents split 90/5/5
    INDEPENDENTLY -- per-stratum proportions hold even when strata are
    wildly imbalanced (the failure mode of unstratified hash splits on
    multilingual corpora). Same determinism/portability properties as
    doc_split."""
    from ..sources.tables import read_table
    ds = read_table(sf_dir, "documents", ["doc_id", "lang"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        salted = batch["lang"].fillna("") + ":" + batch["doc_id"].astype(str)
        bucket, split = assign_split(salted)
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "lang": batch["lang"],
                             "bucket": bucket, "split": split})

    return ds.map_batches(f, batch_format="pandas").sort("doc_id")


def doc_sample(ds: ray.data.Dataset, key_col: str, pct: int,
               buckets: int = SPLIT_BUCKETS) -> ray.data.Dataset:
    """Deterministic pct% sample of any Dataset by key-hash bucket:
    filter-in-place (no shuffle, no materialization), reproducible and
    disjoint-composable (pct=10 is a subset of pct=20)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        b = md5_hash64_series(batch[key_col].astype(str)) \
            % np.uint64(buckets)
        return batch[b < pct]

    return ds.map_batches(f, batch_format="pandas")
