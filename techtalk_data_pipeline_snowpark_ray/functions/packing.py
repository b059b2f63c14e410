"""Sequence packing: assign documents to fixed token-budget bins.

Training pipelines pack variable-length documents into ~context-length
bins to avoid padding waste. This implements the deterministic
PREFIX-SUM packing discipline: within a hash partition, documents in
doc_id order are laid end-to-end and a document belongs to bin
``floor(exclusive_prefix_tokens / budget)``. Properties that matter at
100 TB:

  * one stateless pass to count tokens + route, one per-partition
    vectorized cumsum -- no sequential driver loop, no global sort
    (ordering is only ever needed WITHIN a partition);
  * fully deterministic and engine-portable: the partition is the
    md5-bucket of the doc_id and the bin is a window cumsum, so the
    whole layout is re-derivable (and oracle-verified) in SQL;
  * bins target the budget with overflow bounded by one document
    (the straddling doc) -- the same bound greedy packing has, without
    greedy's sequential dependence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .textstats import TOKEN_RE, md5_hash64_series

PACK_PARTITIONS = 8
PACK_BUDGET_TOKENS = 2048


def pack_documents(sf_dir: str, budget: int = PACK_BUDGET_TOKENS,
                   num_partitions: int = PACK_PARTITIONS) -> ray.data.Dataset:
    """(doc_id, part, n_tokens, bin) for every document."""
    from ..sources.tables import read_table
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def count_route(t: pa.Table) -> pd.DataFrame:
        n = pc.cast(pc.count_substring_regex(t["text"], TOKEN_RE), pa.int64())
        df = pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            "n_tokens": n.to_numpy(zero_copy_only=False)})
        df["part"] = (md5_hash64_series(df["doc_id"].astype(str))
                      % np.uint64(num_partitions)).astype(np.int64)
        return df

    def assign_bins(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", ignore_index=True)
        prefix = g["n_tokens"].cumsum() - g["n_tokens"]
        g["bin"] = (prefix // budget).astype("int64")
        return g[["doc_id", "part", "n_tokens", "bin"]]

    from ..stages.exchange import exchange_map_groups
    routed = ds.map_batches(count_route, batch_format="pyarrow",
                            zero_copy_batch=True)
    return exchange_map_groups(routed, "part", num_partitions,
                               assign_bins, keep_part_col=True).sort("doc_id")
