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
        # null text counts as 0 tokens (same as chunk_documents'
        # fillna); an Arrow null here becomes a NaN that poisons the
        # partition's cumsum and crashes assign_bins' int cast
        n = pc.cast(pc.count_substring_regex(
            pc.fill_null(t["text"], ""), TOKEN_RE), pa.int64())
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


#: context-window chunking defaults: 64-token windows, 16-token overlap
CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


def chunk_documents(sf_dir: str, chunk: int = CHUNK_TOKENS,
                    overlap: int = CHUNK_OVERLAP) -> ray.data.Dataset:
    """Split every document into overlapping fixed-token context
    windows -- the chunking step in front of embedding / long-context
    training. Windows start every ``stride = chunk - overlap`` tokens;
    a trailing window is emitted only while it adds uncovered tokens
    (start < n_tokens - overlap), so no chunk is a subset of its
    predecessor. Empty docs emit nothing. Output: (doc_id, chunk_idx,
    tok_start, tok_end, chunk_text), chunk_text = the window's tokens
    joined by single spaces (token-canonical form, engine-portable).

    Scale shape: a single streamed flat-map -- per-doc windows are
    complete within the doc's batch, so no shuffle and no driver state.
    The inner loop is over CHUNK POSITIONS (bounded by the longest doc
    in the batch), not rows: position k slices+joins every doc with
    more than k chunks in one vectorized pandas call (the same
    steps-not-rows discipline as events_funnel)."""
    from ..sources.tables import read_table
    stride = chunk - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk")
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ws = batch["text"].fillna("").str.split()
        n = ws.str.len().astype(np.int64)
        keep = n > 0
        ws, n = ws[keep], n[keep]
        doc = batch["doc_id"][keep].to_numpy()
        n_chunks = np.maximum(1, -((n.to_numpy() - overlap) // -stride))
        frames = []
        for k in range(int(n_chunks.max()) if len(n_chunks) else 0):
            m = n_chunks > k
            start = k * stride
            frames.append(pd.DataFrame({
                "doc_id": doc[m],
                "chunk_idx": np.int64(k),
                "tok_start": np.int64(start),
                "tok_end": np.minimum(start + chunk, n.to_numpy()[m]),
                "chunk_text": ws[m].str[start:start + chunk].str.join(" ")
                               .to_numpy()}))
        if not frames:
            return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                 "chunk_idx": np.empty(0, np.int64),
                                 "tok_start": np.empty(0, np.int64),
                                 "tok_end": np.empty(0, np.int64),
                                 "chunk_text": np.empty(0, object)})
        out = pd.concat(frames, ignore_index=True)
        return out.astype({"doc_id": np.int64, "chunk_idx": np.int64,
                           "tok_start": np.int64, "tok_end": np.int64})

    return ds.map_batches(f, batch_format="pandas", batch_size=4096) \
             .sort(["doc_id", "chunk_idx"])
