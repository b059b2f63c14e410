"""End-to-end corpus curation: the composite pipeline a training-data
run actually executes, built from this engine's own operators --

    quality gate (token bounds)  ->  language gate (heuristic ID)
    ->  exact dedup (keep the min-doc_id representative)
    ->  deterministic split assignment

-- in ONE streamed pass + ONE exchange. Order matters at scale: both
gates run INSIDE the first map stage, so rows that fail never enter
the exchange (filter-then-dedup, the standard curation order); the
dedup key is the 64-bit content fingerprint, so only (doc_id, hash,
n_tokens) survive the map stage -- the text never leaves its batch.
Output: (doc_id, n_tokens, bucket, split) of the surviving corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..functions.sampling import assign_split
from ..functions.textstats import LangId, fingerprint_series
from ..stages.exchange import exchange_map_groups

CURATION_PARTITIONS = 16
MIN_TOKENS, MAX_TOKENS = 20, 80
KEEP_LANG = "en"


def curation_pipeline(sf_dir: str) -> ray.data.Dataset:
    from ..sources.tables import read_table
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    langid = LangId()

    def gate_and_route(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n_tok = text.str.count(langid.tok).astype("int64")
        lang = langid(batch, n_tok=n_tok)["lang_pred"]
        keep = ((n_tok >= MIN_TOKENS) & (n_tok <= MAX_TOKENS)
                & (np.asarray(lang) == KEEP_LANG))
        out = pd.DataFrame({
            "doc_id": batch["doc_id"][keep],
            "n_tokens": n_tok[keep],
            "h": fingerprint_series(text[keep])})
        out["part"] = (out["h"].to_numpy().astype(np.uint64)
                       % np.uint64(CURATION_PARTITIONS)).astype(np.int32)
        return out

    def dedup_and_split(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        g = g.drop_duplicates("h", keep="first")
        bucket, split = assign_split(g["doc_id"])
        return pd.DataFrame({"doc_id": g["doc_id"],
                             "n_tokens": g["n_tokens"],
                             "bucket": bucket, "split": split})

    routed = ds.map_batches(gate_and_route, batch_format="pandas",
                            batch_size=8192)
    return exchange_map_groups(routed, "part", CURATION_PARTITIONS,
                               dedup_and_split).sort("doc_id")


def export_training_set(sf_dir: str, out_dir: str,
                        num_buckets: int = 16) -> dict[int, int]:
    """The full curation -> resumable export composition: run the
    curation pipeline and write the surviving manifest under
    ``out_dir`` as atomic key-hash bucket directories. Killing the
    export mid-run and re-invoking writes only the missing buckets
    (see pipelines/sinks.py); re-invoking after success is a no-op."""
    from .sinks import write_partitioned
    return write_partitioned(curation_pipeline(sf_dir), out_dir,
                             key="doc_id", num_buckets=num_buckets)
