"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (the part that matters at 100 TB):
  * exact: content-hash per batch -> shuffle (hash, doc_id[, text]) ->
    per-group first. Only the hash + id move when verification is off.
  * MinHash-LSH: shingle -> K minhashes -> B bands -> emit one
    (band_id, band_hash, doc_id) row per band -> groupby bands ->
    candidate pairs -> exact-Jaccard verify on the candidates only.
    The all-pairs O(n^2) never happens; the shuffle carries B small
    ints per doc instead of the text.
  * SimHash: one 64-bit sketch per doc; near-dup = small Hamming
    distance (bucketed by bit-bands, same LSH shape).
  * n-gram Jaccard (brute): exact baseline on a deterministic subset,
    used to validate MinHash recall in tests.

Vectorization: shingle explosion via pandas (cython), shingle/token
hashing via polars xxhash, the K permutations via numpy
`np.minimum.at` over group codes -- no Python loop over rows.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .textstats import fingerprint_series

# MinHash parameters: K = B*R signatures; with R=2, B=32 the candidate
# probability at Jaccard j is 1-(1-j^2)^32 (~0.999 at j=0.5).
MINHASH_K = 64
LSH_BANDS = 32
LSH_ROWS = 2
_MERSENNE = np.uint64((1 << 61) - 1)
NGRAM = 2
JACCARD_THRESHOLD = 0.5


def _docs(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=columns)


# -- exact dedup -----------------------------------------------------------

def exact_dedup_documents(sf_dir: str) -> ray.data.Dataset:
    """One representative (min doc_id) per distinct text + copy count.

    Hash-partition + per-group first (O3 `dropDuplicates` parity,
    SampleCrud.scala:12, generalized to content dedup). The shuffle key
    is the 64-bit content hash; text is carried here only because the
    small-scale oracle verifies exact-text groups -- at 100 TB you ship
    (hash, doc_id) and resolve rare collisions in a second pass.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["h"] = fingerprint_series(batch["text"])
        return batch

    def first_per_text(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_copies": pd.Series(dtype="int64")})
        out = g.groupby("text", sort=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        return out.reset_index(drop=True)

    return (ds.map_batches(add_hash, batch_format="pandas", batch_size=8192)
              .groupby("h").map_groups(first_per_text, batch_format="pandas")
              .sort("doc_id"))


# -- shingling + minhash ---------------------------------------------------

def shingle_frame(batch: pd.DataFrame, n: int = NGRAM) -> pd.DataFrame:
    """Explode documents into word n-gram shingles: (doc_id, shingle).
    pandas str.split + list slicing (cython); one row per shingle."""
    toks = batch["text"].fillna("").str.split()
    grams = toks.map(lambda ws: [" ".join(ws[i:i + n]) for i in range(max(len(ws) - n + 1, 1))])
    out = pd.DataFrame({"doc_id": batch["doc_id"], "sh": grams}).explode("sh", ignore_index=True)
    out["sh"] = out["sh"].fillna("")
    return out


def _perm_params() -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(1234)
    a = rng.integers(1, _MERSENNE, size=MINHASH_K, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, _MERSENNE, size=MINHASH_K, dtype=np.uint64)
    return a, b


class MinHasher:
    """map_batches actor: text batch -> one row per (doc, band):
    (doc_id, band_id, band_hash). Permutation params built once."""

    def __init__(self):
        self.a, self.b = _perm_params()

    def signatures(self, batch: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        """Returns (doc_ids[D], sigs[D, K]) for the batch."""
        sh = shingle_frame(batch)
        codes, uniq_docs = pd.factorize(sh["doc_id"])
        base = fingerprint_series(sh["sh"]).astype(np.uint64)
        n_docs = len(uniq_docs)
        sigs = np.full((n_docs, MINHASH_K), np.iinfo(np.uint64).max, dtype=np.uint64)
        for k in range(MINHASH_K):
            vals = (self.a[k] * base + self.b[k]) % _MERSENNE
            np.minimum.at(sigs[:, k], codes, vals)
        return np.asarray(uniq_docs, dtype=np.int64), sigs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids, sigs = self.signatures(batch)
        # combine each band's R rows into one 64-bit band hash
        band_sigs = sigs.reshape(len(doc_ids), LSH_BANDS, LSH_ROWS)
        mix = np.uint64(0x9E3779B97F4A7C15)
        bh = np.zeros((len(doc_ids), LSH_BANDS), dtype=np.uint64)
        for r in range(LSH_ROWS):
            bh ^= (band_sigs[:, :, r] + mix) * np.uint64(0xBF58476D1CE4E5B9)
            bh = (bh << np.uint64(7)) | (bh >> np.uint64(57))
        return pd.DataFrame({
            "doc_id": np.repeat(doc_ids, LSH_BANDS),
            "band_id": np.tile(np.arange(LSH_BANDS, dtype=np.int32), len(doc_ids)),
            "band_hash": (bh >> np.uint64(1)).astype(np.int64).ravel(),
        })


def _candidate_pairs(sf_dir: str) -> pd.DataFrame:
    """LSH candidate pairs (distinct, a<b), driver-collected (the
    candidate set is tiny relative to the corpus by construction)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    bands = ds.map_batches(MinHasher, batch_format="pandas", batch_size=4096,
                           concurrency=2)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2 or len(ids) > 200:   # guard degenerate buckets
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        iu = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"id_a": ids[iu[0]], "id_b": ids[iu[1]]})

    cand = (bands.groupby(["band_id", "band_hash"])
                 .map_groups(pairs_in_bucket, batch_format="pandas"))
    df = cand.to_pandas()
    return df.drop_duplicates(ignore_index=True) if len(df) else df


def _shingle_sets(sf_dir: str, doc_ids: set[int]) -> dict[int, set]:
    """Shingle sets for a SMALL id set (verification side-channel)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    import ray
    ids_ref = ray.put(doc_ids)

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        import ray as _r
        keep = batch[batch["doc_id"].isin(_r.get(ids_ref))]
        if keep.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "sh": pd.Series(dtype="object")})
        sh = shingle_frame(keep)
        return sh.groupby("doc_id", as_index=False).agg(sh=("sh", lambda s: list(set(s))))

    rows = ds.map_batches(extract, batch_format="pandas", batch_size=8192).take_all()
    return {int(r["doc_id"]): set(r["sh"]) for r in rows}


def verify_jaccard(pairs: pd.DataFrame, shingles: dict[int, set],
                   threshold: float) -> pd.DataFrame:
    out = []
    for a, b in pairs[["id_a", "id_b"]].itertuples(index=False):
        A, B = shingles.get(int(a)), shingles.get(int(b))
        if not A or not B:
            continue
        j = len(A & B) / len(A | B)
        if j >= threshold:
            out.append((int(a), int(b)))
    return pd.DataFrame(out, columns=["id_a", "id_b"]).sort_values(
        ["id_a", "id_b"], ignore_index=True)


def minhash_near_dup(sf_dir: str, threshold: float = JACCARD_THRESHOLD) -> pd.DataFrame:
    """Near-duplicate pairs: MinHash -> banded LSH -> candidate pairs ->
    exact-Jaccard verification of candidates only."""
    cand = _candidate_pairs(sf_dir)
    if cand.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64")})
    ids = set(cand["id_a"]).union(cand["id_b"])
    shingles = _shingle_sets(sf_dir, ids)
    return verify_jaccard(cand, shingles, threshold)


def ngram_jaccard_pairs(sf_dir: str, modulus: int = 20,
                        threshold: float = JACCARD_THRESHOLD) -> pd.DataFrame:
    """Exact brute-force n-gram Jaccard on the deterministic subset
    doc_id % modulus == 0 (the all-pairs baseline the sketches are
    validated against)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def subset(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % modulus == 0))

    sub = ds.map_batches(subset, batch_format="pyarrow", zero_copy_batch=True)
    docs = sub.to_pandas()
    sh = {int(r.doc_id): set(" ".join(ws)
                             for ws in zip(*[str(r.text).split()[i:] for i in range(NGRAM)]))
          for r in docs.itertuples()}
    ids = sorted(sh)
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
    return verify_jaccard(pd.DataFrame(pairs, columns=["id_a", "id_b"]), sh, threshold)


# -- simhash ---------------------------------------------------------------

class SimHasher:
    """map_batches actor: 64-bit SimHash per doc over token hashes."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = pd.DataFrame({"doc_id": batch["doc_id"],
                             "tok": batch["text"].fillna("").str.split()}) \
                 .explode("tok", ignore_index=True)
        toks["tok"] = toks["tok"].fillna("")
        codes, uniq = pd.factorize(toks["doc_id"])
        h = fingerprint_series(toks["tok"]).astype(np.uint64)
        acc = np.zeros((len(uniq), 64), dtype=np.int64)
        for b in range(64):
            bit = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64) * 2 - 1
            np.add.at(acc[:, b], codes, bit)
        bits = (acc > 0).astype(np.uint64)
        sim = np.zeros(len(uniq), dtype=np.uint64)
        for b in range(64):
            sim |= bits[:, b] << np.uint64(b)
        return pd.DataFrame({"doc_id": np.asarray(uniq, dtype=np.int64),
                             "simhash": (sim >> np.uint64(1)).astype(np.int64)})


def simhash_documents(sf_dir: str) -> ray.data.Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(SimHasher, batch_format="pandas", batch_size=4096,
                          concurrency=2).sort("doc_id")
