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
import pyarrow.compute as pc

import ray.data

from ..stages.exchange import exchange_map_groups
from .textstats import fingerprint_series

# MinHash parameters: K = B*R signatures. Candidate probability at
# Jaccard j is 1-(1-j^R)^B: with R=3, B=21 that's 0.94 at j=0.5 and
# ~0.26% at j=0.05 (the background similarity of this corpus), i.e.
# high recall at the threshold with ~400x fewer false candidates than
# R=2 banding. Exact-Jaccard verification then makes precision 1.0.
MINHASH_K = 63
LSH_BANDS = 21
LSH_ROWS = 3
_MERSENNE = np.uint64((1 << 61) - 1)
NGRAM = 2
JACCARD_THRESHOLD = 0.5
#: shuffle partitions for dedup aggregates/groupbys (Ray's default of
#: 200 spins 200 aggregator actors -- pure startup cost at these sizes;
#: on a real cluster scale this with cores)
AGG_PARTITIONS = 16
#: LSH buckets above this size switch from all-pairs to star sampling
#: (every member paired with the bucket's min id). A mega-bucket is, by
#: construction, one heavily-duplicated content cluster, and the star
#: keeps full cluster membership with n-1 pairs instead of n^2/2.
MAX_BUCKET_PAIRS = 200


def _docs(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    from ..sources.tables import read_table
    return read_table(sf_dir, "documents", columns)


# -- exact dedup -----------------------------------------------------------

def exact_dedup_documents(sf_dir: str) -> ray.data.Dataset:
    """One representative (min doc_id) per distinct text + copy count.

    Hash-partition + per-group first (O3 `dropDuplicates` parity,
    SampleCrud.scala:12, generalized to content dedup). Two-phase,
    fully distributed:

      1. within-batch combiner: one (hash, min doc_id, count) row per
         distinct text per batch -- the text itself never leaves the
         batch;
      2. partials hash-route by content hash into AGG_PARTITIONS
         partitions and each partition reduces its own keys with ONE
         vectorized pandas groupby -- the final reduce runs where the
         partition lives; the driver never sees per-document rows (at
         100 TB the per-batch partials are billions of rows, so a
         driver reduce is not an option). The routed map_groups shape
         is deliberate: Ray 2.49's hash-shuffle `.aggregate()` spins
         `num_partitions` aggregator actors per call (~0.7s each of
         pure startup), while the sort-based map_groups shuffle moves
         the same pre-aggregated rows for milliseconds.

    64-bit xxhash collisions would merge two distinct texts; at the
    corpus sizes this targets (~2^40 docs vs 2^64 space) the expected
    collision count is ~2^16 of 2^40 -- the scale path re-checks texts
    within h-groups in a second keyed pass when that matters.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: NULL text is a legitimate (dedupable) group --
        # SQL GROUP BY keeps it, so must we
        out = batch.groupby("text", sort=False, as_index=False,
                            dropna=False).agg(
            doc_id=("doc_id", "min"), n=("doc_id", "size"))
        h = fingerprint_series(out["text"])
        # NULL text is its own group, distinct from '' (SQL semantics);
        # real fingerprints are non-negative, so -1 cannot collide
        out["h"] = np.where(out["text"].isna().to_numpy(),
                            np.int64(-1), h)
        out["part"] = (out["h"].to_numpy().astype(np.uint64)
                       % np.uint64(AGG_PARTITIONS)).astype(np.int32)
        return out[["part", "h", "doc_id", "n"]]

    def reduce_partition(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("h", sort=False, as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("n", "sum"))
        return out[["doc_id", "n_copies"]]

    routed = ds.map_batches(partial, batch_format="pandas", batch_size=8192)
    return exchange_map_groups(routed, "part", AGG_PARTITIONS,
                               reduce_partition).sort("doc_id")


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
        # explode keeps each doc's shingles contiguous, so codes are
        # nondecreasing and the segmented reduceat (1.5x faster than the
        # unbuffered minimum.at) applies; fall back if that ever breaks
        contiguous = bool((np.diff(codes) >= 0).all()) if len(codes) else True
        starts = np.flatnonzero(np.diff(codes, prepend=-1)) if contiguous else None
        for k in range(MINHASH_K):
            vals = (self.a[k] * base + self.b[k]) % _MERSENNE
            if contiguous:
                sigs[:, k] = np.minimum.reduceat(vals, starts)
            else:
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


#: per-worker-process SimHasher cache keyed by token-hash mode
_SIMHASHERS: dict = {}


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                         "id_b": pd.Series(dtype="int64")})


def _partition_pairs(part: pd.DataFrame) -> pd.DataFrame:
    """Emit candidate pairs for EVERY LSH bucket hash-routed to this
    partition, fully vectorized (factorize + bincount bucket boundaries;
    one numpy triu per multi-occupant bucket). Singleton buckets -- the
    overwhelming majority -- cost nothing but the factorize. Runs
    inside groupby(partition).map_groups: one Python call per PARTITION,
    never per bucket (a per-bucket callable at ~1 group/doc/band is
    pure call overhead).

    Mega-buckets (one heavily duplicated content cluster) above
    MAX_BUCKET_PAIRS fall back to star pairing against the min id --
    cluster membership survives with n-1 pairs -- and are reported in
    the `sampled` column so the cap is never silent."""
    if part.empty:
        return _empty_pairs().assign(sampled=pd.Series(dtype="int64"))
    mm = part.drop_duplicates(["band_id", "band_hash", "doc_id"]) \
             .sort_values(["band_id", "band_hash", "doc_id"],
                          ignore_index=True)
    mix = (mm["band_id"].to_numpy().astype(np.int64) * np.int64(1_000_003)
           ^ mm["band_hash"].to_numpy().astype(np.int64))
    codes = pd.factorize(mix)[0]
    ids = mm["doc_id"].to_numpy(dtype=np.int64)
    sizes = np.bincount(codes)
    starts = np.zeros(len(sizes), dtype=np.int64)
    np.cumsum(sizes[:-1], out=starts[1:])
    pairs = []
    two = sizes == 2
    if two.any():
        s2 = starts[two]
        pairs.append(pd.DataFrame({"id_a": ids[s2], "id_b": ids[s2 + 1],
                                   "sampled": np.int64(0)}))
    for g in np.flatnonzero(sizes > 2):
        u = ids[starts[g]: starts[g] + sizes[g]]
        if len(u) > MAX_BUCKET_PAIRS:
            pairs.append(pd.DataFrame({"id_a": np.repeat(u[0], len(u) - 1),
                                       "id_b": u[1:],
                                       "sampled": np.int64(len(u))}))
        else:
            iu = np.triu_indices(len(u), 1)
            pairs.append(pd.DataFrame({"id_a": u[iu[0]], "id_b": u[iu[1]],
                                       "sampled": np.int64(0)}))
    if not pairs:
        return _empty_pairs().assign(sampled=pd.Series(dtype="int64"))
    return pd.concat(pairs, ignore_index=True)


def _candidate_pairs(sf_dir: str) -> pd.DataFrame:
    """LSH candidate pairs (distinct, a<b).

    Fully distributed: band rows hash-route by bucket key into
    AGG_PARTITIONS coarse partitions (each bucket lands wholly in one
    partition) and each partition emits its buckets' pairs vectorized
    -- no driver-side bucket counting, no per-row membership loop, no
    per-bucket Python call. Only the emitted pairs (tiny relative to
    the corpus by LSH construction) reach the driver, where cross-band
    duplicates are dropped."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    class BandRouter(MinHasher):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = MinHasher.__call__(self, batch)
            bh = out["band_hash"].to_numpy().astype(np.uint64)
            bi = out["band_id"].to_numpy().astype(np.uint64)
            out["part"] = ((bh * np.uint64(0x9E3779B97F4A7C15) + bi)
                           % np.uint64(AGG_PARTITIONS)).astype(np.int32)
            return out

    bands = ds.map_batches(BandRouter(), batch_format="pandas",
                           batch_size=4096)

    def emit(part: pd.DataFrame) -> pd.DataFrame:
        return _partition_pairs(part)

    pairs = exchange_map_groups(bands, "part", AGG_PARTITIONS,
                                emit).to_pandas()
    if pairs.empty:
        return _empty_pairs()
    n_mega = int((pairs["sampled"] > 0).sum())
    if n_mega:
        import logging
        logging.getLogger(__name__).warning(
            "minhash LSH: %d mega-bucket star-sampled pair(s) (bucket "
            "sizes up to %d > cap %d); recall within those clusters is "
            "via the star representative", n_mega,
            int(pairs["sampled"].max()), MAX_BUCKET_PAIRS)
    return pairs[["id_a", "id_b"]].drop_duplicates(ignore_index=True)


def _candidate_shingle_rows(sf_dir: str, doc_ids: np.ndarray) -> "ray.data.Dataset":
    """(doc_id, h) distinct-shingle-hash rows of the candidate docs, as
    a distributed Dataset. Hashing the shingles keeps the routed payload
    ints instead of strings (identical Jaccard modulo 2^-64 collisions,
    ~10x smaller, zero-copy batch math at verify time); the id filter is
    a broadcast numpy array fetched once per worker (memoized). The rows
    never land on the driver -- they route straight into the pair-verify
    partitions (stages/pairverify.py)."""
    import ray

    from ..stages.joins import fetch_broadcast
    ds = _docs(sf_dir, ["doc_id", "text"])
    ids_ref = ray.put(np.asarray(doc_ids, dtype=np.int64))

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[batch["doc_id"].isin(fetch_broadcast(ids_ref))]
        if keep.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "h": pd.Series(dtype="int64")})
        sh = shingle_frame(keep)
        sh["h"] = fingerprint_series(sh["sh"])
        return sh[["doc_id", "h"]].drop_duplicates(ignore_index=True)

    return ds.map_batches(extract, batch_format="pandas", batch_size=8192)


def verify_jaccard(pairs: pd.DataFrame, shingles: dict[int, np.ndarray],
                   threshold: float) -> pd.DataFrame:
    """Exact Jaccard over sorted distinct-hash arrays (sorted-merge
    intersection per pair; the candidate pair count is tiny relative to
    the corpus by LSH construction)."""
    out = []
    for a, b in pairs[["id_a", "id_b"]].itertuples(index=False):
        A, B = shingles.get(int(a)), shingles.get(int(b))
        if A is None or B is None or not len(A) or not len(B):
            continue
        inter = np.intersect1d(A, B, assume_unique=True).size
        j = inter / (len(A) + len(B) - inter)
        if j >= threshold:
            out.append((int(a), int(b)))
    return pd.DataFrame(out, columns=["id_a", "id_b"]).sort_values(
        ["id_a", "id_b"], ignore_index=True)


def minhash_near_dup(sf_dir: str, threshold: float = JACCARD_THRESHOLD,
                     as_dataset: bool = False):
    """Near-duplicate pairs: MinHash -> banded LSH -> per-bucket pair
    emission (distributed) -> exact-Jaccard verification, ALSO
    distributed: pairs hash-assign to verify partitions and each
    candidate doc's shingle-hash rows route to exactly the partitions
    of its pairs (stages/pairverify.py), so the shingle payload moves
    object store -> object store and never assembles on the driver.

    Driver footprint is the candidate pair LIST only (ids, no text, no
    shingles): the corpus-sized stages (shingling, minhash, bucket pair
    emission, shingle extraction) all run as Dataset stages.
    ``as_dataset=True`` keeps even the VERIFIED pair list in the
    object store (the clustering consumer streams it straight into the
    distributed connected components)."""
    from ..stages.pairverify import routed_pair_verify, shingle_arrays

    cand = _candidate_pairs(sf_dir)
    if cand.empty:
        return ray.data.from_pandas(_empty_pairs()) if as_dataset \
            else _empty_pairs()
    ids = np.unique(np.concatenate([cand["id_a"].to_numpy(dtype=np.int64),
                                    cand["id_b"].to_numpy(dtype=np.int64)]))
    items = _candidate_shingle_rows(sf_dir, ids)

    def verify_fn(payload: pd.DataFrame, pairs: pd.DataFrame) -> pd.DataFrame:
        return verify_jaccard(pairs, shingle_arrays(payload), threshold)

    out = routed_pair_verify(cand, items, "doc_id", verify_fn,
                             num_partitions=AGG_PARTITIONS,
                             as_dataset=as_dataset)
    if as_dataset:
        return out
    return out if len(out) else _empty_pairs()


def ngram_jaccard_pairs(sf_dir: str, modulus: int = 2,
                        threshold: float = JACCARD_THRESHOLD) -> pd.DataFrame:
    """Exact brute-force n-gram Jaccard on the deterministic subset
    doc_id % modulus == 0 (the all-pairs baseline the sketches are
    validated against). modulus=2 keeps the subset dense enough that
    planted near-dup pairs survive into it (modulus 20 left the check
    vacuous: zero pairs at every sf)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def subset(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % modulus == 0))

    sub = ds.map_batches(subset, batch_format="pyarrow", zero_copy_batch=True)
    docs = sub.to_pandas()
    # all-pairs Jaccard as one incidence matmul: M[doc, shingle] in
    # {0,1}, |A∩B| = M M^T, |A∪B| = |A|+|B|-|A∩B| -- fully vectorized
    # (the per-pair Python loop took 143s at sf0.1; this takes <1s).
    # Row-blocked so the intersect matrix never exceeds ~256MB.
    sh = shingle_frame(docs).drop_duplicates()
    dcodes, uniq_docs = pd.factorize(sh["doc_id"])
    scodes, _ = pd.factorize(sh["sh"])
    n_d = len(uniq_docs)
    if n_d < 2:
        return _empty_pairs()
    M = np.zeros((n_d, int(scodes.max()) + 1), dtype=np.float32)
    M[dcodes, scodes] = 1.0
    sizes = M.sum(axis=1)
    ids = np.asarray(uniq_docs, dtype=np.int64)
    rows_a, rows_b = [], []
    step = max(1, (256 << 20) // (4 * n_d))
    for r0 in range(0, n_d, step):
        r1 = min(r0 + step, n_d)
        inter = M[r0:r1] @ M.T
        union = sizes[r0:r1, None] + sizes[None, :] - inter
        J = np.divide(inter, union, out=np.zeros_like(inter),
                      where=union > 0)
        ia, ib = np.nonzero(J >= threshold)
        keep = (ia + r0) < ib          # each unordered pair once
        rows_a.append(ids[ia[keep] + r0])
        rows_b.append(ids[ib[keep]])
    a = np.concatenate(rows_a) if rows_a else np.array([], dtype=np.int64)
    b = np.concatenate(rows_b) if rows_b else np.array([], dtype=np.int64)
    out = pd.DataFrame({"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)})
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


# -- near-dup clustering (the step that completes a dedup pipeline) --------

# Past this many pairs the CLUSTERING leaves the driver: large graphs
# run alternating large-star/small-star rounds on the hash exchange
# (Kiveris et al., "Connected Components in MapReduce and Beyond",
# 2014) instead of serial union-find — removing the union-find's
# resident working set and its O(E) single-thread pass. (The pair
# LIST itself still arrives driver-resident from today's verify
# stage; a fully-streamed caller passes a Dataset to
# cluster_pairs_distributed and the edges never land on the driver.)
# 2M int64 pairs = 32 MB — well inside driver comfort.
CC_DISTRIBUTED_PAIRS = 2_000_000


def _star_partition(df: pd.DataFrame, large: bool) -> pd.DataFrame:
    """One partition's star step. Rows are directed (c=center,
    n=neighbor); every neighbor of a center is co-located by the
    exchange. Emits canonical undirected edges (a=min, b=max),
    deduped within the partition."""
    gmin = df.groupby("c")["n"].transform("min").to_numpy()
    c = df["c"].to_numpy()
    n = df["n"].to_numpy()
    if large:
        # large-star: m = min(Γ(c) ∪ {c}); link every neighbor
        # STRICTLY larger than the center to m
        m = np.minimum(gmin, c)
        keep = n > c
        a, b = m[keep], n[keep]
    else:
        # small-star: centers are each edge's max endpoint, so all
        # neighbors < c and m = min(Γ(c)); link the other neighbors
        # AND the center itself to m
        keep = n != gmin
        a = np.concatenate([gmin[keep], gmin])
        b = np.concatenate([n[keep], c])
    out = pd.DataFrame({"a": np.minimum(a, b), "b": np.maximum(a, b)})
    out = out[out["a"] != out["b"]].drop_duplicates()
    return out.reset_index(drop=True)


def _star_round(edges: "ray.data.Dataset", num_partitions: int,
                large: bool) -> "ray.data.Dataset":
    """Route each directed (center, neighbor) row to hash(center) % P
    and apply the star step per partition."""
    mix = np.uint64(0x9E3779B97F4A7C15)

    def direct(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        if large:                       # both directions: Γ is symmetric
            c = np.concatenate([a, b])
            n = np.concatenate([b, a])
        else:                           # orient toward the larger node
            c = np.maximum(a, b)
            n = np.minimum(a, b)
        part = ((c.astype(np.uint64) * mix) >> np.uint64(33)) \
            % np.uint64(num_partitions)
        return pa.table({"c": c, "n": n,
                         "part": part.astype(np.int64)})

    routed = edges.map_batches(direct, batch_format="pyarrow",
                               zero_copy_batch=True)
    return exchange_map_groups(routed, "part", num_partitions,
                               lambda g: _star_partition(g, large))


def _edge_signature(edges: "ray.data.Dataset") -> tuple[int, int, int]:
    """(count, xor checksum, modular-sum checksum) of a canonical edge
    set — the fixpoint detector for the star rounds. Only three ints
    reach the driver per round. Two INDEPENDENT order-insensitive
    checksums: xor alone cancels even-multiplicity duplicate edges
    (the per-partition-only dedup can produce cross-partition repeats),
    so a colliding pair of different edge sets would also need an
    identical mod-2^64 sum of the same 57-bit hashes — the sum weights
    multiplicity, which is exactly what xor discards."""
    mix = np.uint64(0x9E3779B97F4A7C15)

    def sig(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (a * mix + b) * mix >> np.uint64(7)
        empty = t.num_rows == 0
        with np.errstate(over="ignore"):
            tot = int(np.add.reduce(h)) if not empty else 0
        return pa.table({"cnt": [t.num_rows],
                         "s": [int(np.bitwise_xor.reduce(h))
                               if not empty else 0],
                         "m": pa.array([tot % (1 << 64)],
                                       type=pa.uint64())})

    parts = edges.map_batches(sig, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    if not len(parts):
        return (0, 0, 0)
    with np.errstate(over="ignore"):
        modsum = int(np.add.reduce(
            parts["m"].to_numpy(dtype=np.uint64))) % (1 << 64)
    return (int(parts["cnt"].sum()),
            int(np.bitwise_xor.reduce(parts["s"].to_numpy(dtype=np.uint64))),
            modsum)


def cluster_pairs_distributed(pairs: pd.DataFrame,
                              num_partitions: int = AGG_PARTITIONS,
                              max_rounds: int = 64) -> pd.DataFrame:
    """Connected components as alternating large-star / small-star
    min-label propagation on the hash exchange: each round routes
    directed edges by center node, takes per-center min labels, and
    re-emits a (weakly smaller) edge set; the fixpoint is a forest of
    stars centered at each component's min doc_id. O(log n) rounds,
    edge set never leaves the object store between rounds, and the
    driver sees only a (count, checksum) pair per round plus the final
    star edges — which are O(nodes), the same size as the returned
    mapping itself.

    Accepts the candidate-pair frame the LSH verify stage emits today
    (driver-resident — the gate then removes the union-find's working
    set and its serial O(E) pass, not the pair list itself) OR a
    Dataset of (id_a, id_b) rows for a fully-streamed caller where the
    edge set never lands on the driver at all."""
    if isinstance(pairs, ray.data.Dataset):
        edges = pairs.map_batches(
            lambda t: pa.table(
                {"a": pc.cast(t["id_a"], pa.int64()),
                 "b": pc.cast(t["id_b"], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
        if edges.count() == 0:
            return cluster_pairs(_empty_pairs())
    else:
        if pairs.empty:
            return cluster_pairs(pairs.iloc[:0])
        edges = ray.data.from_pandas(pd.DataFrame({
            "a": pairs["id_a"].to_numpy(dtype=np.int64),
            "b": pairs["id_b"].to_numpy(dtype=np.int64)}))
    prev = None
    for _ in range(max_rounds):
        edges = _star_round(edges, num_partitions, large=True)
        edges = _star_round(edges, num_partitions,
                            large=False).materialize()
        cur = _edge_signature(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"large-star/small-star did not converge in {max_rounds} "
            "rounds — edge signature still moving")
    stars = edges.to_pandas()
    reps = np.unique(stars["a"].to_numpy(dtype=np.int64))
    return pd.DataFrame({
        "doc_id": np.concatenate([stars["b"].to_numpy(dtype=np.int64),
                                  reps]),
        "cluster_rep": np.concatenate(
            [stars["a"].to_numpy(dtype=np.int64), reps]),
    }).drop_duplicates().sort_values("doc_id", ignore_index=True)


def cluster_pairs(pairs: pd.DataFrame) -> pd.DataFrame:
    """Connected components over near-dup pairs -> (doc_id,
    cluster_rep) with rep = the component's min doc_id (the canonical
    survivor; every other member is droppable).

    Small pair sets run union-find with path compression on the
    driver — candidate-proportional by LSH construction, the same size
    class the pair materialization itself already is. Past
    CC_DISTRIBUTED_PAIRS the graph is clustered distributed instead
    (`cluster_pairs_distributed`): alternating large-star/small-star
    min-label propagation on the hash exchange, whose fixpoint this
    union-find computes on one node."""
    if len(pairs) > CC_DISTRIBUTED_PAIRS:
        return cluster_pairs_distributed(pairs)
    if pairs.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "cluster_rep": pd.Series(dtype="int64")})
    ids = np.unique(np.concatenate([pairs["id_a"].to_numpy(dtype=np.int64),
                                    pairs["id_b"].to_numpy(dtype=np.int64)]))
    a = np.searchsorted(ids, pairs["id_a"].to_numpy(dtype=np.int64))
    b = np.searchsorted(ids, pairs["id_b"].to_numpy(dtype=np.int64))
    parent = np.arange(len(ids))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i, j in zip(a, b):
        ri, rj = find(i), find(j)
        if ri != rj:
            # union by min index: ids are sorted, so the smaller index
            # IS the smaller doc_id -> roots stay the component minimum
            if ri < rj:
                parent[rj] = ri
            else:
                parent[ri] = rj
    roots = np.fromiter((find(i) for i in range(len(ids))),
                        dtype=np.int64, count=len(ids))
    return pd.DataFrame({"doc_id": ids, "cluster_rep": ids[roots]}) \
        .sort_values("doc_id", ignore_index=True)


def minhash_dedup_clusters(sf_dir: str,
                           threshold: float = JACCARD_THRESHOLD) -> pd.DataFrame:
    """Near-duplicate CLUSTERS: minhash pairs -> connected components
    -> (doc_id, cluster_rep) for every document in at least one pair.
    Dropping rows where doc_id != cluster_rep is the dedup action.

    The verified pair list stays in the object store end-to-end: past
    CC_DISTRIBUTED_PAIRS it streams straight into the distributed
    large-star/small-star rounds and the driver never holds the edge
    set — only the per-doc cluster mapping it returns."""
    pairs_ds = minhash_near_dup(sf_dir, threshold, as_dataset=True)
    n = pairs_ds.count()
    if n > CC_DISTRIBUTED_PAIRS:
        return cluster_pairs_distributed(pairs_ds)
    pairs = pairs_ds.to_pandas()
    return cluster_pairs(pairs if len(pairs) else _empty_pairs())


# -- simhash ---------------------------------------------------------------

class SimHasher:
    """map_batches actor: 64-bit SimHash per doc over token hashes.

    ``token_hash="md5"`` uses the portable md5-derived token hash
    (DuckDB ``md5_number_lower`` parity -> the sketch itself is
    oracle-verifiable value-exactly); the default ``"xx64"`` is the
    faster engine-internal polars xxhash. The md5 path hashes each
    DISTINCT token once per batch and memoizes the vocabulary across
    batches in the actor (__init__-once ST1 lifecycle), so per-token
    cost amortizes toward a dict lookup on natural-language corpora."""

    #: memo cap: the worker process outlives tasks AND queries, so an
    #: open-ended vocabulary (URLs, ids, typos) would otherwise grow
    #: the dict forever — at the cap the memo resets (it is a pure
    #: cache; correctness is untouched, the next batch re-hashes)
    VOCAB_CAP = 1_000_000

    def __init__(self, token_hash: str = "xx64"):
        self.token_hash = token_hash
        self._vocab: dict[str, int] = {}

    def _hash_tokens(self, tok: pd.Series) -> np.ndarray:
        if self.token_hash == "xx64":
            return fingerprint_series(tok).astype(np.uint64)
        from .textstats import md5_hash64
        uniq, inv = np.unique(tok.to_numpy(), return_inverse=True)
        if len(self._vocab) + len(uniq) > self.VOCAB_CAP:
            self._vocab = {}
        if len(uniq) > self.VOCAB_CAP:
            # one batch's vocabulary alone exceeds the cap: hash
            # without memoizing (never store more than the cap)
            hashes = np.fromiter((md5_hash64(t) for t in uniq),
                                 dtype=np.uint64, count=len(uniq))
            return hashes[inv]
        vocab = self._vocab
        hashes = np.fromiter(
            (vocab[t] if t in vocab else vocab.setdefault(t, md5_hash64(t))
             for t in uniq), dtype=np.uint64, count=len(uniq))
        return hashes[inv]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = pd.DataFrame({"doc_id": batch["doc_id"],
                             "tok": batch["text"].fillna("").str.split()}) \
                 .explode("tok", ignore_index=True)
        toks["tok"] = toks["tok"].fillna("")
        codes, uniq = pd.factorize(toks["doc_id"])
        h = self._hash_tokens(toks["tok"])
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


def simhash_documents(sf_dir: str, token_hash: str = "md5") -> ray.data.Dataset:
    """64-bit SimHash per document. Default token hash is the portable
    md5 one so the sketch is value-verifiable against a DuckDB oracle
    (token unnest -> 64 bit-votes -> bit assembly); pass "xx64" for the
    faster engine-internal hash (rows-only checkable)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def hash_batch(batch: pd.DataFrame, _th: str = token_hash) -> pd.DataFrame:
        # process-level singleton: the md5 token-vocab memo persists
        # across tasks AND queries (the worker process outlives both)
        h = _SIMHASHERS.get(_th)
        if h is None:
            h = _SIMHASHERS.setdefault(_th, SimHasher(_th))
        return h(batch)

    return ds.map_batches(hash_batch, batch_format="pandas",
                          batch_size=4096).sort("doc_id")


def _strict_ngrams(batch: pd.DataFrame, n: int) -> pd.DataFrame:
    """(doc_id, gram) rows of STRICT word n-grams: a doc with fewer than
    n tokens emits none (unlike :func:`shingle_frame`, which pads short
    docs with a whole-doc shingle for MinHash stability). One vectorized
    shift-concat over the exploded token frame, no per-doc loop."""
    toks = pd.DataFrame({"doc_id": batch["doc_id"],
                         "tok": batch["text"].fillna("").str.split()}) \
             .explode("tok", ignore_index=True).dropna() \
             .reset_index(drop=True)
    gram = toks["tok"].copy()
    same = pd.Series(True, index=toks.index)
    for j in range(1, n):
        gram = gram + " " + toks["tok"].shift(-j)
        same &= toks["doc_id"].eq(toks["doc_id"].shift(-j))
    return pd.DataFrame({"doc_id": toks["doc_id"][same],
                         "gram": gram[same]})


#: winnowing parameters: word-k-gram width and window of consecutive
#: gram hashes per selected fingerprint
WINNOW_K = 3
WINNOW_W = 4


def winnow_fingerprints(sf_dir: str, k: int = WINNOW_K,
                        w: int = WINNOW_W,
                        num_partitions: int = 16) -> ray.data.Dataset:
    """Robust winnowing fingerprints (the MOSS local-fingerprinting
    scheme): hash every word k-gram, slide a window of w consecutive
    gram hashes, select each window's MINIMUM -- the selected set is
    guaranteed to detect any shared substring of >= k+w-1 tokens while
    storing ~1/w of the grams. Reports, per document: n_fp (distinct
    selected fingerprints), n_shared_fp (selected fingerprints that
    also occur in at least one OTHER document), and a shared flag --
    the substring-overlap dedup signal that is orthogonal to MinHash
    (set resemblance) and SimHash (distribution similarity). Docs with
    fewer than k tokens emit nothing.

    Scale shape: the window-min is computed with w shifted vectorized
    minima (steps-not-rows; windows never cross doc boundaries because
    shifted lanes from another doc contribute +inf), then the classic
    two-exchange: fingerprints hash-route so each partition counts its
    fingerprints' document frequency exactly, annotated rows re-route
    by doc for the per-doc rollup. Only (doc_id, fp) pairs are ever
    exchanged -- text and gram strings stay in their batch. Dedup of
    selected values per doc makes the min-selection tie rule
    irrelevant, so the SQL oracle (window MIN + DISTINCT) reproduces
    the set bit-exactly."""
    from ..stages.exchange import exchange_map_groups
    from .textstats import md5_hash64_series

    docs = _docs(sf_dir, ["doc_id", "text"])
    UMAX = np.uint64(0xFFFFFFFFFFFFFFFF)

    def select(batch: pd.DataFrame) -> pd.DataFrame:
        g = _strict_ngrams(batch, k).reset_index(drop=True)
        if not len(g):
            return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                 "fp": np.empty(0, np.uint64),
                                 "part": np.empty(0, np.int32)})
        h = md5_hash64_series(g["gram"])
        did = g["doc_id"].to_numpy()
        pos = g.groupby("doc_id", sort=False).cumcount().to_numpy()
        n_grams = g.groupby("doc_id", sort=False)["gram"] \
                   .transform("size").to_numpy()
        wm = h.copy()
        for j in range(1, w):
            lane = np.concatenate([h[j:], np.full(j, UMAX, np.uint64)])
            same = np.concatenate([did[j:] == did[:-j],
                                   np.zeros(j, bool)])
            wm = np.minimum(wm, np.where(same, lane, UMAX))
        valid = pos <= np.maximum(n_grams - w, 0)
        sel = pd.DataFrame({"doc_id": did[valid], "fp": wm[valid]}) \
            .drop_duplicates()
        sel["part"] = (sel["fp"].to_numpy()
                       % np.uint64(num_partitions)).astype(np.int32)
        return sel

    def annotate_nd(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("fp", sort=False, as_index=False)["doc_id"] \
              .size().rename(columns={"size": "nd"})
        out = g.merge(nd, on="fp")
        out["part"] = (out["doc_id"].to_numpy().astype(np.uint64)
                       % np.uint64(num_partitions)).astype(np.int32)
        return out[["doc_id", "nd", "part"]]

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(sh=(g["nd"] >= 2).astype(np.int64))
        agg = g.groupby("doc_id", sort=False, as_index=False).agg(
            n_fp=("nd", "size"), n_shared_fp=("sh", "sum"))
        agg["shared"] = (agg["n_shared_fp"] > 0).astype(np.int64)
        return agg.astype({"n_fp": np.int64, "n_shared_fp": np.int64})

    sel = docs.map_batches(select, batch_format="pandas", batch_size=8192)
    ann = exchange_map_groups(sel, "part", num_partitions, annotate_nd)
    return exchange_map_groups(ann, "part", num_partitions,
                               per_doc).sort("doc_id")


#: decontamination n-gram width. The GPT-3 procedure uses 13-gram
#: overlap; the synthetic docs average ~40 tokens over a ~25-word
#: vocabulary, so 5 keeps the check non-vacuous at every sf while the
#: shape (and every constant) is a parameter.
DECONTAM_N = 5


def decontaminate(sf_dir: str, n: int = DECONTAM_N,
                  bench_mod: int = 10) -> ray.data.Dataset:
    """Benchmark decontamination (the GPT-3 appendix-C shape): docs with
    ``doc_id % bench_mod == 0`` act as the held-out benchmark/eval set;
    every other (training) doc reports how many of its DISTINCT word
    n-grams appear anywhere in the benchmark set, plus a contaminated
    flag (any overlap).

    Scale shape: the benchmark side is the SMALL side by construction
    (eval sets are a fixed size; the training corpus is the 100-TB
    side), so its distinct n-gram HASHES are collected once (per-batch
    distinct combiner -> one uint64 column to the driver -> np.unique)
    and broadcast via ray.put; the training pass is a single streamed
    map_batches doing a vectorized np.isin per batch -- no shuffle, no
    join, text never leaves its batch. If the benchmark set ever
    outgrows a broadcast, swap the exact set for the Bloom summary
    (`stages/joins.py:bloom_semi_join`) -- same stage shape.
    Hashing is the portable md5-64 (`textstats.md5_hash64_series`);
    membership-by-hash equals membership-by-string up to md5-64
    collisions (~2^-64 per pair, negligible)."""
    from ..stages.joins import fetch_broadcast
    from .textstats import md5_hash64_series

    docs = _docs(sf_dir, ["doc_id", "text"])

    def bench_hashes(batch: pd.DataFrame) -> pd.DataFrame:
        sub = batch[batch["doc_id"] % bench_mod == 0]
        g = _strict_ngrams(sub, n).drop_duplicates("gram")
        return pd.DataFrame({"h": md5_hash64_series(g["gram"])})

    part = docs.map_batches(bench_hashes, batch_format="pandas",
                            batch_size=8192).to_pandas()
    bench = np.unique(part["h"].to_numpy().astype(np.uint64))
    bench_ref = ray.put(bench)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        b = fetch_broadcast(bench_ref)
        train = batch[batch["doc_id"] % bench_mod != 0]
        g = _strict_ngrams(train, n).drop_duplicates()
        hit = np.isin(md5_hash64_series(g["gram"]), b)
        per = g.assign(hit=hit).groupby("doc_id", sort=False)["hit"]
        n_grams, n_hit = per.size(), per.sum()
        out = pd.DataFrame({"doc_id": train["doc_id"].to_numpy()})
        out["n_grams"] = out["doc_id"].map(n_grams).fillna(0).astype(np.int64)
        out["n_hit"] = out["doc_id"].map(n_hit).fillna(0).astype(np.int64)
        out["contaminated"] = (out["n_hit"] > 0).astype(np.int64)
        return out

    return docs.map_batches(score, batch_format="pandas",
                            batch_size=8192).sort("doc_id")


# -- incremental dedup (new data vs committed corpus) ------------------------

def exact_dedup_incremental(sf_dir: str, old_mod: int = 2) -> "ray.data.Dataset":
    """Streaming-ingest dedup: documents with ``doc_id % old_mod == 0``
    act as the COMMITTED corpus; every other (new) document reports
    whether its text already exists there (`is_dup`) and the smallest
    matching committed doc_id (`dup_of`, null when novel). NULL text
    follows SQL equality (never matches), so the oracle LEFT JOIN
    mirrors exactly.

    Scale shape: the committed side is corpus-sized, so it can NOT
    broadcast -- both sides route by content hash into the same
    partitions (per-batch combiner first: one (hash, min-id) row per
    distinct committed text per batch) and each partition answers
    membership for its own hash space with one vectorized merge. This
    is the per-tick shape for "dedup the delta against the lake" in a
    CDC ingest loop: the delta is the new side, the committed side's
    hashes come from (or are cached as) the lake's fingerprint column."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def route(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        is_old = ids % old_mod == 0
        h = fingerprint_series(batch["text"])
        null_text = batch["text"].isna().to_numpy()
        old = batch[is_old & ~null_text]
        old_part = old.assign(h=h[is_old & ~null_text]) \
            .groupby("h", as_index=False).agg(doc_id=("doc_id", "min"))
        old_part["side"] = np.int8(0)
        new = pd.DataFrame({"doc_id": ids[~is_old], "h": h[~is_old],
                            "side": np.int8(1)})
        # null-text new docs are novel by SQL semantics: give them a
        # hash no committed row can carry (-1 is reserved: committed
        # null texts were dropped above)
        new.loc[batch["text"].isna().to_numpy()[~is_old], "h"] = -1
        out = pd.concat([old_part[["doc_id", "h", "side"]], new],
                        ignore_index=True)
        out["part"] = (out["h"].to_numpy().astype(np.uint64)
                       % np.uint64(AGG_PARTITIONS)).astype(np.int32)
        return out

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        old = g[g["side"] == 0].groupby("h", as_index=False) \
            .agg(dup_of=("doc_id", "min"))
        new = g[g["side"] == 1][["doc_id", "h"]]
        out = new.merge(old, on="h", how="left")
        out["is_dup"] = out["dup_of"].notna().astype(np.int64)
        out["dup_of"] = out["dup_of"].astype("Int64")
        return out[["doc_id", "is_dup", "dup_of"]]

    routed = ds.map_batches(route, batch_format="pandas", batch_size=8192)
    return exchange_map_groups(routed, "part", AGG_PARTITIONS,
                               resolve).sort("doc_id")


def minhash_dedup_apply(sf_dir: str,
                        threshold: float = JACCARD_THRESHOLD) -> "ray.data.Dataset":
    """The dedup ACTION: materialize the surviving document ids after
    near-dup clustering -- every doc that is not a non-representative
    member of a cluster (reps themselves survive). The drop set is
    candidate-proportional by LSH construction, so it broadcasts; the
    corpus streams through one membership filter, text never moves."""
    import ray

    from ..stages.joins import fetch_broadcast

    clusters = minhash_dedup_clusters(sf_dir, threshold)
    drop = clusters[clusters["doc_id"] != clusters["cluster_rep"]]
    drop_ref = ray.put(drop["doc_id"].to_numpy(dtype=np.int64))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(~np.isin(ids, fetch_broadcast(drop_ref))))

    return _docs(sf_dir, ["doc_id", "n_chars"]) \
        .map_batches(keep, batch_format="pyarrow", zero_copy_batch=True) \
        .sort("doc_id")
