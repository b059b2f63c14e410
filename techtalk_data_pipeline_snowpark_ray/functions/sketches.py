"""Mergeable quantile sketch (t-digest-style weighted centroids).

`value_quantiles` computes EXACT quantiles by value-count histogram,
which relies on a bounded discrete domain (money cents). For unbounded
/ continuous domains the scale-correct answer is a MERGEABLE sketch:
each batch summarizes its values into <= `compression` weighted
centroids, centroid lists merge associatively (concat -> sort ->
re-compress), and only centroid summaries ever leave a batch -- driver
traffic is O(batches x compression), corpus-independent, and the final
digest answers any quantile with rank error ~O(1/compression).

This is the simple uniform-capacity variant (equal-weight recompression
rather than the k-scale tails-favoring function of the full t-digest
paper): honest rank-error bounds are enforced by test rather than
claimed from the paper.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

COMPRESSION = 128


class QuantileDigest:
    """Weighted-centroid quantile summary; merge is associative."""

    def __init__(self, means: np.ndarray, weights: np.ndarray,
                 compression: int = COMPRESSION):
        self.means = np.asarray(means, dtype=np.float64)
        self.weights = np.asarray(weights, dtype=np.float64)
        self.compression = compression

    @classmethod
    def from_values(cls, values: np.ndarray,
                    compression: int = COMPRESSION) -> "QuantileDigest":
        v = np.sort(np.asarray(values, dtype=np.float64))
        if len(v) <= compression:
            return cls(v, np.ones(len(v)), compression)
        # equal-count buckets: mean + count per bucket, vectorized
        edges = np.linspace(0, len(v), compression + 1).astype(np.int64)
        sums = np.add.reduceat(v, edges[:-1])
        counts = np.diff(edges).astype(np.float64)
        return cls(sums / counts, counts, compression)

    def merge(self, other: "QuantileDigest") -> "QuantileDigest":
        m = np.concatenate([self.means, other.means])
        w = np.concatenate([self.weights, other.weights])
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        if len(m) <= self.compression:
            return QuantileDigest(m, w, self.compression)
        # weighted re-compression to equal-weight buckets
        cum = np.cumsum(w)
        total = cum[-1]
        cuts = np.linspace(0, total, self.compression + 1)[1:-1]
        idx = np.searchsorted(cum, cuts, side="left")
        starts = np.concatenate([[0], idx + 1])
        starts = np.unique(np.clip(starts, 0, len(m) - 1))
        sums = np.add.reduceat(m * w, starts)
        ws = np.add.reduceat(w, starts)
        return QuantileDigest(sums / ws, ws, self.compression)

    def quantile(self, p: float) -> float:
        """Value at rank p via centroid midpoint interpolation; NaN on
        an empty digest (all-null column) instead of a numpy crash."""
        if not len(self.means):
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2.0
        total = self.weights.sum()
        target = p * total
        return float(np.interp(target, cum, self.means))

    def to_frame(self) -> pd.DataFrame:
        return pd.DataFrame({"mean": self.means, "weight": self.weights})


class HyperLogLog:
    """HLL distinct-count sketch over 64-bit keys: 2^p one-byte
    registers, vectorized numpy update, OR-merge (associative,
    idempotent -- re-adding a key is free, which also makes it safe
    under task retries). Standard error ~1.04/sqrt(2^p): p=12 -> 4 KB
    per sketch, ~1.6% error. The EXACT routed distinct
    (`analytics.events_distinct_users`) stays the default; this is the
    bounded-memory path when even the routed exchange of distinct keys
    is too much (e.g. distinct tokens at corpus scale)."""

    _MIX1 = np.uint64(0xBF58476D1CE4E5B9)
    _MIX2 = np.uint64(0x94D049BB133111EB)

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add(self, keys: np.ndarray) -> None:
        h = np.asarray(keys).astype(np.uint64)
        h = (h ^ (h >> np.uint64(30))) * self._MIX1
        h = (h ^ (h >> np.uint64(27))) * self._MIX2
        h = h ^ (h >> np.uint64(31))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining bits + 1 (cap 64-p+1)
        nbits = 64 - self.p
        rank = np.full(len(h), nbits + 1, dtype=np.uint8)
        found = np.zeros(len(h), dtype=bool)
        for b in range(nbits):
            hit = ~found & ((rest >> np.uint64(63 - b)) & np.uint64(1) == 1)
            rank[hit] = b + 1
            found |= hit
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def count(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)       # small-range correction
        return float(est)


def hll_column(ds: ray.data.Dataset, col: str, p: int = 12) -> HyperLogLog:
    """Distributed approximate distinct of an int64 column: one 2^p-
    byte sketch per batch leaves the batch, OR-merged on the driver."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = HyperLogLog(p)
        h.add(b[col].dropna().to_numpy(dtype=np.int64))
        return pd.DataFrame({"regs": [h.registers.tobytes()]})

    merged = HyperLogLog(p)
    for row in ds.map_batches(partial, batch_format="pandas").take_all():
        np.maximum(merged.registers,
                   np.frombuffer(row["regs"], dtype=np.uint8),
                   out=merged.registers)
    return merged


def sketch_column(ds: ray.data.Dataset, col: str,
                  compression: int = COMPRESSION) -> QuantileDigest:
    """Distributed sketch of a Dataset column: one digest per batch
    (only centroid rows leave the batch), associative driver merge."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = QuantileDigest.from_values(b[col].dropna().to_numpy(),
                                       compression)
        return d.to_frame()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = QuantileDigest(np.array([]), np.array([]), compression)
    if "mean" not in parts.columns:
        # all-empty input blocks pass through the map without invoking
        # partial(), yielding a columnless frame -> empty digest
        return out
    # merge in one shot: a concat of partials is itself a valid digest
    # input (merge() re-sorts and re-compresses)
    return out.merge(QuantileDigest(parts["mean"].to_numpy(),
                                    parts["weight"].to_numpy(),
                                    compression))


class MisraGries:
    """Misra-Gries heavy-hitters summary: at most k counters with the
    classic decrement rule. Guarantees after seeing n items: every item
    with true count > n/(k+1) IS in the summary, and every reported
    count underestimates the true count by at most n/(k+1). Merging two
    summaries (add counters, then subtract the (k+1)-th largest count
    from all and drop non-positives) preserves the combined bound, so
    per-batch partials + a driver merge give the exact same guarantee
    as a sequential pass -- the bounded-memory path beside the exact
    routed top-k (`analytics.top_events_per_user`,
    `textstats.vocab_top_terms`), for when even per-partition exact
    counting is too much state (e.g. heavy URLs/terms at corpus scale).
    Deterministic: no RNG, merge order changes counts only within the
    guaranteed error bound and membership of true heavy hitters never.
    """

    def __init__(self, k: int):
        self.k = k
        self.counts: dict = {}
        self.n = 0

    def add(self, keys: np.ndarray) -> None:
        """Batch update: count the batch exactly (vectorized), then
        merge it in -- equivalent to item-at-a-time MG with the same
        bound, without a per-item Python loop."""
        vals, cnts = np.unique(np.asarray(keys), return_counts=True)
        self.n += int(cnts.sum())
        for v, c in zip(vals.tolist(), cnts.tolist()):
            self.counts[v] = self.counts.get(v, 0) + int(c)
        self._trim()

    def _trim(self) -> None:
        if len(self.counts) <= self.k:
            return
        cs = np.sort(np.fromiter(self.counts.values(), dtype=np.int64))
        dec = int(cs[-(self.k + 1)])        # (k+1)-th largest
        self.counts = {v: c - dec for v, c in self.counts.items()
                       if c > dec}

    def merge(self, other: "MisraGries") -> "MisraGries":
        for v, c in other.counts.items():
            self.counts[v] = self.counts.get(v, 0) + c
        self.n += other.n
        self._trim()
        return self

    def to_frame(self) -> pd.DataFrame:
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return pd.DataFrame({"key": [v for v, _ in items],
                             "count_lo": np.array([c for _, c in items],
                                                  dtype=np.int64)})


def heavy_hitters_column(ds: ray.data.Dataset, col: str,
                         k: int = 64) -> pd.DataFrame:
    """Distributed approximate heavy hitters of a column: one <=k-row
    partial summary per batch leaves the batch, associative driver
    merge. Returns (key, count_lo) sorted by descending lower-bound
    count; count_lo <= true count <= count_lo + n/(k+1)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals = b[col].dropna().to_numpy()
        mg = MisraGries(k)
        mg.add(vals)
        out = mg.to_frame()
        if not len(out) and len(vals):
            # the trim can empty a summary (k+1 equal counts: dec equals
            # every count); the batch total must still reach the merge
            # or the n/(k+1) error bound is computed against too-small
            # n -- carry it on a 0-count row for a real key (summing a
            # zero into that key's partial is a no-op)
            out = pd.DataFrame({"key": vals[:1],
                                "count_lo": np.zeros(1, dtype=np.int64)})
        # batch item total carried on the first row only, so the driver
        # recovers n = sum(n_batch) without per-batch identity
        nb = np.zeros(len(out), dtype=np.int64)
        if len(nb):
            nb[0] = mg.n
        out["n_batch"] = nb
        return out

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    merged = MisraGries(k)
    if len(parts):
        # summing all partial counters then one trim IS the m-way MG
        # merge (associative); the bound holds for the combined n
        summed = parts.groupby("key", sort=False)["count_lo"].sum()
        # drop pure-carrier entries (0-count rows exist only to ship a
        # batch total whose trimmed summary was empty)
        merged.counts = {kk: int(c) for kk, c in summed.items() if int(c) > 0}
        merged.n = int(parts["n_batch"].sum())
        merged._trim()
    return merged.to_frame()
