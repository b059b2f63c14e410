"""Resumable partitioned parquet output.

A 100-TB export must survive being killed halfway: output is split
into a FIXED set of key-hash bucket directories, each committed by an
atomic ``_SUCCESS`` marker written after its data files. Re-running
the same write:

  * lists finished buckets first (one readdir, no data reads);
  * drops their rows at the FIRST map stage (vectorized mask -- rows
    of finished buckets never enter the exchange);
  * writes only the missing buckets, each atomically (tmp + rename,
    marker last).

Bucket membership is the portable md5 key hash (``md5_hash64``, DuckDB
``md5_number_lower`` parity), so the layout is deterministic across
runs, engines and cluster shapes -- the property resume depends on.
The exchange reuses the engine's raw hash-exchange shape (no global
sort); never one giant file.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.textstats import md5_hash64_series

SUCCESS = "_SUCCESS"


def _bucket_dir(out_dir: str, b: int) -> str:
    return os.path.join(out_dir, f"bucket={b:05d}")


def finished_buckets(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    out = set()
    for name in os.listdir(out_dir):
        if name.startswith("bucket=") and \
                os.path.exists(os.path.join(out_dir, name, SUCCESS)):
            out.add(int(name.split("=", 1)[1]))
    return out


@ray.remote
def _write_bucket(out_dir: str, b: int, *parts: pa.Table) -> int:
    parts = [p for p in parts if p.num_rows]
    d = _bucket_dir(out_dir, b)
    os.makedirs(d, exist_ok=True)
    # clear leftovers of a CRASHED earlier attempt (no _SUCCESS, or we
    # would not be writing): part numbering restarts at 0 and empty
    # parts shift indices, so a retry writing fewer files would leave
    # stale higher-index parts that read_partitioned would then
    # double-count once this attempt's marker lands
    for name in os.listdir(d):
        if name.endswith(".parquet") or name.endswith(".tmp"):
            os.remove(os.path.join(d, name))
    rows = 0
    for i, tbl in enumerate(parts):
        tmp = os.path.join(d, f"part-{i:05d}.parquet.tmp")
        pq.write_table(tbl.replace_schema_metadata(None), tmp,
                       compression="zstd")
        os.replace(tmp, os.path.join(d, f"part-{i:05d}.parquet"))
        rows += tbl.num_rows
    tmp = os.path.join(d, SUCCESS + ".tmp")
    with open(tmp, "w") as f:
        f.write(f"{rows}\n")
    os.replace(tmp, os.path.join(d, SUCCESS))
    return rows


def write_partitioned(ds: ray.data.Dataset, out_dir: str, key: str,
                      num_buckets: int = 64) -> dict[int, int]:
    """Write `ds` under ``out_dir/bucket=NNNNN/`` by key hash; skip
    buckets already marked complete. Returns rows written per bucket
    (only the buckets written THIS run).

    `bucket = H(key) % num_buckets` is a PERSISTED layout (the same
    contract as the lake's manifest `num_buckets`): a resume with a
    different count or key would silently mis-place or double-count
    rows, so the first run writes a layout marker and every resume
    validates against it."""
    import json
    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "_export_meta.json")
    meta = {"key": key, "num_buckets": int(num_buckets)}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        if prev != meta:
            raise ValueError(
                f"export layout mismatch: {out_dir} was started with "
                f"{prev}, resume requested {meta}; finish with the "
                "original parameters or export to a fresh directory")
    else:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)
    done = finished_buckets(out_dir)
    todo = [b for b in range(num_buckets) if b not in done]
    if not todo:
        return {}
    done_arr = np.zeros(num_buckets, dtype=bool)
    for b in done:
        done_arr[b] = True

    # raw hash exchange: one split task per input block, per-bucket
    # object returns, one writer task per missing bucket
    blocks = ds.to_arrow_refs()
    if not blocks:
        # a ZERO-BLOCK dataset (everything filtered upstream) is still
        # a successful export: mark every remaining bucket complete
        # (zero files) so the export reaches completion and resumes
        # are no-ops, instead of never writing a single _SUCCESS
        written = ray.get([_write_bucket.remote(out_dir, b)
                           for b in todo])
        return dict(zip(todo, written))

    @ray.remote
    def split(tbl: pa.Table):
        if key not in tbl.column_names:
            # SCHEMALESS empty block (e.g. a filter that matched
            # nothing): every bucket gets an empty slice, which
            # _write_bucket's num_rows filter drops
            empties = tuple(pa.table({}) for _ in todo)
            return empties if len(todo) > 1 else empties[0]
        # arrow-native split (argsort + searchsorted + zero-copy
        # slices): only the key column materializes for hashing, the
        # payload never round-trips through pandas
        keys = tbl[key].to_pandas().astype(str)
        b = (md5_hash64_series(keys)
             % np.uint64(num_buckets)).astype(np.int64)
        keep = ~done_arr[b]
        tbl = tbl.filter(pa.array(keep))
        b = b[keep]
        order = np.argsort(b, kind="stable")
        tbl = tbl.take(pa.array(order)).replace_schema_metadata(None)
        bs = b[order]
        lo = np.searchsorted(bs, np.asarray(todo), side="left")
        hi = np.searchsorted(bs, np.asarray(todo) + 1, side="left")
        tables = tuple(tbl.slice(l, h - l) for l, h in zip(lo, hi))
        return tables if len(todo) > 1 else tables[0]

    outs = [split.options(num_returns=len(todo)).remote(r) for r in blocks]
    if len(todo) == 1:
        outs = [[o] for o in outs]
    per_bucket = list(zip(*outs))
    written = ray.get([
        _write_bucket.remote(out_dir, b, *refs)
        for b, refs in zip(todo, per_bucket)])
    return dict(zip(todo, written))


def read_partitioned(out_dir: str) -> ray.data.Dataset:
    """Read back every COMPLETE bucket (incomplete ones are invisible,
    which is the resume contract). A finished export whose buckets are
    all EMPTY (0-row table exported) reads back as an empty dataset;
    only an export with no finished buckets at all raises."""
    done = finished_buckets(out_dir)
    if not done:
        raise FileNotFoundError(f"no complete buckets under {out_dir}")
    paths = []
    for b in sorted(done):
        d = _bucket_dir(out_dir, b)
        paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                     if f.endswith(".parquet"))
    if not paths:
        return ray.data.from_arrow_refs([])
    # partitioning=None: the bucket id is layout, not data -- don't
    # hive-infer it back as a column
    return ray.data.read_parquet(paths, partitioning=None)
