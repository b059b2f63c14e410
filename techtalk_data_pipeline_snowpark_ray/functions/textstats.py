"""Text-analysis stages for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprints.

All hot paths are vectorized: Arrow re2 kernels
(`pc.count_substring_regex` -- the same regex engine DuckDB uses, so
oracle parity is exact), pandas string kernels, and polars' vectorized
xxhash for fingerprints. Stateful pieces (compiled patterns, stopword
tables) live in callable classes used as `map_batches` actor pools
(compiled once per actor in __init__, ST1-style lifecycle;
`SessionManager.scala:8-33` parity).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

TOKEN_RE = r"\S+"
PUNCT_RE = r"[.,!?;:]"
#: BPE-ish pre-tokenizer (GPT-2-style, lookaheads dropped -- RE2 has
#: none, and RE2 is what both pyarrow and DuckDB run, so the count is
#: bit-portable): contractions | space?+letters | space?+digits |
#: space?+punct-run. No whitespace alternative: runs not absorbed as a
#: token's single leading space are skipped by non-overlapping match
#: counting, which is exactly "model tokens only".
BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def _docs(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    from ..sources.tables import read_table
    return read_table(sf_dir, "documents", columns)


def token_counts(sf_dir: str) -> ray.data.Dataset:
    """Whitespace-token counts per document (BPE-ish segmentation is the
    same shape: swap the regex)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(t["text"], TOKEN_RE), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


def bpe_token_counts(sf_dir: str) -> ray.data.Dataset:
    """BPE-ish pre-tokenization counts per document: the unit a GPT-2
    family byte-pair tokenizer would merge within. Same vectorized
    shape as :func:`token_counts`, different regex (BPE merges only
    ever split pre-tokens further, so this count is the standard cheap
    upper-bound proxy for 'tokens' when the real vocab isn't loaded).
    Whitespace runs are excluded from the count (they pre-tokenize but
    never surface as model tokens)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], BPE_RE)
        return pa.table({"doc_id": t["doc_id"],
                         "n_pretokens": pc.cast(n, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow",
                          zero_copy_batch=True).sort("doc_id")


def doc_quality(sf_dir: str) -> ray.data.Dataset:
    """Cheap quality signals: length, token count, punctuation count.
    (Integer-only outputs -> exact oracle parity.)"""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            "n_tokens": pc.cast(pc.count_substring_regex(t["text"], TOKEN_RE), pa.int64()),
            "n_punct": pc.cast(pc.count_substring_regex(t["text"], PUNCT_RE), pa.int64()),
            # stopword hits (en), the third classic ratio numerator;
            # ratios themselves stay integer-pair exact (n_stop/n_tokens)
            "n_stopwords": pc.cast(
                pc.count_substring_regex(t["text"], _STOPWORDS["en"]),
                pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


#: per-language stopword markers for the n-gram/stopword heuristic
_STOPWORDS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was)\b",
    "fr": r"\b(le|la|les|et|des|une|est|dans|pour|que)\b",
    "es": r"\b(el|los|las|una|es|que|por|con|para|como)\b",
    "de": r"\b(der|die|das|und|ist|ein|nicht|mit|auf|von)\b",
}
_CJK = r"[一-鿿぀-ヿ]"


class LangId:
    """Heuristic language ID: CJK character ratio, else the language
    whose stopword set hits most per token (ties -> 'en'). Stateful
    actor: patterns compiled once per actor (__init__), batches scored
    vectorized (pandas str.count, cython loop not Python-per-row)."""

    def __init__(self):
        import re
        self.pats = {lang: re.compile(p) for lang, p in _STOPWORDS.items()}
        self.cjk = re.compile(_CJK)
        self.tok = re.compile(TOKEN_RE)

    def __call__(self, batch: pd.DataFrame,
                 n_tok: "pd.Series | None" = None) -> pd.DataFrame:
        text = batch["text"].fillna("")
        # callers that already token-counted (curation's length gate)
        # pass n_tok to avoid a second full regex pass over the text
        n_tok = (text.str.count(self.tok) if n_tok is None else n_tok)             .clip(lower=1)
        cjk_ratio = text.str.count(self.cjk) / text.str.len().clip(lower=1)
        low = text.str.lower()          # once, not once per language
        scores = {lang: low.str.count(pat) / n_tok
                  for lang, pat in self.pats.items()}
        sdf = pd.DataFrame(scores)
        best = sdf.idxmax(axis=1).where(sdf.max(axis=1) > 0, "unknown")
        pred = np.where(cjk_ratio.to_numpy() > 0.2, "zh", best.to_numpy())
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": pred})


#: per-worker-process LangId (patterns compile once per process and
#: persist across tasks AND queries -- the process outlives both)
_LANGID_SINGLETON: "LangId | None" = None


def _langid_batch(batch: pd.DataFrame) -> pd.DataFrame:
    global _LANGID_SINGLETON
    if _LANGID_SINGLETON is None:
        _LANGID_SINGLETON = LangId()
    return _LANGID_SINGLETON(batch)


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """Task-based with a process-level LangId singleton: same
    compile-once ST1 lifecycle as the actor pool, without paying actor
    spawn latency on every query invocation (the warm worker pool is
    reused; ~1s saved per call at 32 cpus)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(_langid_batch, batch_format="pandas",
                          batch_size=4096).sort("doc_id")


def fingerprint_series(text: pd.Series, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit content fingerprint of each string,
    vectorized (polars xxhash; no Python loop). Returned as non-negative
    int64 (top bit cleared) for Arrow/DuckDB friendliness."""
    import polars as pl
    s = pl.Series("t", text.fillna("").to_numpy(), dtype=pl.Utf8)
    out = s.hash(seed=seed).to_numpy().astype(np.uint64)
    return (out >> np.uint64(1)).astype(np.int64)


def md5_hash64(s: str) -> int:
    """Portable 64-bit string hash: bytes 8..16 of md5, little-endian --
    bit-for-bit equal to DuckDB's ``md5_number_lower()``, so any sketch
    or routing decision built on it can be re-derived (and oracle-
    verified) by a different engine. ~2x slower than xxhash per byte;
    use :func:`fingerprint_series` where the hash never leaves this
    engine."""
    import hashlib
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def md5_hash64_series(text: pd.Series) -> np.ndarray:
    """Per-string :func:`md5_hash64` over a batch (uint64). Hashing is
    inherently per-string work; the comprehension is the per-element
    digest call itself, not avoidable row logic (~0.5M 200-byte docs/s
    per core -- the stage stays compute-bound, not interpreter-bound)."""
    vals = text.fillna("").to_numpy()
    return np.fromiter((md5_hash64(s) for s in vals), dtype=np.uint64,
                       count=len(vals))


#: ASCII-only case map: unicode lowercasing is ENGINE-DEPENDENT
#: (final sigma, Turkish dotted I, locale tailoring), so a cleaning
#: stage whose output keys dedup/splits must avoid it -- determinism
#: across engines beats linguistic completeness for content keys.
_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"
_ASCII_LOWER = str.maketrans(_UPPER, _LOWER)
_WS_RE = None  # compiled per process


def clean_text_value(s: str) -> str:
    """NFC unicode normalization -> ASCII lowercase -> collapse ASCII
    whitespace runs -> strip. Bit-reproducible in SQL (nfc_normalize +
    translate + regexp_replace), unlike unicode casefolding."""
    import re
    import unicodedata
    global _WS_RE
    if _WS_RE is None:
        _WS_RE = re.compile(r"[ \t\r\n\f\v]+")
    s = unicodedata.normalize("NFC", s).translate(_ASCII_LOWER)
    return _WS_RE.sub(" ", s).strip(" \t\r\n\f\v")


def clean_text(sf_dir: str) -> ray.data.Dataset:
    """Canonicalized text per document (the content-key input for
    dedup / fingerprints): (doc_id, clean, n_chars)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch["text"].fillna("").to_numpy()
        clean = np.array([clean_text_value(s) for s in vals], dtype=object)
        n = np.fromiter((len(c) for c in clean), dtype=np.int64,
                        count=len(clean))
        return pd.DataFrame({"doc_id": batch["doc_id"], "clean": clean,
                             "n_chars": n})

    return ds.map_batches(f, batch_format="pandas", batch_size=8192) \
             .sort("doc_id")


def vocab_top_terms(sf_dir: str, k: int = 50,
                    num_partitions: int = 16) -> pd.DataFrame:
    """Top-k tokens by DOCUMENT frequency (vocabulary building /
    stopword discovery), distributed and EXACT:

      1. per batch: explode distinct (doc, token) pairs, pre-count df
         per token (within-batch combiner), hash-route by token;
      2. per partition: sum counts -- exact, since a token lives wholly
         in one partition -- and keep only that partition's top-k;
      3. driver: merge the P x k candidate rows (global top-k is a
         subset of the union of per-partition top-k's, so this is
         exact, and driver traffic is O(P*k), corpus-independent).

    Ties break by token ascending (deterministic / oracle-parity).
    Empty tokens are excluded on both sides."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = pd.DataFrame({"doc_id": batch["doc_id"],
                             "tok": batch["text"].fillna("").str.split()}) \
                 .explode("tok", ignore_index=True).dropna()
        toks = toks[toks["tok"] != ""].drop_duplicates()
        out = toks.groupby("tok", sort=False, as_index=False).size() \
                  .rename(columns={"size": "df"})
        out["part"] = (fingerprint_series(out["tok"]).astype(np.uint64)
                       % np.uint64(num_partitions)).astype(np.int32)
        return out

    def topk_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("tok", sort=False, as_index=False)["df"].sum()
        return out.sort_values(["df", "tok"], ascending=[False, True],
                               kind="stable").head(k)

    from ..stages.exchange import exchange_map_groups
    routed = ds.map_batches(partial, batch_format="pandas", batch_size=8192)
    cand = exchange_map_groups(routed, "part", num_partitions,
                               topk_part).to_pandas()
    if "tok" not in cand.columns:     # no tokens at all (empty/null corpus)
        return pd.DataFrame({"tok": pd.Series(dtype="object"),
                             "df": pd.Series(dtype="int64")})
    return cand.sort_values(["df", "tok"], ascending=[False, True],
                            kind="stable", ignore_index=True).head(k)


def tfidf_top_terms(sf_dir: str, k: int = 3,
                    num_partitions: int = 16) -> ray.data.Dataset:
    """Top-k terms per document by an exact-integer tf-idf ranking:
    score_q = tf * N * 1e6 // df (tf, N, df are ints, so the score is
    the same integer on every engine -- float idf logs are deliberately
    avoided: ln() is not bit-portable and only the ORDERING matters).

    Fully distributed, no vocabulary broadcast -- the textbook
    two-exchange TF-IDF:

      1. per batch: (doc_id, term, tf) rows (term frequencies are
         per-doc facts, complete within the doc's batch);
      2. exchange BY TERM: each partition owns its terms' global df
         exactly and annotates its (doc, term, tf) rows with it;
      3. exchange BY DOC: each partition ranks its docs' terms and
         keeps top-k (ties -> term ascending).

    Driver traffic: none until the k-per-doc result."""
    from ..stages.exchange import exchange_map_groups
    import pyarrow.parquet as _pq

    n_docs = _pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    ds = _docs(sf_dir, ["doc_id", "text"])

    def tf_rows(batch: pd.DataFrame) -> pd.DataFrame:
        toks = pd.DataFrame({"doc_id": batch["doc_id"],
                             "term": batch["text"].fillna("").str.split()}) \
                 .explode("term", ignore_index=True).dropna()
        toks = toks[toks["term"] != ""]
        out = toks.groupby(["doc_id", "term"], sort=False,
                           as_index=False).size() \
                  .rename(columns={"size": "tf"})
        out["part"] = (fingerprint_series(out["term"]).astype(np.uint64)
                       % np.uint64(num_partitions)).astype(np.int32)
        return out

    def annotate_df(g: pd.DataFrame) -> pd.DataFrame:
        # this partition owns its terms completely -> exact df
        df = g.groupby("term", sort=False, as_index=False)["doc_id"] \
              .nunique().rename(columns={"doc_id": "df"})
        out = g.merge(df, on="term")
        out["score_q"] = (out["tf"].to_numpy(dtype=np.int64)
                          * np.int64(n_docs) * np.int64(1_000_000)
                          // out["df"].to_numpy(dtype=np.int64))
        out["part"] = (out["doc_id"].to_numpy().astype(np.uint64)
                       % np.uint64(num_partitions)).astype(np.int32)
        return out[["doc_id", "term", "score_q", "part"]]

    def topk_per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score_q", "term"], ascending=[False, True],
                          kind="stable")
        return g.groupby("doc_id", sort=False).head(k)

    by_term = ds.map_batches(tf_rows, batch_format="pandas", batch_size=8192)
    annotated = exchange_map_groups(by_term, "part", num_partitions,
                                    annotate_df)
    return exchange_map_groups(annotated, "part", num_partitions,
                               topk_per_doc).sort(["doc_id", "term"])


def doc_fingerprint(sf_dir: str, portable: bool = True) -> ray.data.Dataset:
    """Content fingerprint per document (the content-key for dedup /
    lineage). Default is the PORTABLE md5-derived 64-bit fingerprint
    (top bit cleared): cross-engine reproducible, so the driver verifies
    it value-exactly against DuckDB ``md5_number_lower(text) >> 1``.
    ``portable=False`` switches to the faster engine-internal polars
    xxhash (rows-only checkable; determinism pytest-verified)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        if portable:
            fp = (md5_hash64_series(batch["text"])
                  >> np.uint64(1)).astype(np.int64)
        else:
            fp = fingerprint_series(batch["text"])
        return pd.DataFrame({"doc_id": batch["doc_id"], "fp": fp})

    return ds.map_batches(f, batch_format="pandas", batch_size=8192).sort("doc_id")


def doc_repetition(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style repetition signals per document: token count,
    distinct-token count, bigram count, and the occurrence count of the
    doc's MOST FREQUENT bigram. The classic repetition filters are the
    ratios (1 - distinct/total tokens; top_bigram_n/n_bigrams) -- kept
    as exact integer numerator/denominator pairs so the oracle check is
    bit-exact (same policy as :func:`doc_quality`).

    Per-doc facts are complete within the doc's batch, so this is a
    single streamed `map_batches` pass -- no shuffle, no driver reduce;
    the bigram build is the same vectorized shift-compare as
    :func:`bigram_counts`."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        toks = pd.DataFrame({"doc_id": batch["doc_id"],
                             "tok": batch["text"].fillna("").str.split()}) \
                 .explode("tok", ignore_index=True).dropna() \
                 .reset_index(drop=True)
        per = toks.groupby("doc_id", sort=False)["tok"]
        n_tok, n_dis = per.size(), per.nunique()
        nxt = toks["tok"].shift(-1)
        same = toks["doc_id"].eq(toks["doc_id"].shift(-1))
        bg = pd.DataFrame({"doc_id": toks["doc_id"][same],
                           "bigram": (toks["tok"] + " " + nxt)[same]})
        cnt = bg.groupby(["doc_id", "bigram"], sort=False).size()
        top = cnt.groupby(level="doc_id").max()
        nbg = cnt.groupby(level="doc_id").sum()
        out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()})
        for col, src in [("n_tokens", n_tok), ("n_distinct_tokens", n_dis),
                         ("n_bigrams", nbg), ("top_bigram_n", top)]:
            out[col] = out["doc_id"].map(src).fillna(0).astype(np.int64)
        return out

    return ds.map_batches(f, batch_format="pandas", batch_size=8192) \
             .sort("doc_id")


#: PII patterns kept to syntax valid AND equivalent in both Python re
#: and RE2 (DuckDB): character classes + bounded quantifiers only, no
#: lookaround, no backrefs -- the redacted string is oracle-compared
#: byte-for-byte.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"


def redact_pii(sf_dir: str) -> ray.data.Dataset:
    """PII redaction over the documents table: emails -> <EMAIL>,
    phone numbers -> <PHONE>, plus an exact count of redactions per
    doc. The testdata text is synthetic word-soup carrying no organic
    PII, so to keep the oracle check non-vacuous the query PLANTS one
    email and one phone per row, derived from doc_id -- the SQL oracle
    performs the identical derivation, so the planted strings are part
    of the checked computation, not a fixture. The redaction kernels
    themselves are generic (vectorized pandas str.replace; a real
    corpus runs the same stage unchanged)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        did = batch["doc_id"].astype(np.int64)
        text = (batch["text"].fillna("") + " contact user"
                + did.astype(str) + "@example.com call +1-555-"
                + (did % 10000).astype(str).str.zfill(4))
        # count phones on the EMAIL-REDACTED string: a phone embedded in
        # an email local part ('user+1-555-1234@x.com') is consumed by
        # the email replacement, so counting both patterns on the raw
        # text would overstate the redactions actually performed
        after_email = text.str.replace(EMAIL_RE, "<EMAIL>", regex=True)
        n = text.str.count(EMAIL_RE) + after_email.str.count(PHONE_RE)
        red = after_email.str.replace(PHONE_RE, "<PHONE>", regex=True)
        return pd.DataFrame({"doc_id": did, "redacted": red,
                             "n_redacted": n.astype(np.int64)})

    return ds.map_batches(f, batch_format="pandas", batch_size=8192) \
             .sort("doc_id")


def lm_novelty(sf_dir: str, k: int = 50) -> ray.data.Dataset:
    """Language-model novelty score per document: the fraction of the
    doc's word bigrams NOT in the corpus top-k bigram LM table -- the
    integer-exact stand-in for perplexity-based quality filtering
    (low novelty = boilerplate built from the corpus's most common
    n-grams; high = unusual text). Emitted as exact counts plus a
    fixed-point ratio (`novelty_ppm = (n_bigrams - n_known) * 1e6 //
    n_bigrams`), so the oracle check is bit-exact -- float log-prob
    perplexity is the same stage with a tolerance check instead.

    Two phases, composing :func:`bigram_counts`: the distributed exact
    top-k fixes the LM table (O(P*k) driver rows), then one streamed
    membership pass (vectorized isin against the tiny closure set; a
    vocabulary-sized LM would broadcast hashes via ray.put, same
    stage shape as dedup.decontaminate). Ties at the k boundary are
    deterministic on both engines: (count desc, bigram asc)."""
    top = bigram_counts(sf_dir, k=k)
    known = frozenset(top["bigram"])
    ds = _docs(sf_dir, ["doc_id", "text"])

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _strict_ngrams   # shared bigram construction
        g = _strict_ngrams(batch, 2)
        per = g.assign(hit=g["gram"].isin(known).astype(np.int64)) \
               .groupby("doc_id", sort=False)["hit"]
        n_bg, n_known = per.size(), per.sum()
        out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()})
        out["n_bigrams"] = out["doc_id"].map(n_bg).fillna(0).astype(np.int64)
        out["n_known"] = out["doc_id"].map(n_known).fillna(0).astype(np.int64)
        denom = np.maximum(out["n_bigrams"].to_numpy(), 1)
        out["novelty_ppm"] = ((out["n_bigrams"] - out["n_known"])
                              * np.int64(1_000_000) // denom)
        return out

    return ds.map_batches(score, batch_format="pandas",
                          batch_size=8192).sort("doc_id")


def bigram_counts(sf_dir: str, k: int = 50,
                  num_partitions: int = 16) -> pd.DataFrame:
    """Top-k word bigrams by total OCCURRENCE count (language-model
    n-gram counting; unigram/trigram are the same shape). Same exact
    three-step scheme as vocab_top_terms (per-batch combiner ->
    hash-route by bigram -> per-partition sum + top-k -> O(P*k) driver
    merge), but counting occurrences, not document frequency. The
    bigram build is one vectorized shift-compare over the exploded
    token frame (no per-doc Python loop). Whitespace tokenization
    matches dedup.shingle_frame / the DuckDB list_transform oracle."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # canonical strict-bigram kernel (dedup._strict_ngrams) — one
        # shift-compare implementation shared with lm_novelty, not a
        # third hand-rolled copy
        from .dedup import _strict_ngrams
        grams = _strict_ngrams(batch, 2)["gram"]
        out = grams.to_frame("bigram").groupby(
            "bigram", sort=False, as_index=False).size() \
            .rename(columns={"size": "n"})
        out["part"] = (fingerprint_series(out["bigram"]).astype(np.uint64)
                       % np.uint64(num_partitions)).astype(np.int32)
        return out

    def topk_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("bigram", sort=False, as_index=False)["n"].sum()
        return out.sort_values(["n", "bigram"], ascending=[False, True],
                               kind="stable").head(k)

    from ..stages.exchange import exchange_map_groups
    routed = ds.map_batches(partial, batch_format="pandas", batch_size=8192)
    cand = exchange_map_groups(routed, "part", num_partitions,
                               topk_part).to_pandas()
    if "bigram" not in cand.columns:  # no bigrams (empty/null corpus)
        return pd.DataFrame({"bigram": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64")})
    cand["n"] = cand["n"].astype("int64")
    return cand.sort_values(["n", "bigram"], ascending=[False, True],
                            kind="stable", ignore_index=True).head(k)
