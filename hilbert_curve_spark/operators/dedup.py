"""Deduplication operators for large-scale training-data pipelines.

Four families, each scalable to 10^12 docs:

* **exact** — content hash (md5) group-by; the canonical survivor is the
  minimum doc_id per hash.  One shuffle on the hash; map-side partial
  aggregation applies.  Full SQL oracle.
* **n-gram Jaccard** — word-shingle similarity join with a cheap blocking
  key (doc length band + first token) so the pair space is bounded; exact
  Jaccard on ``array_intersect``/``array_union`` sizes.  Full SQL oracle
  (DuckDB list functions).
* **MinHash + LSH** — signature = per-hash-family min over shingle hashes
  (vectorized numpy over Arrow batches); signatures banded into LSH
  buckets; candidate pairs = bucket self-join.  Oracle-free (engine
  family); validated in pytest against exact Jaccard (recall/precision
  bounds on the derived corpus).
* **SimHash** — 64-bit weighted-projection fingerprint, hamming-ball
  candidate pairs via 4x16-bit band blocking.  Same pytest validation.

MinHash/SimHash hash functions are deterministic (no seed-at-runtime), so
results are stable across runs and resumable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame) -> DataFrame:
    """One survivor (min doc_id) per identical text: (fingerprint, keep_doc_id,
    n_copies)."""
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def exact_dedup_oracle(table: str = "documents") -> str:
    return (
        f"SELECT md5(text) AS fingerprint, MIN(doc_id) AS keep_doc_id, "
        f"COUNT(*) AS n_copies FROM {table} GROUP BY md5(text)"
    )


# ---------------------------------------------------------------------------
# word-shingle Jaccard with blocking (exact similarity join)
# ---------------------------------------------------------------------------

def _shingle_col(n: int = 3) -> F.Column:
    """Distinct word n-gram array (native: split + transform + slice)."""
    toks = "split(text, ' ')"
    grams = (
        f"array_distinct(transform(sequence(1, greatest(1, size({toks}) - {n - 1})), "
        f"i -> array_join(slice({toks}, i, {n}), ' ')))"
    )
    return F.expr(grams)


def jaccard_pairs(
    docs: DataFrame, threshold_pct: int = 80, n: int = 3, band: int = 32
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: pairs (doc_a, doc_b, jac_pct)
    with jaccard >= threshold (integer percent — no float compare).

    Blocking: docs join only within the same word-count band (length ratio
    bound implied by the Jaccard threshold) AND sharing the same first
    token.  Self-join shuffles on the block key; AQE splits skewed blocks.
    """
    g = docs.select(
        "doc_id",
        _shingle_col(n).alias("grams"),
        F.expr(f"CAST(FLOOR(size(split(text, ' ')) / {band}.0) AS INT)").alias("lband"),
        F.expr("split(text, ' ')[0]").alias("tok0"),
    )
    a = g.alias("a")
    b = g.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.col("a.grams")) + F.size(F.col("b.grams")) - inter
    jac_pct = F.floor(F.lit(100) * inter / union).cast("long")
    return (
        a.join(
            b,
            (F.col("a.lband") == F.col("b.lband"))
            & (F.col("a.tok0") == F.col("b.tok0"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac_pct.alias("jac_pct"),
        )
        .filter(F.col("jac_pct") >= threshold_pct)
    )


def jaccard_pairs_oracle(table: str = "documents", threshold_pct: int = 80, n: int = 3, band: int = 32) -> str:
    grams = (
        f"list_distinct([array_to_string(toks[i : i + {n - 1}], ' ') "
        f"for i in range(1, greatest(2, len(toks) - {n - 2}))])"
    )
    return f"""
WITH g AS (
  SELECT doc_id, {grams} AS grams,
         CAST(FLOOR(len(toks) / {band}.0) AS INT) AS lband, toks[1] AS tok0
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM {table})
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(FLOOR(100.0 * len(list_intersect(a.grams, b.grams)) /
            (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))) AS BIGINT) AS jac_pct
FROM g a JOIN g b
  ON a.lband = b.lband AND a.tok0 = b.tok0 AND a.doc_id < b.doc_id
WHERE CAST(FLOOR(100.0 * len(list_intersect(a.grams, b.grams)) /
      (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))) AS BIGINT) >= {threshold_pct}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_NUM_HASHES = 128


def _hash_params(num: int = _NUM_HASHES) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(20240316)  # fixed — determinism requirement
    a = rng.integers(1, _MERSENNE, num, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, num, dtype=np.int64)
    return a, b


def _token_hash(tokens: np.ndarray) -> np.ndarray:
    """FNV-1a 64-bit over utf-8 bytes (python-int arithmetic with explicit
    wraparound — deterministic across processes, unlike builtin hash())."""
    mask = (1 << 64) - 1
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):  # per distinct shingle — bounded set
        h = 1469598103934665603
        for byte in t.encode("utf-8"):
            h = ((h ^ byte) * 1099511628211) & mask
        out[i] = h
    return out


def minhash_signatures(docs: DataFrame, num_hashes: int = _NUM_HASHES, n: int = 3) -> DataFrame:
    """(doc_id, sig: array<long>) — Arrow-batched vectorized MinHash over
    word n-gram shingles."""
    a, b = _hash_params(num_hashes)

    @F.pandas_udf(ArrayType(LongType()))
    def _minhash(grams: pd.Series) -> pd.Series:
        sigs = []
        for gl in grams:
            if gl is None or len(gl) == 0:
                sigs.append([0] * num_hashes)
                continue
            th = _token_hash(np.asarray(gl, dtype=object)).astype(np.int64) & ((1 << 61) - 1)
            # sig_i = min_j (a_i * h_j + b_i) mod M  — outer product, vectorized
            vals = (np.multiply.outer(a.astype(np.object_), th) + b[:, None]) % _MERSENNE
            sigs.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(sigs)

    return docs.select("doc_id", _shingle_col(n).alias("grams")).select(
        "doc_id", _minhash("grams").alias("sig")
    )


def minhash_lsh_pairs(
    sigs: DataFrame, bands: int = 32, rows: int = 4
) -> DataFrame:
    """Candidate pairs whose signatures collide in >=1 LSH band.

    explode to (band_id, band_hash) -> shuffle on the bucket key ->
    self-join within buckets.  Hot buckets (boilerplate docs) are exactly
    the skew case: AQE skew-join splits them; at 10^12 docs the bucket id
    additionally gets a salt on the build of per-bucket pair lists.
    """
    assert bands * rows <= _NUM_HASHES
    band_expr = (
        f"transform(sequence(0, {bands - 1}), "
        f"b -> named_struct('band', b, 'bh', hash(slice(sig, b * {rows} + 1, {rows}))))"
    )
    buckets = sigs.select("doc_id", F.explode(F.expr(band_expr)).alias("e")).select(
        "doc_id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, simhash: long) — 64-bit SimHash over shingle hashes."""

    @F.pandas_udf(LongType())
    def _simhash(grams: pd.Series) -> pd.Series:
        out = np.zeros(len(grams), dtype=np.int64)
        for i, gl in enumerate(grams):
            if gl is None or len(gl) == 0:
                continue
            th = _token_hash(np.asarray(gl, dtype=object))
            bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            fp = np.uint64(0)
            for k in range(64):
                if vote[k] > 0:
                    fp |= np.uint64(1) << np.uint64(k)
            out[i] = np.int64(fp.astype(np.int64))
        return pd.Series(out)

    return docs.select("doc_id", _shingle_col(n).alias("grams")).select(
        "doc_id", _simhash("grams").alias("simhash")
    )


def simhash_near_pairs(fps: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs within hamming distance via 4x16-bit band blocking (any pair
    with distance <= 3 shares at least one exact 16-bit band)."""
    bands = F.expr(
        "transform(sequence(0, 3), b -> named_struct('band', b, "
        "'piece', (simhash >> (b * 16)) & 65535))"
    )
    pieces = fps.select("doc_id", "simhash", F.explode(bands).alias("e")).select(
        "doc_id", "simhash", F.col("e.band").alias("band"), F.col("e.piece").alias("piece")
    )
    a = pieces.alias("a")
    b = pieces.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.piece") == F.col("b.piece"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )
