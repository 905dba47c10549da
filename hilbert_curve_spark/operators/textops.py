"""Text-analysis operators for large-scale training-data pipelines, over the
flat ``documents`` table (doc_id, text, lang, source, n_chars).

Everything is native Column expressions (whole-stage codegen, zero UDFs) and
every derived value is defined by arithmetic/string ops that evaluate
identically in DuckDB, so each operator carries a full SQL oracle:

* fingerprint — md5 of the text (content-addressable doc identity).
* token count — separator counting via length-difference (exact in both
  engines; regexp tokenizers differ subtly across engines so are avoided
  in oracle-checked paths).
* language id — stopword-marker counting heuristic: count occurrences of
  high-frequency function words per language, argmax with a fixed
  priority order.
* quality score — integer-scaled heuristic from length, word count and
  stopword density (the classic pretraining quality gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Integer-only arithmetic throughout: DuckDB *rounds* on CAST(double AS
# BIGINT) while Spark truncates, so doubles never reach a cast here — the
# only division is wrapped in FLOOR (exact for these value ranges).
#
# length-diff of a literal fragment = occurrences * len(frag) — exact,
# engine-agnostic, division-free.
def _lendiff_sql(col: str, frag: str) -> str:
    esc = frag.replace("'", "''")
    return f"(LENGTH({col}) - LENGTH(REPLACE({col}, '{esc}', '')))"


_LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " que ", " los "],
}


def lang_score_sql(lang: str, col: str = "text") -> str:
    """Marker score = sum of length-diffs (occurrence counts scaled by
    marker length — a deliberate, engine-identical weighting)."""
    return "(" + " + ".join(_lendiff_sql(col, m) for m in _LANG_MARKERS[lang]) + ")"


def lang_pred_sql(col: str = "text") -> str:
    """argmax over language marker scores, fixed priority en>de>fr>es;
    'und' (undetermined) when every score is 0."""
    scores = {lang: lang_score_sql(lang, col) for lang in _LANG_MARKERS}
    best = " , ".join(scores.values())
    cases = " ".join(
        f"WHEN {scores[lang]} = GREATEST({best}) THEN '{lang}'"
        for lang in ("en", "de", "fr", "es")
    )
    return f"(CASE WHEN GREATEST({best}) = 0 THEN 'und' {cases} END)"


def word_count_sql(col: str = "text") -> str:
    """words = spaces + 1 on single-space-normalized text (the space
    fragment has length 1, so the length-diff IS the count)."""
    return f"({_lendiff_sql(col, ' ')} + 1)"


def quality_score_sql(col: str = "text") -> str:
    """Integer quality score in [0, 100]: rewards stopword density and
    mid-range length (the usual C4/Gopher-style gates, integer-scaled)."""
    stop = lang_score_sql("en", col)
    wc = word_count_sql(col)
    len_ok = f"(CASE WHEN LENGTH({col}) BETWEEN 200 AND 20000 THEN 40 ELSE 0 END)"
    stop_term = f"LEAST(40, CAST(FLOOR(100.0 * {stop} / {wc}) AS BIGINT))"
    word_ok = f"(CASE WHEN {wc} >= 20 THEN 20 ELSE 0 END)"
    return f"({len_ok} + {stop_term} + {word_ok})"


def text_profile(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint, n_words, lang_pred, quality) — one codegen
    projection, no shuffle."""
    return docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fingerprint"),
        F.expr(word_count_sql()).alias("n_words"),
        F.expr(lang_pred_sql()).alias("lang_pred"),
        F.expr(quality_score_sql()).alias("quality"),
    )


def text_profile_oracle(table: str = "documents") -> str:
    return (
        f"SELECT doc_id, md5(text) AS fingerprint, {word_count_sql()} AS n_words, "
        f"{lang_pred_sql()} AS lang_pred, {quality_score_sql()} AS quality FROM {table}"
    )


# ---------------------------------------------------------------------------
# corpus curation: the selection steps that sit between profiling and
# training — per-language quality ranking and stratified downsampling.
# ---------------------------------------------------------------------------


def quality_topk_per_lang(docs: DataFrame, k: int = 10) -> DataFrame:
    """Top-k docs per predicted language by quality (deterministic
    ``(quality DESC, doc_id)`` tie-break).  One hash shuffle on lang_pred;
    with AQE the handful of language partitions coalesce, and the window's
    partial top-k never materializes a stratum (row_number streams)."""
    from pyspark.sql import Window

    w = Window.partitionBy("lang_pred").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        text_profile(docs)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("lang_pred", "doc_id", "quality", "rank")
    )


def quality_topk_per_lang_oracle(k: int = 10, table: str = "documents") -> str:
    return (
        f"SELECT lang_pred, doc_id, quality, rank FROM ("
        f"SELECT lang_pred, doc_id, quality, "
        f"ROW_NUMBER() OVER (PARTITION BY lang_pred ORDER BY quality DESC, doc_id) AS rank "
        f"FROM ({text_profile_oracle(table)})) WHERE rank <= {k}"
    )


def _doc_hash_sql() -> str:
    """Engine-neutral 60-bit doc hash: md5 hex parsed with the same
    positional-nibble arithmetic the MinHash family uses.  doc_id is cast
    to its decimal string first — identical rendering in both engines, and
    both accept VARCHAR(32) as the cast target."""
    from .dedup import _hex_to_long_sql

    return _hex_to_long_sql("md5(CAST(doc_id AS VARCHAR(32)))", 1, 15)


def stratified_sample_sql_pred(rates: dict[str, int], default_k: int = 1) -> str:
    """``keep`` predicate: hash(doc_id) % k(lang) == 0 — a pure filter, no
    shuffle, no ordering; exactly reproducible on any engine with md5."""
    cases = " ".join(f"WHEN '{s}' THEN {k}" for s, k in sorted(rates.items()))
    k_expr = f"(CASE lang {cases} ELSE {default_k} END)"
    return f"(({_doc_hash_sql()}) % {k_expr} = 0)"


def stratified_sample(
    docs: DataFrame, rates: dict[str, int], default_k: int = 1
) -> DataFrame:
    """Deterministic stratified downsample over the ``lang`` column: keep
    ~1/k of each stratum by content-addressed hash — the way an N-language
    100 TB corpus is rebalanced without sorting anything (a codegen filter
    that rides the scan; compare the window-based ``systematic_sample``,
    which buys exact counts at the price of a per-stratum ordering)."""
    return docs.filter(F.expr(stratified_sample_sql_pred(rates, default_k))).select(
        "doc_id", "lang"
    )


def top_ngrams(docs: DataFrame, k: int = 20, col: str = "text") -> DataFrame:
    """Corpus-wide top-k word bigrams by occurrence count: (ngram, n) —
    the vocabulary/n-gram-statistics pass of a pretraining pipeline.

    Tokenization is a literal single-space split (regex tokenizers differ
    across engines; the space split is bit-identical — the same contract as
    ``word_count_sql``).  Physical plan: codegen split/transform/explode
    (native ``transform(sequence(...))`` builds the bigram list — no Python
    in the fan-out), hash aggregation with map-side partial combine (the
    zipf head of the ngram distribution is absorbed by the combiner — every
    task emits each hot ngram once), then a distributed partial top-k
    (``orderBy().limit()`` = TakeOrdered, nothing global is sorted).
    Deterministic tie-break ``(n DESC, ngram)`` in both engines (Spark
    UTF8_BINARY ≡ DuckDB binary collation)."""
    toks = f"split({col}, ' ')"
    bigrams = (
        f"transform(sequence(1, size({toks}) - 1), "
        f"i -> element_at({toks}, i) || ' ' || element_at({toks}, i + 1))"
    )
    return (
        docs.filter(F.expr(f"size({toks}) >= 2"))
        .select(F.explode(F.expr(bigrams)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "ngram")
        .limit(k)
    )


def top_ngrams_oracle(k: int = 20, table: str = "documents", col: str = "text") -> str:
    return f"""
WITH toks AS (SELECT string_split({col}, ' ') AS t FROM {table}),
grams AS (
  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS ngram
  FROM toks WHERE len(t) >= 2
)
SELECT ngram, COUNT(*) AS n FROM grams GROUP BY ngram
ORDER BY n DESC, ngram LIMIT {k}
"""


def stratified_sample_oracle(
    rates: dict[str, int], default_k: int = 1, table: str = "documents"
) -> str:
    return (
        f"SELECT doc_id, lang FROM {table} "
        f"WHERE {stratified_sample_sql_pred(rates, default_k)}"
    )


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (rolling k-gram hash + window-min selection)
# ---------------------------------------------------------------------------
#
# The MOSS winnowing algorithm (Schleimer/Wilkerson/Aiken, SIGMOD 2003):
# hash every character k-gram, slide a window of w consecutive hashes, keep
# the minimum of each window — any shared substring of length >= w + k - 1
# between two documents is GUARANTEED to share a selected fingerprint.
# This is the "document fingerprinting (rolling hash)" pipeline op; the
# whole-doc md5 in text_profile is exact identity, this is locality.
#
# Engine-neutral form: the per-gram rolling hash is the 40-bit md5 fold the
# engine uses everywhere (dedup's _hex_to_long_sql) — semantically a
# rolling hash (one value per position, shifted by one char each step),
# computed as substr+md5 because Spark and DuckDB cannot share a stateful
# polynomial accumulator but DO share md5 bit-for-bit.  The window minimum
# is one analytic pass; selected fingerprints are the per-doc DISTINCT
# window minima.
#
# 100 TB shape: one narrow projection, a native posexplode (sequence) with
# ~|text| fan-out, ONE window shuffle on doc_id (shuffle-free when the
# corpus is stored bucketed by doc_id), and a hash aggregation with
# map-side combine.  No Python anywhere.

WINNOW_K = 8    # k-gram length
WINNOW_W = 16   # window size: matches of >= w + k - 1 = 23 chars detected
_WINNOW_MOD = 1 << 40


def winnow_selected(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, m): the DISTINCT selected window-minimum fingerprints per
    doc — the raw winnowing fingerprint set (join it with itself on ``m``
    for locality-based match candidates)."""
    from pyspark.sql import Window

    from .dedup import _hex_to_long_sql

    h = _hex_to_long_sql("md5(CAST(substr(text, pos, " + str(k) + ") AS BINARY))", 1, 10)
    grams = (
        docs.filter(F.length("text") >= k + w - 1)
        .select(
            "doc_id",
            F.expr(f"explode(sequence(1, length(text) - {k} + 1))").alias("pos"),
            "text",
        )
        .select("doc_id", "pos", F.expr(h).alias("hv"))
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)
    return (
        grams.withColumn("m", F.min("hv").over(win))
        .filter(F.col("pos") >= w)
        .select("doc_id", "m")
        .distinct()
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, n_fps, fp_fold): the winnowing fingerprint set per doc —
    ``n_fps`` distinct selected fingerprints and their modular sum (the
    checkable digest of the set).  Docs shorter than ``k + w - 1`` chars
    have no full window and are excluded (the algorithm's domain)."""
    return winnow_selected(docs, k, w).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fps"),
        (F.sum("m") % _WINNOW_MOD).cast("long").alias("fp_fold"),
    )


def winnow_fingerprints_oracle(
    k: int = WINNOW_K, w: int = WINNOW_W, table: str = "documents"
) -> str:
    """DuckDB oracle: the identical k-gram hash, window minimum, DISTINCT
    selection and modular digest."""
    from .dedup import _hex_to_long_sql

    h = _hex_to_long_sql(f"md5(substr(text, CAST(p AS INTEGER), {k}))", 1, 10)
    return f"""
WITH g AS (
  SELECT doc_id, text FROM {table} WHERE length(text) >= {k + w - 1}
), pos AS (
  SELECT doc_id, unnest(range(1, length(text) - {k} + 2)) AS p, text FROM g
), h AS (
  SELECT doc_id, p, {h} AS hv FROM pos
), wmin AS (
  SELECT doc_id, p,
         MIN(hv) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS m
  FROM h
), sel AS (
  SELECT DISTINCT doc_id, m FROM wmin WHERE p >= {w}
)
SELECT doc_id, COUNT(*) AS n_fps,
       CAST(SUM(m) % {_WINNOW_MOD} AS BIGINT) AS fp_fold
FROM sel GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (Cormode/Muthukrishnan, J. Algorithms 2005)
# ---------------------------------------------------------------------------

DEFAULT_CMS_PROBES = (
    "join", "hash", "row", "batch", "scan", "column", "filter", "merge",
    "order", "vector", "data", "spark", "table", "key", "window", "sort",
    "value", "line", "zzz-absent",
)


def _cms_col_sql(kw_sql: str, d_sql: str, width: int) -> str:
    """Engine-neutral CMS column index: 40-bit md5 fold of the salted token,
    mod the sketch width.  Same text in Spark SQL and DuckDB."""
    from .dedup import _hex_to_long_sql

    h = _hex_to_long_sql(f"md5('cms' || CAST({d_sql} AS STRING) || ':' || {kw_sql})", 1, 10)
    return f"({h} % {int(width)})"


def heavy_hitters_cms(
    docs: DataFrame,
    probes: tuple[str, ...] = DEFAULT_CMS_PROBES,
    depth: int = 4,
    width: int = 256,
    col: str = "text",
) -> DataFrame:
    """Count-min-sketch frequency estimates for a probe vocabulary:
    ``(kw, exact_n, cms_est)`` with the CMS guarantee ``cms_est >=
    exact_n`` (point-query estimate = min over the sketch's ``depth``
    salted-hash rows).  Like the KMV sketch (``rollup.cell_distinct_kmv``)
    this sketch is a pure function of the data — engine-neutral md5-fold
    hashing, integer counters — so the ESTIMATE ITSELF is oracle-checkable,
    which Spark's built-in count_min_sketch (xxhash-seeded, binary blob)
    is not.  ``exact_n`` is carried alongside so the result exposes the
    approximation error.

    Physical plan: one tokenize/explode scan fans out ``depth``x into the
    (d, col) histogram — hash aggregation with map-side combine, so each
    task emits at most depth*width partial rows regardless of corpus size;
    the probe-side estimate is a broadcast-sized join against the
    depth*width-row sketch.  At 100 TB the sketch stays depth*width rows:
    the whole reduce is O(1) in the corpus."""
    spark = docs.sparkSession
    toks_sql = f"split({col}, ' ')"
    kws = docs.select(F.explode(F.expr(toks_sql)).alias("kw"))
    fan = kws.withColumn("d", F.explode(F.expr(f"sequence(0, {int(depth) - 1})")))
    cms = (
        fan.withColumn("c", F.expr(_cms_col_sql("kw", "d", width)))
        .groupBy("d", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    probe_df = spark.createDataFrame([(p,) for p in probes], "kw string")
    probe_cells = probe_df.withColumn(
        "d", F.explode(F.expr(f"sequence(0, {int(depth) - 1})"))
    ).withColumn("c", F.expr(_cms_col_sql("kw", "d", width)))
    est = (
        probe_cells.join(cms, ["d", "c"], "left")
        .groupBy("kw")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_est"))
    )
    exact = (
        kws.join(F.broadcast(probe_df), "kw", "leftsemi")
        .groupBy("kw")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    return (
        probe_df.join(exact, "kw", "left")
        .join(est, "kw")
        .select(
            "kw",
            F.coalesce(F.col("n_exact"), F.lit(0)).alias("exact_n"),
            F.col("cms_est"),
        )
    )


def heavy_hitters_cms_oracle(
    probes: tuple[str, ...] = DEFAULT_CMS_PROBES,
    depth: int = 4,
    width: int = 256,
    table: str = "documents",
    col: str = "text",
) -> str:
    """Identical sketch arithmetic in DuckDB (same salted md5 fold, same
    min-over-rows point query); outer CASTs keep every count BIGINT."""
    ds = ", ".join(f"({d})" for d in range(int(depth)))
    ps = ", ".join("('" + p.replace("'", "''") + "')" for p in probes)
    return f"""WITH kws AS (
  SELECT unnest(string_split({col}, ' ')) AS kw FROM {table}
), dd(d) AS (VALUES {ds}),
cms AS (
  SELECT d, {_cms_col_sql('kw', 'd', width)} AS c, COUNT(*) AS n
  FROM kws, dd GROUP BY 1, 2
), probes(kw) AS (VALUES {ps}),
pc AS (
  SELECT kw, d, {_cms_col_sql('kw', 'd', width)} AS c FROM probes, dd
), est AS (
  SELECT kw, MIN(COALESCE(cms.n, 0)) AS cms_est
  FROM pc LEFT JOIN cms USING (d, c) GROUP BY kw
), exact AS (
  SELECT kw, COUNT(*) AS n_exact FROM kws
  WHERE kw IN (SELECT kw FROM probes) GROUP BY kw
)
SELECT p.kw, CAST(COALESCE(e.n_exact, 0) AS BIGINT) AS exact_n,
       CAST(est.cms_est AS BIGINT) AS cms_est
FROM probes p LEFT JOIN exact e ON p.kw = e.kw JOIN est ON p.kw = est.kw"""


# ---------------------------------------------------------------------------
# eval-set contamination scan (literal probe phrases)
# ---------------------------------------------------------------------------


def contamination_scan(
    docs: DataFrame, probes: list[tuple[str, str]]
) -> DataFrame:
    """Training-data CONTAMINATION screen — ``(probe_id, n_docs, n_occ)``:
    for each literal probe phrase (a held-out eval question, a benchmark
    canary string), how many corpus documents contain it verbatim and how
    many total occurrences exist.  The occurrence count is the exact
    non-overlapping count via the replace identity ``(len(t) -
    len(replace(t, p, ''))) / len(p)`` — integer-divisible by
    construction, identical semantics in both engines.  Probes with zero
    hits still report (every document emits a row per probe, so the
    output schema and row count are |probes|, data-independent).

    This is the verbatim tier of the contamination ladder: exact phrase
    here, near-verbatim via :func:`.dedup.containment_pairs` (shingle
    containment), semantic via the embedding families.  Plan: ONE codegen
    projection — the probe array is a literal, the explode fans each doc
    to |probes| rows inside whole-stage codegen, and the aggregation is a
    map-side-combined |probes|-group hash agg.  Fine to ~100 probes; at
    thousands of probes switch to a broadcast probe table + an
    Aho-Corasick ``mapInPandas`` pass (one automaton scan per doc instead
    of |probes| substring scans)."""
    quoted = ", ".join(
        f"named_struct('probe_id', '{pid}', 'p', '{pat}')" for pid, pat in probes
    )
    ex = docs.select(
        F.explode(F.expr(f"array({quoted})")).alias("pr"), F.col("text")
    ).select(
        F.col("pr.probe_id").alias("probe_id"),
        F.expr(
            "(length(text) - length(replace(text, pr.p, ''))) DIV length(pr.p)"
        ).alias("occ"),
    )
    return ex.groupBy("probe_id").agg(
        F.sum(F.when(F.col("occ") > 0, 1).otherwise(0)).cast("long").alias("n_docs"),
        F.sum("occ").cast("long").alias("n_occ"),
    )


def contamination_scan_oracle(
    probes: list[tuple[str, str]], table: str = "documents"
) -> str:
    """Identical literal probe table, replace identity, and aggregation."""
    vals = ", ".join(f"('{pid}', '{pat}')" for pid, pat in probes)
    return f"""WITH cs_probes AS (
  SELECT * FROM (VALUES {vals}) p(probe_id, pat)
), cs_hits AS (
  SELECT p.probe_id,
         (LENGTH(d.text) - LENGTH(REPLACE(d.text, p.pat, ''))) // LENGTH(p.pat)
           AS occ
  FROM {table} d CROSS JOIN cs_probes p
)
SELECT probe_id,
       CAST(SUM(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       CAST(SUM(occ) AS BIGINT) AS n_occ
FROM cs_hits GROUP BY probe_id"""


def _ac_build(patterns: list[str]):
    """Aho-Corasick automaton as plain dicts (goto, fail, output) — built
    once per executor task over the (small) probe list.  A C-backed
    automaton (`pyahocorasick`) drops in here when available outside this
    sandbox; the construction and scan semantics are identical."""
    goto: list[dict[str, int]] = [{}]
    out: list[list[int]] = [[]]
    for pid, pat in enumerate(patterns):
        s = 0
        for ch in pat:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].append(pid)
    fail = [0] * len(goto)
    from collections import deque

    q = deque()
    for ch, s in goto[0].items():
        q.append(s)
    while q:
        r = q.popleft()
        for ch, s in goto[r].items():
            q.append(s)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[s] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != s else 0
            out[s] = out[s] + out[fail[s]]
    return goto, fail, out


def _ac_scan(text: str, goto, fail, out, n_pat: int) -> list[int]:
    """Single left-to-right pass; returns per-pattern match counts
    (ALL occurrences, including overlapping)."""
    counts = [0] * n_pat
    s = 0
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        for pid in out[s]:
            counts[pid] += 1
    return counts


def contamination_scan_ac(
    docs: DataFrame, probes: list[tuple[str, str]]
) -> DataFrame:
    """Aho-Corasick form of :func:`contamination_scan` — the documented
    >100-probe scale path, same output contract ``(probe_id, n_docs,
    n_occ)``: ONE automaton pass per document regardless of probe count,
    run as an Arrow-batched ``mapInPandas`` stage (the media-pipeline
    plumbing: no per-row Python UDF registered with the optimizer, the
    scan lives inside the batch iterator).

    Semantics note vs the codegen scan: Aho-Corasick counts ALL
    occurrences including OVERLAPPING ones, while the replace identity
    counts non-overlapping, greedy left-to-right.  The two agree whenever
    no probe can overlap itself (no non-trivial self-period shorter than
    its length) — true of the workload probes — and the shared oracle
    pins exactly that agreement.

    Plan: the only shuffle is the final |probes|-group agg over
    per-partition partial count frames (each batch emits |probes| rows,
    pre-combined map-side).  At 10^12 docs this is the shape you want:
    automaton build is per-task and O(total probe chars), the scan is one
    pass per doc, and nothing but (probe, partial-count) rows ever move."""
    import pandas as pd

    pats = [p for _, p in probes]
    pids = [pid for pid, _ in probes]

    def _iter(batches):
        goto, fail, out = _ac_build(pats)
        for b in batches:
            n_docs = [0] * len(pats)
            n_occ = [0] * len(pats)
            for t in b["text"]:
                c = _ac_scan(t, goto, fail, out, len(pats))
                for i, v in enumerate(c):
                    if v:
                        n_docs[i] += 1
                        n_occ[i] += v
            yield pd.DataFrame(
                {"probe_id": pids, "pn_docs": n_docs, "pn_occ": n_occ}
            )

    partial = docs.select("text").mapInPandas(
        _iter, "probe_id string, pn_docs long, pn_occ long"
    )
    return partial.groupBy("probe_id").agg(
        F.sum("pn_docs").cast("long").alias("n_docs"),
        F.sum("pn_occ").cast("long").alias("n_occ"),
    )


# ---------------------------------------------------------------------------
# training-sequence packing and quality-weighted sampling
# ---------------------------------------------------------------------------


def pack_sequences(
    docs: DataFrame, budget_tokens: int = 512, shards: int = 8
) -> DataFrame:
    """Training-SEQUENCE packing plan — ``(shard, seq_id, n_docs,
    n_tokens, first_doc, last_doc)``: documents are laid into fixed
    ``budget_tokens`` sequences in deterministic ``doc_id`` order within
    ``doc_id % shards`` shards; a document belongs to the sequence where
    its first token lands (``seq_id = cum_tokens_before DIV budget`` —
    the split-on-pack convention: a straddling doc is truncated/continued
    at materialization time, the PLAN assigns it where it starts).  This
    is the packing step every LLM data pipeline runs between curation and
    tokenization; the plan form (counts per sequence, not payloads) is
    what the engine owns at 100 TB — materialization is a later
    shard-local pass.

    Exact: token counts are the engine's separator-count rule
    (:func:`word_count_sql` — no tokenizer-library divergence), shard is
    ``doc_id % shards`` (engine-neutral, no hash function dependence),
    and the running sum is a plain window.  Plan: one codegen projection,
    ONE shard+doc_id shuffle for the cumulative window, and a
    sequence-bounded final agg.  Shards bound window state and give the
    materializer its parallel unit."""
    b = int(budget_tokens)
    s = int(shards)
    from pyspark.sql import Window

    base = docs.select(
        "doc_id",
        F.expr(f"doc_id % {s}").alias("shard"),
        F.expr(word_count_sql()).cast("long").alias("toks"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        base.withColumn("cum", F.coalesce(F.sum("toks").over(w), F.lit(0)))
        .withColumn("seq_id", F.expr(f"cum DIV {b}"))
    )
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("n_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


def pack_sequences_oracle(
    budget_tokens: int = 512, shards: int = 8, table: str = "documents"
) -> str:
    """Identical shard rule, running sum, and DIV assignment."""
    b = int(budget_tokens)
    s = int(shards)
    return f"""WITH pk_base AS (
  SELECT doc_id, doc_id % {s} AS shard,
         CAST({word_count_sql()} AS BIGINT) AS toks
  FROM {table}
), pk_cum AS (
  SELECT doc_id, shard, toks,
         COALESCE(SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM pk_base
)
SELECT shard, CAST(cum // {b} AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS n_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM pk_cum GROUP BY shard, CAST(cum // {b} AS BIGINT)"""


def weighted_sample(docs: DataFrame, k: int = 25) -> DataFrame:
    """Quality-WEIGHTED deterministic sample — ``(lang_pred, doc_id,
    quality, rk)``: per predicted language, the ``k`` documents with the
    smallest ``md5(doc_id) DIV (quality + 1)`` key.  The key is the
    integer weighted-bottom-k rule (a doc with twice the weight halves
    its key scale, doubling its selection odds), fully deterministic and
    engine-neutral — the sampling analogue of the KMV sketch's
    hash-order-statistic trick, replacing the float ``u^(1/w)`` of A-Res
    with integer division so the oracle can replay it bit-for-bit.

    Plan: one codegen projection (profile + key) and one per-language
    top-k window — partial top-k per partition before the shuffle, the
    quality_topk_per_lang shape.  At 10^12 docs the moved rows are
    bounded by k x partitions per language."""
    kk = int(k)
    from .dedup import _hex_to_long_sql
    from pyspark.sql import Window

    key = (
        f"{_hex_to_long_sql('md5(CAST(doc_id AS STRING))', 1, 10)}"
        f" DIV ({quality_score_sql()} + 1)"
    )
    base = docs.select(
        "doc_id",
        F.expr(lang_pred_sql()).alias("lang_pred"),
        F.expr(quality_score_sql()).cast("long").alias("quality"),
        F.expr(key).cast("long").alias("skey"),
    )
    w = Window.partitionBy("lang_pred").orderBy("skey", "doc_id")
    return (
        base.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= kk)
        .select("lang_pred", "doc_id", "quality", F.col("rk").cast("int").alias("rk"))
    )


def weighted_sample_oracle(k: int = 25, table: str = "documents") -> str:
    """Identical key, stratification, and tie-break."""
    kk = int(k)
    from .dedup import _hex_to_long_sql

    key = (
        f"{_hex_to_long_sql('md5(CAST(doc_id AS STRING))', 1, 10)}"
        f" // ({quality_score_sql()} + 1)"
    )
    return f"""WITH ws_base AS (
  SELECT doc_id, {lang_pred_sql()} AS lang_pred,
         CAST({quality_score_sql()} AS BIGINT) AS quality,
         CAST({key} AS BIGINT) AS skey
  FROM {table}
), ws_ranked AS (
  SELECT lang_pred, doc_id, quality,
         ROW_NUMBER() OVER (PARTITION BY lang_pred ORDER BY skey, doc_id) AS rk
  FROM ws_base
)
SELECT lang_pred, doc_id, quality, CAST(rk AS INT) AS rk
FROM ws_ranked WHERE rk <= {kk}"""


def mixture_plan(docs: DataFrame, budget: int, band_width: int = 5) -> DataFrame:
    """Data-MIXTURE allocation plan — ``(lang_pred, band, n_docs,
    n_tokens, alloc_tokens)``: a global token ``budget`` is apportioned
    across (predicted language, quality band) strata proportionally to
    each stratum's token mass, by the largest-remainder (Hamilton)
    method in EXACT integer arithmetic: every stratum gets
    ``floor(budget * tokens / total)``, and the leftover seats go to the
    largest remainders (tie-break ``(remainder DESC, lang_pred, band)``),
    so ``SUM(alloc_tokens) == budget`` exactly.  This is the sampling-
    weights step between curation and training — the plan every mixture
    schedule (lang balancing, quality up-weighting) starts from.

    Physical plan: ONE corpus scan into a map-side-combined histogram
    (strata count = |langs| x |bands| — a few dozen rows), then all the
    apportionment arithmetic runs as windows over that histogram-sized
    frame; the single-partition windows are safe BECAUSE the frame is
    histogram-sized, never data-sized.  Integer precondition (documented,
    checked by the conservation test): ``budget * max_stratum_tokens``
    must fit int64 — at larger budgets swap the multiply to
    DECIMAL(38,0) in both engines."""
    b = int(budget)
    bw = int(band_width)
    from pyspark.sql import Window

    strata = (
        docs.select(
            F.expr(lang_pred_sql()).alias("lang_pred"),
            F.expr(f"({quality_score_sql()}) DIV {bw}").alias("band"),
            F.expr(word_count_sql()).cast("long").alias("toks"),
        )
        .groupBy("lang_pred", "band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("n_tokens"),
        )
    )
    wall = Window.partitionBy()
    wrank = Window.orderBy(
        F.desc("rem"), F.asc("lang_pred"), F.asc("band")
    )
    planned = (
        strata.withColumn("total", F.sum("n_tokens").over(wall))
        .withColumn("fl", F.expr(f"({b} * n_tokens) DIV total"))
        .withColumn("rem", F.expr(f"({b} * n_tokens) % total"))
        .withColumn("extra", F.lit(b) - F.sum("fl").over(wall))
        .withColumn("rk", F.row_number().over(wrank))
    )
    return planned.select(
        "lang_pred",
        "band",
        "n_docs",
        "n_tokens",
        (F.col("fl") + F.when(F.col("rk") <= F.col("extra"), 1).otherwise(0))
        .cast("long")
        .alias("alloc_tokens"),
    )


def mixture_plan_oracle(
    budget: int, band_width: int = 5, table: str = "documents"
) -> str:
    """Identical histogram, floor/remainder arithmetic, and seat
    tie-break."""
    b = int(budget)
    bw = int(band_width)
    return f"""WITH mx_strata AS (
  SELECT {lang_pred_sql()} AS lang_pred,
         CAST(({quality_score_sql()}) // {bw} AS BIGINT) AS band,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM({word_count_sql()}) AS BIGINT) AS n_tokens
  FROM {table} GROUP BY 1, 2
), mx_tot AS (
  SELECT *, SUM(n_tokens) OVER () AS total,
         ({b} * n_tokens) // SUM(n_tokens) OVER () AS fl,
         ({b} * n_tokens) % SUM(n_tokens) OVER () AS rem
  FROM mx_strata
), mx_rk AS (
  SELECT *, {b} - SUM(fl) OVER () AS extra,
         ROW_NUMBER() OVER (ORDER BY rem DESC, lang_pred, band) AS rk
  FROM mx_tot
)
SELECT lang_pred, band, n_docs, n_tokens,
       CAST(fl + (CASE WHEN rk <= extra THEN 1 ELSE 0 END) AS BIGINT)
         AS alloc_tokens
FROM mx_rk"""


def source_profile(docs: DataFrame) -> DataFrame:
    """Per-source curation profile — ``(source, n_docs, n_uniq,
    sum_quality, sum_tokens)``: document count, DISTINCT exact
    fingerprints (the within-source dedup headroom), and exact integer
    quality/token mass (sums, not means — means are a driver-side
    division away and sums stay engine-exact).  The distinct count uses
    the same bag-of-words signature as ``dedup.source_overlap``, so the
    two reports share one duplicate definition.  Together they are the
    source-selection report every corpus refresh starts from.

    Physical plan: one scan, one |sources|-group agg with map-side
    combine; COUNT DISTINCT partials partition cleanly by the group
    key."""
    from .dedup import wordset_fp_sql

    return (
        docs.select(
            "source",
            F.expr(wordset_fp_sql()).alias("fp"),
            F.expr(quality_score_sql()).cast("long").alias("q"),
            F.expr(word_count_sql()).cast("long").alias("wc"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("fp").cast("long").alias("n_uniq"),
            F.sum("q").cast("long").alias("sum_quality"),
            F.sum("wc").cast("long").alias("sum_tokens"),
        )
    )


def source_profile_oracle(table: str = "documents") -> str:
    """Identical profile arithmetic."""
    from .dedup import _wordset_fp_duck

    return (
        f"SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        f"CAST(COUNT(DISTINCT {_wordset_fp_duck()}) AS BIGINT) AS n_uniq, "
        f"CAST(SUM({quality_score_sql()}) AS BIGINT) AS sum_quality, "
        f"CAST(SUM({word_count_sql()}) AS BIGINT) AS sum_tokens "
        f"FROM {table} GROUP BY source"
    )


def length_deciles(docs: DataFrame, buckets: int = 10) -> DataFrame:
    """Exact corpus length quantiles — ``(decile, threshold)``: for each
    ``d in 1..buckets-1``, the smallest token count ``t`` such that at
    least ``d/buckets`` of documents have ``tokens <= t`` (the lower
    quantile convention, exact — no sketch, no interpolation).  Length
    quantiles drive truncation budgets and packing-efficiency estimates
    in a training pipeline, and the usual approach (approxQuantile /
    t-digest) is neither exact nor engine-portable.

    Physical plan — the HISTOGRAM TRICK that makes exact quantiles
    scale-free: token counts are integers bounded by document length, so
    ONE map-side-combined ``groupBy(tokens)`` collapses 10^12 docs to a
    histogram of at most ~|distinct lengths| rows; the cumulative window
    and the per-decile threshold search then run on that histogram-sized
    frame (the zonal_median / cell_bands convention).  The only
    data-sized operation is the first scan."""
    b = int(buckets)
    from pyspark.sql import Window

    hist = (
        docs.select(F.expr(word_count_sql()).cast("long").alias("toks"))
        .groupBy("toks")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.orderBy("toks").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(wall)
    )
    # decile d is the first length whose cumulative count reaches
    # ceil(d * total / b) — integer ceil via (d * total + b - 1) DIV b
    exploded = cum.select(
        "toks",
        "cum",
        "total",
        F.explode(F.expr(f"sequence(1, {b - 1})")).alias("decile"),
    ).filter(F.expr(f"cum >= (decile * total + {b} - 1) DIV {b}"))
    return (
        exploded.groupBy("decile")
        .agg(F.min("toks").cast("long").alias("threshold"))
        .select(F.col("decile").cast("int").alias("decile"), "threshold")
    )


def length_deciles_oracle(buckets: int = 10, table: str = "documents") -> str:
    """Identical histogram, cumulative window, and integer-ceil search."""
    b = int(buckets)
    return f"""WITH ld_hist AS (
  SELECT CAST({word_count_sql()} AS BIGINT) AS toks,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1
), ld_cum AS (
  SELECT toks,
         CAST(SUM(n) OVER (ORDER BY toks
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(n) OVER () AS BIGINT) AS total
  FROM ld_hist
), ld_hit AS (
  SELECT d.decile, toks FROM ld_cum,
         (SELECT unnest(range(1, {b})) AS decile) d
  WHERE cum >= (d.decile * total + {b} - 1) // {b}
)
SELECT CAST(decile AS INT) AS decile,
       CAST(MIN(toks) AS BIGINT) AS threshold
FROM ld_hit GROUP BY decile"""


def source_caps(docs: DataFrame, cap: int = 15) -> DataFrame:
    """Per-source document-cap curation plan — ``(source, n_docs, n_kept,
    kept_tokens, dropped_tokens)``: keep at most ``cap`` documents per
    source, chosen by ``(quality DESC, md5-hash ASC, doc_id ASC)`` — the
    CommonCrawl-style per-domain cap that stops one hot domain from
    dominating the training mixture, with the deterministic hash as the
    within-quality shuffle.

    Plan: one codegen projection (quality + token count + hash key), one
    per-source ``row_number`` window, one ``|sources|``-group aggregation.
    Spark's window operator already computes per-partition partial sorts
    before the shuffle; at 10^12 docs with truly monstrous domains the
    two-level partial top-C form applies verbatim (per-partition
    ``row_number <= cap`` pre-filter, then the global window over the
    survivors — bounded at ``cap x partitions`` moved rows per source;
    same trick :func:`weighted_sample` documents), because only rank
    ``<= cap`` ever matters and ranks only grow when partitions merge."""
    from .dedup import _hex_to_long_sql

    key = _hex_to_long_sql("md5(CAST(doc_id AS STRING))", 1, 10)
    base = docs.select(
        "source",
        "doc_id",
        F.expr(word_count_sql()).cast("long").alias("tokens"),
        F.expr(quality_score_sql()).cast("long").alias("quality"),
        F.expr(key).cast("long").alias("skey"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.desc("quality"), F.asc("skey"), F.asc("doc_id")
    )
    ranked = base.withColumn("rk", F.row_number().over(w))
    kept = F.col("rk") <= int(cap)
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(kept, F.col("tokens")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
        F.sum(F.when(kept, 0).otherwise(F.col("tokens")))
        .cast("long")
        .alias("dropped_tokens"),
    )


def source_caps_oracle(cap: int = 15, table: str = "documents") -> str:
    """Identical key, rank, and integer mass split."""
    from .dedup import _hex_to_long_sql

    key = _hex_to_long_sql("md5(CAST(doc_id AS STRING))", 1, 10)
    return f"""WITH sc_base AS (
  SELECT source, doc_id,
         CAST({word_count_sql()} AS BIGINT) AS tokens,
         CAST({quality_score_sql()} AS BIGINT) AS quality,
         CAST({key} AS BIGINT) AS skey
  FROM {table}
), sc_ranked AS (
  SELECT source, tokens,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY quality DESC, skey, doc_id) AS rk
  FROM sc_base
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rk <= {int(cap)} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN rk <= {int(cap)} THEN tokens ELSE 0 END) AS BIGINT)
         AS kept_tokens,
       CAST(SUM(CASE WHEN rk <= {int(cap)} THEN 0 ELSE tokens END) AS BIGINT)
         AS dropped_tokens
FROM sc_ranked GROUP BY source"""
