"""Deterministic derivation of the interleaved spatial-document corpus from
the driver's flat ``documents`` parquet (doc_id, text, lang, source, n_chars).

The authoritative input shape (`BASELINE.json input_hint`) is
``documents(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)``.
No external data may be used, so the corpus is *derived* from the flat table
with pure integer arithmetic keyed on ``doc_id``.  Every derived quantity is
defined ONCE as an ANSI-SQL snippet that parses identically in Spark SQL
(via ``F.expr``) and DuckDB (the correctness oracle), guaranteeing the two
engines agree bit-for-bit:

* ``(x, y)`` lattice coordinates at order 12 reproduce the reference's
  multi-gaussian hot-spot distribution (3 centers at (.25,.25)/(.75,.75)/
  (.5,.5) of the edge, weights .4/.3/.3, sigma = edge/12 —
  `SpatialDataProcessor/StaticData/DataSetAccess.java:149-162`) via an
  Irwin-Hall sum of four integer-LCG uniforms (sum of 4 uniforms over
  [0,590] has sigma = 591*sqrt(1/3) ~ 341 = edge/12).
* keywords ``k<j>`` follow a power-law (zipf-ish) rank distribution
  (reference: Zipf s=1.0, universe 8000, `DataSetAccess.java:80-124`)
  via ``j = floor(8000 / (1 + u))`` with ``u`` uniform on [0,1000).

Only ``+ * % CASE LEAST GREATEST FLOOR || CAST`` are used — all exact in
int64/double for the value ranges involved, so Spark and DuckDB cannot
diverge.
"""

from __future__ import annotations

ORDER = 12
EDGE = 1 << ORDER           # 4096
SIGMA_HALF = 590            # uniform half-width for Irwin-Hall (sigma ~ edge/12)
KW_UNIVERSE = 8000
KW_PER_DOC = 4
MEDIA_MOD = 3               # sid % 3 media spans per doc

# Corpus amplification: each flat doc derives AMP interleaved documents with
# synthetic id  sid = doc_id * 8192 + rep  (rep in [0, AMP)), so the spatial
# corpus is AMP x the flat table (the flat tables are only 500-5000 rows;
# the reference experiments run 20k-1M objects).  Identical in both engines:
# Spark explode(sequence(...)), DuckDB unnest(range(...)).
AMP = 16
SID_SQL = "(doc_id * 8192 + rep)"


def corpus_sql(table: str = "documents", amp: int = AMP) -> str:
    """Amplified id stream: one row per (flat doc, rep) with column sid."""
    return (
        f"(SELECT doc_id * 8192 + rep AS sid FROM {table}, "
        f"(SELECT unnest(range(0, {amp})) AS rep))"
    )

# independent LCG streams (multiplier, increment); moduli chosen so
# doc_id * mult stays well inside int64 for doc_id < 2**32
_PRIME = 1_000_003
_STREAMS = {
    "ux0": (2654435761, 1013904223),
    "ux1": (2246822519, 3266489917),
    "ux2": (3266489917, 374761393),
    "ux3": (668265263, 2869860233),
    "uy0": (374761393, 2246822519),
    "uy1": (3550635116, 668265263),
    "uy2": (2869860233, 3550635116),
    "uy3": (179424691, 2654435761),
    "kw0": (15485863, 32452843),
    "kw1": (49979687, 67867967),
    "kw2": (86028121, 104395301),
    "kw3": (122949823, 141650939),
}


def _u(stream: str, mod: int, id_col: str = "sid") -> str:
    """Uniform integer in [0, mod) from an LCG stream keyed by doc_id."""
    mult, add = _STREAMS[stream]
    return f"((({id_col} * {mult} + {add}) % {_PRIME}) % {mod})"


def _axis_expr(axis: str, id_col: str = "sid") -> str:
    """Lattice coordinate: cluster center + Irwin-Hall(4) offset, clamped."""
    center = (
        f"(CASE WHEN {id_col} % 10 < 4 THEN {EDGE // 4} "
        f"WHEN {id_col} % 10 < 7 THEN {3 * EDGE // 4} "
        f"ELSE {EDGE // 2} END)"
    )
    us = " + ".join(_u(f"u{axis}{i}", SIGMA_HALF + 1, id_col) for i in range(4))
    mean = 4 * SIGMA_HALF // 2
    return f"GREATEST(0, LEAST({EDGE - 1}, {center} + ({us}) - {mean}))"


def x_sql(id_col: str = "sid") -> str:
    return _axis_expr("x", id_col)


def y_sql(id_col: str = "sid") -> str:
    return _axis_expr("y", id_col)


def keyword_sql(j: int, id_col: str = "sid") -> str:
    """j-th keyword of a doc: 'k' || floor(8000/(1+u)), u ~ U[0,1000)."""
    u = _u(f"kw{j}", 1000, id_col)
    rank = f"CAST(FLOOR({KW_UNIVERSE}.0 / (1 + {u})) AS BIGINT)"
    return f"('k' || CAST({rank} AS STRING))"


def doc_key_sql(id_col: str = "sid") -> str:
    """String document key per input_hint: 'doc' || zero-padded id."""
    return f"('doc' || LPAD(CAST({id_col} AS STRING), 10, '0'))"


def n_media_sql(id_col: str = "sid") -> str:
    return f"({id_col} % {MEDIA_MOD})"


def doc_geo_select_sql(table: str = "documents", amp: int = AMP) -> str:
    """Full oracle-side projection: the reference-shaped doc_geo row
    (FIXTURES.md F2) minus the hilbert column (which only the engine — or the
    recursive-CTE oracle in tile queries — computes)."""
    kws = ", ".join(f"{keyword_sql(j)} AS kw{j}" for j in range(KW_PER_DOC))
    return (
        f"SELECT {doc_key_sql()} AS doc_key, {x_sql()} AS x, {y_sql()} AS y, {kws} "
        f"FROM {corpus_sql(table, amp)}"
    )
