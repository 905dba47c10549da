"""DuckDB SQL renderer for the S2 cell-id kernel in ``curve/s2.py``.

Emits a CTE chain that computes, for every row of a points relation with
double columns ``(vx, vy, vz)`` (unnormalized direction vectors), the same
signed-int64 S2 cell id the numpy kernel produces — operation-for-operation
identical (compare / divide / sqrt / floor / integer bit-ops are all
IEEE-exact-rounded, so both engines agree bit-for-bit).  This is what lets
the driver's DuckDB value-hash oracle verify real S2 encoding.

The 4-level lookup table is a 1024-row relation; the 8 table steps of the
encoder unroll into 8 hash-join stages against it (columnar-friendly — no
per-row list materialization).
"""

from __future__ import annotations

from hilbert_curve_spark.curve.s2 import LOOKUP_BITS, LOOKUP_POS, MAX_LEVEL, SWAP_MASK


def _lookup_rows_sql() -> str:
    vals = ", ".join(str(int(x)) for x in LOOKUP_POS)
    return (
        f"SELECT unnest(range({len(LOOKUP_POS)})) AS lidx, unnest([{vals}]) AS lval"
    )


def s2_sql_cte(points_sql: str, level: int, pre_ctes: str = "") -> str:
    """WITH chain ending in CTE ``s2v(key, s2_cell)``.

    ``points_sql`` must yield columns ``key, vx, vy, vz`` (key carried
    through untouched); ``s2_cell`` is the signed-int64 id at ``level``.
    """
    mask = (1 << LOOKUP_BITS) - 1
    stages = []
    prev = "s2base"
    for k in range(7, -1, -1):
        sh = k * LOOKUP_BITS
        stage = f"s2k{k}"
        stages.append(
            f"{stage} AS (SELECT p.key, p.i, p.j, "
            f"p.acc + ((l.lval >> 2)::HUGEINT * {1 << (k * 2 * LOOKUP_BITS)}::HUGEINT) AS acc, "
            f"l.lval & 3 AS bits "
            f"FROM {prev} p JOIN s2lut l ON l.lidx = "
            f"((((p.i >> {sh}) & {mask}) * {1 << (LOOKUP_BITS + 2)}) + "
            f"(((p.j >> {sh}) & {mask}) * 4) + p.bits))"
        )
        prev = stage
    lsb = 1 << (2 * (MAX_LEVEL - level))
    two63 = 1 << 63
    two64 = 1 << 64
    return f"""WITH {pre_ctes}s2pts AS ({points_sql}),
s2lut AS ({_lookup_rows_sql()}),
s2f AS (
  SELECT key, vx, vy, vz,
         CASE WHEN abs(vx) > abs(vy)
              THEN (CASE WHEN abs(vx) > abs(vz) THEN 0 ELSE 2 END)
              ELSE (CASE WHEN abs(vy) > abs(vz) THEN 1 ELSE 2 END) END AS comp
  FROM s2pts
), s2face AS (
  SELECT key, vx, vy, vz,
         CASE WHEN (CASE comp WHEN 0 THEN vx WHEN 1 THEN vy ELSE vz END) < 0
              THEN comp + 3 ELSE comp END AS face
  FROM s2f
), s2uv AS (
  SELECT key, face,
         CASE face WHEN 0 THEN vy / vx WHEN 1 THEN -vx / vy WHEN 2 THEN -vx / vz
                   WHEN 3 THEN vz / vx WHEN 4 THEN vz / vy ELSE -vy / vz END AS u,
         CASE face WHEN 0 THEN vz / vx WHEN 1 THEN vz / vy WHEN 2 THEN -vy / vz
                   WHEN 3 THEN vy / vx WHEN 4 THEN -vx / vy ELSE -vx / vz END AS v
  FROM s2face
), s2st AS (
  SELECT key, face,
         CASE WHEN u >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * abs(u))
              ELSE 1.0 - 0.5 * sqrt(1.0 + 3.0 * abs(u)) END AS s,
         CASE WHEN v >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * abs(v))
              ELSE 1.0 - 0.5 * sqrt(1.0 + 3.0 * abs(v)) END AS t
  FROM s2uv
), s2base AS (
  SELECT key,
         GREATEST(0, LEAST({(1 << MAX_LEVEL) - 1},
             CAST(floor(s * {float(1 << MAX_LEVEL)}) AS BIGINT))) AS i,
         GREATEST(0, LEAST({(1 << MAX_LEVEL) - 1},
             CAST(floor(t * {float(1 << MAX_LEVEL)}) AS BIGINT))) AS j,
         (face::HUGEINT * {1 << 60}::HUGEINT) AS acc,
         face & {SWAP_MASK} AS bits
  FROM s2st
), {', '.join(stages)},
s2leaf AS (
  SELECT key, acc * 2 + 1 AS hid FROM {prev}
), s2signed AS (
  SELECT key,
         CAST(CASE WHEN hid >= {two63}::HUGEINT THEN hid - {two64}::HUGEINT
                   ELSE hid END AS BIGINT) AS leaf
  FROM s2leaf
), s2v AS (
  SELECT key, (leaf & -{lsb}) | {lsb} AS s2_cell FROM s2signed
)"""
