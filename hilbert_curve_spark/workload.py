"""Named query workload shared by ``__spark_entry__``, tests, and bench.

Rectangle protocol mirrors the reference experiments: square query regions
of 2-12% of the grid edge placed over the gaussian hot spots
(`Experiment/PerformanceEval/DSSESearchVariesByRange.java:35,64-100`).
Keyword workload mixes hot (low-rank, zipf head) and rare keywords
(`keyNums` protocol, `DSSESearchVariesByRange.java:34`).
"""

from __future__ import annotations

from .config import DEFAULT

EDGE = DEFAULT.edge  # 4096

# 8%-edge square overlapping cluster 1 (center edge/4)
R1 = dict(x_lo=900, x_hi=1226, y_lo=800, y_hi=1126)
# 12%-edge square overlapping cluster 2 (center 3*edge/4)
R2 = dict(x_lo=2800, x_hi=3290, y_lo=2900, y_hi=3390)
# small 2%-edge square at the dense center cluster
R3 = dict(x_lo=2000, x_hi=2081, y_lo=2010, y_hi=2091)

KW_ANY = ["k8", "k11", "k4000"]   # hot, hot, rare
KW_ALL = ["k8", "k9"]             # both hot (non-trivial conjunction)

# Raster tile windows (reference generateHilbertMatrix shapes,
# BRQComparisonInput.java:13-23): mixed aspect ratios over the hot spots.
TILES = [
    dict(tile_id="t1", x_start=1000, y_start=980, width=16, height=12),
    dict(tile_id="t2", x_start=3060, y_start=3070, width=8, height=8),
    dict(tile_id="t3", x_start=2040, y_start=2000, width=20, height=5),
    dict(tile_id="t4", x_start=990, y_start=1005, width=64, height=48),
]

# Convex polygons over the gaussian hot centers (FIXTURES.md F4)
POLYGONS = [
    dict(poly_id="p1", vertices=[(1224, 1024), (1086, 1214), (862, 1141), (862, 907), (1086, 834)]),
    dict(poly_id="p2", vertices=[(3372, 3072), (3222, 3332), (2922, 3332), (2772, 3072), (2922, 2812), (3222, 2812)]),
    dict(poly_id="p3", vertices=[(2048, 2248), (1878, 1948), (2218, 1948)]),
]

KNN_Q = (1030, 1015)
KNN_K = 25

# Radius ("nearby") search: circle over the cluster-1 hot spot + keywords.
RADIUS_Q = (1030, 1015)
RADIUS_R = 180

# Spatial-join family: within-radius pair join + batched kNN join.
DIST_RADIUS = 12
# Rectangle-intersection self-join: 1-in-N md5 sample, extents in [1, 40].
RECT_SAMPLE_MOD = 64
RECT_MAX_EXTENT = 40
KNN_JOIN_QUERIES = [("j1", 1030, 1015), ("j2", 3105, 3088), ("j3", 2050, 2061)]
KNN_JOIN_K = 10
POIS = [
    ("poi1", 1024, 1024), ("poi2", 3072, 3072), ("poi3", 2048, 2048),
    ("poi4", 1100, 950), ("poi5", 2990, 3180), ("poi6", 128, 4000),
]
POI_RADIUS = 64
PYRAMID_LEVELS = 5
# isochrone BFS budget: at shift 6 the grid is 64x64, so 12 hops from the
# 6 POIs reaches a meaningful but strictly partial neighborhood (the
# gaussian corpus leaves genuinely unoccupied cells that block propagation)
ISO_MAX_HOPS = 12
# cost-distance budget: weights run 1..4, so 24 buys 6-24 hops depending on
# congestion — the surface visibly bends around the gaussian hot spots
COST_BUDGET = 24


def batch_boxes(n_extra: int = 5, edge: int = EDGE) -> list[tuple[int, int, int, int]]:
    """The grq_batch workload: the three standard boxes plus ``n_extra``
    LCG-seeded squares (sides 5-12% of edge, deterministically placed, some
    overlapping the clusters, some empty territory)."""
    out = [
        (R1["x_lo"], R1["x_hi"], R1["y_lo"], R1["y_hi"]),
        (R2["x_lo"], R2["x_hi"], R2["y_lo"], R2["y_hi"]),
        (R3["x_lo"], R3["x_hi"], R3["y_lo"], R3["y_hi"]),
    ]
    state = 0x2545F491
    for _ in range(n_extra):
        state = (state * 1103515245 + 12345) % (1 << 31)
        side = edge // 20 + state % (edge // 12)
        state = (state * 1103515245 + 12345) % (1 << 31)
        x0 = state % (edge - side)
        state = (state * 1103515245 + 12345) % (1 << 31)
        y0 = state % (edge - side)
        out.append((x0, x0 + side, y0, y0 + side))
    return out
NGRAM_K = 20

# wave 24: rare keyword whose manifest value-set prunes most files (k4000
# appears in ~1/1000 keyword slots — see sources/derive.keyword_sql)
KW_RARE = ["k4000"]
# geo-constrained ANN: the quarter-plane box holds exactly the low-diagonal
# derived cluster (~40% of vectors) — filter-then-rank is non-trivial
GEO_ANN_BOX = dict(x_lo=0, x_hi=EDGE // 2 - 1, y_lo=0, y_hi=EDGE // 2 - 1)
# morphology: 2^6 cells over the trimodal corpus leave a speckled periphery
# the opening must remove and dense cores it must keep
MORPH_SHIFT = 6
MORPH_MIN = 2
DRIFT_DAYS = 7
# wave 25: dwell gap (minutes), retention bucket (days), diff horizons
# (v1 -> v3 over the 3-batch delta log: the net-removed set — docs deleted
# at v2 and NOT re-added at v3)
DWELL_GAP_MIN = 120
RETENTION_DAYS = 7
DIFF_FROM = 1
DIFF_TO = 3
# wave 26: decile bands over the occupancy raster
BANDS = 10
# wave 28: fixed-iteration k-means (k seeds from the densest cells; 3
# Lloyd rounds is where the trimodal corpus centroids stop moving)
KMEANS_K = 6
KMEANS_ITERS = 3

# Ranked disjunctive search: BRQ 'any' over R2 + integer-idf scoring.
# Mixed zipf-head and rare keywords so the weights actually discriminate.
RANKED_KWS = ["k8", "k11", "k120", "k4000"]
RANKED_K = 25
RANKED_SCALE = 10**9

# Route-corridor search: a polyline threading all three hot spots.
ROUTE = [(900, 900), (1200, 1100), (2048, 2048), (3000, 3100), (3300, 3300)]
CORRIDOR_R = 48

# Snap-to-road: AXIS-ALIGNED road segments (road_id, ax, ay, bx, by) — the
# Manhattan-grid map-matching model.  Axis-parallel segments keep the
# nearest-segment distance exact-integer (projection = clamping, no
# division), so the snap argmin is oracle-checkable bit-for-bit.  Partial
# segments (not full chords) so endpoint clamping is actually exercised.
ROADS = [
    ("r_h1", 700, 1000, 1500, 1000),
    ("r_h2", 2600, 3100, 3400, 3100),
    ("r_h3", 1800, 2060, 2300, 2060),
    ("r_h4", 100, 3900, 900, 3900),
    ("r_v1", 1050, 700, 1050, 1400),
    ("r_v2", 3050, 2700, 3050, 3500),
    ("r_v3", 2048, 1800, 2048, 2300),
    ("r_v4", 3900, 200, 3900, 900),
]


def road_grid(
    n_per_axis: int = 16, edge: int = EDGE
) -> list[tuple[str, int, int, int, int]]:
    """A full street grid for the bucketed snap variant: ``n_per_axis``
    jittered vertical + horizontal chords (2*n roads).  Full chords make
    the set COVERING: every lattice point is within ``road_cover_radius``
    of some street, so the within-radius bucketed snap drops nothing."""
    step = edge // n_per_axis
    j = step // 8
    out = []
    for i in range(n_per_axis):
        jv = ((i * 67 + 13) % (2 * j + 1)) - j
        jh = ((i * 29 + 5) % (2 * j + 1)) - j
        xv = min(edge - 1, max(0, i * step + step // 2 + jv))
        yh = min(edge - 1, max(0, i * step + step // 2 + jh))
        out.append((f"sv{i:02d}", xv, 0, xv, edge - 1))
        out.append((f"sh{i:02d}", 0, yh, edge - 1, yh))
    return out


def road_cover_radius(n_per_axis: int = 16, edge: int = EDGE) -> int:
    """Max distance from any lattice point to the nearest `road_grid`
    street: half the spacing plus the jitter bound."""
    step = edge // n_per_axis
    return step // 2 + step // 8 + 1

# DBSCAN: eps/min_pts sized for the fixture's Irwin-Hall hot-spot density
# (measured at sf0.01/amp16: ~200 clusters, max component 15 — small dense
# clumps, no percolation, so the oracle's recursive closure stays linear-ish).
DBSCAN_EPS = 12
DBSCAN_MIN_PTS = 4
DBSCAN_SAMPLE_MOD = 1

# Large reference sets for the cell-bucketed join variants (the literal
# codegen forms above stop being sensible past ~100 reference rows —
# VERDICT r3 item 7).  Both are deterministic pure-Python generators so the
# engine and the DuckDB oracle consume the identical literal list.


def poi_grid(n_side: int = 16, edge: int = EDGE) -> list[tuple[str, int, int]]:
    """n_side^2 POIs on a jittered grid COVERING the domain: spacing
    edge/n_side, jitter < spacing/4, so every lattice point has a POI within
    L2 (spacing/2 + spacing/4) * sqrt(2) — the completeness radius
    ``poi_cover_radius`` below."""
    step = edge // n_side
    j = step // 4
    out = []
    for i in range(n_side):
        for k in range(n_side):
            jx = ((i * 73 + k * 37) % (2 * j + 1)) - j
            jy = ((i * 41 + k * 97) % (2 * j + 1)) - j
            px = min(edge - 1, max(0, i * step + step // 2 + jx))
            py = min(edge - 1, max(0, k * step + step // 2 + jy))
            out.append((f"g{i:02d}_{k:02d}", px, py))
    return out


def poi_cover_radius(n_side: int = 16, edge: int = EDGE) -> int:
    """Smallest integer radius guaranteed to contain the nearest grid POI
    from any lattice point (see poi_grid): ceil(0.75 * step * sqrt(2))."""
    step = edge // n_side
    import math

    return int(math.ceil(0.75 * step * math.sqrt(2)))


def many_fences(n: int = 64, edge: int = EDGE) -> list[dict]:
    """n small diamond fences clustered around the three gaussian hot spots
    (same centers as the corpus distribution, so counts are non-trivial),
    POLYGONS-shaped.  Deterministic integer arithmetic only."""
    centers = [(edge // 4, edge // 4), (3 * edge // 4, 3 * edge // 4), (edge // 2, edge // 2)]
    out = []
    for i in range(n):
        cx0, cy0 = centers[i % 3]
        cx = cx0 + ((i * 2654435761 + 1013904223) % 1025) - 512
        cy = cy0 + ((i * 2246822519 + 3266489917) % 1025) - 512
        r = 16 + (i * 7) % 17
        cx = min(edge - 1 - r, max(r, cx))
        cy = min(edge - 1 - r, max(r, cy))
        out.append(
            dict(
                poly_id=f"f{i:03d}",
                vertices=[(cx + r, cy), (cx, cy + r), (cx - r, cy), (cx, cy - r)],
            )
        )
    return out


# Pipeline-family workload (dedup / ANN), shared by the driver entry and
# bench so both measure the identical query shapes.
JACCARD_T = 25
ANN_QUERY = [float((i * 37 % 19) - 9) / 8.0 for i in range(64)]
ANN_K = 15


def box_sql(r: dict, x: str = "x", y: str = "y") -> str:
    return (
        f"{x} BETWEEN {r['x_lo']} AND {r['x_hi']} "
        f"AND {y} BETWEEN {r['y_lo']} AND {r['y_hi']}"
    )


# Adaptive quadtree tiling: occupancy cap per leaf, finest-grid shift
# (cell edge 2^shift), level count (coarsest edge 2^(shift+levels-1)).
ADAPT_CAP = 300
ADAPT_SHIFT = 4
ADAPT_LEVELS = 6

# Local Moran hot/cold-spot grid (same 64x64 grid as focal_stats).
MORAN_SHIFT = 6

# Equi-depth hilbert range-partitioner bucket count.
PBOUNDS_BUCKETS = 16

# Bulk kNN graph: rank cap + radius bound (shares the pair-join radius).
KNN_GRAPH_K = 4
KNN_GRAPH_RADIUS = 12

# Overlay zones: rectangular vector layer over the hot spots.  z1/z3
# overlap (a footprint credits both), z4 covers sparse territory.
ZONES = [
    ("z1", 800, 700, 1400, 1300),
    ("z2", 2700, 2800, 3500, 3600),
    ("z3", 1200, 1100, 2200, 2200),
    ("z4", 0, 3500, 600, 4095),
]
OVERLAY_SAMPLE_MOD = 16
OVERLAY_MAX_EXTENT = 40

# Road coverage gaps: the spatial anti-join radius over ROADS.
GAP_RADIUS = 500

# Keyword selectivity stats grid (same 64x64 grid as the cover join).
KW_EXTENT_SHIFT = 6

# Integral-image box density: Chebyshev radius (9x9 window at r=4).
DENSITY_R = 4

# Hot-spot region labeling: density threshold on the 64x64 grid.
HOTSPOT_MIN = 10

# Token-budget chunking of interleaved docs: chunk size in proxy tokens
# (text cost = length(text), media cost = flat image-token budget).
CHUNK_BUDGET = 24
MEDIA_TOKEN_COST = 16

# Hot-cell skew report: how many top cells to emit.
SKEW_TOPK = 20

# Cross-doc multimodal sequence packing (pack_mm): sequence token budget
# and shard count (same split-on-pack convention as pack_sequences).
PACK_MM_BUDGET = 512
PACK_MM_SHARDS = 8

# Data-mixture apportionment: global token budget + quality band width.
MIX_BUDGET = 100_000
MIX_BAND = 5

# Boilerplate span detection: document-frequency floor + top-k.
BOILER_MIN_DOCS = 100
BOILER_TOPK = 20

# Keyword co-occurrence: how many top pairs to emit.
COOC_TOPK = 30

# Dominant-keyword raster shift (64x64 grid, the MORAN_SHIFT resolution).
TOPKW_SHIFT = 6

# Regional embedding profile: 16x16 grid; power-of-two quantization scale
# so float->double*scale is exact and FLOOR is engine-neutral.
EMB_SHIFT = 8
EMB_SCALE = 4096

# Global Moran's I: raster shift (16x16 grid) + per-10k quantization
# (makes every downstream integer independent of corpus size).
GMORAN_SHIFT = 8
GMORAN_Q = 10000

# Ripley-style pair-distance histogram radii (max radius prices the
# blocked pair join).
RIPLEY_RADII = (4, 8, 12, 16)


# Polygons with holes / multi-polygons for pip_rings (wave 19): a donut
# around the cluster-1 hot spot (outer square minus a centered hole) and a
# two-part multi-polygon (a cluster-3 square + a detached triangle).
RING_POLYGONS = [
    dict(
        poly_id="donut",
        rings=[
            [(1324, 724), (1324, 1324), (724, 1324), (724, 724)],
            [(1124, 924), (1124, 1124), (924, 1124), (924, 924)],
        ],
    ),
    dict(
        poly_id="twin",
        rings=[
            [(3172, 2872), (3172, 3272), (2772, 3272), (2772, 2872)],
            [(2300, 1800), (2500, 1800), (2400, 2100)],
        ],
    ),
]

# Markov next-cell evaluation: the out-of-time split (2024-01-22 00:00 UTC,
# epoch whole seconds) — ~70/30 train/eval over the 30-day events span; the
# split applies to the LATER event of each transition so no eval pair ever
# contributes to the model.
MARKOV_SPLIT_S = 1705881600

# k-anonymity generalization threshold (anon_cells): chosen so the sf0.01
# fixture corpus exercises all three outcomes (publish at level 0,
# generalize upward, and the empty-suppression sentinel).
K_ANON = 16

# Contamination probes: literal phrases from the synthetic vocabulary (two
# present in many docs, one rarer, one guaranteed miss — the zero-hit row
# must still be emitted).
EVAL_PROBES = [
    ("p_table_value", "table value part"),
    ("p_a_a_the", "a a the"),
    ("p_sort_window", "sort table window"),
    ("p_canary", "heldout eval canary"),
]

# Leakage-buffered spatial split: block width 2^shift, ~1/test_mod test.
SPLIT_SHIFT = 8
SPLIT_TEST_MOD = 5

# Vocabulary growth curve: flat docs per ingestion-order bucket.
VOCAB_BUCKET_DOCS = 64

# Depth-limited Douglas-Peucker trajectory simplification.
TRAJ_SIMP_EPS = 48
TRAJ_SIMP_DEPTH = 3

# Per-source document cap (CommonCrawl-style domain cap).
SOURCE_CAP = 15

# Percolation curve: density thresholds swept over the shift-6 raster
# (1 = every occupied cell .. 64 = the hot core only).
PERC_THRESHOLDS = [1, 4, 16, 64]

# Runtime bloom-filter fetch (index->fact payload join, wave 47): filter
# size in bits (power of two, so the 40-bit md5 fold is EXACTLY uniform
# mod m) and hashes per key; sized for visible-but-bounded false positives
# at fixture scale (~1-2% fp over the unselected corpus).
BLOOM_M = 4096
BLOOM_K = 3

# Convex-hull boundary per region (wave 47): 1-in-mod md5 sample over 2x2
# regions (shift 11); the sample bounds the O(n^3) oracle join.
HULL_SAMPLE_MOD = 16
HULL_SHIFT = 11

# Path-crossing segment join (wave 47): 1-in-mod user sample, segments
# longer than max_len are dropped as teleport noise, PBSM cell shift.
XING_USER_MOD = 8
XING_MAX_LEN = 896
XING_SHIFT = 9

# STR R-tree bulk-load packing (wave 48): leaf capacity.
STR_LEAF_CAP = 512

# Stay-point contact join (wave 48): centroid distance + minimum time
# overlap between different users' stays (stay derivation = the driver
# stay_points defaults).
CONTACT_DIST = 1500
CONTACT_MIN_OVERLAP_S = 1800

# Viterbi map matching (wave 48): steps decoded per user and the flat
# road-switch penalty (comparable to a mid-size dist2 so switching is
# neither free nor forbidden).
VITERBI_T = 5
VITERBI_LAMBDA = 200000

# Line-of-sight visibility between density peaks (wave 49): local-maxima
# peak threshold and the blocking-cell density (shift-6 raster; 41 peaks /
# 241 blockers at the sf0.01 fixture).
VIS_MIN_PEAK = 14
VIS_BLOCK_MIN = 10

# Convex layers / onion peeling (wave 50): layers, md5 sample, regions.
LAYERS_N = 3
LAYERS_SAMPLE_MOD = 16

# Radial density-decay OLS (wave 50): dist2 bucket width 2^shift, dense
# bucket count, and the fixed-point output scale.
DECAY_BUCKET_SHIFT = 16
DECAY_N_BUCKETS = 24
DECAY_SCALE = 1000000

# Peak-to-peak least-cost paths (wave 53): cost budget (matches the
# cell_cost_distance default; prices the oracle's recursive closure).
PEAK_PATH_BUDGET = 24

# Cross-dataset doc x event proximity join (wave 54): radius + 1-in-mod
# event sample (bounds the quadratic oracle).
DEJ_RADIUS = 64
DEJ_MOD = 8
