"""kNN exactness property: the banded/growing-box kNN must equal the
brute-force top-k for arbitrary query points (including far-from-data
corners where the box must grow several rounds)."""

import pytest
from pyspark.sql import functions as F

from hilbert_curve_spark.config import DEFAULT
from hilbert_curve_spark.operators.knn import knn
from hilbert_curve_spark.operators.encode import encode_documents
from hilbert_curve_spark.sources.interleave import build_documents


@pytest.fixture(scope="module")
def geo(spark, sf_dir):
    g = encode_documents(build_documents(spark, sf_dir, amp=4)).cache()
    g.count()
    return g


@pytest.mark.parametrize(
    "qx,qy,k",
    [
        (1030, 1015, 25),   # inside the hot cluster
        (0, 0, 10),         # empty corner — box must grow repeatedly
        (4095, 0, 5),       # lattice corner
        (2048, 2048, 50),   # dense center, larger k
    ],
)
def test_knn_equals_bruteforce(geo, qx, qy, k):
    got = [(r["doc_id"], r["dist2"]) for r in knn(geo, qx, qy, k, DEFAULT).collect()]
    d2 = (F.col("x") - qx) ** 2 + (F.col("y") - qy) ** 2
    brute = [
        (r["doc_id"], r["dist2"])
        for r in geo.withColumn("dist2", d2.cast("long"))
        .orderBy("dist2", "doc_id")
        .limit(k)
        .collect()
    ]
    assert got == brute
    assert len(got) == min(k, geo.count())
