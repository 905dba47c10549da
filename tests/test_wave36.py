"""Wave-36: evaluation suite — kNN label accuracy and LSH-blocked
cluster purity against the embeddings ground truth."""

import math

import numpy as np

from hilbert_curve_spark.operators.similarity import _PQ_OFFSET, _PQ_SCALE


def _load(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.collect()
    vecs = {r.vec_id: [np.float32(v) for v in r.embedding] for r in rows}
    labels = {r.vec_id: int(r.label) for r in rows}
    return emb, vecs, labels


def test_label_knn_accuracy_brute_force(spark, sf_dir):
    from hilbert_curve_spark.operators.similarity import label_knn_accuracy

    emb, vecs, labels = _load(spark, sf_dir)
    q = {
        i: [int(math.floor(float(np.float64(v)) * _PQ_SCALE)) + _PQ_OFFSET
            for v in vecs[i]]
        for i in vecs
    }
    per_label = {}
    for a in vecs:
        dists = sorted(
            (sum((x - y) ** 2 for x, y in zip(q[a], q[b])), b)
            for b in vecs
            if b != a
        )[:5]
        votes = {}
        for _, b in dists:
            votes[labels[b]] = votes.get(labels[b], 0) + 1
        pred = min(votes, key=lambda l: (-votes[l], l))
        n, c = per_label.get(labels[a], (0, 0))
        per_label[labels[a]] = (n + 1, c + (1 if pred == labels[a] else 0))
    expect = {
        (l, n, c, (1_000_000 * c) // n) for l, (n, c) in per_label.items()
    }
    got = {
        (r.label, r.n_vecs, r.n_correct, r.acc_ppm)
        for r in label_knn_accuracy(emb, 5).collect()
    }
    assert got == expect
    # the metric discriminates: the synthetic labels are mostly random
    # w.r.t. geometry, but at least one label is structured — its accuracy
    # clears the 1/|labels| random floor by >1.5x (label 0 reads ~30% vs
    # the 10% floor at sf0.001)
    assert max(t[3] for t in got) > 150_000


def test_label_knn_accuracy_ivf_blocked(spark, sf_dir):
    """IVF-blocked candidate generation: python model of the strided
    centroids, integer-cosine argmax assignment, per-vector nprobe probe
    list, then the identical vote/score tail restricted to probed cells."""
    from hilbert_curve_spark.operators.similarity import (
        IVF_STRIDE,
        label_knn_accuracy,
    )

    emb, vecs, labels = _load(spark, sf_dir)
    C, nprobe, k = 12, 2, 5
    cents = sorted(i for i in vecs if i % IVF_STRIDE == 0)[:C]

    def ccos(v, c):
        dot = sum(float(np.float64(x)) * float(np.float64(y))
                  for x, y in zip(vecs[v], vecs[c]))
        nv = math.sqrt(sum(float(np.float64(x)) ** 2 for x in vecs[v]))
        nc = math.sqrt(sum(float(np.float64(x)) ** 2 for x in vecs[c]))
        return math.floor(1_000_000.0 * dot / (nv * nc))

    ranked = {
        v: sorted(cents, key=lambda c: (-ccos(v, c), c)) for v in vecs
    }
    assign = {v: ranked[v][0] for v in vecs}
    probe = {v: set(ranked[v][:nprobe]) for v in vecs}
    q = {
        i: [int(math.floor(float(np.float64(v)) * _PQ_SCALE)) + _PQ_OFFSET
            for v in vecs[i]]
        for i in vecs
    }
    per_label = {}
    for a in vecs:
        cand = [b for b in vecs if b != a and assign[b] in probe[a]]
        dists = sorted(
            (sum((x - y) ** 2 for x, y in zip(q[a], q[b])), b) for b in cand
        )[:k]
        votes = {}
        for _, b in dists:
            votes[labels[b]] = votes.get(labels[b], 0) + 1
        pred = min(votes, key=lambda l: (-votes[l], l))
        n, c = per_label.get(labels[a], (0, 0))
        per_label[labels[a]] = (n + 1, c + (1 if pred == labels[a] else 0))
    expect = {
        (l, n, c, (1_000_000 * c) // n) for l, (n, c) in per_label.items()
    }
    got = {
        (r.label, r.n_vecs, r.n_correct, r.acc_ppm)
        for r in label_knn_accuracy(emb, k, n_centroids=C, nprobe=nprobe).collect()
    }
    assert got == expect
    # blocking must not destroy the signal the metric exists to measure
    assert max(t[3] for t in got) > 150_000
    # scale shape: the candidate join is an equi-join on cid — no
    # CartesianProduct; the only nested-loop joins are the C-row broadcast
    # centroid fanout
    plan = (
        label_knn_accuracy(emb, k, n_centroids=C, nprobe=nprobe)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_embed_cluster_purity_brute_force(spark, sf_dir):
    from hilbert_curve_spark.operators.similarity import (
        _planes,
        embed_cluster_purity,
    )

    emb, vecs, labels = _load(spark, sf_dir)
    dim = len(next(iter(vecs.values())))
    planes = _planes(dim, 3)

    def bucket(v):
        code = 0
        for j in range(3):
            acc = 0.0
            for x, w in zip(v, planes[j]):
                acc += float(np.float64(x)) * float(w)
            if acc > 0:
                code |= 1 << j
        return code

    def cos_e6(a, b):
        dot = 0.0
        for x, y in zip(vecs[a], vecs[b]):
            dot += float(np.float64(x)) * float(np.float64(y))
        na = math.sqrt(sum(float(np.float64(x)) ** 2 for x in vecs[a]))
        nb = math.sqrt(sum(float(np.float64(x)) ** 2 for x in vecs[b]))
        return math.floor(1_000_000.0 * dot / (na * nb))

    buckets = {i: bucket(vecs[i]) for i in vecs}
    ids = sorted(vecs)
    pairs = [
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if buckets[a] == buckets[b] and cos_e6(a, b) >= 150_000
    ]
    # union-find closure
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for x in parent:
        clusters.setdefault(find(x), []).append(x)
    expect = set()
    for members in clusters.values():
        rep = min(members)
        counts = {}
        for m in members:
            counts[labels[m]] = counts.get(labels[m], 0) + 1
        top = min(counts, key=lambda l: (-counts[l], l))
        expect.add(
            (rep, len(members), top, counts[top],
             (1_000_000 * counts[top]) // len(members))
        )
    got = {
        (r.cluster, r.size, r.top_label, r.n_top, r.purity_ppm)
        for r in embed_cluster_purity(emb, 3, 150_000).collect()
    }
    assert got == expect
    assert expect  # clusters form at this threshold
    # the LSH-blocked (not label-blocked) pairing yields MIXED clusters —
    # purity < 1e6 somewhere is exactly why this eval metric exists
    assert any(p < 1_000_000 for *_, p in got)
    assert any(s > 2 for _, s, *_ in got)  # non-trivial cluster sizes
