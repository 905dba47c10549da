"""Structured-Streaming update ingestion: micro-batch appends + versioned
merge-on-read equals last-writer-wins."""

import json

from hilbert_curve_spark.operators.updates import merge_on_read
from hilbert_curve_spark.streaming.updates_stream import read_log, stream_updates


def test_stream_updates_merge(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "b0.json").write_text(
        "\n".join(json.dumps({"doc_id": f"d{i}", "op": "add"}) for i in range(10))
    )
    (src / "b1.json").write_text(
        "\n".join(json.dumps({"doc_id": f"d{i}", "op": "del"}) for i in (2, 4))
    )
    (src / "b2.json").write_text(json.dumps({"doc_id": "d2", "op": "add"}))
    # distinct mtimes pin the file-source pickup (and hence version) order
    import os, time
    now = time.time()
    for i, f in enumerate(["b0.json", "b1.json", "b2.json"]):
        os.utime(src / f, (now + i * 10, now + i * 10))

    q = stream_updates(
        spark, str(src), str(tmp_path / "log"), str(tmp_path / "ck")
    )
    q.awaitTermination(120)

    log = read_log(spark, str(tmp_path / "log"))
    # every batch landed with a distinct monotone version
    versions = sorted(r["version"] for r in log.select("version").distinct().collect())
    assert len(versions) == 3

    live = {r["doc_id"] for r in merge_on_read(log).collect()}
    assert live == {f"d{i}" for i in range(10)} - {"d4"}  # d2 re-added, d4 deleted
