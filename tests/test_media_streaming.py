"""Media plumbing + streaming incremental linkage."""

import time

from pyspark.sql import functions as F

from recordlinker_spark.config import dibbs_default
from recordlinker_spark.operators.media import (
    decode_features,
    extract_media_refs,
    fetch_payloads,
    sample_frames,
)
from recordlinker_spark.schemas import DOCUMENTS_SCHEMA
from recordlinker_spark.sources.spandoc import docs_to_rows
from recordlinker_spark.streaming.incremental import link_stream

from fixtures_patients import SIX_PATIENTS


def test_media_pipeline(spark):
    docs = [
        (
            f"r{i}",
            p,
            [(1, f"media://img/{i}.png"), (3, f"media://vid/{i}.mp4")],
        )
        for i, p in enumerate(SIX_PATIENTS[:3])
    ]
    df = spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA)
    refs = extract_media_refs(df)
    rows = refs.collect()
    assert len(rows) == 6
    assert {r["media_type"] for r in rows} == {"image", "video"}

    feats = decode_features(fetch_payloads(refs), dim=8)
    out = feats.collect()
    assert len(out) == 6
    assert all(len(r["feature"]) == 8 for r in out)
    # deterministic: same ref -> same feature
    again = decode_features(fetch_payloads(refs), dim=8).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))

    frames = sample_frames(refs, every_n=30, max_frames=4)
    fr = frames.collect()
    assert len(fr) > 0
    assert all(r["frame_no"] % 30 == 0 for r in fr)


def test_streaming_incremental_link(spark, tmp_path):
    """The stream (1 file per micro-batch) reproduces the sequential
    linking outcome of the 6-patient scenario: [no,match,no,match,no,no],
    cluster sizes [1,1,1,3] (reference test_link.py:322-327)."""
    src = tmp_path / "stream_src"
    src.mkdir()
    mpi_dir = str(tmp_path / "mpi")
    dec_dir = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")

    # one parquet file per record, named so file order = record order
    for i, p in enumerate(SIX_PATIENTS):
        df = spark.createDataFrame(
            docs_to_rows([(f"r{i}", p, [(2, f"m://{i}")])]), DOCUMENTS_SCHEMA
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(src / f"batch_{i}"))

    alg = dibbs_default()
    # process files strictly one directory at a time, in order
    for i in range(len(SIX_PATIENTS)):
        q = link_stream(
            spark, str(src / f"batch_{i}"), mpi_dir, dec_dir,
            f"{ckpt}/{i}", alg,
        )
        q.awaitTermination(120)

    decisions = spark.read.parquet(dec_dir)
    rows = {r["record_id"]: r for r in decisions.collect()}
    assert len(rows) == 6
    matches = [rows[f"r{i}"]["final_grade"] == "certain" for i in range(6)]
    assert matches == [False, True, False, True, False, False]
    sizes = sorted(
        r["count"]
        for r in spark.read.parquet(mpi_dir)
        .groupBy("person_id").count().collect()
    )
    assert sizes == [1, 1, 1, 3]
