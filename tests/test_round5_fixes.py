"""Regression tests for the round-5 review fixes: CC checkpoint input
fingerprinting, streaming run identity + replay-vs-resubmission guard,
sessionize NULL-value parity, complete block capping on both join
paths, palettized-BMP decode, and metrics-store migration fallback."""

import json
import struct

import pytest
from pyspark.sql import functions as F

from fixtures_patients import SIX_PATIENTS
from recordlinker_spark.config import dibbs_default
from recordlinker_spark.schemas import DOCUMENTS_SCHEMA
from recordlinker_spark.sources.spandoc import docs_to_rows


# ---------------------------------------------------------------- CC
def test_cc_resume_rejects_different_input(spark, tmp_path):
    """connected_components(checkpoint_dir=D) fingerprints its input:
    resuming D with a DIFFERENT edge set must raise, not silently
    return the previous input's components."""
    from recordlinker_spark.operators.cluster import connected_components

    d = str(tmp_path / "cc")
    e1 = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    lab1 = {r["record_id"]: r["component"]
            for r in connected_components(e1, checkpoint_dir=d).collect()}
    assert lab1["c"] == "a" and lab1["y"] == "x"

    e2 = spark.createDataFrame([("p", "q")], "src string, dst string")
    with pytest.raises(ValueError, match="different edge set"):
        connected_components(e2, checkpoint_dir=d)

    # same input resumes cleanly from the converged state
    lab1b = {r["record_id"]: r["component"]
             for r in connected_components(e1, checkpoint_dir=d).collect()}
    assert lab1b == lab1

    # a legacy manifest (iteration state, no input fingerprint) cannot
    # be validated -> refuse rather than silently resume
    mf = f"{d}/CC_MANIFEST.jsonl"
    lines = [ln for ln in open(mf) if '"input"' not in ln]
    with open(mf, "w") as fh:
        fh.writelines(lines)
    with pytest.raises(ValueError, match="no input fingerprint"):
        connected_components(e1, checkpoint_dir=d)


# --------------------------------------------------------- streaming
def _batch(spark, ids, patients):
    return spark.createDataFrame(
        docs_to_rows([(i, p, []) for i, p in zip(ids, patients)]),
        DOCUMENTS_SCHEMA,
    )


def test_resubmission_batch_is_processed(spark, tmp_path):
    """A genuinely NEW batch whose records are all already in the MPI
    (a re-submission — the reference links every POST /link) must emit
    decisions; only a true replay (same run_id/batch_id, decisions
    already written, records in MPI) is skipped."""
    from recordlinker_spark.streaming.incremental import IncrementalLinker

    mpi_dir = str(tmp_path / "mpi")
    dec_dir = str(tmp_path / "dec")
    sink = IncrementalLinker(spark, mpi_dir, dec_dir, dibbs_default())
    ids = [f"r{i}" for i in range(3)]
    sink(_batch(spark, ids, SIX_PATIENTS[:3]), 0)
    dec = spark.read.parquet(dec_dir)
    assert dec.filter(F.col("batch_id") == 0).count() == 3

    # resubmit the SAME records as a NEW batch id -> must be linked
    sink(_batch(spark, ids, SIX_PATIENTS[:3]), 1)
    dec = spark.read.parquet(dec_dir)
    assert dec.filter(F.col("batch_id") == 1).count() == 3
    # each resubmitted record matches its own prior instance
    assert (
        dec.filter(
            (F.col("batch_id") == 1) & (F.col("final_grade") == "certain")
        ).count()
        == 3
    )

    # a true replay of batch 1 is still skipped (no duplicate MPI rows)
    n_mpi = spark.read.parquet(mpi_dir).count()
    sink(_batch(spark, ids, SIX_PATIENTS[:3]), 1)
    assert spark.read.parquet(mpi_dir).count() == n_mpi


def test_run_id_comes_from_checkpoint_metadata(spark, tmp_path):
    """run_id must be the streaming query id (regenerated when the
    checkpoint is wiped), not a hash of the checkpoint PATH — a
    wipe-and-reprocess at the same path would otherwise overwrite the
    previous run's decision partitions."""
    from recordlinker_spark.streaming.incremental import IncrementalLinker

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "metadata").write_text(json.dumps({"id": "run-A-uuid"}))
    sink = IncrementalLinker(
        spark, str(tmp_path / "mpi"), str(tmp_path / "dec"),
        dibbs_default(), checkpoint_dir=str(ckpt),
    )
    assert sink.run_id == "run-A-uuid"

    # wipe + restart: new metadata id -> new run identity at same path
    (ckpt / "metadata").write_text(json.dumps({"id": "run-B-uuid"}))
    sink2 = IncrementalLinker(
        spark, str(tmp_path / "mpi"), str(tmp_path / "dec"),
        dibbs_default(), checkpoint_dir=str(ckpt),
    )
    assert sink2.run_id == "run-B-uuid"


def test_partial_decisions_dir_does_not_wedge_the_stream(spark, tmp_path):
    """A crash mid decisions-write leaves run_id=R/batch_id=N with only
    _temporary/ (no visible part files): the replay probe must treat
    that as 'nothing committed' and let the overwrite recovery run —
    re-raising UNABLE_TO_INFER_SCHEMA would fail every restart until a
    human deletes the partial directory."""
    import os

    from recordlinker_spark.streaming.incremental import IncrementalLinker

    mpi_dir = str(tmp_path / "mpi")
    dec_dir = str(tmp_path / "dec")
    sink = IncrementalLinker(spark, mpi_dir, dec_dir, dibbs_default())
    os.makedirs(f"{dec_dir}/run_id=0/batch_id=0/_temporary/0")
    sink(_batch(spark, ["r0", "r1"], SIX_PATIENTS[:2]), 0)
    dec = spark.read.parquet(dec_dir)
    assert dec.filter(F.col("batch_id") == 0).count() == 2


def test_wipe_and_reprocess_ignores_other_runs_partitions(spark, tmp_path):
    """A wipe-and-reprocess at the same path must PROCESS its batches
    even though partitions from the previous run (here: the legacy
    md5-of-path scheme) linger for the same batch ids and the records
    are all in the MPI — only the CURRENT run_id's partition counts as
    committed.  (A legacy-partition probe was removed here: it turned
    every reprocessed batch into a silent skip — data loss.)"""
    import hashlib

    from recordlinker_spark.streaming.incremental import IncrementalLinker

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    mpi_dir = str(tmp_path / "mpi")
    dec_dir = str(tmp_path / "dec")
    # old process: run_id was md5(path) (no metadata file yet)
    old = IncrementalLinker(
        spark, mpi_dir, dec_dir, dibbs_default(), checkpoint_dir=str(ckpt)
    )
    assert old.run_id == hashlib.md5(str(ckpt).encode()).hexdigest()[:12]
    batch = _batch(spark, ["r0", "r1"], SIX_PATIENTS[:2])
    old(batch, 0)
    # operator wipes the checkpoint to reprocess; Spark assigns a fresh
    # query id; batch ids restart at 0 while the legacy partitions and
    # the MPI rows from the first run are still on disk
    (ckpt / "metadata").write_text(json.dumps({"id": "uuid-after-wipe"}))
    new = IncrementalLinker(
        spark, mpi_dir, dec_dir, dibbs_default(), checkpoint_dir=str(ckpt)
    )
    assert new.run_id == "uuid-after-wipe"
    new(batch, 0)
    dec = spark.read.parquet(dec_dir).filter(
        F.col("run_id") == "uuid-after-wipe"
    )
    # the reprocess EMITS decisions, and they are consistent: each
    # record certainly-matches the person it already belongs to
    assert dec.count() == 2
    assert {r["final_grade"] for r in dec.collect()} == {"certain"}
    # the MPI store stays consistent under dedup-on-read
    assert new.current_mpi().count() == 2


# -------------------------------------------------------- sessionize
class _FakeState:
    exists = False

    def update(self, v):
        self.val = v


def test_sessionize_kernel_null_values_match_batch_twin(spark):
    """NULL event values arrive in the kernel as NaN; the batch twin's
    F.sum skips NULLs (all-NULL coalesces to 0.0), so the kernel must
    skip NaN and emit 0.0 for an all-null session — not a NaN-poisoned
    sum, and never None/NaN (the NULL-vs-NaN Arrow round-trip was the
    last hash-nondeterminism in the oracle gate)."""
    import datetime as dt

    import pandas as pd

    from recordlinker_spark.operators.sessions import (
        _sessionize_group,
        sessionize,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # session 1: values [1.0, NULL] -> sum 1.0
        (0, t0, 1, "a", 1.0, None),
        (1, t0 + dt.timedelta(minutes=5), 1, "a", None, None),
        # session 2 (after 31-min gap): all NULL -> sum NULL
        (2, t0 + dt.timedelta(minutes=36), 1, "a", None, None),
        # session 3 closes session 2 and stays open
        (3, t0 + dt.timedelta(minutes=70), 1, "a", 9.0, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    batch = {r["session_seq"]: r["sum_value"]
             for r in sessionize(ev, gap_minutes=30.0).collect()}
    assert batch[1] == 1.0 and batch[2] == 0.0

    pdf = pd.DataFrame({
        "ts": pd.to_datetime([r[1] for r in rows]),
        "value": pd.array([r[4] for r in rows], dtype="float64"),
    })
    (out,) = _sessionize_group((1,), [pdf], _FakeState(), 30 * 60_000_000)
    got = dict(zip(out["session_seq"], out["sum_value"]))
    assert got[1] == 1.0
    assert got[2] == 0.0 and not pd.isna(got[2])
    # the poisoned implementation returned NaN for session 1 too
    assert not pd.isna(got[1])


# ----------------------------------------------------------- blocking
def test_block_cap_is_complete_beyond_salt_list(spark):
    """max_block_size must cap EVERY over-limit block on the salted
    path, not just the top-4096 census rows: with ~5k over-limit
    blocks, both paths must return zero candidates."""
    from recordlinker_spark.operators.blocking import blocked_persons

    n_blocks = 4600
    empty = F.array().cast("array<string>")
    mpi = spark.range(n_blocks * 3).select(
        F.concat(F.lit("m"), F.col("id")).alias("record_id"),
        F.concat(F.lit("p"), F.col("id")).alias("person_id"),
        F.array(F.concat(F.lit("b"), (F.col("id") % n_blocks))).alias(
            "bk_BIRTHDATE"
        ),
        empty.alias("bk_IDENTIFIER"),
        empty.alias("bk_SEX"),
    )
    inc = spark.range(n_blocks).select(
        F.concat(F.lit("i"), F.col("id")).alias("record_id"),
        F.array(F.concat(F.lit("b"), F.col("id"))).alias("bk_BIRTHDATE"),
        empty.alias("bk_IDENTIFIER"),
        empty.alias("bk_SEX"),
    )
    alg = dibbs_default()
    ap = alg.passes[0]
    kw = dict(
        algorithm=alg, algorithm_pass=ap,
        subsets=[("BIRTHDATE",)], max_block_size=2,
        census_fraction=1.0, salt_threshold=4,
    )
    # force the salted path, then the broadcast path; both must agree
    salted = blocked_persons(inc, mpi, broadcast_probe_rows=0, **kw)
    assert salted.count() == 0
    bcast = blocked_persons(inc, mpi, broadcast_probe_rows=10**6, **kw)
    assert bcast.count() == 0


# -------------------------------------------------------------- media
def _bmp8(width, height, palette_gray, pixel, n_colors=256):
    """Minimal 8-bpp palettized BMP: every palette entry maps index i
    to gray level palette_gray(i).  ``n_colors < 256`` writes a short
    color table while leaving biClrUsed = 0 (a spec-bending encoder
    habit; the pixel-data offset reveals the true table size)."""
    row_bytes = (width + 3) // 4 * 4
    pal = b"".join(
        struct.pack("<BBBB", palette_gray(i), palette_gray(i),
                    palette_gray(i), 0)
        for i in range(n_colors)
    )
    px = b"".join(
        bytes(pixel(x, y) for x in range(width)).ljust(row_bytes, b"\0")
        for y in range(height - 1, -1, -1)  # bottom-up
    )
    off = 14 + 40 + len(pal)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(px), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 0,
                       len(px), 2835, 2835, 0, 0)
    return hdr + info + pal + px


def test_bmp8_uses_palette_not_indices():
    """8-bpp BMP pixels are palette indices: with an INVERTED palette
    (index 0 -> white, 255 -> black) an all-zero image must decode as
    white (1.0), which the index-as-gray bug read as black (0.0)."""
    from recordlinker_spark.operators.media import _decode_bmp

    buf = _bmp8(6, 4, lambda i: 255 - i, lambda x, y: 0)
    out = _decode_bmp(buf, dim=4)
    assert (out["width"], out["height"]) == (6, 4)
    assert all(abs(f - 1.0) < 1e-6 for f in out["feature"])


def test_bmp8_short_palette_bounded_by_pixel_offset():
    """A short color table with biClrUsed=0: the pixel-data offset
    bounds the true table size, so in-range indices decode correctly
    and out-of-range indices raise instead of reading pixel bytes as
    palette entries."""
    from recordlinker_spark.operators.media import _decode_bmp

    ok = _bmp8(4, 2, lambda i: 255 - i, lambda x, y: 15, n_colors=16)
    out = _decode_bmp(ok, dim=2)
    assert all(abs(f - 240.0 / 255.0) < 1e-6 for f in out["feature"])

    bad = _bmp8(4, 2, lambda i: 0, lambda x, y: 16, n_colors=16)
    with pytest.raises(ValueError, match="palette index out of range"):
        _decode_bmp(bad, dim=2)


# ------------------------------------------------------------ metrics
def test_metrics_reads_pre_jsonl_parquet_store(spark, tmp_path):
    """A run dir written before the JSONL switch holds metrics as
    parquet under <run>/metrics; metrics() must still surface those
    rows (and union them with new JSONL rows)."""
    from recordlinker_spark.plans.checkpoint import StageRunner

    run_dir = str(tmp_path / "run")
    spark.createDataFrame(
        [("job", "s1", "rows", 7.0, 1.0)],
        "job_id string, stage string, metric string, value double, ts double",
    ).write.parquet(f"{run_dir}/metrics")
    r = StageRunner(spark, run_dir)
    assert r.metrics().count() == 1
    r.metric("s2", "rows", 3.0)
    got = {(x["stage"], x["value"]) for x in r.metrics().collect()}
    assert got == {("s1", 7.0), ("s2", 3.0)}
