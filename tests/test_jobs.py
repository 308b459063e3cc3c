"""Job-mode entry points: seed -> link -> cluster -> orphans round trip."""

import json

import pytest
from pyspark.sql import functions as F

from recordlinker_spark.plans import jobs
from recordlinker_spark.schemas import DOCUMENTS_SCHEMA
from recordlinker_spark.sources.spandoc import docs_to_rows
from recordlinker_spark.synth import synth_documents

from fixtures_patients import SIX_PATIENTS


class A:
    def __init__(self, **kw):
        self.__dict__.update(kw)
        self.n_pairs = kw.get("n_pairs", 50)


def test_seed_link_orphans(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    labels_dir = str(tmp_path / "labels")
    mpi_dir = str(tmp_path / "mpi")
    out_dir = str(tmp_path / "decisions")

    seeded = [SIX_PATIENTS[0], SIX_PATIENTS[2]]  # John Shepard + Tali
    spark.createDataFrame(
        docs_to_rows([(f"r{i}", p, []) for i, p in enumerate(seeded)]),
        DOCUMENTS_SCHEMA,
    ).write.parquet(docs_dir)
    spark.createDataFrame(
        [(f"r{i}", f"p{i}") for i in range(2)], "record_id string, person_id string"
    ).write.parquet(labels_dir)

    jobs.job_seed(spark, A(documents=docs_dir, labels=labels_dir, mpi=mpi_dir))
    assert spark.read.parquet(mpi_dir).count() == 2

    # link the Jon variant (matches r0's person via pass 1)
    link_docs = str(tmp_path / "link_docs")
    spark.createDataFrame(
        docs_to_rows([("x1", SIX_PATIENTS[1], [])]), DOCUMENTS_SCHEMA
    ).write.parquet(link_docs)
    jobs.job_link(spark, A(documents=link_docs, mpi=mpi_dir, out=out_dir))
    dec = spark.read.parquet(out_dir).collect()
    assert len(dec) == 1 and dec[0]["final_grade"] == "certain"
    assert dec[0]["person_id"] == "p0"
    assert spark.read.parquet(mpi_dir).count() == 3

    jobs.job_orphans(spark, A(mpi=mpi_dir))


def test_orphans_reports_patients_and_persons(spark, tmp_path, capsys):
    """Orphaned patients (NULL person) AND orphaned persons (registry
    ids with no patients) — mpi_service.py:502-547 parity."""
    mpi_dir = str(tmp_path / "mpi")
    persons_dir = str(tmp_path / "persons")
    docs = [(f"r{i}", p, []) for i, p in enumerate(SIX_PATIENTS[:3])]
    spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA).write.parquet(
        str(tmp_path / "docs")
    )
    from recordlinker_spark.sources.ingest import parse_documents

    records = parse_documents(spark.read.parquet(str(tmp_path / "docs")))
    # r0 -> p0, r1 -> NULL (pending review), r2 -> p2
    labels = spark.createDataFrame(
        [("r0", "p0"), ("r1", None), ("r2", "p2")],
        "record_id string, person_id string",
    )
    records.join(labels, "record_id").write.parquet(mpi_dir)
    spark.createDataFrame(
        [("p0",), ("p2",), ("p9",)], "person_id string"
    ).write.parquet(persons_dir)

    jobs.job_orphans(spark, A(mpi=mpi_dir, persons=persons_dir))
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["orphaned_patients"] == 1
    assert report["orphaned_patient_ids"] == ["r1"]
    assert report["orphaned_persons"] == 1
    assert report["orphaned_person_ids"] == ["p9"]


def test_delete_patients_and_persons(spark, tmp_path, capsys):
    mpi_dir = str(tmp_path / "mpi")
    docs = [(f"r{i}", p, []) for i, p in enumerate(SIX_PATIENTS[:3])]
    spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA).write.parquet(
        str(tmp_path / "docs")
    )
    from recordlinker_spark.sources.ingest import parse_documents

    records = parse_documents(spark.read.parquet(str(tmp_path / "docs")))
    labels = spark.createDataFrame(
        [("r0", "p0"), ("r1", "p0"), ("r2", "p2")],
        "record_id string, person_id string",
    )
    records.join(labels, "record_id").write.parquet(mpi_dir)

    # deleting a person that still has patients is refused (the
    # reference's check_person_for_patients guard)
    with pytest.raises(ValueError, match="still have patients"):
        jobs.job_delete(spark, A(mpi=mpi_dir, person_ids="p2"))

    jobs.job_delete(spark, A(mpi=mpi_dir, record_ids="r2"))
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["patients_deleted"] == 1
    assert {
        r["record_id"] for r in spark.read.parquet(mpi_dir).collect()
    } == {"r0", "r1"}

    # now p2 is empty and deletable — but with no --persons registry
    # nothing is actually removed anywhere; the report must say so
    jobs.job_delete(spark, A(mpi=mpi_dir, person_ids="p2"))
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["persons_deleted"] == 0
    assert report["persons_releasable"] == 1

    # with a registry, the row is removed and counted
    persons_dir = str(tmp_path / "persons")
    spark.createDataFrame(
        [("p1",), ("p2",)], "person_id string"
    ).write.parquet(persons_dir)
    jobs.job_delete(spark, A(mpi=mpi_dir, person_ids="p2", persons=persons_dir))
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["persons_deleted"] == 1
    assert {
        r["person_id"] for r in spark.read.parquet(persons_dir).collect()
    } == {"p1"}


def test_update_patient_and_repoint(spark, tmp_path, capsys):
    """update job: PATCH-patient (PII replaced in place, person kept)
    and person repointing round-trips (patient_router.py:63-128,
    person_router.py:110-186)."""
    mpi_dir = str(tmp_path / "mpi")
    docs = [(f"r{i}", p, []) for i, p in enumerate(SIX_PATIENTS[:3])]
    spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA).write.parquet(
        str(tmp_path / "docs")
    )
    from recordlinker_spark.sources.ingest import parse_documents

    records = parse_documents(spark.read.parquet(str(tmp_path / "docs")))
    labels = spark.createDataFrame(
        [("r0", "p0"), ("r1", "p0"), ("r2", "p2")],
        "record_id string, person_id string",
    )
    records.join(labels, "record_id").write.parquet(mpi_dir)

    # PATCH r1's record to Tali's PII (SIX_PATIENTS[2]); an unknown id
    # in the update batch is ignored (PATCH, not upsert)
    upd_dir = str(tmp_path / "upd")
    spark.createDataFrame(
        docs_to_rows([("r1", SIX_PATIENTS[2], []), ("zz", SIX_PATIENTS[3], [])]),
        DOCUMENTS_SCHEMA,
    ).write.parquet(upd_dir)
    jobs.job_update(spark, A(documents=upd_dir, mpi=mpi_dir))
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["patients_updated"] == 1
    rows = {r["record_id"]: r for r in spark.read.parquet(mpi_dir).collect()}
    assert set(rows) == {"r0", "r1", "r2"}  # no upsert of "zz"
    assert rows["r1"]["person_id"] == "p0"  # person kept
    assert rows["r1"]["name"] == rows["r2"]["name"]  # PII replaced (Tali's)
    assert rows["r1"]["birth_date"] == rows["r2"]["birth_date"]

    # repoint r1 to p2
    jobs.job_update(spark, A(mpi=mpi_dir, record_ids="r1", person_id="p2"))
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["patients_repointed"] == 1
    rows = {r["record_id"]: r for r in spark.read.parquet(mpi_dir).collect()}
    assert rows["r1"]["person_id"] == "p2"
    assert rows["r0"]["person_id"] == "p0"


def test_mpi_swap_crash_recovery(spark, tmp_path):
    """A crash between _rewrite_mpi's two renames leaves data only in
    <mpi>.old; _read_mpi restores it so the table is never missing."""
    import os

    mpi_dir = str(tmp_path / "mpi")
    docs = [(f"r{i}", p, []) for i, p in enumerate(SIX_PATIENTS[:2])]
    spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA).write.parquet(
        str(tmp_path / "docs")
    )
    from recordlinker_spark.sources.ingest import parse_documents

    records = parse_documents(spark.read.parquet(str(tmp_path / "docs")))
    labels = spark.createDataFrame(
        [("r0", "p0"), ("r1", "p1")], "record_id string, person_id string"
    )
    records.join(labels, "record_id").write.parquet(mpi_dir)

    # simulate the torn state: main path renamed away, .tmp half-written
    os.rename(mpi_dir, mpi_dir + ".old")
    os.makedirs(mpi_dir + ".tmp")
    recovered = jobs._read_mpi(spark, mpi_dir)
    assert recovered.count() == 2
    assert os.path.exists(mpi_dir)
    assert not os.path.exists(mpi_dir + ".tmp")


def test_cluster_bootstrap(spark, tmp_path):
    """CC clustering of a synthetic corpus recovers >=90% of ground-truth
    person assignments (perturbations beyond the certain threshold split
    clusters by design)."""
    docs_dir = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "clusters")
    docs = synth_documents(spark, 150, seed=3)
    docs.select("doc_id", "spans").write.parquet(docs_dir)
    truth = {r["doc_id"]: r["person_key"] for r in docs.collect()}

    jobs.job_cluster(spark, A(documents=docs_dir, out=out_dir))
    labels = {r["record_id"]: r["person_id"] for r in spark.read.parquet(out_dir).collect()}
    assert set(labels) == set(truth)

    # precision: no two different ground-truth persons merged
    by_label: dict[str, set] = {}
    for rid, lab in labels.items():
        by_label.setdefault(lab, set()).add(truth[rid])
    merged = [v for v in by_label.values() if len(v) > 1]
    assert merged == []

    # recall: most same-person records share a label
    from collections import defaultdict

    by_person = defaultdict(list)
    for rid, pk in truth.items():
        by_person[pk].append(rid)
    total_pairs = hit_pairs = 0
    for rids in by_person.values():
        for i in range(len(rids)):
            for j in range(i + 1, len(rids)):
                total_pairs += 1
                if labels[rids[i]] == labels[rids[j]]:
                    hit_pairs += 1
    assert total_pairs > 0
    assert hit_pairs / total_pairs > 0.5


def test_assign_persons_seeded_clusters(spark):
    """M4: seeded labels survive exactly (including 1-char person ids —
    pins the sentinel-prefix arithmetic) and merge with batch matches."""
    from recordlinker_spark.operators.cluster import assign_persons

    records = spark.createDataFrame(
        [("r1",), ("r2",), ("r3",), ("r4",)], "record_id string"
    )
    pairs = spark.createDataFrame(
        [("r1", "r2")], "record_id_l string, record_id_r string"
    )
    seeds = spark.createDataFrame(
        [("r2", "x"), ("r3", "alpha")], "record_id string, person_id string"
    )
    got = {
        r["record_id"]: r["person_id"]
        for r in assign_persons(records, pairs, seed_labels=seeds).collect()
    }
    # r1-r2 matched and r2 is seeded 'x': the whole component keeps it
    assert got["r1"] == "x" and got["r2"] == "x"
    assert got["r3"] == "alpha"
    # r4 is a singleton: minted label
    assert got["r4"].startswith("p-")


def test_tune_manifest(spark, tmp_path):
    """job_tune writes the TuningJob-style run manifest on success AND
    on guard rejection (reference models/tuning.py state machine)."""
    docs_dir = str(tmp_path / "docs")
    labels_dir = str(tmp_path / "labels")
    mpi_dir = str(tmp_path / "mpi")
    out = str(tmp_path / "tuned.json")

    # >=1300 records: the birthday guard needs sample_size >~ 1202 for
    # 1000 non-match pairs (mpi_service.py:645-654)
    docs = synth_documents(spark, 1300, seed=7)
    docs.select("doc_id", "spans").write.parquet(docs_dir)
    docs.select(
        F.col("doc_id").alias("record_id"),
        F.col("person_key").alias("person_id"),
    ).write.parquet(labels_dir)
    jobs.job_seed(spark, A(documents=docs_dir, labels=labels_dir, mpi=mpi_dir))

    # guard-rejected run (n_pairs below the 1000 floor) -> failed manifest
    with pytest.raises(ValueError, match="Too few true match pairs"):
        jobs.job_tune(spark, A(mpi=mpi_dir, out=out, n_pairs=50))
    m = json.load(open(out + ".manifest.json"))
    assert m["status"] == "failed"
    assert "Too few true match pairs" in m["results"]["details"]
    assert m["started_at"] and m["finished_at"]
    assert m["params"]["true_match_pairs_requested"] == 50

    # successful run -> completed manifest with the results embedded
    jobs.job_tune(spark, A(mpi=mpi_dir, out=out, n_pairs=1000))
    m = json.load(open(out + ".manifest.json"))
    assert m["status"] == "completed"
    assert m["results"]["log_odds"] and m["finished_at"]
    assert json.load(open(out)) == m["results"]


def test_link_job_run_dir_checkpoints_and_resumes(spark, tmp_path):
    """--run-dir routes the CLI link job through the stage-checkpointed
    pipeline: first run writes per-stage parquet + manifest + the MPI
    append marker; a re-run with the same run_dir resumes (reads the
    checkpoints, appends nothing twice)."""
    docs_dir = str(tmp_path / "docs")
    labels_dir = str(tmp_path / "labels")
    mpi_dir = str(tmp_path / "mpi")
    out_dir = str(tmp_path / "decisions")
    run_dir = str(tmp_path / "run")

    seeded = [SIX_PATIENTS[0], SIX_PATIENTS[2]]
    spark.createDataFrame(
        docs_to_rows([(f"r{i}", p, []) for i, p in enumerate(seeded)]),
        DOCUMENTS_SCHEMA,
    ).write.parquet(docs_dir)
    spark.createDataFrame(
        [(f"r{i}", f"p{i}") for i in range(2)],
        "record_id string, person_id string",
    ).write.parquet(labels_dir)
    jobs.job_seed(spark, A(documents=docs_dir, labels=labels_dir, mpi=mpi_dir))

    link_docs = str(tmp_path / "link_docs")
    spark.createDataFrame(
        docs_to_rows([("x1", SIX_PATIENTS[1], [])]), DOCUMENTS_SCHEMA
    ).write.parquet(link_docs)

    args = dict(documents=link_docs, mpi=mpi_dir, out=out_dir, run_dir=run_dir)
    jobs.job_link(spark, A(**args))
    dec = spark.read.parquet(out_dir).collect()
    assert len(dec) == 1 and dec[0]["final_grade"] == "certain"
    assert dec[0]["person_id"] == "p0"
    assert spark.read.parquet(mpi_dir).count() == 3

    with open(f"{run_dir}/MANIFEST.jsonl") as fh:
        stages = [r["stage"] for r in map(json.loads, fh) if "stage" in r]
    assert "ingest" in stages and "decisions" in stages
    assert stages.count("mpi_append") == 1

    # resume: no stage re-runs, no second MPI append
    jobs.job_link(spark, A(**args))
    assert spark.read.parquet(mpi_dir).count() == 3
    with open(f"{run_dir}/MANIFEST.jsonl") as fh:
        stages = [r["stage"] for r in map(json.loads, fh) if "stage" in r]
    assert stages.count("mpi_append") == 1
    assert stages.count("decisions") == 1


def test_update_person_merge_and_create(spark, tmp_path, capsys):
    """person_router parity: POST /person (mint a new person for given
    patients) and POST /person/{id}/merge (repoint all patients of the
    source clusters to the target)."""
    mpi_dir = str(tmp_path / "mpi")
    docs = [(f"r{i}", p, []) for i, p in enumerate(SIX_PATIENTS[:4])]
    spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA).write.parquet(
        str(tmp_path / "docs")
    )
    from recordlinker_spark.sources.ingest import parse_documents

    records = parse_documents(spark.read.parquet(str(tmp_path / "docs")))
    labels = spark.createDataFrame(
        [("r0", "p0"), ("r1", "p0"), ("r2", "p1"), ("r3", "p2")],
        "record_id string, person_id string",
    )
    records.join(labels, "record_id").write.parquet(mpi_dir)

    # merge p1 and p2 into p0 -> every patient lands in p0
    jobs.job_update(spark, A(mpi=mpi_dir, person_ids="p1,p2", person_id="p0"))
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["patients_merged"] == 2
    rows = {r["record_id"]: r["person_id"] for r in spark.read.parquet(mpi_dir).collect()}
    assert set(rows.values()) == {"p0"}

    # create: split r2,r3 out into a freshly minted person
    jobs.job_update(spark, A(mpi=mpi_dir, record_ids="r2,r3"))
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    minted = report["person_created"]
    assert minted.startswith("p-") and report["patients_repointed"] == 2
    rows = {r["record_id"]: r["person_id"] for r in spark.read.parquet(mpi_dir).collect()}
    assert rows["r2"] == minted and rows["r3"] == minted
    assert rows["r0"] == "p0" and rows["r1"] == "p0"
    # deterministic mint: same member set -> same id
    jobs.job_update(spark, A(mpi=mpi_dir, record_ids="r3,r2"))
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["person_created"] == minted


def test_external_person_id_round_trip(spark, tmp_path):
    """external_person_id / external_person_source survive seed ->
    link -> MPI (reference models/mpi.py:44-50 columns; source fixed
    to 'IRIS' iff an id is present, mpi_service.py:255-258)."""
    docs_dir = str(tmp_path / "docs")
    labels_dir = str(tmp_path / "labels")
    mpi_dir = str(tmp_path / "mpi")
    out_dir = str(tmp_path / "decisions")

    seeded = [SIX_PATIENTS[0], SIX_PATIENTS[2]]
    spark.createDataFrame(
        docs_to_rows([(f"r{i}", p, []) for i, p in enumerate(seeded)]),
        DOCUMENTS_SCHEMA,
    ).write.parquet(docs_dir)
    # r0's seed cluster carries a client-side person id; r1's does not
    spark.createDataFrame(
        [("r0", "p0", "EXT-7"), ("r1", "p1", None)],
        "record_id string, person_id string, external_person_id string",
    ).write.parquet(labels_dir)
    jobs.job_seed(spark, A(documents=docs_dir, labels=labels_dir, mpi=mpi_dir))

    got = {
        r["record_id"]: (r["external_person_id"], r["external_person_source"])
        for r in spark.read.parquet(mpi_dir).collect()
    }
    assert got == {"r0": ("EXT-7", "IRIS"), "r1": (None, None)}

    # link a new record whose document carries an external_person_id
    # column (batch analog of the link request field, link.py:29-33)
    link_docs = str(tmp_path / "link_docs")
    docs = spark.createDataFrame(
        docs_to_rows([("x1", SIX_PATIENTS[1], [])]), DOCUMENTS_SCHEMA
    ).withColumn("external_person_id", F.lit("EXT-9"))
    docs.write.parquet(link_docs)
    jobs.job_link(spark, A(documents=link_docs, mpi=mpi_dir, out=out_dir))

    mpi = {
        r["record_id"]: (r["external_person_id"], r["external_person_source"])
        for r in spark.read.parquet(mpi_dir).collect()
    }
    assert mpi["x1"] == ("EXT-9", "IRIS")
    # seeded rows unchanged
    assert mpi["r0"] == ("EXT-7", "IRIS") and mpi["r1"] == (None, None)


def test_external_person_id_round_trip_run_dir(spark, tmp_path):
    """--run-dir (checkpointed) link must persist external_person_id
    exactly like the non-checkpointed path — the two modes of the same
    CLI job must not silently diverge."""
    docs_dir = str(tmp_path / "docs")
    mpi_dir = str(tmp_path / "mpi")
    spark.createDataFrame(
        docs_to_rows([("x1", SIX_PATIENTS[1], [])]), DOCUMENTS_SCHEMA
    ).withColumn("external_person_id", F.lit("EXT-RD")).write.parquet(docs_dir)
    jobs.job_link(
        spark,
        A(documents=docs_dir, mpi=mpi_dir, out=str(tmp_path / "dec"),
          run_dir=str(tmp_path / "run")),
    )
    (row,) = spark.read.parquet(mpi_dir).collect()
    assert (row["external_person_id"], row["external_person_source"]) == (
        "EXT-RD", "IRIS",
    )


def test_external_person_id_int_typed_column_is_cast(spark, tmp_path):
    """A documents table that types external_person_id as a NUMBER must
    not poison the MPI store: mpi_projection casts to MPI_SCHEMA types,
    so the append stays string-typed and later MPI reads succeed."""
    docs_dir = str(tmp_path / "docs")
    mpi_dir = str(tmp_path / "mpi")
    out_dir = str(tmp_path / "decisions")
    out_dir2 = str(tmp_path / "decisions2")

    docs = spark.createDataFrame(
        docs_to_rows([("n0", SIX_PATIENTS[0], [])]), DOCUMENTS_SCHEMA
    ).withColumn("external_person_id", F.lit(12345))  # INT, not string
    docs.write.parquet(docs_dir)
    jobs.job_link(spark, A(documents=docs_dir, mpi=mpi_dir, out=out_dir))

    mpi = spark.read.parquet(mpi_dir)
    assert dict(mpi.dtypes)["external_person_id"] == "string"
    (row,) = mpi.collect()
    assert row["external_person_id"] == "12345"
    assert row["external_person_source"] == "IRIS"

    # the store stays readable by a second link job (the failure mode
    # was a parquet-type mismatch against the explicit MPI_SCHEMA read)
    link_docs = str(tmp_path / "link2")
    spark.createDataFrame(
        docs_to_rows([("n1", SIX_PATIENTS[1], [])]), DOCUMENTS_SCHEMA
    ).write.parquet(link_docs)
    jobs.job_link(spark, A(documents=link_docs, mpi=mpi_dir, out=out_dir2))
    assert spark.read.parquet(mpi_dir).count() == 2
