"""Transitive clustering: connected components over matched-pair edges.

The reference resolves clusters *incrementally* — each record joins the
best existing Person, and an explicit merge endpoint repoints clusters
(reference: src/recordlinker/database/mpi_service.py:417-450,
routes/person_router.py:190-230).  In a batch bootstrap over a whole
corpus the equivalent is transitive closure of the certain-match pair
set: iterative large-star/small-star connected components (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14),
expressed entirely in DataFrame joins/aggregations.

Why large-star/small-star over naive label propagation: each iteration
contracts low-degree structure via min-label hashing, converging in
O(log^2 n) rounds on skewed graphs (a hub record matched to thousands
of duplicates is exactly the skew case), versus O(diameter) rounds for
plain propagation.  Each round is two self-join + groupBy stages that
AQE can replan; lineage is cut every round with localCheckpoint, or —
when ``checkpoint_dir`` is given — with a parquet checkpoint + manifest
per iteration, the RESUMABLE path (a driver restart with the same
directory and input resumes mid-closure; see plans/checkpoint.py for
the stage-level protocol).

Seeded clusters (S3/M4: pre-labeled person_id from /seed) enter as
extra edges record<->seed-label so CC respects and merges them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to the
    min of (u, neighbors(u))."""
    nbrs = _sym(edges)
    mins = nbrs.groupBy("src").agg(F.min("dst").alias("m"))
    mins = mins.withColumn("m", F.least("src", "m"))
    return (
        nbrs.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every smaller-or-equal neighbor to the
    min of (u, smaller neighbors)."""
    directed = _sym(edges).filter(F.col("dst") <= F.col("src"))
    mins = directed.groupBy("src").agg(F.min("dst").alias("m"))
    return (
        directed.join(mins, "src")
        .select(
            F.when(F.col("dst") == F.col("m"), F.col("src"))
            .otherwise(F.col("dst"))
            .alias("src"),
            F.col("m").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    checkpoint_every: int = 1,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """edges(src:string, dst:string) -> labels(record_id, component).

    ``component`` is the lexicographic min record id of the component.
    Converges when an alternation changes no edges (checked via count
    of non-star edges). Singleton nodes (no edges) are the caller's
    concern — see :func:`assign_persons`.

    With ``checkpoint_dir``, every checkpointed iteration writes its
    edge state to ``<dir>/iter=N`` parquet and appends a manifest line
    (iteration, path, edge checksum) — a driver restart with the same
    directory AND the same input edges resumes from the last completed
    iteration instead of recomputing all rounds (the north rule's
    resumable-from-checkpoint contract; same protocol as
    plans/checkpoint.py).  Without it, lineage is cut with
    localCheckpoint (executor-local, NOT resumable).
    """
    import json
    import os

    def checksum(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor, not sum: ANSI mode (Spark 4 default) would
            # overflow a long sum of 64-bit hashes
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def normalized(df: DataFrame) -> DataFrame:
        # ONE definition for both the fingerprint-write and the
        # resume-validation paths: the two checksums must be computed
        # over byte-identical normalizations or every resume with the
        # same input would be rejected as "a different edge set"
        return (
            df.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    spark = edges.sparkSession
    manifest_path = None
    start_iter = 0
    prev = None
    input_edges = edges
    if checkpoint_dir is not None:
        os.makedirs(checkpoint_dir, exist_ok=True)
        manifest_path = os.path.join(checkpoint_dir, "CC_MANIFEST.jsonl")
        done: list[dict] = []
        if os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                done = [json.loads(line) for line in fh if line.strip()]
        # the "same input edges" precondition is enforced, not assumed:
        # the manifest's first line fingerprints the normalized input
        # (count + bit_xor of edge hashes); a resume with DIFFERENT
        # edges would otherwise silently return the previous run's
        # components as this input's answer
        input_lines = [d for d in done if d.get("kind") == "input"]
        # last one wins: a crash before the first iteration checkpoint
        # leaves an input line with no state, and a fresh start appends
        # the new input's fingerprint after it
        input_line = input_lines[-1] if input_lines else None
        iters = [d for d in done if "iter" in d]
        if iters:
            if input_line is None:
                # a manifest with state but no input fingerprint can't
                # be validated — refusing beats silently returning some
                # other input's components
                raise ValueError(
                    f"checkpoint_dir {checkpoint_dir!r} has iteration "
                    "state but no input fingerprint (written by an "
                    "older version?); clear the directory to restart"
                )
            cur_in = checksum(normalized(input_edges))
            if cur_in != (input_line["n"], input_line["h"]):
                raise ValueError(
                    f"checkpoint_dir {checkpoint_dir!r} holds state for "
                    f"a different edge set (input fingerprint "
                    f"{(input_line['n'], input_line['h'])} != "
                    f"{cur_in}); clear the directory or use a new one"
                )
            last = iters[-1]
            edges = spark.read.parquet(last["path"])
            start_iter = last["iter"] + 1
            prev = (last["n"], last["h"])
    if prev is None:
        edges = normalized(edges).localCheckpoint(eager=True)
        prev = checksum(edges)
        if manifest_path is not None:
            with open(manifest_path, "a") as fh:
                fh.write(
                    json.dumps({"kind": "input", "n": prev[0], "h": prev[1]})
                    + "\n"
                )
                fh.flush()
                os.fsync(fh.fileno())

    for i in range(start_iter, max_iterations):
        edges = _small_star(_large_star(edges))
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            if checkpoint_dir is not None:
                path = os.path.join(checkpoint_dir, f"iter={i}")
                edges.write.mode("overwrite").parquet(path)
                edges = spark.read.parquet(path)
            else:
                edges = edges.localCheckpoint(eager=True)
        cur = checksum(edges)
        if checkpoint_dir is not None and checkpoint_every and (
            (i + 1) % checkpoint_every == 0
        ):
            with open(manifest_path, "a") as fh:
                fh.write(
                    json.dumps(
                        {"iter": i, "path": path, "n": cur[0], "h": cur[1]}
                    )
                    + "\n"
                )
                fh.flush()
                os.fsync(fh.fileno())
        # fixpoint: the edge multiset didn't change over an alternation
        if cur == prev:
            break
        prev = cur

    labels = _sym(edges).groupBy("src").agg(F.min("dst").alias("component"))
    labels = labels.withColumn("component", F.least("src", "component"))
    return labels.select(F.col("src").alias("record_id"), "component")


def assign_persons(
    records: DataFrame,
    certain_pairs: DataFrame,
    seed_labels: DataFrame | None = None,
    **cc_kwargs,
) -> DataFrame:
    """Batch entity resolution: records + certain pairs -> person labels.

    :param records: DataFrame with ``record_id``.
    :param certain_pairs: DataFrame with ``record_id_l``/``record_id_r``
        (certain-grade matched pairs).
    :param seed_labels: optional (record_id, person_id) pre-assigned
        clusters (M4): encoded as edges to a sentinel node per label so
        seeded clusters merge with batch matches.
    :returns: (record_id, person_id) for every input record; singletons
        get ``p-<md5>`` minted labels (M3).
    """
    edges = certain_pairs.select(
        F.col("record_id_l").alias("src"), F.col("record_id_r").alias("dst")
    )
    if seed_labels is not None:
        sentinel = seed_labels.select(
            F.concat(F.lit("\x00seed:"), F.col("person_id")).alias("src"),
            F.col("record_id").alias("dst"),
        )
        edges = edges.unionByName(sentinel)

    labels = connected_components(edges, **cc_kwargs)
    labels = labels.filter(~F.col("record_id").startswith("\x00seed:"))

    base = F.coalesce(F.col("component"), F.col("record_id"))
    # components anchored by a seed sentinel (the \x00 prefix sorts below
    # every record id, so it wins the min) keep the seeded person_id
    person = F.when(
        # strip the 6-char "\x00seed:" sentinel prefix (substring is
        # 1-indexed, so the person_id starts at position 7)
        base.startswith("\x00seed:"), F.substring(base, 7, 1 << 20)
    ).otherwise(
        F.concat(F.lit("p-"), F.md5(F.concat(F.lit("person:"), base)))
    )
    return (
        records.select("record_id")
        .join(labels, "record_id", "left")
        .select(F.col("record_id"), person.alias("person_id"))
    )
