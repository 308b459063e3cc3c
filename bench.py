"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "pairs_scored_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ...}

The headline metric is candidate-pairs-scored/sec through the full
link pipeline (block -> score -> median -> grade -> decide) over the
customer-derived corpus; secondary queries cover dedup, similarity
search, text stats and windowed aggregation.

Scaling protocol (BASELINE.md): run this with SPARK_GRAFT_CPUS=8 and
=32 on the same SF dir and compare pairs/sec — see
scripts/bench_scaling.py which automates it and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("recordlinker-spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # back-to-back timed queries accumulate unreferenced broadcast /
        # shuffle / cache blocks faster than the 30-min default cleaner
        # cycle; same setting the scaling protocol uses
        .config("spark.cleaner.periodicGC.interval", "45s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from recordlinker_spark.plans import demo

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # Each timed query runs REPS times with spark.catalog.clearCache()
    # between repeats (every repeat recomputes from parquet — no
    # plan-identity cache hits flattering later runs) and reports the
    # MEDIAN — one GC/compaction stall on this shared box otherwise
    # swings a single-shot number 2-3x (measured: the same warm link
    # pipeline at 9.1s / 13.7s / 35.1s back-to-back).  The cache clear
    # also stops earlier queries' leaked cached blocks from degrading
    # later ones inside the one bench session.
    REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    def timed(name: str, fn):
        walls = []
        out = None
        for rep in range(REPS):
            if rep:
                spark.catalog.clearCache()
            t0 = time.perf_counter()
            out = fn()
            walls.append(time.perf_counter() - t0)
        walls.sort()
        # lower median for even rep counts: len//2 would report the MAX
        # of two runs, i.e. the outlier the median is there to discard
        timings[name] = round(walls[(len(walls) - 1) // 2], 3)
        spark.catalog.clearCache()
        print(f"# {name}: {timings[name]}s (runs {[round(w, 3) for w in walls]})",
              file=sys.stderr)
        return out

    # warm the JVM, codegen cache, and Python UDF workers outside the
    # timings (steady-state throughput is the metric — a long-running
    # cluster job doesn't pay worker cold-start per batch).  The
    # sf0.001 run alone touches only a few of local[N]'s worker slots,
    # so the first timed query would still pay (N - few) x
    # pandas/pyarrow import cost — spawn every worker explicitly with
    # a trivial Arrow UDF over one partition per core.
    spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    demo.q_pair_scores(spark, "/root/testdata/sf0.001").count()
    def _warm(batches):
        from recordlinker_spark.functions import similarity  # noqa: F401
        for b in batches:
            yield b

    spark.range(CPUS * 4, numPartitions=CPUS).mapInPandas(
        _warm, "id long"
    ).count()

    # Driver-side Catalyst warm-up: event-log analysis shows the first
    # executions of the multi-pass link plan spend 13-23s in DRIVER
    # gaps (analysis/optimization/codegen-compile with a cold JIT) that
    # decay to ~2s once C2 compiles the planner's hot paths — measured
    # decay 46/50/30/24/7/7s across identical runs.  One untimed
    # flagship run at full SF moves the timed reps onto the
    # steady-state side of that curve (the declared metric; a resident
    # cluster job plans thousands of batches per JVM lifetime).
    def _link_once():
        from recordlinker_spark.operators.linkjob import link_batch

        inc_w = demo.derived_records(spark, SF_DIR, demo.INC_WHERE).drop("person_id")
        mpi_w = demo.derived_records(spark, SF_DIR)
        out_w = link_batch(inc_w, mpi_w, demo.demo_algorithm(),
                           keep_pair_scores=True, cache_intermediate=True)
        out_w.pair_scores.count(), out_w.decisions.count()
        spark.catalog.clearCache()

    for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_WARMRUNS", "2"))):
        _link_once()

    # ---- headline: full link pipeline; pairs-scored/sec
    def run_link():
        from recordlinker_spark.operators.linkjob import link_batch

        incoming = demo.derived_records(spark, SF_DIR, demo.INC_WHERE).drop(
            "person_id"
        )
        mpi = demo.derived_records(spark, SF_DIR)
        out = link_batch(
            incoming,
            mpi,
            demo.demo_algorithm(),
            keep_pair_scores=True,
            cache_intermediate=True,
        )
        return out.pair_scores.count(), out.decisions.count()

    (n_pairs, n_dec) = timed("link_pipeline", run_link)
    extras["pairs_scored"] = float(n_pairs)
    extras["decisions"] = float(n_dec)

    # ---- secondary operators
    timed("blocking_values", lambda: demo.q_blocking_values(spark, SF_DIR).count())
    from recordlinker_spark.operators.dedup import minhash_lsh_pairs

    timed("minhash_lsh", lambda: minhash_lsh_pairs(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumn("doc_id", F.col("doc_id").cast("long"))
        .repartition(CPUS),  # documents.parquet is one tiny file; spread
    ).count())  # shipped default (64, 8) — the measured pareto config
    timed("ngram_jaccard", lambda: demo.q_ngram_jaccard(spark, SF_DIR).count())

    # end-to-end canonicalization (LSH -> verify -> CC -> keep-best)
    # at the shipped (64, 8) config over docs + engineered near-dups
    def run_keep_best():
        from recordlinker_spark.operators.dedup import neardup_keep_best

        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        )
        dupes = docs.select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
        corpus = docs.unionByName(dupes).repartition(CPUS)
        kept = neardup_keep_best(corpus).filter(F.col("keep") == 1).count()
        extras["neardup_kept"] = float(kept)
        return kept

    timed("neardup_keep_best", run_keep_best)

    # LSH quality (not a timed query): recall of banded MinHash against
    # known near-dup pairs + precision of its candidates under the
    # exact-Jaccard >= 0.7 verify stage — the standard LSH-then-verify
    # pipeline, so band/threshold choices are evidence-backed.
    def lsh_quality():
        from recordlinker_spark.operators.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )

        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
            .filter(F.col("text").isNotNull())
        )
        # deterministic near-dups: first ~90% of each text (Jaccard ~0.8-0.9)
        dupes = docs.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.substring(
                "text", 1, (F.length("text") * 0.9).cast("int")
            ).alias("text"),
        )
        corpus = docs.unionByName(dupes).repartition(CPUS).cache()
        n_docs = docs.count()
        cand = minhash_lsh_pairs(corpus).cache()  # shipped default (64, 8)
        hits = cand.filter(
            F.col("doc_id_r") - F.col("doc_id_l") == 1000000
        ).count()
        verified = ngram_jaccard_pairs(corpus, cand, threshold=0.0)
        n_cand = cand.count()
        n_good = verified.filter(F.col("jaccard") >= 0.7).count()
        extras["lsh_recall"] = round(hits / max(n_docs, 1), 4)
        extras["lsh_precision"] = round(n_good / max(n_cand, 1), 4)
        cand.unpersist()
        # the r03 default (16, 4) for comparison — the sweep evidence
        # behind shipping (64, 8): 4-row bands admit quadratically more
        # false candidates while missing more true dupes
        cand2 = minhash_lsh_pairs(corpus, num_hashes=16, bands=4).cache()
        hits2 = cand2.filter(
            F.col("doc_id_r") - F.col("doc_id_l") == 1000000
        ).count()
        n_cand2 = cand2.count()
        n_good2 = ngram_jaccard_pairs(corpus, cand2, threshold=0.0).filter(
            F.col("jaccard") >= 0.7
        ).count()
        extras["lsh_recall_16_4"] = round(hits2 / max(n_docs, 1), 4)
        extras["lsh_precision_16_4"] = round(n_good2 / max(n_cand2, 1), 4)
        corpus.unpersist()
        cand2.unpersist()

    lsh_quality()
    timed("exact_dedup", lambda: demo.q_exact_dedup(spark, SF_DIR).count())
    timed("embedding_topk", lambda: demo.q_embedding_topk(spark, SF_DIR).count())

    # IVF ANN: time it AND report measured recall vs the exact top-k.
    # The brute-force ground truth is computed OUTSIDE the timed window
    # (it is already timed separately as embedding_topk) so the
    # reported ivf_topk seconds are the ANN query alone.
    truth_topk = {
        (r["query_id"], r["vec_id"])
        for r in demo.q_embedding_topk(spark, SF_DIR).collect()
    }

    def run_ivf():
        got = {
            (r["query_id"], r["vec_id"])
            for r in demo.q_ivf_topk(spark, SF_DIR).collect()
        }
        extras["ivf_recall"] = round(
            len(got & truth_topk) / max(len(truth_topk), 1), 4
        )
        # honest cost disclosure: fraction of bucket space probed,
        # derived from the gate query's actual operating point
        # (isotropic test embeddings force a high probe fraction for
        # recall>=0.9 — see q_ivf_topk docstring)
        extras["ivf_probe_frac"] = demo.IVF_NPROBE / (1 << demo.IVF_NBITS)

    timed("ivf_topk", run_ivf)

    # IVF at nbits=8 (256 buckets, ranked probing over ALL 8 planes):
    # shows the recall/probe-fraction trade at a realistic bucket
    # count — the 0.75 probe fraction of the nbits=4 gate query is an
    # isotropic-test-data artifact, not an engine ceiling.
    def ivf_nbits8():
        from recordlinker_spark.operators.simsearch import pick_nprobe

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        nprobe, recall = pick_nprobe(
            emb, queries, k=5, dim=64, nbits=8, recall_floor=0.9,
            max_bucket_size=100000, rank_planes=8,
        )
        extras["ivf_recall_nbits8"] = round(recall, 4)
        extras["ivf_probe_frac_nbits8"] = round(nprobe / 256, 4)

    ivf_nbits8()

    # IVF on CLUSTERED embeddings: the testdata embeddings are isotropic
    # Gaussian (worst case for any LSH — every bucket is equally likely
    # to hold a neighbor), which forces the high probe fractions above.
    # Real-corpus embeddings are clustered; this extra measures the same
    # operator on a deterministic 32-center Gaussian mixture (20k
    # vectors, unit-norm centers, per-dim sigma=0.03 so same-cluster
    # cosine ~0.95) to show the probe fraction the engine needs when
    # the data has structure.
    def ivf_clustered():
        import numpy as np
        import pandas as pd

        from recordlinker_spark.operators.simsearch import pick_nprobe

        rng = np.random.default_rng(1234)
        centers = rng.normal(size=(32, 64))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        labels = rng.integers(0, 32, size=20000)
        vecs = centers[labels] + 0.03 * rng.normal(size=(20000, 64))
        pdf = pd.DataFrame(
            {"vec_id": range(20000), "embedding": [v.tolist() for v in vecs]}
        )
        emb = spark.createDataFrame(pdf).selectExpr(
            "cast(vec_id as long) vec_id",
            "cast(embedding as array<float>) embedding",
        )
        queries = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        nprobe, recall = pick_nprobe(
            emb, queries, k=5, dim=64, nbits=8, recall_floor=0.9,
            max_bucket_size=100000, rank_planes=8,
        )
        extras["ivf_recall_clustered"] = round(recall, 4)
        extras["ivf_probe_frac_clustered"] = round(nprobe / 256, 4)

    ivf_clustered()

    # SimHash banding quality (not timed): recall of the band-bucket
    # blocking against engineered light-edit near-dups (one appended
    # token — the Hamming-small regime SimHash targets) + precision of
    # the pigeonhole guarantee (candidates truly within Hamming <= 3).
    def simhash_quality():
        from recordlinker_spark.operators.dedup import simhash_buckets

        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
            .filter(F.col("text").isNotNull())
        )
        dupes = docs.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzzz")).alias("text"),
        )
        corpus = docs.unionByName(dupes).repartition(CPUS).cache()
        n_docs = docs.count()
        bk = simhash_buckets(corpus).cache()
        cand = (
            bk.select(
                F.col("doc_id").alias("doc_id_l"),
                F.col("simhash").alias("sim_l"), "band", "key",
            )
            .join(
                bk.select(
                    F.col("doc_id").alias("doc_id_r"),
                    F.col("simhash").alias("sim_r"), "band", "key",
                ),
                ["band", "key"],
            )
            .filter(F.col("doc_id_l") < F.col("doc_id_r"))
            .dropDuplicates(["doc_id_l", "doc_id_r"])
            .cache()
        )
        hits = cand.filter(
            F.col("doc_id_r") - F.col("doc_id_l") == 1000000
        ).count()
        n_cand = cand.count()
        n_close = cand.filter(
            F.bit_count(F.col("sim_l").bitwiseXOR(F.col("sim_r"))) <= 3
        ).count()
        extras["simhash_recall"] = round(hits / max(n_docs, 1), 4)
        extras["simhash_precision"] = round(n_close / max(n_cand, 1), 4)
        cand.unpersist()
        bk.unpersist()
        corpus.unpersist()

    simhash_quality()

    # Embedding-cosine near-dup quality (not timed): candidate recall
    # of the banded sign-LSH against EXACT brute-force ground truth
    # (every pair with cosine >= threshold) over the corpus + engineered
    # perturbed duplicates (cos ~0.95 vs their source).  Precision of
    # the operator's OUTPUT is 1.0 by construction (exact-cosine verify
    # stage); what LSH banding can lose is recall, so that is the
    # number reported.
    def embneardup_quality():
        import numpy as np
        import pandas as pd

        from recordlinker_spark.operators.dedup import embedding_neardup_pairs

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        pdf = emb.toPandas()
        vecs = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        rng = np.random.default_rng(99)
        noise = 0.2 * rng.normal(size=vecs.shape)
        dup_vecs = vecs + noise * np.linalg.norm(
            vecs, axis=1, keepdims=True
        ) / np.linalg.norm(noise, axis=1, keepdims=True) * 0.33
        ids = pdf["vec_id"].to_numpy()
        all_ids = np.concatenate([ids, ids + 1000000])
        all_vecs = np.concatenate([vecs, dup_vecs])
        # exact ground truth: brute-force cosine on the driver (small
        # bench corpus; the oracle-scale check lives in check_oracles)
        norms = np.linalg.norm(all_vecs, axis=1, keepdims=True)
        unit = all_vecs / np.where(norms == 0, 1, norms)
        cos = unit @ unit.T
        iu = np.triu_indices(len(all_ids), k=1)
        truth_mask = cos[iu] >= 0.85
        truth = {
            (min(a, b), max(a, b))
            for a, b in zip(
                all_ids[iu[0]][truth_mask], all_ids[iu[1]][truth_mask]
            )
        }
        corpus = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": all_ids, "embedding": [v.tolist() for v in all_vecs]}
            )
        ).selectExpr(
            "cast(vec_id as long) vec_id",
            "cast(embedding as array<float>) embedding",
        ).repartition(CPUS)
        got = {
            (r["vec_id_l"], r["vec_id_r"])
            for r in embedding_neardup_pairs(corpus, threshold=0.85).collect()
        }
        extras["embneardup_truth_pairs"] = float(len(truth))
        extras["embneardup_recall"] = round(
            len(got & truth) / max(len(truth), 1), 4
        )

    embneardup_quality()

    # BASELINE.json headline made explicit: pairwise F1 vs the
    # reference's OWN decisions.  Replays the reference's 6-patient
    # linking scenario (reference tests/unit/linking/test_link.py:
    # 298-337) in sequential-replay mode; the reference's decision is
    # clusters {r0,r1,r3},{r2},{r4},{r5}, i.e. positive pairs
    # (0,1),(0,3),(1,3).  tests/test_link_parity.py pins the full
    # match vectors / passes / median scores; this emits the resulting
    # pairwise F1 as a measured number.
    def parity_f1():
        import itertools

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
        from fixtures_patients import SIX_PATIENTS

        from recordlinker_spark.config import dibbs_default
        from recordlinker_spark.plans.replay import replay_link
        from recordlinker_spark.schemas import DOCUMENTS_SCHEMA
        from recordlinker_spark.sources.ingest import parse_documents
        from recordlinker_spark.sources.spandoc import docs_to_rows

        docs = [
            (f"r{i}", p, [(2, f"media://img/{i}")])
            for i, p in enumerate(SIX_PATIENTS)
        ]
        records = parse_documents(
            spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA)
        )
        steps, _ = replay_link(
            spark, records, dibbs_default(), order=[f"r{i}" for i in range(6)]
        )
        pid = [s.person_id for s in steps]
        ref_pairs = {(0, 1), (0, 3), (1, 3)}
        got = {
            (i, j)
            for i, j in itertools.combinations(range(6), 2)
            if pid[i] is not None and pid[i] == pid[j]
        }
        tp = len(got & ref_pairs)
        fp = len(got - ref_pairs)
        fn = len(ref_pairs - got)
        extras["parity_pair_f1"] = round(2 * tp / max(2 * tp + fp + fn, 1), 4)

    parity_f1()
    timed("token_stats", lambda: demo.q_token_stats(spark, SF_DIR).count())
    timed("quality_scores", lambda: demo.q_quality_scores(spark, SF_DIR).count())
    timed("language_id", lambda: demo.q_language_id(spark, SF_DIR).count())
    timed("events_window", lambda: demo.q_events_window(spark, SF_DIR).count())
    timed("user_sessions", lambda: demo.q_user_sessions(spark, SF_DIR).count())

    pairs_per_sec = n_pairs / timings["link_pipeline"] if timings["link_pipeline"] else 0.0
    print(
        json.dumps(
            {
                "metric": "pairs_scored_per_sec",
                "value": round(pairs_per_sec, 1),
                "unit": "sec",
                "queries": timings,
                "extras": extras,
                "cpus": CPUS,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
