"""Driver-contract queries: Spark pipelines + DuckDB oracle SQL twins.

The sandbox correctness gate (``__spark_entry__.py``) runs each Spark
query and its oracle SQL side-by-side over the same parquet tables
(TPC-H-ish ``customer`` + ``documents``/``embeddings``/``events``) and
compares row counts, schemas and value hashes.

Linkage queries run over a *derived PII corpus*: deterministic
arithmetic over ``customer`` synthesizes persons with two records each
(``pid = c_custkey // 2``), the odd record carrying a perturbed first
name (last char doubled -> a high-but-not-1.0 Jaro-Winkler).  The same
derivation is emitted as SQL for DuckDB, so the oracle checks the
*engine semantics* (blocking join, scoring, exact median, grading,
decisions) against an independent implementation.

All float outputs are rounded to 6 dp on BOTH sides; the similarity
kernels themselves were verified to agree with DuckDB's to <1e-12
(tests/test_norm_expr.py), so rounding is belt-and-braces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recordlinker_spark.config import (
    Algorithm,
    AlgorithmContext,
    AlgorithmPass,
    Evaluator,
)
from recordlinker_spark.operators.blocking import candidate_pairs
from recordlinker_spark.operators.decide import cluster_scores, decide, fold_passes
from recordlinker_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    neardup_keep_best,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from recordlinker_spark.operators.linkjob import link_batch, prepare_incoming, prepare_mpi
from recordlinker_spark.operators.scoring import attach_pair_features, score_pairs
from recordlinker_spark.operators.simsearch import brute_force_topk, ivf_topk
from recordlinker_spark.operators.textstats import (
    fingerprints,
    language_id,
    quality_scores,
    token_counts,
)

# ---------------------------------------------------------------------------
# deterministic PII derivation from the customer table
# ---------------------------------------------------------------------------

FIRSTS = [
    "james", "mary", "robert", "patricia", "john", "jennifer", "michael",
    "linda", "david", "elizabeth", "william", "barbara", "richard", "susan",
    "joseph", "jessica", "thomas", "karen", "charles", "sarah", "daniel",
    "nancy", "matthew",
]  # 23
LASTS = [
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas", "taylor", "moore", "jackson", "martin",
    "lee", "perez", "thompson", "white", "harris", "sanchez", "clark",
    "ramirez", "lewis",
]  # 29

LOG_ODDS = {
    "FIRST_NAME": 6.849475906891162,
    "LAST_NAME": 6.350720397426025,
    "BIRTHDATE": 10.126641103800338,
    "SEX": 0.7510419059643679,
}
MMT, CMT = 0.8, 0.925
MAX_POINTS = LOG_ODDS["FIRST_NAME"] + LOG_ODDS["LAST_NAME"]
JW_THRESHOLD = 0.9


def demo_algorithm() -> Algorithm:
    """One-pass algorithm over the derived corpus: BLOCK(BIRTHDATE, SEX)
    -> fuzzy MATCH(FIRST_NAME, LAST_NAME) — pass 1 of dibbs-default with
    IDENTIFIER dropped (the derived corpus carries no identifiers)."""
    return Algorithm(
        label="demo",
        passes=(
            AlgorithmPass(
                label="demo_pass",
                blocking_keys=("BIRTHDATE", "SEX"),
                evaluators=(
                    Evaluator("FIRST_NAME"),
                    Evaluator("LAST_NAME"),
                ),
                possible_match_window=(MMT, CMT),
            ),
        ),
        context=AlgorithmContext(log_odds=dict(LOG_ODDS)),
    )


def _sql_array(values: list[str], dialect: str, index_expr: str) -> str:
    lits = ", ".join(f"'{v}'" for v in values)
    if dialect == "spark":
        return f"element_at(array({lits}), cast({index_expr} + 1 as int))"
    return f"list_value({lits})[{index_expr} + 1]"


def derivation_sql(dialect: str) -> str:
    """The shared record derivation, as a SELECT body over ``customer``.

    Emits: record_id, pid, person_id, first, last, bd, sex."""
    if dialect == "spark":
        cast_str = "cast(c_custkey as string)"
        printf = "format_string"
        intdiv = "div"
    else:
        cast_str = "cast(c_custkey as varchar)"
        printf = "printf"
        intdiv = "//"
    pid = f"(c_custkey {intdiv} 2)"
    pid_str = f"cast({pid} as {'string' if dialect == 'spark' else 'varchar'})"
    first_base = _sql_array(FIRSTS, dialect, f"{pid} % 23")
    last = _sql_array(LASTS, dialect, f"{pid} % 29")
    return f"""
        select
          {cast_str}                                   as record_id,
          {pid}                                        as pid,
          concat('p', {pid_str})                       as person_id,
          case when c_custkey % 2 = 1
               then concat({first_base}, substr({first_base}, length({first_base}), 1))
               else {first_base} end                   as first,
          {last}                                       as last,
          {printf}('19%02d-%02d-01',
                   cast(50 + {pid} % 40 as int),
                   cast(1 + {pid} % 12 as int))        as bd,
          case when {pid} % 2 = 0 then 'M' else 'F' end as sex
        from customer
    """


def derived_records(spark: SparkSession, sf_dir: str, where: str = "true") -> DataFrame:
    """Derived flat records -> nested PII-record DataFrame."""
    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView("customer")
    flat = spark.sql(derivation_sql("spark")).filter(F.expr(where))
    return flat.select(
        "record_id",
        F.lit(None).cast("string").alias("external_id"),
        F.col("bd").alias("birth_date"),
        "sex",
        F.array(
            F.struct(
                F.col("last").alias("family"),
                F.array(F.col("first")).alias("given"),
                F.array().cast("array<string>").alias("suffix"),
                F.lit("official").alias("use"),
            )
        ).alias("name"),
        F.array().cast(
            "array<struct<line:array<string>,city:string,state:string,"
            "postal_code:string,county:string>>"
        ).alias("address"),
        F.array().cast("array<struct<value:string,system:string>>").alias("telecom"),
        F.array().cast("array<string>").alias("race"),
        F.array().cast(
            "array<struct<type:string,value:string,authority:string>>"
        ).alias("identifiers"),
        F.col("person_id"),
    )


# the derived corpus split: incoming probes vs MPI
INC_WHERE = "cast(record_id as bigint) % 10 = 5"  # odd -> perturbed first names
_DUCK_DERIVED = f"derived as ({derivation_sql('duckdb')})"
_DUCK_INC = "inc as (select * from derived where cast(record_id as bigint) % 10 = 5)"
_DUCK_MPI = "mpi as (select * from derived)"
# blocked persons: distinct persons agreeing on every blocking key (both
# always present here), then expansion to all cluster members (J1+J3; J4
# agreement is implied because each member of a matched person shares
# bd/sex by construction... NOT true in general, so the oracle re-checks)
_DUCK_PAIRS = """
    blocked as (
      select distinct i.record_id as record_id_l, m.person_id
      from inc i join mpi m on i.bd = m.bd and i.sex = m.sex
    ),
    pairs as (
      select b.record_id_l, b.person_id, m.record_id as record_id_r,
             i.first as first_l, i.last as last_l,
             m.first as first_r, m.last as last_r
      from blocked b
      join mpi m on m.person_id = b.person_id
      join inc i on i.record_id = b.record_id_l
      where (i.bd = m.bd or i.bd is null or m.bd is null)
        and (i.sex = m.sex or i.sex is null or m.sex is null)
    )
"""
_DUCK_SCORES = f"""
    scores as (
      select record_id_l, person_id, record_id_r,
        case when jaro_winkler_similarity(first_l, first_r) >= {JW_THRESHOLD}
             then jaro_winkler_similarity(first_l, first_r) * {LOG_ODDS["FIRST_NAME"]!r}
             else 0.0 end
        +
        case when jaro_winkler_similarity(last_l, last_r) >= {JW_THRESHOLD}
             then jaro_winkler_similarity(last_l, last_r) * {LOG_ODDS["LAST_NAME"]!r}
             else 0.0 end as score
      from pairs
    )
"""
_DUCK_CLUSTERS = f"""
    clusters as (
      select record_id_l, person_id,
             median(score) as median_points,
             count(*) as patients_compared,
             median(score) / {MAX_POINTS!r} as rms
      from scores group by record_id_l, person_id
    ),
    graded as (
      select record_id_l, person_id, median_points, patients_compared, rms,
             case when rms < {MMT!r} then 'certainly-not'
                  when rms < {CMT!r} then 'possible'
                  else 'certain' end as grade
      from clusters where rms >= {MMT!r}
    )
"""


def _demo_link_parts(spark: SparkSession, sf_dir: str):
    alg = demo_algorithm()
    incoming = derived_records(spark, sf_dir, INC_WHERE).drop("person_id")
    mpi = derived_records(spark, sf_dir)
    inc_feats, inc_bk = prepare_incoming(incoming, alg)
    mpi_feats, mpi_bk = prepare_mpi(mpi, alg)
    return alg, incoming, mpi, inc_feats, inc_bk, mpi_feats, mpi_bk


# ---------------------------------------------------------------------------
# the queries
# ---------------------------------------------------------------------------


def q_normalize_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: normalize_text as an expression over customer names."""
    from recordlinker_spark.functions.features import norm_text_expr

    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return df.select(
        F.col("c_custkey").cast("long").alias("record_id"),
        norm_text_expr(F.col("c_name")).alias("norm_name"),
        norm_text_expr(F.upper(F.col("c_mktsegment"))).alias("norm_segment"),
    )


def q_blocking_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+S5: blocking-key derivation + long-format materialization."""
    from recordlinker_spark.functions.features import (
        blocking_key_columns,
        explode_blocking_values,
        feature_columns,
    )

    recs = derived_records(spark, sf_dir).drop("person_id")
    bk = blocking_key_columns(
        feature_columns(recs), ["BIRTHDATE", "SEX", "FIRST_NAME", "LAST_NAME"]
    )
    return explode_blocking_values(bk, ["BIRTHDATE", "SEX", "FIRST_NAME", "LAST_NAME"])


def q_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-J4 over the derived corpus."""
    alg, _inc, _mpi, _inc_feats, inc_bk, _mpi_feats, mpi_bk = _demo_link_parts(
        spark, sf_dir
    )
    return candidate_pairs(inc_bk, mpi_bk, alg, alg.passes[0])


def q_pair_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1-C4: per-pair gated log-odds scores."""
    alg, _inc, _mpi, inc_feats, inc_bk, mpi_feats, mpi_bk = _demo_link_parts(
        spark, sf_dir
    )
    pairs = candidate_pairs(inc_bk, mpi_bk, alg, alg.passes[0])
    scored = score_pairs(
        attach_pair_features(pairs, inc_feats, mpi_feats, alg.passes[0]),
        alg,
        alg.passes[0],
    )
    return scored.select(
        "record_id_l", "person_id", "record_id_r", F.round("score", 6).alias("score")
    )


def q_cluster_grades(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A3: exact-median cluster aggregation, RMS, grading."""
    alg, _inc, _mpi, inc_feats, inc_bk, mpi_feats, mpi_bk = _demo_link_parts(
        spark, sf_dir
    )
    pairs = candidate_pairs(inc_bk, mpi_bk, alg, alg.passes[0])
    scored = score_pairs(
        attach_pair_features(pairs, inc_feats, mpi_feats, alg.passes[0]),
        alg,
        alg.passes[0],
    )
    out = cluster_scores(scored, alg, alg.passes[0])
    return out.select(
        "record_id_l",
        "person_id",
        F.round("median_points", 6).alias("median_points"),
        "patients_compared",
        F.round("rms", 6).alias("rms"),
        "grade",
    )


def q_link_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4-A5 + M3: the full one-pass link decision per incoming record."""
    alg, incoming, mpi, *_ = _demo_link_parts(spark, sf_dir)
    out = link_batch(incoming, mpi, alg)
    return out.decisions.select(
        "record_id",
        "final_grade",
        "person_id",
        F.round("best_rms", 6).alias("best_rms"),
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the corpus unioned with a shifted copy of itself
    (the synthetic docs have no natural exact dups; the injected copies
    make every group size 2, a real signal for the oracle)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    dupes = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    out = exact_duplicates(docs.unionByName(dupes))
    # array_join the doc_ids: the driver gate's canonicalizer hashes
    # scalar cells only (pandas can't factorize list cells)
    return out.select(
        "dup_key", "n_docs", F.array_join("doc_ids", ",").alias("doc_ids")
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-shingle Jaccard over adjacent-doc candidate pairs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    cand = docs.select(F.col("doc_id").alias("doc_id_l")).filter(
        F.col("doc_id_l") % 2 == 0
    ).withColumn("doc_id_r", F.col("doc_id_l") + 1)
    out = ngram_jaccard_pairs(docs, cand, threshold=0.0)
    return out.select(
        "doc_id_l", "doc_id_r", F.round("jaccard", 6).alias("jaccard")
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    return token_counts(docs)


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    return quality_scores(docs)


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    return language_id(docs)


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    return fingerprints(docs)


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 8 vectors as queries."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries, k=5).select(
        "query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank"
    )


def q_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (4 hashes, k=5 shingles) as flat columns."""
    from recordlinker_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    sig = minhash_signatures(docs, num_hashes=4, seed=7)
    return sig.select(
        "doc_id", *[F.element_at("sig", i + 1).alias(f"h{i}") for i in range(4)]
    )


def q_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a deterministic edge set: every doc is
    linked to its injected duplicate (id+1000000) and even docs to their
    odd neighbor — components of size 4."""
    from recordlinker_spark.operators.cluster import connected_components

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )
    # zero-pad so the CC's lexicographic min-label equals the numeric min
    pad = lambda c: F.lpad(c.cast("string"), 9, "0")  # noqa: E731
    dup_edges = docs.select(
        pad(F.col("doc_id")).alias("src"),
        pad(F.col("doc_id") + 1000000).alias("dst"),
    )
    chain_edges = docs.filter(F.col("doc_id") % 2 == 0).select(
        pad(F.col("doc_id")).alias("src"),
        pad(F.col("doc_id") + 1).alias("dst"),
    )
    labels = connected_components(dup_edges.unionByName(chain_edges))
    return labels.select(
        F.col("record_id").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    )


def q_tuning_class_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: Laplace-smoothed agreement rates over the derived true pairs
    (even custkey = base record, odd = perturbed duplicate)."""
    from recordlinker_spark.operators.tuning import _attach, exact_agreement_expr

    recs = derived_records(spark, sf_dir)
    from recordlinker_spark.functions.features import feature_columns

    feats = feature_columns(recs.drop("person_id"), prepend_suffix=False)
    pairs = spark.sql(
        "select cast(c_custkey as string) as record_id_l,"
        " cast(c_custkey + 1 as string) as record_id_r"
        " from customer where c_custkey % 2 = 0"
    )
    probed = ["BIRTHDATE", "SEX", "FIRST_NAME", "LAST_NAME"]
    with_feats = _attach(pairs, feats, probed)
    aggs = [F.count(F.lit(1)).alias("n")]
    for f in probed:
        agree = exact_agreement_expr(f)  # shared with class_probs (A6)
        aggs.append(
            F.round((F.sum(agree) + 1.0) / (F.count(F.lit(1)) + 1.0), 6).alias(
                "m_" + f.lower()
            )
        )
    return with_feats.agg(*aggs)


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates via banded MinHash; the oracle replays the
    band/bucket join over the same signature CTE in DuckDB."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    dupes = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return minhash_lsh_pairs(
        docs.unionByName(dupes), num_hashes=16, bands=4, seed=7
    )


def q_neardup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup canonicalization — LSH candidates -> exact-Jaccard
    verify -> connected components -> elect one doc per group
    (operators/dedup.py:neardup_keep_best).  The oracle replays the
    whole pipeline in DuckDB, including the component step as a
    recursive transitive-closure CTE."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    dupes = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return neardup_keep_best(
        docs.unionByName(dupes), num_hashes=16, bands=4, seed=7
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media plumbing end-to-end as a driver-contract query: span
    docs with one media span each -> extract_media_refs (suffix type
    inference) -> fetch_payloads(fake=True: deterministic sha256
    stream) -> decode_features over mapInPandas.  The oracle replays
    the deterministic metadata (DuckDB sha256 == hashlib): width/height
    are the first two payload bytes + 1 on the pseudo-decode path
    (operators/media.py:decode_features).  Feature vectors are float32
    and excluded from the hash compare by projection."""
    from recordlinker_spark.operators.media import (
        decode_features,
        extract_media_refs,
        fetch_payloads,
    )

    suffix = F.element_at(
        F.array(F.lit(".jpg"), F.lit(".wav"), F.lit(".mp4")),
        (F.col("doc_id").cast("long") % 3 + 1).cast("int"),
    )
    sp = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.array(
                F.struct(
                    F.lit("media").alias("kind"),
                    F.lit("").alias("text"),
                    F.concat(
                        F.lit("media://img/"), F.col("doc_id"), suffix
                    ).alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            ).alias("spans"),
        )
    )
    feats = decode_features(fetch_payloads(extract_media_refs(sp)))
    return feats.select(
        "doc_id", "media_idx", "media_type", "width", "height"
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash LSH rows; the oracle replays the per-bit majority
    vote with 60 generated bit-slice sums in DuckDB."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return simhash_buckets(docs, band_bits=15)


# the gate query's ANN operating point — bench.py derives its
# probe-fraction disclosure from these, so they cannot go stale
IVF_NBITS, IVF_NPROBE = 4, 12


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-ranked multi-probe bucketed ANN (recall < 1 vs brute force
    by design, but the output itself is deterministic given the seed —
    the oracle replays bucket assignment, ranked probing and rescoring
    in DuckDB).  Operating point nbits=4/nprobe=12 measures recall 0.95
    at sf0.1 — the testdata embeddings are isotropic Gaussian (no
    cluster structure), where ANY LSH needs a high probe fraction;
    clustered real-world embeddings prune far more per probe."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(
        emb, queries, k=5, dim=64, nbits=IVF_NBITS, nprobe=IVF_NPROBE,
        max_bucket_size=100000,
    ).select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: banded sign-LSH candidates
    (8 bands x 4 bits over the same seeded hyperplane family as
    ivf_topk) verified by exact cosine >= 0.35.  The testdata
    embeddings are label-clustered Gaussians with no engineered
    near-identical pairs, so the threshold sits where real pairs exist;
    the oracle replays banding + verification exactly, making the
    candidate set (not just the survivors) part of the gate."""
    from recordlinker_spark.operators.dedup import embedding_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_neardup_pairs(
        emb, threshold=0.35, dim=64, bands=8, bits_per_band=4,
        max_bucket_size=100000,
    ).select("vec_id_l", "vec_id_r", F.round("cos", 6).alias("cos"))


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling per-user event aggregation (batch window).

    Sums use the exact integer-micros convention (see
    operators/sessions.py): bit-identical across engines and
    aggregation orders, all-NULL buckets 0.0 — no float degree of
    freedom left for an oracle comparison to trip on."""
    from recordlinker_spark.functions.aggregates import exact_micros_sum

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    bucket = (F.unix_timestamp("ts") / 300).cast("long") * 300
    return ev.groupBy(
        F.col("user_id"), bucket.alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_micros_sum("value").alias("sum_value"),
    )


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-minute-gap sessionization (batch twin of the
    applyInPandasWithState streaming operator, operators/sessions.py)."""
    from recordlinker_spark.operators.sessions import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(ev, gap_minutes=30.0)


QUERIES = {
    "normalize_names": q_normalize_names,
    "blocking_values": q_blocking_values,
    "candidate_pairs": q_candidate_pairs,
    "pair_scores": q_pair_scores,
    "cluster_grades": q_cluster_grades,
    "link_decisions": q_link_decisions,
    "exact_dedup": q_exact_dedup,
    "ngram_jaccard": q_ngram_jaccard,
    "token_stats": q_token_stats,
    "quality_scores": q_quality_scores,
    "language_id": q_language_id,
    "fingerprints": q_fingerprints,
    "embedding_topk": q_embedding_topk,
    "events_window": q_events_window,
    "user_sessions": q_user_sessions,
    "minhash_sigs": q_minhash_sigs,
    "cc_clusters": q_cc_clusters,
    "tuning_class_probs": q_tuning_class_probs,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "neardup_keep_best": q_neardup_keep_best,
    "media_features": q_media_features,
    "simhash": q_simhash,
    "ivf_topk": q_ivf_topk,
    "embedding_neardup": q_embedding_neardup,
}


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# ---------------------------------------------------------------------------

_STOP_EN = "'the','and','of','to','a','in','is','it','that','for'"
_DUCK_TOKENS = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')"
)


def oracle_queries() -> dict[str, str]:
    out: dict[str, str] = {}

    out["normalize_names"] = """
        select c_custkey as record_id,
               lower(regexp_replace(c_name, '[^0-9A-Za-z]', '', 'g')) as norm_name,
               lower(regexp_replace(upper(c_mktsegment), '[^0-9A-Za-z]', '', 'g')) as norm_segment
        from customer
    """

    out["blocking_values"] = f"""
        with {_DUCK_DERIVED}
        select record_id, 1 as key_id, bd as value from derived
        union all
        select record_id, 3 as key_id, sex as value from derived
        union all
        select record_id, 5 as key_id, substr(first, 1, 4) as value from derived
        union all
        select record_id, 6 as key_id, substr(last, 1, 4) as value from derived
    """

    out["candidate_pairs"] = f"""
        with {_DUCK_DERIVED}, {_DUCK_INC}, {_DUCK_MPI}, {_DUCK_PAIRS}
        select record_id_l, person_id, record_id_r from pairs
    """

    out["pair_scores"] = f"""
        with {_DUCK_DERIVED}, {_DUCK_INC}, {_DUCK_MPI}, {_DUCK_PAIRS}, {_DUCK_SCORES}
        select record_id_l, person_id, record_id_r, round(score, 6) as score
        from scores
    """

    out["cluster_grades"] = f"""
        with {_DUCK_DERIVED}, {_DUCK_INC}, {_DUCK_MPI}, {_DUCK_PAIRS}, {_DUCK_SCORES},
             {_DUCK_CLUSTERS}
        select record_id_l, person_id,
               round(median_points, 6) as median_points,
               patients_compared,
               round(rms, 6) as rms, grade
        from graded
    """

    out["link_decisions"] = f"""
        with {_DUCK_DERIVED}, {_DUCK_INC}, {_DUCK_MPI}, {_DUCK_PAIRS}, {_DUCK_SCORES},
             {_DUCK_CLUSTERS},
        best as (
          select record_id_l, person_id, rms, grade,
                 row_number() over (
                   partition by record_id_l
                   order by case grade when 'certain' then 2 else 1 end desc,
                            rms desc, person_id
                 ) as rn
          from graded
        )
        select i.record_id,
               coalesce(b.grade, 'certainly-not') as final_grade,
               case when b.grade = 'certain' then b.person_id
                    when b.grade = 'possible' then null
                    else concat('p-', md5(concat('person:', i.record_id)))
               end as person_id,
               round(b.rms, 6) as best_rms
        from inc i left join best b
          on b.record_id_l = i.record_id and b.rn = 1
    """

    out["exact_dedup"] = """
        with corpus as (
          select cast(doc_id as bigint) as doc_id, text from documents
          union all
          select cast(doc_id as bigint) + 1000000, text from documents
        )
        select md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) as dup_key,
               count(*) as n_docs,
               array_to_string(list_sort(list(doc_id)), ',') as doc_ids
        from corpus
        where text is not null
        group by 1 having count(*) > 1
    """

    out["ngram_jaccard"] = """
        with sh as (
          select cast(doc_id as bigint) as doc_id,
                 list_distinct([substr(t, i, 5)
                   for i in range(1, greatest(length(t) - 4, 1) + 1)]) as s
          from (select doc_id,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) as t
                from documents)
        ),
        cand as (
          select doc_id as doc_id_l, doc_id + 1 as doc_id_r
          from documents where cast(doc_id as bigint) % 2 = 0
        )
        select c.doc_id_l, c.doc_id_r,
               round(len(list_intersect(a.s, b.s))::double /
                     len(list_distinct(list_concat(a.s, b.s))), 6) as jaccard
        from cand c
        join sh a on a.doc_id = c.doc_id_l
        join sh b on b.doc_id = c.doc_id_r
    """

    out["token_stats"] = f"""
        select cast(doc_id as bigint) as doc_id,
               len({_DUCK_TOKENS}) as n_tokens,
               length(trim(text)) as n_chars,
               case when text is null then null
                    else cast(coalesce(list_sum([cast(ceil(length(t) / 4.0) as int)
                              for t in {_DUCK_TOKENS}]), 0) as bigint)
               end as n_subwords
        from documents
    """

    out["quality_scores"] = f"""
        with t as (
          select cast(doc_id as bigint) as doc_id, text,
                 {_DUCK_TOKENS} as toks,
                 length(text) as n_chars
          from documents
        ),
        m as (
          select doc_id,
            case when len(toks) > 0
                 then list_sum([length(x) for x in toks])::double / len(toks)
                 else 0.0 end as mean_token_len,
            case when n_chars > 0
                 then length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))::double / n_chars
                 else 0.0 end as punct_ratio,
            case when n_chars > 0
                 then length(regexp_replace(text, '[^A-Z]', '', 'g'))::double / n_chars
                 else 0.0 end as upper_ratio,
            case when len(toks) > 0
                 then len(list_filter(toks, x -> x in ({_STOP_EN})))::double / len(toks)
                 else 0.0 end as stopword_ratio
          from t
        )
        select doc_id,
               round(mean_token_len, 6) as mean_token_len,
               round(punct_ratio, 6) as punct_ratio,
               round(upper_ratio, 6) as upper_ratio,
               round(stopword_ratio, 6) as stopword_ratio,
               round(greatest(0.0, least(1.0,
                 0.5 + stopword_ratio - punct_ratio - 0.5 * upper_ratio
                 + case when mean_token_len >= 3 and mean_token_len <= 10
                        then 0.2 else -0.2 end)), 6) as quality_score
        from m
    """

    lang_hits = {
        lang: "len(list_filter(toks, x -> x in ({})))".format(
            ", ".join(f"'{w}'" for w in words)
        )
        for lang, words in {
            "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
            "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"],
            "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"],
            "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
        }.items()
    }
    out["language_id"] = f"""
        with t as (
          select cast(doc_id as bigint) as doc_id, {_DUCK_TOKENS} as toks
          from documents
        ),
        h as (
          select doc_id, len(toks) as n,
                 {lang_hits["en"]} as h_en, {lang_hits["de"]} as h_de,
                 {lang_hits["fr"]} as h_fr, {lang_hits["es"]} as h_es
          from t
        )
        select doc_id,
          case when coalesce(greatest(h_en, h_de, h_fr, h_es), 0) = 0 then 'und'
               when h_en >= h_de and h_en >= h_fr and h_en >= h_es then 'en'
               when h_de >= h_fr and h_de >= h_es then 'de'
               when h_fr >= h_es then 'fr'
               else 'es' end as lang_pred,
          round(case when n > 0
                then greatest(h_en, h_de, h_fr, h_es)::double / n
                else 0.0 end, 6) as confidence
        from h
    """

    out["fingerprints"] = """
        select cast(doc_id as bigint) as doc_id,
               list_min([md5(substr(t, i, 8))
                 for i in range(1, greatest(length(t) - 7, 1) + 1)]) as fingerprint
        from (select doc_id,
                     trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) as t
              from documents)
    """

    out["embedding_topk"] = """
        with q as (
          select vec_id as query_id, embedding as qv
          from embeddings where vec_id < 8
        ),
        scored as (
          select q.query_id, e.vec_id,
                 round(list_dot_product(
                         [cast(x as double) for x in e.embedding],
                         [cast(x as double) for x in q.qv])
                       / (sqrt(list_sum([cast(x as double) * x for x in e.embedding]))
                          * sqrt(list_sum([cast(x as double) * x for x in q.qv]))),
                       9) as cos
          from embeddings e cross join q
        ),
        ranked as (
          select query_id, vec_id, cos,
                 row_number() over (partition by query_id
                                    order by cos desc, vec_id) as rank
          from scored
        )
        select query_id, vec_id, round(cos, 6) as cos, cast(rank as int) as rank
        from ranked where rank <= 5
    """

    out["events_window"] = """
        select user_id,
               (cast(floor(epoch(ts)) as bigint) // 300) * 300 as bucket_start,
               count(*) as n_events,
               coalesce(sum(cast(round(value * 1000000) as bigint)), 0)
                   / 1000000.0 as sum_value
        from events
        group by 1, 2
    """

    out["user_sessions"] = """
        with ordered as (
            select user_id, ts, value, event_id,
                   case when lag(ts) over w is null
                         or epoch_us(ts) - epoch_us(lag(ts) over w)
                            > 1800000000
                        then 1 else 0 end as new_s
            from events
            where ts is not null
            window w as (partition by user_id order by ts, event_id)
        ), sess as (
            select user_id, ts, value,
                   -- cast: duckdb windowed sum(int) is HUGEINT, which
                   -- pandas-based normalizers coerce to float64
                   -- ("5.0" vs spark's "5") — bigint in both engines
                   cast(sum(new_s) over (
                       partition by user_id order by ts, event_id
                       rows unbounded preceding
                   ) as bigint) as session_seq
            from ordered
        )
        select user_id, session_seq,
               cast(floor(epoch(min(ts))) as bigint) as session_start,
               cast(floor(epoch(max(ts))) as bigint) as session_end,
               count(*) as n_events,
               coalesce(sum(cast(round(value * 1000000) as bigint)), 0)
                   / 1000000.0 as sum_value
        from sess
        group by 1, 2
    """

    from recordlinker_spark.operators.dedup import MERSENNE, _minhash_coeffs

    coeffs = _minhash_coeffs(4, seed=7)
    sig_cols = ", ".join(
        f"min((h * {a} + {b}) % {MERSENNE}) as h{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    out["minhash_sigs"] = f"""
        with sh as (
          select cast(doc_id as bigint) as doc_id,
                 unnest(list_distinct([substr(t, i, 5)
                   for i in range(1, greatest(length(t) - 4, 1) + 1)])) as s
          from (select doc_id,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) as t
                from documents)
        ),
        hashed as (
          select doc_id,
                 cast(concat('0x', substr(md5(s), 1, 7)) as bigint) as h
          from sh
        )
        select doc_id, {sig_cols} from hashed group by doc_id
    """

    out["cc_clusters"] = """
        with recursive edges as (
          select cast(doc_id as bigint) as src,
                 cast(doc_id as bigint) + 1000000 as dst
          from documents
          union all
          select cast(doc_id as bigint), cast(doc_id as bigint) + 1
          from documents where cast(doc_id as bigint) % 2 = 0
        ),
        sym as (
          select src, dst from edges
          union select dst, src from edges
          union select src as src, src as dst from edges
          union select dst as src, dst as dst from edges
        ),
        reach as (
          select src as a, dst as b from sym
          union
          select r.a, s.dst from reach r join sym s on r.b = s.src
        )
        select a as node, min(b) as component from reach group by a
    """

    # --- minhash_lsh_pairs: replay signatures + banding + bucket join
    coeffs16 = _minhash_coeffs(16, seed=7)
    sig16 = ", ".join(
        f"min((h * {a} + {b}) % {MERSENNE}) as h{i}"
        for i, (a, b) in enumerate(coeffs16)
    )
    band_rows = "\n          union all ".join(
        f"select doc_id, {b} as band, concat_ws(',', h{4 * b}, h{4 * b + 1},"
        f" h{4 * b + 2}, h{4 * b + 3}) as bucket from sigs"
        for b in range(4)
    )
    out["minhash_lsh_pairs"] = f"""
        with corpus as (
          -- NULL-text docs carry no content: the engine filters their
          -- all-NULL signatures before banding (dedup.py), so the
          -- replay excludes them here
          select * from (
            select cast(doc_id as bigint) as doc_id, text from documents
            union all
            select cast(doc_id as bigint) + 1000000, text from documents
          ) where text is not null
        ),
        sh as (
          select doc_id,
                 unnest(list_distinct([substr(t, i, 5)
                   for i in range(1, greatest(length(t) - 4, 1) + 1)])) as s
          from (select doc_id,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) as t
                from corpus)
        ),
        hashed as (
          select doc_id,
                 cast(concat('0x', substr(md5(s), 1, 7)) as bigint) as h
          from sh
        ),
        sigs as (select doc_id, {sig16} from hashed group by doc_id),
        banded as (
          {band_rows}
        ),
        ok as (
          select band, bucket from banded
          group by band, bucket having count(*) <= 1000
        ),
        fb as (select b.* from banded b join ok using (band, bucket))
        select distinct l.doc_id as doc_id_l, r.doc_id as doc_id_r
        from fb l join fb r
          on l.band = r.band and l.bucket = r.bucket and l.doc_id < r.doc_id
    """

    # --- neardup_keep_best: the full canonicalization pipeline —
    # same signature/banding replay, then exact-Jaccard verify,
    # recursive-CTE transitive closure for components, and the
    # keep-best window election
    out["neardup_keep_best"] = f"""
        with recursive corpus as (
          select cast(doc_id as bigint) as doc_id, text from documents
          union all
          select cast(doc_id as bigint) + 1000000, text from documents
        ),
        norm as (
          select doc_id,
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) as t,
                 coalesce(length(trim(text)), 0) as _len
          from corpus
        ),
        shl as (
          -- NULL-text docs never shingle: the engine drops their
          -- all-NULL signatures before banding, so they stay
          -- singletons in the output (handled by the left join below)
          select doc_id, list_distinct([substr(t, i, 5)
            for i in range(1, greatest(length(t) - 4, 1) + 1)]) as s
          from norm where t is not null
        ),
        sh as (select doc_id, unnest(s) as s from shl),
        hashed as (
          select doc_id,
                 cast(concat('0x', substr(md5(s), 1, 7)) as bigint) as h
          from sh
        ),
        sigs as (select doc_id, {sig16} from hashed group by doc_id),
        banded as (
          {band_rows}
        ),
        ok as (
          select band, bucket from banded
          group by band, bucket having count(*) <= 1000
        ),
        fb as (select b.* from banded b join ok using (band, bucket)),
        cand as (
          select distinct l.doc_id as doc_id_l, r.doc_id as doc_id_r
          from fb l join fb r
            on l.band = r.band and l.bucket = r.bucket
               and l.doc_id < r.doc_id
        ),
        ver as (
          select c.doc_id_l, c.doc_id_r
          from cand c
          join shl a on a.doc_id = c.doc_id_l
          join shl b on b.doc_id = c.doc_id_r
          where len(list_intersect(a.s, b.s))::double /
                len(list_distinct(list_concat(a.s, b.s))) >= 0.7
        ),
        sym as (
          select doc_id_l as src, doc_id_r as dst from ver
          union
          select doc_id_r, doc_id_l from ver
        ),
        reach as (
          select src as a, dst as b from sym
          union
          select r.a, s.dst from reach r join sym s on r.b = s.src
        ),
        lab as (
          select a as doc_id, least(a, min(b)) as component
          from reach group by a
        ),
        labeled as (
          select n.doc_id, coalesce(l.component, n.doc_id) as component,
                 n._len
          from norm n left join lab l using (doc_id)
        )
        select doc_id, component,
               count(*) over (partition by component) as n_members,
               cast(row_number() over (
                 partition by component
                 order by _len desc, doc_id asc
               ) = 1 as int) as keep
        from labeled
    """

    # --- media_features: the fake-fetch payload is sha256(ref) bytes
    # repeated (operators/media.py:fetch_payloads), and the pseudo-
    # decode metadata is byte0+1 / byte1+1 — both exactly replayable
    # because DuckDB's sha256() matches hashlib
    out["media_features"] = """
        with refs as (
          select cast(doc_id as varchar) as doc_id,
                 0 as media_idx,
                 case cast(doc_id as bigint) % 3
                   when 0 then 'image' when 1 then 'audio'
                   else 'video' end as media_type,
                 concat('media://img/', cast(doc_id as varchar),
                   case cast(doc_id as bigint) % 3
                     when 0 then '.jpg' when 1 then '.wav'
                     else '.mp4' end) as ref
          from documents
        ),
        h as (
          select doc_id, media_idx, media_type, sha256(ref) as hex
          from refs
        )
        select doc_id, media_idx, media_type,
               cast(concat('0x', substr(hex, 1, 2)) as int) + 1 as width,
               cast(concat('0x', substr(hex, 3, 2)) as int) + 1 as height
        from h
    """

    # --- simhash: replay the 60 per-bit majority votes
    bit_sums = ", ".join(f"sum((h >> {b}) & 1) as b{b}" for b in range(60))
    sim_terms = " + ".join(
        f"(case when 2 * b{b} > n then cast({1 << b} as bigint)"
        " else cast(0 as bigint) end)"
        for b in range(60)
    )
    out["simhash"] = f"""
        with toks as (
          select cast(doc_id as bigint) as doc_id,
                 unnest(string_split(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) as t
          from documents
        ),
        hashed as (
          select doc_id,
                 cast(concat('0x', substr(md5(t), 1, 15)) as bigint) as h
          from toks
        ),
        votes as (select doc_id, count(*) as n, {bit_sums} from hashed group by doc_id),
        sim as (select doc_id, cast({sim_terms} as bigint) as simhash from votes)
        select doc_id, simhash, band,
               cast((simhash >> (band * 15)) & 32767 as bigint) as key
        from sim cross join (select unnest([0, 1, 2, 3]) as band) bands
    """

    # --- ivf_topk: replay bucket assignment + multi-probe + rescoring
    from recordlinker_spark.operators.simsearch import hyperplanes

    planes = hyperplanes(dim=64, nbits=4, seed=42)
    plane_dots = ", ".join(
        "list_dot_product(v, [{}]) as d{}".format(
            ", ".join(repr(p) for p in plane), i
        )
        for i, plane in enumerate(planes)
    )
    home_bits = " + ".join(
        f"(case when d{i} >= 0 then {1 << i} else 0 end)" for i in range(4)
    )
    # ranked multi-probe: every flip-mask's cost = sum of |d_i| over its
    # set bits; probe the 12 cheapest (mask 0 = home bucket, cost 0)
    mask_cost = " + ".join(
        f"(case when m.mask & {1 << i} > 0 then abs(d{i}) else 0 end)"
        for i in range(4)
    )
    out["ivf_topk"] = f"""
        with e as (
          select vec_id, [cast(x as double) for x in embedding] as v
          from embeddings
        ),
        d as (select vec_id, v, {plane_dots} from e),
        b as (select vec_id, v, d0, d1, d2, d3, {home_bits} as home from d),
        cok as (select home as bucket from b group by home having count(*) <= 100000),
        c as (select vec_id, v, home as bucket from b join cok on b.home = cok.bucket),
        q as (select vec_id as query_id, v as qv, home, d0, d1, d2, d3
              from b where vec_id < 8),
        masks as (select unnest(range(16)) as mask),
        probecost as (
          select q.query_id, q.home, m.mask, {mask_cost} as cost
          from q cross join masks m
        ),
        probes as (
          select query_id, xor(home, mask) as bucket
          from (select *, row_number() over (partition by query_id
                                             order by cost, mask) as rn
                from probecost)
          where rn <= 12
        ),
        cand as (
          select distinct p.query_id, c.vec_id
          from probes p join c on c.bucket = p.bucket
        ),
        scored as (
          select cand.query_id, cand.vec_id,
                 round(list_dot_product(c0.v, q.qv)
                       / (sqrt(list_dot_product(c0.v, c0.v))
                          * sqrt(list_dot_product(q.qv, q.qv))), 9) as cos
          from cand
          join e c0 on c0.vec_id = cand.vec_id
          join q on q.query_id = cand.query_id
        ),
        ranked as (
          select query_id, vec_id, cos,
                 row_number() over (partition by query_id
                                    order by cos desc, vec_id) as rank
          from scored
        )
        select query_id, vec_id, round(cos, 6) as cos, cast(rank as int) as rank
        from ranked where rank <= 5
    """

    # --- embedding_neardup: replay banded sign-LSH + cosine verify
    nd_bands, nd_bits = 8, 4
    nd_planes = hyperplanes(dim=64, nbits=nd_bands * nd_bits, seed=42)
    nd_dots = ", ".join(
        "list_dot_product(v, [{}]) as d{}".format(
            ", ".join(repr(p) for p in plane), i
        )
        for i, plane in enumerate(nd_planes)
    )
    nd_buckets = ", ".join(
        " + ".join(
            f"(case when d{b * nd_bits + i} >= 0 then {1 << i} else 0 end)"
            for i in range(nd_bits)
        )
        + f" as bucket{b}"
        for b in range(nd_bands)
    )
    nd_bucket_case = (
        "case b.band "
        + " ".join(f"when {b} then bucket{b}" for b in range(nd_bands))
        + " end"
    )
    out["embedding_neardup"] = f"""
        with e as (
          select vec_id, [cast(x as double) for x in embedding] as v
          from embeddings
        ),
        d as (select vec_id, v, {nd_dots} from e),
        bkt as (select vec_id, {nd_buckets} from d),
        sig as (
          select vec_id, b.band, {nd_bucket_case} as bucket
          from bkt cross join (select unnest(range({nd_bands})) as band) b
        ),
        ok as (select band, bucket from sig group by band, bucket
               having count(*) <= 100000),
        sig2 as (select sig.* from sig join ok
                 on sig.band = ok.band and sig.bucket = ok.bucket),
        cand as (
          select distinct l.vec_id as vec_id_l, r.vec_id as vec_id_r
          from sig2 l join sig2 r
          on l.band = r.band and l.bucket = r.bucket
             and l.vec_id < r.vec_id
        ),
        scored as (
          select cand.vec_id_l, cand.vec_id_r,
                 round(list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))), 9) as cos
          from cand
          join e a on a.vec_id = cand.vec_id_l
          join e b on b.vec_id = cand.vec_id_r
        )
        select vec_id_l, vec_id_r, round(cos, 6) as cos
        from scored where cos >= 0.35
    """

    out["tuning_class_probs"] = f"""
        with {_DUCK_DERIVED},
        pairs as (
          select l.bd as bd_l, l.sex as sex_l, l.first as first_l, l.last as last_l,
                 r.bd as bd_r, r.sex as sex_r, r.first as first_r, r.last as last_r
          from derived l
          join derived r on cast(r.record_id as bigint) = cast(l.record_id as bigint) + 1
          where cast(l.record_id as bigint) % 2 = 0
        )
        select count(*) as n,
          round((sum(case when bd_l = bd_r then 1.0 else 0.0 end) + 1.0) / (count(*) + 1.0), 6) as m_birthdate,
          round((sum(case when sex_l = sex_r then 1.0 else 0.0 end) + 1.0) / (count(*) + 1.0), 6) as m_sex,
          round((sum(case when first_l = first_r then 1.0 else 0.0 end) + 1.0) / (count(*) + 1.0), 6) as m_first_name,
          round((sum(case when last_l = last_r then 1.0 else 0.0 end) + 1.0) / (count(*) + 1.0), 6) as m_last_name
        from pairs
    """

    return out
