"""Similarity search over embedding columns (array<float>).

Engine extension for training-data pipelines: approximate-nearest-
neighbor over an ``embeddings(vec_id, embedding)`` table.

* brute_force_topk — exact cosine top-k per query: broadcast the query
  set (it is the small side by construction), one pass over the corpus,
  ``F.zip_with`` dot products (codegen, no Python), window top-k.
  At 100 TB this is the *correct* plan when |queries| is small: one
  corpus scan, no shuffle of the corpus, top-k pushed into the
  per-partition window.
* ivf_topk — the scale path for large query sets: k-means-free IVF via
  deterministic random hyperplane bucketing (sign-LSH): both sides are
  hashed to ``nprobe``-of-``2^nbits`` buckets, the join is bucket-local,
  then exact cosine rescoring within buckets.  Trades recall for a
  corpus shuffle bounded by bucket size.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(
        F.transform(a, lambda x: x.cast("double")),
        F.transform(b, lambda x: x.cast("double")),
    ) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cos, rank), rank 1..k.

    ``queries`` must have (query_id, embedding). The query side is
    broadcast — the corpus is scanned once and never shuffled; only the
    (|queries| x k) result moves."""
    q = F.broadcast(queries.select(F.col("query_id"), F.col(vec_col).alias("_qv")))
    scored = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(q).select(
        "query_id",
        id_col,
        F.round(cosine(F.col(vec_col), F.col("_qv")), 9).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )


def hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH bucketing."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(nbits)
    ]


def plane_dots(vec: Column, planes: list[list[float]]) -> list[Column]:
    """Per-hyperplane dot products (codegen zip_with/aggregate)."""
    return [
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(p) for p in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for plane in planes
    ]


def signature_col(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id = sign bits against each hyperplane."""
    bits = [
        F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, dot in enumerate(plane_dots(vec, planes))
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def probe_buckets_col(vec: Column, planes: list[list[float]], nprobe: int) -> Column:
    """Multi-probe bucket list: the home bucket plus the ``nprobe - 1``
    Hamming-1 neighbors whose hyperplane the query sits closest to
    (smallest |dot| — the standard multi-probe LSH heuristic: the
    planes most likely to have mis-signed a true neighbor)."""
    dots = plane_dots(vec, planes)
    home = signature_col(vec, planes)
    if nprobe <= 1:
        return F.array(home)
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.abs(d).alias("adot"),
                    F.lit(i).alias("i"),
                    F.lit(1 << i).alias("mask"),
                )
                for i, d in enumerate(dots)
            ]
        )
    )
    flips = F.transform(
        F.slice(ranked, 1, min(nprobe - 1, len(planes))),
        lambda s: home.bitwiseXOR(s["mask"]),
    )
    return F.concat(F.array(home), flips)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    nbits: int = 6,
    seed: int = 42,
    nprobe: int = 1,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN: sign-LSH into 2^nbits buckets, exact rescoring
    within the query's probed buckets.

    Recall < 1 by design but tunable: ``nprobe`` > 1 additionally
    probes the Hamming-1 neighbor buckets across the query's closest
    hyperplanes (multi-probe LSH). ``max_bucket_size`` drops corpus
    buckets above the cap (skew guard — a degenerate bucket holding
    half the corpus would otherwise recreate the brute-force join);
    dropped buckets trade recall for a bounded per-bucket join, same
    mitigation as minhash LSH. The candidate join is bucket-local
    (equi-join, hash-partitioned) and each candidate is rescored once
    even when several probes find it."""
    planes = hyperplanes(dim, nbits, seed)
    c = corpus.select(
        F.col(id_col), F.col(vec_col), signature_col(F.col(vec_col), planes).alias("_b")
    )
    if max_bucket_size is not None:
        sizes = c.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
        c = c.join(
            F.broadcast(sizes.filter(F.col("_n") <= max_bucket_size).select("_b")),
            "_b",
        )
    q = queries.select(
        "query_id",
        F.col(vec_col).alias("_qv"),
        F.explode(
            probe_buckets_col(F.col(vec_col), planes, nprobe)
        ).alias("_b"),
    )
    scored = (
        c.join(q, "_b")
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col(vec_col), F.col("_qv")), 9).alias("cos"),
        )
        .dropDuplicates(["query_id", id_col])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )
