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
    """Cosine similarity; an all-zero vector gets 0.0 by convention —
    the unguarded division would throw DIVIDE_BY_ZERO under ANSI mode
    (Spark 4 default) and poison top-k ranks with NULLs otherwise."""
    denom = _norm(a) * _norm(b)
    dot = _dot(
        F.transform(a, lambda x: x.cast("double")),
        F.transform(b, lambda x: x.cast("double")),
    )
    return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))


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


#: exhaustive probe-ranking works over the J most-uncertain planes;
#: 2^J candidate perturbations are generated as static codegen structs
PROBE_RANK_PLANES = 6

#: hard cap on ranked planes: 2^8 = 256 static structs is the largest
#: perturbation array worth materializing per query row (the probe
#: expression applies only to the small query side, but codegen size
#: grows as 2^J)
MAX_RANK_PLANES = 8


def probe_buckets_col(
    vec: Column,
    planes: list[list[float]],
    nprobe: int,
    rank_planes: int = PROBE_RANK_PLANES,
) -> Column:
    """Score-ranked multi-probe bucket list (Lv et al., VLDB'07).

    The probability that a true neighbor's signature flipped plane
    ``i`` falls with the query's margin ``|dot_i|``; the best buckets
    to probe are therefore the perturbations with the smallest total
    flipped margin.  This ranks ALL XOR-combinations over the query's
    ``J = min(nbits, rank_planes)`` most-uncertain planes by that cost
    (``cost(S) = sum_{i in S} |dot_i|``) and probes the ``nprobe``
    cheapest — for ``nbits <= J`` that is exhaustive-optimal probing of
    the whole bucket space, strictly better than the fixed Hamming-1
    neighborhood it replaces (which capped recall ~0.53 on isotropic
    data at nbits=4).  ``rank_planes`` bounds codegen size (2^J static
    structs, capped at ``MAX_RANK_PLANES``); planes outside the ranked
    set are never flipped, so at ``nbits > rank_planes`` attainable
    recall is capped by the flip probability of the excluded
    (most-certain) planes — raise ``rank_planes`` to ``nbits`` when the
    bucket count is <= 2^8 and full-coverage probing matters.  All
    codegen: array_sort over 2^J static structs, no Python.

    Expression-size discipline: the per-combo cost/mask sums are
    written as ``aggregate`` over *static literal* index arrays whose
    lambdas reference the ``ranked`` struct array, so the dim x nbits
    dot-product subtree appears in the analyzed plan a constant ~3
    times.  A naive expansion (one cost/mask expression per combo, each
    inlining ``ranked``) embeds it 2^J * J times — at J=8 / dim=64 that
    is a multi-million-node tree that OOMs the driver during analysis
    before a single task runs."""
    if nprobe <= 1:
        return F.array(signature_col(vec, planes))
    dots = plane_dots(vec, planes)
    home = signature_col(vec, planes)
    # rank the planes by margin (ascending |dot|): position j in
    # ``ranked`` is the j-th most-likely-misflipped plane
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(F.abs(d).alias("adot"), F.lit(1 << i).alias("mask"))
                for i, d in enumerate(dots)
            ]
        )
    )
    j_planes = min(len(planes), max(1, min(rank_planes, MAX_RANK_PLANES)))
    # static literal index sets: combo s flips ranked planes {j : s>>j&1}
    combo_sets = F.array(
        *[
            F.array(
                *[F.lit(j + 1) for j in range(j_planes) if s >> j & 1]
            ).cast("array<int>")
            for s in range(1 << j_planes)
        ]
    )
    scored = F.transform(
        combo_sets,
        lambda idx: F.struct(
            F.aggregate(
                idx,
                F.lit(0.0),
                lambda acc, j: acc + F.element_at(ranked, j)["adot"],
            ).alias("cost"),
            F.aggregate(
                idx,
                F.lit(0),
                lambda acc2, j2: acc2.bitwiseXOR(F.element_at(ranked, j2)["mask"]),
            ).alias("mask"),
        ),
    )
    best = F.slice(F.array_sort(scored), 1, min(nprobe, 1 << j_planes))
    return F.transform(best, lambda c: home.bitwiseXOR(c["mask"]))


def pick_nprobe(
    corpus: DataFrame,
    sample_queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    nbits: int = 4,
    seed: int = 42,
    recall_floor: float = 0.9,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank_planes: int = PROBE_RANK_PLANES,
) -> tuple[int, float]:
    """Recall-targeted operating point: the smallest ``nprobe`` whose
    measured recall@k on ``sample_queries`` (vs exact brute force over
    the same corpus) reaches ``recall_floor``.

    The sample is small by construction (hundreds of queries), so the
    brute-force truth pass is one corpus scan; at production scale this
    runs once per corpus/embedding version on a sampled query log and
    the chosen ``nprobe`` ships with the index config.  Returns
    ``(nprobe, measured_recall)``; if even probing every ranked bucket
    misses the floor (isotropic data degrades LSH toward brute force),
    the max is returned with its measured recall — callers decide
    whether to accept or fall back to :func:`brute_force_topk`."""
    truth = {
        (r["query_id"], r[id_col])
        for r in brute_force_topk(
            corpus, sample_queries, k=k, id_col=id_col, vec_col=vec_col
        ).collect()
    }
    max_probe = 1 << min(nbits, max(1, min(rank_planes, MAX_RANK_PLANES)))

    def measure(p: int) -> float:
        got = {
            (r["query_id"], r[id_col])
            for r in ivf_topk(
                corpus,
                sample_queries,
                k=k,
                dim=dim,
                nbits=nbits,
                seed=seed,
                nprobe=p,
                max_bucket_size=max_bucket_size,
                id_col=id_col,
                vec_col=vec_col,
                rank_planes=rank_planes,
            ).collect()
        }
        return len(got & truth) / max(len(truth), 1)

    # galloping doubling to bracket the floor, then binary refinement:
    # recall@k is monotone in nprobe (a larger probe set is a candidate
    # superset), so the doubling phase alone would over-ship by up to
    # 2x (e.g. return 4 when 3 suffices) — each extra probe is paid on
    # EVERY query the shipped index serves, while the refinement costs
    # log2(nprobe) one-off sample evaluations here.
    nprobe, recall = 1, 0.0
    last_below = 0  # largest nprobe MEASURED below the floor
    while True:
        recall = measure(nprobe)
        if recall >= recall_floor or nprobe >= max_probe:
            break
        last_below = nprobe
        nprobe = min(nprobe * 2, max_probe)
    if recall >= recall_floor and nprobe > 1:
        # refine from the last measured-below point, not nprobe // 2:
        # when the doubling clamped at max_probe (e.g. prev=8 ->
        # min(16, 12) = 12), nprobe // 2 + 1 = 7 would re-measure 7-8,
        # values already known to fail — each a full ivf_topk sample
        # evaluation
        lo, hi = last_below + 1, nprobe
        best, best_recall = nprobe, recall
        while lo < hi:
            mid = (lo + hi) // 2
            r = measure(mid)
            if r >= recall_floor:
                best, best_recall, hi = mid, r, mid
            else:
                lo = mid + 1
        return best, best_recall
    return nprobe, recall


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
    rank_planes: int = PROBE_RANK_PLANES,
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
            probe_buckets_col(F.col(vec_col), planes, nprobe, rank_planes)
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
