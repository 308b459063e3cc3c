"""Document deduplication operators for large-scale training-data pipelines.

Not part of the reference (RecordLinker dedups *records* via linkage);
these are the corpus-level text-dedup primitives a 100 TB pipeline
needs, each expressed as pure DataFrame ops so Catalyst/AQE plan the
shuffles:

* exact_duplicates   — hash-groupBy on normalized text (md5 keys).
* minhash_lsh_pairs  — shingle -> minhash signature -> LSH banding ->
  bucket self-join; candidate pairs with optional exact-Jaccard verify.
* simhash_buckets    — 64-bit simhash over tokens, banded into 4x16-bit
  keys (Hamming distance <= 3 guaranteed caught in >= 1 band).
* ngram_jaccard_pairs — exact Jaccard over character-shingle sets for a
  candidate pair set (the verify stage of MinHash, usable standalone).

Determinism: every hash derives from md5(token) (stable across Spark
and DuckDB, which powers the oracle checks) — no JVM-specific hashing
in results. MinHash permutations are the classic (a*x + b) mod p
family with seeded constants.

Scale notes: the only shuffles are the groupBys on band/bucket keys;
hot buckets (boilerplate docs) are bounded by ``max_bucket_size`` —
buckets above the cap are dropped and counted, the standard mitigation
for the |bucket|^2 blowup of near-dup mining.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Universal-hash modulus for the minhash permutations.  MUST be small
# enough that ``h * a`` (h < 2^28, a < 2^31 -> product < 2^59)
# actually WRAPS: with the earlier 2^61-1 the mod never fired, making
# every "permutation" monotonic in h — all num_hashes minima then pick
# the SAME argmin shingle, collapsing the signature to one hash
# function repeated (measured: bimodal 0-or-all agreement, recall ~= J
# instead of the S-curve).  2^31-1 (Mersenne prime M31) wraps ~2^28
# times per product while keeping h*a+b < 2^60 — no int64 overflow
# under ANSI mode.
MERSENNE = (1 << 31) - 1


def _norm_text(col: Column) -> Column:
    """Dedup-normalization: lowercase, collapse whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    Returns (dup_key, n_docs, doc_ids) for groups with n_docs > 1.
    One shuffle, map-side partial agg.  NULL-text docs are excluded:
    md5(NULL) is NULL and groupBy treats NULL keys as equal, so without
    the filter every doc with merely MISSING text would be reported as
    one giant byte-identical group — and a downstream keep-one-copy
    step would delete real, unrelated documents."""
    key = F.md5(_norm_text(F.col(text_col))).alias("dup_key")
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(key, F.col("doc_id"))
        .groupBy("dup_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def exploded_shingles(
    docs: DataFrame, text_col: str = "text", k: int = 5, distinct: bool = True
) -> DataFrame:
    """(doc_id, s) rows: character k-shingles of the normalized text.

    Plan shape chosen for scale: explode a position *generator* and
    slice at the top level — ``posexplode``-style rows keep the
    substring OUT of any higher-order-function lambda, so the whole
    pipeline (generate -> substring -> hash/join) stays in whole-stage
    codegen.  ``distinct=False`` skips the dedup shuffle for consumers
    that are duplicate-insensitive (MinHash minima)."""
    ex = (
        docs.select(F.col("doc_id"), _norm_text(F.col(text_col)).alias("_t"))
        .select(
            "doc_id",
            "_t",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.length("_t") - F.lit(k - 1), F.lit(1)),
                )
            ).alias("_i"),
        )
        .select(
            "doc_id", F.substring(F.col("_t"), F.col("_i"), F.lit(k)).alias("s")
        )
    )
    if distinct:
        ex = ex.dropDuplicates(["doc_id", "s"])
    return ex


def _shingle_hash(sh: Column) -> Column:
    """Stable 28-bit shingle hash: first 7 hex chars of md5.

    28 bits keeps ``h * a`` (a < 2^31) under 2^59 — no int64 overflow
    under ANSI mode (Spark 4 default) without losing determinism."""
    return F.conv(F.substring(F.md5(sh), 1, 7), 16, 10).cast("long")


def _minhash_coeffs(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 31), rng.randrange(0, 1 << 31))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 32,
    seed: int = 42,
    k: int = 5,
) -> DataFrame:
    """(doc_id, sig: array<long>) minhash signatures.

    Plan shape chosen for scale: explode shingles -> one md5 per
    shingle -> groupBy(doc_id) with ``num_hashes`` codegen'd ``min``
    aggregates.  The map-side partial aggregation collapses each
    partition to one row per doc before the shuffle, so the exchange
    carries ~|docs| rows, not |shingles| — and everything stays in
    whole-stage codegen (an array-accumulator ``F.aggregate`` variant
    ran ~50x slower: interpreted HOF, per-step array allocation)."""
    coeffs = _minhash_coeffs(num_hashes, seed)
    # duplicate shingles cannot change a min — skip the distinct shuffle
    ex = exploded_shingles(docs, text_col, k, distinct=False).select(
        "doc_id", _shingle_hash(F.col("s")).alias("h")
    )
    aggs = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE)).alias(f"_m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    sig = ex.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("sig")
    )


def pick_lsh_config(
    threshold: float,
    num_hashes: int = 64,
    recall_bias: bool = True,
) -> tuple[int, int]:
    """(num_hashes, bands) whose banding S-curve midpoint sits at (or
    just below) the target Jaccard ``threshold``.

    With ``b`` bands of ``r = num_hashes/b`` rows, a pair of Jaccard
    similarity ``s`` collides in >= 1 band with probability
    ``1 - (1 - s^r)^b``; the curve's midpoint is ``(1/b)^(1/r)``
    (Leskovec/Rajaraman/Ullman, *Mining of Massive Datasets* ch. 3).
    Scans the divisors of ``num_hashes``.  With ``recall_bias``
    (default) it returns the band count whose midpoint is closest to
    ``threshold`` FROM BELOW — a midpoint above the threshold means
    pairs at the boundary mostly never collide, a loss the verify
    stage (:func:`ngram_jaccard_pairs`, the standard pipeline) can
    never recover; trading extra verify-stage candidates for recall is
    the right default.  Without it, closest midpoint wins outright.

    >>> pick_lsh_config(0.8)    # the shipped minhash_lsh_pairs default
    (64, 8)
    >>> pick_lsh_config(0.7)    # boundary pairs collide w.p. 0.988
    (64, 16)
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if num_hashes < 2:
        raise ValueError(f"num_hashes must be >= 2, got {num_hashes}")
    divisors = [b for b in range(1, num_hashes + 1) if num_hashes % b == 0]
    mids = {b: (1.0 / b) ** (b / num_hashes) for b in divisors}
    if recall_bias:
        below = [b for b in divisors if mids[b] <= threshold]
        if below:
            return num_hashes, max(below, key=lambda b: mids[b])
        # even the most aggressive banding sits above the threshold
        # (very low thresholds / few hashes): take the lowest midpoint
        return num_hashes, min(divisors, key=lambda b: mids[b])
    return num_hashes, min(divisors, key=lambda b: abs(mids[b] - threshold))


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 8,
    seed: int = 42,
    max_bucket_size: int = 1000,
    k: int = 5,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash + LSH banding.

    rows/band = num_hashes/bands; a pair colliding in >= 1 band is a
    candidate. Returns distinct (doc_id_l, doc_id_r) with doc_id_l <
    doc_id_r.

    Default (64, 8) = 8 rows/band: S-curve midpoint (1/8)^(1/8) ~= 0.77
    — measured on the engineered near-dup corpus (Jaccard 0.86-1.0):
    recall 0.994 / candidate precision 0.89 at sf0.1, vs 0.99/0.25 for
    (16, 4) whose 4-row bands admit quadratically more false candidates
    as the corpus grows.  Sweep evidence in BENCH_r04 extras.
    """
    if num_hashes % bands != 0:
        # explicit raise, not assert: asserts vanish under python -O,
        # which would silently mis-slice the signature into bands
        raise ValueError(f"num_hashes={num_hashes} not divisible by bands={bands}")
    rows = num_hashes // bands
    sig = minhash_signatures(docs, text_col, num_hashes, seed, k)
    # NULL-text docs carry all-NULL signatures (min over zero shingle
    # rows), and concat_ws SKIPS NULLs — without this filter every such
    # doc lands in bucket "" of every band and the self-join emits a
    # quadratic clique of contentless "candidates".  A doc with no text
    # has no content to be a near-duplicate OF; drop it here.  (sig
    # elements are all-or-none NULL, so testing the first suffices.)
    sig = sig.filter(F.element_at(F.col("sig"), 1).isNotNull())
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at(F.col("sig"), b * rows + r + 1)
                                for r in range(rows)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))

    # bucket-size cap: boilerplate buckets explode quadratically.
    # Window-count over (band, bucket) instead of a groupBy+join: the
    # window shuffles banded by exactly the self-join's key, so the
    # join below reuses ONE exchange for the cap AND both join sides —
    # the signature aggregation runs once per query instead of 4x
    # (measured 20s -> 4s at sf0.1; a persist() variant was slower at
    # 6.4s because it pays materialization).  A pathological bucket
    # buffers (and spills) as one window partition, but it is exactly
    # the bucket the cap then drops.
    w = Window.partitionBy("band", "bucket")
    banded = (
        banded.withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") <= max_bucket_size)
        .drop("_n")
    )

    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_id_l"),
            F.col("r.doc_id").alias("doc_id_r"),
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.7,
    materialize_shingles: bool = True,
) -> DataFrame:
    """Exact character-k-shingle Jaccard for candidate pairs; keeps
    pairs with similarity >= threshold. Columns: doc_id_l, doc_id_r,
    jaccard.

    Plan shape chosen for scale: shingles are EXPLODED once into
    (doc_id, shingle) rows; |A ∩ B| is a pair-shingle equi-join counted
    in a groupBy, |A| and |B| are per-doc counts, and jaccard =
    inter / (|A| + |B| - inter).  Everything is narrow codegen rows —
    the earlier variant joined the full shingle *arrays* onto every
    pair and ran set ops per pair, shuffling O(doc_len) arrays per pair
    (20.9s at sf0.1 vs low single digits for this plan).  Zero-overlap
    pairs are preserved via a left join (jaccard = 0).

    Only PAIR MEMBERS are shingled: the explode subtree feeds three
    join branches (sizes + both intersection sides) with different
    partitionings, so no exchange is reused and an unpruned corpus
    would be scanned+exploded three times over — while banded LSH
    candidates touch a small fraction of a large corpus.  The member
    semi-join costs one narrow id distinct and prunes all three
    branches."""
    # the intersection count below is summed per (l, r) key, so a
    # DUPLICATED input pair would double n_inter against fixed sizes —
    # jaccard > 1, or a zero denominator for exact-dup pairs (ANSI
    # divide error).  Dedup defensively: internal callers already emit
    # distinct pairs, and this exchange shares the pair key the
    # intersection groupBy shuffles on anyway.
    candidate_pairs = candidate_pairs.dropDuplicates(["doc_id_l", "doc_id_r"])
    members = (
        candidate_pairs.select(F.col("doc_id_l").alias("doc_id"))
        .unionByName(candidate_pairs.select(F.col("doc_id_r").alias("doc_id")))
        .distinct()
    )
    ex = exploded_shingles(
        docs.join(members, "doc_id", "left_semi"), text_col, k, distinct=True
    )
    if materialize_shingles:
        # the explode subtree feeds three branches below (sizes + both
        # intersection sides) under DIFFERENT partitionings; reuse
        # relies on Catalyst exchange-dedup of the dropDuplicates
        # shuffle, which the member semi-join's runtime filters can
        # defeat.  Default ON: compute the member-pruned shingles ONCE
        # — the frame is narrow (doc_id, s) rows bounded by the
        # candidate set (measured 8.8s -> 3.8s median on the sf0.1
        # bench query, and -7% on neardup_keep_best whose candidates
        # are already checkpointed).  Opt out only when the candidate
        # frame itself is cheap AND the caller needs a fully lazy plan
        # (e.g. a streaming-incremental composition).
        ex = ex.localCheckpoint(eager=True)
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # pair x left-shingle rows, matched against the right side's shingles
    left = candidate_pairs.join(
        ex.select(F.col("doc_id").alias("doc_id_l"), "s"), "doc_id_l"
    )
    inter = (
        left.join(
            ex.select(F.col("doc_id").alias("doc_id_r"), "s"), ["doc_id_r", "s"]
        )
        .groupBy("doc_id_l", "doc_id_r")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        candidate_pairs.join(inter, ["doc_id_l", "doc_id_r"], "left")
        .join(
            sizes.select(F.col("doc_id").alias("doc_id_l"), F.col("n_sh").alias("n_l")),
            "doc_id_l",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_id_r"), F.col("n_sh").alias("n_r")),
            "doc_id_r",
        )
        .withColumn("_i", F.coalesce(F.col("n_inter"), F.lit(0)))
        .withColumn(
            "jaccard", F.col("_i") / (F.col("n_l") + F.col("n_r") - F.col("_i"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_l", "doc_id_r", "jaccard")
    )
    return out


SIMHASH_BITS = 60


def simhash_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 60-bit SimHash over whitespace tokens —
    per-token md5 bits, majority vote per bit position.

    Plan shape chosen for scale (same rationale as minhash_signatures):
    explode tokens -> one md5 per token -> groupBy(doc_id) with 60
    codegen'd bit-slice sums + a count, then one select folds the
    majority votes back into a long.  Map-side partial aggregation
    collapses each partition to one row per doc before the shuffle and
    everything stays in whole-stage codegen.  (The previous
    implementation ran 60 interpreted ``F.aggregate`` HOF passes over
    the token array per row — the documented HOF-degradation trap.)

    Duplicate tokens vote multiply (standard SimHash). Docs whose text
    is NULL are dropped; empty text hashes the single empty token.
    """
    toks = docs.select(
        F.col("doc_id"),
        F.explode(F.split(_norm_text(F.col(text_col)), " ")).alias("t"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"_b{b}")
        for b in range(SIMHASH_BITS)
    ]
    votes = toks.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sim = sim + F.when(
            F.col(f"_b{b}") * 2 > F.col("n"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_buckets(
    docs: DataFrame, text_col: str = "text", band_bits: int = 15
) -> DataFrame:
    """(doc_id, band, key) LSH rows over the 60-bit simhash; docs within
    Hamming distance ``60/band_bits - 1`` share >= 1 band (pigeonhole;
    3 for the default 15-bit bands)."""
    if SIMHASH_BITS % band_bits != 0:
        # same rationale as minhash_lsh_pairs: a silent remainder would
        # leave the high bits unkeyed AND break the pigeonhole recall
        # guarantee (fewer bands than the caller computed with)
        raise ValueError(
            f"band_bits={band_bits} does not divide {SIMHASH_BITS}"
        )
    sim = simhash_table(docs, text_col)
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * band_bits)
            .bitwiseAND(F.lit((1 << band_bits) - 1))
            .alias("key"),
        )
        for b in range(SIMHASH_BITS // band_bits)
    ]
    return sim.select(
        "doc_id", "simhash", F.explode(F.array(*bands)).alias("bk")
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.85,
    dim: int = 64,
    bands: int = 8,
    bits_per_band: int = 8,
    seed: int = 42,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: banded sign-LSH candidate
    generation + exact-cosine verification.

    The dedup twin of :func:`recordlinker_spark.operators.simsearch.ivf_topk`
    (same Charikar sign-LSH family): each vector is hashed into
    ``bands`` independent buckets of ``bits_per_band`` hyperplane sign
    bits; two vectors are candidates iff they share ANY band bucket
    (OR-of-ANDs, the MinHash-LSH S-curve over angular similarity:
    P(candidate) = 1 - (1 - p^b)^r with p = 1 - theta/pi), and a
    candidate is a near-dup iff its exact cosine >= ``threshold``.

    Scale shape: the exploded (band, bucket) rows carry ONLY ids — the
    self-join shuffles ``bands x |corpus|`` short rows, never the
    vectors; deduped candidate pairs then join the vectors back from
    the corpus scan (2 hash joins on the id, each a fresh columnar
    parquet read at production — cheaper than dragging 2 x dim floats
    through the band shuffle).  Hot buckets (e.g. the all-zeros bucket
    of near-zero vectors) are dropped above ``max_bucket_size``, the
    same |bucket|^2 guard as :func:`minhash_lsh_pairs`.

    Returns (vec_id_l, vec_id_r, cos), vec_id_l < vec_id_r.
    """
    from recordlinker_spark.operators.simsearch import (
        cosine,
        hyperplanes,
        signature_col,
    )

    planes = hyperplanes(dim, bands * bits_per_band, seed)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            signature_col(
                F.col(vec_col),
                planes[b * bits_per_band : (b + 1) * bits_per_band],
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    sig = corpus.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket")
    )
    if max_bucket_size is not None:
        # window-count over the self-join's own key (same trick as
        # minhash_lsh_pairs): the cap, and both join sides below, share
        # ONE (band, bucket) exchange — hyperplane signatures are
        # computed once per query instead of 3x (measured 8s -> ~4s at
        # sf0.1)
        w = Window.partitionBy("band", "bucket")
        sig = (
            sig.withColumn("_n", F.count(F.lit(1)).over(w))
            .filter(F.col("_n") <= max_bucket_size)
            .drop("_n")
        )
    cand = (
        sig.select(F.col(id_col).alias("vec_id_l"), "band", "bucket")
        .join(
            sig.select(F.col(id_col).alias("vec_id_r"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("vec_id_l") < F.col("vec_id_r"))
        .select("vec_id_l", "vec_id_r")
        .dropDuplicates(["vec_id_l", "vec_id_r"])
    )
    vl = corpus.select(F.col(id_col).alias("vec_id_l"), F.col(vec_col).alias("_vl"))
    vr = corpus.select(F.col(id_col).alias("vec_id_r"), F.col(vec_col).alias("_vr"))
    return (
        cand.join(vl, "vec_id_l")
        .join(vr, "vec_id_r")
        .select(
            "vec_id_l",
            "vec_id_r",
            F.round(cosine(F.col("_vl"), F.col("_vr")), 9).alias("cos"),
        )
        .filter(F.col("cos") >= F.lit(threshold))
    )


def neardup_keep_best(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 8,
    seed: int = 42,
    k: int = 5,
    jaccard_threshold: float = 0.7,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-duplicate canonicalization: the end-to-end "dedup and keep
    the best copy" pipeline a training corpus needs, composed from the
    primitives above —

        MinHash-LSH candidates -> exact k-shingle-Jaccard verify
        (>= ``jaccard_threshold``) -> connected components over the
        verified near-dup graph -> keep ONE doc per component.

    Returns one row per input doc: ``(doc_id, component, n_members,
    keep)`` where ``component`` is the numeric-min doc_id of the
    near-dup group (singletons are their own component), ``n_members``
    the group size, and ``keep`` 1 for the elected canonical doc —
    the longest TRIMMED raw text (leading/trailing whitespace ignored,
    inner whitespace counted), ties to the smallest doc_id — else 0.
    Downstream keeps ``filter(keep = 1)`` and drops the rest.

    ``doc_id`` must be a numeric string (or numeric type): ids are
    ranked numerically for the component label and the tie-break.  A
    non-numeric id raises immediately — under non-ANSI configs a
    silent cast-to-NULL would otherwise collapse the whole corpus into
    one component and elect a single keeper (mass data loss).

    Scale shape: candidates are banded + bucket-capped (never
    all-pairs), the verify join is narrow exploded-shingle rows, and
    the component step is the same large-star/small-star iteration the
    linkage path uses (operators/cluster.py) — near-dup components are
    tiny (a handful of copies), so it converges in 1-2 alternations.
    The final election is one window over components, which partitions
    cluster-wide by component id.
    """
    from recordlinker_spark.operators.cluster import connected_components

    # loud on non-numeric ids in EVERY ansi mode: try_cast never
    # throws, so the raise_error branch fires deterministically instead
    # of ANSI-dependent behavior (exception vs silent NULL collapse)
    doc_id_num = F.when(
        F.col("doc_id").isNotNull()
        & F.expr("try_cast(doc_id as long)").isNull(),
        F.raise_error(
            F.concat(
                F.lit(
                    "neardup_keep_best requires numeric doc ids "
                    "(component labels and tie-breaks rank numerically); got: "
                ),
                F.col("doc_id"),
            )
        ).cast("long"),
    ).otherwise(F.expr("try_cast(doc_id as long)"))
    base = docs.select(
        doc_id_num.alias("doc_id"),
        F.coalesce(
            F.length(F.trim(F.col(text_col))), F.lit(0)
        ).alias("_len"),
    )
    # thread k into candidate generation too: mining candidates from
    # 5-shingle MinHash but verifying at k-shingle Jaccard would move
    # the S-curve operating point silently
    cand = minhash_lsh_pairs(
        docs, text_col, num_hashes, bands, seed, max_bucket_size, k
    )
    # materialize the candidate set ONCE (same pattern as the blocking
    # census): the verify stage references its input ~4x (member
    # pruning x2, probe join, zero-overlap left join) with different
    # partitionings, so no exchange is reused and the whole
    # signature+banding pipeline would re-run per reference — measured
    # 3.5x the wall of this entire query at sf0.1.  Banding caps bound
    # the checkpointed size; blocks are reclaimed by the periodic-GC
    # cleaner like every other localCheckpoint here.
    cand = cand.localCheckpoint(eager=True)
    verified = ngram_jaccard_pairs(
        docs, cand, text_col, k, jaccard_threshold,
        materialize_shingles=True,
    )
    # connected_components labels with the LEXICOGRAPHIC min id; zero-pad
    # so that equals the numeric min (doc ids are non-negative longs)
    pad = 20
    edges = verified.select(
        F.lpad(F.col("doc_id_l").cast("string"), pad, "0").alias("src"),
        F.lpad(F.col("doc_id_r").cast("string"), pad, "0").alias("dst"),
    )
    # try_cast here: for non-numeric ids the padded label strings can't
    # cast back, and under ANSI a bare cast would race the raise_error
    # guard in `base` with a less actionable CAST_INVALID_INPUT — keep
    # that guard the single deterministic failure path
    labels = connected_components(edges).select(
        F.expr("try_cast(record_id as long)").alias("doc_id"),
        F.expr("try_cast(component as long)").alias("_comp"),
    )
    labeled = base.join(labels, "doc_id", "left").withColumn(
        "component", F.coalesce(F.col("_comp"), F.col("doc_id"))
    )
    w = Window.partitionBy("component")
    wr = w.orderBy(F.col("_len").desc(), F.col("doc_id").asc())
    return (
        labeled.withColumn("n_members", F.count(F.lit(1)).over(w))
        .withColumn(
            "keep", (F.row_number().over(wr) == 1).cast("int")
        )
        .select("doc_id", "component", "n_members", "keep")
    )
