"""Log-odds + RMS-window tuning as one Spark job (J5/J6, A6-A8).

Re-expresses the reference's tuning subsystem (reference:
src/recordlinker/tuning/base.py:25-224, tuning/prob_calc.py,
database/mpi_service.py:577-694) set-at-a-time:

* J5 true-match sampling: self-join on ``person_id`` with
  ``id_l < id_r``, random order (seeded), LIMIT n
  (mpi_service.py:577-614).
* J6 non-match sampling: random id sample, adjacent random pairing,
  keep pairs from different non-null persons, dedup; Birthday-problem
  guard on the requested pair count (mpi_service.py:617-694).
* A6 class probabilities: per feature, Laplace-smoothed mean of exact
  cross-value agreement (missing counts 0, FIRST_NAME without suffix
  prepending) — ``(1 + sum(agree)) / (count + 1)``
  (prob_calc.py:21-52).
* A7 log-odds = ln(m/u) (prob_calc.py:55-72).
* A8 RMS-window estimation: pair RMS per pass under the NEW odds (both
  records skip-cleaned, same missingness gate as linking), then MMT =
  first non-match score >= min positive true score, minus 0.025 buffer
  (clamped at 0); CMT = first true score > max non-match, plus 0.025
  (clamped at 1); documented edge-case fallbacks (prob_calc.py:125-187).

Everything distributed except A8's final boundary walk, which runs on
the two collected score lists (size = n_pairs, driver-trivial).
"""

from __future__ import annotations

import dataclasses
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from recordlinker_spark.config import Algorithm, AlgorithmContext
from recordlinker_spark.functions.features import feature_columns
from recordlinker_spark.operators.scoring import (
    evaluator_score,
    feature_col,
    gated_total,
)
from recordlinker_spark.operators.skipvalues import remove_skip_values

# reference prob_calc.py:14-18
FIELDS_TO_CALCULATE = [
    "BIRTHDATE",
    "SEX",
    "ADDRESS",
    "CITY",
    "STATE",
    "ZIP",
    "FIRST_NAME",
    "LAST_NAME",
    "RACE",
    "TELECOM",
    "PHONE",
    "EMAIL",
    "COUNTY",
    "IDENTIFIER",
]


@dataclasses.dataclass
class TuningResult:
    log_odds: dict[str, float]
    bounds: dict[str, tuple[float, float]]  # pass label -> (mmt, cmt)
    true_pairs: int
    non_pairs: int


def _tuning_feats(patients: DataFrame) -> DataFrame:
    """Features for the exact-agreement probe (suffix prepending OFF)."""
    cols = [
        "record_id",
        "external_id",
        "birth_date",
        "sex",
        "name",
        "address",
        "telecom",
        "race",
        "identifiers",
    ]
    return feature_columns(
        patients.select(*cols), prepend_suffix=False
    ).join(patients.select("record_id", "person_id"), "record_id")


def sample_true_match_pairs(
    patients: DataFrame,
    n_pairs: int,
    seed: int = 42,
    max_pairs_per_record: int | None = 64,
) -> DataFrame:
    """J5: (record_id_l, record_id_r) same-cluster pairs, seeded random.

    Matches the reference's SQL semantics (same-cluster self-join,
    ORDER BY random() LIMIT n, mpi_service.py:577-614) with one
    scale guard the reference's single-node SQL doesn't need: a
    mega-cluster of C patients would materialize C^2/2 pairs before
    the sample, so each left record keeps at most
    ``max_pairs_per_record`` partners (deterministic md5 order) —
    a cluster then contributes O(C * cap) rows, and the final
    seeded sample runs as a per-partition top-n (TakeOrdered), not a
    global sort.  For clusters smaller than the cap (every shipped
    corpus) the candidate set — hence the sample distribution — is
    identical to the reference's."""
    left = patients.select(
        F.col("record_id").alias("record_id_l"), "person_id"
    ).filter(F.col("person_id").isNotNull())
    right = patients.select(
        F.col("record_id").alias("record_id_r"), "person_id"
    ).filter(F.col("person_id").isNotNull())
    pairs = left.join(right, "person_id").filter(
        F.col("record_id_l") < F.col("record_id_r")
    )
    if max_pairs_per_record is not None:
        w = Window.partitionBy("record_id_l").orderBy(
            F.md5(F.concat_ws("\x1f", "record_id_l", "record_id_r", F.lit(seed)))
        )
        pairs = (
            pairs.withColumn("_pp", F.row_number().over(w))
            .filter(F.col("_pp") <= max_pairs_per_record)
            .drop("_pp")
        )
    return (
        pairs.orderBy(F.rand(seed))
        .limit(n_pairs)
        .select("record_id_l", "record_id_r")
    )


def sample_non_match_pairs(
    patients: DataFrame, sample_size: int, n_pairs: int, seed: int = 42
) -> DataFrame:
    """J6: cross-cluster pairs via adjacent pairing of a shuffled sample."""
    if sample_size <= 1:
        raise ValueError("Cannot sample from a single database point")
    # Birthday-problem guard (mpi_service.py:645-654)
    taylor = math.exp(
        (-1.0 * n_pairs * (n_pairs - 1.0)) / (sample_size * (sample_size - 1.0))
    )
    if 1.0 - taylor >= 0.5:
        raise ValueError("Too many pairs requested for sample size")

    # The row_number window below is deliberately unpartitioned: the
    # frame it runs over is already LIMIT'd to sample_size rows, so the
    # single-partition sort is bounded by construction.  Guard the
    # construction so a future caller can't silently funnel an
    # unbounded frame through one partition.
    if sample_size > 1_000_000:
        raise ValueError(
            "sample_size > 1e6 would sort the whole sample in one "
            "partition; shard the sampling or raise the guard consciously"
        )
    sampled = (
        patients.select("record_id", "person_id")
        .filter(F.col("person_id").isNotNull())
        .orderBy(F.rand(seed))
        .limit(sample_size)
        .withColumn("_rn", F.row_number().over(Window.orderBy(F.rand(seed + 1))))
    )
    left = sampled.select(
        F.col("record_id").alias("record_id_l"),
        F.col("person_id").alias("person_l"),
        "_rn",
    )
    right = sampled.select(
        F.col("record_id").alias("record_id_r"),
        F.col("person_id").alias("person_r"),
        (F.col("_rn") - 1).alias("_rn"),
    )
    pairs = (
        left.join(right, "_rn")
        .filter(F.col("person_l") != F.col("person_r"))
        .select(
            F.least("record_id_l", "record_id_r").alias("record_id_l"),
            F.greatest("record_id_l", "record_id_r").alias("record_id_r"),
        )
        .dropDuplicates(["record_id_l", "record_id_r"])
    )
    return pairs.limit(n_pairs)


def _attach(pairs: DataFrame, feats: DataFrame, features: list[str]) -> DataFrame:
    l = feats.select(
        F.col("record_id").alias("record_id_l"),
        *[F.col(feature_col(f)).alias("fl_" + f.replace(":", "_")) for f in features],
    )
    r = feats.select(
        F.col("record_id").alias("record_id_r"),
        *[F.col(feature_col(f)).alias("fr_" + f.replace(":", "_")) for f in features],
    )
    return pairs.join(l, "record_id_l").join(r, "record_id_r")


def exact_agreement_expr(feature: str):
    """1.0 iff BOTH sides have a value for ``feature`` and any value
    agrees exactly, else 0.0 — the single construction site for the
    class-probability agreement semantics (class_probs here and the
    oracle-gated demo query both consume it, so they cannot drift)."""
    key = feature.replace(":", "_")
    l, r = F.col("fl_" + key), F.col("fr_" + key)
    return F.when(
        (F.coalesce(F.size(l), F.lit(0)) > 0)
        & (F.coalesce(F.size(r), F.lit(0)) > 0)
        & F.arrays_overlap(l, r),
        1.0,
    ).otherwise(0.0)


def class_probs(pairs_with_feats: DataFrame) -> tuple[dict[str, float], int]:
    """A6: Laplace-smoothed exact-agreement rate per feature.

    Returns ``(probs_by_feature, pair_count)``."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for f in FIELDS_TO_CALCULATE:
        aggs.append(F.sum(exact_agreement_expr(f)).alias(f))
    row = pairs_with_feats.agg(*aggs).collect()[0]
    n = row["_n"]
    if n == 0:
        # F.sum over zero rows is NULL; without this the caller gets a
        # bare TypeError.  An empty pair frame means the sampler found
        # no usable pairs (e.g. the shuffled sample landed entirely in
        # one person cluster) — say so.
        raise ValueError(
            "no pairs to compute class probabilities from (the sample "
            "produced zero usable pairs; corpus cluster structure may "
            "be degenerate)"
        )
    return {f: (1.0 + row[f]) / (n + 1.0) for f in FIELDS_TO_CALCULATE}, n


def calculate_log_odds(
    m_probs: dict[str, float], u_probs: dict[str, float]
) -> dict[str, float]:
    """A7 (prob_calc.py:55-72)."""
    return {f: math.log(m_probs[f] / u_probs[f]) for f in m_probs}


def pair_rms_scores(
    pairs: DataFrame,
    cleaned_feats: DataFrame,
    algorithm: Algorithm,
    log_odds: dict[str, float],
) -> dict[str, list[float]]:
    """RMS per pass for each pair under the provided odds
    (prob_calc.py:190-276); returns pass label -> sorted scores."""
    tuned = dataclasses.replace(
        algorithm,
        context=dataclasses.replace(algorithm.context, log_odds=dict(log_odds)),
    )
    feats_needed = sorted(
        {e.feature for p in algorithm.passes for e in p.evaluators}
    )
    with_feats = _attach(pairs, cleaned_feats, feats_needed)

    out_cols = []
    for p in tuned.passes:
        max_points = tuned.max_points(p)
        scores, missing_terms = [], []
        for ev in p.evaluators:
            key = ev.feature.replace(":", "_")
            s, m = evaluator_score(ev, tuned, F.col("fl_" + key), F.col("fr_" + key))
            scores.append(s)
            lo = tuned.context.get_log_odds(ev.feature) or 0.0
            missing_terms.append(F.when(m, F.lit(lo)).otherwise(F.lit(0.0)))
        gated = gated_total(scores, missing_terms, tuned.context, max_points)
        rms = gated / F.lit(max_points) if max_points else F.lit(0.0)
        out_cols.append(rms.alias(f"rms_{p.resolved_label}"))

    rows = with_feats.select(*out_cols).collect()
    return {
        p.resolved_label: sorted(r[f"rms_{p.resolved_label}"] for r in rows)
        for p in tuned.passes
    }


def estimate_rms_bounds(
    true_scores: dict[str, list[float]], non_scores: dict[str, list[float]]
) -> dict[str, tuple[float, float]]:
    """A8 (prob_calc.py:125-187) — verbatim boundary-walk semantics."""
    bounds: dict[str, tuple[float, float]] = {}
    for key in true_scores:
        trues = [x for x in true_scores[key] if x > 0.0]
        nons = non_scores[key]
        mmt = None
        cmt = None
        for t in nons:
            if trues and t >= trues[0]:
                mmt = t
                break
        for t in trues:
            if nons and t > nons[-1]:
                cmt = t
                break
        if mmt is not None:
            mmt = max([0, mmt - 0.025])
        if cmt is not None:
            cmt = min([1.0, cmt + 0.025])
        if mmt is None:
            mmt = nons[-1] if nons else 0.0
        if cmt is None:
            cmt = min([(nons[-1] if nons else 0.99) + 0.01, 1.0])
        bounds[key] = (mmt, cmt)
    return bounds


def check_mpi_non_empty(patients: DataFrame) -> bool:
    """True when the MPI holds NO patients (mpi_service.py:550-555)."""
    return patients.limit(1).count() == 0


def check_cluster_structure(
    patients: DataFrame, persons: DataFrame | None = None
) -> tuple[bool, int]:
    """(acceptable, n_person_clusters): tuning needs >1 cluster and at
    least one cluster of size >1 (mpi_service.py:558-574 — equal
    patient and person counts means every cluster is a singleton).

    The reference counts Person-TABLE rows (mpi_service.py:564-568),
    which includes persons with zero patients; pass the persons
    registry to match that exactly.  Without one this falls back to
    ``countDistinct(person_id)`` over patients — identical unless
    empty person clusters exist (deliberate, documented deviation)."""
    row = (
        patients.filter(F.col("person_id").isNotNull())
        .agg(
            F.count(F.lit(1)).alias("n_patients"),
            F.countDistinct("person_id").alias("n_persons"),
        )
        .collect()[0]
    )
    n_persons = row["n_persons"]
    if persons is not None:
        n_persons = persons.select("person_id").distinct().count()
    acceptable = (row["n_patients"] != n_persons) and n_persons > 1
    return acceptable, n_persons


def tune(
    patients: DataFrame,
    algorithm: Algorithm,
    n_true_pairs: int = 1000,
    n_non_pairs: int = 1000,
    sample_size: int = 100000,
    seed: int = 42,
    enforce_minimums: bool = True,
) -> TuningResult:
    """The full tuning job (tuning/base.py:129-224): sample -> class
    probs -> log-odds -> re-sample scores -> RMS windows.

    Pre-flight guards mirror tuning/base.py:39-91: minimum request
    sizes, a non-empty MPI, and an acceptable cluster structure.
    ``enforce_minimums=False`` relaxes only the request-size floors
    (for small test corpora); the structural guards always run.

    :param patients: pii columns + ``person_id`` cluster labels.
    """
    if enforce_minimums:
        if n_true_pairs < 1000:
            raise ValueError(
                "Too few true match pairs requested: minimum permitted "
                f"1000, {n_true_pairs} requested"
            )
        if sample_size < 10000:
            raise ValueError(
                "Too few non match samples requested: minimum permitted "
                f"10000, {sample_size} requested"
            )
        if n_non_pairs < 1000:
            raise ValueError(
                "Too few non match pairs requested: minimum permitted "
                f"1000, {n_non_pairs} requested"
            )
    if check_mpi_non_empty(patients):
        raise ValueError("MPI contains no patient data")
    acceptable, n_persons = check_cluster_structure(patients)
    if not acceptable:
        raise ValueError(
            "MPI has person structure that does not support tuning: must "
            "have num_person_clusters greater than 1 and less than "
            f"num_patients, have {n_persons}"
        )

    raw_feats = _tuning_feats(patients).cache()
    cached = [raw_feats]
    try:
        # the birthday-problem guard must see the USABLE population:
        # the sampler drops NULL-person rows, so counting raw rows
        # would validate an inflated sample size (and silently
        # under-deliver pairs) on corpora with many pending-review
        # patients
        usable = raw_feats.filter(F.col("person_id").isNotNull()).count()

        true_pairs = sample_true_match_pairs(
            raw_feats, n_true_pairs, seed
        ).cache()
        cached.append(true_pairs)
        non_pairs = sample_non_match_pairs(
            raw_feats, min(sample_size, usable), n_non_pairs, seed
        ).cache()
        cached.append(non_pairs)

        m_probs, n_true = class_probs(
            _attach(true_pairs, raw_feats, FIELDS_TO_CALCULATE)
        )
        u_probs, n_non = class_probs(
            _attach(non_pairs, raw_feats, FIELDS_TO_CALCULATE)
        )
        odds = calculate_log_odds(m_probs, u_probs)

        # A8 scores both records skip-CLEANED (prob_calc.py:264-268)
        cols = [
            "record_id",
            "external_id",
            "birth_date",
            "sex",
            "name",
            "address",
            "telecom",
            "race",
            "identifiers",
        ]
        cleaned = remove_skip_values(
            patients.select(*cols), algorithm.context.skip_values
        )
        id_types = sorted(
            {
                e.suffix
                for p in algorithm.passes
                for e in p.evaluators
                if e.suffix is not None
            }
        )
        cleaned_feats = feature_columns(cleaned, id_types).cache()
        cached.append(cleaned_feats)
        true_scores = pair_rms_scores(true_pairs, cleaned_feats, algorithm, odds)
        non_scores = pair_rms_scores(non_pairs, cleaned_feats, algorithm, odds)
        bounds = estimate_rms_bounds(true_scores, non_scores)
        return TuningResult(
            log_odds=odds, bounds=bounds, true_pairs=n_true, non_pairs=n_non
        )
    finally:
        # estimate_rms_bounds drains both score frames driver-side, so
        # nothing downstream re-reads the caches — release them (a
        # long-lived driver invoking tune() repeatedly would otherwise
        # pin four plans per run in executor storage)
        for df in cached:
            df.unpersist()
