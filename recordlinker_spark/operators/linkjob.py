"""The batch link job: §3.1 of the survey, set-at-a-time.

Re-expresses the reference's ``link_record_against_mpi``
(reference: src/recordlinker/linking/link.py:184-381) as one Spark
job over a whole batch of incoming records against an MPI table:

    documents -> pii records -> [skip-scrub] -> features/blocking keys
      -> per pass: candidate pairs (J1-J4) -> pair scores (C1-C4)
         -> cluster medians/RMS/grade (A1-A3)
      -> cross-pass fold (A4) -> decision (A5) -> MPI update

Faithful asymmetries preserved from the reference:

* blocking keys for the incoming side come from the skip-CLEANED
  record (link.py:224), the MPI side's from the RAW record as stored
  at insert time (mpi_service.py:183-221,314-350);
* scoring features for the incoming side come from the RAW record
  (link.py:260-267 passes ``record``, not ``cleaned_record``), the MPI
  side's from the CLEANED record (link.py:245-247);
* patients with a ``possible`` final grade persist with a NULL
  person_id (pending review) and are invisible to future blocking
  (link.py:325-341 leaves matched_person None).

Batch semantics: every record in the incoming batch is linked against
the *pre-existing* MPI (order-independent within the batch), matching
the reference's micro-batch deployment. For reference-exact sequential
semantics on small fixtures see plans/replay.py.
"""

from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recordlinker_spark.config import Algorithm
from recordlinker_spark.functions.features import (
    blocking_key_columns,
    feature_columns,
)
from recordlinker_spark.operators.blocking import candidate_pairs
from recordlinker_spark.operators.decide import cluster_scores  # noqa: F401 (re-export)
from recordlinker_spark.operators.decide import decide, fold_passes
from recordlinker_spark.operators.scoring import (
    attach_pair_features,
    feature_col,
    score_pairs,
)
from recordlinker_spark.operators.skipvalues import remove_skip_values

PII_COLS = [
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


@dataclasses.dataclass
class LinkOutput:
    decisions: DataFrame  # record_id, final_grade, person_id, best_rms, matching_pass_label
    results: DataFrame  # reported LinkResults (certain/possible clusters)
    new_patients: DataFrame  # incoming records with assigned person_id + spans
    pair_scores: DataFrame | None = None  # per-pass scored pairs (debug/tuning)
    cached: list = dataclasses.field(default_factory=list, repr=False)

    def unpersist(self) -> None:
        """Release the projections link_batch cached for this call.
        Callers that invoke link_batch in a loop (replay harness) MUST
        call this after consuming the outputs, or cached frames
        accumulate in the block manager across iterations."""
        for df in self.cached:
            df.unpersist()
        self.cached.clear()

    # context-manager form: ``with link_batch(...) as out`` releases
    # the cached projections even when consuming an output raises —
    # loop callers (replay, the streaming sink) previously leaked
    # cached MPI-sized frames on any exception between link_batch and
    # the explicit unpersist()
    def __enter__(self) -> "LinkOutput":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.unpersist()


def _identifier_types(algorithm: Algorithm) -> list[str]:
    return sorted(
        {
            e.suffix
            for p in algorithm.passes
            for e in p.evaluators
            if e.suffix is not None
        }
    )


def _all_blocking_keys(algorithm: Algorithm) -> list[str]:
    seen: list[str] = []
    for p in algorithm.passes:
        for k in p.blocking_keys:
            if k not in seen:
                seen.append(k)
    return seen


def prepare_incoming(records: DataFrame, algorithm: Algorithm) -> tuple[DataFrame, DataFrame]:
    """(scoring features from RAW record, blocking keys from CLEANED record)."""
    id_types = _identifier_types(algorithm)
    keys = _all_blocking_keys(algorithm)
    feats_raw = feature_columns(records.select(*PII_COLS), id_types)
    cleaned = remove_skip_values(records.select(*PII_COLS), algorithm.context.skip_values)
    bk_cleaned = blocking_key_columns(feature_columns(cleaned), keys).select(
        "record_id", *[f"bk_{k}" for k in keys]
    )
    return feats_raw, bk_cleaned


def prepare_mpi(patients: DataFrame, algorithm: Algorithm) -> tuple[DataFrame, DataFrame]:
    """(scoring features from CLEANED record, blocking keys from RAW record).

    :param patients: pii columns + ``person_id``.
    """
    id_types = _identifier_types(algorithm)
    keys = _all_blocking_keys(algorithm)
    linkable = patients.filter(F.col("person_id").isNotNull())
    cleaned = remove_skip_values(
        linkable.select(*PII_COLS, "person_id"), algorithm.context.skip_values
    )
    feats_cleaned = feature_columns(cleaned.select(*PII_COLS), id_types)
    bk_raw = blocking_key_columns(
        feature_columns(linkable.select(*PII_COLS)), keys
    ).select("record_id", *[f"bk_{k}" for k in keys])
    return feats_cleaned, bk_raw.join(
        linkable.select("record_id", "person_id"), "record_id"
    )


def link_batch(
    incoming: DataFrame,
    mpi_patients: DataFrame,
    algorithm: Algorithm,
    keep_pair_scores: bool = False,
    cache_intermediate: bool = False,
    cache_feats: bool = True,
    **block_kwargs,
) -> LinkOutput:
    """Link a batch of incoming PII records against the MPI.

    :param incoming: output of sources.ingest.parse_documents (pii
        columns + untouched ``spans``).
    :param mpi_patients: pii columns + ``person_id`` (NULL = pending
        review, excluded from blocking).
    """
    inc_feats, inc_bk = prepare_incoming(incoming, algorithm)
    mpi_feats, mpi_bk = prepare_mpi(mpi_patients, algorithm)
    cached: list = []
    if len(algorithm.passes) > 1 or cache_intermediate:
        # every pass re-joins these projections; without a cache each
        # pass would re-run span parsing + feature extraction over the
        # whole MPI (the widest scan in the job)
        inc_bk = inc_bk.cache()
        mpi_bk = mpi_bk.cache()
        cached += [inc_bk, mpi_bk]
        warm_list = [mpi_bk, inc_bk]
        if cache_feats:
            # feats caching is a trade: it avoids re-extracting features
            # per pass but pays a wide-array materialization barrier up
            # front; with parsed records already cached, recomputing the
            # (pure-expression) extraction inside the join pipeline can
            # be cheaper — callers with expensive upstream sources keep
            # the default
            inc_feats = inc_feats.cache()
            mpi_feats = mpi_feats.cache()
            cached += [inc_feats, mpi_feats]
            warm_list += [mpi_feats, inc_feats]
        # materialize the cached projections BEFORE the pass threads
        # fork: concurrent first-touch of an unmaterialized cache makes
        # every branch compute all partitions (in-flight cache work
        # doesn't dedupe), duplicating the widest scans of the job
        # exactly when parallelism is highest.  The counts are
        # independent jobs submitted from threads, so the warm-up
        # itself uses the whole cluster; the known MPI count then
        # spares blocked_persons a counting pass per pass.
        import concurrent.futures as _cf

        with _cf.ThreadPoolExecutor(max_workers=4) as warm:
            counts = list(warm.map(lambda df: df.count(), warm_list))
        block_kwargs.setdefault("mpi_count", counts[0])
        block_kwargs.setdefault("probe_count", counts[1])

        # fuse every pass's present-key subset discovery into ONE
        # driver job over the (just warmed) cached keys: each pass
        # would otherwise pay its own distinct+collect round-trip —
        # fixed, non-scaling driver latency x |passes|
        from recordlinker_spark.operators.blocking import missingness_filter

        if "subsets_by_pass" not in block_kwargs:
            sub_frame = None
            for i, p in enumerate(algorithm.passes):
                mf = missingness_filter(inc_bk, algorithm, p).select(
                    F.lit(i).alias("_p"), "_subset"
                ).distinct()
                sub_frame = mf if sub_frame is None else sub_frame.unionByName(mf)
            subsets_by_pass: dict[int, list] = {
                i: [] for i in range(len(algorithm.passes))
            }
            for r in sub_frame.collect():
                if r["_subset"]:
                    subsets_by_pass[r["_p"]].append(tuple(r["_subset"].split(",")))
            for i in subsets_by_pass:
                subsets_by_pass[i].sort()
            block_kwargs["subsets_by_pass"] = subsets_by_pass

    subsets_by_pass = block_kwargs.pop("subsets_by_pass", None)
    pass_index = {id(p): i for i, p in enumerate(algorithm.passes)}

    def build_pass(algorithm_pass):
        kw = dict(block_kwargs)
        if subsets_by_pass is not None:
            kw["subsets"] = subsets_by_pass[pass_index[id(algorithm_pass)]]
        pairs = candidate_pairs(
            inc_bk, mpi_bk, algorithm, algorithm_pass, **kw
        )
        with_feats = attach_pair_features(pairs, inc_feats, mpi_feats, algorithm_pass)
        scored = score_pairs(with_feats, algorithm, algorithm_pass)
        if cache_intermediate:
            # one blocking+scoring computation shared by the cluster
            # aggregation and any pair_scores consumer
            scored = scored.cache()
            cached.append(scored)
        return scored

    # passes are independent until the fold; their driver-side actions
    # (subset collect, skew census) are small serial jobs, so submit
    # them from concurrent threads — Spark schedules the jobs in
    # parallel and one pass's scoring overlaps the other's blocking.
    # (A merged all-pass blocking plan with a cache barrier was
    # measured SLOWER at 4N executors: the barrier serializes blocking
    # against scoring and costs more than the saved stages.)
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
        scored_per_pass = list(pool.map(build_pass, algorithm.passes))

    per_pass: list[DataFrame] = []
    all_scored: DataFrame | None = None
    for algorithm_pass, scored in zip(algorithm.passes, scored_per_pass):
        if keep_pair_scores:
            labeled = scored.withColumn(
                "pass_label", F.lit(algorithm_pass.resolved_label)
            )
            sel = labeled.select(
                "record_id_l", "person_id", "record_id_r", "pass_label", "score"
            )
            all_scored = sel if all_scored is None else all_scored.unionByName(sel)
        per_pass.append(cluster_scores(scored, algorithm, algorithm_pass))

    folded = fold_passes(per_pass)
    decisions, results = decide(
        folded, incoming, algorithm.context.include_multiple_matches
    )
    # decisions is ONE narrow row per incoming record, yet every other
    # output hangs off it — without this cache a caller consuming
    # decisions and then new_patients (the streaming sink and job_link
    # both do, per micro-batch/run) re-executes the entire
    # blocking+scoring+fold+decide pipeline for the second action.
    # Caching the tiny end frame costs one materialization of rows the
    # first action computes anyway.
    decisions = decisions.cache()
    cached.append(decisions)

    new_patients = incoming.join(
        decisions.select("record_id", "person_id"), "record_id"
    )
    return LinkOutput(
        decisions=decisions,
        results=results,
        new_patients=new_patients,
        pair_scores=all_scored,
        cached=cached,
    )
