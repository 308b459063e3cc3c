"""recordlinker_spark — a PySpark-native probabilistic record-linkage engine.

A from-scratch re-expression of the semantics of CDCgov/RecordLinker
(blocking -> pairwise log-odds scoring -> transitive clustering) as a
scalable batch pipeline over span-document tables:

    documents --ingest--> pii records --features--> blocking keys
        --blocking join--> candidate pairs --scoring--> graded pairs
        --connected components--> person clusters

See SURVEY.md for the full operator inventory and reference citations.
"""

from recordlinker_spark.config import Algorithm, AlgorithmPass, Evaluator, dibbs_default

__all__ = ["Algorithm", "AlgorithmPass", "Evaluator", "dibbs_default"]
