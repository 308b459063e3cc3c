"""Algorithm configuration for the Spark linkage engine.

Plain dataclasses mirroring the validated semantics of the reference's
algorithm schema (reference: src/recordlinker/schemas/algorithm.py:19-304).
Configuration is data, not a distributed table: instances are built on the
driver and closed over by column builders / broadcast into pandas UDFs.

``DIBBS_DEFAULT`` reproduces the reference's shipped two-pass algorithm
with its trained log-odds weights (reference:
src/recordlinker/assets/testing_algorithms.json:8-105).
"""

from __future__ import annotations

import dataclasses
import typing

BLOCKING_VALUE_MAX_LENGTH = 20  # reference: src/recordlinker/models/mpi.py:14

# Blocking key ids, reference: src/recordlinker/models/mpi.py:57-104
BLOCKING_KEY_IDS: dict[str, int] = {
    "BIRTHDATE": 1,
    "SEX": 3,
    "ZIP": 4,
    "FIRST_NAME": 5,
    "LAST_NAME": 6,
    "ADDRESS": 7,
    "PHONE": 8,
    "EMAIL": 9,
    "IDENTIFIER": 10,
}

SIMILARITY_MEASURES = ("JaroWinkler", "Levenshtein", "DamerauLevenshtein")

FUNC_EXACT = "COMPARE_PROBABILISTIC_EXACT_MATCH"
FUNC_FUZZY = "COMPARE_PROBABILISTIC_FUZZY_MATCH"


@dataclasses.dataclass(frozen=True)
class Evaluator:
    """One per-feature comparator in a pass (reference algorithm.py:19-52).

    ``feature`` may carry an identifier-type suffix, e.g. ``IDENTIFIER:SS``.
    """

    feature: str
    func: str = FUNC_FUZZY
    fuzzy_match_threshold: float | None = None
    fuzzy_match_measure: str | None = None

    @property
    def attribute(self) -> str:
        return self.feature.split(":", 1)[0]

    @property
    def suffix(self) -> str | None:
        parts = self.feature.split(":", 1)
        return parts[1] if len(parts) > 1 else None


@dataclasses.dataclass(frozen=True)
class AlgorithmPass:
    """One blocking+evaluation pass (reference algorithm.py:199-266)."""

    blocking_keys: tuple[str, ...]
    evaluators: tuple[Evaluator, ...]
    possible_match_window: tuple[float, float]  # (minimum, certain) thresholds
    label: str | None = None

    @property
    def resolved_label(self) -> str:
        if self.label:
            return self.label
        blocks = ["BLOCK"] + [b.lower() for b in self.blocking_keys]
        matches = ["MATCH"] + [e.feature.lower() for e in self.evaluators]
        return "_".join(blocks + matches)


@dataclasses.dataclass(frozen=True)
class SkipValue:
    """Placeholder-value scrub rule (reference algorithm.py:83-105)."""

    feature: str  # a feature string or '*'
    values: tuple[str, ...]


@dataclasses.dataclass(frozen=True)
class AlgorithmContext:
    """Shared algorithm context (reference algorithm.py:108-196)."""

    log_odds: dict[str, float] = dataclasses.field(default_factory=dict)
    skip_values: tuple[SkipValue, ...] = ()
    include_multiple_matches: bool = True
    fuzzy_match_threshold: float = 0.9
    fuzzy_match_measure: str = "JaroWinkler"
    max_missing_allowed_proportion: float = 0.5
    missing_field_points_proportion: float = 0.5

    def get_log_odds(self, feature: str) -> float | None:
        """Lookup with identifier-suffix fallback (reference
        schemas/algorithm.py:184-196): ``IDENTIFIER:SS`` falls back to
        ``IDENTIFIER`` when unset.  Reference-exact falsy semantics: a
        0.0-mapped candidate does not short-circuit the fallback walk,
        but IS returned when it is the last candidate — so a feature
        explicitly configured with weight 0.0 counts as DEFINED (the
        validator accepts it) while an absent one returns None."""
        result = None
        for key in _values_to_match(feature):
            result = self.log_odds.get(key)
            if result:
                break
        return result


def _values_to_match(feature: str) -> typing.Iterator[str]:
    yield feature
    if ":" in feature:
        yield feature.split(":", 1)[0]


@dataclasses.dataclass(frozen=True)
class Algorithm:
    label: str
    passes: tuple[AlgorithmPass, ...]
    context: AlgorithmContext = dataclasses.field(default_factory=AlgorithmContext)

    def max_points(self, algorithm_pass: AlgorithmPass) -> float:
        """Max possible log-odds points for a pass (reference link.py:230-232)."""
        return sum(
            self.context.get_log_odds(e.feature) or 0.0
            for e in algorithm_pass.evaluators
        )


def dibbs_default() -> Algorithm:
    """The reference's shipped dibbs-default algorithm config
    (src/recordlinker/assets/testing_algorithms.json:8-105)."""
    context = AlgorithmContext(
        include_multiple_matches=True,
        log_odds={
            "ADDRESS": 8.438284928858774,
            "BIRTHDATE": 10.126641103800338,
            "CITY": 2.438553006137189,
            "FIRST_NAME": 6.849475906891162,
            "LAST_NAME": 6.350720397426025,
            "IDENTIFIER": 0.3051262572525359,
            "SEX": 0.7510419059643679,
            "STATE": 0.022376768992488694,
            "ZIP": 4.975031471124867,
        },
        skip_values=(
            SkipValue("FIRST_NAME", ("Anon", "Anonymous")),
            SkipValue("LAST_NAME", ("Anon", "Anonymous")),
            SkipValue("NAME", ("John Doe", "Jane Doe", "Baby Boy", "Baby Girl")),
            SkipValue("*", ("Unk", "Unknown")),
        ),
        fuzzy_match_threshold=0.9,
        fuzzy_match_measure="JaroWinkler",
        max_missing_allowed_proportion=0.5,
        missing_field_points_proportion=0.5,
    )
    passes = (
        AlgorithmPass(
            label="BLOCK_birthdate_identifier_sex_MATCH_first_name_last_name",
            blocking_keys=("BIRTHDATE", "IDENTIFIER", "SEX"),
            evaluators=(
                Evaluator("FIRST_NAME", FUNC_FUZZY),
                Evaluator("LAST_NAME", FUNC_FUZZY),
            ),
            possible_match_window=(0.8, 0.925),
        ),
        AlgorithmPass(
            label="BLOCK_zip_first_name_last_name_sex_MATCH_address_birthdate",
            blocking_keys=("ZIP", "FIRST_NAME", "LAST_NAME", "SEX"),
            evaluators=(
                Evaluator("ADDRESS", FUNC_FUZZY),
                Evaluator("BIRTHDATE", FUNC_FUZZY, fuzzy_match_threshold=0.95),
            ),
            possible_match_window=(0.815, 0.915),
        ),
    )
    return Algorithm(label="dibbs-default", passes=passes, context=context)
