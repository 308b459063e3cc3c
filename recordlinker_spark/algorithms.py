"""Algorithm JSON loading + validation.

Parses the reference's algorithm-configuration JSON format (the shape
shipped in ``src/recordlinker/assets/testing_algorithms.json`` and
accepted by its algorithm CRUD routes) into :class:`config.Algorithm`,
enforcing the same validation rules as the reference's pydantic models
(reference: src/recordlinker/schemas/algorithm.py:19-304 and
schemas/pii.py:69-131):

* feature strings must name a valid PII attribute; an identifier-type
  suffix (``IDENTIFIER:SS``) is allowed only on IDENTIFIER and must be
  a known HL7 identifier-type code (schemas/identifier.py);
* evaluator func must be one of the two probabilistic comparators;
* fuzzy thresholds / proportions bounded to [0, 1], log-odds >= 0;
* possible_match_window lower bound <= upper bound
  (algorithm.py:258-266);
* labels match ``^[A-Za-z0-9]+(?:[_-][A-Za-z0-9]+)*$`` (max 255) and
  pass labels are unique after default-label resolution
  (algorithm.py:269-278);
* log-odds must be defined for every blocking key and evaluator
  feature (algorithm.py:280-292), using the reference's exact lookup
  semantics (suffix fallback, falsy-continue — algorithm.py:185-196).

Configuration is driver-side data; nothing here touches Spark.
"""

from __future__ import annotations

import json
import math
import re

from recordlinker_spark.config import (
    BLOCKING_KEY_IDS,
    FUNC_EXACT,
    FUNC_FUZZY,
    SIMILARITY_MEASURES,
    Algorithm,
    AlgorithmContext,
    AlgorithmPass,
    Evaluator,
    SkipValue,
)

# reference: src/recordlinker/schemas/pii.py:27-49 (FeatureAttribute)
FEATURE_ATTRIBUTES = (
    "BIRTHDATE", "SEX", "GIVEN_NAME", "FIRST_NAME", "LAST_NAME", "NAME",
    "ADDRESS", "CITY", "STATE", "ZIP", "RACE", "TELECOM", "PHONE",
    "EMAIL", "SUFFIX", "COUNTY", "IDENTIFIER",
)

# reference: src/recordlinker/schemas/identifier.py:7-150 (HL7 v2
# identifier-type codes; semantic constants required for parity)
IDENTIFIER_TYPES = frozenset(
    "AC ACSN AIN AM AMA AN ANC AND ANON ANT APRN ASID BA BC BCFN BCT BR BRN "
    "BSNR CAII CC CONM CY CZ DC DCFN DDS DEA DFN DI DL DN DO DP DPM DR DS "
    "DSG EI EN ESN FDR FDRFN FGN FI FILL GI GIN GL GN HC IND IRISTEM JHN "
    "LACSN LANR LI LN LR MA MB MC MCD MCN MCR MCT MD MI MR MRT MS NBSNR NCT "
    "NE NH NI NII NIIP NP NPI OBI OD PA PC PCN PE PEN PGN PHC PHE PHO PI "
    "PIN PLAC PN PNT PPIN PPN PRC PRN PT QA RI RN RPH RR RRI RRP SAMN SB "
    "SID SL SN SNBSN SNO SP SR SRX SS STN TAX TN TPR TRL U UDI UPIN USID "
    "VN VP VS WC WCN WP XV XX".split()
)

LABEL_RE = re.compile(r"^[A-Za-z0-9]+(?:[_-][A-Za-z0-9]+)*$")
FEATURE_FUNCS = (FUNC_EXACT, FUNC_FUZZY)


class AlgorithmValidationError(ValueError):
    """Raised when an algorithm config fails the reference's rules."""


def _require(d: dict, key: str, what: str):
    """Required-key access that reports the config error, not a bare
    KeyError (the reference's pydantic models emit 'field required')."""
    if not isinstance(d, dict):
        raise AlgorithmValidationError(f"{what} must be a JSON object, got: {d!r}")
    try:
        return d[key]
    except KeyError:
        raise AlgorithmValidationError(f"{what} is missing required key '{key}'")


def parse_feature(value: str, allow_wildcard: bool = False) -> str:
    """Validate a feature string; returns it unchanged.

    Mirrors Feature.parse (reference pii.py:96-119): suffixes only on
    IDENTIFIER, suffix must be a known identifier type.
    """
    if allow_wildcard and value == "*":
        return value
    parts = str(value).split(":", 1)
    if parts[0] not in FEATURE_ATTRIBUTES:
        raise AlgorithmValidationError(f"Invalid feature: '{value}'.")
    if len(parts) == 2:
        if parts[0] != "IDENTIFIER":
            raise AlgorithmValidationError(
                f"Invalid feature: '{value}'. "
                f"Suffix is not allowed for attribute '{parts[0]}'"
            )
        if parts[1] not in IDENTIFIER_TYPES:
            raise AlgorithmValidationError(f"Invalid feature: '{value}'.")
    return str(value)


def _check_label(value: str, what: str) -> str:
    if value is None:
        return value
    if not isinstance(value, str):
        # a JSON number/bool label would TypeError out of len() below,
        # escaping the module's AlgorithmValidationError contract
        raise AlgorithmValidationError(f"Invalid {what} label: {value!r}")
    if len(value) > 255 or not LABEL_RE.match(value):
        raise AlgorithmValidationError(f"Invalid {what} label: '{value}'")
    return value


def _check_unit(value, what: str) -> float:
    v = float(value)
    if not (0.0 <= v <= 1.0):
        raise AlgorithmValidationError(f"{what} must be within [0, 1]: {value}")
    return v


def _evaluator_from_dict(d: dict) -> Evaluator:
    feature = parse_feature(_require(d, "feature", "evaluator"))
    func = str(d.get("func", ""))
    # the reference also accepts the enum's str() form with module prefix
    func = func.rsplit(".", 1)[-1]
    if func not in FEATURE_FUNCS:
        raise AlgorithmValidationError(f"Invalid evaluator func: '{d.get('func')}'")
    threshold = d.get("fuzzy_match_threshold")
    if threshold is not None:
        threshold = _check_unit(threshold, "fuzzy_match_threshold")
    measure = d.get("fuzzy_match_measure")
    if measure is not None and measure not in SIMILARITY_MEASURES:
        raise AlgorithmValidationError(
            f"Invalid fuzzy_match_measure: '{measure}'"
        )
    return Evaluator(
        feature=feature,
        func=func,
        fuzzy_match_threshold=threshold,
        fuzzy_match_measure=measure,
    )


def _pass_from_dict(d: dict) -> AlgorithmPass:
    label = _check_label(d.get("label"), "pass")
    keys = tuple(str(k) for k in _require(d, "blocking_keys", "pass"))
    for k in keys:
        if k not in BLOCKING_KEY_IDS:
            raise AlgorithmValidationError(f"Invalid blocking key: '{k}'")
    evaluators = tuple(
        _evaluator_from_dict(e) for e in _require(d, "evaluators", "pass")
    )
    if not evaluators:
        raise AlgorithmValidationError("Each pass requires at least one evaluator")
    feats = [e.feature for e in evaluators]
    if len(set(feats)) != len(feats):
        # engine-stricter than the reference's pydantic model: the
        # scoring plan keys per-evaluator similarity and score columns
        # by feature name, so duplicate features in one pass would
        # silently score both evaluators with the LAST one's
        # measure/threshold — reject the ambiguous config instead
        raise AlgorithmValidationError(
            "Evaluator features must be unique within a pass: "
            f"{sorted(f for f in feats if feats.count(f) > 1)}"
        )
    window = _require(d, "possible_match_window", "pass")
    if not isinstance(window, (list, tuple)) or len(window) != 2:
        raise AlgorithmValidationError(
            f"possible_match_window must have two bounds: {window}"
        )
    mmt = _check_unit(window[0], "possible_match_window")
    cmt = _check_unit(window[1], "possible_match_window")
    if mmt > cmt:
        raise AlgorithmValidationError(
            "Invalid range. Lower bound must be less than upper bound: "
            f"{tuple(window)}"
        )
    return AlgorithmPass(
        label=label,
        blocking_keys=keys,
        evaluators=evaluators,
        possible_match_window=(mmt, cmt),
    )


def _context_from_dict(d: dict) -> AlgorithmContext:
    log_odds: dict[str, float] = {}
    for lo in d.get("log_odds", ()):
        feature = parse_feature(_require(lo, "feature", "log_odds entry"))
        value = float(_require(lo, "value", "log_odds entry"))
        # isfinite, not just >= 0: json.load admits NaN/Infinity, and
        # NaN passes every comparison-based check (NaN < 0 is False) —
        # a NaN weight then poisons the missingness total so the pass
        # silently produces zero candidates
        if not math.isfinite(value) or value < 0:
            raise AlgorithmValidationError(
                f"Log odds must be a finite number >= 0: {feature}={value}"
            )
        log_odds[feature] = value
    skip_values = []
    for sv in d.get("skip_values", ()):
        feature = parse_feature(
            _require(sv, "feature", "skip_values entry"), allow_wildcard=True
        )
        values = tuple(str(v) for v in _require(sv, "values", "skip_values entry"))
        if not values:
            raise AlgorithmValidationError(
                f"skip_values for '{feature}' must be non-empty"
            )
        skip_values.append(SkipValue(feature=feature, values=values))
    adv = d.get("advanced", {})
    measure = adv.get("fuzzy_match_measure", "JaroWinkler")
    if measure not in SIMILARITY_MEASURES:
        raise AlgorithmValidationError(f"Invalid fuzzy_match_measure: '{measure}'")
    return AlgorithmContext(
        log_odds=log_odds,
        skip_values=tuple(skip_values),
        include_multiple_matches=bool(d.get("include_multiple_matches", True)),
        fuzzy_match_threshold=_check_unit(
            adv.get("fuzzy_match_threshold", 0.9), "fuzzy_match_threshold"
        ),
        fuzzy_match_measure=measure,
        max_missing_allowed_proportion=_check_unit(
            adv.get("max_missing_allowed_proportion", 0.5),
            "max_missing_allowed_proportion",
        ),
        missing_field_points_proportion=_check_unit(
            adv.get("missing_field_points_proportion", 0.5),
            "missing_field_points_proportion",
        ),
    )


def algorithm_from_dict(d: dict) -> Algorithm:
    """Parse + validate one algorithm JSON object."""
    label = _require(d, "label", "algorithm")
    if not isinstance(label, str):
        # an explicit "label": null must not yield Algorithm(label=None):
        # the reference requires a string label on every algorithm
        raise AlgorithmValidationError(f"Algorithm label must be a string: {label!r}")
    label = _check_label(label, "algorithm")
    context = _context_from_dict(d.get("algorithm_context", {}))
    passes = tuple(_pass_from_dict(p) for p in _require(d, "passes", "algorithm"))
    if not passes:
        raise AlgorithmValidationError("An algorithm requires at least one pass")
    labels = {p.resolved_label for p in passes}
    if len(labels) != len(passes):
        raise AlgorithmValidationError("Each pass must have a unique label.")
    for p in passes:
        for key in p.blocking_keys:
            if context.get_log_odds(key) is None:
                raise AlgorithmValidationError(
                    "Log odds must be defined for all blocking keys."
                )
        for ev in p.evaluators:
            if context.get_log_odds(ev.feature) is None:
                raise AlgorithmValidationError(
                    "Log odds must be defined for all evaluators."
                )
    return Algorithm(label=label, passes=passes, context=context)


def load_algorithms(path: str) -> dict[str, Algorithm]:
    """Load every algorithm from a JSON file (a list or one object)."""
    with open(path) as fh:
        data = json.load(fh)
    if isinstance(data, dict):
        data = [data]
    out: dict[str, Algorithm] = {}
    for d in data:
        alg = algorithm_from_dict(d)
        if alg.label in out:
            raise AlgorithmValidationError(
                f"Duplicate algorithm label: '{alg.label}'"
            )
        out[alg.label] = alg
    return out


def load_algorithm(path: str, label: str | None = None) -> Algorithm:
    """Load one algorithm: by label if given, else the file's
    ``is_default`` entry, else the only entry."""
    with open(path) as fh:
        data = json.load(fh)
    if isinstance(data, dict):
        data = [data]
    if label is not None:
        for d in data:
            if d.get("label") == label:
                return algorithm_from_dict(d)
        raise AlgorithmValidationError(f"No algorithm labeled '{label}' in {path}")
    defaults = [d for d in data if d.get("is_default")]
    if defaults:
        return algorithm_from_dict(defaults[0])
    if len(data) == 1:
        return algorithm_from_dict(data[0])
    raise AlgorithmValidationError(
        f"{path} holds {len(data)} algorithms and none is_default; pass a label"
    )
