"""Accuracy harness regression on the reference's labeled NBS data.

The confusion-matrix counts below are pinned as a regression: they are
what the reference ALGORITHM produces on the NBS human labels (the
misses are algorithm-inherent — e.g. nickname pairs like Bobby/Robert
Washington score below the 0.9 Jaro-Winkler threshold and fail pass-2
first4 blocking; dibbs-default grades them certainly-not by design).
The BASELINE F1>=0.99 criterion is against the reference's own
decisions, which tests/test_link_parity.py pins exactly.
"""

import datetime
import hashlib
import os

import pytest

from recordlinker_spark.plans.accuracy import run_accuracy

DATA = "/root/reference/tests/algorithm/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DATA), reason="reference data not available"
)

# The clock must be pinned for exact counts to be reproducible AT ALL:
# dateutil fills MISSING date components from the day it runs (the
# reference's validator, schemas/pii.py:423, behaves identically), so
# nbs_test.csv row 15 / better_test.csv rows 72/131 — Mary Sanders,
# BIRTHDATE ``1964-10`` — parse to 1964-10-<today's day-of-month>.
# Her seed row (nbs_seed.csv row 8) is 1964-10-19, and the pair sits
# on a knife edge of the 0.9 JW threshold x log-odds weight:
# run on the 19th -> exact birthdate (JW 1.0); on the 21st -> JW 0.96;
# on the 20th -> JW 0.92, ~0.4 points lower through the weight and the
# grade flips certain -> certainly-not.  THAT — not data drift, not
# float jitter — was the historical 31 tp / 22 fn <-> 30 / 23 flip
# across sandboxes: each session ran on a different calendar day.
# _TODAY pins the whole parse (recordlinker_spark ingest threads it
# through dateutil's ``default``); 2026-08-20 is the day the counts
# below were first recorded.  The data-md5 key still guards the pin
# against a genuinely different labeled-data snapshot.
_TODAY = datetime.date(2026, 8, 20)

_PINNED = {
    ("60f22d3b5be56f8b86d115882e4b45ae", "1c4bcd2492805ab64e8c493287d5478a"):
        {"cm": (30, 15, 2, 23), "pair": (35, 4)},
}


def _md5(path: str) -> str:
    with open(path, "rb") as fh:
        return hashlib.md5(fh.read()).hexdigest()


_BETTER_PINNED = {
    ("60f22d3b5be56f8b86d115882e4b45ae", "d986a23145d8cf2210c660c63e41be11"):
        {"cm": (92, 74, 2, 40), "pair": (98, 12)},
}


def test_better_accuracy(spark):
    """The reference README's RECOMMENDED metrics file
    (tests/algorithm/data/README.md: 'This is the recommended testing
    file for generating algorithm matching performance metrics') —
    234 regraded + permutation cases against the same nbs seed."""
    rep = run_accuracy(
        spark, f"{DATA}/nbs_seed.csv", f"{DATA}/better_test.csv", today=_TODAY
    )
    pin = _BETTER_PINNED.get(
        (_md5(f"{DATA}/nbs_seed.csv"), _md5(f"{DATA}/better_test.csv"))
    )
    if pin is not None:
        assert (rep.tp, rep.tn, rep.fp, rep.fn) == pin["cm"]
        assert (rep.pair_tp, rep.pair_fp) == pin["pair"]
    # structural invariants across snapshots: dibbs-default is
    # precision-biased on these labels (nickname/typo misses are
    # algorithm-inherent; SSN never reaches identifiers, per the
    # reference harness's dict_to_pii)
    assert rep.ppv > 0.95
    assert rep.specificity > 0.9
    assert rep.f1 > 0.75


def test_nbs_accuracy(spark):
    rep = run_accuracy(
        spark, f"{DATA}/nbs_seed.csv", f"{DATA}/nbs_test.csv", today=_TODAY
    )
    pin = _PINNED.get((_md5(f"{DATA}/nbs_seed.csv"), _md5(f"{DATA}/nbs_test.csv")))
    if pin is not None:
        # regression pin (dibbs-default on this NBS snapshot)
        assert (rep.tp, rep.tn, rep.fp, rep.fn) == pin["cm"]
        assert (rep.pair_tp, rep.pair_fp) == pin["pair"]
    # structural invariants that hold across snapshots
    assert rep.ppv > 0.93
    assert rep.pair_f1 > 0.6


def test_partial_birthdate_day_fill_is_pinned(spark):
    """The regression for the root cause itself: a year-month birthdate
    must take its day from the PINNED clock, not the wall clock —
    otherwise every exact pin above rots one calendar day later."""
    from recordlinker_spark.plans.accuracy import load_labeled_records
    import csv
    import tempfile

    with tempfile.NamedTemporaryFile(
        "w", suffix=".csv", delete=False, newline=""
    ) as fh:
        w = csv.DictWriter(fh, fieldnames=["ID", "FIRST", "LAST", "BIRTHDATE"])
        w.writeheader()
        w.writerow(
            {"ID": "1", "FIRST": "Mary", "LAST": "Sanders", "BIRTHDATE": "1964-10"}
        )
        path = fh.name
    try:
        for day in (3, 27):
            recs = load_labeled_records(
                spark, path, "x", today=datetime.date(2001, 5, day)
            )
            got = recs.select("birth_date").collect()[0][0]
            assert got == f"1964-10-{day:02d}"
    finally:
        os.unlink(path)
