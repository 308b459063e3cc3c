"""Parity: expression-based normalize_text vs the Python reference."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from recordlinker_spark.functions.textnorm import (
    SIMILARITY_FUNCS,
    nfkd_translate_table,
    normalize_text,
)


def expr_semantics(text: str) -> str:
    """Driver-side twin of features.norm_text_expr."""
    src, dst, _ = nfkd_translate_table()
    table = dict(zip(src, dst))
    translated = "".join(table.get(c, c) for c in text)
    return "".join(c for c in translated if c.isascii() and c.isalnum()).lower()


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8",
            max_codepoint=0xFFFF,
            exclude_characters=sorted(nfkd_translate_table()[2]),
        ),
        max_size=30,
    )
)
def test_norm_expr_matches_python(text):
    """Equal on every BMP string outside the 273 documented divergent
    codepoints (multi-char NFKD decompositions)."""
    assert expr_semantics(text) == normalize_text(text)


def test_norm_expr_accents():
    for s, want in [
        ("José  GARCÍA-Núñez", "josegarcianunez"),
        ("  Ärzte Straße 12 ", "arztestrae12"),  # ß drops (no NFKD decomp)
        ("O'Neil", "oneil"),
        ("ŁukasZ", "ukasz"),  # Ł has no NFKD decomposition -> dropped
    ]:
        assert normalize_text(s) == want
        assert expr_semantics(s) == want


@settings(max_examples=500, deadline=None)
@given(
    st.text(alphabet=st.characters(codec="ascii", categories=("L", "N")), max_size=12),
    st.text(alphabet=st.characters(codec="ascii", categories=("L", "N")), max_size=12),
)
def test_similarity_kernels_match_duckdb(a, b):
    """The three measures match DuckDB's implementations on non-empty
    strings (rapidfuzz semantics; both-empty is the only divergence,
    rapidfuzz=1.0 vs duckdb=0.0 for JW)."""
    if not a or not b:
        return
    con = duckdb.connect()
    jw, lev, dl = con.execute(
        "select jaro_winkler_similarity(?, ?), levenshtein(?, ?), damerau_levenshtein(?, ?)",
        [a, b, a, b, a, b],
    ).fetchone()
    m = max(len(a), len(b))
    assert SIMILARITY_FUNCS["JaroWinkler"](a, b) == pytest.approx(jw, abs=1e-12)
    assert SIMILARITY_FUNCS["Levenshtein"](a, b) == pytest.approx(1 - lev / m, abs=1e-12)
    assert SIMILARITY_FUNCS["DamerauLevenshtein"](a, b) == pytest.approx(
        1 - dl / m, abs=1e-12
    )
