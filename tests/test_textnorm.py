"""Kernel parity tests against reference-published values
(tests/unit/linking/test_link.py:41,61,109-111 and test_matchers.py)."""

import pytest

from recordlinker_spark.functions.textnorm import (
    damerau_levenshtein_distance,
    jaro_winkler_similarity,
    levenshtein_distance,
    levenshtein_similarity,
    max_similarity,
    normalize_text,
)


def test_normalize_text():
    assert normalize_text("John  Doe!") == "johndoe"
    assert normalize_text("  Émile-Zola ") == "emilezola"
    assert normalize_text("O'Neil") == "oneil"
    assert normalize_text("1234 Silversun Strip") == "1234silversunstrip"
    assert normalize_text("") == ""


def test_jaro_winkler_reference_values():
    # reference test_link.py:61 — score 9.33 at log-odds 10
    assert jaro_winkler_similarity("john", "jon") == pytest.approx(0.9333333, abs=1e-6)
    assert jaro_winkler_similarity("shepard", "shepard") == 1.0
    # boost only above 0.7 jaro
    assert jaro_winkler_similarity("abc", "xyz") == 0.0
    # reference test_link.py:109-111 — doe/doey = 5.980/6.35
    assert jaro_winkler_similarity("doe", "doey") * 6.35 == pytest.approx(5.980, abs=1e-3)
    # reference test_link.py:157-159 — john/jan = 5.137/6.85
    assert jaro_winkler_similarity("john", "jan") * 6.85 == pytest.approx(5.137, abs=1e-3)


def test_levenshtein():
    assert levenshtein_distance("kitten", "sitting") == 3
    # reference test_link.py:41 — Levenshtein(john, jon) at threshold 0.5 -> 7.5/10
    assert levenshtein_similarity("john", "jon") == 0.75


def test_damerau():
    # unrestricted transpositions (matches rapidfuzz + duckdb)
    assert damerau_levenshtein_distance("ca", "abc") == 2
    assert damerau_levenshtein_distance("abcdef", "abcdfe") == 1


def test_max_similarity_cross_product():
    assert max_similarity(["tali"], ["tali", "zora"], "JaroWinkler") == 1.0
    assert max_similarity([], ["x"], "JaroWinkler") == 0.0
    assert max_similarity(["john"], ["jon"], "Levenshtein") == 0.75


def test_parity_with_duckdb_jaro_winkler():
    """Our JW must equal DuckDB's (the correctness-oracle engine) so fuzzy
    queries can be hash-compared."""
    import duckdb

    cases = [
        ("john", "jon"),
        ("shepard", "shepley"),
        ("1234silversunstrip", "4444differentstreet"),
        ("tali", "talizora"),
        ("a", ""),
        ("ab", "ba"),
        ("dwayne", "duane"),
        ("dixon", "dicksonx"),
        ("martha", "marhta"),
    ]
    for s1, s2 in cases:
        expected = duckdb.sql(
            f"select jaro_winkler_similarity('{s1}', '{s2}')"
        ).fetchone()[0]
        assert jaro_winkler_similarity(s1, s2) == pytest.approx(expected, abs=1e-12), (s1, s2)
