"""Unit tests for the corpus-dedup + similarity-search operators.

These operators have no reference counterpart (RecordLinker dedups
records via linkage, not corpora), so correctness is pinned two ways:
the DuckDB oracles in plans/demo.py (driver gate) and the independent
pure-Python twins here.
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1 (casefold)
    (3, "The quick brown fox jumped over the lazy dog"),  # near dup
    (4, "Completely different text about spark pipelines"),
    (5, ""),  # empty doc
    (6, "The  quick   brown fox jumps over the lazy dog "),  # ws-collapsed dup
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.lower()).strip()


def _shingles(t: str, k: int = 5) -> set[str]:
    t = _norm(t)
    n = max(len(t) - k + 1, 1)
    return {t[i : i + k] for i in range(n)}


def test_exact_duplicates_groups(docs_df):
    from recordlinker_spark.operators.dedup import exact_duplicates

    groups = {
        tuple(r["doc_ids"]): r["n_docs"]
        for r in exact_duplicates(docs_df).collect()
    }
    assert groups == {(1, 2, 6): 3}


def test_minhash_signature_python_twin(docs_df):
    """Signature values match an independent pure-Python replay."""
    from recordlinker_spark.operators.dedup import (
        MERSENNE,
        _minhash_coeffs,
        minhash_signatures,
    )

    coeffs = _minhash_coeffs(4, seed=7)
    got = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(docs_df, num_hashes=4, seed=7).collect()
    }
    for doc_id, text in DOCS:
        hashes = [
            int(hashlib.md5(s.encode()).hexdigest()[:7], 16)
            for s in _shingles(text)
        ]
        want = [min((h * a + b) % MERSENNE for h in hashes) for a, b in coeffs]
        assert got[doc_id] == want, doc_id


def test_minhash_lsh_finds_near_dups(docs_df):
    from recordlinker_spark.operators.dedup import minhash_lsh_pairs

    pairs = {
        (r["doc_id_l"], r["doc_id_r"])
        for r in minhash_lsh_pairs(docs_df, num_hashes=16, bands=8).collect()
    }
    # exact dups always collide in every band; the near-dup should be
    # found by at least one 2-row band; the unrelated doc never pairs
    assert {(1, 2), (1, 6), (2, 6)} <= pairs
    assert (1, 3) in pairs or (2, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_ngram_jaccard_matches_python_sets(spark, docs_df):
    from recordlinker_spark.operators.dedup import ngram_jaccard_pairs

    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (3, 4)], "doc_id_l long, doc_id_r long"
    )
    got = {
        (r["doc_id_l"], r["doc_id_r"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs_df, cand, threshold=0.0).collect()
    }
    texts = dict(DOCS)
    for l, r in [(1, 2), (1, 3), (1, 4), (3, 4)]:
        a, b = _shingles(texts[l]), _shingles(texts[r])
        want = len(a & b) / len(a | b)
        assert got[(l, r)] == pytest.approx(want, abs=1e-12), (l, r)
    assert got[(1, 2)] == 1.0
    assert got[(1, 4)] < 0.1


def test_simhash_python_twin(docs_df):
    """SimHash values match an independent per-bit majority replay."""
    from recordlinker_spark.operators.dedup import simhash_table

    got = {r["doc_id"]: r["simhash"] for r in simhash_table(docs_df).collect()}
    for doc_id, text in DOCS:
        toks = _norm(text).split(" ")
        hashes = [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks
        ]
        want = 0
        for b in range(60):
            if 2 * sum((h >> b) & 1 for h in hashes) > len(hashes):
                want |= 1 << b
        assert got[doc_id] == want, doc_id


def test_simhash_near_dups_share_band(docs_df):
    from recordlinker_spark.operators.dedup import simhash_buckets

    rows = simhash_buckets(docs_df).collect()
    sim = {r["doc_id"]: r["simhash"] for r in rows}
    assert sim[1] == sim[2] == sim[6]
    ham = bin(sim[1] ^ sim[3]).count("1")
    keys = {}
    for r in rows:
        keys.setdefault(r["doc_id"], set()).add((r["band"], r["key"]))
    if ham <= 3:  # pigeonhole guarantee: <=3 flipped bits, 4 bands
        assert keys[1] & keys[3]
    assert not (keys[1] & keys[4]) or bin(sim[1] ^ sim[4]).count("1") <= 45


EMB = [
    (i, [math.sin(0.1 * (i + 1) * (d + 1)) + 0.01 for d in range(8)])
    for i in range(50)
]


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(EMB, "vec_id long, embedding array<float>")


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_brute_force_topk_exact(spark, emb_df):
    from recordlinker_spark.operators.simsearch import brute_force_topk

    queries = emb_df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = brute_force_topk(emb_df, queries, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    emb_f = {i: [float(f"{x:.30g}") for x in v] for i, v in EMB}
    for qid in (0, 1):
        want = sorted(
            range(50),
            key=lambda i: (-round(_cos_f32(emb_f[i], emb_f[qid]), 9), i),
        )[:3]
        assert [v for _, v in sorted(by_q[qid])] == want


def _cos_f32(a, b):
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    a = [f32(x) for x in a]
    b = [f32(x) for x in b]
    return _cos(a, b)


def test_ivf_multiprobe_improves_recall(spark, emb_df):
    """nprobe=3 recall >= nprobe=1 recall, both vs brute force."""
    from recordlinker_spark.operators.simsearch import brute_force_topk, ivf_topk

    queries = emb_df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(emb_df, queries, k=5).collect()
    }

    def recall(nprobe):
        got = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(
                emb_df, queries, k=5, dim=8, nbits=4, nprobe=nprobe
            ).collect()
        }
        return len(got & truth) / len(truth)

    r1, r3 = recall(1), recall(3)
    assert r3 >= r1
    assert r3 > 0.5


def test_ivf_bucket_cap_drops_hot_bucket(spark):
    """A degenerate corpus (all vectors identical) lands in one bucket;
    the cap drops it, bounding the per-bucket join."""
    from recordlinker_spark.operators.simsearch import ivf_topk

    hot = spark.createDataFrame(
        [(i, [1.0] * 8) for i in range(100)], "vec_id long, embedding array<float>"
    )
    queries = hot.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
    capped = ivf_topk(
        hot, queries, k=5, dim=8, nbits=4, nprobe=1, max_bucket_size=50
    )
    assert capped.count() == 0
    uncapped = ivf_topk(hot, queries, k=5, dim=8, nbits=4, nprobe=1)
    assert uncapped.count() == 5


def test_fingerprints_one_row_per_doc_incl_null_text(spark):
    """fingerprints() preserves output cardinality: a NULL/empty-text
    doc yields a (doc_id, NULL-or-value) row instead of vanishing."""
    from recordlinker_spark.operators.textstats import fingerprints

    docs = spark.createDataFrame(
        [(1, "hello world document"), (2, None), (3, "hello world document")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["fingerprint"] for r in fingerprints(docs).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2] is None
    assert rows[1] == rows[3] and rows[1] is not None


def test_pick_nprobe_hits_recall_floor(spark, emb_df):
    """pick_nprobe returns an operating point whose measured recall
    meets the floor (or the max probe count, reported honestly)."""
    from recordlinker_spark.operators.simsearch import ivf_topk, pick_nprobe

    queries = emb_df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    nprobe, recall = pick_nprobe(
        emb_df, queries, k=5, dim=8, nbits=4, recall_floor=0.9
    )
    assert recall >= 0.9 or nprobe == 16
    # the returned operating point reproduces that recall when re-run
    from recordlinker_spark.operators.simsearch import brute_force_topk

    truth = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(emb_df, queries, k=5).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(emb_df, queries, k=5, dim=8, nbits=4, nprobe=nprobe).collect()
    }
    assert len(got & truth) / len(truth) == recall


def test_ranked_multiprobe_recall_monotone_to_exhaustive(spark, emb_df):
    """Probing every ranked bucket (nprobe = 2^nbits) recovers brute
    force exactly; recall is monotone in nprobe."""
    from recordlinker_spark.operators.simsearch import brute_force_topk, ivf_topk

    queries = emb_df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(emb_df, queries, k=5).collect()
    }

    def recall(nprobe):
        got = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(
                emb_df, queries, k=5, dim=8, nbits=4, nprobe=nprobe
            ).collect()
        }
        return len(got & truth) / len(truth)

    r4, r8, r16 = recall(4), recall(8), recall(16)
    assert r4 <= r8 <= r16
    assert r16 == 1.0


def test_embedding_neardup_finds_planted_pairs(spark):
    """Planted near-identical vectors (cos ~0.99) must all surface as
    verified pairs; verification guarantees zero pairs below the
    threshold; a python brute-force twin pins the survivors' cosines."""
    import random as _r

    from recordlinker_spark.operators.dedup import embedding_neardup_pairs

    rng = _r.Random(7)
    rows = []
    for i in range(30):
        base = [rng.gauss(0, 1) for _ in range(64)]
        rows.append((i, base))
        # planted dup: tiny perturbation -> cosine ~0.999
        rows.append((1000 + i, [x + rng.gauss(0, 0.02) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = embedding_neardup_pairs(
        df, threshold=0.9, dim=64, bands=8, bits_per_band=4
    ).collect()
    pairs = {(r["vec_id_l"], r["vec_id_r"]): r["cos"] for r in got}
    # every planted pair found (8 x 4-bit bands at cos ~.999 -> recall ~1)
    for i in range(30):
        assert (i, 1000 + i) in pairs, f"planted pair {i} missed"
    # verification floor holds
    assert all(c >= 0.9 for c in pairs.values())
    # python twin: exact cosine agrees to 1e-9 on the survivors
    vec = {vid: v for vid, v in rows}
    import math as _m

    for (l, r), c in pairs.items():
        dot = sum(x * y for x, y in zip(vec[l], vec[r]))
        nl = _m.sqrt(sum(x * x for x in vec[l]))
        nr = _m.sqrt(sum(x * x for x in vec[r]))
        assert abs(c - round(dot / (nl * nr), 9)) < 1e-9


def test_embedding_neardup_bucket_cap_drops_hot_bucket(spark):
    """A degenerate corpus (identical vectors -> one hot bucket per
    band) returns no pairs when the cap excludes the bucket."""
    from recordlinker_spark.operators.dedup import embedding_neardup_pairs

    rows = [(i, [1.0] * 64) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = embedding_neardup_pairs(
        df, threshold=0.5, dim=64, bands=4, bits_per_band=4, max_bucket_size=10
    )
    assert capped.count() == 0
    uncapped = embedding_neardup_pairs(
        df, threshold=0.5, dim=64, bands=4, bits_per_band=4
    )
    assert uncapped.count() == 50 * 49 // 2


def test_rank_planes_full_coverage_at_nbits8(spark, emb_df):
    """At nbits=8 the default 6-plane ranking can never flip the two
    most-certain planes, capping attainable recall; rank_planes=8 ranks
    the full space, so probing all 256 perturbations recovers brute
    force exactly (regression for the r03 ivf_recall_nbits8=0.575
    ceiling)."""
    from recordlinker_spark.operators.simsearch import brute_force_topk, ivf_topk

    queries = emb_df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(emb_df, queries, k=5).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(
            emb_df, queries, k=5, dim=8, nbits=8, nprobe=256, rank_planes=8
        ).collect()
    }
    assert got == truth
    # default ranking at nbits=8 cannot reach the full space: flipping
    # only the 6 most-uncertain planes reaches at most 64 of the 256
    # buckets, while rank_planes=8 at nprobe=256 probes every bucket
    from recordlinker_spark.operators.simsearch import (
        hyperplanes,
        probe_buckets_col,
    )

    planes = hyperplanes(8, 8, 42)
    probed = queries.select(
        F.size(
            F.array_distinct(
                probe_buckets_col(F.col("embedding"), planes, 64, rank_planes=6)
            )
        ).alias("n6"),
        F.size(
            F.array_distinct(
                probe_buckets_col(F.col("embedding"), planes, 256, rank_planes=8)
            )
        ).alias("n8"),
    ).collect()
    assert all(r["n6"] <= 64 for r in probed)
    assert all(r["n8"] == 256 for r in probed)


def test_pick_lsh_config_scurve():
    """Band choice honors the S-curve: midpoint at-or-below the target
    threshold (recall bias), and a pair exactly AT the threshold
    collides with high probability under the chosen config."""
    from recordlinker_spark.operators.dedup import pick_lsh_config

    for t in (0.3, 0.5, 0.7, 0.8, 0.9, 0.95):
        nh, bands = pick_lsh_config(t)
        assert nh % bands == 0
        rows = nh // bands
        midpoint = (1.0 / bands) ** (1.0 / rows)
        assert midpoint <= t + 1e-9
        p_at_t = 1.0 - (1.0 - t**rows) ** bands
        assert p_at_t >= 0.6, (t, bands, rows, p_at_t)

    # shipped default reproduced
    assert pick_lsh_config(0.8) == (64, 8)
    # no-bias mode picks the closest midpoint even if above
    assert pick_lsh_config(0.7, recall_bias=False) == (64, 8)
    # degenerate thresholds rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pick_lsh_config(0.0)
    with _pytest.raises(ValueError):
        pick_lsh_config(1.5)


def test_neardup_keep_best_elects_one_per_component(docs_df):
    """LSH -> verify -> CC -> keep-best: exact dups {1,2,6} form one
    component (3 may join via the near-dup edge), the canonical doc is
    the longest trimmed text (doc 6: inner whitespace makes it longest),
    and unrelated/empty docs are singletons that keep themselves."""
    from recordlinker_spark.operators.dedup import neardup_keep_best

    rows = {
        r["doc_id"]: r
        for r in neardup_keep_best(
            docs_df, num_hashes=16, bands=8, seed=42
        ).collect()
    }
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    # the exact-dup trio shares the min-id component
    assert rows[1]["component"] == rows[2]["component"] == rows[6]["component"] == 1
    assert rows[1]["n_members"] >= 3
    # election: doc 6 has the longest trimmed text in the component
    winners = {d for d, r in rows.items() if r["keep"] == 1 and r["component"] == 1}
    assert winners == {6}
    # singletons keep themselves
    for d in (4, 5):
        if rows[d]["n_members"] == 1:
            assert rows[d]["component"] == d and rows[d]["keep"] == 1
    # exactly one keeper per component
    by_comp: dict = {}
    for r in rows.values():
        by_comp.setdefault(r["component"], 0)
        by_comp[r["component"]] += r["keep"]
    assert all(v == 1 for v in by_comp.values())


def test_null_text_docs_never_group_or_pair(spark):
    """NULL-text docs must not form an exact-dup group (md5(NULL)
    groups as equal) nor a quadratic LSH clique (all-NULL sigs share
    bucket '' in every band)."""
    from recordlinker_spark.operators.dedup import (
        exact_duplicates,
        minhash_lsh_pairs,
        neardup_keep_best,
    )

    docs = spark.createDataFrame(
        [("1", None), ("2", None), ("3", None),
         ("4", "hello world text"), ("5", "hello world text")],
        "doc_id string, text string",
    )
    assert exact_duplicates(docs).count() == 1  # only the real pair
    pairs = {
        (r["doc_id_l"], r["doc_id_r"])
        for r in minhash_lsh_pairs(docs).collect()
    }
    assert pairs == {("4", "5")}
    # keep_best: NULL-text docs stay singleton components, kept
    kb = {r["doc_id"]: (r["n_members"], r["keep"])
          for r in neardup_keep_best(docs).collect()}
    assert kb[1] == (1, 1) and kb[4] == (2, 1) and kb[5] == (2, 0)


def test_simhash_band_bits_must_divide(spark):
    from recordlinker_spark.operators.dedup import simhash_buckets

    docs = spark.createDataFrame([("1", "x")], "doc_id string, text string")
    with pytest.raises(ValueError, match="does not divide"):
        simhash_buckets(docs, band_bits=16)


def test_keep_best_rejects_non_numeric_ids(spark):
    """Non-numeric doc ids must raise loudly in every ANSI mode — a
    silent cast-to-NULL would collapse the corpus to one component and
    elect a single keeper."""
    from recordlinker_spark.operators.dedup import neardup_keep_best

    bad = spark.createDataFrame(
        [("d01-0", "some text here"), ("d02-0", "some text here")],
        "doc_id string, text string",
    )
    with pytest.raises(Exception, match="numeric doc ids"):
        neardup_keep_best(bad).collect()


def test_duplicated_candidate_pairs_are_deduped(spark):
    """A duplicated input pair must not double the intersection count
    (jaccard > 1 / ANSI divide-by-zero on exact-dup pairs)."""
    from recordlinker_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [("1", "hello world text"), ("2", "hello world text")],
        "doc_id string, text string",
    )
    cand = spark.createDataFrame(
        [("1", "2"), ("1", "2")], "doc_id_l string, doc_id_r string"
    )
    rows = ngram_jaccard_pairs(docs, cand, threshold=0.0).collect()
    assert len(rows) == 1 and abs(rows[0]["jaccard"] - 1.0) < 1e-12


def test_pick_nprobe_refinement_never_remeasures_failures(monkeypatch):
    """The binary refinement must bracket from the LAST below-floor
    gallop point — re-measuring values the doubling phase already saw
    fail wastes a full ivf_topk sample evaluation each."""
    import recordlinker_spark.operators.simsearch as ss

    class _Fake:
        def __init__(self, rows):
            self._rows = rows

        def collect(self):
            return self._rows

    truth = [{"query_id": 0, "vec_id": i} for i in range(10)]
    measured = []

    def fake_brute(corpus, queries, k, id_col, vec_col):
        return _Fake(truth)

    def fake_ivf(corpus, queries, k, dim, nbits, seed, nprobe,
                 max_bucket_size, id_col, vec_col, rank_planes):
        measured.append(nprobe)
        # recall crosses the 0.9 floor at nprobe = 3
        n_hit = 10 if nprobe >= 3 else nprobe * 2
        return _Fake(truth[:n_hit])

    monkeypatch.setattr(ss, "brute_force_topk", fake_brute)
    monkeypatch.setattr(ss, "ivf_topk", fake_ivf)
    best, recall = ss.pick_nprobe(
        corpus=None, sample_queries=None, k=10, nbits=4, recall_floor=0.9
    )
    assert (best, recall) == (3, 1.0)
    # gallop 1, 2 (fail), 4 (pass) then refine measures ONLY 3
    assert measured == [1, 2, 4, 3]
    assert len(measured) == len(set(measured))  # no re-measurement
