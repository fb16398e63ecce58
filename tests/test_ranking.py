"""Unit tests for functions/ranking.py (BM25 + TF-IDF) against
hand-computed values on a tiny corpus."""

import math

import pytest

from loongcollector_spark.functions.ranking import bm25_search, tfidf_top_terms


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffle spark"),          # dl=3
            (2, "spark join"),                   # dl=2
            (3, "vector index build"),           # dl=3
            (4, "nothing relevant here at all"),  # dl=5
        ],
        "doc_id long, text string",
    )


def _bm25(tf, df, n, dl, avg, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avg))


class TestBm25:
    def test_hand_computed_scores(self, docs):
        out = {r.doc_id: (r.n_terms_matched, r.score_milli)
               for r in bm25_search(docs, ["spark", "vector"]).collect()}
        n, avg = 4, (3 + 2 + 3 + 5) / 4
        expect1 = round(_bm25(2, 2, n, 3, avg) * 1000)  # spark×2 in doc 1
        expect2 = round(_bm25(1, 2, n, 2, avg) * 1000)
        expect3 = round(_bm25(1, 1, n, 3, avg) * 1000)  # vector rarer
        assert out == {1: (1, expect1), 2: (1, expect2), 3: (1, expect3)}

    def test_unmatched_docs_absent(self, docs):
        ids = {r.doc_id for r in bm25_search(docs, ["spark"]).collect()}
        assert ids == {1, 2}

    def test_query_case_insensitive(self, docs):
        assert bm25_search(docs, ["SPARK"]).count() == 2

    def test_empty_query_raises(self, docs):
        with pytest.raises(ValueError):
            bm25_search(docs, [])

    def test_rarer_term_scores_higher(self, docs):
        # one occurrence each, same doc length: the rarer term wins
        out = {r.doc_id: r.score_milli
               for r in bm25_search(docs, ["shuffle", "build"]).collect()}
        # shuffle: df=1 dl=3 tf=1; build: df=1 dl=3 tf=1 → equal by symmetry
        assert out[1] == out[3]


class TestTfidf:
    def test_idf_zero_for_ubiquitous_term(self, spark):
        df = spark.createDataFrame(
            [(1, "common alpha"), (2, "common beta")],
            "doc_id long, text string")
        out = tfidf_top_terms(df, top_k=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.tfidf_milli))
        # 'common' appears in every doc → ln(N/df)=0 → score 0, ranked
        # below the distinctive term
        for d, terms in by_doc.items():
            assert terms[0][1] in ("alpha", "beta") and terms[0][2] > 0
            assert ("common" in [t[1] for t in terms]
                    and [t for t in terms if t[1] == "common"][0][2] == 0)

    def test_rank_is_total_and_capped(self, docs):
        out = tfidf_top_terms(docs, top_k=2)
        per_doc = {r.doc_id: [] for r in out.collect()}
        for r in out.collect():
            per_doc[r.doc_id].append(r.rank)
        for ranks in per_doc.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
            assert len(ranks) <= 2

    def test_tie_breaks_alphabetically(self, spark):
        df = spark.createDataFrame(
            [(1, "zeta alpha"), (2, "other text")],
            "doc_id long, text string")
        out = [(r.rank, r.term) for r in
               tfidf_top_terms(df, top_k=2)
               .filter("doc_id = 1").orderBy("rank").collect()]
        # equal tf and df → equal score → alphabetical order decides
        assert out == [(1, "alpha"), (2, "zeta")]
