"""Semantics tests for functions/ranking.py — hand-computed BM25,
unigram NLL, and PMI values on toy corpora (the oracle-parity suite
covers the catalog forms; these pin the math itself)."""

import math

import pytest
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.functions.ranking import (
    bm25_scores,
    pmi_collocations,
    unigram_logprob,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBM25:
    def test_hand_computed_single_term(self, spark):
        # corpus: 3 docs; "cat" in docs 1 (tf=2, dl=4) and 2 (tf=1, dl=2)
        df = _docs(
            spark,
            [(1, "cat dog cat bird"), (2, "cat fish"), (3, "dog dog bird fish")],
        )
        got = {
            r["doc_id"]: r["score"]
            for r in bm25_scores(df, ["cat"]).collect()
        }
        n, dfreq, avgdl = 3, 2, 10 / 3
        idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
        k1, b = 1.2, 0.75

        def s(tf, dl):
            return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

        assert set(got) == {1, 2}  # doc 3 has no hit
        assert got[1] == pytest.approx(s(2, 4), rel=1e-12)
        assert got[2] == pytest.approx(s(1, 2), rel=1e-12)

    def test_multi_term_sums_per_term_scores(self, spark):
        df = _docs(spark, [(1, "cat dog"), (2, "cat cat")])
        both = {
            r["doc_id"]: r["score"]
            for r in bm25_scores(df, ["cat", "dog"]).collect()
        }
        cat = {r["doc_id"]: r["score"] for r in bm25_scores(df, ["cat"]).collect()}
        dog = {r["doc_id"]: r["score"] for r in bm25_scores(df, ["dog"]).collect()}
        assert both[1] == pytest.approx(cat[1] + dog[1], rel=1e-12)
        assert both[2] == pytest.approx(cat[2], rel=1e-12)

    def test_empty_terms_raise(self, spark):
        with pytest.raises(ValueError):
            bm25_scores(_docs(spark, [(1, "a")]), [])


class TestUnigramLogprob:
    def test_uniform_corpus_nll_is_log_vocab(self, spark):
        # 4 tokens, each word once → p = 1/4 everywhere → nll = ln 4
        df = _docs(spark, [(1, "a b"), (2, "c d")])
        got = {r["doc_id"]: r["mean_nll"] for r in unigram_logprob(df).collect()}
        assert got[1] == pytest.approx(math.log(4), rel=1e-12)
        assert got[2] == pytest.approx(math.log(4), rel=1e-12)

    def test_common_words_score_lower(self, spark):
        # doc 1 is all corpus-frequent tokens; doc 2 has a rare one
        df = _docs(spark, [(1, "the the the"), (2, "the zzyzx")])
        got = {r["doc_id"]: r["mean_nll"] for r in unigram_logprob(df).collect()}
        assert got[1] < got[2]

    def test_token_counts_returned(self, spark):
        df = _docs(spark, [(1, "x y z")])
        row = unigram_logprob(df).collect()[0]
        assert row["n_tokens"] == 3


class TestPMICollocations:
    def test_perfect_collocation_pmi(self, spark):
        # "new york" always adjacent, each word only in that pair:
        # p(ab)=5/10 bigrams... build 5 docs "new york filler{i} x"
        rows = [(i, f"new york w{i} w{i}") for i in range(5)]
        df = _docs(spark, rows)
        got = {
            (r["word_a"], r["word_b"]): (r["pair_count"], r["pmi"])
            for r in pmi_collocations(df, min_count=5).collect()
        }
        assert ("new", "york") in got
        cnt, pmi = got[("new", "york")]
        assert cnt == 5
        # totals: 20 unigrams, 15 bigrams; c(new)=c(york)=5
        expect = math.log((5 / 15) / ((5 / 20) * (5 / 20)))
        assert pmi == pytest.approx(expect, rel=1e-12)

    def test_single_token_docs_yield_no_pairs(self, spark):
        df = _docs(spark, [(1, "solo"), (2, ""), (3, "a b")])
        rows = pmi_collocations(df, min_count=1).collect()
        assert {(r["word_a"], r["word_b"]) for r in rows} == {("a", "b")}

    def test_min_count_prunes(self, spark):
        df = _docs(spark, [(1, "a b a b"), (2, "c d")])
        rows = pmi_collocations(df, min_count=2).collect()
        assert {(r["word_a"], r["word_b"]) for r in rows} == {("a", "b")}


class TestRankingPlans:
    def test_no_python_eval_anywhere(self, spark):
        df = _docs(spark, [(1, "a b c")])
        for out in (
            bm25_scores(df, ["a"]),
            unigram_logprob(df),
            pmi_collocations(df, min_count=1),
        ):
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "Python" not in plan

    def test_bm25_explodes_only_filtered_hits(self, spark):
        # the IN-list filter must run INSIDE the array before explode —
        # Generate's input is the filtered lambda, not the raw tokens
        df = _docs(spark, [(1, "a b c")])
        plan = (
            bm25_scores(df, ["a"])
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        gen = [ln for ln in plan.splitlines() if "Generate" in ln]
        assert gen and all("filter(" in ln for ln in gen)
