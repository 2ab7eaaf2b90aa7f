"""Hand-computed goldens for the round-6 operators: substring-level
dedup spans, k-core peel, group-aware split + leakage audit, and
sequence-packing stats. (Oracle parity for the catalog rows is in
test_oracle_parity.py; these pin the SEMANTICS on inputs small enough
to verify by hand.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordoccurences_spark.dedup.substrings import (
    duplicate_window_spans,
    window_hashes,
)
from mapreducewordoccurences_spark.operators.graph import kcore_membership


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestDuplicateWindowSpans:
    def test_shared_run_produces_one_merged_span(self, spark):
        # docs 1 and 2 share tokens a1..a12 (12 tokens): with L=10
        # that's 3 duplicated windows at positions 0,1,2 in doc 1
        # (offset 1 in doc 2) merging into ONE span covering 12 tokens
        shared = " ".join(f"a{i}" for i in range(12))
        docs = _docs(
            spark,
            [
                (1, shared + " tailone tailtwo"),
                (2, "leadword " + shared),
                (3, "completely different words " * 5),
            ],
        )
        got = {
            r["doc_id"]: (r["n_spans"], r["n_dup_windows"], r["dup_tokens"])
            for r in duplicate_window_spans(docs, window=10).collect()
        }
        assert got == {1: (1, 3, 12), 2: (1, 3, 12)}

    def test_two_separate_spans_do_not_merge(self, spark):
        run1 = " ".join(f"x{i}" for i in range(10))
        run2 = " ".join(f"y{i}" for i in range(10))
        gap = " ".join(f"gapa{i}" for i in range(5))
        gap2 = " ".join(f"gapb{i}" for i in range(5))
        docs = _docs(
            spark,
            [(1, f"{run1} {gap} {run2}"), (2, f"{run2} {gap2} {run1}")],
        )
        got = {
            r["doc_id"]: (r["n_spans"], r["dup_tokens"])
            for r in duplicate_window_spans(docs, window=10).collect()
        }
        assert got == {1: (2, 20), 2: (2, 20)}

    def test_within_doc_repeat_is_not_cross_doc(self, spark):
        run = " ".join(f"r{i}" for i in range(10))
        docs = _docs(
            spark,
            [(1, f"{run} middleword {run}"), (2, "unrelated text entirely")],
        )
        assert duplicate_window_spans(docs, window=10).count() == 0

    def test_window_positions_are_dense(self, spark):
        docs = _docs(spark, [(1, " ".join(f"w{i}" for i in range(13)))])
        rows = window_hashes(docs, window=10).collect()
        assert sorted(r["pos"] for r in rows) == [0, 1, 2, 3]


class TestKcoreMembership:
    def test_triangle_survives_chain_peels(self, spark):
        # chain 1-2-3 (peels at k=2) + triangle 4-5-6 (2-core)
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5), (5, 6), (4, 6)], "doc_a bigint, doc_b bigint"
        )
        got = {
            r["node"]: r["core_degree"]
            for r in kcore_membership(edges, k=2, iterations=4).collect()
        }
        assert got == {4: 2, 5: 2, 6: 2}

    def test_pendant_peel_cascades(self, spark):
        # path 1-2-3-4: first round peels 1 and 4, second peels 2,3
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "doc_a bigint, doc_b bigint"
        )
        assert kcore_membership(edges, k=2, iterations=4).count() == 0
        # ...but a single round has not converged yet: 2,3 still alive
        assert kcore_membership(edges, k=2, iterations=1).count() == 2

    def test_k1_keeps_every_connected_node(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (3, 3)], "doc_a bigint, doc_b bigint"
        )  # self-loop dropped
        got = {
            r["node"]: r["core_degree"]
            for r in kcore_membership(edges, k=1, iterations=3).collect()
        }
        assert got == {1: 1, 2: 1}


class TestGroupSplitAndPacking:
    def test_group_split_never_splits_a_source(self, spark):
        from mapreducewordoccurences_spark.functions.sampling import hash_split

        df = spark.createDataFrame(
            [(i, f"src{i % 7}") for i in range(200)], "doc_id bigint, source string"
        )
        out = hash_split(df, id_col="source", salt="grp")
        per_src = out.groupBy("source").agg(
            F.count_distinct("split").alias("k")
        )
        assert per_src.where(F.col("k") > 1).count() == 0

    def test_packing_hand_example(self, spark):
        from mapreducewordoccurences_spark.queries import QUERIES
        import tempfile, os, shutil

        d = tempfile.mkdtemp(prefix="packing_")
        try:
            # source s: token counts 300, 300, 100 in doc_id order →
            # total 700, chunks 2, waste 324, doc 2 straddles the 512
            # boundary (spans tokens [300, 600))
            rows = [
                (1, " ".join(["tok"] * 300), "s"),
                (2, " ".join(["tok"] * 300), "s"),
                (3, " ".join(["tok"] * 100), "s"),
            ]
            spark.createDataFrame(
                rows, "doc_id bigint, text string, source string"
            ).write.parquet(os.path.join(d, "documents.parquet"))
            out = QUERIES["sequence_packing_stats"](spark, d).collect()
            assert len(out) == 1
            r = out[0]
            assert (
                r["n_docs"],
                r["total_tokens"],
                r["n_chunks"],
                r["waste_tokens"],
                r["n_straddling_docs"],
            ) == (3, 700, 2, 324, 1)
            assert abs(r["fill_rate"] - 700 / 1024) < 1e-12
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestProductQuantization:
    def test_codes_within_codebook_and_complete(self, spark):
        from mapreducewordoccurences_spark.functions.similarity import (
            pq_codebooks,
            pq_encode,
        )
        from mapreducewordoccurences_spark.sources.readers import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        n = emb.count()
        books = pq_codebooks(emb, m=8, ks=16)
        codes = pq_encode(emb, books, m=8)
        # every vector gets exactly m codes, each a valid codeword id
        assert codes.count() == n * 8
        bad = codes.where((F.col("__code") < 0) | (F.col("__code") >= 16))
        assert bad.count() == 0
        per_vec = codes.groupBy("vec_id").count().where("count <> 8")
        assert per_vec.count() == 0

    def test_rerank_recall_vs_exact(self, spark):
        from mapreducewordoccurences_spark.functions.similarity import (
            brute_force_knn,
            pq_knn_rerank,
        )
        from mapreducewordoccurences_spark.sources.readers import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = emb.where(F.col("vec_id") < 10)
        approx = pq_knn_rerank(emb, q, k=5, shortlist=100, m=16, ks=16)
        exact = brute_force_knn(emb, q, k=5)
        hits = (
            approx.select("query_id", "neighbor_id")
            .join(exact.select("query_id", "neighbor_id"),
                  ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .count()
        )
        rec = {r["query_id"]: r["count"] / 5 for r in hits.collect()}
        assert len(rec) == 10
        assert min(rec.values()) >= 0.8  # observed 1.0; margin for seeds
