"""Behavioral tests for the round-3 corpus operators: Gopher rules,
unigram-LM scoring, BM25 retrieval, repeated-span dedup, SemDeDup.

Value-exactness vs DuckDB is the driver harness's job (plans/text2.py,
plans/vectors2.py oracles); these tests pin the SEMANTICS on constructed
fixtures where the right answer is known by inspection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.functions.vectors import lcg_planes
from kafka_avro_pipeline_java_spark.operators import (
    quality,
    search,
    semdedup,
    spans,
)

GOOD_DOC = (
    "the quick brown fox jumps over the lazy dog and then runs off to the "
    "woods with a friend that it met while it was out walking and they have "
    "a long chat about the weather and the state of the world before going "
    "home to rest for the night because both of them are tired now"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestGopherRules:
    def test_good_doc_passes(self, spark):
        out = quality.gopher_rules(_docs(spark, [(1, GOOD_DOC)]), "text", "doc_id").first()
        assert out["passes_gopher"] == 1
        assert out["n_words"] >= quality.MIN_WORDS
        assert out["stop_hits"] >= 2

    def test_short_doc_fails_word_count(self, spark):
        out = quality.gopher_rules(_docs(spark, [(1, "too short")]), "text", "doc_id").first()
        assert out["passes_gopher"] == 0
        assert out["n_words"] == 2

    def test_symbol_soup_fails_symbol_ratio(self, spark):
        text = " ".join(["the of and that have with be to"] * 10 + ["#"] * 20)
        out = quality.gopher_rules(_docs(spark, [(1, text)]), "text", "doc_id").first()
        assert out["symbol_ratio"] > quality.MAX_SYMBOL_RATIO
        assert out["passes_gopher"] == 0

    def test_bullet_list_fails_bullet_frac(self, spark):
        text = "\n".join(f"- item {i} " + GOOD_DOC for i in range(10))
        out = quality.gopher_rules(_docs(spark, [(1, text)]), "text", "doc_id").first()
        assert out["bullet_frac"] == 1.0
        assert out["passes_gopher"] == 0

    def test_no_stopwords_fails(self, spark):
        text = " ".join(f"w{i}" for i in range(60))
        out = quality.gopher_rules(_docs(spark, [(1, text)]), "text", "doc_id").first()
        assert out["stop_hits"] == 0
        assert out["passes_gopher"] == 0


class TestUnigramLogprob:
    def test_uniform_corpus_scores_log_inverse_vocab(self, spark):
        # 4 docs of one distinct token each -> every token has p = 1/4.
        d = _docs(spark, [(i, f"tok{i}") for i in range(4)])
        rows = quality.unigram_logprob(d, "text", "doc_id").collect()
        for r in rows:
            assert r["mean_logprob"] == pytest.approx(round(math.log(0.25), 4))

    def test_rare_token_doc_scores_lower(self, spark):
        d = _docs(spark, [(1, "common common common common"), (2, "rareword")])
        out = {r["id"]: r["mean_logprob"] for r in
               quality.unigram_logprob(d, "text", "doc_id").collect()}
        assert out[2] < out[1]

    def test_case_folded(self, spark):
        d = _docs(spark, [(1, "Word word WORD")])
        row = quality.unigram_logprob(d, "text", "doc_id").first()
        # one vocab entry with count 3 => p = 1 => logprob 0
        assert row["mean_logprob"] == 0.0


class TestBM25:
    def test_matching_doc_ranks_first(self, spark):
        d = _docs(spark, [
            (1, "spark shuffle join " + " ".join(["filler"] * 20)),
            (2, " ".join(["filler"] * 20)),
            (3, "spark spark spark shuffle " + " ".join(["filler"] * 20)),
        ])
        out = search.bm25_topk(spark, d, "text", "doc_id", ["spark", "shuffle"], k=3).collect()
        assert [r["id"] for r in out] == [3, 1]  # doc 2 never matches
        assert out[0]["bm25"] > out[1]["bm25"]

    def test_tf_saturation(self, spark):
        # BM25's tf term saturates: 100 copies is NOT 100x the score of 1.
        d = _docs(spark, [
            (1, "term " + " ".join(["x"] * 50)),
            (2, " ".join(["term"] * 100) + " " + " ".join(["x"] * 50)),
            (3, " ".join(["y"] * 50)),
        ])
        out = {r["id"]: r["bm25"] for r in
               search.bm25_topk(spark, d, "text", "doc_id", ["term"], k=3).collect()}
        assert out[2] > out[1]
        assert out[2] < out[1] * (1 + 1 / 1.2) * 1.5  # bounded by (k1+1)/k1 asymptote

    def test_k_limits_results(self, spark):
        d = _docs(spark, [(i, "hit " + " ".join(["x"] * 10)) for i in range(20)])
        assert search.bm25_topk(spark, d, "text", "doc_id", ["hit"], k=5).count() == 5


class TestRepeatedSpans:
    def test_shared_span_flagged_in_both_docs(self, spark):
        shared = "alpha beta gamma delta epsilon"
        d = _docs(spark, [
            (1, shared + " one two three four five"),
            (2, "six seven eight nine ten " + shared),
            (3, "a b c d e f g h i j"),
        ])
        out = {r["id"]: r for r in spans.span_dup_stats(d, "text", "doc_id", w=5).collect()}
        assert out[1]["n_dup_spans"] >= 1 and out[2]["n_dup_spans"] >= 1
        assert out[3]["n_dup_spans"] == 0
        # doc 3 has 10 tokens -> 6 windows of width 5
        assert out[3]["n_spans"] == 6

    def test_within_doc_repetition_not_cross_doc(self, spark):
        # The same span twice in ONE doc is not cross-doc boilerplate.
        d = _docs(spark, [
            (1, "p q r s t p q r s t"),
            (2, "u v w x y z aa bb cc dd"),
        ])
        out = {r["id"]: r for r in spans.span_dup_stats(d, "text", "doc_id", w=5).collect()}
        assert out[1]["n_dup_spans"] == 0

    def test_short_doc_produces_no_rows(self, spark):
        d = _docs(spark, [(1, "only four tokens here"), (2, "a b c d e f")])
        out = spans.span_dup_stats(d, "text", "doc_id", w=5).collect()
        assert {r["id"] for r in out} == {2}


class TestSemDeDup:
    DIM = 8

    def _vecs(self, spark, rows):
        return spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    def test_keeps_one_per_duplicate_set_within_cluster(self, spark):
        cents = lcg_planes(4, self.DIM, seed=3)
        base = cents[0]
        near = [x * 1.001 for x in base]  # same direction -> same cluster, cos ~1
        other = cents[2]
        d = self._vecs(spark, [(1, base), (2, near), (3, other)])
        kept = semdedup.semantic_dedup(d, "embedding", "vec_id", cents, 0.99)
        ids = {r["id"] for r in kept.collect()}
        assert ids == {1, 3}  # 2 is doomed by its smaller-id twin

    def test_cross_cluster_twins_survive(self, spark):
        # Near-identical vectors in DIFFERENT clusters are never compared —
        # the SemDeDup contract (and its scale bound) is cluster-local.
        cents = [[1.0] + [0.0] * 7, [-1.0] + [0.0] * 7]
        a = [1.0, 0.001] + [0.0] * 6
        b = [-1.0, 0.001] + [0.0] * 6
        d = self._vecs(spark, [(1, a), (2, b)])
        kept = semdedup.semantic_dedup(d, "embedding", "vec_id", cents, 0.5)
        assert kept.count() == 2

    def test_pairs_are_cluster_local_and_ordered(self, spark):
        cents = lcg_planes(4, self.DIM, seed=3)
        d = self._vecs(spark, [(i, [float(i + j) for j in range(self.DIM)]) for i in range(1, 6)])
        pairs = semdedup.semantic_pairs(d, "embedding", "vec_id", cents, -1.0).collect()
        for p in pairs:
            assert p["id_a"] < p["id_b"]


class TestNgramDecontaminate:
    def test_partial_overlap_flagged_whole_doc_not_required(self, spark):
        from kafka_avro_pipeline_java_spark.operators.spans import ngram_decontaminate
        bench_span = "alpha beta gamma delta epsilon"
        d = _docs(spark, [
            (0, bench_span + " benchmark answer text here"),   # bench (id % 2 == 0)
            (1, "totally different words " + bench_span),      # contaminated
            (3, "nothing shared with the benchmark at all ok"),
        ])
        out = ngram_decontaminate(d, "text", "doc_id", F.col("doc_id") % 2 == 0, w=5)
        rows = {r["id"]: r["n_overlap_spans"] for r in out.collect()}
        assert 1 in rows and rows[1] >= 1
        assert 3 not in rows
        assert 0 not in rows  # bench docs are not self-reported

    def test_no_overlap_yields_empty(self, spark):
        from kafka_avro_pipeline_java_spark.operators.spans import ngram_decontaminate
        d = _docs(spark, [
            (0, "a b c d e f g h"),
            (1, "q r s t u v w x"),
        ])
        out = ngram_decontaminate(d, "text", "doc_id", F.col("doc_id") == 0, w=5)
        assert out.count() == 0


class TestImportanceSample:
    def test_weight_one_docs_always_kept_and_deterministic(self, spark):
        from kafka_avro_pipeline_java_spark.operators.quality import importance_sample
        # 100+ alnum words -> length term 1.0, noise 0 -> weight 1.0
        clean = " ".join(f"word{i}" for i in range(120))
        d = _docs(spark, [(i, clean) for i in range(30)])
        out1 = sorted(r["doc_id"] for r in importance_sample(d, "text", "doc_id").collect())
        out2 = sorted(r["doc_id"] for r in importance_sample(d, "text", "doc_id").collect())
        assert out1 == list(range(30))  # weight 1.0 => draw < 1.0 always
        assert out1 == out2

    def test_low_quality_kept_less_often(self, spark):
        from kafka_avro_pipeline_java_spark.operators.quality import importance_sample
        low = "!!! ### $$$ %%%"  # high symbol noise, tiny length
        d = _docs(spark, [(i, low) for i in range(200)])
        kept = importance_sample(d, "text", "doc_id").count()
        assert kept < 100  # weight well below 0.5


class TestTfidfKeywords:
    def test_unique_term_is_top_keyword(self, spark):
        from kafka_avro_pipeline_java_spark.plans import QUERIES  # noqa: F401
        from kafka_avro_pipeline_java_spark.plans.text2 import text_tfidf_keywords  # noqa: F401
        # exercise via operator-shaped inline plan: reuse the query on a temp
        # dir is heavier; assert the math inline instead.
        from pyspark.sql import Window
        from kafka_avro_pipeline_java_spark.functions import text as T
        d = _docs(spark, [
            (1, "shared shared unicorn shared"),
            (2, "shared shared shared common"),
            (3, "shared common common words"),
        ])
        toks = d.select("doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
        tf = toks.groupBy("doc_id", "tok").agg(F.count("*").cast("double").alias("c"))
        dfreq = tf.groupBy("tok").agg(F.count("*").cast("double").alias("d"))
        n = d.agg(F.count("*").cast("double").alias("n_docs"))
        scored = tf.join(dfreq, "tok").crossJoin(F.broadcast(n)).select(
            "doc_id", "tok",
            F.round(F.col("c") * F.log(F.col("n_docs") / F.col("d")), 4).alias("tfidf"))
        win = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
        top1 = {r["doc_id"]: r["tok"] for r in
                scored.withColumn("rn", F.row_number().over(win)).filter("rn = 1").collect()}
        assert top1[1] == "unicorn"  # df=1 dominates the ubiquitous 'shared' (idf 0)


class TestCollocations:
    def test_planted_bigram_has_top_pmi(self, spark, sf_dir):
        import tempfile, os
        from kafka_avro_pipeline_java_spark.plans.text2 import text_collocations
        filler = [f"f{i} g{i} h{i}" for i in range(40)]
        rows = [(i, "new york " + filler[i % 40]) for i in range(8)]
        rows += [(100 + i, " ".join(filler)) for i in range(3)]
        d = _docs(spark, rows)
        with tempfile.TemporaryDirectory() as tmp:
            d.toPandas().to_parquet(os.path.join(tmp, "documents.parquet"))
            out = text_collocations(spark, tmp).collect()
        assert out, "no collocations above count floor"
        top = out[0]
        assert (top["w1"], top["w2"]) == ("new", "york")
        assert top["pmi"] > 0


class TestBigramLogprob:
    def _run(self, spark, rows):
        import tempfile, os
        from kafka_avro_pipeline_java_spark.plans.text3 import text_bigram_logprob
        d = _docs(spark, rows)
        with tempfile.TemporaryDirectory() as tmp:
            d.toPandas().to_parquet(os.path.join(tmp, "documents.parquet"))
            return {r["doc_id"]: r for r in text_bigram_logprob(spark, tmp).collect()}

    def test_word_order_matters_unlike_unigram(self, spark):
        # Four docs use "the cat", one reverses it: the majority word order
        # scores higher even though unigram stats are identical.
        out = self._run(spark, [
            (1, "the cat sat"), (2, "the cat sat"), (3, "the cat sat"),
            (4, "the cat sat"), (5, "cat the sat"),
        ])
        assert out[1]["mean_bigram_logprob"] > out[5]["mean_bigram_logprob"]

    def test_deterministic_sequence_scores_zero(self, spark):
        # A corpus where every history has exactly one continuation:
        # P(w2|w1) = 1 everywhere -> mean log prob 0.
        out = self._run(spark, [(1, "x y z"), (2, "x y z")])
        assert out[1]["mean_bigram_logprob"] == 0.0
        assert out[1]["n_bigrams"] == 2

    def test_single_token_docs_drop_out(self, spark):
        out = self._run(spark, [(1, "only"), (2, "two tokens")])
        assert 1 not in out and 2 in out


class TestHashEmbedding:
    def test_component_sum_equals_token_count_and_is_order_free(self, spark):
        from kafka_avro_pipeline_java_spark.plans.text3 import hash_embedding
        d = _docs(spark, [(1, "red green blue red"), (2, "red red green blue")])
        rows = {r["doc_id"]: r["e"] for r in
                d.select("doc_id", hash_embedding("text").alias("e")).collect()}
        assert sum(rows[1]) == 4.0
        assert rows[1] == rows[2]  # bag-of-words: permutation-invariant

    def test_distinct_vocab_docs_get_different_vectors(self, spark):
        from kafka_avro_pipeline_java_spark.plans.text3 import hash_embedding
        d = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon zeta")])
        rows = {r["doc_id"]: r["e"] for r in
                d.select("doc_id", hash_embedding("text").alias("e")).collect()}
        assert rows[1] != rows[2]


class TestSourceOverlap:
    def test_only_sharing_sources_appear_ordered(self, spark):
        import tempfile, os
        import pandas as pd
        from kafka_avro_pipeline_java_spark.plans.text3 import pipeline_source_overlap
        shared = "one two three four five"
        pdf = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": [shared + " tail a", shared + " tail b", "p q r s t u"],
            "source": ["srcB", "srcA", "srcC"],
        })
        with tempfile.TemporaryDirectory() as tmp:
            pdf.to_parquet(os.path.join(tmp, "documents.parquet"))
            out = pipeline_source_overlap(spark, tmp).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["src_a"], r["src_b"]) == ("srcA", "srcB")  # lexicographic, no dup pair
        # 7-token docs diverging at token 6 share their first TWO 5-token
        # windows ("one..five" and "two..tail"), not just the prefix span
        assert r["shared_spans"] == 2


class TestEmbeddingOutliers:
    def test_planted_orthogonal_outlier_flagged(self, spark):
        import tempfile, os
        import pandas as pd
        from kafka_avro_pipeline_java_spark.plans.vectors2 import (
            _SEM_CENTS,
            embedding_outliers,
        )
        # 60 vectors sitting almost exactly ON known centroids (dist ~ 0)
        # and one negated-centroid outlier (cosine -1 to its best match is
        # impossible; its best centroid is whichever LCG row correlates,
        # still far -> large dist)
        rows = []
        for i in range(60):
            c = _SEM_CENTS[i % 8]
            rows.append((i, [x * (1.0 + 0.001 * (i % 3)) for x in c]))
        rows.append((999, [-x for x in _SEM_CENTS[0]]))
        pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
        with tempfile.TemporaryDirectory() as tmp:
            pdf.to_parquet(os.path.join(tmp, "embeddings.parquet"))
            out = embedding_outliers(spark, tmp).collect()
        ids = {r["vec_id"] for r in out}
        assert 999 in ids
        assert all(r["zscore"] >= 1.5 for r in out)
        assert len(ids) <= 2  # the on-centroid mass is never flagged


class TestSplitDrift:
    def _bucket(self, doc_id: int) -> int:
        import hashlib
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 100

    def test_skewed_test_split_drifts_more_than_val(self, spark):
        import tempfile, os
        import pandas as pd
        from kafka_avro_pipeline_java_spark.plans.text3 import pipeline_split_drift
        train_ids = [i for i in range(3000) if self._bucket(i) < 90][:80]
        val_ids = [i for i in range(3000) if 90 <= self._bucket(i) < 95][:20]
        test_ids = [i for i in range(3000) if self._bucket(i) >= 95][:20]
        assert train_ids and val_ids and test_ids
        base = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [(i, base) for i in train_ids]
        rows += [(i, base) for i in val_ids]                   # same dist as train
        rows += [(i, "qqq www eee rrr ttt yyy uuu iii") for i in test_ids]  # disjoint vocab
        pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
        with tempfile.TemporaryDirectory() as tmp:
            pdf.to_parquet(os.path.join(tmp, "documents.parquet"))
            out = {r["split"]: r["kl_vs_train"] for r in
                   pipeline_split_drift(spark, tmp).collect()}
        assert set(out) == {"val", "test"}
        assert out["test"] > out["val"] * 5  # disjoint vocab drifts hard
        assert out["val"] < 0.1  # same distribution stays near zero


class TestSpanScrub:
    def test_boilerplate_removed_from_all_copies_order_kept(self, spark):
        boiler = "all rights reserved by the company"  # 6 tokens -> 2 windows
        d = _docs(spark, [
            (1, "unique intro words here now " + boiler),
            (2, boiler + " totally different tail content follows"),
            (3, "independent document with no shared spans at all"),
        ])
        out = {r["id"]: r for r in spans.scrub_spans(d, "text", "doc_id", w=5).collect()}
        assert out[1]["scrubbed"] == "unique intro words here now"
        assert out[2]["scrubbed"] == "totally different tail content follows"
        assert out[1]["n_removed"] == 6 and out[2]["n_removed"] == 6
        # untouched doc passes through normalized, zero removed
        assert out[3]["n_removed"] == 0
        assert out[3]["scrubbed"] == "independent document with no shared spans at all"

    def test_fully_boilerplate_doc_drops_out(self, spark):
        boiler = "a b c d e"
        d = _docs(spark, [(1, boiler), (2, boiler), (3, "x y z q w")])
        out = {r["id"] for r in spans.scrub_spans(d, "text", "doc_id", w=5).collect()}
        assert out == {3}

    def test_within_doc_repeat_not_scrubbed(self, spark):
        d = _docs(spark, [
            (1, "p q r s t p q r s t"),
            (2, "m n o aa bb cc dd ee ff gg"),
        ])
        out = {r["id"]: r for r in spans.scrub_spans(d, "text", "doc_id", w=5).collect()}
        assert out[1]["n_removed"] == 0  # self-repetition is not cross-doc
