"""BPE trainer (operators/bpe.py) vs an independent pure-Python reference
implementing the same Sennrich rules: char symbols + '</w>' word-final
marker, count-weighted pair stats, lexicographic tiebreak, greedy
left-to-right non-overlapping merges."""

from collections import Counter

from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators import bpe


# ----- pure-Python reference ------------------------------------------------
def _py_syms(word):
    return [*word[:-1], word[-1] + "</w>"]


def _py_merge(seq, a, b):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _py_train(texts, n_merges, min_count=2):
    wc = Counter(w for t in texts for w in t.lower().split())
    seqs = {w: _py_syms(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, c in wc.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        # deterministic: max count, then lexicographically smallest pair
        top_n = max(pc.values())
        best = min(p for p, n in pc.items() if n == top_n)
        if top_n < min_count:
            break
        merges.append(best)
        seqs = {w: _py_merge(s, *best) for w, s in seqs.items()}
    return merges, seqs


TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest wide",
    "low new wide lowest newest",
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_bpe_merges_match_reference(spark):
    want, _ = _py_train(TEXTS, n_merges=8)
    got = bpe.train_bpe(_df(spark), "text", n_merges=8)
    assert got == want


def test_bpe_apply_matches_reference_segmentation(spark):
    merges, seqs = _py_train(TEXTS, n_merges=8)
    out = bpe.apply_bpe(_df(spark), "text", "doc_id", merges)
    got = {r.id: r.subwords for r in out.collect()}
    for i, t in enumerate(TEXTS):
        want = [s for w in t.lower().split() for s in seqs[w]]
        assert got[i] == want, f"doc {i}: {got[i]} != {want}"


def test_bpe_apply_reconstructs_text(spark):
    merges = bpe.train_bpe(_df(spark), "text", n_merges=5)
    out = bpe.apply_bpe(_df(spark), "text", "doc_id", merges)
    joined = out.select(
        "id",
        F.replace(
            F.concat_ws("", "subwords"), F.lit("</w>"), F.lit(" ")
        ).alias("rebuilt"),
    )
    got = {r.id: r.rebuilt.strip() for r in joined.collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == " ".join(t.lower().split())
