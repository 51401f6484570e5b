"""Round-13 property tests: Hilbert-curve correctness (bijection,
unit-step adjacency, three-engine parity), synchronous label-propagation
vs a pure-Python reference, exact ROC-AUC vs brute-force pair counting,
and mutual information vs a direct float computation."""

from __future__ import annotations

import math

import duckdb

from kafka_avro_pipeline_java_spark.plans import QUERIES
from kafka_avro_pipeline_java_spark.sources.layout import hilbert_code_levels


# ---------------------------------------------------------------------------
# Hilbert curve
# ---------------------------------------------------------------------------


def _xy2d(n: int, x: int, y: int) -> int:
    """Independent reference: the classic Wikipedia xy2d bit loop."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_reference_is_a_unit_adjacent_bijection():
    """The reference itself must be a true Hilbert curve: a bijection
    cell -> [0, n^2) where consecutive indices are GRID-ADJACENT (the
    locality property Z-order lacks — Morton jumps at quadrant seams)."""
    n = 16
    d2cell = {}
    for x in range(n):
        for y in range(n):
            d = _xy2d(n, x, y)
            assert d not in d2cell
            d2cell[d] = (x, y)
    assert sorted(d2cell) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = d2cell[d], d2cell[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, d2cell[d], d2cell[d + 1])


def test_hilbert_spark_levels_match_reference(spark):
    """sources/layout.py::hilbert_code_levels reproduces the reference on
    every cell of the 16x16 grid (bits=4 covers all rotate/reflect
    branches — each deeper bit only recurses the same four cases)."""
    bits, n = 4, 16
    cells = [(x * n + y, x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(cells, "k long, sx long, sy long")
    got = {
        r["k"]: r["hcode"]
        for r in hilbert_code_levels(df, "sx", "sy", "hcode", bits=bits).collect()
    }
    for k, x, y in cells:
        assert got[k] == _xy2d(n, x, y), (x, y, got[k])


def test_hilbert_adjacent_codes_are_closer_than_zorder(spark):
    """The reason layout_hilbert_code exists: mean grid distance between
    cells at CONSECUTIVE curve positions is exactly 1.0 for Hilbert
    (unit-adjacent by construction) and > 1 for the Morton/Z-order curve
    on the same grid."""
    from kafka_avro_pipeline_java_spark.sources.layout import morton_code
    from pyspark.sql import functions as F

    bits, n = 4, 16
    cells = [(x * n + y, x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(cells, "k long, sx long, sy long")
    h = {}
    for _, x, y in cells:
        h[_xy2d(n, x, y)] = (x, y)
    z = {}
    zdf = df.select(
        "sx", "sy", morton_code(F.col("sx"), F.col("sy"), bits=bits).alias("z")
    )
    for r in zdf.collect():
        z[r["z"]] = (r["sx"], r["sy"])

    def mean_step(curve):
        steps = [
            abs(curve[d][0] - curve[d + 1][0]) + abs(curve[d][1] - curve[d + 1][1])
            for d in range(n * n - 1)
        ]
        return sum(steps) / len(steps)

    assert mean_step(h) == 1.0
    assert mean_step(z) > 1.0


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------


def _lpa_reference(pairs, rounds):
    """Pure-Python synchronous LPA with the (count desc, label asc)
    tie-break, mirroring plans/graph.py::graph_label_propagation."""
    nbrs: dict[int, list[int]] = {}
    for a, b in pairs:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    labels = {v: v for v in nbrs}
    for _ in range(rounds):
        nxt = {}
        for v, ns in nbrs.items():
            counts: dict[int, int] = {}
            for u in ns:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            nxt[v] = min(counts, key=lambda lb: (-counts[lb], lb))
        labels = nxt
    return labels


def test_lpa_matches_python_reference_on_barbell(spark):
    """Two 4-cliques joined by a bridge edge: LPA must (a) agree with
    the Python reference exactly per node, (b) settle each clique on one
    label. Run through the same join/window loop as the registered query
    by rebuilding it on an in-memory edge list."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    pairs = (
        [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
        + [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
        + [(4, 10)]
    )
    rounds = 4
    expect = _lpa_reference(pairs, rounds)

    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .select("node", F.col("node").alias("label"))
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(rounds):
        cnt = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(edges["dst"].alias("node"), "label")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got == expect
    # each clique converged to a single community
    assert len({got[v] for v in (1, 2, 3, 4)}) == 1
    assert len({got[v] for v in (10, 11, 12, 13)}) == 1


# ---------------------------------------------------------------------------
# exact ROC-AUC
# ---------------------------------------------------------------------------


def test_roc_auc_matches_bruteforce_pair_count(spark, sf_dir):
    """The bucket-CDF rank-sum AUC equals the O(n^2) definition
    P(s_pos > s_neg) + 0.5 P(s_pos = s_neg), computed by brute force
    from the same (y, sq) rows at sf0.001."""
    from kafka_avro_pipeline_java_spark.plans.mlprep import _scored

    rows = _scored(spark, sf_dir).collect()
    pos = sorted(r["sq"] for r in rows if r["y"] == 1)
    neg = sorted(r["sq"] for r in rows if r["y"] == 0)
    assert pos and neg
    # brute force via two pointers over sorted lists (exact, fast enough)
    import bisect

    u2 = 0
    for p in pos:
        lo = bisect.bisect_left(neg, p)
        hi = bisect.bisect_right(neg, p)
        u2 += 2 * lo + (hi - lo)
    expect_auc = u2 / (2.0 * len(pos) * len(neg))

    out = QUERIES["ml_roc_auc_exact"](spark, sf_dir).collect()[0]
    assert out["n_pos"] == len(pos) and out["n_neg"] == len(neg)
    assert abs(out["auc"] - expect_auc) < 1e-6
    assert abs(out["gini"] - (2 * expect_auc - 1)) < 2e-6
    # the generator assigns o_orderstatus uniformly at random (measured
    # |corr| < 0.04 vs price/date/custkey at sf0.001-0.01), so the honest
    # expectation is AUC near 0.5 — the assertion is the EXACT rank-sum
    # identity above, not separability of synthetic labels
    assert 0.4 < out["auc"] < 0.6


# ---------------------------------------------------------------------------
# mutual information
# ---------------------------------------------------------------------------


def test_mutual_information_matches_direct_computation(sf_dir, spark):
    """MI / entropies / NMI from the registered query equal a direct
    float computation over the exact joint counts (DuckDB-sourced), to
    within the 1e-6 output quantization."""
    con = duckdb.connect()
    cells = con.execute(
        f"""SELECT o_orderpriority, o_orderstatus, COUNT(*)
            FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2"""
    ).fetchall()
    n = sum(c for _, _, c in cells)
    nx: dict[str, int] = {}
    ny: dict[str, int] = {}
    for x, y, c in cells:
        nx[x] = nx.get(x, 0) + c
        ny[y] = ny.get(y, 0) + c
    mi = sum(
        c / n * math.log(c * n / (nx[x] * ny[y])) for x, y, c in cells
    )
    hx = -sum(v / n * math.log(v / n) for v in nx.values())
    hy = -sum(v / n * math.log(v / n) for v in ny.values())

    out = QUERIES["features_mutual_information"](spark, sf_dir).collect()[0]
    assert out["n_rows"] == n
    assert abs(out["mi_nats"] - mi) < 2e-6
    assert abs(out["h_priority"] - hx) < 2e-6
    assert abs(out["h_status"] - hy) < 2e-6
    assert abs(out["nmi"] - mi / min(hx, hy)) < 2e-6


# ---------------------------------------------------------------------------
# referential orphans detect a seeded violation
# ---------------------------------------------------------------------------


def test_orphan_audit_counts_seeded_orphans(spark, tmp_path, sf_dir):
    """On the clean corpus every edge reports zero orphans; after seeding
    two orphan lineitem rows into a copy, the audit reports exactly 2 on
    the lineitem->orders edge (the audit must COUNT, not just flag)."""
    import shutil

    from pyspark.sql import functions as F

    out = {
        r["edge"]: r
        for r in QUERIES["quality_referential_orphans"](spark, sf_dir).collect()
    }
    assert len(out) == 6
    assert all(r["n_orphans"] == 0 and r["orphan_ppm"] == 0 for r in out.values())

    work = tmp_path / "sf"
    work.mkdir()
    for t in ("customer", "lineitem", "orders", "part", "supplier", "nation"):
        shutil.copy(f"{sf_dir}/{t}.parquet", work / f"{t}.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    seeded = li.limit(2).withColumn("l_orderkey", F.lit(-999999).cast("long"))
    li.unionByName(seeded).coalesce(1).write.mode("overwrite").parquet(
        str(work / "lineitem.parquet")
    )
    out2 = {
        r["edge"]: r
        for r in QUERIES["quality_referential_orphans"](
            spark, str(work)
        ).collect()
    }
    assert out2["lineitem.l_orderkey->orders"]["n_orphans"] == 2
    assert out2["orders.o_custkey->customer"]["n_orphans"] == 0


# ---------------------------------------------------------------------------
# PCA snapshot provenance
# ---------------------------------------------------------------------------


def test_pca_snapshot_matches_trainer(spark):
    """plans/pca_snapshot.py must stay exactly what
    operators/pca.py::top_components(k=2) produces on the sf0.01
    embeddings (the provenance re-assertion the ivf snapshot carries in
    tests/test_similarity.py): re-train and compare within 1e-6."""
    import numpy as np

    from kafka_avro_pipeline_java_spark.operators import pca
    from kafka_avro_pipeline_java_spark.plans.pca_snapshot import (
        PCA_COMPONENTS_SF001,
        PCA_EIGENVALUES_SF001,
        PCA_MEAN_DOT_SF001,
    )
    from kafka_avro_pipeline_java_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    vals, vecs, mu = pca.top_components(e, "embedding", k=2)
    assert np.allclose(vals, PCA_EIGENVALUES_SF001, atol=1e-6)
    assert np.allclose(vecs, np.array(PCA_COMPONENTS_SF001), atol=1e-6)
    assert np.allclose(
        [float(mu @ vecs[0]), float(mu @ vecs[1])],
        PCA_MEAN_DOT_SF001,
        atol=1e-6,
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints
# ---------------------------------------------------------------------------


def _winnow_reference(text: str, k: int = 4, w: int = 4) -> list[int]:
    """Pure-Python winnowing with the same portable token hash."""
    import hashlib

    M = (1 << 31) - 1
    toks = text.strip().lower().split()
    th = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % M for t in toks]
    grams = [
        __import__("functools").reduce(lambda h, x: (h * 257 + x) % M, g, 0)
        for g in (th[i : i + k] for i in range(len(th) - k + 1))
    ] if len(th) >= k else []
    if len(grams) < w:
        return []
    sel = []
    seen = set()
    for j in range(len(grams) - w + 1):
        m = min(grams[j : j + w])
        if m not in seen:
            seen.add(m)
            sel.append(m)
    return sel


def test_winnowing_matches_python_reference_and_guarantee(spark):
    """The Spark winnowing pipeline equals the Python reference per doc
    (count + xor), and the winnowing GUARANTEE holds: two documents
    sharing a run of >= k+w-1 tokens share >= 1 fingerprint."""
    import functools

    from pyspark.sql import functions as F

    from kafka_avro_pipeline_java_spark.functions import text as T

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three alpha beta gamma delta epsilon zeta xx yy"),
        (3, "short doc"),          # < k tokens -> no fingerprints
        (4, "a b c d"),            # exactly k tokens, 1 gram < w -> none
        (5, "x " * 20),            # repeated token: distinct collapses
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    th = df.select("doc_id", T.winnowing_token_hashes("text").alias("th"))
    grams = th.select("doc_id", T.winnowing_fingerprints("th").alias("gh"))
    sel = grams.select("doc_id", T.winnowing_select("gh").alias("fps"))
    got = {r["doc_id"]: sorted(r["fps"]) for r in sel.collect()}
    for doc_id, text in docs:
        expect = sorted(_winnow_reference(text))
        assert got[doc_id] == expect, (doc_id, got[doc_id], expect)
    # guarantee: docs 1 and 2 share the 7-token run "alpha..zeta"
    assert set(got[1]) & set(got[2])
    # degenerate docs select nothing
    assert got[3] == [] and got[4] == []


def test_embedding_bucketed_shared_base_matches_default(spark):
    """The `base` override of embedding_near_pairs_bucketed (one shared
    plane-dot scan, sliced per detector — the capture-recapture
    optimization) must produce EXACTLY the pairs and cosines of the
    default per-call derivation, for both plane halves."""
    import random

    from pyspark.sql import functions as F

    from kafka_avro_pipeline_java_spark.functions.vectors import (
        lcg_planes,
        norm,
    )
    from kafka_avro_pipeline_java_spark.operators import dedup
    from kafka_avro_pipeline_java_spark.operators.similarity import plane_dots

    rng = random.Random(7)
    center = [rng.gauss(0, 1) for _ in range(16)]
    rows = [(i, [x + rng.gauss(0, 0.02) for x in center]) for i in range(25)]
    rows += [(200 + j, [rng.gauss(0, 1) for _ in range(16)]) for j in range(25)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = lcg_planes(64, 16, seed=42)
    half = len(planes) // 2
    shared = (
        df.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").alias("v"),
            norm("embedding").alias("nrm"),
            plane_dots("embedding", planes).alias("__pd_all"),
        )
        .repartition(4)
        .localCheckpoint(eager=False)
    )
    for lo, hi, sl in (
        (0, half, F.slice("__pd_all", 1, half)),
        (half, len(planes), F.slice("__pd_all", half + 1, half)),
    ):
        want = {
            (r["id_a"], r["id_b"], r["cos_sim"])
            for r in dedup.embedding_near_pairs_bucketed(
                df, "embedding", "vec_id", planes[lo:hi],
                threshold=0.9, bands=2, max_bucket=100,
            ).collect()
        }
        got = {
            (r["id_a"], r["id_b"], r["cos_sim"])
            for r in dedup.embedding_near_pairs_bucketed(
                df, "embedding", "vec_id", planes[lo:hi],
                threshold=0.9, bands=2, max_bucket=100,
                base=shared.select("id", "v", "nrm", sl.alias("__pd")),
            ).collect()
        }
        assert want and got == want, (lo, hi, len(want), len(got))


# ---------------------------------------------------------------------------
# load_table schema cache (r13 optimization round)
# ---------------------------------------------------------------------------


def test_load_table_relation_memo_is_transparent(spark, sf_dir):
    """The per-(app, path) base-relation memo must change NOTHING
    observable: the warm (memoized) read returns the same schema and the
    same rows as the cold (freshly resolved) read, and two sf_dirs never
    share an entry. The memo holds a logical plan over file metadata —
    rows always come from the parquet scan at execution."""
    import os

    from kafka_avro_pipeline_java_spark.sources import tables as T

    app = spark.sparkContext.applicationId
    for name in ("orders", "events"):  # events exercises the ts normalizer
        key = (app, os.path.join(sf_dir, f"{name}.parquet"))
        T._RELATION_CACHE.pop(key, None)
        cold = T.load_table(spark, sf_dir, name)
        assert key in T._RELATION_CACHE  # first read populated the memo
        warm = T.load_table(spark, sf_dir, name)
        assert warm.schema == cold.schema
        key_col = cold.columns[0]
        cold_rows = cold.orderBy(key_col).limit(20).collect()
        warm_rows = warm.orderBy(key_col).limit(20).collect()
        assert warm_rows == cold_rows
    # keys carry the full path: a second sf_dir gets its own entry, so a
    # sweep across scale factors can never serve one directory's relation
    # for another's files
    other = "/root/testdata/sf0.01"
    T.load_table(spark, other, "orders")
    assert (app, os.path.join(other, "orders.parquet")) in T._RELATION_CACHE
