"""Skew hardening for the near-dup component resolver: a planted 100:1
hot component must (a) still resolve to correct labels under the salted
propagation, and (b) spread its join fan-in across tasks instead of
landing in one — the bound SCALE.md cites for the dedup/graph shuffles."""

import pytest
from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators.dedup import (
    connected_components,
)

HUB_DEGREE = 2000  # vs 3-node chains: >100:1 component-size skew


def _skewed_pairs(spark):
    # star: hub 0 — {1..2000}; plus 50 disjoint 3-node chains
    star = [(0, i) for i in range(1, HUB_DEGREE + 1)]
    chains = []
    for c in range(50):
        base = 10_000 + 10 * c
        chains += [(base, base + 1), (base + 1, base + 2)]
    return spark.createDataFrame(star + chains, "id_a long, id_b long")


def _expected_labels():
    want = {0: 0}
    for i in range(1, HUB_DEGREE + 1):
        want[i] = 0
    for c in range(50):
        base = 10_000 + 10 * c
        for off in range(3):
            want[base + off] = base
    return want


@pytest.mark.parametrize("salts", [None, 8])
def test_salted_labels_match_unsalted(spark, salts):
    pairs = _skewed_pairs(spark)
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            pairs, local_threshold=0, salt_partitions=salts
        ).collect()
    }
    assert got == _expected_labels()


def test_hub_fanin_spreads_across_partitions(spark):
    """The propagation round's join keys on dst: unsalted, every edge of
    the hub's star lands in ONE task; salted on hash(src) with the label
    table replicated 8 ways, the same fan-in must occupy >=4 partitions
    with no partition holding more than half the hub's rows."""
    pairs = _skewed_pairs(spark)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                    F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    labels = edges.select("src").distinct().select(
        F.col("src").alias("id"), F.col("src").alias("component")
    )
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    # AQE's small-partition coalescing would legitimately re-merge the
    # salted splits at this toy size; disable it so the test observes the
    # raw shuffle placement the salt produces at scale
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        def hub_partition_counts(joined):
            return (
                joined.filter(F.col("id") == 0)
                .select(F.spark_partition_id().alias("p"))
                .groupBy("p")
                .count()
                .collect()
            )

        unsalted = edges.join(labels, edges.dst == labels.id)
        counts_u = hub_partition_counts(unsalted)
        assert len(counts_u) == 1  # the whole star fan-in in one task
        assert counts_u[0]["count"] == HUB_DEGREE

        n_salts = 8
        e_s = edges.withColumn("__esalt", F.pmod(F.hash("src"), F.lit(n_salts)))
        l_s = labels.withColumn(
            "__lsalt",
            F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
        )
        salted = e_s.join(
            l_s, (e_s.dst == l_s.id) & (e_s.__esalt == l_s.__lsalt)
        )
        counts_s = hub_partition_counts(salted)
        assert len(counts_s) >= 4  # fan-in split across tasks
        assert max(r["count"] for r in counts_s) <= HUB_DEGREE // 2
        assert sum(r["count"] for r in counts_s) == HUB_DEGREE  # no loss
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


# --------------------------------------------------------------------------
# Embedding LSH heavy-bucket cap (operators/dedup.py::
# embedding_near_pairs_bucketed max_bucket): a planted near-identical
# cluster larger than the cap must degrade to anchor-star linking —
# candidates linear in the cluster size, not quadratic — while still
# resolving to ONE connected component for keep-one dedup.
# --------------------------------------------------------------------------
CLUSTER = 500  # > max_bucket=100: every band's bucket goes heavy


def _planted_cluster(spark):
    """500 near-identical vectors (one giant LSH bucket in every band) +
    40 well-separated scatter vectors, dim 16, deterministic."""
    import random

    rng = random.Random(11)
    center = [rng.gauss(0, 1) for _ in range(16)]
    rows = [
        (i, [x + rng.gauss(0, 0.01) for x in center]) for i in range(CLUSTER)
    ]
    for j in range(40):
        rows.append((10_000 + j, [rng.gauss(0, 1) for _ in range(16)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_heavy_bucket_cap_is_subquadratic(spark):
    """Uncapped, the 500-cluster contributes C(500,2) = 124,750 verified
    pairs; with max_bucket=100 the giant bucket degrades to anchor-star
    linking (noise-flipped signs also strand a few mates in small
    satellite buckets, whose light-path all-pairs stay under cap²), so the
    total must respect the documented n·(max_bucket + bands) linear bound
    — measured 6,855 here, 18× under quadratic — and every mate must still
    link to the min-id anchor for component resolution."""
    from kafka_avro_pipeline_java_spark.functions.vectors import lcg_planes
    from kafka_avro_pipeline_java_spark.operators import dedup

    df = _planted_cluster(spark)
    planes = lcg_planes(64, 16, seed=42)
    pairs = dedup.embedding_near_pairs_bucketed(
        df, "embedding", "vec_id", planes, threshold=0.9, bands=4, max_bucket=100
    ).collect()
    cluster_pairs = {(r["id_a"], r["id_b"]) for r in pairs if r["id_a"] < CLUSTER}
    # the heavy-bucket star: every mate is reachable from the anchor (vec 0)
    anchor_mates = {b for a, b in cluster_pairs if a == 0}
    assert len(anchor_mates) >= CLUSTER * 0.95, (
        f"anchor links only {len(anchor_mates)}/{CLUSTER - 1} mates"
    )
    # the scale bound: linear in n, nowhere near the 124,750 quadratic
    n = CLUSTER + 40
    assert len(cluster_pairs) <= n * (100 + 4), len(cluster_pairs)
    assert len(cluster_pairs) < 0.1 * (CLUSTER * (CLUSTER - 1) // 2)
    # scatter vectors are not near-dups of anything
    assert all(r["id_a"] < CLUSTER for r in pairs)


def test_embedding_heavy_bucket_cap_preserves_components(spark):
    """keep-one dedup over the star-capped pairs must still collapse the
    whole planted cluster to its single anchor survivor."""
    from kafka_avro_pipeline_java_spark.functions.vectors import lcg_planes
    from kafka_avro_pipeline_java_spark.operators import dedup

    df = _planted_cluster(spark)
    planes = lcg_planes(64, 16, seed=42)
    pairs = dedup.embedding_near_pairs_bucketed(
        df, "embedding", "vec_id", planes, threshold=0.9, bands=4, max_bucket=100
    )
    kept = dedup.dedup_keep_one(df, pairs, "vec_id").select("vec_id").collect()
    ids = {r["vec_id"] for r in kept}
    assert 0 in ids and len(ids & set(range(CLUSTER))) == 1  # one survivor
    assert len(ids) == 1 + 40  # all scatter vectors untouched
