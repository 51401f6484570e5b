"""Mann-Whitney U (plans/stats.py::stats_mann_whitney_u): the pair-count
U and the tie-corrected normal-approximation z against a brute-force
rank-based pure-Python reference on the same parquet."""

from __future__ import annotations

import math

import pyarrow.parquet as pq

from kafka_avro_pipeline_java_spark.plans import QUERIES


def _ref_mann_whitney(a: list[int], b: list[int]) -> tuple[float, float]:
    """Textbook rank-sum U + tie-corrected z (average ranks over ties)."""
    na, nb = len(a), len(b)
    pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    ranks: dict[int, float] = {}
    tie_term = 0.0
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        t = j - i
        ranks[pooled[i][0]] = (i + 1 + j) / 2  # average rank of the tie run
        tie_term += t**3 - t
        i = j
    r_a = sum(ranks[v] for v in a)
    u = r_a - na * (na + 1) / 2
    n = na + nb
    sigma = math.sqrt(na * nb / 12 * ((n + 1) - tie_term / (n * (n - 1))))
    return u, (u - na * nb / 2) / sigma


def test_mann_whitney_matches_rank_based_reference(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pylist()
    a = [
        round(r["o_totalprice"] * 100)
        for r in t
        if r["o_orderpriority"] == "1-URGENT"
    ]
    b = [
        round(r["o_totalprice"] * 100)
        for r in t
        if r["o_orderpriority"] == "5-LOW"
    ]
    assert a and b
    u_ref, z_ref = _ref_mann_whitney(a, b)
    row = QUERIES["stats_mann_whitney_u"](spark, sf_dir).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["u_stat"] == u_ref
    assert abs(row["z_score"] - z_ref) < 1e-5


def test_mann_whitney_tie_correction_shrinks_sigma(spark, sf_dir):
    # with ties present, the corrected sigma is strictly smaller, so the
    # corrected |z| must be strictly LARGER than the no-ties formula's
    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pylist()
    a = [
        round(r["o_totalprice"] * 100)
        for r in t
        if r["o_orderpriority"] == "1-URGENT"
    ]
    b = [
        round(r["o_totalprice"] * 100)
        for r in t
        if r["o_orderpriority"] == "5-LOW"
    ]
    row = QUERIES["stats_mann_whitney_u"](spark, sf_dir).collect()[0]
    na, nb, u = len(a), len(b), row["u_stat"]
    if len(set(a) | set(b)) == na + nb:  # no ties at this SF: z equal
        return
    z_no_ties = (u - na * nb / 2) / math.sqrt(
        na * nb * (na + nb + 1) / 12
    )
    assert abs(row["z_score"]) >= abs(z_no_ties)


def _load_priority_split(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pylist()
    a = [
        round(r["o_totalprice"] * 100)
        for r in t
        if r["o_orderpriority"] == "1-URGENT"
    ]
    b = [
        round(r["o_totalprice"] * 100)
        for r in t
        if r["o_orderpriority"] == "5-LOW"
    ]
    return a, b


def test_ks_two_sample_matches_bruteforce_cdf_gap(spark, sf_dir):
    a, b = _load_priority_split(sf_dir)
    na, nb = len(a), len(b)
    ca = cb = 0
    ia = ib = 0
    a.sort(), b.sort()
    d = 0
    # exact integer numerator max|ca*nb - cb*na| over the merged values
    for v in sorted(set(a) | set(b)):
        while ia < na and a[ia] == v:
            ca, ia = ca + 1, ia + 1
        while ib < nb and b[ib] == v:
            cb, ib = cb + 1, ib + 1
        d = max(d, abs(ca * nb - cb * na))
    row = QUERIES["stats_ks_two_sample"](spark, sf_dir).collect()[0]
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert abs(row["d_stat"] - d / (na * nb)) < 1e-6


def test_spearman_matches_bruteforce_rank_pearson(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"],
    ).to_pylist()
    qa = [int(r["l_quantity"]) for r in t]
    vb = [round(r["l_extendedprice"] * 100) for r in t]

    def avg_ranks(xs):
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        ranks = [0.0] * len(xs)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and xs[order[j]] == xs[order[i]]:
                j += 1
            r = (i + 1 + j) / 2
            for k in range(i, j):
                ranks[order[k]] = r
            i = j
        return ranks

    ra, rb = avg_ranks(qa), avg_ranks(vb)
    n = len(ra)
    sa, sb = sum(ra), sum(rb)
    saa = sum(x * x for x in ra)
    sbb = sum(x * x for x in rb)
    sab = sum(x * y for x, y in zip(ra, rb))
    rho = (n * sab - sa * sb) / (
        math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
    )
    row = QUERIES["stats_spearman_corr"](spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["rho"] - rho) < 1e-6


def test_kendall_tau_matches_bruteforce_pairs(spark, sf_dir):
    import numpy as np

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_discount"]
    )
    x = np.array([int(v) for v in t["l_quantity"].to_pylist()])
    y = np.array([round(v * 100) for v in t["l_discount"].to_pylist()])
    n = len(x)
    # vectorized exact pair counting over all n(n-1)/2 pairs
    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    prod = dx * dy
    iu = np.triu_indices(n, k=1)
    conc = int((prod[iu] > 0).sum())
    disc = int((prod[iu] < 0).sum())
    tx = int((dx[iu] == 0).sum())
    ty = int((dy[iu] == 0).sum())
    half = n * (n - 1) // 2
    tau = (conc - disc) / (
        math.sqrt(half - tx) * math.sqrt(half - ty)
    )
    row = QUERIES["stats_kendall_tau"](spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert (row["concordant"], row["discordant"]) == (conc, disc)
    assert abs(row["tau_b"] - tau) < 1e-6
