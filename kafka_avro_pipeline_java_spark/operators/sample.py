"""Bounded deterministic sampling for driver-side model training.

``train_pq`` / ``train_kmeans`` need a few thousand vectors on the driver.
Ranking the whole corpus by hash (``orderBy(xxhash64).limit(n)``) is correct
but makes the sampling job shuffle-rank EVERY row; at 100 TB that is a full
TakeOrdered over the corpus for a 10k-row sample. The two-step here prunes
first: a seeded Bernoulli ``sample()`` keeps ~``oversample*n + slack`` rows
(a scan-local filter — no shuffle, no rank), and only that surviving
fraction is hash-ordered for a deterministic final pick. Plan shape:
Scan → Sample → TakeOrdered(n), with the TakeOrdered input ~n rows instead
of the corpus.

Determinism: ``sample(seed=...)`` is deterministic for a fixed input
partitioning, and the hash order breaks ties identically across runs; the
additive slack makes undershooting ``n`` (Binomial tail) negligible even
for tiny ``n``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounded_hash_sample(
    df: DataFrame,
    cols: list[str],
    n: int,
    seed: int,
    oversample: float = 1.5,
    slack: int = 100,
) -> DataFrame:
    """~``n`` deterministic rows of ``df[cols]`` without ranking the corpus:
    seeded Bernoulli pre-filter to ``oversample*n + slack`` expected rows,
    then hash-order + limit over the survivors only."""
    sel = df.select(*cols)
    cnt = sel.count()  # column-pruned count-star: metadata-cheap on parquet
    if cnt > n:
        frac = min(1.0, (oversample * n + slack) / cnt)
        if frac < 1.0:
            sel = sel.sample(fraction=frac, seed=seed)
    order = F.xxhash64(*[F.col(c).cast("string") for c in cols], F.lit(seed))
    return sel.orderBy(order).limit(n)
