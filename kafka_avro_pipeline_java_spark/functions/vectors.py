"""Vector column expressions over ``array<float|double>`` columns.

All JVM-side (``zip_with`` / ``aggregate`` / ``transform``) — no Python UDFs,
so these stay inside whole-stage codegen and scale linearly with executors.
Accumulation is in DOUBLE regardless of the input element type so results
are stable and match a DuckDB oracle that also accumulates in double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def lcg_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1)^dim via a 64-bit
    LCG — no numpy RNG state, reproducible across engines, and the exact
    float values can be embedded as literals in an oracle SQL string."""
    planes, state = [], seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append((state >> 33) / float(1 << 31) - 1.0)
        planes.append(row)
    return planes


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    diff_sq = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(F.aggregate(diff_sq, F.lit(0.0), lambda acc, x: acc + x))


def _dlit(x: float) -> str:
    # repr() round-trips the exact double; Spark SQL's D suffix forces
    # DoubleType (a bare "0.5" would parse as DECIMAL)
    return repr(float(x)) + "D"


def literal_vector(xs: list[float]) -> Column:
    """array<double> literal built from ONE parsed SQL expression.

    ``F.array(*[F.lit(x) ...])`` (and ``F.lit(list)``, which expands to it)
    costs one py4j round-trip PER ELEMENT — measured ~0.9 ms each, so a
    2,560-element centroid matrix burned ~2.3 s of driver time on every
    query that embedded it. Parsing one SQL string is O(ms) regardless of
    size; the resulting values are bit-identical (repr round-trip)."""
    return F.expr("array(" + ",".join(_dlit(x) for x in xs) + ")")


def literal_matrix(rows: list[list[float]]) -> Column:
    """array<array<double>> literal via one parsed SQL expression (see
    ``literal_vector`` for why not per-element ``F.lit``)."""
    return F.expr(
        "array("
        + ",".join("array(" + ",".join(_dlit(x) for x in r) + ")" for r in rows)
        + ")"
    )
