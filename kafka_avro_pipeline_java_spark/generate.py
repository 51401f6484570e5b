"""Seeded, Spark-native random record generator.

Replicates the value domains of the reference's producer (reference
``02-producer/src/main/java/com/exam/worker/AvroProducer.java:97-123``,
``generateValue``):

- int:    uniform 1..100            (``RANDOM.nextInt(100)+1``, :101)
- long:   epoch millis              (``System.currentTimeMillis()``, :104)
- float:  uniform [0,1) @ 3 dp      (:106)
- double: uniform [0,1) @ 6 dp      (:109)
- string: 6 chars of [A-Za-z]       (:35, :111-118)

Differences by design (SURVEY.md §7.3): the reference uses an unseeded
``java.util.Random`` — irreproducible; we seed everything. Long fields get
monotonically increasing millis from a fixed origin instead of wall-clock,
so runs are deterministic. Unsupported types raise, matching the producer's
``IllegalArgumentException`` (:120-121).

Parallelism comes from ``spark.range(n, numPartitions=p)`` — partitions
replace the reference's 15-thread pool (``02-producer/Main.java:45-49``);
the same code shape scales to any executor count with zero changes.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# deterministic origin for "timestamp" longs: 2024-01-01T00:00:00Z in millis
TS_ORIGIN_MILLIS = 1_704_067_200_000

GENERATABLE_TYPES = ("int", "long", "float", "double", "string")


_CHARSET = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def _random_alpha6(seed: int) -> Column:
    """6 chars uniform over [A-Za-z] (52 letters), reference charset :35.

    The random index must appear exactly ONCE in the expression tree: each
    ``rand()`` instance keeps independent state that advances only when
    evaluated, so branching constructs (``when``) over multiple instances
    desynchronize. ``substr`` into a charset literal references it once."""
    chars = []
    for j in range(6):
        idx = F.floor(F.rand(seed + j) * 52).cast("int")
        chars.append(F.lit(_CHARSET).substr(idx + F.lit(1), F.lit(1)))
    return F.concat(*chars)


def generated_value(avro_type: str, field_index: int, seed: int) -> Column:
    s = seed + 1009 * field_index
    if avro_type == "int":
        return (F.floor(F.rand(s) * 100) + 1).cast("int")
    if avro_type == "long":
        return (F.lit(TS_ORIGIN_MILLIS) + F.col("__rid")).cast("long")
    if avro_type == "float":
        return F.round(F.rand(s), 3).cast("float")
    if avro_type == "double":
        return F.round(F.rand(s), 6)
    if avro_type == "string":
        return _random_alpha6(s)
    raise ValueError(
        f"unsupported Avro type for generation: {avro_type!r} "
        f"(reference supports {GENERATABLE_TYPES})"
    )


def generate_dataset(
    spark: SparkSession,
    avro_schema: dict[str, Any],
    n_rows: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Random records for one Avro schema, in schema field order."""
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, numPartitions=num_partitions).withColumnRenamed(
        "id", "__rid"
    )
    cols = [
        generated_value(f["type"], i, seed).alias(f["name"])
        for i, f in enumerate(avro_schema["fields"])
    ]
    return base.select(*cols)
