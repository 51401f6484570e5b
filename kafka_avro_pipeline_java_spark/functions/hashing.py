"""Hashing helpers.

``portable_hash64`` is an md5-derived 64-bit hash expressible identically in
Spark and DuckDB (both expose ``md5(text) -> hex``), used wherever a hash
must be oracle-checkable. Spark's native ``xxhash64`` is faster and is used
in oracle-free paths (MinHash/SimHash internals at scale).

``java_string_hashcode`` reproduces ``java.lang.String.hashCode`` as a
column expression — the reference keys Kafka partitions on
``abs(key.hashCode() % partitionCount)`` (reference
``02-producer/src/main/java/com/exam/worker/AvroProducer.java:82``), and
this gives byte-identical partition placement when parity is wanted. Note
the reference's ``Math.abs`` bug at Integer.MIN_VALUE (SURVEY.md §7.3) is
NOT replicated: we use ``pmod`` which is always non-negative.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column | str) -> Column:
    """First 15 hex chars of md5 as a non-negative BIGINT (60 bits).

    DuckDB equivalent::

        CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def java_string_hashcode(col: Column | str) -> Column:
    """``s.hashCode()`` = sum(s[i] * 31^(n-1-i)) over UTF-16 code units,
    wrapped to 32-bit signed — implemented with aggregate over the char
    array, all JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    # 32-bit wrap: keep the accumulator in long and mask back to int range.
    acc = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda h, ch: (h * 31 + F.ascii(ch)).bitwiseAND(F.lit(0xFFFFFFFF)),
    )
    # reinterpret the low 32 bits as signed int
    return F.when(acc > 0x7FFFFFFF, (acc - 0x100000000).cast("int")).otherwise(
        acc.cast("int")
    )


def partition_for_key(col: Column | str, n_partitions: int) -> Column:
    """Reference partition invariant: same key → same partition, 0..n-1."""
    return F.pmod(java_string_hashcode(col), F.lit(n_partitions))
