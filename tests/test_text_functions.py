"""Text-function unit tests: rolling-hash order sensitivity and
fingerprint whitespace canonicalization."""

from kafka_avro_pipeline_java_spark.functions import text as T


def _one(spark, s: str, expr):
    return spark.createDataFrame([(s,)], "t string").select(expr("t").alias("v")).first()["v"]


def test_rolling_hash_is_order_sensitive(spark):
    """Same token multiset, different order → different hash (the property
    that distinguishes rolling_hash from the md5 set-style fingerprint)."""
    h_ab = _one(spark, "alpha beta gamma", T.rolling_hash)
    h_ba = _one(spark, "gamma beta alpha", T.rolling_hash)
    assert h_ab != h_ba


def test_rolling_hash_deterministic_and_case_folded(spark):
    assert _one(spark, "Alpha Beta", T.rolling_hash) == _one(spark, "alpha beta", T.rolling_hash)
    assert _one(spark, "alpha beta", T.rolling_hash) == _one(spark, "alpha beta", T.rolling_hash)


def test_rolling_hash_sensitive_to_extra_token(spark):
    assert _one(spark, "alpha beta", T.rolling_hash) != _one(spark, "alpha beta beta", T.rolling_hash)


def test_fingerprint_canonicalizes_whitespace_but_not_order(spark):
    """The md5 fingerprint collapses runs of whitespace and case, but stays
    order-sensitive (it hashes the normalized SEQUENCE)."""
    assert _one(spark, "a  b\tc", T.fingerprint) == _one(spark, "a b c", T.fingerprint)
    assert _one(spark, "a b c", T.fingerprint) != _one(spark, "c b a", T.fingerprint)
