"""Connection pool (streaming/db_pool.py): the reference's
MySQLConnectionPool.java contract — bounded size, free-stack reuse,
SELECT-1 liveness with transparent reconnect, return-twice error —
exercised against the wire client + fake MySQL server over real TCP."""

from __future__ import annotations

import pytest

from kafka_avro_pipeline_java_spark.streaming import mysql_wire
from kafka_avro_pipeline_java_spark.streaming.db_pool import (
    DbConnectionPool,
    NotCheckedOutError,
    PoolExhaustedError,
)
from kafka_avro_pipeline_java_spark.streaming.fake_mysql import FakeMySQLServer


@pytest.fixture()
def srv():
    with FakeMySQLServer(password="pw") as s:
        yield s


def _pool(srv, max_size=3):
    return DbConnectionPool(
        lambda: mysql_wire.connect("127.0.0.1", srv.port, "root", "pw"),
        max_size=max_size,
    )


def test_reuse_and_exhaustion(srv):
    pool = _pool(srv, max_size=2)
    a = pool.get_connection()
    b = pool.get_connection()
    with pytest.raises(PoolExhaustedError):
        pool.get_connection()  # MySQLConnectionPool.java:55-57
    pool.return_connection(a)
    c = pool.get_connection()
    assert c is a  # free-stack reuse, not a new dial (java:139-147)
    assert pool.stats["total"] == 2
    pool.close_all()


def test_return_twice_raises(srv):
    pool = _pool(srv)
    a = pool.get_connection()
    pool.return_connection(a)
    with pytest.raises(NotCheckedOutError):  # java:85-94
        pool.return_connection(a)
    pool.close_all()


def test_dead_connection_transparently_reconnects(srv):
    pool = _pool(srv, max_size=1)
    a = pool.get_connection()
    pool.return_connection(a)
    a._io.sock.close()  # simulate idle disconnect (java:67-73 rationale)
    b = pool.get_connection()  # probe fails -> re-dial, same pool slot
    cur = b.cursor()
    cur.execute("SELECT 1")
    assert cur.fetchone() == (1,)
    assert pool.stats["total"] == 1  # count conserved through reconnect
    pool.close_all()


def test_context_manager_and_real_work(srv):
    pool = _pool(srv)
    with pool.connection() as conn:
        cur = conn.cursor()
        cur.execute("CREATE TABLE p (v BIGINT)")
        cur.executemany("INSERT INTO p (v) VALUES (%s)", [(i,) for i in range(5)])
        conn.commit()
    with pool.connection() as conn:
        cur = conn.cursor()
        cur.execute("SELECT COUNT(*) FROM p")
        assert cur.fetchone() == (5,)
    assert pool.stats["occupied"] == 0
    pool.close_all()
