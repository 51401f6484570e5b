"""In-process protocol-faithful MySQL server for tests (sqlite-backed).

The mirror of ``fake_broker.py`` for the database side: listens on a real
TCP socket, speaks handshake v10 + ``mysql_native_password`` auth +
COM_QUERY text resultsets (the exact subset ``mysql_wire.py`` implements
from the public protocol docs), and executes statements against sqlite so
transactions, rollbacks, and upserts behave for real. This is what lets
reference ops #24–25 (dynamic INSERT + typed binding into MySQL,
``MySQLProcessData.java:94-156``) EXECUTE end-to-end over real sockets in
a container with no MySQL and no JDBC driver.

Dialect bridge (the server's analog of a test double's canned behavior —
documented, bounded, and exercised by the parity tests):

- ``INSERT ... ON DUPLICATE KEY UPDATE <assigns>`` rewrites to sqlite's
  ``ON CONFLICT (<pk cols>) DO UPDATE SET <assigns>`` with
  ``VALUES(col)`` → ``excluded.col`` and ``GREATEST`` → ``MAX``; the
  conflict target comes from ``PRAGMA table_info`` (the real PK), not a
  hardcoded table list.
- ``SET ...`` session commands acknowledge with OK. Autocommit=0 is
  emulated by the server itself: BEGIN IMMEDIATE before a client's first
  statement, explicit COMMIT/ROLLBACK (IMMEDIATE because a deferred
  SELECT-then-INSERT transaction hits sqlite's upgrade-deadlock "database
  is locked" under concurrent writers — the busy timeout is not consulted
  on that path; taking the write lock up front serializes writers through
  the timeout instead, the innodb-lock-wait shape).

Concurrency: one sqlite connection per CLIENT connection against a shared
on-disk database with a busy timeout — writers serialize exactly like
innodb row-lock waits would at this scale, and each client's transaction
is isolated. Clients that disconnect mid-transaction roll back
(connection close == implicit rollback), matching server behavior.
"""

from __future__ import annotations

import os
import re
import secrets
import socket
import sqlite3
import struct
import tempfile
import threading

from .mysql_wire import (
    COM_PING,
    COM_QUERY,
    COM_QUIT,
    COM_STMT_CLOSE,
    COM_STMT_EXECUTE,
    COM_STMT_PREPARE,
    TYPE_BLOB,
    TYPE_DOUBLE,
    TYPE_LONGLONG,
    TYPE_NULL,
    TYPE_TINY,
    TYPE_VAR_STRING,
    PacketIO,
    lenenc_int,
    lenenc_str,
    native_password_scramble,
    read_lenenc_str,
)

_ODKU_RE = re.compile(r"\s+ON\s+DUPLICATE\s+KEY\s+UPDATE\s+", re.IGNORECASE)
_VALUES_REF_RE = re.compile(r"VALUES\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)",
                            re.IGNORECASE)
_INSERT_TABLE_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)", re.IGNORECASE
)


def _ok_packet(affected: int = 0) -> bytes:
    return b"\x00" + lenenc_int(affected) + lenenc_int(0) + b"\x02\x00\x00\x00"


def _err_packet(code: int, msg: str) -> bytes:
    return (b"\xff" + struct.pack("<H", code) + b"#HY000"
            + msg.encode("utf-8", "replace"))


_EOF = b"\xfe\x00\x00\x02\x00"


def _coldef(name: str, type_code: int) -> bytes:
    return (
        lenenc_str(b"def") + lenenc_str(b"") + lenenc_str(b"")
        + lenenc_str(b"") + lenenc_str(name.encode()) + lenenc_str(b"")
        + b"\x0c" + struct.pack("<HIBHBxx", 0x21, 1024, type_code, 0, 0)
    )


class FakeMySQLServer:
    """``with FakeMySQLServer(password="pw") as srv:`` →
    ``mysql_wire.connect("127.0.0.1", srv.port, "root", "pw", "testdb")``."""

    def __init__(self, user: str = "root", password: str = "",
                 db_path: str | None = None):
        self.user, self.password = user, password
        self._own_db = db_path is None
        if db_path is None:
            fd, db_path = tempfile.mkstemp(suffix=".fakemysql.sqlite")
            os.close(fd)
        self.db_path = db_path
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(32)
        self.port = self._sock.getsockname()[1]
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._accept_thread = threading.Thread(target=self._accept_loop,
                                               daemon=True)
        self._accept_thread.start()

    # --- lifecycle ---
    def close(self) -> None:
        self._stop.set()
        try:
            # unblock accept()
            socket.create_connection(("127.0.0.1", self.port),
                                     timeout=1).close()
        except OSError:
            pass
        self._sock.close()
        for t in self._threads:
            t.join(timeout=5)
        if self._own_db:
            for suffix in ("", "-wal", "-shm"):
                try:
                    os.unlink(self.db_path + suffix)
                except FileNotFoundError:
                    pass

    def __enter__(self) -> "FakeMySQLServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # --- networking ---
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            if self._stop.is_set():
                conn.close()
                return
            t = threading.Thread(target=self._serve_client, args=(conn,),
                                 daemon=True)
            t.start()
            self._threads.append(t)

    def _serve_client(self, sock: socket.socket) -> None:
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        io = PacketIO(sock)
        # isolation_level=None: NO implicit transaction management from
        # the Python layer — the server emulates MySQL autocommit=0 itself
        # (BEGIN before the first statement, explicit COMMIT/ROLLBACK), so
        # DDL issued mid-transaction stays inside it (sqlite DDL is
        # transactional; Python's legacy implicit-commit-before-DDL would
        # silently break the sink's rows+ledger atomicity)
        db = sqlite3.connect(self.db_path, timeout=30,
                             check_same_thread=False, isolation_level=None)
        db.execute("PRAGMA busy_timeout=30000")
        stmts: dict[int, str] = {}  # per-connection prepared statements
        next_stmt_id = [1]
        try:
            if not self._auth(io):
                return
            while True:
                io.reset_seq()
                # command packets reset the sequence; read manually so the
                # response continues the same sequence numbering
                payload = io.read_packet()
                if not payload or payload[0] == COM_QUIT:
                    return
                if payload[0] == COM_PING:
                    io.write_packet(_ok_packet())
                    continue
                if payload[0] == COM_STMT_PREPARE:
                    self._stmt_prepare(io, stmts, next_stmt_id,
                                       payload[1:].decode("utf-8", "replace"))
                    continue
                if payload[0] == COM_STMT_EXECUTE:
                    self._stmt_execute(io, db, stmts, payload)
                    continue
                if payload[0] == COM_STMT_CLOSE:
                    # fire-and-forget per spec: deallocate, no response
                    stmts.pop(struct.unpack_from("<I", payload, 1)[0], None)
                    continue
                if payload[0] != COM_QUERY:
                    io.write_packet(_err_packet(1047, "unsupported command"))
                    continue
                self._run_query(io, db, payload[1:].decode("utf-8", "replace"))
        except (ConnectionError, OSError):
            pass
        finally:
            try:
                db.rollback()  # disconnect mid-transaction == rollback
            finally:
                db.close()
                sock.close()

    def _auth(self, io: PacketIO) -> bool:
        salt = secrets.token_bytes(20).replace(b"\x00", b"\x01")
        greeting = (
            b"\x0a" + b"8.0.0-fake-wire\x00"
            + struct.pack("<I", threading.get_ident() & 0xFFFFFFFF)
            + salt[:8] + b"\x00"
            + struct.pack("<H", 0xF7FF)        # capabilities (low)
            + b"\x21" + struct.pack("<H", 2)   # charset, status
            + struct.pack("<H", 0x0008 | 0x0080)  # caps high: PLUGIN_AUTH...
            + bytes([21]) + b"\x00" * 10
            + salt[8:] + b"\x00"
            + b"mysql_native_password\x00"
        )
        io.write_packet(greeting)
        resp = io.read_packet()
        # HandshakeResponse41: 4+4+1+23 fixed, then user NUL, then auth
        pos = 32
        end = resp.index(b"\x00", pos)
        user = resp[pos:end].decode()
        pos = end + 1
        alen = resp[pos]
        auth = resp[pos + 1:pos + 1 + alen]
        expect = native_password_scramble(self.password, salt)
        if user != self.user or auth != expect:
            io.write_packet(_err_packet(1045, f"Access denied for {user!r}"))
            return False
        io.write_packet(_ok_packet())
        return True

    # --- binary (prepared-statement) protocol -------------------------
    # Server simplification (documented): COM_STMT_PREPARE_OK advertises
    # num_columns=0 even for SELECTs — sqlite cannot describe a resultset
    # without executing, and the protocol-correct client reads the real
    # column definitions from the EXECUTE response anyway. Placeholders
    # are MySQL's `?`, which is also sqlite's paramstyle, so the decoded
    # binary values bind straight through.
    def _stmt_prepare(self, io: PacketIO, stmts: dict, next_id: list,
                      sql: str) -> None:
        nparams = sql.count("?")
        stmt_id = next_id[0]
        next_id[0] += 1
        stmts[stmt_id] = {"sql": sql, "types": None}
        io.write_packet(
            b"\x00" + struct.pack("<IHH", stmt_id, 0, nparams)
            + b"\x00" + struct.pack("<H", 0)
        )
        if nparams:
            for _ in range(nparams):
                io.write_packet(_coldef("?", TYPE_NULL))
            io.write_packet(_EOF)

    def _stmt_execute(self, io: PacketIO, db: sqlite3.Connection,
                      stmts: dict, payload: bytes) -> None:
        stmt_id = struct.unpack_from("<I", payload, 1)[0]
        stmt = stmts.get(stmt_id)
        if stmt is None:
            io.write_packet(_err_packet(1243, f"unknown stmt {stmt_id}"))
            return
        sql = stmt["sql"]
        nparams = sql.count("?")
        pos = 10  # cmd(1) + stmt_id(4) + flags(1) + iteration_count(4)
        params: list = []
        if nparams:
            bitmap_len = (nparams + 7) // 8
            null_bitmap = payload[pos:pos + bitmap_len]
            pos += bitmap_len
            new_bound = payload[pos]
            pos += 1
            types = []
            if new_bound:
                for _ in range(nparams):
                    types.append(payload[pos])
                    pos += 2  # type + unsigned flag
                stmt["types"] = types
            else:  # new_params_bound_flag=0: reuse previously bound types
                types = stmt["types"]
                if types is None:
                    io.write_packet(_err_packet(
                        1210, "no parameter types bound for statement"))
                    return
            for i in range(nparams):
                if null_bitmap[i // 8] & (1 << (i % 8)):
                    params.append(None)
                    continue
                t = types[i]
                if t == TYPE_TINY:
                    params.append(
                        struct.unpack_from("<b", payload, pos)[0])
                    pos += 1
                elif t == TYPE_LONGLONG:
                    params.append(
                        struct.unpack_from("<q", payload, pos)[0])
                    pos += 8
                elif t == TYPE_DOUBLE:
                    params.append(
                        struct.unpack_from("<d", payload, pos)[0])
                    pos += 8
                else:  # VAR_STRING / BLOB: length-encoded bytes
                    raw, pos = read_lenenc_str(payload, pos)
                    params.append(
                        bytes(raw) if t == TYPE_BLOB else raw.decode())
        try:
            if not db.in_transaction:
                db.execute("BEGIN IMMEDIATE")  # same autocommit=0 shape
            cur = db.execute(self._to_sqlite(db, sql.strip().rstrip(";")),
                             params)
        except (sqlite3.Error, ValueError) as e:
            io.write_packet(_err_packet(1064, str(e)))
            return
        if cur.description is None:
            io.write_packet(_ok_packet(max(cur.rowcount, 0)))
            return
        rows = cur.fetchall()
        names = [d[0] for d in cur.description]
        # Infer each column's binary type over ALL rows, not the first
        # non-null: sqlite's dynamic typing lets a later row hold a value
        # the first row's type can't pack (int column, then a string),
        # which would raise mid-resultset AFTER packets were written and
        # wedge the connection. Widening rules keep the wire format
        # self-consistent: int+float -> DOUBLE, any other mix -> string.
        types = []
        for i in range(len(names)):
            t = None
            for r in rows:
                v = r[i]
                if v is None:
                    continue
                if isinstance(v, (bool, int)):
                    vt = TYPE_LONGLONG
                elif isinstance(v, float):
                    vt = TYPE_DOUBLE
                elif isinstance(v, bytes):
                    vt = TYPE_BLOB
                else:
                    vt = TYPE_VAR_STRING
                if t is None or t == vt:
                    t = vt
                elif {t, vt} == {TYPE_LONGLONG, TYPE_DOUBLE}:
                    t = TYPE_DOUBLE
                else:
                    t = TYPE_VAR_STRING
                    break
            types.append(TYPE_VAR_STRING if t is None else t)
        io.write_packet(lenenc_int(len(names)))
        for name, t in zip(names, types):
            io.write_packet(_coldef(name, t))
        io.write_packet(_EOF)
        for r in rows:
            ncols = len(names)
            bitmap = bytearray((ncols + 7 + 2) // 8)
            body = b""
            for i, (v, t) in enumerate(zip(r, types)):
                if v is None:
                    bit = i + 2
                    bitmap[bit // 8] |= 1 << (bit % 8)
                    continue
                if t == TYPE_LONGLONG:
                    body += struct.pack("<q", int(v))
                elif t == TYPE_DOUBLE:
                    body += struct.pack("<d", float(v))
                elif t == TYPE_BLOB:
                    body += lenenc_str(bytes(v))
                elif isinstance(v, bytes):
                    body += lenenc_str(v)
                elif isinstance(v, bool):
                    # a type-widened (mixed) column renders non-strings as
                    # MySQL would: BOOL is TINYINT(1), so 1/0 — Python's
                    # str() would leak 'True'/'False' spellings
                    body += lenenc_str(b"1" if v else b"0")
                elif isinstance(v, float):
                    # shortest round-trip decimal, like MySQL's DOUBLE
                    # text rendering ('1e+16'-style exponents excepted,
                    # which these ETL ledgers never reach)
                    body += lenenc_str(repr(v).encode())
                else:
                    body += lenenc_str(str(v).encode())
            io.write_packet(b"\x00" + bytes(bitmap) + body)
        io.write_packet(_EOF)

    # --- SQL execution ---
    def _run_query(self, io: PacketIO, db: sqlite3.Connection,
                   sql: str) -> None:
        stripped = sql.strip().rstrip(";").strip()
        up = stripped.upper()
        if up.startswith("SET "):
            io.write_packet(_ok_packet())
            return
        if up in ("COMMIT", "ROLLBACK"):
            if db.in_transaction:
                db.execute(stripped)
            io.write_packet(_ok_packet())
            return
        if up.startswith("BEGIN") or up.startswith("START TRANSACTION"):
            if not db.in_transaction:
                db.execute("BEGIN IMMEDIATE")
            io.write_packet(_ok_packet())
            return
        try:
            if not db.in_transaction:
                # MySQL autocommit=0 semantics. IMMEDIATE, not DEFERRED:
                # a deferred transaction that SELECTs (ledger probe) and
                # then INSERTs needs a SHARED->RESERVED lock upgrade,
                # and sqlite fails that upgrade with an IMMEDIATE
                # "database is locked" (deadlock avoidance — the busy
                # timeout is not consulted) when another writer holds
                # RESERVED. Taking the write lock up front serializes
                # concurrent partition transactions through the busy
                # timeout instead, like innodb lock waits would.
                db.execute("BEGIN IMMEDIATE")
            cur = db.execute(self._to_sqlite(db, stripped))
        except sqlite3.Error as e:
            io.write_packet(_err_packet(1064, str(e)))
            return
        if cur.description is None:
            io.write_packet(_ok_packet(max(cur.rowcount, 0)))
            return
        rows = cur.fetchall()
        names = [d[0] for d in cur.description]
        types = []
        for i in range(len(names)):
            t = TYPE_VAR_STRING
            for r in rows:
                v = r[i]
                if v is None:
                    continue
                if isinstance(v, bool) or isinstance(v, int):
                    t = TYPE_LONGLONG
                elif isinstance(v, float):
                    t = TYPE_DOUBLE
                break
            types.append(t)
        io.write_packet(lenenc_int(len(names)))
        for name, t in zip(names, types):
            io.write_packet(_coldef(name, t))
        io.write_packet(_EOF)
        for r in rows:
            out = b""
            for v in r:
                if v is None:
                    out += b"\xfb"
                else:
                    if isinstance(v, bytes):
                        s = v
                    elif isinstance(v, bool):
                        s = b"1" if v else b"0"
                    elif isinstance(v, float):
                        s = repr(v).encode()
                    else:
                        s = str(v).encode()
                    out += lenenc_str(s)
            io.write_packet(out)
        io.write_packet(_EOF)

    def _to_sqlite(self, db: sqlite3.Connection, sql: str) -> str:
        """MySQL → sqlite dialect bridge for the constructs this repo's
        SQL surface emits (see module docstring)."""
        m = _ODKU_RE.search(sql)
        if m:
            head, assigns = sql[:m.start()], sql[m.end():]
            tm = _INSERT_TABLE_RE.match(head)
            if not tm:
                raise sqlite3.OperationalError(
                    "ON DUPLICATE KEY UPDATE outside INSERT"
                )
            pk = [
                r[1]
                for r in db.execute(f"PRAGMA table_info({tm.group(1)})")
                if r[5] > 0
            ]
            if not pk:
                raise sqlite3.OperationalError(
                    f"{tm.group(1)} has no PRIMARY KEY for upsert"
                )
            assigns = _VALUES_REF_RE.sub(r"excluded.\1", assigns)
            assigns = re.sub(r"\bGREATEST\s*\(", "MAX(", assigns,
                             flags=re.IGNORECASE)
            sql = (f"{head} ON CONFLICT ({', '.join(pk)}) "
                   f"DO UPDATE SET {assigns}")
        return sql
