"""Graded-output type/magnitude guard (VERDICT r12 item 2) — shared by
tools/driver_sim.py (sweep gate 5) and tests/test_plan_properties.py
(pytest mirror) so the two can't drift.

Rationale: the r11/r12 ``agg_table_fingerprint`` driver-red — per-row
fingerprints bit-identical at every SF, yet the driver's ``hash_match``
false for two consecutive rounds — was caused by a >2^53 DECIMAL(38,0)
output value (the registry's unique one). Any float64 coercion in a
result-comparison pipeline (e.g. DuckDB ``fetchdf()`` renders
DECIMAL(38,0) as float64) corrupts such a value while ``rows_match`` and
``schema_match`` stay true. The guard therefore bans from GRADED OUTPUT:

- any column type outside the driver-coercion-safe set
  (BIGINT/INT/DOUBLE/VARCHAR/BOOLEAN/DATE/TIMESTAMP on either engine —
  no DECIMAL, no HUGEINT);
- any integer cell at ``|v| >= 2^53`` (the float64-exact boundary) on
  either engine, UNLESS the query is on ``INT64_EXACT_WHITELIST``.
  Corpus-linear integer outputs (cent sums are ~2^37 at sf0.1) cross
  2^53 at larger scale factors BY CONSTRUCTION, so they must ship
  reduced (modulo a <2^53 prime, rounded ratio, …).

DECIMAL stays legal — and per the overflow rule, mandatory — as an
INTERMEDIATE; only the graded output surface is restricted.

The int64 whitelist exists because the r13 full-sweep rollout of this
gate flagged four LONG-ESTABLISHED queries whose >2^53 BIGINT outputs
are INTENTIONAL int64-exact constructs — and each has a driver-green
``hash_match: true`` signature on record, which is direct experimental
proof that int64-typed cells survive the driver's comparison pipeline
exactly (Spark collect and DuckDB fetch both surface BIGINT as Python
int; only DECIMAL/HUGEINT take a float64-rendering path à la
``fetchdf()``). The whitelist is append-only-with-justification: a NEW
query emitting >2^53 integers still fails until audited here, which is
the defensive point of the gate.
"""

from __future__ import annotations

import re
from decimal import Decimal

#: float64-exact integer range boundary
SAFE_INT_LIMIT = 1 << 53

#: Queries allowed to emit |v| >= 2^53 INT64 cells — each an intentional
#: int64-exact construct with a driver-green hash_match signature proving
#: the value class survives the driver comparison exactly:
#: - scalar_bitwise_zoo: 64-bit mask constants (0x5555… = 6.1e18),
#:   driver-green r9;
#: - scalar_try_arithmetic_zoo: int64-max boundary cells in the try_*
#:   overflow showcase (9223372036854775807), driver-green r11;
#: - source_avro_ocf_roundtrip / source_python_datasource: 60-bit md5
#:   content checksums (order-insensitive XOR/SUM folds), driver-green
#:   r6 / r5.
INT64_EXACT_WHITELIST = frozenset({
    "scalar_bitwise_zoo",
    "scalar_try_arithmetic_zoo",
    "source_avro_ocf_roundtrip",
    "source_python_datasource",
})

SPARK_SAFE_TYPE = re.compile(
    r"^(bigint|int|smallint|tinyint|double|float|string|boolean|date|"
    r"timestamp(_ntz)?)$"
)
DUCK_SAFE_TYPE = re.compile(
    r"(?i)^(BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE|FLOAT|VARCHAR|BOOLEAN|"
    r"DATE|TIMESTAMP(_NS)?)$"
)


def cell_magnitude_violation(v, *, allow_big_int64: bool = False) -> bool:
    """True when a result cell can't survive a float64 round-trip: any
    integer at |v| >= 2^53 (unless ``allow_big_int64`` — the audited
    INT64_EXACT_WHITELIST path, where int64 exactness is driver-proven),
    or any Decimal cell (decimal OUTPUT types are banned outright and
    NEVER whitelisted — fetchdf()-style paths render them float64)."""
    if v is None or isinstance(v, bool):
        return False
    if isinstance(v, Decimal):
        return True
    if isinstance(v, int):
        return not allow_big_int64 and abs(v) >= SAFE_INT_LIMIT
    return False


def result_guard_violations(name, sdf, srows, duck_con, sql, drows):
    """Full gate body: output-type allowlist on BOTH engines' schemas
    plus the 2^53 magnitude sweep over BOTH engines' materialized cells.
    ``sdf`` is the Spark DataFrame (schema source), ``srows`` its
    collected rows, ``duck_con`` an open DuckDB connection with the
    tables registered, ``sql`` the oracle text, ``drows`` its rows."""
    v = []
    for f in sdf.schema.fields:
        t = f.dataType.simpleString()
        if not SPARK_SAFE_TYPE.match(t):
            v.append(
                f"{name}: spark graded output column {f.name} has "
                f"coercion-hostile type {t}"
            )
    try:
        for cn, ct, *_ in duck_con.execute("DESCRIBE " + sql).fetchall():
            if not DUCK_SAFE_TYPE.match(ct):
                v.append(
                    f"{name}: oracle graded output column {cn} has "
                    f"coercion-hostile type {ct}"
                )
    except Exception as e:  # a DESCRIBE failure is itself a gate failure
        v.append(f"{name}: oracle DESCRIBE failed: {e}")
    allow_big = name in INT64_EXACT_WHITELIST
    for side, rows in (("spark", srows), ("oracle", drows)):
        for r in rows:
            for i, cell in enumerate(r):
                if cell_magnitude_violation(cell, allow_big_int64=allow_big):
                    v.append(
                        f"{name}: {side} cell col#{i}={cell!r} outside "
                        f"float64-exact range (|v| >= 2^53 or Decimal)"
                    )
                    break
            else:
                continue
            break
    return v
