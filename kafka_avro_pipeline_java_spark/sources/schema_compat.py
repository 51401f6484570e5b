"""Avro schema-compatibility checking (the Schema Registry contract).

The reference delegates schema evolution entirely to Confluent Schema
Registry (`AvroProducer.java:50`, `AvroConsumer.java:69`): the registry
rejects a new subject version that violates the subject's compatibility
mode. That behavior is pure Avro SCHEMA RESOLUTION (Avro 1.11 spec,
"Schema Resolution" section) applied in a direction per mode:

- BACKWARD:  new schema (reader) must read data written by the previous
  schema (writer) — consumers upgrade first.
- FORWARD:   previous schema must read data written by the new one —
  producers upgrade first.
- FULL:      both directions.
- *_TRANSITIVE: same check against EVERY previous version, not just the
  latest.
- NONE:      anything registers.

``can_read(reader, writer)`` implements the resolution rules for the
type system this engine speaks (flat records over the §1.2 matrix:
primitives, nullable unions, with the spec's numeric promotions
int→long→float→double and string↔bytes): a reader field missing from the
writer needs a default; writer-only fields are ignored; field types must
match or be promotable. Returns the list of incompatibilities (empty =
compatible) so callers can surface the registry-style 409 message.
"""

from __future__ import annotations

from typing import Any

# writer type → the reader types it may be promoted to (Avro 1.11
# "Schema Resolution": the writer's value is promoted to the reader's
# type). string↔bytes is bidirectional per spec.
_PROMOTIONS: dict[str, set[str]] = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}

COMPAT_MODES = (
    "NONE",
    "BACKWARD",
    "FORWARD",
    "FULL",
    "BACKWARD_TRANSITIVE",
    "FORWARD_TRANSITIVE",
    "FULL_TRANSITIVE",
)


def _norm_type(t: Any) -> Any:
    """Normalize a field type: {'type': 'x'} → 'x'; unions stay lists."""
    if isinstance(t, dict) and set(t) == {"type"}:
        return t["type"]
    return t


def _union_branches(t: Any) -> list:
    return [_norm_type(b) for b in t] if isinstance(t, list) else [_norm_type(t)]


def _type_readable(reader_t: Any, writer_t: Any) -> bool:
    """Can a reader of ``reader_t`` decode a value written as ``writer_t``?

    Handles primitives + unions (each writer branch must resolve to SOME
    reader branch — the spec's union resolution: the writer's actual
    branch is matched against the reader union)."""
    r_branches = _union_branches(reader_t)
    w_branches = _union_branches(writer_t)
    for w in w_branches:
        ok = any(
            w == r or (isinstance(w, str) and r in _PROMOTIONS.get(w, ()))
            for r in r_branches
        )
        if not ok:
            return False
    return True


def can_read(reader: dict, writer: dict) -> list[str]:
    """→ incompatibilities preventing ``reader`` from reading data
    written with ``writer`` (empty list = fully compatible)."""
    problems: list[str] = []
    if reader.get("name") != writer.get("name"):
        aliases = set(reader.get("aliases", ()))
        if writer.get("name") not in aliases:
            problems.append(
                f"record name mismatch: reader {reader.get('name')!r} "
                f"cannot resolve writer {writer.get('name')!r} (no alias)"
            )
    w_fields = {f["name"]: f for f in writer.get("fields", [])}
    for rf in reader.get("fields", []):
        name = rf["name"]
        wf = w_fields.get(name)
        if wf is None:
            # field aliases let a reader pick up a renamed writer field
            for alias in rf.get("aliases", ()):
                if alias in w_fields:
                    wf = w_fields[alias]
                    break
        if wf is None:
            if "default" not in rf:
                problems.append(
                    f"reader field {name!r} absent from writer and has no default"
                )
            continue
        if not _type_readable(rf["type"], wf["type"]):
            problems.append(
                f"field {name!r}: writer type {wf['type']!r} is not "
                f"readable as reader type {rf['type']!r}"
            )
    # writer-only fields are skipped by the reader: always fine
    return problems


def check_compatibility(
    new_schema: dict,
    previous: list[dict],
    mode: str = "BACKWARD",
) -> list[str]:
    """Registry-style gate: can ``new_schema`` register on a subject whose
    history is ``previous`` (oldest→newest) under ``mode``? Returns the
    incompatibility list (empty = registers)."""
    if mode not in COMPAT_MODES:
        raise ValueError(f"unknown compatibility mode {mode!r}")
    if mode == "NONE" or not previous:
        return []
    against = previous if mode.endswith("_TRANSITIVE") else previous[-1:]
    base = mode.replace("_TRANSITIVE", "")
    problems: list[str] = []
    for old in against:
        if base in ("BACKWARD", "FULL"):
            problems += [
                f"BACKWARD vs version {i}: {p}"
                for i, p in _enum(can_read(new_schema, old), previous, old)
            ]
        if base in ("FORWARD", "FULL"):
            problems += [
                f"FORWARD vs version {i}: {p}"
                for i, p in _enum(can_read(old, new_schema), previous, old)
            ]
    return problems


def _enum(probs: list[str], previous: list[dict], old: dict):
    version = previous.index(old) + 1
    return [(version, p) for p in probs]
