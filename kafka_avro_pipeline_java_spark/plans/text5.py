"""Round-7 text additions: GPT-2-flavored byte-level pre-tokenization.

Byte-level BPE tokenizers (GPT-2 and descendants) don't BPE-merge raw
bytes directly — a regex PRE-tokenizer first splits text into word-ish
chunks with the leading space ATTACHED (" the" and "the" are different
tokens), and merges never cross chunk boundaries. That split is the
corpus-sized distributed step of tokenizer induction (the merge loop over
its output is the bounded-driver part, operators/bpe.py); this query puts
the split itself on the oracle-checked surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# GPT-2's pattern minus the `\s+(?!\S)` negative lookahead (RE2 — the
# oracle's regex engine — has no lookahead): contractions, space-prefixed
# letter/digit/punctuation runs, then whitespace runs. Alternation is
# leftmost-FIRST in both Java regex and RE2's default mode, so both
# engines chunk identically.
_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"
# the pattern itself contains apostrophes → double them for the SQL literal
_PRETOKEN_SQL = _PRETOKEN_RE.replace("'", "''")


@query(
    "text_bytelevel_pretokenize",
    oracle=f"""
    WITH tok AS (
      SELECT UNNEST(regexp_extract_all(lower(text),
                    '{_PRETOKEN_SQL}', 0)) AS token
      FROM documents
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM tok GROUP BY token
    ORDER BY n DESC, token LIMIT 40
    """,
)
def text_bytelevel_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-40 pre-token chunks with GPT-2's leading-space convention:
    " the" (mid-text) and "the" (document head) count separately, which
    is exactly the asymmetry a byte-level BPE inherits. One
    regexp_extract_all + explode + keyed count — scan-bound, no Python;
    at 100 TB this is the canonical map-side-combine word count with a
    40-row TakeOrdered on top (per-partition top-k, no global sort)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(_PRETOKEN_RE), F.lit(0)
                )
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(40)
    )
