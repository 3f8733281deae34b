"""PII scrubbing for corpus pipelines: multi-class regex redaction
with per-class counts, as a pure codegen expression pipeline.

The first hour of any real corpus run hits emails, separator-laden
phone numbers, and IPs — not just bare digit runs (r3 ADVICE item).
Classes are applied in a FIXED priority order, each on the output of
the previous one, so a digit inside an email is counted once as EMAIL
and never again as NUM, and an IPv4 octet group can't be half-eaten by
the phone pattern:

    email -> ipv4 -> phone -> digit-run

Every pattern is deliberately restricted to syntax that Java regex
(Spark) and RE2 (DuckDB) interpret identically — character classes,
bounded repetition, non-capturing groups, ``\\b`` — so the scrubbed
text value-hashes across engines and the driver gate can pin the full
payload bit-for-bit.

Scale posture: regexp_replace/regexp_extract_all are JVM-side
whole-stage-codegen expressions — one projection over the corpus, no
shuffle, no Python.  Reference parity: the reference has no scrubbing
stage (it consumes pre-cleaned CoNLL); this is part of the
training-data-pipeline surface the driver mandate adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (class name, pattern, replacement token) in priority order.
PII_CLASSES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}", "<PHONE>"),
    ("num", r"[0-9]{2,}", "<NUM>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``scrubbed`` plus one ``n_<class>`` INT count column per
    PII class.  Counts are taken on the progressively-scrubbed text
    (priority order above), matching what the replacement actually
    redacted.  NULL text is treated as empty (0 counts, '' scrubbed) —
    NULL propagation would silently drop rows from downstream count
    aggregates."""
    cur: Column = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for name, pat, tok in PII_CLASSES:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .cast("int")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, tok)
    return df.select("*", *counts, cur.alias("scrubbed"))


def sql_scrub_exprs(text_expr: str) -> dict:
    """The DuckDB mirror: {class -> count SQL, and 'scrubbed' -> SQL}
    over ``text_expr``, same priority chain (RE2 semantics match Java
    for these restricted patterns)."""
    cur = text_expr
    out = {}
    for name, pat, tok in PII_CLASSES:
        out[f"n_{name}"] = (
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS INTEGER)"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{tok}', 'g')"
    out["scrubbed"] = cur
    return out
