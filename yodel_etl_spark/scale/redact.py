"""PII redaction for training-corpus curation.

Scrubbing emails / phone numbers / IP addresses / card- and SSN-shaped
digit runs is a standard pre-training compliance pass.  Everything here
is chained ``regexp_replace`` / ``regexp_count`` column expressions —
whole-stage codegen, zero Python, one narrow pass over the corpus scan
at 100 TB (same posture as :mod:`yodel_etl_spark.scale.textstats`).

Pattern dialect: the regexes use only explicit ``[0-9]`` classes,
non-capturing groups and ASCII literals so they behave identically under
Java regex (Spark) and RE2 (DuckDB oracle) — no ``\\d`` (Unicode-class
divergence), no lookaround (RE2 lacks it).

Replacement is ORDERED (emails → SSN → card → IPv4 → phone): earlier
rewrites consume their text, so an email's digits can't later be
re-matched as a phone number, and the placeholder tokens themselves
contain no digits to re-match.  Counts mirror the sequential-redact
pass: each pattern is counted on the progressively-redacted text, so a
digit run inside an email counts as the email only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (kind, pattern, replacement) applied IN ORDER.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    # 13-16 digit runs, optionally 4-4-4-4 grouped by space/dash
    ("card", "\\b(?:[0-9]{4}[ -]){3}[0-9]{4}\\b|\\b[0-9]{13,16}\\b", "<CARD>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    # international-ish phone: leading + or digit, then ≥7 more digits
    # allowing -, space, parens; anchored on digits at both ends
    ("phone", "\\+?[0-9][0-9()\\- ]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Text with every PII pattern replaced by its placeholder token,
    applied in :data:`PII_PATTERNS` order."""
    out = text
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def redact_documents(df, id_col: str, text_col: str):
    """``(id, n_email, n_ssn, n_card, n_ipv4, n_phone, redacted)`` with
    the redact chain STAGED: each step lands as a real attribute in its
    own projection, so the count and the next replacement both read the
    materialized previous step instead of re-evaluating the whole regex
    chain per reference (the expression-hygiene rule — a
    multiply-referenced alias is not collapsed by CollapseProject)."""
    out = df.select(id_col, F.col(text_col).alias("_r"))
    for kind, pat, rep in PII_PATTERNS:
        out = out.select(
            "*", F.regexp_count("_r", F.lit(pat)).cast("long").alias(f"n_{kind}")
        ).select(
            *[c for c in out.columns if c != "_r"],
            f"n_{kind}",
            F.regexp_replace("_r", pat, rep).alias("_r"),
        )
    return out.withColumnRenamed("_r", "redacted")


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (``n_email``, ``n_ssn``, …), counted on the
    progressively-redacted text so the counts sum what the redact pass
    actually replaced — a digit run consumed by an earlier pattern is
    not double-counted by a later one."""
    counts: dict[str, Column] = {}
    cur = text
    for kind, pat, rep in PII_PATTERNS:
        counts[f"n_{kind}"] = F.regexp_count(cur, F.lit(pat)).cast("long")
        cur = F.regexp_replace(cur, pat, rep)
    return counts
