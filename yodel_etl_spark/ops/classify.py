"""Keyword-map tristate classification (SURVEY §2.2 P5/P6/P7).

The reference's richest computational core (normalize_parks_json.py:50-58,
169-208): for each (flag, keywords) pair emit a Yes/No/Don't-Know column,
plus a residual ``other_*`` column holding the source text only when no
keyword matched, plus a ``metadata.features`` roll-up of active flags.

Spark-first: the whole 42-column expansion is ONE ``select`` of chained
``when``/``rlike`` expressions — CollapseProject + whole-stage codegen
compile it into a single JVM loop over the scan; zero shuffles, scales
linearly to any data size.

Semantic traps replicated deliberately (SURVEY §7.4):
  * yes-before-no branch order: the yes-pattern also matches the bare
    keyword inside a negation, and the reference checks yes FIRST, so
    "no alcohol" → ``no_alcohol="Yes"`` (np.select order,
    normalize_parks_json.py:58);
  * the residual mask joins keywords UNESCAPED and without word
    boundaries (``"|".join(all_keywords)``, :174) while flag patterns
    are escaped + word-bounded (:53-55) — regex metacharacters behave
    differently on the two paths;
  * flag regexes are case-insensitive via explicit ``lower()`` and
    null-safe via ``fillna("")`` (:52).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRISTATE_YES = "Yes"
TRISTATE_NO = "No"
TRISTATE_UNKNOWN = "Don't Know"


def yes_pattern(keywords: list[str]) -> str:
    """Word-bounded alternation of escaped keywords
    (normalize_parks_json.py:53-55)."""
    return r"\b(?:" + "|".join(re.escape(k) for k in keywords) + r")\b"


def no_pattern(keywords: list[str]) -> str:
    """``no <keyword>`` variant (normalize_parks_json.py:56-57)."""
    return r"\bno\s+(?:" + "|".join(re.escape(k) for k in keywords) + r")\b"


def tristate(col: Column | str, keywords: list[str]) -> Column:
    """Yes/No/Don't-Know classifier for one flag (P5).

    Chained ``when`` = np.select with identical branch order; ``rlike``
    runs JVM-side (codegen), constant-folded pattern.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(F.coalesce(c, F.lit("")))
    return (
        F.when(s.rlike(yes_pattern(keywords)), F.lit(TRISTATE_YES))
        .when(s.rlike(no_pattern(keywords)), F.lit(TRISTATE_NO))
        .otherwise(F.lit(TRISTATE_UNKNOWN))
    )


def residual(col: Column | str, mapping: dict[str, list[str]]) -> Column:
    """``other_*`` column (P6): source text kept only when NO keyword of
    the whole map matches — unescaped, unbounded, lowercased substring
    regex (normalize_parks_json.py:173-175 parity, including the
    metacharacter quirk)."""
    c = F.col(col) if isinstance(col, str) else col
    all_kw = "|".join(kw for sub in mapping.values() for kw in sub)
    matched = F.lower(c).rlike(all_kw)
    return F.when(~F.coalesce(matched, F.lit(False)), c)


def apply_flag_map(
    df: DataFrame, source_col: str, mapping: dict[str, list[str]], other_col: str
) -> DataFrame:
    """Expand one keyword map into tristate flag columns + residual (P6),
    as a single appended ``select`` (normalize_parks_json.py:169-186)."""
    exprs = [F.col(f"`{c}`") for c in df.columns]
    exprs += [tristate(source_col, kws).alias(flag) for flag, kws in mapping.items()]
    exprs.append(residual(source_col, mapping).alias(other_col))
    return df.select(exprs)


def active_features(flag_cols: list[str], yes: str = TRISTATE_YES) -> Column:
    """Comma-joined names (underscores→spaces) of flags equal to "Yes"
    (P7, normalize_parks_json.py:203-208) — '' when none.  Pure
    ``concat_ws(when…)``: concat_ws skips nulls, no Python UDF."""
    parts = [
        F.when(F.col(f"`{c}`") == yes, F.lit(c.replace("_", " "))) for c in flag_cols
    ]
    return F.concat_ws(", ", *parts)


def value_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-flag value distribution (A1, normalize_parks_json.py:219-222)
    in ONE pass: unpivot via stack → groupBy(flag, value).count().
    One shuffle total instead of one job per column."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in cols)
    melted = df.selectExpr(f"stack({len(cols)}, {pairs}) as (flag, value)")
    return melted.groupBy("flag", "value").agg(F.count(F.lit(1)).alias("n"))
