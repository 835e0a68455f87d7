"""Scalar expression library (reference §2.3 F1-F6 parity).

Every function here returns a Column built from native Spark SQL
expressions — they compile into whole-stage codegen, no Python in the
hot path. The reference's only UDF-shaped code (row-wise email regex,
``etl/transform.py:81``) becomes a codegen'd ``rlike``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Reference email regex (etl/transform.py:79) — Java regex accepts the
#: identical pattern; ^...$ anchors preserve re.match semantics.
EMAIL_PATTERN = r"^[\w\.-]+@[\w\.-]+\.\w+$"


def email_valid(email: Column | str) -> Column:
    """Boolean email validity; NULL email → False (reference fills
    NaN→"" before matching, etl/transform.py:80-81)."""
    col = F.col(email) if isinstance(email, str) else email
    return F.coalesce(col.rlike(EMAIL_PATTERN), F.lit(False))


def safe_div(num: Column, den: Column) -> Column:
    """num/den with den==0 → 0 (reference zero→NA→0 chain,
    etl/transform.py:111-112). ANSI-safe via nullif."""
    return F.coalesce(num / F.nullif(den, F.lit(0)), F.lit(0.0))


def month_str(date_col: Column | str) -> Column:
    """'YYYY-MM' month string (reference dt.to_period("M").astype(str),
    etl/transform.py:27)."""
    col = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.date_format(col, "yyyy-MM")


def period_date(month_col: Column | str) -> Column:
    """First day of month from 'YYYY-MM' (reference to_datetime(month +
    "-01"), etl/transform.py:113)."""
    col = F.col(month_col) if isinstance(month_col, str) else month_col
    return F.try_to_date(F.concat(col, F.lit("-01")))


def days_since(start: Column | str, snapshot: Column) -> Column:
    """Whole days between a date column and an explicit snapshot date
    (reference customer_days, etl/transform.py:92-94 — the snapshot is
    a required parameter here; the reference's Timestamp.today() default
    is nondeterministic and stays out of the engine)."""
    col = F.col(start) if isinstance(start, str) else start
    return F.datediff(snapshot, col)


#: Exact per-line revenue — the ONE definition of the money contract
#: shared by every lineitem-revenue query and its DuckDB oracle twin:
#: DECIMAL(18,2) price x DECIMAL(8,4) discount complement — exact and
#: order-independent under any partitioning. ``q`` is the SQL table
#: qualifier ('' or 'l.'). Keep the Column form and the SQL template
#: in lockstep: the oracles hash-check against the Spark expression.
LINE_REVENUE_SQL = (
    "CAST({q}l_extendedprice AS DECIMAL(18,2))"
    " * CAST(1 - {q}l_discount AS DECIMAL(8,4))"
)


def line_revenue() -> Column:
    """Column twin of :data:`LINE_REVENUE_SQL` over unaliased lineitem
    columns."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,4)")
