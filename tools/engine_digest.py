"""Engine-side order-insensitive result digests — the comparator that
closes the sf1.0 verification tail (round-10 verdict ask #1).

The driver-style comparator (fetch both result sets into pandas, sort,
compare) is the bottleneck at 10× scale: a 6 M-row mart costs minutes
of fetch+sort per engine, and the unrolled pagerank oracle spills
DuckDB past 80 GB. Both walls are HARNESS artifacts — so this module
computes the canonical value-hash INSIDE each engine and fetches ONE
row per side regardless of output grain:

    digest = (row_count, SUM(h1(row)), SUM(h2(row)))

where h1/h2 are two independent 60-bit integers cut from
md5(canonical_row_string) and the sums are exact (Spark DECIMAL(38,0),
DuckDB HUGEINT — no overflow below ~10^19 rows). SUM commutes, so the
digest is row-order-insensitive without any sort, and equal digests
mean equal multisets of canonical rows (up to md5+sum collisions,
~2^-120 per query).

The hard part is a canonical row string both engines produce
BIT-IDENTICALLY for equal values:

- integers/booleans: CAST to BIGINT then string — identical.
- strings: the value itself.
- dates/timestamps: explicit format masks per engine
  (``yyyy-MM-dd HH:mm:ss.SSSSSS`` / ``%Y-%m-%d %H:%M:%S.%f``).
- binary: hex() — uppercase in both engines.
- floats/doubles: THE trap. Neither printf (Java pads the shortest
  repr where C rounds the true binary expansion) nor the native
  string cast (Java 17's Double.toString is not always
  shortest-round-trip — fixed only in JDK 19) agrees across engines.
  Instead the value is decomposed into its EXACT IEEE-754
  (sign, mantissa, exponent) triple using only exact float
  operations: log2 for a first exponent guess, one comparison step
  against pow(2, e)/pow(2, e+1) to correct it, then one division by
  a power of two (exact in IEEE) and a floor-cast. Verified
  bit-correct against math.frexp ground truth in BOTH engines over
  100k random doubles including subnormals, ±0, and DBL_MAX
  (tests/test_tools.py). NaN/±Inf map to sentinels; -0.0 normalizes
  to +0.0 via ``x + 0.0`` inside abs/sign handling (the CASE
  branches on x < 0, which is false for -0.0).

Column order is fixed by sorting column names (the driver's canon),
null is a chr(2)-prefixed sentinel no real value starts with, and
columns join on chr(1). Arrays of any scalar kind canonicalize
recursively — per-element canon (order PRESERVED; arrays are
sequences), chr(3) element joiner, length prefix so ``[]`` and
``['']`` differ — via Spark ``transform``/``array_join`` and DuckDB
``list_transform``/``array_to_string``; only struct/map/decimal
outputs still fall back to the pandas comparator.

At 100 TB this is also the RIGHT comparator shape: the digest is one
distributed aggregation pass (partial sums per partition, one final
row), no sort, no fetch — verification cost scales with a scan, not
with driver memory.
"""

from __future__ import annotations

#: Engine-agnostic SQL: exact IEEE-754 decomposition of a finite
#: double into 'p<sign>p<mantissa>p<exponent>' (every function used —
#: abs, pow, floor, log2, greatest, isnan, concat, chr — exists with
#: identical semantics in Spark SQL and DuckDB).
_EXP = (
    "greatest(CASE WHEN abs({c}) >= pow(2.0, CAST(floor(log2(abs({c})))"
    " AS INT) + 1) THEN CAST(floor(log2(abs({c}))) AS INT) + 1"
    " WHEN abs({c}) < pow(2.0, CAST(floor(log2(abs({c}))) AS INT))"
    " THEN CAST(floor(log2(abs({c}))) AS INT) - 1"
    " ELSE CAST(floor(log2(abs({c}))) AS INT) END, -1022)"
)

#: NULL must short-circuit BEFORE the concat: DuckDB's concat treats
#: NULL arguments as empty strings (Spark's propagates NULL), so
#: without this branch a NULL double leaks a partial 'p-1022' string
#: on the DuckDB side instead of hitting the caller's coalesce.
_DOUBLE_CANON = (
    "CASE WHEN {c} IS NULL THEN NULL"
    " WHEN isnan({c}) THEN 'NaN'"
    " WHEN {c} = CAST('Infinity' AS DOUBLE) THEN 'Inf'"
    " WHEN {c} = CAST('-Infinity' AS DOUBLE) THEN '-Inf'"
    " WHEN {c} = 0.0 THEN '0'"
    " ELSE concat(CASE WHEN {c} < 0.0 THEN '-' ELSE '' END,"
    " CAST(CAST(abs({c}) / pow(2.0, CAST(" + _EXP + " - 52 AS DOUBLE))"
    " AS BIGINT) AS STRING), 'p', CAST(" + _EXP + " AS STRING)) END"
)

#: Canonical-kind of each engine type: the two sides must land on the
#: same kind per column or the digest is (correctly) incomparable and
#: the caller falls back to the pandas comparator.
_SPARK_KINDS = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "boolean": "bool", "string": "str", "double": "double",
    "float": "double", "date": "date", "timestamp": "ts",
    "timestamp_ntz": "ts", "binary": "bin",
}

_DUCK_KINDS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int",
    "BIGINT": "int", "BOOLEAN": "bool", "VARCHAR": "str",
    "DOUBLE": "double", "FLOAT": "double", "REAL": "double",
    "DATE": "date", "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts",
    "BLOB": "bin",
}


def spark_kind(simple_type: str) -> str | None:
    if simple_type.startswith("array<") and simple_type.endswith(">"):
        inner = spark_kind(simple_type[6:-1])
        return f"arr:{inner}" if inner else None
    return _SPARK_KINDS.get(simple_type)


def duck_kind(duck_type: str) -> str | None:
    t = duck_type.upper().strip()
    # list ('DOUBLE[]') and fixed-size array ('DOUBLE[3]') types
    if t.endswith("]"):
        base, _, suffix = t.rpartition("[")
        if base and (suffix == "]" or suffix[:-1].isdigit()):
            inner = duck_kind(base)
            return f"arr:{inner}" if inner else None
    return _DUCK_KINDS.get(t)


def _canon_expr(c: str, kind: str, engine: str) -> str:
    """Canonical-string SQL for an arbitrary expression ``c`` of
    canonical kind ``kind`` (pre-coalesce). ``engine`` picks the
    per-engine date/time format functions; every other scalar kind
    shares one engine-agnostic template. ``arr:<kind>`` recurses:
    elements keep their ORDER (arrays are sequences, not sets), each
    element is canonicalized and null-coalesced like a column, joined
    on chr(3), and the whole string is length-prefixed so ``[]`` and
    ``['']`` stay distinct."""
    if kind == "int":
        return f"CAST(CAST({c} AS BIGINT) AS STRING)"
    if kind == "bool":
        return f"CAST(CAST({c} AS INT) AS STRING)"
    if kind == "str":
        return c
    if kind == "double":
        return _DOUBLE_CANON.format(c=f"CAST({c} AS DOUBLE)")
    if kind == "bin":
        return f"hex({c})"
    if kind == "date":
        if engine == "spark":
            return f"date_format({c}, 'yyyy-MM-dd')"
        return f"strftime({c}, '%Y-%m-%d')"
    if kind == "ts":
        if engine == "spark":
            return f"date_format({c}, 'yyyy-MM-dd HH:mm:ss.SSSSSS')"
        return f"strftime({c}, '%Y-%m-%d %H:%M:%S.%f')"
    if kind.startswith("arr:"):
        elem = _canon_expr("x", kind[4:], engine)
        elem = f"coalesce({elem}, concat(chr(2), 'N'))"
        if engine == "spark":
            joined = f"array_join(transform({c}, x -> {elem}), chr(3))"
            n = f"size({c})"
        else:
            joined = (
                f"array_to_string(list_transform({c}, x -> {elem}),"
                " chr(3))"
            )
            n = f"len({c})"
        # Spark size(NULL)=-1 under ANSI-off legacy; guard via CASE so
        # a NULL array yields NULL (caught by the row-level coalesce)
        # in BOTH engines.
        return (
            f"CASE WHEN {c} IS NULL THEN NULL ELSE"
            f" concat(CAST({n} AS STRING), ':', {joined}) END"
        )
    raise ValueError(f"unhashable kind: {kind}")


def _canon_col(col: str, kind: str, engine: str) -> str:
    """Canonical-string SQL expression for one column (pre-coalesce);
    identifier quoting is per-engine (backticks in Spark SQL — double
    quotes there are STRING LITERALS)."""
    c = f"`{col}`" if engine == "spark" else f'"{col}"'
    return _canon_expr(c, kind, engine)


def row_canon_sql(cols_kinds: list[tuple[str, str]], engine: str) -> str:
    """Canonical row-string expression: columns sorted by name, each
    canonicalized and null-coalesced to a chr(2) sentinel, joined on
    chr(1)."""
    parts = [
        f"coalesce({_canon_col(col, kind, engine)}, concat(chr(2), 'N'))"
        for col, kind in sorted(cols_kinds)
    ]
    if len(parts) == 1:
        return parts[0]
    joined = ", chr(1), ".join(parts)
    return f"concat({joined})"


def digest_sql(
    cols_kinds: list[tuple[str, str]], engine: str, source: str
) -> str:
    """Full one-row digest query over ``source`` (a table/view name or
    a parenthesized subquery): n_rows, h1, h2 (exact sums as
    strings)."""
    row = row_canon_sql(cols_kinds, engine)
    if engine == "spark":
        h1 = f"CAST(conv(substring(md5({row}), 1, 15), 16, 10) AS BIGINT)"
        h2 = f"CAST(conv(substring(md5({row}), 17, 15), 16, 10) AS BIGINT)"
        sum_t = "CAST(coalesce(SUM(CAST({h} AS DECIMAL(38,0))), 0) AS STRING)"
    else:
        h1 = f"CAST(concat('0x', substring(md5({row}), 1, 15)) AS BIGINT)"
        h2 = f"CAST(concat('0x', substring(md5({row}), 17, 15)) AS BIGINT)"
        sum_t = "CAST(coalesce(SUM({h}), CAST(0 AS HUGEINT)) AS STRING)"
    return (
        f"SELECT COUNT(*) AS n_rows, {sum_t.format(h=h1)} AS h1, "
        f"{sum_t.format(h=h2)} AS h2 FROM {source}"
    )


def spark_digest(df) -> tuple[int, str, str] | None:
    """(n_rows, h1, h2) of a Spark DataFrame, or None when a column
    type has no canonical form (struct/map/decimal outputs — the
    caller falls back to the pandas comparator)."""
    cols_kinds = []
    for f in df.schema.fields:
        kind = spark_kind(f.dataType.simpleString())
        if kind is None:
            return None
        cols_kinds.append((f.name, kind))
    view = "__digest_q"
    df.createOrReplaceTempView(view)
    row = df.sparkSession.sql(
        digest_sql(cols_kinds, "spark", view)
    ).first()
    return (row["n_rows"], row["h1"], row["h2"])


def duck_digest(con, oracle_sql: str) -> tuple[int, str, str] | None:
    """(n_rows, h1, h2) of a DuckDB oracle query, or None when a
    declared output type has no canonical form. Schema-only DESCRIBE
    first (no execution), then ONE aggregation over the query."""
    cols_kinds = []
    for name, ctype, *_ in con.execute(
        f"DESCRIBE ({oracle_sql})"
    ).fetchall():
        kind = duck_kind(ctype)
        if kind is None:
            return None
        cols_kinds.append((name, kind))
    row = con.execute(
        digest_sql(cols_kinds, "duck", f"({oracle_sql})")
    ).fetchone()
    return (row[0], row[1], row[2])


def duck_schema_kinds(con, oracle_sql: str) -> list[tuple[str, str]] | None:
    """Sorted (column, kind) list of an oracle's declared schema, or
    None if any type is unhashable — used to pre-check kind agreement
    with the Spark side before trusting a digest mismatch."""
    out = []
    for name, ctype, *_ in con.execute(
        f"DESCRIBE ({oracle_sql})"
    ).fetchall():
        kind = duck_kind(ctype)
        if kind is None:
            return None
        out.append((name, kind))
    return sorted(out)


def spark_schema_kinds(df) -> list[tuple[str, str]] | None:
    out = []
    for f in df.schema.fields:
        kind = spark_kind(f.dataType.simpleString())
        if kind is None:
            return None
        out.append((f.name, kind))
    return sorted(out)
