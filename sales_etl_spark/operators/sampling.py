"""Deterministic sampling for training-data mixing.

A 100 TB corpus is never trained on wholesale: each domain/source
stratum gets a mixing weight (up-sample wiki, down-sample crawl), and
the selection must be DETERMINISTIC — re-running the pipeline, or
running it on a different cluster/partitioning, must pick the same
rows, or ablations and dedup-then-sample orderings stop being
reproducible.

Mechanism: hash each row's stable id through md5 with a seed prefix,
take the first 8 hex chars, and include the row iff that hex string is
lexicographically below the stratum's threshold ``hex(floor(rate *
2^32))``. Lowercase fixed-width hex compares identically to the
numeric value, md5 is bit-identical across engines (the DuckDB oracle
runs the same expression verbatim), and the decision depends only on
(seed, id) — not on partitioning, visit order, or Spark's RNG.

Scale shape: pure codegen projection + filter — no shuffle, no UDF,
pushes down past column pruning like any other predicate. Changing the
seed draws an independent sample; changing a stratum's rate only adds
or removes rows monotonically (nested samples: rate 0.25 is a subset
of rate 0.5 under the same seed) — the property that makes staged
scale-up runs comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_uniform_hex(key: Column, seed: str) -> Column:
    """First 8 hex chars of md5(seed ':' key) — a uniform draw in
    [0, 2^32) encoded as fixed-width lowercase hex."""
    return F.substring(
        F.md5(F.concat(F.lit(seed + ":"), key.cast("string"))), 1, 8
    )


def threshold_hex(rate: float) -> str:
    """Inclusion threshold for ``rate`` in [0, 1): 8-char lowercase
    hex of floor(rate * 2^32)."""
    return format(int(rate * 2**32), "08x")


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: str = "mix-v1",
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically;
    emit ``sample_weight = 1/rate`` so downstream aggregates can
    reweight back to corpus-level estimates (Horvitz-Thompson)."""
    h = hash_uniform_hex(F.col(id_col), seed)

    def keep_expr(rate: float) -> Column:
        if rate >= 1.0:
            return F.lit(True)
        if rate <= 0.0:
            return F.lit(False)
        return h < F.lit(threshold_hex(rate))

    keep = keep_expr(default_rate)
    weight = F.lit(1.0 / default_rate if default_rate > 0 else None).cast(
        "double"
    )
    for stratum, rate in rates.items():
        cond = F.col(stratum_col) == F.lit(stratum)
        keep = F.when(cond, keep_expr(rate)).otherwise(keep)
        weight = F.when(
            cond,
            F.lit(1.0 / rate if rate > 0 else None).cast("double"),
        ).otherwise(weight)
    return df.filter(keep).withColumn("sample_weight", weight)


def domain_cap(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    cap: int,
    seed: str = "cap-v1",
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum — the C4/RefinedWeb-style
    per-domain document cap that stops a single mega-host from
    dominating a crawl corpus.

    Which rows survive is a deterministic uniform draw, not arrival
    order: rows rank by the same md5 mixing hash as
    :func:`stratified_sample` (id tiebreak), so the kept set is a
    random-looking but reproducible per-domain sample, invariant to
    partitioning and input order, and nested under cap changes (the
    cap-10 set is a prefix of the cap-100 set for the same seed).
    ``id_col`` must be unique (it is the ranking key — duplicate ids
    make the kept set nondeterministic between the duplicates).

    Scale shape: ``row_number() <= cap`` is rewritten by Spark's
    WindowGroupLimit rule into a PER-MAPPER partial top-``cap`` BEFORE
    the exchange, so a domain with 10^9 rows ships at most
    ``cap × n_input_partitions`` rows into the shuffle instead of all
    of them — the window never materializes a mega-domain on one
    executor. Emits ``domain_rank`` (1-based) for downstream use.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(stratum_col)
        .orderBy(hash_uniform_hex(F.col(id_col), seed), F.col(id_col))
    )
    return (
        df.withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= cap)
    )


def domain_cap_oracle_sql(
    table: str,
    stratum_col: str,
    id_col: str,
    select_cols: str,
    cap: int,
    seed: str = "cap-v1",
) -> str:
    """DuckDB twin of :func:`domain_cap`, generated from the same
    parameters so query and oracle cannot drift."""
    h = f"substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8)"
    return f"""
    SELECT {select_cols}, domain_rank
    FROM (
        SELECT {select_cols},
               CAST(row_number() OVER (
                   PARTITION BY {stratum_col}
                   ORDER BY {h}, {id_col}
               ) AS INTEGER) AS domain_rank
        FROM {table}
    ) t
    WHERE domain_rank <= {cap}
    """


def token_budget_mix(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    tokens_col: str,
    budgets: dict[str, int],
    default_budget: int,
    seed: str = "budget-v1",
) -> DataFrame:
    """Fill each stratum's token budget with a deterministic uniform
    prefix of its documents — how a training mix hits "N tokens of
    source X" targets.

    Zero-token documents are dropped up front (they contribute nothing
    to the mix, and keeping them would make them unconditional
    survivors — cum_tokens never advances past a run of zeros, so
    ``0 <= 0`` would admit them even under a zero budget). The
    remaining rows rank by the md5 mixing hash (id tiebreak;
    ``id_col`` must be unique — it is the ranking key); a row survives
    if the running token total INCLUDING it stays within its stratum's
    budget (strict — the mix never overshoots; the partially-fitting
    tail doc is dropped, not truncated). Emits ``n_tokens`` (the row's
    own count from ``tokens_col``) and ``cum_tokens`` so downstream
    stages can audit the fill level per stratum.

    Scale shape: one shuffle on the stratum key and a single running
    sum in hash order. After the zero-token filter every doc has
    ≥ 1 token, so no survivor can rank past ``budget`` — compose with
    :func:`domain_cap` (``cap = budget``) to pre-prune mega-domains
    map-side before the sort when a single stratum holds billions of
    rows.
    """
    from pyspark.sql import Window

    df = df.filter(F.col(tokens_col) > 0)
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(hash_uniform_hex(F.col(id_col), seed), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.lit(default_budget)
    for stratum, b in budgets.items():
        budget = F.when(
            F.col(stratum_col) == F.lit(stratum), F.lit(b)
        ).otherwise(budget)
    return (
        df.withColumn(
            "cum_tokens", F.sum(F.col(tokens_col)).over(w)
        )
        .filter(F.col("cum_tokens") <= budget)
    )


def token_budget_oracle_sql(
    table_expr: str,
    stratum_col: str,
    id_col: str,
    tokens_sql: str,
    select_cols: str,
    budgets: dict[str, int],
    default_budget: int,
    seed: str = "budget-v1",
) -> str:
    """DuckDB twin of :func:`token_budget_mix`; ``table_expr`` must
    yield the same rows/columns the Spark side sees, with ``tokens_sql``
    the expression mirroring the ``tokens_col`` computation."""
    h = f"substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8)"
    budget_branches = "".join(
        f" WHEN {stratum_col} = '{s}' THEN {b}"
        for s, b in budgets.items()
    )
    return f"""
    SELECT {select_cols}, n_tokens, cum_tokens
    FROM (
        SELECT {select_cols}, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY {stratum_col}
                   ORDER BY {h}, {id_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM (SELECT {select_cols}, {tokens_sql} AS n_tokens
              FROM {table_expr}) raw
        WHERE n_tokens > 0
    ) t
    WHERE cum_tokens <= CASE{budget_branches} ELSE {default_budget} END
    """


def split_assign(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    seed: str = "split-v1",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by
    cumulative hash thresholds — deterministic, partition-invariant,
    and STABLE UNDER CORPUS GROWTH: a doc's split depends only on
    (seed, id), so adding new documents never reshuffles old ones
    between train and test (the property that keeps eval sets
    uncontaminated across corpus versions). ``fractions`` must sum to
    1.0; the last named split absorbs the rounding tail. Pure codegen
    projection, no shuffle."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    h = hash_uniform_hex(F.col(id_col), seed)
    names = list(fractions)
    cum = 0.0
    case = None
    for name in names[:-1]:
        cum += fractions[name]
        cond = h < F.lit(threshold_hex(cum))
        case = (
            F.when(cond, F.lit(name))
            if case is None
            else case.when(cond, F.lit(name))
        )
    expr = (
        case.otherwise(F.lit(names[-1]))
        if case is not None
        else F.lit(names[-1])
    )
    return df.withColumn("split", expr)


def split_oracle_sql(
    table: str,
    id_col: str,
    select_cols: str,
    fractions: dict[str, float],
    seed: str = "split-v1",
) -> str:
    """DuckDB twin of :func:`split_assign` from the same fractions."""
    h = f"substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8)"
    names = list(fractions)
    cum = 0.0
    whens = []
    for name in names[:-1]:
        cum += fractions[name]
        whens.append(f"WHEN {h} < '{threshold_hex(cum)}' THEN '{name}'")
    case = " ".join(whens)
    return f"""
    SELECT {select_cols},
           CASE {case} ELSE '{names[-1]}' END AS split
    FROM {table}
    """


def sample_oracle_sql(
    table: str,
    stratum_col: str,
    id_col: str,
    select_cols: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: str = "mix-v1",
) -> str:
    """The DuckDB twin of :func:`stratified_sample`, generated from the
    SAME rate dict so query and oracle cannot drift."""
    h = f"substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8)"

    def keep_sql(rate: float) -> str:
        if rate >= 1.0:
            return "TRUE"
        if rate <= 0.0:
            return "FALSE"
        return f"{h} < '{threshold_hex(rate)}'"

    keep_branches = "".join(
        f" WHEN {stratum_col} = '{s}' THEN {keep_sql(r)}"
        for s, r in rates.items()
    )
    weight_branches = "".join(
        f" WHEN {stratum_col} = '{s}' THEN {1.0 / r!r}"
        for s, r in rates.items()
        if r > 0
    )
    return f"""
    SELECT {select_cols},
           CAST(CASE{weight_branches}
                ELSE {1.0 / default_rate!r} END AS DOUBLE) AS sample_weight
    FROM {table}
    WHERE CASE{keep_branches} ELSE {keep_sql(default_rate)} END
    """


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int,
    n_shards: int,
    seed: str = "pack-v1",
) -> DataFrame:
    """GPT-style sequence packing, distributed: documents concatenate
    in a deterministic order and split into fixed ``seq_len``-token
    training examples; each doc learns which example(s) it lands in.

    Concatenation order must be reproducible AND shardable, so docs
    first land in ``n_shards`` independent shards (``id mod n_shards``
    — swap in a hash shard for adversarial id spaces) and concatenate
    within their shard in mixing-hash order (md5, id tiebreak — the
    same deterministic uniform order the samplers use). Per doc:
    ``tok_offset`` (its start in the shard's token stream),
    ``start_bin``/``end_bin`` (the first/last ``seq_len`` example it
    touches — a long doc spans several; a boundary doc straddles two).

    Scale shape: one shuffle on the shard key, one running sum per
    shard — the window state is a single long. Zero-token docs are
    dropped (a zero-width span belongs to no example). Downstream, an
    example assembler groups by (shard, bin) — bins are uniform by
    construction, ~seq_len tokens each.
    """
    from pyspark.sql import Window

    df = df.filter(F.col(tokens_col) > 0)
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(hash_uniform_hex(F.col(id_col), seed), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(F.col(id_col), F.col(tokens_col), shard)
        .withColumn("__cum", F.sum(tokens_col).over(w))
        .select(
            id_col,
            "shard",
            tokens_col,
            (F.col("__cum") - F.col(tokens_col)).alias("tok_offset"),
            F.floor(
                (F.col("__cum") - F.col(tokens_col)) / F.lit(seq_len)
            ).alias("start_bin"),
            F.floor((F.col("__cum") - 1) / F.lit(seq_len)).alias(
                "end_bin"
            ),
        )
    )


def pack_oracle_sql(
    table_expr: str,
    id_col: str,
    tokens_sql: str,
    seq_len: int,
    n_shards: int,
    seed: str = "pack-v1",
) -> str:
    """DuckDB twin of :func:`pack_sequences`."""
    h = f"substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8)"
    return f"""
    SELECT {id_col}, shard, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS tok_offset,
           CAST(floor((cum - n_tokens) / {seq_len}) AS BIGINT) AS start_bin,
           CAST(floor((cum - 1) / {seq_len}) AS BIGINT) AS end_bin
    FROM (
        SELECT {id_col}, shard, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY shard
                   ORDER BY {h}, {id_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM (
            SELECT {id_col}, {id_col} % {n_shards} AS shard,
                   {tokens_sql} AS n_tokens
            FROM {table_expr}
        ) raw
        WHERE n_tokens > 0
    ) t
    """


def weighted_sample_k(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "wsample-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per stratum
    (Efraimidis–Spirakis A-ES): each row draws the deterministic
    uniform u = hash(seed,id)/2^32 and competes on the key
    ln(u)/weight — the top-k keys per stratum are a true
    weight-proportional sample, and the whole draw is reproducible
    across engines, partitionings and reruns. Completes the sampler
    family: bernoulli-rate (stratified_sample), uniform-k
    (domain_cap), token-greedy (token_budget_mix), and now
    weight-proportional-k.

    Cross-engine determinism: u is an exact integer over 2^32 (both
    engines compute the identical double), and the ln-derived key
    COLLAPSES TO INTEGER MICRO-UNITS via the shared IEEE sequence
    floor(x*1e6 + 0.5) before ranking — never a decimal round — with
    the id as total-order tiebreak, so a 1-ulp ln() disagreement
    cannot flip the cut (the text_lm_score lesson, applied at design
    time). Zero/negative weights are excluded (they have no
    probability mass; ln(u)/w would order them NaN-ishly).

    Scale shape: identical to domain_cap — the rank filter compiles
    to WindowGroupLimit, a per-mapper partial top-k BEFORE the single
    shuffle on the stratum key.
    """
    from pyspark.sql import Window

    df = df.filter(F.col(weight_col) > 0)
    u = (
        F.conv(hash_uniform_hex(F.col(id_col), seed), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    key = F.floor(
        F.log(u) / F.col(weight_col) * F.lit(1_000_000.0) + F.lit(0.5)
    ).cast("long")
    w = Window.partitionBy(stratum_col).orderBy(
        F.desc_nulls_last(key), F.col(id_col)
    )
    return (
        df.withColumn("__wkey", key)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("__wkey")
    )


def weighted_sample_oracle_sql(
    table: str,
    stratum_col: str,
    id_col: str,
    weight_sql: str,
    select_cols: str,
    k: int,
    seed: str = "wsample-v1",
) -> str:
    """DuckDB twin of :func:`weighted_sample_k` (same hash, same
    micro-collapsed key, same tiebreak)."""
    h = f"substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8)"
    u = f"(CAST(('0x' || {h}) AS UBIGINT) / 4294967296.0)"
    key = (
        f"CAST(floor(ln({u}) / ({weight_sql}) * 1000000 + 0.5) AS BIGINT)"
    )
    return f"""
    SELECT {select_cols}, sample_rank
    FROM (
        SELECT {select_cols},
               CAST(row_number() OVER (
                   PARTITION BY {stratum_col}
                   ORDER BY {key} DESC, {id_col}
               ) AS INTEGER) AS sample_rank
        FROM {table}
        WHERE ({weight_sql}) > 0
    ) t
    WHERE sample_rank <= {k}
    """


def conformal_threshold(
    scored: DataFrame,
    score_col: str,
    id_col: str,
    alpha: float,
) -> DataFrame:
    """Split-conformal calibration threshold: the
    floor(alpha * (n + 1))-th SMALLEST score of the calibration frame
    (ties broken by id — a total order, so the order statistic is
    unique), returned as a ONE-ROW frame (n_cal, k_rank,
    threshold_score) for broadcasting into the scoring pass. Keeping
    ``score >= threshold`` on exchangeable data then covers at least
    1 - alpha of it in expectation — the distribution-free guarantee.
    If floor(alpha * (n + 1)) < 1 the quantile is below every sample
    and the returned frame is EMPTY (callers treat no-threshold as
    keep-everything).

    Scale shape: the rank comes from the bucket-offset global row
    number (operators/windows.py — no single-partition sort of the
    calibration frame; buckets on the milli-score, a bounded value
    domain), joined to a broadcast 1-row count frame. Two bounded
    exchanges at any calibration size.
    """
    from sales_etl_spark.operators.windows import global_row_number

    ranked = global_row_number(
        scored,
        order_by=[F.col(score_col), F.col(id_col)],
        bucket=F.floor(F.col(score_col) * F.lit(1000.0)).cast("long"),
        out="__rn",
    )
    stats = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cal")
    ).withColumn(
        "k_rank",
        F.floor((F.col("n_cal") + F.lit(1)) * F.lit(float(alpha)))
        .cast("bigint"),
    )
    return ranked.join(
        F.broadcast(stats), ranked["__rn"] == stats["k_rank"]
    ).select(
        "n_cal", "k_rank", F.col(score_col).alias("threshold_score")
    )
