"""Unit tier for the corpus-structure/graph-profile closers
(plans/structure.py): paragraph-dedup reassembly discipline, and the entropy/Zipf invariants the oracle
hash cannot state on its own."""

from __future__ import annotations

import math

from sales_etl_spark.functions import text as TX
from sales_etl_spark.plans import QUERY_REGISTRY

SF = "/root/testdata/sf0.001"


def _build(spark, name):
    return QUERY_REGISTRY[name].builder(spark, SF)


def test_paragraph_dedup_reassembles_in_order_and_balances(spark):
    out = _build(spark, "dedup_paragraphs").toPandas().set_index("doc_id")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = {
        r.doc_id: r.t
        for r in docs.select(
            "doc_id", TX.tokens(TX.normalize_text("text")).alias("t")
        ).collect()
    }
    # every document appears exactly once
    assert len(out) == len(toks)
    # the corpus actually exercises the positive path at this SF
    assert (out.n_dropped > 0).any()
    assert (out.n_dropped < out.n_chunks).any()
    for doc_id, row in out.iterrows():
        t = toks[doc_id]
        n_chunks_expected = math.ceil(len(t) / 4)
        assert row.n_chunks == n_chunks_expected
        if row.n_dropped == 0:
            # nothing removed → the reassembly is the token stream
            assert row.clean_text == " ".join(t)
    # survivors are a subsequence of the original chunk list, in order
    sample = out[out.n_dropped > 0].head(5)
    for doc_id, row in sample.iterrows():
        t = toks[doc_id]
        chunks = [
            " ".join(t[i * 4 : i * 4 + 4])
            for i in range(math.ceil(len(t) / 4))
        ]
        survivors = _greedy_subsequence(row.clean_text, chunks)
        assert survivors is not None, (doc_id, row.clean_text)
        assert len(survivors) == row.n_chunks - row.n_dropped


def _greedy_subsequence(clean_text: str, chunks: list[str]):
    """Split clean_text back into a subsequence of ``chunks`` (greedy,
    in order); returns the matched chunk list or None."""
    rest = clean_text
    matched = []
    i = 0
    while rest:
        advanced = False
        while i < len(chunks):
            c = chunks[i]
            if rest == c:
                matched.append(c)
                rest = ""
                advanced = True
                i += 1
                break
            if rest.startswith(c + " "):
                matched.append(c)
                rest = rest[len(c) + 1 :]
                advanced = True
                i += 1
                break
            i += 1
        if not advanced:
            return None
    return matched


def test_type_entropy_bounds(spark):
    rows = _build(spark, "events_type_entropy").collect()
    assert rows
    for r in rows:
        assert r.n_types >= 1
        assert r.entropy >= 0.0
        # H <= ln(n_types) + micro-unit rounding slack
        assert r.entropy <= math.log(r.n_types) + 1e-5, r
        if r.n_types == 1:
            assert r.entropy == 0.0


def test_zipf_slope_is_nonpositive_and_complete(spark):
    rows = _build(spark, "text_zipf_slope").collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources
    for r in rows:
        # tf is non-increasing in rank, so the LS slope cannot be > 0
        assert r.zipf_slope <= 0.0, r
        assert r.n_terms >= 2


def test_triangle_clustering_invariants(spark):
    rows = _build(spark, "graph_triangle_cluster").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.clustering <= 1.0, r
        assert r.triangles >= 0 and r.degree >= 1
        if r.degree < 2:
            assert r.triangles == 0
    # descending by triangles with part_id tiebreak
    key = [(-r.triangles, r.part_id) for r in rows]
    assert key == sorted(key)


def test_bm25_returns_matching_docs_in_order(spark):
    rows = _build(spark, "text_bm25_topk").collect()
    assert len(rows) == 20
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # every returned doc really contains a query term
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    texts = {
        r.doc_id: r.text.lower()
        for r in docs.filter(
            docs.doc_id.isin([r.doc_id for r in rows])
        ).collect()
    }
    for r in rows:
        assert any(
            q in texts[r.doc_id] for q in ("spark", "join", "window")
        ), r.doc_id


def test_hybrid_rrf_is_self_consistent(spark):
    rows = _build(spark, "search_hybrid_rrf").collect()
    assert len(rows) == 10
    assert all(r.doc_id != 0 for r in rows)
    for r in rows:
        want = (1.0 / (60 + r.text_rank) if r.text_rank else 0.0) + 1.0 / (
            60 + r.vector_rank
        )
        assert r.rrf == want, r
    vals = [r.rrf for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_hybrid_rrf_plan_has_no_unpartitioned_corpus_window(spark):
    """The rank legs must use the bucket-offset decomposition: every
    Window node in the physical plan partitions by some key (the
    single-partition global window is the canonical scale-killer)."""
    df = _build(spark, "search_hybrid_rrf")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        # spec = "part..., order... ASC/DESC ..., frame$()" — a global
        # window has NO partition column before the first ordered col.
        # The only global windows allowed are the bucket-offset
        # cumulative sums over the ~|buckets|-row counts frame.
        first = spec.split(",")[0].strip()
        if first.endswith(("ASC NULLS FIRST", "DESC NULLS LAST")):
            assert first.startswith("__bkt"), (
                "unpartitioned corpus-sized window: " + spec
            )


def test_ab_welch_matches_direct_computation(spark):
    row = _build(spark, "events_ab_welch").collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet")
    import pandas as pd

    pdf = ev.filter("event_type = 'purchase'").toPandas()
    pdf["sp"] = (pdf["value"] * 1e6 + 0.5).apply(math.floor).astype("int64")
    spend = pdf.groupby("user_id")["sp"].sum()
    c = spend[spend.index % 2 == 0]
    t = spend[spend.index % 2 == 1]
    assert row.n_control == len(c) and row.n_treatment == len(t)
    assert abs(row.mean_control - c.mean() / 1e6) < 1e-6
    assert abs(row.mean_treatment - t.mean() / 1e6) < 1e-6
    se = math.sqrt(c.var(ddof=1) / len(c) + t.var(ddof=1) / len(t))
    want_z = (t.mean() - c.mean()) / se
    assert abs(row.z_score - want_z) < 1e-9 * max(1.0, abs(want_z))


def test_ks_drift_matches_direct_computation(spark):
    row = _build(spark, "quality_ks_drift").collect()[0]
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    a = sorted(docs[docs.source == "src0"].n_chars)
    b = sorted(docs[docs.source == "src1"].n_chars)
    na, nb = len(a), len(b)
    assert (row.n_a, row.n_b) == (na, nb)
    import bisect

    d_num = 0
    for x in sorted(set(a) | set(b)):
        ca = bisect.bisect_right(a, x)
        cb = bisect.bisect_right(b, x)
        d_num = max(d_num, abs(ca * nb - cb * na))
    assert row.d_num == d_num
    assert row.ks_stat == d_num / (na * nb)
    assert 0.0 <= row.ks_stat <= 1.0


def test_association_rules_are_internally_consistent(spark):
    rows = _build(spark, "agg_association_rules").collect()
    assert rows
    for r in rows:
        assert r.n_ab >= 3
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert r.confidence == r.n_ab / r.n_a
        assert 0.0 < r.confidence <= 1.0
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_benford_covers_all_digits_and_shares_sum_to_one(spark):
    rows = _build(spark, "quality_benford_digits").collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-12
    # Benford expected shares are a fixed profile: micro(log10(1+1/d))
    for r in rows:
        want = math.floor(math.log10(1.0 + 1.0 / r.digit) * 1e6 + 0.5)
        assert r.exp_micro == want


def test_pca_power_matches_exact_integer_replication(spark):
    """The operator's declared semantics are 3 EXACT integer power
    iterations from all-ones (random-data covariance spectra are too
    tight for 3 iterations to converge to the true eigenvector, so
    the check is algorithmic, not spectral): replicate the identical
    integer arithmetic in arbitrary-precision Python and require
    exact v_scaled equality, then assert the iteration made spectral
    progress (Rayleigh quotient strictly increased from v0 and is
    bounded by the top eigenvalue)."""
    import numpy as np

    rows = _build(spark, "emb_pca_power").collect()
    assert len(rows) == 64
    got = {r.dim: r.v_scaled for r in rows}
    v_load = np.zeros(64)
    for r in rows:
        v_load[r.dim - 1] = r.loading
    assert abs(np.linalg.norm(v_load) - 1.0) < 1e-9

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    X = emb.embedding.tolist()
    n, d = len(X), 64
    q = [[math.floor(float(x) * 1e9 + 0.5) for x in row] for row in X]
    s = [sum(q[r][i] for r in range(n)) for i in range(d)]
    gram = [[0] * d for _ in range(d)]
    for row in q:
        for i in range(d):
            qi = row[i]
            gi = gram[i]
            for j in range(d):
                gi[j] += qi * row[j]
    cp = [
        [n * gram[i][j] - s[i] * s[j] for j in range(d)] for i in range(d)
    ]
    v = [100_000] * d
    def rayleigh(vec):
        num = sum(
            vec[i] * cp[i][j] * vec[j] for i in range(d) for j in range(d)
        )
        den = sum(x * x for x in vec)
        return num / den
    r0 = rayleigh(v)
    for _ in range(3):
        w = [sum(cp[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        v = [
            -((-x if x < 0 else x) * 100_000 // m)
            if x < 0
            else (x * 100_000 // m)
            for x in w
        ]
    assert {i + 1: v[i] for i in range(d)} == got
    r3 = rayleigh(v)
    assert r3 > r0
    # bounded by the top eigenvalue of the SAME scaled matrix
    top = max(np.linalg.eigvalsh(np.array(cp, dtype=np.float64)))
    assert r3 <= top * (1 + 1e-9)


def test_argmin_supplier_equals_window_formulation(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    got = {
        (r.part_id, r.best_supp, r.best_price)
        for r in _build(spark, "agg_argmin_supplier").collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    ps = li.groupBy(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).agg(F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("mp"))
    w = Window.partitionBy("p").orderBy(F.asc("mp"), F.asc("s"))
    want = {
        (r.p, r.s, float(r.mp))
        for r in ps.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == want


def test_path_topk_counts_are_consistent(spark):
    rows = _build(spark, "events_path_topk").collect()
    assert len(rows) == 15
    counts = [r.n_paths for r in rows]
    assert counts == sorted(counts, reverse=True)
    types = {"view", "click", "purchase", "signup", "error"}
    for r in rows:
        assert {r.step1, r.step2, r.step3} <= types


def test_dpp_plan_prunes_dynamically(spark):
    """Lock the dynamic-partition-pruning shape: the partitioned fact
    scan must carry a dynamicpruningexpression derived from the
    broadcast calendar dim (plus the inferred static partition
    predicate Catalyst pushes through the equi-join)."""
    df = _build(spark, "scan_dpp_prune")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruningexpression" in plan, plan
    assert "PartitionFilters" in plan


def test_revenue_bridge_reconciles(spark):
    row = _build(spark, "flagship_revenue_bridge").collect()[0]
    # telescoping identity: the four components reconcile to the exact
    # decimal delta within per-part micro-unit rounding
    recon = (
        row.volume_effect + row.price_effect + row.new_effect
        + row.lost_effect
    )
    slack = (row.n_common * 2 + row.n_new + row.n_lost) * 1e-6
    assert abs(recon - row.delta_revenue) <= slack, (recon, row)
    assert row.n_common > 0 and row.n_common + row.n_new > 0


def test_pareto_cut_is_minimal(spark):
    row = _build(spark, "agg_pareto_cut").collect()[0]
    orders = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    cents = (
        (orders.o_totalprice * 100).round().astype("int64")
        .groupby(orders.o_custkey)
        .sum()
        .sort_values(ascending=False)
    )
    total = int(cents.sum())
    cum = 0
    for k, v in enumerate(cents.values, start=1):
        cum += int(v)
        if 5 * cum >= 4 * total:
            break
    assert row.k_top == k
    assert row.share_at_cut >= 0.8
    assert row.n_customers == len(cents)


def test_weighted_median_matches_direct(spark):
    rows = {
        r.returnflag: r for r in _build(spark, "agg_weighted_median").collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    for flag, grp in li.groupby("l_returnflag"):
        g = grp.sort_values("l_extendedprice")
        w = g.l_quantity.astype("int64")
        tw = int(w.sum())
        cw = 0
        med = None
        for price, q in zip(g.l_extendedprice, w):
            cw += int(q)
            if 2 * cw >= tw:
                med = price
                break
        r = rows[flag]
        assert r.total_weight == tw
        assert abs(r.weighted_median - med) < 1e-9


def test_drawdown_matches_direct_series(spark):
    row = _build(spark, "window_drawdown").collect()[0]
    orders = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    day = (
        (orders.o_totalprice * 100)
        .round()
        .astype("int64")
        .groupby(orders.o_orderdate.dt.date)
        .sum()
        .sort_index()
    )
    cum = day.cumsum()
    runmax = cum.cummax()
    dd = runmax - cum
    assert row.n_days == len(day)
    assert row.max_drawdown == int(dd.max()) / 100.0
    assert row.trough_day == dd[dd == dd.max()].index.min()
    assert row.total_revenue == int(day.sum()) / 100.0


def test_hll_rollup_merge_is_exact_and_estimates_are_close(spark):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF}/events.parquet")
    rows = _build(spark, "events_hll_rollup").collect()
    assert rows
    # (a) estimate within HLL error of the exact weekly distinct
    exact = {
        (r.etype, r.week): r.n
        for r in ev.groupBy(
            F.col("event_type").alias("etype"),
            F.date_trunc("week", "ts").cast("date").alias("week"),
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        want = exact[(r.etype, r.week)]
        assert abs(r.est_users - want) <= max(2.0, 0.1 * want), (r, want)
    # (b) union of daily sketches == direct weekly sketch, exactly
    direct = {
        (r.etype, r.week): r.est
        for r in ev.groupBy(
            F.col("event_type").alias("etype"),
            F.date_trunc("week", "ts").cast("date").alias("week"),
        )
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    for r in rows:
        assert r.est_users == direct[(r.etype, r.week)], r


def test_schema_evolution_reads_old_rows_as_unknown(spark):
    rows = _build(spark, "scan_schema_evolution").collect()
    by_p = {r.priority: r for r in rows}
    assert "unknown" in by_p  # the pre-evolution batch survives
    assert by_p["unknown"].n_orders > 0
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    assert sum(r.n_orders for r in rows) == orders.count()


def test_ann_recall_eval_meets_tier_floors(spark):
    rows = {r.tier: r for r in _build(spark, "ann_recall_eval").collect()}
    assert set(rows) == {"lsh", "ivf"}
    for r in rows.values():
        assert r.n_exact == 50  # 5 queries x top-10
        assert r.recall_at_10 == r.n_hits / r.n_exact
        # same floors the similarity unit tier asserts
        assert r.recall_at_10 >= 0.8, r


def test_churn_rate_matches_direct_sets(spark):
    rows = {r.month: r for r in _build(spark, "agg_churn_rate").collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    orders["m"] = orders.o_orderdate.dt.strftime("%Y-%m")
    by_m = {
        m: set(g.o_custkey) for m, g in orders.groupby("m")
    }
    months = sorted(by_m)
    assert set(rows) == set(months[:-1])
    for m, m2 in zip(months, months[1:]):
        r = rows[m]
        churned = by_m[m] - by_m[m2]
        assert r.n_active == len(by_m[m])
        assert r.n_churned == len(churned)
        assert r.churn_rate == len(churned) / len(by_m[m])


def test_dedup_recall_eval_meets_floor(spark):
    row = _build(spark, "dedup_recall_eval").collect()[0]
    assert row.n_exact > 0
    assert row.recall == row.n_caught / row.n_exact
    assert row.recall >= 0.8, row
