"""df.stat surface: approxQuantile honors its error bound against the exact
percentile, freqItems finds an injected heavy hitter, sampleBy respects
per-stratum fractions.  These are the approximate counterparts of the exact
stats operators (operators/stats.py) for the 100 TB posture, where exact
percentiles/distinct counts are a full sort/shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table


def test_approx_quantile_within_declared_error(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    rel_err = 0.01
    approx = o.stat.approxQuantile("o_totalprice", [0.5], rel_err)[0]
    n = o.count()
    # the guarantee is on rank error: the returned value's rank must lie
    # within (0.5 +/- rel_err) * n
    rank = o.filter(F.col("o_totalprice") <= approx).count()
    assert abs(rank - 0.5 * n) <= rel_err * n + 1


def test_freq_items_finds_injected_heavy_hitter(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    hot = spark.range(0, o.count()).select(F.lit(-7).alias("o_custkey"))
    skewed = o.unionByName(hot)  # -7 now holds >= 50% of all rows
    items = skewed.stat.freqItems(["o_custkey"], support=0.3).collect()[0][0]
    assert -7 in items


def test_sample_by_respects_stratum_fractions(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    fractions = {"F": 0.5, "O": 0.1, "P": 1.0}
    sampled = o.stat.sampleBy("o_orderstatus", fractions, seed=42)
    got = {r["o_orderstatus"]: r["n"] for r in
           sampled.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["o_orderstatus"]: r["n"] for r in
            o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    for status, frac in fractions.items():
        if full.get(status, 0) < 50:
            continue  # too small to assert a ratio
        ratio = got.get(status, 0) / full[status]
        assert abs(ratio - frac) < 0.15, (status, ratio, frac)


def test_observed_stats_match_dedicated_pass(spark, sf_dir, tmp_path):
    from ominimo_dynamic_data_pipeline_spark.operators.stats import (
        compute_field_stats,
        observe_field_stats,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.to_date("o_orderdate").alias("o_orderdate"),
        "o_orderstatus",
    )
    observed, finish = observe_field_stats(o)
    # the metrics ride along with the sink action — no dedicated stats job
    observed.write.mode("overwrite").format("noop").save()
    doc = finish()
    expected = compute_field_stats(o, approx=True)
    assert doc == expected
    assert doc["total_records"] > 0
    assert doc["fields"]["o_totalprice"]["null_count"] == 0
    assert "min_date" in doc["fields"]["o_orderdate"]


def test_cusum_changepoint_registry_step(spark):
    """cusum_changepoint registers as a transformation type, matches its
    direct-call twin, and fails fast on missing params."""
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from ominimo_dynamic_data_pipeline_spark.operators.features import (
        cusum_changepoint,
    )
    from ominimo_dynamic_data_pipeline_spark.operators.registry import (
        CompileContext,
        apply_transformations,
    )

    rows = [("a", t, x) for t, x in enumerate([5, 5, 5, 20, 20, 20])]
    df = spark.createDataFrame(rows, schema="g string, t bigint, x bigint")
    out = apply_transformations(
        CompileContext(spark, frames={"s": df}),
        {"transformations": [
            {"name": "cp", "type": "cusum_changepoint",
             "params": {"input": "s", "group_col": "g",
                        "time_col": "t", "value_col": "x"}},
        ]},
    )
    got = out["cp"].collect()
    want = cusum_changepoint(df, "g", "t", "x").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # the level shifts UP after t=2 -> changepoint there, direction -1
    assert got[0]["changepoint"] == 2 and got[0]["direction"] == -1
    with pytest.raises(ValueError, match="value_col"):
        apply_transformations(
            CompileContext(spark, frames={"s": df}),
            {"transformations": [
                {"name": "cp", "type": "cusum_changepoint",
                 "params": {"input": "s", "group_col": "g",
                            "time_col": "t"}},
            ]},
        )


def test_cusum_changepoint_rejects_bad_values(spark):
    """Non-integral value columns fail eagerly (silent truncation would
    shift the argmax); NULL values raise at execution, loudly."""
    import pytest

    from ominimo_dynamic_data_pipeline_spark.operators.features import (
        cusum_changepoint,
    )

    dbl = spark.createDataFrame(
        [("a", 0, 1.5)], schema="g string, t bigint, x double"
    )
    with pytest.raises(ValueError, match="must be integral"):
        cusum_changepoint(dbl, "g", "t", "x")
    withnull = spark.createDataFrame(
        [("a", 0, 1), ("a", 1, None)], schema="g string, t bigint, x bigint"
    )
    with pytest.raises(Exception, match="NULL in value_col"):
        cusum_changepoint(withnull, "g", "t", "x").collect()


# --- round-6 additions: semantic pins independent of the DuckDB oracles ---


def test_spearman_matches_python_reference(spark, sf_dir):
    """q171's doubled-tie-rank moment algebra against a direct Python
    computation of Spearman's rho (tie-averaged ranks, textbook formula)
    on the same rows — an independent-semantics check, not a restatement
    of the oracle SQL."""
    from ominimo_dynamic_data_pipeline_spark.queries.analytics import (
        q171_rank_correlation,
    )

    got = {
        r["lang"]: (r["n"], r["spearman_rho"])
        for r in q171_rank_correlation(spark, sf_dir).collect()
    }

    from ominimo_dynamic_data_pipeline_spark.llm.text import tokens as tok

    rows = (
        load_table(spark, sf_dir, "documents")
        .select(
            "lang",
            F.col("n_chars").alias("x"),
            F.size(tok(F.col("text"))).alias("y"),
        )
        .collect()
    )
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["x"], r["y"]))

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2.0
            for k in range(i, j):
                ranks[order[k]] = avg
            i = j
        return ranks

    for lang, pts in by_lang.items():
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        rx, ry = avg_ranks(xs), avg_ranks(ys)
        n = len(pts)
        mean_rx = sum(rx) / n
        mean_ry = sum(ry) / n
        cov = sum((a - mean_rx) * (b - mean_ry) for a, b in zip(rx, ry))
        vx = sum((a - mean_rx) ** 2 for a in rx)
        vy = sum((b - mean_ry) ** 2 for b in ry)
        expect = cov / (vx**0.5 * vy**0.5)
        gn, grho = got[lang]
        assert gn == n
        assert abs(grho - expect) < 1e-9, (lang, grho, expect)


def test_benford_audit_is_consistent(spark, sf_dir):
    """q169 invariants: fractions sum to 1 on both columns, counts sum to
    the positive-price row count, chi2 terms are non-negative and match
    the definition recomputed from the output's own columns."""
    from ominimo_dynamic_data_pipeline_spark.queries.analytics import (
        q169_benford_price_audit,
    )

    rows = q169_benford_price_audit(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    n_pos = li.filter(F.col("l_extendedprice") > 0).count()
    assert sum(r["n"] for r in rows) == n_pos
    assert abs(sum(r["obs_frac"] for r in rows) - 1.0) < 1e-12
    assert abs(sum(r["exp_frac"] for r in rows) - 1.0) < 1e-12
    for r in rows:
        d = r["obs_frac"] - r["exp_frac"]
        assert r["chi2_term"] >= 0
        assert abs(r["chi2_term"] - d * d / r["exp_frac"]) < 1e-15


def test_vocab_coverage_monotone(spark, sf_dir):
    """q178: coverage grows with k, n_terms caps at min(k, vocab), and
    the fraction is covered/total exactly."""
    from ominimo_dynamic_data_pipeline_spark.queries.llm import (
        q178_vocab_coverage,
    )

    rows = sorted(
        q178_vocab_coverage(spark, sf_dir).collect(), key=lambda r: r["k"]
    )
    prev_cov = -1.0
    for r in rows:
        assert r["n_terms"] == min(r["k"], r["vocab_size"])
        assert r["coverage_frac"] >= prev_cov
        prev_cov = r["coverage_frac"]
    assert rows[-1]["coverage_frac"] <= 1.0


def test_hhi_bounds(spark, sf_dir):
    """q179: 1/n <= HHI <= 1 and HHI >= top_share^2 (Cauchy-Schwarz)."""
    from ominimo_dynamic_data_pipeline_spark.queries.analytics import (
        q179_market_concentration,
    )

    for r in q179_market_concentration(spark, sf_dir).collect():
        n = r["n_suppliers"]
        assert 1.0 / n - 1e-12 <= r["hhi"] <= 1.0 + 1e-12
        assert r["hhi"] >= r["top_share"] ** 2 - 1e-12
        assert 0.0 <= r["top_share"] <= 1.0


def test_rfm_terciles_balanced(spark, sf_dir):
    """q180: each metric's tercile marginals are balanced within 1 user
    (NTILE contract) and cover every user exactly once."""
    from ominimo_dynamic_data_pipeline_spark.queries.analytics import (
        q180_rfm_segments,
    )

    rows = q180_rfm_segments(spark, sf_dir).collect()
    total = sum(r["n_users"] for r in rows)
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert total == n_users
    for dim in ("r_bucket", "f_bucket", "m_bucket"):
        marg: dict = {}
        for r in rows:
            marg[r[dim]] = marg.get(r[dim], 0) + r["n_users"]
        assert set(marg) == {1, 2, 3}
        assert max(marg.values()) - min(marg.values()) <= 1


def test_fano_matches_python_reference(spark, sf_dir):
    """q181's algebraic-moments Fano against a direct Python computation
    over the zero-inclusive minute grid."""
    from ominimo_dynamic_data_pipeline_spark.queries.analytics import (
        q181_event_burstiness,
    )

    got = {
        r["event_type"]: r for r in q181_event_burstiness(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.expr("unix_micros(ts) div 60000000").alias("m"))
        .collect()
    )
    mins = [r["m"] for r in rows]
    lo, hi = min(mins), max(mins)
    n_minutes = hi - lo + 1
    per_type: dict = {}
    for r in rows:
        per_type.setdefault(r["event_type"], {}).setdefault(r["m"], 0)
        per_type[r["event_type"]][r["m"]] += 1
    for et, counts in per_type.items():
        xs = list(counts.values()) + [0] * (n_minutes - len(counts))
        n = len(xs)
        mean = sum(xs) / n
        var = sum((x - mean) ** 2 for x in xs) / n
        g = got[et]
        assert g["n_minutes"] == n_minutes
        assert g["n_events"] == sum(xs)
        assert abs(g["mean_per_min"] - mean) < 1e-9
        assert abs(g["fano"] - var / mean) < 1e-9, (et, g["fano"], var / mean)


def test_dim_stats_match_python_reference(spark, sf_dir):
    """q182's quantized integer moments against float64 statistics over
    the collected embedding matrix (micro-quantization bounds the
    divergence at the 1e-6 quantum)."""
    from ominimo_dynamic_data_pipeline_spark.queries.llm import (
        q182_embedding_dim_stats,
    )

    got = {r["dim"]: r for r in q182_embedding_dim_stats(spark, sf_dir).collect()}
    vecs = [
        r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    ]
    dim = len(vecs[0])
    assert set(got) == set(range(dim))
    for d in range(dim):
        col = [float(v[d]) for v in vecs]
        n = len(col)
        mean = sum(col) / n
        var = sum((x - mean) ** 2 for x in col) / n
        g = got[d]
        assert g["n"] == n
        assert abs(g["mean_val"] - mean) < 2e-6
        assert abs(g["std_val"] - var**0.5) < 2e-6
        assert g["min_val"] == min(col) and g["max_val"] == max(col)


def test_session_paths_consistent_with_q34(spark, sf_dir):
    """q183: path multiplicities sum to q34's session count, shares are
    n/total, and every path's segment count is positive."""
    from ominimo_dynamic_data_pipeline_spark.queries.windows_batch import (
        q183_top_session_paths,
        q34_user_sessions,
    )

    rows = q183_top_session_paths(spark, sf_dir).collect()
    n_sessions = q34_user_sessions(spark, sf_dir).count()
    assert rows, "no session paths"
    assert sum(r["n"] for r in rows) <= n_sessions
    for r in rows:
        assert r["n"] >= 1 and r["path"]
        assert abs(r["share"] - r["n"] / n_sessions) < 1e-12


def test_embedding_outliers_match_python_reference(spark, sf_dir):
    """q184's nano-quantized standardized-deviation scores against a
    float64 recomputation over the collected matrix (quantization bounds
    divergence at 64 * 0.5e-9)."""
    from ominimo_dynamic_data_pipeline_spark.queries.llm import (
        q184_embedding_outliers,
    )

    got = q184_embedding_outliers(spark, sf_dir).collect()
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    dim = len(next(iter(vecs.values())))
    cols = [[v[d] for v in vecs.values()] for d in range(dim)]
    n = len(vecs)
    means = [sum(c) / n for c in cols]
    stds = [
        (sum((x - m) ** 2 for x in c) / n) ** 0.5
        for c, m in zip(cols, means)
    ]
    scores = {
        vid: sum(
            abs(v[d] - means[d]) / stds[d]
            for d in range(dim)
            if stds[d] > 0
        )
        for vid, v in vecs.items()
    }
    expected_top = sorted(scores, key=lambda k: (-scores[k], k))[: len(got)]
    assert [r["vec_id"] for r in got] == expected_top
    for r in got:
        # engine mu/sigma come from micro-quantized sums: up to ~1e-6
        # per-dim input error, amplified by /sigma and 64 dims
        assert abs(r["outlier_score"] - scores[r["vec_id"]]) < 1e-3


def test_window_funnel_matches_python_reference(spark, sf_dir):
    """q185's greedy-earliest funnel (min step time at/after the previous
    step, inclusive 7-day horizon anchored at step 1) against a direct
    Python recompute over the collected events — guards the intent (not
    just cross-engine agreement, which identical integer predicates
    already force)."""
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table
    from ominimo_dynamic_data_pipeline_spark.queries.windows_batch import (
        _Q185_HORIZON_US,
        q185_window_funnel,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["us"], r["event_type"]))
    n_view = n_click = n_purchase = 0
    sum_funnel = 0
    for evs in by_user.values():
        t1 = min((us for us, t in evs if t == "view"), default=None)
        if t1 is None:
            continue
        n_view += 1
        t2 = min(
            (
                us
                for us, t in evs
                if t == "click" and us >= t1 and us - t1 <= _Q185_HORIZON_US
            ),
            default=None,
        )
        if t2 is None:
            continue
        n_click += 1
        t3 = min(
            (
                us
                for us, t in evs
                if t == "purchase"
                and us >= t2
                and us - t1 <= _Q185_HORIZON_US
            ),
            default=None,
        )
        if t3 is None:
            continue
        n_purchase += 1
        sum_funnel += t3 - t1
    row = q185_window_funnel(spark, sf_dir).collect()[0]
    assert row["n_users"] == len(by_user)
    assert row["n_view"] == n_view
    assert row["n_click"] == n_click
    assert row["n_purchase"] == n_purchase
    assert row["sum_funnel_us"] == float(sum_funnel)
    assert abs(row["click_rate"] - n_click / n_view) < 1e-15
    assert abs(row["purchase_rate"] - n_purchase / n_click) < 1e-15


def test_activity_streaks_match_python_reference(spark, sf_dir):
    """q186's gaps-and-islands streaks against a per-user Python
    recompute from the distinct active-day sets."""
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table
    from ominimo_dynamic_data_pipeline_spark.queries.windows_batch import (
        q186_activity_streaks,
    )

    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .collect()
    )
    days: dict[int, set] = {}
    for r in rows:
        days.setdefault(r["user_id"], set()).add(r["day"].toordinal())
    expected = {}
    for uid, ds in days.items():
        sorted_days = sorted(ds)
        streaks = [1]
        for prev, cur in zip(sorted_days, sorted_days[1:]):
            if cur == prev + 1:
                streaks[-1] += 1
            else:
                streaks.append(1)
        expected[uid] = (len(ds), len(streaks), max(streaks))
    got = {
        r["user_id"]: (
            r["n_active_days"],
            r["n_streaks"],
            r["longest_streak"],
        )
        for r in q186_activity_streaks(spark, sf_dir).collect()
    }
    assert got == expected


def test_pareto_frontier_matches_brute_force(spark, sf_dir):
    """q187's sort-sweep skyline against the O(n^2) dominance definition
    recomputed in Python (cents-exact price ties, strict-somewhere)."""
    from ominimo_dynamic_data_pipeline_spark.queries.analytics import (
        q187_pareto_frontier_parts,
    )
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table

    parts = [
        (r["p_brand"], r["p_partkey"],
         round(r["p_retailprice"] * 100), r["p_size"])
        for r in load_table(spark, sf_dir, "part")
        .select("p_brand", "p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    by_brand: dict[str, list] = {}
    for brand, key, cents, size in parts:
        by_brand.setdefault(brand, []).append((key, cents, size))
    expected = set()
    for brand, rows in by_brand.items():
        for key, cents, size in rows:
            dominated = any(
                c2 <= cents and s2 >= size and (c2 < cents or s2 > size)
                for _, c2, s2 in rows
            )
            if not dominated:
                expected.add((brand, key))
    got = {
        (r["p_brand"], r["p_partkey"])
        for r in q187_pareto_frontier_parts(spark, sf_dir).collect()
    }
    assert got == expected


from conftest import lev_reference as _lev


def test_symspell_pairs_match_brute_force(spark, sf_dir):
    """q188's deletion-neighborhood join against the quadratic Python
    scan — proves the blocking is exhaustive for distance <= 1 (recall
    1.0) and the verify step kills distance-2 collisions."""
    from ominimo_dynamic_data_pipeline_spark.queries.extensions import (
        q188_symspell_name_pairs,
    )
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table

    names = sorted(
        r["c_name"]
        for r in load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_name")
        .collect()
    )
    expected = {
        (a, b, _lev(a, b))
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if _lev(a, b) <= 1
    }
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in q188_symspell_name_pairs(spark, sf_dir).collect()
    }
    assert got == expected


def test_rolling_7d_users_match_python_reference(spark, sf_dir):
    """q189's explode-based sliding distinct against a direct per-day set
    recompute."""
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table
    from ominimo_dynamic_data_pipeline_spark.queries.windows_batch import (
        q189_rolling_7d_active_users,
    )

    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .collect()
    )
    active: dict = {}
    for r in rows:
        active.setdefault(r["day"].toordinal(), set()).add(r["user_id"])
    expected = {}
    for d in active:
        users = set()
        for back in range(7):
            users |= active.get(d - back, set())
        expected[d] = len(users)
    import datetime

    got = {
        datetime.date.fromisoformat(r["day"]).toordinal(): r["users_7d"]
        for r in q189_rolling_7d_active_users(spark, sf_dir).collect()
    }
    assert got == expected


def test_user_twap_matches_python_reference(spark, sf_dir):
    """q190's decimal-exact step-hold TWAP against a Python recompute in
    exact integer arithmetic (micro-unit values x micro durations)."""
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table
    from ominimo_dynamic_data_pipeline_spark.queries.windows_batch import (
        q190_user_value_twap,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            "event_id",
            F.round(F.col("value") * 1000000).cast("bigint").alias("v_us"),
        )
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], r["v_us"])
        )
    expected = {}
    for uid, evs in by_user.items():
        evs.sort()
        num = 0
        span = 0
        for (us, _, v), (nxt, _, _) in zip(evs, evs[1:]):
            num += v * (nxt - us)
            span += nxt - us
        if span > 0:
            expected[uid] = (len(evs), span, num / (span * 1000000))
    got = {
        r["user_id"]: (r["n_events"], r["span_us"], r["twap"])
        for r in q190_user_value_twap(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for uid, (n, span, twap) in expected.items():
        gn, gspan, gtwap = got[uid]
        assert (gn, gspan) == (n, span)
        assert abs(gtwap - twap) < 1e-12 * max(1.0, abs(twap))


def test_cluster_representatives_match_python_reference(spark, sf_dir):
    """q191's per-cluster argmax + drop accounting against a Python
    recompute from the q57 cluster assignment and the documents table."""
    from ominimo_dynamic_data_pipeline_spark.queries.llm import (
        q57_dedup_clusters,
        q191_cluster_canonical_docs,
    )
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table

    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in q57_dedup_clusters(spark, sf_dir).collect()
    }
    chars = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    members: dict = {}
    for doc, cl in clusters.items():
        members.setdefault(cl, []).append(doc)
    expected = {}
    for cl, docs in members.items():
        rep = min(docs, key=lambda d: (-chars[d], d))
        total = sum(chars[d] for d in docs)
        expected[cl] = (rep, len(docs), chars[rep], total - chars[rep])
    got = {
        r["cluster_id"]: (
            r["rep_doc_id"], r["n_members"], r["score_kept"],
            r["score_dropped"],
        )
        for r in q191_cluster_canonical_docs(spark, sf_dir).collect()
    }
    assert got == expected


def test_time_decay_attribution_matches_python_reference(spark, sf_dir):
    """q192's powers-of-half credit against an exact integer Python
    recompute (weight numerators over the common denominator 64)."""
    from ominimo_dynamic_data_pipeline_spark.queries.analytics import (
        _Q192_WEEK_US,
        q192_time_decay_attribution,
    )
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("us"),
            F.round(F.col("value") * 100).cast("bigint").alias("v_cents"),
        )
        .collect()
    )
    purchases = [(r["user_id"], r["us"], r["v_cents"]) for r in ev
                 if r["event_type"] == "purchase"]
    touches: dict = {}
    for r in ev:
        if r["event_type"] in ("click", "view"):
            touches.setdefault(r["user_id"], []).append(
                (r["us"], r["event_type"])
            )
    sums = {"click": 0, "view": 0}
    counts = {"click": 0, "view": 0}
    for uid, pus, v in purchases:
        for tus, ttype in touches.get(uid, ()):
            if tus < pus and pus - tus < _Q192_WEEK_US:
                k = (pus - tus) // 86400000000
                sums[ttype] += v * (1 << (6 - k))
                counts[ttype] += 1
    got = {
        r["event_type"]: (r["n_touches"], r["credited_value"])
        for r in q192_time_decay_attribution(spark, sf_dir).collect()
    }
    expected = {
        t: (counts[t], sums[t] / 6400.0)
        for t in ("click", "view")
        if counts[t]
    }
    assert got == expected


def test_winsorized_balances_match_python_reference(spark, sf_dir):
    """q193's rank-disc thresholds + clipped mean against a Python
    recompute in exact integer cents."""
    import math

    from ominimo_dynamic_data_pipeline_spark.queries.analytics import (
        q193_winsorized_balances,
    )
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table

    rows = (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
        )
        .collect()
    )
    segs: dict = {}
    for r in rows:
        segs.setdefault(r["c_mktsegment"], []).append(
            (r["cents"], r["c_custkey"])
        )
    expected = {}
    for seg, vals in segs.items():
        vals.sort()
        n = len(vals)
        lo = vals[max(1, (50000 * n + 999999) // 1000000) - 1][0]
        hi = vals[(950000 * n + 999999) // 1000000 - 1][0]
        clipped = [min(max(c, lo), hi) for c, _ in vals]
        expected[seg] = (
            n, lo, hi,
            sum(1 for c, _ in vals if c < lo),
            sum(1 for c, _ in vals if c > hi),
            sum(clipped) / n / 100.0,
        )
    got = {
        r["c_mktsegment"]: (
            r["n_customers"], r["lo_cents"], r["hi_cents"],
            r["n_clipped_low"], r["n_clipped_high"], r["winsorized_mean"],
        )
        for r in q193_winsorized_balances(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for seg in expected:
        *ints_e, mean_e = expected[seg]
        *ints_g, mean_g = got[seg]
        assert ints_g == ints_e
        assert abs(mean_g - mean_e) < 1e-9


def test_snapshot_diff_matches_python_reference(spark, sf_dir):
    """q194's classified per-customer state diff against a Python
    recompute from the raw orders."""
    from ominimo_dynamic_data_pipeline_spark.queries.analytics import (
        q194_snapshot_diff,
    )
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table

    import datetime

    rows = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .collect()
    )
    c1 = datetime.datetime(1997, 1, 1)
    c2 = datetime.datetime(1998, 1, 1)
    old: dict = {}
    new: dict = {}
    for r in rows:
        if r["o_orderdate"] < c1:
            n, c = old.get(r["o_custkey"], (0, 0))
            old[r["o_custkey"]] = (n + 1, c + r["c"])
        if r["o_orderdate"] < c2:
            n, c = new.get(r["o_custkey"], (0, 0))
            new[r["o_custkey"]] = (n + 1, c + r["c"])
    agg: dict = {}
    for k in set(old) | set(new):
        o, n = old.get(k), new.get(k)
        if o is None:
            t = "added"
        elif n is None:
            t = "removed"
        elif o == n:
            t = "unchanged"
        else:
            t = "changed"
        cnt, d_ord, d_c = agg.get(t, (0, 0, 0))
        agg[t] = (
            cnt + 1,
            d_ord + (n[0] if n else 0) - (o[0] if o else 0),
            d_c + (n[1] if n else 0) - (o[1] if o else 0),
        )
    got = {
        r["change_type"]: (
            r["n_customers"], r["delta_orders"], r["delta_revenue"],
        )
        for r in q194_snapshot_diff(spark, sf_dir).collect()
    }
    expected = {t: (c, d, dc / 100.0) for t, (c, d, dc) in agg.items()}
    assert got == expected


def test_near_dup_source_matrix_consistent_with_q26(spark, sf_dir):
    """q195: the source-pair rollup must account for exactly q26's pair
    set (labels looked up from documents, canonical order)."""
    from ominimo_dynamic_data_pipeline_spark.queries.llm import (
        q26_minhash_near_dups,
        q195_near_dup_source_matrix,
    )
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table

    src = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    expected: dict = {}
    for r in q26_minhash_near_dups(spark, sf_dir).collect():
        a, b = sorted((src[r["id_a"]], src[r["id_b"]]))
        expected[(a, b)] = expected.get((a, b), 0) + 1
    got = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in q195_near_dup_source_matrix(spark, sf_dir).collect()
    }
    assert got == expected


def test_deletion_cascade_matches_python_reference(spark, sf_dir):
    """q196: cascade counts and removed cents against a direct Python
    recompute over the three collected tables."""
    from ominimo_dynamic_data_pipeline_spark.queries.extensions import (
        q196_deletion_cascade_audit,
    )
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.round(F.col("c_acctbal") * 100).cast("bigint").alias("c")
    ).collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    ).collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
    ).collect()
    del_c = {r["c_custkey"] for r in cust if r["c_custkey"] % 97 == 0}
    del_o = {r["o_orderkey"] for r in orders if r["o_custkey"] in del_c}
    expected = {
        "customer": (
            len(del_c), len(cust) - len(del_c),
            sum(r["c"] for r in cust if r["c_custkey"] in del_c),
        ),
        "orders": (
            len(del_o), len(orders) - len(del_o),
            sum(r["c"] for r in orders if r["o_orderkey"] in del_o),
        ),
        "lineitem": (
            sum(1 for r in li if r["l_orderkey"] in del_o),
            sum(1 for r in li if r["l_orderkey"] not in del_o),
            sum(r["c"] for r in li if r["l_orderkey"] in del_o),
        ),
    }
    got = {
        r["table_name"]: (r["n_deleted"], r["n_remaining"], r["cents_removed"])
        for r in q196_deletion_cascade_audit(spark, sf_dir).collect()
    }
    assert got == expected


def test_principal_share_matches_float_reference(spark, sf_dir):
    """q197's quantized-exact spectral shares against a straight float64
    numpy covariance eigensolve over the raw vectors — a third
    computation path (no quantization), so tolerance covers only the
    micro-unit rounding."""
    import numpy as np

    from ominimo_dynamic_data_pipeline_spark.queries.llm import (
        q197_embedding_principal_share,
    )
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("embedding")
        .collect()
    )
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    c = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(c)
    trace = vals.sum()
    got = q197_embedding_principal_share(spark, sf_dir).collect()[0]
    assert got["n_vectors"] == x.shape[0]
    assert got["dim"] == 64
    assert abs(got["total_variance"] - trace) < 1e-6 * max(1.0, trace)
    assert abs(got["top_share"] - vals[-1] / trace) < 5e-3
    assert abs(got["second_share"] - vals[-2] / trace) < 5e-3
    assert 0.0 < got["second_share"] <= got["top_share"] <= 1.0
    v = vecs[:, -1]
    ref_dims = sorted(range(64), key=lambda d: (-abs(v[d]), d))[:3]
    # dominant dimension agrees with the float reference (later ranks can
    # legitimately swap under quantization when loadings tie closely)
    assert got["top_dim_1"] == ref_dims[0]
    assert len({got["top_dim_1"], got["top_dim_2"], got["top_dim_3"]}) == 3


def test_filtered_knn_subset_semantics(spark, sf_dir):
    """q198: every neighbor satisfies the predicate, and for a query
    whose unfiltered top-5 (q29) happens to be all-eligible the two
    lists agree — filter-then-search never invents neighbors."""
    from ominimo_dynamic_data_pipeline_spark.queries.llm import (
        q29_knn_bruteforce,
        q198_filtered_knn,
    )
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table

    eligible = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .where((F.col("lang") == "en") & (F.col("n_chars") >= 200))
        .select("doc_id")
        .collect()
    }
    filt = q198_filtered_knn(spark, sf_dir).collect()
    assert filt, "no filtered neighbors"
    assert all(r["neighbor_id"] in eligible for r in filt)
    unfiltered: dict = {}
    for r in q29_knn_bruteforce(spark, sf_dir).collect():
        unfiltered.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos"])
        )
    filtered: dict = {}
    for r in filt:
        filtered.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos"])
        )
    for qid, rows in unfiltered.items():
        rows.sort()
        if all(n in eligible for _, n, _ in rows):
            assert sorted(filtered[qid]) == rows
        else:
            # the filtered top-k must BEGIN with the eligible
            # subsequence of the unfiltered ranking (filter-then-search
            # preserves relative order; post-filtering would too, but a
            # broken predicate or ranking would not)
            elig_seq = [n for _, n, _ in rows if n in eligible]
            got_seq = [n for _, n, _ in sorted(filtered[qid])]
            k = min(len(elig_seq), len(got_seq))
            assert got_seq[:k] == elig_seq[:k]


def test_invoice_allocation_matches_python_reference(spark, sf_dir):
    """q199's Hamilton allocation against a Python recompute: exact
    conservation (sum == order total), each share within 1 cent of the
    exact proportional value, and the cent bonus goes to the largest
    remainders."""
    from ominimo_dynamic_data_pipeline_spark.queries.extensions import (
        q199_invoice_allocation,
    )
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("w"),
        )
        .collect()
    )
    t_by_order = {
        r["o_orderkey"]: r["t"]
        for r in load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("t"),
        )
        .collect()
    }
    from collections import Counter

    items: dict = {}
    for r in li:
        items.setdefault(r["l_orderkey"], []).append(
            (r["l_linenumber"], r["w"])
        )
    # the synthetic lineitem has DUPLICATE (orderkey, linenumber) pairs
    # with different prices, so the rank breaks remainder ties by
    # (linenumber, w); residual ties are true (ln, w) twins whose bonus
    # cent can land on either — deterministic as a MULTISET, compared
    # with Counter accordingly
    expected: Counter = Counter()
    for ok, its in items.items():
        t = t_by_order[ok]
        tw = sum(w for _, w in its)
        per_item = [
            (ln, (t * w) // tw, (t * w) % tw, w) for ln, w in its
        ]
        leftover = t - sum(b for _, b, _, _ in per_item)
        assert 0 <= leftover < max(1, len(per_item))
        order = sorted(
            range(len(per_item)),
            key=lambda i: (
                -per_item[i][2], per_item[i][0], per_item[i][3], i,
            ),
        )
        bonus = set(order[:leftover])
        allocs = [
            per_item[i][1] + (1 if i in bonus else 0)
            for i in range(len(per_item))
        ]
        assert sum(allocs) == t
        for i, (ln, _, _, _) in enumerate(per_item):
            expected[(ok, ln, allocs[i])] += 1
    got: Counter = Counter(
        (r["l_orderkey"], r["l_linenumber"], r["alloc_cents"])
        for r in q199_invoice_allocation(spark, sf_dir).collect()
    )
    assert got == expected


def test_discount_scenarios_match_python_reference(spark, sf_dir):
    """q200's scenario grid against an exact integer Python recompute;
    scenario 0 equals the plain cents total."""
    from ominimo_dynamic_data_pipeline_spark.queries.extensions import (
        _Q200_SCENARIOS,
        q200_discount_scenarios,
    )
    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table

    ws = [
        r["w"]
        for r in load_table(spark, sf_dir, "lineitem")
        .select(
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("w")
        )
        .collect()
    ]
    got = {
        r["extra_bp"]: (r["n_rows"], r["scenario_revenue"])
        for r in q200_discount_scenarios(spark, sf_dir).collect()
    }
    assert set(got) == set(_Q200_SCENARIOS)
    for bp in _Q200_SCENARIOS:
        exact = sum(w * (10000 - bp) for w in ws)
        n, rev = got[bp]
        assert n == len(ws)
        assert abs(rev - exact / 1000000.0) < 1e-9 * max(1.0, exact / 1e6)
    assert got[0][1] == sum(ws) / 100.0


def test_countmin_decoder_matches_jvm_and_guards(spark, sf_dir):
    """functions/sketches.py decodes Spark's count_min_sketch payload
    bit-for-bit like the JVM CountMinSketch readback (q122's former
    private-API path): identical estimates for every present id plus
    negative/absent/huge probes, so q122 is runtime-independent (no
    _jvm — works under Spark Connect).  Also pins the wire-format
    guards: bad version, truncated payload, corrupt dims."""
    import struct

    import pytest
    from pyspark.sql import functions as F

    from ominimo_dynamic_data_pipeline_spark.functions.sketches import (
        CountMinSketch,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id")
    agg = e.agg(
        F.count_min_sketch("user_id", 0.005, 0.99, 42).alias("sk"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    payload = bytes(agg["sk"])
    py = CountMinSketch.from_bytes(payload)
    assert py.total_count == agg["n"]
    probes = [int(r["user_id"]) for r in e.distinct().collect()]
    probes += [-5, -1, 0, 10**12, -(10**12), 2**62]
    try:
        jvm = spark.sparkContext._jvm
        j = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(payload)
    except Exception:  # pragma: no cover - Connect session
        j = None
    for item in probes:
        est = py.estimate(item)
        assert est >= 0
        if j is not None:
            assert est == j.estimateCount(item), item
    # estimates dominate exact counts (CM one-sided error)
    exact = {
        int(r["user_id"]): r["c"]
        for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert all(py.estimate(i) >= c for i, c in exact.items())

    with pytest.raises(ValueError, match="version"):
        CountMinSketch.from_bytes(b"\x00\x00\x00\x02" + payload[4:])
    with pytest.raises(ValueError, match="too short"):
        CountMinSketch.from_bytes(payload[:10])
    with pytest.raises(ValueError, match="expected"):
        CountMinSketch.from_bytes(payload[:-8])
    bad = bytearray(payload)
    struct.pack_into(">i", bad, 12, 0)  # depth = 0
    with pytest.raises(ValueError, match="corrupt"):
        CountMinSketch.from_bytes(bytes(bad))
