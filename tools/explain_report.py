"""Generate PLANS.md: formatted physical plans for representative catalog
queries with the scale-relevant properties called out.  Regenerate after
plan-affecting changes:

    python tools/explain_report.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SHOWCASE = {
    "q01_pricing_summary": (
        "Filter pushed to the parquet scan (PushedFilters), unused columns "
        "pruned (ReadSchema), partial+final hash agg around one exchange."
    ),
    "q03_revenue_by_nation": (
        "All three dimension tables broadcast; the only shuffle join is "
        "orders-lineitem on orderkey."
    ),
    "q06_top3_orders_per_customer": (
        "Per-group top-k: a single hash-partition exchange on the window "
        "key; rank filter applied without extra shuffles."
    ),
    "q14_late_shipments": (
        "Range predicate rides the equi-key join (no cartesian/nested-loop)."
    ),
    "q15_purchase_click_attribution": (
        "As-of join as union + last-ignore-nulls window: ONE exchange on "
        "user_id, no click x purchase pair materialization, filter pushed "
        "to the scan."
    ),
    "q26_minhash_near_dups": (
        "Staged projections (tokens -> shingles -> hashes -> minima), band "
        "bucket groupBy for candidates, exact-Jaccard verify joins."
    ),
    "q28_embedding_similar_pairs": (
        "Multi-table LSH: one staged plane-scores projection, explode to "
        "(table, bucket), ONE shuffle into the per-bucket Arrow kernel — "
        "no driver collect, sum(|bucket|^2) pairwise cost."
    ),
    "q55_sequence_packing": (
        "Token-budget packing: one exchange on lang, both window frames "
        "share a single sort."
    ),
    "q56_decontamination": (
        "Eval shingle set broadcast; train side is one explode + "
        "BroadcastHashJoin + partial/final agg — cost linear in train "
        "shingles."
    ),
    "q81_above_brand_avg": (
        "Correlated scalar subquery fully decorrelated: the per-brand "
        "average becomes an aggregate + broadcast join, no per-row subplan."
    ),
    "q85_chunk_dedup": (
        "Chunk-level duplicate spans in ONE text scan: the >=2-distinct-docs "
        "test is min!=max over a window on the chunk key, avoiding the "
        "countDistinct + join-back plan that would chunk the corpus twice."
    ),
    "q45_trailing_spend_window": (
        "RANGE frame + first/last_value sharing window layouts."
    ),
    "q50_validated_lineitem": (
        "The whole rule language is one narrow codegen'd projection: scan "
        "-> project (verdict + error array) with no exchange anywhere."
    ),
    "q90_repeated_spans": (
        "Substring-level dedup: positional grams via lead windows (one "
        "exchange on doc id), corpus census as a count-over-fp window "
        "(ONE full-frame shuffle, no census join), gaps-and-islands merge "
        "reusing the doc-id exchange.  No join in the whole plan."
    ),
    "q92_model_quality_score": (
        "Hashed linear classifier: a single narrow projection — no "
        "exchange, no join, the sigmoid fold runs inside codegen."
    ),
    "q93_stripped_corpus": (
        "Span removal: spans collapse to one tiny list per flagged doc; "
        "cleanup is an indexed array-filter projection after one doc-id "
        "join — the token stream itself never shuffles."
    ),
    "q40_approx_distinct_parts": (
        "Exact distinct and the HLL sketch kept in SEPARATE aggregations "
        "joined on the 3-row group key: mixed in one agg, the distinct "
        "rewrite allocates the 4 KB sketch per (group, partkey) pair — "
        "~8 GB of aggregation state at sf1."
    ),
    "q104_zorder_layout": (
        "Z-order cell assignment is a pure per-row bit expression over "
        "broadcast maxima (scan -> project -> 64-group agg, one "
        "exchange); the Morton key stays inside whole-stage codegen."
    ),
    "q105_negative_samples": (
        "Bounded negative pool (one B-group shuffle) broadcast against "
        "the anchor sample: deterministic contrastive negatives with no "
        "global index and no N^2 candidate stage."
    ),
    "q108_pagerank_parts": (
        "Fixed-iteration Pregel-lite: each iteration one weights⋈ranks "
        "join + one destination-key aggregation over a checkpointed "
        "invariant edge frame; exact-bigint damping keeps the unrolled "
        "oracle hash-comparable."
    ),
    "q110_bm25_retrieval": (
        "Inverted-index retrieval: postings aggregated once; query "
        "terms, document frequencies, and corpus stats all broadcast "
        "onto the postings stream — the big side never shuffles until "
        "the per-(query, doc) score aggregation."
    ),
    "q111_kmeans_exact": (
        "Lloyd assignment as a PURE PROJECTION: centroids are driver "
        "literals, so the final pass is scan -> codegen'd projection -> "
        "one aggregate exchange; no join anywhere in the plan."
    ),
    "q112_triangle_parts": (
        "Degree-ordered triangle join: the oriented edge list is "
        "materialized once (Scan ExistingRDD) and reused by the wedge "
        "and closing joins; the per-part degree table broadcasts."
    ),
    "q113_snapshot_diff": (
        "CDC fingerprint diff: both snapshot scans prune to (doc_id, "
        "text), the full-outer join shuffles 16-byte fingerprints + "
        "lengths only — text never leaves its scan."
    ),
    "q114_peak_open_orders": (
        "Interval sweep line: facts reduce to per-order spans, then "
        "per-date deltas; the single-partition running-sum window only "
        "ever sees the ~|distinct dates| aggregated spine."
    ),
    "q125_decile_binning": (
        "Equi-depth binning: one exact-percentile aggregate broadcasts a "
        "single boundary-array row onto the facts (BroadcastNestedLoop of "
        "1 row, no range join); binning is a pure array fold."
    ),
    "q127_incremental_near_dedup": (
        "Incremental near-dup: the batch's band rows shuffle-join the "
        "reference band index on (band, bucket); shingle frames persist "
        "once per side; the victim list broadcasts into the final "
        "anti-join — reference text never shuffles."
    ),
    "q129_semantic_decontamination": (
        "Semantic decontamination: the eval set renders as literal "
        "vectors, so the max-cosine contamination flag is a pure "
        "scan+projection — zero Exchange anywhere in the plan."
    ),
    "q132_temperature_mixture": (
        "Temperature mixture rebalancing: per-language keep rates are "
        "driver literals (bounded census), so membership is a "
        "scan-riding filter+projection — the only Exchange is the "
        "final per-language rollup's."
    ),
    "q133_asof_tolerance_attribution": (
        "Generic as-of join: union + ONE (user_id) window — no Join "
        "node anywhere; the tolerance is a post-pick projection, so a "
        "hot user costs a sort, never a click x purchase pair set."
    ),
    "q134_concurrent_customer_orders": (
        "Binned interval join: the non-equi containment predicate "
        "executes as an EQUI join on (custkey, 120-day bin) — "
        "SortMergeJoin in the plan, no BroadcastNestedLoopJoin, with "
        "the exact containment as a post-join filter."
    ),
    "q137_pit_features_for_labels": (
        "Point-in-time features: the rolling window runs over the "
        "bounded DAILY frame (one narrow rollup of the events scan), "
        "and the leakage-guarded as-of attach is the q133 union+window "
        "— one exchange end to end beyond the rollup's."
    ),
    "q142_next_order_forward_asof": (
        "FORWARD as-of (strict + 90-day tolerance + min-orderkey "
        "tiebreak): the same union + ONE (custkey) window shape as "
        "q133 with the time sort reversed — no Join node, no "
        "per-customer order-pair materialization."
    ),
    "q143_per_source_quota_cap": (
        "Absolute per-domain cap: rank and group-size windows share "
        "ONE hash exchange on source; the cap is a rank filter, no "
        "join or second shuffle."
    ),
    "q144_cluster_safe_split": (
        "Cluster-safe split: component labels come from the iterative "
        "min-label loop (edges localCheckpointed once); the final plan "
        "is docs JOIN labels + a pure md5-bucket projection — no "
        "exchange keyed on the split output."
    ),
    "q146_containment_near_dups": (
        "Asymmetric containment: rare-shingle postings (one gram-df "
        "window) self-join into candidates under a census pair budget, "
        "then ONE verify join against the shingle arrays — no "
        "cartesian, no per-pair recompute of shingles."
    ),
    "q148_span_corruption": (
        "Span corruption: a single scan-riding projection — token "
        "array lambdas, no Exchange, no Python anywhere in the plan."
    ),
    "q150_shard_manifest": (
        "Shard manifest: md5 key + mod shard as a projection, one "
        "window exchange on shard for dense positions — the write-side "
        "partitionBy(shard) layout is the only other cost at scale."
    ),
    "q152_winnow_decontamination": (
        "Substring decontamination: the eval winnow-fingerprint set "
        "broadcasts (BroadcastHashJoin) onto the train fingerprint "
        "stream — train-side cost is one (doc, pos) winnowing pass, "
        "never a doc x doc comparison."
    ),
    "q154_dsir_importance": (
        "DSIR importance weights: the hashed-feature ratio table "
        "(bounded at 512 rows by construction) BroadcastHashJoins back "
        "onto the per-doc tf stream; one token shuffle + one bounded "
        "feature reduce; text never shuffles twice.  The corpus-wide "
        "sel_rank runs on operators/scale.distributed_row_number (range "
        "exchange + per-partition census + order-preserving Arrow "
        "pass), so the displayed plan collapses to MapInPandas over the "
        "rank stage's localCheckpoint — the upstream DSIR shape is "
        "frozen inside the checkpointed RDD, and NO unpartitioned "
        "window sorts the corpus in one task."
    ),
    "q155_hybrid_rrf_retrieval": (
        "Hybrid RRF: both retrieval runs keep their own shapes (BM25 "
        "broadcast query terms; dense broadcast query vectors); fusion "
        "is one keyed reduce + one per-query rank window over the "
        "already-top-k union — no data-sized shuffle added."
    ),
    "q156_k_anonymity_audit": (
        "k-anonymity audit: ONE partial+final hash aggregate on the "
        "quasi key (map-side combine); output bounded by the "
        "quasi-value cross product, not rows."
    ),
    "q157_cusum_changepoints": (
        "CUSUM changepoint: daily-grain aggregate, then prefix-sum / "
        "row-number / census windows sharing ONE (priority, date) "
        "exchange; the argmax pick is a second window on the same key "
        "— integer arithmetic end to end."
    ),
    "q163_retrieval_eval": (
        "Retrieval eval: the LSH run keeps its bucketed shape and the "
        "brute-force truth its broadcast+window shape; the eval itself "
        "is a top-k-sized left join + one keyed reduce with literal "
        "DCG gains — no log2 in the plan."
    ),
    "q166_ewma_daily_orders": (
        "EWMA: daily-grain aggregate, per-series collect + array_sort "
        "+ aggregate fold as a pure projection, posexplode back — the "
        "recursive smoothing runs inside Catalyst, no Python stage."
    ),
    "q168_cumulative_distinct_users": (
        "Running COUNT(DISTINCT) composition: the only wide shuffle is "
        "the (type, user) first-seen dedup with map-side partials; the "
        "daily-count side broadcasts onto the (type, day) grid and the "
        "running sum windows over |types|x|days| rows, not events."
    ),
    "q171_rank_correlation": (
        "All four rank/tie-count windows share ONE hash-partition "
        "exchange on lang; the moment aggregation is algebraic "
        "(map-side partials), and the rho math is a 5-row projection."
    ),
    "q172_term_lift_pairs": (
        "Final top-k compiles to TakeOrderedAndProject (distributed "
        "per-partition top-50 + driver merge, no global window); "
        "unigram sides broadcast onto the support-pruned bigram "
        "counts; totals are 1-row IdentityBroadcast cross joins."
    ),
    "q174_event_cadence": (
        "Inter-arrival gaps: ONE exchange on (event_type, user_id) "
        "feeds both the lag window and, after re-agg, the percentile "
        "aggregate — per-user partitioning keeps the sort parallel "
        "where a per-type window would single-thread each type."
    ),
    "q176_dup_cluster_sizes": (
        "Cluster-size histogram: the q57 component machinery reduced "
        "twice (cluster -> size, size -> count); the singleton row is "
        "two 1-row IdentityBroadcast aggregates — no text re-scan, no "
        "driver collect."
    ),
    "q178_vocab_coverage": (
        "Coverage curve: the vocab never sorts globally — "
        "TakeOrderedAndProject yields the 10k slice, the row_number "
        "window runs on that slice only, k-thresholds explode from a "
        "3-literal broadcast array."
    ),
    "q185_window_funnel": (
        "Window funnel: ONE exchange on user_id feeds all three "
        "step-window MIN passes (unbounded frames share a single "
        "partition-key sort) and the per-user rollup; the only other "
        "exchange is the 1-row final reduce.  No join anywhere."
    ),
    "q187_pareto_frontier_parts": (
        "Pareto frontier: the 2-D skyline is ONE exchange + one sort "
        "per brand feeding two running-MAX RANGE frames on exact "
        "integer cents — never a pairwise join (the oracle runs the "
        "quadratic NOT EXISTS independently)."
    ),
    "q188_symspell_name_pairs": (
        "SymSpell pairs: the deletion-neighborhood index is a Generate "
        "(explode) per side and the candidate join is an equi hash "
        "join on the variant key — cartesian-free with recall 1.0 for "
        "d<=1 by construction; Levenshtein verifies survivors."
    ),
    "q189_rolling_7d_active_users": (
        "Rolling distinct actives: constant 7-day fanout Generate, "
        "dedup, then a broadcast semi-join against the tiny "
        "observed-day dim — shuffles carry <= 7x|active user-days| "
        "rows; DuckDB's native moving COUNT(DISTINCT) is the "
        "independent oracle."
    ),
    "q190_user_value_twap": (
        "Step-hold TWAP: ONE exchange on user_id — the LEAD window "
        "sorts within partitions and the per-user DECIMAL(38,0) "
        "rollup reuses the partitioning; one decimal-string division "
        "at the end."
    ),
    "q193_winsorized_balances": (
        "Winsorize: rank window, in-partition threshold broadcast "
        "(two conditional MAX frames), and the rollup all share ONE "
        "exchange on the segment key — no join-back for thresholds."
    ),
    "q194_snapshot_diff": (
        "Snapshot diff: both as-of snapshots partial-aggregate to one "
        "row per customer BEFORE the full-outer join (cutoff filters "
        "pushed to the scans), so the join carries |customers| rows at "
        "any order volume."
    ),
    "q196_deletion_cascade_audit": (
        "Deletion cascade: each FK level is a broadcast LeftSemi (the "
        "cohort is tiny), counts/sums partial-aggregate; the three "
        "audit rows union."
    ),
    "q198_filtered_knn": (
        "Filtered KNN: the metadata predicate is pushed to the "
        "documents scan (2-column projection) and semi-joins the "
        "corpus BEFORE the broadcast pairwise scoring — "
        "filter-then-search."
    ),
    "q199_invoice_allocation": (
        "Hamilton allocation: the orders side broadcasts (2-column "
        "projection) and ONE order-key exchange feeds the weight-total "
        "window, the remainder rank, and the leftover window — exact "
        "integer arithmetic, no float rounding anywhere."
    ),
    "q200_discount_scenarios": (
        "Scenario grid: ONE lineitem scan + a literal scenario explode "
        "(Generate) + one aggregate exchange — adding a scenario costs "
        "fanout, never another scan."
    ),
    "q167_minhash_recall_calibration": (
        "Band-recall calibration: truth via the inverted-index "
        "equi-join (shared-shingle counts, no pairwise array join — "
        "measured 9.1 s -> 1.7 s), bands via the q26 machinery, eval "
        "is a pair-sized left join + keyed reduce."
    ),
    "q158_token_entropy": (
        "Token entropy: the standard two-exchange tf profile (token "
        "stream with map-side partial agg, keyed reduce to the doc); "
        "the entropy math is a pure projection over exact bigint "
        "nano-unit sums — no UDF, no extra exchange."
    ),
    "q159_interleaved_curriculum": (
        "Interleaved curriculum: ONE window exchange on source for the "
        "in-group rank; the group-index table (distinct sources, "
        "bounded) and the one-row census BroadcastHashJoin back — the "
        "position is a pure integer projection."
    ),
    "q160_mmr_rerank": (
        "MMR re-rank: the catalog's batch applyInPandas path — "
        "FlatMapGroupsInPandas (Arrow) over per-query top-20 pools fed "
        "by the q29 broadcast+window retrieval; the Python stage "
        "touches pools, never the corpus."
    ),
}


def main() -> None:
    from ominimo_dynamic_data_pipeline_spark import get_spark
    from ominimo_dynamic_data_pipeline_spark.queries import QUERIES

    spark = get_spark(app_name="explain-report")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.01"
    out = [
        "# PLANS — physical plans of representative catalog queries",
        "",
        "Generated by `python tools/explain_report.py` at sf0.01 "
        "(`.explain('formatted')`; AdaptiveSparkPlan shown pre-execution).",
        "",
    ]
    sc = spark.sparkContext
    for name, note in SHOWCASE.items():
        df = QUERIES[name](spark, sf_dir)
        plan = sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", note, "", "```", plan.rstrip(), "```", ""]
    (REPO / "PLANS.md").write_text("\n".join(out), encoding="utf-8")
    print(f"wrote {REPO / 'PLANS.md'}")
    spark.stop()


if __name__ == "__main__":
    main()
