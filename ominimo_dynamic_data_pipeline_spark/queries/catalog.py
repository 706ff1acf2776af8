"""Unified query catalog: merges every query family into the single
``QUERIES`` / ``ORACLES`` maps consumed by ``__spark_entry__.py``."""

from __future__ import annotations

from ominimo_dynamic_data_pipeline_spark.queries import relational
from ominimo_dynamic_data_pipeline_spark.queries.tables import load_tables

QUERIES = dict(relational.QUERIES)
ORACLES = dict(relational.ORACLES)


def _merge(module) -> None:
    for name, fn in module.QUERIES.items():
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
    ORACLES.update(module.ORACLES)


from ominimo_dynamic_data_pipeline_spark.queries import analytics as _an
from ominimo_dynamic_data_pipeline_spark.queries import extensions as _ext
from ominimo_dynamic_data_pipeline_spark.queries import llm as _llm
from ominimo_dynamic_data_pipeline_spark.queries import windows_batch as _wb

_merge(_llm)
_merge(_wb)
_merge(_ext)
_merge(_an)

# The external driver's correctness gate checks the FIRST 50 queries()
# entries, so dict order decides which operators get independent per-round
# verification.  Since round 8 the window is COMPUTED, not hand-picked
# (round-7 verdict item #8): oldest-green-first aging over
# rotation_state.DRIVER_GREEN_ROUND (regenerated each round by
# tools/update_rotation.py from the CORRECTNESS_r*.json archives), so
# every oracle-backed query re-earns an independent driver row every
# ~ceil(|catalog|/50) rounds (~4 at 202 queries).  Never-driver-verified
# oracle-backed entries (round 0) always lead — q202 heads round 8's
# window for exactly that reason.  Family floors keep >=1 entry from
# every SURVEY.md §2.4 family in the window (the round-2 lesson: q33/q34
# streaming fell out when the catalog outgrew 50 slots);
# tests/test_oracle_parity.py::test_driver_window_covers_every_family
# asserts the floors, and the full catalog stays hash-gated by
# test_oracle_parity every pytest run regardless of window membership.
from ominimo_dynamic_data_pipeline_spark.queries.rotation_state import (
    DRIVER_GREEN_ROUND,
)

FAMILY_REPS = {
    "joins": {"q02_top_revenue_orders", "q04_customers_with_open_orders",
              "q05_customers_without_big_orders", "q14_late_shipments",
              "q15_purchase_click_attribution",
              "q133_asof_tolerance_attribution",
              "q134_concurrent_customer_orders",
              "q139_overlapping_order_spans", "q142_next_order_forward_asof"},
    "aggregations": {"q10_order_status_rollup", "q39_order_grouping_sets",
                     "q46_status_pivot", "q47_price_percentiles",
                     "q161_price_quantity_ols", "q162_source_gini",
                     "q169_benford_price_audit", "q171_rank_correlation"},
    "windows": {"q06_top3_orders_per_customer", "q07_customer_order_running",
                "q45_trailing_spend_window", "q157_cusum_changepoints",
                "q166_ewma_daily_orders", "q168_cumulative_distinct_users",
                "q174_event_cadence"},
    "set_ops": {"q12_building_big_spenders", "q13_machinery_never_urgent",
                "q20_all_account_keys", "q153_source_overlap_matrix"},
    "scalar_fns": {"q16_events_json_profile", "q18_order_date_features",
                   "q42_event_props_map", "q138_unicode_nfc_normalize",
                   "q148_span_corruption"},
    "validation": {"q50_validated_lineitem", "q156_k_anonymity_audit"},
    "text": {"q21_doc_quality", "q22_language_id", "q24_tfidf_top_terms",
             "q128_bpe_encode", "q154_dsir_importance", "q158_token_entropy",
             "q165_tokenizer_fertility", "q170_readability_scores",
             "q172_term_lift_pairs", "q173_langid_confusion"},
    "dedup": {"q25_exact_dedup", "q26_minhash_near_dups",
              "q36_simhash_near_dups", "q57_dedup_clusters",
              "q146_containment_near_dups", "q152_winnow_decontamination",
              "q167_minhash_recall_calibration", "q176_dup_cluster_sizes"},
    "similarity": {"q29_knn_bruteforce", "q30_knn_lsh", "q44_knn_ivf",
                   "q129_semantic_decontamination",
                   "q155_hybrid_rrf_retrieval", "q160_mmr_rerank",
                   "q163_retrieval_eval", "q175_embedding_norm_audit"},
    "multimodal": {"q31_payload_stats", "q32_multimodal_features",
                   "q52_frame_samples", "q203_png_decode_features"},
    "streaming": {"q33_tumbling_event_counts", "q34_user_sessions",
                  "q101_streaming_tumbling_e2e", "q102_streaming_sessions_e2e",
                  "q115_streaming_attribution_e2e",
                  "q116_streaming_stateful_totals_e2e",
                  "q130_streaming_incremental_dedup_e2e",
                  "q136_sliding_event_counts", "q141_streaming_dedup_e2e",
                  "q151_streaming_transcripts_e2e",
                  "q202_streaming_totals_rocksdb_e2e"},
    "curation": {"q53_train_val_split", "q56_decontamination",
                 "q62_corpus_curation", "q132_temperature_mixture",
                 "q143_per_source_quota_cap", "q144_cluster_safe_split",
                 "q159_interleaved_curriculum", "q164_dataset_card"},
    "scale_infra": {"q60_skew_diagnostics", "q150_shard_manifest"},
    "sql_front_end": {"q89_product_nation_profit"},
}


def build_correctness_window(size: int = 50) -> list[str]:
    """Oldest-green-first driver window with family floors.

    1. Eligible = oracle-backed catalog queries (a rows-only entry would
       burn a slot on a weaker check — the round-6 q160 lesson).
    2. Sort by (round of last driver-green row, name): never-verified
       entries (round 0) lead, then the stalest greens; take the first
       ``size``.
    3. Family floors: any SURVEY.md §2.4 family left with no
       representative swaps its own oldest-green rep in for the
       youngest window entry whose removal breaks no other floor.

    Deterministic given rotation_state + the catalog — nothing is
    hand-picked per round.
    """
    age = lambda q: (DRIVER_GREEN_ROUND.get(q, 0), q)  # noqa: E731
    eligible = [q for q in QUERIES if q in ORACLES]
    window = sorted(eligible, key=age)[:size]
    chosen = set(window)

    def floors_ok(members: set[str]) -> dict[str, bool]:
        return {f: bool(reps & members) for f, reps in FAMILY_REPS.items()}

    for family, reps in FAMILY_REPS.items():
        if reps & chosen:
            continue
        cands = sorted((r for r in reps if r in ORACLES and r in QUERIES),
                       key=age)
        if not cands:
            continue
        incoming = cands[0]
        # evict the youngest entry whose own families stay covered
        for victim in sorted(window, key=age, reverse=True):
            rest = chosen - {victim}
            if all(reps2 & rest
                   for f2, reps2 in FAMILY_REPS.items() if victim in reps2):
                window.remove(victim)
                chosen.discard(victim)
                window.append(incoming)
                chosen.add(incoming)
                break
    return sorted(window, key=age)


CORRECTNESS_WINDOW = build_correctness_window()


def _reorder() -> None:
    global QUERIES
    missing = [n for n in CORRECTNESS_WINDOW if n not in QUERIES]
    if missing:
        raise ValueError(f"CORRECTNESS_WINDOW names unknown queries: {missing}")
    ordered = {n: QUERIES[n] for n in CORRECTNESS_WINDOW}
    ordered.update((n, fn) for n, fn in QUERIES.items() if n not in ordered)
    QUERIES = ordered


_reorder()

__all__ = ["QUERIES", "ORACLES", "CORRECTNESS_WINDOW", "load_tables"]
