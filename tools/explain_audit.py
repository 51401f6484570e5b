"""Physical-plan audit: prints Exchange/Join/Scan/PushedFilters lines for
selected queries (default: the headline set). Usage:
    python tools/explain_audit.py [query ...]
"""
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from kafka_avro_pipeline_java_spark.plans import QUERIES
from kafka_avro_pipeline_java_spark.session import get_spark

DEFAULT = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "window_rank_top_orders", "events_asof_last_click",
    "events_funnel", "dedup_ngram_jaccard", "knn_cosine_bruteforce",
    "knn_cosine_ivf_oracle", "knn_pq_adc_oracle", "knn_cosine_lsh_oracle",
    "text_language_id", "agg_salted_distinct_customers",
    "dedup_fuzzy_edit", "pipeline_decontaminate_bloom", "text_zipf_slope",
    "sketch_kmv_distinct", "sketch_hll_distinct", "sketch_countmin_tokens",
    "graph_pagerank_neardup", "events_cohort_retention", "events_ewma_hourly",
    "text_bpe_pair_stats",
    # round-4 additions
    "graph_triangle_count_approx", "graph_kcore_rounds", "knn_sq8_adc_oracle",
    "events_interval_join", "events_scd2_dim_join", "sketch_hll_sliding_24h",
    "sketch_hll_hourly", "dedup_semantic_text_e2e", "text_bpe_segment",
    "sample_lineitem", "source_python_datasource",
    # round-6 additions
    "merge_cdc_apply", "search_hybrid_rrf", "dedup_containment_pairs",
    "sketch_misra_gries_topk", "embedding_pca_project",
    "events_holt_trend_forecast", "unpivot_lineitem_measures",
    "window_dist_functions", "source_csv_roundtrip",
    "source_avro_ocf_roundtrip",
    # round-9 additions: the distributed-rank family + new oracles
    "agg_gini_customer_spend", "agg_rfm_segments", "sql_skyline_parts",
    "pipeline_weighted_sample", "pipeline_token_budget_selection",
    "knn_ivf_pq_rerank_oracle", "layout_zonemap_pruning",
    "stats_fdr_bh_sources", "dedup_lsh_recall_audit", "text_ndcg_bm25",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("audit")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for q in names:
        df = QUERIES[q](spark, sf)
        s = df._jdf.queryExecution().explainString(mode)
        print(f"===== {q} =====")
        for line in s.splitlines():
            if re.search(r"Exchange|Join|Scan parquet|PushedFilters|ReadSchema", line):
                print(line[:220])
        print()
    spark.stop()


if __name__ == "__main__":
    main()
