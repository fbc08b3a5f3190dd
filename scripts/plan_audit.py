"""Physical-plan audit: dump .explain("formatted") extracts for the
headline queries and grep for the properties that matter at scale
(pushdown, column pruning, broadcast joins, partial aggregation).

Writes docs/PLANS.md. Run: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from shortcut_spark.session import get_spark  # noqa: E402

AUDIT = [
    "q1_pricing_summary",
    "revenue_by_nation",
    "store_find_eq",
    "store_find_range",
    "topn_per_customer",
    "semi_join",
    "anti_join",
    "asof_latest_order",
    "events_pairs_60s",
    "events_hourly",
    "dedup_minhash",
    "dedup_simhash",
    "embed_topk",
    "embed_cosine_pairs",
    "text_quality",
    "corpus_clean",
    "dedup_passages",
    "dedup_passage_strip",
    "text_pii_redact",
    "embed_knn_join",
    # r10 standing-index probes: the plans to check are the broadcast
    # model read + file-pruned bucket/cell scans (no fit stages)
    "embed_vector_index",
    "embed_knn_ivf",
    "embed_lsh_index",
    "embed_quantize",
    "events_funnel",
    "events_retention",
    "events_session_window",
    "q4_priority_exists",
    "q8_market_share",
    "q16_supplier_cnt",
    "q18_large_volume",
    "q19_or_conjunctions",
    "q22_idle_rich",
    "q5_local_supplier",
    "q9_product_profit",
    "q13_order_histogram",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q21_sole_supplier",
    "text_chunks",
    "text_tfidf",
    "corpus_mix_sample",
    "events_gapfill",
    "events_heavy_hitters",
    "text_contamination",
    "text_repetition",
    "bucketed_join",
    "events_hopping",
    "corpus_shuffle",
    "corpus_token_budget",
    "fuzzy_join_names",
    "fuzzy_join_deletes",
    "fuzzy_join_qgram",
    "embed_cosine_lsh",
    # r12 replans: per-bucket gemm candidates + the sparse double funnel
    "embed_cosine_ivf_exact",
    "docs_sparse_cosine",
    "embed_cross_source",
    "embed_lsh_topk",
    "mm_wav_chunks",
    "embed_cosine_ivf",
    "data_checks",
    "store_zorder_find",
    "store_cdc_changes",
    "asof_next_order",
    "dedup_cdc_strip",
    "store_composite_find",
    "text_encoding",
    "text_decontaminate",
    "events_gapfill_interp",
    "salted_join_revenue",
    "full_outer_reconcile",
    "mm_png_tiles",
    "embed_funnel_topk",
    "events_rolling_dau",
    "events_session_overlaps",
    "embed_topk_int8",
    "asof_nearest_order",
    "text_logprob2",
    # r5 additions
    "events_cms_counts",
    "embed_cross_source",
    "stats_sketch_bounds",
    "store_history",
    "store_asof_open",
    "embed_pq_topk",
    "embed_ivf_pq_topk",
    "dedup_containment",
    "docs_novelty",
    "text_collocations",
    "docs_vocab_growth",
    "events_pagerank",
    "embed_dispersion",
    "data_checks_ref",
    "docs_quantiles",
    # r6 additions (streaming queries excluded: plans are per-trigger)
    "embed_centroid_matrix",
    "corpus_split",
    "events_skew_profile",
    "docs_quality_cut",
    "mm_image_dups",
    "mm_audio_dups",
    "events_attribution",
    "events_cube",
    "mm_png_pixels",
    "mm_wav_samples",
    "events_pagerank_rd",
    "text_lm_pipeline",
    "text_bm25",
    "dedup_winnow",
    "dedup_wjaccard",
    "events_top_paths",
    "events_json_profile",
    "text_rake",
    "embed_outliers",
    "partitioned_roundtrip",
    "corpus_balanced",
    "events_pivot",
    "dedup_index_query",
    "store_matview",
    "store_matview_minmax",
    "store_topk",
    "events_cooccurrence",
    "docs_equidepth",
    "dedup_jaccard_prefix",
    "embed_kmeans",
    "store_trigram_find",
    "embed_maxsim",
    "events_triangles",
    "events_abtest",
    "stats_corr",
    "store_version_diff",
    "events_stream_upsert",
    "docs_sparse_cosine",
    "events_anomaly_robust",
    "events_funnel_windowed",
    "text_logprob_interp",
    "mm_binary_ingest",
    "docs_quality_qnorm",
    "events_pattern",
    "store_trigram_ci",
    "embed_pca_top",
    "store_constraints",
    "embed_silhouette",
    "corpus_weighted_sample",
    "events_unpivot",
    "intersect_custkeys",
    "revenue_rollup",
    "docs_zipf",
    # r9 additions
    "embed_vector_index",
]


def fmt_plan(df) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


class SubJobCollector:
    """QueryExecutionListener (py4j callback) that captures the physical
    plan of EVERY action the session runs — closing the r7 audit blind
    spot where multi-job operators (PCA's Gram pass, Lloyd iterations,
    matview micro-commits, constraint probes) execute during query
    CONSTRUCTION and the audit only saw the final returned DataFrame
    (often a bare `Scan ExistingRDD`)."""

    def __init__(self, spark):
        self._spark = spark
        self._mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        self.plans: list[tuple[str, str]] = []

    # -- org.apache.spark.sql.util.QueryExecutionListener ------------
    def onSuccess(self, funcName, qe, durationNs):
        try:
            self.plans.append((str(funcName), qe.explainString(self._mode)))
        except Exception:
            pass

    def onFailure(self, funcName, qe, exception):
        pass

    class Java:
        implements = ["org.apache.spark.sql.util.QueryExecutionListener"]

    def register(self):
        from pyspark.java_gateway import ensure_callback_server_started

        ensure_callback_server_started(self._spark.sparkContext._gateway)
        self._spark._jsparkSession.listenerManager().register(self)

    def drain(self) -> list[tuple[str, str]]:
        """Snapshot-and-clear; listener callbacks are async, so give the
        bus a beat to flush before reading."""
        import time

        time.sleep(0.8)
        out, self.plans = self.plans, []
        return out


def plan_signature(plan: str) -> str:
    """Coarse shape key used to group a query's repeated sub-jobs (a
    matview script commits many identical micro-shapes)."""
    nb = plan.count("BroadcastHashJoin")
    ns = plan.count("SortMergeJoin")
    nex = len(re.findall(r"\(\d+\) Exchange", plan))
    nscan = plan.count("Scan parquet") + plan.count("Scan ExistingRDD")
    agg = "agg" if "HashAggregate" in plan else "noagg"
    return f"{nb}bhj/{ns}smj/{nex}ex/{nscan}scan/{agg}"


def summarize(plan: str) -> list[str]:
    notes = []
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    real_pushed = [p for p in pushed if p.strip()]
    if real_pushed:
        notes.append(f"pushdown: {len(real_pushed)} scan(s) with filters, e.g. [{real_pushed[0][:120]}]")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if schemas:
        ncols = [len(s.split(",")) for s in schemas]
        notes.append(f"column pruning: scans read {ncols} columns")
    nbroadcast = plan.count("BroadcastHashJoin")
    nsmj = plan.count("SortMergeJoin")
    if nbroadcast or nsmj:
        notes.append(f"joins: {nbroadcast} broadcast, {nsmj} sort-merge")
    nex = len(re.findall(r"\(\d+\) Exchange", plan))
    notes.append(f"shuffles: {nex} exchange(s)")
    # formatted mode prints "Arguments: SinglePartition, ..." on the
    # Exchange detail line (simple mode would say "Exchange SinglePartition")
    nsp = plan.count("SinglePartition")
    if nsp:
        # every one of these must sit on a provably bounded relation
        # (post-limit top-k, ≤buckets prefix totals, count-of-counts);
        # a data-dependent one is the scale hazard the r6 verdict flagged
        notes.append(f"single-partition exchanges: {nsp} (bounded-relation check applies)")
    if "partial_" in plan:
        notes.append("map-side partial aggregation present")
    if "AdaptiveSparkPlan" in plan:
        notes.append("AQE enabled")
    return notes


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]  # optional query subset: print to stdout, skip PLANS.md
    audit = only or AUDIT
    spark = get_spark("plan-audit")
    qs = entry_mod.queries()
    collector = SubJobCollector(spark)
    collector.register()
    out = [
        "# Physical plan audit",
        "",
        f"Generated by scripts/plan_audit.py against {sf_dir}.",
        "Checks per query: parquet filter pushdown, column pruning (ReadSchema),",
        "join strategies, shuffle count, map-side partial aggregation, AQE.",
        "Sub-jobs a query runs during CONSTRUCTION (Gram passes, Lloyd",
        "iterations, store commits, matview refreshes, constraint probes) are",
        "captured via a QueryExecutionListener, grouped by plan shape, and the",
        "heaviest shape's tree is kept as evidence — the final returned",
        "DataFrame's plan alone would miss them (r7 audit blind spot).",
        "",
    ]
    for name in audit:
        collector.drain()  # discard anything from the previous query
        df = qs[name](spark, sf_dir)
        sub = collector.drain()
        plan = fmt_plan(df)
        out.append(f"## {name}")
        out.append("")
        for n in summarize(plan):
            out.append(f"- {n}")
        heaviest = None
        if sub:
            groups: dict[str, list[tuple[str, str]]] = {}
            for fn_name, p in sub:
                groups.setdefault(plan_signature(p), []).append((fn_name, p))
            sig_line = "; ".join(
                f"{len(v)}× {sig}" for sig, v in sorted(groups.items())
            )
            out.append(
                f"- sub-jobs during construction: {len(sub)} action(s) — {sig_line}"
            )
            # evidence tree for the heaviest sub-plan (most exchanges,
            # then most joins) — this is where pca's Gram aggregate, the
            # Lloyd update, or a matview refresh's combine shows up
            def weight(p: str) -> tuple:
                return (
                    len(re.findall(r"\(\d+\) Exchange", p)),
                    p.count("Join"),
                    len(p),
                )

            heaviest = max((p for _f, p in sub), key=weight)
        out.append("")
        # keep the operator tree header (first block) as evidence
        tree = plan.split("\n\n")[0]
        out.append("```")
        out.append(tree.strip())
        out.append("```")
        out.append("")
        if heaviest is not None:
            out.append("Heaviest construction sub-job:")
            out.append("")
            out.append("```")
            out.append(heaviest.split("\n\n")[0].strip())
            out.append("```")
            out.append("")
    if only:
        print("\n".join(out))
        return
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("wrote docs/PLANS.md")


if __name__ == "__main__":
    main()
