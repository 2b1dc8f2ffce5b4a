"""Red-flag plan sweep over EVERY registered query.

Unlike scripts/plan_audit.py (deep audit of the headline set on
AQE-final executed plans), this sweeps the full registry's initial
physical plans for the three structural scale-killers. Caveats: a few
queries run jobs at plan-build time (eager localCheckpoints in
iterative trainers; the connected-components loop), and the stages
behind a checkpoint surface as ScanExistingRDD — those internal
stages are covered by their builders' plan/property tests, not this
sweep. Streaming drains are skipped outright (their batch twins are
swept). The flags:

- CartesianProduct / BroadcastNestedLoopJoin (unbounded pair blowup)
- a Window with an EMPTY partition spec consuming a raw file scan
  (single-reducer sort of the whole input)

Known-bounded exceptions are whitelisted with their justification;
anything else is a failure. Run:

    python scripts/plan_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from beauty_lakehouse_spark.session import get_spark

#: query -> reason a detected flag is acceptable by design.
WHITELIST: dict[str, str] = {
    "nelson_aalen_repeat": "1-row corpus-max-date broadcast attached to subjects (the kaplan_meier shape)",
    "packing_efficiency": "two 1-row strategy-cost aggregates broadcast-joined (scalar compare card)",
    "revenue_pacf": "1-row n_days attach + the unrolled Durbin-Levinson arithmetic on the pivoted 1-row frame",
    "ams_f2_estimate": "1-row exact-F2 + median-of-means estimate broadcasts attached to the 16-row counter table",
    "burrows_delta": "per-source totals x 30-row term-panel dense-grid mint (dimension-grain); 1-row stats attaches",
    "cdc_chunks": "1-row chunk-store stats broadcast attached to the 20-row top-chunk report",
    "cochran_armitage_trend": "1-row trend-statistic broadcast attached to the 5-row priority grid",
    "effective_diameter": "1-row nf_max and crossing-round broadcasts attached to the 4-row neighborhood table",
    "hill_tail_index": "1-row anchor order-statistic + alpha broadcasts attached to the 100-row top-k table",
    "hits_hubs_authorities": "1-row max-score broadcast per half-step rescale (L-inf normalization; the pagerank teleport shape)",
    "isotonic_calibration": "interval lattice + 1-row inversion-count broadcast over the <=5-row reliability table (inherits calibration_report's bounded audit)",
    "keyness_llr": "1-row corpus-totals broadcast attached to the term grid (the tfidf scalar-subquery form)",
    "logrank_segments": "1-row gmax-date and test-statistic broadcasts attached to subjects / the 2-row group summary",
    "mlm_masks": "1-row top-100 vocabulary array broadcast attached to the token stream (hash-pick replacement)",
    "priority_sample": "1-row tau-threshold and estimator broadcasts attached to the 50-row sample",
    "query_likelihood_lm": "20-row query-term panel broadcast against doc lengths (the smoothed LM scores missing terms too — linear in docs)",
    "theil_u_matrix": "1-row entropy-ledger broadcasts per ordered pair (grid-grain)",
    "knn_brute": "bounded exact-rerank oracle: <=20-query batch x corpus, documented",
    "knn_label_accuracy": "bounded 100-query batch x corpus brute audit (the knn_brute shape); scalable serving stays with the lsh/ivf/pq families",
    "calibration_report": "bounded 100-query batch x corpus brute audit (the knn_label_accuracy shape) + a 1-row ECE broadcast onto the <=5-row reliability table",
    "kmv_set_algebra": "5x5 type-pair theta join over the |types|-row table; every downstream frame is sketch-sized (<= types x k rows)",
    "good_turing_smoothing": "two 1-row broadcasts (total-gram count, N_1 unseen mass) attached to the <=20-row count-of-counts report",
    "knn_lsh": "per-query probe join over hash buckets; query batch bounded (<=20)",
    "knn_ivf": "broadcast k-row centroid cross join (k=16), bounded by design",
    "knn_lsh_hi": "high-recall config of knn_lsh: same bounded probe join, more tables/probes",
    "knn_ivf_hi": "high-recall config of knn_ivf: same broadcast centroid join, nprobe=12",
    "knn_pq": "broadcast distance-table join; query batch bounded (<=20)",
    "knn_pq_hi": "high-recall config of knn_pq: same broadcast joins, rerank pool k*128",
    "knn_ivfpq": "broadcast centroid/table joins; query batch bounded (<=20)",
    "knn_ivfpq_hi": "high-recall config of knn_ivfpq: nprobe=12 + rerank pool k*128",
    "tfidf_top_terms": "1-row corpus-size broadcast cross join (scalar subquery form)",
    "term_pmi_top_pairs": "1-row corpus-size broadcast cross join (scalar subquery form)",
    "hll_distinct": "1-row sketch stats x 1-row exact count broadcast attach, per target",
    "hll_set_algebra": "pair grid over the event-type dictionary (<= ~6 rows a side) + 1-row estimate attaches",
    "mixture_temperature": "|sources|-row table x 1-row totals broadcast attach (scalar subquery form)",
    "semantic_neardup": "within-cluster pair join; cluster size is the documented bound",
    "revenue_forecast_delta": "two 1-row aggregates joined (scalar compare)",
    "event_funnel": "1-row funnel-stage aggregates joined",
    "top_order_share": "1-row total joined against per-order aggregate",
    "market_share": "1-row-per-year totals broadcast",
    "important_part_value": "1-row threshold aggregate broadcast (Q11 shape)",
    "small_quantity_part_revenue": "per-part avg scalar broadcast (Q17 shape)",
    "minhash_estimate_error": "bounded candidate pairs x 16-row signature merge",
    "basket_rules": "1-row total-orders aggregate broadcast (lift denominator)",
    "daily_revenue_gapfill": "1-row min/max date-bounds broadcast seeding the calendar spine",
    "value_drift_report": "1-row global bounds broadcast (bucket grid + time midpoint)",
    "pca_power_iteration": "1-row corpus-count/max-norm/sign broadcasts per round (d-row state)",
    "embedding_random_projection": "constant k x d sign-matrix grid build (16 x 64 rows)",
    "orders_zorder_keys": "1-row column min/max bounds broadcast (range normalization)",
    "heavy_hitter_terms": "1-row token-total broadcast (threshold scalar)",
    "token_subsampling": "1-row token-total broadcast (survival-rate scalar)",
    "ccnet_buckets": "1-row corpus-count broadcast (tercile arithmetic)",
    "categorical_entropy": "dictionary-grain counts x 1-row totals broadcast, per target",
    "embedding_neardup": "bounded hyperplane table (n_tables x n_bits rows) broadcast against vectors",
    "mktsegment_distribution": "1-row grand-total broadcast (share-of-total)",
    "benford_price_digits": "1-row grand-total broadcast (share-of-total) against the 9-row digit table",
    "never_urgent_rich_customers": "1-row avg-acctbal scalar broadcast (Q22 shape)",
    "customer_spend_ntile": "1-row customer-count broadcast (ntile tile-size arithmetic)",
    "customer_rfm_segments": "1-row customer-count broadcast (quintile arithmetic, three metrics)",
    "hot_keys_top": "1-row table-total broadcast attach (share-of-total denominator), per profiled key",
    "selectivity_audit": "1-row value-bounds/total broadcast attaches against the <=24-row histogram tables and 3 result rows",
    "ann_ndcg_exactint": "bounded 20-query brute ground truth (the knn_brute audit shape) scoring the served ANN list; 1-row IDCG arithmetic",
    "mann_kendall_trend": "pair join over the CALENDAR-bounded daily grid (~2.4k rows at every SF, MK_MAX_DAYS-guarded) + 1-row stat attaches",
    "compaction_plan": "1-row total-bytes broadcast (ceil target arithmetic) against the calendar-bounded day grid",
    "js_divergence_sources": "1-row token-total broadcast (ppm masses) against the vocabulary table + 1-row jsd attach",
    "silhouette_simplified": "1-row global-silhouette broadcast attached onto the k-row cluster report",
    "twonn_intrinsic_dim": "1-row MLE/exclusion-count broadcast attaches onto the 50-row bounded query panel (the knn_brute audit shape)",
    "revenue_acf": "1-row (n, S) and denominator broadcast attaches over the calendar-bounded day grid; the lag pairing is an equijoin on the exploded idx+lag key",
    "tcloseness_profile": "QI-class table x m-row priority-domain grid fill (bounded by both domains) + 1-row totals/summary broadcast attaches",
    "mcnemar_lang_classifiers": "inherits the NB scorer's bounded shapes (test fold x |langs| class table, 1-row vocab/prior attaches) + the 1-row 2x2 cell collapse",
    "fleiss_kappa_langids": "same NB-scorer bounded shapes + 1-row S1/S2/kappa broadcast attach onto the |categories|-row report",
    "cramers_v_matrix": "per-pair 1-row (N, r, c) totals broadcast onto the <=25-cell contingency grids (the segment_priority_chisq shape, x3 pairs)",
    "revenue_changepoint": "1-row (n, S) totals broadcast over the calendar-bounded day grid (the revenue_cusum convention)",
    "hilbert_curve_keys": "1-row column min/max bounds broadcast (range normalization — the orders_zorder_keys shape)",
    "community_modularity": "two 1-row broadcasts (edge count m, global Q numerator) attached to the per-community report",
    "signbit_topk_exactint": "bounded 20-query signature batch x corpus Hamming scan (the knn_brute shape; 8 bytes/vector moved)",
    "clustering_coefficients": "1-row global transitivity aggregate broadcast onto the per-node report",
    "kruskal_wallis_segments": "1-row N/tie totals + 1-row H broadcast attaches onto the 5-row segment table",
    "brand_return_woe_iv": "1-row class totals + 1-row IV total broadcast attaches onto the 25-row brand table",
    "matryoshka_prefix_recall": "bounded 20-query brute per prefix dim (the knn_brute audit shape) — the trade-off table is the product, not a serving path",
    "randomization_test_diff": "1-row threshold/observed-stat broadcast attaches around the 64-row replicate grid",
    "fellegi_sunter_weights": "bounded 500-record all-pairs ground truth (the er_blocking_quality audit shape) + 1-row cell-count attaches",
    "info_gain_features": "dictionary-grain cell tables x 1-row total broadcast attaches (the categorical_entropy shape)",
    "deterministic_random_walks": "40-row walk frontier x 4-walk cross join seed expansion; per-step equi-joins against the ranked adjacency",
    "sprt_decision": "1-row totals x 1-row first-crossing broadcast attach",
    "lorenz_customer_deciles": "1-row customer-count/total broadcasts (ntile + share denominators); unpartitioned windows run over the bounded price-bucket table and the 10-row decile table (the customer_spend_ntile two-level-rank shape)",
    "ks_two_sample": "1-row (n_p, n_v) totals broadcast; cumulative/argmax windows run over the bounded distinct-cents VALUE DOMAIN, never raw rows",
    "hurst_rs": "1-row OLS-fit broadcast onto the 5-row scale table; the day-index row_number runs over the calendar-bounded day grid (the revenue_changepoint convention)",
    "sprt_streamed": "same 1-row attaches as sprt_decision over the drained grid",
    "revenue_runs_test": "1-row median / day-count broadcast attaches over the bounded day grid",
    "rrf_fusion_exactint": "inherits the two exact-int serving paths' bounded shapes (20-query batch, broadcast seed/centroid rows)",
    "contrastive_pairs": "1-row multi-cluster-count broadcast (wrap-around modulus scalar)",
    "interleaved_mixture": "1-row per-source-count array broadcast (analytic round offsets)",
    "ann_topk_exactint": "constant 48x64 plane-grid build (range x range cross), broadcast against vectors",
    "ivf_topk_exactint": "1-row centroid-array broadcast (k x d ints) attached per vector: map-side assignment, zero assignment shuffle (r9)",
    "pq_topk_exactint": "1-row codebook-array broadcasts (M x k x SD ints) attached per vector: map-side encode, zero assignment shuffle (r9)",
    "ivfpq_topk_exactint": "composed IVF+PQ 1-row index-array broadcasts (map-side assignment + encode, r9)",
    "curriculum_order": "ccnet composition: the 1-row corpus-count broadcast (tercile arithmetic) ccnet_buckets whitelists",
    "corpus_training_plan": "ccnet + curriculum composition: 1-row corpus-count / tercile-offset broadcasts only",
    "ddsketch_value_quantiles": "1-row total-count broadcast (nearest-rank arithmetic) against the bounded bucket table",
    "lsh_index_maintained": "constant 48x64 plane-grid build (range x range cross), broadcast against vectors",
    "lsh_tuning_curve": "1-row x 1-row stat joins (pair count x shared-bucket count per banding config)",
    "bm25_topk": "1-row corpus-stats broadcast cross join onto the 20-row query-term table (T and N scalars)",
    "segment_priority_chisq": "1-row grand-total broadcast (N scalar) against the bounded contingency grid (<= segments x priorities rows)",
    "bloom_semijoin_pushdown": "1-row selected-order-count broadcast against the 1-row accounting aggregate",
    "source_quota_apportionment": "1-row grand-total and base-quota-sum broadcasts against the |sources|-row table",
    "retention_decay_fit": "1-row max-week broadcast attached to the bounded cohort-size table (horizon arithmetic)",
    "kaplan_meier_repeat": "1-row corpus-max-date broadcast attached to the per-customer firsts table (censoring arithmetic)",
    "segment_price_ttest": "bounded 5x5 segment self-join (seg_a < seg_b theta join over the 5-row sufficient-statistic table)",
    "er_blocking_quality": "documented bounded all-pairs AUDIT over the ER_AUDIT_SAMPLE=500 lowest-partkey sample (ground truth needs all-pairs; never the full catalog)",
    "negative_sampling_table": "two 1-row broadcasts (weight total, base-quota sum) attached to the capped vocabulary table — the source_quota_apportionment shape",
    "bootstrap_mean_ci": "1-row full-sample-stats broadcast attached to the 1-row sorted replicate-mean grid (order-statistic CI assembly)",
    "copurchase_eval_hitrate": "1-row split-year broadcast + 1-row count-aggregate assembly joins (backtest scoreboard)",
    "price_drift_ks": "1-row max-year/sample-size broadcasts attached to the distinct-cents grid (KS scoreboard assembly)",
    "cuped_adjusted_diff": "1-row max-year broadcast attached to the orders scan (pre/exposure period split)",
    "join_cardinality_estimate": "1-row estimate/truth/key-count aggregate assembly joins (diagnostic scoreboard)",
    "fk_discovery": "1-row per-pair stat assembly joins over distinct-key-grain aggregates (bounded literal candidate list)",
    "feature_hash_stats": "1-row occupied-bucket-count broadcast completing the load-0 row of the 2^12 space",
    "term_burstiness": "1-row corpus-size broadcast attached to the term-grain table (Fano denominator)",
    "lang_id_kappa": "1-row agreement/marginal-product scoreboard assembly joins",
    "brand_return_bayes_rank": "1-row pooled-global-rate broadcast attached to the brand-grain table",
    "revenue_pareto_cut": "1-row totals broadcast attached to the part-grain ranking",
    "revenue_cusum": "1-row mu/sd broadcast attached to the day grid (CUSUM design constants)",
    "range_partition_boundaries": "1-row total-rows broadcast attached to the day grid (partition-assignment arithmetic)",
    "neyman_allocation": "two Hamilton passes over the 5-row segment table: 1-row weight-total/base-sum broadcasts (the source_quota_apportionment shape)",
    "heaps_law_fit": "1-row doc-count and 1-row fitted-exponent broadcasts against the 10-row checkpoint curve",
    "kmv_distinct_estimate": "1-row exact-count x 1-row bottom-k aggregate broadcast attach, per target",
    "nb_lang_classifier": "bounded |classes|-row (5) model-parameter broadcast crossed onto the test token stream + 1-row vocab/prior scalars",
    "bloom_fpr_audit": "1-row test-gram-count broadcast attach onto the 5-row per-k report",
    "domain_dedup_mixture": "1-row weight-total and base-quota-sum broadcasts against the <=50-row domain table (the source_quota_apportionment Hamilton shape)",
    "dsir_importance": "1-row factored-normalizer broadcast (C = ln((R+B)/(T+B))) attached to the per-doc score aggregate",
    "kneser_ney_bigrams": "1-row N1+(..) bigram-type-count broadcast attached to the dictionary-grain bigram table",
    "ols_residual_diagnostics": "1-row OLS power-sum broadcast attached to the calendar-bounded daily grid (the nation_revenue_trend scalar-attach shape)",
    "jarque_bera_residuals": "the same 1-row OLS power-sum broadcast (shared _daily_ols_residuals construction)",
}

#: windows allowed to have an empty partition spec because their input
#: is an aggregated / bounded table, not raw rows.
GLOBAL_WINDOW_OK: dict[str, str] = {
    "ols_residual_diagnostics": "residual lag window over the calendar-bounded day grid (the revenue_cusum convention), never raw rows",
    "revenue_weekday_profile": "centered 7-row MA window over the calendar-bounded day grid, never raw rows",
    "nelson_aalen_repeat": "risk-set/hazard cumulative sums over the duration-grain grid (the kaplan_meier_repeat convention), never raw rows",
    "revenue_pacf": "inherits revenue_acf's day-grid windows (row_number index over the calendar-bounded grid), never raw rows",
    "effective_diameter": "lag over the 4-row neighborhood-function table, never raw rows",
    "hill_tail_index": "row_number over the 101-row TakeOrdered head (the zipf_law_fit convention) — never the order domain",
    "isotonic_calibration": "row_number/prefix sums over the <=5-row reliability table, never raw rows",
    "logrank_segments": "risk-set cumulative sums over the duration-grain grid (the kaplan_meier_repeat convention), never raw rows",
    "page_hinkley_drift": "prefix-sum and running-extrema ledgers over the calendar-bounded day grid (the revenue_cusum convention), never raw rows",
    "priority_sample": "row_number over the 51-row TakeOrdered head — never the order domain",
    "query_likelihood_lm": "row_number over the 20-row TakeOrdered df head (the bm25_topk convention); scoring windows are per-query",
    "kaplan_meier_repeat": "risk-set/survival cumulative sums over the duration-grain grid (bounded by the calendar span), never raw rows",
    "negative_sampling_table": "remainder-rank row_number over the NEG_VOCAB_CAP=65536-capped vocabulary table, never the raw term space",
    "price_drift_ks": "CDF cumulative sums over the distinct-cents VALUE-DOMAIN grid (bounded by the price domain), never raw rows — the order_value_percentiles convention",
    "neyman_allocation": "Hamilton remainder-rank row_number over the 5-row segment table",
    "revenue_cusum": "prefix-sum and running-min windows over the calendar-bounded day grid, never raw rows",
    "range_partition_boundaries": "cumulative-count window over the calendar-bounded day grid, never raw rows",
    "copurchase_kcore": "lag window over the 9-row peel-trajectory table (round deltas), never raw rows",
    "revenue_pareto_cut": "revenue ranking window over the PART dimension (bounded relative to the fact table — the zipf_law_fit convention)",
    "segment_price_utest": "rank-sum cumulative window over the distinct-cents VALUE-DOMAIN grid (bounded by the price domain), never raw rows",
    "kruskal_wallis_segments": "doubled-rank cumulative window over the distinct-cents VALUE-DOMAIN grid (the segment_price_utest convention), never raw rows",
    "spearman_price_qty": "doubled-rank cumulative windows over the two VALUE-DOMAIN grids (distinct part cents / distinct total quantities — both bounded by the value domain, the kruskal convention), never raw rows",
    "compaction_plan": "cumulative-bytes window over the calendar-bounded day grid (the range_partition_boundaries convention), never raw rows",
    "copurchase_ktruss": "lag window over the 5-row peel-trajectory table (the copurchase_kcore convention), never raw rows",
    "revenue_acf": "row_number index and the 7-row Ljung-Box cumsum over the calendar-bounded day grid (the revenue_cusum convention), never raw rows",
    "tcloseness_profile": "global-distribution cumsum over the m-row priority VALUE DOMAIN, never raw rows (per-class cumsums are partitioned)",
    "revenue_changepoint": "row-number index, prefix-sum, and BSS rank windows over the calendar-bounded day grid (the revenue_cusum convention), never raw rows",
    "silhouette_simplified": "row_number over the k-row kmeans seed table (limit(KMEANS_K), k=8 — the ivf_topk_exactint convention)",
    "setsim_prefix_join": "token-dictionary id mint: the only global window is the cumsum over the 32-row partition-offset table (two-level range rank, dedup.py r9 — per-row work is fully distributed)",
    "setsim_clusters": "same token-dictionary offset cumsum inside the rep-level prefix join (dedup.setsim_prefix_join r9)",
    "contrastive_pairs": "ccnet composition: cumsum over the ~4k-row perplexity-key bucket table (same window ccnet_buckets whitelists)",
    "corpus_training_plan": "ccnet + curriculum composition: bucket-table cumsums only (3-row tercile offsets, ~4k-row perplexity buckets)",
    "ddsketch_value_quantiles": "cumsum over the <=~700-row log-bucket table (ln(max/min)/ln(gamma) buckets by construction)",
    "ivf_topk_exactint": "row_number over the k-row kmeans seed table (limit(KMEANS_K), k=8) inside the composed cell build",
    "pq_topk_exactint": "row_number over the k-row seed table (limit(KMEANS_K), k=8) donating sub-vector codes",
    "ivfpq_topk_exactint": "row_number over the k-row seed table shared by the composed IVF+PQ builds",
    "zipf_law_fit": "rank row_number over the ZIPF_K=1000-row TakeOrdered head of the frequency table — never the raw vocabulary",
    "bm25_topk": "row_number over the 20-row TakeOrdered head of the df ranking (query-term mint) — never the raw vocabulary",
    "part_pareto_frontier": "prefix-max over the ~100-row price-bucket table; exact-finish windows run over bucket-prune survivors (rows beating the lower-bucket prefix max — empirically O(log) per bucket), never the raw part table",
    "key_skew_profile": "prefix cumsum over the count-of-counts profile table (bounded by distinct multiplicities, O(sqrt(n_rows)) rows) — never the key domain",
    "selectivity_audit": "equi-depth cumulative count over the distinct-cents VALUE-DOMAIN grid (the price_drift_ks / order_value_percentiles convention), never raw rows",
    "sprt_decision": "cumulative LLR walk over the calendar-bounded day grid (the revenue_cusum convention), never raw rows; 1-row first-crossing broadcast attach",
    "revenue_runs_test": "median rank row_number and run-count lag over the calendar-bounded day grid, never raw rows",
    "rrf_fusion_exactint": "inherits ann/ivf_topk_exactint's whitelisted k-row seed windows (limit(KMEANS_K)); the fusion's own window is per-query",
    "mmr_rerank_exactint": "inherits ann/ivf_topk_exactint's whitelisted k-row seed windows; MMR's own windows are per-query",
    "incremental_topk_state": "rank window over the 10-row TakeOrdered head of the maintained state — never the customer domain",
    "customer_rfm_segments": "cumsums over value-range-bounded bucket tables (days/orders/price units), one per metric",
    "curriculum_order": "cumsum over the 3-row tercile-size table (base offsets)",
    "training_order_shuffle": "cumsum over <=4096-row bucket-count table",
    "customer_spend_ntile": "cumsum over spend-floor bucket table (bounded by price range)",
    "ccnet_buckets": "cumsum over the ~4k-row perplexity-key bucket table (key >> 33)",
    "token_budget_selection": "cumsum over per-(source,n_chars) bucket aggregate",
    "source_quota_apportionment": "remainder row_number over the |sources|-row token-mass aggregate (Hamilton seat ranking) — never raw documents",
    "domain_dedup_mixture": "Hamilton remainder row_number over the <=50-row domain aggregate (isqrt(url%2500) bounds the domain id space) — never raw documents",
    "sequence_packing": "cumsum over bucket aggregate (asserted by plan test)",
    "revenue_moving_avg": "window over per-(year,month) aggregate (bounded rows)",
    "rolling_distinct_users": "window over per-day aggregate (bounded rows)",
    "daily_revenue_gapfill": "window over calendar-day aggregate (bounded rows)",
    "open_orders_daily": "running sum over the calendar-day spine (bounded rows)",
    "revenue_rollup": "share-of-total over rollup output (bounded rows)",
    "mixture_rebalance": "window over per-source aggregate (bounded rows)",
    "customer_order_distribution": "window over count-of-counts aggregate",
    "cardinality_sketches": "stack over 1-row aggregate",
    "kmeans_round": "row_number over the k-row seed table (limit(KMEANS_K), k=8)",
    "quantile_sketches": "stack over 1-row aggregate",
    "lorenz_customer_deciles": "cumulative windows over the bounded price-bucket table and the 10-row decile table (the customer_spend_ntile two-level-rank shape)",
    "ks_two_sample": "cumulative/argmax windows over the bounded distinct-cents VALUE DOMAIN, never raw rows",
    "hurst_rs": "day-index row_number over the calendar-bounded day grid (the revenue_changepoint convention)",
    "cliffs_delta": "cumulative window over the bounded distinct-cents VALUE DOMAIN (the segment_price_utest grid)",
    "wilcoxon_signed_rank": "rank window over the bounded distinct-|d| VALUE DOMAIN (the kruskal/utest device)",
}


def flags_of(plan: str) -> list[str]:
    out = []
    if "CartesianProduct" in plan:
        out.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan:
        out.append("NESTED_LOOP")
    # A window is GLOBAL when its windowspecdefinition has no partition
    # columns — the spec then STARTS with a sort expression ("col ASC/
    # DESC ...") instead of plain partition columns. Counting bracket
    # groups is not enough: a partition-only window (no orderBy) also
    # prints two groups. Tree lines carry "+- "/":- " art, so match
    # anywhere in the line.
    for line in plan.splitlines():
        if not re.search(r"\bWindow(GroupLimit)? \[", line):
            continue
        m = re.search(r"windowspecdefinition\((\S+ (ASC|DESC))", line)
        if m:
            out.append("GLOBAL_WINDOW")
            break
        if re.search(r"\bWindowGroupLimit \[\]", line):
            out.append("GLOBAL_WINDOW")
            break
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-sweep")
    qs = entrymod.queries()
    n_bad = 0
    for name, fn in sorted(qs.items()):
        if name.endswith("_streamed"):
            # an availableNow drain EXECUTES on construction and returns
            # the memory-sink table, so inspecting its plan would audit a
            # trivial in-memory scan, not the streaming plan — the batch
            # twins of these queries are what this sweep audits
            print(f"SKIP {name}: streaming drain (batch twin audited)")
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # streaming drains etc. can't pre-plan
            print(f"SKIP {name}: {type(exc).__name__}")
            continue
        fl = flags_of(plan)
        fl = [
            f for f in fl
            if not (f == "GLOBAL_WINDOW" and name in GLOBAL_WINDOW_OK)
            and not (f in ("CARTESIAN", "NESTED_LOOP") and name in WHITELIST)
        ]
        if fl:
            print(f"FLAG {name}: {','.join(fl)}")
            n_bad += 1
    print(f"\n{n_bad} unexplained red flags across {len(qs)} queries")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
