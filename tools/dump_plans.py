"""Regenerate PLANS.md: formatted physical plans of the headline queries."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from asctb_ct_label_mapper_spark.plans.audit import formatted_plan  # noqa: E402
from asctb_ct_label_mapper_spark.queries import all_queries  # noqa: E402
from asctb_ct_label_mapper_spark.session import get_spark  # noqa: E402

TARGETS = {
    "q5_region_revenue": "star join: one fact shuffle per big join, broadcast dims",
    "cos_topk_join": "broadcast cross join + native cosine + window top-k (strategy 1)",
    "cos_topk_blocked": "blocked matmul via mapInPandas - zero shuffle (strategy 2)",
    "cos_topk_hnsw": "r13 HNSW rung: driver-built graph broadcast, mapInPandas probe, recall-envelope gate vs the exact rung",
    "cos_topk_auto": "r13 cost-based selector: count+dim stats pick join/blocked/ivf by the SCALING.md crossovers (chose the window join at this scale)",
    "dedup_minhash": "native MinHash signature -> banded LSH bucket self-join",
    "dedup_ngram_jaccard": "set-similarity join: explode -> equi-join -> count",
    "mapping_report": "flagship: clean -> encode -> cross join -> window -> pivot -> overwrite",
    "contamination_check": "train vocab distinct -> one equi-join probe -> per-doc rollup",
    "tfidf_topk_docs": "explode -> map-side-combinable tf/df aggs -> join -> per-doc window top-k",
    "pack_sequences_docs": "per-source window cumsum (partitioned, never global)",
    "repetition_docs": "fused Arrow pass - narrow, zero shuffle",
    "corpus_divergence": "one corpus pass -> cached (group, token) model -> 4 InMemory consumers",
    "bigram_logppl_docs": "cached bigram model; prefix counts re-aggregate the model, not the corpus",
    "viz_projection_rp": "literal-plane dot products - narrow, zero shuffle, zero Python",
    "dedup_representatives": "groups equi-join + per-group quality window",
    "q8_market_share": "deepest join tree (8 tables): all dims broadcast, two fact shuffles, one conditional-ratio agg",
    "q2_min_cost_supplier": "correlated min subquery as per-part window over broadcast-restricted EU pairs",
    "q21_waiting_suppliers": "double correlation as aggregates: semi-join-restricted per-order distinct-supplier/late-supplier counts, EXISTS/NOT EXISTS qualified on the aggregates (no LeftAnti in the plan)",
    "q13_order_count_distribution": "left join with ON-clause exclusion -> per-customer count -> histogram (exchange reuse)",
    "chunk_docs": "sliding-window chunker: sequence -> posexplode -> slice, zero shuffle",
    "mixture_budget_docs": "per-source md5-ordered running token sum, one window shuffle",
    "q18_large_orders_bucketed": "bucketed layout (r7): HAVING-agg + semi join bucket-local on the order key - no Exchange before the customer join",
    "q21_waiting_suppliers_bucketed": "bucketed layout (r7): late-set fact-fact join and per-order aggregates with NO l_orderkey Exchange",
    "dedup_incremental_sig": "precomputed-signature path (r7): signatures parquet scan only, text never read; estimate verify via zip_with",
    "cos_topk_ivfpq": "IVF-PQ (r7): list-id equi-join restricts candidates, Arrow ADC, survivor-broadcast rescore - codes never broadcast",
    "mmr_rerank_topk": "MMR rerank (r7): candidate-pool vector join + per-query applyInPandas greedy - pool-sized, never corpus-sized",
    "bm25_topk_docs": "BM25 (r7): column-wise tf map pass (no Generate), 1-row stats broadcast cross join, TakeOrderedAndProject - corpus rows never shuffle",
    "fuzzy_name_pairs_part": "token-blocked fuzzy match (r7): distinct names -> token equi-join candidates -> per-candidate levenshtein, no cartesian",
    "gapfill_daily_events": "calendar zero-fill (r7): ONE source scan into the cached grid, three InMemoryTableScan consumers, broadcast spine left join",
    "winsorize_doclen_docs": "winsorize (r7): group_quantiles window -> broadcast cuts join -> map-side clip",
    "max_concurrent_sessions": "sweep line (r7): pooled change-point grid; parallel within-day prefix windows + dimension-sized carry window broadcast back",
    "rolling_7d_distinct_users": "rolling distinct (r7): interval expansion - two hash distincts + broadcast day dim, zero window state",
    "curriculum_rank_docs": "global rank (r7): per-bucket row_number windows + SinglePartition only on the bucket-count offsets, broadcast back",
    "dedup_bloom_prefilter": "bloom prefilter (r7): bitset from bounded distinct-positions collect; map-side membership; AQE-chosen exact-verify join (no forced broadcast)",
    "countmin_topk_docs": "count-min (r7): constant-size counter fold broadcast against the exact top-k candidate set",
    "j_nullsafe_join": "null-safe join (r7): EqualNullSafe as a coalesce+isnull composite hash-join key - no nested-loop fallback",
    "gap_ranges_events": "ID-gap audit (r7): in-bucket lag windows in parallel; SinglePartition only over the bucket-summary frame for boundary gaps",
    "ewma_user_value": "EWMA (r8): segmented linear-recurrence scan - per-(key,month) affine folds, dimension-sized carry; no keyed window, no unbounded collect",
    "scan_shipdate_range": "clustered-pair baseline (r8): pushed timestamp range over the unclustered layout - PushedFilters present but every row group overlaps, scan decodes the table",
    "scan_shipdate_range_clustered": "clustered-pair win (r8): same pushed predicate over write_clustered layout - footer min/max prune to ~1 row group (rows_decoded 6M -> 60k at rel10x, tools/bench_clustered.py)",
    "holt_winters_users": "Holt-Winters (r9): fused-Arrow fold - ONE Exchange (shard by key), FlatMapGroupsInPandas does chain folds + carry in numpy, bit-equal to the r8 HOF anchor",
    "psi_drift_events": "PSI drift (r8): two combinable histogram folds + bins-sized full-outer join - nothing data-sized past the scans",
    "j_asof_forward": "forward as-of (r8): the backward union+window plan on negated micros - no extra Exchange for the direction flip",
    "kmv_daily_users": "per-group KMV (r9 prefilter, r12 rewrite): sampled-gate cardinality estimate (2% row sample), literal-map thresholds inside codegen (no broadcast join), fused dense_rank cut - ONE wide exchange over ~safety*k survivors; 11.1 (r8) -> 4.06 (r9) -> 2.33 s (r12) at events100x",
    "cusum_purchase_values": "CUSUM (r9): (max,+)-semiring segmented scan - same two-Exchange fold shape as EWMA with a closed 4-parameter map; all-JVM, bit-exact vs oracle",
    "m4_downsample_events": "M4 downsampling (r9): in-plan broadcast extent probe + one combinable struct-min/max aggregate per bucket - output 4 x n_buckets at any input size",
    "j_interval_overlap": "interval-overlap join (r9): both sides bucket-exploded to a hash EQUI-join; canonical first-shared-bucket keep, no post-join distinct, no nested loop",
    "j_asof_bucketed": "skew-safe as-of (r9): per-(key,month) window + per-key carry over bucket summaries - a hot key's sort splits across its months; result-identical to the plain window",
    "holt_winters_classical_users": "classical-primed Holt-Winters (r9): bounded per-bucket bottom-p aggregate -> keys-sized seed join -> the same fused-Arrow segmented fold",
    "funnel_signup_purchase_7d": "one-pass funnel (r10): type-IN filter pushed to scan, ONE user-keyed Exchange, greedy K-slot fold over each user's sorted funnel events - vs the r9 K-scan join chain",
    "copurchase_degree_hist": "pair census (r10): one basket-keyed collect, in-row HOF pair explode (repartitioned past the AQE 1-partition coalesce), one pair count - 2 Exchanges, no self-join",
    "copurchase_triangles": "triangle census (r10): persisted aggregated edge list feeds 3 oriented join legs + degree branches; a<b<c orientation counts each triangle once",
    "assoc_rules_parts": "association rules (r10): persisted distinct memberships -> pair census + two broadcast item-count joins + 1-row totals cross join; integer counts divide once",
    "ab_welch_purchase": "Welch t (r10): one user-grain conditional aggregate (only fact pass) -> 1-row arm statistics; try_divide-guarded scalar arithmetic",
    "cuped_purchase_value": "CUPED (r10): user-grain pre/post conditional aggregate -> 1-row pooled-theta broadcast back -> 2-row arm aggregate",
    "heavy_hitter_tokens": "exact heavy hitters (r10): persisted token frame -> per-partition Misra-Gries mapInPandas candidates (<=1/phi rows each, no raw shuffle) -> broadcast semi-join exact verify + 1-row total",
    "graph_family_report": "shared census (r11): ONE persisted group_memberships aggregate + ONE persisted edge list feed degree/triangle/rule readouts - the whole family for one census",
    "item_cf_parts": "item-item CF (r11): census edges + broadcast item counts + PER-ITEM rank window - no global sort, candidates bounded by the census",
    "mann_whitney_purchase_bucketed": "bucketed rank stats (r11): value-grain collapse, per-bucket cumulative tie counts + broadcast offsets - NO single-partition row-grain window",
    "woe_iv_doclen_bucketed": "bucketed WOE bins (r11): two-phase global rank (range buckets + offsets) + integer ntile arithmetic - bit-identical bins, no global window",
    "vocab_growth_sketch": "KMV Heaps curve (r11, r12 rewrite): doc-sampled gate explodes 5% of docs, the FULL gram stream explodes exactly once into the fused dense_rank sketch build; prefix re-cut over parameter-sized sketch unions; 29-32 -> 14.0 s at docs100x",
    "bootstrap_ci_purchase": "Poisson bootstrap (r11): persisted user-grain aggregate -> B-way in-row explode -> combinable per-resample means -> order stats on the B-row frame",
    "fdr_bh_event_types": "BH-FDR (r11): ONE (user,type) fact aggregate feeds per-type moments AND arm totals; BH windows run on the type-dimension frame",
    "attribution_position_events": "U-shaped attribution (r11): conditional-min-over-FOLLOWING window on one user Exchange; position/size windows per (user, conversion)",
    "funnel_3step": "window-chain funnel (r11): type-IN-steps filter pushed to the scan BEFORE the single user Exchange (r10 verdict #2)",
    "textrank_keywords_docs": "TextRank (r11): corpus-sized stage is ONE adjacency-pair count; PageRank loop runs per-iteration broadcast joins on the vocabulary-grain edge list",
    "t_closeness_docs": "t-closeness (r11b): ONE persisted (quasi,sensitive) cell fold; class sizes, global distribution, and the null-safe spine re-join all derive from the cached cells - the table is scanned once",
    "quantile_bins_events": "binned quantile sketch (r11b): one combinable bin fold (<= n_bins rows out of the map side), bounded cumulative window, integer-exact rank join against the broadcast quantile spine",
    "ranking_eval_docs": "batched ranking eval (r11b): ONE persisted corpus tf pass scores all queries (q tiny TakeOrderedAndProject jobs), qrels read the same cache; metrics are per-query bounded windows",
    "funnel_time_to_convert": "funnel latency (r11b): the shared one-pass reach fold (type-IN pushed, one user Exchange) -> converted-only latency frame -> nearest-rank window over the conversion-rate-times-smaller set",
    "lift_table_doclen_en": "decile gains (r11b): scored-frame ntile (DESC+id total order) -> tile-grain cells persisted -> one-row totals broadcast + bounded cumulative window",
    "cohort_ltv_events": "cohort LTV (r11b): user-grain min-bucket fold persisted, fact pass joins it on the user key, (cohort, age) fold + per-cohort cumulative window - dimension-grain past the join",
    "segment_uplift_docs": "segment uplift (r11b): ONE scan stack-unpivoted to (dim, value, y), one combinable fold, totals pooled from one dim's marginals, chi2 TakeOrderedAndProject",
    "ewma_backtest_purchases": "EWMA backtest (r11b): day-grain rollup -> rescaled prefix-sum window (exact powers of two) -> lag-one predictions -> one-row error fold",
    "anova_value_by_type": "one-way ANOVA (r11c): ONE combinable grouped sufficient-statistic aggregate, k-row fold, divisions last - no second table scan",
    "contingency_type_dow": "contingency effects (r11c): one contingency fold persisted; marginals re-derive from cells; Sum(o^2/e)-N identity keeps empty cells unmaterialized",
    "eb_shrunk_purchase_rate": "EB shrinkage (r11c): key-grain (n,k) fold persisted -> one-row MoM prior broadcast -> bucket-grain readout; raw stream scanned once",
    "burstiness_hist_users": "burstiness (r11c): ONE keyed window Exchange (gaps), per-key sufficient-statistic fold, bin-sized histogram",
    "containment_pairs_docs": "directed containment (r11c): one shared-shingle census (never all-pairs), BOTH directions projected from the counted pair - census runs once",
    "hard_negatives_embeddings": "hard negatives (r11c): broadcast-reference exact scorer, 6dp band filter BEFORE the per-query rank window - banded-out pairs never shuffle",
    "quantile_normalize_doclen": "quantile normalize (r11c): keyed within-group ranks + id-bucketed two-phase global_rank for the pooled order statistic - no single-partition sort of the data",
    "rolling_corr_view_purchase": "rolling corr (r11d): one fact pass -> calendar-grain frame; rolling sufficient-statistic windows, divisions last",
    "xcorr_view_purchase": "lagged xcorr (r11d): one fact pass; lag-spine cross join + shifted self-join on the calendar-grain series",
    "readability_docs": "readability (r11d): three regexp_count projections in ONE narrow scan, zero shuffle before the lang fold",
    "new_vs_returning_daily": "growth accounting (r11e): ONE deduplicated (day,user) frame persisted; first-day fold + day census share it - fact scanned once",
    "pchart_purchase_rate": "p-chart (r11e): one day-grain fold, one-row pooled-rate broadcast, day-grain limit arithmetic",
    "oov_rate_docs": "OOV coverage (r11e): one combinable (group,token) cell fold; ref vocab and probe both re-aggregate the persisted cells",
    "silhouette_embeddings": "seeded silhouette (r11f): per-row literal dot products + struct-array sort, zero shuffle before the list-grain fold",
    "did_purchase_value": "diff-in-diff (r11f): persisted narrow metric projection, one-row midpoint broadcast, ONE 2x2 conditional fold",
    "kendall_tau_view_purchase": "Kendall tau-b (r11g): broadcast self-join on the CALENDAR-grain frame (quadratic in days by contract), exact integer folds, division last",
    "churn_rate_weekly": "weekly churn (r11g): one deduplicated (week,user) frame persisted, shifted self left-join co-partitioned on the key, week-grain fold",
    "moments_value_by_type": "moments (r11h): ONE combinable power-sum aggregate, group-grain central-moment algebra, divisions last",
    "interpolate_daily_values": "interpolation (r11h): one fact pass, calendar spine, ignore-null window walks on the day-grain frame",
    "fk_audit_star": "FK audit (r11i): one LEFT ANTI join + narrow counts per edge; parent side broadcast at dimension size",
    "bayes_ab_purchase": "Bayesian A/B (r12): one user-grain conversion fold, 1-row Beta-posterior closed form, shared A&S polynomial for P(B>A)",
    "msprt_purchase_daily": "mSPRT (r12): one user-grain entry/conversion fold, day-spine running sums, mixture-LR + running-max monotonization on the day grain",
    "qte_purchase_value": "QTE (r12): one user-grain fold, cents-quantized exact percentile array per arm (2-row aggregate), 9-row unpivot join",
    "nelson_aalen_retention": "Nelson-Aalen (r12): shared _time_to_event_grain risk sets (2 key min-aggs + suffix window), running d/n on the duration grain",
    "fs_linkage_parts": "Fellegi-Sunter (r12): distinct-record census, bigram block equi-join (never N^2), per-field frequency-based u broadcast as a 1-row frame, log2 weights in codegen",
    "closeness_nation_trade": "harmonic closeness (r12): dimension-grain edge collect behind the bounded-collect guard, driver BFS, unrolled min-distance CTE mirror",
    "vocab_overlap_sources": "source vocab overlap (r12): ONE distinct (source,token) census, token equi-join intersection bounded by sources^2 fan-out, broadcast sizes",
    "conformal_daily_forecast": "split conformal (r12): one fact pass to day counts, lag/rank windows, order-statistic calibration quantile broadcast to the test rows",
    "page_hinkley_daily": "Page-Hinkley (r12): one fact pass, three stacked running windows on the day grain",
    "quality_sweep_docs": "quality sweep (r12): one quality_rules scan aggregated to the 6-value score grain BEFORE the threshold grid join",
    "lsh_scurve_table": "LSH S-curve planner (r12): closed-form grid, zero scans",
    "mcnemar_purchase_shift": "McNemar (r12d): 2-value broadcast midpoint, one user-grain fold, one-row discordant-cell aggregate",
    "post_stratified_purchase": "post-stratification (r12d): user fold -> <=6-row strata agg -> one-row combine, no collect",
    "theta_forecast_events": "Theta forecast (r12d): day counts -> row-index window -> 1-row (a,b,SES) fold -> broadcast horizon grid",
    "mann_kendall_daily_events": "Mann-Kendall (r12d): day-grain pair self-join on the persisted spine + count-grain tie agg (never a fact^2 join)",
    "gumbel_weekly_peaks": "Gumbel maxima (r12d): day counts -> block-grain max -> 1-row moments -> broadcast period grid",
    "ols_views_clicks_purchase": "2-feature OLS (r12d): user fold -> one 9-sum aggregate -> one-row Cramer solve",
    "monroe_logodds_sources": "Monroe log-odds (r12e): ONE (source,token) cell fold, vocabulary-grain joins, per-source rank window (partitioned, never global)",
    "emd_doclen_sources": "length EMD (r12e): (source,len) fold -> per-source CDF windows on the support spine -> len equi-join pair census",
    "seasonality_strength_events": "periodogram scan (r12e): day counts -> broadcast period grid -> 13-row grouped aggregate",
    "chow_test_daily_events": "Chow test (r12f): day spine -> ONE 3-segment conditional aggregate -> one-row F arithmetic",
    "adamic_adar_trade": "Adamic-Adar (r12f): symmetrized census join on the witness, broadcast degrees, parameter-sized rank window",
    "neyman_sample_events": "Neyman sampling (r12f): moment fold -> broadcast allocation -> hash FILTER draw (no fact-grain sort)",
    "iv_wald_view_purchase": "IV/Wald (r12g): one user fold -> 2-arm aggregate -> one-row ratio",
    "pacf_daily_events": "PACF (r12g): day spine -> three lag windows in ONE aggregate -> unrolled Durbin-Levinson -> 3-row unpivot",
    "hurst_daily_events": "Hurst R/S (r12g): (sizes x days) grid, block-PARTITIONED cumsum windows, 3-row log-log fit broadcast back",
    "granger_view_purchase": "Granger (r12h): shared pair spine -> two lag windows -> ONE 11-sum aggregate -> one-row Cramer/F",
    "sbg_retention_events": "sBG projection (r12h): (user,week) distinct fold -> cohort filter -> 1-row solve -> unrolled product grid",
    "heaps_fit_docs": "Heaps fit (r12i): vocab_growth single pass -> n_shards-row log-log OLS fold",
    "audience_overlap_weeks": "audience overlap (r12i): (user,week) distinct fold -> shifted self-join -> union identity from week sizes",
    "dispersion_test_event_types": "dispersion test (r12i): (day,type) aggregate -> calendar x types spine -> type-grain moments",
    "journey_distance_events": "journey distance (r12i): one-shuffle path assembly -> top-k rank -> broadcast k^2 levenshtein cross",
    "friedman_test_event_types": "Friedman (r12j): (day,type) spine -> PER-DAY rank windows -> type fold -> 1-row chi2",
    "ljung_box_daily_events": "Ljung-Box (r12j): day spine -> 7 lag windows in ONE aggregate -> 1-row Q",
    "runs_test_daily_events": "runs test (r12j): day-grain order-statistic median -> one lag window -> 1-row moments",
    "kruskal_wallis_value_by_type": "Kruskal-Wallis (r12k): (value,group) cells -> value-grain rank-from-counts -> group fold (nothing fact-grain sorted)",
    "brown_forsythe_value_by_type": "Brown-Forsythe (r12k): group-grain exact-percentile agg -> broadcast medians -> one conditional moment pass",
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — formatted physical plans of the headline queries (sf0.01)",
        "",
        "Generated by `python tools/dump_plans.py`. What to look for: joins are",
        "Broadcast\\* (never SortMerge on a dim), filters appear in PushedFilters,",
        "`*` prefixes mark whole-stage-codegen stages, and the blocked similarity",
        "path has no Exchange at all.",
        "",
    ]
    for name, note in TARGETS.items():
        df = all_queries()[name](spark, sf)
        df.count()  # finalize AQE so the plan shows the real strategies
        out.append(f"## {name}\n\n{note}\n\n```\n{formatted_plan(df).strip()}\n```\n")
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"PLANS.md written ({len(TARGETS)} sections)")
    spark.stop()


if __name__ == "__main__":
    main()
