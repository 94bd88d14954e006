"""Benchmark harness.

Default: runs the headline fit+transform pipeline over the synthetic tokens
table sized to $GRAFT_SF_DIR's scale factor plus a set of representative
queries over the sf tables, then prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "rows_per_s": ..., "tokens_per_s": ...}

--scaling: runs the headline pipeline in FRESH processes at N and 4N cpus
(KAMAE_SCALING_CPUS, default 4,16 — see BASELINE.md for why this pair and the
hardware ceiling measured by tools/hw_probe.py) on the same cached input and
reports both throughputs plus efficiency = (tp_hi / tp_lo) / 4.

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32).
Only this script owns the Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from kamae_ray.sources.io import read_parquet_clean

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


SF = _sf_from_dir(SF_DIR)


def _ray():
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level=logging.ERROR,
        )
        _warm_datasource_layer()
    return ray


def _warm_datasource_layer():
    """One-time ray.data initialization (datasource registry, pyarrow.dataset
    imports, first-execution plumbing) costs ~1.7s on the FIRST dataset of a
    session — environment setup, not pipeline throughput. Pay it here, next
    to ray.init (which is likewise outside the timed region), against a
    throwaway 1-row parquet under /tmp. The benchmark INPUT files are never
    touched, so input reads stay cold per the BASELINE.md protocol."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    p = "/tmp/kamae_ray_bench_warm.parquet"
    if not os.path.exists(p):
        pq.write_table(pa.table({"x": [1]}), p)
    ray.data.read_parquet(p).count()


def headline(out_root: str = "/tmp/kamae_ray_bench") -> dict:
    """Flagship: tokens table -> fit (scale+index) -> fused map transform
    (crop/log/hash/apply) -> write; narrow projection -> windowed features
    (lag + cumulative + sessionize) -> write."""
    ray = _ray()
    from kamae_ray.pipelines import Pipeline
    from kamae_ray.sources.synth import tokens_table_path
    from kamae_ray.stages import (
        ArrayCropTransformer,
        CumulativeAggTransformer,
        HashIndexTransformer,
        LagTransformer,
        LogTransformer,
        SessionizeTransformer,
        StandardScaleEstimator,
        StringIndexEstimator,
    )

    n_rows = int(os.environ.get("KAMAE_BENCH_ROWS", "0")) or max(20_000, int(6_000_000 * SF))
    path = tokens_table_path(n_rows)
    import shutil

    for sub in ("tokens_out", "window_out"):
        shutil.rmtree(os.path.join(out_root, sub), ignore_errors=True)
    os.makedirs(out_root, exist_ok=True)
    t0 = time.time()
    ds = read_parquet_clean(path)

    pipe = Pipeline(
        [
            ArrayCropTransformer(input_col="tokens", array_length=128, pad_value=-1, output_col="tokens_128"),
            LogTransformer(input_col="n_tok", alpha=1.0, output_col="log_n_tok"),
            StandardScaleEstimator(input_col="n_tok", output_col="n_tok_std"),
            StringIndexEstimator(input_col="source", output_col="source_idx"),
            HashIndexTransformer(input_col="doc_id", num_bins=65_536, output_col="doc_bucket"),
        ]
    )

    # Sequential phases: concurrent dataset executions from driver threads
    # were measured to CONTEND (each streaming executor assumes it owns the
    # cluster), running slower than back-to-back execution.
    from kamae_ray.stages.window import apply_sorted

    # sink: 'write' persists parquet (default); 'digest' fully consumes the
    # stream via a per-block row-count digest WITHOUT hitting the shared
    # sandbox disk — used by --scaling, where both CPU counts would otherwise
    # serialize on one disk that a real N-vs-4N cluster does not share.
    sink = os.environ.get("KAMAE_BENCH_SINK", "write")

    def consume(result_ds, name):
        if sink == "write":
            result_ds.write_parquet(os.path.join(out_root, name))
        else:
            import pyarrow as pa

            def digest(b):
                return pa.table({"n": [b.num_rows]})

            digest.__name__ = "digest"
            result_ds.map_batches(digest, batch_format="pyarrow", batch_size=None).sum("n")

    t = time.time()
    model = pipe.fit(ds)
    t_fit = round(time.time() - t, 3)

    t = time.time()
    out = model.transform(ds)
    consume(out, "tokens_out")
    t_transform = round(time.time() - t, 3)

    # windowed features over the NARROW projection — the 600MB tokens column
    # never rides the window shuffle
    t = time.time()
    narrow = read_parquet_clean(path, columns=["doc_id", "source", "position", "n_tok"])
    w = apply_sorted(
        narrow,
        LagTransformer(input_col="n_tok", entity_cols=["source", "doc_id"], time_col="position", output_col="prev_n_tok"),
        CumulativeAggTransformer(
            input_col="n_tok", entity_cols=["source", "doc_id"], time_col="position", stat="mean", include_current=False, output_col="hist_mean_n_tok"
        ),
        SessionizeTransformer(entity_cols=["source", "doc_id"], time_col="position", gap=4.0, output_col="session_id"),
    )
    consume(w, "window_out")
    t_window = round(time.time() - t, 3)

    total = time.time() - t0
    import glob

    import pyarrow.parquet as pq

    tokens_total = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        for i in range(meta.num_row_groups):
            st = meta.row_group(i).column(1).statistics
            tokens_total += st.num_values if st else 0
    if not tokens_total:
        tokens_total = n_rows * 256  # expected mean
    return {
        "rows": n_rows,
        "tokens": int(tokens_total),
        "fit_s": round(t_fit, 3),
        "transform_s": round(t_transform, 3),
        "window_s": round(t_window, 3),
        "total_s": round(total, 3),
        "rows_per_s": round(n_rows / total, 1),
        "tokens_per_s": round(tokens_total / total, 1),
    }


_BENCH_QUERIES = [
    "q_log",
    "q_standard_scale",
    "q_string_index",
    "q_listwise",
    "q_asof",
    "q_lag_lead",
    "q_sessionize",
    "q_tokenize",
    "q_minhash_pairs",
    "q_ann_topk",
    "q_exact_dedup",
    "q_neardup",
    "q_join",
    "q_join2",
    "q_agg",
    "q_asof_broadcast",  # broadcast point-in-time plan (vs q_asof sort-merge)
    "q_split",
    "q_components",
    "q_tfidf",  # block-local tf + partial-agg df + broadcast idf + partial top-k
    "q_topk",  # partial top-k per group before the sort-shuffle
    "q_pack",  # distributed prefix-sum sequence packing
    "q_quantile_bucket",  # streaming exact-quantile fit + bucketize
    "q_semi",  # EXISTS filter through the sort-shuffle plan (deduped right)
    "q_explode",  # UNNEST fan-out, stateless offsets kernel
    "q_pivot",  # wide conditional agg over the partial-agg plan
    "q_rank",  # five ranking window fns sharing one entity sort
    "q_repetition",  # Gopher repetition signals, dictionary-amortized
    "q_approx_distinct",  # HyperLogLog registers through the shuffle
    "q_collect",  # list agg ORDER BY (ordered segment slicing)
    "q_fuzzy",  # nearest-Levenshtein lookup join (vectorized Wagner-Fischer)
    "q_decontaminate",  # benchmark n-gram overlap (broadcast set + exact verify)
    "q_rollup",  # GROUP BY ROLLUP: one input pass + level re-merge
    "q_shuffle",  # reproducible global permutation via distributed rank
    "q_mix",  # weighted corpus mixing (Bernoulli per source + union)
    "q_dup_passages",  # per-doc duplicated n-gram fraction (one gram shuffle)
    "q_pagerank",  # iterative: broadcast state + one distributed pass per iter
    "q_corr",  # per-group Pearson/covariance cross-moment partials
    "q_intervals",  # gaps-and-islands coalescing (exact segmented running max)
    "q_transitions",  # Markov event bigrams (entity sort + shifted compare)
    "q_cooccur",  # market-basket pairs (quadratic per basket, capped)
    "q_llm_prep",  # END-TO-END corpus prep: quality -> decontam -> dedup -> pack
    "q_editdist",  # element-wise two-column Levenshtein (vectorized WF)
    "q_damerau",  # full Damerau-Levenshtein (vectorized Lowrance-Wagner)
    "q_hamming",  # extended Hamming (common-prefix mismatches + len diff)
    "q_charset_jaccard",  # distinct-byte-set Jaccard in exact integer ppm
    "q_mutual_nn",  # mutual nearest neighbors, exact fixed-point distances
    "q_snm_pairs",  # sorted-neighborhood ER blocking window pairs
    "q_session_drift",  # consecutive-session sequence Levenshtein per user
    "q_kcore",  # R-round k-core peel, unrolled materialized-CTE oracle
    "q_decay",  # time-decayed sum, exact dyadic fixed-order float chain
    "q_mmr",  # MMR diversity reranking, unrolled-CTE oracle
    "q_ucb",  # UCB1 bandit scores, bit-exact mirrored ln chain
    "q_aes_sample",  # Efraimidis-Spirakis weighted sample w/o replacement
    "q_ols2",  # grouped two-feature OLS, exact moments + Cramer mirror
    "q_zipf",  # Zipf slope fit, milli-ln integer moments
    "q_power_means",  # geometric + harmonic means, exact quantized forms
    "q_golden",  # survivorship merge: most-frequent non-null per cluster
    "q_sparse_dot",  # consecutive-doc sparse tf dot products
    "q_scd2_merge",  # incremental SCD2 merge == full rebuild
    "q_theil",  # Theil inequality index, order-free micro-unit terms
    "q_jaro",  # Jaro-Winkler, bit-identical to DuckDB's native fn
    "q_jaccard_sim",  # byte-set Jaccard, bit-identical to native jaccard()
    "q_strip_accents",  # accent strip vs DuckDB's native strip_accents
    "q_base64",  # vectorized base64 vs DuckDB's native to_base64
    "q_base64_roundtrip",  # encode->strict decode fidelity roundtrip
    "q_hex",  # vectorized hex vs DuckDB's native hex()
    "q_bit_hamming",  # popcount(xor) SimHash distance vs native bit_count
    "q_soundex",  # phonetic blocking keys, list-dedup SQL mirror
    "q_idle_gaps",  # inter-session idle gaps, pure operator composition
    "q_er_golden",  # full ER chain: cluster -> survivorship, ONE oracle
    "q_assoc",  # association rules: support/confidence/lift, exact ratios
    "q_ltv",  # cohort LTV curves, exact integer micro-units
    "q_ece",  # expected calibration error, one-division integer identity
    "q_ips",  # IPS/SNIPS off-policy eval, quantized integer weights
    "q_rmst",  # restricted-mean-survival terms, per-interval emission
    "q_change_point",  # per-entity binary-segmentation split, exact argmax
    "q_mi2d",  # binned continuous mutual information, micro-unit terms
    "q_reco",  # recsys candidate generation chain, ONE chained oracle
    "q_trend",  # Mann-Kendall-style per-user trend via Kendall tau-b
    "q_psm",  # propensity-score matching: exact + nearest + caliper
    "q_uplift",  # per-segment uplift readout, exact cells + one division
    "q_heaps",  # Heaps-law vocabulary growth fit, milli-ln moments
    "q_adamic_adar",  # degree-discounted link prediction, micro-ln terms
    "q_lorenz",  # Lorenz-curve decile points, exact integer ppm shares
    "q_regularity",  # inter-arrival cadence CV per user
    "q_utilization",  # session busy fraction per user, exact ppm
    "q_price_index",  # Laspeyres price index, exact basket sums
    "q_replace_col",  # column-pattern regex replace, distinct-once RE2 dispatch
    "q_chunk",  # RAG chunking fan-out (vectorized per-ordinal utf8 slices)
    "q_windows",  # LLM context windows (offsets-arithmetic 2-D gather)
    "q_dup_removal",  # Lee-2022 passage rewrite (gram shuffle + broadcast rebuild)
    "q_simhash",  # mod-prime SimHash fingerprints (vocab broadcast, one map)
    "q_semdedup",  # SemDeDup: centroid assign + per-cluster leader scan
    "q_bm25",  # Okapi BM25 vs fixed query terms (one tf pass + stats fold)
    "q_linear_score",  # fixed-point linear-model inference + quality filter
    "q_centroids",  # grouped vector mean (class centroids), reduceat partials
    "q_hash_encode",  # encoder trio in SQL-certifiable poly mode
    "q_semantic_decontam",  # embedding-space benchmark decontamination
    "q_word_freq",  # integer-exact unigram-frequency quality score
    "q_dedup_index",  # incremental dedup vs a persisted hash index
    "q_approx_quantiles",  # one-pass mergeable quantile sketch
    "q_embedding_prep",  # end-to-end embedding prep (decontam -> SemDeDup)
    "q_group_quantile_sketch",  # per-group mergeable quantile sketch
    "q_temperature",  # exact-integer temperature-balanced corpus sampling
    "q_redact",  # RE2 PII scrubbing + per-category match counts
    "q_line_filter",  # C4-style per-line cleaning (split + rules + rebuild)
    "q_gopher",  # full Gopher rule bundle, integer-rational flags
    "q_scd2",  # SCD2 history build (key sort + shifted null-safe compare)
    "q_json",  # flat-JSON field extraction (RE2, no per-row parse)
    "q_word_chunks",  # word-window RAG chunking with remainder tails
    "q_knn",  # exact kNN graph (broadcast corpus + tiled matmuls)
    "q_normalize",  # unicode/case/whitespace canonicalization
    "q_norm_dedup",  # normalize -> exact-dedup composition chain
    "q_url",  # URL host/domain extraction + blocklist flag
    "q_domain_cap",  # per-domain cap (extract -> k-per-group sample)
    "q_countmin",  # Count-Min point frequencies (order-free integer merge)
    "q_chi2",  # (term, class) chi-squared feature scores
    "q_hash_vec",  # zero-state feature hashing to count vectors
    "q_event_dedup",  # at-least-once telemetry cleanup (Lag composition)
    "q_collocations",  # bigram PMI (pair combiner + broadcast margins)
    "q_drift",  # PSI drift report (two scan-filtered histogram passes)
    "q_session_stats",  # sessionize -> per-session aggregates chain
    "q_checksum",  # order-invariant content checksum (HUGEINT-exact)
    "q_cat_drift",  # categorical PSI drift (value-count union)
    "q_ann_ivf_update",  # incremental IVF index append + full-probe query
    "q_top_items",  # grouped heavy hitters (counts -> partial top-k)
    "q_twap",  # time-weighted average (integer step integral)
    "q_bpe_pairs",  # BPE adjacent-pair counts over token arrays
    "q_oov",  # OOV rate vs fitted top-K vocab
    "q_outliers",  # per-group MAD outlier screen
    "q_outer",  # FULL OUTER sort-shuffle join (filtered scans, pre-agg right)
    "q_rolling_median",  # rolling median window (skiplist selection)
    "q_postings",  # inverted-index build (term -> df/cf/postings)
    "q_shards",  # weight-balanced snake shard assignment (global rank)
    "q_fuzzy_decontam",  # cross-corpus near-dup decontamination (LSH + verify)
    "q_moments",  # per-group skewness/kurtosis (exact power sums)
    "q_lm_score",  # bigram-LM fluency score (broadcast conditional ppm)
    "q_percent_rank",  # global quantile-uniform transform (composite-key rank)
    "q_phash",  # image aHash dedup groups (decode -> thumbnail -> hash buckets)
    "q_neardup_best",  # near-dedup keeping the longest doc per cluster
    "q_nearest",  # nearest-direction as-of join (merge_asof parity)
    "q_feature_cross",  # hashed categorical cross (wide-and-deep buckets)
    "q_rare_label",  # rare-category collapse (fitted frequent set)
    "q_char_diversity",  # inverse-Simpson codepoint concentration score
    "q_woe",  # weight-of-evidence supervised categorical encoding
    "q_negatives",  # deterministic hash negative sampling + anti-join
    "q_trigrams",  # packed-code token trigram frequencies
    "q_rolling_p90",  # rolling 0.9-quantile window stat
    "q_attribution",  # sessionize -> first-touch attribution chain
    "q_nearest_broadcast",  # nearest as-of through the broadcast plan
    "q_auc",  # exact distributed ROC-AUC (integer Mann-Whitney)
    "q_mi",  # (term, class) mutual-information feature scores
    "q_group_impute",  # group-conditional median fill
    "q_calibration",  # reliability-diagram bins (exact int counts)
    "q_loo_encode",  # leave-one-out target encoding (leakage-safe)
    "q_group_bucket",  # per-group learned quantile buckets
    "q_rfm",  # recency/frequency/monetary features per user
    "q_group_auc",  # per-slice exact ROC-AUC
    "q_brier",  # exact fixed-point Brier score
    "q_ranking_eval",  # per-query NDCG/MRR/P@k (libm-constant DCG chain)
    "q_confusion",  # thresholded confusion matrix per slice
    "q_ks",  # two-sample Kolmogorov-Smirnov (exact cross-multiplied CDFs)
    "q_lift",  # cumulative gains/lift table
    "q_ohlc",  # daily OHLC candles per entity (int64 segment kernel)
    "q_anomaly",  # expanding z-score anomaly flags (exact integer rule)
    "q_rowwise_jaccard",  # per-row token-set overlap (dictionary-encoded)
    "q_spearman",  # per-group tie-aware rank correlation
    "q_gini",  # per-group Gini concentration
    "q_hhi",  # per-group Herfindahl concentration (integer ppm)
    "q_item2item",  # co-occurrence -> symmetric top-k recommendations
    "q_ab_test",  # per-experiment 2x2 chi-squared readout
    "q_trimmed_mean",  # per-group symmetric trimmed mean
    "q_cyclical",  # sin/cos seasonality encoding (bit-exact trig)
    "q_autocorr",  # lag-1 autocorrelation per group (exact pair sums)
    "q_label_prop",  # 1-step majority label propagation
    "q_rules",  # data-quality expectations report (exact violation counts)
    "q_kfold",  # balanced stratified K-fold assignment (hash rank)
    "q_eval_chain",  # scoring -> per-slice confusion, one chained oracle
    "q_novelty",  # per-doc n-gram novelty vs a reference set
    "q_cv_encode",  # K-fold cross-fitted target encoding (OOF means)
    "q_rrf",  # reciprocal rank fusion of two partial rankings
    "q_weighted_median",  # exact weighted quantile per group (integer rule)
    "q_rolling_corr",  # rolling Pearson corr, exact int64 power sums
    "q_feature_store",  # chained point-in-time asof features + static dim
    "q_logloss",  # per-slice cross-entropy, micro-unit integer sums
    "q_benford",  # Benford first-digit chi2 data-quality screen
    "q_iv",  # WoE + information-value per category
    "q_bootstrap",  # multiplier bootstrap, exact integer replicate sums
    "q_welch",  # per-cohort Welch t-test, exact int64 cells
    "q_containment",  # subset-duplicate containment pairs (exact recall)
    "q_cusum",  # exact-integer CUSUM drift statistic per entity
    "q_clustering",  # per-node local clustering coefficient (int ppm)
    "q_km",  # Kaplan-Meier survival curve, micro-log-unit exact
    "q_quantile_norm",  # cross-group quantile normalization (rank join)
    "q_group_scale",  # group-conditional z-score, exact power-sum fit
    "q_prompts",  # structured-to-text prompt rendering (string_agg)
    "q_rebalance",  # deterministic hash class rebalancing
    "q_nucleus",  # top-p vocabulary truncation per group
    "q_pinball",  # quantile-forecast pinball loss, exact integer branches
    "q_pr_auc",  # per-slice average precision (PR-AUC), micro-unit exact
    "q_hard_negatives",  # contrastive hard-negative mining (complement kNN)
    "q_kendall",  # tau-b: tiled O(n^2) sign-product kernel per group
    "q_wasserstein",  # W1 drift: CDF-gap area over distinct-value cells
    "q_dsir",  # DSIR importance weights (hashed unigram log-ratios)
    "q_paths",  # 3-step path mining (packed n-gram codes per block)
    "q_array_distinct",  # per-row token-set canonicalization (one lexsort)
    "q_rbo",  # rank-biased overlap of two per-order rankings
    "q_ann_recall",  # IVF-vs-brute recall certification (two corpus passes)
    "q_bottomk",  # KMV distinct sketch (partial bottom-k per group)
    "q_ppm",  # color-image decode, exact channel sums (actor pool)
    "q_acf",  # lag-1..3 autocorrelation tables (scatter-add power sums)
]


def _prev_round_queries() -> dict:
    """Per-query seconds from the newest BENCH_r{N}.json next to this script
    (the previous round's record) — used to report deltas."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best, best_n = None, -1
    for f in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if m and int(m.group(1)) > best_n:
            best, best_n = f, int(m.group(1))
    if not best:
        return {}
    try:
        with open(best) as fh:
            doc = json.load(fh)
        q = (doc.get("parsed") or doc).get("queries") or {}
        if q:
            return q
        # r4's record has parsed: null (the driver captured only the output
        # tail) — recover per-query seconds from the tail fragment, taking
        # only the portion before queries_vs_prev_round (those are ratios)
        tail = doc.get("tail") or ""
        tail = tail.split('"queries_vs_prev_round"')[0]
        return {m.group(1): float(m.group(2)) for m in
                re.finditer(r'"(q_\w+)": ([0-9.]+)', tail)}
    except (OSError, json.JSONDecodeError, AttributeError, ValueError):
        return {}


def run_queries() -> dict:
    _ray()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in _BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        res = fn(SF_DIR)
        # consume the stream without materializing to the driver
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.time() - t0, 3)
    return out


def main_once(flagship_only: bool = False, warmup: bool = False):
    if warmup:
        headline()  # discard: primes workers + page cache (BASELINE.md protocol)
    h = headline()
    queries = {} if flagship_only else run_queries()
    prev = _prev_round_queries() if queries else {}
    deltas = {
        name: round(queries[name] / prev[name], 2)
        for name in queries
        if prev.get(name)
    }
    doc = {
        "metric": "flagship fit+transform+window wall-clock",
        "value": h["total_s"],
        "unit": "sec",
        "queries": queries,
        "queries_vs_prev_round": deltas,
        "sf": SF,
        "num_cpus": NUM_CPUS,
        "rows": h["rows"],
        "tokens": h["tokens"],
        "rows_per_s": h["rows_per_s"],
        "tokens_per_s": h["tokens_per_s"],
        "phases": {"fit_s": h["fit_s"], "transform_s": h["transform_s"], "window_s": h["window_s"]},
    }
    # the per-query dicts (82+ entries) outgrew the driver's tail capture in
    # r4 ("parsed": null) — print the full doc on an EARLIER line and a
    # compact headline (no per-query dicts) as the LAST line
    if queries:
        print(json.dumps(doc))
        compact = {k: v for k, v in doc.items()
                   if k not in ("queries", "queries_vs_prev_round")}
        compact["queries_total_s"] = round(sum(queries.values()), 3)
        compact["queries_n"] = len(queries)
        print(json.dumps(compact))
    else:
        print(json.dumps(doc))
    import ray

    ray.shutdown()
    return doc


def main_scaling():
    """Fresh process per CPU count; in-process warm-up run discarded.

    Uses a larger same-for-both-counts input (KAMAE_SCALING_ROWS, default
    4.8M rows ~ 1.2B tokens) so parallel compute dominates the fixed
    per-execution driver latency — the sandbox proxy for the N vs 4N node
    criterion (BASELINE.md protocol)."""
    scaling_rows = os.environ.get("KAMAE_SCALING_ROWS", "2400000")
    lo, hi = (int(x) for x in os.environ.get("KAMAE_SCALING_CPUS", "4,16").split(","))
    # pre-generate once so neither timed subprocess pays synthesis
    from kamae_ray.sources.synth import tokens_table_path as _ttp

    _ttp(int(scaling_rows))
    results = {}
    for cpus in (lo, hi):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(cpus),
            GRAFT_SF_DIR=SF_DIR,
            KAMAE_BENCH_ROWS=scaling_rows,
            KAMAE_BENCH_SINK="digest",  # see headline(): shared sandbox disk
        )
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flagship-only", "--warmup"],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)  # warm-up ran in-process, discarded
    tp_lo = results[lo]["rows_per_s"]
    tp_hi = results[hi]["rows_per_s"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    phase_eff = {}
    pl, ph = results[lo].get("phases", {}), results[hi].get("phases", {})
    for k in pl:
        if k in ph and ph[k] > 0:
            phase_eff[k.replace("_s", "")] = round((pl[k] / ph[k]) / (hi / lo), 3)
    doc = {
        "metric": f"scaling efficiency (rows/s at {hi} cpus vs {lo} cpus / {hi // lo})",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": SF,
        "cpus": [lo, hi],
        "rows": int(scaling_rows),
        f"throughput_{lo}": tp_lo,
        f"throughput_{hi}": tp_hi,
        f"tokens_per_s_{lo}": results[lo]["tokens_per_s"],
        f"tokens_per_s_{hi}": results[hi]["tokens_per_s"],
        "phase_efficiency": phase_eff,
        "pass": eff >= 0.8,
    }
    print(json.dumps(doc))
    return doc


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    else:
        main_once(
            flagship_only="--flagship-only" in sys.argv,
            warmup="--warmup" in sys.argv,
        )
