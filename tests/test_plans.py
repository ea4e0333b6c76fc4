"""Physical-plan assertions: the properties that make the catalog hold
up at 100 TB are locked in here so a regression is a test failure, not
a silent 10× on the cluster.

- dim joins broadcast (no shuffled sort-merge join of the fact table)
- filters and projections reach the parquet scan (PushedFilters,
  pruned ReadSchema)
- order-by + limit executes as TakeOrderedAndProject, not a global sort
- the text/curation family stays UDF-free (no BatchEvalPython /
  ArrowEvalPython in the plan) and shuffle-free
- rule 4's four window functions share ONE shuffle (same window spec)
"""

import re

import pytest

from etl_fraud_detection_spark.plans.queries import QUERIES


def count_nodes(plan: str, node: str) -> int:
    """Count physical nodes in a formatted explain (each node appears
    twice: once in the tree, once as a '(n) Node' detail header)."""
    return len(re.findall(rf"\(\d+\) {node}", plan))

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df, mode="formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def q(spark, name):
    return QUERIES[name].fn(spark, SF_DIR)


def test_equi_chain_broadcasts_dims(spark):
    p = plan_of(q(spark, "q_join_equi_chain"))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_temporal_join_is_hash_join_with_range_residual(spark):
    p = plan_of(q(spark, "q_join_temporal"))
    assert "BroadcastHashJoin" in p or "ShuffledHashJoin" in p


def test_filter_pushdown_reaches_scan(spark):
    p = plan_of(q(spark, "q_filter_pred"))
    assert "PushedFilters: [" in p
    # at least the status IN-list must be pushed
    assert "o_orderstatus" in p.split("PushedFilters")[1].split("]")[0]


def test_scan_prunes_columns(spark):
    p = plan_of(q(spark, "q_scan_project"))
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema  # untouched wide column pruned
    assert "l_orderkey" in read_schema


def test_topk_sample_avoids_global_sort(spark):
    p = plan_of(q(spark, "q_sample_topk_hash"))
    assert "TakeOrderedAndProject" in p


@pytest.mark.parametrize(
    "name",
    ["q_text_stats", "q_token_count", "q_doc_fingerprint", "q_rolling_hash",
     "q_pii_redact", "q_quality_filter", "q_sample_stratified"],
)
def test_text_family_is_codegen_only_single_scan(spark, name):
    p = plan_of(q(spark, name))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p  # scan-project only: no shuffle at any scale


def test_sessionize_single_shuffle(spark):
    p = plan_of(q(spark, "q_sessionize"))
    assert count_nodes(p, "Exchange") == 1, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_asof_operator_single_shuffle(spark):
    # the operator itself (the catalog query adds a dedupe window with
    # its own shuffle on the right side)
    from pyspark.sql import functions as F

    from etl_fraud_detection_spark.catalog import load_table
    from etl_fraud_detection_spark.operators.temporal import asof_join

    ev = load_table(spark, SF_DIR, "events")
    left = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    p = plan_of(asof_join(left, right, ["user_id"], right_value_cols=["value"]))
    assert count_nodes(p, "Exchange") == 1, p


def test_session_stats_reuses_sessionize_exchange(spark):
    # groupBy(user_id, session_seq) groups by a superset of the window's
    # partition key — no second Exchange may appear
    p = plan_of(q(spark, "q_session_stats"))
    assert count_nodes(p, "Exchange") == 1, p


def test_window_frames_share_one_shuffle(spark):
    p = plan_of(q(spark, "q_window_frames"))
    n_exchange = count_nodes(p, "Exchange")
    assert n_exchange == 1, f"expected 1 shuffle, saw {n_exchange}"
    assert count_nodes(p, "Window") <= 2  # frames fused into <=2 Window execs


def _shingle_only_join_keys(plan: str) -> list[str]:
    """Equi-join key lists that consist of the shingle column alone —
    the signature of the corpus-wide co-shingle self-join."""
    bad = []
    for side in ("Left", "Right"):
        for m in re.finditer(rf"{side} keys \[(\d+)\]: \[([^\]]*)\]", plan):
            if m.group(1) == "1" and "shingle" in m.group(2):
                bad.append(m.group(2))
    return bad


def test_embedding_lsh_pairs_join_on_bucket_key(spark):
    """q_dedup_embedding_lsh must pair vectors via an equi-join on the
    LSH bucket code — never the broadcast-nested-loop all-pairs shape
    of the quadratic baseline (which is exactly what q_dedup_embedding
    is pinned TO, proving the detector works)."""
    p_gated = plan_of(q(spark, "q_dedup_embedding_lsh"))
    assert "BroadcastNestedLoopJoin" not in p_gated, p_gated
    assert re.search(r"keys \[1\]: \[bucket", p_gated), p_gated
    p_base = plan_of(q(spark, "q_dedup_embedding"))
    assert "BroadcastNestedLoopJoin" in p_base


def test_cluster_candidates_avoid_coshingle_self_join(spark):
    """near_dup_clusters must generate candidate edges via the bucketed
    MinHash+LSH join, never the quadratic co-shingle self-join."""
    import inspect

    from etl_fraud_detection_spark.catalog import load_table
    from etl_fraud_detection_spark.operators import dedup

    # the operator's default generator is the LSH path
    assert inspect.signature(dedup.near_dup_clusters).parameters["candidates"].default == "lsh"

    docs = load_table(spark, SF_DIR, "documents")
    p_lsh = plan_of(dedup.minhash_lsh_pairs(docs, tau=0.8))
    assert not _shingle_only_join_keys(p_lsh), p_lsh
    # sanity: the detector does fire on the exact all-pairs path
    p_exact = plan_of(dedup.ngram_jaccard_pairs(docs, tau=0.8))
    assert _shingle_only_join_keys(p_exact)


def test_sql_script_report_broadcasts_dims(spark):
    """The .sql-file execution path must reach the same physical shape
    as the DataFrame pipeline: every dimension join broadcast, no
    sort-merge join of the fact table (the hint rides the registered
    views, not the user's script)."""
    p = plan_of(q(spark, "q_fraud_report_sql"))
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_tpch_q3_is_topk_not_global_sort(spark):
    p = plan_of(q(spark, "q_tpch_q3"))
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p


def test_tpch_q5_broadcasts_all_dims(spark):
    p = plan_of(q(spark, "q_tpch_q5"))
    assert count_nodes(p, "BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in p


def test_tpch_q18_aggregates_lineitem_once(spark):
    """Q18's IN-subquery groups on the same key as the outer SUM, so
    the rewritten plan must scan/aggregate lineitem ONCE and use top-k,
    not a global sort."""
    p = plan_of(q(spark, "q_tpch_q18"))
    assert p.count("lineitem.parquet") == 1
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p


def test_tpch_q4_semi_join(spark):
    """The EXISTS in Q4 must plan as a semi join (no row multiplication
    from the many-lines-per-order fan-out)."""
    p = plan_of(q(spark, "q_tpch_q4"))
    assert "LeftSemi" in p


def test_tpch_q17_brand_filter_before_stats(spark):
    """Q17's per-part stats must aggregate only the brand's lines: the
    part filter broadcasts into lineitem before any aggregation, so no
    full-table lineitem agg appears (both lineitem reads join the
    filtered part first)."""
    p = plan_of(q(spark, "q_tpch_q17"))
    assert "SortMergeJoin" not in p
    assert count_nodes(p, "BroadcastHashJoin") >= 2


def test_corpus_pipeline_single_scan(spark):
    """The end-to-end pipeline must read the corpus ONCE: the quality
    gate is an inline predicate fused into the redaction scan, not a
    stats self-join."""
    p = plan_of(q(spark, "q_corpus_pipeline"))
    assert p.count("documents.parquet") == 1


def test_tfidf_model_broadcasts(spark):
    """TF-IDF's df table and corpus count must broadcast back onto tf —
    the corpus-side frame never sort-merge-joins the vocab model."""
    p = plan_of(q(spark, "q_tfidf_topterms"))
    assert count_nodes(p, "BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in p or count_nodes(p, "BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_lm_score_model_broadcasts(spark):
    """The bigram model (vocab-bounded) must broadcast for scoring; the
    corpus-side gram stream never shuffles for the model join."""
    p = plan_of(q(spark, "q_lm_score"))
    assert count_nodes(p, "BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_fuzzy_join_is_blocked_equi_join(spark):
    """Blocking must turn the levenshtein self-match into a hash
    equi-join — an unblocked plan degenerates to a nested-loop
    cross-product of all name pairs."""
    p = plan_of(q(spark, "q_fuzzy_join"))
    assert "CartesianProduct" not in p
    assert count_nodes(p, "BroadcastHashJoin") + count_nodes(p, "SortMergeJoin") >= 1
    assert "BroadcastNestedLoopJoin" not in p


def test_tpch_q8_single_fact_shuffle(spark):
    """Q8's 8-way join must keep lineitem⋈orders as the only shuffled
    join — part/customer/supplier/nation/region all broadcast."""
    p = plan_of(q(spark, "q_tpch_q8"))
    assert "SortMergeJoin" not in p
    assert count_nodes(p, "BroadcastHashJoin") >= 5


def test_tpch_q21_semi_anti_one_key(spark):
    """Q21's EXISTS / NOT EXISTS must plan as semi + anti hash joins on
    the order key (with the supplier/lateness conjuncts as join
    residuals), never as a row-multiplying inner self-join."""
    p = plan_of(q(spark, "q_tpch_q21"))
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_tpch_q2_decorrelated_window_min(spark):
    """Q2's correlated MIN-cost subquery must decorrelate into ONE
    window over the part key (2 exchanges total: pair agg + window),
    with every dimension broadcast and top-100 as TakeOrdered."""
    p = plan_of(q(spark, "q_tpch_q2"))
    assert count_nodes(p, "Window") == 1
    assert count_nodes(p, "Exchange") <= 2
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_tpch_q9_single_shuffle(spark):
    """Q9: part/supplier/nation (and orders at this SF) broadcast; the
    only exchange is the final group-by."""
    p = plan_of(q(spark, "q_tpch_q9"))
    assert count_nodes(p, "BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_tpch_q11_scalar_threshold_is_broadcast(spark):
    """Q11's fraction-of-total threshold must be a 1-row broadcast
    cross join (BroadcastNestedLoopJoin), never a driver collect."""
    p = plan_of(q(spark, "q_tpch_q11"))
    assert count_nodes(p, "BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in p


def test_tpch_q16_broadcast_anti_exclusion(spark):
    """Q16's excluded-supplier NOT IN must plan as a broadcast anti
    join against the tiny negative-balance set."""
    p = plan_of(q(spark, "q_tpch_q16"))
    assert "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_tpch_q20_semi_join_broadcasts_heavy_set(spark):
    """Q20's aggregate-derived IN-subquery must consume as a broadcast
    LEFT SEMI join (the post-HAVING key set is bounded by supplier
    cardinality)."""
    p = plan_of(q(spark, "q_tpch_q20"))
    assert "LeftSemi" in p
    assert "SortMergeJoin" not in p


def test_rolling_time_window_single_shuffle(spark):
    """The trailing RANGE-frame aggregates must share one window spec:
    a single exchange on the entity key, one Window node."""
    p = plan_of(q(spark, "q_rolling_time_window"))
    assert count_nodes(p, "Exchange") == 1
    assert count_nodes(p, "Window") == 1
    assert "Join" not in p


def test_weighted_sample_is_topk_not_sort(spark):
    """A-ES weighted sampling must execute as TakeOrderedAndProject
    (per-partition top-k), never a global sort."""
    p = plan_of(q(spark, "q_sample_weighted"))
    assert "TakeOrderedAndProject" in p
    assert count_nodes(p, "Exchange") == 0


def test_chi2_broadcasts_model_sides(spark):
    """χ² term selection: df/label/N sides broadcast; the only
    exchanges are the (doc,term) distinct, the (term,label) aggregate,
    and the top-k window."""
    p = plan_of(q(spark, "q_chi2_terms"))
    assert count_nodes(p, "BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p
    assert count_nodes(p, "SortMergeJoin") == 0


def test_funnel_single_shuffle(spark):
    """The 3-step funnel must plan as ONE user-key exchange feeding
    three Window nodes and the per-user reduce — chained step windows
    share the partition spec."""
    p = plan_of(q(spark, "q_funnel"))
    assert count_nodes(p, "Exchange") == 1
    assert count_nodes(p, "Window") == 3
    assert "Join" not in p


def test_retention_two_phase_distinct_no_expand(spark):
    """Cohort retention: one user window + one cell aggregation, and
    the single COUNT(DISTINCT) must be two-phase, never an Expand."""
    p = plan_of(q(spark, "q_retention_cohorts"))
    assert count_nodes(p, "Exchange") <= 2
    assert "Expand" not in p


def test_semdedup_cell_join_and_broadcast_backflag(spark):
    """SemDeDup: the pair join shuffles on the cell key once; the
    dropped-id set broadcasts back for the verdict flag."""
    p = plan_of(q(spark, "q_semdedup"))
    assert count_nodes(p, "Exchange") <= 1
    assert count_nodes(p, "BroadcastHashJoin") == 2
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p


def test_dedup_paragraphs_skew_safe_first_occurrence(spark):
    """Paragraph dedup (round 10, skew-hardened): first occurrence is
    a map-side-combinable min-struct AGGREGATE joined back on the
    fingerprint — never a row_number window partitioned by fp, whose
    hot boilerplate key would pile every occurrence onto one reducer
    (SCALE.md round 10: 52s single task at 10^6 hot rows). The doc
    rebuild still rides collect_list NULLs, no trailing doc join."""
    p = plan_of(q(spark, "q_dedup_paragraphs"))
    assert "row_number" not in p  # the skewed marker shape
    assert "partial_min" in p  # map-side combine collapses hot fps
    assert "CartesianProduct" not in p


def test_dedup_substring_skew_safe_single_gram_build(spark):
    """Substring dedup (round 10): the per-token gram frame is
    localCheckpointed (computed ONCE — the agg and join branches would
    otherwise each re-run the O(len·k) gram build, measured 1.9x the
    query), first occurrence is the min-struct aggregate + join back
    (no fp-partitioned row_number window — the hot-boilerplate skew
    hazard), and the per-doc coverage window + rebuild remain."""
    p = plan_of(q(spark, "q_dedup_substring"))
    assert "row_number" not in p
    assert "partial_min" in p  # map-side combine collapses hot fps
    assert "ExistingRDD" in p  # checkpointed gram frame, built once
    assert "CartesianProduct" not in p


def test_udaf_is_arrow_grouped_agg(spark):
    """The UDAF surface pin must actually plan as an Arrow grouped
    aggregation (not row-at-a-time Python)."""
    p = plan_of(q(spark, "q_udaf_norm_stats"))
    assert "ArrowAggregatePython" in p or "AggregateInPandas" in p
    assert "BatchEvalPython" not in p


def test_udtf_is_lateral_python_generate(spark):
    """The UDTF must expand laterally in the executor Python worker with
    doc_id passed through by the lateral join, not re-computed."""
    p = plan_of(q(spark, "q_udtf_chunks"))
    assert "Generate" in p or "PythonUDTF" in p or "EvalPythonUDTF" in p


@pytest.mark.parametrize(
    "name", ["q_length_buckets", "q_epoch_shuffle", "q_pack_sequences"]
)
def test_global_order_ops_never_single_partition_the_data(spark, name):
    """The exact global rank/ntile/cumsum operators must be the two-pass
    distributed shape: a range-partitioned sort of the data with a
    _pid-partitioned window, plus ONE SinglePartition exchange that
    carries only the per-partition count/sum table (<= shuffle
    partitions rows) — never the corpus itself."""
    p = plan_of(q(spark, name))
    assert "rangepartitioning(" in p  # distributed sort of the data
    assert re.search(r"windowspecdefinition\(_pid#\d+,", p)  # data window partitioned
    singles = re.findall(
        r"Input \[\d+\]: \[([^\]]*)\]\nArguments: SinglePartition", p
    )
    assert len(singles) == 1  # exactly the offsets branch
    assert "_cnt#" in singles[0]  # ...and it carries the tiny count table


def test_bucketed_join_and_agg_zero_exchanges(spark):
    """Both sides bucketed on the join key: the SortMergeJoin AND the
    follow-on groupBy on the same key must read the distribution off
    the scan — not one Exchange anywhere in the plan."""
    p = plan_of(q(spark, "q_join_bucketed"))
    assert "SortMergeJoin" in p
    assert count_nodes(p, "Exchange") == 0
    assert "Bucketed: true" in p


def test_hll_portable_two_hash_aggregates_no_data_window(spark):
    """Portable HLL must be two map-side-combinable aggregations
    (register max, then group sum) — no window, no join, no sort over
    the data."""
    p = plan_of(q(spark, "q_hll_portable"))
    assert count_nodes(p, "HashAggregate") >= 4  # partial+final x2
    assert "Window" not in p and "Join" not in p


def test_ivf_nprobe_broadcast_assignment(spark):
    """nprobe IVF keeps the nprobe=1 shape: centroid assignment via
    broadcast nested loop over the tiny centroid set, candidate/query
    meet through an equi-join on the cell id — never a corpus-level
    cartesian."""
    p = plan_of(q(spark, "q_ann_ivf_nprobe"))
    assert "BroadcastNestedLoopJoin" in p  # N x K centroid assignment
    assert count_nodes(p, "BroadcastHashJoin") >= 1  # cell-key join
    assert "CartesianProduct" not in p


def test_bloom_prefilter_big_side_never_shuffles(spark):
    """The k probe joins must all be broadcast semi-joins — the event
    stream reaches the filter without a shuffle or sort-merge."""
    p = plan_of(q(spark, "q_bloom_prefilter"))
    assert count_nodes(p, "BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_rollup_single_expand_single_shuffle(spark):
    """ROLLUP/CUBE compile to ONE Expand + one aggregation exchange —
    the corpus is scanned once however many grouping sets roll up."""
    for name in ("q_grouping_sets", "q_cube_grouping"):
        p = plan_of(q(spark, name))
        assert count_nodes(p, "Expand") == 1, p
        assert count_nodes(p, "Exchange") == 1, p
        assert "Join" not in p


def test_hypertable_probe_prunes_to_one_day(spark):
    """The one-day query must reach the scan as a PartitionFilter on
    event_date (directory pruning — the 100 TB lever), with no
    residual ts predicate forcing a full scan."""
    p = plan_of(q(spark, "q_layout_hypertable"))
    scan = p.split("PartitionFilters:")[1].splitlines()[0]
    assert "event_date" in scan and "2024-01-15" in scan, p


def test_bm25_topk_is_takeordered_not_global_sort(spark):
    """Top-k retrieval over the stored index compiles to
    TakeOrderedAndProject — no global Sort exchange (the round-7
    retrieval contract)."""
    p = plan_of(q(spark, "q_bm25_topk"))
    assert "TakeOrderedAndProject" in p
    assert count_nodes(p, "Sort") == 0


def test_zorder_key_is_shuffle_free(spark):
    """The Morton key is scan + one broadcast bounds row + codegen
    fold: no hash-partition exchange, no window, no Python."""
    p = plan_of(q(spark, "q_zorder_key"))
    # the one Exchange is the single-row bounds aggregate (SinglePartition);
    # the fact side is never hash-partitioned
    assert count_nodes(p, "Exchange") == 1
    assert "hashpartitioning" not in p
    assert count_nodes(p, "Window") == 0
    assert "EvalPython" not in p


def test_data_card_is_one_expand_one_shuffle(spark):
    """The rollup lattice partial-aggregates map-side: one Expand,
    one hash-partition exchange, no Python, no window."""
    p = plan_of(q(spark, "q_data_card"))
    assert count_nodes(p, "Expand") == 1
    assert count_nodes(p, "Exchange") == 1
    assert "EvalPython" not in p


def test_bm25_query_text_is_takeordered_not_global_sort(spark):
    """The raw-string retrieval form inherits q_bm25_topk's physical
    contract: TakeOrderedAndProject, zero Sort exchanges — the
    query-side analyzer adds a bounded driver tokenize, never a plan
    change."""
    p = plan_of(q(spark, "q_bm25_query_text"))
    assert "TakeOrderedAndProject" in p
    assert count_nodes(p, "Sort") == 0


def test_zorder_key_mixed_axes_stay_jvm_side(spark):
    """Mixed-type axes (timestamp/string/integral) keep the Morton key
    in codegen: no Python, no window over the DATA (the one window
    ranks the handful of DISTINCT strings), and the only exchanges are
    the single-row bounds aggregate and the dictionary-rank side —
    the fact table itself is never hash-partitioned."""
    p = plan_of(q(spark, "q_zorder_key_mixed"))
    assert "EvalPython" not in p
    # the dict-rank subplan appears under the fact side AND the bounds
    # side (two windows), but each window's input is the DISTINCT
    # aggregation — every hash-partition exchange in the whole plan is
    # over the handful of distinct strings, never the fact table
    assert count_nodes(p, "Window") == 2
    import re as _re

    for m in _re.findall(r"hashpartitioning\(([^,]+),", p):
        assert "o_orderpriority" in m, p
