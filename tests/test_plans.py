"""Physical-plan assertions: the 100 TB posture is checkable locally —
filters reach the parquet scan, dimensions broadcast, aggregates partial
map-side, hot paths stay inside whole-stage codegen with no Python UDFs.
"""

from __future__ import annotations

import re

import pytest

from clickhouse_sinker_spark.plans.queries import QUERIES

from .conftest import SF_DIR


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_q1_filter_pushed_to_scan(spark):
    plan = plan_of(QUERIES["tpch_q1_pricing"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # map-side partial aggregation before the exchange
    assert plan.count("HashAggregate") >= 2


def test_q1_scan_prunes_columns(spark):
    plan = plan_of(QUERIES["tpch_q1_pricing"](spark, SF_DIR))
    # 7 needed columns only — o_orderkey etc. never read
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"):
        assert col in read
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_q3_broadcasts_customer(spark):
    plan = plan_of(QUERIES["tpch_q3_topk"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # top-k compiles to TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_q5_no_cartesian_and_broadcast_dims(spark):
    plan = plan_of(QUERIES["tpch_q5_region_revenue"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # region/nation/supplier at least


def test_q19_part_predicates_pushed_below_join(spark):
    plan = plan_of(QUERIES["tpch_q19_disjunctive"](spark, SF_DIR))
    # the disjunction's part-only factors must prune the part scan
    assert "PushedFilters" in plan
    read = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("p_brand" in l for l in read)


def test_etl_projection_has_no_python_udf(spark):
    plan = plan_of(QUERIES["etl_parse_project"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dedup_exact_partial_aggregation(spark):
    plan = plan_of(QUERIES["dedup_exact_docs"](spark, SF_DIR))
    # fingerprint dedup: partial agg before the single shuffle
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") <= 2


def test_knn_broadcasts_queries_not_corpus(spark):
    plan = plan_of(QUERIES["knn_cosine_topk"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join: two tables bucketed on the join key with equal
    bucket counts join with NO Exchange in the plan — the 100 TB answer to
    recurring fact-to-fact joins (operators/bucketing.py)."""
    from clickhouse_sinker_spark.operators.bucketing import (
        bucketed_join_ready,
        write_bucketed,
    )
    from clickhouse_sinker_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "events")
    facts = e.select("event_id", "user_id", "value")
    users = e.groupBy("user_id").count()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test scale the small side would broadcast, hiding the layout;
        # at 100 TB neither side broadcasts — that regime is what bucketing
        # is for, so pin it
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(facts, "bk_facts", ["user_id"], 8,
                       path=str(tmp_path / "bk_facts"), sort_keys=["user_id"])
        write_bucketed(users, "bk_users", ["user_id"], 8,
                       path=str(tmp_path / "bk_users"), sort_keys=["user_id"])
        joined = bucketed_join_ready(spark, "bk_facts", "bk_users", "user_id")
        plan = plan_of(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == facts.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_facts")
        spark.sql("DROP TABLE IF EXISTS bk_users")


def test_range_join_is_window_not_self_join(spark):
    """range_join_recent_events must be the range-frame window plan: one
    Exchange (the user_id shuffle), a Window node, and NO join — the
    self-join formulation explodes O(k²) pairs per user at scale."""
    plan = plan_of(QUERIES["range_join_recent_events"](spark, SF_DIR))
    assert "Window" in plan
    assert "Join" not in plan, plan
    # exactly one Exchange node (the hash partitioning on user_id for the
    # window); count detail-section headers, the tree echoes names twice
    n_exchanges = sum(
        1 for l in plan.splitlines() if l.startswith("(") and "Exchange" in l
    )
    assert n_exchanges == 1, plan


def test_winnow_overlap_no_cartesian_no_udf(spark):
    """dedup_winnow_overlap's candidate generation must be an equi-join on
    the fingerprint (bucketed index), never a cartesian pair space, and
    the whole pipeline stays JVM-side (no Python UDF)."""
    plan = plan_of(QUERIES["dedup_winnow_overlap"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontam_broadcasts_benchmark_side(spark):
    """decontam_ngram_overlap must broadcast the (small) benchmark shingle
    set — the corpus side must NOT shuffle on shingle — and stay JVM-side."""
    plan = plan_of(QUERIES["decontam_ngram_overlap"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_quality_partial_agg_no_join_wider_than_doc(spark):
    """text_repetition_quality: every join key is doc_id (no gram-keyed
    join), aggregation is partial (map-side combine before each shuffle),
    and no Python UDF."""
    plan = plan_of(QUERIES["text_repetition_quality"](spark, SF_DIR))
    assert "partial" in plan.lower(), plan  # HashAggregate(partial) stages
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pii_scrub_is_single_stage_map(spark):
    """etl_pii_scrub is pure projection: no Exchange, no aggregate, no UDF
    — one codegen'd map stage over the scan."""
    plan = plan_of(QUERIES["etl_pii_scrub"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mix_sample_broadcasts_rates_no_corpus_shuffle(spark):
    """corpus_mix_sample must broadcast the 5-row rate table and keep the
    corpus scan shuffle-free (pure filter)."""
    plan = plan_of(QUERIES["corpus_mix_sample"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    n_exchanges = sum(
        1 for l in plan.splitlines()
        if l.startswith("(") and "Exchange" in l and "Broadcast" not in l
    )
    assert n_exchanges == 0, plan


def test_pack_token_budget_single_window_shuffle(spark):
    """pack_token_budget: one hash Exchange (the source partitioning for
    the running-sum window), no join, no Python UDF."""
    plan = plan_of(QUERIES["pack_token_budget"](spark, SF_DIR))
    assert "Window" in plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_incremental_dedup_joins_on_fingerprint_only(spark):
    """dedup_incremental_exact joins slim (doc_id, fp) projections — the
    text column must not survive past the scan into the joins."""
    plan = plan_of(QUERIES["dedup_incremental_exact"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # join keys are the fingerprint hash; text is consumed by the md5
    # projection and never a join attribute
    join_lines = [l for l in plan.splitlines() if "Join" in l and "text" in l]
    assert not join_lines, join_lines


def test_gap_fill_window_reuses_join_partitioning(spark):
    """ts_gap_fill's forward-fill window runs on the same user_id keying
    as the spine join — no cartesian, no Python UDF."""
    plan = plan_of(QUERIES["ts_gap_fill"](spark, SF_DIR))
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pretraining_pipeline_plan_shape(spark):
    """The end-to-end corpus build must broadcast the rate table, never go
    cartesian, and stay entirely JVM-side across all four stages."""
    plan = plan_of(QUERIES["pipeline_pretraining_corpus"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan  # the packing stage


def test_sessionize_single_exchange_two_windows(spark):
    """window_sessionize must keep the classic linear shape: lag + running
    sum share ONE Exchange (the user_id shuffle) across both Window nodes,
    and no join — a second shuffle or a self-join would double the cost of
    the dominant stage at 100 TB.  Also pins that the ordering key is
    NTZ-safe (this exact query was the round-2/3 bench blocker)."""
    plan = plan_of(QUERIES["window_sessionize"](spark, SF_DIR))
    assert "Window" in plan
    assert "Join" not in plan, plan
    n_exchanges = sum(
        1 for l in plan.splitlines() if l.startswith("(") and "Exchange" in l
    )
    assert n_exchanges == 1, plan


def test_all_queries_analyze_all_scale_dirs(spark):
    """Every registered query must at least ANALYZE against the real
    testdata schema at every scale dir (df.schema forces analysis without
    execution).  This is the guard that would have caught the
    unix_micros-on-TIMESTAMP_NTZ crash for all 108 queries at once."""
    failures = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        for name, fn in QUERIES.items():
            try:
                fn(spark, sf_dir).schema
            except Exception as exc:  # noqa: BLE001 — collect every failure
                failures.append(f"{name}@{sf_dir}: {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures)


def test_gopher_rules_map_side_only(spark):
    """quality_gopher_rules is the first gate of a corpus build — it must
    be a pure map (no Exchange, no join, no Python UDF): at 100 TB it
    should stream through the scan at I/O speed."""
    plan = plan_of(QUERIES["quality_gopher_rules"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_passage_dedup_no_cartesian_fp_equi_join(spark):
    """dedup_passage_ccnet joins chunks back to fingerprint counts — must
    be an equi-join on the fingerprint, never a cartesian pair space, and
    JVM-side end to end."""
    plan = plan_of(QUERIES["dedup_passage_ccnet"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ct_langid_broadcasts_profile(spark):
    """text_langid_trigram's K×L profile model must broadcast (it is tiny
    and fixed); the corpus side must never shuffle against it."""
    plan = plan_of(QUERIES["text_langid_trigram"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_driver_window_policy():
    """The driver-window ordering contract: a single static DRIVER_ORDER
    prefix (deterministic — NO runtime state feeds the ordering), every
    window query has an oracle, no query dropped or duplicated."""
    import clickhouse_sinker_spark.plans.queries as qmod

    assert len(qmod.DRIVER_ORDER) == qmod.DRIVER_WINDOW
    a = qmod.ordered_query_names()
    b = qmod.ordered_query_names()
    assert a == b  # deterministic, call-to-call stable
    assert a[: qmod.DRIVER_WINDOW] == qmod.DRIVER_ORDER
    assert sorted(a) == sorted(qmod.QUERIES)
    assert len(set(a)) == len(a)
    # every driver-hashed query must carry a value oracle
    assert all(n in qmod.ORACLES for n in qmod.DRIVER_ORDER)


def test_q18_preaggregates_below_join(spark):
    """The 100 TB Q18 shape: the l_orderkey quantity sum (and its >150
    filter) must sit BELOW both joins, so lineitem is aggregated before any
    join and customer broadcasts."""
    plan = plan_of(QUERIES["tpch_q18_having"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    lines = plan.splitlines()
    first_join = min(i for i, l in enumerate(lines) if "Join" in l)
    # the plan header lists operators in execution order in the tree dump;
    # assert an aggregate on l_quantity appears after (deeper than) the
    # first join in the formatted operator list
    agg_ids = [i for i, l in enumerate(lines) if "HashAggregate" in l]
    assert agg_ids and max(agg_ids) > first_join
    # and the filter on the aggregate result exists pre-join: the agg +
    # filter subtree feeds the join's left side, so no join output column
    # (c_name) may appear in any aggregate's grouping expressions
    assert not any("c_name" in l for l in lines if "HashAggregate" in l)


def test_seq_match_single_user_shuffle(spark):
    """seq_match_funnel: one hash Exchange (the user_id groupBy), no join
    — the sequence build must not add extra shuffles."""
    plan = plan_of(QUERIES["seq_match_funnel"](spark, SF_DIR))
    assert "Join" not in plan, plan
    n_exchanges = sum(
        1 for l in plan.splitlines() if l.startswith("(") and "Exchange" in l
    )
    assert n_exchanges == 1, plan


def test_cohort_retention_partial_aggs_no_cartesian(spark):
    """cohort_weekly_retention: user_id-keyed join only, partial
    aggregation before every shuffle, no cartesian."""
    plan = plan_of(QUERIES["cohort_weekly_retention"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "partial" in plan.lower(), plan


def test_session_agg_single_exchange(spark):
    """window_session_agg: one shuffle on the grouping key serves the
    session merge + aggregation; no Python UDF, no extra exchange."""
    plan = plan_of(QUERIES["window_session_agg"](spark, SF_DIR))
    assert plan.count("Exchange") <= 2  # partial->final agg pair at most
    assert "session_window" in plan.lower() or "SessionWindow" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_charlm_broadcasts_lm_tables(spark):
    """quality_charlm_score: both LM count tables join back by broadcast —
    the exploded bigram stream must not shuffle for scoring (only the
    final doc_id aggregate)."""
    plan = plan_of(QUERIES["quality_charlm_score"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_split_assign_single_aggregate(spark):
    """pipeline_split_assign: map-side bucket arithmetic + one grouped
    aggregate — no join, no UDF."""
    plan = plan_of(QUERIES["pipeline_split_assign"](spark, SF_DIR))
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_incremental_minhash_band_equi_join(spark):
    """dedup_incremental_minhash: candidate generation must be an
    equi-join on the band hash (batch probes the corpus index), never a
    cartesian pair space."""
    plan = plan_of(QUERIES["dedup_incremental_minhash"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_range_search_zero_shuffle(spark):
    """knn_range_search: broadcast queries + map-side filter — NO
    non-broadcast exchange anywhere (the whole point vs top-k)."""
    plan = plan_of(QUERIES["knn_range_search"](spark, SF_DIR))
    n_exchanges = sum(
        1 for l in plan.splitlines()
        if l.startswith("(") and "Exchange" in l and "Broadcast" not in l
    )
    assert n_exchanges == 0, plan


def test_semantic_dedup_blocked_join_no_cartesian(spark):
    """dedup_semantic_clusters: the pair join must be an equi-join on the
    cluster id (the SemDeDup block), never a cartesian product, and no
    Python UDF may appear — clustering + scoring are column expressions."""
    plan = plan_of(QUERIES["dedup_semantic_clusters"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "cluster" in plan  # join key visible in the plan


def test_limit_by_pushes_filter_below_window(spark):
    """ch_dialect_limit_by: the user_id predicate must reach the scan —
    the ranked-window rewrite may not trap it above the window."""
    plan = plan_of(QUERIES["ch_dialect_limit_by"](spark, SF_DIR))
    assert "PushedFilters" in plan and "LessThan(user_id" in plan
    # Spark applies the rank-limit pushdown: per-group top-n is pre-pruned
    # map-side (WindowGroupLimit) before the window exchange
    assert "WindowGroupLimit" in plan


def test_stats_buckets_single_aggregate(spark):
    """ch_dialect_stats_buckets: one grouped aggregate (bucket expression
    is epoch arithmetic in the grouping key), no UDFs, no extra shuffles
    beyond the group-by exchange plus AQE reads."""
    plan = plan_of(QUERIES["ch_dialect_stats_buckets"](spark, SF_DIR))
    assert "PythonUDF" not in plan
    # partial->final agg exchange plus the sum(DISTINCT) expand exchange —
    # both map-side-combined; nothing else may shuffle
    assert sum(l.strip().startswith("(") and "Exchange" in l for l in plan.splitlines()) <= 3


def test_chunk_documents_zero_shuffle(spark):
    """pipeline_chunk_documents: scan → project → Generate, one stage —
    no Exchange of any kind (chunking is embarrassingly parallel)."""
    plan = plan_of(QUERIES["pipeline_chunk_documents"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "Generate" in plan  # the posexplode
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_window_funnel_single_shuffle_no_join(spark):
    """ch_dialect_window_funnel: ONE hash exchange (the user_id groupBy);
    the chain fold is a post-aggregation expression — no join, no window,
    no Python."""
    plan = plan_of(QUERIES["ch_dialect_window_funnel"](spark, SF_DIR))
    n_exchanges = sum(
        1 for l in plan.splitlines()
        if l.startswith("(") and "Exchange" in l and "Broadcast" not in l
    )
    assert n_exchanges == 1, plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sequence_match_single_shuffle_no_join(spark):
    plan = plan_of(QUERIES["ch_dialect_sequence_match"](spark, SF_DIR))
    n_exchanges = sum(
        1 for l in plan.splitlines()
        if l.startswith("(") and "Exchange" in l and "Broadcast" not in l
    )
    assert n_exchanges == 1, plan
    assert "Join" not in plan


def test_final_rewrite_single_window_shuffle(spark):
    """ch_dialect_final: the merge-on-read survivor is one window over the
    sorting key, then the grouped aggregate — two hash exchanges total,
    no join."""
    plan = plan_of(QUERIES["ch_dialect_final"](spark, SF_DIR))
    n_exchanges = sum(
        1 for l in plan.splitlines()
        if l.startswith("(") and "Exchange" in l and "Broadcast" not in l
    )
    assert n_exchanges <= 2, plan
    assert "Window" in plan and "Join" not in plan


def test_funnel_increase_two_aggregates_no_join(spark):
    """ch_dialect_funnel_increase: the (user_id, ts) dedup groupBy feeds
    the user_id fold groupBy — at most two hash exchanges, both
    partial-aggregated map-side; no join, no Python."""
    plan = plan_of(QUERIES["ch_dialect_funnel_increase"](spark, SF_DIR))
    n_exchanges = sum(
        1 for l in plan.splitlines()
        if l.startswith("(") and "Exchange" in l and "Broadcast" not in l
    )
    assert n_exchanges <= 2, plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sequence_timed_single_shuffle_no_join(spark):
    """ch_dialect_sequence_timed: gap markers are expressions inside the
    same single-groupBy fold — ONE hash exchange, no join, no Python."""
    plan = plan_of(QUERIES["ch_dialect_sequence_timed"](spark, SF_DIR))
    n_exchanges = sum(
        1 for l in plan.splitlines()
        if l.startswith("(") and "Exchange" in l and "Broadcast" not in l
    )
    assert n_exchanges == 1, plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_right_any_join_one_window_one_join_key(spark):
    """ch_dialect_right_any_join: left survivor = one window over user_id
    then the RIGHT join on the same key — both sides hash-partition on
    user_id once; no extra exchanges beyond window + join, no Python."""
    plan = plan_of(QUERIES["ch_dialect_right_any_join"](spark, SF_DIR))
    assert "Window" in plan
    n_exchanges = sum(
        1 for l in plan.splitlines()
        if l.startswith("(") and "Exchange" in l and "Broadcast" not in l
    )
    assert n_exchanges <= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sum_map_single_aggregate_no_join(spark):
    """ch_dialect_sum_map: the map_zip_with fold lives inside ONE grouped
    aggregate — a single hash exchange, no join, no Python."""
    plan = plan_of(QUERIES["ch_dialect_sum_map"](spark, SF_DIR))
    n_exchanges = sum(
        1 for l in plan.splitlines()
        if l.startswith("(") and "Exchange" in l and "Broadcast" not in l
    )
    assert n_exchanges == 1, plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_text_funcs_zero_shuffle(spark):
    """ch_dialect_text_funcs: pure map-side projection — no exchange of
    any kind, no Python."""
    plan = plan_of(QUERIES["ch_dialect_text_funcs"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_asof_translation_partitions_on_keys(spark):
    """ch_dialect_asof_join: the union+last() carry windows on user_id and
    the join-back keys on user_id too — hash exchanges only on the join
    key family, no Python, no cartesian."""
    plan = plan_of(QUERIES["ch_dialect_asof_join"](spark, SF_DIR))
    assert "Window" in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_url_readable_single_shuffle_no_join(spark):
    """ch_dialect_url_readable: one groupBy(lang) hash exchange carries
    every aggregate (count/sum/max/min/collect_list) in a single pass;
    the URL/format/readable scalar work is post-aggregation projection —
    no join, and the only Python is the single ArrowEvalPython batch the
    r9 formatReadableTimeDelta columns ride (over 5 aggregated rows)."""
    plan = plan_of(QUERIES["ch_dialect_url_readable"](spark, SF_DIR))
    n_exchanges = sum(
        1 for l in plan.splitlines()
        if l.startswith("(") and "Exchange" in l and "Broadcast" not in l
    )
    assert n_exchanges == 1, plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("+- ArrowEvalPython") == 1


def test_dialect_agg_combinator_queries_single_shuffle(spark):
    """The three post-r7 dialect driver queries are each one grouped
    aggregation: exactly one non-broadcast Exchange for the GROUP BY
    (plus reused subquery exchanges for agg_combinators' two scalar
    subqueries over the same empty filter), partial aggregation
    map-side, and NO Python UDF — every fold (Euclid gcd, entropy,
    sweep-line maxIntersections, topKWeighted) is a JVM-side
    higher-order expression."""
    for name, max_exchanges in (
        ("ch_dialect_math_entropy", 1),
        ("ch_dialect_net_moments", 1),
        # countDistinctIf forces the two-phase distinct plan (2 exchanges
        # on the grouping key — no extra at scale, same key both times);
        # the two uncorrelated scalar subqueries add one single-partition
        # exchange each over a near-empty filtered input
        ("ch_dialect_agg_combinators", 4),
        # QUALIFY rewrite: one user_id exchange feeding a Window + filter
        ("ch_dialect_qualify", 1),
    ):
        plan = plan_of(QUERIES[name](spark, SF_DIR))
        shuffles = sum(
            1 for l in plan.splitlines()
            if l.startswith("(") and "Exchange" in l and "Broadcast" not in l
        )
        assert shuffles <= max_exchanges, (name, shuffles, plan)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan, name
        if name != "ch_dialect_qualify":
            assert plan.count("HashAggregate") >= 2, name  # partial + final
        else:
            assert "Window" in plan and "Filter" in plan, name


def test_exact_substring_dedup_scale_shape(spark):
    """Grams must shuffle as hashes only, both aggregates partial map-side,
    and the whole pipeline stays JVM-side (no Python UDFs)."""
    plan = plan_of(QUERIES["dedup_exact_substring"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # partial + final for both the gram-hash groupBy and the per-doc groupBy
    assert plan.count("HashAggregate") >= 4
    # bounded exchange count: 2 shuffles + broadcast/reuse, never more
    assert plan.count("Exchange") <= 8


def test_string_udfs_single_arrow_pass(spark):
    """The Arrow-UDF scalar tier must ride ONE vectorized ArrowEvalPython
    over a plain scan — no shuffle, no join, no row-at-a-time
    BatchEvalPython."""
    plan = plan_of(QUERIES["ch_dialect_string_udfs"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    # exactly one node in the tree ("+- ArrowEvalPython (n)"); the node id
    # repeats once in the formatted detail section
    assert plan.count("+- ArrowEvalPython") == 1
    assert "Exchange" not in plan and "Join" not in plan


def test_hash_family_single_arrow_pass(spark):
    """ch_dialect_hash_family: all 9 hash scalars must ride ONE
    ArrowEvalPython batch over the 10-group distinct — one shuffle
    (the DISTINCT), no joins, no row-at-a-time BatchEvalPython."""
    plan = plan_of(QUERIES["ch_dialect_hash_family"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert plan.count("+- ArrowEvalPython") == 1
    assert "Join" not in plan
    # the DISTINCT aggregate is the only exchange besides the ORDER BY
    assert plan.count("+- Exchange") <= 2


def test_srp_near_dup_scale_shape(spark):
    """dedup_embedding_srp: the band self-join must be an EQUI-join on
    the narrow (band, bucket) key — never a cartesian product — with
    zero Python anywhere (integer hyperplane projections are pure
    codegen)."""
    plan = plan_of(QUERIES["dedup_embedding_srp"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_siphash_keyed_single_arrow_pass(spark):
    """ch_dialect_siphash_keyed: all five keyed/official SipHash columns
    must ride ONE ArrowEvalPython batch over the 10-group distinct —
    one shuffle (the DISTINCT), no joins, no BatchEvalPython."""
    plan = plan_of(QUERIES["ch_dialect_siphash_keyed"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert plan.count("+- ArrowEvalPython") == 1
    assert "Join" not in plan
    assert plan.count("+- Exchange") <= 2


def test_r9_dialect_plan_shapes(spark):
    """r9 additions hold their scale shapes: the pure-JVM queries carry
    ZERO Python (pointInPolygon ray-cast, arraySplit folds, assoc2
    entropy/Bergsma folds, window-form time-decay); the Arrow-backed
    ones ride exactly ONE vectorized ArrowEvalPython; nothing ever
    falls back to row-at-a-time BatchEvalPython or a cartesian
    product; exchange counts stay bounded (distinct + order only)."""
    jvm_only = {
        "ch_dialect_pip": 2,          # distinct + order
        "ch_dialect_array_split": 2,
        "ch_dialect_decay_window": 2,
        "ch_dialect_tuple_arith": 2,  # distinct + order
    }
    one_arrow = {
        "ch_dialect_assoc2": 1,       # one grouped shuffle; the late-r9
                                      # analysisOfVariance column rides
                                      # ONE ch_anova Arrow batch
        "ch_dialect_ngram": 3,
        "ch_dialect_idna": 2,
        "ch_dialect_auc": 1,          # the ORDER BY only
    }
    for name, max_exch in {**jvm_only, **one_arrow}.items():
        plan = plan_of(QUERIES[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert plan.count("+- Exchange") <= max_exch, (
            name, plan.count("+- Exchange"))
        expected_arrow = 1 if name in one_arrow else 0
        assert plan.count("+- ArrowEvalPython") == expected_arrow, name
    # same partition/order -> Spark evaluates ALL four decay frame
    # expressions in ONE Window node (detail lines "(n) Window")
    plan = plan_of(QUERIES["ch_dialect_decay_window"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Window\n", plan)) == 1


def test_r10_dialect_plan_shapes(spark):
    """r10 additions hold their scale shapes: sumMapWithOverflow is a
    pure-JVM higher-order fold (ZERO Python); the KS test and LTTB ride
    exactly ONE Arrow batch over per-group pair arrays; geohashesInBox
    is one Arrow projection over the 10-row distinct; the CCNet bucket
    split carries no Python at all (LM + ntile are all JVM).  Nothing
    falls back to BatchEvalPython or a cartesian product."""
    jvm_only = {
        "ch_dialect_summap_overflow": 2,   # grouped agg + implicit sort
        "pipeline_ccnet_buckets": 8,       # LM joins + window + final agg
    }
    one_arrow = {
        "ch_dialect_kstest": 3,            # grouped agg + count join
        "ch_dialect_lttb": 2,              # grouped agg (+ sort)
        "ch_dialect_geo_cells": 2,         # distinct + order
    }
    for name, max_exch in {**jvm_only, **one_arrow}.items():
        plan = plan_of(QUERIES[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert plan.count("+- Exchange") <= max_exch, (
            name, plan.count("+- Exchange"))
        expected_arrow = 1 if name in one_arrow else 0
        assert plan.count("+- ArrowEvalPython") == expected_arrow, name


def test_r11_dialect_plan_shapes(spark):
    """r11 additions hold their scale shapes: ch_dialect_hash_closures
    rides exactly ONE ArrowEvalPython (Spark coalesces all three KS
    folds — exact ×2 + auto — into a single Arrow batch; wyHash64 and
    the hull are constants after translate-time folding) over one
    window + one grouped agg; pipeline_full_curation is ZERO-Python
    end-to-end (gates, MinHash banding, Knuth split, chunk math — all
    JVM), its near-dup drop set joins as a broadcast, the oracle's
    staged md5-dedup stage is provably SUBSUMED by the pair drop rule
    (no full-corpus window shuffle — the query docstring carries the
    equivalence argument), and nothing falls back to BatchEvalPython
    or a cartesian product."""
    plan = plan_of(QUERIES["ch_dialect_hash_closures"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("+- ArrowEvalPython") == 1
    assert plan.count("+- Exchange") <= 2
    plan = plan_of(QUERIES["pipeline_full_curation"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("+- ArrowEvalPython") == 0
    assert "BroadcastHashJoin" in plan          # the anti-join drop set
    assert plan.count("+- Exchange") <= 11      # MinHash banding chain
    assert "Window" not in plan                 # md5 dedup fused away


def test_curation_persist_gated_seam_identical(spark):
    """The production checkpoint seam (r11 VERDICT order #6, now code):
    ``pipeline_full_curation(persist_gated=True)`` materializes the
    gated subtree once between the pair-mining and keep branches —
    results must be IDENTICAL row-for-row to the default path (pure
    caching, zero semantic change), and the default path keeps its
    pinned plan (no Python, no Window, broadcast drop set — asserted by
    test_r11_dialect_plan_shapes, unchanged)."""
    from clickhouse_sinker_spark.plans.queries import pipeline_full_curation

    base = pipeline_full_curation(spark, SF_DIR)
    seamed = pipeline_full_curation(spark, SF_DIR, persist_gated=True)
    assert not hasattr(base, "gated_handle")  # default path: no cache
    try:
        rows_a = sorted(map(tuple, base.collect()))
        rows_b = sorted(map(tuple, seamed.collect()))
    finally:
        # cache ownership: the caller releases via the attached handle
        # (a repeated-call production loop must not leak cached corpus
        # partitions — r12 self-review)
        handle = seamed.gated_handle
        assert handle.storageLevel.useMemory  # it really was cached
        handle.unpersist(blocking=True)
        assert not handle.storageLevel.useMemory  # and really released
    assert rows_a == rows_b and rows_a


def test_crc_single_arrow_pass(spark):
    """ch_dialect_checksums: CRC32IEEE + CRC64 + both xxh3 forms +
    native crc32 must ride ONE ArrowEvalPython batch over the 10-group
    distinct (the native crc32 stays JVM-side) — one shuffle, no joins,
    no BatchEvalPython."""
    plan = plan_of(QUERIES["ch_dialect_checksums"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert plan.count("+- ArrowEvalPython") == 1
    assert "Join" not in plan
    assert plan.count("+- Exchange") <= 2


def test_bigram_lm_scale_shape(spark):
    """text_bigram_lm_score: model training and scoring must be pure
    JVM (zero Python), all joins equi-joins on the narrow (w1[, w2])
    model keys — never cartesian — and the token explosion must not
    re-shuffle the corpus more than the three hash aggregations +
    two scoring joins need."""
    plan = plan_of(QUERIES["text_bigram_lm_score"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_lang_drift_scale_shape(spark):
    """corpus_lang_drift: the pair expansion must self-join the
    VOCAB-sized fixed-point frequency table on the term key (equi-join,
    never cartesian), slice totals must broadcast, and everything is
    pure JVM integer arithmetic."""
    plan = plan_of(QUERIES["corpus_lang_drift"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_train_val_split_scale_shape(spark):
    """pipeline_train_val_split: fingerprinting is map-side, the audit
    and rollup are hash aggs, the 1-row leak count broadcasts — pure
    JVM, no cartesian wider than the broadcast scalar."""
    plan = plan_of(QUERIES["pipeline_train_val_split"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_chunk_windows_scale_shape(spark):
    """pipeline_chunk_windows: sequence+slice chunk generation is pure
    JVM with zero joins and zero pre-sort shuffles (the ORDER BY is the
    only exchange)."""
    plan = plan_of(QUERIES["pipeline_chunk_windows"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("+- Exchange") <= 1


def test_ivf_recall_scale_shape(spark):
    """knn_ivf_recall: both component shapes survive composition — no
    cartesian product wider than the broadcast query side, zero Python,
    and the report join touches only result rows."""
    plan = plan_of(QUERIES["knn_ivf_recall"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_datasheet_scale_shape(spark):
    """corpus_datasheet: map-side fingerprint/token projection, one
    source rollup, a sources×langs-sized top-1 window, and a join no
    wider than the source key — pure JVM."""
    plan = plan_of(QUERIES["corpus_datasheet"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_search_plan_shape(spark):
    """ivfpq_search scale shape: the probe join is a BROADCAST hash join
    on cluster (the LUT side is tiny — that join IS the nprobe cell
    pruning), no cartesian product, no Python, and the only wide
    shuffle is the per-query top-k window."""
    from pyspark.sql import functions as F

    from clickhouse_sinker_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_search,
        ivfpq_train,
        kmeans_lloyd,
    )
    from clickhouse_sinker_spark.sources.tables import load_table

    em = load_table(spark, SF_DIR, "embeddings")
    _, cents, _ = kmeans_lloyd(em, "embedding", "vec_id", k=4, iters=1)
    cb = ivfpq_train(em, "embedding", "vec_id", cents, m=4, k=4, iters=1)
    codes = ivfpq_encode(em, "embedding", "vec_id", cents, cb)
    queries = em.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("vec"))
    out = ivfpq_search(codes, queries, cents, cb, k=5, nprobe=2)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan


def test_r13_registered_query_plan_shapes(spark):
    """r12 VERDICT order #3: plan-pin the two queries registered in the
    r13 rotation — keeps the registered shapes honest at 100x the way
    ``pipeline_full_curation``'s pins do.

    ``ivfpq_topk``: the nprobe cell pruning IS a BroadcastHashJoin on
    ``cluster`` (codebooks/LUTs are control-plane tiny), the only wide
    shuffle is the per-query top-k window, nothing cartesian, zero
    Python — ADC distance is m array lookups in JVM expressions.

    ``pipeline_pack_bpe``: the trained merge table is an 8-row
    control-plane collect BEFORE this plan, so the returned plan is
    pure JVM (the encode replay chain is built-in expressions — zero
    Arrow/Batch Python), with exactly the running-sum Window
    partitioned by ``source`` (one Exchange feeding it) and no
    row-UDF anywhere."""
    plan = plan_of(QUERIES["ivfpq_topk"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan
    # the per-query top-k window is the ONLY wide shuffle
    assert plan.count("+- Exchange") == 1, plan
    assert "Arguments: hashpartitioning(query_id" in plan, plan

    plan = plan_of(QUERIES["pipeline_pack_bpe"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "Join" not in plan
    assert "Window" in plan
    # running-sum window keyed by source: its shuffle is the plan's only
    # (wide) exchange
    assert plan.count("+- Exchange") == 1, plan
    assert "Arguments: hashpartitioning(source" in plan, plan


def test_curation_persisted_context_manager_releases(spark):
    """r12 ADVICE: the attribute-carried ``gated_handle`` is lost the
    moment a caller composes on the result — ``curation_persisted``
    makes release STRUCTURAL.  The cache must be live inside the block
    (even after further transformations drop the attribute), identical
    in content to the default path, and released on exit — including
    the exception path."""
    from clickhouse_sinker_spark.plans.queries import (
        curation_persisted,
        pipeline_full_curation,
    )

    base = sorted(map(tuple, pipeline_full_curation(spark, SF_DIR).collect()))
    with curation_persisted(spark, SF_DIR) as df:
        composed = df.filter("n_docs >= 0")          # drops the attribute
        assert not hasattr(composed, "gated_handle")
        handle = df.gated_handle
        assert handle.storageLevel.useMemory
        assert sorted(map(tuple, composed.collect())) == base
    assert not handle.storageLevel.useMemory         # released on exit

    with pytest.raises(RuntimeError):
        with curation_persisted(spark, SF_DIR) as df:
            handle = df.gated_handle
            raise RuntimeError("caller blew up mid-block")
    assert not handle.storageLevel.useMemory         # released anyway
