"""Physical-plan contracts: the scale properties PLANS.md documents are
asserted here so a regression (extra shuffle, unfused UDFs, lost
pushdown) fails tests instead of surfacing at 100 TB."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from cassandra_data_migrator_spark import plans
from cassandra_data_migrator_spark.functions.hashing import bucket_expr
from cassandra_data_migrator_spark.functions.udfs import extract_text, normalize_lang
from cassandra_data_migrator_spark.operators.similarity import cosine_topk
from cassandra_data_migrator_spark.sources.event_log import write_event_log
from cassandra_data_migrator_spark.sources.synthetic import gen_change_events


def _log(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "log")
    write_event_log(gen_change_events(spark, 50, 200), path, n_chunks=2)
    return spark.read.parquet(path)


def test_adjacent_pandas_udfs_fuse_into_one_arrow_node(spark, tmpdir_path):
    df = _log(spark, tmpdir_path) \
        .withColumn("text", extract_text(F.col("html"))) \
        .withColumn("lang", normalize_lang(F.col("lang")))
    assert plans.python_eval_nodes(df) == 1


def test_validity_filter_pushed_to_scan(spark, tmpdir_path):
    df = _log(spark, tmpdir_path).filter(F.col("url").isNotNull())
    pushed = plans.pushed_filters(df)
    assert any("IsNotNull(url)" in p for p in pushed)


def test_merge_shape_is_single_shuffle(spark, tmpdir_path):
    """The LWW merge's core claim: clustering by _bucket once serves both
    the (bucket, key) window and the bucketed write — exactly ONE
    exchange in the plan (Spark's ClusteredDistribution subset rule).
    Guards the rework documented in PLANS.md against Spark upgrades."""
    df = _log(spark, tmpdir_path).withColumn("_b", bucket_expr("url", 16))
    ranked = (
        df.repartition(8, F.col("_b"))
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("_b", "url")
            .orderBy(F.col("warc_ts").desc(), F.col("seq").desc())))
        .filter(F.col("_rn") == 1)
    )
    assert plans.count_exchanges(ranked) == 1
    assert plans.has_window_group_limit(ranked)


def test_topk_uses_window_group_limit(spark, tmpdir_path):
    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 7).cast("float")
                  for i in range(4)]).alias("embedding"))
    out = cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=2)
    assert plans.has_window_group_limit(out)


def test_candidate_bounded_jaccard_has_no_shingle_selfjoin(spark):
    """With LSH candidates supplied, the exact-Jaccard verify must be
    bounded by them: the plan may join on (id, shingle) keys but NEVER
    run the inverted-index self-join on shingle alone (quadratic in
    stop-shingle frequency — the r1 scale-killer)."""
    import re

    from cassandra_data_migrator_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "x y z")], "doc_id long, text string")
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = D.jaccard_pairs(docs, "doc_id", "text", candidates=cand)
    plan = plans.explain_str(out, "simple")
    join_keys = re.findall(
        r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\w*\s*"
        r"(?:\w+\s+)?\[([^\]]*)\]", plan)
    for keys in join_keys:
        names = {k.strip().split("#")[0] for k in keys.split(",") if k.strip()}
        assert names != {"shingle"}, plan


def test_scan_prunes_columns(spark, tmpdir_path):
    df = _log(spark, tmpdir_path).select("url")
    plan = plans.explain_str(df, "formatted")
    assert "html" not in plan.split("ReadSchema:")[1].split("\n")[0]


def test_ivf_candidate_join_is_broadcast_equi(spark):
    """IVF candidates come from a broadcast equi-join on the cell key —
    never a cartesian/nested-loop product, never Python, and the corpus
    side carries no per-row driver interaction (the centroid matrix is
    plan literals)."""
    from pyspark.sql import functions as F

    from cassandra_data_migrator_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + d) % 5) for d in range(4)]) for i in range(40)],
        "vec_id long, embedding array<float>")
    cents = S.ivf_centroids(emb, 4)
    out = S.ivf_ann_topk(emb, emb.filter(F.col("vec_id") < 3), cents,
                         k=3, nprobe=2)
    plan = plans.explain_str(out, "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan and \
        "BroadcastNestedLoopJoin" not in plan, plan
    assert "Python" not in plan, plan


def test_counter_watermark_tail_filter_pushed_to_scan(spark, tmpdir_path):
    """The counter SEQ high-watermark's grown-log tail filter
    (``merge_counter_batch(watermark=True)`` re-run) must reach the
    event-log parquet scan as a pushed GreaterThan — the incremental
    apply's whole point is scanning only the tail's row groups."""
    from cassandra_data_migrator_spark.lake.table import (
        watermark_tail_predicate,
    )

    df = _log(spark, tmpdir_path).filter(watermark_tail_predicate("seq", 25))
    pushed = plans.pushed_filters(df)
    assert any("GreaterThan(seq,25)" in p for p in pushed), pushed


def test_online_dedup_anti_join_broadcasts_drop_set(spark):
    """online_dedup_keep's terminal is the same byte-priced broadcast
    anti-join as the batch survivor terminal: the corpus payload never
    shuffles — only the thin melted-bands frames do."""
    from cassandra_data_migrator_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, ("same text " * 10) if i < 6 else f"unique {i} " * 10)
         for i in range(20)],
        "doc_id long, text string")
    kept = D.online_dedup_keep(docs, "doc_id", "text")
    plan = plans.explain_str(kept, "simple")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_survivor_anti_join_broadcasts_bounded_drop_set(spark):
    """The dedup survivor anti-join must broadcast the (bounded)
    non-survivor id set — the corpus payload columns never shuffle on
    the dedup terminal step. Checkpoint-backed drop frames have no size
    stats, so the operator makes the broadcast explicit from the count
    it already materialized."""
    from cassandra_data_migrator_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, ("same text " * 10) if i < 6 else f"unique {i} " * 10)
         for i in range(20)],
        "doc_id long, text string")
    pairs = D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5)
    kept = D.survivor_keep_list(docs, pairs, "doc_id")
    plan = plans.explain_str(kept, "simple")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # the corpus leg feeds the anti-join straight from the scan —
    # no Exchange between the docs relation and the join
    assert "SortMergeJoin" not in plan, plan
