"""Warehouse (DFS-command parity) + explain-audit tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from go_dfs_mapreduce_spark.plans import audit_plan
from go_dfs_mapreduce_spark.sources import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def test_store_retrieve_text_roundtrip(wh, tmp_path):
    src = tmp_path / "hello.txt"
    content = "line one\nline two\nsparkling line three\n"
    src.write_text(content)
    wh.store(str(src))
    out = tmp_path / "out.txt"
    wh.retrieve("hello.txt", str(out))
    assert out.read_text() == content


def test_store_rejects_duplicates(wh, tmp_path):
    src = tmp_path / "a.txt"
    src.write_text("x\n")
    wh.store(str(src))
    with pytest.raises(FileExistsError, match="already stored"):
        wh.store(str(src))


def test_retrieve_no_clobber(wh, tmp_path):
    src = tmp_path / "b.txt"
    src.write_text("y\n")
    wh.store(str(src))
    out = tmp_path / "exists.txt"
    out.write_text("do not overwrite")
    with pytest.raises(FileExistsError):
        wh.retrieve("b.txt", str(out))
    assert out.read_text() == "do not overwrite"


def test_binary_store_roundtrip(wh, tmp_path):
    src = tmp_path / "blob.bin"
    payload = bytes(range(256)) * 4
    src.write_bytes(payload)
    wh.store(str(src))
    entries = {e["name"]: e for e in wh.ls()}
    assert entries["blob.bin"]["type"] == "BIN"
    out = tmp_path / "blob.out"
    wh.retrieve("blob.bin", str(out))
    assert out.read_bytes() == payload


def test_delete_and_ls(wh, tmp_path):
    src = tmp_path / "c.txt"
    src.write_text("z\n")
    wh.store(str(src))
    assert [e["name"] for e in wh.ls()] == ["c.txt"]
    assert wh.ls(verbose=True)[0]["n_parts"] >= 1
    wh.delete("c.txt")
    assert wh.ls() == []
    with pytest.raises(FileNotFoundError):
        wh.delete("c.txt")


def test_activity_reports(wh):
    act = wh.activity()
    assert act["default_parallelism"] >= 1
    assert act["stored_files"] == 0


# --- plan audits ----------------------------------------------------------


def test_q1_pushdown_and_pruning(spark, sf_dir):
    from go_dfs_mapreduce_spark.operators.relational import q1_pricing_summary

    a = audit_plan(q1_pricing_summary(spark, sf_dir))
    assert a["pushed_filters"], "shipdate filter must reach the parquet scan"
    assert "l_orderkey" not in a["read_columns"], "column pruning failed"
    assert not a["has_python_worker"], "q1 must stay JVM-side"


def test_q3_broadcasts_dims(spark, sf_dir):
    from go_dfs_mapreduce_spark.operators.relational import q3_shipping_priority

    a = audit_plan(q3_shipping_priority(spark, sf_dir))
    assert a["n_broadcast_joins"] >= 2
    assert a["n_sortmerge_joins"] == 0


def test_wordcount_stays_jvm_side(spark, sf_dir):
    from go_dfs_mapreduce_spark.operators.wordcount import wordcount

    a = audit_plan(wordcount(spark, sf_dir))
    assert not a["has_python_worker"]


def test_mr_parity_layer_python_only_when_unlowered(spark, sf_dir):
    """The registered mr_wordcount query is fully lowered (FlatMapExpr +
    PerKeyIntSumFormat) — no Python worker in its plan. The Arrow plugin
    path still exists and still runs Python, but only when lowering is
    pinned off (the differential tests' baseline)."""
    from go_dfs_mapreduce_spark.mapreduce import MapReduceJob, plugins
    from go_dfs_mapreduce_spark.operators.mr_parity import (
        _documents_as_lines,
        mr_wordcount,
    )

    a = audit_plan(mr_wordcount(spark, sf_dir))
    assert not a["has_python_worker"]
    arrow = MapReduceJob(
        "t_plan_arrow",
        plugins.word_count_map,
        plugins.word_count_reduce,
        r=plugins.WORD_COUNT_R,
        lower=False,
    ).run(_documents_as_lines(spark, sf_dir))
    assert audit_plan(arrow)["has_python_worker"]

def test_dedup_minhash_stays_jvm_side(spark, sf_dir):
    """All hashing/banding is md5/conv expressions — no Python workers."""
    from go_dfs_mapreduce_spark.operators.dedup import dedup_minhash_lsh

    a = audit_plan(dedup_minhash_lsh(spark, sf_dir))
    assert not a["has_python_worker"]


def test_approx_count_distinct_tracks_exact(spark, sf_dir):
    """The at-scale sketch path (no cross-engine oracle exists for HLL):
    approx_count_distinct within 5% of the exact distinct count."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.functions.text import exploded_words
    from go_dfs_mapreduce_spark.tables import table

    words = exploded_words(table(spark, sf_dir, "documents"), "text")
    row = words.agg(
        F.countDistinct("word").alias("exact"),
        F.approx_count_distinct("word").alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= max(1, 0.05 * row.exact)


def test_store_retrieve_no_trailing_newline(wh, tmp_path):
    src = tmp_path / "nonl.txt"
    src.write_text("alpha\nbeta\ngamma")  # no trailing newline
    wh.store(str(src))
    out = tmp_path / "nonl_out.txt"
    wh.retrieve("nonl.txt", str(out))
    assert out.read_text() == "alpha\nbeta\ngamma"


def test_retrieve_orders_lines_across_parts(wh, tmp_path, spark):
    """Multi-part TXT tables must reassemble in original line order — the
    persisted line_number is the ordering key (ADVICE r1: parquet scans
    pack splits by size, not row order)."""
    lines = [f"line {i:04d}" for i in range(500)]
    src = tmp_path / "big.txt"
    src.write_text("\n".join(lines) + "\n")
    wh.store(str(src))
    # rewrite the stored table as many shuffled parts to simulate a
    # multi-chunk file whose scan order differs from write order
    import shutil

    d = wh._table_dir("big.txt")
    df = spark.read.parquet(d).orderBy(F.desc("line_number")).repartition(7)
    tmp_out = str(tmp_path / "rewrite")
    df.write.parquet(tmp_out)
    for f in list(os.listdir(d)):
        if f.endswith(".parquet") or f.startswith("part-"):
            os.remove(os.path.join(d, f))
    for f in os.listdir(tmp_out):
        if f.startswith("part-"):
            shutil.copy(os.path.join(tmp_out, f), os.path.join(d, f))
    out = tmp_path / "big_out.txt"
    wh.retrieve("big.txt", str(out))
    assert out.read_text() == "\n".join(lines) + "\n"


def test_info_reports_executors(wh):
    """info carries the reference's per-node fields (cn/dfs_actions.go:
    226-282): serving counts, busy epoch, capacity — per executor."""
    wh.spark.range(1000).selectExpr("sum(id)").collect()  # serve tasks
    report = wh.info()
    assert isinstance(report, list) and report
    for e in report:
        assert {"executor", "served_tasks", "busy_epoch_ms",
                "memory_max"} <= set(e)
        assert e["busy_epoch_ms"] >= 0 and e["memory_max"] > 0
    # the counts are live soft state, not placeholders
    assert any(e["served_tasks"] > 0 for e in report)


def test_q6_all_predicates_pushed(spark, sf_dir):
    from go_dfs_mapreduce_spark.operators.tpch_more import q6_forecast_revenue

    a = audit_plan(q6_forecast_revenue(spark, sf_dir))
    pushed = " ".join(a["pushed_filters"])
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, pushed
    # column pruning: the scan reads only what the query touches
    assert set(a["read_columns"]) == {
        "l_discount", "l_extendedprice", "l_quantity", "l_shipdate",
    }, a["read_columns"]
    assert not a["has_python_worker"]


def test_q7_dims_broadcast_no_sortmerge(spark, sf_dir):
    from go_dfs_mapreduce_spark.operators.tpch_more import q7_volume_shipping

    a = audit_plan(q7_volume_shipping(spark, sf_dir))
    assert a["n_broadcast_joins"] >= 4, a["n_broadcast_joins"]
    assert a["n_sortmerge_joins"] == 0
    assert not a["has_python_worker"]


def test_no_rowwise_python_in_any_registered_query(spark, sf_dir):
    """Repo-wide invariant: no registered query may contain a
    row-at-a-time Python UDF (BatchEvalPython), and Arrow-batched Python
    stages may appear only in the declared Python-path queries (MR parity
    layer, multimodal decoders, pandas UDF/UDAF showcases). Everything
    else must stay entirely JVM-side."""
    from go_dfs_mapreduce_spark import registry
    from go_dfs_mapreduce_spark.plans.audit import formatted_plan

    declared_python = {
        # mr_wordcount / mr_log_analyzer are deliberately ABSENT: their
        # map+reduce lowerings are fully native, and this audit now
        # guards that they stay that way.
        "multimodal_fake_features",
        "multimodal_image_dims",
        "multimodal_audio_meta",
        "multimodal_frame_sample",
        "multimodal_resize_nn",
        "multimodal_pixels_bmp",
        # round 10: the PNG (zlib + filters) and GIF (LZW) pixel
        # decoders and the WAV PCM sample decoder — Arrow decode stages
        # like the BMP twin
        "multimodal_pixels_png",
        "multimodal_pixels_gif",
        "multimodal_audio_pcm",
        # round 11: the baseline JPEG pixel decoder — the last format,
        # same Arrow decode-stage class as its BMP/PNG/GIF siblings
        "multimodal_pixels_jpeg",
        # round 12: the 4:2:0 color twin — same Arrow decode-stage class
        "multimodal_pixels_jpeg420",
        # round 12: the WHT audio-feature stage — same class
        "multimodal_audio_wht",
        # round 12 (late): the Y4M video decoder, the scene-cut
        # detector built on it, and the animated-GIF compositor —
        # same Arrow decode-stage class
        "multimodal_video_y4m",
        "multimodal_video_scene_cuts",
        "multimodal_gif_animation",
        "multimodal_audio_vad",
        "multimodal_image_phash_dedup",
        # round 13: MJPEG-AVI compressed-video decode, the cross-video
        # frame-dedup pair built on it, and the audio landmark
        # fingerprint extractor — same Arrow decode-stage class
        "multimodal_video_mjpeg",
        "multimodal_video_frame_dedup",
        "multimodal_video_frame_dedup_incremental",
        "multimodal_audio_fingerprint_dedup",
        "multimodal_video_keyframes",
        "multimodal_subtitle_srt",
        "multimodal_caption_alignment",
        "multimodal_audio_fingerprint_incremental",
        "multimodal_jpeg_metadata",
        # the stored twin: envelope-walk + metadata decode over go_dfs_bin
        # chunk rows (the chunk scan itself is also a Python DataSource)
        "multimodal_jpeg_metadata_stored",
        # round 12: int8 stage 1 became the declared map-side partial
        # top-R Arrow kernel (the ann_cosine_batch_fast shape, r11
        # verdict #8); the quantized recall audit composes it
        "ann_int8_rerank_topk",
        "ann_quantized_recall_audit",
        "udf_price_tier",
        "udaf_customer_stats",
        "udtf_first_tokens",
        # round 9: the winnowing production twin's rolling-polynomial
        # numpy kernel is the documented deliberate UDF exception
        "winnow_candidate_pairs_fast",
        # round 10: the token-bucket rate limiter's batch twin shares
        # the streaming kernel via applyInPandas (clamped-counter
        # recursion — no window identity exists; the declared exception)
        "events_rate_limit",
    }
    qs, _ = registry.collect()
    offenders, python_leaks = [], []
    for name, fn in qs.items():
        plan = formatted_plan(fn(spark, sf_dir))
        # scalar row-at-a-time Python UDFs are banned outright; a Python
        # UDTF node (BatchEvalPythonUDTF) is a different operator class —
        # it is allowed only as a DECLARED surface like the Arrow stages
        scalar_python = "BatchEvalPython" in plan.replace(
            "BatchEvalPythonUDTF", ""
        )
        if scalar_python:
            offenders.append(name)
        has_declared_class = any(
            tok in plan
            for tok in (
                "ArrowEvalPython",
                "MapInPandas",
                "FlatMapGroupsInPandas",
                "BatchEvalPythonUDTF",
            )
        )
        if has_declared_class and name not in declared_python:
            python_leaks.append(name)
    assert not offenders, f"row-at-a-time Python UDFs in: {offenders}"
    assert not python_leaks, f"undeclared Python stages in: {python_leaks}"


# -- partitioned sinks / incremental reload / compaction --------------------


def test_partitioned_store_prunes_and_overwrites(wh, spark, sf_dir):
    from pyspark.sql import functions as F

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "user_id", "event_type"
    )
    wh.store_df(events, "events_part", partition_by=["event_type"])
    types = [r.event_type for r in events.select("event_type").distinct().collect()]
    t0 = sorted(types)[0]

    # partition pruning: a filter on the partition column must reduce the
    # files read to that partition's directory
    read = wh.read("events_part")
    pruned = read.where(F.col("event_type") == t0)
    touched = [
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    assert touched and all(f"event_type={t0}" in f for f in touched)

    # dynamic partition overwrite: replace ONLY partition t0
    replacement = events.where(F.col("event_type") == t0).withColumn(
        "user_id", F.lit(-1).cast("long")
    )
    wh.overwrite_partitions(replacement, "events_part")
    after = wh.read("events_part")
    assert after.where(F.col("event_type") == t0).where(
        F.col("user_id") != -1
    ).count() == 0
    untouched = after.where(F.col("event_type") != t0)
    expect = events.where(F.col("event_type") != t0)
    assert untouched.count() == expect.count() > 0
    assert untouched.where(F.col("user_id") == -1).count() == 0


def test_compact_preserves_rows_and_layout(wh, spark, sf_dir):
    from pyspark.sql import functions as F

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "event_type"
    )
    # fragment: 8 files per partition dir
    wh.store_df(events.repartition(8), "frag", partition_by=["event_type"])
    before_files = sum(
        1
        for root, _, files in os.walk(wh._table_dir("frag"))
        for f in files
        if f.endswith(".parquet")
    )
    n_parts = events.select("event_type").distinct().count()
    assert before_files > n_parts

    n_after = wh.compact("frag", target_files=1)
    assert n_after == n_parts  # one file per partition dir
    assert wh._partition_cols("frag") == ["event_type"]  # layout preserved
    got = wh.read("frag")
    assert got.count() == events.count()
    assert [r.event_type for r in got.select("event_type").distinct().collect()] != []


def test_schema_evolution_mergeschema(wh, spark):
    """Schema evolution on a stored table: a later write adds a column;
    mergeSchema reads the union schema with nulls for old files."""
    from pyspark.sql import functions as F

    base = spark.range(5).select(F.col("id").alias("k"), F.lit("v1").alias("a"))
    wh.store_df(base, "evolving")
    extended = spark.range(5, 8).select(
        F.col("id").alias("k"), F.lit("v2").alias("a"), F.lit(1.5).alias("b")
    )
    extended.write.mode("append").parquet(wh._table_dir("evolving"))

    merged = spark.read.option("mergeSchema", "true").parquet(
        wh._table_dir("evolving")
    )
    assert sorted(merged.columns) == ["a", "b", "k"]
    assert merged.count() == 8
    assert merged.where(F.col("b").isNull()).count() == 5


def test_clustered_store_gives_disjoint_file_ranges(wh, spark, sf_dir):
    """cluster_by range-partitions + sorts before writing, so parquet
    footers carry tight min/max ranges per file — the stats scans use to
    skip data. Verified directly from the footers with pyarrow."""
    import pyarrow.parquet as pq

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    wh.store_df(li, "li_clustered", cluster_by=["l_orderkey"], n_files=4)

    d = wh._table_dir("li_clustered")
    ranges = []
    for f in sorted(os.listdir(d)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(d, f)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # l_orderkey
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges  # disjoint (range partitioner boundaries)
    # and the table still reads back completely
    assert wh.read("li_clustered").count() == li.count()


def test_zorder_store_tightens_both_column_ranges(wh, spark, sf_dir):
    """zorder_by lays rows on a Morton curve: per-file footer min/max
    spans must be materially tighter than the global span on BOTH
    z-ordered columns — while a single-key cluster_by leaves the second
    column's per-file span at ~the full range (no skipping power)."""
    import pyarrow.parquet as pq

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )

    def spans(table_name, col_idx):
        d = wh._table_dir(table_name)
        file_spans, g_min, g_max = [], None, None
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            file_spans.append(max(maxs) - min(mins))
            g_min = min(mins) if g_min is None else min(g_min, min(mins))
            g_max = max(maxs) if g_max is None else max(g_max, max(maxs))
        global_span = (g_max - g_min) or 1
        return sum(file_spans) / len(file_spans) / global_span, len(file_spans)

    wh.store_df(li, "li_z", zorder_by=("l_orderkey", "l_suppkey"), n_files=16)
    wh.store_df(li, "li_1d", cluster_by=["l_orderkey"], n_files=16)

    z_ok_frac, n_z = spans("li_z", 0)
    z_sk_frac, _ = spans("li_z", 1)
    c_sk_frac, _ = spans("li_1d", 1)
    assert n_z >= 8
    # both dimensions tight under z-order ...
    assert z_ok_frac < 0.55, z_ok_frac
    assert z_sk_frac < 0.55, z_sk_frac
    # ... but the non-clustered dimension is useless under 1-D clustering
    assert c_sk_frac > 0.9, c_sk_frac
    assert wh.read("li_z").count() == li.count()


def test_binary_chunked_store_roundtrip(wh, tmp_path):
    """chunk_mib splits a BIN file into chunk rows (the reference's
    client-set chunk size); retrieve reassembles byte-exactly in
    chunk_idx order."""
    src = tmp_path / "big.bin"
    payload = bytes(range(256)) * 4096 * 5  # 5 MiB
    src.write_bytes(payload)
    wh.store(str(src), chunk_mib=1)
    chunks = wh.read("big.bin")
    assert chunks.count() == 5
    assert {r.chunk_idx for r in chunks.select("chunk_idx").collect()} == set(range(5))
    out = tmp_path / "big.out"
    wh.retrieve("big.bin", str(out))
    assert out.read_bytes() == payload


def test_text_chunked_store_makes_parts(wh, tmp_path, spark):
    src = tmp_path / "many.txt"
    lines = [f"line {i:06d} " + "x" * 100 for i in range(20000)]  # ~2 MiB
    src.write_text("\n".join(lines) + "\n")
    wh.store(str(src), chunk_mib=1)
    entry = [e for e in wh.ls(verbose=True) if e["name"] == "many.txt"][0]
    assert entry["n_parts"] >= 2
    out = tmp_path / "many.out"
    wh.retrieve("many.txt", str(out))
    assert out.read_text() == "\n".join(lines) + "\n"


def test_store_retrieve_edge_payloads(wh, tmp_path):
    """Boundary payloads round-trip byte-exactly: empty BIN, BIN sized
    exactly at a chunk boundary, and unicode TXT without trailing
    newline."""
    cases = {
        "empty.bin": b"",
        "boundary.bin": bytes(range(256)) * 4096,  # exactly 1 MiB
        "over.bin": bytes(range(256)) * 4096 + b"x",  # 1 MiB + 1
    }
    for name, payload in cases.items():
        src = tmp_path / name
        src.write_bytes(payload)
        wh.store(str(src), chunk_mib=1)
        out = tmp_path / (name + ".out")
        wh.retrieve(name, str(out))
        assert out.read_bytes() == payload, name
    # chunk counts: 0 rows for empty, 1 for exact boundary, 2 for +1
    assert wh.read("empty.bin").count() == 0
    assert wh.read("boundary.bin").count() == 1
    assert wh.read("over.bin").count() == 2

    src = tmp_path / "uni.txt"
    content = "café naïve\n中文 line\nlast no newline"
    src.write_text(content, encoding="utf-8")
    wh.store(str(src))
    out = tmp_path / "uni.out"
    wh.retrieve("uni.txt", str(out))
    assert out.read_text(encoding="utf-8") == content


def test_graph_family_plan_shapes(spark, sf_dir):
    """Graph operators stay JVM-side end-to-end; the link-prediction
    top-k is a distributed TakeOrderedAndProject (per-task heaps), and
    the skyline scan is pruned to exactly its three part columns."""
    from go_dfs_mapreduce_spark.operators.graph import (
        graph_common_neighbors_topk,
        graph_triangle_counts,
        pagerank_parts_2iter,
    )
    from go_dfs_mapreduce_spark.operators.stats import skyline_parts_2d

    for fn in (graph_triangle_counts, pagerank_parts_2iter):
        a = audit_plan(fn(spark, sf_dir))
        assert not a["has_python_worker"], fn.__name__

    a = audit_plan(graph_common_neighbors_topk(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "TakeOrderedAndProject" in a["plan"]
    # r16: the wedge self-join is a SHUFFLED-HASH join (no sort, no
    # per-probe match-buffer re-scan, per-partition build maps) — the
    # broadcast the planner picked unhinted shipped the WHOLE adjacency
    # map to every task and measured 13% slower (tools/cn_variants_r16.py)
    assert "ShuffledHashJoin Inner" in a["plan"]

    a = audit_plan(skyline_parts_2d(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_broadcast_joins"] >= 1
    assert set(a["read_columns"]) == {"p_partkey", "p_retailprice", "p_size"}


def test_round5_plan_contracts(spark, sf_dir):
    """Plan shapes round 5 established, pinned against regression:
    bigram_topk takes its global top-k with TakeOrderedAndProject
    (per-task heaps) instead of a vocabulary-sized single-partition
    window; the common-neighbors wedge count carries the packed-pair-key
    id-width guard in-plan; the incremental dedup and k-anonymity plans
    stay JVM-side with pruned scans."""
    from go_dfs_mapreduce_spark.operators.dedup import (
        dedup_incremental_new_docs,
    )
    from go_dfs_mapreduce_spark.operators.graph import (
        graph_common_neighbors_topk,
    )
    from go_dfs_mapreduce_spark.operators.llm_extras import bigram_topk
    from go_dfs_mapreduce_spark.operators.scrubbing import k_anonymity_audit

    a = audit_plan(bigram_topk(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "TakeOrderedAndProject" in a["plan"]

    a = audit_plan(graph_common_neighbors_topk(spark, sf_dir))
    assert "raise_error" in a["plan"]  # packed-key id-width guard

    a = audit_plan(dedup_incremental_new_docs(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_broadcast_joins"] >= 2  # threshold broadcasts, never collects

    a = audit_plan(k_anonymity_audit(spark, sf_dir))
    assert not a["has_python_worker"]
    assert set(a["read_columns"]) == {"event_type", "ts", "value"}


def test_round6_plan_contracts(spark, sf_dir):
    """Round-6 additions, pinned: BM25 is a scalar-broadcast scoring pass
    with a TakeOrderedAndProject top-k and zero corpus-sized joins; the
    unigram LM proxy broadcasts its vocabulary instead of shuffling the
    token stream twice; both stay fully JVM-side (no ln(), no Python)."""
    from go_dfs_mapreduce_spark.operators.retrieval import (
        bm25_search_topk,
        unigram_freq_scores,
    )

    a = audit_plan(bm25_search_topk(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "TakeOrderedAndProject" in a["plan"]
    # only the 1-row corpus-stats aggregate is joined back (nested-loop
    # broadcast of a single row) — no hash/sort-merge join of doc rows
    assert a["n_sortmerge_joins"] == 0
    assert set(a["read_columns"]) == {"doc_id", "text"}

    a = audit_plan(unigram_freq_scores(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_broadcast_joins"] >= 1  # vocab broadcast onto token stream
    assert a["n_sortmerge_joins"] == 0
    assert set(a["read_columns"]) == {"doc_id", "text"}

    from go_dfs_mapreduce_spark.operators.retrieval import (
        inverted_index_postings,
    )

    a = audit_plan(inverted_index_postings(spark, sf_dir))
    assert not a["has_python_worker"]
    assert set(a["read_columns"]) == {"doc_id", "text"}
    # round-7 skew fix: df comes from a partial-agg-friendly
    # groupBy(token).count() (map-side combine fires), and the head is a
    # salted two-phase top-k — two Window nodes, the first keyed on
    # (token, salt) so no single task ever sorts a full posting list
    assert "partial_count" in a["plan"]
    assert a["plan"].count("Window") >= 2
    assert "salt" in a["plan"]

    from go_dfs_mapreduce_spark.operators.similarity import (
        hard_negative_mining,
    )

    a = audit_plan(hard_negative_mining(spark, sf_dir))
    assert not a["has_python_worker"]
    # anchors and the positive-ceiling aggregate broadcast; the candidate
    # scan streams — no sort-merge join of embedding rows
    assert a["n_sortmerge_joins"] == 0


def test_dedup_survivor_quality_semantics(spark, sf_dir):
    """Exactly one survivor per cluster, and it is the member with the
    (rounded) max quality score, min doc_id on ties."""
    from go_dfs_mapreduce_spark.operators.dedup import dedup_survivor_quality

    rows = dedup_survivor_quality(spark, sf_dir).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert by_cluster
    for members in by_cluster.values():
        survivors = [r for r in members if r["is_survivor"]]
        assert len(survivors) == 1
        best = min(members, key=lambda r: (-r["quality_score"], r["doc_id"]))
        assert survivors[0]["doc_id"] == best["doc_id"]
        assert all(r["cluster_size"] == len(members) for r in members)


def test_round7_plan_contracts(spark, sf_dir):
    """Round-7 additions, pinned: the RAG chunk scorer is an in-row
    chunk generator + scalar-broadcast stats + TakeOrderedAndProject
    (no token explode, no corpus-sized join); the training shuffle
    ranks with the two-level offset decomposition (bounded rank windows
    over (shard, sub) plus a tiny broadcast offset table), never a
    whole-shard single-task window."""
    from go_dfs_mapreduce_spark.operators.retrieval import rag_chunk_topk
    from go_dfs_mapreduce_spark.operators.training_prep import (
        training_shuffle_shards,
    )

    a = audit_plan(rag_chunk_topk(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "TakeOrderedAndProject" in a["plan"]
    assert a["n_sortmerge_joins"] == 0
    assert set(a["read_columns"]) == {"doc_id", "text"}
    assert "Generate explode" not in a["plan"]  # chunks inline, no explode

    a = audit_plan(training_shuffle_shards(spark, sf_dir))
    assert not a["has_python_worker"]
    assert set(a["read_columns"]) == {"doc_id"}
    assert "partial_count" in a["plan"]  # offset counts combine map-side
    assert a["plan"].count("Window") >= 2  # offsets + rank-in-sub
    assert a["n_broadcast_joins"] >= 1  # offset table broadcasts


def test_batched_mining_matches_monolithic(spark, sf_dir):
    """The anchor-batched mining loop is row-identical to one monolithic
    invocation over the same anchors — the executable proof of the
    batching contract hard_negative_mining's docstring declares (the
    batched query's ORACLE covers 10 anchors in one SQL pass; this
    differential additionally pins the Spark-side union against the
    Spark-side monolith, batch boundaries chosen to split unevenly)."""
    from go_dfs_mapreduce_spark.operators.similarity import (
        _mine_hard_negatives,
    )

    mono = _mine_hard_negatives(spark, sf_dir, 0, 7)
    b = _mine_hard_negatives(spark, sf_dir, 0, 3).unionByName(
        _mine_hard_negatives(spark, sf_dir, 3, 7)
    )
    key = lambda r: (r["anchor_id"], r["rank"])
    assert sorted(mono.collect(), key=key) == sorted(b.collect(), key=key)


def test_round7_queue_plan_contracts(spark, sf_dir):
    """Round-7 queue additions: all JVM-side, partial-agg-friendly, with
    scans pruned to exactly the consumed columns."""
    from go_dfs_mapreduce_spark.operators.corpus_ops import (
        vocab_coverage_thresholds,
    )
    from go_dfs_mapreduce_spark.operators.textstats import (
        lang_id_confusion_matrix,
    )
    from go_dfs_mapreduce_spark.operators.training_prep import (
        embedding_dim_stats,
    )

    a = audit_plan(vocab_coverage_thresholds(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "partial_count" in a["plan"]  # vocab count combines map-side
    assert set(a["read_columns"]) == {"text"}

    # doc_id is pruned away: the composed lang_id_heuristic's per-doc id
    # never survives the aggregate, so the scan reads only (lang, text)
    a = audit_plan(lang_id_confusion_matrix(spark, sf_dir))
    assert not a["has_python_worker"]
    assert set(a["read_columns"]) == {"lang", "text"}

    a = audit_plan(embedding_dim_stats(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "partial_count" in a["plan"]  # dim moments combine map-side
    assert set(a["read_columns"]) == {"embedding"}


def test_round8_operator_plan_contracts(spark, sf_dir):
    """Plan pins for the round-8 operators: each stays JVM-side and keeps
    the structural property its docstring claims."""
    from go_dfs_mapreduce_spark.plans.audit import audit_plan

    # ann_lsh_topk: signatures in-row, query side broadcast, ranking via
    # the family's per-query window (partitioned by qid — never a global
    # single-partition sort), never a cartesian/sort-merge of vectors
    from go_dfs_mapreduce_spark.operators.similarity import ann_lsh_topk

    a = audit_plan(ann_lsh_topk(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "Window" in a["plan"]
    assert a["n_sortmerge_joins"] == 0
    assert a["n_broadcast_joins"] >= 2  # qsigs onto sigs; q onto candidates
    assert "CartesianProduct" not in a["plan"]
    assert "Exchange SinglePartition" not in a["plan"]

    # token_diversity_scores: one projection over the scan — no explode,
    # no aggregate exchange, no join
    from go_dfs_mapreduce_spark.operators.textstats import (
        token_diversity_scores,
    )

    a = audit_plan(token_diversity_scores(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_exchanges"] == 0
    assert "Generate" not in a["plan"]  # Spark's explode node
    assert set(a["read_columns"]) == {"doc_id", "text"}

    # doc_length_ks_drift: the corpus reaches one partial-aggregated
    # histogram groupBy; the scan reads only (source, n_chars)
    from go_dfs_mapreduce_spark.operators.corpus_ops import (
        chi_square_source_drift,
        doc_length_ks_drift,
    )

    a = audit_plan(doc_length_ks_drift(spark, sf_dir))
    assert not a["has_python_worker"]
    assert set(a["read_columns"]) == {"n_chars", "source"}
    assert "partial_count" in a["plan"]  # map-side combine on the histogram

    # chi_square_source_drift: same scan discipline; the only joins are
    # broadcasts of the bin/total scalars and the in-filled grid
    a = audit_plan(chi_square_source_drift(spark, sf_dir))
    assert not a["has_python_worker"]
    assert set(a["read_columns"]) == {"n_chars", "source"}
    assert a["n_sortmerge_joins"] == 0

    # capped jaccard (round-8 verify re-plan): the pair verify is a
    # COUNT aggregate, not a full-array re-intersection — the plan must
    # carry the pair-count partial aggregate and join only the narrow
    # sz / hot-array sides
    from go_dfs_mapreduce_spark.operators.dedup import (
        dedup_ngram_jaccard_capped,
    )

    a = audit_plan(dedup_ngram_jaccard_capped(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "partial_count" in a["plan"]

    # fuzzy levenshtein dedup: the blocking join is a true EQUI-join on
    # the prefix key (never a nested-loop/cartesian pair grid), the
    # length-gap prune rides the join, and the scan reads only
    # (doc_id, text)
    from go_dfs_mapreduce_spark.operators.dedup import (
        dedup_fuzzy_levenshtein,
    )

    a = audit_plan(dedup_fuzzy_levenshtein(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "CartesianProduct" not in a["plan"]
    assert "BroadcastNestedLoopJoin" not in a["plan"]
    assert set(a["read_columns"]) == {"doc_id", "text"}

    # bpe_merge_candidates: corpus positions collapse in the map-side
    # partial aggregate (alphabet^2-bounded shuffle), top-K is a
    # TakeOrderedAndProject, scan reads only text
    from go_dfs_mapreduce_spark.operators.textstats import (
        bpe_merge_candidates,
    )

    a = audit_plan(bpe_merge_candidates(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "partial_count" in a["plan"]
    assert "TakeOrderedAndProject" in a["plan"]
    assert set(a["read_columns"]) == {"text"}

    # events_user_zscore_anomalies: one user-partitioned window (no
    # global sort, no join), exact integer/decimal window aggregates,
    # scan reads only the four columns used
    from go_dfs_mapreduce_spark.operators.timeseries import (
        events_user_zscore_anomalies,
    )

    a = audit_plan(events_user_zscore_anomalies(spark, sf_dir))
    assert not a["has_python_worker"]
    # exactly one physical Window node (the formatted plan names each
    # node twice: once in the tree, once in the detail section)
    assert a["plan"].count(") Window") == 1
    assert "Exchange SinglePartition" not in a["plan"]
    assert "Join" not in a["plan"]
    assert set(a["read_columns"]) == {"event_id", "ts", "user_id", "value"}

    # bpe_train_merges: declarative 3-iteration loop — winners are
    # eagerly checkpointed 1-ROW frames (lineage cut so vocab frames can
    # unpersist), so the RETURNED plan is just the union of three
    # checkpointed scans; the fold crossJoin/broadcast structure runs in
    # the construction-time jobs and is pinned on the encode twin below,
    # whose returned plan still contains the lazily re-applied folds
    from go_dfs_mapreduce_spark.operators.textstats import bpe_train_merges

    a = audit_plan(bpe_train_merges(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_sortmerge_joins"] == 0
    # 3 checkpointed winners (formatted plans print each node twice:
    # tree + detail section)
    assert a["plan"].count("Scan ExistingRDD") == 6
    assert "Union" in a["plan"]
    assert "CartesianProduct" not in a["plan"]

    # bpe_encode_corpus: the returned plan re-applies the (literal,
    # checkpointed) winners to the vocab as BROADCAST nested-loop cross
    # joins (1-row broadcast per merge — no equi-key exists on a literal
    # cross), the doc join is an equi-join on the word, pair counts and
    # per-doc sums partial-aggregate, no python worker, pruned scan
    from go_dfs_mapreduce_spark.operators.textstats import bpe_encode_corpus

    a = audit_plan(bpe_encode_corpus(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["plan"].count("BroadcastNestedLoopJoin Cross BuildRight") >= 3
    assert "CartesianProduct" not in a["plan"]
    assert "Exchange SinglePartition" not in a["plan"]
    assert set(a["read_columns"]) == {"doc_id", "text"}

    # winnow_candidate_pairs: gram hashing + window minima are IN-ROW
    # (no Generate until the distinct-fingerprint explode), the pair
    # join is an equi-join on fp, shared counts partial-aggregate
    from go_dfs_mapreduce_spark.operators.dedup import (
        winnow_candidate_pairs,
    )

    a = audit_plan(winnow_candidate_pairs(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "CartesianProduct" not in a["plan"]
    assert "BroadcastNestedLoopJoin" not in a["plan"]
    assert "partial_count" in a["plan"]
    assert set(a["read_columns"]) == {"doc_id", "text"}

    # gopher_quality_rules: one codegen'd projection over the scan —
    # zero exchanges, no explode, 2-col read (the diversity contract)
    from go_dfs_mapreduce_spark.operators.textstats import (
        gopher_quality_rules,
    )

    a = audit_plan(gopher_quality_rules(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_exchanges"] == 0
    assert "Generate" not in a["plan"]
    assert set(a["read_columns"]) == {"doc_id", "text"}

    # heavy_hitters_cms_audit: the sketch build's keyspace is fixed at
    # DEPTH x WIDTH cells (map-side combine bounds the shuffle), the
    # probe joins the broadcast sketch, exact top-K is a
    # TakeOrderedAndProject
    from go_dfs_mapreduce_spark.operators.stats import (
        heavy_hitters_cms_audit,
    )

    a = audit_plan(heavy_hitters_cms_audit(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "partial_count" in a["plan"]
    assert "TakeOrderedAndProject" in a["plan"]
    assert a["n_broadcast_joins"] >= 1
    assert set(a["read_columns"]) == {"text"}

    # events_cusum_alarms: pure integer pipeline — user-partitioned
    # running windows only, no join, no python, 4-col scan
    from go_dfs_mapreduce_spark.operators.timeseries import (
        events_cusum_alarms,
    )

    a = audit_plan(events_cusum_alarms(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "Join" not in a["plan"]
    assert "Exchange SinglePartition" not in a["plan"]
    assert set(a["read_columns"]) == {"event_id", "ts", "user_id", "value"}


def test_round9_operator_plan_contracts(spark, sf_dir):
    """Plan pins for the round-9 operators: each keeps the structural
    property its docstring claims."""
    from go_dfs_mapreduce_spark.plans.audit import audit_plan

    # frequent_event_sequences: k-grams unfold IN-ROW after the per-user
    # path assembly; the count tops out in a TakeOrderedAndProject (never
    # a global sort of all k-grams); everything JVM-side; pruned scan
    from go_dfs_mapreduce_spark.operators.mining import (
        assoc_rules_copurchase,
        frequent_event_sequences,
    )

    a = audit_plan(frequent_event_sequences(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "TakeOrderedAndProject" in a["plan"]
    assert "partial_count" in a["plan"]  # map-side combine on k-grams
    assert set(a["read_columns"]) == {"event_id", "event_type", "ts", "user_id"}
    assert "CartesianProduct" not in a["plan"]

    # assoc_rules_copurchase: the basket self-join and the item-count
    # joins are EQUI-joins; the only cross is the broadcast 1-row scalar
    # frame; counts partial-aggregate; 2-column scan
    a = audit_plan(assoc_rules_copurchase(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "CartesianProduct" not in a["plan"]
    assert a["plan"].count("BroadcastNestedLoopJoin Cross BuildRight") >= 1
    assert "partial_count" in a["plan"]
    assert set(a["read_columns"]) == {"l_orderkey", "l_partkey"}
    assert "TakeOrderedAndProject" in a["plan"]
    # r16: the basket self-join is a SORT-MERGE join reusing the
    # basket-size window's ok-partitioned, ok-sorted layout — the
    # unhinted broadcast shipped the whole capped frame per task and
    # measured 14-22% slower (docstring A/B)
    assert "SortMergeJoin Inner" in a["plan"]

    # bigram_fluency_scores: bigrams unfold in-row, the doc join is an
    # equi-join on the bigram key, JVM-only, 2-column scan
    from go_dfs_mapreduce_spark.operators.textstats import (
        bigram_fluency_scores,
    )

    a = audit_plan(bigram_fluency_scores(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_sortmerge_joins"] + a["n_broadcast_joins"] + a[
        "plan"
    ].count("ShuffledHashJoin") >= 1
    assert "CartesianProduct" not in a["plan"]
    assert set(a["read_columns"]) == {"doc_id", "text"}

    # winnow_candidate_pairs_fast: the Arrow kernel IS the point (the
    # deliberate UDF exception) — python worker present, but the pair
    # tail stays the md5 twin's equi-join shape: no cartesian, no
    # single-partition exchange, 2-column scan
    from go_dfs_mapreduce_spark.operators.dedup import (
        winnow_candidate_pairs_fast,
    )

    a = audit_plan(winnow_candidate_pairs_fast(spark, sf_dir))
    assert a["has_python_worker"]
    assert "MapInPandas" in a["plan"]
    assert "CartesianProduct" not in a["plan"]
    assert "Exchange SinglePartition" not in a["plan"]
    assert set(a["read_columns"]) == {"doc_id", "text"}

    # multimodal_pixels_bmp: synth + decode are BOTH Arrow stages over a
    # doc_id-only scan; no joins, no extra exchanges beyond none at all
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_pixels_bmp,
    )

    a = audit_plan(multimodal_pixels_bmp(spark, sf_dir))
    assert a["plan"].count("MapInPandas") >= 2
    assert a["n_exchanges"] == 0
    assert "Join" not in a["plan"]
    assert set(a["read_columns"]) == {"doc_id"}

    # doc_pack_bins_bpe: the BPE accounting sub-plan feeds the same
    # per-shard cumulative window as the whitespace packer — Window
    # present, no cartesian beyond the 1-row merge broadcasts
    from go_dfs_mapreduce_spark.operators.training_prep import (
        doc_pack_bins_bpe,
    )

    a = audit_plan(doc_pack_bins_bpe(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "Window" in a["plan"]
    assert "CartesianProduct" not in a["plan"]
    assert "Exchange SinglePartition" not in a["plan"]
    assert set(a["read_columns"]) == {"doc_id", "text"}


def test_round9_late_operator_plan_contracts(spark, sf_dir):
    """Plan pins for the later round-9 additions."""
    from go_dfs_mapreduce_spark.plans.audit import audit_plan

    # embedding_outlier_topk: centroid table rides in as a BROADCAST
    # join (never a shuffled join of the vector table against per-dim
    # rows), distance is an in-row fold, JVM-only
    from go_dfs_mapreduce_spark.operators.similarity import (
        embedding_outlier_topk,
    )

    a = audit_plan(embedding_outlier_topk(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_broadcast_joins"] >= 1
    assert a["n_sortmerge_joins"] == 0
    assert "CartesianProduct" not in a["plan"]

    # rrf_fusion_topk: both candidate lists lower to
    # TakeOrderedAndProject (never a global sort of the corpus); the
    # only cross is the broadcast 1-row query vector; JVM-only
    from go_dfs_mapreduce_spark.operators.retrieval import rrf_fusion_topk

    a = audit_plan(rrf_fusion_topk(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["plan"].count("TakeOrderedAndProject") >= 2
    assert "CartesianProduct" not in a["plan"]

    # url_canonical_dedup: one scan, regex chain in codegen, one
    # map-side-combined exchange; no joins, no python
    from go_dfs_mapreduce_spark.operators.scrubbing import (
        url_canonical_dedup,
    )

    a = audit_plan(url_canonical_dedup(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "Join" not in a["plan"]
    assert set(a["read_columns"]) == {"doc_id"}
    assert "CartesianProduct" not in a["plan"]


def test_span_corruption_plan_contract(spark, sf_dir):
    """span_corruption_plan: pure in-row layout — no joins, no python
    worker, 2-column scan. r15: the scale-adaptive spread_scan may add
    at most ONE round-robin exchange when the gate's single-row-group
    file under-splits the scan (a no-op at real corpus scale); the
    per-position md5 transforms must run above it."""
    from go_dfs_mapreduce_spark.operators.training_prep import (
        span_corruption_plan,
    )
    from go_dfs_mapreduce_spark.plans.audit import audit_plan

    a = audit_plan(span_corruption_plan(spark, sf_dir))
    assert not a["has_python_worker"]
    # formatted plans name each Exchange twice (tree + detail section)
    assert a["n_exchanges"] <= 2
    if a["n_exchanges"]:
        assert "RoundRobinPartitioning" in a["plan"]
    assert "Join" not in a["plan"]
    assert set(a["read_columns"]) == {"doc_id", "text"}


def test_round10_operator_plan_contracts(spark, sf_dir):
    """Plan pins for the round-10 operators: each keeps the structural
    property its docstring claims."""
    from go_dfs_mapreduce_spark.plans.audit import audit_plan

    # ann_lsh_calibrated_topk: signatures read from the persisted index,
    # query side broadcast (both the probe fan-out and the query
    # vectors), candidates-only scoring; JVM-only, no cartesian
    from go_dfs_mapreduce_spark.operators.similarity import (
        ann_cosine_batch_topk,
        ann_lsh_batch_topk,
        ann_lsh_calibrated_topk,
    )

    a = audit_plan(ann_lsh_calibrated_topk(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_broadcast_joins"] >= 2
    assert "CartesianProduct" not in a["plan"]
    assert "Window" in a["plan"]  # per-query rank, never a global sort

    # batch twin keeps the identical shape at 64 queries
    a = audit_plan(ann_lsh_batch_topk(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_broadcast_joins"] >= 2
    assert "CartesianProduct" not in a["plan"]

    # brute batch arm: the non-equi (qid != vec_id) broadcast join is
    # the ONE nested-loop, with the tiny query side as the build side
    a = audit_plan(ann_cosine_batch_topk(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "BroadcastNestedLoopJoin" in a["plan"]
    assert "BuildRight" in a["plan"]
    assert "CartesianProduct" not in a["plan"]

    # bpe_train_merges_batched: winners are checkpointed tiny frames —
    # the returned plan unions scans of materialized RDDs (lineage CUT:
    # no corpus scan, no python, no join in the result plan)
    from go_dfs_mapreduce_spark.operators.textstats import (
        bpe_train_merges_batched,
    )

    a = audit_plan(bpe_train_merges_batched(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "CartesianProduct" not in a["plan"]
    assert "Scan parquet" not in a["plan"]  # lineage ends at checkpoints

    # multimodal_pixels_png: the two Arrow stages ARE the point
    # (synthesize + decode), fed by a 1-column scan
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_pixels_png,
    )

    a = audit_plan(multimodal_pixels_png(spark, sf_dir))
    # two Arrow stages, each named twice (tree + detail section)
    assert a["plan"].count("MapInPandas") == 4
    assert set(a["read_columns"]) == {"doc_id"}
    # r15: heavy compressed-codec decoders spread the doc_id feed when
    # the gate's single-row-group scan under-splits (round-robin only;
    # a no-op exchange-free plan at real corpus scale)
    if "Exchange" in a["plan"]:
        assert "RoundRobinPartitioning" in a["plan"]

    # multimodal_pixels_gif: identical shape to the PNG twin
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_pixels_gif,
    )

    a = audit_plan(multimodal_pixels_gif(spark, sf_dir))
    assert a["plan"].count("MapInPandas") == 4
    assert set(a["read_columns"]) == {"doc_id"}
    if "Exchange" in a["plan"]:  # r15 spread, see the PNG pin above
        assert "RoundRobinPartitioning" in a["plan"]

    # ann_ivf_calibrated_topk: centroids/probe lists ride as broadcasts,
    # the candidate join is an equi-join on the cluster id, JVM-only
    from go_dfs_mapreduce_spark.operators.similarity import (
        ann_ivf_calibrated_topk,
    )

    a = audit_plan(ann_ivf_calibrated_topk(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_broadcast_joins"] >= 2
    assert "CartesianProduct" not in a["plan"]

    # events_rate_limit: ONE user-keyed exchange + in-partition sort
    # feeding the declared Arrow kernel through a single MapInPandas
    # pass (r15: one Python crossing for the whole partition, not one
    # UDF invocation per user group); 3-column scan
    from go_dfs_mapreduce_spark.operators.timeseries import (
        events_rate_limit,
    )

    a = audit_plan(events_rate_limit(spark, sf_dir))
    assert "MapInPandas" in a["plan"]
    assert "FlatMapGroupsInPandas" not in a["plan"]
    assert "hashpartitioning(user_id" in a["plan"]
    assert set(a["read_columns"]) == {"event_id", "ts", "user_id"}
    assert "Join" not in a["plan"]


def test_lsh_bucketed_index_scan_is_pruned(spark, sf_dir):
    """VERDICT r10 #3: the OPT-IN bucketed read of the LSH signature
    index must scan through a BUCKETED file source pruned by the
    literal probe keys — SelectedBucketsCount strictly below the bucket
    count — not a full-index stream into the join. (The r11
    decomposition measured this read as the 100 TB serve shape but a
    task-launch pessimization at fixture scale, so the DEFAULT path is
    the array join — SCALE.md round 11.)"""
    import re

    from go_dfs_mapreduce_spark.operators import similarity as S
    from go_dfs_mapreduce_spark.plans.audit import formatted_plan

    bits = S._calibrated_bits_for(spark, sf_dir)
    cand = S._lsh_candidates(
        spark,
        sf_dir,
        multiprobe=True,
        bits=bits,
        n_queries=S.N_QUERIES,
        bucketed=True,
    )
    plan = formatted_plan(cand)
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan[:3000]
    sel, tot = int(m.group(1)), int(m.group(2))
    assert tot == S.LSH_INDEX_BUCKETS
    # the probe set is n_queries * LSH_TABLES * (bits+1) keys at most;
    # pruning must engage (strictly fewer buckets than total), and can
    # never select more buckets than probe keys
    assert sel < tot
    assert sel <= S.N_QUERIES * S.LSH_TABLES * (bits + 1)
    assert "In(pk" in plan  # the literal probe filter reached the scan


def test_lsh_bucketed_candidates_match_unpruned(spark, sf_dir):
    """The pk IN (...) prune filter is semantically redundant (join-key
    equality implies pk membership) — the opt-in bucketed read's
    candidate pair set must be byte-identical to the default array-join
    path AND to the unpruned join recomputed inline."""
    from go_dfs_mapreduce_spark.operators import similarity as S

    bits = S._calibrated_bits_for(spark, sf_dir)
    got = {
        (r.qid, r.cid)
        for r in S._lsh_candidates(
            spark,
            sf_dir,
            multiprobe=True,
            bits=bits,
            n_queries=S.N_QUERIES,
            bucketed=True,
        ).collect()
    }
    got_default = {
        (r.qid, r.cid)
        for r in S._lsh_candidates(
            spark,
            sf_dir,
            multiprobe=True,
            bits=bits,
            n_queries=S.N_QUERIES,
            bucketed=False,
        ).collect()
    }
    assert got == got_default

    sigs = S.lsh_sig_table(spark, sf_dir, bits).select(
        "vec_id", F.posexplode("sigs").alias("t", "sig")
    )
    qside = sigs.where(F.col("vec_id") < S.N_QUERIES)
    flips = ", ".join(f"sig ^ {1 << j}" for j in range(bits))
    qsigs = qside.select(
        F.col("vec_id").alias("qid"),
        "t",
        F.explode(F.expr(f"array(sig, {flips})")).alias("sig"),
    )
    want = {
        (r.qid, r.cid)
        for r in sigs.join(F.broadcast(qsigs), ["t", "sig"])
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"))
        .distinct()
        .collect()
    }
    assert got == want and len(got) > 0


def test_round11_operator_plan_contracts(spark, sf_dir):
    """Plan pins for the round-11 operators: each keeps the structural
    property its docstring claims."""
    from go_dfs_mapreduce_spark.plans.audit import audit_plan

    # ann_int8_rerank_topk: the declared two-stage shape — stage 1 is
    # ONE Arrow partial-top-R kernel over the int8 store (r12: the
    # map-side combine replaced the n x q BroadcastNestedLoopJoin +
    # full-width window shuffle), so exactly one MapInPandas feeds the
    # per-query window; stage 2 broadcasts the tiny query side; never
    # a CartesianProduct
    from go_dfs_mapreduce_spark.operators.similarity import (
        ann_int8_rerank_topk,
        pq_adc_topk,
    )

    a = audit_plan(ann_int8_rerank_topk(spark, sf_dir))
    assert a["plan"].count("MapInPandas (") == 1  # stage 1 partials only
    assert "BroadcastNestedLoopJoin" not in a["plan"]  # the old stage 1
    assert a["n_broadcast_joins"] >= 1  # stage 2 query-side broadcast
    assert "CartesianProduct" not in a["plan"]
    assert "Window" in a["plan"]  # per-query ranks, never a global sort

    # pq_adc_topk: codebooks/LUTs ride broadcasts (seeds, refined
    # codebook, per-query LUT); the only corpus-sized work is scans +
    # hash aggregates; JVM-only
    a = audit_plan(pq_adc_topk(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_broadcast_joins"] >= 3
    assert "CartesianProduct" not in a["plan"]

    # contamination_ngram_audit: the eval-vs-train probe is a LeftSemi
    # join (no pair expansion possible on hot shingles); JVM-only
    from go_dfs_mapreduce_spark.operators.dedup import (
        contamination_ngram_audit,
    )

    a = audit_plan(contamination_ngram_audit(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "LeftSemi" in a["plan"]
    assert "CartesianProduct" not in a["plan"]

    # multimodal_pixels_jpeg: the two declared Arrow stages (synth +
    # decode) over a 1-column scan — Python IS the operator here, but
    # only those two stages, and no exchange at all
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_pixels_jpeg,
    )

    a = audit_plan(multimodal_pixels_jpeg(spark, sf_dir))
    # two tree nodes (the formatted plan repeats each in its detail
    # section, so count the numbered tree form)
    assert a["plan"].count("MapInPandas (") == 2
    # r15 spread (round-robin only; no-op at real scale)
    assert a["n_exchanges"] <= 2
    if a["n_exchanges"]:
        assert "RoundRobinPartitioning" in a["plan"]
    assert "ReadSchema: struct<doc_id:bigint>" in a["plan"]  # 1-col scan


def test_round12_operator_plan_contracts(spark, sf_dir):
    """Plan pins for the round-12 operators: each keeps the structural
    property its docstring claims."""
    from go_dfs_mapreduce_spark.plans.audit import audit_plan

    # ivf_pq_rerank_topk: stage 1 is the ivf_pq plan (broadcast probe +
    # broadcast LUT over the code table), stage 2 broadcasts the tiny
    # query side for the exact rerank; JVM-only, never a cartesian
    from go_dfs_mapreduce_spark.operators.similarity import (
        ivf_pq_rerank_topk,
    )

    a = audit_plan(ivf_pq_rerank_topk(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_broadcast_joins"] >= 3
    assert "CartesianProduct" not in a["plan"]
    assert "Window" in a["plan"]

    # span_dedup_plan: positions flag through a LeftSemi against the
    # repeated-shingle set — no occurrence-to-occurrence join anywhere,
    # so no pair expansion on hot shingles is even expressible; JVM-only
    from go_dfs_mapreduce_spark.operators.dedup import span_dedup_plan

    a = audit_plan(span_dedup_plan(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "LeftSemi" in a["plan"]
    assert "CartesianProduct" not in a["plan"]

    # multimodal_pixels_jpeg420: the two declared Arrow stages over a
    # 1-column scan, no exchange (the shared pixel-pipeline shape)
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_pixels_jpeg420,
    )

    a = audit_plan(multimodal_pixels_jpeg420(spark, sf_dir))
    assert a["plan"].count("MapInPandas (") == 2
    # r15 spread (round-robin only; no-op at real scale)
    assert a["n_exchanges"] <= 2
    if a["n_exchanges"]:
        assert "RoundRobinPartitioning" in a["plan"]
    assert "ReadSchema: struct<doc_id:bigint>" in a["plan"]

    # span_dedup_apply / span_dedup_keep_owner: same contract as the
    # plan operator — flagging is keyed by shingle (LeftSemi for the
    # uniform rule, an equi-join carrying the owner for keep-one-copy),
    # never a cartesian, never Python
    from go_dfs_mapreduce_spark.operators.dedup import (
        span_dedup_apply,
        span_dedup_keep_owner,
    )

    a = audit_plan(span_dedup_apply(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "LeftSemi" in a["plan"]
    assert "CartesianProduct" not in a["plan"]
    a = audit_plan(span_dedup_keep_owner(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "CartesianProduct" not in a["plan"]

    # span_dedup_incremental: same LeftSemi contract, with the ingest
    # boundary as a broadcast 1-row aggregate (never collected)
    from go_dfs_mapreduce_spark.operators.dedup import (
        span_dedup_incremental,
    )

    a = audit_plan(span_dedup_incremental(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "LeftSemi" in a["plan"]
    assert "CartesianProduct" not in a["plan"]
    assert a["n_broadcast_joins"] >= 2  # the threshold rides broadcasts

    # ivf_pq_residual_topk: the serve plan is ivf_pq's with the
    # per-(query, cell) LUT broadcast — codebooks/probe/LUT all ride
    # broadcasts, the only corpus-sized join input is the code table;
    # JVM-only, never a cartesian
    from go_dfs_mapreduce_spark.operators.similarity import (
        ivf_pq_residual_topk,
    )

    a = audit_plan(ivf_pq_residual_topk(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_broadcast_joins"] >= 3
    assert "CartesianProduct" not in a["plan"]
    assert "Window" in a["plan"]


def test_round12_late_operator_plan_contracts(spark, sf_dir):
    """Plan pins for the late-round-12 operators: each keeps the
    structural property its docstring claims."""
    from go_dfs_mapreduce_spark.plans.audit import audit_plan

    # corpus_sample_weighted: ONE pruned corpus scan feeding a
    # TakeOrderedAndProject (O(k) heap per task — never a global Sort
    # or an Exchange of the corpus); tau is a window over the limited
    # cut, not a second scan
    from go_dfs_mapreduce_spark.operators.llm_extras import (
        corpus_sample_weighted,
    )

    a = audit_plan(corpus_sample_weighted(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_exchanges"] == 0
    # tree form only (the details section repeats each node name)
    assert a["plan"].count("Scan parquet  (") == 1
    assert "TakeOrderedAndProject" in a["plan"]

    # corpus_sample_weighted_stratified: rank <= k+1 per stratum plans
    # a WindowGroupLimit (per-task per-stratum heaps BEFORE the lang
    # exchange); single corpus scan (tau is a window over the filtered
    # frame, not a second agg branch), exactly one exchange
    from go_dfs_mapreduce_spark.operators.llm_extras import (
        corpus_sample_weighted_stratified,
    )

    a = audit_plan(corpus_sample_weighted_stratified(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "WindowGroupLimit" in a["plan"]
    assert a["plan"].count("Scan parquet  (") == 1
    assert a["n_exchanges"] <= 2  # partial/final pair of the lang shuffle

    # zorder_layout_audit: integer Morton keys end-to-end, JVM-only,
    # min/max stats ride a broadcast (never a per-row shuffle of the
    # stats), no cartesian anywhere
    from go_dfs_mapreduce_spark.operators.training_prep import (
        zorder_layout_audit,
    )

    a = audit_plan(zorder_layout_audit(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "CartesianProduct" not in a["plan"]
    assert "BroadcastNestedLoopJoin" in a["plan"]  # the tiny stats frame
    # single-lineage melt: exactly the main scan + the stats-agg scan
    # (the review's unionByName draft duplicated both to four)
    assert a["plan"].count("Scan parquet  (") == 2
    assert "Generate" in a["plan"]  # the stack() melt node

    # multimodal_video_y4m: the two declared Arrow stages (synth +
    # decode) over a 1-column scan, no exchange — the module's shared
    # decode shape
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_video_y4m,
    )

    a = audit_plan(multimodal_video_y4m(spark, sf_dir))
    assert a["plan"].count("MapInPandas (") == 2
    # r15 spread (round-robin only; no-op at real scale)
    assert a["n_exchanges"] <= 2
    if a["n_exchanges"]:
        assert "RoundRobinPartitioning" in a["plan"]
    assert "ReadSchema: struct<doc_id:bigint>" in a["plan"]

    # multimodal_video_scene_cuts: same declared two-Arrow-stage decode
    # shape (frames compare pairwise INSIDE one payload — no cross-row
    # state, no exchange)
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_video_scene_cuts,
    )

    a = audit_plan(multimodal_video_scene_cuts(spark, sf_dir))
    assert a["plan"].count("MapInPandas (") == 2
    assert a["n_exchanges"] == 0
    assert "ReadSchema: struct<doc_id:bigint>" in a["plan"]

    # html_text_extraction: the web pipeline's highest-volume stage —
    # one scan, zero exchanges, zero Python, all whole-stage-codegen
    # string expressions
    from go_dfs_mapreduce_spark.operators.corpus_ops import (
        html_text_extraction,
    )

    a = audit_plan(html_text_extraction(spark, sf_dir))
    assert not a["has_python_worker"]
    assert a["n_exchanges"] == 0
    assert a["plan"].count("Scan parquet  (") == 1

    # bloom_skipping_audit: probes/stats ride broadcasts, the bloom
    # build's output is bounded by files x bits (corpus-independent);
    # JVM-only, no cartesian
    from go_dfs_mapreduce_spark.operators.training_prep import (
        bloom_skipping_audit,
    )

    a = audit_plan(bloom_skipping_audit(spark, sf_dir))
    assert not a["has_python_worker"]
    assert "CartesianProduct" not in a["plan"]
    assert a["n_broadcast_joins"] >= 2

    # multimodal_gif_animation: the module's two-Arrow-stage decode
    # shape (frames composite inside one payload — no cross-row state)
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_gif_animation,
    )

    a = audit_plan(multimodal_gif_animation(spark, sf_dir))
    assert a["plan"].count("MapInPandas (") == 2
    # r15 spread (round-robin only; no-op at real scale)
    assert a["n_exchanges"] <= 2
    if a["n_exchanges"]:
        assert "RoundRobinPartitioning" in a["plan"]
    assert "ReadSchema: struct<doc_id:bigint>" in a["plan"]

    # multimodal_audio_vad: same two-Arrow-stage decode shape
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_audio_vad,
    )

    a = audit_plan(multimodal_audio_vad(spark, sf_dir))
    assert a["plan"].count("MapInPandas (") == 2
    assert a["n_exchanges"] == 0

    # multimodal_image_phash_dedup: two Arrow decode stages, then the
    # grouping exchange carries only (doc_id, hash halves) — the
    # 12-bytes-per-image reduction the docstring claims
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_image_phash_dedup,
    )

    a = audit_plan(multimodal_image_phash_dedup(spark, sf_dir))
    assert a["plan"].count("MapInPandas (") == 2
    assert "Window" in a["plan"]  # per-hash grouping, never a collect


def test_cbo_column_stats_flip_join_strategy(spark, sf_dir):
    """ANALYZE ... FOR ALL COLUMNS + CBO flips a physical join decision
    (VERDICT r12 #4): without column statistics a Filter inherits its
    child's size, so a 1%-selective dimension filter still looks full
    size and the optimizer plans a sort-merge join; with catalog column
    stats and spark.sql.cbo.enabled the estimate shrinks by the real
    selectivity and the SAME query under the SAME threshold broadcasts.
    The threshold is pinned between the two estimates read from the
    optimizer itself, so the test asserts the mechanism (stats change
    the estimate, the estimate changes the strategy), not a magic
    number; results must be identical either way."""
    from go_dfs_mapreduce_spark.sources.catalog_stats import (
        analyze_tables,
        register_parquet_catalog,
    )

    db = "cbo_gate"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    register_parquet_catalog(spark, db, sf_dir, ("lineitem", "part"))
    maxk = spark.table(f"{db}.part").agg(F.max("p_partkey")).first()[0]

    def build():
        li = spark.table(f"{db}.lineitem").select("l_partkey")
        part = spark.table(f"{db}.part").where(
            F.col("p_partkey") < maxk // 100 + 1
        )
        return li.join(part, li.l_partkey == part.p_partkey).agg(
            F.count(F.lit(1)).alias("n")
        )

    def join_build_side_estimate() -> int:
        op = build()._jdf.queryExecution().optimizedPlan()

        def find_join(n):
            if n.nodeName() == "Join":
                return n
            for i in range(n.children().size()):
                r = find_join(n.children().apply(i))
                if r is not None:
                    return r
            return None

        return int(str(find_join(op).right().stats().sizeInBytes()))

    def physical(kind: str) -> int:
        return (
            build()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            .count(kind)
        )

    confs = ("spark.sql.cbo.enabled", "spark.sql.autoBroadcastJoinThreshold")
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        est_blind = join_build_side_estimate()
        analyze_tables(spark, db, ("lineitem", "part"), columns=True)
        spark.conf.set("spark.sql.cbo.enabled", "true")
        est_stats = join_build_side_estimate()
        # the stats see through the filter; the size-only path cannot
        assert est_stats < est_blind, (est_stats, est_blind)
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold",
            str((est_stats + est_blind) // 2),
        )
        assert physical("BroadcastHashJoin") == 1
        assert physical("SortMergeJoin") == 0
        n_stats = build().first()["n"]
        spark.conf.set("spark.sql.cbo.enabled", "false")
        assert physical("BroadcastHashJoin") == 0
        assert physical("SortMergeJoin") == 1
        # stats steer strategy, never semantics
        assert build().first()["n"] == n_stats
        # the full deep shape (VERDICT r12 #4 named q9): UNHINTED q9
        # over the analyzed catalog with CBO on equals the registered
        # hinted q9 row-for-row — no oracle change under stats-driven
        # planning (the sums are exact decimal, so plan order can't
        # perturb them)
        from go_dfs_mapreduce_spark.operators.tpch_more import (
            q9_product_profit,
        )
        from go_dfs_mapreduce_spark.sources.catalog_stats import (
            register_parquet_catalog as _reg,
        )

        _reg(spark, db, sf_dir, ("supplier", "nation"))
        analyze_tables(spark, db, ("supplier", "nation"), columns=True)
        spark.conf.set("spark.sql.cbo.enabled", "true")
        from go_dfs_mapreduce_spark.operators.relational import _dsum

        li = spark.table(f"{db}.lineitem")
        part = spark.table(f"{db}.part").where(F.col("p_name").like("%red%"))
        supp = spark.table(f"{db}.supplier")
        nation = spark.table(f"{db}.nation")
        unhinted = (
            li.join(part, li.l_partkey == part.p_partkey)
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .join(nation, supp.s_nationkey == nation.n_nationkey)
            .groupBy(
                F.col("n_name").alias("nation"),
                F.year("l_shipdate").cast("int").alias("o_year"),
            )
            .agg(
                _dsum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    "sum_profit",
                )
            )
        )
        want = {
            (r.nation, r.o_year, r.sum_profit)
            for r in q9_product_profit(spark, sf_dir).collect()
        }
        got = {
            (r.nation, r.o_year, r.sum_profit) for r in unhinted.collect()
        }
        assert got == want
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_round13_operator_plan_contracts(spark, sf_dir):
    """Plan pins for the round-13 operators: each keeps the structural
    property its docstring claims."""
    from go_dfs_mapreduce_spark.plans.audit import audit_plan

    # multimodal_video_mjpeg: the module's two-Arrow-stage decode shape
    # (synth + container/JPEG decode) over a 1-column scan, no exchange
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_audio_fingerprint_dedup,
        multimodal_video_frame_dedup,
        multimodal_video_frame_dedup_incremental,
        multimodal_video_mjpeg,
    )

    a = audit_plan(multimodal_video_mjpeg(spark, sf_dir))
    assert a["plan"].count("MapInPandas (") == 2
    # r15 spread (round-robin only; no-op at real scale)
    assert a["n_exchanges"] <= 2
    if a["n_exchanges"]:
        assert "RoundRobinPartitioning" in a["plan"]
    assert "ReadSchema: struct<doc_id:bigint>" in a["plan"]

    # frame dedup: the fingerprint frame arrives from the persisted
    # session memo (InMemoryTableScan — decode runs once per session,
    # not once per consumer lineage), then one window over the
    # fingerprint — never a pairwise join
    a = audit_plan(multimodal_video_frame_dedup(spark, sf_dir))
    assert "InMemoryTableScan" in a["plan"]
    assert "Window" in a["plan"]
    assert "Join" not in a["plan"]

    # incremental frame dedup: index pruned by a LeftSemi BEFORE the
    # pair join; all three consumers of the fingerprint frame read the
    # SAME persisted memo (no decode re-run per lineage); the 1-row
    # batch threshold rides broadcasts — never a cartesian of data rows
    a = audit_plan(multimodal_video_frame_dedup_incremental(spark, sf_dir))
    assert "LeftSemi" in a["plan"]
    # the memo shows up as InMemoryTableScan consumers (the cached
    # relation's stored description still names its MapInPandas build)
    assert "InMemoryTableScan" in a["plan"]
    assert a["plan"].count("BroadcastNestedLoopJoin Inner BuildRight (") >= 2
    assert "CartesianProduct" not in a["plan"]

    # audio fingerprint: both self-join sides read the persisted hash
    # index (decode once), pair candidates come from the hash-bucket
    # equi-join — no cartesian anywhere
    a = audit_plan(multimodal_audio_fingerprint_dedup(spark, sf_dir))
    assert "InMemoryTableScan" in a["plan"]
    assert "CartesianProduct" not in a["plan"]
    assert "SortMergeJoin" in a["plan"] or "ShuffledHashJoin" in a["plan"] \
        or "BroadcastHashJoin" in a["plan"]

    # dedup_clusters' star rounds: driver loop, so pin the KERNEL
    # instead — one large-star round is two keyed aggregates + a
    # distinct, all hash exchanges, zero Python stages
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.dedup import _cc_large_star

    e = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    a = audit_plan(_cc_large_star(e))
    assert not a["has_python_worker"]
    assert "CartesianProduct" not in a["plan"]
    assert "HashAggregate" in a["plan"]


def test_persisted_index_plan_contracts(spark, sf_dir):
    """VERDICT r13 #1/#2: the dedup/ANN/fingerprint indexes are PERSISTED
    WAREHOUSE TABLES (memo.index_table = fingerprinted parquet in the
    derived warehouse + a session-memoized persisted read-back), and the
    plans prove it: (a) each index handle's executed plan is an
    InMemoryTableScan whose cached child scans the STORED parquet table
    (warehouse/derived/<name>-<fp>) with zero Python stages — so the
    expensive build (Arrow decode, md5 minhashing, decimal-distance
    argmin) appears in NO consumer plan; (b) each consuming query's
    executed plan reads the index through that InMemoryTableScan and is
    itself Python-free. Dropping derived_table breaks the path marker
    (the handle's scan falls back to the raw corpus and the decode
    reappears); dropping session_memo breaks the InMemoryTableScan."""
    from go_dfs_mapreduce_spark.operators.dedup import (
        band_sig_index,
        dedup_incremental_new_docs,
        embedding_nn_cosine,
        nn_cells,
    )
    from go_dfs_mapreduce_spark.operators.multimodal import (
        _audio_fp_index,
        _video_frame_fingerprints,
        multimodal_audio_fingerprint_incremental,
        multimodal_video_frame_dedup,
    )

    PY_MARKERS = (
        "MapInPandas",
        "ArrowEvalPython",
        "BatchEvalPython",
        "FlatMapGroupsInPandas",
    )

    def executed(df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    handles = {
        "lsh_band_index": band_sig_index(spark, sf_dir),
        "ann_ivf_cells": nn_cells(spark, sf_dir),
        "audio_landmark_index": _audio_fp_index(spark, sf_dir),
        "video_frame_hash_index": _video_frame_fingerprints(spark, sf_dir),
    }
    for name, h in handles.items():
        plan = executed(h)
        assert "InMemoryTableScan" in plan, name
        assert f"warehouse/derived/{name}-" in plan, (name, plan[:400])
        assert not any(m in plan for m in PY_MARKERS), name

    consumers = {
        "lsh_band_index": dedup_incremental_new_docs,
        "ann_ivf_cells": embedding_nn_cosine,
        "audio_landmark_index": multimodal_audio_fingerprint_incremental,
        "video_frame_hash_index": multimodal_video_frame_dedup,
    }
    for name, fn in consumers.items():
        plan = executed(fn(spark, sf_dir))
        assert "InMemoryTableScan" in plan, name
        assert f"warehouse/derived/{name}-" in plan, name
        assert not any(m in plan for m in PY_MARKERS), name

    # r15: the APPENDED (two-generation) index obeys the same contract —
    # its consumer scans the stored gen-2 parquet dir (hardlinked gen-1
    # files + delta files behind one path) with zero Python stages; the
    # delta decode ran at append time, never in a query plan
    from go_dfs_mapreduce_spark.operators.dedup import (
        _appended_demo_index,
        dedup_appended_index,
    )

    plan = executed(_appended_demo_index(spark, sf_dir))
    assert "lsh_band_index_appdemo-" in plan, plan[:400]
    assert not any(m in plan for m in PY_MARKERS), "appdemo handle"
    plan = executed(dedup_appended_index(spark, sf_dir))
    assert "lsh_band_index_appdemo-" in plan, plan[:400]
    assert not any(m in plan for m in PY_MARKERS), "appdemo consumer"


def test_recursive_compound_balance_cached_base(spark, sf_dir):
    """r15: the recursive CTE's base (orders + row_number) is cached and
    eagerly populated so UnionLoop's per-level re-execution probes an
    InMemoryTableScan instead of repeating the scan + window each level;
    the recursion itself must remain a UnionLoop (the feature under
    test), with no Python stages."""
    from go_dfs_mapreduce_spark.operators.timeseries import (
        recursive_compound_balance,
    )
    from go_dfs_mapreduce_spark.plans.audit import audit_plan

    a = audit_plan(recursive_compound_balance(spark, sf_dir))
    assert "UnionLoop" in a["plan"]
    assert "InMemoryTableScan" in a["plan"] or "InMemoryRelation" in a["plan"]
    assert not a["has_python_worker"]


def test_small_candidate_frames_keep_compute_parallelism(spark, sf_dir):
    """r15: AQE coalesces bytes-small candidate/cell frames to one
    partition, which serialized the per-pair exact-decimal scoring; the
    fan-out arms pin an explicit repartition (RoundRobin for the LSH
    batch candidates, hash-by-cell for the cell-blocked pair joins) so
    the scoring stage keeps the session's parallelism."""
    from go_dfs_mapreduce_spark.operators.dedup import (
        embedding_nn_cosine,
        semantic_dedup,
    )
    from go_dfs_mapreduce_spark.operators.similarity import (
        ann_lsh_batch_topk,
    )
    from go_dfs_mapreduce_spark.plans.audit import audit_plan

    a = audit_plan(ann_lsh_batch_topk(spark, sf_dir))
    assert "RoundRobinPartitioning" in a["plan"]
    for q in (embedding_nn_cosine, semantic_dedup):
        a = audit_plan(q(spark, sf_dir))
        assert "hashpartitioning(cell" in a["plan"], q.__name__
