"""I/O scale utilities: small-file compaction and binaryFile ingest."""

from __future__ import annotations

import glob as globmod
import os

from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.sources.io import (
    compact_parquet,
    read_binary_files,
)


def _parquet_files(path: str) -> list[str]:
    return [
        f
        for f in globmod.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.basename(f).startswith("part-")
    ]


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    # simulate a streaming sink's droppings: 64 tiny files
    df.repartition(64).write.parquet(src)
    assert len(_parquet_files(src)) == 64

    files = compact_parquet(spark.read.parquet(src), dst, target_rows_per_file=4_000)
    assert files == 3  # ceil(10000 / 4000)
    assert len(_parquet_files(dst)) == 3
    out = spark.read.parquet(dst)
    assert out.count() == 10_000
    assert out.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_compact_parquet_clustered_files_own_key_ranges(spark, tmp_path):
    dst = str(tmp_path / "clustered")
    df = spark.range(0, 9_000).withColumn("k", F.col("id") % 3_000)
    compact_parquet(df, dst, target_rows_per_file=3_000, cluster_by=["k"])
    # each physical file must own a disjoint contiguous range of k so
    # parquet min/max stats can prune whole files on k-predicates
    per_file = (
        spark.read.parquet(dst)
        .select("k", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    assert len(spans) >= 2
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next, f"overlapping file key ranges: {spans}"


def test_read_binary_files_roundtrip_and_glob(spark, tmp_path):
    media = tmp_path / "media"
    media.mkdir()
    payloads = {f"clip{i}.bin": bytes([i] * (10 + i)) for i in range(4)}
    for name, data in payloads.items():
        (media / name).write_bytes(data)
    (media / "notes.txt").write_text("not media")

    df = read_binary_files(spark, str(media), glob="*.bin")
    rows = {os.path.basename(r["path"]): r for r in df.collect()}
    assert set(rows) == set(payloads)
    for name, data in payloads.items():
        assert bytes(rows[name]["content"]) == data
        assert rows[name]["length"] == len(data)


def _morton16(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue2_matches_python_model(spark):
    from assignment_2_dataengineering_spark.operators.layout import zvalue2

    import random

    random.seed(7)
    pts = [(random.randrange(65536), random.randrange(65536)) for _ in range(200)]
    df = spark.createDataFrame(pts, "a long, b long")
    got = df.select("a", "b", zvalue2(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r["z"] == _morton16(r["a"], r["b"])


def test_zorder_clustering_skips_files_on_both_dims(spark, tmp_path):
    """The point of Z-order: on a 128x128 grid written as 16 files, a
    small 2-D box predicate must touch few files under z-clustering —
    and strictly fewer than under a linear sort on x, where the
    y-constraint cannot skip anything."""
    from assignment_2_dataengineering_spark.operators.layout import zvalue2
    from assignment_2_dataengineering_spark.sources.io import compact_parquet

    n = 128
    grid = spark.range(0, n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    zed = grid.withColumn("zkey", zvalue2(F.col("x") * 512, F.col("y") * 512))

    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    compact_parquet(zed, zpath, target_rows_per_file=1024, cluster_by=["zkey"])
    compact_parquet(zed, lpath, target_rows_per_file=1024, cluster_by=["x"])

    def files_touched(path: str) -> tuple[int, int]:
        df = spark.read.parquet(path)
        total = df.select(F.input_file_name()).distinct().count()
        hit = (
            df.filter((F.col("x").between(10, 25)) & (F.col("y").between(40, 55)))
            .select(F.input_file_name())
            .distinct()
            .count()
        )
        return hit, total

    z_hit, z_total = files_touched(zpath)
    l_hit, l_total = files_touched(lpath)
    # range sampling + maxRecordsPerFile may split a few buckets, so
    # totals land near (not exactly at) the requested 16
    assert 16 <= z_total <= 32 and 16 <= l_total <= 32
    # z-order: the 16x16 box lives in a handful of space-filling tiles
    assert z_hit <= 4 and z_hit < l_hit + 4
    # linear-on-x: the x-range spans ~2 files of 8 columns each — but
    # min/max on x is ALSO selective here; the real contrast is per-dim:
    # a y-only predicate skips nothing under x-sort, but does under z.
    y_only_linear = (
        spark.read.parquet(lpath)
        .filter(F.col("y").between(40, 55))
        .select(F.input_file_name()).distinct().count()
    )
    y_only_z = (
        spark.read.parquet(zpath)
        .filter(F.col("y").between(40, 55))
        .select(F.input_file_name()).distinct().count()
    )
    assert y_only_linear == l_total  # x-sorted files cannot skip on y
    assert y_only_z <= z_total // 2  # z-clustered files can


def test_binaryfile_to_media_pipeline_end_to_end(spark, tmp_path):
    """The full multimodal ingest path: directory of opaque files →
    binaryFile scan → media table → Arrow-batched feature extraction.
    Feature values must equal the numpy model of the raw bytes."""
    from assignment_2_dataengineering_spark.operators.multimodal import (
        extract_features,
        media_from_binary_files,
    )
    from assignment_2_dataengineering_spark.sources.io import read_binary_files

    media_dir = tmp_path / "bin_media"
    media_dir.mkdir()
    payloads = {f"m{i}.raw": bytes(range(i, i + 32)) for i in range(3)}
    for name, data in payloads.items():
        (media_dir / name).write_bytes(data)

    files = read_binary_files(spark, str(media_dir), glob="*.raw")
    media = media_from_binary_files(files)
    assert media.columns == ["doc_id", "payload", "media"]
    # ids stable across two independent listings
    ids_a = sorted(r["doc_id"] for r in media.select("doc_id").collect())
    ids_b = sorted(
        r["doc_id"]
        for r in media_from_binary_files(
            read_binary_files(spark, str(media_dir), glob="*.raw")
        ).select("doc_id").collect()
    )
    assert ids_a == ids_b and len(set(ids_a)) == 3

    feats = {r["byte_sum"]: r for r in extract_features(media).collect()}
    for data in payloads.values():
        r = feats[sum(data)]
        assert r["n_bytes"] == 32
        assert abs(r["byte_mean"] - sum(data) / 32) < 1e-9


def test_bucketed_join_eliminates_both_exchanges(spark, sf_dir, tmp_path):
    """The write_bucketed payoff (sources/io.py): two tables bucketed
    and sorted on the same key with equal bucket counts join with NO
    shuffle on either side — the physical plan must contain zero
    Exchange nodes, and values must match the plain-join answer."""
    from assignment_2_dataengineering_spark.sources.io import write_bucketed
    from assignment_2_dataengineering_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    try:
        write_bucketed(
            orders, "t_orders_b", ["o_orderkey"], 8, path=str(tmp_path / "o")
        )
        write_bucketed(
            lineitem, "t_lineitem_b", ["l_orderkey"], 8, path=str(tmp_path / "l")
        )
        o_b = spark.table("t_orders_b")
        l_b = spark.table("t_lineitem_b")
        # Force SMJ: broadcast would hide the exchange question entirely.
        joined = o_b.hint("merge").join(
            l_b, o_b["o_orderkey"] == l_b["l_orderkey"]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        expect = (
            orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
            .count()
        )
        assert joined.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Long-lived date-partitioned datasets grow columns over time;
    mergeSchema-on-read must unify old and new file schemas with NULL
    backfill for pre-evolution files — no rewrite of historical
    partitions (the only viable policy at 100 TB)."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(base + "/day=2026-01-01")
    spark.createDataFrame(
        [(3, "c", 9.5)], "id long, name string, score double"
    ).write.parquet(base + "/day=2026-01-02")

    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"id", "name", "score", "day"}
    rows = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
    assert rows[1] == ("a", None)  # old files: NULL backfill
    assert rows[3] == ("c", 9.5)
    # partition pruning still works across the evolved dataset
    assert df.filter(df["day"] == "2026-01-02").count() == 1


def test_dynamic_partition_pruning_on_day_layout(spark, sf_dir, tmp_path):
    """The date-partitioned layout's other payoff (§1 of SCALE.md):
    joining the fact against a FILTERED dim on the partition column
    triggers dynamic partition pruning — the fact scan materializes a
    runtime subquery filter on `day`, so non-qualifying partitions are
    never read even though the qualifying days aren't known until the
    dim side runs. At 100 TB this is the difference between scanning
    3 days and scanning 10 years."""
    from assignment_2_dataengineering_spark.sources.io import write_parquet_by_day
    from assignment_2_dataengineering_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_day")
    write_parquet_by_day(events, path)

    fact = spark.read.parquet(path)
    all_days = sorted(
        r["event_date"] for r in fact.select("event_date").distinct().collect()
    )
    # independent dim: every day present, only 3 low ranks — the
    # selective dim-side filter is what the DPP rule keys on. Two
    # traps at test scale: the dim must be a FILE relation (an
    # in-memory LocalRelation has no size stats, so DPP's cost check
    # declines), and the filter must be a COMPARISON (a bare boolean
    # column fails the rule's isLikelySelective test).
    dim_path = str(tmp_path / "day_dim")
    spark.createDataFrame(
        [(d, i) for i, d in enumerate(all_days)], "event_date date, hot_rank int"
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path)
    # broadcast the dim explicitly: at test scale the planner would
    # otherwise build on the (tiny) fact side, where DPP has no benefit
    joined = fact.join(F.broadcast(dim.filter(F.col("hot_rank") < 3)), "event_date")

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    expect = fact.filter(F.col("event_date").isin(all_days[:3])).count()
    assert joined.count() == expect


def test_xml_roundtrip_with_schema(spark, sf_dir, tmp_path):
    """sources/io.write_xml / read_xml: a dimension table survives the
    XML round trip bit-for-bit when read back with its explicit schema
    (inference is permissive; the engine's reader discipline is
    schema-first, schemas.py)."""
    from assignment_2_dataengineering_spark.sources import io as eio
    from assignment_2_dataengineering_spark.sources.tables import load_table

    dim = load_table(spark, sf_dir, "supplier")
    path = str(tmp_path / "supplier_xml")
    eio.write_xml(dim, path, row_tag="supplier")
    back = eio.read_xml(spark, path, row_tag="supplier", schema=dim.schema)
    assert back.schema == dim.schema
    a = sorted(tuple(r) for r in dim.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


class TestJsonlSinkDataSource:
    """Python DataSource WRITE path (sources/python_datasource.py
    JsonlSinkDataSource): per-task part files + driver-side manifest
    commit — readers resolving the manifest never see uncommitted
    output."""

    def test_write_commit_readback(self, spark, tmp_path):
        from assignment_2_dataengineering_spark.sources.python_datasource import (
            JsonlSinkDataSource,
            read_jsonl_sink,
        )

        spark.dataSource.register(JsonlSinkDataSource)
        df = (
            spark.range(0, 97)
            .selectExpr("to_json(named_struct('id', id, 'sq', id * id)) AS value")
            .repartition(4)
        )
        out = str(tmp_path / "sink")
        df.write.format("oe_jsonl").mode("append").option("path", out).save()
        back, manifest = read_jsonl_sink(spark, out)
        assert manifest["n_rows"] == 97
        assert sum(f["n_rows"] for f in manifest["files"]) == 97
        assert len(manifest["files"]) == 4  # one part file per partition
        got = sorted(r.value for r in back.collect())
        want = sorted(r.value for r in df.collect())
        assert got == want

    def test_schema_contract_enforced(self, spark, tmp_path):
        import pytest as _pytest

        from assignment_2_dataengineering_spark.sources.python_datasource import (
            JsonlSinkDataSource,
        )

        spark.dataSource.register(JsonlSinkDataSource)
        bad = spark.range(3).selectExpr("id", "id * 2 AS other")
        with _pytest.raises(Exception, match="value"):
            bad.write.format("oe_jsonl").mode("append").option(
                "path", str(tmp_path / "bad")
            ).save()


class TestBackfillMissingDays:
    """sources/io.backfill_missing_days — partition-wise incremental
    backfill: only absent event_date partitions are computed, reruns
    are no-ops, and existing partitions survive untouched."""

    def _src(self, spark, sf_dir):
        from assignment_2_dataengineering_spark.sources.tables import load_table

        return load_table(spark, sf_dir, "events").select("event_id", "ts", "value")

    def test_initial_then_incremental(self, spark, sf_dir, tmp_path):
        from assignment_2_dataengineering_spark.sources.io import (
            backfill_missing_days,
            read_parquet,
        )
        from pyspark.sql import functions as F

        src = self._src(spark, sf_dir)
        days = sorted(
            r.d.isoformat()
            for r in src.select(F.to_date("ts").alias("d")).distinct().collect()
        )
        first_week = src.filter(F.to_date("ts") <= days[6])
        out = str(tmp_path / "facts")
        wrote = backfill_missing_days(spark, first_week, out)
        assert wrote == days[:7]
        # rerun on the same slice: sink current, nothing written
        assert backfill_missing_days(spark, first_week, out) == []
        # full source: only the remaining days land
        wrote2 = backfill_missing_days(spark, src, out)
        assert wrote2 == days[7:]
        back = read_parquet(spark, out)
        assert back.count() == src.count()
        # every partition present exactly once
        assert (
            back.select("event_date").distinct().count() == len(days)
        )

    def test_existing_partitions_untouched(self, spark, sf_dir, tmp_path):
        import os

        from assignment_2_dataengineering_spark.sources.io import backfill_missing_days
        from pyspark.sql import functions as F

        src = self._src(spark, sf_dir)
        days = sorted(
            r.d.isoformat()
            for r in src.select(F.to_date("ts").alias("d")).distinct().collect()
        )
        out = str(tmp_path / "facts")
        backfill_missing_days(spark, src.filter(F.to_date("ts") == days[0]), out)
        part = os.path.join(out, f"event_date={days[0]}")
        before = sorted(os.listdir(part))
        backfill_missing_days(spark, src, out)  # lands the other days
        assert sorted(os.listdir(part)) == before  # day-0 files untouched


def test_compact_parquet_in_place_stage_and_swap(spark, tmp_path):
    """The standing-job case the index sinks document: compacting a
    directory INTO ITSELF. Spark refuses to overwrite a read path, so
    the rewrite stages to a temp sibling and swaps; content identical,
    file count reduced, no leftover temp/backup dirs."""
    import os

    from assignment_2_dataengineering_spark.sources.io import compact_parquet

    p = str(tmp_path / "frag")
    spark.range(0, 1000).repartition(20).write.parquet(p)
    assert len([f for f in os.listdir(p) if f.endswith(".parquet")]) >= 20
    n_files = compact_parquet(spark.read.parquet(p), p, target_rows_per_file=500)
    assert n_files == 2
    assert len([f for f in os.listdir(p) if f.endswith(".parquet")]) == 2
    assert spark.read.parquet(p).count() == 1000
    assert {r[0] for r in spark.read.parquet(p).collect()} == set(range(1000))
    assert not os.path.exists(p + "._compact_tmp")
    assert not os.path.exists(p + "._compact_bak")


def test_compact_parquet_in_place_detects_partitioned_dataset(spark, tmp_path):
    """Round-4 advisor finding: in-place detection matched only the
    IMMEDIATE parent of each input file, so a hive-partitioned dataset
    (path/day=X/part.parquet) compacted into its own root fell through
    to a direct overwrite of a path being read. Prefix match must stage
    the swap instead."""
    import os

    from assignment_2_dataengineering_spark.sources.io import compact_parquet
    from pyspark.sql import functions as F

    p = str(tmp_path / "parts")
    (
        spark.range(0, 1000)
        .withColumn("day", (F.col("id") % 4).cast("int"))
        .repartition(8)
        .write.partitionBy("day")
        .parquet(p)
    )
    df = spark.read.parquet(p)
    compact_parquet(df, p, target_rows_per_file=500)
    got = spark.read.parquet(p)
    assert got.count() == 1000
    assert {r[0] for r in got.select("id").collect()} == set(range(1000))
    assert not os.path.exists(p + "._compact_tmp")
    assert not os.path.exists(p + "._compact_bak")


def test_compact_parquet_recovers_crashed_swap(spark, tmp_path):
    """The two-rename swap's crash windows, healed on the next run:
    (a) crash between the renames → table absent, data in .bak →
    restored; (b) crash after the swap, before cleanup → table present,
    stale .bak → deleted, not restored over the new data."""
    import os

    from assignment_2_dataengineering_spark.sources.io import compact_parquet

    # (a) table absent, .bak holds the data; a non-in-place caller
    # (df from elsewhere) triggers recovery before its own write
    p = str(tmp_path / "crashed")
    spark.range(0, 100).repartition(5).write.parquet(p)
    os.rename(p, p + "._compact_bak")
    src = str(tmp_path / "src")
    spark.range(0, 10).write.parquet(src)
    compact_parquet(spark.read.parquet(src), p, target_rows_per_file=50)
    assert not os.path.exists(p + "._compact_bak")
    assert spark.read.parquet(p).count() == 10  # restored, then written

    # (b) stale .bak next to a PRESENT table must be deleted
    q = str(tmp_path / "stale")
    spark.range(0, 100).repartition(5).write.parquet(q)
    spark.range(0, 1).write.parquet(q + "._compact_bak")
    compact_parquet(spark.read.parquet(q), q, target_rows_per_file=50)
    assert spark.read.parquet(q).count() == 100
    assert not os.path.exists(q + "._compact_bak")
    assert not os.path.exists(q + "._compact_tmp")


def test_backfill_skips_null_dates(spark, tmp_path):
    """A null ts row must not abort the whole backfill (None.isoformat
    crash) — valid days still land."""
    import datetime as dt

    from assignment_2_dataengineering_spark.sources.io import backfill_missing_days

    src = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (2, None), (3, dt.datetime(2024, 1, 2))],
        "id long, ts timestamp",
    )
    out = str(tmp_path / "sink")
    written = backfill_missing_days(spark, src, out)
    assert written == ["2024-01-01", "2024-01-02"]


def test_recover_compaction_standalone_heals_before_caller_read(spark, tmp_path):
    """Round-5 advisor finding: the primary in-place standing-job caller
    does spark.read.parquet(path) FIRST — after a crash between the two
    swap renames the table dir is absent, so that read raises before
    compact_parquet's internal recovery can run. The standalone
    recover_compaction(path) heals the crash window without needing a
    DataFrame."""
    import os

    from assignment_2_dataengineering_spark.sources.io import (
        compact_parquet,
        recover_compaction,
    )

    p = str(tmp_path / "standing")
    spark.range(0, 200).repartition(8).write.parquet(p)
    # simulate the crash-between-renames window
    os.rename(p, p + "._compact_bak")
    assert not os.path.isdir(p)
    assert recover_compaction(p) is True
    # the standing job's own read now succeeds, and the data is intact
    df = spark.read.parquet(p)
    assert df.count() == 200
    compact_parquet(df, p, target_rows_per_file=100)
    assert spark.read.parquet(p).count() == 200
    # no-op on a healthy table
    assert recover_compaction(p) is False
    # remote scheme: nothing to heal locally, explicit no-op
    assert recover_compaction("s3a://bucket/table") is False


def test_compact_parquet_uri_form_local_path_in_place(spark, tmp_path):
    """Round-5 advisor finding: a URI-form local target (file:/a/b) was
    classified in-place correctly but bak/tmp and the os.rename swap used
    the raw URI string, so recovery silently skipped and the swap raised
    FileNotFoundError. All local bookkeeping must run on the normalized
    path."""
    import os

    from assignment_2_dataengineering_spark.sources.io import compact_parquet

    p = str(tmp_path / "uriform")
    spark.range(0, 400).repartition(10).write.parquet(p)
    uri = "file://" + p  # triple-slash form: file:///abs/path
    n_files = compact_parquet(spark.read.parquet(uri), uri, target_rows_per_file=200)
    assert n_files == 2
    assert len([f for f in os.listdir(p) if f.endswith(".parquet")]) == 2
    assert spark.read.parquet(p).count() == 400
    assert not os.path.exists(p + "._compact_tmp")
    assert not os.path.exists(p + "._compact_bak")


def test_compact_parquet_remote_in_place_raises(tmp_path):
    """Round-5 judge item: the remote-scheme in-place guard
    (os.rename cannot stage a swap on s3a://) must fail loudly. Pinned
    with a stub DataFrame whose inputFiles() reports remote paths — no
    real object store needed."""
    import pytest

    from assignment_2_dataengineering_spark.sources.io import compact_parquet

    class _RemoteDF:
        def inputFiles(self):
            return ["s3a://bucket/table/part-00000.parquet"]

        def count(self):  # pragma: no cover - must not be reached
            raise AssertionError("guard must raise before any action")

    with pytest.raises(ValueError, match="in-place compaction"):
        compact_parquet(_RemoteDF(), "s3a://bucket/table", target_rows_per_file=100)
