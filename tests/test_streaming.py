import shutil

from spatialgraft.streaming import tile_rollup_batch, tile_rollup_stream


def _last_update_per_group(got):
    """'update' mode emits one row per changed group per trigger; the
    group's final count is its LAST update.  Counts are monotonically
    nondecreasing across triggers, so max(cnt) per (window_start, tile)
    selects it without needing batch ids."""
    return (got.groupby(["window_start", "tile"], as_index=False)
            .agg(cnt=("cnt", "max")))


def test_stream_matches_batch(spark, sf_smoke, tmp_path):
    events = spark.read.parquet(f"{sf_smoke}/events.parquet")
    want = tile_rollup_batch(events).toPandas()

    # streaming file source requires a directory
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_smoke}/events.parquet",
                stream_dir / "events.parquet")
    q = tile_rollup_stream(spark, str(stream_dir),
                           events.schema, query_name="t_rollup")
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM t_rollup").toPandas()
    finally:
        q.stop()

    cols = ["window_start", "tile", "cnt"]
    g = _last_update_per_group(got)[cols].sort_values(cols) \
        .reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert g.equals(w)
    assert len(g) > 0


def test_stream_multibatch_matches_batch(spark, tmp_path):
    """Two microbatches (maxFilesPerTrigger=1) over a DENSE stream —
    10 tiles x 20 events each, all within one 5-minute window, split
    in time order so every group is updated in BOTH batches and the
    watermark drops nothing.  The memory table then holds intermediate
    counts alongside final ones, and only the last-update-per-group
    read matches the batch twin (the sf events are too sparse for
    this: one row per group makes the multi-batch path vacuous)."""
    rows = [(i % 10, f"2024-01-01 00:00:{i % 200 // 10:02d}")
            for i in range(200)]
    events = spark.createDataFrame(rows, "event_id bigint, ts string") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts")
    want = tile_rollup_batch(events).toPandas()

    stream_dir = tmp_path / "events_stream2"
    stream_dir.mkdir()
    ordered = events.orderBy("ts", "event_id").collect()
    # two single-file halves split by event time (older first), so the
    # second microbatch never falls behind the watermark
    for i, chunk in enumerate((ordered[:100], ordered[100:])):
        tmp_out = tmp_path / f"half{i}"
        spark.createDataFrame(chunk, events.schema).coalesce(1) \
            .write.parquet(str(tmp_out))
        part = next(tmp_out.glob("part-*.parquet"))
        shutil.copy(part, stream_dir / f"b{i}.parquet")
    q = tile_rollup_stream(spark, str(stream_dir),
                           events.schema, query_name="t_rollup2",
                           max_files_per_trigger=1)
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM t_rollup2").toPandas()
    finally:
        q.stop()

    cols = ["window_start", "tile", "cnt"]
    g = _last_update_per_group(got)[cols].sort_values(cols) \
        .reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    # the multi-batch run must actually have produced intermediate rows
    # (otherwise this test is vacuous)
    assert len(got) > len(g)
    assert g.equals(w)
