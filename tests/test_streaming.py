import shutil

from spatialgraft.streaming import tile_rollup_batch, tile_rollup_stream


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
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert g.equals(w)
    assert len(g) > 0
