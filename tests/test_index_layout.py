from spatialgraft import datagen
from spatialgraft.extract import with_geometry
from spatialgraft.index import (range_filter_indexed, read_indexed,
                                write_indexed)
from spatialgraft.ops.range import range_filter
from spatialgraft.oracles import HOTSPOT


def test_indexed_layout_roundtrip_and_pruning(spark, sf_smoke, tmp_path):
    pts = with_geometry(datagen.documents_spans(spark, sf_smoke))
    path = str(tmp_path / "indexed")
    write_indexed(pts.select("doc_key", "mx", "my", "x", "y"), path)

    # results identical to the unindexed range filter
    got = (range_filter_indexed(spark, path, *HOTSPOT)
           .select("doc_key", "mx", "my").toPandas()
           .sort_values("doc_key").reset_index(drop=True))
    want = (range_filter(pts, *HOTSPOT)
            .select("doc_key", "mx", "my").toPandas()
            .sort_values("doc_key").reset_index(drop=True))
    assert got.equals(want)

    # directory pruning reaches the scan: PartitionFilters on pcell
    plan = (range_filter_indexed(spark, path, *HOTSPOT)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan and "pcell" in plan
    # and the box predicate is pushed to parquet
    assert "PushedFilters" in plan and "GreaterThanOrEqual(mx" in plan


def test_indexed_partition_count_bounded(spark, sf_smoke, tmp_path):
    import os
    pts = with_geometry(datagen.documents_spans(spark, sf_smoke))
    path = str(tmp_path / "indexed2")
    write_indexed(pts.select("doc_key", "mx", "my"), path)
    dirs = [d for d in os.listdir(path) if d.startswith("pcell=")]
    assert 0 < len(dirs) <= 128
    assert read_indexed(spark, path).count() == pts.count()


def test_indexed_write_parallelism_not_capped_by_pcell(spark, sf_smoke,
                                                      tmp_path):
    """Forced-wide write: n_tasks=256 must produce >128 data files —
    i.e. write parallelism follows the task count, not the 128 coarse
    directories (the old repartition('pcell') capped at 128 writer
    tasks, a straggler/giant-file factory at 100 TB) — while pruning
    and exactness stay intact."""
    import glob
    pts = with_geometry(datagen.documents_spans(spark, sf_smoke))
    path = str(tmp_path / "indexed_wide")
    write_indexed(pts.select("doc_key", "mx", "my"), path, n_tasks=256)
    files = glob.glob(f"{path}/pcell=*/part-*.parquet")
    assert len(files) > 128, f"only {len(files)} data files"
    # exactness + pruning unchanged on the wide layout
    got = (range_filter_indexed(spark, path, *HOTSPOT)
           .select("doc_key", "mx", "my").toPandas()
           .sort_values("doc_key").reset_index(drop=True))
    want = (range_filter(pts, *HOTSPOT)
            .select("doc_key", "mx", "my").toPandas()
            .sort_values("doc_key").reset_index(drop=True))
    assert got.equals(want)
    plan = (range_filter_indexed(spark, path, *HOTSPOT)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan and "pcell" in plan
    assert "PushedFilters" in plan and "GreaterThanOrEqual(mx" in plan
