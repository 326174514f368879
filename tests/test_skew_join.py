from spatialgraft import datagen
from spatialgraft.extract import with_geometry
from spatialgraft.ops import range as rops
from spatialgraft.partitioner import plan_partitions


def test_salted_join_identical_and_nonvacuous(spark, sf_correct):
    pts = with_geometry(datagen.documents_spans(spark, sf_correct))
    boxes = datagen.query_boxes(spark, sf_correct)
    plan = plan_partitions(pts.select("doc_key", "mx", "my"))

    # the skewed fixture must actually trigger salting
    max_splits = max(ns for _, ns in plan.assignment.values())
    assert max_splits > 1, "skew fixture produced no salted cells"

    base = (rops.range_join_count(pts, boxes).toPandas()
            .sort_values("box_id").reset_index(drop=True))
    salted = (rops.range_join_count_salted(pts, boxes, plan).toPandas()
              .sort_values("box_id").reset_index(drop=True))
    assert base.equals(salted)
