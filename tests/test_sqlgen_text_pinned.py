"""Pin the generated CTE texts byte-for-byte (r07 refactor guard).

The driver fingerprints oracle SQL text against the round-start tree, so
any sqlgen refactor (e.g. factoring fragments out for reuse) must leave
the emitted SQL byte-identical.  Hashes recorded from the round-7 start
tree (commit 34940a3)."""

import hashlib

from spatialgraft import sqlgen

PINNED = {
    "points_cte:spark": "53e7ded08c6c3c3b",
    "points_cte:duckdb": "53e34c2c5527915f",
    "boxes_cte:spark": "d380042bfa794381",
    "boxes_cte:duckdb": "d380042bfa794381",
    "data_boxes_cte:spark": "52d96766407ecc90",
    "data_boxes_cte:duckdb": "52d96766407ecc90",
    "knn_queries_cte:spark": "8e191091bf1a2ef1",
    "knn_queries_cte:duckdb": "8e191091bf1a2ef1",
    "polygons_cte:spark": "5a066e03b2e00b3a",
    "polygons_cte:duckdb": "5a066e03b2e00b3a",
    "concave_polygons_cte:spark": "90d811fc418a0389",
    "concave_polygons_cte:duckdb": "0e2ec2b00e4c645e",
}


def test_cte_texts_unchanged():
    for key, want in PINNED.items():
        name, dialect = key.split(":")
        got = hashlib.sha256(
            getattr(sqlgen, name)(dialect).encode()).hexdigest()[:16]
        assert got == want, f"{key} text changed: {got} != {want}"
