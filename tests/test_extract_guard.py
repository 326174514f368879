"""The span->geometry extractor must misattribute nothing: a batch
where one doc has two geo spans and another has zero passes a pure
count check but must fail the per-parent alignment check."""

import pyarrow as pa
import pytest

from spatialgraft.extract import _one_per_parent


def test_misaligned_batch_rejected():
    values = pa.array(["POINT(1 1)", "POINT(2 2)"])
    parents = pa.array([0, 0], type=pa.int64())  # doc0 x2, doc1 x0
    with pytest.raises(ValueError, match="misaligned"):
        _one_per_parent(values, parents, 2, "geo")


def test_aligned_batch_passes():
    values = pa.array(["a", "b"])
    parents = pa.array([0, 1], type=pa.int64())
    assert _one_per_parent(values, parents, 2, "x") is values


def test_empty_batch_passes():
    v = pa.array([], type=pa.string())
    p = pa.array([], type=pa.int64())
    assert len(_one_per_parent(v, p, 0, "x")) == 0


def test_query_box_with_p_exact():
    """sFilter empty-area ratio: exact from the presence set."""
    from spatialgraft import config as C
    from spatialgraft.sfilter import query_box_with_p
    # one cell present: a box covering exactly that cell -> 0.0 empty
    cell = 5 * C.CELL_CY + 7
    x0 = 5 * C.WORLD_MX // C.CELL_CX + 1
    y0 = 7 * C.WORLD_MY // C.CELL_CY + 1
    assert query_box_with_p({cell}, x0, y0, x0, y0) == 0.0
    # empty presence set -> everything empty
    assert query_box_with_p(set(), x0, y0, x0, y0) == 1.0
    # 2-cell cover with one present -> 0.5
    x1 = 6 * C.WORLD_MX // C.CELL_CX + 1
    assert query_box_with_p({cell}, x0, y0, x1, y0) == 0.5
