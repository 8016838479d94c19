"""Error-identity of the grid-densification raise paths.

The reference's ``fill_empty_li`` (custom_dataclasses.py:893-924)
raises on three malformed grids: a value row with no line item and no
non-null value ("empty values"), a line item that already carries
values ("values already assigned" — reference: assign_values raises),
and ragged column counts ("number of columns not consistent"). The
chaos fuzz never triggers these through natural layouts (the grid
construction upholds the invariants), so they are pinned at the unit
level: the kernel must raise exactly when the reference raises, on the
same constructed grids.
"""

import pytest

from parsee_pdf_reader_spark.kernel.engine import (
    Item,
    KernelTableError,
    TableK,
)
from parsee_pdf_reader_spark.kernel.model import Tok


def _tok(x0, x1, y0, y1, text, row):
    return Tok(x0, x1, y0, y1, text, False, row)


def _kernel_table():
    return TableK([Item(_tok(0, 50, 80, 90, "a", 0)),
                   Item(_tok(0, 50, 60, 70, "b", 1))], 0)


def _reference_table(reference):
    from pdf_reader.custom_dataclasses import (
        BaseElement,
        ExtractedTable,
        LineItem,
    )

    li0 = LineItem(BaseElement(x0=0, x1=50, y0=80, y1=90, text="a",
                               row_index=0))
    li1 = LineItem(BaseElement(x0=0, x1=50, y0=60, y1=70, text="b",
                               row_index=1))
    return ExtractedTable([li0, li1], 0), BaseElement


def test_ragged_columns_raise_identically(reference):
    t_ref, BaseElement = _reference_table(reference)
    grid_ref = {
        0: [BaseElement(x0=60, x1=70, y0=80, y1=90, text="1",
                        row_index=0),
            BaseElement(x0=80, x1=90, y0=80, y1=90, text="2",
                        row_index=0)],
        1: [BaseElement(x0=60, x1=70, y0=60, y1=70, text="3",
                        row_index=1)],
    }
    with pytest.raises(Exception, match="columns not consistent"):
        t_ref.fill_empty_li(grid_ref)

    t = _kernel_table()
    grid = {0: [_tok(60, 70, 80, 90, "1", 0),
                _tok(80, 90, 80, 90, "2", 0)],
            1: [_tok(60, 70, 60, 70, "3", 1)]}
    with pytest.raises(KernelTableError, match="columns not consistent"):
        t.fill_empty_items(grid)


def test_all_null_value_row_raises_identically(reference):
    t_ref, BaseElement = _reference_table(reference)
    # row 7 has no line item and only null values -> no anchor element
    with pytest.raises(Exception, match="empty values"):
        t_ref.fill_empty_li({7: [None, None]})

    with pytest.raises(KernelTableError, match="empty values"):
        _kernel_table().fill_empty_items({7: [None, None]})


def test_consistent_grid_fills_identically(reference):
    """The non-raising path on the same constructed grid: dense rows,
    a missing row synthesized with an empty caption spanning the
    line-item area on BOTH engines."""
    t_ref, BaseElement = _reference_table(reference)
    grid_ref = {
        0: [BaseElement(x0=60, x1=70, y0=80, y1=90, text="1",
                        row_index=0)],
        1: [BaseElement(x0=60, x1=70, y0=60, y1=70, text="2",
                        row_index=1)],
        2: [BaseElement(x0=60, x1=70, y0=40, y1=50, text="3",
                        row_index=2)],
    }
    t_ref.fill_empty_li(grid_ref)

    t = _kernel_table()
    t.fill_empty_items({0: [_tok(60, 70, 80, 90, "1", 0)],
                        1: [_tok(60, 70, 60, 70, "2", 1)],
                        2: [_tok(60, 70, 40, 50, "3", 2)]})
    assert t.num_rows == t_ref.num_rows == 3
    assert t.num_cols == t_ref.num_cols == 1
    ref_rows = [(li.caption, [v.val for v in li.values])
                for li in t_ref.items]
    my_rows = [(li.caption, [v["v"] for v in li.values])
               for li in t.items]
    assert my_rows == ref_rows
