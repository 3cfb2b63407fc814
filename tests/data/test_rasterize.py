"""Filled-polygon + stroke rasterization against known geometry
(VERDICT round-2 item 7: the reference fills crossing polygons — UniAD
nuscenes_e2e_dataset.py map gt — where round 1/2 drew thin point traces)."""

import numpy as np

from vidar_tpu.data.rasterize import fill_polygon, draw_polyline


def test_fill_axis_aligned_square():
    # square covering x,y in [0.25, 0.75] on a 40x40 grid
    ring = np.array([[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75]])
    m = fill_polygon(ring, 40, 40)
    # interior cell centers: indices 10..29 in both axes
    assert m[20, 20] == 1.0
    assert m[10, 10] == 1.0 and m[29, 29] == 1.0
    assert m[9, 20] == 0.0 and m[30, 20] == 0.0
    assert m[20, 9] == 0.0 and m[20, 30] == 0.0
    # area = 0.5 * 0.5 of the grid
    assert abs(m.mean() - 0.25) < 0.01
    # vertex order must not matter (even-odd fill)
    m2 = fill_polygon(ring[::-1], 40, 40)
    np.testing.assert_array_equal(m, m2)


def test_fill_triangle_area():
    ring = np.array([[0.1, 0.1], [0.9, 0.1], [0.1, 0.9]])
    m = fill_polygon(ring, 100, 100)
    # triangle area = 0.5 * 0.8 * 0.8 = 0.32 of the unit square
    assert abs(m.mean() - 0.32) < 0.01
    # filled, not an outline: an interior row has one contiguous run
    row = m[30]
    on = np.flatnonzero(row)
    assert len(on) > 10 and (np.diff(on) == 1).all()


def test_fill_clips_out_of_range_ring():
    # ring extends beyond [0, 1]: the visible part is x in [0, 0.5]
    ring = np.array([[-0.5, 0.2], [0.5, 0.2], [0.5, 0.8], [-0.5, 0.8]])
    m = fill_polygon(ring, 50, 50)
    assert m[25, 0] == 1.0 and m[25, 24] == 1.0
    assert m[25, 26] == 0.0
    assert abs(m.mean() - 0.5 * 0.6) < 0.02


def test_stroke_has_no_gaps_for_sparse_vertices():
    # a 2-point diagonal: every cell along it must be marked
    pts = np.array([[0.05, 0.05], [0.95, 0.95]])
    m = draw_polyline(pts, 64, 64, dilate=0)
    d = np.diagonal(m)
    assert d[4:60].min() == 1.0
    # interior is NOT filled
    assert m[5, 60] == 0.0


def test_stroke_closed_ring_draws_closure():
    pts = np.array([[0.2, 0.2], [0.8, 0.2], [0.8, 0.8], [0.2, 0.8]])
    m_open = draw_polyline(pts, 64, 64, closed=False, dilate=0)
    m_closed = draw_polyline(pts, 64, 64, closed=True, dilate=0)
    # closure segment is the left edge x=0.2, y in [0.2, 0.8]
    col = int(0.2 * 64)
    seg = m_closed[20:44, col]
    assert seg.min() == 1.0
    assert m_open[32, col] == 0.0
