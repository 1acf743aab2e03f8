"""facet.heatmap analog (relational.facet_heatmap; SURVEY.md §2.6 —
[8x] solr/core/.../component/SpatialHeatmapFacets.java +
HeatmapFacetCounter). Pinned against a brute-force numpy reference on
random points including exact box-edge/cell-boundary cases, at P=1 and
P=4."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from lucene_solr_ray.functions.relational import facet_heatmap

BOX = (-10.0, 30.0, 5.0, 45.0)
ROWS, COLS = 4, 5


def _brute(lat, lon):
    lat_lo, lat_hi, lon_lo, lon_hi = BOX
    ch = (lat_hi - lat_lo) / ROWS
    cw = (lon_hi - lon_lo) / COLS
    keep = (lat >= lat_lo) & (lat <= lat_hi) & (lon >= lon_lo) & (lon <= lon_hi)
    la, lo = lat[keep], lon[keep]
    r = np.minimum(np.floor((lat_hi - la) / ch), ROWS - 1).astype(np.int64)
    c = np.minimum(np.floor((lo - lon_lo) / cw), COLS - 1).astype(np.int64)
    df = pd.DataFrame({"grid_row": r, "grid_col": c})
    out = (df.groupby(["grid_row", "grid_col"]).size().rename("n")
             .reset_index().sort_values(["grid_row", "grid_col"])
             .reset_index(drop=True))
    return out.astype({"n": "int64"})


@pytest.mark.parametrize("P", [1, 4])
def test_heatmap_matches_brute(ray_session, P):
    import ray.data

    rng = np.random.default_rng(77)
    lat = rng.uniform(-90, 90, 5000)
    lon = rng.uniform(-180, 180, 5000)
    # exact edge/boundary plants: box corners, bottom/right edges (must
    # clamp into the last row/col), interior cell boundaries
    lat = np.concatenate([lat, [-10.0, 30.0, -10.0, 30.0, 0.0, 20.0]])
    lon = np.concatenate([lon, [5.0, 45.0, 45.0, 5.0, 13.0, 45.0]])
    ds = ray.data.from_arrow(pa.table({"lat": lat, "lon": lon})).repartition(P)
    got = facet_heatmap(ds, "lat", "lon", BOX, ROWS, COLS).to_pandas()
    want = _brute(lat, lon)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    # row 0 is the TOP band (max lat): every point in it is above the
    # second band's lat ceiling
    assert got["n"].sum() == int(
        ((lat >= BOX[0]) & (lat <= BOX[1])
         & (lon >= BOX[2]) & (lon <= BOX[3])).sum())


def test_heatmap_top_row_orientation(ray_session):
    import ray.data

    # one point near the top edge, one near the bottom
    ds = ray.data.from_arrow(pa.table({"lat": [29.9, -9.9], "lon": [10.0, 10.0]}))
    got = facet_heatmap(ds, "lat", "lon", BOX, ROWS, COLS).to_pandas()
    assert got["grid_row"].tolist() == [0, ROWS - 1]
