"""Generate the frozen golden fixtures (FIXTURES.md §E) from the
single-node PYTHON oracles (never from Spark — the goldens exist to
catch engine drift, so they must come from the independent path).

Run once and commit the parquet; tests/test_goldens.py asserts the
engine reproduces them row-for-row.  Regenerate only when the pinned
semantics intentionally change (like the reference's
GENERATE_GOLDEN_ARCHIVES flow, tests/stitching/s3/
test_grid_file.py:91-99).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from earth_data_kit_spark.grid import affine, cells, geom, transform  # noqa: E402
from earth_data_kit_spark.sources.pages import (  # noqa: E402
    expected_text,
    mutate_text,
    mutate_url,
    pages_cte_sql,
)
from earth_data_kit_spark.text.extract import text_sha256  # noqa: E402

SF = "/root/testdata/sf0.001"
OUT = REPO / "goldens"
OUT.mkdir(exist_ok=True)

import __spark_entry__ as em  # noqa: E402

# pages metadata via DuckDB (the engine-independent evaluator)
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
pages = con.execute(
    f"WITH pages AS ({pages_cte_sql()}) SELECT p.*, d.text AS doc_text "
    f"FROM pages p JOIN documents d USING (doc_id) ORDER BY page_id"
).fetchdf()

# 1. extracted-text golden: (url, sha256(extract_text(render_html)))
# with the same url/text mutations the pages builder applies
final_urls, shas = [], []
for u, t, la, lo, hh, pid in zip(
    pages["url"], pages["doc_text"], pages["lat"], pages["lon"],
    pages["h"], pages["page_id"],
):
    final_urls.append(mutate_url(u, la, lo, int(hh)))
    shas.append(text_sha256(expected_text(mutate_text(t, la, lo, int(hh)), int(pid))))
ext = pd.DataFrame(
    {"page_id": pages["page_id"], "url": final_urls, "text_sha256": shas}
)
ext.to_parquet(OUT / "extracted_text.parquet", index=False)

# 2./3. tile assignments + clip windows from pure affine math
GT1, GT5 = 463.3127165274999, -463.3127165277084
X0, Y0 = 1111950.5196670, 5559752.5983330
T = 2400
rows, clips = [], []
for band in ("Nadir_Reflectance_Band3", "Nadir_Reflectance_Band7"):
    exts = {}
    for tile, y0 in (("h19v04", Y0), ("h19v05", Y0 + GT5 * T)):
        exts[tile] = affine.extent_from_geotransform((X0, GT1, 0, y0, 0, GT5), T, T)
    union = affine.mosaic_extent(list(exts.values()))
    mx, my = affine.mosaic_size(union, GT1, GT5)
    for tile, e in exts.items():
        p = affine.tile_placement(e, union, GT1, GT5, T, T)
        rows.append(("2017-01-01", band, tile, *p[:2], *p[2:4], T, T, mx, my))
    (ulx,), (uly,) = transform.forward(transform.SINUSOIDAL, [em.ALBANIA_BBOX[0]], [em.ALBANIA_BBOX[3]])
    (lrx,), (lry,) = transform.forward(transform.SINUSOIDAL, [em.ALBANIA_BBOX[2]], [em.ALBANIA_BBOX[1]])
    w = affine.clip_window((union[0], GT1, 0, union[3], 0, GT5), ulx, uly, lrx, lry)
    clips.append(("2017-01-01", band, *w))

pd.DataFrame(
    rows,
    columns=[
        "date", "band", "tile_name", "src_xoff", "src_yoff",
        "dst_xoff", "dst_yoff", "xsize", "ysize", "mosaic_xsize", "mosaic_ysize",
    ],
).to_parquet(OUT / "assignments_modis.parquet", index=False)
pd.DataFrame(
    clips,
    columns=["date", "band", "xoff", "yoff", "xsize", "ysize", "out_origin_x", "out_origin_y"],
).to_parquet(OUT / "clips_modis.parquet", index=False)

# sanity: golden VRT values
a = pd.read_parquet(OUT / "assignments_modis.parquet")
assert set(map(tuple, a[["tile_name", "dst_yoff"]].values)) == {("h19v04", 0), ("h19v05", 2400)}
c = pd.read_parquet(OUT / "clips_modis.parquet")
assert tuple(c.iloc[0][["xoff", "yoff", "xsize", "ysize"]]) == (1005, 1754, 480, 735)

# 4. PIP join rows from the numpy oracle (incl. concave + holed WKTs)
POLYS = [
    ("CC", "POLYGON ((0 0, 30 0, 30 10, 10 10, 10 30, 30 30, 30 40, 0 40, 0 0))"),
    ("HH", "POLYGON ((-60 -20, -20 -20, -20 20, -60 20, -60 -20), (-45 -5, -35 -5, -35 5, -45 5, -45 -5))"),
]
pip_rows = []
lons, lats = pages["lon"].values, pages["lat"].values
cids = cells.cell_id(lons, lats, em.CELL_RES)
for code, _, xmin, ymin, xmax, ymax in em.COUNTRIES:
    m = (lons >= xmin) & (lons <= xmax) & (lats >= ymin) & (lats <= ymax)
    for pid, cid in zip(pages["page_id"].values[m], cids[m]):
        pip_rows.append((int(pid), int(cid), code))
for code, wkt in POLYS:
    shell, holes = geom.parse_wkt_polygon(wkt)
    m = geom.point_in_polygon(lons, lats, shell, holes)
    for pid, cid in zip(pages["page_id"].values[m], cids[m]):
        pip_rows.append((int(pid), int(cid), code))
pd.DataFrame(pip_rows, columns=["page_id", "cell", "code"]).to_parquet(
    OUT / "pip_rows.parquet", index=False
)

# 5. kNN golden: brute-force haversine, K=5
knn_rows = []
for qid, qlat, qlon in em.KNN_QUERIES:
    d = geom.haversine_m(qlat, qlon, lats, lons)
    order = np.lexsort((pages["page_id"].values, d))[:5]
    for rank, i in enumerate(order, 1):
        knn_rows.append((qid, rank, int(pages["page_id"].values[i]), float(d[i])))
pd.DataFrame(knn_rows, columns=["query_id", "rank", "page_id", "dist_m"]).to_parquet(
    OUT / "knn_rows.parquet", index=False
)

# 6. band-config groups (A2 round6+float32 quirk)
rx, ry = affine.rounded_res((X0, GT1, 0, Y0, 0, GT5))
pd.DataFrame(
    [
        (1, b, "Int16", rx, ry, "sinusoidal", 2, ["h19v04", "h19v05"])
        for b in ("Nadir_Reflectance_Band3", "Nadir_Reflectance_Band7")
    ],
    columns=["source_idx", "description", "dtype", "x_res", "y_res", "crs", "n_tiles", "tiles"],
).to_parquet(OUT / "band_groups.parquet", index=False)

# 7. text sketches at sf0.01: per-doc simhash + minhash signature
# from the single-node python oracle.  These feed the driver's
# dd_simhash_pairs / dd_minhash_pairs DuckDB oracles: the sketch
# *computation* is pinned here (and unit-tested), while the oracle
# SQL re-derives the banded self-join + estimator arithmetic
# independently — a differential test of the distributed LSH
# machinery against a driver-side recompute.
from earth_data_kit_spark.text import analysis  # noqa: E402

docs01 = duckdb.connect().execute(
    "SELECT doc_id, text FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
    " ORDER BY doc_id"
).fetchall()
sk = pd.DataFrame(
    {
        "doc_id": [d for d, _ in docs01],
        "simhash": [analysis.simhash64(t or "") for _, t in docs01],
        "minhash_sig": [analysis.minhash_signature(t or "", 64, 5) for _, t in docs01],
    }
)
sk.to_parquet(OUT / "text_sketches_sf001.parquet", index=False)

print("goldens written:", sorted(p.name for p in OUT.glob("*.parquet")))
print("rows:", {p.name: len(pd.read_parquet(p)) for p in OUT.glob("*.parquet")})
