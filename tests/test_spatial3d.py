"""Geo3D (search/spatial3d.py, spatial3d/Geo3DPoint.java analog): planet
model math, shape membership vs brute force, SQL-twin lockstep, engine
integration over merged sidecars, distributed identity."""

import math

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- planet model


def test_planet_model_constants():
    """PlanetModel.java:141-160 derived scalings for WGS84."""
    from lucene_ray.search.spatial3d import SPHERE, WGS84

    assert WGS84.mean_radius == pytest.approx((2 * 6378137.0 + 6356752.314245) / 3)
    assert WGS84.xy_scaling == pytest.approx(6378137.0 / WGS84.mean_radius)
    assert WGS84.z_scaling == pytest.approx(6356752.314245 / WGS84.mean_radius)
    # flattening ~ 1/298.257
    assert WGS84.scaled_flattening == pytest.approx(1 / 298.2572236, rel=1e-6)
    assert SPHERE.xy_scaling == 1.0 and SPHERE.z_scaling == 1.0


def test_geo_point_lies_on_ellipsoid():
    """GeoPoint.java:73 computeDesiredEllipsoidMagnitude: the scaled point
    satisfies (x^2+y^2)/ab^2 + z^2/c^2 = 1 in normalized units."""
    from lucene_ray.search.spatial3d import WGS84, geo_point

    rng = np.random.default_rng(31)
    for _ in range(50):
        la, lo = rng.uniform(-90, 90), rng.uniform(-180, 180)
        x, y, z = geo_point(WGS84, la, lo)
        lhs = (x * x + y * y) / WGS84.xy_scaling**2 + z * z / WGS84.z_scaling**2
        assert lhs == pytest.approx(1.0, abs=1e-12)


def test_arc_distance_matches_haversine_on_sphere():
    """Central angle * mean radius == haversine metres (same sphere)."""
    from lucene_ray.search.spatial import EARTH_RADIUS_M, haversine_m
    from lucene_ray.search.spatial3d import arc_distance

    rng = np.random.default_rng(32)
    lat = rng.uniform(-89, 89, 500)
    lon = rng.uniform(-180, 180, 500)
    a = arc_distance(lat, lon, 12.34, 56.78) * EARTH_RADIUS_M
    b = haversine_m(lat, lon, 12.34, 56.78)
    assert np.allclose(a, b, rtol=1e-9, atol=1e-4)


# ------------------------------------------------------------------- shapes


def _rand_pts(n=4000, seed=33):
    rng = np.random.default_rng(seed)
    return rng.uniform(-90, 90, n), rng.uniform(-180, 180, n)


def test_convex_polygon_rejects_nonconvex():
    from lucene_ray.search.spatial3d import GeoConvexPolygon

    # a chevron: (0,0) pulled inside the hull of the other vertices
    bad = GeoConvexPolygon((30.0, 0.0, 30.0, 5.0), (0.0, 10.0, 20.0, 10.0))
    with pytest.raises(ValueError, match="convex"):
        bad._planes()


def test_polygon_membership_matches_pnpoly_away_from_edges():
    """For a small convex ring, spherical plane-sidedness and planar
    crossing-number agree except within a thin band near the edges (great
    circles vs rhumb-ish planar edges) — points >1 degree away from every
    edge must classify identically."""
    from lucene_ray.search.spatial import point_in_ring
    from lucene_ray.search.spatial3d import GeoConvexPolygon

    lats = (40.0, 50.0, 35.0, 12.0, 10.0)
    lons = (10.0, 35.0, 60.0, 50.0, 20.0)
    poly = GeoConvexPolygon(lats, lons)
    lat, lon = _rand_pts()
    got = poly.is_within(lat, lon)
    want = point_in_ring(lat, lon, lats, lons)
    # distance to the nearest vertex as a cheap edge-proximity proxy:
    # disagreements must hug the ring boundary
    disagree = got != want
    if disagree.any():
        from lucene_ray.search.spatial3d import arc_distance

        d = np.full(lat.shape, np.inf)
        n = len(lats)
        for i in range(n):
            a = np.radians(
                np.hypot(lat - lats[i], (lon - lons[i]) * math.cos(math.radians(lats[i])))
            )
            d = np.minimum(d, a)
        # every disagreement within ~3 degrees of the ring
        assert np.degrees(d[disagree]).max() < 15.0


def test_bbox_dateline_wrap():
    from lucene_ray.search.spatial3d import GeoBBox

    box = GeoBBox(-10.0, 10.0, 170.0, -170.0)
    lat = np.array([0.0, 0.0, 0.0, 20.0])
    lon = np.array([175.0, -175.0, 0.0, 175.0])
    assert box.is_within(lat, lon).tolist() == [True, True, False, False]


def test_path_membership_planted():
    from lucene_ray.search.spatial import EARTH_RADIUS_M
    from lucene_ray.search.spatial3d import GeoStandardPath

    # equator path lon 0 -> 10, width 200 km
    p = GeoStandardPath((0.0, 0.0), (0.0, 10.0), 200_000.0 / EARTH_RADIUS_M)
    lat = np.array([0.5, 0.5, 3.0, 0.0, 0.0])
    lon = np.array([5.0, 9.0, 5.0, -1.0, 11.9])
    # 0.5 deg ~ 55 km off-track: in; 3 deg ~ 333 km: out;
    # lon -1 is ~111 km before the start endpoint: in; 11.9 ~ 211 km past: out
    assert p.is_within(lat, lon).tolist() == [True, True, False, True, False]


def test_shape_sql_twins_match_numpy():
    """Every shape's sql_expr classifies random points identically to its
    numpy is_within (boundary measure zero for random floats)."""
    import duckdb
    import pyarrow as pa

    from lucene_ray.search import spatial3d as s3
    from lucene_ray.search.spatial import EARTH_RADIUS_M

    lat, lon = _rand_pts(seed=34)
    t = pa.table({"lat": lat, "lon": lon})
    con = duckdb.connect()
    con.register("t", t)
    shapes = [
        s3.GeoStandardCircle(40.7128, -74.0060, 2_500_000.0 / s3.WGS84.mean_radius),
        s3.GeoBBox(-20.5, 25.25, 160.0, -150.0),
        s3.GeoConvexPolygon((40.0, 50.0, 35.0, 12.0, 10.0), (10.0, 35.0, 60.0, 50.0, 20.0)),
        s3.GeoStandardPath((10.0, 20.0, 15.0), (-30.0, -10.0, 10.0), 700_000.0 / EARTH_RADIUS_M),
        s3.GeoCompositeShape(
            (
                s3.GeoConvexPolygon((-5.0, -8.0, -25.0, -28.0), (-80.0, -60.0, -62.0, -85.0)),
                s3.GeoConvexPolygon((60.0, 66.0, 70.0, 63.0), (5.0, 25.0, 5.0, -10.0)),
            )
        ),
    ]
    for sh in shapes:
        got = sh.is_within(lat, lon)
        want = (
            con.execute(f"SELECT {sh.sql_expr('lat', 'lon')} AS m FROM t")
            .fetchnumpy()["m"]
        )
        assert np.array_equal(got, want), type(sh).__name__


# ------------------------------------------------------------------- engine


@pytest.fixture(scope="module")
def geo_index(ray_session, tmp_path_factory):
    from lucene_ray.index.builder import build_index
    from lucene_ray.index.corpus import documents_as_corpus
    from lucene_ray.index.merge import TieredMergePolicy, maybe_merge

    ix = str(tmp_path_factory.mktemp("geo3d") / "ix")
    corpus = documents_as_corpus(SF)
    build_index([corpus], ix, target_docs=128, point2d_fields=("loc",))
    maybe_merge(ix, TieredMergePolicy(), use_ray=False)
    return ix


def _truth():
    import pyarrow.parquet as pq

    from lucene_ray.search import spatial as sp

    ids = (
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
        .column("doc_id")
        .to_numpy()
    )
    return ids, sp.synth_lat(ids), sp.synth_lon(ids)


def test_engine_queries_match_bruteforce(geo_index):
    """Every Geo3DPoint factory through the merged-sidecar engine equals
    direct shape membership on the synthetic truth."""
    from lucene_ray.ops.bm25docs import _geo3d_queries
    from lucene_ray.search.engine import IndexSearcher
    from lucene_ray.search.query import BooleanQuery

    ids, lat, lon = _truth()
    s = IndexSearcher(geo_index)
    for qid, q in _geo3d_queries():
        td = s.search(BooleanQuery(must=[q]), 1_000_000)
        want = np.sort(ids[q.shape.is_within(lat, lon)])
        assert np.array_equal(np.sort(td.docids), want), qid


def test_random_circles_match_bruteforce(geo_index):
    from lucene_ray.search import spatial3d as s3
    from lucene_ray.search.engine import IndexSearcher
    from lucene_ray.search.query import BooleanQuery

    ids, lat, lon = _truth()
    s = IndexSearcher(geo_index)
    rng = np.random.default_rng(35)
    for _ in range(15):
        qla, qlo = rng.uniform(-85, 85), rng.uniform(-180, 180)
        r = rng.uniform(2e5, 6e6)
        q = s3.new_distance_query("loc", s3.WGS84, qla, qlo, r)
        td = s.search(BooleanQuery(must=[q]), 1_000_000)
        want = np.sort(ids[q.shape.is_within(lat, lon)])
        assert np.array_equal(np.sort(td.docids), want)


def test_polar_cap_polygon_bounds_and_engine(geo_index):
    """A ring of lat-40 vertices 120 degrees apart CONTAINS the north pole
    and its edges swing to ~59 degrees — a fixed endpoint pad would prune
    matching high-latitude docs (the round-5 bounds fix): bounds() must
    reach the pole and the engine must equal brute force."""
    from lucene_ray.search import spatial3d as s3
    from lucene_ray.search.engine import IndexSearcher
    from lucene_ray.search.query import BooleanQuery

    poly = s3.GeoConvexPolygon((40.0, 40.0, 40.0), (0.0, 120.0, -120.0))
    assert bool(poly.is_within(90.0, 0.0))  # pole inside
    lo, hi, _, _ = poly.bounds()
    assert hi == 90.0 and lo <= 40.0
    # edge apex: the lat-40 edge spanning 120 degrees of longitude peaks
    # near 59.2 degrees — a mid-edge point just below is OUTSIDE the ring
    # boundary? No: above the edge (poleward) is INSIDE for this ring.
    assert bool(poly.is_within(70.0, 60.0))
    assert not bool(poly.is_within(39.0, 0.0))

    ids, lat, lon = _truth()
    s = IndexSearcher(geo_index)
    q = s3.new_polygon_query("loc", s3.WGS84, ((40.0, 40.0, 40.0), (0.0, 120.0, -120.0)))
    td = s.search(BooleanQuery(must=[q]), 1 << 20)
    want = np.sort(ids[poly.is_within(lat, lon)])
    assert np.array_equal(np.sort(td.docids), want)


def test_arc_lat_bounds_exact():
    from lucene_ray.search.spatial3d import _arc_lat_bounds, unit_xyz

    a = tuple(float(c) for c in unit_xyz(40.0, 0.0))
    b = tuple(float(c) for c in unit_xyz(40.0, 120.0))
    lo, hi = _arc_lat_bounds(a, b)
    # apex of the great circle through two lat-40 points 120 deg apart:
    # tan(apex) = tan(40)/cos(60)
    import math

    want = math.degrees(math.atan(math.tan(math.radians(40.0)) / math.cos(math.radians(60.0))))
    assert hi == pytest.approx(want, abs=1e-9)
    assert lo == pytest.approx(40.0, abs=1e-9)
    # short equatorial arc: extremes at the endpoints
    c = tuple(float(x) for x in unit_xyz(0.0, 0.0))
    d = tuple(float(x) for x in unit_xyz(0.0, 10.0))
    lo2, hi2 = _arc_lat_bounds(c, d)
    assert lo2 == pytest.approx(0.0, abs=1e-12)
    assert hi2 == pytest.approx(0.0, abs=1e-12)


def test_distributed_identity(geo_index, ray_session):
    from lucene_ray.ops.bm25docs import _geo3d_queries
    from lucene_ray.search.distributed import DistributedSearcher
    from lucene_ray.search.engine import IndexSearcher
    from lucene_ray.search.query import BooleanQuery

    local = IndexSearcher(geo_index)
    dist = DistributedSearcher(geo_index, n_shards=3, pruned=False)
    for qid, q in _geo3d_queries():
        bq = BooleanQuery(should=[q])
        a = sorted(local.search(bq, 1 << 20).docids.tolist())
        b = sorted(dist.search(bq, 1 << 20).docids.tolist())
        assert a == b, qid
