"""Geo3D points — the spatial3d module analog (spatial3d/Geo3DPoint.java
newShapeQuery factories; geom/PlanetModel.java:141-173 ellipsoid scaling;
geom/GeoPoint.java:64-111 lat/lon -> (x, y, z); PointInGeo3DShapeQuery).

Ray/Arrow re-expression: Geo3D queries run over the SAME Morton-sorted
``spatial.parquet`` sidecar as the 2-D LatLonPoint family (search/
spatial.py) — each shape supplies a lat/lon prune box (its getBounds
analog) for the BKD row-group prune, then decides membership VECTORIZED
on the raw float64 lat/lon via unit-sphere vector math:

- great-circle planes through the origin (polygon edges, path cross-track
  normals) are EXACT on the ellipsoid too: positions scale by a positive
  magnitude along the direction, which never flips the sign of a dot
  product with an origin-plane normal;
- circle / path cutoffs compare CENTRAL ANGLES of the unit directions —
  exact for PlanetModel.SPHERE; for WGS84 this is the same approximation
  class the reference documents for its distance query ("may have up to
  0.5% error", Geo3DPoint.java:113-117).

Every shape also emits a DuckDB SQL twin of its own membership predicate
(``sql_expr``) so gates can oracle-check the full query path; the numpy
kernel and the SQL string are generated from the SAME edge/plane
constants and stay in lockstep.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from lucene_ray.search.spatial import EARTH_RADIUS_M, distance_box


# ------------------------------------------------------------- planet models

@dataclass(frozen=True)
class PlanetModel:
    """geom/PlanetModel.java:141-160 — semi-major/minor axes and derived
    scalings (normalized so the mean radius is 1.0)."""

    a: float
    b: float

    @property
    def mean_radius(self) -> float:
        return (2.0 * self.a + self.b) / 3.0

    @property
    def xy_scaling(self) -> float:
        return self.a / self.mean_radius

    @property
    def z_scaling(self) -> float:
        return self.b / self.mean_radius

    @property
    def scaled_flattening(self) -> float:
        return (self.xy_scaling - self.z_scaling) / self.xy_scaling

    def magnitude(self, ux, uy, uz):
        """computeDesiredEllipsoidMagnitude: scale factor from a unit
        direction to the ellipsoid surface point."""
        inv_xy2 = 1.0 / (self.xy_scaling * self.xy_scaling)
        inv_z2 = 1.0 / (self.z_scaling * self.z_scaling)
        return 1.0 / np.sqrt((ux * ux + uy * uy) * inv_xy2 + uz * uz * inv_z2)


SPHERE = PlanetModel(1.0, 1.0)
WGS84 = PlanetModel(6378137.0, 6356752.314245)


def unit_xyz(lat_deg, lon_deg):
    """Unit direction for (lat, lon) in degrees — the (cosLat*cosLon,
    cosLat*sinLon, sinLat) triple of GeoPoint.java:73."""
    la = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lo = np.radians(np.asarray(lon_deg, dtype=np.float64))
    cl = np.cos(la)
    return cl * np.cos(lo), cl * np.sin(lo), np.sin(la)


def geo_point(pm: PlanetModel, lat_deg: float, lon_deg: float):
    """Surface point (x, y, z) on the planet model (GeoPoint.java:110)."""
    ux, uy, uz = unit_xyz(lat_deg, lon_deg)
    m = pm.magnitude(ux, uy, uz)
    return float(m * ux), float(m * uy), float(m * uz)


def arc_distance(lat1, lon1, lat2: float, lon2: float):
    """Central angle (radians) between unit directions
    (GeoPoint.arcDistance, geom/GeoPoint.java:230)."""
    x1, y1, z1 = unit_xyz(lat1, lon1)
    x2, y2, z2 = unit_xyz(lat2, lon2)
    dot = x1 * x2 + y1 * y2 + z1 * z2
    return np.arccos(np.clip(dot, -1.0, 1.0))


_XYZ_SQL = (
    "cos(radians({lat}))*cos(radians({lon}))",
    "cos(radians({lat}))*sin(radians({lon}))",
    "sin(radians({lat}))",
)


def _dot_sql(lat_expr: str, lon_expr: str, v) -> str:
    """SQL for dot(unit(lat, lon), v) with v a constant 3-vector."""
    xs, ys, zs = (t.format(lat=lat_expr, lon=lon_expr) for t in _XYZ_SQL)
    return f"(({xs})*({v[0]!r}) + ({ys})*({v[1]!r}) + ({zs})*({v[2]!r}))"


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _norm(v):
    m = math.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    if m == 0.0:
        raise ValueError("degenerate edge: coincident or antipodal vertices")
    return (v[0] / m, v[1] / m, v[2] / m)


def _arc_lat_bounds(a, b) -> tuple[float, float]:
    """Exact latitude extremes of the minor great-circle arc from unit
    vector ``a`` to ``b`` (the getBounds contract): an arc's max/min
    latitude is attained at an endpoint OR at the great circle's apex
    (the point maximizing |z|, p ∝ ẑ - (ẑ·n)n) when that apex lies on
    the arc — a long mid-latitude edge can swing far poleward of both
    endpoints, so a fixed pad under-prunes."""
    zs = [a[2], b[2]]
    n = _norm(_cross(a, b))
    ref = _cross(a, b)  # orientation reference for the within-arc test

    def on_arc(p) -> bool:
        c1 = _cross(a, p)
        c2 = _cross(p, b)
        return (
            c1[0] * ref[0] + c1[1] * ref[1] + c1[2] * ref[2] >= 0.0
            and c2[0] * ref[0] + c2[1] * ref[1] + c2[2] * ref[2] >= 0.0
        )

    base = (-n[2] * n[0], -n[2] * n[1], 1.0 - n[2] * n[2])  # ẑ - (ẑ·n)n
    m = math.sqrt(base[0] ** 2 + base[1] ** 2 + base[2] ** 2)
    if m > 1e-15:
        apex = (base[0] / m, base[1] / m, base[2] / m)
        anti = (-apex[0], -apex[1], -apex[2])
        if on_arc(apex):
            zs.append(apex[2])
        if on_arc(anti):
            zs.append(anti[2])
    lo = math.degrees(math.asin(max(-1.0, min(1.0, min(zs)))))
    hi = math.degrees(math.asin(max(-1.0, min(1.0, max(zs)))))
    return lo, hi


def _boundary_lat_bounds(lats, lons, closed: bool) -> tuple[float, float]:
    """Latitude extremes over a vertex ring's (or open polyline's) arcs."""
    verts = [
        tuple(float(c) for c in unit_xyz(lats[i], lons[i]))
        for i in range(len(lats))
    ]
    lo, hi = 90.0, -90.0
    n = len(verts)
    last = n if closed else n - 1
    for i in range(last):
        a, b = verts[i], verts[(i + 1) % n]
        alo, ahi = _arc_lat_bounds(a, b)
        lo, hi = min(lo, alo), max(hi, ahi)
    return lo, hi


# ------------------------------------------------------------------- shapes
#
# Each shape is a frozen (hashable — the LRU query cache keys on the query)
# dataclass with:
#   bounds()  -> (lat_lo, lat_hi, lon_lo, lon_hi) conservative prune box
#   is_within(lat, lon) -> bool ndarray, membership on raw doubles
#   sql_expr(lat_expr, lon_expr) -> DuckDB twin of is_within


@dataclass(frozen=True)
class GeoStandardCircle:
    """geom/GeoStandardCircle.java — all points within ``cutoff`` radians
    of the center (newDistanceQuery: cutoff = radiusMeters / meanRadius,
    Geo3DUtil.java:152-162)."""

    lat: float
    lon: float
    cutoff: float  # radians

    def bounds(self):
        return distance_box(self.lat, self.lon, self.cutoff * EARTH_RADIUS_M)

    def is_within(self, lat, lon):
        return arc_distance(lat, lon, self.lat, self.lon) <= self.cutoff

    def sql_expr(self, lat_expr: str, lon_expr: str) -> str:
        c = unit_xyz(self.lat, self.lon)
        dot = _dot_sql(lat_expr, lon_expr, (float(c[0]), float(c[1]), float(c[2])))
        return f"acos(least(1.0, greatest(-1.0, {dot}))) <= {self.cutoff!r}"


@dataclass(frozen=True)
class GeoBBox:
    """geom/GeoBBoxFactory.java — lat/lon box, degrees, INCLUSIVE; a box
    with min_lon > max_lon crosses the dateline (GeoWideRectangle)."""

    min_lat: float
    max_lat: float
    min_lon: float
    max_lon: float

    @property
    def _wraps(self) -> bool:
        return self.min_lon > self.max_lon

    def bounds(self):
        if self._wraps:
            return self.min_lat, self.max_lat, -180.0, 180.0
        return self.min_lat, self.max_lat, self.min_lon, self.max_lon

    def is_within(self, lat, lon):
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        m = (lat >= self.min_lat) & (lat <= self.max_lat)
        if self._wraps:
            return m & ((lon >= self.min_lon) | (lon <= self.max_lon))
        return m & (lon >= self.min_lon) & (lon <= self.max_lon)

    def sql_expr(self, lat_expr: str, lon_expr: str) -> str:
        lat_c = (
            f"({lat_expr}) >= {self.min_lat!r} AND ({lat_expr}) <= {self.max_lat!r}"
        )
        if self._wraps:
            return (
                f"({lat_c} AND (({lon_expr}) >= {self.min_lon!r}"
                f" OR ({lon_expr}) <= {self.max_lon!r}))"
            )
        return (
            f"({lat_c} AND ({lon_expr}) >= {self.min_lon!r}"
            f" AND ({lon_expr}) <= {self.max_lon!r})"
        )


@dataclass(frozen=True)
class GeoConvexPolygon:
    """geom/GeoConvexPolygon.java — membership is sidedness against the
    great-circle plane of each edge (SidedPlane: the plane through the
    origin and both edge vertices, signed so the remaining vertices fall
    inside). Origin planes make this EXACT on the ellipsoid. Vertices are
    (lat, lon) degree tuples, clockwise on the outside per the reference
    convention; construction rejects non-convex rings like the reference
    does."""

    lats: tuple
    lons: tuple

    def _planes(self):
        n = len(self.lats)
        if n < 3:
            raise ValueError("polygon needs >= 3 vertices")
        verts = [unit_xyz(self.lats[i], self.lons[i]) for i in range(n)]
        verts = [(float(v[0]), float(v[1]), float(v[2])) for v in verts]
        planes = []
        for i in range(n):
            a, b = verts[i], verts[(i + 1) % n]
            nrm = _norm(_cross(a, b))
            sigma = 0.0
            for j in range(n):
                if j in (i, (i + 1) % n):
                    continue
                d = (
                    verts[j][0] * nrm[0]
                    + verts[j][1] * nrm[1]
                    + verts[j][2] * nrm[2]
                )
                if abs(d) > 1e-12:
                    if sigma != 0.0 and (d > 0) != (sigma > 0):
                        raise ValueError("polygon is not convex")
                    sigma = d
            if sigma == 0.0:
                raise ValueError("degenerate polygon: all vertices coplanar")
            s = 1.0 if sigma > 0 else -1.0
            planes.append((nrm[0] * s, nrm[1] * s, nrm[2] * s))
        return planes

    def bounds(self):
        # exact boundary-arc latitude extremes (a long edge can swing far
        # poleward of its endpoints); a pole INSIDE the ring extends the
        # box to it — membership is cheap, so just test both poles
        lo, hi = _boundary_lat_bounds(self.lats, self.lons, closed=True)
        if bool(self.is_within(90.0, 0.0)):
            hi = 90.0
        if bool(self.is_within(-90.0, 0.0)):
            lo = -90.0
        return lo, hi, -180.0, 180.0

    def is_within(self, lat, lon):
        x, y, z = unit_xyz(lat, lon)
        m = np.ones(np.shape(x), dtype=bool)
        for nx, ny, nz in self._planes():
            m &= (x * nx + y * ny + z * nz) >= 0.0
        return m

    def sql_expr(self, lat_expr: str, lon_expr: str) -> str:
        parts = [
            f"{_dot_sql(lat_expr, lon_expr, p)} >= 0.0" for p in self._planes()
        ]
        return "(" + " AND ".join(parts) + ")"


@dataclass(frozen=True)
class GeoStandardPath:
    """geom/GeoStandardPath.java — all points within ``cutoff`` radians of
    the polyline through the given (lat, lon) waypoints (newPathQuery:
    cutoff = pathWidthMeters / meanRadius). A point is in the path if it
    is within the cutoff of any segment (|cross-track angle| <= cutoff
    while the along-track angle lies inside the segment) or of any
    waypoint (the reference's SegmentEndpoint circles)."""

    lats: tuple
    lons: tuple
    cutoff: float  # radians

    def _segments(self):
        """Per segment: (A, n, t, seg_angle) with A the start unit vector,
        n the normalized great-circle plane normal (cross-track axis) and
        t = n x A (along-track sine axis)."""
        verts = [
            tuple(float(c) for c in unit_xyz(self.lats[i], self.lons[i]))
            for i in range(len(self.lats))
        ]
        segs = []
        for i in range(len(verts) - 1):
            a, b = verts[i], verts[i + 1]
            n = _norm(_cross(a, b))
            t = _cross(n, a)
            dot_ab = a[0] * b[0] + a[1] * b[1] + a[2] * b[2]
            seg_angle = math.acos(max(-1.0, min(1.0, dot_ab)))
            segs.append((a, n, t, seg_angle))
        return verts, segs

    def bounds(self):
        # boundary-arc latitude extremes widened by the cutoff angle (the
        # path's tube radius); exact arc extremes, not an endpoint pad
        lo, hi = _boundary_lat_bounds(self.lats, self.lons, closed=False)
        pad_deg = math.degrees(self.cutoff)
        return (
            max(lo - pad_deg, -90.0),
            min(hi + pad_deg, 90.0),
            -180.0,
            180.0,
        )

    def is_within(self, lat, lon):
        x, y, z = unit_xyz(lat, lon)
        m = np.zeros(np.shape(x), dtype=bool)
        verts, segs = self._segments()
        for a, n, t, seg_angle in segs:
            sin_xt = x * n[0] + y * n[1] + z * n[2]
            xt = np.arcsin(np.clip(sin_xt, -1.0, 1.0))
            # along-track angle of the projection onto the segment plane
            at = np.arctan2(
                x * t[0] + y * t[1] + z * t[2],
                x * a[0] + y * a[1] + z * a[2],
            )
            m |= (np.abs(xt) <= self.cutoff) & (at >= 0.0) & (at <= seg_angle)
        for v in verts:
            dot = np.clip(x * v[0] + y * v[1] + z * v[2], -1.0, 1.0)
            m |= np.arccos(dot) <= self.cutoff
        return m

    def sql_expr(self, lat_expr: str, lon_expr: str) -> str:
        verts, segs = self._segments()
        parts = []
        for a, n, t, seg_angle in segs:
            d_n = _dot_sql(lat_expr, lon_expr, n)
            d_t = _dot_sql(lat_expr, lon_expr, t)
            d_a = _dot_sql(lat_expr, lon_expr, a)
            parts.append(
                f"(abs(asin(least(1.0, greatest(-1.0, {d_n})))) <= "
                f"{self.cutoff!r} AND atan2({d_t}, {d_a}) >= 0.0 "
                f"AND atan2({d_t}, {d_a}) <= {seg_angle!r})"
            )
        for v in verts:
            d_v = _dot_sql(lat_expr, lon_expr, v)
            parts.append(
                f"(acos(least(1.0, greatest(-1.0, {d_v}))) <= {self.cutoff!r})"
            )
        return "(" + " OR ".join(parts) + ")"


@dataclass(frozen=True)
class GeoCompositeShape:
    """geom/GeoCompositeMembershipShape.java — union of member shapes
    (multi-polygon newPolygonQuery / newLargePolygonQuery; the reference's
    "large" variant differs only in construction-time legality checking
    and tiling, not membership semantics)."""

    shapes: tuple

    def bounds(self):
        bs = [s.bounds() for s in self.shapes]
        return (
            min(b[0] for b in bs),
            max(b[1] for b in bs),
            min(b[2] for b in bs),
            max(b[3] for b in bs),
        )

    def is_within(self, lat, lon):
        m = np.zeros(np.shape(np.asarray(lat)), dtype=bool)
        for s in self.shapes:
            m |= s.is_within(lat, lon)
        return m

    def sql_expr(self, lat_expr: str, lon_expr: str) -> str:
        return (
            "("
            + " OR ".join(s.sql_expr(lat_expr, lon_expr) for s in self.shapes)
            + ")"
        )


# ---------------------------------------------------------- query factories
# Geo3DPoint.java:122-215 — the public entry points.


def new_distance_query(field: str, pm: PlanetModel, lat: float, lon: float,
                       radius_m: float):
    from lucene_ray.search.query import Geo3DShapeQuery

    cutoff = radius_m / pm.mean_radius
    return Geo3DShapeQuery(field, GeoStandardCircle(lat, lon, cutoff))


def new_box_query(field: str, pm: PlanetModel, min_lat: float, max_lat: float,
                  min_lon: float, max_lon: float):
    from lucene_ray.search.query import Geo3DShapeQuery

    return Geo3DShapeQuery(field, GeoBBox(min_lat, max_lat, min_lon, max_lon))


def new_polygon_query(field: str, pm: PlanetModel, *polygons):
    """polygons: (lats_tuple, lons_tuple) convex rings, clockwise-outside."""
    from lucene_ray.search.query import Geo3DShapeQuery

    shapes = tuple(GeoConvexPolygon(tuple(la), tuple(lo)) for la, lo in polygons)
    shape = shapes[0] if len(shapes) == 1 else GeoCompositeShape(shapes)
    return Geo3DShapeQuery(field, shape)


def new_large_polygon_query(field: str, pm: PlanetModel, *polygons):
    """Membership-identical to new_polygon_query (the reference's "large"
    factory optimizes edge-count scaling, not semantics)."""
    return new_polygon_query(field, pm, *polygons)


def new_path_query(field: str, pm: PlanetModel, lats, lons, width_m: float):
    from lucene_ray.search.query import Geo3DShapeQuery

    cutoff = width_m / pm.mean_radius
    return Geo3DShapeQuery(field, GeoStandardPath(tuple(lats), tuple(lons), cutoff))
