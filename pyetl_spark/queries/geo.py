"""Spatial proximity queries — the grid-cell-bucketed radius join.

No fixture table carries coordinates, so points derive DETERMINISTICALLY
from customer keys (integer hash → millidegree grid → exact doubles),
giving both engines the identical point set. Geometry is PLANAR in
degree units (the bucketing pattern is the point here; swapping the
distance expression for haversine changes one projection, not the plan
— noted below because trig libms differ 1 ulp across engines, which a
radius-boundary membership test must respect).

The scale pattern (the reason this family exists): a radius join is a
θ-join — naively quadratic. Bucketing snaps every point to a grid cell
of side ≥ radius; a probe can only match points in its 3×3 neighbor
cells, so the join becomes an EQUI-join on cell id followed by an exact
distance filter — candidates ∝ density·9·cell_area, never |points|².
This is the same sketch-proposes / exact-disposes shape as the MinHash
and Bloom families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.parity import R, rnd
from pyetl_spark.registry import query
from pyetl_spark.tables import load_tables

#: radius (degree units) == cell side — the 3x3 neighborhood is then
#: guaranteed to cover the disk.
_RADIUS = 20.0

_LAT_SQL = "(CAST((c_custkey * 9973) % 120000 AS DOUBLE) / 1000.0 - 60.0)"
_LON_SQL = "(CAST((c_custkey * 7919) % 360000 AS DOUBLE) / 1000.0 - 180.0)"


def _lat():
    return (
        ((F.col("c_custkey") * 9973) % 120000).cast("double")
        / F.lit(1000.0)
        - F.lit(60.0)
    )


def _lon():
    return (
        ((F.col("c_custkey") * 7919) % 360000).cast("double")
        / F.lit(1000.0)
        - F.lit(180.0)
    )


@query(
    "geo_radius_join_bucketed",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
      FROM customer
    ),
    probes AS (SELECT * FROM pts WHERE id % 97 = 0)
    SELECT p.id AS probe_id, q.id AS point_id,
           {R("sqrt((p.lat - q.lat) * (p.lat - q.lat)"
              " + (p.lon - q.lon) * (p.lon - q.lon))", 4)} AS dist
    FROM probes p JOIN pts q
      ON q.id <> p.id
     AND (p.lat - q.lat) * (p.lat - q.lat)
         + (p.lon - q.lon) * (p.lon - q.lon) <= {_RADIUS} * {_RADIUS}
    """,
)
def geo_radius_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join (all points within 20 degree-units of each probe)
    via grid-cell bucketing: points snap to cells of side == radius,
    probes explode to their 3×3 neighbor cells, the join is an EQUI-join
    on cell id, and the exact planar distance filter disposes — candidate
    count scales with local density, never |points|². The oracle computes
    the naive θ-join; identical output is the completeness proof of the
    3×3 cover.

    Membership is decided by a polynomial expression over exactly-derived
    doubles (millidegree integer grid → /1000), so the row set is
    bit-deterministic on both engines — the reason the distance is planar
    here: a haversine variant adds trig whose 1-ulp libm divergence could
    flip a point sitting exactly on the radius (swap the expression and
    keep the plan when the data is real GPS and the boundary is fuzzy).
    At 100 TB: points are bucketed once (write-time layout on cell id
    makes this join shuffle-free); probes broadcast."""
    c = load_tables(spark, sf_dir).customer
    pts = c.select(
        F.col("c_custkey").alias("id"),
        _lat().alias("lat"),
        _lon().alias("lon"),
    )
    cellx = F.floor(F.col("lat") / F.lit(_RADIUS)).cast("long")
    celly = F.floor(F.col("lon") / F.lit(_RADIUS)).cast("long")
    pts_cells = pts.select(
        "id", "lat", "lon", cellx.alias("cx"), celly.alias("cy")
    )
    probes = pts_cells.filter(F.col("id") % 97 == 0)
    neigh = F.explode(
        F.array(
            *[
                F.struct(
                    (F.col("cx") + dx).alias("ncx"),
                    (F.col("cy") + dy).alias("ncy"),
                )
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    )
    probe_cells = probes.select(
        F.col("id").alias("probe_id"),
        F.col("lat").alias("plat"),
        F.col("lon").alias("plon"),
        neigh.alias("n"),
    ).select("probe_id", "plat", "plon", "n.ncx", "n.ncy")
    d2 = (F.col("plat") - F.col("lat")) * (
        F.col("plat") - F.col("lat")
    ) + (F.col("plon") - F.col("lon")) * (F.col("plon") - F.col("lon"))
    return (
        F.broadcast(probe_cells)
        .join(
            pts_cells,
            (F.col("ncx") == F.col("cx")) & (F.col("ncy") == F.col("cy")),
        )
        .filter(
            (F.col("id") != F.col("probe_id"))
            & (d2 <= F.lit(_RADIUS * _RADIUS))
        )
        .select(
            "probe_id",
            F.col("id").alias("point_id"),
            rnd(F.sqrt(d2), 4).alias("dist"),
        )
    )


#: Literal test polygons in the integer point space [0,120000)x[0,360000):
#: a triangle, a CONCAVE pentagon (the case centroid/bbox tests get
#: wrong), and an axis-aligned rectangle. Vertices counter-clockwise;
#: closing edge included below. Single source of truth for BOTH engines.
_POLYGONS: dict[int, list[tuple[int, int]]] = {
    1: [(10000, 10000), (50000, 10000), (30000, 60000)],
    2: [
        (60000, 100000),
        (110000, 100000),
        (110000, 200000),
        (85000, 140000),
        (60000, 200000),
    ],
    3: [(20000, 250000), (100000, 250000), (100000, 350000), (20000, 350000)],
}


def _polygon_edges() -> list[tuple[int, int, int, int, int]]:
    rows = []
    for pid, verts in _POLYGONS.items():
        for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1]):
            rows.append((pid, x1, y1, x2, y2))
    return rows


def _edges_values_sql() -> str:
    return ", ".join(
        f"({p}, {x1}, {y1}, {x2}, {y2})" for p, x1, y1, x2, y2 in _polygon_edges()
    )


@query(
    "geo_point_in_polygon",
    oracle=f"""
    WITH edges(poly_id, x1, y1, x2, y2) AS (VALUES {_edges_values_sql()}),
    pts AS (
      SELECT c_custkey,
             (c_custkey * 9973) % 120000 AS px,
             (c_custkey * 7919) % 360000 AS py
      FROM customer
    ),
    hits AS (
      SELECT p.c_custkey, e.poly_id,
             CASE WHEN ((e.y1 <= p.py AND e.y2 > p.py)
                     OR (e.y2 <= p.py AND e.y1 > p.py))
                  AND (CASE WHEN e.y2 > e.y1
                       THEN (p.px - e.x1) * (e.y2 - e.y1)
                            - (p.py - e.y1) * (e.x2 - e.x1) < 0
                       ELSE (p.px - e.x1) * (e.y2 - e.y1)
                            - (p.py - e.y1) * (e.x2 - e.x1) > 0 END)
             THEN 1 ELSE 0 END AS crossed
      FROM pts p CROSS JOIN edges e
    )
    SELECT poly_id, CAST(count(*) AS BIGINT) AS n_inside
    FROM (
      SELECT c_custkey, poly_id
      FROM hits GROUP BY c_custkey, poly_id
      HAVING sum(crossed) % 2 = 1
    )
    GROUP BY poly_id
    """,
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment by ray casting, ALL-INTEGER: count
    customers (deterministic key-derived integer coordinates) inside
    each of three literal polygons — including a concave one, the case
    bounding-box/centroid shortcuts silently get wrong. A +x ray from
    the point crosses edge (x1,y1)→(x2,y2) iff the edge straddles py on
    a half-open interval (vertex-hit safe) and the point sits left of
    the edge line — decided by the sign of the 64-bit integer cross
    product (px−x1)(y2−y1) − (py−y1)(x2−x1), never a float division, so
    boundary parity cannot split across engines (coords < 3.6e5 keep
    products < 1.3e11, exact in BIGINT).

    Plan: points × 14 literal edges is a broadcast nested-loop over a
    constant dim (whitelisted, like vec_cosine_topk's probe pass), then
    a (point, polygon) parity aggregate and a per-polygon count — one
    fact-side shuffle. At 100 TB with real polygon sets, the same query
    gates on a grid-cell equi-join first (geo_radius_join_bucketed's
    3×3 pattern generalizes to polygon bbox cells) and ray-casts only
    in-cell candidates; the parity kernel is unchanged."""
    t = load_tables(spark, sf_dir)
    edges = spark.createDataFrame(
        _polygon_edges(), "poly_id int, x1 long, y1 long, x2 long, y2 long"
    )
    pts = t.customer.select(
        "c_custkey",
        ((F.col("c_custkey") * 9973) % 120000).alias("px"),
        ((F.col("c_custkey") * 7919) % 360000).alias("py"),
    )
    e = F.broadcast(edges)
    straddles = (
        (F.col("y1") <= F.col("py")) & (F.col("y2") > F.col("py"))
    ) | ((F.col("y2") <= F.col("py")) & (F.col("y1") > F.col("py")))
    cross = (F.col("px") - F.col("x1")) * (F.col("y2") - F.col("y1")) - (
        F.col("py") - F.col("y1")
    ) * (F.col("x2") - F.col("x1"))
    left_of = F.when(F.col("y2") > F.col("y1"), cross < 0).otherwise(
        cross > 0
    )
    crossed = F.when(straddles & left_of, F.lit(1)).otherwise(F.lit(0))
    return (
        pts.crossJoin(e)
        .select("c_custkey", "poly_id", crossed.alias("crossed"))
        .groupBy("c_custkey", "poly_id")
        .agg(F.sum("crossed").alias("nc"))
        .filter(F.col("nc") % 2 == 1)
        .groupBy("poly_id")
        .agg(F.count(F.lit(1)).alias("n_inside"))
    )


#: grid side (degree units) for the density surface — 12 x 36 = 432
#: cells over the full lat/lon range, so the smoothed cell table is
#: bounded by GEOGRAPHY, not by data volume.
_DENS_CELL = 10.0


@query(
    "geo_grid_density",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
      FROM customer
    ),
    cells AS (
      SELECT CAST(floor(lat / {_DENS_CELL}) AS BIGINT) AS cx,
             CAST(floor(lon / {_DENS_CELL}) AS BIGINT) AS cy,
             count(*) AS n
      FROM pts GROUP BY 1, 2
    ),
    offs AS (
      SELECT dx.d AS dx, dy.d AS dy
      FROM (VALUES (-1), (0), (1)) dx(d), (VALUES (-1), (0), (1)) dy(d)
    ),
    smooth AS (
      SELECT c.cx + o.dx AS cx, c.cy + o.dy AS cy, sum(c.n) AS density
      FROM cells c, offs o
      GROUP BY 1, 2
    )
    SELECT s.cx, s.cy,
           CAST(c.n AS BIGINT) AS n_points,
           CAST(s.density AS BIGINT) AS density_3x3
    FROM smooth s JOIN cells c ON s.cx = c.cx AND s.cy = c.cy
    ORDER BY density_3x3 DESC, s.cx ASC, s.cy ASC
    LIMIT 20
    """,
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial hotspot surface: bin points to a fixed lat/lon grid,
    smooth each cell with its 3x3 neighborhood sum (box-kernel KDE on
    the cell lattice), report the top-20 hottest inhabited cells. The
    standard first query over any geotagged corpus (where is the data?)
    and the density prior most spatial samplers consume.

    Scale: ONE map-side-combined groupBy bins N points to <=432 cells;
    the 9-way neighbor explode and the smoothing aggregate run on the
    CELL table, whose size is fixed by geography — at 100 TB the
    per-point work is one floor-divide pair and the shuffle carries at
    most |grid| * 9 rows. Finer grids only grow that constant
    (1-degree cells = 64.8k rows); the plan shape never touches
    points^2. Determinism: counts and smoothed sums are exact integers;
    the top-20 ordering tie-breaks on (cx, cy)."""
    t = load_tables(spark, sf_dir)
    pts = t.customer.select(_lat().alias("lat"), _lon().alias("lon"))
    cell = F.lit(_DENS_CELL)
    cells = (
        pts.groupBy(
            F.floor(F.col("lat") / cell).cast("long").alias("cx"),
            F.floor(F.col("lon") / cell).cast("long").alias("cy"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx long, dy long",
    )
    smooth = (
        cells.crossJoin(F.broadcast(offs))
        .groupBy(
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
        .agg(F.sum("n").alias("density"))
    )
    own = cells.select(
        F.col("cx").alias("ocx"), F.col("cy").alias("ocy"),
        F.col("n").alias("n_points"),
    )
    return (
        smooth.join(
            own,
            (F.col("cx") == F.col("ocx")) & (F.col("cy") == F.col("ocy")),
        )
        .select(
            "cx", "cy",
            F.col("n_points").cast("long").alias("n_points"),
            F.col("density").cast("long").alias("density_3x3"),
        )
        .orderBy(F.desc("density_3x3"), F.asc("cx"), F.asc("cy"))
        .limit(20)
    )
