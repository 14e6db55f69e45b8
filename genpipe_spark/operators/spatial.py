"""Spatial grid joins — planar radius search without trig.

``grid_radius_join`` matches each point to every center within
``radius`` (squared-euclidean, integer coordinates): bucket both sides
into cells of side ``radius``, replicate each CENTER into its 3x3
neighbor cells, equi-join on the cell key, verify the exact distance.
Any center within R of a point differs by at most one cell per axis
(cell side == R), so the neighborhood is sufficient; offsets are
distinct, so each (point, center) pair meets the equi-join at most
once — no dedup pass. This is the planar sibling of the banded
interval join (operators/interval.py): the same replicate-the-small-
side-into-buckets trick, one dimension up.

Integer contract: coordinates and radius are int64; the verification
predicate is exact ((dx*dx + dy*dy) <= r*r — coordinates below ~1.5e9
cannot overflow). No floats, no libm, engine-exact by construction.

Scale: ONE shuffle on the cell key; the 9x replication applies to the
center side only (choose the smaller side as centers). Cell side = R
keeps candidate sets proportional to local density; a hot cell is a
data property (everything genuinely near one point) and AQE skew
handling applies to the join like any other. For haversine/geodetic
semantics project to planar meters upstream — keeping trig out of the
join keeps it exact and whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    points: DataFrame,
    centers: DataFrame,
    px: str,
    py: str,
    cx: str,
    cy: str,
    radius: int,
) -> DataFrame:
    """All (point, center) pairs with squared distance <= radius^2.

    Output: all point columns + all center columns + ``dist2``
    (callers pre-rename collisions). Coordinates must be int64-safe
    integers; ``radius`` a positive integer.

    Duplicate-row semantics (r9 doctrine audit): relational join
    multiplicity — k copies of a point x m copies of a center emit
    k*m rows. No groupBy collapses caller rows (each pair matches in
    exactly ONE cell, the point's own, so the 9-cell center
    replication cannot duplicate a pair either); no per-row id is
    needed, unlike point_in_polygon_join's __pid.
    """
    if radius <= 0:
        raise ValueError(f"grid_radius_join: radius {radius} must be > 0")
    w = F.lit(int(radius))
    pts = points.withColumn("__gx", F.floor(F.col(px) / w)).withColumn(
        "__gy", F.floor(F.col(py) / w)
    )
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("dx"), F.lit(j).alias("dy"))
                for i in (-1, 0, 1)
                for j in (-1, 0, 1)
            ]
        )
    )
    ctr = (
        centers.select("*", offs.alias("__o"))
        .withColumn("__gx", F.floor(F.col(cx) / w) + F.col("__o")["dx"])
        .withColumn("__gy", F.floor(F.col(cy) / w) + F.col("__o")["dy"])
        .drop("__o")
    )
    dx = pts[px] - ctr[cx]
    dy = pts[py] - ctr[cy]
    dist2 = dx * dx + dy * dy
    cond = (
        (pts["__gx"] == ctr["__gx"])
        & (pts["__gy"] == ctr["__gy"])
        & (dist2 <= F.lit(int(radius) * int(radius)))
    )
    joined = pts.join(ctr, cond)
    return (
        joined.drop(pts["__gx"])
        .drop(pts["__gy"])
        .drop(ctr["__gx"])
        .drop(ctr["__gy"])
        .withColumn(
            "dist2",
            (F.col(px) - F.col(cx)) * (F.col(px) - F.col(cx))
            + (F.col(py) - F.col(cy)) * (F.col(py) - F.col(cy)),
        )
    )


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    px: str,
    py: str,
    poly_id: str = "poly_id",
    vertices: str = "vertices",
    cell: int = 256,
) -> DataFrame:
    """All (point, polygon) containment pairs by exact integer ray
    casting — the spatial enrichment join (point -> geofence/region).

    ``polygons`` carries ``poly_id`` and ``vertices``: an ORDERED
    ``array<struct<x:long, y:long>>`` tracing the boundary (closing
    edge implied). Points strictly inside match; boundary points
    follow the fixed crossing convention below (deterministic — the
    same integer arithmetic everywhere, never float).

    Ray cast to +x: edge (x1,y1)-(x2,y2) crosses iff
    ``(y1 > py) != (y2 > py)`` and the signed area
    ``s = (x1-px)*(y2-y1) + (x2-x1)*(py-y1)`` has the sign of
    ``y2-y1``; odd crossing count = inside. Pure int64 (coords below
    ~1.5e9 cannot overflow), no division, whole-stage codegen.

    Scale shape: polygons are the DIM side. Each polygon is replicated
    into the grid cells its bbox covers (side ``cell``) and BROADCAST;
    points map to exactly ONE cell, so the equi-join emits each
    candidate pair at most once — no dedup. The exact test then runs
    on candidates x edges (edge count is a polygon property, not a
    data property). ONE scan of the points, zero point-side shuffles
    before the verdict agg on (point, polygon).

    Duplicate input rows are safe: each point row gets an internal
    unique id before the edge join, so the crossing counts of two
    identical points never merge (merging would double the parity and
    silently drop genuinely-inside points — round-7 advisory). Fully
    duplicated rows therefore also yield duplicated OUTPUT rows, one
    verdict per input row."""
    if cell <= 0:
        raise ValueError(f"point_in_polygon_join: cell {cell} must be > 0")
    c = F.lit(int(cell))
    pt_cols = points.columns
    # per-row id: the verdict agg groups on it, not on the point
    # columns, so duplicate points keep independent crossing parities
    pts = (
        points.withColumn("__pid", F.monotonically_increasing_id())
        .withColumn("__gx", F.floor(F.col(px) / c))
        .withColumn("__gy", F.floor(F.col(py) / c))
    )
    vx = F.col("__v").getField("x")
    vy = F.col("__v").getField("y")
    flat = polygons.select(
        poly_id, F.posexplode(F.col(vertices)).alias("__pos", "__v")
    ).select(poly_id, "__pos", vx.alias("__x"), vy.alias("__y"))
    bbox = flat.groupBy(poly_id).agg(
        F.min("__x").alias("__mnx"), F.max("__x").alias("__mxx"),
        F.min("__y").alias("__mny"), F.max("__y").alias("__mxy"),
    )
    cells = bbox.select(
        poly_id, "__mnx", "__mxx", "__mny", "__mxy",
        F.explode(
            F.sequence(F.floor(F.col("__mnx") / c), F.floor(F.col("__mxx") / c))
        ).alias("__gx"),
    ).select(
        "*",
        F.explode(
            F.sequence(F.floor(F.col("__mny") / c), F.floor(F.col("__mxy") / c))
        ).alias("__gy"),
    )
    cand = pts.join(F.broadcast(cells), ["__gx", "__gy"]).where(
        F.col(px).between(F.col("__mnx"), F.col("__mxx"))
        & F.col(py).between(F.col("__mny"), F.col("__mxy"))
    ).select("__pid", *pt_cols, poly_id)
    from pyspark.sql import Window

    w = Window.partitionBy(poly_id).orderBy("__pos").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    edges = flat.select(
        poly_id,
        F.col("__x").alias("__x1"), F.col("__y").alias("__y1"),
        F.coalesce(F.lead("__x").over(Window.partitionBy(poly_id).orderBy("__pos")),
                   F.first("__x").over(w)).alias("__x2"),
        F.coalesce(F.lead("__y").over(Window.partitionBy(poly_id).orderBy("__pos")),
                   F.first("__y").over(w)).alias("__y2"),
    )
    j = cand.join(F.broadcast(edges), poly_id)
    s = (
        (F.col("__x1") - F.col(px)) * (F.col("__y2") - F.col("__y1"))
        + (F.col("__x2") - F.col("__x1")) * (F.col(py) - F.col("__y1"))
    )
    crossing = (
        ((F.col("__y1") > F.col(py)) != (F.col("__y2") > F.col(py)))
        & (
            ((F.col("__y2") > F.col("__y1")) & (s > 0))
            | ((F.col("__y2") < F.col("__y1")) & (s < 0))
        )
    )
    verdict = (
        j.groupBy("__pid", poly_id)
        .agg(
            *[F.first(pc).alias(pc) for pc in pt_cols],
            F.sum(crossing.cast("int")).alias("__ncross"),
        )
        .where(F.col("__ncross") % 2 == 1)
        .select(*pt_cols, poly_id)
    )
    return verdict
