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
