"""Geo scalar functions — the grid-bucketing primitives of the
reference's ``common/utils/GeoUtils.java`` (bounds check :57-60, lat/lon
→ grid cell :71-76, cell center :89-150, Euclidean distance :208-212,
direction angle :227-234), re-expressed as deterministic Column
expressions (pure JVM whole-stage-codegen arithmetic, no UDFs).

The reference hardcodes an NYC box with 100m cells; here the box is a
parameter so the same primitives serve any bounding box.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GridSpec:
    """A lon/lat bounding box partitioned into delta_lon x delta_lat cells."""

    lon_west: float
    lon_east: float
    lat_south: float
    lat_north: float
    delta_lon: float
    delta_lat: float

    @property
    def cells_per_row(self) -> int:
        return int((self.lon_east - self.lon_west) / self.delta_lon) + 1


# The reference's NYC box (GeoUtils.java:57-60) with ~100m cells.
NYC_GRID = GridSpec(
    lon_west=-74.05,
    lon_east=-73.70,
    lat_south=40.50,
    lat_north=41.00,
    delta_lon=0.0014,
    delta_lat=0.00125,
)


def in_box(lon: Column, lat: Column, grid: GridSpec = NYC_GRID) -> Column:
    """Bounds check (GeoUtils.isInNYC analogue)."""
    return (
        (lon >= F.lit(grid.lon_west))
        & (lon <= F.lit(grid.lon_east))
        & (lat >= F.lit(grid.lat_south))
        & (lat <= F.lit(grid.lat_north))
    )


def grid_cell(lon: Column, lat: Column, grid: GridSpec = NYC_GRID) -> Column:
    """lon/lat → integer cell id, row-major from the NW corner
    (GeoUtils.mapToGridCell analogue)."""
    x = F.floor((lon - F.lit(grid.lon_west)) / F.lit(grid.delta_lon))
    y = F.floor((F.lit(grid.lat_north) - lat) / F.lit(grid.delta_lat))
    return (y * F.lit(grid.cells_per_row) + x).cast("bigint")


def cell_center_lon(cell: Column, grid: GridSpec = NYC_GRID) -> Column:
    x = cell % F.lit(grid.cells_per_row)
    return F.lit(grid.lon_west) + (x + F.lit(0.5)) * F.lit(grid.delta_lon)


def cell_center_lat(cell: Column, grid: GridSpec = NYC_GRID) -> Column:
    y = F.floor(cell / F.lit(grid.cells_per_row))
    return F.lit(grid.lat_north) - (y + F.lit(0.5)) * F.lit(grid.delta_lat)


def path_cells(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column,
    grid: GridSpec = NYC_GRID,
) -> Column:
    """Grid cells crossed by the direct path between two points
    (``GeoUtils.java:89-150`` ``mapToGridCellsOnWay``), as a pure
    Column expression: sample the segment at Chebyshev-distance-many
    points in cell space (consecutive samples move at most one cell in
    each axis → 8-connected coverage), map each sample to its cell,
    keep first-occurrence-distinct ids.

    Deliberate delta: the reference walks the grid imperatively with a
    slope-dependent stepper (including a fall-through quirk in its
    slope<0 branch); the interpolation form is declarative, codegen-
    friendly, and visits the same cells for the same segment.
    """
    x1 = F.floor((lon1 - F.lit(grid.lon_west)) / F.lit(grid.delta_lon))
    y1 = F.floor((F.lit(grid.lat_north) - lat1) / F.lit(grid.delta_lat))
    x2 = F.floor((lon2 - F.lit(grid.lon_west)) / F.lit(grid.delta_lon))
    y2 = F.floor((F.lit(grid.lat_north) - lat2) / F.lit(grid.delta_lat))
    n = F.greatest(F.abs(x2 - x1), F.abs(y2 - y1), F.lit(1)).cast("bigint")

    def cell_at(i: Column) -> Column:
        t = i.cast("double") / n.cast("double")
        lon = lon1 + (lon2 - lon1) * t
        lat = lat1 + (lat2 - lat1) * t
        return grid_cell(lon, lat, grid)

    return F.array_distinct(F.transform(F.sequence(F.lit(0), n), cell_at))


def euclid_distance(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Planar distance in degrees (GeoUtils.java:208-212 analogue)."""
    return F.sqrt(F.pow(lon1 - lon2, 2) + F.pow(lat1 - lat2, 2))


def direction_angle(
    lon_from: Column, lat_from: Column, lon_to: Column, lat_to: Column
) -> Column:
    """Bearing in degrees [0, 360) (GeoUtils.java:227-234 analogue)."""
    ang = F.degrees(F.atan2(lat_to - lat_from, lon_to - lon_from))
    return F.when(ang < 0, ang + 360.0).otherwise(ang)
