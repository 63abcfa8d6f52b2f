"""Geometry checks: WKT kind / syntax / bounds as Spark Column expressions.

Reference analogue: shapely-based WKT validation — geometry must parse, be
valid and be 2-D (locations.py:353-364, ``shapely.wkt.loads`` + ``is_valid``
+ ``has_z``), bounds folded into the geographic extent
(locations.py:477-483, ``.bounds``), and lat/lon hard bounds ±90/±180
(resources.py:60-63).

Engine re-expression: the hot path stays JVM-side — geometry *kind*,
structural syntax checks (known tag, balanced parentheses, coordinate
pairs, the reference's 2-D-only rule) and bounding boxes for all standard
WKT kinds are pure Column expressions (regex + higher-order array
functions), so a WKT column on a 10^12-row fact table validates inside
whole-stage codegen. Full OGC validity (ring closure, self-intersection,
hole topology) runs in ``full_validity``, an Arrow-batched pandas UDF with
two backends: shapely/GEOS (the reference's engine) when importable, else
the built-in pure-numpy implementation in ``geo_validity`` — on the
reference's own data model that level of validation only ever runs on the
SMALL locations dimension (SURVEY §2.8), never the fact table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WKT_KINDS = (
    "POINT",
    "LINESTRING",
    "POLYGON",
    "MULTIPOINT",
    "MULTILINESTRING",
    "MULTIPOLYGON",
    "GEOMETRYCOLLECTION",
)

#: x-y pair: two signed decimal numbers separated by whitespace.
_PAIR_RX = r"(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)\s+(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"


def wkt_kind(col: Column) -> Column:
    """Geometry tag (upper-cased), NULL when absent."""
    k = F.regexp_extract(F.upper(F.trim(col)), r"^([A-Z]+)", 1)
    return F.when(k == "", None).otherwise(k)


def _count_char(col: Column, ch: str) -> Column:
    return F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit("")))


def wkt_is_valid_syntax(col: Column) -> Column:
    """Structural WKT validity, 2-D only (the reference rejects geometries
    with a Z dimension, locations.py:360-364): known tag, balanced
    parentheses, at least one coordinate pair, exactly 2 numbers per pair
    (a third number — Z/M — fails the pair regex's adjacency), no dangling
    text. NULL input → NULL (blankness is a different rule's business)."""
    s = F.upper(F.trim(col))
    kind = wkt_kind(col)
    n_open = _count_char(s, "(")
    n_close = _count_char(s, ")")
    n_pairs = F.size(F.regexp_extract_all(s, F.lit(_PAIR_RX), F.lit(0)))
    # every comma-separated coordinate token must be exactly an x-y pair:
    # strip tags (incl. nested GEOMETRYCOLLECTION members) and parens, split
    # on commas, each token matches the pair regex
    body = F.regexp_replace(s, r"[A-Z]+|\(|\)", "")
    tokens = F.filter(
        F.transform(F.split(body, ","), lambda t: F.trim(t)), lambda t: t != ""
    )
    all_pairs = F.forall(tokens, lambda t: t.rlike(r"^" + _PAIR_RX + r"$"))
    z_or_m_tag = s.rlike(r"^[A-Z]+\s*(Z|M|ZM)\s*\(")
    return F.when(
        col.isNull(), F.lit(None).cast("boolean")
    ).otherwise(
        kind.isin(list(WKT_KINDS))
        & (n_open > 0)
        & (n_open == n_close)
        & (n_pairs > 0)
        & all_pairs
        & ~z_or_m_tag
    )


def wkt_bounds(col: Column) -> Column:
    """Bounding box struct (min_x, min_y, max_x, max_y) — the reference's
    ``geometry.bounds`` fold (locations.py:477-483) as pure array math over
    the extracted coordinate pairs; NULL for NULL/coordinate-free input."""
    s = F.upper(F.trim(col))
    xs = F.transform(
        F.regexp_extract_all(s, F.lit(_PAIR_RX), F.lit(1)), lambda v: v.cast("double")
    )
    ys = F.transform(
        F.regexp_extract_all(s, F.lit(_PAIR_RX), F.lit(2)), lambda v: v.cast("double")
    )
    return F.when(
        F.size(xs) > 0,
        F.struct(
            F.array_min(xs).alias("min_x"),
            F.array_min(ys).alias("min_y"),
            F.array_max(xs).alias("max_x"),
            F.array_max(ys).alias("max_y"),
        ),
    )


def lonlat_in_range(lon: Column, lat: Column) -> Column:
    """Hard geographic bounds ±180/±90 (reference resources.py:60-63)."""
    return (
        lon.isNotNull()
        & lat.isNotNull()
        & (lon >= -180.0)
        & (lon <= 180.0)
        & (lat >= -90.0)
        & (lat <= 90.0)
    )


def full_validity(
    df: DataFrame, wkt_col: str, out_col: str = "ogc_valid", backend: str = "auto"
) -> DataFrame:
    """OGC-level validity (ring closure, self-intersection, hole topology)
    in an Arrow-batched pandas UDF — dimension-table scale only (on the
    reference's data model this check runs on the locations dimension,
    never the fact table; locations.py:353-364).

    ``backend='auto'`` prefers shapely (GEOS — the reference's own
    engine) when importable and otherwise uses the BUILT-IN pure-numpy
    implementation (``geo_validity.ogc_valid_wkt``), which covers the
    reference's invalid classes (parse failure, Z geometry, ring
    self-intersection/pinch/spike, zero-area rings, hole-outside-shell,
    nested holes, overlapping multipolygon shells) with one documented
    divergence (interior-connectivity via chained hole touches).
    ``backend='builtin'`` / ``'shapely'`` force a side; forcing shapely
    without the library raises NotImplementedError."""
    if backend == "auto":
        try:
            import shapely.wkt  # noqa: F401

            backend = "shapely"
        except ImportError:
            backend = "builtin"
    if backend == "shapely":
        try:
            import shapely.wkt  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "shapely backend requested but the library is not installed; "
                "use backend='auto' or 'builtin' for the pure-numpy engine"
            ) from exc

    if backend == "builtin":

        @F.pandas_udf("boolean")
        def _valid(s: pd.Series) -> pd.Series:
            from safedata_validator_spark.functions.geo_validity import (
                ogc_valid_wkt,
            )

            return s.map(ogc_valid_wkt).astype("object")

    else:

        @F.pandas_udf("boolean")
        def _valid(s: pd.Series) -> pd.Series:
            import shapely.wkt as _w

            def one(v):
                if v is None:
                    return None
                try:
                    g = _w.loads(v)
                except Exception:
                    return False
                return bool(g.is_valid) and not g.has_z

            return s.map(one)

    return df.withColumn(out_col, _valid(F.col(wkt_col)))
