"""Geospatial search — z-order indexed point literals, `geo:` service.

Reference: geospatial z-order index + BigMin advancer
(`RDF/service/geospatial/GeoSpatial.java:137,163`,
`ZOrderIndexBigMinAdvancer.java`): points are datatype literals
"lat#lon"^^geo:lat-lon, stored z-order interleaved so a rectangle scan
is a set of index ranges.

Spark-native design: the z value is a COLUMN, not an index.  Persisting
the point relation sorted/partitioned by `z` gives parquet row-group
min/max pruning over z ranges — the exact analog of the reference's
B+Tree range scans (the BigMin skip logic becomes "Catalyst prunes
row groups whose [z_min, z_max] misses the query cells").  Query: the
driver enumerates coarse z cells covering the rectangle (few — the
query is small), pushes an `isin` on the coarse cell + the exact
lat/lon bounds; the exact filter runs only on surviving row groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import terms as T

GEO_NS = "http://www.bigdata.com/rdf/geospatial#"
LATLON_DT = "http://www.bigdata.com/rdf/geospatial/literals/v1#lat-lon"

BITS = 16  # per-dimension quantization for the full z value
COARSE_BITS = 8  # per-dimension bits for the pruning cell


def make_point(lat: float, lon: float) -> T.Term:
    return T.Term.literal(f"{lat}#{lon}", LATLON_DT)


def lat_of(lit: Column) -> Column:
    return F.split(lit.getField("lex"), "#")[0].cast("double")


def lon_of(lit: Column) -> Column:
    return F.split(lit.getField("lex"), "#")[1].cast("double")


def _quant(value: Column, lo: float, hi: float, bits: int) -> Column:
    n = (1 << bits) - 1
    frac = (value - F.lit(lo)) / F.lit(hi - lo)
    clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.round(clamped * n).cast("long")


def z_interleave(qlat: Column, qlon: Column, bits: int) -> Column:
    """Bit-interleave two quantized coords into one z value (pure
    column arithmetic — stays in codegen, no UDF)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(qlat, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(qlon, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def with_z(points: DataFrame, lat="lat", lon="lon") -> DataFrame:
    """Add full z and coarse cell columns; persist sorted by `z` to get
    row-group pruning at scale."""
    qlat = _quant(F.col(lat), -90.0, 90.0, BITS)
    qlon = _quant(F.col(lon), -180.0, 180.0, BITS)
    clat = _quant(F.col(lat), -90.0, 90.0, COARSE_BITS)
    clon = _quant(F.col(lon), -180.0, 180.0, COARSE_BITS)
    return points.withColumn("z", z_interleave(qlat, qlon, BITS)).withColumn(
        "z_cell", z_interleave(clat, clon, COARSE_BITS)
    )


def _coarse_cells(lat1, lon1, lat2, lon2) -> list[int]:
    """Driver-side enumeration of coarse cells covering the rectangle."""
    import math

    n = (1 << COARSE_BITS) - 1

    def q(v, lo, hi):
        return max(0, min(n, int(round((v - lo) / (hi - lo) * n))))

    a1, a2 = sorted((q(lat1, -90, 90), q(lat2, -90, 90)))
    b1, b2 = sorted((q(lon1, -180, 180), q(lon2, -180, 180)))
    cells = []
    for qa in range(a1, a2 + 1):
        for qb in range(b1, b2 + 1):
            z = 0
            for i in range(COARSE_BITS):
                z |= ((qa >> i) & 1) << (2 * i + 1)
                z |= ((qb >> i) & 1) << (2 * i)
            cells.append(z)
    assert len(cells) == (a2 - a1 + 1) * (b2 - b1 + 1)
    return cells


def points_of(triples: DataFrame, predicate: T.Term | None = None) -> DataFrame:
    """(s, st, lat, lon, z, z_cell) for every lat-lon literal object."""
    pts = triples.where(F.col("ot.dt") == LATLON_DT)
    if predicate is not None:
        pts = pts.where(F.col("p") == T.term_id(T.lit_term(predicate)))
    pts = pts.select(
        "s", "st",
        lat_of(F.col("ot")).alias("lat"),
        lon_of(F.col("ot")).alias("lon"),
        F.col("ot").alias("loc"),
    )
    return with_z(pts)


def in_rectangle(
    pts: DataFrame, lat_sw: float, lon_sw: float, lat_ne: float, lon_ne: float
) -> DataFrame:
    cells = _coarse_cells(lat_sw, lon_sw, lat_ne, lon_ne)
    out = pts
    if len(cells) <= 4096:
        out = out.where(F.col("z_cell").isin(cells))
    return out.where(
        (F.col("lat") >= lat_sw) & (F.col("lat") <= lat_ne)
        & (F.col("lon") >= lon_sw) & (F.col("lon") <= lon_ne)
    )


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(6371.0) * 2 * F.asin(F.sqrt(a))


def in_circle(pts: DataFrame, lat: float, lon: float, radius_km: float) -> DataFrame:
    import math

    dlat = radius_km / 111.32
    dlon = radius_km / (111.32 * max(0.01, math.cos(math.radians(lat))))
    boxed = in_rectangle(pts, lat - dlat, lon - dlon, lat + dlat, lon + dlon)
    return boxed.where(
        haversine_km(F.lit(lat), F.lit(lon), F.col("lat"), F.col("lon"))
        <= radius_km
    )


def make_geo_service():
    """SERVICE <http://www.bigdata.com/rdf/geospatial#search> handler.

    Config (GeoSpatial.java magic predicates):
        SERVICE <geo:search> {
          ?s geo:search "inRectangle" ;
             geo:predicate t:loc ;
             geo:spatialRectangleSouthWest "10.0#20.0" ;
             geo:spatialRectangleNorthEast "30.0#40.0" ;
             geo:locationValue ?loc .           # optional
          # or: geo:search "inCircle" ; geo:spatialCircleCenter "la#lo" ;
          #     geo:spatialCircleRadius "5.0"   (km)
        }
    """
    from ..sparql import ast as A
    from ..sparql.compiler import Sol

    def handler(compiler, sp, graph):
        cfg: dict[str, object] = {}
        subj = None
        for el in sp.group.elements:
            if isinstance(el, A.TriplePattern) and isinstance(el.p, A.Const):
                key = el.p.term.lex.rsplit("#", 1)[-1]
                cfg[key] = el.o
                if key == "search":
                    subj = el.s
        if subj is None or not isinstance(subj, A.Var):
            raise ValueError('geo:search needs \'?var geo:search "mode"\'')
        mode = cfg["search"].term.lex
        pred = cfg["predicate"].term if "predicate" in cfg else None
        pts = points_of(compiler.triples, pred)

        def latlon(key):
            lat, lon = cfg[key].term.lex.split("#")
            return float(lat), float(lon)

        if mode == "inRectangle":
            sw, ne = latlon("spatialRectangleSouthWest"), latlon(
                "spatialRectangleNorthEast"
            )
            hits = in_rectangle(pts, sw[0], sw[1], ne[0], ne[1])
        elif mode == "inCircle":
            c = latlon("spatialCircleCenter")
            hits = in_circle(pts, c[0], c[1], float(cfg["spatialCircleRadius"].term.lex))
        else:
            raise ValueError(f"unknown geo:search mode {mode}")
        v = subj.name
        cols = [F.col("st").alias(v), F.col("s").alias(v + "__id")]
        vars_ = {v}
        loc = cfg.get("locationValue")
        if isinstance(loc, A.Var):
            cols += [
                F.col("loc").alias(loc.name),
            ]
            vars_.add(loc.name)
        out = hits.select(*cols).dropDuplicates([v + "__id"])
        if isinstance(loc, A.Var):
            out = out.withColumn(loc.name + "__id", T.term_id(F.col(loc.name)))
        return Sol(out, vars_, set())

    return {GEO_NS: handler}
