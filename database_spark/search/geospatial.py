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


# ------------------------------------------------------------ datatypes
#
# Configurable geospatial datatypes (reference:
# GeoSpatialDatatypeConfiguration / GeoSpatialLiteralExtension).  A
# datatype is an ordered list of '#'-separated fields; each field is
# DOUBLE or LONG with a precision multiplier.  Values are ENCODED as
# trunc(value * multiplier) longs — all range comparisons happen in the
# encoded domain, exactly like the reference's z-order key ranges, so
# a multiplier of 100000 gives 5-decimal precision.  This is the
# public custom-datatype surface (IExtension analog): register a JSON
# config per datatype, point literals of that datatype join the index.


class GeoField:
    __slots__ = ("value_type", "multiplier", "min_value", "mapping")

    def __init__(self, value_type="DOUBLE", multiplier=1, min_value=None, mapping="CUSTOM"):
        self.value_type = value_type
        self.multiplier = int(multiplier)
        self.min_value = min_value
        self.mapping = mapping


def _plain_lit(c: Column) -> Column:
    return T.term_struct(F.lit(T.KIND_LITERAL), c, F.lit(T.XSD_STRING), F.lit(None))


def _typed_lit(c: Column, dt: str) -> Column:
    return T.term_struct(F.lit(T.KIND_LITERAL), c.cast("string"), F.lit(dt), F.lit(None))


class GeoLiteralSerializer:
    """``IGeoSpatialLiteralSerializer`` analog.  The base class is the
    reference's ``GeoSpatialDefaultLiteralSerializer``: components are
    '#'-separated, location outputs are plain '#'-joined literals, and
    scalar outputs are typed (double lat/lon, long time).  Custom
    serializers override how the LITERAL lexical form maps to/from
    components (search parameters stay '#'-separated regardless)."""

    # --- lexical form <-> components
    def split_py(self, lex: str) -> list[str]:
        return lex.split("#")

    def join_py(self, comps: list[str]) -> str:
        return "#".join(comps)

    def components_col(self, lex: Column) -> Column:
        return F.split(lex, "#")

    # --- value outputs (decoded component value columns -> TERM)
    def location(self, lat: Column, lon: Column) -> Column:
        return _plain_lit(F.concat_ws("#", lat.cast("string"), lon.cast("string")))

    def location_time(self, lat: Column, lon: Column, t: Column) -> Column:
        return _plain_lit(
            F.concat_ws("#", lat.cast("string"), lon.cast("string"), t.cast("string"))
        )

    def time(self, t: Column) -> Column:
        return _typed_lit(t, T.XSD_LONG)

    def latitude(self, v: Column) -> Column:
        return _typed_lit(v.cast("double"), T.XSD_DOUBLE)

    def longitude(self, v: Column) -> Column:
        return _typed_lit(v.cast("double"), T.XSD_DOUBLE)

    def coord_system(self, v: Column) -> Column:
        return _plain_lit(v.cast("string"))

    def custom_fields(self, vals: list) -> Column:
        return _plain_lit(F.concat_ws("#", *[v.cast("string") for v in vals]))


class WktTestLiteralSerializer(GeoLiteralSerializer):
    """Functional equivalent of the reference's test serializer
    ``GeoSpatialTestWKTLiteralSerializer``: literals are
    ``Point(lat,lon)``; toComponents strips the first 6 and last chars
    and splits on ','; fromComponents wraps two components back."""

    def split_py(self, lex: str) -> list[str]:
        return lex[6:-1].split(",") if len(lex) > 7 else [lex]

    def join_py(self, comps: list[str]) -> str:
        if len(comps) != 2:
            raise ValueError(
                "GeoSpatialSearchException: expected 2 components, got "
                f"{len(comps)}"
            )
        return f"Point({comps[0]},{comps[1]})"

    def components_col(self, lex: Column) -> Column:
        # substring(6, len-1) — regexp keeps malformed lex unsplittable
        return F.split(F.regexp_extract(lex, r"^.{6}(.*).$", 1), ",")

    def location(self, lat: Column, lon: Column) -> Column:
        # the reference's test serializer types the output with the
        # wktLiteral datatype (GeoSpatialTestWKTLiteralSerializer)
        return _typed_lit(
            F.concat(F.lit("Point("), lat.cast("string"), F.lit(","),
                     lon.cast("string"), F.lit(")")),
            "http://www.opengis.net/ont/geosparql#wktLiteral",
        )


class DummyTestLiteralSerializer(GeoLiteralSerializer):
    """Functional equivalent of ``GeoSpatialDummyLiteralSerializer``:
    default component mapping, but every value output is wrapped in a
    plain literal like ``Location(lat-lon)`` / ``Time(t)``."""

    @staticmethod
    def _wrap(tag: str, *vals: Column) -> Column:
        return _plain_lit(
            F.concat(
                F.lit(tag + "("),
                F.concat_ws("-", *[v.cast("string") for v in vals]),
                F.lit(")"),
            )
        )

    def location(self, lat, lon):
        return self._wrap("Location", lat, lon)

    def location_time(self, lat, lon, t):
        return self._wrap("LocationAndTime", lat, lon, t)

    def time(self, t):
        return self._wrap("Time", t)

    def latitude(self, v):
        return self._wrap("Lat", v)

    def longitude(self, v):
        return self._wrap("Lon", v)

    def coord_system(self, v):
        return self._wrap("CoordSystem", v)

    def custom_fields(self, vals):
        return self._wrap("CustomFields", *vals)


DEFAULT_SERIALIZER = GeoLiteralSerializer()

#: Java class name -> serializer instance (IExtension-style public
#: registration surface; the two test classes ship as equivalents)
LITERAL_SERIALIZERS: dict = {
    "com.bigdata.rdf.sparql.ast.eval.service.GeoSpatialTestWKTLiteralSerializer":
        WktTestLiteralSerializer(),
    "com.bigdata.rdf.sparql.ast.eval.service.GeoSpatialDummyLiteralSerializer":
        DummyTestLiteralSerializer(),
}


def register_literal_serializer(name: str, serializer: GeoLiteralSerializer) -> None:
    LITERAL_SERIALIZERS[name] = serializer


class GeoDatatypeConfig:
    __slots__ = ("uri", "fields", "serializer_name")

    def __init__(self, uri: str, fields: list, serializer_name: str | None = None):
        self.uri = uri
        self.fields = fields
        self.serializer_name = serializer_name

    @property
    def serializer(self) -> GeoLiteralSerializer:
        if self.serializer_name is None:
            return DEFAULT_SERIALIZER
        s = LITERAL_SERIALIZERS.get(self.serializer_name)
        if s is None:
            raise ValueError(
                "GeoSpatialSearchException: unknown literalSerializer "
                + self.serializer_name
            )
        return s

    def index_of(self, mapping: str) -> int | None:
        for i, f in enumerate(self.fields):
            if f.mapping == mapping:
                return i
        return None

    def custom_indices(self, names: list[str]) -> list[int]:
        out = []
        for n in names:
            for i, f in enumerate(self.fields):
                if f.mapping == n:
                    out.append(i)
                    break
            else:
                raise ValueError(f"unknown custom field {n!r} for {self.uri}")
        return out


def parse_geo_config(json_str: str) -> GeoDatatypeConfig:
    """Parse the reference's JSON datatype config format
    (GeoSpatialConfig.initDatatypes)."""
    import json

    top = json.loads(json_str)["config"]
    fields = [
        GeoField(
            value_type=f["valueType"],
            multiplier=f.get("multiplier", 1),
            min_value=(
                int(f["minValue"]) if "minValue" in f
                else int(f["minVal"]) if "minVal" in f else None
            ),
            mapping=f.get("serviceMapping", "CUSTOM"),
        )
        for f in top["fields"]
    ]
    return GeoDatatypeConfig(
        top["uri"], fields, serializer_name=top.get("literalSerializer")
    )


LATLON_V1 = LATLON_DT
LATLON_TIME_V1 = "http://www.bigdata.com/rdf/geospatial/literals/v1#lat-lon-time"


def builtin_configs() -> dict:
    """The two built-in datatypes (GeoSpatialConfigOptions)."""
    return {
        LATLON_V1: GeoDatatypeConfig(
            LATLON_V1,
            [
                GeoField("DOUBLE", 100000, None, "LATITUDE"),
                GeoField("DOUBLE", 100000, None, "LONGITUDE"),
            ],
        ),
        LATLON_TIME_V1: GeoDatatypeConfig(
            LATLON_TIME_V1,
            [
                GeoField("DOUBLE", 100000, None, "LATITUDE"),
                GeoField("DOUBLE", 100000, None, "LONGITUDE"),
                GeoField("LONG", 1, None, "TIME"),
            ],
        ),
    }


def _encode_py(lexical: str, field: GeoField) -> int:
    """Driver-side exact encoding: trunc(Decimal(lex) * multiplier)
    (BigDecimal.multiply().longValue() truncates toward zero)."""
    from decimal import Decimal

    return int(Decimal(lexical) * field.multiplier)


def _field_raw(lit_lex: Column, i: int, ser: "GeoLiteralSerializer | None" = None) -> Column:
    # F.get (null on out-of-bounds), NOT [i]: the malformed-literal
    # arity filter gives no evaluation-order guarantee vs this access
    return F.get((ser or DEFAULT_SERIALIZER).components_col(lit_lex), i)


def _field_enc(
    lit_lex: Column, i: int, field: GeoField,
    ser: "GeoLiteralSerializer | None" = None,
) -> Column:
    """Column-side encoding, same truncation semantics as _encode_py
    (decimal multiply then truncate toward zero via cast to long)."""
    d = _field_raw(lit_lex, i, ser).cast("decimal(30,10)")
    return (d * F.lit(field.multiplier)).cast("long")


def _field_decoded(
    lit_lex: Column, i: int, field: GeoField,
    ser: "GeoLiteralSerializer | None" = None,
) -> Column:
    """Decoded value = encoded / multiplier (DOUBLE: double division;
    LONG: integer division) — what the reference materializes from the
    index key and reports in *Value bindings."""
    enc = _field_enc(lit_lex, i, field, ser)
    if field.value_type == "DOUBLE":
        return enc.cast("double") / F.lit(float(field.multiplier))
    return enc if field.multiplier == 1 else (enc / F.lit(field.multiplier)).cast("long")


def _decoded_str(
    lit_lex: Column, i: int, field: GeoField,
    ser: "GeoLiteralSerializer | None" = None,
) -> Column:
    """Java toString of the decoded component ("2.0" for doubles,
    "2" for longs) — the serializer's output format."""
    v = _field_decoded(lit_lex, i, field, ser)
    return v.cast("string")


def geo_distance_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """The reference's spherical-law-of-cosines distance
    (CoordinateUtility.distance): acos(sin sin + cos cos cos(dlon)) in
    degrees * 60 * 1.1515 * 1.609344 km; identical points → 0."""
    rad = 3.141592653589793 / 180.0
    d = F.acos(
        F.sin(lat1 * rad) * F.sin(lat2 * rad)
        + F.cos(lat1 * rad) * F.cos(lat2 * rad) * F.cos((lon1 - lon2) * rad)
    ) / F.lit(rad)
    km = d * 60.0 * 1.1515 * 1.609344
    return F.when((lat1 == lat2) & (lon1 == lon2), F.lit(0.0)).otherwise(km)


_UNIT_TO_KM = {
    "Kilometers": 1.0,
    "Kilometer": 1.0,
    "Miles": 1.609344,
    "Mile": 1.609344,
    "Feet": 0.0003048,
    "Meters": 0.001,
}


def make_geo_service(datatype_configs: list | None = None, default_datatype: str | None = None, include_builtins: bool = True):
    """SERVICE <http://www.bigdata.com/rdf/geospatial#search> handler.

    `datatype_configs`: JSON strings or GeoDatatypeConfig objects
    registering custom geospatial datatypes
    (GEO_SPATIAL_DATATYPE_CONFIG.* properties in the reference).
    `default_datatype`: datatype used when the query has no
    geo:searchDatatype (GEO_SPATIAL_DEFAULT_DATATYPE; we default to
    the built-in lat-lon for convenience).

    Supported query surface (GeoSpatialServiceFactory):
      geo:search "inRectangle"|"inCircle", geo:predicate,
      geo:searchDatatype, geo:spatialRectangleSouthWest/NorthEast,
      geo:spatialCircleCenter/Radius, geo:spatialUnit, geo:timeStart/
      geo:timeEnd, geo:coordSystem, geo:customFields +
      geo:customFieldsLowerBounds/UpperBounds, and the output value
      bindings (location/lat/lon/time/coordSystem/customFields/
      literal/distance/locationAndTime).
    """
    from ..sparql import ast as A
    from ..sparql.compiler import Sol

    registry: dict[str, GeoDatatypeConfig] = {}
    if include_builtins:
        registry.update(builtin_configs())
    for c in datatype_configs or []:
        cfg = parse_geo_config(c) if isinstance(c, str) else c
        registry[cfg.uri] = cfg
    default_dt = default_datatype or LATLON_V1

    def handler(compiler, sp, graph):
        cfg: dict[str, object] = {}
        subj = None
        for el in sp.group.elements:
            if isinstance(el, A.TriplePattern) and isinstance(el.p, A.Const):
                key = el.p.term.lex.rsplit("#", 1)[-1]
                cfg[key] = el.o
                if subj is None and isinstance(el.s, A.Var):
                    # result variable: subject of the magic triples —
                    # geo:search itself is optional (pure custom-field /
                    # time range queries carry no search function)
                    subj = el.s
        if subj is None:
            raise ValueError("geo:search group needs a subject variable")

        def const(key, default=None):
            v = cfg.get(key)
            if v is None:
                return default
            if not isinstance(v, A.Const):
                raise ValueError(f"geo:{key} must be a constant in this engine")
            return v.term.lex

        mode = const("search")
        dt_uri = const("searchDatatype", default_dt)
        dtc = registry.get(dt_uri)
        if dtc is None:
            raise ValueError(
                f"Datatype {dt_uri} is not a registered geospatial datatype"
            )
        ser = dtc.serializer  # raises for an unknown literalSerializer
        # ------------------------- validation (CorrectRejection)
        # the reference rejects under-constrained or contradictory
        # service configurations (TestGeoSpatialCorrectRejection):
        # every dimension of the datatype must be constrained, search
        # params must match the search function, and value outputs
        # must have a source field
        def reject(msg: str):
            raise ValueError("GeoSpatialSearchException: " + msg)

        lat_i0, lon_i0 = dtc.index_of("LATITUDE"), dtc.index_of("LONGITUDE")
        time_i0, cs_i0 = dtc.index_of("TIME"), dtc.index_of("COORD_SYSTEM")
        has_latlon = lat_i0 is not None and lon_i0 is not None
        if mode == "inRectangle" and (
            "spatialCircleCenter" in cfg or "spatialCircleRadius" in cfg
        ):
            reject("circle parameters given for inRectangle query")
        if mode == "inCircle" and (
            "spatialRectangleSouthWest" in cfg or "spatialRectangleNorthEast" in cfg
        ):
            reject("rectangle parameters given for inCircle query")
        if isinstance(cfg.get("distanceValue"), A.Var) and mode != "inCircle":
            reject("distanceValue is only computable for inCircle queries")
        if time_i0 is None and (
            const("timeStart") is not None or const("timeEnd") is not None
        ):
            reject("time bounds given but the datatype has no TIME component")
        if cs_i0 is None and const("coordSystem") is not None:
            reject("coordSystem given but the datatype has no COORD_SYSTEM component")
        for key, need in (
            ("locationValue", has_latlon),
            ("latValue", has_latlon),
            ("lonValue", has_latlon),
            ("locationAndTimeValue", has_latlon and time_i0 is not None),
            ("timeValue", time_i0 is not None),
            ("coordSystemValue", cs_i0 is not None),
        ):
            if isinstance(cfg.get(key), A.Var) and not need:
                reject(f"{key} requested but the datatype has no such component")
        if (mode in ("inRectangle", "inCircle")) and not has_latlon:
            reject(f"datatype {dt_uri} has no lat/lon — not geospatial")
        if mode is None and has_latlon:
            reject("datatype has lat/lon components: a geo:search function is required")
        def point_of(key):
            """(lat, lon) of a point parameter —
            GeoSpatialServiceFactory.resolveAsPoint: a literal whose
            datatype is a registered lat/lon geo datatype parses
            through THAT datatype's serializer and field order; plain
            strings parse as 'lat#lon'."""
            node = cfg.get(key)
            if node is None:
                return None
            if not isinstance(node, A.Const):
                raise ValueError(f"geo:{key} must be a constant in this engine")
            t = node.term
            pdtc = registry.get(getattr(t, "dt", None))
            if pdtc is not None:
                pla = pdtc.index_of("LATITUDE")
                plo = pdtc.index_of("LONGITUDE")
                if pla is not None and plo is not None:
                    comps = pdtc.serializer.split_py(t.lex)
                    try:
                        float(comps[pla]), float(comps[plo])
                        return comps[pla], comps[plo]
                    except (ValueError, IndexError):
                        reject(f"input could not be resolved as point: {t.lex!r}")
            parts = t.lex.split("#")
            if len(parts) < 2:
                reject(f"input could not be resolved as point: {t.lex!r}")
            try:
                float(parts[0]), float(parts[1])
            except ValueError:
                reject(f"input could not be resolved as point: {t.lex!r}")
            return parts[0], parts[1]

        def check_bounds(lat_lex, lon_lex, what):
            try:
                la, lo = float(lat_lex), float(lon_lex)
            except ValueError:
                reject(f"{what}: malformed point")
            if not (-90.0 <= la <= 90.0) or not (-180.0 <= lo <= 180.0):
                reject(f"{what}: coordinates out of bounds ({la}, {lo})")
        if mode == "inRectangle":
            for key in ("spatialRectangleSouthWest", "spatialRectangleNorthEast"):
                pt = point_of(key)
                if pt is not None:
                    check_bounds(*pt, key)
        if mode == "inCircle":
            pt = point_of("spatialCircleCenter")
            if pt is not None:
                check_bounds(*pt, "spatialCircleCenter")
        if time_i0 is not None and (
            const("timeStart") is None or const("timeEnd") is None
        ):
            reject("datatype has a TIME component: timeStart and timeEnd required")
        if cs_i0 is not None and const("coordSystem") is None:
            reject("datatype has a COORD_SYSTEM component: coordSystem required")
        dt_custom = [
            f.mapping
            for f in dtc.fields
            if f.mapping not in ("LATITUDE", "LONGITUDE", "TIME", "COORD_SYSTEM")
        ]
        cf_names = (const("customFields") or "").split("#") if "customFields" in cfg else []
        if dt_custom:
            missing = [n for n in dt_custom if n not in cf_names]
            if missing:
                reject(f"custom field(s) {missing} not constrained")
        if cf_names:
            lo_b, hi_b = const("customFieldsLowerBounds"), const("customFieldsUpperBounds")
            if lo_b is None or hi_b is None:
                reject("customFields needs lower and upper bounds")
            if len(lo_b.split("#")) != len(cf_names) or len(hi_b.split("#")) != len(cf_names):
                reject("customFields bounds arity mismatch")
        if isinstance(cfg.get("customFieldsValues"), A.Var) and not cf_names:
            reject("customFieldsValues requested without customFields")

        trips = compiler.triples
        # GRAPH scope / geo:context restriction
        ctx = const("context")
        if ctx is not None:
            trips = trips.where(F.col("g") == T.term_id(T.lit_term(T.Term.iri(ctx))))
        pts = trips.where(F.col("ot.dt") == dt_uri)
        if "predicate" in cfg:
            pts = pts.where(
                F.col("p") == T.term_id(T.lit_term(cfg["predicate"].term))
            )
        lex = F.col("ot").getField("lex")
        conds: list[Column] = [
            # malformed literals (wrong component count) never match —
            # the reference drops them at index build time
            F.size(ser.components_col(lex)) == len(dtc.fields)
        ]

        def between_enc(i: int, lo_lex: str, hi_lex: str):
            f = dtc.fields[i]
            enc = _field_enc(lex, i, f, ser)
            conds.append(enc >= F.lit(_encode_py(lo_lex, f)))
            conds.append(enc <= F.lit(_encode_py(hi_lex, f)))

        lat_i, lon_i = dtc.index_of("LATITUDE"), dtc.index_of("LONGITUDE")
        time_i, cs_i = dtc.index_of("TIME"), dtc.index_of("COORD_SYSTEM")
        distance_col = None
        if mode == "inRectangle":
            sw, ne = const("spatialRectangleSouthWest"), const("spatialRectangleNorthEast")
            if sw is None or ne is None:
                raise ValueError("inRectangle needs SouthWest and NorthEast")
            if lat_i is None or lon_i is None:
                raise ValueError(f"datatype {dt_uri} has no lat/lon — not geospatial")
            sw_lat, sw_lon = point_of("spatialRectangleSouthWest")
            ne_lat, ne_lon = point_of("spatialRectangleNorthEast")
            between_enc(lat_i, sw_lat, ne_lat)
            f_lon = dtc.fields[lon_i]
            lo_enc, hi_enc = _encode_py(sw_lon, f_lon), _encode_py(ne_lon, f_lon)
            enc_lon = _field_enc(lex, lon_i, f_lon, ser)
            if lo_enc > hi_enc:
                # dateline crossing: west bound east of east bound —
                # [sw, 180] ∪ [-180, ne] (reference splits the z-order
                # scan the same way)
                conds.append((enc_lon >= F.lit(lo_enc)) | (enc_lon <= F.lit(hi_enc)))
            else:
                conds.append(enc_lon >= F.lit(lo_enc))
                conds.append(enc_lon <= F.lit(hi_enc))
        elif mode == "inCircle":
            center = const("spatialCircleCenter")
            radius = const("spatialCircleRadius")
            if center is None or radius is None:
                raise ValueError("inCircle needs center and radius")
            if lat_i is None or lon_i is None:
                raise ValueError(f"datatype {dt_uri} has no lat/lon — not geospatial")
            c_lat, c_lon = (float(x) for x in point_of("spatialCircleCenter"))
            unit = const("spatialUnit", "Kilometers")
            r_km = float(radius) * _UNIT_TO_KM.get(unit, 1.0)
            dlat = _field_decoded(lex, lat_i, dtc.fields[lat_i], ser)
            dlon = _field_decoded(lex, lon_i, dtc.fields[lon_i], ser)
            distance_col = geo_distance_km(F.lit(c_lat), F.lit(c_lon), dlat, dlon)
            conds.append(distance_col <= F.lit(r_km))
        elif mode is not None and mode not in ("inRectangle", "inCircle"):
            raise ValueError(f"unknown geo:search mode {mode}")
        # time range (applies to both modes when the datatype has TIME)
        ts, te = const("timeStart"), const("timeEnd")
        if time_i is not None and (ts is not None or te is not None):
            f = dtc.fields[time_i]
            enc = _field_enc(lex, time_i, f, ser)
            if ts is not None:
                conds.append(enc >= F.lit(_encode_py(ts, f)))
            if te is not None:
                conds.append(enc <= F.lit(_encode_py(te, f)))
        cs = const("coordSystem")
        if cs_i is not None and cs is not None:
            f = dtc.fields[cs_i]
            conds.append(_field_enc(lex, cs_i, f, ser) == F.lit(_encode_py(cs, f)))
        # custom field bounds
        cf = const("customFields")
        if cf is not None:
            names = cf.split("#")
            lo = const("customFieldsLowerBounds")
            hi = const("customFieldsUpperBounds")
            if lo is None or hi is None:
                raise ValueError("customFields needs lower and upper bounds")
            idxs = dtc.custom_indices(names)
            for i, lo_lex, hi_lex in zip(idxs, lo.split("#"), hi.split("#")):
                between_enc(i, lo_lex, hi_lex)
        hits = pts
        for c in conds:
            hits = hits.where(c)
        # ---------------------------------------------------- outputs
        v = subj.name
        cols = [F.col("st").alias(v), F.col("s").alias(v + "__id")]
        vars_ = {v}
        extra_terms: list[tuple[str, Column]] = []

        def out_var(key, col: Column):
            node = cfg.get(key)
            if isinstance(node, A.Var):
                extra_terms.append((node.name, col))

        if lat_i is not None and lon_i is not None:
            la, lo_ = dtc.fields[lat_i], dtc.fields[lon_i]
            dlat = _field_decoded(lex, lat_i, la, ser)
            dlon = _field_decoded(lex, lon_i, lo_, ser)
            out_var("locationValue", ser.location(dlat, dlon))
            out_var("latValue", ser.latitude(dlat))
            out_var("lonValue", ser.longitude(dlon))
            if time_i is not None:
                out_var(
                    "locationAndTimeValue",
                    ser.location_time(
                        dlat, dlon,
                        _field_decoded(lex, time_i, dtc.fields[time_i], ser),
                    ),
                )
        if time_i is not None:
            out_var("timeValue", ser.time(_field_decoded(lex, time_i, dtc.fields[time_i], ser)))
        if cs_i is not None:
            out_var("coordSystemValue", ser.coord_system(_field_decoded(lex, cs_i, dtc.fields[cs_i], ser)))
        if cf is not None:
            idxs = dtc.custom_indices(cf.split("#"))
            out_var(
                "customFieldsValues",
                ser.custom_fields([_field_decoded(lex, i, dtc.fields[i], ser) for i in idxs]),
            )
        out_var("literalValue", F.col("ot"))
        if distance_col is not None:
            unit = const("spatialUnit", "Kilometers")
            d_units = distance_col / F.lit(_UNIT_TO_KM.get(unit, 1.0))
            out_var(
                "distanceValue",
                _typed_lit(F.round(d_units * 100) / F.lit(100.0), T.XSD_DOUBLE),
            )
        for name, col in extra_terms:
            cols.append(col.alias(name))
            vars_.add(name)
        # one solution per matching STATEMENT (the reference emits one
        # row per index hit — a subject with two matching literals
        # appears twice)
        cols.append(F.col("o").alias("__geo_hit"))
        out = hits.select(*cols).dropDuplicates(
            [v + "__id", "__geo_hit"] + [n for n, _ in extra_terms]
        ).drop("__geo_hit")
        for name, _ in extra_terms:
            out = out.withColumn(name + "__id", T.term_id(F.col(name)))
        return Sol(out, vars_, set())

    # parameters eligible for as-bound constant injection (compiler's
    # _as_bound_service); value-output predicates (locationValue,
    # timeValue, …) are NOT inputs — pre-bound values filter via join
    handler.input_params = {
        "search", "predicate", "searchDatatype", "spatialCircleCenter",
        "spatialCircleRadius", "spatialRectangleSouthWest",
        "spatialRectangleNorthEast", "timeStart", "timeEnd",
        "customFields", "customFieldsLowerBounds",
        "customFieldsUpperBounds", "coordSystem", "spatialUnit",
        "timeUnit",
    }
    return {GEO_NS: handler}


def canonicalize_literal_lex(lex: str, dtc: GeoDatatypeConfig, strict: bool = False) -> str:
    """Load-time canonical form of a geospatial literal: each component
    encoded then decoded (trunc(v*multiplier)/multiplier), doubles
    printed with their decimal point ("2#3#4" → "2.0#3.0#4").  The
    reference stores these literals as z-order keys and always
    rematerializes the decoded form (GeoSpatialLiteralExtension
    asValue), so the original lexical form is NOT preserved."""
    ser = dtc.serializer
    parts = ser.split_py(lex)
    if len(parts) != len(dtc.fields):
        if strict:
            # the reference raises InvalidGeoSpatialLiteralError at
            # load time (geo-cr-wrongdataformat)
            raise ValueError(
                f"invalid geospatial literal {lex!r} for {dtc.uri}: "
                f"expected {len(dtc.fields)} components"
            )
        return lex  # malformed literal: leave as-is
    out = []
    for raw, f in zip(parts, dtc.fields):
        try:
            enc = _encode_py(raw, f)
        except Exception:  # noqa: BLE001 — non-numeric component
            return lex
        if f.value_type == "DOUBLE":
            out.append(repr(enc / f.multiplier))
        else:
            out.append(str(enc // f.multiplier if f.multiplier != 1 else enc))
    return ser.join_py(out)


def geo_registry(datatype_configs: list | None = None, include_builtins: bool = True) -> dict:
    """uri → GeoDatatypeConfig registry (same resolution rules as
    make_geo_service)."""
    reg: dict[str, GeoDatatypeConfig] = {}
    if include_builtins:
        reg.update(builtin_configs())
    for c in datatype_configs or []:
        cfg = parse_geo_config(c) if isinstance(c, str) else c
        reg[cfg.uri] = cfg
    return reg
