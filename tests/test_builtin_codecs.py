"""Unit batteries for the two built-in backends added in round 3 —
pure-numpy OGC geometry validity (functions/geo_validity.py) and the
pure-stdlib PNG codec (functions/png.py). No Spark session: these pin the
kernels the pandas-UDF / mapInPandas stages wrap. Reference analogue:
locations.py:353-364 (shapely is_valid / has_z) for geometry; the image
codec is the engine-addition multimodal path (SURVEY §2.10)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from safedata_validator_spark.functions.geo_validity import ogc_valid_wkt
from safedata_validator_spark.functions.png import (
    PNGError,
    decode_png,
    encode_png,
    is_png,
    to_rgb,
)

# --------------------------------------------------------------------------
# OGC validity classes — (wkt, expected)
# --------------------------------------------------------------------------

VALID = [
    "POINT (1 2)",
    "POINT (-1.5e2 .25)",
    "MULTIPOINT ((1 1), (2 2))",
    "MULTIPOINT (1 1, 2 2)",
    "LINESTRING (0 0, 1 1, 2 0)",
    # self-crossing linestring: non-simple but VALID per OGC/GEOS
    "LINESTRING (0 0, 2 2, 2 0, 0 2)",
    "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
    "polygon ((0 0, 1 0, 1 1, 0 1, 0 0))",
    # concave, duplicate consecutive vertex (valid per GEOS)
    "POLYGON ((0 0, 1 0, 0.5 0.5, 1 1, 0 1, 0 0))",
    "POLYGON ((0 0, 1 0, 1 0, 1 1, 0 1, 0 0))",
    # proper hole; hole touching shell at a single point is allowed
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (0 0, 2 1, 1 2, 0 0))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
    "GEOMETRYCOLLECTION EMPTY",
    "POLYGON EMPTY",
]

INVALID = [
    # parse failures
    "not wkt at all",
    "POINT (1)",
    "POINT (1 2 3)",
    "POINT Z (1 2 3)",
    "LINESTRING (0 0, 1 1) trailing",
    "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)",
    # degenerate
    "LINESTRING (0 0, 0 0)",
    "POLYGON ((0 0, 1 0, 1 1, 0 1))",          # unclosed ring
    "POLYGON ((0 0, 1 0, 2 0, 0 0))",          # zero area
    "POLYGON ((0 0, 1 1, 0 0))",               # too few distinct vertices
    # self-intersection family
    "POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))",     # bowtie
    "POLYGON ((0 0, 2 0, 2 2, 1 0, 0 2, 0 0))",  # pinch: vertex on edge
    "POLYGON ((0 0, 2 0, 1 0, 1 1, 0 1, 0 0))",  # collinear backtrack spike
    # hole topology
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (5 5, 6 5, 6 6, 5 6, 5 5))",  # outside
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 5, 1 5, 1 1))",  # crosses
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1),"
    " (1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))",                 # nested
    # multipolygon topology
    "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((1 1, 2 1, 2 2, 1 2, 1 1)))",
    "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((1 1, 3 1, 3 3, 1 3, 1 1)))",
    # a collection is only as valid as its members
    "GEOMETRYCOLLECTION (POINT (1 2), POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0)))",
]


@pytest.mark.parametrize("wkt", VALID)
def test_ogc_valid(wkt):
    assert ogc_valid_wkt(wkt) is True, wkt


@pytest.mark.parametrize("wkt", INVALID)
def test_ogc_invalid(wkt):
    assert ogc_valid_wkt(wkt) is False, wkt


def test_ogc_null_passthrough():
    assert ogc_valid_wkt(None) is None


# --------------------------------------------------------------------------
# PNG codec — round trips across channel counts, filter types, sizes
# --------------------------------------------------------------------------


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_round_trip(channels, filter_type):
    rng = np.random.default_rng(channels * 10 + filter_type)
    for shape in ((1, 1), (3, 5), (16, 16), (7, 2)):
        arr = rng.integers(0, 256, size=(*shape, channels), dtype=np.uint8)
        out = decode_png(encode_png(arr, filter_type=filter_type))
        assert out.shape == arr.shape and (out == arr).all()


def test_png_grey_2d_and_to_rgb():
    g = np.arange(24, dtype=np.uint8).reshape(4, 6)
    assert (decode_png(encode_png(g))[:, :, 0] == g).all()
    rgba = np.dstack([g, g, g, np.full_like(g, 7)])
    assert (to_rgb(rgba) == np.dstack([g, g, g])).all()
    assert to_rgb(g[:, :, None]).shape == (4, 6, 3)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def test_png_palette_with_transparency():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes((255, 0, 0, 0, 255, 0))
    raw = b"\x00\x00\x01" + b"\x00\x01\x00"
    base = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
    tail = _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    img = decode_png(base + _chunk(b"tRNS", bytes((255, 128))) + tail)
    assert img.shape == (2, 2, 4)
    assert (img[0, 0] == (255, 0, 0, 255)).all()
    assert (img[0, 1] == (0, 255, 0, 128)).all()
    assert decode_png(base + tail).shape == (2, 2, 3)


def test_png_rejects_corruption():
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_png(arr))
    assert is_png(bytes(data))
    with pytest.raises(PNGError):
        decode_png(b"not a png")
    data[-9] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(PNGError):
        decode_png(bytes(data))
    truncated = encode_png(arr)[:-12]
    with pytest.raises(PNGError):
        decode_png(truncated)
