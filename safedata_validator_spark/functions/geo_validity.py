"""Pure-numpy OGC geometry validity — the built-in backend for
``geo.full_validity`` when shapely is absent.

Reference analogue: ``shapely.wkt.loads`` + ``geometry.is_valid`` +
``has_z`` (locations.py:353-364).  The reference delegates to GEOS; this
module re-implements the OGC *validity* rules (not the full simple-features
algebra) for the geometry classes the reference data model uses, with the
checks a validation engine actually needs to raise:

* parse failure (malformed WKT) → invalid;
* any Z/M coordinate → invalid (the reference rejects ``has_z`` outright);
* POINT / MULTIPOINT: always valid once parsed;
* LINESTRING: ≥ 2 distinct points (OGC validity does not require
  simplicity, matching GEOS: a self-crossing linestring is *valid*);
* POLYGON: every ring closed with ≥ 3 distinct vertices and non-zero
  area; rings simple (no self-intersection, no pinch, no collinear
  backtrack spike); holes inside the shell, not nested in each other,
  and no ring properly crossing another (point touches are allowed, as
  in OGC);
* MULTIPOLYGON: each member valid, shells neither properly crossing nor
  nested (point touches allowed);
* GEOMETRYCOLLECTION: every member valid.

Known divergence from GEOS, documented rather than hidden: the
interior-connectivity rule (a chain of holes touching at points that
disconnects the polygon interior) is not detected — it needs the full
topology graph and does not occur in validation-shaped location data.
When shapely *is* importable, ``geo.full_validity`` prefers it; the
parity battery in tests/test_env_gated.py pins the two backends to agree
the moment the library is present.

Everything here is driver/UDF-side Python over numpy — it runs inside the
Arrow-batched pandas UDF on the SMALL locations dimension (SURVEY §2.8),
never on the fact table, so O(n²) segment tests over rings of tens of
vertices are the right cost model.
"""

from __future__ import annotations

import re

import numpy as np

_NUM_RX = re.compile(r"-?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")
# no ^ anchor: .match(s, pos) anchors at pos, and ^ would only match pos 0
_TAG_RX = re.compile(r"\s*([A-Za-z]+)\s*(Z|M|ZM)?\s*(EMPTY|\()", re.IGNORECASE)


class WKTParseError(ValueError):
    pass


def _parse(text: str):
    """Recursive-descent WKT parse → (kind, payload).

    payload by kind: POINT → (1,2) ndarray; LINESTRING/MULTIPOINT →
    (n,2) ndarray; POLYGON/MULTILINESTRING → [rings]; MULTIPOLYGON →
    [[rings]]; GEOMETRYCOLLECTION → [(kind, payload)].  Raises
    WKTParseError on malformed text or any non-2-D coordinate (Z/M
    dimension tags or a third number in a tuple)."""
    m = _TAG_RX.match(text)
    if not m:
        raise WKTParseError("no geometry tag")
    kind = m.group(1).upper()
    if m.group(2):
        raise WKTParseError("Z/M dimension")
    if m.group(3).upper() == "EMPTY":
        return kind, None
    pos = m.end() - 1  # at the opening paren
    payload, pos = _parse_body(text, pos, kind)
    if text[pos:].strip():
        raise WKTParseError("trailing text")
    return kind, payload


def _parse_body(s: str, pos: int, kind: str):
    if kind == "POINT":
        pts, pos = _parse_tuple_list(s, pos)
        if pts.shape[0] != 1:
            raise WKTParseError("POINT needs exactly one coordinate")
        return pts[0], pos
    if kind in ("LINESTRING", "MULTIPOINT"):
        # MULTIPOINT accepts both (1 2, 3 4) and ((1 2), (3 4))
        if kind == "MULTIPOINT" and re.match(r"\(\s*\(", s[pos:]):
            groups, pos = _parse_nested(s, pos, depth=1)
            return np.vstack(groups), pos
        return _parse_tuple_list(s, pos)
    if kind in ("POLYGON", "MULTILINESTRING"):
        return _parse_nested(s, pos, depth=1)
    if kind == "MULTIPOLYGON":
        return _parse_nested(s, pos, depth=2)
    if kind == "GEOMETRYCOLLECTION":
        return _parse_collection(s, pos)
    raise WKTParseError(f"unknown tag {kind}")


def _expect(s: str, pos: int, ch: str) -> int:
    while pos < len(s) and s[pos].isspace():
        pos += 1
    if pos >= len(s) or s[pos] != ch:
        raise WKTParseError(f"expected {ch!r} at {pos}")
    return pos + 1


def _parse_tuple_list(s: str, pos: int):
    """'( x y , x y , ... )' → (n,2) float ndarray."""
    pos = _expect(s, pos, "(")
    end = s.find(")", pos)
    if end < 0:
        raise WKTParseError("unclosed parenthesis")
    body, out = s[pos:end], []
    for tok in body.split(","):
        nums = _NUM_RX.findall(tok)
        if len(nums) != 2 or _NUM_RX.sub("", tok).strip("() \t"):
            raise WKTParseError(f"bad coordinate tuple {tok!r}")
        out.append((float(nums[0]), float(nums[1])))
    if not out:
        raise WKTParseError("empty coordinate list")
    return np.array(out, dtype=np.float64), end + 1


def _parse_nested(s: str, pos: int, depth: int):
    """depth=1: '((...),(...))' → [arrays]; depth=2: one more level."""
    pos = _expect(s, pos, "(")
    items = []
    while True:
        if depth == 1:
            item, pos = _parse_tuple_list(s, pos)
        else:
            item, pos = _parse_nested(s, pos, depth - 1)
        items.append(item)
        while pos < len(s) and s[pos].isspace():
            pos += 1
        if pos >= len(s):
            raise WKTParseError("unclosed parenthesis")
        if s[pos] == ",":
            pos += 1
            continue
        if s[pos] == ")":
            return items, pos + 1
        raise WKTParseError(f"unexpected {s[pos]!r} at {pos}")


def _parse_collection(s: str, pos: int):
    pos = _expect(s, pos, "(")
    members = []
    while True:
        m = _TAG_RX.match(s, pos)
        if not m:
            raise WKTParseError("collection member has no tag")
        kind = m.group(1).upper()
        if m.group(2):
            raise WKTParseError("Z/M dimension")
        if m.group(3).upper() == "EMPTY":
            members.append((kind, None))
            pos = m.end()
        else:
            payload, pos = _parse_body(s, m.end() - 1, kind)
            members.append((kind, payload))
        while pos < len(s) and s[pos].isspace():
            pos += 1
        if pos < len(s) and s[pos] == ",":
            pos += 1
            continue
        if pos < len(s) and s[pos] == ")":
            return members, pos + 1
        raise WKTParseError("unclosed collection")


# -- geometry predicates ----------------------------------------------------


def _dedupe(ring: np.ndarray) -> np.ndarray:
    """Drop repeated consecutive vertices (valid per GEOS, collapse them
    before simplicity checks so a doubled vertex is not a zero-length
    'edge')."""
    keep = np.ones(len(ring), dtype=bool)
    keep[1:] = (ring[1:] != ring[:-1]).any(axis=1)
    return ring[keep]


def _signed_area2(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _segments_properly_cross(a0, a1, b0, b1) -> np.ndarray:
    """Vectorized: does segment (a0,a1) properly cross each (b0,b1)?
    Proper = interiors intersect at a single point (strict straddle both
    ways). All inputs (n,2)-broadcastable."""

    def cross(o, p, q):
        return (p[..., 0] - o[..., 0]) * (q[..., 1] - o[..., 1]) - (
            p[..., 1] - o[..., 1]
        ) * (q[..., 0] - o[..., 0])

    d1 = cross(a0, a1, b0)
    d2 = cross(a0, a1, b1)
    d3 = cross(b0, b1, a0)
    d4 = cross(b0, b1, a1)
    return (
        ((d1 > 0) & (d2 < 0) | (d1 < 0) & (d2 > 0))
        & ((d3 > 0) & (d4 < 0) | (d3 < 0) & (d4 > 0))
    )


def _on_segment(p, a, b) -> np.ndarray:
    """Is point p collinear-with and within segment (a, b)? Vectorized."""
    cr = (b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (p[..., 0] - a[..., 0])
    within = (
        (np.minimum(a[..., 0], b[..., 0]) <= p[..., 0])
        & (p[..., 0] <= np.maximum(a[..., 0], b[..., 0]))
        & (np.minimum(a[..., 1], b[..., 1]) <= p[..., 1])
        & (p[..., 1] <= np.maximum(a[..., 1], b[..., 1]))
    )
    return (cr == 0) & within


def _ring_edges(ring: np.ndarray):
    """Closed ring (first==last) → (starts, ends) of its n-1 edges."""
    return ring[:-1], ring[1:]


def _ring_is_simple(ring: np.ndarray) -> bool:
    """Ring already deduped+closed: no proper crossings, no vertex on
    another edge's interior (pinch), no collinear backtrack between
    consecutive edges (spike)."""
    a0, a1 = _ring_edges(ring)
    n = len(a0)
    if n < 3:
        return False
    # consecutive-edge spike: direction reverses along the same line
    d = a1 - a0
    d_next = np.roll(d, -1, axis=0)
    crossz = d[:, 0] * d_next[:, 1] - d[:, 1] * d_next[:, 0]
    dot = (d * d_next).sum(axis=1)
    if ((crossz == 0) & (dot < 0)).any():
        return False
    # all non-adjacent pairs (i, j), j > i+1, excluding the (0, n-1) wrap
    i, j = np.triu_indices(n, k=2)
    mask = ~((i == 0) & (j == n - 1))
    i, j = i[mask], j[mask]
    if len(i) == 0:
        return True
    if _segments_properly_cross(a0[i], a1[i], a0[j], a1[j]).any():
        return False
    # pinch: a vertex lying on a non-adjacent edge (incl. shared vertices —
    # after dedupe a revisited vertex is a self-touch, invalid for a ring)
    verts = ring[:-1]
    vi = np.arange(n)
    V = verts[:, None, :]
    A0, A1 = a0[None, :, :], a1[None, :, :]
    on = _on_segment(np.broadcast_to(V, (n, n, 2)), np.broadcast_to(A0, (n, n, 2)),
                     np.broadcast_to(A1, (n, n, 2)))
    adj = np.zeros((n, n), dtype=bool)
    adj[vi, vi] = True                      # own outgoing edge
    adj[vi, (vi - 1) % n] = True            # own incoming edge
    return not (on & ~adj).any()


def _point_in_ring(p: np.ndarray, ring: np.ndarray) -> int:
    """1 = strictly inside, 0 = on boundary, -1 = outside (ray casting)."""
    a0, a1 = _ring_edges(ring)
    if _on_segment(p[None, :], a0, a1).any():
        return 0
    x, y = p
    x0, y0 = a0[:, 0], a0[:, 1]
    x1, y1 = a1[:, 0], a1[:, 1]
    straddle = (y0 > y) != (y1 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (y - y0) * (x1 - x0) / np.where(y1 == y0, np.nan, y1 - y0)
    crossings = int((straddle & (xint > x)).sum())
    return 1 if crossings % 2 == 1 else -1


def _rings_properly_cross(r1: np.ndarray, r2: np.ndarray) -> bool:
    a0, a1 = _ring_edges(r1)
    b0, b1 = _ring_edges(r2)
    A0 = a0[:, None, :]
    A1 = a1[:, None, :]
    B0 = b0[None, :, :]
    B1 = b1[None, :, :]
    return bool(_segments_properly_cross(A0, A1, B0, B1).any())


def _ring_inside(inner: np.ndarray, outer: np.ndarray) -> bool:
    """Any vertex of inner strictly inside outer (used after the
    no-proper-crossing check, where one strict vertex ⇒ containment)."""
    return any(_point_in_ring(v, outer) == 1 for v in inner[:-1])


def _normalize_ring(ring: np.ndarray):
    """Dedupe, require closure + ≥3 distinct vertices + nonzero area;
    return the closed deduped ring or None if degenerate."""
    if len(ring) < 4 or (ring[0] != ring[-1]).any():
        return None
    r = _dedupe(ring)
    if (r[0] == r[-1]).all():
        r = r[:-1]
    if len(r) < 3:
        return None
    closed = np.vstack([r, r[:1]])
    if _signed_area2(closed) == 0.0:
        return None
    return closed


def _polygon_valid(rings) -> bool:
    norm = []
    for ring in rings:
        r = _normalize_ring(ring)
        if r is None or not _ring_is_simple(r):
            return False
        norm.append(r)
    shell, holes = norm[0], norm[1:]
    for h in holes:
        if _rings_properly_cross(shell, h):
            return False
        # every hole vertex inside-or-on the shell, at least one strict
        sides = [_point_in_ring(v, shell) for v in h[:-1]]
        if any(s == -1 for s in sides) or not any(s == 1 for s in sides):
            return False
    for i in range(len(holes)):
        for j in range(i + 1, len(holes)):
            if _rings_properly_cross(holes[i], holes[j]):
                return False
            if _ring_inside(holes[i], holes[j]) or _ring_inside(
                holes[j], holes[i]
            ):
                return False
    return True


def _multipolygon_valid(polys) -> bool:
    if not all(_polygon_valid(rings) for rings in polys):
        return False
    shells = [_normalize_ring(rings[0]) for rings in polys]
    for i in range(len(shells)):
        for j in range(i + 1, len(shells)):
            if _rings_properly_cross(shells[i], shells[j]):
                return False
            if _ring_inside(shells[i], shells[j]) or _ring_inside(
                shells[j], shells[i]
            ):
                return False
    return True


def _valid(kind: str, payload) -> bool:
    if payload is None:  # EMPTY geometries are valid
        return True
    if kind in ("POINT", "MULTIPOINT"):
        return True
    if kind == "LINESTRING":
        return len(_dedupe(payload)) >= 2
    if kind == "MULTILINESTRING":
        return all(len(_dedupe(ls)) >= 2 for ls in payload)
    if kind == "POLYGON":
        return _polygon_valid(payload)
    if kind == "MULTIPOLYGON":
        return _multipolygon_valid(payload)
    if kind == "GEOMETRYCOLLECTION":
        return all(_valid(k, p) for k, p in payload)
    return False


def ogc_valid_wkt(text) -> bool | None:
    """None-safe scalar entry point: True/False per the module contract,
    None for NULL input (blankness is a different rule's business)."""
    if text is None:
        return None
    try:
        kind, payload = _parse(text)
    except WKTParseError:
        return False
    try:
        return bool(_valid(kind, payload))
    except Exception:
        return False
