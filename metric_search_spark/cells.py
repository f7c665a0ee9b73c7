"""Hierarchical spatial cell index — Morton (Z-order) quadkey over a normalized
[0,1)² coordinate plane, with an H3/S2-style API (encode / parent / children /
k-ring). The `h3` package is absent from the environment, so the engine ships
its own cell scheme; the API mirrors H3's so a hexagonal backend can drop in.

Layout
------
- Coordinates: (x, y) doubles in [0,1)², quantized to 31 bits per axis.
- ``phash`` (the image table's int64 column) IS the full-resolution Morton
  code: 62 interleaved bits, x in even bit positions, y in odd. Keeping it to
  62 bits guarantees phash >= 0, so Spark/DuckDB bigint semantics agree and no
  unsigned-shift headaches exist on either side.
- A cell at resolution r is the top 2r bits: ``cell = phash >> (62 - 2r)``
  (plus the resolution packed in the high bits so cells of different
  resolutions never collide). Cell side length = 2^-r in normalized units.

Everything here is vectorized numpy (the Arrow-UDF hot path). The cell
derivation itself is also exposed as a pure Spark Column expression
(`cell_col`) so the common case stays JVM-side inside whole-stage codegen.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 31
_COORD_BITS = 31
_FULL = np.uint64(62)

__all__ = [
    "MAX_RES",
    "quantize",
    "dequantize",
    "interleave_bits",
    "deinterleave_bits",
    "phash_from_xy",
    "xy_from_phash",
    "coords_from_phash",
    "cell_encode",
    "cell_from_phash",
    "cell_to_xy",
    "cell_parent",
    "cell_children",
    "kring",
    "kring_many",
    "cell_size",
    "ring_guarantee_radius",
    "cell_col",
    "cell_sql",
]


def quantize(u: np.ndarray) -> np.ndarray:
    """[0,1) double -> 31-bit grid index."""
    u = np.asarray(u, dtype=np.float64)
    q = np.floor(u * (1 << _COORD_BITS)).astype(np.int64)
    return np.clip(q, 0, (1 << _COORD_BITS) - 1).astype(np.uint64)


def dequantize(q: np.ndarray) -> np.ndarray:
    """31-bit grid index -> cell-center double in [0,1)."""
    return (np.asarray(q, dtype=np.float64) + 0.5) / (1 << _COORD_BITS)


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 31 bits of v so bit i lands at position 2i (Morton)."""
    x = np.asarray(v, dtype=np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact_bits(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits: gather bits at even positions into the low 31."""
    x = np.asarray(v, dtype=np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def interleave_bits(xq: np.ndarray, yq: np.ndarray) -> np.ndarray:
    """Morton code: x bits at even positions, y bits at odd. Result < 2^62."""
    return _spread_bits(xq) | (_spread_bits(yq) << np.uint64(1))


def deinterleave_bits(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    m = np.asarray(m, dtype=np.uint64)
    return _compact_bits(m), _compact_bits(m >> np.uint64(1))


def phash_from_xy(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Normalized (x, y) in [0,1)² -> 62-bit Morton phash (int64, >= 0)."""
    return interleave_bits(quantize(x), quantize(y)).astype(np.int64)


def xy_from_phash(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """phash -> quantized 31-bit (xq, yq)."""
    return deinterleave_bits(np.asarray(phash, dtype=np.int64).astype(np.uint64))


def coords_from_phash(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """phash -> normalized double (x, y) cell-center coordinates."""
    xq, yq = xy_from_phash(phash)
    return dequantize(xq), dequantize(yq)


def _pack(res: int, prefix: np.ndarray) -> np.ndarray:
    """Pack (resolution, 2r-bit Morton prefix) into one non-negative int64.
    Resolution lives in bits 56..61 (6 bits, res <= 31 < 64)."""
    return (np.int64(res) << np.int64(56)) | prefix.astype(np.int64)


def _unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    return (cell >> np.int64(56)).astype(np.int64), cell & np.int64((1 << 56) - 1)


def cell_from_phash(phash: np.ndarray, res: int) -> np.ndarray:
    """Cell id at resolution res from the Morton phash: top 2r bits + res tag."""
    if not 0 <= res <= 27:  # 2*27 = 54 prefix bits < 56-bit payload field
        raise ValueError(f"resolution {res} out of [0, 27]")
    prefix = (np.asarray(phash, dtype=np.int64).astype(np.uint64) >> (
        _FULL - np.uint64(2 * res)
    )).astype(np.int64)
    return _pack(res, prefix)


def cell_encode(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """Normalized (x, y) -> cell id at resolution res."""
    return cell_from_phash(phash_from_xy(x, y), res)


def cell_to_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cell id -> (res, cx, cy) grid indices at that resolution."""
    res, prefix = _unpack(cell)
    cx, cy = deinterleave_bits(prefix.astype(np.uint64))
    return res, cx.astype(np.int64), cy.astype(np.int64)


def cell_parent(cell: np.ndarray) -> np.ndarray:
    """One resolution coarser (H3-style hierarchy)."""
    res, prefix = _unpack(cell)
    if np.any(res <= 0):
        raise ValueError("cell_parent at resolution 0")
    return _pack(int(res.flat[0]) - 1 if np.ndim(res) else int(res) - 1,
                 (prefix.astype(np.uint64) >> np.uint64(2)).astype(np.int64))


def cell_children(cell: int) -> np.ndarray:
    """The four child cells one resolution finer."""
    res, prefix = _unpack(np.asarray([cell]))
    r = int(res[0])
    base = np.uint64(prefix[0]) << np.uint64(2)
    return _pack(r + 1, (base + np.arange(4, dtype=np.uint64)).astype(np.int64))


def cell_size(res: int) -> float:
    """Cell side length in normalized coordinate units."""
    return 2.0 ** (-res)


def kring(cell: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k of `cell` (clipped to the grid),
    including the cell itself. H3's kRing analog on the quad grid."""
    res, prefix = _unpack(np.asarray([cell], dtype=np.int64))
    r = int(res[0])
    cx, cy = deinterleave_bits(prefix.astype(np.uint64))
    n = 1 << r
    xs = np.arange(int(cx[0]) - k, int(cx[0]) + k + 1)
    ys = np.arange(int(cy[0]) - k, int(cy[0]) + k + 1)
    xs = xs[(xs >= 0) & (xs < n)]
    ys = ys[(ys >= 0) & (ys < n)]
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    prefixes = interleave_bits(gx.ravel().astype(np.uint64), gy.ravel().astype(np.uint64))
    return _pack(r, prefixes.astype(np.int64))


def kring_many(cells: np.ndarray, ks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized k-ring for a batch of cells with per-cell ring radius.

    Returns (row_index, neighbor_cell) pairs ready to explode into a candidate
    DataFrame. Grid-clipped. All numpy; used inside Arrow UDFs.
    """
    cells = np.asarray(cells, dtype=np.int64)
    ks = np.asarray(ks, dtype=np.int64)
    res, prefix = _unpack(cells)
    if len(cells) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    r = int(res[0])
    n = 1 << r
    cx, cy = deinterleave_bits(prefix.astype(np.uint64))
    cx = cx.astype(np.int64)
    cy = cy.astype(np.int64)
    widths = 2 * ks + 1
    counts = widths * widths  # upper bound before clipping
    row_idx = np.repeat(np.arange(len(cells)), counts)
    # per-row offset enumeration
    offs = np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.empty(0, int)
    w = np.repeat(widths, counts)
    kk = np.repeat(ks, counts)
    dx = offs // w - kk
    dy = offs % w - kk
    nx = np.repeat(cx, counts) + dx
    ny = np.repeat(cy, counts) + dy
    ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
    row_idx, nx, ny = row_idx[ok], nx[ok], ny[ok]
    prefixes = interleave_bits(nx.astype(np.uint64), ny.astype(np.uint64))
    return row_idx, _pack(r, prefixes.astype(np.int64))


def ring_guarantee_radius(x: np.ndarray, y: np.ndarray, res: int, k: np.ndarray) -> np.ndarray:
    """Largest L2 radius fully covered by the explored k-ring around each
    point's cell: the distance from the point to the nearest edge of the
    explored square (grid borders count as covered). A kNN result whose kth
    distance is <= this radius is provably exact."""
    s = cell_size(res)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    k = np.asarray(k, dtype=np.float64)
    cx = np.floor(x / s)
    cy = np.floor(y / s)
    n = 2.0**res
    lo_x = (cx - k) * s
    hi_x = (cx + k + 1.0) * s
    lo_y = (cy - k) * s
    hi_y = (cy + k + 1.0) * s
    # edges at/beyond the grid border are fully covered -> infinite margin there
    mx_lo = np.where(lo_x <= 0.0, np.inf, x - lo_x)
    mx_hi = np.where(hi_x >= 1.0, np.inf, hi_x - x)
    my_lo = np.where(lo_y <= 0.0, np.inf, y - lo_y)
    my_hi = np.where(hi_y >= 1.0, np.inf, hi_y - y)
    return np.minimum(np.minimum(mx_lo, mx_hi), np.minimum(my_lo, my_hi))


# ----------------------------------------------------------------- Spark / SQL


def cell_col(phash_col, res: int):
    """Pure Column expression for cell_from_phash — stays in whole-stage
    codegen, no UDF: (res << 56) | (phash >> (62 - 2*res)). phash >= 0 so
    arithmetic shift == logical shift."""
    from pyspark.sql import functions as F

    shift = 62 - 2 * res
    return (F.lit(res << 56) + F.shiftright(phash_col, shift)).cast("long")


def cell_sql(phash_expr: str, res: int) -> str:
    """Same derivation as ANSI/DuckDB SQL (for the oracle side)."""
    shift = 62 - 2 * res
    return f"(({res} * 72057594037927936) + ({phash_expr} // {2**shift}))"
