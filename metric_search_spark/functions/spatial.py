"""Spatial cell math as pure Spark Column expressions.

Everything here compiles to JVM-side expressions inside whole-stage codegen —
no Python UDFs — mirroring the numpy kernels in
:mod:`metric_search_spark.cells` bit-for-bit (tested against them). This keeps
the cell-derivation hot path (run once per row over the full table) on the
fast path; the numpy twins serve the Arrow-UDF kernels and the unit-test
oracle.

The Morton layout is documented in ``cells.py``: coordinates are (x, y)
doubles in [0,1)², quantized to 31 bits, interleaved into a 62-bit code
(x even bits, y odd bits); a cell at resolution r is the top 2r bits plus the
resolution packed at bit 56.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_COORD_BITS = 31

# mask constants (all < 2^63, so they are valid positive BIGINT literals)
_M16 = 0x0000FFFF0000FFFF
_M8 = 0x00FF00FF00FF00FF
_M4 = 0x0F0F0F0F0F0F0F0F
_M2 = 0x3333333333333333
_M1 = 0x5555555555555555
_M32 = 0x00000000FFFFFFFF

__all__ = [
    "quantize_col",
    "dequantize_col",
    "spread_bits_col",
    "compact_bits_col",
    "phash_col",
    "xq_col",
    "yq_col",
    "coord_cols",
    "cell_col",
    "cell_from_xy_col",
    "cell_from_cxy_col",
    "with_xy_cell",
    "morton_bitsum_sql",
    "cell_xy_cols",
    "kring_cells_col",
    "cell_sql",
    "coord_sql",
    "spread_sql",
    "quantize_sql",
    "phash_sql",
    "cell_from_xy_sql",
    "hilbert_from_cxy_col",
    "with_hilbert",
    "hilbert_sql",
]


def quantize_col(u: Column) -> Column:
    """[0,1) double -> 31-bit grid index (cells.quantize)."""
    q = F.floor(u * F.lit(float(1 << _COORD_BITS))).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << _COORD_BITS) - 1), q))


def dequantize_col(q: Column) -> Column:
    """31-bit grid index -> cell-center double (cells.dequantize)."""
    return (q.cast("double") + F.lit(0.5)) / F.lit(float(1 << _COORD_BITS))


def spread_bits_col(v: Column) -> Column:
    """Low 31 bits of v spread to even bit positions (cells._spread_bits).

    Valid because inputs stay < 2^31, so every intermediate is non-negative
    and arithmetic shifts equal logical shifts.
    """
    x = v
    x = x.bitwiseOR(F.shiftleft(x, 16)).bitwiseAND(F.lit(_M16))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(_M8))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(_M4))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(_M2))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(_M1))
    return x


def compact_bits_col(v: Column) -> Column:
    """Gather even-position bits into the low 31 (cells._compact_bits)."""
    x = v.bitwiseAND(F.lit(_M1))
    x = x.bitwiseOR(F.shiftright(x, 1)).bitwiseAND(F.lit(_M2))
    x = x.bitwiseOR(F.shiftright(x, 2)).bitwiseAND(F.lit(_M4))
    x = x.bitwiseOR(F.shiftright(x, 4)).bitwiseAND(F.lit(_M8))
    x = x.bitwiseOR(F.shiftright(x, 8)).bitwiseAND(F.lit(_M16))
    x = x.bitwiseOR(F.shiftright(x, 16)).bitwiseAND(F.lit(_M32))
    return x


def phash_col(x: Column, y: Column) -> Column:
    """Normalized (x, y) -> 62-bit Morton phash (cells.phash_from_xy)."""
    return spread_bits_col(quantize_col(x)).bitwiseOR(
        F.shiftleft(spread_bits_col(quantize_col(y)), 1)
    )


def xq_col(phash: Column) -> Column:
    return compact_bits_col(phash)


def yq_col(phash: Column) -> Column:
    return compact_bits_col(F.shiftright(phash, 1))


def coord_cols(phash: Column) -> tuple[Column, Column]:
    """phash -> normalized (x, y) doubles (cells.coords_from_phash)."""
    return dequantize_col(xq_col(phash)), dequantize_col(yq_col(phash))


def cell_col(phash: Column, res: int) -> Column:
    """phash -> cell id at resolution res (cells.cell_from_phash).

    phash >= 0 by construction so arithmetic shift == logical shift.
    """
    if not 0 <= res <= 27:
        raise ValueError(f"resolution {res} out of [0, 27]")
    return (F.lit(res << 56) + F.shiftright(phash, 62 - 2 * res)).cast("long")


def cell_from_xy_col(x: Column, y: Column, res: int) -> Column:
    """Normalized (x, y) -> cell id (cells.cell_encode)."""
    return cell_col(phash_col(x, y), res)


def cell_from_cxy_col(cx: Column, cy: Column, res: int) -> Column:
    """Grid indices (cx, cy) at resolution ``res`` -> cell id: the one
    Morton-interleave-and-pack expression shared by every operator that
    enumerates grid rectangles (bbox covers, supercover rasterizers)."""
    return (
        F.lit(res << 56)
        + spread_bits_col(cx).bitwiseOR(F.shiftleft(spread_bits_col(cy), 1))
    ).cast("long")


def with_xy_cell(df, x: Column, y: Column, res: int, out: str = "cell"):
    """Append the Morton cell of normalized (x, y) as column ``out`` via a
    STAGED plan: one projection binds the res-bit quantized grid indices to
    real attributes, a second runs the interleave ripple over those bound
    attributes.

    Why not ``cell_from_xy_col`` inline: Catalyst substitutes, it does not
    let-bind — each of the 5 mask-ripple rounds references its input twice,
    so the quantize subtree (floor/least/greatest/multiply) is re-inlined
    2^5 times per axis. That tree pushed fused scan stages past Janino's
    64 KB generated-method limit (index build: 'Code grows beyond 64 KB'),
    silently dropping the WHOLE stage to interpreted execution — a 100-TB
    hot-path regression invisible at test scale. Staging keeps every
    generated method small; CollapseProject cannot re-merge the two
    projections because the quantize aliases are non-cheap and referenced
    2^5 times downstream. Output is bit-identical to ``cell_from_xy_col``
    (pinned in tests/test_spatial_cols.py)."""
    if not 0 <= res <= 27:
        raise ValueError(f"resolution {res} out of [0, 27]")
    shift = _COORD_BITS - res
    cxn, cyn = f"__{out}_cx", f"__{out}_cy"
    staged = df.withColumns(
        {
            cxn: F.shiftright(quantize_col(x), shift),
            cyn: F.shiftright(quantize_col(y), shift),
        }
    )
    return staged.withColumn(
        out, cell_from_cxy_col(F.col(cxn), F.col(cyn), res)
    ).drop(cxn, cyn)


def cell_xy_cols(cell: Column) -> tuple[Column, Column]:
    """cell id -> (cx, cy) grid indices at the cell's own resolution."""
    prefix = cell.bitwiseAND(F.lit((1 << 56) - 1))
    return compact_bits_col(prefix), compact_bits_col(F.shiftright(prefix, 1))


def _spread_int(v: int) -> int:
    """Python-side spread_bits for literal precomputation."""
    x = v & 0x7FFFFFFF
    x = (x | (x << 16)) & _M16
    x = (x | (x << 8)) & _M8
    x = (x | (x << 4)) & _M4
    x = (x | (x << 2)) & _M2
    x = (x | (x << 1)) & _M1
    return x


def kring_cells_col(
    cell: Column, res: int, k: int, with_offsets: bool = False
) -> Column:
    """array<long> of all cells within Chebyshev distance k (cells.kring),
    grid-clipped, as a pure Column expression ready to ``explode``. With
    ``with_offsets`` the elements are struct<cell, dx, dy> instead — for
    consumers that weight by the grid offset (focal kernels).

    Implementation note: higher-order-function lambdas are NOT part of
    whole-stage codegen, so anything per-element must be tiny. This uses
    **Morton arithmetic**: for each literal offset (dx, dy), the neighbor's
    interleaved prefix is computed directly from the cell's prefix with
    precomputed literal masks —

    - x-part increment:  ((xpart | YMASK) + spread(dx)) & XMASK
      (the y-slots filled with 1s make carries ripple across the gaps)
    - x-part decrement:  (xpart − spread(|dx|)) & XMASK
      (borrows ripple through the zeroed y-slots)
    - grid-bounds check by monotonicity of spread:
      cx + dx ≤ n−1  ⟺  xpart ≤ spread(n−1−dx)

    so each of the (2k+1)² elements is ~10 bit-ops on the prefix; no
    spread/compact chain is ever evaluated per element.
    """
    n = 1 << res
    xmask = _spread_int((1 << res) - 1)  # even positions within the 2r prefix bits
    ymask = xmask << 1
    prefix = cell.bitwiseAND(F.lit((1 << 56) - 1))
    xpart = prefix.bitwiseAND(F.lit(xmask)) if res > 0 else F.lit(0)
    ypart = prefix.bitwiseAND(F.lit(ymask)) if res > 0 else F.lit(0)

    def part_shift(part: Column, d: int, mask: int, filler: int, unit_spread) -> tuple:
        """(shifted part Column, bounds-ok Column) for one axis offset d."""
        if d == 0:
            return part, F.lit(True)
        if abs(d) > n - 1:
            return F.lit(0), F.lit(False)
        s = unit_spread(abs(d))
        if d > 0:
            shifted = (part.bitwiseOR(F.lit(filler)) + F.lit(s)).bitwiseAND(F.lit(mask))
            ok = part <= F.lit(unit_spread(n - 1 - d))
        else:
            shifted = (part - F.lit(s)).bitwiseAND(F.lit(mask))
            ok = part >= F.lit(s)
        return shifted, ok

    def wrap(cell_expr: Column | None, dx: int, dy: int, ok: Column | None):
        """cell-only long, or (cell, dx, dy) struct for offset-aware
        consumers (weighted focal kernels); None cell → null element."""
        if with_offsets:
            payload = None
            if cell_expr is not None:
                payload = F.struct(
                    cell_expr.cast("long").alias("cell"),
                    F.lit(dx).alias("dx"),
                    F.lit(dy).alias("dy"),
                )
            null = F.lit(None).cast("struct<cell:long,dx:int,dy:int>")
            if payload is None:
                return null
            return payload if ok is None else F.when(ok, payload).otherwise(null)
        if cell_expr is None:
            return F.lit(None).cast("long")
        cell_long = cell_expr.cast("long")
        if ok is None:
            return cell_long
        return F.when(ok, cell_long).otherwise(F.lit(None).cast("long"))

    elems = []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            if res == 0:
                # cast matters: the cogroup key must be LONG on both sides —
                # an int 0 here silently fails to group with long cells
                elems.append(
                    wrap(F.lit(0), 0, 0, None)
                    if dx == 0 and dy == 0
                    else wrap(None, dx, dy, None)
                )
                continue
            nxp, okx = part_shift(xpart, dx, xmask, ymask, _spread_int)
            nyp, oky = part_shift(
                ypart, dy, ymask, xmask, lambda v: _spread_int(v) << 1
            )
            cell_expr = F.lit(res << 56) + nxp.bitwiseOR(nyp)
            elems.append(wrap(cell_expr, dx, dy, okx & oky))
    return F.filter(F.array(*elems), lambda c: c.isNotNull())


# --------------------------------------------------------------- SQL (oracle)


def spread_sql(v_expr: str) -> str:
    """spread_bits as DuckDB SQL (multiplication = left shift; non-negative)."""
    x = f"({v_expr})"
    for shift, mask in ((16, _M16), (8, _M8), (4, _M4), (2, _M2), (1, _M1)):
        x = f"((({x}) | (({x}) * {2 ** shift})) & {mask})"
    return x


def quantize_sql(u_expr: str) -> str:
    max_q = (1 << _COORD_BITS) - 1
    return (
        f"least(greatest(CAST(floor(({u_expr}) * {float(1 << _COORD_BITS)}) AS BIGINT), 0), "
        f"{max_q})"
    )


def phash_sql(x_expr: str, y_expr: str) -> str:
    """phash_from_xy as DuckDB SQL."""
    return f"({spread_sql(quantize_sql(x_expr))} | ({spread_sql(quantize_sql(y_expr))} * 2))"


def cell_from_xy_sql(x_expr: str, y_expr: str, res: int) -> str:
    return cell_sql(phash_sql(x_expr, y_expr), res)


def morton_bitsum_sql(cx_expr: str, cy_expr: str, res: int) -> str:
    """Grid indices → cell id as an EXPLICIT per-bit sum (DuckDB):
    res<<56 + Σ_b ((cx>>b)&1)·4^b + ((cy>>b)&1)·2·4^b. Deliberately shares
    no arithmetic shape with the engine's spread-mask interleave — the
    oracle-side twin of ``cell_from_cxy_col``, used by every grid-oracle
    builder (rollup, kring, polyfill, compact, polyline, focal, kde).
    ``coalesce`` covers res=0 (empty list_transform → NULL)."""
    return (
        f"({res * (1 << 56)} + CAST(coalesce(list_sum(list_transform("
        f"range(0, {res}),"
        f" b -> (({cx_expr} >> b) & 1) * (CAST(1 AS BIGINT) << (2 * b))"
        f" + (({cy_expr} >> b) & 1) * (CAST(1 AS BIGINT) << (2 * b + 1)))), 0)"
        f" AS BIGINT))"
    )


def cell_sql(phash_expr: str, res: int) -> str:
    """Cell derivation as ANSI/DuckDB SQL (for the DuckDB oracle side)."""
    shift = 62 - 2 * res
    return f"(({res} * 72057594037927936) + ({phash_expr} // {2 ** shift}))"


def qcoord_sql(phash_expr: str, axis: str) -> str:
    """INTEGER quantized coordinate decode (the 31-bit q before
    normalization) as DuckDB SQL — the twin of xq_col/yq_col, used where
    downstream math must stay in exact integers (geo centroids)."""
    v = phash_expr if axis == "x" else f"(({phash_expr}) // 2)"
    x = f"(({v}) & {_M1})"
    for shift, mask in ((1, _M2), (2, _M4), (4, _M8), (8, _M16), (16, _M32)):
        x = f"((({x}) | (({x}) // {2 ** shift})) & {mask})"
    return x


def coord_sql(phash_expr: str, axis: str) -> str:
    """Normalized coordinate decode as DuckDB SQL. axis in {'x','y'}.

    Mirrors compact_bits via 5 mask/shift rounds; DuckDB's ``&``/``|``/``>>``
    on BIGINT behave like the JVM's for non-negative inputs.
    """
    x = qcoord_sql(phash_expr, axis)
    return f"((({x}) + 0.5) / {float(1 << _COORD_BITS)})"


def hilbert_from_cxy_col(cx: Column, cy: Column, res: int) -> Column:
    """Hilbert-curve index of cell (cx, cy) on the 2^res × 2^res lattice —
    the locality-preserving alternative to the Morton key: consecutive
    Hilbert indices are ALWAYS 4-adjacent cells (Morton jumps at quadrant
    seams), which makes Hilbert ranges the better bucketing for range
    scans and quota clustering over spatial data.

    The classic top-down quadrant walk (Hamilton/Wikipedia xy2d),
    unrolled over the ``res`` bit levels as pure Column math. The
    reflection step uses the all-ones identity n−1−v = (n−1) XOR v, so
    complementing the full field is exact at every level regardless of
    already-consumed high bits. Each level references the running (x, y)
    a constant number of times, so the expression tree grows ~3^res —
    fine through res 8 (≈ 6.5k nodes), guarded beyond (use several
    narrower encodes or an aggregate-fold if a deeper lattice is ever
    needed; tile keys in this engine are ≤ res 8 everywhere)."""
    if not 1 <= res <= 8:
        raise ValueError(f"hilbert res {res} out of [1, 8]")
    n1 = F.lit((1 << res) - 1)
    x, y = cx.cast("long"), cy.cast("long")
    d = F.lit(0).cast("long")
    for i in range(res - 1, -1, -1):
        rx = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ry = F.shiftright(y, i).bitwiseAND(F.lit(1))
        d = d + F.lit(1 << (2 * i)) * (F.lit(3) * rx).bitwiseXOR(ry)
        fx = F.when(rx == 1, n1 - x).otherwise(x)
        fy = F.when(rx == 1, n1 - y).otherwise(y)
        x, y = (
            F.when(ry == 0, fy).otherwise(x),
            F.when(ry == 0, fx).otherwise(y),
        )
    return d


def with_hilbert(df, cx: Column, cy: Column, res: int, out: str = "hkey"):
    """Append the Hilbert index of grid cell (cx, cy) as column ``out`` via
    a STAGED plan: one projection per xy2d level, each binding the walk
    state (x, y, d) to real attributes.

    Why not ``hilbert_from_cxy_col`` inline: each level references the
    running (x, y) ~4 times, so Catalyst's substitution grows the single
    expression tree ~4^res — at res 6 the generated hash-aggregate method
    crossed Janino's 64 KB limit ('Code grows beyond 64 KB') and the whole
    stage silently fell back to interpreted execution. Staged, the fused
    whole-stage method emits each level's expressions once (linear in res);
    CollapseProject cannot re-merge because every level's non-cheap aliases
    are referenced several times by the next. Bit-identical to the inline
    Column (pinned in tests/test_hilbert.py)."""
    if not 1 <= res <= 16:
        raise ValueError(f"hilbert res {res} out of [1, 16]")
    xn, yn, dn = f"__{out}_x", f"__{out}_y", f"__{out}_d"
    n1 = F.lit((1 << res) - 1)
    cur = df.withColumns(
        {
            xn: cx.cast("long"),
            yn: cy.cast("long"),
            dn: F.lit(0).cast("long"),
        }
    )
    for i in range(res - 1, -1, -1):
        x, y, d = F.col(xn), F.col(yn), F.col(dn)
        rx = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ry = F.shiftright(y, i).bitwiseAND(F.lit(1))
        fx = F.when(rx == 1, n1 - x).otherwise(x)
        fy = F.when(rx == 1, n1 - y).otherwise(y)
        cur = cur.withColumns(
            {
                dn: d + F.lit(1 << (2 * i)) * (F.lit(3) * rx).bitwiseXOR(ry),
                xn: F.when(ry == 0, fy).otherwise(x),
                yn: F.when(ry == 0, fx).otherwise(y),
            }
        )
    return cur.withColumn(out, F.col(dn)).drop(xn, yn, dn)


def hilbert_sql(cx_expr: str, cy_expr: str, res: int, src: str) -> str:
    """The Hilbert xy2d walk as a DuckDB RECURSIVE CTE fragment — a
    genuinely iterative formulation (one row per cell per level, state
    (x, y, d, i) threaded through the recursion) against the Spark side's
    unrolled expression. Returns a complete SELECT producing
    (cx, cy, hkey) for every row of ``src`` (which must expose
    ``cx_expr``/``cy_expr``). Bitwise ops: DuckDB ``&``/``>>``/``xor()``
    on BIGINT match the JVM for non-negative inputs."""
    n1 = (1 << res) - 1
    return f"""
WITH RECURSIVE hw(cx, cy, x, y, d, i) AS (
  SELECT {cx_expr} AS cx, {cy_expr} AS cy,
         CAST({cx_expr} AS BIGINT), CAST({cy_expr} AS BIGINT),
         CAST(0 AS BIGINT), {res - 1}
  FROM {src}
  UNION ALL
  SELECT cx, cy,
         CASE WHEN ((y >> i) & 1) = 0
              THEN CASE WHEN ((x >> i) & 1) = 1 THEN {n1} - y ELSE y END
              ELSE x END,
         CASE WHEN ((y >> i) & 1) = 0
              THEN CASE WHEN ((x >> i) & 1) = 1 THEN {n1} - x ELSE x END
              ELSE y END,
         d + (CAST(1 AS BIGINT) << (2 * i))
           * xor(3 * ((x >> i) & 1), (y >> i) & 1),
         i - 1
  FROM hw WHERE i >= 0
)
SELECT cx, cy, d AS hkey FROM hw WHERE i = -1
"""
