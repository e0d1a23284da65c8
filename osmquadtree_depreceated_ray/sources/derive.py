"""Deterministic geo derivation from integer keys — oracle-safe by design.

The driver's correctness gate runs our Ray pipelines against DuckDB SQL
on the same parquet tables (TESTDATA.md).  Those tables carry no geo
columns, so spatial queries derive entity coordinates from an int64 key
column (e.g. ``documents.doc_id``):

    kx = (key * 48271)  % 2^18          # level-18 x cell
    ky = (key * 69621)  % 2^18          # level-18 y cell (from the south)
    lon = centre of x-cell kx           # exact closed form, IEEE-identical
    lat = unmerc(centre of y-cell ky)   # mid-cell in mercator space

Because both coordinates sit at CELL CENTRES of the level-18 grid, the
quadtree descent (:func:`..functions.quadtree.calculate_point`) has a
quarter-cell (~1.7e-4 normalized) safety margin at every one of its 18
quadrant comparisons — five orders of magnitude above the ulp-level
differences between numpy's SIMD transcendentals and libm/DuckDB.  The
resulting tile is therefore *provably* the Morton interleave of
(kx, 2^18-1-ky), which the SQL oracle computes with pure INTEGER
arithmetic (see :func:`sql_qt_expr`) — float parity drops out entirely.

tests/test_derive.py pins: descent(qt) == morton(kx, ky) for every key.
"""

from __future__ import annotations

import numpy as np

from ..functions.quadtree import to_int, unmerc

LEVEL = 18
N_CELLS = 1 << LEVEL  # 262144
MUL_X = 48271
MUL_Y = 69621
X_CELL_DEG7 = 3_600_000_000.0 / N_CELLS  # 13732.91015625, exactly representable
Y_CELL_MERC = 180.0 / N_CELLS            # 0.0006866455078125, exact


def derive_cells(key) -> tuple[np.ndarray, np.ndarray]:
    key = np.asarray(key, dtype=np.int64)
    return (key * MUL_X) % N_CELLS, (key * MUL_Y) % N_CELLS


def derive_lonlat(key) -> tuple[np.ndarray, np.ndarray]:
    """int64 1e-7-deg mid-cell coordinates for a key array."""
    kx, ky = derive_cells(key)
    lon = np.trunc((kx + 0.5) * X_CELL_DEG7).astype(np.int64) - 1_800_000_000
    y_merc = -90.0 + (ky + 0.5) * Y_CELL_MERC
    lat = to_int(unmerc(y_merc))
    return lon, lat


def _spread_bits_np(v: np.ndarray) -> np.ndarray:
    """Interleave-with-zeros (2D Morton spread) of an up-to-32-bit value."""
    v = v.astype(np.int64)
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def expected_qt(key) -> np.ndarray:
    """The provable level-18 qt for derived coordinates: Morton interleave
    of (kx, flipped ky) + depth bits (quadtree.go:253-268 FromTuple)."""
    kx, ky = derive_cells(key)
    y_slippy = (N_CELLS - 1) - ky  # slippy y counts from the north
    inter = _spread_bits_np(kx) | (_spread_bits_np(y_slippy) << 1)
    return (inter << (63 - 2 * LEVEL)) | LEVEL


# --- SQL fragments for the DuckDB oracle (identical integer math) -----------

def sql_cells_expr(key_col: str) -> tuple[str, str]:
    k = f"CAST({key_col} AS BIGINT)"  # keep all downstream bit-ops 64-bit
    return (
        f"(({k} * {MUL_X}) % {N_CELLS})",
        f"(({k} * {MUL_Y}) % {N_CELLS})",
    )


def sql_spread(expr: str) -> str:
    """SQL 2D Morton spread of an integer expression (same masks)."""
    v = expr
    v = f"(({v} | ({v} << 16)) & {0x0000FFFF0000FFFF})"
    v = f"(({v} | ({v} << 8)) & {0x00FF00FF00FF00FF})"
    v = f"(({v} | ({v} << 4)) & {0x0F0F0F0F0F0F0F0F})"
    v = f"(({v} | ({v} << 2)) & {0x3333333333333333})"
    v = f"(({v} | ({v} << 1)) & {0x5555555555555555})"
    return v


def sql_qt_expr(key_col: str) -> str:
    kx, ky = sql_cells_expr(key_col)
    ys = f"({N_CELLS - 1} - {ky})"
    inter = f"({sql_spread(kx)} | ({sql_spread(ys)} << 1))"
    return f"(({inter} << {63 - 2 * LEVEL}) | {LEVEL})"


def sql_lonlat_expr(key_col: str) -> tuple[str, str]:
    """SQL producing the same int64 lon/lat (used where the oracle needs
    coordinates, e.g. kNN distances; trunc-based int cast matches
    numpy's astype truncation)."""
    kx, ky = sql_cells_expr(key_col)
    lon = f"(CAST(trunc(({kx} + 0.5) * {X_CELL_DEG7!r}) AS BIGINT) - 1800000000)"
    ymerc = f"(-90.0 + ({ky} + 0.5) * {Y_CELL_MERC!r})"
    lat_deg = f"((atan(exp({ymerc} * pi() / 90.0)) * 4 / pi() - 1.0) * 90.0)"
    lat = (
        f"CAST(trunc(CASE WHEN {lat_deg} < 0 THEN {lat_deg} * 10000000.0 - 0.5 "
        f"ELSE {lat_deg} * 10000000.0 + 0.5 END) AS BIGINT)"
    )
    return lon, lat
