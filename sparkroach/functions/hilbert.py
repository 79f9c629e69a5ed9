"""Hilbert space-filling curve (order-8, 256×256) — python reference
plus a PORTABLE-SQL stage generator shared by the Spark query and the
DuckDB oracle, written from the classic iterative xy2d construction.

The curve property that matters for storage layout: consecutive
Hilbert indices are always Manhattan-adjacent cells (pinned on the
full grid in tests), while consecutive Z-order (Morton) indices
periodically jump across the whole quadrant — so range scans over a
Hilbert-clustered layout touch contiguous key regions.

The per-stage algebra is pure integer arithmetic (DIV/%/CASE, XOR
expanded to 3·rx + ry − 2·rx·ry), so the SAME generated SQL text runs
on Spark and DuckDB — one construction, two engines, zero drift.

Reference parity: none — storage-layout breadth per the build brief.
"""

from __future__ import annotations

HILBERT_ORDER = 8
HILBERT_SIDE = 1 << HILBERT_ORDER  # 256


def _rot(s: int, x: int, y: int, rx: int, ry: int) -> tuple[int, int]:
    if ry == 0:
        if rx == 1:
            x = s - 1 - x
            y = s - 1 - y
        x, y = y, x
    return x, y


def xy2d(x: int, y: int, side: int = HILBERT_SIDE) -> int:
    """Hilbert index of cell (x, y) on a side×side grid."""
    if not (0 <= x < side and 0 <= y < side):
        raise ValueError(f"hilbert: ({x}, {y}) outside {side}x{side}")
    d = 0
    s = side // 2
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        x, y = _rot(s, x, y, rx, ry)
        s //= 2
    return d


def d2xy(d: int, side: int = HILBERT_SIDE) -> tuple[int, int]:
    """Inverse: cell (x, y) of Hilbert index d."""
    if not 0 <= d < side * side:
        raise ValueError(f"hilbert: index {d} outside {side}x{side}")
    x = y = 0
    s = 1
    t = d
    while s < side:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # inverse rotation
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def morton(x: int, y: int, side: int = HILBERT_SIDE) -> int:
    """Z-order (Morton) index: bit-interleave of x and y."""
    z = 0
    for bit in range(side.bit_length() - 1):
        z |= ((x >> bit) & 1) << (2 * bit)
        z |= ((y >> bit) & 1) << (2 * bit + 1)
    return z


def hilbert_stages(
    side: int = HILBERT_SIDE, div: str = "DIV"
) -> list[dict[str, str]]:
    """Staged SQL for xy2d: stage k defines columns (hx, hy, hd) from
    the previous stage's columns — LINEAR text, because a single nested
    expression re-references x/y several times per stage and blows up
    exponentially over 8 stages.  Stage 0 reads columns ``hx``/``hy``
    (caller initializes them, hd = 0).  The algebra (integer division,
    %, CASE, positive ints) is engine-portable; only the integer-
    division TOKEN differs (Spark ``DIV``, DuckDB ``//``)."""
    stages = []
    s = side // 2
    while s > 0:
        rx = f"((hx {div} {s}) % 2)"
        ry = f"((hy {div} {s}) % 2)"
        # ((3·rx) XOR ry) in pure arithmetic; values 0..3
        xr = f"(3 * {rx} + {ry} - 2 * {rx} * {ry})"
        stages.append(
            {
                "hd": f"hd + {s * s} * {xr}",
                "hx": (
                    f"CASE WHEN {ry} = 0 THEN "
                    f"(CASE WHEN {rx} = 1 THEN {s - 1} - (hy % {s}) "
                    f"ELSE hy % {s} END) ELSE hx % {s} END"
                ),
                "hy": (
                    f"CASE WHEN {ry} = 0 THEN "
                    f"(CASE WHEN {rx} = 1 THEN {s - 1} - (hx % {s}) "
                    f"ELSE hx % {s} END) ELSE hy % {s} END"
                ),
            }
        )
        s //= 2
    return stages


def hilbert_ctes(
    base: str, side: int = HILBERT_SIDE, div: str = "//"
) -> str:
    """DuckDB CTE chain evaluating the stages over ``base`` (a CTE name
    exposing hx, hy, hd plus any passthrough columns via *): returns
    "h0 AS (...), h1 AS (...), ..." ending in CTE ``hfin`` whose hd is
    the Hilbert index."""
    ctes = []
    prev = base
    for i, st in enumerate(hilbert_stages(side, div)):
        name = f"h{i}" if i < side.bit_length() - 2 else "hfin"
        ctes.append(
            f"{name} AS (SELECT * REPLACE ("
            f"{st['hd']} AS hd, {st['hx']} AS hx, {st['hy']} AS hy) "
            f"FROM {prev})"
        )
        prev = name
    return ", ".join(ctes)


def morton_sql(
    x_col: str, y_col: str, side: int = HILBERT_SIDE, div: str = "DIV"
) -> str:
    """Engine-portable Morton interleave of x_col and y_col (same
    integer-division-token parameter as :func:`hilbert_sql`)."""
    parts = []
    for bit in range(side.bit_length() - 1):
        parts.append(f"((({x_col}) {div} {1 << bit}) % 2) * {1 << (2 * bit)}")
        parts.append(
            f"((({y_col}) {div} {1 << bit}) % 2) * {1 << (2 * bit + 1)}"
        )
    return "(" + " + ".join(parts) + ")"
