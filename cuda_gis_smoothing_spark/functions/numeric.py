"""Cross-engine-stable rounding.

Spark rounds doubles via BigDecimal(exact binary) HALF_UP; DuckDB via
scaled nearbyint — they disagree exactly ON a .5 tie (e.g. 0.6091935 →
0.609193 vs 0.609194). Both engines evaluate the SAME double for our
expressions, so nudging by +1e-9 before rounding moves every tie to the
same side in both engines while perturbing non-tie values by far less
than the engine tolerance (1e-4). Every float that crosses the driver's
value-hash gate goes through these helpers, in the Spark plan AND the
DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EPS = 1e-9


def round6(col) -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    return F.round(c + EPS, 6)


def round6_sql(expr: str) -> str:
    return f"ROUND(({expr}) + 1e-09, 6)"


def floor_stable(col) -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    return F.floor(c + EPS)


def floor_stable_sql(expr: str) -> str:
    return f"FLOOR(({expr}) + 1e-09)"


def flit(x: float) -> str:
    """Float literal for embedding in cross-engine SQL.

    DuckDB parses bare decimal literals (``32.58``) as DECIMAL and
    keeps decimal arithmetic through literal-only subexpressions,
    silently truncating scale; Spark parses them as DOUBLE. Exponent
    notation forces DOUBLE in both engines. repr() gives the shortest
    digits that round-trip the exact double.
    """
    s = repr(float(x))
    return s if ("e" in s or "E" in s or "n" in s) else s + "e0"
