"""Cross-engine-safe fixed-decimal presentation of ratio values.

round(x, 6) is a trap for ratios of integers: when the exact value
terminates at 7 decimal digits ending in 5 (denominators of the form
2^a·5^b — token counts of 64, unions of 128, weighted sums mixing /64
with /100 weights), Spark (Java HALF_UP on the decimal expansion) and
DuckDB (C-library rounding of the double) resolve the tie differently.
Found live at sf0.1: quality_score 0.5123125 → 0.512313 vs 0.512312.

floor-truncation has no tie semantics: both engines hold the SAME double
(same operands, same operation order), so floor(x·10^6)/10^6 is
bit-identical. Use for every ratio-of-integers output; plain round stays
fine for values whose exact decimal form is shorter than the rounding
position (decimal-exact money sums) and for irrational-ish values
(cosines) where exact ties cannot occur.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1_000_000


def trunc6(col: Column) -> Column:
    """floor(x·10^6)/10^6 as double — engine-portable 6-decimal cut."""
    return F.floor(col * SCALE) / F.lit(float(SCALE))


def trunc6_sql(expr: str) -> str:
    """DuckDB mirror of :func:`trunc6`."""
    return f"floor(({expr}) * {SCALE}) / {SCALE}.0"
