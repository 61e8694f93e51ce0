"""Decimal-exact numeric helpers.

The reference stores unbounded NUMERIC and rounds to 4 decimals at ingest
(`fetchers/config/constants.py:51`, `common/helpers/numbers.py:7-23`) and at
serve (`web/routes/api/rest/utils/parsers.py:22-34`). We reproduce that
contract, and additionally route every *sum* of floating-point measures
through DecimalType: double summation is order-dependent under parallel
partial aggregation, so a decimal accumulator is the only way a distributed
plan can hash-match a single-threaded oracle — and at 1000 executors it is
the only way two runs match each other.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Enough integer digits for 100 TB-scale sums; 2 fractional digits matches the
# generator's 2-decimal measures exactly.
MONEY = "decimal(18,2)"

# Scale for *computed* products of 2-decimal measures (e.g. price*(1-disc)):
# the true product has ≤4 decimal digits, so a scale-4 cast of its double is
# exact and engine-independent — a scale-2 cast would sit on rounding-tie
# boundaries where engines' double→decimal algorithms disagree.
MONEY4 = "decimal(18,4)"


def dec(col: Column | str, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def money(col: Column | str) -> Column:
    return dec(col, MONEY)


def money4(col: Column | str) -> Column:
    return dec(col, MONEY4)


def round4(col: Column | str) -> Column:
    """4-decimal serve rounding (`parsers.py:22-34`, `numbers.py:7-23`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 4)
