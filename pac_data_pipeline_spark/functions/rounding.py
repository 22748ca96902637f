"""Cross-engine deterministic rounding for rational-ratio outputs.

Engine ``round()`` on doubles is a latent gate flake for ratios of
integers (confidences, transition probabilities, conversion rates):
when a quotient's shortest-decimal representation lands exactly on a
``.xx5`` boundary, Spark and DuckDB may disagree by one ulp in the
final digit — the divergence class documented in
``operators/skew.py`` (iqr_outliers) and fixed for Benford cents in
``operators/quality.py`` (commit fb55b0d). The portable pin is the
pure-IEEE floor-round

    floor(x * 10^d + 0.5) / 10^d

— multiply, add, floor, divide is the identical correctly-rounded
IEEE sequence on both engines, so the result is byte-identical
wherever the input doubles are. (For negative x this is
round-half-toward-+inf rather than half-away-from-zero; the contract
is "same function on both engines", not banker's parity.)

Reference scope: the reference rounds display values with pandas
``round`` on a single node (no cross-engine contract exists there);
this module is engine infrastructure our differential-testing
discipline requires.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def floor_round(col: Column, digits: int = 6) -> Column:
    """``floor(x·10^d + 0.5)/10^d`` as a Spark column — the
    deterministic stand-in for ``F.round`` on rational-ratio doubles.
    NULL-transparent; result is DOUBLE."""
    scale = float(10**digits)
    return (F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)).cast(
        "double"
    )


def floor_round_sql(expr: str, digits: int = 6) -> str:
    """The identical floor-round as a DuckDB SQL fragment, for oracle
    mirrors. ``expr`` must already be a DOUBLE-typed expression."""
    scale = 10**digits
    return f"(floor(({expr}) * {scale} + 0.5) / {scale}.0)"
