"""Scalar column functions (SURVEY §2.5) — all JVM-side expressions.

Every function here returns a ``Column`` built from
``pyspark.sql.functions`` so it stays inside whole-stage codegen;
none of these require Python at execution time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default bin edges/labels mirroring the reference's pd.cut
#: (pac_data_processor.py:45-49): bins [0, 1e4, 1e5, 5e5, inf],
#: left-open / right-closed, out-of-range (<= 0) and null → null.
DEFAULT_BINS = (0.0, 10_000.0, 100_000.0, 500_000.0)
DEFAULT_LABELS = (
    "Small (<$10K)",
    "Medium ($10K-$100K)",
    "Large ($100K-$500K)",
    "Very Large (>$500K)",
)

#: Party keyword sets (pac_snowflake_realtime.py:103-113). Branch
#: order matters: republican keywords are tested FIRST, so a name
#: matching both sets classifies republican (SURVEY §7.4 #3).
REPUBLICAN_KEYWORDS = ("republican", "gop", "conservative")
DEMOCRAT_KEYWORDS = ("democrat", "democratic", "liberal", "progressive")


def bin_amount(
    col: Column | str,
    bins: Sequence[float] = DEFAULT_BINS,
    labels: Sequence[str] = DEFAULT_LABELS,
) -> Column:
    """E1: ``pd.cut`` with left-open/right-closed intervals.

    ``bins`` are the finite edges; the last label covers
    ``(bins[-1], inf)``. Exactly ``bins[1]`` lands in the first
    label; ``<= bins[0]`` and null → null — matching pd.cut.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for i, label in enumerate(labels):
        lo = bins[i]
        cond = c > F.lit(lo)
        if i + 1 < len(bins):
            cond = cond & (c <= F.lit(bins[i + 1]))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return expr.otherwise(F.lit(None))


def classify_membership(
    col: Column | str, members: Sequence[str], label: str, other: str
) -> Column:
    """E2/F6: ``'Tech' if x in [...] else 'Other'``
    (pac_data_processor.py:52) → ``isin`` + ``when``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(list(members)), F.lit(label)).otherwise(F.lit(other))


def party_label(
    name_col: Column | str,
    republican_keywords: Sequence[str] = REPUBLICAN_KEYWORDS,
    democrat_keywords: Sequence[str] = DEMOCRAT_KEYWORDS,
    republican_value: str = "republican",
    democrat_value: str = "democrat",
) -> Column:
    """E3: keyword-substring party classification on the lowercased
    name; republican branch first (pac_snowflake_realtime.py:110-112).
    No-match → null (the reference skips those rows)."""
    c = F.col(name_col) if isinstance(name_col, str) else name_col
    lowered = F.lower(c)
    rep = "|".join(republican_keywords)
    dem = "|".join(democrat_keywords)
    return (
        F.when(lowered.rlike(rep), F.lit(republican_value))
        .when(lowered.rlike(dem), F.lit(democrat_value))
        .otherwise(F.lit(None))
    )


def composite_key(*cols: Column | str, sep: str = "_") -> Column:
    """E11: business key ``f"{a}_{b}_..."`` (pac_data_processor.py:
    175-178) → ``concat_ws`` over string casts."""
    cast = [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in cols
    ]
    return F.concat_ws(sep, *cast)


def iso_timestamp(col: Column | str) -> Column:
    """E9: datetime → ISO-8601 string (``.isoformat()`` sink-side,
    pac_data_processor.py:117-118)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")


def format_currency(col: Column | str, decimals: int = 0) -> Column:
    """E13: display-layer currency rendering ``f"${x:,.0f}"``
    (pac_data_processor.py:60,66,71) → ``$`` + format_number.
    Excluded from correctness hashing like every render-only op."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit("$"), F.format_number(c, decimals))


def to_double_strict(col: Column | str) -> Column:
    """E7 strict: ``pd.to_numeric`` raising on garbage → plain cast
    (ANSI mode surfaces the error, matching pandas)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double")


def to_double_coerce(col: Column | str) -> Column:
    """E7 coerce: unparseable → null (pac_snowflake_realtime.py:82)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def to_double_coerce_zero(col: Column | str) -> Column:
    """E7 coerce+fill: unparseable → 0 (pac_snowflake_pipeline.py:95)."""
    return F.coalesce(to_double_coerce(col), F.lit(0.0))


def to_timestamp_coerce(col: Column | str) -> Column:
    """E8: ``pd.to_datetime(errors='coerce')`` → try_to_timestamp."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c)
