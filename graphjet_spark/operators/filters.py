"""Composable result filters — the engine's analogue of GraphJet's
ResultFilter / RelatedTweetFilter chains.

Reference semantics (algorithms/ResultFilterChain.java:54-63): a result
is dropped if ANY filter in the chain rejects it (OR-of-rejections).
Here each filter is a function ``DataFrame -> Column`` (a boolean KEEP
predicate over the result DataFrame), so chains compose into one
Catalyst predicate and fold into the scan — filters never live inside
UDFs (SURVEY.md O10).

Filters needing side tables (exclude sets, degree floors, direct
interactions) take small DataFrames/sets at construction and become
anti-/semi-joins, applied by :func:`apply_filter_chain`.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Predicate = Callable[[DataFrame], Column]


def requested_set_filter(exclude: Sequence[int], id_col: str = "id") -> Predicate:
    """Drop results in the request's exclude set (reference:
    algorithms/RequestedSetFilter.java:42-49)."""
    excl = list(exclude)
    return lambda df: ~F.col(id_col).isin(excl)


def time_range_filter(
    after, before, ts_col: str = "warc_ts"
) -> Predicate:
    """Keep results with timestamp in [after, before] (reference:
    algorithms/filters/TweetTimeRangeFilter.java:44-47; RecentTweetFilter
    is the one-sided case, algorithms/RecentTweetFilter.java:41-58)."""
    return lambda df: F.col(ts_col).between(F.lit(after), F.lit(before))


def min_interactions_filter(min_degree: int, deg_col: str = "degree") -> Predicate:
    """Drop results whose degree < k (reference:
    algorithms/MinNumInteractionsFilter.java:49-51; MinEngagementFilter
    is identical, algorithms/filters/MinEngagementFilter.java:54-56)."""
    return lambda df: F.col(deg_col) >= F.lit(min_degree)


def social_proof_types_filter(
    requested_types: Sequence[int], types_col: str = "proof_types"
) -> Predicate:
    """Drop results whose social proof contains none of the requested
    edge types (reference: algorithms/SocialProofTypesFilter.java:46-57)."""
    tarr = F.array(*[F.lit(int(t)) for t in requested_types])
    return lambda df: F.arrays_overlap(F.col(types_col), tarr)


def apply_filter_chain(
    df: DataFrame,
    predicates: Sequence[Predicate] = (),
    *,
    exclude_tables: Sequence[tuple[DataFrame, str]] = (),
) -> DataFrame:
    """OR-of-rejections chain: keep rows passing EVERY predicate, then
    anti-join each (exclude_df, key) pair — the DirectInteractionsFilter
    shape (reference: algorithms/DirectInteractionsFilter.java:44-51,
    set built in algorithms/filters/DirectInteractions.java:43-62).

    Catalyst folds the conjunction into a single filter node, so a chain
    of N predicates costs one pass (the reference walks the chain per
    result, algorithms/ResultFilterChain.java:54-63).
    """
    out = df
    for p in predicates:
        out = out.filter(p(out))
    for excl, key in exclude_tables:
        out = out.join(excl, key, "left_anti")
    return out


def direct_interactions_exclude(
    edges: DataFrame, query_node: int, id_col: str = "id"
) -> tuple[DataFrame, str]:
    """Exclude table for F3: the query node's own 1-hop out-neighbors."""
    tbl = (
        edges.filter(F.col("src") == query_node)
        .select(F.col("dst").alias(id_col))
        .distinct()
    )
    return tbl, id_col
