"""Id-embedded payload codecs as column expressions (SURVEY §2.9 C1/C2).

The reference packs metadata into id bits: card type in the top 3 bits
(graphjet-core/src/main/java/com/twitter/graphjet/algorithms/
TweetIDMask.java:32-71) and a snowflake creation timestamp in bits 22+
(algorithms/RecentTweetFilter.java:31,64-66).  Our engine keeps such
attributes as ordinary columns, but provides the codecs for
id-compatible interop — all pure JVM column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# TweetIDMask.java:33-43
MASK = (1 << 61) - 1  # low 61 bits
CARD_TYPES = {
    "tweet": 0,
    "summary": 1,
    "photo": 2,
    "player": 3,
    "promotion": 4,
}
# RecentTweetFilter.java:31
TWEPOCH = 1_288_834_974_657


def restore_id(col: Column) -> Column:
    """Strip the card-type bits: ``node & MASK`` (TweetIDMask.restore,
    :69-71)."""
    return col.bitwiseAND(F.lit(MASK))


def _signed64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def encode_card(col: Column, card: str) -> Column:
    """``id | (card << 61)`` (TweetIDMask.summary/photo/..., :44-63).

    Java longs wrap: codes >= 4 set the sign bit, so the literal is
    pre-wrapped to signed 64-bit exactly as ``4L << 61`` does."""
    return col.bitwiseOR(F.lit(_signed64(CARD_TYPES[card] << 61)))


def card_type(col: Column) -> Column:
    """Top-3-bit card code as int (the TweetCardFilter predicate input,
    algorithms/TweetCardFilter.java:68-76)."""
    return F.shiftrightunsigned(col, 61).cast("int")


def snowflake_ts_ms(col: Column) -> Column:
    """Creation timestamp in epoch millis: ``(id >> 22) + TWEPOCH``
    (RecentTweetFilter.java:64-66)."""
    return F.shiftright(col, 22) + F.lit(TWEPOCH)


def snowflake_from_ts_ms(col: Column) -> Column:
    """Minimal id whose snowflake timestamp is the given epoch-millis
    value (inverse of :func:`snowflake_ts_ms` for bits 22+)."""
    return F.shiftleft(col - F.lit(TWEPOCH), 22)
