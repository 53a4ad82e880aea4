"""C1/C2 codec parity vs the reference's literal Java semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphjet_spark.functions import idcodec


def test_card_roundtrip_and_restore(spark):
    base_ids = [1, 123456789, (1 << 61) - 1]
    rows = [
        (i, card)
        for i in base_ids
        for card in idcodec.CARD_TYPES
    ]
    df = spark.createDataFrame(rows, "id bigint, card string")
    for card, code in idcodec.CARD_TYPES.items():
        sub = df.filter(F.col("card") == card).select(
            "id",
            idcodec.encode_card(F.col("id"), card).alias("enc"),
        )
        out = sub.select(
            "id",
            "enc",
            idcodec.restore_id(F.col("enc")).alias("restored"),
            idcodec.card_type(F.col("enc")).alias("ct"),
        ).collect()
        for r in out:
            # Java: (id | card<<61) & MASK == id ; >>>61 == card
            assert r["restored"] == r["id"]
            assert r["ct"] == code
            assert r["enc"] == (r["id"] | (code << 61)) - (1 << 64) * (
                (r["id"] | (code << 61)) >= (1 << 63)
            )


def test_snowflake_roundtrip(spark):
    ts = [idcodec.TWEPOCH, 1_400_000_000_000, 1_700_000_000_123]
    df = spark.createDataFrame([(t,) for t in ts], "ts bigint")
    out = df.select(
        "ts",
        idcodec.snowflake_ts_ms(
            idcodec.snowflake_from_ts_ms(F.col("ts"))
        ).alias("rt"),
    ).collect()
    for r in out:
        assert r["rt"] == r["ts"]  # (((ts-TWEPOCH)<<22)>>22)+TWEPOCH
