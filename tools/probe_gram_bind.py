"""Same-session A/B probe: inlined-split gram lambda (old) vs
bind-once form (new, dedup.gram_expr) — identity + wall time.

Usage: python tools/probe_gram_bind.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from graphjet_spark.session import get_spark  # noqa: E402
from graphjet_spark.operators.dedup import gram_expr  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"
N = 3


def old_gram_expr(text_col: str, n: int):
    toks = f"split({text_col}, '\\\\s+')"
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(0, size({toks}) - {n}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {n}))) "
        f"ELSE array() END"
    )


def main():
    spark = get_spark("probe_gram_bind")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    if docs.rdd.getNumPartitions() < 32:
        docs = docs.repartition(32, "doc_id").localCheckpoint(eager=True)

    def run(tag, expr):
        t0 = time.time()
        out = (
            docs.select("doc_id", F.explode(expr).alias("tok"))
            .filter(F.col("tok") != "")
            .distinct()
        )
        n_rows = out.count()
        h = out.agg(
            F.expr("bit_xor(xxhash64(doc_id, tok))").alias("h")
        ).collect()[0]["h"]
        dt = time.time() - t0
        print(f"{tag}: rows={n_rows} hash={h} wall={dt:.1f}s", flush=True)
        return n_rows, h, dt

    # interleave to share any warm-up bias: old, new, old, new
    r = {}
    for rep in (1, 2):
        r[f"old{rep}"] = run(f"old#{rep}", old_gram_expr("text", N))
        r[f"new{rep}"] = run(f"new#{rep}", gram_expr("text", N))
    assert r["old1"][:2] == r["new1"][:2] == r["old2"][:2] == r["new2"][:2], (
        "IDENTITY MISMATCH"
    )
    old_t = min(r["old1"][2], r["old2"][2])
    new_t = min(r["new1"][2], r["new2"][2])
    print(f"IDENTITY OK; best-of-2 old={old_t:.1f}s new={new_t:.1f}s "
          f"speedup={old_t / new_t:.2f}x", flush=True)


if __name__ == "__main__":
    main()
