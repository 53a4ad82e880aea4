"""Synthesize an sf1-scale (10x sf0.1) testdata directory for the
scale soak (VERDICT r2 item 1).

Deterministic (seed=777), schema- and domain-identical to the driver's
tables (same columns/types, same categorical vocabularies, same value
ranges, same FK structure, linearly scaled row counts — measured from
/root/testdata/sf0.1; distributions there are uniform, so uniform
generation reproduces the shape).  The correctness gate compares Spark
vs DuckDB over the SAME parquet, so identity with the driver's
generator is not required — only shape fidelity, which is what the
soak is probing (does any plan go super-linear one decade up).

Usage: python tools/synth_sf.py [out_dir] [sf]
  default out_dir=/root/repo/testdata/sf1, sf=1.0 (row counts are
  sf/0.1 times the sf0.1 counts).  region/nation are copied verbatim.

graph_edges at sf=1 ~= 19.5M rows (orders fan-in + three distinct
lineitem-derived layers), matching the soak target of ~20M edges.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 777
SRC01 = "/root/testdata/sf0.1"

VOCAB = np.array(
    "spark window merge table column vector stream value data small join "
    "filter big group hash sort fast slow scan batch row key line order "
    "part customer query agg the a of".split()
)
LANGS = np.array(["en", "de", "es", "fr", "zh"])
LANG_W = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
SEGMENTS = np.array(
    ["MACHINERY", "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD"]
)
PRIORITIES = np.array(
    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
)
PTYPES = np.array(
    ["ECONOMY", "MEDIUM", "SMALL", "PROMO", "LARGE", "STANDARD"]
)
ADJ = np.array("large hot blue old red green new cold".split())
NOUN = np.array("ring bolt plate screw nut washer gear pin".split())
ETYPES = np.array(["click", "view", "purchase", "signup", "error"])

DAY_US = 86_400_000_000


def _ts(day_offsets_us: np.ndarray, epoch: str) -> pa.Array:
    base = np.datetime64(epoch, "us").astype("int64")
    return pa.array(
        (base + day_offsets_us).astype("datetime64[us]")
    )


def synth(out_dir: str, sf: float = 1.0) -> None:
    mult = sf / 0.1  # row counts are scaled from the measured sf0.1 counts
    n_cust = int(15_000 * mult)
    n_supp = int(1_000 * mult)
    n_part = int(20_000 * mult)
    n_ord = int(150_000 * mult)
    n_evt = int(100_000 * mult)
    n_users = int(1_500 * mult)  # events users = customers/10 (measured)
    n_doc = int(5_000 * mult)
    n_emb = int(2_000 * mult)
    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)

    for t in ("region", "nation"):  # fixed dimensions
        shutil.copy(f"{SRC01}/{t}.parquet", f"{out_dir}/{t}.parquet")

    ck = np.arange(n_cust, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "c_custkey": ck,
                "c_name": np.char.add(
                    "Customer#", np.char.zfill(ck.astype("U9"), 9)
                ),
                "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
                "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
                "c_mktsegment": SEGMENTS[rng.integers(0, 5, n_cust)],
            }
        ),
        f"{out_dir}/customer.parquet",
    )

    sk = np.arange(n_supp, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": sk,
                "s_name": np.char.add(
                    "Supplier#", np.char.zfill(sk.astype("U9"), 9)
                ),
                "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
                "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
            }
        ),
        f"{out_dir}/supplier.parquet",
    )

    pk = np.arange(n_part, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pk,
                "p_name": np.char.add(
                    np.char.add(ADJ[rng.integers(0, len(ADJ), n_part)], " "),
                    NOUN[rng.integers(0, len(NOUN), n_part)],
                ),
                "p_brand": np.char.add(
                    "Brand#", rng.integers(0, 25, n_part).astype("U2")
                ),
                "p_type": PTYPES[rng.integers(0, len(PTYPES), n_part)],
                "p_size": rng.integers(1, 51, n_part).astype(np.int32),
                "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
            }
        ),
        f"{out_dir}/part.parquet",
    )

    ok = np.arange(n_ord, dtype=np.int64)
    o_cust = rng.integers(0, n_cust, n_ord)
    o_days = rng.integers(0, 2404, n_ord)  # 1995-01-01 .. 2001-08-01
    pq.write_table(
        pa.table(
            {
                "o_orderkey": ok,
                "o_custkey": o_cust,
                "o_orderstatus": np.array(["O", "F", "P"])[
                    rng.choice(3, n_ord, p=[0.48, 0.48, 0.04])
                ],
                "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
                "o_orderdate": _ts(o_days * DAY_US, "1995-01-01"),
                "o_orderpriority": PRIORITIES[rng.integers(0, 5, n_ord)],
            }
        ),
        f"{out_dir}/orders.parquet",
    )

    lines = rng.integers(1, 8, n_ord)  # avg ~4 lines/order (measured 4.08)
    l_ord = np.repeat(ok, lines)
    n_li = len(l_ord)
    csum = np.cumsum(lines)
    l_num = (np.arange(n_li) - np.repeat(csum - lines, lines) + 1).astype(
        np.int32
    )
    ship_days = np.repeat(o_days, lines) + rng.integers(1, 96, n_li)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    price = np.round(qty * rng.uniform(900, 2100, n_li), 2)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": l_ord,
                "l_partkey": rng.integers(0, n_part, n_li),
                "l_suppkey": rng.integers(0, n_supp, n_li),
                "l_linenumber": l_num,
                "l_quantity": qty,
                "l_extendedprice": price,
                "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
                "l_returnflag": np.array(["N", "A", "R"])[
                    rng.integers(0, 3, n_li)
                ],
                "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
                "l_shipdate": _ts(ship_days * DAY_US, "1995-01-01"),
            }
        ),
        f"{out_dir}/lineitem.parquet",
    )

    ek = np.arange(n_evt, dtype=np.int64)
    evt_us = np.sort(rng.integers(0, 30 * DAY_US, n_evt))
    pq.write_table(
        pa.table(
            {
                "event_id": ek,
                "ts": _ts(evt_us, "2024-01-01"),
                "user_id": rng.integers(0, n_users, n_evt),
                "event_type": ETYPES[rng.integers(0, 5, n_evt)],
                "value": np.round(np.abs(rng.normal(50, 40, n_evt)), 2),
                "props": np.char.add(
                    np.char.add('{"k": ', rng.integers(0, 100, n_evt).astype("U3")),
                    "}",
                ),
            }
        ),
        f"{out_dir}/events.parquet",
    )

    dk = np.arange(n_doc, dtype=np.int64)
    n_words = rng.integers(10, 101, n_doc)
    words = VOCAB[rng.integers(0, len(VOCAB), int(n_words.sum()))]
    bounds = np.concatenate([[0], np.cumsum(n_words)])
    texts = np.array(
        [" ".join(words[bounds[i] : bounds[i + 1]]) for i in range(n_doc)],
        dtype=object,
    )
    # ~0.16% exact duplicates (measured 8/5000 at sf0.1)
    n_dup = max(1, int(0.0016 * n_doc))
    dup_to = rng.choice(n_doc, n_dup, replace=False)
    dup_from = rng.integers(0, n_doc, n_dup)
    texts[dup_to] = texts[dup_from]
    pq.write_table(
        pa.table(
            {
                "doc_id": dk,
                "text": texts,
                "lang": LANGS[rng.choice(len(LANGS), n_doc, p=LANG_W)],
                "source": np.char.add(
                    "src", rng.integers(0, 20, n_doc).astype("U2")
                ),
                "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
            }
        ),
        f"{out_dir}/documents.parquet",
    )

    emb = rng.normal(0, 0.125, (n_emb, 64)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
                "embedding": pa.array(list(emb)),
                "label": pa.array(
                    rng.integers(0, 10, n_emb).astype(np.int32)
                ),
            }
        ),
        f"{out_dir}/embeddings.parquet",
    )
    print(
        f"wrote {out_dir}: cust={n_cust} supp={n_supp} part={n_part} "
        f"orders={n_ord} lineitem={n_li} events={n_evt} docs={n_doc} "
        f"emb={n_emb}"
    )


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    synth(out, sf)
