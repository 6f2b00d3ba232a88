#!/usr/bin/env python3
"""Randomized conformance sweep (dev tooling, like local_verify.py).

Usage: python3 tools/fuzz_verify.py <seed> [outBase] [--skew]

Generates a seed-parameterized synthetic corpus with the STANDARD testdata
schema and shapes (dense 0-based ids, 64-dim float32 embeddings, the five
langs, srcN sources, TPC-H-ish star schema, 2024 event window) but fresh
value distributions — injected exact dups, near-dups, contained docs,
clustered vectors, correlated orders — then runs the full graft.Verify
battery over it and the DuckDB oracle compare.

The fixed sf* corpora pin one distribution forever; EdgeCorpusSpec pins
degenerate shapes. This sweeps the space in between: every oracle equality
must hold on ANY schema-valid corpus, so a seed that fails here is a real
cross-engine semantics bug (ties, rounding, null handling) the fixed data
happened not to exercise. The 3 documented rows-only keys report [weak],
as in the driver's gate.

--skew additionally makes the corpus ADVERSARIALLY HOT: a boilerplate
prefix in 30% of docs (hot shingle buckets — the df-ceiling scenario), a
user owning 60% of events with same-microsecond tie storms, one
orderkey/partkey carrying half of lineitem, and massed exact-duplicate
monetary values. This drives the AQE-skew and window paths while the
oracle still checks every row: any rank emitted without a full
deterministic tie-break surfaces here as a hash mismatch.
"""
import os
import random
import subprocess
import sys

import duckdb
import pandas as pd

VOCAB = ("key agg row scan slow fast table value part hash merge batch spark "
         "the a line sort window join shuffle broadcast filter codegen plan "
         "stage task executor driver cache spill skew salt bucket prune push "
         "down read write commit log event stream state store index probe "
         "build left right outer inner semi anti cross union except distinct").split()
# ASCII stand-ins, matching the driver corpus' ASCII-only contract
# (mm_features' stub decoder fail-louds on non-ASCII BY DESIGN — its
# scaladoc pins length == octet_length for every doc at every SF)
ZH = "de shi le zai you wo ta zhe zhong da lai shang guo ge dao".split()
DE = "der die das und ein eine zu mit von auf ist sind war nicht auch".split()
FR = "le la les et un une de du avec pour est sont pas aussi dans".split()
ES = "el la los las y un una de del con para es son no tambien".split()


def gen_docs(rng, n=250, skew=False):
    rows = []
    texts = []
    boiler = "terms of service apply all rights reserved"
    for i in range(n):
        lang = rng.choices(["en", "de", "fr", "es", "zh"], [70, 10, 8, 7, 5])[0]
        words = {"en": VOCAB, "de": DE, "fr": FR, "es": ES, "zh": ZH}[lang]
        ln = rng.randint(2, 60)
        t = " ".join(rng.choice(words) for _ in range(ln))
        if skew and rng.random() < 0.3:
            t = boiler + " " + t   # hot shingles: df ~ 0.3N
        texts.append((t, lang))
    # structured duplication on the tail ids, all pair types the dedup
    # battery distinguishes
    for i in range(10):           # exact dups
        texts.append((texts[i][0], texts[i][1]))
    for i in range(10, 20):       # near dups (one word swapped)
        w = texts[i][0].split()
        w[rng.randrange(len(w))] = rng.choice(VOCAB)
        texts.append((" ".join(w), texts[i][1]))
    for i in range(20, 25):       # contained: a slice of a long doc
        w = texts[i][0].split()
        if len(w) >= 8:
            s = rng.randrange(0, len(w) - 6)
            texts.append((" ".join(w[s:s + 6]), texts[i][1]))
    for idx, (t, lang) in enumerate(texts):
        rows.append((idx, t, lang, f"src{rng.randrange(20)}", len(t)))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])


def gen_embeddings(rng, n=300, dim=64, k=8):
    centers = [[rng.uniform(-0.3, 0.3) for _ in range(dim)] for _ in range(k)]
    rows = []
    for i in range(n):
        lab = rng.randrange(k)
        v = [centers[lab][d] + rng.gauss(0, 0.08) for d in range(dim)]
        rows.append((i, v, lab))
    return pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])


def gen_events(rng, n=2000, skew=False):
    types = ["signup", "click", "purchase", "error", "view"]
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    hot_ts = t0 + pd.Timedelta(days=3)
    for i in range(n):
        ts = t0 + pd.Timedelta(seconds=rng.randrange(30 * 24 * 3600),
                               microseconds=rng.randrange(1000000))
        uid = rng.randrange(40)
        val = round(rng.uniform(0, 100), 2)
        if skew:
            if rng.random() < 0.6:
                uid = 0            # hot user: 60% of the stream
            if rng.random() < 0.2:
                ts = hot_ts        # same-microsecond tie storm
            if rng.random() < 0.3:
                val = 42.0         # massed exact-duplicate values
        props = "{}" if rng.random() < 0.3 else '{"k": %d}' % rng.randrange(100)
        rows.append((i, ts, uid, rng.choice(types), val, props))
    rows.sort(key=lambda r: r[1])
    rows = [(i,) + r[1:] for i, r in enumerate(rows)]
    return pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])


def gen_tpch(rng, skew=False):
    regions = pd.DataFrame([(i, f"REGION{i}") for i in range(5)],
                           columns=["r_regionkey", "r_name"])
    nations = pd.DataFrame([(i, f"NATION{i}", i % 5) for i in range(25)],
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    segs = ["BUILDING", "HOUSEHOLD", "MACHINERY", "AUTOMOBILE", "FURNITURE"]
    customer = pd.DataFrame(
        [(i, f"Customer#{i}", rng.randrange(25),
          round(rng.uniform(-999, 9999), 2), rng.choice(segs))
         for i in range(150)],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"])
    supplier = pd.DataFrame(
        [(i, f"Supplier#{i}", rng.randrange(25), round(rng.uniform(-999, 9999), 2))
         for i in range(20)],
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    types = ["STANDARD BRASS", "SMALL COPPER", "LARGE STEEL", "ECONOMY TIN", "PROMO NICKEL"]
    part = pd.DataFrame(
        [(i, f"part {i}", f"Brand#{rng.randrange(1, 26)}", rng.choice(types),
          rng.randrange(1, 51), round(rng.uniform(900, 2000), 2))
         for i in range(100)],
        columns=["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"])
    d0 = pd.Timestamp("1995-01-01")
    orders_rows = []
    for i in range(600):
        orders_rows.append((
            i, rng.randrange(150), rng.choice("POF"),
            round(rng.uniform(1000, 300000), 2),
            d0 + pd.Timedelta(days=rng.randrange(2500)),
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])))
    orders = pd.DataFrame(orders_rows, columns=[
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"])
    li_rows = []
    for o in range(600):
        for ln in range(1, rng.randrange(1, 6) + 1):
            okey, pkey = o, rng.randrange(100)
            price = round(rng.uniform(1000, 100000), 2)
            if skew:
                if rng.random() < 0.5:
                    okey, pkey = 0, 0   # one order/part carries half the table
                if rng.random() < 0.3:
                    price = 5000.0      # massed duplicate monetary value
            li_rows.append((
                okey, pkey, rng.randrange(20), ln,
                float(rng.randrange(1, 51)),
                price,
                round(rng.uniform(0, 0.1), 2), round(rng.uniform(0, 0.08), 2),
                rng.choice("NAR"), rng.choice("OF"),
                d0 + pd.Timedelta(days=rng.randrange(2500))))
    lineitem = pd.DataFrame(li_rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"])
    return dict(region=regions, nation=nations, customer=customer,
                supplier=supplier, part=part, orders=orders, lineitem=lineitem)


CASTS = {
    "documents": "doc_id::BIGINT AS doc_id, text, lang, source, n_chars::BIGINT AS n_chars",
    "embeddings": "vec_id::BIGINT AS vec_id, embedding::FLOAT[] AS embedding, label::INTEGER AS label",
    "events": ("event_id::BIGINT AS event_id, ts::TIMESTAMP AS ts, user_id::BIGINT AS user_id, "
               "event_type, value::DOUBLE AS value, props"),
    "region": "r_regionkey::BIGINT AS r_regionkey, r_name",
    "nation": "n_nationkey::BIGINT AS n_nationkey, n_name, n_regionkey::BIGINT AS n_regionkey",
    "customer": ("c_custkey::BIGINT AS c_custkey, c_name, c_nationkey::BIGINT AS c_nationkey, "
                 "c_acctbal::DOUBLE AS c_acctbal, c_mktsegment"),
    "supplier": ("s_suppkey::BIGINT AS s_suppkey, s_name, s_nationkey::BIGINT AS s_nationkey, "
                 "s_acctbal::DOUBLE AS s_acctbal"),
    "part": ("p_partkey::BIGINT AS p_partkey, p_name, p_brand, p_type, p_size::INTEGER AS p_size, "
             "p_retailprice::DOUBLE AS p_retailprice"),
    "orders": ("o_orderkey::BIGINT AS o_orderkey, o_custkey::BIGINT AS o_custkey, o_orderstatus, "
               "o_totalprice::DOUBLE AS o_totalprice, o_orderdate::TIMESTAMP AS o_orderdate, "
               "o_orderpriority"),
    "lineitem": ("l_orderkey::BIGINT AS l_orderkey, l_partkey::BIGINT AS l_partkey, "
                 "l_suppkey::BIGINT AS l_suppkey, l_linenumber::INTEGER AS l_linenumber, "
                 "l_quantity::DOUBLE AS l_quantity, l_extendedprice::DOUBLE AS l_extendedprice, "
                 "l_discount::DOUBLE AS l_discount, l_tax::DOUBLE AS l_tax, l_returnflag, "
                 "l_linestatus, l_shipdate::TIMESTAMP AS l_shipdate"),
}


def main():
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv
    seed = int(args[0])
    base = args[1] if len(args) > 1 else f"/tmp/fuzz_{seed}{'_skew' if skew else ''}"
    data_dir, out_dir = f"{base}/data", f"{base}/out"
    os.makedirs(data_dir, exist_ok=True)
    rng = random.Random(seed)
    frames = dict(documents=gen_docs(rng, skew=skew), embeddings=gen_embeddings(rng),
                  events=gen_events(rng, skew=skew), **gen_tpch(rng, skew=skew))
    con = duckdb.connect()
    for name, df in frames.items():
        con.register("t", df)
        con.execute(f"COPY (SELECT {CASTS[name]} FROM t) TO '{data_dir}/{name}.parquet' (FORMAT PARQUET)")
        con.unregister("t")
    print(f"[fuzz {seed}] corpus written to {data_dir}")
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    rc = subprocess.call(
        ["sbt", "-batch", f"runMain graft.Verify {data_dir} {out_dir}"],
        env=env, stdout=open(f"{base}/verify.log", "w"), stderr=subprocess.STDOUT)
    if rc != 0:
        print(f"[fuzz {seed}] graft.Verify FAILED rc={rc} — see {base}/verify.log")
        sys.exit(2)
    sys.exit(subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(__file__), "local_verify.py"),
         data_dir, out_dir]))


if __name__ == "__main__":
    main()
