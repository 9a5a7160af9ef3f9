#!/usr/bin/env python3
"""Seeded edge-case data generator for the differential fuzz gate.

Usage: python3 tools/fuzz_data.py <seed> <outDir> [--tiny|--skew]

--tiny writes the same ten tables at single-digit row counts (groups
smaller than every NTILE bucket count / top-k / quota in the catalog,
languages and statuses absent entirely, one-user event logs) — the
n < k and empty-group paths no realistic corpus exercises.

--skew writes normal-size tables with MEGA-HOT keys: ~30% of the
corpus is ONE exact-duplicate text cluster plus a ~100-member one-word
-mutation family (their shingle/simhash/minhash band keys exceed the
catalog-wide stop-cap rule "drop iff members > n/20 AND > 64", so the
capped band joins and their oracle mirrors must BOTH engage), one user
owns ~60% of events, one event type is ~80% of the log with a CONSTANT
value (sigma = MAD = 0 division guards), one source/language dominates
documents, one customer owns half of orders, and ~30% of embeddings
are copies of a single vector (one mega RHP/IVF bucket). Parity green
means every cap, guard, and skew path fires identically in Spark and
DuckDB — the q50 lesson as a standing differential gate.

Writes the ten driver tables (same schemas as /root/testdata/sf*) with
randomized content deliberately spicier than the driver's generator:
NULLs in measure columns, heavy ties in order keys, dangling foreign
keys, unicode / empty / HTML / PII / repeated-token documents, zero and
duplicate embedding vectors, malformed-JSON props. Both engines read
the SAME parquet, so every hash-gated query/oracle pair must STILL
agree — any divergence is a real semantic gap between the Spark query
and its DuckDB mirror, not a data problem.

Deliberately excluded (documented harness caveats, SURVEY §6):
  - U+000B vertical tab (Java \\s vs RE2 \\s split difference);
  - doubles beyond ~1e9 (Decimal(18,2) money casts overflow BOTH
    engines under ANSI -> uninteresting shared errors);
  - FULLY EMPTY fact tables for q13_rollup/q106_cube only: Spark's
    ROLLUP/CUBE (Expand-based) emit ZERO rows on empty input while
    DuckDB follows the SQL standard and emits the one grand-total
    row - an engine-level grouping-sets divergence, not a query bug
    (every other query is empty-input clean; see the e0 sweep).
Sizes track sf0.001 so blocking caps / thresholds engage realistically.
"""
import json
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

US_PER_DAY = 86_400_000_000

VOCAB = ("the a key order sort table scan merge part window small hash join "
         "stream customer data group row slow fast filter big value line "
         "query batch vector spark agg").split()
MKTSEG = ["MACHINERY", "BUILDING", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD"]
BRANDS = [f"Brand#{i}" for i in range(10, 26)]
PTYPES = ["ECONOMY", "SMALL", "PROMO", "LARGE", "STANDARD", "MEDIUM"]
PNOUN = ["widget", "anvil", "gear", "bolt", "cog"]
PADJ = ["cold", "hot", "red", "large", "old", "dim"]
STATUS = ["O", "F", "P"]
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RFLAG = ["N", "A", "R"]
LSTATUS = ["O", "F"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def ts_us(rnd, lo_day, hi_day):
    """Random microsecond timestamp between two day offsets from epoch."""
    return rnd.randrange(lo_day * US_PER_DAY, hi_day * US_PER_DAY)


def maybe_null(rnd, p, v):
    return None if rnd.random() < p else v


def write(outdir, name, cols, schema):
    pq.write_table(pa.table(cols, schema=schema), f"{outdir}/{name}.parquet")


def gen(seed, outdir, tiny=False, skew=False):
    rnd = random.Random(seed)
    # tiny mode: every fact table at single-digit rows (dimension
    # tables keep their natural 5/25); sizes chosen BELOW the
    # catalog's k/quota/bucket constants so n < k branches run
    sz = dict(nc=8, ns=2, np=6, no=12, nl=20, ne=15, nd=6, nv=6) if tiny \
        else dict(nc=150, ns=10, np=200, no=1500, nl=6000, ne=1000,
                  nd=500, nv=500)
    # skew mode: hot-key probabilities jump from "mildly skewed" to
    # "one key owns the table" — every stop-cap and zero-variance
    # guard must fire, identically, in both engines
    hp = dict(user=0.6, nation=0.8, source=0.8, lang=0.9, cust=0.5,
              etype=0.8, part=0.4) if skew else \
         dict(user=0.3, nation=0.3, source=0.3, lang=0.0, cust=0.0,
              etype=0.0, part=0.0)

    # region: 5 rows; one duplicated name (two keys, same name) to
    # stress group-by-name vs join-by-key assumptions equally.
    rnames = REGIONS[:]
    rnames[rnd.randrange(5)] = rnames[rnd.randrange(5)]
    write(outdir, "region",
          {"r_regionkey": list(range(5)), "r_name": rnames},
          pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))

    # nation: 25 rows, skewed region assignment (one region ~50%).
    hot_region = rnd.randrange(5)
    nkeys = list(range(25))
    nreg = [hot_region if rnd.random() < 0.5 else rnd.randrange(5)
            for _ in nkeys]
    write(outdir, "nation",
          {"n_nationkey": nkeys,
           "n_name": [f"NATION{i:02d}" for i in nkeys],
           "n_regionkey": nreg},
          pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                     ("n_regionkey", pa.int32())]))

    # customer: ties in acctbal (many exactly 0.00 / -1.23), 2% nulls,
    # one hot nation.
    nc = sz['nc']
    hot_nation = rnd.randrange(25)
    cust = {
        "c_custkey": list(range(nc)),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": [hot_nation if rnd.random() < hp['nation']
                        else rnd.randrange(25) for _ in range(nc)],
        "c_acctbal": [maybe_null(rnd, 0.02,
                                 rnd.choice([0.0, -1.23, 999.99,
                                             round(rnd.uniform(-999, 9999), 2)]))
                      for _ in range(nc)],
        "c_mktsegment": [rnd.choice(MKTSEG) for _ in range(nc)],
    }
    write(outdir, "customer", cust,
          pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                     ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                     ("c_mktsegment", pa.string())]))

    # supplier
    ns = sz['ns']
    write(outdir, "supplier",
          {"s_suppkey": list(range(ns)),
           "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
           "s_nationkey": [rnd.randrange(25) for _ in range(ns)],
           "s_acctbal": [round(rnd.uniform(-100, 5000), 2) for _ in range(ns)]},
          pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                     ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))

    # part: duplicate names across keys, tied sizes/prices.
    np_ = sz['np']
    write(outdir, "part",
          {"p_partkey": list(range(np_)),
           "p_name": [f"{rnd.choice(PADJ)} {rnd.choice(PNOUN)}"
                      for _ in range(np_)],
           "p_brand": [rnd.choice(BRANDS) for _ in range(np_)],
           "p_type": [rnd.choice(PTYPES) for _ in range(np_)],
           "p_size": [rnd.choice([1, 1, 5, 50]) if rnd.random() < 0.3
                      else rnd.randrange(1, 51) for _ in range(np_)],
           "p_retailprice": [rnd.choice([100.0, 100.0, 0.01])
                             if rnd.random() < 0.3
                             else round(rnd.uniform(1, 2000), 2)
                             for _ in range(np_)]},
          pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                     ("p_brand", pa.string()), ("p_type", pa.string()),
                     ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

    # orders: 1500; ~3% dangling custkeys, tied totalprice (10% exactly
    # 1000.00), tied dates (10% on one day), full 1995-2001 range.
    no = sz['no']
    tie_day = rnd.randrange(9131, 11536)
    orders = {"o_orderkey": list(range(no)), "o_custkey": [], "o_orderstatus": [],
              "o_totalprice": [], "o_orderdate": [], "o_orderpriority": []}
    # skew-only draws short-circuit so non-skew RNG streams stay
    # byte-identical to the seeds validated before this mode existed
    hot_cust = rnd.randrange(nc) if skew else None
    for _ in range(no):
        orders["o_custkey"].append(
            nc + rnd.randrange(50) if rnd.random() < 0.03
            else hot_cust if (skew and rnd.random() < hp['cust'])
            else rnd.randrange(nc))
        orders["o_orderstatus"].append(rnd.choice(STATUS))
        orders["o_totalprice"].append(
            1000.0 if rnd.random() < 0.1 else round(rnd.uniform(1, 400000), 2))
        orders["o_orderdate"].append(
            tie_day * US_PER_DAY if rnd.random() < 0.1
            else ts_us(rnd, 9131, 11536) // US_PER_DAY * US_PER_DAY)
        orders["o_orderpriority"].append(rnd.choice(PRIO))
    write(outdir, "orders", orders,
          pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                     ("o_orderstatus", pa.string()),
                     ("o_totalprice", pa.float64()),
                     ("o_orderdate", pa.timestamp("us")),
                     ("o_orderpriority", pa.string())]))

    # lineitem: ~6000; 2% null quantity/price/discount, tied ship
    # dates, 2% dangling order/part keys, discount exactly 0 often.
    nl = sz['nl']
    li = {k: [] for k in ["l_orderkey", "l_partkey", "l_suppkey",
                          "l_linenumber", "l_quantity", "l_extendedprice",
                          "l_discount", "l_tax", "l_returnflag",
                          "l_linestatus", "l_shipdate"]}
    hot_part = rnd.randrange(np_) if skew else None
    for _ in range(nl):
        li["l_orderkey"].append(
            no + rnd.randrange(50) if rnd.random() < 0.02 else rnd.randrange(no))
        li["l_partkey"].append(
            np_ + rnd.randrange(20) if rnd.random() < 0.02
            else hot_part if (skew and rnd.random() < hp['part'])
            else rnd.randrange(np_))
        li["l_suppkey"].append(rnd.randrange(ns))
        li["l_linenumber"].append(rnd.randrange(1, 8))
        li["l_quantity"].append(maybe_null(rnd, 0.02, float(rnd.randrange(1, 51))))
        li["l_extendedprice"].append(
            maybe_null(rnd, 0.02, round(rnd.uniform(1, 100000), 2)))
        li["l_discount"].append(
            maybe_null(rnd, 0.02,
                       0.0 if rnd.random() < 0.3 else rnd.randrange(11) / 100.0))
        li["l_tax"].append(rnd.randrange(9) / 100.0)
        li["l_returnflag"].append(rnd.choice(RFLAG))
        li["l_linestatus"].append(rnd.choice(LSTATUS))
        li["l_shipdate"].append(
            tie_day * US_PER_DAY if rnd.random() < 0.1
            else ts_us(rnd, 9131, 11536) // US_PER_DAY * US_PER_DAY)
    write(outdir, "lineitem", li,
          pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                     ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                     ("l_quantity", pa.float64()),
                     ("l_extendedprice", pa.float64()),
                     ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                     ("l_returnflag", pa.string()),
                     ("l_linestatus", pa.string()),
                     ("l_shipdate", pa.timestamp("us"))]))

    # events: 1000, one hot user (30%), tied timestamps within users
    # (~5%), null/zero/negative values, malformed props. event_id is
    # the log offset: assigned in ts order like the driver data.
    ne = sz['ne']
    hot_user = rnd.randrange(20)
    hot_etype = rnd.choice(ETYPES) if skew else None
    rows = []
    last_ts_by_user = {}
    for _ in range(ne):
        u = hot_user if rnd.random() < hp['user'] else rnd.randrange(20)
        if u in last_ts_by_user and rnd.random() < 0.05:
            t = last_ts_by_user[u]  # exact tie with an earlier event
        else:
            t = ts_us(rnd, 19723, 19753)  # 2024-01
        last_ts_by_user[u] = t
        pr = rnd.random()
        if pr < 0.90:
            props = json.dumps({"k": rnd.randrange(100)})
        else:
            props = rnd.choice(['{}', '{"k": null}', '{"k": "str"}',
                                'not json', '', '{"k": {"x": 1}}',
                                '{"K": 5}', None])
        et = hot_etype if (skew and rnd.random() < hp['etype']) \
            else rnd.choice(ETYPES)
        # skew: the hot type's value is CONSTANT — per-type sigma and
        # MAD are exactly 0, per-user series are zero-variance
        val = 7.25 if (skew and et == hot_etype) else \
            maybe_null(rnd, 0.02,
                       rnd.choice([0.0, -5.5, round(rnd.uniform(0, 500), 2)]))
        rows.append((t, u, et, val, props))
    rows.sort(key=lambda r: r[0])
    write(outdir, "events",
          {"event_id": list(range(ne)),
           "ts": [r[0] for r in rows], "user_id": [r[1] for r in rows],
           "event_type": [r[2] for r in rows],
           "value": [r[3] for r in rows], "props": [r[4] for r in rows]},
          pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                     ("user_id", pa.int64()), ("event_type", pa.string()),
                     ("value", pa.float64()), ("props", pa.string())]))

    # documents: 500. Planted exact-dup clusters, near-dup pairs, and
    # adversarial texts. n_chars == len(text) (None for null text).
    nd = sz['nd']
    def salad(n):
        return " ".join(rnd.choice(VOCAB) for _ in range(n))
    texts = []
    if skew:
        # one mega exact-dup cluster (~30% of the corpus: band keys
        # far past the n/20-and-64 stop cap) + a ~100-member one-word
        # -mutation family (hot but NOT identical — the capped band
        # join must still find what the cap leaves reachable)
        mega = salad(rnd.randrange(60, 120))
        texts += [mega] * max(150, (nd * 3) // 10)
        fam = salad(rnd.randrange(60, 120)).split()
        for _ in range(100):
            w = fam[:]
            w[rnd.randrange(len(w))] = f"MUT{rnd.randrange(1000)}"
            texts.append(" ".join(w))
    # 5 exact-dup clusters of 4
    for _ in range(5):
        t = salad(rnd.randrange(30, 120))
        texts += [t] * 4
    # 8 near-dup pairs (one word substituted)
    for _ in range(8):
        words = salad(rnd.randrange(40, 120)).split()
        a = " ".join(words)
        words[rnd.randrange(len(words))] = "MUTATED"
        texts += [a, " ".join(words)]
    # adversarial singletons
    texts += [
        "",                                   # empty
        " ",                                  # single space
        "\t \n  \t",                          # whitespace-only
        "x",                                  # single char
        "café naïve façade über señor",       # accents
        "日本語のテキストです 中文文本 한국어",  # CJK
        "emoji 🎉 party 🎉 emoji 🎉 party",    # emoji + repetition
        "WORD word WoRd WORD word",           # case ties
        "the the the the the the the the the the",  # one repeated token
        "<html><body><script>var x=1;"        # unclosed script tag
        " document.write('leak')",
        "<p>kept</p><style>h1{color:red}</style><p>also kept</p>",
        "contact me at fuzz@example.com or +1-555-123-4567 ssn 123-45-6789",
        "https://example.com/path?q=1 visit http://other.org/x now",
        "word " * 2000,                       # very long doc
        "a.b,c;d:e!f?g(h)i[j]k{l}m",          # punctuation soup
        "12345 67890 11111 22222 33333",      # digits only
    ]
    while len(texts) < nd - 2:
        texts.append(salad(rnd.randrange(5, 300)))
    texts = texts[:nd - 2] + [None, None]     # 2 null-text docs
    rnd.shuffle(texts)
    hot_source = rnd.randrange(20)
    hot_lang = rnd.choice(LANGS) if skew else None
    write(outdir, "documents",
          {"doc_id": list(range(nd)),
           "text": texts,
           "lang": [hot_lang if (skew and rnd.random() < hp['lang'])
                    else rnd.choice(LANGS) for _ in range(nd)],
           "source": [f"src{hot_source if rnd.random() < hp['source'] else rnd.randrange(20)}"
                      for _ in range(nd)],
           "n_chars": [None if t is None else len(t) for t in texts]},
          pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                     ("lang", pa.string()), ("source", pa.string()),
                     ("n_chars", pa.int64())]))

    # embeddings: 500 x 64 dims. Zero vectors, exact duplicates,
    # near-duplicates, one tiny-norm vector.
    nv, dim = sz['nv'], 64
    vecs = []
    for i in range(nv):
        vecs.append([rnd.gauss(0, 0.1) for _ in range(dim)])
    if skew:
        # ~30% of vectors are copies of ONE vector: a single mega
        # RHP/IVF bucket (plus scattered sign-flips that land in the
        # mirror bucket) — bucketed kNN and near-dup caps must hold
        base = vecs[0][:]
        for i in range(1, nv):
            if rnd.random() < 0.3:
                vecs[i] = base[:]
            elif rnd.random() < 0.05:
                vecs[i] = [-x for x in base]
    if nv > 35:
        vecs[7] = [0.0] * dim                   # zero vector
        vecs[8] = [0.0] * dim                   # second zero vector
        vecs[9] = [1e-8] * dim                  # tiny norm
        for (a, b) in [(20, 21), (22, 23), (24, 25)]:
            vecs[b] = vecs[a][:]                # exact dup pairs
        for (a, b) in [(30, 31), (32, 33)]:
            vecs[b] = vecs[a][:]
            vecs[b][0] += 1e-4                  # near dup pairs
    else:
        vecs[1] = [0.0] * dim                   # zero vector
        vecs[3] = vecs[2][:]                    # one exact dup pair
    write(outdir, "embeddings",
          {"vec_id": list(range(nv)),
           "embedding": [[float(x) for x in v] for v in vecs],
           "label": [rnd.randrange(10) for _ in range(nv)]},
          pa.schema([("vec_id", pa.int64()),
                     ("embedding", pa.list_(pa.float32())),
                     ("label", pa.int32())]))


if __name__ == "__main__":
    seed, outdir = int(sys.argv[1]), sys.argv[2]
    tiny = len(sys.argv) > 3 and sys.argv[3] == "--tiny"
    skew = len(sys.argv) > 3 and sys.argv[3] == "--skew"
    import os
    os.makedirs(outdir, exist_ok=True)
    gen(seed, outdir, tiny=tiny, skew=skew)
    mode = ' tiny' if tiny else ' skew' if skew else ''
    print(f"fuzz dataset seed={seed}{mode} -> {outdir}")
