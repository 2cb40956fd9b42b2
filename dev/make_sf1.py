#!/usr/bin/env python3
"""Dev-only derived-scale generator: builds a 10x "sf1" dataset from the
driver's read-only sf0.1 parquet, for the SCALING bench datapoint only
(BENCH_r09_sf1) — never for correctness runs, which stay on the
driver-generated data.

Scaling shape (so the 10x dataset works like a bigger corpus, not ten
stacked copies of the same one):
  - fact/dim keys shift by copy * (max_key + 1): cardinalities scale
    (more customers/orders/docs), not group sizes;
  - region/nation stay fixed (TPC-H dims);
  - document TEXT is salted per copy (every 7th token suffixed) so
    cross-copy shingle Jaccard lands ~0.39 < the 0.5 near-dup
    threshold: the dedup family sees 10x the corpus, with the SAME
    per-copy duplicate structure, instead of every doc becoming a
    10-way near-duplicate;
  - embeddings circular-shift by copy and labels shift, so ANN sees
    10x vectors / 10x blocks with per-copy geometry preserved
    (circular shift is orthogonal: within-copy cosines unchanged).

Usage: python3 dev/make_sf1.py [/tmp/sf1d]
"""
import sys, os
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1d"
COPIES = 10

con = duckdb.connect()
os.makedirs(OUT, exist_ok=True)

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

def write(t, sql):
    con.execute(f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")

# fixed dims
for t in ("region", "nation"):
    write(t, f"SELECT * FROM {src(t)}")

copies = f"(SELECT unnest(generate_series(0, {COPIES - 1})) AS c)"

def shifted(t, keys, others):
    k = {key: f"(SELECT max({key}) + 1 FROM {src(t)})" for key in keys}
    cols = ", ".join([f"{key} + c * {k[key]} AS {key}" for key in keys] + others)
    return f"SELECT {cols} FROM {src(t)}, {copies}"

write("customer", shifted("customer", ["c_custkey"],
                          ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]))
write("supplier", shifted("supplier", ["s_suppkey"], ["s_name", "s_nationkey", "s_acctbal"]))
write("part", shifted("part", ["p_partkey"],
                      ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"]))

ck = f"(SELECT max(c_custkey) + 1 FROM {src('customer')})"
ok = f"(SELECT max(o_orderkey) + 1 FROM {src('orders')})"
pk = f"(SELECT max(p_partkey) + 1 FROM {src('part')})"
sk = f"(SELECT max(s_suppkey) + 1 FROM {src('supplier')})"
write("orders", f"""
  SELECT o_orderkey + c * {ok} AS o_orderkey, o_custkey + c * {ck} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, {copies}""")
write("lineitem", f"""
  SELECT l_orderkey + c * {ok} AS l_orderkey, l_partkey + c * {pk} AS l_partkey,
         l_suppkey + c * {sk} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}, {copies}""")

ek = f"(SELECT max(event_id) + 1 FROM {src('events')})"
uk = f"(SELECT max(user_id) + 1 FROM {src('events')})"
write("events", f"""
  SELECT event_id + c * {ek} AS event_id, ts, user_id + c * {uk} AS user_id,
         event_type, value, props
  FROM {src('events')}, {copies}""")

dk = f"(SELECT max(doc_id) + 1 FROM {src('documents')})"
write("documents", f"""
  SELECT doc_id + c * {dk} AS doc_id,
         CASE WHEN c = 0 THEN text ELSE array_to_string(
           list_transform(string_split(text, ' '),
             (t, i) -> CASE WHEN i % 7 = 0 THEN t || 'c' || c ELSE t END), ' ')
         END AS text,
         lang, source,
         CAST(length(CASE WHEN c = 0 THEN text ELSE array_to_string(
           list_transform(string_split(text, ' '),
             (t, i) -> CASE WHEN i % 7 = 0 THEN t || 'c' || c ELSE t END), ' ')
         END) AS BIGINT) AS n_chars
  FROM {src('documents')}, {copies}""")

vk = f"(SELECT max(vec_id) + 1 FROM {src('embeddings')})"
lk = f"(SELECT max(label) + 1 FROM {src('embeddings')})"
write("embeddings", f"""
  SELECT vec_id + c * {vk} AS vec_id,
         CAST(CASE WHEN c = 0 THEN embedding
              ELSE list_concat(embedding[c + 1:len(embedding)], embedding[1:c])
         END AS FLOAT[]) AS embedding,
         label + c * {lk} AS label
  FROM {src('embeddings')}, {copies}""")

print(f"done -> {OUT}")
