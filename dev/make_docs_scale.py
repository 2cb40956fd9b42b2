#!/usr/bin/env python3
"""Dev-only: documents.parquet at an arbitrary copy multiple of the
driver's read-only sf0.1, for the steep-text-query scaling curve
(SCALING_r11.md). Same per-copy salting as make_sf1.py (every 7th
token suffixed, so cross-copy shingle Jaccard stays below the near-dup
threshold and the dedup family sees a genuinely bigger corpus).

Usage: python3 dev/make_docs_scale.py COPIES OUT_DIR
"""
import sys, os
import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = int(sys.argv[1])
OUT = sys.argv[2]

con = duckdb.connect()
os.makedirs(OUT, exist_ok=True)
src = f"read_parquet('{SRC}/documents.parquet')"
copies = f"(SELECT unnest(generate_series(0, {COPIES - 1})) AS c)"
dk = f"(SELECT max(doc_id) + 1 FROM {src})"
salted = """CASE WHEN c = 0 THEN text ELSE array_to_string(
    list_transform(string_split(text, ' '),
      (t, i) -> CASE WHEN i % 7 = 0 THEN t || 'c' || c ELSE t END), ' ')
  END"""
con.execute(f"""COPY (
  SELECT doc_id + c * {dk} AS doc_id, {salted} AS text, lang, source,
         CAST(length({salted}) AS BIGINT) AS n_chars
  FROM {src}, {copies}) TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")
n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/documents.parquet')").fetchone()[0]
print(f"documents x{COPIES}: {n} rows -> {OUT}")
