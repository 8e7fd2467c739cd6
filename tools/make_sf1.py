#!/usr/bin/env python3
"""Generate the sf1.0-scale verification dir (10x the sf0.1 fixtures)
under target/ for the cap/skew-sensitive gate pass (VERDICT r7 item 5).

documents: ten copies of every sf0.1 document — copies 0-4 keep the text
verbatim (natural 5-deep exact/near-dup groups at scale), copies 5-9 get
a per-copy suffix (distinct-but-related shingle sets). With --capstress,
a 5,500-row DEGENERATE block sharing one document's text is appended:
>5000 band-identical postings per bucket, so Lsh.capBuckets'
keep-smallest-5000 branch (and its DuckDB oracle twin) actually binds —
at sf0.1 and below the cap never triggers.

events: ten copies with offset event_id/user_id (10x users at the same
per-user density — the range/as-of join fan-out grows by data volume,
not key skew).

Usage: python3 tools/make_sf1.py <outDir> [--capstress]
"""
import os
import sys

import duckdb

out = sys.argv[1]
capstress = "--capstress" in sys.argv[2:]
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

degenerate = """
  UNION ALL
  SELECT 90000000 + range AS doc_id,
    (SELECT text FROM src WHERE doc_id = 5) AS text,
    (SELECT lang FROM src WHERE doc_id = 5) AS lang,
    'degenerate' AS source,
    (SELECT n_chars FROM src WHERE doc_id = 5) AS n_chars
  FROM range(5500)
""" if capstress else ""

con.execute(f"""
COPY (
  WITH src AS (SELECT * FROM '/root/testdata/sf0.1/documents.parquet'),
  copies AS (SELECT range AS c FROM range(10))
  SELECT doc_id + c * 10000000 AS doc_id,
    CASE WHEN c < 5 THEN text
         ELSE text || ' variant v' || c::VARCHAR END AS text,
    lang, source,
    length(CASE WHEN c < 5 THEN text
                ELSE text || ' variant v' || c::VARCHAR END) AS n_chars
  FROM src CROSS JOIN copies
  {degenerate}
) TO '{out}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)
""")

con.execute(f"""
COPY (
  SELECT event_id + c * 1000000 AS event_id, ts,
    user_id + c * 10000 AS user_id, event_type, value, props
  FROM '/root/testdata/sf0.1/events.parquet'
  CROSS JOIN (SELECT range AS c FROM range(10)) copies
) TO '{out}/events.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)
""")

# embeddings: ten offset copies (20k vectors). Offsets are multiples of
# 10, so d15's deterministic skewed assignment (vec_id % 10 < 3 ->
# cluster 0) keeps its 30% hot cluster at every scale — the SemDeDup
# cluster-cap stress (one cluster >= 10% of vectors) holds by
# construction, and cap=64 binds hard (6k-member hot cluster).
con.execute(f"""
COPY (
  SELECT vec_id + c * 10000000 AS vec_id, embedding, label
  FROM '/root/testdata/sf0.1/embeddings.parquet'
  CROSS JOIN (SELECT range AS c FROM range(10)) copies
) TO '{out}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)
""")

docs = con.sql(f"SELECT count(*) c FROM '{out}/documents.parquet'").fetchone()[0]
evs = con.sql(f"SELECT count(*) c FROM '{out}/events.parquet'").fetchone()[0]
embs = con.sql(f"SELECT count(*) c FROM '{out}/embeddings.parquet'").fetchone()[0]
print(f"{out}: {docs} documents, {evs} events, {embs} embeddings (capstress={capstress})")
