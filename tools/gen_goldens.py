#!/usr/bin/env python3
"""Generate golden-parquet oracles for queries whose semantics are not
DuckDB-SQL-expressible but ARE deterministic, so their full output can be
pinned as a fixture and oracled via `read_parquet('<golden>')`.

t4_chunks (INDEPENDENT golden — not self-referential):
  1. DuckDB recomputes the sectionizer over sf0.01 `documents` using the
     SAME SQL the green `t3_sectionize` oracle uses (so the splitter input
     is independently verified), then
  2. the line-faithful Python port of LangChain's
     RecursiveCharacterTextSplitter (tools/langchain_splitter_oracle.py —
     see its provenance header) splits every section at the reference
     config (500/50, seps ["\n\n","\n","."," "]).
  The agreement of the Scala Catalyst generator with this golden is a
  genuine cross-implementation check (Scala vs Python, regex vs scanner).

t7_index_stats gets its oracle for free: its counts are aggregates OVER the
same chunk set, registered as SQL against the t4 golden (see SparkEntry).

Usage: python3 tools/gen_goldens.py [SFDIR] [OUTDIR]
  defaults: /root/testdata/sf0.01  fixtures/
"""
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from langchain_splitter_oracle import split_text, REF_SEPS, CHUNK_SIZE, CHUNK_OVERLAP

# Must match SparkEntry.Docs2Sql / the t3_sectionize oracle verbatim.
DOCS2_SQL = """CASE WHEN doc_id % 10 = 0 THEN text
 ELSE 'SECTION ' || upper(lang) || chr(10) || chr(10) || text END"""

SECTIONIZE_SQL = f"""
WITH d2 AS (SELECT doc_id, {DOCS2_SQL} AS text2 FROM documents),
paras AS (
  SELECT doc_id, unnest(range(len(ps))) AS pos, unnest(ps) AS raw
  FROM (SELECT doc_id, string_split(text2, chr(10)||chr(10)) AS ps FROM d2)),
sec AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
    regexp_matches(trim(raw), '^[A-Z\\s]+$') AND length(trim(raw)) > 5
      AND NOT contains(trim(raw), chr(10)) AS is_title,
    trim(raw) AS paragraph
  FROM paras)
SELECT doc_id, pos,
  coalesce(last_value(CASE WHEN is_title THEN paragraph END IGNORE NULLS)
    OVER (PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 'General') AS section,
  paragraph
FROM sec QUALIFY NOT is_title ORDER BY doc_id, pos
"""


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "fixtures"
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sfdir}/documents.parquet')")
    sections = con.sql(SECTIONIZE_SQL).fetchall()

    rows = []
    for doc_id, pos, section, paragraph in sections:
        for idx, chunk in enumerate(split_text(paragraph, CHUNK_SIZE, CHUNK_OVERLAP, REF_SEPS)):
            rows.append((doc_id, pos, section, idx, chunk))

    con.sql("""CREATE TABLE golden (doc_id BIGINT, pos BIGINT, section VARCHAR,
               chunk_idx BIGINT, chunk VARCHAR)""")
    con.executemany("INSERT INTO golden VALUES (?, ?, ?, ?, ?)", rows)
    path = os.path.join(outdir, "t4_chunks_sf001.parquet")
    con.sql(f"COPY (SELECT * FROM golden ORDER BY doc_id, pos, chunk_idx) "
            f"TO '{path}' (FORMAT PARQUET)")
    print(f"wrote {path}: {len(rows)} chunks from {len(sections)} sections")


if __name__ == "__main__":
    main()
