#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare graft.Verify parquet
dumps against the DuckDB oracle SQL, column-name-sorted, row-sorted.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--partial]
       [--skip=q1,q2,...]

--partial: skip oracles with no parquet dump (a SPARK_GRAFT_ONLY dev run)
instead of counting them as failures.
--skip=...: exclude named oracles (kept for ad-hoc narrowing; since
round 11 every oracle is grid/band-pruned and no gate needs skipping
at sf1).
ORACLE_MEMORY_LIMIT (env, default 80GB) caps DuckDB; spills to
/tmp/duckdb_spill.
ORACLE_SQL_COMPARE_ROWS (env, default 5000000): engine dumps larger
than this (parquet-metadata row count) are compared INSIDE DuckDB — a
GROUP-BY-ALL multiset equality via EXCEPT both ways — instead of
fetchall()+Python sort, which cannot hold a 100M-row band-join result.
Spill-backed and value-native; NULLs group/compare as equal exactly
like the Python path's str() compare.
"""
import os
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(str(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


# Output types the driver's hasher canonicalizes differently from the
# parquet side (round-8 lesson: DuckDB HUGEINT and DECIMAL final columns
# hash-mismatch even when every value is equal). Oracles must cast final
# columns to BIGINT / INT / DOUBLE / BOOLEAN / VARCHAR.
RISKY_TYPES = ("HUGEINT", "DECIMAL", "UHUGEINT", "UBIGINT", "UINTEGER",
               "USMALLINT", "UTINYINT", "TINYINT", "SMALLINT")


def connect(sf_dir):
    con = duckdb.connect()
    # big-SF evidence runs: cap memory below the box and give DuckDB a
    # spill directory so large-but-linear oracles survive; one OOM must
    # not take the whole suite down (the connection is rebuilt on error)
    lim = os.environ.get("ORACLE_MEMORY_LIMIT", "80GB")
    con.execute(f"SET memory_limit='{lim}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        # driver testdata ships single-file tables; Spark-written scale
        # data (MakeSf1) ships directories of part files — glob those
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def main(sf_dir, out_dir, partial=False, skip=()):
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name}: excluded by --skip")
            continue
        if partial and not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            # one relation, one execution: the type pre-check reads only
            # metadata (lazy relation), the fetch below executes it —
            # con.execute(sql) again would double oracle runtime across
            # ~200 gates (round-9 ADVICE). The risky scan searches the
            # FULL type string, so HUGEINT nested in STRUCT/LIST columns
            # is flagged too.
            rel = con.sql(sql)
            risky = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                     if any(r in str(t) for r in RISKY_TYPES)]
            if risky:
                print(f"FAIL {name}: risky oracle output types {risky} "
                      "(cast to BIGINT/DOUBLE — driver hasher mangles these)")
                fails += 1
                continue
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            fails += 1
            con = connect(sf_dir)  # an OOM poisons the connection
            continue
        try:
            import glob
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            nrows = sum(pq.read_metadata(f).num_rows for f in files)
            big = int(os.environ.get("ORACLE_SQL_COMPARE_ROWS", 5000000))
            if nrows > big:
                # too big for fetchall+Python sort: compare inside DuckDB
                # (spill-backed). Multiset equality = identical (row,
                # count) sets after GROUP BY ALL; EXCEPT both ways is
                # empty iff equal. SQL set semantics treat NULLs as
                # grouping/comparing equal, same as the Python path.
                ecols = sorted(pq.read_schema(files[0]).names)
                ocols = sorted(rel.columns)
                if ecols != ocols:
                    print(f"FAIL {name}: columns {ecols} vs oracle {ocols}")
                    fails += 1
                    continue
                cols = ", ".join(f'"{c}"' for c in ocols)
                flist = ", ".join(
                    "'" + f.replace("'", "''") + "'" for f in files)
                # CTE names must be collision-proof: an outer WITH a/b
                # would capture references inside oracles that define
                # their own a/b/x CTEs
                arows, brows, diffs = con.execute(f"""
                    WITH __eng AS MATERIALIZED (
                           SELECT {cols}, count(*) __cnt
                           FROM read_parquet([{flist}]) GROUP BY ALL),
                         __ora AS MATERIALIZED (
                           SELECT {cols}, count(*) __cnt
                           FROM ({sql}) GROUP BY ALL)
                    SELECT
                      (SELECT CAST(coalesce(sum(__cnt), 0) AS BIGINT)
                       FROM __eng),
                      (SELECT CAST(coalesce(sum(__cnt), 0) AS BIGINT)
                       FROM __ora),
                      (SELECT count(*) FROM (
                         (SELECT * FROM __eng EXCEPT SELECT * FROM __ora)
                         UNION ALL
                         (SELECT * FROM __ora EXCEPT SELECT * FROM __eng)) t)
                    """).fetchone()
                if arows != brows:
                    print(f"FAIL {name}: rows {arows} vs oracle {brows}")
                    fails += 1
                elif diffs:
                    print(f"FAIL {name}: {diffs} differing (row,count) "
                          f"groups of {arows} rows (sql-compare)")
                    fails += 1
                else:
                    print(f"OK   {name}: {arows} rows (sql-compare)")
                continue
            tbl = pq.read_table(files[0]) if len(files) == 1 else \
                pq.read_table(f"{out_dir}/{name}")
            acols = tbl.column_names
            arows = [tuple(c[i] for c in tbl.columns)
                     for i in range(tbl.num_rows)]
            acols2, arows2 = norm(arows, acols)
            ocols = list(rel.columns)
            orows = rel.fetchall()
            ocols2, orows2 = norm(orows, ocols)
            if acols2 != ocols2:
                print(f"FAIL {name}: columns {acols2} vs oracle {ocols2}")
                fails += 1
            elif len(arows2) != len(orows2):
                print(f"FAIL {name}: rows {len(arows2)} vs oracle {len(orows2)}")
                fails += 1
            elif arows2 != orows2:
                bad = sum(1 for a, b in zip(arows2, orows2) if a != b)
                print(f"FAIL {name}: {bad}/{len(arows2)} differing rows; "
                      f"first: {next((a, b) for a, b in zip(arows2, orows2) if a != b)}")
                fails += 1
            else:
                print(f"OK   {name}: {len(arows2)} rows")
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            fails += 1
            con = connect(sf_dir)  # an OOM poisons the connection
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} "
          f"({len(oracle)} queries)")
    return 1 if fails else 0


if __name__ == "__main__":
    extra = sys.argv[3:]
    skip = ()
    for a in extra:
        if a.startswith("--skip="):
            skip = tuple(x for x in a[len("--skip="):].split(",") if x)
    sys.exit(main(sys.argv[1], sys.argv[2], "--partial" in extra, skip))
