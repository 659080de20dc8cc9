#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB correctness gate.

Usage: python3 tools/local_oracle_check.py <sfDir> <verifyOutDir>

Runs every oracle_sql.json entry in DuckDB over the sfDir parquet tables
and compares (rows, column-sorted schema, stringified sorted values)
against the Verify parquet dumps. Dev-loop tool only — the real gate is
driver-side.
"""
import sys, json, duckdb

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def norm(tbl):
    return tbl.select(sorted(tbl.column_names))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sqls = json.load(open(f'{out_dir}/oracle_sql.json'))
    n_bad = 0
    for name, sql in sorted(sqls.items()):
        try:
            spark = norm(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").arrow())
            oracle = norm(con.sql(sql).arrow())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        schema_ok = ([(f.name, str(f.type)) for f in spark.schema]
                     == [(f.name, str(f.type)) for f in oracle.schema])
        sl = sorted(map(tuple, spark.to_pandas().astype(str).values.tolist()))
        ol = sorted(map(tuple, oracle.to_pandas().astype(str).values.tolist()))
        ok = schema_ok and sl == ol
        n_bad += 0 if ok else 1
        print(f"{'ok  ' if ok else 'FAIL'} {name}: rows={spark.num_rows}/"
              f"{oracle.num_rows} schema_ok={schema_ok} values_ok={sl == ol}")
        if not schema_ok:
            print('   spark:', [(f.name, str(f.type)) for f in spark.schema])
            print('   duck :', [(f.name, str(f.type)) for f in oracle.schema])
        if sl != ol:
            diffs = [(a, b) for a, b in zip(sl, ol) if a != b][:3]
            for a, b in diffs:
                print('   diff:', a, ' vs ', b)
    print(f"{len(sqls) - n_bad}/{len(sqls)} queries match")
    return 1 if n_bad else 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
