#!/usr/bin/env python3
"""Dev-loop oracle check (mimics the driver's t2 gate).

Usage: python3 dev/check.py <sfDir> <verifyOutDir> [key ...]

Runs each oracle_sql.json entry in DuckDB against views over the sfDir
parquet tables, loads the Spark result parquet the same way the driver
does, sorts columns by name, and compares cell-for-cell. NOT shipped
code — Scala library has no python/duckdb dependency.
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Driver fixtures are single files; ScaleBench stagings are
        # Spark-written part-file directories — glob those.
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # CHECK_DIGEST=k1,k2 (r13): mirror graft.Verify's SPARK_GRAFT_DIGEST
    # — wrap the oracle SQL in the identical order-independent
    # reduction (count + per-integer-column sum and sum-of-squares,
    # mod 2^61-1) for keys whose full result is too large to compare
    # row-wise. The full oracle query still executes; only the compare
    # is compressed. Non-negative integer columns only.
    digest_keys = set(filter(None,
                             os.environ.get("CHECK_DIGEST", "").split(",")))
    P = 2305843009213693951
    INT_TYPES = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT")

    def digest_sql(sql):
        desc = con.execute(f"DESCRIBE {sql}").fetchdf()
        parts = ["count(*) AS n"]
        for name, typ in zip(desc["column_name"], desc["column_type"]):
            if typ in INT_TYPES:
                h = f'CAST("{name}" AS HUGEINT)'
                parts.append(f'CAST(sum({h}) % {P} AS BIGINT) AS "s_{name}"')
                parts.append(
                    f'CAST(sum({h}*{h}) % {P} AS BIGINT) AS "q_{name}"')
        assert len(parts) > 1, "digest needs >=1 integer column"
        return "SELECT " + ", ".join(parts) + f" FROM ({sql})"

    n_pass = n_fail = 0
    for key, sql in sorted(oracle.items()):
        if only and key not in only:
            continue
        if key in digest_keys:
            sql = digest_sql(sql)
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {key}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{key}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {key}: spark result missing: {e}")
            n_fail += 1
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {key}: columns differ\n  duck : {list(exp.columns)}\n  spark: {list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {key}: rows differ duck={len(exp)} spark={len(got)}")
            n_fail += 1
            continue
        # The driver hash-compares physical values, so an int64 vs
        # float64 column (e.g. DuckDB HUGEINT fetched as float) must
        # fail here too even when Python == would say the cells match.
        dt_bad = [(c, str(exp[c].dtype), str(got[c].dtype))
                  for c in exp.columns
                  if str(exp[c].dtype) != str(got[c].dtype)]
        if dt_bad:
            print(f"FAIL {key}: dtypes differ (duck vs spark): {dt_bad}")
            n_fail += 1
            continue
        bad = None
        for col in exp.columns:
            ev, gv = exp[col].tolist(), got[col].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if a is None and b is None:
                    continue
                afl = isinstance(a, float)
                bfl = isinstance(b, float)
                if afl and bfl and math.isnan(a) and math.isnan(b):
                    continue
                eq = (a == b)
                try:
                    if not eq and a is not None and b is not None and not (afl or bfl):
                        eq = (str(a) == str(b))
                except Exception:
                    pass
                if not eq:
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            diff = ""
            if isinstance(a, float) and isinstance(b, float):
                diff = f" (absdiff={abs(a-b):.3e})"
            print(f"FAIL {key}: first mismatch col={col} row={i}: duck={a!r} spark={b!r}{diff}")
            n_fail += 1
        else:
            print(f"PASS {key} ({len(exp)} rows x {len(exp.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
