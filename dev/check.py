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

def split_ctes(sql):
    """Split `WITH a AS (...), b AS (...) SELECT ...` into
    ([(name, body), ...], final_select). Purely lexical: scans
    balanced parens while skipping single-quoted literals, so the CTE
    bodies are the oracle's own text verbatim. Raises on RECURSIVE
    (not stageable) or any shape surprise — the caller falls back to
    the plain one-statement execution."""
    s = sql.lstrip()
    if not s.upper().startswith("WITH "):
        raise ValueError("no WITH prefix")
    if "RECURSIVE" in s[:16].upper():
        raise ValueError("recursive CTE")
    i, ctes = 5, []
    while True:
        while s[i].isspace():
            i += 1
        j = i
        while s[j].isalnum() or s[j] == "_":
            j += 1
        name = s[i:j]
        k = j
        while s[k].isspace():
            k += 1
        if s[k:k + 2].upper() != "AS":
            raise ValueError(f"expected AS after {name!r}")
        k += 2
        while s[k].isspace():
            k += 1
        if s[k:k + 12].upper() == "MATERIALIZED":
            k += 12
            while s[k].isspace():
                k += 1
        if s[k] != "(":
            raise ValueError(f"expected ( after {name!r} AS")
        depth, p, in_str = 0, k, False
        while True:
            c = s[p]
            if in_str:
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            p += 1
        ctes.append((name, s[k + 1:p]))
        i = p + 1
        while s[i].isspace():
            i += 1
        if s[i] == ",":
            i += 1
            continue
        return ctes, s[i:]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    # CHECK_DB (r13): a file path makes the connection disk-backed so
    # staged tables (below) live in the database file, not RAM.
    con = duckdb.connect(os.environ.get("CHECK_DB", ":memory:"))
    # Large-staging discipline (r13): cap DuckDB's memory and give it a
    # spill directory, or the 100x oracle queries (6-round unrolled
    # graph CTEs over a 120M-row edge relation) exhaust the host when a
    # Spark JVM shares it. Overridable via CHECK_MEM.
    mem = os.environ.get("CHECK_MEM", "48GB")
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    # CHECK_THREADS (r13): big unnest/list intermediates are held
    # per-thread and are not spillable; halving threads roughly halves
    # the non-spillable peak for the exploded-trigram oracles.
    if os.environ.get("CHECK_THREADS"):
        con.execute(f"SET threads={int(os.environ['CHECK_THREADS'])}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Driver fixtures are single files; ScaleBench stagings are
        # Spark-written part-file directories — glob those.
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        # OR REPLACE (r14): a disk-backed CHECK_DB persists views
        # across the per-key SCALECHECK_ISOLATE subprocesses — the
        # second process would otherwise die on the name collision.
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
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
                # Per-element mod BEFORE the sum (r13 ADVICE): keeps
                # every partial below P^2 so neither engine can
                # overflow its accumulator; must stay in lockstep with
                # graft.Verify.digest, which uses the same reduction.
                h = f'(CAST("{name}" AS HUGEINT) % {P})'
                parts.append(f'CAST(sum({h}) % {P} AS BIGINT) AS "s_{name}"')
                parts.append(
                    f'CAST(sum(({h}*{h}) % {P}) % {P} AS BIGINT) AS "q_{name}"')
        assert len(parts) > 1, "digest needs >=1 integer column"
        return "SELECT " + ", ".join(parts) + f" FROM ({sql})"

    # CHECK_STAGE_KEYS=k1,k2 (r13): execute those keys' oracle SQL as
    # sequential `CREATE TABLE <cte> AS <cte body>` statements (one
    # per CTE, same text, same relations) followed by the final
    # SELECT, instead of one statement. DuckDB 1.0 then holds ONE
    # stage's working set at a time (tables land in the CHECK_DB file
    # when set), where the one-statement plan's concurrent pipelines
    # exhaust the host on the 100x staging (exploded-trigram sh +
    # cand join hash tables; the 50M-pair jaccard window). Semantics
    # are unchanged by construction — the split is lexical — and the
    # sf0.01 hash equivalence of staged vs plain execution is pinned
    # by running this mode in the dev loop before trusting it at 100x.
    stage_keys = set(filter(None,
                            os.environ.get("CHECK_STAGE_KEYS", "").split(",")))

    def run_oracle(key, sql):
        """Staging and digest COMPOSE (r13 ADVICE): stage the CTEs
        first (so digest_sql's DESCRIBE on the final SELECT resolves
        the staged tables), THEN digest-wrap only the final SELECT.
        A shape surprise in split_ctes falls back to plain
        one-statement execution instead of a spurious per-key FAIL,
        and any digest/DESCRIBE error is caught by the caller as that
        key's FAIL rather than aborting the run."""
        ctes, final = [], sql
        if key in stage_keys:
            try:
                ctes, final = split_ctes(sql)
            except ValueError:
                pass  # fallback: plain one-statement execution
        made = []
        try:
            for name, body in ctes:
                con.execute(f'CREATE OR REPLACE TABLE "{name}" AS {body}')
                made.append(name)
            if key in digest_keys:
                final = digest_sql(final)
            return con.execute(final).fetchdf()
        finally:
            for name in reversed(made):
                con.execute(f'DROP TABLE IF EXISTS "{name}"')

    n_pass = n_fail = 0
    for key, sql in sorted(oracle.items()):
        if only and key not in only:
            continue
        try:
            exp = run_oracle(key, sql)
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
