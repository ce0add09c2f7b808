#!/usr/bin/env python3
"""10x-staging oracle check (r10 verdict item 2): correctness evidence
AT SCALE, not just timing. Runs dev/check.py's compare over a Verify
dump taken on the ScaleBench staging dir and writes the per-key result
to target/scalecheck.json.

Usage: python3 dev/scalecheck.py <stagedDir> <verifyOutDir> [key ...]
[env SCALECHECK_OUT overrides the output path (default
target/scalecheck.json) — the 100x run writes scalecheck100.json]

NOT shipped code — dev loop only (the Scala library has no
python/duckdb dependency).
"""
import json, os, re, subprocess, sys, pathlib

def main():
    staged, out_dir = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    # SCALECHECK_ISOLATE=1 (r13): one check.py SUBPROCESS per key, so a
    # key whose oracle exhausts DuckDB's budget fails ALONE instead of
    # poisoning every later key's allocation in the shared connection
    # (observed at the 100x staging: one OOM -> 21 cascading
    # bad-allocation failures).
    check = str(pathlib.Path(__file__).parent / "check.py")
    crashed = {}
    if os.environ.get("SCALECHECK_ISOLATE") == "1" and keys:
        stdout_lines = []
        for k in keys:
            p = subprocess.run([sys.executable, check, staged, out_dir, k],
                               capture_output=True, text=True)
            stdout_lines.extend(p.stdout.splitlines())
            # A subprocess that dies before printing PASS/FAIL (OOM
            # kill, unhandled exception) must surface as a FAIL row,
            # not silently vanish from the record (r14: 32 keys
            # disappeared this way behind a CREATE VIEW collision).
            # Exact key token (r14 ADVICE): a bare prefix match would
            # false-match keys that prefix others (graph_jaccard vs
            # graph_jaccard_bucketed) if a subprocess ever emitted
            # verdicts for more than the single requested key.
            if not any(l.startswith(("PASS " + k + " ",
                                     "FAIL " + k + ":"))
                       for l in p.stdout.splitlines()):
                crashed[k] = (f"no verdict (exit {p.returncode}); "
                              + p.stderr.strip().splitlines()[-1][:200]
                              if p.stderr.strip() else
                              f"no verdict (exit {p.returncode})")
        proc_stdout = "\n".join(stdout_lines)
    else:
        proc_stdout = subprocess.run(
            [sys.executable, check, staged, out_dir, *keys],
            capture_output=True, text=True).stdout
    results, n_pass, n_fail = {}, 0, 0
    for line in proc_stdout.splitlines():
        m = re.match(r"(PASS|FAIL) ([^:\s]+):? ?(.*)", line)
        if not m:
            continue
        status, key, detail = m.groups()
        if status == "PASS":
            n_pass += 1
            results[key] = {"match": True,
                            "rows": int(re.match(r"\((\d+) rows", detail)
                                        .group(1))}
        else:
            n_fail += 1
            results[key] = {"match": False, "detail": detail[:300]}
    for k, why in crashed.items():
        if k not in results:
            n_fail += 1
            results[k] = {"match": False, "detail": why}
    doc = {"metric": "scalecheck", "staged": staged, "n_pass": n_pass,
           "n_fail": n_fail, "keys": results}
    pathlib.Path("target").mkdir(exist_ok=True)
    out = os.environ.get("SCALECHECK_OUT", "target/scalecheck.json")
    pathlib.Path(out).write_text(json.dumps(doc, indent=1, sort_keys=True))
    print(f"scalecheck: {n_pass} pass, {n_fail} fail -> {out}")
    sys.exit(1 if n_fail or not n_pass else 0)

if __name__ == "__main__":
    main()
