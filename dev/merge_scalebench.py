#!/usr/bin/env python3
"""Merge per-batch ScaleBench JSONs into one scalebench file (r13:
the 100x campaign runs in key batches so one slow key cannot lose a
whole run's measurements — ScaleBench writes a single JSON per
invocation, so the batches are merged here).

Usage: python3 dev/merge_scalebench.py OUT IN1 [IN2 ...]
Later inputs override earlier ones per key (re-measures win).
Keys with -1 in an earlier input are filled by any later real value.
NOT shipped code — dev loop only.
"""
import json, sys

def main():
    out, ins = sys.argv[1], sys.argv[2:]
    docs = [json.load(open(p)) for p in ins]
    base = dict(docs[0])
    q, b, r = {}, {}, {}
    for d in docs:
        for k, v in d["queries"].items():
            if k not in q or v >= 0:
                q[k], b[k], r[k] = v, d["base_s"][k], d["ratio"][k]
    base["queries"] = dict(sorted(q.items()))
    base["base_s"] = dict(sorted(b.items()))
    base["ratio"] = dict(sorted(r.items()))
    base["n_keys"] = len(q)
    base["value"] = round(sum(v for v in q.values() if v >= 0), 3)
    base["base_total"] = round(sum(v for v in b.values() if v >= 0), 3)
    base["merged_from"] = ins
    json.dump(base, open(out, "w"), sort_keys=True)
    unmeasured = [k for k, v in q.items() if v < 0]
    print(f"{out}: {len(q)} keys, scaled total {base['value']}s, "
          f"unmeasured: {unmeasured or 'none'}")

if __name__ == "__main__":
    main()
