#!/usr/bin/env python3
"""Compare two graft bench artifacts (BENCH_*.json) per query.

Usage: python3 tools/compare_bench.py OLD.json NEW.json

Prints a table of per-query wall seconds, the raw new/old ratio, and —
when BOTH artifacts carry `host_canary_mops_per_sec` (r20) — the
canary-NORMALIZED ratio: raw_ratio * (new_canary / old_canary). The
canary is a fixed single-thread integer loop, so its ops/sec is a
host-CPU-speed proxy; if the host got 20% slower between rounds, the
canary reads 20% lower and the normalized ratio strips that out. A
normalized ratio near 1.0 with a raw ratio well above 1.0 = host drift,
not a code regression (the r18->r19 adjudication gap this tool closes).

Rows only present in one artifact are listed separately. Exit code 0
always — this is a reporting tool, thresholds are the reader's call.
"""
import json
import sys


def load(path):
    """Accept either a raw one-line bench artifact (BENCH_SF10_r19.json)
    or the round driver's wrapper ({"n":..,"tail":..,"parsed":{...}})."""
    with open(path) as f:
        txt = f.read()
    scan = txt
    try:
        doc = json.loads(txt)
        if isinstance(doc, dict) and "queries" in doc:
            return doc
        if isinstance(doc, dict) and isinstance(doc.get("parsed"), dict):
            return doc["parsed"]
        if isinstance(doc, dict) and isinstance(doc.get("tail"), str):
            scan = doc["tail"]  # older wrappers: bench line in the log tail
    except json.JSONDecodeError:
        pass
    for line in scan.splitlines():
        line = line.strip()
        brace = line.find("{")  # sbt prefixes lines with [info]/[error]
        if brace >= 0 and '"queries"' in line:
            return json.loads(line[brace:])
    raise SystemExit(f"no bench JSON object in {path}")


def canary_median(doc):
    vals = doc.get("host_canary_mops_per_sec")
    if not vals:
        return None
    vals = sorted(v for v in vals if v > 0)
    return vals[len(vals) // 2] if vals else None


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    qo, qn = old.get("queries", {}), new.get("queries", {})
    co, cn = canary_median(old), canary_median(new)
    norm = (cn / co) if (co and cn) else None

    print(f"old: {sys.argv[1]}  window={old.get('window')} "
          f"set={old.get('set')} canary={co if co else 'n/a'} Mops/s")
    print(f"new: {sys.argv[2]}  window={new.get('window')} "
          f"set={new.get('set')} canary={cn if cn else 'n/a'} Mops/s")
    if norm:
        print(f"canary speed ratio new/old: {norm:.3f} "
              f"(normalized = raw * {norm:.3f})")
    else:
        print("canary: missing in one artifact — raw ratios only")
    print()

    shared = sorted(set(qo) & set(qn))
    hdr = f"{'query':<28}{'old_s':>9}{'new_s':>9}{'raw':>7}"
    if norm:
        hdr += f"{'norm':>7}"
    print(hdr)
    tot_o = tot_n = 0.0
    for q in shared:
        o, n = qo[q], qn[q]
        if o <= 0 or n <= 0:
            print(f"{q:<28}{o:>9.3f}{n:>9.3f}   (err)")
            continue
        tot_o += o
        tot_n += n
        row = f"{q:<28}{o:>9.3f}{n:>9.3f}{n / o:>7.2f}"
        if norm:
            row += f"{n / o * norm:>7.2f}"
        print(row)
    if tot_o > 0:
        row = f"{'TOTAL (shared)':<28}{tot_o:>9.3f}{tot_n:>9.3f}" \
              f"{tot_n / tot_o:>7.2f}"
        if norm:
            row += f"{tot_n / tot_o * norm:>7.2f}"
        print(row)
    for q in sorted(set(qo) - set(qn)):
        print(f"only in old: {q} ({qo[q]:.3f}s)")
    for q in sorted(set(qn) - set(qo)):
        print(f"only in new: {q} ({qn[q]:.3f}s)")


if __name__ == "__main__":
    main()
