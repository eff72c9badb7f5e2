#!/usr/bin/env python3
"""Plan-shape audit over PlanDump output (optimization-round tooling).

For every <key>.txt (explain-formatted) in the given directory, extract:
  - exchange count (shuffles), broadcast-exchange count
  - join operators used (BHJ / SMJ / SHJ / BNLJ / Cartesian)
  - Window nodes and whether any has an EMPTY partition spec (the
    "No Partition Defined" single-task shape — must be zero)
  - scan count, and whether any scan carries PushedFilters

Usage: plan_audit.py <plans_dir> [--csv out.csv]
"""
import os, re, sys, csv

def audit(path):
    txt = open(path).read()
    ops = re.findall(r"^\(\d+\) ([A-Za-z]+)", txt, re.M)
    n_exch = sum(1 for o in ops if o == "Exchange")
    n_bexch = sum(1 for o in ops if o == "BroadcastExchange")
    joins = sorted(set(o for o in ops if "Join" in o or o == "CartesianProduct"))
    n_scan = sum(1 for o in ops if o == "Scan")
    pushed = len(re.findall(r"PushedFilters: \[(?!\])", txt))
    # unpartitioned window: the details block prints e.g.
    #   Arguments: [row_number() ...], [x ASC ...]        (2 args, no partition list)
    # vs partitioned:
    #   Arguments: [...], [part exprs], [order]
    n_win = sum(1 for o in ops if o == "Window")
    unpart = 0
    for m in re.finditer(
            r"^\(\d+\) Window\b.*\n(?:Input.*\n)?Arguments: (.*)$", txt, re.M):
        args = m.group(1)
        # partitioned windows print 3 bracketed lists; unpartitioned 2
        depth = 0; groups = 0
        for ch in args:
            if ch == "[":
                if depth == 0: groups += 1
                depth += 1
            elif ch == "]":
                depth -= 1
        if groups < 3:
            unpart += 1
    return dict(exchanges=n_exch, bcast=n_bexch, joins="+".join(joins),
                scans=n_scan, pushed=pushed,
                windows=n_win, unpartitioned_windows=unpart)

def main():
    d = sys.argv[1]
    rows = []
    for f in sorted(os.listdir(d)):
        if not f.endswith(".txt"):
            continue
        r = audit(os.path.join(d, f))
        r["key"] = f[:-4]
        rows.append(r)
    if "--csv" in sys.argv:
        out = sys.argv[sys.argv.index("--csv") + 1]
        with open(out, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=["key", "exchanges", "bcast",
                "joins", "scans", "pushed", "windows",
                "unpartitioned_windows"])
            w.writeheader(); w.writerows(rows)
        print(f"wrote {out} ({len(rows)} keys)")
    flagged = [r for r in rows if r["unpartitioned_windows"] > 0
               or "CartesianProduct" in r["joins"]
               or "BroadcastNestedLoopJoin" in r["joins"]]
    print(f"{len(rows)} plans; {len(flagged)} flagged:")
    for r in flagged:
        print(f"  {r['key']}: joins={r['joins']} unpart_windows="
              f"{r['unpartitioned_windows']}")
    top = sorted(rows, key=lambda r: -r["exchanges"])[:15]
    print("most exchanges:")
    for r in top:
        print(f"  {r['key']}: {r['exchanges']} exch, joins={r['joins']}")

if __name__ == "__main__":
    main()
