#!/usr/bin/env python3
"""Adjudicate PlanCensus flags: for each dumped plan, extract full
balanced-paren marker calls and count identical duplicates WITHIN one
plan line (one operator's expression list). Identical full-call strings
repeated inside a single node are per-row recomputes of the same value
(the round-9 32x minhash defect shape); distinct-arg calls, or the same
call appearing once per node across nodes, are legitimate.

Usage: adjudicate_census.py <dump_dir> [marker ...]
"""
import sys, os, json
from collections import Counter

MARKERS = ["graft_minhash(", "graft_hash60(", "graft_dotq(",
           "graft_jaro_winkler(", "graft_wordpiece(", "graft_dhash(",
           "lambdafunction("]

def calls(line, marker):
    out, i = [], 0
    while True:
        i = line.find(marker, i)
        if i < 0:
            return out
        depth, j = 0, i + len(marker) - 1
        while j < len(line):
            if line[j] == "(":
                depth += 1
            elif line[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        out.append(line[i:j + 1])
        i = i + len(marker)

def main():
    dump = sys.argv[1]
    markers = [m if m.endswith("(") else m + "(" for m in sys.argv[2:]] or MARKERS
    report = {}
    for fn in sorted(os.listdir(dump)):
        if not fn.endswith(".plan.txt"):
            continue
        name = fn[:-len(".plan.txt")]
        text = open(os.path.join(dump, fn)).read()
        per_marker = {}
        for m in markers:
            if m not in text:
                continue
            all_calls, worst_line = Counter(), 0
            for line in text.splitlines():
                c = Counter(calls(line, m))
                if c:
                    worst_line = max(worst_line, max(c.values()))
                    all_calls.update(c)
            dup_calls = {k[:120]: v for k, v in all_calls.items() if v > 1}
            per_marker[m[:-1]] = {
                "n_calls": sum(all_calls.values()),
                "n_distinct": len(all_calls),
                "max_same_call_one_line": worst_line,
                "dup_examples": dict(list(dup_calls.items())[:3]),
            }
        if per_marker:
            report[name] = per_marker
    verdicts = {}
    for name, ms in report.items():
        bad = {m: d for m, d in ms.items() if d["max_same_call_one_line"] > 1}
        verdicts[name] = ("RECOMPUTE: " + ", ".join(
            f"{m} x{d['max_same_call_one_line']} in one node" for m, d in bad.items())
        ) if bad else "ok: all same-line calls distinct"
    print(json.dumps({"verdicts": verdicts, "detail": report}, indent=1))

if __name__ == "__main__":
    main()
