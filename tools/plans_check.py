#!/usr/bin/env python3
"""PLANS.md drift check (round-7 verdict item 7).

Asserts the hand-notes header and the spliced plan dumps cover exactly
the same query set, and (when an oracle_sql.json from a Verify run is
given) that the dump set tracks SparkEntry.queries — so a new query
cannot land without both a formatted plan and a note saying what its
plan must look like, and a deleted query cannot leave a stale note.

Usage:
  python3 tools/plans_check.py [PLANS.md] [/tmp/verify_out/oracle_sql.json]

Exit 0 = no drift; exit 1 = drift, with the offending ids listed.
Short ids are compared (the "q24" prefix of "q24_lsh_pairs") — the same
unique-prefix scheme the bench contract line uses.

When no oracle_sql.json is given, the full query surface is scanned
straight out of src/main/scala/graft/SparkEntry.scala (every
`"qNNN_name" ->` registration in `queries`), so a query can never land
without a plan dump even if the checker runs without a Verify output
(the round-10 blind spot: "OK — 255 dumps" on a 257-query surface).
"""
import json
import re
import sys


def strip_scala_comments(src: str) -> str:
    """Blank out // line comments and /* */ blocks, preserving string
    literals (oracle SQL holds `//` for DuckDB integer division, so a
    naive regex strip would eat code — and worse, a registration
    commented OUT would still regex-match).  Comment bytes become
    spaces so line/column structure survives for any later regex."""
    out = list(src)
    i, n = 0, len(src)
    in_str = in_line = False
    block_depth = 0  # scala block comments NEST
    while i < n:
        c = src[i]
        nxt = src[i + 1] if i + 1 < n else ""
        if in_line:
            if c == "\n":
                in_line = False
            else:
                out[i] = " "
        elif block_depth > 0:
            if c == "/" and nxt == "*":
                block_depth += 1
                out[i] = out[i + 1] = " "
                i += 1
            elif c == "*" and nxt == "/":
                block_depth -= 1
                out[i] = out[i + 1] = " "
                i += 1
            elif c != "\n":
                out[i] = " "
        elif in_str:
            if c == "\\" and nxt:
                i += 1  # skip escaped char (harmless in triple-quoted)
            elif c == '"':
                in_str = False
        else:
            if c == '"':
                in_str = True
            elif c == "/" and nxt == "/":
                in_line = True
                out[i] = out[i + 1] = " "
                i += 1
            elif c == "/" and nxt == "*":
                block_depth = 1
                out[i] = out[i + 1] = " "
                i += 1
        i += 1
    return "".join(out)


def sparkentry_query_ids(path: str = "src/main/scala/graft/SparkEntry.scala"):
    """Short ids of every query registered in SparkEntry.queries."""
    src = strip_scala_comments(open(path).read())
    # registrations look like:  "q258_moore_lewis" -> (TextOps...)
    names = set(re.findall(r'"(q\w+?)_\w+"\s*->', src))
    # a name appears in both `queries` and `oracleSql`; the set dedups
    return names


def main() -> int:
    plans_path = sys.argv[1] if len(sys.argv) > 1 else "PLANS.md"
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else None

    lines = open(plans_path).read().split("\n")
    try:
        first_dump = next(i for i, l in enumerate(lines) if l.startswith("====="))
    except StopIteration:
        print("plans_check: no plan dumps found at all")
        return 1
    notes = "\n".join(lines[:first_dump])

    dump_ids = set()
    for l in lines:
        m = re.match(r"=+ (q\w+) =+", l)
        if m:
            dump_ids.add(m.group(1).split("_")[0])
    note_ids = set(re.findall(r"\bq\d+[a-z]?\b", notes))

    ok = True
    missing_note = sorted(dump_ids - note_ids, key=lambda s: (len(s), s))
    stale_note = sorted(note_ids - dump_ids, key=lambda s: (len(s), s))
    if missing_note:
        print(f"plans_check: {len(missing_note)} dumps have NO hand-note: "
              + " ".join(missing_note))
        ok = False
    if stale_note:
        print(f"plans_check: {len(stale_note)} notes have NO dump (stale): "
              + " ".join(stale_note))
        ok = False

    if oracle_path:
        queries = {name.split("_")[0] for name in json.load(open(oracle_path))}
        source = oracle_path
    else:
        queries = sparkentry_query_ids()
        source = "SparkEntry.scala"
    undumped = sorted(queries - dump_ids, key=lambda s: (len(s), s))
    orphaned = sorted(dump_ids - queries, key=lambda s: (len(s), s))
    if undumped:
        print(f"plans_check: {len(undumped)} queries ({source}) have NO "
              "plan dump: " + " ".join(undumped))
        ok = False
    if orphaned:
        print(f"plans_check: {len(orphaned)} dumps are for DELETED queries: "
              + " ".join(orphaned))
        ok = False

    if ok:
        print(f"plans_check: OK — {len(dump_ids)} dumps, all noted, "
              f"{len(queries)} queries tracked ({source})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
