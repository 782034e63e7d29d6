#!/usr/bin/env python3
"""Rebuild PLANS.md from the hand-notes header + a fresh Explain dump.

Usage:
  sbt -batch "runMain graft.Explain /root/testdata/sf0.01" > /tmp/dumps.txt
  python3 tools/splice_plans.py /tmp/dumps.txt [PLANS.md] [oracle_sql.json]

Keeps PLANS.md's notes section (everything above the first ``` fence)
verbatim, replaces the fenced dump block with the new Explain output,
then runs the plans_check drift gate (every dump noted, every note
dumped, and — when an oracle_sql.json is given — the dump set tracks
SparkEntry.queries). Exits non-zero on drift, so a refresh cannot land
a new query without its hand-note.
"""
import re
import subprocess
import sys


def main() -> int:
    dumps_path = sys.argv[1]
    plans_path = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"
    oracle_path = sys.argv[3] if len(sys.argv) > 3 else None

    lines = open(plans_path).read().split("\n")
    try:
        fence = next(i for i, l in enumerate(lines) if l.strip() == "```")
    except StopIteration:
        print("splice_plans: no ``` fence found in existing PLANS.md")
        return 1
    notes = "\n".join(lines[:fence]).rstrip("\n")

    raw = open(dumps_path).read()
    # keep from the first dump header on; drop any sbt/log preamble
    m = re.search(r"^=+ q\w+ =+$", raw, re.M)
    if not m:
        print(f"splice_plans: no '===== qNN... =====' headers in {dumps_path}")
        return 1
    dumps = raw[m.start():].rstrip("\n")

    with open(plans_path, "w") as f:
        f.write(notes + "\n\n```\n" + dumps + "\n```\n")
    n = len(re.findall(r"^=+ q\w+ =+$", dumps, re.M))
    print(f"splice_plans: wrote {plans_path} with {n} dumps")

    check = [sys.executable, "tools/plans_check.py", plans_path]
    if oracle_path:
        check.append(oracle_path)
    return subprocess.call(check)


if __name__ == "__main__":
    sys.exit(main())
