#!/usr/bin/env python3
"""Weak-scaling corpus replicator (the BASELINE.md sweep recipe, now a
tool instead of transcript archaeology).

Builds an N-copy replication of an SF dir in a destination dir:
  - lineitem: carry-propagating key offsets (l_orderkey + i*1000003,
    l_partkey + i*137777) -> N disjoint co-purchase graphs
  - documents: doc_id offsets + per-copy token suffixes -> disjoint
    shingle/vocabulary universes (pairs scale with copies, not copies^2)
  - embeddings: vec_id offsets, vectors unchanged -> N-fold cell density
    (stresses the per-cell caps)
  - events: disjoint user/event ids, timestamps unchanged
  - customer: key offsets with names REBUILT from the new key
    (Customer#%09d). --adversarial switches the customer offset to
    i*1_000_000 — the round-12 incident shape whose whole cross-copy
    entropy sits in ONE digit position (blocking-key stress test)
  - every other table: symlinked unchanged

Usage: replicate.py SRC DST COPIES [tables...] [--adversarial]
"""
import duckdb, os, sys, glob

def main():
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    adversarial = '--adversarial' in sys.argv
    src, dst, n = args[0], args[1], int(args[2])
    tables = args[3:] or ['lineitem', 'documents', 'embeddings',
                          'events', 'customer']
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    rng = f"range({n}) t(i)"

    def copyq(table, select):
        out = f"{dst}/{table}.parquet"
        if os.path.exists(out):
            os.remove(out)
        con.execute(
            f"COPY ({select}) TO '{out}' (FORMAT PARQUET)")
        print(f"{table}: x{n} -> {out} "
              f"({os.path.getsize(out) // 1048576} MiB)")

    for t in tables:
        f = f"'{src}/{t}.parquet'"
        if t == 'lineitem':
            copyq(t, f"""
              SELECT l_orderkey + i * 1000003 AS l_orderkey,
                     l_partkey + i * 137777 AS l_partkey,
                     l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                     l_discount, l_tax, l_returnflag, l_linestatus,
                     l_shipdate
              FROM {f}, {rng}""")
        elif t == 'documents':
            copyq(t, f"""
              SELECT doc_id + i * 1000003 AS doc_id,
                     replace(text, ' ', '_' || i || ' ') || '_' || i AS text,
                     lang, source,
                     CAST(length(replace(text, ' ', '_' || i || ' ')
                       || '_' || i) AS BIGINT) AS n_chars
              FROM {f}, {rng}""")
        elif t == 'embeddings':
            copyq(t, f"""
              SELECT vec_id + i * 1000003 AS vec_id, embedding, label
              FROM {f}, {rng}""")
        elif t == 'events':
            copyq(t, f"""
              SELECT event_id + i * 10000019 AS event_id, ts,
                     user_id + i * 1000003 AS user_id,
                     event_type, value, props
              FROM {f}, {rng}""")
        elif t == 'customer':
            off = 1000000 if adversarial else 137777
            copyq(t, f"""
              SELECT c_custkey + i * {off} AS c_custkey,
                     'Customer#' || lpad(CAST(c_custkey + i * {off}
                       AS VARCHAR), 9, '0') AS c_name,
                     c_nationkey, c_acctbal, c_mktsegment
              FROM {f}, {rng}""")
        else:
            raise SystemExit(f"no replication rule for table {t}")

    for p in glob.glob(f"{src}/*.parquet"):
        name = os.path.basename(p)
        link = f"{dst}/{name}"
        if not os.path.exists(link):
            os.symlink(p, link)
            print(f"{name}: symlinked unchanged")

if __name__ == '__main__':
    main()
