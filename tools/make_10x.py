#!/usr/bin/env python3
"""Build a 10x scale-probe replica of an SF directory (default sf0.1).

Fact tables are replicated N times with shifted keys (orders/lineitem
share the order-key shift so joins stay consistent); dimensions are
symlinked unchanged — the realistic growth shape (more facts, same
dims). Embeddings get per-copy decorrelating component sign flips so
the near-dup candidate structure does not degenerate into N identical
copies of every vector; documents are exact duplicates on purpose
(exact-dedup input grows, the post-dedup near-dup stages must stay
flat). events.ts is written as TIMESTAMP_NS to preserve the nanos
physical type the engine's reader contract expects.

Usage: python3 tools/make_10x.py [src_dir] [dst_dir] [copies]
       (defaults: /root/testdata/sf0.1 /tmp/sf10x 10)

Prefer ONE application with copies=N (e.g. copies=100 directly from
sf0.1) over stacking the tool on its own output: the round-12 defect —
a fixed key shift colliding order keys on the second application,
fanning every fact-fact join ~7x and silently corrupting five rounds of
100x measurements — is exactly the class stacking invites (correlated
decorrelation patterns are a second such hazard: a stacked 100x applies
the embedding sign-flip recipe twice, so copy (a, b) and copy (b, a)
collide). After generation the tool ASSERTS the invariants whose silent
violation caused round 12's artifact: every fact key column is unique,
and lineitem's order keys all resolve to orders.

This is probe tooling for SURVEY.md §9/§10 numbers, not part of the
library.
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10x"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

# The shift must clear every key in the SOURCE — which, when this tool is
# applied to its OWN output (100x = 10x of 10x), is far above any natural
# testdata key. A fixed 10M shift collided order keys on the second
# application (keys up to ~96M re-shifted by 10M increments), silently
# fanning out every payments/orders join ~7x at 100x and overstating the
# superlinear tail. Derive it from the measured max key instead.
_max_key = 0
for _t, _c in [("orders", "o_orderkey"), ("lineitem", "l_orderkey"),
               ("events", "event_id"), ("events", "user_id"),
               ("documents", "doc_id"), ("embeddings", "vec_id")]:
    _p = f"{src}/{_t}.parquet"
    if os.path.exists(_p):
        _max_key = max(_max_key, con.execute(
            f"SELECT max({_c}) FROM read_parquet('{_p}')").fetchone()[0] or 0)
KEY_SHIFT = 10 ** len(str(_max_key))  # next power of 10 above every key
print(f"key shift: {KEY_SHIFT} (max source key {_max_key})")


def rep(table, select_per_copy):
    parts = [select_per_copy.format(c=c, src=f"{src}/{table}.parquet")
             for c in range(copies)]
    sql = " UNION ALL ".join(parts)
    con.execute(f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    print(f"{table}: x{copies}")


rep("orders", """
  SELECT o_orderkey + {c} * {ks} AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{src}')""".replace("{ks}", str(KEY_SHIFT)))

rep("lineitem", """
  SELECT l_orderkey + {c} * {ks} AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{src}')""".replace("{ks}", str(KEY_SHIFT)))

# user_id shifts per copy too: real event growth adds USERS (which the
# user_id shuffles partition linearly), it does not densify each user's
# stream N-fold. Without the shift the 100x probe overstated per-user
# state everywhere and inflated the inherently per-user-quadratic
# events_attribution 100x past its real shape.
rep("events", """
  SELECT event_id + {c} * {ks} AS event_id, ts::TIMESTAMP_NS AS ts,
         user_id + {c} * {ks} AS user_id, event_type, value, props
  FROM read_parquet('{src}')""".replace("{ks}", str(KEY_SHIFT)))

rep("documents", """
  SELECT doc_id + {c} * {ks} AS doc_id, text, lang, source, n_chars
  FROM read_parquet('{src}')""".replace("{ks}", str(KEY_SHIFT)))

# The flip class must have FULL RANK across copies: the round-13 recipe
# (i*37 + c*101) % 3 collapsed to 3 distinct flip patterns over 100
# direct copies (the class depends on c only through c*101 mod 3, which
# cycles with period 3), densifying every LSH bucket ~33x and
# mis-pricing the ANN family at 100x. hash(i:c:KEY_SHIFT) decorrelates
# every copy; salting with KEY_SHIFT additionally decorrelates STACKED
# applications (each application's shift differs, so the two layers'
# flip families can't cancel as (a,b)/(b,a) pairs or (c,c) identities
# would under one shared family). Copy 0 stays unflipped so the source
# rows survive verbatim.
rep("embeddings", """
  SELECT vec_id + {c} * {ks} AS vec_id,
         list_transform(embedding, (x, i) ->
           x * (CASE WHEN {c} > 0
                      AND hash(i || ':' || {c} || ':' || {ks}) % 3 = 0
                THEN -1 ELSE 1 END))::FLOAT[] AS embedding,
         label
  FROM read_parquet('{src}')""".replace("{ks}", str(KEY_SHIFT)))

for dim in ["customer", "supplier", "part", "nation", "region"]:
    link = f"{dst}/{dim}.parquet"
    if not os.path.exists(link):
        os.symlink(f"{src}/{dim}.parquet", link)
    print(f"{dim}: symlink")

# ---- replica invariants (assert, don't trust) ----------------------------
# The round-12 artifact was a silent violation of exactly these: stacked
# applications collided shifted keys, so count(distinct key) < count(*)
# on every fact table and each fact-fact join fanned out ~7x. A replica
# that fails here is NOT a valid probe input — fail loudly.
def assert_unique(table, col):
    n, d = con.execute(
        f"SELECT count(*), count(DISTINCT {col}) "
        f"FROM read_parquet('{dst}/{table}.parquet')").fetchone()
    assert n == d, (
        f"REPLICA INVARIANT VIOLATED: {table}.{col} has {n} rows but only "
        f"{d} distinct keys — shifted copies collided (the round-12 "
        f"artifact class); do not use this replica")
    print(f"invariant ok: {table}.{col} unique ({n:,} rows)")

assert_unique("orders", "o_orderkey")
assert_unique("events", "event_id")
assert_unique("documents", "doc_id")
assert_unique("embeddings", "vec_id")
# Embedding flip-class diversity: every source vector's `copies` replicas
# must be pairwise-distinct embeddings — if two copies shared a flip
# pattern (the round-13 collapse: 3 patterns across 100 copies), their
# replicas of EVERY vector coincide, LSH buckets densify, and the replica
# mis-prices the ANN family. Distinct-count per source id detects any
# pattern collision directly on the generated bytes.
min_cls = con.execute(f"""
    SELECT min(cnt) FROM (
      SELECT vec_id % {KEY_SHIFT} AS src,
             count(DISTINCT embedding::VARCHAR) AS cnt
      FROM read_parquet('{dst}/embeddings.parquet') GROUP BY 1)""").fetchone()[0]
assert min_cls == copies, (
    f"REPLICA INVARIANT VIOLATED: some source vector has only {min_cls} "
    f"distinct embeddings across {copies} copies — flip classes collided "
    f"(the round-13 LSH-densification class); do not use this replica")
print(f"invariant ok: embeddings flip-class diversity = {copies}/{copies}")
orphans = con.execute(f"""
    SELECT count(*) FROM read_parquet('{dst}/lineitem.parquet') l
    WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{dst}/orders.parquet') o
                      WHERE o.o_orderkey = l.l_orderkey)""").fetchone()[0]
assert orphans == 0, (
    f"REPLICA INVARIANT VIOLATED: {orphans} lineitem rows reference no "
    f"order — the order/lineitem shifts diverged")
print(f"invariant ok: lineitem.l_orderkey ⊆ orders.o_orderkey")
print("done:", dst)
