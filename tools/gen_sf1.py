"""Generate an sf1-scale test lake from the committed sf0.1 parquet.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md); the sf1 sweep
(VERDICT r5 ask #2: catch superlinear constants sf0.1 hides) needs a
10× lake with the SAME schema and join topology. Each replica r∈[0,10)
is a self-consistent universe:

- fact/bridge keys are offset by r × (max_key+1), consistently across
  referencing tables (l_orderkey and o_orderkey share the orders
  stride, o_custkey/user_id the customer stride, …) — so join
  selectivity and per-key group sizes are IDENTICAL to sf0.1 while key
  cardinality scales 10×;
- region/nation stay fixed (TPC-H semantics: dimension size is
  SF-independent; they must remain broadcastable at every SF);
- document text in replica r is letter-ROTATED by r (a substitution
  cipher via translate): token/shingle structure, lengths, whitespace
  and the intra-replica duplicate topology are preserved exactly,
  while cross-replica shingles are disjoint — duplicate/near-dup PAIR
  counts therefore scale exactly 10× (linear), instead of the 100×
  pair blow-up naive text replication would plant;
- embeddings in replica r are circularly SHIFTED by r·(dim/10)
  positions: a coordinate permutation preserves norms and every
  intra-replica dot product bit-for-bit (identical cluster geometry and
  near-dup structure per replica) while cross-replica cosines drop to
  noise (~N(0, 1/√dim)) — so cosine-pair counts scale exactly 10×.
  The first cut added +r·0.001 to one component instead; that left
  cross-replica cosines ≈ 1 and planted a 100× near-dup pair blow-up
  (measured: kmeans_semantic_dedup 13.2× at 10× data, dropping to ~10×
  expectations once replicas are decorrelated).

Output timestamps are written at parquet MICROS precision (DuckDB's
writer) where the driver lake uses NANOS — catalog.load_table
dispatches on either, so the engine reads both identically.

Usage: python tools/gen_sf1.py [src_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 → <repo>/.testdata/sf1 (gitignored).
Deterministic: pure SQL over the committed inputs, ORDER BY on output.
"""

from __future__ import annotations

import os
import string
import sys
from pathlib import Path

import duckdb

REPLICAS = int(os.environ.get("SF1_REPLICAS", "10"))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else str(Path(__file__).resolve().parent.parent / ".testdata" / "sf1")
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # The documents/embeddings replica queries are REPLICAS-branch
    # UNION ALLs; past ~1000 branches DuckDB's default parser depth cap
    # trips (hit by the r10 sf100 build at the documents step).
    con.execute("SET max_expression_depth TO 100000")
    # Resume/subset knob: regenerate only the named tables (comma list),
    # e.g. SF1_TABLES=documents,embeddings after a partial build failure
    # — table outputs are independent, so per-table rebuilds are exact.
    only = {
        s.strip()
        for s in os.environ.get("SF1_TABLES", "").split(",")
        if s.strip()
    }

    def rd(t: str) -> str:
        return f"read_parquet('{src}/{t}.parquet')"

    def stride(t: str, key: str) -> int:
        return con.execute(f"SELECT max({key}) + 1 FROM {rd(t)}").fetchone()[0]

    cu = stride("customer", "c_custkey")
    su = stride("supplier", "s_suppkey")
    pa = stride("part", "p_partkey")
    orr = stride("orders", "o_orderkey")
    ev = stride("events", "event_id")
    do = stride("documents", "doc_id")
    ve = stride("embeddings", "vec_id")

    def copy(table: str, select_sql: str) -> None:
        if only and table not in only:
            print(f"{table}: skipped (SF1_TABLES)")
            return
        con.execute(
            f"COPY ({select_sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    rep = f"CROSS JOIN range(0, {REPLICAS}) t(r)"
    # Dimensions with SF-independent cardinality: copied verbatim.
    copy("region", f"SELECT * FROM {rd('region')}")
    copy("nation", f"SELECT * FROM {rd('nation')}")
    copy(
        "customer",
        f"""SELECT c_custkey + r * {cu} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM {rd('customer')} {rep} ORDER BY c_custkey""",
    )
    copy(
        "supplier",
        f"""SELECT s_suppkey + r * {su} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM {rd('supplier')} {rep} ORDER BY s_suppkey""",
    )
    copy(
        "part",
        f"""SELECT p_partkey + r * {pa} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM {rd('part')} {rep} ORDER BY p_partkey""",
    )
    copy(
        "orders",
        f"""SELECT o_orderkey + r * {orr} AS o_orderkey,
                   o_custkey + r * {cu} AS o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM {rd('orders')} {rep} ORDER BY o_orderkey""",
    )
    copy(
        "lineitem",
        f"""SELECT l_orderkey + r * {orr} AS l_orderkey,
                   l_partkey + r * {pa} AS l_partkey,
                   l_suppkey + r * {su} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {rd('lineitem')} {rep} ORDER BY l_orderkey, l_linenumber""",
    )
    copy(
        "events",
        f"""SELECT event_id + r * {ev} AS event_id, ts,
                   user_id + r * {cu} AS user_id, event_type, value, props
            FROM {rd('events')} {rep} ORDER BY event_id""",
    )

    lower = string.ascii_lowercase
    upper = string.ascii_uppercase

    def rot(s: str, r: int) -> str:
        return s[r:] + s[:r]

    def letter_target(r: int) -> str:
        """Distinct substitution alphabet per replica, r < 52.

        r < 26: rotation by r (the original scheme). r >= 26: the
        REFLECTED alphabet rotated by r-26 — the dihedral group's 52
        distinct permutations. Two rejected designs, both of which
        planted cross-replica duplicates and corrupted the linear
        pair-count scaling this lake exists to guarantee: plain
        rotation cycles at 26 (replica r == replica r-26 exactly), and
        a case SWAP for r >= 26 looks distinct but is erased by any
        case-insensitive key — the engine's exact-dedup fingerprint is
        md5(lower(trim(...))), so lower(case_swap(t)) == lower(t) and
        replicas 26-29 aliased 0-3 for every fingerprint-keyed query
        (caught by the r7 code review). Reflections act WITHIN each
        case, so they survive lower() and never equal a rotation."""
        n, refl = r % 26, (r // 26) % 2
        lo, up = rot(lower, n), rot(upper, n)
        return (lo[::-1] + up[::-1]) if refl else (lo + up)

    # Third transform dimension (r8, for the 100-replica sf10 lake): the
    # dihedral 52 are exactly the AFFINE letter maps x → a·x + b mod 26
    # with a ∈ {1, 25}; the remaining ten units of Z/26 extend the family
    # to 12·26 = 312 distinct permutations. Affine maps applied to both
    # cases in lockstep commute with lower() (the r7-review property the
    # case-swap design violated), are length/shingle-structure-preserving
    # like any substitution, and distinct (a, b) ⇒ distinct permutations
    # (they differ at letter 0 or letter 1). Residual cross-replica-dup
    # risk is the same class as rotations (the corpus would have to
    # contain an affine image of one of its own docs) — and is CHECKED,
    # not assumed: main() asserts the case-insensitive fingerprint
    # surplus scales exactly ×REPLICAS after the build.
    _EXTRA_UNITS = (3, 5, 7, 9, 11, 15, 17, 19, 21, 23)

    def letter_target_affine(r: int) -> str:
        if r < 52:
            return letter_target(r)  # keep sf1/sf3 lakes byte-compatible
        a = _EXTRA_UNITS[(r - 52) // 26]
        b = (r - 52) % 26
        perm = [(a * i + b) % 26 for i in range(26)]
        return "".join(lower[p] for p in perm) + "".join(
            upper[p] for p in perm
        )

    # Fourth transform family (r10, for the 1000-replica sf100 lake):
    # past the 312 affine maps, ANY distinct letter permutation has the
    # required properties — substitution ciphers preserve length /
    # whitespace / shingle structure, and applying the same permutation
    # to both cases in lockstep commutes with lower() (the r7-review
    # property). Affine was elegance, not necessity. Family r >= 312
    # uses a per-replica seeded Fisher-Yates shuffle; global
    # injectivity across ALL families is asserted outright below
    # (26!/(26-?)! collisions are astronomically unlikely but the
    # fp-surplus build check would also catch one), so the guarantee is
    # checked, never assumed.
    def letter_target_any(r: int) -> str:
        if r < 312:
            return letter_target_affine(r)
        import random as _random

        perm = list(range(26))
        _random.Random(f"sf_lake_perm_{r}").shuffle(perm)
        return "".join(lower[p] for p in perm) + "".join(
            upper[p] for p in perm
        )

    targets = [letter_target_any(r) for r in range(REPLICAS)]
    assert len(set(targets)) == REPLICAS, (
        "letter-target collision across replica transform families"
    )
    doc_branches = " UNION ALL ".join(
        f"""SELECT doc_id + {r * do} AS doc_id,
                   translate(text, '{lower + upper}',
                             '{targets[r]}') AS text,
                   lang, source, n_chars
            FROM {rd('documents')}"""
        for r in range(REPLICAS)
    )
    copy("documents", f"SELECT * FROM ({doc_branches}) ORDER BY doc_id")

    # Dup-density invariant, CHECKED (r8): the duplicate surplus under
    # the engine's case-insensitive exact-dedup fingerprint must scale
    # exactly ×REPLICAS — any letter-target aliasing (the r7 case-swap
    # bug) or corpus-contains-its-own-image collision fails the build.
    def fp_surplus(src_sql: str) -> int:
        return con.execute(
            f"SELECT count(*) - count(DISTINCT md5(lower(trim(text)))) "
            f"FROM {src_sql}"
        ).fetchone()[0]

    base_surplus = fp_surplus(rd("documents"))
    big_surplus = fp_surplus(f"read_parquet('{dst}/documents.parquet')")
    assert big_surplus == REPLICAS * base_surplus, (
        base_surplus,
        big_surplus,
        REPLICAS,
    )

    dim = con.execute(
        f"SELECT len(embedding) FROM {rd('embeddings')} LIMIT 1"
    ).fetchone()[0]
    # Per-replica circular shift; max(1, ...) keeps shifts distinct (mod
    # dim) when REPLICAS > dim/2 (e.g. the 30-replica sf3 lake). Shifts
    # r*step are injective mod dim only while REPLICAS <= dim — a lake
    # with embedding dim < REPLICAS would plant exact-duplicate
    # embeddings across replicas and corrupt the linear near-dup pair
    # scaling this generator exists to guarantee (mirrors the
    # letter_target injectivity guard).
    # r8: past dim replicas, a SIGN FLIP is the second embedding
    # transform dimension — negation preserves norms and every
    # intra-replica cosine bit-for-bit (cos(-x,-y) = cos(x,y)) while
    # plain-vs-negated cross-replica cosines are the same ~N(0, 1/√dim)
    # noise, negated. (sign, shift) pairs are injective for
    # REPLICAS <= 2·dim; shifts for r < dim keep the original
    # step-stride formula so existing sf1/sf3 lakes regenerate
    # byte-identically.
    # r9 (the 300-replica sf30 lake): past 2·dim replicas, the third
    # family is a blockwise ±1 DIAGONAL — multiplying coordinate i by
    # sign_i ∈ {±1} preserves norms and every intra-replica dot product
    # EXACTLY in float (sign_i² x_i y_i = x_i y_i term-by-term, no
    # reassociation), while a mixed-sign pattern scrambles cross-replica
    # dot products into the same ~N(0, 1/√dim) noise. Family s ≥ 1 uses
    # block width s (sign_i = −1 iff ⌊i/s⌋ even): patterns are pairwise
    # distinct across s (they first differ at index min(s, s')), never
    # all-plus (index 0 is −) and never all-minus (index s is +, s < dim)
    # — so (sign pattern, shift) stays injective across ALL families and
    # the r<2·dim lakes regenerate byte-identically. Mixed signs require
    # s ≤ dim/2, capping REPLICAS at dim·(2 + dim/2).
    assert REPLICAS <= dim * (2 + dim // 2), (
        f"REPLICAS={REPLICAS} exceeds dim*(2+dim/2) for dim={dim}: "
        "(sign, shift) transforms would collide across replicas"
    )
    step = max(1, dim // REPLICAS) if REPLICAS <= dim else 1

    def emb_branch(r: int) -> str:
        if r < dim:
            shift = (r * step) % dim
        elif r < 2 * dim:
            shift = (r - dim) % dim
        else:
            shift = r % dim
        rotated = (
            f"list_concat(embedding[{shift + 1}:], embedding[:{shift}])"
        )
        if dim <= r < 2 * dim:
            rotated = f"list_transform({rotated}, x -> -x)"
        elif r >= 2 * dim:
            s = r // dim - 1
            pat = [
                "-1" if (i // s) % 2 == 0 else "1" for i in range(dim)
            ]
            rotated = (
                f"list_transform(list_zip({rotated}, "
                f"CAST([{', '.join(pat)}] AS FLOAT[])), p -> p[1] * p[2])"
            )
        return f"""SELECT vec_id + {r * ve} AS vec_id,
                   CAST({rotated} AS FLOAT[]) AS embedding,
                   label
            FROM {rd('embeddings')}"""

    emb_branches = " UNION ALL ".join(emb_branch(r) for r in range(REPLICAS))
    copy("embeddings", f"SELECT * FROM ({emb_branches}) ORDER BY vec_id")


if __name__ == "__main__":
    main()
