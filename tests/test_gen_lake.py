"""Invariants of the scale-lake generator's replica transforms.

tools/gen_sf1.py builds the sf1/sf3/sf10/sf30 lakes the scaling sweeps
run on (VERDICT r5 ask #2, r9 fourth decade). The sweeps' exponent
readings are only meaningful if each replica preserves the base lake's
intra-replica structure exactly (same near-dup topology, same cluster
geometry → per-replica work identical) while being disjoint from every
other replica (pair counts scale exactly ×REPLICAS, not ×REPLICAS²).
This test runs the real generator at REPLICAS=320 — past 2·dim=128 AND
past the 312 affine letter maps, so all three embedding transform
families (shift, negated shift, blockwise ±1 diagonal × shift) and all
FOUR letter-target families (rotation, reflection, affine, seeded
permutation — the r10 family behind the 1000-replica sf100 lake) are
exercised — and checks those invariants on the output parquet. The
doc-side dup-density invariant (fingerprint surplus == REPLICAS x base)
is asserted by the generator itself at build time.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
SRC = "/root/testdata/sf0.001"
REPLICAS = 320


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    if not os.path.isdir(SRC):
        pytest.skip(f"{SRC} missing")
    dst = tmp_path_factory.mktemp("sf_gen_320")
    env = dict(os.environ, SF1_REPLICAS=str(REPLICAS))
    # The generator asserts its own dup-density invariant (fingerprint
    # surplus == REPLICAS × base surplus) at build time — a non-zero
    # exit here IS a failed invariant, not a harness problem.
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_sf1.py"), SRC, str(dst)],
        check=True,
        capture_output=True,
        text=True,
        env=env,
    )
    return dst


def _embeddings(path: Path) -> tuple[np.ndarray, np.ndarray]:
    import duckdb

    vid, emb = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM read_parquet('{path}') ORDER BY vec_id"
    ).fetchnumpy().values()
    return vid, np.stack([np.asarray(e, dtype=np.float32) for e in emb])


def test_embedding_replicas_preserve_intra_cosines_bitexact(lake):
    vid, mat = _embeddings(lake / "embeddings.parquet")
    n = len(vid) // REPLICAS
    base = mat[:n].astype(np.float64)
    base_gram = base @ base.T
    # Families: shift-only (r<64), negated shift (64..127), blockwise
    # sign diagonal (128, 129). A permutation reorders the dot product's
    # float accumulation, so compare the permuted families at fp64
    # tolerance; the diagonal family is term-by-term sign-squared and
    # must be BIT-exact.
    for r in (1, 63, 64, 127):
        rep = mat[r * n : (r + 1) * n].astype(np.float64)
        assert np.allclose(rep @ rep.T, base_gram, rtol=1e-6, atol=1e-9), r
    dim = mat.shape[1]
    for r in (128, 129):
        rep = mat[r * n : (r + 1) * n]
        shift, s = r % dim, r // dim - 1
        pat = np.array(
            [-1.0 if (i // s) % 2 == 0 else 1.0 for i in range(dim)],
            dtype=np.float32,
        )
        # generator: rotate left by `shift`, then apply the diagonal —
        # ±1 multiplication is exact in float, so BIT-identical
        expected = np.roll(mat[:n], -shift, axis=1) * pat
        assert (rep == expected).all(), r


def test_embedding_replicas_pairwise_distinct_and_decorrelated(lake):
    vid, mat = _embeddings(lake / "embeddings.parquet")
    n = len(vid) // REPLICAS
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    # One probe vector per replica: cross-replica cosines of the same
    # base row must sit below any near-dup threshold, including between
    # the three transform families. One-sided on purpose: replica r+dim
    # is the exact NEGATION of replica r (cos = −1), which plants no
    # near-dup pairs — similarity thresholds are positive.
    probes = norm[0::n][: REPLICAS]
    gram = probes @ probes.T
    off = gram[~np.eye(REPLICAS, dtype=bool)]
    assert off.max() < 0.85, off.max()
    # and no two replicas of the same row are exactly equal
    assert len({p.tobytes() for p in probes}) == REPLICAS


def test_fact_keys_strided_consistently(lake):
    import duckdb

    con = duckdb.connect()
    # join selectivity preserved: every lineitem still finds its order
    orphans = con.execute(
        f"""SELECT count(*) FROM read_parquet('{lake}/lineitem.parquet') l
            LEFT JOIN read_parquet('{lake}/orders.parquet') o
            ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"""
    ).fetchone()[0]
    assert orphans == 0
    counts = {
        t: con.execute(
            f"SELECT count(*) FROM read_parquet('{lake}/{t}.parquet')"
        ).fetchone()[0]
        for t in ("orders", "lineitem", "documents", "embeddings")
    }
    base = {
        t: con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        for t in counts
    }
    assert counts == {t: REPLICAS * c for t, c in base.items()}
