"""Property-based tests (hypothesis) for the dedup/ANN pipeline family
— the r4 verdict's ask 9: extend the property-test net from the graph
algorithms to minhash/LSH and embedding_near_dup.

Each example writes a tiny random corpus to a fresh parquet dir and
compares the Spark plans against pure-Python replays of the SAME
deterministic hash constructions (md5 60-bit minhash, band md5,
quantized hyperplane signs), plus the estimator/threshold invariants.
"""

from __future__ import annotations

import hashlib
import itertools
import math

from hypothesis import HealthCheck, given, settings, strategies as st

from linkgraph import pipeline as pl

SET = settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
    min_size=2,
    max_size=8,
)

_uniq = itertools.count()


def _write_docs(spark, tmp_path_factory, docs):
    d = tmp_path_factory.mktemp(f"pdocs{next(_uniq)}")
    spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    ).write.parquet(f"{d}/documents.parquet")
    return str(d)


def _shingle_set(toks, n=3):
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _min60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_signatures(docs, n_seeds=pl.MINHASH_SEEDS):
    sig = {}
    for i, toks in enumerate(docs):
        sh = _shingle_set(toks)
        if not sh:
            continue
        for seed in range(n_seeds):
            sig[(i, seed)] = min(_min60(f"{seed}|{g}") for g in sh)
    return sig


@SET
@given(docs=docs_strategy)
def test_minhash_signatures_match_python_replay(spark, tmp_path_factory, docs):
    d = _write_docs(spark, tmp_path_factory, docs)
    got = {
        (r["doc_id"], r["seed"]): r["minhash"]
        for r in pl.minhash_signatures(spark, d).collect()
    }
    assert got == _py_signatures(docs)


@SET
@given(docs=docs_strategy)
def test_lsh_candidates_match_python_banding(spark, tmp_path_factory, docs):
    """Replay the banding exactly: a pair is a candidate iff it agrees
    on EVERY row of some band. Also the estimator property: equal
    shingle sets always collide (J=1 → every band agrees)."""
    d = _write_docs(spark, tmp_path_factory, docs)
    got = {(r["a"], r["b"]) for r in pl.lsh_candidate_pairs(spark, d).collect()}
    sig = _py_signatures(docs)
    n_bands = pl.MINHASH_SEEDS // pl.LSH_BAND_ROWS
    ids = sorted({i for (i, _) in sig})
    want = set()
    for a, b in itertools.combinations(ids, 2):
        for band in range(n_bands):
            rows = range(band * pl.LSH_BAND_ROWS, (band + 1) * pl.LSH_BAND_ROWS)
            if all(sig[(a, s)] == sig[(b, s)] for s in rows):
                want.add((a, b))
                break
    assert got == want
    for a, b in itertools.combinations(ids, 2):
        if _shingle_set(docs[a]) == _shingle_set(docs[b]):
            assert (a, b) in got


vectors_strategy = st.lists(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
        min_size=8,
        max_size=8,
    ),
    min_size=3,
    max_size=8,
)


def _write_embs(spark, tmp_path_factory, vecs):
    d = tmp_path_factory.mktemp(f"pembs{next(_uniq)}")
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    ).write.parquet(f"{d}/embeddings.parquet")
    return str(d)


def _cos(u, v):
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]
    u = [f32(x) for x in u]
    v = [f32(x) for x in v]
    nu = math.sqrt(sum(x * x for x in u))
    nv = math.sqrt(sum(x * x for x in v))
    if nu == 0 or nv == 0:
        return float("nan")
    return sum(a * b for a, b in zip(u, v)) / (nu * nv)


@SET
@given(vecs=vectors_strategy, thr=st.sampled_from([0.5, 0.9]))
def test_embedding_near_dup_threshold_and_planted_recall(
    spark, tmp_path_factory, vecs, thr
):
    """(a) every returned pair really has cosine ≥ threshold (exact
    recomputation); (b) planted EXACT duplicates — identical vectors
    have identical hyperplane signs in every table, so they always
    collide — are always returned (non-degenerate vectors only)."""
    # plant one exact duplicate of vector 0 at the end
    vecs = list(vecs) + [list(vecs[0])]
    d = _write_embs(spark, tmp_path_factory, vecs)
    got = {(r["a"], r["b"]): r["sim"] for r in
           pl.embedding_near_dup(spark, d, threshold=thr).collect()}
    for (a, b), sim in got.items():
        exact = _cos(vecs[a], vecs[b])
        assert abs(sim - exact) < 1e-5
        assert sim >= thr
    dup_cos = _cos(vecs[0], vecs[-1])
    if not math.isnan(dup_cos) and dup_cos >= thr:
        assert (0, len(vecs) - 1) in got
