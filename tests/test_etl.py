"""ETL tests: dense reindex, sha256 invariant, dependency + co-change
edge derivation vs a pandas-side oracle."""

from __future__ import annotations

import hashlib
import re

import pytest

from linkgraph.datagen import repo_table
from linkgraph.etl import build_link_graph, cochange_edges, dependency_edges, file_vertices


@pytest.fixture(scope="module")
def repos(spark):
    df = repo_table(spark, n_repos=5, files_per_repo=40, n_commits=12, seed=42).cache()
    df.count()
    return df


def test_repo_table_shape(repos):
    assert repos.columns == ["repo", "path", "commit", "lang", "content"]
    assert repos.count() == 200
    # deterministic: same seed -> same content hash set
    pdf = repos.toPandas()
    assert pdf["commit"].str.len().eq(40).all()
    assert set(pdf["lang"]) <= {"py", "java", "cpp", "go", "js"}
    assert pdf["content"].str.contains("import pkg_").any()


def test_vertices_dense_ids_and_sha(repos):
    v = file_vertices(repos).toPandas().sort_values("id")
    n = len(v)
    assert list(v["id"]) == list(range(n))  # dense 0..n-1
    # sha256 invariant vs python hashlib on the raw rows
    raw = repos.toPandas()
    truth = {
        (r.repo, r.path): hashlib.sha256(r.content.encode()).hexdigest()
        for r in raw.itertuples()
    }
    for r in v.itertuples():
        assert truth[(r.repo, r.path)] == r.content_sha


def test_dependency_edges_match_oracle(repos):
    v = file_vertices(repos)
    e = dependency_edges(repos, v).toPandas()
    vp = v.toPandas()
    vid = {(r.repo, r.path): r.id for r in vp.itertuples()}
    raw = repos.toPandas()
    want = set()
    pat = re.compile(r"^import\s+pkg_(\d+)\.mod_(\d+)\s*$", re.M)
    for r in raw.itertuples():
        for j, k in pat.findall(r.content):
            tgt = (r.repo, f"src/pkg_{j}/mod_{k}.py")
            if tgt in vid and vid[tgt] != vid[(r.repo, r.path)]:
                want.add((vid[(r.repo, r.path)], vid[tgt]))
    got = set(zip(e["src"], e["dst"]))
    assert got == want
    assert (e["kind"] == "dep").all()


def test_cochange_edges_match_oracle(repos):
    v = file_vertices(repos)
    e = cochange_edges(repos, v).toPandas()
    vp = v.toPandas()
    vid = {(r.repo, r.path): r.id for r in vp.itertuples()}
    raw = repos.toPandas()
    from collections import defaultdict

    groups = defaultdict(list)
    for r in raw.itertuples():
        groups[(r.repo, r.commit)].append(vid[(r.repo, r.path)])
    want = defaultdict(int)
    for ids in groups.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                want[(ids[i], ids[j])] += 1
    got = {(r.src, r.dst): r.weight for r in e.itertuples()}
    assert got == dict(want)


def test_build_link_graph_hub_skew(repos):
    v, e = build_link_graph(repos)
    ep = e.where("kind = 'dep'").toPandas()
    indeg = ep.groupby("dst").size()
    # the planted hub (file 0 per repo) must dominate in-degree
    assert indeg.max() > 3 * indeg.median()


def test_compact_vertex_ids(spark):
    from pyspark.sql import functions as F

    from linkgraph.etl import compact_vertex_ids

    B = 10**13
    rows = [(B + i * 7, B + ((i * 13 + 5) % 40) * 7) for i in range(200)]
    rows = [(a, b) for a, b in rows if a != b]
    e = spark.createDataFrame(rows, "src long, dst long")
    out, mp = compact_vertex_ids(e, num_partitions=4)
    m = {r["id"]: r["cid"] for r in mp.collect()}
    n = len(m)
    # dense bijection into [0, n), int type below 2^31
    assert sorted(m.values()) == list(range(n))
    assert dict(out.dtypes)["src"] == "int"
    got = sorted(tuple(r) for r in out.collect())
    want = sorted((m[a], m[b]) for a, b in rows)
    assert got == want
    # deterministic: second derivation identical
    _, mp2 = compact_vertex_ids(e, num_partitions=4)
    assert {r["id"]: r["cid"] for r in mp2.collect()} == m
