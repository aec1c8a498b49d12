"""Deterministic synthetic data — no external inputs, scale-free by
construction (generated from spark.range, so a 10^12-row tier is the
same code with bigger arguments).

Two generators:

  * repo_table(...)   — the graft's mandated input shape
    (repo, path, commit, lang, content) per FIXTURES.md §1, with
    import statements embedded in `content` so the ETL dependency
    extractor has real signal, plus a per-repo hub file imported by a
    large fraction of files (the skew knob).
  * skewed_graph(...) — a p2p-31-analog simple edge list with a
    power-law-ish in-degree profile (old/low ids attract more edges),
    standing in for the LDBC Graphalytics test graphs the reference
    validates against (analytical_engine/test/app_tests.sh:403-404).

All randomness is xxhash64 of (seed, row id, slot) — per-row
deterministic, order-independent, cluster-reproducible; there is no
driver-side RNG and no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ["py", "java", "cpp", "go", "js"]


def _h(*cols) -> F.Column:
    """Non-negative deterministic hash."""
    return F.abs(F.xxhash64(*[F.lit(c) if isinstance(c, (int, str)) else c for c in cols]))


def repo_table(
    spark: SparkSession,
    n_repos: int = 10,
    files_per_repo: int = 100,
    n_commits: int = 50,
    imports_per_file: int = 3,
    hub_fraction: float = 0.3,
    seed: int = 42,
) -> DataFrame:
    """One row per file: (repo, path, commit, lang, content).

    content embeds lines `import pkg_{j}.mod_{k}` referencing other
    files of the same repo; file 0 of each repo is a hub imported by
    ~hub_fraction of files. commit assigns each file to one of
    n_commits deterministic 40-hex ids (used for co-change edges).
    """
    n = n_repos * files_per_repo
    df = (
        spark.range(n)
        .select(
            (F.col("id") / files_per_repo).cast("long").alias("r"),
            (F.col("id") % files_per_repo).alias("f"),
        )
        .select(
            "r",
            "f",
            F.concat(F.lit("org/repo-"), F.col("r")).alias("repo"),
            (F.col("f") % 20).alias("pkg"),
        )
    )
    # import targets: slots 0..imports_per_file-1, deterministic per (seed,r,f,slot)
    slots = F.array(*[F.lit(i) for i in range(imports_per_file)])
    df = df.select(
        "r", "f", "repo", "pkg", F.explode(slots).alias("slot")
    ).select(
        "r",
        "f",
        "repo",
        "pkg",
        "slot",
        # target file index within the repo; hub override with prob hub_fraction
        F.when(
            (F.col("f") != 0)
            & ((_h(seed, F.col("r"), F.col("f"), F.lit("hub")) % 1000) < int(hub_fraction * 1000)),
            F.lit(0),
        )
        .otherwise(_h(seed, F.col("r"), F.col("f"), F.col("slot")) % files_per_repo)
        .alias("tgt"),
    )
    imports = (
        df.where(F.col("tgt") != F.col("f"))
        .select(
            "r",
            "f",
            "repo",
            "pkg",
            F.concat(
                F.lit("import pkg_"),
                (F.col("tgt") % 20),
                F.lit(".mod_"),
                F.col("tgt"),
            ).alias("stmt"),
        )
        .groupBy("r", "f", "repo", "pkg")
        .agg(F.concat_ws("\n", F.sort_array(F.collect_set("stmt"))).alias("imports"))
    )
    base = spark.range(n).select(
        (F.col("id") / files_per_repo).cast("long").alias("r"),
        (F.col("id") % files_per_repo).alias("f"),
    )
    out = (
        base.join(imports, ["r", "f"], "left")
        .select(
            F.concat(F.lit("org/repo-"), F.col("r")).alias("repo"),
            F.concat(
                F.lit("src/pkg_"), (F.col("f") % 20), F.lit("/mod_"), F.col("f"), F.lit(".py")
            ).alias("path"),
            F.lpad(
                F.lower(F.hex(_h(seed, F.col("r"), F.col("f"), "commitpick") % n_commits)),
                40,
                "0",
            ).alias("commit"),
            F.element_at(
                F.array(*[F.lit(l) for l in LANGS]),
                (_h(seed, F.col("r"), F.col("f"), "lang") % len(LANGS) + 1).cast("int"),
            ).alias("lang"),
            F.concat(
                F.coalesce(F.col("imports"), F.lit("")),
                F.lit("\n\ndef main():\n    return "),
                _h(seed, F.col("r"), F.col("f"), "body") % 100000,
                F.lit("\n"),
            ).alias("content"),
        )
    )
    return out


def skewed_graph(
    spark: SparkSession,
    n_vertices: int = 5000,
    avg_degree: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Deterministic directed edge list (src: long, dst: long) with a
    skewed in-degree distribution: dst = (h % src) biased toward low
    ids by squaring — low ids act as hubs, like preferential
    attachment. Self-loops and duplicates removed. ~n*avg_degree edges.
    """
    m = avg_degree
    slots = F.array(*[F.lit(i) for i in range(m)])
    e = (
        spark.range(1, n_vertices)
        .select(F.col("id").alias("src"), F.explode(slots).alias("slot"))
        .select(
            "src",
            # u in [0,1): bias low with u^2
            (
                F.pow((_h(seed, F.col("src"), F.col("slot")) % 1000000) / 1000000.0, 2.0)
                * F.col("src")
            )
            .cast("long")
            .alias("dst"),
        )
        .where(F.col("dst") != F.col("src"))
        .dropDuplicates(["src", "dst"])
    )
    return e.select("src", "dst")
