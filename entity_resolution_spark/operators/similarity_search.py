"""Approximate-nearest-neighbor similarity search over an embedding column.

Two paths (task brief):
- brute_force_topk — exact cosine top-k, the correctness baseline. The dot
  product is a JVM-side ``zip_with``/``aggregate`` expression (codegen'd,
  no Python); top-k is TakeOrderedAndProject, not a global sort.
- ivf_topk — the scale path: an IVF-style coarse quantizer. Centroids are
  trained driver-side on a bounded seeded sample (k-means, a few numpy
  iterations), broadcast implicitly via the closure, assignment is one
  Arrow UDF pass; queries probe only ``n_probe`` nearest cells, so the
  scan cost drops by ~n_cells/n_probe at equal recall on clustered data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf


def _cosine_expr(vec_col: str, q: list[float]):
    qn = float(np.linalg.norm(q))
    qlit = F.array(*[F.lit(float(x)) for x in q])
    # all math in double (float32 partial sums would drift vs any
    # double-precision oracle in the 4th-6th decimal)
    v = F.col(vec_col).cast("array<double>")
    dot = F.aggregate(F.zip_with(v, qlit, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(nrm > 0, dot / (nrm * F.lit(qn))).otherwise(F.lit(-1.0))


def brute_force_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (vec_id, cosine) sorted desc, deterministic
    tiebreak on id."""
    return (
        emb.select(F.col(id_col), F.round(_cosine_expr(vec_col, query) + F.lit(1e-9), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def quantized_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Exact cosine top-k over the int8-at-rest representation: the corpus
    is symmetrically scalar-quantized (operators/vectors.quantize_embeddings
    — the 4x storage format for 100 TB embedding tables) and the search runs
    entirely on the integer codes. Per-vector scales cancel in the cosine,
    so the ranking is exactly cosine(codes, quantized-query) in double; the
    recall-vs-float gap is bounded by quantization noise (test-pinned).

    The query is quantized with the same half-away-from-zero rule the
    column expression uses (np.rint would be half-even), so the plan a
    stored-codes table would produce is bit-identical to this one."""
    from .vectors import quantize_embeddings

    q = quantize_embeddings(emb, vec_col=vec_col, bits=bits)
    qa = np.asarray(query, dtype="float64")
    amax = float(np.abs(qa).max()) if qa.size else 0.0
    if amax > 0:
        qmax = float((1 << (bits - 1)) - 1)
        # same operation order as the column expression (x / (amax/qmax)):
        # multiplying by the reciprocal can differ in the last ulp and flip
        # a rounding decision
        scaled = qa / (amax / qmax)
        qc = np.copysign(np.floor(np.abs(scaled) + 0.5), scaled)
    else:
        qc = np.zeros_like(qa)
    return brute_force_topk(
        q, [float(x) for x in qc], k=k, id_col=id_col, vec_col="codes"
    )


def _assign_nearest(X: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Row-chunked nearest-centroid assignment. The naive broadcast
    ``((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)`` materializes
    an (n, n_cells, dim) float64 temp — a silent driver/worker memory wall
    once n·n_cells·dim grows (e.g. sample_size=10^5 with 4096 cells).
    Chunking the ROW dimension keeps the temp bounded (~32 MB) while using
    the exact same per-row arithmetic, so assignments are bit-identical to
    the unchunked form at any size.
    """
    n_cells, dim = cent.shape
    chunk = max(1, (1 << 22) // max(n_cells * dim, 1))
    out = np.empty(len(X), dtype=np.int64)
    for i in range(0, len(X), chunk):
        xs = X[i : i + chunk]
        d = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        out[i : i + chunk] = d.argmin(axis=1)
    return out


def train_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Driver-side k-means on a seeded bounded sample (control-plane cost,
    like the reference's seeded validation sample)."""
    total = emb.count()
    frac = min(1.0, sample_size * 1.3 / max(total, 1))
    sample = emb.select(vec_col).sample(False, frac, seed).limit(sample_size).collect()
    X = np.array([r[0] for r in sample], dtype="float64")
    if len(X) == 0:
        raise ValueError("empty embedding table")
    n_cells = min(n_cells, len(X))
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), n_cells, replace=False)]
    for _ in range(iters):
        assign = _assign_nearest(X, cent)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def assign_cells(emb: DataFrame, centroids: np.ndarray, vec_col: str = "embedding") -> DataFrame:
    """Add the IVF cell id; ONE Arrow pass, vectorized numpy inside."""
    cent = centroids.copy()

    @pandas_udf(T.IntegerType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        X = np.array(list(vecs), dtype="float64")
        if X.size == 0:
            return pd.Series([], dtype="int32")
        return pd.Series(_assign_nearest(X, cent).astype("int32"))

    return emb.withColumn("cell", cell_udf(F.col(vec_col)))


def ivf_topk(
    emb_with_cells: DataFrame,
    centroids: np.ndarray,
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe cells nearest to the query; exact cosine within.
    Partition pruning on `cell` makes this a fractional scan when the table
    is written partitioned/bucketed by cell."""
    q = np.asarray(query, dtype="float64")
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in d.argsort()[:n_probe]]
    return (
        emb_with_cells.filter(F.col("cell").isin(probe))
        .select(F.col(id_col), F.round(_cosine_expr(vec_col, list(query)) + F.lit(1e-9), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def write_ivf_index(
    emb_with_cells: DataFrame, path: str, centroids: np.ndarray | None = None
) -> None:
    """Persist the cell assignment as a cell-partitioned parquet table —
    the IVF 'index' at rest. Probing then scans only n_probe/n_cells of
    the data: the cell filter becomes a PARTITION filter (directory-level
    pruning), not a row filter, which is what makes IVF a fractional-scan
    ANN at 100 TB. Centroids (tiny) ride along as one parquet file."""
    emb_with_cells.write.partitionBy("cell").mode("overwrite").parquet(path)
    if centroids is not None:
        spark = emb_with_cells.sparkSession
        cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
        spark.createDataFrame(cent_rows, "cell int, centroid array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(path.rstrip("/") + "__centroids")


def append_ivf_index(
    new_emb: DataFrame, path: str, vec_col: str = "embedding"
) -> DataFrame:
    """Delta-proportional IVF index maintenance: fold NEW vectors into a
    standing cell-partitioned index WITHOUT refitting or rewriting it.

    The delta is assigned to the index's persisted centroids (one Arrow
    pass over the delta only — the standing corpus is never read or
    shuffled) and appended file-wise under the existing ``cell=``
    partition directories, so probes keep their partition pruning and the
    append cost is O(delta), the same maintenance contract as the
    pipeline's incremental fold. Returns the per-cell append counts
    (bounded by n_cells) — the monitoring signal for deciding when drift
    warrants a refit (compare against the cell histogram at build time;
    see kmeans.embedding_drift for the corpus-level version).
    """
    spark = new_emb.sparkSession
    cent_df = spark.read.parquet(path.rstrip("/") + "__centroids")
    rows = sorted((r["cell"], r["centroid"]) for r in cent_df.collect())
    centroids = np.array([c for _, c in rows], dtype="float64")
    assigned = assign_cells(new_emb, centroids, vec_col).persist()
    assigned.write.partitionBy("cell").mode("append").parquet(path)
    counts = (
        assigned.groupBy("cell")
        .agg(F.count("*").alias("n_added"))
        .orderBy("cell")
        .localCheckpoint(eager=True)
    )
    assigned.unpersist()
    return counts


def read_ivf_index(spark, path: str) -> tuple[DataFrame, np.ndarray]:
    """Load (cell-partitioned embeddings, centroid matrix)."""
    emb = spark.read.parquet(path)
    cent_df = spark.read.parquet(path.rstrip("/") + "__centroids")
    rows = sorted((r["cell"], r["centroid"]) for r in cent_df.collect())
    return emb, np.array([c for _, c in rows], dtype="float64")


def _cosine_cols(a, b):
    """Cosine of two array<double> columns, all math in double."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(-1.0))


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    qvec_col: str = "embedding",
    n_buckets: int | None = None,
    big_query_threshold: int | None = 100_000,
) -> DataFrame:
    """Table-vs-table kNN: for every query row, the k nearest corpus rows
    by cosine — (query_id, doc_id, cosine, rank), round-6, ties broken by
    doc_id asc.

    Dispatch: this shape replicates the query side |Q| x n_buckets and
    broadcasts the |Q| x k winner frame for the exact re-score — right for
    eval sets and batched lookups, a replication/broadcast wall for a
    corpus-sized query table. When the measured query count exceeds
    ``big_query_threshold`` the call routes to :func:`ivf_knn_join_big`
    at FULL probe (exact by construction — every cell is scored), whose
    cell-cogrouped plan replicates queries only n_cells ways (independent
    of cluster parallelism) and broadcasts NOTHING. Pass
    ``big_query_threshold=0`` to force the corpus-scale path, or ``None``
    to pin the replicated path (e.g. when the caller knows |Q| is tiny and
    wants to skip the count job).

    Scale shape — fully distributed, nothing collects to the driver: the
    corpus is bucketed once on a uniform synthetic key (xxhash64 of the id,
    ``n_buckets`` ways), the query side — the small side: batched lookups,
    eval sets — is replicated to every bucket via a broadcast cross-join,
    and a cogrouped ``applyInPandas`` scores each bucket in ONE vectorized
    (bucket_rows x queries) float64 matmul. Each bucket emits only its
    local top-k per query — any global top-k row is a local top-k row of
    its bucket under the same (-cosine, id) order — so the merge window
    sees ``n_buckets x |Q| x k`` candidate rows. Cost: one corpus shuffle
    (linear, partition-parallel — the previous design's driver-side query
    collect was a driver-memory wall instead) plus |Q| x n_buckets query
    replicas. Size ``n_buckets`` so a bucket's vectors fit an executor
    (default 4x parallelism); for repeated probing, pre-bucket the corpus
    at rest, and for corpus-scale fractional scans use ivf_knn_join.
    Winner cosines are re-computed with the JVM zip_with/aggregate
    expression so reported values are bit-identical to the
    brute-force/oracle path (BLAS summation order differs in ulps).
    """
    spark = corpus.sparkSession
    # bounded census: limit(k+1).count() terminates the scan as soon as
    # k+1 rows are seen, so a small query table pays a cheap probe and a
    # huge one never pays a full count just to learn "it's big"
    if (
        big_query_threshold is not None
        and queries.limit(big_query_threshold + 1).count() > big_query_threshold
    ):
        # corpus-scale query side: exact full-probe cell-cogrouped join.
        # n_cells stays modest and parallelism-independent — replication
        # is |Q| x n_cells instead of |Q| x (4 x defaultParallelism).
        n_cells = 16
        cents = train_centroids(
            corpus.select(F.col(vec_col)), n_cells=n_cells, vec_col=vec_col
        )
        with_cells = assign_cells(corpus, cents, vec_col=vec_col)
        return ivf_knn_join_big(
            queries,
            with_cells,
            cents,
            k=k,
            n_probe=len(cents),
            query_id=query_id,
            id_col=id_col,
            vec_col=vec_col,
            qvec_col=qvec_col,
        )
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism * 4
    # output id types follow the INPUT schemas — string/int ids work alike
    out_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id].dataType),
            T.StructField(id_col, corpus.schema[id_col].dataType),
            T.StructField("approx", T.DoubleType()),
        ]
    )

    corpus_b = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int").alias("__b"),
    )
    buckets = spark.range(n_buckets).select(F.col("id").cast("int").alias("__b"))
    queries_r = queries.select(
        F.col(query_id).alias("query_id"), F.col(qvec_col).alias("__qv")
    ).crossJoin(F.broadcast(buckets))

    def bucket_topk(cdf: pd.DataFrame, qdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cdf) or not len(qdf):
            return pd.DataFrame({"query_id": [], id_col: [], "approx": []})
        V = np.asarray(cdf["__v"].tolist(), dtype="float64")
        ids = cdf[id_col].to_numpy()
        Q = np.asarray(qdf["__qv"].tolist(), dtype="float64")
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
        norms = np.linalg.norm(V, axis=1)
        S = (V / np.maximum(norms, 1e-300)[:, None]) @ Qn.T  # (rows x queries)
        S[norms == 0, :] = -1.0
        kk = min(k, len(cdf))
        out = {"query_id": [], id_col: [], "approx": []}
        for j, qid in enumerate(qdf["query_id"].to_numpy()):
            # local winners by (-cosine, id): any global top-k row is a
            # local top-k row of its bucket under the same order
            order = np.lexsort((ids, -S[:, j]))[:kk]
            out["query_id"] += [qid] * kk
            out[id_col] += list(ids[order])
            out["approx"] += list(S[order, j])
        return pd.DataFrame(out)

    from pyspark.sql import Window

    cand = (
        corpus_b.groupBy("__b")
        .cogroup(queries_r.groupBy("__b"))
        .applyInPandas(bucket_topk, out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc(id_col))
    winners = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank")
    )
    # exact re-score of the |Q|*k winners with the JVM expression
    qv = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(qvec_col).cast("array<double>").alias("__qv"),
    )
    cv = corpus.select(
        id_col, F.col(vec_col).cast("array<double>").alias("__cv")
    )
    return (
        cv.join(F.broadcast(winners), id_col)
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(_cosine_cols(F.col("__qv"), F.col("__cv")) + F.lit(1e-9), 6).alias("cosine"),
            "rank",
        )
    )


def ivf_knn_join(
    queries: DataFrame,
    corpus_with_cells: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    query_id: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qvec_col: str = "embedding",
) -> DataFrame:
    """IVF-accelerated table-vs-table kNN — the fractional-scan scale path.

    Each query probes only its ``n_probe`` nearest cells: the (query_id,
    cell) probe frame is built DISTRIBUTED — one Arrow pass over the query
    table (vectorized centroid-distance argsort, mirroring assign_cells; no
    driver collect), exploded to (query_id, cell) rows — then broadcast and
    equi-joined against the cell-assigned corpus: |Q| x n_probe rows of
    (id, int), tiny relative to the query table itself. When the corpus is
    written partitioned by cell (write_ivf_index) the join prunes whole
    directories. Everything after the cell join is JVM expressions: the
    cosine is the zip_with/aggregate fold (bit-identical to brute force)
    and top-k is a window over the probed subset. n_probe == n_cells
    degenerates to exact knn_join output (pinned by test).
    """
    cent = centroids.copy()
    n_probe = min(n_probe, len(cent))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells_udf(vecs: pd.Series) -> pd.Series:
        X = np.asarray(list(vecs), dtype="float64")
        if X.size == 0:
            return pd.Series([], dtype=object)
        # row-chunked like _assign_nearest: bounds the (rows, n_cells,
        # dim) broadcast temp without changing any row's arithmetic
        n_cells, dim = cent.shape
        chunk = max(1, (1 << 22) // max(n_cells * dim, 1))
        parts = []
        for i in range(0, len(X), chunk):
            d = ((X[i : i + chunk, None, :] - cent[None, :, :]) ** 2).sum(
                axis=2
            )
            parts.append(np.argsort(d, axis=1)[:, :n_probe].astype("int32"))
        return pd.Series(list(np.concatenate(parts)))

    probes = queries.select(
        F.col(query_id).alias("query_id"),
        F.explode(probe_cells_udf(F.col(qvec_col))).alias("cell"),
    )

    qv = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(qvec_col).cast("array<double>").alias("__qv"),
    )
    cand = (
        corpus_with_cells.select(
            "cell", F.col(id_col), F.col(vec_col).cast("array<double>").alias("__cv")
        )
        .join(F.broadcast(probes), "cell")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(_cosine_cols(F.col("__qv"), F.col("__cv")) + F.lit(1e-9), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_knn_join_big(
    queries: DataFrame,
    corpus_with_cells: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    query_id: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qvec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Corpus-scale-query kNN join: NEITHER side is broadcast or
    replicated per bucket — the shape for a query table as large as the
    corpus (the self-kNN / all-pairs-retrieval case `knn_join` and
    `ivf_knn_join` would flood: the former replicates queries
    |Q| x n_buckets, the latter broadcasts the probe + query frames).

    Both sides are cell-keyed: the corpus carries its `assign_cells`
    label; each query row is expanded to its ``n_probe`` nearest cells
    (the same distributed Arrow argsort `ivf_knn_join` uses — n_probe
    replicas, not n_buckets). A cogrouped ``applyInPandas`` on the cell
    key then scores each cell's corpus block against the queries probing
    it in chunked BLAS matmuls and emits local top-k per query; a
    query-keyed window merges the ≤ n_probe x k local winners, and the
    winners are re-scored with the JVM zip_with/aggregate expression via
    shuffle-hash joins (no broadcast anywhere, so a 10^9-row query side
    follows the same linear-shuffle plan as the corpus). A corpus row
    lives in exactly one cell, so no (query, row) pair is scored twice.

    ``exclude_self`` drops hits where the corpus id equals the query id
    (the self-kNN convention). n_probe == n_cells degenerates to exact
    brute-force output (pinned by the contract oracle).

    Ordering note: ``rank`` is assigned from the Python-side pre-normalized
    dot product (`approx`), while the emitted ``cosine`` is the exact JVM
    zip_with/aggregate recomputation — a different float operation order.
    At an exact float near-tie the two can order differently; the emitted
    cosine therefore carries the package-wide `round(x + 1e-9, 6)`
    tie-break convention (mirrored in the DuckDB oracles) so a .5-ULP
    rounding boundary cannot flip a digit between engines.
    """
    spark = corpus_with_cells.sparkSession
    cent = centroids.copy()
    n_probe = min(n_probe, len(cent))
    out_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id].dataType),
            T.StructField(id_col, corpus_with_cells.schema[id_col].dataType),
            T.StructField("approx", T.DoubleType()),
        ]
    )

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells_udf(vecs: pd.Series) -> pd.Series:
        X = np.asarray(list(vecs), dtype="float64")
        if X.size == 0:
            return pd.Series([], dtype=object)
        n_cells, dim = cent.shape
        chunk = max(1, (1 << 22) // max(n_cells * dim, 1))
        parts = []
        for i in range(0, len(X), chunk):
            d = ((X[i : i + chunk, None, :] - cent[None, :, :]) ** 2).sum(
                axis=2
            )
            parts.append(np.argsort(d, axis=1)[:, :n_probe].astype("int32"))
        return pd.Series(list(np.concatenate(parts)))

    probes = queries.select(
        F.col(query_id).alias("query_id"), F.col(qvec_col).alias("__qv")
    ).select(
        "query_id",
        "__qv",
        F.explode(probe_cells_udf(F.col("__qv"))).alias("cell"),
    )
    corpus_c = corpus_with_cells.select(
        "cell", F.col(id_col), F.col(vec_col).alias("__v")
    )

    def cell_topk(cdf: pd.DataFrame, qdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cdf) or not len(qdf):
            return pd.DataFrame({"query_id": [], id_col: [], "approx": []})
        V = np.asarray(cdf["__v"].tolist(), dtype="float64")
        ids = cdf[id_col].to_numpy()
        norms = np.linalg.norm(V, axis=1)
        Vn = V / np.maximum(norms, 1e-300)[:, None]
        out = {"query_id": [], id_col: [], "approx": []}
        # chunk the query side: bounds the (cell_rows x chunk) score
        # matrix regardless of how many queries probe this cell
        q_ids_all = qdf["query_id"].to_numpy()
        chunk = max(1, (1 << 22) // max(len(cdf), 1))
        for lo in range(0, len(qdf), chunk):
            Q = np.asarray(
                qdf["__qv"].iloc[lo : lo + chunk].tolist(), dtype="float64"
            )
            Qn = Q / np.maximum(
                np.linalg.norm(Q, axis=1, keepdims=True), 1e-300
            )
            S = Vn @ Qn.T  # (cell rows x chunk queries)
            S[norms == 0, :] = -1.0
            for j, qid in enumerate(q_ids_all[lo : lo + chunk]):
                col = S[:, j]
                if exclude_self:
                    col = np.where(ids == qid, -np.inf, col)
                kk = min(k, len(cdf))
                order = np.lexsort((ids, -col))[:kk]
                if exclude_self:
                    order = order[np.isfinite(col[order])]
                out["query_id"] += [qid] * len(order)
                out[id_col] += list(ids[order])
                out["approx"] += list(col[order])
        return pd.DataFrame(out)

    from pyspark.sql import Window

    cand = (
        corpus_c.groupBy("cell")
        .cogroup(probes.groupBy("cell"))
        .applyInPandas(cell_topk, out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc(id_col))
    winners = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank")
    )
    # exact JVM re-score of winners through shuffle-hash joins: with a
    # corpus-sized query table the winner frame is |Q| x k rows — a
    # broadcast here would be the very wall this operator removes
    qv = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(qvec_col).cast("array<double>").alias("__qv"),
    )
    cv = corpus_with_cells.select(
        id_col, F.col(vec_col).cast("array<double>").alias("__cv")
    )
    return (
        winners.join(cv.hint("shuffle_hash"), id_col)
        .join(qv.hint("shuffle_hash"), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(_cosine_cols(F.col("__qv"), F.col("__cv")) + F.lit(1e-9), 6).alias(
                "cosine"
            ),
            "rank",
        )
    )


def self_knn_join(
    corpus_with_cells: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Self-kNN over a cell-assigned corpus (every row is a query;
    self-hits excluded): the all-pairs retrieval shape — near-duplicate
    mining, link candidate generation — at corpus scale with no broadcast
    of either side. Output: (query_id, id_col, cosine, rank)."""
    q = corpus_with_cells.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__sq")
    )
    return ivf_knn_join_big(
        q,
        corpus_with_cells,
        centroids,
        k=k,
        n_probe=n_probe,
        query_id="query_id",
        id_col=id_col,
        vec_col=vec_col,
        qvec_col="__sq",
        exclude_self=True,
    )
