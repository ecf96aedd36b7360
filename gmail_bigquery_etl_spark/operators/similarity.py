"""Similarity search over embedding columns (SURVEY.md §2.10).

brute_force_topk  -- exact top-k cosine: broadcast the (small) query set,
                     cross-join against the corpus, per-query window top-k.
                     At 100 TB the corpus side stays partitioned; the only
                     broadcast is the query set, and the ranking is a
                     TakeOrdered per query key, not a global sort.
lsh_bucket_ann    -- random-hyperplane LSH: b sign-bits from pseudo-random
                     (hash-derived, engine-portable) planes form a bucket
                     key; probe joins on the bucket, exact-ranks within.
                     Trades recall for turning the cross-join into an
                     equi-join -- the scale path.
label_centroids   -- per-label mean vector via posexplode + (label, dim)
                     aggregation: one shuffle, partial aggregation applies;
                     never collects vectors to the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.vectors import _qid, cosine_similarity, int_dot, max_abs


def _sql_d(v: float) -> str:
    """A float as a Spark SQL DOUBLE literal. repr() round-trips IEEE754
    exactly and the parser reads the same bits back, so expressions built
    from these strings are value-identical to F.lit(float) trees. Only
    finite values round-trip ('inf'/'nan' are not SQL literals -- ADVICE
    r11); every caller feeds hash-derived weights or data means, which
    are finite by construction, so this is a loud guard, not a path."""
    import math

    v = float(v)
    if not math.isfinite(v):
        raise ValueError(
            f"non-finite literal {v!r} cannot be rendered as a SQL DOUBLE"
        )
    return repr(v) + "D"


def _sql_arr(vals) -> str:
    return "array(" + ",".join(_sql_d(v) for v in vals) + ")"


def _sql_dot_fold(vec_sql: str, weights) -> str:
    """SQL text of the canonical sequential dot fold vs a literal weight
    vector -- the same zip_with/aggregate tree the structured builders
    produce (left fold, ascending index, float64 accumulate)."""
    return (
        f"aggregate(zip_with({vec_sql}, {_sql_arr(weights)}, "
        "(x, w) -> CAST(x AS DOUBLE) * w), 0.0D, (acc, x) -> acc + x)"
    )


def lit_double_array(vals):
    """Literal array<double> built in ONE py4j call (optimization r11,
    guide §1.2 step 2 / §7.3 driver work: F.array(*[F.lit(x) ...]) costs
    one JVM roundtrip PER ELEMENT -- a 64-dim plane costs 65 roundtrips,
    and plane grids build hundreds of them, so DataFrame CONSTRUCTION
    time, not execution, dominated the ANN family's bench seconds. The
    parsed expression is the same CreateArray(Literal...) tree, so plans
    and results are bit-identical)."""
    return F.expr(_sql_arr(vals))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector. Excludes self-matches.

    Each side's norm is folded ONCE per row before the join (the same
    staging lsh_near_dup_pairs documents): cosine = dot/(nq*nc) needs 3
    sequential 64-element folds per PAIR when written inline, but the two
    self-dot folds depend only on their own row -- hoisting them to the
    pre-join projections leaves one fold per pair, a 3x cut in the
    interpreted-HOF work of the scoring stage. The quotient is
    bit-identical: same fold expressions, same IEEE divide."""
    from ..functions.vectors import dot, l2_norm

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("_cn"),
    )
    score = dot("q_vec", "c_vec") / F.nullif(
        F.col("_qn") * F.col("_cn"), F.lit(0.0)
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id", score.alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "rank", F.round("score", 6).alias("score"))
    )


def sq8_quantize(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization (the faiss SQ8-flat
    shape): codes_i = floor(x_i * 127 / max|x| + 0.5), an int in [-127, 127].

    At 100 TB this is the memory lever for similarity search: codes are 4x
    smaller than the float32 vectors (at rest they'd be array<tinyint> or a
    packed binary blob; arithmetic here keeps them bigint, which changes
    nothing semantically), so a scan over codes moves a quarter of the
    bytes and composes with the IVF cell pruning (ivf_topk) the same way a
    faiss IVF,SQ8 index does. The scale is staged as its own projection:
    HOF lambdas get no common-subexpression elimination, so an inline
    max-abs referenced per element would re-fold the array O(d) times per
    element (O(d^2) per row). Zero vectors have no direction: their scale
    is NULLIF'd to NULL, the codes come out NULL, and scorers drop them via
    the norm>0 filter.
    """
    return with_sq8_codes(df.select(id_col, vec_col), vec_col).select(
        id_col, "codes"
    )


def with_sq8_codes(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "codes"
) -> DataFrame:
    """Append the SQ8 code array to a frame, preserving its other columns
    (the composable form: IVF assignment and the codes ride one
    projection). Scale staged as an attribute -- see sq8_quantize."""
    staged = df.withColumn("_s", F.nullif(max_abs(vec_col), F.lit(0.0)))
    return staged.withColumn(
        out_col,
        F.transform(
            vec_col,
            lambda x: F.floor(x.cast("double") * 127.0 / F.col("_s") + 0.5).cast(
                "bigint"
            ),
        ),
    ).drop("_s")


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k over int8 codes (brute-force SQ8-flat).

    Approximate cosine = int_dot(q, c) / (sqrt(|c|^2) * sqrt(|q|^2)) over
    the quantized codes -- the per-vector scales cancel out of cosine up to
    quantization error, so no dequantization happens in the hot loop: the
    scan is exact int64 multiply-adds plus one double divide per pair,
    deterministic across engines and partitionings (recall vs the float
    baseline is pytest-gated). Same plan shape as brute_force_topk:
    broadcast the query side, one codegen'd projection over the corpus, a
    per-query top-k window.
    """
    c = sq8_quantize(corpus, id_col, vec_col).select(
        F.col(id_col).alias("match_id"), F.col("codes").alias("c_codes")
    )
    c = c.select(
        "match_id", "c_codes", int_dot("c_codes", "c_codes").alias("c_nn")
    ).filter(F.col("c_nn") > 0)
    q = sq8_quantize(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("codes").alias("q_codes")
    )
    q = q.select(
        "query_id", "q_codes", int_dot("q_codes", "q_codes").alias("q_nn")
    ).filter(F.col("q_nn") > 0)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            (
                int_dot("c_codes", "q_codes").cast("double")
                / (
                    F.sqrt(F.col("c_nn").cast("double"))
                    * F.sqrt(F.col("q_nn").cast("double"))
                )
            ).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "rank", F.round("score", 6).alias("score"))
    )


def _plane_weights(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes, component (p, j) =
    (int(md5('p:j')[:15 hex]) % 2001 - 1000) / 1000 in [-1, 1]. Computed in
    Python with hashlib (bit-identical to the SQL md5 formula the oracle
    uses) and baked in as literals: constants, not per-row md5 calls."""
    return [
        [
            float(
                int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[:15], 16) % 2001
                - 1000
            )
            / 1000.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_bucket(vec_col: Column | str, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-bit bucket key from deterministic pseudo-random hyperplanes.

    Plane weights are Python-computed constants (same md5 derivation the
    DuckDB oracle evaluates in SQL); per row the work is n_planes
    sequential dot folds -- same accumulation order as the oracle, so the
    sign bits match bit-for-bit.
    """
    if isinstance(vec_col, str):
        # the whole bucket as ONE parsed expression (pq_code_col note:
        # per-plane zip_with/aggregate lambda creation cost ~88 py4j
        # roundtrips each; same tree, same bits)
        q = _qid(vec_col)
        return F.expr(
            "concat("
            + ",".join(
                "CASE WHEN " + _sql_dot_fold(q, plane)
                + " >= 0 THEN '1' ELSE '0' END"
                for plane in _plane_weights(n_planes, dim)
            )
            + ")"
        )
    v = vec_col
    bits = []
    for plane in _plane_weights(n_planes, dim):
        w_arr = lit_double_array(plane)  # one py4j call, not dim+1
        d = F.aggregate(
            F.zip_with(v, w_arr, lambda x, w_: x.cast("double") * w_),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _hamming_ball_1(bucket: Column, n_planes: int) -> Column:
    """The bucket plus every 1-bit-flipped neighbor (n_planes+1 keys)."""
    variants = [bucket]
    for i in range(1, n_planes + 1):
        bit = F.substring(bucket, i, 1)
        flipped = F.when(bit == "1", F.lit("0")).otherwise(F.lit("1"))
        variants.append(
            F.concat(
                F.substring(bucket, 1, i - 1),
                flipped,
                F.substring(bucket, i + 1, n_planes - i),
            )
        )
    return F.array(*variants)


def lsh_bucket_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """ANN: candidates share (a Hamming-1 neighborhood of) the query's
    hyperplane bucket; exact cosine rank within. Multi-probe expands the
    QUERY side only (n_planes+1 keys per query) -- the corpus stays one row
    per vector, so the index build cost is unchanged and recall roughly
    doubles; the standard trade for sign-LSH, whose near-neighbors often
    sit one flipped sign bit away."""
    from ..functions.vectors import dot, l2_norm

    bucket = hyperplane_bucket(vec_col, n_planes, dim)
    # norms hoisted to one fold per ROW (not per candidate pair) -- the
    # brute_force_topk staging note; quotient bit-identical.
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("_cn"),
        bucket.alias("bucket"),
    )
    if multiprobe:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            l2_norm(vec_col).alias("_qn"),
            F.explode(_hamming_ball_1(bucket, n_planes)).alias("bucket"),
        )
    else:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            l2_norm(vec_col).alias("_qn"),
            bucket.alias("bucket"),
        )
    score = dot("q_vec", "c_vec") / F.nullif(
        F.col("_qn") * F.col("_cn"), F.lit(0.0)
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id", score.alias("score"))
        .dropDuplicates(["query_id", "match_id"])
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "rank", F.round("score", 6).alias("score"))
    )


def allpairs_cosine(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "v",
    blocks: int = 8,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold, via blocked BLAS.

    The naive form is a crossJoin with an interpreted 64-element fold per
    pair -- O(n^2) slow-path evaluations. Here every row is replicated to
    the ``blocks`` block-pairs it participates in (B copies/row), each of
    the B*(B+1)/2 groups lands on one task, and numpy matmul scores the
    whole tile at once. Shuffle volume is B x corpus (pick B ~ sqrt(task
    slots)); flops run in BLAS, not the expression interpreter -- this is
    the standard distributed blocked all-pairs similarity layout.
    """
    b_lit = F.lit(blocks)
    tagged = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.col(id_col), b_lit).cast("int").alias("blk"),
    )
    replicated = tagged.select(
        "id",
        "v",
        "blk",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), b_lit - 1),
                lambda o: F.struct(
                    F.least(F.col("blk"), o).cast("int").alias("bp"),
                    F.greatest(F.col("blk"), o).cast("int").alias("bq"),
                ),
            )
        ).alias("pair"),
    ).select("id", "v", "blk", "pair.bp", "pair.bq")

    def score_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        V = np.asarray(pdf["v"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        safe = np.where(norms == 0.0, 1.0, norms)
        Vn = V / safe[:, None]
        Vn[norms == 0.0] = 0.0  # zero vectors match nothing (oracle: NULL)
        ids = pdf["id"].to_numpy()
        bp, bq = int(pdf["bp"].iloc[0]), int(pdf["bq"].iloc[0])
        if bp == bq:
            S = Vn @ Vn.T
            iu, ju = np.triu_indices(len(ids), k=1)
            ia, ib, s = ids[iu], ids[ju], S[iu, ju]
        else:
            left = pdf["blk"].to_numpy() == bp
            A, Bm = Vn[left], Vn[~left]
            ida, idb = ids[left], ids[~left]
            S = A @ Bm.T
            ii, jj = np.indices(S.shape)
            ia, ib, s = ida[ii.ravel()], idb[jj.ravel()], S.ravel()
        keep = s >= threshold
        ia, ib, s = ia[keep], ib[keep], s[keep]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "score": s})

    return replicated.groupBy("bp", "bq").applyInPandas(
        score_tile, schema="id_a bigint, id_b bigint, score double"
    )


def lsh_near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "v",
    multiprobe: bool = True,
) -> DataFrame:
    """Embedding near-dup pairs via sign-LSH bucketing -- the SCALE path
    next to ``allpairs_cosine``'s O(n^2) baseline.

    Candidate pairs collide on (a Hamming-1 probe of) the hyperplane
    bucket: a shuffle equi-join on the bucket key, never a cross join.
    Exact cosine verifies each candidate, so precision is exact; recall is
    the sign-LSH probability (near-dups at cosine -> 1 flip each sign bit
    with probability -> 0, and the Hamming-1 probe covers any single
    flip) -- pytest-gated against brute force, while the SQL oracle
    replicates the identical bucketing/probing so the gated comparison is
    bit-exact.

    Exactly-once without a distinct(): the probe keys of one row are
    ``n_planes + 1`` DISTINCT strings and the build side carries a single
    bucket per row, so an ordered pair (id_a < id_b) can match on at most
    one join key. Probe symmetry (hamming(a,b) <= 1 is symmetric) means
    one-sided expansion loses no pairs.
    """
    from ..functions.vectors import dot, l2_norm

    bucket = hyperplane_bucket(vec_col, n_planes, dim)
    probe = (
        F.explode(_hamming_ball_1(bucket, n_planes)) if multiprobe else bucket
    )
    # Each vector's norm is computed ONCE before the join (same sequential
    # fold as inside cosine_similarity, so the quotient is bit-identical)
    # -- per candidate pair only the cross dot-fold remains, a 3x cut in
    # the verify stage's interpreted HOF work.
    left = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        l2_norm(vec_col).alias("na"),
        probe.alias("bucket"),
    )
    right = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        l2_norm(vec_col).alias("nb"),
        bucket.alias("bucket"),
    )
    score = dot("va", "vb") / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0))
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", score.alias("score"))
        .filter(F.col("score") >= threshold)
    )


def _self_dot(v: Column) -> Column:
    return F.aggregate(
        F.zip_with(v, v, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_centroid_arrays(
    corpus: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[tuple[int, list[float]]]:
    """Collect the coarse quantizer: per-label mean vectors, rounded to 6dp
    (cross-engine exact). The centroid computation is fully distributed
    (label_centroids: one (label, dim) shuffle); only the K x dim quantizer
    table -- kilobytes at any corpus size -- comes back to the driver, the
    same shape every IVF implementation broadcasts to its searchers."""
    rows = label_centroids(corpus, label_col, vec_col).collect()
    by_label: dict[int, dict[int, float]] = {}
    for r in rows:
        by_label.setdefault(r.label, {})[r.dim] = r.centroid
    return [
        (lab, [by_label[lab][j] for j in range(dim)]) for lab in sorted(by_label)
    ]


def ivf_cell_scores(
    vec_col: Column | str, centroids: list[tuple[int, list[float]]]
) -> Column:
    """array<struct<score, neg_lab>>: cosine vs every centroid.

    Built as ONE transform over a literal centroid matrix, so each fold
    appears once in the expression tree. (A per-label when/otherwise argmax
    chain re-embeds every prior score expression per level -- 2^K copies --
    and HOF expressions get no CSE; neg_lab makes struct-max tie-break to
    the smallest label.)
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    if not centroids:
        # empty-input cold start: well-TYPED empty literals keep the
        # transform/array_max tree analyzable; consumers see an empty
        # score array (assign -> null label) over zero rows
        cm = F.array().cast("array<array<double>>")
        cnorms = F.array().cast("array<double>")
        neg_labs = F.array().cast("array<int>")
    else:
        # literal matrix/arrays in 3 py4j calls total (lit_double_array
        # note): K x dim F.lit roundtrips made CONSTRUCTION the dominant
        # cost of every IVF-family query build
        cm = F.expr(
            "array("
            + ",".join(_sql_arr(cent) for _, cent in centroids)
            + ")"
        )
        cnorms = lit_double_array(
            sum(x * x for x in cent) ** 0.5 for _, cent in centroids
        )
        neg_labs = F.expr(
            "array(" + ",".join(str(-lab) for lab, _ in centroids) + ")"
        )
    vnorm = F.sqrt(_self_dot(v))
    return F.transform(
        cm,
        lambda c, i: F.struct(
            (
                F.aggregate(
                    F.zip_with(v, c, lambda x, w: x.cast("double") * w),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.nullif(vnorm * F.element_at(cnorms, i + 1), F.lit(0.0))
            ).alias("score"),
            F.element_at(neg_labs, i + 1).alias("neg_lab"),
        ),
    )


def ivf_assign(
    vec_col: Column | str, centroids: list[tuple[int, list[float]]]
) -> Column:
    """Nearest-centroid cell id (cosine argmax, smallest label wins ties)."""
    return -F.array_max(ivf_cell_scores(vec_col, centroids))["neg_lab"]


def ivf_probe_cells(
    vec_col: Column | str,
    centroids: list[tuple[int, list[float]]],
    nprobe: int,
) -> Column:
    """The nprobe nearest cell ids, best first (struct sort: score desc
    via -score, then label asc)."""
    entries = F.transform(
        ivf_cell_scores(vec_col, centroids),
        lambda e: F.struct(
            (-e["score"]).alias("neg"), (-e["neg_lab"]).alias("lab")
        ),
    )
    return F.slice(
        F.transform(F.array_sort(entries), lambda e: e["lab"]), 1, nprobe
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into centroid cells, probe each
    query's nprobe nearest cells, exact-rank within. The candidate join is
    an equi-join on cell id (corpus side stays partitioned; only the
    replicated query set broadcasts) -- the inverted-file layout that keeps
    ANN a hash join instead of a cross join at scale. Recall is tunable via
    nprobe; pytest gates recall vs brute force."""
    from ..functions.vectors import dot, l2_norm

    cents = ivf_centroid_arrays(corpus, label_col, vec_col)
    # norms hoisted to one fold per ROW (brute_force_topk staging note)
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("_cn"),
        ivf_assign(vec_col, cents).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("_qn"),
        F.explode(ivf_probe_cells(vec_col, cents, nprobe)).alias("cell"),
    )
    score = dot("q_vec", "c_vec") / F.nullif(
        F.col("_qn") * F.col("_cn"), F.lit(0.0)
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id", score.alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "rank", F.round("score", 6).alias("score"))
    )


def ivf_sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    cents: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF cell pruning + SQ8 in-cell scoring -- the faiss ``IVF,SQ8``
    index as a DataFrame plan. Cell ASSIGNMENT happens once at build time
    on the float vectors (exactly ivf_topk's quantizer); the scan-time
    candidate scoring runs entirely over int8 codes, so the probe join
    moves cell-pruned candidate lists of quarter-width codes and the hot
    loop is exact int64 multiply-adds. Same scale posture as ivf_topk
    (equi-join on cell id, broadcast query side) with SQ8's memory cut on
    the big side. Recall vs float brute force is pytest-gated.

    ``cents``: optionally pass an ALREADY-COLLECTED quantizer table
    (ivf_centroid_arrays output) so a composite caller (the recall
    scoreboard) trains the shared quantizer once instead of re-running
    the centroid aggregation job per leg."""
    if cents is None:
        cents = ivf_centroid_arrays(corpus, label_col, vec_col)
    c = (
        with_sq8_codes(
            corpus.select(
                F.col(id_col).alias("match_id"),
                F.col(vec_col).alias("_v"),
                ivf_assign(vec_col, cents).alias("cell"),
            ),
            vec_col="_v",
            out_col="c_codes",
        )
        .select(
            "match_id",
            "cell",
            "c_codes",
            int_dot("c_codes", "c_codes").alias("c_nn"),
        )
        .filter(F.col("c_nn") > 0)
    )
    q = (
        with_sq8_codes(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("_v"),
                ivf_probe_cells(vec_col, cents, nprobe).alias("_cells"),
            ),
            vec_col="_v",
            out_col="q_codes",
        )
        .select(
            "query_id",
            F.explode("_cells").alias("cell"),
            "q_codes",
            int_dot("q_codes", "q_codes").alias("q_nn"),
        )
        .filter(F.col("q_nn") > 0)
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            (
                int_dot("c_codes", "q_codes").cast("double")
                / (
                    F.sqrt(F.col("c_nn").cast("double"))
                    * F.sqrt(F.col("q_nn").cast("double"))
                )
            ).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "rank", F.round("score", 6).alias("score"))
    )


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label element-wise mean embedding, distributed (no collect).
    Output long-form (label, dim, centroid) with rounding so the fp sum's
    shuffle-order nondeterminism stays below the emitted precision."""
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    )
    return exploded.groupBy("label", "dim").agg(
        F.round(F.avg(F.col("x").cast("double")), 6).alias("centroid"),
        F.count("*").alias("n"),
    )


def _l2sq_lit(sub: Column, cw: list[float]) -> Column:
    """Sequential-fold squared-L2 distance between a sliced subvector and a
    LITERAL codeword: left fold over ascending index, bit-identical to the
    oracle's list_reduce(list_prepend(0.0, ...)) formulation. Squares are
    plain multiplies (not pow) so both engines hit the same IEEE ops."""
    lit = lit_double_array(cw)  # one py4j call, not len(cw)+1
    diffs = F.zip_with(
        sub,
        lit,
        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def pq_codebooks(
    corpus: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    m: int = 4,
    dim: int = 64,
    cents: list[tuple[int, list[float]]] | None = None,
) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks: the label-mean centroids (the same
    distributed quantizer IVF collects -- only K x dim scalars ever reach
    the driver) sliced into ``m`` subspaces of dim/m components. Codebook
    [s] holds (code_id, codeword) pairs for subspace s; code ids are the
    label ids, so the codebook derivation is deterministic and exactly
    replicable in oracle SQL (no iterative k-means state).

    ``cents``: optionally reuse an already-collected centroid table (the
    scoreboard's shared-quantizer path) instead of re-running the
    centroid job."""
    if cents is None:
        cents = ivf_centroid_arrays(corpus, label_col, vec_col, dim)
    d_sub = dim // m
    return [
        [(lab, v[s * d_sub : (s + 1) * d_sub]) for lab, v in cents]
        for s in range(m)
    ]


def pq_code_col(
    vec_col: Column | str,
    codebook_s: list[tuple[int, list[float]]],
    s: int,
    d_sub: int,
) -> Column:
    """Nearest-codeword id for subspace ``s``: argmin of squared-L2 via
    array_min over (distance, code) structs -- one fold per codeword, ties
    break to the smallest code id. Same single-expression-tree shape as
    ivf_cell_scores (a when/otherwise argmin chain would re-embed every
    prior fold exponentially; HOF expressions get no CSE)."""
    if not codebook_s:
        # empty-codebook cold start: typed empty -> null code id
        entries = F.array().cast("array<struct<d:double,lab:int>>")
        return F.array_min(entries)["lab"]
    if isinstance(vec_col, str):
        # ONE parsed expression per subspace (optimization r11, guide
        # §7.3 driver work): the structured builder paid ~88 py4j
        # roundtrips PER zip_with/aggregate lambda -- K codewords x m
        # subspaces of them made DataFrame CONSTRUCTION, not execution,
        # the dominant cost of every PQ query (profiled 10.9 of 13.0 s
        # inside pq_code_col's HOF creation). The parsed tree is the
        # same slice/zip_with/aggregate/named_struct/array_min
        # expression, so plans and results are bit-identical.
        sub = f"slice({_qid(vec_col)}, {s * d_sub + 1}, {d_sub})"
        l2 = (
            "aggregate(zip_with(" + sub + ", {arr}, "
            "(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
            "0.0D, (acc, x) -> acc + x)"
        )
        entries = (
            "array("
            + ",".join(
                "named_struct('d', "
                + l2.format(arr=_sql_arr(cw))
                + f", 'lab', {int(lab)})"
                for lab, cw in codebook_s
            )
            + ")"
        )
        return F.expr(f"array_min({entries})")["lab"]
    v = vec_col
    sub = F.slice(v, s * d_sub + 1, d_sub)
    entries = F.array(
        *[
            F.struct(_l2sq_lit(sub, cw).alias("d"), F.lit(lab).alias("lab"))
            for lab, cw in codebook_s
        ]
    )
    return F.array_min(entries)["lab"]


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    cents: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance (ADC) scoring --
    the memory-scale rung of the quantization family (SQ8 shrinks each
    component, PQ shrinks each vector to m code ids: 64 floats -> 4 bytes
    here). Encode: each corpus vector becomes m nearest-codeword ids
    (pure codegen'd projection against literal codebooks, no shuffle).
    Search: each query precomputes its distance lookup table (query x
    subspace x codeword -- k*m doubles, a broadcast-sized dimension at any
    corpus size), folded into a per-query map; the corpus-side scan is
    then one projection summing m map lookups per row. The per-subspace
    terms are 9dp-quantized to DECIMAL before the m-way sum so the total
    is associative/exact -- engine- and order-independent.

    Scale shape: codebook derivation is the distributed IVF quantizer; the
    scan is broadcast-join + projection + per-query top-k window. Recall
    vs brute force is pytest-gated; the declared query's oracle replicates
    encode + ADC bit-exactly."""
    cbs = pq_codebooks(corpus, label_col, vec_col, m, dim, cents=cents)
    d_sub = dim // m

    codes = corpus.select(
        F.col(id_col).alias("match_id"),
        *[
            pq_code_col(vec_col, cbs[s], s, d_sub).alias(f"_c{s}")
            for s in range(m)
        ],
    )

    # Per-query LUT rows: d(query, s, code) = L2^2(query_sub_s, codeword),
    # 9dp-rounded. Folded to ONE map per query so the corpus scan stays a
    # projection (no Generate on the big side, no per-subspace join).
    cb_rows = [
        (s, lab, [float(x) for x in cw])
        for s in range(m)
        for lab, cw in cbs[s]
    ]
    # the LUT map key packs (subspace, label) as s*1000 + lab; labels
    # >= 1000 would silently collide across subspaces and corrupt ADC sums
    assert all(0 <= lab < 1000 for _, lab, _ in cb_rows), (
        "pq_topk LUT key packing requires codebook labels in [0, 1000)"
    )
    cb_df = corpus.sparkSession.createDataFrame(
        cb_rows, "s int, lab int, cw array<double>"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    lut_entries = (
        q.join(F.broadcast(cb_df))
        .select(
            "query_id",
            (F.col("s") * 1000 + F.col("lab")).alias("_key"),
            F.round(
                _l2sq_fold_col(
                    F.slice(F.col("_qv"), F.col("s") * d_sub + 1, d_sub),
                    F.col("cw"),
                ),
                9,
            ).alias("_d"),
        )
        .groupBy("query_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_key"), F.col("_d")))
            ).alias("_lut")
        )
    )

    dist = None
    for s in range(m):
        term = F.element_at(
            F.col("_lut"), F.col(f"_c{s}") + F.lit(s * 1000)
        ).cast("decimal(28,9)")
        dist = term if dist is None else dist + term
    scored = (
        codes.crossJoin(F.broadcast(lut_entries))
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn("_dist", dist)
    )
    w = W.partitionBy("query_id").orderBy(F.asc("_dist"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "match_id",
            "rank",
            F.round(F.col("_dist").cast("double"), 6).alias("adc_dist"),
        )
    )


def _l2sq_fold_col(sub: Column, cw: Column) -> Column:
    """_l2sq_lit for a COLUMN codeword (LUT build side): same sequential
    fold, same IEEE op sequence."""
    diffs = F.zip_with(
        sub,
        cw,
        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def random_project(
    df: DataFrame,
    out_dim: int,
    dim: int = 64,
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: d -> out_dim via a
    deterministic dense matrix of uniform [-1, 1] entries (the
    Achlioptas database-friendly family; any zero-mean sub-Gaussian
    entry distribution carries the JL distance-preservation bound).
    Rows are the SAME md5-derived plane grid hyperplane-LSH uses
    (_plane_weights), so an oracle replays the exact matrix in SQL --
    hyperplane LSH is precisely this projection with a sign threshold
    instead of the raw coordinate.

    The conventional 1/sqrt(out_dim) scaling is omitted: it cancels in
    cosine/angle comparisons (the engine's similarity currency), and
    omitting it keeps the coordinates identical to the LSH dot folds.

    100 TB posture: the matrix is out_dim x dim literals baked into one
    codegen'd projection -- per row out_dim sequential folds, no shuffle,
    no Python; 64->16 cuts downstream vector bytes 4x BEFORE any
    quantization, composing with SQ8/PQ the way an OPQ rotation does.
    Output coordinates are float64 (they feed cosine folds directly).
    """
    # the whole projected vector as ONE parsed expression (pq_code_col
    # note: per-plane HOF lambda creation dominated construction)
    proj = F.expr(
        "array("
        + ",".join(
            _sql_dot_fold(_qid(vec_col), plane)
            for plane in _plane_weights(out_dim, dim)
        )
        + ")"
    )
    tgt = out_col or vec_col
    keep = [c for c in df.columns if c != tgt]
    return df.select(*keep, proj.alias(tgt))
