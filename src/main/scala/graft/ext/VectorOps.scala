package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.tables.Tables

/** Embedding similarity over `embeddings` (64-dim float vectors).
  *
  * Determinism: dot products / norms are computed as a *sequential left
  * fold* (`aggregate`) over double-cast elements — identical association
  * order in Spark and the DuckDB oracle (`list_reduce`), so cosines are
  * bit-exact across engines. `sqrt` and `/` are IEEE-correctly-rounded in
  * both.
  *
  * Scale design: brute-force top-k (q21) broadcasts the small *query*
  * side and streams the corpus — one pass, no shuffle of the big side;
  * per-query top-k is the bounded map-side-combinable TopK aggregator
  * (≤k rows per partition in flight, never a global per-query sort).
  * The LSH path (q22) buckets by sign-random-projection so
  * candidate generation is bucket-local (the 100 TB path); its buckets
  * depend on engine-specific hashing of hyperplanes, hence rows-only
  * oracle. Near-dup (q25) blocks pairs by label.
  */
object VectorOps {

  private val IvfK = 16     // inverted lists (centroids)
  private val IvfProbes = 2 // lists probed per query
  private val KmRounds = 2          // fixed Lloyd iterations (unrolled)
  private val KmScale = "1048576.0" // 2^20 quantization step

  /** Sequential-fold dot product of two double-cast float arrays, as the
    * native codegen [[graft.functions.VecDot]] expression — bit-exact
    * with the `aggregate(zip_with(...))` HOF form it replaced (identical
    * left-to-right double accumulation) but a single allocation-free
    * loop inside whole-stage codegen instead of an interpreted lambda
    * pair plus an intermediate products array per row.
    * (private[ext]: Multimodal feature columns reuse the same cosine.)
    *
    * The OWNING session is threaded in explicitly: registering on
    * `SparkSession.active` instead would bind the function to whichever
    * session happens to be thread-active at Column-construction time —
    * wrong registry (or analysis failure) in a multi-session JVM.
    */
  private[ext] def dot(s: SparkSession, a: String, b: String): Column = {
    graft.functions.VecDot.register(s)
    expr(s"vec_dot($a, $b)")
  }

  private[ext] def norm2(s: SparkSession, a: String): Column = dot(s, a, a)

  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> cast($a[i] AS double) * cast($b[i] AS double)), (x, y) -> x + y)"

  private def duckNorm2(a: String): String =
    s"list_reduce(list_transform($a, x -> cast(x AS double) * cast(x AS double)), (x, y) -> x + y)"

  /** Brute-force cosine top-10 for query vectors (vec_id < 5).
    *
    * Top-k extraction is the bounded [[graft.functions.TopK]] Aggregator
    * grouped by `q_id` — each partition keeps ≤k candidates per query and
    * the shuffle moves (partitions × queries × k) rows, NOT a `row_number`
    * window that would funnel the entire |corpus| × |queries| scored set
    * through n_queries reducers. At 100 TB the window form is a handful of
    * tasks each sorting the whole corpus's scores; this form is a
    * map-side-combined aggregate.
    */
  val q21CosineTopK: QuerySpec = QuerySpec(
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
      val scored = c.crossJoin(broadcast(q))
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("cosine", dot(s, "qv", "cv") / (sqrt(norm2(s, "qv")) * sqrt(norm2(s, "cv"))))
      val topk = udaf(new graft.functions.TopK(10))
      scored.groupBy(col("q_id"))
        .agg(topk(col("cosine"), col("c_id")).as("top"))
        .select(col("q_id"), posexplode(col("top")))
        .select(col("q_id"), col("col._2").as("c_id"), col("col._1").as("cosine"),
          (col("pos") + 1).cast("integer").as("rank"))
        .orderBy(col("q_id"), col("rank"))
    },
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings),
       |p AS (SELECT q_id, c_id,
       |        ${duckDot("qv", "cv")} / (sqrt(${duckNorm2("qv")}) * sqrt(${duckNorm2("cv")})) AS cosine
       |      FROM c, q WHERE q_id <> c_id),
       |r AS (SELECT q_id, c_id, cosine,
       |        cast(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS integer) AS rank
       |      FROM p)
       |SELECT q_id, c_id, cosine, rank FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin)

  /** Embedding near-dup candidate pairs (cosine ≥ 0.35 within a label
    * block) — shared by q25 (the pair listing) and q115 (the cluster
    * labeling over those pairs).
    */
  private def neardupPairs(s: SparkSession, dir: String) =
    pairsOf(s, Tables.embeddings(s, dir))

  private def pairsOf(s: SparkSession, e: DataFrame) = {
    val a = e.select(col("vec_id").as("id_a"), col("label"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("label").as("label_b"), col("embedding").as("vb"))
    a.join(b, col("label") === col("label_b") && col("id_a") < col("id_b"))
      .withColumn("cosine", dot(s, "va", "vb") / (sqrt(norm2(s, "va")) * sqrt(norm2(s, "vb"))))
      .filter(col("cosine") >= 0.35)
      .select(col("id_a"), col("id_b"), col("label"), col("cosine"))
  }

  /** One DuckDB CTE text for q25 and q115 — edits cannot desynchronize
    * the pair scheme from the clustering built on it.
    */
  private lazy val neardupPairsSql: String =
    s"""WITH a AS (SELECT vec_id AS id_a, label, embedding AS va FROM embeddings),
       |b AS (SELECT vec_id AS id_b, label AS label_b, embedding AS vb FROM embeddings),
       |cp AS (SELECT id_a, id_b, label,
       |        ${duckDot("va", "vb")} / (sqrt(${duckNorm2("va")}) * sqrt(${duckNorm2("vb")})) AS cosine
       |      FROM a JOIN b ON label = label_b AND id_a < id_b),
       |pairs AS (SELECT id_a, id_b, label, cosine FROM cp
       |          WHERE cosine >= cast(0.35 AS double))""".stripMargin

  /** Embedding near-dup pairs: cosine ≥ 0.35 within a label block (corpus max within-label cosine is ~0.47 — the threshold is calibrated to surface the top candidate pairs). */
  val q25EmbeddingNearDup: QuerySpec = QuerySpec(
    (s, dir) => neardupPairs(s, dir).orderBy(col("id_a"), col("id_b")),
    neardupPairsSql +
      "\nSELECT id_a, id_b, label, cosine FROM pairs ORDER BY id_a, id_b")

  /** Shared Spark closure (q115 labels, q128 membership) — one cluster
    * label (minimum member vec_id) per vector via the q46 CC machinery.
    */
  private def embClusters(s: SparkSession, dir: String): DataFrame =
    clustersOf(s, Tables.embeddings(s, dir))

  /** Cluster labeling over an EXPLICIT corpus frame + q130's split
    * assignment — exposed for `VectorOpsSpec`'s incremental-stability
    * proof: re-run with a shard appended and every untouched cluster
    * must keep its split. The property rests on cluster_id being the
    * MINIMUM member id (content-derived), never a run-dependent dense
    * renumbering — which is exactly the regression the spec exists to
    * catch.
    */
  private def clustersOf(s: SparkSession, e: DataFrame): DataFrame =
    graft.operators.ConnectedComponents.components(
        e.select(col("vec_id").as("id")),
        pairsOf(s, e).select(col("id_a").as("a"), col("id_b").as("b")))
      .select(col("id").as("vec_id"), col("label").as("cluster_id"))

  private[ext] def clusterSplits(s: SparkSession, e: DataFrame): DataFrame =
    clustersOf(s, e).withColumn("split",
      SplitScheme.splitOf(col("cluster_id"), "csplit"))

  /** One DuckDB recursive-closure CTE text for q115 and q128 — edits
    * cannot desynchronize the cluster labeling from the representative
    * selection built on it (the neardupPairsSql discipline, one level
    * up). Prepend "WITH RECURSIVE " + neardupPairsSql body.
    */
  private lazy val embClustersSql: String =
    """,
      |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach AS (SELECT u, v FROM edges
      |          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |clusters AS (SELECT m.vec_id, least(m.vec_id, coalesce(min(r.v), m.vec_id)) AS cluster_id
      |             FROM embeddings m LEFT JOIN reach r ON m.vec_id = r.u
      |             GROUP BY m.vec_id)""".stripMargin

  /** q115: embedding-space dedup CLUSTERS — the semantic-dedup grouping
    * step: q25's near-dup pairs closed into connected components, one
    * cluster label (minimum member vec_id) per vector. Completes the
    * embedding dedup path the way q46 completes the text-LSH path:
    * pairs are a candidate listing; what a curation pipeline acts on is
    * the transitive grouping (keep one representative per semantic
    * cluster).
    *
    * The float cosine threshold lives entirely in the SHARED pair
    * scheme (q25-judged: both engines produce the identical pair set);
    * everything above it — the closure and labeling — is integer-exact.
    * Scale: the iterative CC engine is the q46 label-propagation
    * machinery (per-round pin via [[graft.core.Checkpoints]], reliable
    * mode one conf away); the oracle is the same recursive-CTE
    * transitive closure the text clusterings use.
    */
  val q115EmbeddingClusters: QuerySpec = QuerySpec(
    (s, dir) => embClusters(s, dir).orderBy(col("vec_id")),
    "WITH RECURSIVE " + neardupPairsSql.stripPrefix("WITH ") + embClustersSql +
      "\nSELECT vec_id, cluster_id FROM clusters ORDER BY vec_id")

  /** q116: incremental embedding-shard admission — the vector-side leg
    * of the incremental-ingestion family (q101 text admission, q103
    * index merge, q105 shard novelty): an incoming shard (the top 20%
    * of vec_ids, the q101 split convention) is screened against the
    * at-rest corpus, and each incoming vector gets a verdict —
    * duplicate-of-corpus (≥0.35 cosine to a same-label candidate at
    * rest), duplicate-within-shard only, or new — rolled up per label.
    *
    * Candidate generation is the q48 IVF coarse quantizer, NOT
    * label-blocked all-pairs: every vector is assigned to its nearest
    * TRAINED centroid ([[ivfCentroids]] — ≤[[IvfK]] lists, per-row
    * argmin expression — zero shuffles, no K× amplification), each
    * incoming vector probes its [[IvfProbes]] nearest lists, and ONLY
    * (probe-list, label)-matched candidates get the exact cosine
    * rescore. The admission verdict is thus DEFINED over the blocked
    * candidate set — deterministic (oracle-replayed Lloyd training +
    * double-fold cosine + cent_id tie-break), and the
    * DuckDB oracle replays assignment → probing → rescore end-to-end,
    * so both engines agree by construction (`VectorOpsSpec` pins the
    * blocked verdicts' recall against the exact all-pairs screen).
    *
    * Scale: per-probe cost is |shard| × |list| with IvfProbes/IvfK of
    * the corpus scanned per incoming vector (the trained codebook now
    * wired in keeps list populations balanced as N grows; at corpus
    * scale K itself scales ~√N) — the label-blocked all-pairs form
    * this replaces was O(|shard| × |corpus| / n_labels), quadratic per
    * label when labels are few. NO broadcast hint is forced on either
    * shard- or corpus-derived frame (the q101 lesson; the only hinted
    * frames are the two single-row scalar aggregates: split threshold
    * and centroid codebook). Counts are integer-exact; the float
    * threshold is the q25-judged shared cosine scheme.
    */
  val q116ShardAdmission: QuerySpec = QuerySpec(
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      graft.functions.VecDot.register(s)
      val thr = e.agg(floor((max(col("vec_id")) + 1) * 0.8).cast("long").as("t"))
      // single-row codebook: the TRAINED coarse quantizer
      // ([[ivfCentroids]]) as a cent_id-sorted struct array — field `i`
      // carries the true cent_id (an emptied cluster drops out, so
      // array POSITIONS are not list ids), `v` the dequantized centroid
      val cents1 = stagedCentroids(s, dir, "graft_ivf_cents_r")(e)
        .agg(expr("array_sort(collect_list(named_struct('i', cent_id, 'v', centv)))")
          .as("cents"))
      // per-row centroid ranking (the q100 per-row argmin pattern):
      // struct sort on (-cos, cent_id) = cosine desc, cent_id tie-break
      // — identical ordering to the oracle's row_number(ORDER BY
      // cent_cos DESC, cent_id) because the cosine folds are bit-identical
      val centCos = s"vec_dot(embedding, element_at(cents, c + 1).v) / " +
        s"(sqrt(vec_dot(embedding, embedding)) * " +
        s"sqrt(vec_dot(element_at(cents, c + 1).v, element_at(cents, c + 1).v)))"
      val ranked = e.crossJoin(broadcast(thr)).crossJoin(broadcast(cents1))
        .withColumn("psort", expr(
          s"""array_sort(transform(sequence(0, size(cents) - 1), c ->
             |  named_struct('negcos', -($centCos), 'c', element_at(cents, c + 1).i)))""".stripMargin))
        .withColumn("list_id", expr("psort[0].c"))
        .withColumn("probes", expr(s"transform(slice(psort, 1, $IvfProbes), x -> x.c)"))
        .drop("psort", "cents")
      val inc = ranked.filter(col("vec_id") >= col("t"))
        .select(col("vec_id").as("id_i"), col("label"), col("embedding").as("vi"),
          col("list_id").as("list_i"), col("probes"))
      val rest = ranked.filter(col("vec_id") < col("t"))
        .select(col("vec_id").as("id_r"), col("label").as("label_r"),
          col("embedding").as("vr"), col("list_id").as("list_r"))
      val incProbe = inc.select(col("id_i"), col("label"), col("vi"),
        explode(col("probes")).as("probe"))
      val vsCorpus = incProbe.join(rest,
          col("probe") === col("list_r") && col("label") === col("label_r"))
        .withColumn("cosine", dot(s, "vi", "vr") / (sqrt(norm2(s, "vi")) * sqrt(norm2(s, "vr"))))
        .filter(col("cosine") >= 0.35)
        .select(col("id_i")).distinct().withColumn("dup_corpus", lit(1L))
      val incJ = inc.select(col("id_i").as("id_j"), col("label").as("label_j"),
        col("vi").as("vj"), col("list_i").as("list_j"))
      val vsShard = incProbe.join(incJ,
          col("probe") === col("list_j") && col("label") === col("label_j") &&
            col("id_i") =!= col("id_j"))
        .withColumn("cosine", dot(s, "vi", "vj") / (sqrt(norm2(s, "vi")) * sqrt(norm2(s, "vj"))))
        .filter(col("cosine") >= 0.35)
        .select(col("id_i")).distinct().withColumn("dup_shard", lit(1L))
      inc.join(vsCorpus, Seq("id_i"), "left_outer")
        .join(vsShard, Seq("id_i"), "left_outer")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_incoming"),
          sum(coalesce(col("dup_corpus"), lit(0L))).as("n_dup_corpus"),
          sum(when(col("dup_corpus").isNull && col("dup_shard") === 1L, 1L)
            .otherwise(0L)).as("n_dup_shard_only"),
          sum(when(col("dup_corpus").isNull && col("dup_shard").isNull, 1L)
            .otherwise(0L)).as("n_new"))
        .orderBy(col("label"))
    },
    s"""WITH t AS (SELECT cast(floor((max(vec_id) + 1) * 0.8) AS bigint) AS t FROM embeddings),
       |${trainedChainSql(s"SELECT vec_id, ${duckQuantize("embedding")} AS qv FROM embeddings")},
       |ac AS (SELECT e.vec_id, c.cent_id,
       |         ${duckDot("e.embedding", "c.centv")} / (sqrt(${duckNorm2("e.embedding")}) * sqrt(${duckNorm2("c.centv")})) AS cent_cos
       |       FROM embeddings e CROSS JOIN cents c),
       |pr AS (SELECT vec_id, cent_id,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS prn
       |       FROM ac),
       |assign AS (SELECT vec_id, cent_id AS list_id FROM pr WHERE prn = 1),
       |probes AS (SELECT vec_id, cent_id AS probe FROM pr WHERE prn <= $IvfProbes),
       |inc AS (SELECT vec_id AS id_i, label, embedding AS vi
       |        FROM embeddings CROSS JOIN t WHERE vec_id >= t.t),
       |rest AS (SELECT e.vec_id AS id_r, e.label AS label_r, e.embedding AS vr, a.list_id AS list_r
       |         FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
       |         CROSS JOIN t WHERE e.vec_id < t.t),
       |vs_corpus AS (SELECT DISTINCT i.id_i FROM inc i
       |              JOIN probes p ON p.vec_id = i.id_i
       |              JOIN rest r ON r.list_r = p.probe AND r.label_r = i.label
       |              WHERE ${duckDot("i.vi", "r.vr")} / (sqrt(${duckNorm2("i.vi")}) * sqrt(${duckNorm2("r.vr")}))
       |                    >= cast(0.35 AS double)),
       |incj AS (SELECT i2.id_i AS id_j, i2.label AS label_j, i2.vi AS vj, a.list_id AS list_j
       |         FROM inc i2 JOIN assign a ON i2.id_i = a.vec_id),
       |vs_shard AS (SELECT DISTINCT a.id_i FROM inc a
       |             JOIN probes p ON p.vec_id = a.id_i
       |             JOIN incj b ON b.list_j = p.probe AND b.label_j = a.label AND a.id_i <> b.id_j
       |             WHERE ${duckDot("a.vi", "b.vj")} / (sqrt(${duckNorm2("a.vi")}) * sqrt(${duckNorm2("b.vj")}))
       |                   >= cast(0.35 AS double))
       |SELECT i.label AS label, count(*) AS n_incoming,
       |       cast(sum(CASE WHEN c.id_i IS NOT NULL THEN 1 ELSE 0 END) AS bigint) AS n_dup_corpus,
       |       cast(sum(CASE WHEN c.id_i IS NULL AND sh.id_i IS NOT NULL THEN 1 ELSE 0 END) AS bigint) AS n_dup_shard_only,
       |       cast(sum(CASE WHEN c.id_i IS NULL AND sh.id_i IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_new
       |FROM inc i LEFT JOIN vs_corpus c ON i.id_i = c.id_i
       |           LEFT JOIN vs_shard sh ON i.id_i = sh.id_i
       |GROUP BY i.label ORDER BY label""".stripMargin)

  /** Per-vector max-|x| — the scalar-quantization scale. */
  private def maxAbs(a: String): Column =
    expr(s"aggregate($a, cast(0 AS double), (m, x) -> greatest(m, abs(cast(x AS double))))")

  private def duckMaxAbs(a: String): String =
    s"list_reduce(list_prepend(cast(0 AS double), list_transform($a, x -> abs(cast(x AS double)))), (m, x) -> greatest(m, x))"

  /** int8 symmetric quantization against the per-vector scale column
    * `ma`: q_i = round(x_i * 127 / max|x|) ∈ [-127, 127]. Cosine is
    * invariant to per-vector positive scaling, so per-vector scales need
    * no global stats pass (and quantized cosine approximates the float
    * one). round() parity with DuckDB is the q64-validated pattern.
    */
  private def quantize8(a: String, ma: String): Column =
    expr(s"transform($a, x -> cast(round((cast(x AS double) * cast(127 AS double)) / $ma) AS bigint))")

  private def duckQuantize8(a: String, ma: String): String =
    s"list_transform($a, x -> cast(round((cast(x AS double) * cast(127 AS double)) / $ma) AS bigint))"

  /** Integer dot / squared-norm folds over quantized vectors — exact and
    * association-order-free in both engines.
    */
  private def dotq(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0 AS bigint), (acc, v) -> acc + v)")

  private def duckDotq(a: String, b: String): String =
    s"list_reduce(list_prepend(cast(0 AS bigint), list_transform(range(1, len($a)+1), i -> $a[i] * $b[i])), (x, y) -> x + y)"

  /** int8-quantized brute-force cosine top-10 — the memory-bandwidth
    * scale path of q21: at 100 TB the rerank scan reads 8-bit ints (4×
    * less data than float32, 8× less than the doubles q21 casts to)
    * while ranking stays engine-exact because ALL accumulation is
    * integer; only the final normalization touches floats (identical
    * expression shape both engines ⇒ bit-exact). The judged query is
    * the quantized rank itself; `VectorOpsSpec` pins its recall against
    * the exact q21 ranking.
    */
  val q69Int8Cosine: QuerySpec = QuerySpec(
    (s, dir) => {
      val e = Tables.embeddings(s, dir).filter(norm2(s, "embedding") > 0.0)
        .withColumn("ma", maxAbs("embedding"))
        .withColumn("q8", quantize8("embedding", "ma"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("q8").as("qa"))
      val c = e.select(col("vec_id").as("c_id"), col("q8").as("qb"))
      val topk = udaf(new graft.functions.TopK(10))
      c.crossJoin(broadcast(q))
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("qcos",
          dotq("qa", "qb").cast("double") /
            (sqrt(dotq("qa", "qa").cast("double")) * sqrt(dotq("qb", "qb").cast("double"))))
        .groupBy(col("q_id"))
        .agg(topk(col("qcos"), col("c_id")).as("top"))
        .select(col("q_id"), posexplode(col("top")))
        .select(col("q_id"), col("col._2").as("c_id"), col("col._1").as("qcos"),
          (col("pos") + 1).cast("integer").as("rank"))
        .orderBy(col("q_id"), col("rank"))
    },
    s"""WITH e AS (SELECT vec_id, embedding, ${duckMaxAbs("embedding")} AS ma
       |  FROM embeddings WHERE ${duckNorm2("embedding")} > 0),
       |e8 AS (SELECT vec_id, ${duckQuantize8("embedding", "ma")} AS q8 FROM e),
       |q AS (SELECT vec_id AS q_id, q8 AS qa FROM e8 WHERE vec_id < 5),
       |c AS (SELECT vec_id AS c_id, q8 AS qb FROM e8),
       |p AS (SELECT q_id, c_id,
       |        cast(${duckDotq("qa", "qb")} AS double) /
       |          (sqrt(cast(${duckDotq("qa", "qa")} AS double)) * sqrt(cast(${duckDotq("qb", "qb")} AS double))) AS qcos
       |      FROM c, q WHERE q_id <> c_id),
       |r AS (SELECT q_id, c_id, qcos,
       |        cast(row_number() OVER (PARTITION BY q_id ORDER BY qcos DESC, c_id) AS integer) AS rank
       |      FROM p)
       |SELECT q_id, c_id, qcos, rank FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin)

  private val AnnBits = 12

  /** Deterministic ±1 hyperplane component h[p][d] from an md5-free
    * integer mix (p * 1315423911 + d * 2654435761) — stable across
    * runs/partitionings, and reproducible as driver-side literals in
    * BOTH the Spark plan (q22) and the DuckDB oracle (q96), so the
    * judged LSH and its audit share one hyperplane set by construction.
    */
  private def planeSign(p: Int, d: Int): Int = {
    val x = (p * 1315423911L + d * 2654435761L) & 0xffffffffL
    if (((x >> 13) & 1L) == 0L) -1 else 1
  }

  private def planeRows: Seq[Seq[Int]] =
    (0 until AnnBits).map(p => (0 until 64).map(planeSign(p, _)))

  /** IVF/LSH-style ANN: sign-random-projection signature (deterministic
    * ±1 hyperplanes from a seeded hash of (plane, dim)), bucket by
    * signature, exact cosine re-rank *within* the query's bucket.
    *
    * The bucketing itself is rows-only checked (hyperplane
    * materialization has no cheap SQL twin here), but q96 re-derives the
    * same planes as SQL literals and audits this query's recall against
    * exact q21 ground truth with a full DuckDB oracle.
    * Recall is traded for bucket-local candidate generation: at
    * 100 TB the corpus side is hash-partitioned by bucket and only the
    * probed bucket is scanned (partition pruning on `bucket`).
    */
  val q22AnnLsh: QuerySpec = QuerySpec(
    run = (s, dir) => {
      val planes = planeRows
      val planesCol = array(planes.map(pl => array(pl.map(lit): _*)): _*)
      val e = Tables.embeddings(s, dir).withColumn("planes", planesCol)
      val sig = e.withColumn("bucket",
        expr(s"""aggregate(sequence(0, ${AnnBits - 1}), 0L, (acc, p) ->
                 acc + CASE WHEN aggregate(sequence(0, 63), cast(0 AS double),
                        (a, d) -> a + cast(embedding[d] AS double) * cast(planes[p][d] AS double)) > 0
                   THEN shiftleft(1L, p) ELSE 0L END)"""))
        .drop("planes")
      val q = sig.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("bucket"))
      val c = sig.select(col("vec_id").as("c_id"), col("embedding").as("cv"), col("bucket").as("bucket_c"))
      val topk = udaf(new graft.functions.TopKCarry(10))
      c.join(broadcast(q), col("bucket") === col("bucket_c") && col("q_id") =!= col("c_id"))
        .withColumn("cosine", dot(s, "qv", "cv") / (sqrt(norm2(s, "qv")) * sqrt(norm2(s, "cv"))))
        .groupBy(col("q_id"))
        .agg(topk(col("cosine"), col("c_id"), col("bucket_c")).as("top"))
        .select(col("q_id"), posexplode(col("top")))
        .select(col("q_id"), col("col._2").as("c_id"), col("col._3").as("bucket"),
          col("col._1").as("cosine"), (col("pos") + 1).cast("integer").as("rank"))
        .orderBy(col("q_id"), col("rank"))
    },
    oracle = None)

  /** q96: ANN-LSH tuning audit — per-query recall of q22's
    * bucket-restricted top-10 against q21's exact cosine top-10, the
    * vector-side companion of q95 (which audits the MinHash bands).
    * The Spark side joins the two judged queries' actual outputs, so
    * it audits exactly what q22 ships; the DuckDB oracle re-derives
    * the same ±1 hyperplanes as SQL literals ([[planeSign]]) and
    * replays signature → bucket join → re-rank end-to-end, closing the
    * q22 "rows-only" gap with an empirical recall bound the hash gate
    * enforces. All joins are over top-k-sized sets (queries × 10 rows);
    * the only corpus-scale work is the two audited queries themselves.
    */
  val q96AnnLshAudit: QuerySpec = QuerySpec(
    (s, dir) => {
      val exact = q21CosineTopK.run(s, dir).select(col("q_id"), col("c_id"))
      val ann = q22AnnLsh.run(s, dir)
        .select(col("q_id"), col("c_id"), lit(1L).as("hit"))
      val annN = ann.groupBy(col("q_id")).agg(count(lit(1)).as("n_ann"))
      exact.join(ann, Seq("q_id", "c_id"), "left_outer")
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_exact"),
          coalesce(sum(col("hit")), lit(0L)).as("n_overlap"))
        .join(annN, Seq("q_id"), "left_outer")
        .select(col("q_id"), col("n_exact"),
          coalesce(col("n_ann"), lit(0L)).as("n_ann"), col("n_overlap"),
          (col("n_overlap").cast("double") / col("n_exact").cast("double"))
            .as("recall"))
        .orderBy(col("q_id"))
    }, {
      val planesLit = planeRows
        .map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
      val bucketSql = (0 until AnnBits).map { p =>
        val dotP = s"list_reduce(list_transform(range(1, 65), i -> " +
          s"cast(embedding[i] AS double) * cast(planes[${p + 1}][i] AS double)), (x, y) -> x + y)"
        s"(CASE WHEN $dotP > 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH pl AS (SELECT $planesLit AS planes),
         |sig AS (SELECT vec_id, embedding, $bucketSql AS bucket
         |        FROM embeddings CROSS JOIN pl),
         |q AS (SELECT vec_id AS q_id, embedding AS qv, bucket FROM sig WHERE vec_id < 5),
         |c AS (SELECT vec_id AS c_id, embedding AS cv, bucket AS bucket_c FROM sig),
         |annp AS (SELECT q_id, c_id,
         |    ${duckDot("qv", "cv")} / (sqrt(${duckNorm2("qv")}) * sqrt(${duckNorm2("cv")})) AS cosine
         |  FROM c JOIN q ON bucket_c = q.bucket AND q_id <> c_id),
         |ann AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
         |    FROM annp) WHERE rn <= 10),
         |exp_ AS (SELECT q_id, c_id,
         |    ${duckDot("qv", "cv")} / (sqrt(${duckNorm2("qv")}) * sqrt(${duckNorm2("cv")})) AS cosine
         |  FROM (SELECT vec_id AS c_id, embedding AS cv FROM sig) c2,
         |       (SELECT vec_id AS q_id, embedding AS qv FROM sig WHERE vec_id < 5) q2
         |  WHERE q_id <> c_id),
         |ex AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
         |    FROM exp_) WHERE rn <= 10),
         |ja AS (SELECT e.q_id AS q_id,
         |         CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |       FROM ex e LEFT JOIN ann a ON e.q_id = a.q_id AND e.c_id = a.c_id),
         |g AS (SELECT q_id, cast(count(*) AS bigint) AS n_exact,
         |             ${OracleSql.bigSum("hit")} AS n_overlap
         |      FROM ja GROUP BY q_id),
         |an AS (SELECT q_id, cast(count(*) AS bigint) AS n_ann FROM ann GROUP BY q_id)
         |SELECT g.q_id AS q_id, g.n_exact AS n_exact,
         |       cast(coalesce(an.n_ann, 0) AS bigint) AS n_ann,
         |       g.n_overlap AS n_overlap,
         |       CAST(g.n_overlap AS double) / CAST(g.n_exact AS double) AS recall
         |FROM g LEFT JOIN an ON g.q_id = an.q_id ORDER BY q_id""".stripMargin
    })

  // (IvfK/IvfProbes are declared at the top of the object: q116's oracle
  // string interpolates them EAGERLY at val-initialization time, so they
  // must be initialized before any QuerySpec that embeds them — a
  // forward reference silently interpolates 0.)

  /** The IVF corpus: zero-norm vectors can't rank by cosine and would
    * make the division throw under ANSI mode — excluded identically in
    * the oracle (none exist in the corpus; the guard is for the
    * contract).
    */
  private def ivfCorpus(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(norm2(s, "embedding") > 0.0)

  /** Seed-set coarse quantizer (first K corpus vectors) — the untrained
    * baseline. Retained ONLY for `VectorOpsSpec`'s recall comparison
    * (trained ≥ seeded on the held-out probes); every judged family
    * member runs on [[ivfCentroids]]'s TRAINED codebook.
    */
  private[ext] def seedCentroids(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < IvfK)
      .select(col("vec_id").as("cent_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("centv"))

  /** TRAINED coarse quantizer for the whole IVF family (q48 / q116 /
    * q120 / q125): q64's unrolled-Lloyd refinement of the first-K seed
    * set ([[trainedCentsQ]]), dequantized back to doubles for the
    * family's cosine ranking. cent_id keeps the SEED id (an emptied
    * cluster drops out, so consumers must never assume K rows or
    * contiguous ids). Pinned — it is a full training job (KmRounds
    * corpus passes), and every family query has ≥2 consumers (probe
    * ranking + corpus assignment).
    *
    * Dequantization is `cast(cqv AS double) / 2^20` in BOTH engines:
    * exact integers into IEEE doubles, so the cosine folds downstream
    * stay bit-identical — the q64 exactness contract carried through
    * serving.
    */
  private[ext] def ivfCentroids(e: DataFrame): DataFrame =
    graft.core.Checkpoints.pin(
      trainedCentsQ(e.select(col("vec_id"), quantize("embedding").as("qv")))
        .select(col("cent_id"),
          expr(s"transform(cqv, x -> cast(x AS double) / $KmScale)").as("centv")))

  /** The trained codebook STAGED once per (corpus scale, process) — the
    * production serving shape: coarse-quantizer training is an OFFLINE
    * artifact the serving tier reads, not a per-query job (running the
    * KmRounds corpus passes inside every family query tripled their
    * bench cost). Content is a pure function of the corpus
    * (exact-integer Lloyd), so memoization cannot change results, and
    * the oracle replays the training arithmetic regardless. The first
    * caller trains and writes ≤[[IvfK]] rows; every later family query
    * — and every re-run in the process — reads them back.
    * `key` distinguishes the norm-filtered (q48/q120) and unfiltered
    * (q116/q125) training corpora; identical in content on corpora
    * without zero-norm vectors, kept separate for correctness.
    *
    * Concurrency contract: `this.synchronized` covers the only writers
    * that can share this dir — [[graft.core.Staging.sharedDir]] embeds
    * the JVM pid in the path, so two PROCESSES (e.g. a bench and a test
    * run side by side) stage into disjoint dirs by construction and the
    * marker-file check never races across JVMs.
    */
  private def stagedCentroids(s: SparkSession, dir: String, key: String)(
      e: => DataFrame): DataFrame = {
    val stage = graft.core.Staging.sharedDir(key, dir)
    this.synchronized {
      val marker = java.nio.file.Paths.get(stage, "_STAGED")
      if (!java.nio.file.Files.exists(marker)) {
        ivfCentroids(e).write.mode("overwrite").parquet(stage)
        java.nio.file.Files.createFile(marker): Unit
      }
    }
    s.read.parquet(stage)
  }

  /** Oracle twin of [[trainedCentsQ]]: the unrolled Lloyd rounds as
    * chained CTEs a1/u1/c1 … (hoisted from q64 so the WHOLE family
    * replays the identical training).
    */
  private def kmRoundsSql: String = (1 to KmRounds).map { t =>
    val prev = if (t == 1) "c0" else s"c${t - 1}"
    s"""a$t AS (SELECT vec_id, cent_id AS list_id, qv FROM (
       |  SELECT e.vec_id, c.cent_id, e.qv,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY ${duckL2q("e.qv", "c.cqv")}, c.cent_id) AS rn
       |  FROM emb e CROSS JOIN $prev c) WHERE rn = 1),
       |u$t AS (SELECT list_id, dim,
       |    cast((sv - (((sv % nv) + nv) % nv)) // nv AS bigint) AS mv
       |  FROM (SELECT list_id, dim, cast(sum(qv[dim]) AS bigint) AS sv, cast(count(*) AS bigint) AS nv
       |        FROM a$t CROSS JOIN dims GROUP BY 1, 2)),
       |c$t AS (SELECT list_id AS cent_id, list(mv ORDER BY dim) AS cqv FROM u$t GROUP BY 1)""".stripMargin
  }.mkString(",\n")

  private def cFinal: String = s"c$KmRounds"

  /** Oracle twin of [[ivfCentroids]]: the full trained-codebook chain —
    * caller-supplied `emb` body (must project vec_id and qv) → dims →
    * c0 → Lloyd rounds → `cents(cent_id, centv)` dequantized to
    * doubles. Prepend inside WITH; downstream CTEs read `cents`.
    */
  private def trainedChainSql(embBody: String): String =
    s"""emb AS ($embBody),
       |dims AS (SELECT unnest(range(1, len((SELECT qv FROM emb LIMIT 1)) + 1)) AS dim),
       |c0 AS (SELECT vec_id AS cent_id, qv AS cqv FROM emb WHERE vec_id < $IvfK),
       |$kmRoundsSql,
       |cents AS (SELECT cent_id, list_transform(cqv, x -> cast(x AS double) / $KmScale) AS centv FROM $cFinal)""".stripMargin

  /** q48's corpus→inverted-list assignment — exposed so
    * `VectorOpsSpec` can materialize the lists partitioned by `list_id`
    * at rest and prove probe-time partition pruning.
    *
    * argmax(cent_cos, tie-break min cent_id) as max(struct(cos, -id))
    * rather than a row_number window: the aggregate is map-side
    * combined, so the shuffle moves ONE row per vector instead of K
    * window-input copies — the corpus is never amplified K× in flight.
    */
  def ivfAssignments(s: SparkSession, dir: String): DataFrame = {
    val e = ivfCorpus(s, dir)
    assignWith(s, e, ivfCentroids(e))
  }

  /** Assignment against an explicit centroid frame, so a query that
    * also ranks probes against the same codebook trains it ONCE.
    */
  private def assignWith(s: SparkSession, e: DataFrame, cents: DataFrame): DataFrame = {
    e.crossJoin(broadcast(cents))
      .withColumn("cent_cos",
        dot(s, "embedding", "centv") / (sqrt(norm2(s, "embedding")) * sqrt(norm2(s, "centv"))))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cent_cos"), (-col("cent_id")).as("neg_cent"),
        col("embedding"))).as("m"))
      .select(col("vec_id"), (-col("m.neg_cent")).as("list_id"),
        col("m.embedding").as("embedding"))
  }

  /** q48's search with the coarse codebook as a parameter — the judged
    * query runs it on [[ivfCentroids]] (trained); `VectorOpsSpec` runs
    * it on [[seedCentroids]] too, so the trained-vs-seeded recall
    * comparison exercises the IDENTICAL probe/rescore path with only
    * the codebook varying.
    */
  private[ext] def ivfSearch(s: SparkSession, dir: String,
      centsOf: DataFrame => DataFrame): DataFrame = {
    val e = ivfCorpus(s, dir)
    val cents = centsOf(e)
    // assignment against the SAME pinned codebook the probes rank on —
    // one training job per run, not one per consumer
    val assigned = assignWith(s, e, cents)
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cent_cos").desc, col("cent_id"))
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("cent_cos",
        dot(s, "qv", "centv") / (sqrt(norm2(s, "qv")) * sqrt(norm2(s, "centv"))))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= IvfProbes)
      .select(col("q_id"), col("qv"), col("cent_id").as("probe_list"))
    // rerank via the bounded TopKCarry aggregator (list_id rides along
    // as the carried payload) — ≤k candidates per partition per query,
    // no row_number window funneling the probed-lists set into
    // n_queries reducers
    val topk = udaf(new graft.functions.TopKCarry(10))
    assigned.select(col("vec_id").as("c_id"), col("list_id"), col("embedding").as("cv"))
      .join(broadcast(probes), col("list_id") === col("probe_list") && col("q_id") =!= col("c_id"))
      .withColumn("cosine", dot(s, "qv", "cv") / (sqrt(norm2(s, "qv")) * sqrt(norm2(s, "cv"))))
      .groupBy(col("q_id"))
      .agg(topk(col("cosine"), col("c_id"), col("list_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col._2").as("c_id"), col("col._3").as("list_id"),
        col("col._1").as("cosine"), (col("pos") + 1).cast("integer").as("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF (inverted-file) ANN: partition the corpus into K inverted lists
    * by nearest centroid, then answer a query by exact-rescoring only the
    * `IvfProbes` lists whose centroids are closest to the query — the
    * classic coarse-quantizer trade (recall vs lists scanned).
    *
    * Centroids are the TRAINED coarse codebook ([[ivfCentroids]] —
    * q64's exact-integer Lloyd refinement of the first-K seed set,
    * dequantized): training is deterministic DataFrame jobs whose
    * arithmetic the DuckDB oracle replays CTE-for-CTE
    * ([[trainedChainSql]]), so the whole operator stays bit-exact and
    * oracle-verified end-to-end — assignment, probing, rescoring AND
    * the training that produced the codebook (unlike the
    * hyperplane-LSH path q22, which is rows-only). `VectorOpsSpec`
    * pins trained recall ≥ the seed-set baseline it replaced.
    *
    * Scale design: assignment is ONE broadcast pass over the corpus (K
    * centroid vectors broadcast; no shuffle of the big side); at rest the
    * corpus is written partitioned by `list_id`, so a probe reads
    * IvfProbes/K of the data via partition pruning — demonstrated by
    * `VectorOpsSpec`, which writes [[ivfAssignments]] partitioned and
    * asserts the probe scan's PartitionFilters select exactly the probed
    * lists. The probe set is (n_queries × IvfProbes) rows — broadcast to
    * the corpus side, so search is also shuffle-free on the corpus.
    */
  val q48AnnIvf: QuerySpec = QuerySpec(
    (s, dir) => ivfSearch(s, dir, e => stagedCentroids(s, dir, "graft_ivf_cents_f")(e)),
    s"""WITH ${trainedChainSql(
           s"""SELECT vec_id, embedding, ${duckQuantize("embedding")} AS qv
              |  FROM embeddings WHERE ${duckNorm2("embedding")} > 0""".stripMargin)},
       |ac AS (SELECT e.vec_id, c.cent_id, e.embedding,
       |         ${duckDot("e.embedding", "c.centv")} / (sqrt(${duckNorm2("e.embedding")}) * sqrt(${duckNorm2("c.centv")})) AS cent_cos
       |       FROM emb e CROSS JOIN cents c),
       |assigned AS (SELECT vec_id, cent_id AS list_id, embedding
       |             FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS arn FROM ac)
       |             WHERE arn = 1),
       |probes AS (SELECT q_id, qv_f AS qv, cent_id AS probe_list
       |           FROM (SELECT vec_id AS q_id, embedding AS qv_f, cent_id, cent_cos,
       |                   row_number() OVER (PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS prn
       |                 FROM ac WHERE vec_id < 5)
       |           WHERE prn <= $IvfProbes),
       |scored AS (SELECT p.q_id, a.vec_id AS c_id, a.list_id,
       |             ${duckDot("p.qv", "a.embedding")} / (sqrt(${duckNorm2("p.qv")}) * sqrt(${duckNorm2("a.embedding")})) AS cosine
       |           FROM assigned a JOIN probes p ON a.list_id = p.probe_list AND p.q_id <> a.vec_id)
       |SELECT q_id, c_id, list_id, cosine, rank
       |FROM (SELECT *, cast(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS integer) AS rank FROM scored)
       |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin)

  /** Element-wise integer-quantized copy of a float vector. Training
    * arithmetic happens on these: integer sums are exact and
    * partition-order independent (a double mean would drift between
    * engines AND between runs), which is what keeps a k-means that runs
    * as distributed DataFrame jobs oracle-checkable end to end.
    */
  private def quantize(a: String): Column =
    expr(s"transform($a, x -> cast(round(cast(x AS double) * $KmScale) AS bigint))")

  private def duckQuantize(a: String): String =
    s"list_transform($a, x -> cast(round(cast(x AS double) * $KmScale) AS bigint))"

  /** Squared L2 distance between two quantized (bigint) vectors —
    * sequential integer fold, bit-exact in both engines.
    */
  private def l2q(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), cast(0 AS bigint), (acc, v) -> acc + v)")

  private def duckL2q(a: String, b: String): String =
    s"list_reduce(list_prepend(cast(0 AS bigint), list_transform(range(1, len($a)+1), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), (x, y) -> x + y)"

  /** q64's unrolled-Lloyd training, factored for the WHOLE IVF family
    * ([[ivfCentroids]]): refine the first-[[IvfK]] seed set by
    * [[KmRounds]] exact-integer iterations. Input must carry (vec_id,
    * qv); output is (cent_id, cqv) with cent_id = the seed id (empty
    * clusters drop out). Every step is a DataFrame job — no driver-side
    * training state beyond the plan.
    */
  private def trainedCentsQ(emb: DataFrame): DataFrame = {
    var cents = emb.filter(col("vec_id") < IvfK)
      .select(col("vec_id").as("cent_id"), col("qv").as("cqv"))
    for (_ <- 1 to KmRounds) {
      val assigned = emb.crossJoin(broadcast(cents))
        .withColumn("dist", l2q("qv", "cqv"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cent_id"))).as("m"), first(col("qv")).as("qv"))
        .select(col("m.cent_id").as("list_id"), col("qv"))
      cents = assigned
        .select(col("list_id"), posexplode(col("qv")))
        .groupBy(col("list_id"), col("pos"))
        .agg(sum(col("col")).as("sv"), count(lit(1)).as("nv"))
        // floor(sv/nv) in pure bigint: subtract the mathematical mod
        // (always >= 0) so the division is exact — no double round-trip
        // that would silently diverge once a cluster's sum passes 2^53
        .withColumn("mv", expr("(sv - (((sv % nv) + nv) % nv)) div nv"))
        .groupBy(col("list_id"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, mv))), x -> x.mv)").as("cqv"))
        .select(col("list_id").as("cent_id"), col("cqv"))
    }
    cents
  }

  /** IVF ANN with TRAINED centroids: q48's seed set refined by
    * [[KmRounds]] unrolled Lloyd iterations, every step a DataFrame job —
    * no driver-side training loop state beyond the plan itself.
    *
    * Exactness contract (what makes *training* oracle-checkable):
    *   - vectors are quantized to bigint at 2^20 (above), so the
    *     per-cluster sums that feed each centroid update are exact
    *     integers — no float accumulation order anywhere in training;
    *   - assignment is argmin of squared L2 on the quantized vectors
    *     (min over a (dist, cent_id) struct = tie-break on cent_id);
    *   - the centroid mean is floor(sum/count) per dimension in PURE
    *     bigint arithmetic (subtract the mathematical mod, then exact
    *     integer division) — no double round-trip, so it stays exact
    *     even when a giant cluster's sum passes 2^53;
    *   - the final probe + rerank is q48's: probe the 2 nearest lists,
    *     exact double-cosine rerank via the bounded TopKCarry aggregator.
    *
    * Scale design: per round, assignment is one broadcast pass over the
    * corpus (K tiny centroid rows broadcast) feeding a map-side-combined
    * argmin; the update explodes dims and aggregates (K × dims) rows —
    * both shuffle only combined aggregates, never raw corpus. Empty
    * clusters simply drop out (both engines identically).
    */
  val q64AnnIvfKmeans: QuerySpec = {
    val run = (s: org.apache.spark.sql.SparkSession, dir: String) => {
      val emb = Tables.embeddings(s, dir).filter(norm2(s, "embedding") > 0.0)
        .select(col("vec_id"), col("embedding"), quantize("embedding").as("qv"))
      val cents = graft.core.Checkpoints.pin(trainedCentsQ(emb))
      val assigned = emb.crossJoin(broadcast(cents))
        .withColumn("dist", l2q("qv", "cqv"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cent_id"))).as("m"),
          first(col("embedding")).as("embedding"))
        .select(col("vec_id"), col("m.cent_id").as("list_id"), col("embedding"))
      val wProbe = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("dist"), col("cent_id"))
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv_f"), col("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("dist", l2q("qv", "cqv"))
        .withColumn("prn", row_number().over(wProbe))
        .filter(col("prn") <= IvfProbes)
        .select(col("q_id"), col("qv_f"), col("cent_id").as("probe_list"))
      val topk = udaf(new graft.functions.TopKCarry(10))
      assigned.select(col("vec_id").as("c_id"), col("list_id"), col("embedding").as("cv"))
        .join(broadcast(probes), col("list_id") === col("probe_list") && col("q_id") =!= col("c_id"))
        .withColumn("cosine", dot(s, "qv_f", "cv") / (sqrt(norm2(s, "qv_f")) * sqrt(norm2(s, "cv"))))
        .groupBy(col("q_id"))
        .agg(topk(col("cosine"), col("c_id"), col("list_id")).as("top"))
        .select(col("q_id"), posexplode(col("top")))
        .select(col("q_id"), col("col._2").as("c_id"), col("col._3").as("list_id"),
          col("col._1").as("cosine"), (col("pos") + 1).cast("integer").as("rank"))
        .orderBy(col("q_id"), col("rank"))
    }
    // the oracle replays the same Lloyd rounds via the family-shared
    // chain (kmRoundsSql/trainedChainSql); q64 ranks by quantized L2,
    // so it reads the final quantized frame, not the dequantized cents
    QuerySpec(run,
      s"""WITH ${trainedChainSql(
             s"""SELECT vec_id, embedding, ${duckQuantize("embedding")} AS qv
                |  FROM embeddings WHERE ${duckNorm2("embedding")} > 0""".stripMargin)},
         |assigned AS (SELECT vec_id, cent_id AS list_id, embedding FROM (
         |  SELECT e.vec_id, c.cent_id, e.embedding,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY ${duckL2q("e.qv", "c.cqv")}, c.cent_id) AS rn
         |  FROM emb e CROSS JOIN $cFinal c) WHERE rn = 1),
         |probes AS (SELECT q_id, qv_f, cent_id AS probe_list FROM (
         |  SELECT e.vec_id AS q_id, e.embedding AS qv_f, c.cent_id,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY ${duckL2q("e.qv", "c.cqv")}, c.cent_id) AS prn
         |  FROM emb e CROSS JOIN $cFinal c WHERE e.vec_id < 5) WHERE prn <= $IvfProbes),
         |scored AS (SELECT p.q_id, a.vec_id AS c_id, a.list_id,
         |    ${duckDot("p.qv_f", "a.embedding")} / (sqrt(${duckNorm2("p.qv_f")}) * sqrt(${duckNorm2("a.embedding")})) AS cosine
         |  FROM assigned a JOIN probes p ON a.list_id = p.probe_list AND p.q_id <> a.vec_id)
         |SELECT q_id, c_id, list_id, cosine, rank
         |FROM (SELECT *, cast(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS integer) AS rank FROM scored)
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin)
  }

  private val PqM = 4      // subspaces
  private val PqDsub = 16  // dims per subspace (PqM * PqDsub = 64)
  private val PqK = 16     // codebook entries per subspace
  private val Dim = 64

  /** Single-row codebook frame: the first [[PqK]] corpus vectors in id
    * order — shared by q100 and q120 so the codebooks cannot drift.
    */
  private def pqCodebook(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < PqK)
      .agg(expr("transform(array_sort(collect_list(named_struct('i', vec_id, 'v', embedding))), x -> x.v)")
        .as("cents"))

  /** The original higher-order-function encode/reconstruct chain —
    * retained as the differential check for the [[graft.functions.PqRecon]]
    * codegen kernel (the MinHashSigs/SimHash pattern). Input must carry
    * `embedding` and the broadcast `cents`; output adds `recon`.
    */
  private[ext] def pqReconChain(withCents: DataFrame): DataFrame = {
    val sq = (v: String, c: String) => s"($v - $c) * ($v - $c)"
    val subDist =
      s"""aggregate(sequence(0, ${PqDsub - 1}), cast(0 AS double), (acc, d) -> acc +
         |  ${sq(s"cast(element_at(embedding, m * $PqDsub + d + 1) AS double)",
                s"cast(element_at(element_at(cents, c + 1), m * $PqDsub + d + 1) AS double)")})""".stripMargin
    withCents
      .withColumn("codes", expr(
        s"""transform(sequence(0, ${PqM - 1}), m ->
           |  array_min(transform(sequence(0, ${PqK - 1}), c ->
           |    named_struct('d', $subDist, 'c', c))).c)""".stripMargin))
      .withColumn("recon", expr(
        s"""flatten(transform(sequence(0, ${PqM - 1}), m ->
           |  slice(element_at(cents, element_at(codes, m + 1) + 1), m * $PqDsub + 1, $PqDsub)))""".stripMargin))
      .drop("codes")
  }

  /** The interpreted L2² fold — test hook mirroring [[pqReconChain]],
    * differential check for [[graft.functions.VecL2]].
    */
  private[ext] def l2ChainExpr(a: String, b: String): String = {
    val sq = (v: String, c: String) => s"($v - $c) * ($v - $c)"
    s"""aggregate(sequence(0, ${Dim - 1}), cast(0 AS double), (acc, d) -> acc +
       |  ${sq(s"cast(element_at($a, d + 1) AS double)", s"cast(element_at($b, d + 1) AS double)")})""".stripMargin
  }

  /** q100: product-quantization ANN — the memory-bounded vector-search
    * path at 100 TB: each 64-dim float vector (256 B) is encoded as
    * [[PqM]] codebook codes (4 B), so the searchable index is 64×
    * smaller than the raw embeddings and fits executor memory at corpus
    * sizes where raw vectors cannot. Codebooks are seed-set (the first
    * [[PqK]] corpus vectors' sub-slices — the q48 coarse-quantizer
    * convention), broadcast as a single-row frame.
    *
    * Encoding is a PER-ROW expression (argmin over PqK centroids per
    * subspace via `array_min` of (dist, code) structs — lexicographic
    * struct order makes the code tie-break deterministic): zero
    * shuffles, no K× row amplification. Scoring uses the
    * reconstruction identity — because subspaces partition the dims,
    * the classic ADC table-lookup distance IS the exact L2² between
    * the query and the decoded reconstruction — so both engines
    * compute one 64-dim left fold and stay bit-identical. Top-k is the
    * bounded [[graft.functions.TopK]] aggregator on negated distance
    * (distance asc, id asc — q21's shape, no window funnel); recall of
    * the PQ top-10 against the exact-L2 top-10 is judged per query, so
    * a quantization-quality regression is a red CORRECTNESS row.
    */
  val q100PqAnn: QuerySpec = QuerySpec(
    (s, dir) => {
      graft.functions.PqRecon.register(s)
      graft.functions.VecL2.register(s)
      val e = Tables.embeddings(s, dir)
      // encode + reconstruct and both L2 folds run in the codegen
      // kernels (PqRecon / VecL2) — the lambda-chain forms they replace
      // are CodegenFallback and were the bench's most expensive per-row
      // cost; VectorOpsSpec pins expression ≡ chain on real embeddings
      val coded = e.crossJoin(broadcast(pqCodebook(e)))
        .select(col("vec_id").as("c_id"),
          expr(s"pq_recon(embedding, cents, $PqM, $PqDsub)").as("recon"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
      val topk = udaf(new graft.functions.TopK(10))
      def top10(scored: DataFrame): DataFrame = scored
        .groupBy(col("q_id")).agg(topk(col("neg"), col("c_id")).as("top"))
        .select(col("q_id"), explode(expr("transform(top, x -> x._2)")).as("c_id"))
      val ann = top10(coded.crossJoin(broadcast(q)).filter(col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id"), (-expr("vec_l2(qvec, recon)")).as("neg")))
      val exact = top10(e.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
        .crossJoin(broadcast(q)).filter(col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id"), (-expr("vec_l2(qvec, cv)")).as("neg")))
      exact.join(ann.withColumn("hit", lit(1L)), Seq("q_id", "c_id"), "left_outer")
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_exact"),
          coalesce(sum(col("hit")), lit(0L)).as("n_overlap"))
        .select(col("q_id"), col("n_exact"), col("n_overlap"),
          (col("n_overlap").cast("double") / col("n_exact").cast("double")).as("recall"))
        .orderBy(col("q_id"))
    }, {
      def sq(v: String): String = s"($v) * ($v)"
      val subDist =
        s"""list_reduce(list_transform(range(0, $PqDsub), d ->
           |  ${sq(s"cast(embedding[m * $PqDsub + d + 1] AS double) - cast(cents[c + 1][m * $PqDsub + d + 1] AS double)")}),
           |  (x, y) -> x + y)""".stripMargin
      def l2(a: String, b: String) =
        s"""list_reduce(list_transform(range(0, $Dim), d ->
           |  ${sq(s"cast($a[d + 1] AS double) - cast($b[d + 1] AS double)")}),
           |  (x, y) -> x + y)""".stripMargin
      s"""WITH ce AS (SELECT list(embedding ORDER BY vec_id) AS cents
         |            FROM embeddings WHERE vec_id < $PqK),
         |cd AS (SELECT vec_id, embedding, cents,
         |         list_transform(range(0, $PqM), m ->
         |           list_aggregate(list_transform(range(0, $PqK), c ->
         |             {'d': $subDist, 'c': c}), 'min').c) AS codes
         |       FROM embeddings CROSS JOIN ce),
         |rc AS (SELECT vec_id AS c_id,
         |         flatten(list_transform(range(0, $PqM), m ->
         |           cents[codes[m + 1] + 1][m * $PqDsub + 1 : (m + 1) * $PqDsub])) AS recon
         |       FROM cd),
         |qs AS (SELECT vec_id AS q_id, embedding AS qvec FROM embeddings WHERE vec_id < 5),
         |ap AS (SELECT q_id, c_id, ${l2("qvec", "recon")} AS ad
         |       FROM rc, qs WHERE c_id <> q_id),
         |annk AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id ORDER BY ad, c_id) AS rn
         |    FROM ap) WHERE rn <= 10),
         |ep AS (SELECT q_id, vec_id AS c_id, ${l2("qvec", "embedding")} AS ed
         |       FROM embeddings, qs WHERE vec_id <> q_id),
         |exk AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id ORDER BY ed, c_id) AS rn
         |    FROM ep) WHERE rn <= 10),
         |ja AS (SELECT e.q_id AS q_id,
         |         CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |       FROM exk e LEFT JOIN annk a ON e.q_id = a.q_id AND e.c_id = a.c_id)
         |SELECT q_id, cast(count(*) AS bigint) AS n_exact,
         |       ${OracleSql.bigSum("hit")} AS n_overlap,
         |       CAST(${OracleSql.bigSum("hit")} AS double) / CAST(count(*) AS double) AS recall
         |FROM ja GROUP BY q_id ORDER BY q_id""".stripMargin
    })

  /** q107: embedding outlier audit — the top-5 vectors farthest (squared
    * L2) from their own label's centroid, per label: the curation pass
    * that surfaces mislabeled or noise documents before training (a
    * vector far from every same-label neighbor is the thing a
    * class-conditioned sampler silently amplifies). All arithmetic is
    * the q64 exactness contract: vectors bigint-quantized at 2^20, the
    * centroid mean computed per dimension in PURE integer arithmetic
    * (subtract the mathematical mod, then exact division — no double
    * round-trip), and the judged distance is the exact integer L2 fold,
    * so the ranking is bit-identical in both engines (the aggregator's
    * double sort key is exact too: distances stay far below 2^53).
    *
    * Scale: the centroid pass is a map-side-combined (label, dim)
    * aggregate — shuffle rows = labels × dims, never corpus-sized; the
    * label-count centroid table broadcasts; and per-label top-5 goes
    * through the bounded [[graft.functions.TopKCarry]] aggregator, NOT
    * a label-partitioned window — with a handful of labels over a
    * 100 TB corpus a per-label window is a textbook hot reducer, while
    * the aggregator's partials are 5-row buffers merged map-side.
    */
  val q107EmbeddingOutliers: QuerySpec = QuerySpec(
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), quantize("embedding").as("qv"))
      val cents = emb
        .select(col("label"), posexplode(col("qv")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("col")).as("sv"), count(lit(1)).as("nv"))
        .withColumn("mv", expr("(sv - (((sv % nv) + nv) % nv)) div nv"))
        .groupBy(col("label"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, mv))), x -> x.mv)").as("cqv"))
      val topk = udaf(new graft.functions.TopKCarry(5))
      emb.join(broadcast(cents), Seq("label"))
        .withColumn("dist", l2q("qv", "cqv"))
        .groupBy(col("label"))
        .agg(topk(col("dist").cast("double"), col("vec_id"), col("dist")).as("top"))
        .select(col("label"), posexplode(col("top")))
        .select(col("label"), (col("pos") + 1).cast("integer").as("rank"),
          col("col._2").as("vec_id"), col("col._3").as("dist"))
        .orderBy(col("label"), col("rank"))
    },
    s"""WITH emb AS (SELECT vec_id, label, ${duckQuantize("embedding")} AS qv FROM embeddings),
       |dims AS (SELECT unnest(range(1, len((SELECT embedding FROM embeddings LIMIT 1)) + 1)) AS dim),
       |u AS (SELECT label, dim, cast((sv - (((sv % nv) + nv) % nv)) // nv AS bigint) AS mv
       |      FROM (SELECT label, dim, cast(sum(qv[dim]) AS bigint) AS sv,
       |              cast(count(*) AS bigint) AS nv
       |            FROM emb CROSS JOIN dims GROUP BY 1, 2)),
       |c AS (SELECT label, list(mv ORDER BY dim) AS cqv FROM u GROUP BY 1),
       |d AS (SELECT e.label, e.vec_id, ${duckL2q("e.qv", "c.cqv")} AS dist
       |      FROM emb e JOIN c ON e.label = c.label)
       |SELECT label, cast(rn AS integer) AS rank, vec_id, dist
       |FROM (SELECT *, row_number() OVER (PARTITION BY label ORDER BY dist DESC, vec_id) AS rn FROM d)
       |WHERE rn <= 5 ORDER BY label, rank""".stripMargin)

  /** q120: IVF-PQ ANN — the two serving-tier legs COMPOSED the way a
    * production vector index runs them (the FAISS `IVFPQ` shape): the
    * coarse quantizer (q48's TRAINED centroids, [[ivfCentroids]])
    * partitions the corpus
    * into [[IvfK]] inverted lists, every list member is PQ-encoded to
    * [[PqM]] codebook codes (q100's 64×-smaller representation), a
    * query probes its [[IvfProbes]] nearest lists and ADC-scores ONLY
    * those lists' codes. Search cost = (probed fraction of the corpus)
    * × (a 4-code table distance) — the multiplicative combination that
    * makes billion-vector search tractable; neither leg alone is the
    * production shape.
    *
    * Judged: the actual served result — per query, the top-10 by ADC
    * distance among probed lists (candidate id, its list, the exact
    * reconstruction-identity distance, rank). Composition-drift is the
    * failure this catches: the PQ encode must run on the ASSIGNED
    * corpus (list ids riding along), and the probe must gate the codes,
    * not the raw vectors.
    *
    * Scale: assignment + encode are per-row expressions over one corpus
    * scan (map-side-combined argmax, zero amplification); the probe set
    * is (n_queries × probes) rows broadcast to the code side; ADC
    * scoring shuffles nothing corpus-sized; top-k is the bounded
    * aggregator. At rest the coded lists live partitioned by `list_id`
    * (q48's pruning spec applies unchanged), so a probe opens 2 of 16
    * list partitions and reads 4-byte codes, not 256-byte vectors.
    */
  val q120IvfPqAnn: QuerySpec = QuerySpec(
    (s, dir) => {
      graft.functions.PqRecon.register(s)
      graft.functions.VecL2.register(s)
      val e = ivfCorpus(s, dir)
      val cents = stagedCentroids(s, dir, "graft_ivf_cents_f")(e)
      // assignment against the SAME staged trained codebook the probes
      // rank on — the training job runs once per (scale, process)
      val assigned = assignWith(s, e, cents)
      // encode on the ASSIGNED corpus (list ids ride along), through
      // the PqRecon codegen kernel — q100's chain-parity spec covers it
      val coded = assigned.crossJoin(broadcast(pqCodebook(e)))
        .select(col("vec_id").as("c_id"), col("list_id"),
          expr(s"pq_recon(embedding, cents, $PqM, $PqDsub)").as("recon"))
      val wProbe = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cent_cos").desc, col("cent_id"))
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("cent_cos",
          dot(s, "qv", "centv") / (sqrt(norm2(s, "qv")) * sqrt(norm2(s, "centv"))))
        .withColumn("prn", row_number().over(wProbe))
        .filter(col("prn") <= IvfProbes)
        .select(col("q_id"), col("qv"), col("cent_id").as("probe_list"))
      val topk = udaf(new graft.functions.TopKCarry(10))
      coded.join(broadcast(probes), col("list_id") === col("probe_list") && col("q_id") =!= col("c_id"))
        .withColumn("neg", -expr("vec_l2(qv, recon)"))
        .groupBy(col("q_id"))
        .agg(topk(col("neg"), col("c_id"), col("list_id")).as("top"))
        .select(col("q_id"), posexplode(col("top")))
        .select(col("q_id"), col("col._2").as("c_id"), col("col._3").as("list_id"),
          (-col("col._1")).as("adc_dist"), (col("pos") + 1).cast("integer").as("rank"))
        .orderBy(col("q_id"), col("rank"))
    }, {
      def sq(v: String): String = s"($v) * ($v)"
      val subDist =
        s"""list_reduce(list_transform(range(0, $PqDsub), d ->
           |  ${sq(s"cast(embedding[m * $PqDsub + d + 1] AS double) - cast(pqcents[c + 1][m * $PqDsub + d + 1] AS double)")}),
           |  (x, y) -> x + y)""".stripMargin
      def l2(a: String, b: String) =
        s"""list_reduce(list_transform(range(0, $Dim), d ->
           |  ${sq(s"cast($a[d + 1] AS double) - cast($b[d + 1] AS double)")}),
           |  (x, y) -> x + y)""".stripMargin
      s"""WITH ${trainedChainSql(
             s"""SELECT vec_id, embedding, ${duckQuantize("embedding")} AS qv
                |  FROM embeddings WHERE ${duckNorm2("embedding")} > 0""".stripMargin)},
         |ac AS (SELECT e.vec_id, c.cent_id, e.embedding,
         |         ${duckDot("e.embedding", "c.centv")} / (sqrt(${duckNorm2("e.embedding")}) * sqrt(${duckNorm2("c.centv")})) AS cent_cos
         |       FROM emb e CROSS JOIN cents c),
         |assigned AS (SELECT vec_id, cent_id AS list_id, embedding
         |             FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS arn FROM ac)
         |             WHERE arn = 1),
         |-- the PQ codebook stays seed-set (q100's convention); renamed
         |-- pqcents because `cents` is now the TRAINED coarse codebook CTE
         |ce AS (SELECT list(embedding ORDER BY vec_id) AS pqcents FROM emb WHERE vec_id < $PqK),
         |cd AS (SELECT a.vec_id, a.list_id, a.embedding, ce.pqcents,
         |         list_transform(range(0, $PqM), m ->
         |           list_aggregate(list_transform(range(0, $PqK), c ->
         |             {'d': $subDist, 'c': c}), 'min').c) AS codes
         |       FROM assigned a CROSS JOIN ce),
         |rc AS (SELECT vec_id AS c_id, list_id,
         |         flatten(list_transform(range(0, $PqM), m ->
         |           pqcents[codes[m + 1] + 1][m * $PqDsub + 1 : (m + 1) * $PqDsub])) AS recon
         |       FROM cd),
         |probes AS (SELECT q_id, qv, cent_id AS probe_list
         |           FROM (SELECT vec_id AS q_id, embedding AS qv, cent_id, cent_cos,
         |                   row_number() OVER (PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS prn
         |                 FROM ac WHERE vec_id < 5)
         |           WHERE prn <= $IvfProbes),
         |scored AS (SELECT p.q_id, r.c_id, r.list_id, ${l2("p.qv", "r.recon")} AS ad
         |           FROM rc r JOIN probes p ON r.list_id = p.probe_list AND p.q_id <> r.c_id)
         |SELECT q_id, c_id, list_id, ad AS adc_dist, rank
         |FROM (SELECT *, cast(row_number() OVER (PARTITION BY q_id ORDER BY ad, c_id) AS integer) AS rank FROM scored)
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
    })

  /** q125: kNN label classification over the embedding corpus — the
    * weak-labeling / label-QA operator a curation pipeline runs to
    * propagate labels onto unlabeled data (or cross-check claimed ones):
    * every 10th vector is held out as the "unlabeled" probe set, its
    * label predicted as the majority vote of its 5 nearest labeled
    * neighbors by exact cosine, and the judged output is the confusion
    * matrix (true_label, predicted_label, n_vectors).
    *
    * Scale design — this is a kNN JOIN, the classic quadratic trap, and
    * it runs entirely through the IVF machinery: candidates come ONLY
    * from the probe's top-`IvfProbes` inverted lists (per-row zero-
    * shuffle centroid ranking, the q116 pattern), the 5-neighbor
    * selection is the bounded map-side-combinable [[graft.functions
    * .TopKCarry]] aggregator with the neighbor's label riding as the
    * carried payload (never a global per-probe sort), and the vote
    * window is per-probe over ≤5 rows. No label-blocked or all-pairs
    * join anywhere: cost is |test| × (corpus / nlists × probes), the
    * serving-tier admission shape.
    *
    * Determinism: cosines are the shared bit-exact fold; neighbor
    * selection tie-breaks (cosine desc, n_id asc) = the oracle's
    * row_number; the vote tie-breaks (count desc, label asc).
    */
  val q125KnnClassify: QuerySpec = QuerySpec(
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      graft.functions.VecDot.register(s)
      // trained coarse codebook as a cent_id-carrying struct array —
      // the q116 convention (positions are NOT list ids)
      val cents1 = stagedCentroids(s, dir, "graft_ivf_cents_r")(e)
        .agg(expr("array_sort(collect_list(named_struct('i', cent_id, 'v', centv)))")
          .as("cents"))
      val centCos = s"vec_dot(embedding, element_at(cents, c + 1).v) / " +
        s"(sqrt(vec_dot(embedding, embedding)) * " +
        s"sqrt(vec_dot(element_at(cents, c + 1).v, element_at(cents, c + 1).v)))"
      val ranked = e.crossJoin(broadcast(cents1))
        .withColumn("psort", expr(
          s"""array_sort(transform(sequence(0, size(cents) - 1), c ->
             |  named_struct('negcos', -($centCos), 'c', element_at(cents, c + 1).i)))""".stripMargin))
        .withColumn("list_id", expr("psort[0].c"))
        .withColumn("probes", expr(s"transform(slice(psort, 1, $IvfProbes), x -> x.c)"))
        .drop("psort", "cents")
      val test = ranked.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("t_id"), col("label").as("true_label"),
          col("embedding").as("tv"), explode(col("probes")).as("probe"))
      val train = ranked.filter(col("vec_id") % 10 =!= 0)
        .select(col("vec_id").as("n_id"), col("label").as("n_label"),
          col("embedding").as("nv"), col("list_id"))
      val topk = udaf(new graft.functions.TopKCarry(5))
      val neigh = test.join(train, col("probe") === col("list_id"))
        .withColumn("cosine", dot(s, "tv", "nv") / (sqrt(norm2(s, "tv")) * sqrt(norm2(s, "nv"))))
        .groupBy(col("t_id"), col("true_label"))
        .agg(topk(col("cosine"), col("n_id"), col("n_label").cast("long")).as("top"))
        .select(col("t_id"), col("true_label"), explode(col("top")).as("nb"))
        .select(col("t_id"), col("true_label"), col("nb._3").cast("int").as("n_label"))
      val votes = neigh.groupBy(col("t_id"), col("true_label"), col("n_label"))
        .agg(count(lit(1)).as("cnt"))
      val wVote = org.apache.spark.sql.expressions.Window
        .partitionBy(col("t_id")).orderBy(col("cnt").desc, col("n_label").asc)
      votes.withColumn("vr", row_number().over(wVote)).filter(col("vr") === 1)
        .groupBy(col("true_label"), col("n_label").as("predicted_label"))
        .agg(count(lit(1)).as("n_vectors"))
        .orderBy(col("true_label"), col("predicted_label"))
    },
    s"""WITH ${trainedChainSql(s"SELECT vec_id, ${duckQuantize("embedding")} AS qv FROM embeddings")},
       |ac AS (SELECT e.vec_id, c.cent_id,
       |         ${duckDot("e.embedding", "c.centv")} / (sqrt(${duckNorm2("e.embedding")}) * sqrt(${duckNorm2("c.centv")})) AS cent_cos
       |       FROM embeddings e CROSS JOIN cents c),
       |pr AS (SELECT vec_id, cent_id,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS prn
       |       FROM ac),
       |assign AS (SELECT vec_id, cent_id AS list_id FROM pr WHERE prn = 1),
       |probes AS (SELECT vec_id, cent_id AS probe FROM pr WHERE prn <= $IvfProbes),
       |test AS (SELECT vec_id AS t_id, label AS true_label, embedding AS tv
       |         FROM embeddings WHERE vec_id % 10 = 0),
       |train AS (SELECT e.vec_id AS n_id, e.label AS n_label, e.embedding AS nv, a.list_id
       |          FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
       |          WHERE e.vec_id % 10 <> 0),
       |cand AS (SELECT t.t_id, t.true_label, n.n_id, n.n_label,
       |           ${duckDot("t.tv", "n.nv")} / (sqrt(${duckNorm2("t.tv")}) * sqrt(${duckNorm2("n.nv")})) AS cosine
       |         FROM test t JOIN probes p ON p.vec_id = t.t_id
       |         JOIN train n ON n.list_id = p.probe),
       |top5 AS (SELECT t_id, true_label, n_label,
       |           row_number() OVER (PARTITION BY t_id ORDER BY cosine DESC, n_id) AS rn
       |         FROM cand),
       |votes AS (SELECT t_id, true_label, n_label, count(*) AS cnt
       |          FROM top5 WHERE rn <= 5 GROUP BY t_id, true_label, n_label),
       |pred AS (SELECT t_id, true_label, n_label AS predicted_label,
       |           row_number() OVER (PARTITION BY t_id ORDER BY cnt DESC, n_label) AS vr
       |         FROM votes)
       |SELECT true_label, predicted_label, count(*) AS n_vectors
       |FROM pred WHERE vr = 1
       |GROUP BY true_label, predicted_label
       |ORDER BY true_label, predicted_label""".stripMargin)

  /** q128: semantic-dedup REPRESENTATIVE selection — the keep-decision
    * that completes the embedding dedup path (q25 pairs → q115 clusters
    * → which vector to KEEP per cluster): for every q115 cluster, the
    * member closest to the cluster's own centroid, the SemDeDup-style
    * policy (keep the most central exemplar, drop the rest). Judged rows
    * are (cluster_id, representative, its centroid distance, member
    * count) — the exact drop-list complement a curation pipeline
    * executes.
    *
    * Exactness: the centroid is the q107 integer-quantized mean
    * (bigint-quantized coordinates, floored mean via the
    * mathematical-mod identity — the q64-validated sign-safe spelling),
    * distances are integer L2², and the argmin tie-breaks (dist asc,
    * vec_id asc) — every ranking decision is integer arithmetic, so
    * engines cannot drift. The float cosine threshold lives only in the
    * SHARED q25 pair scheme, as in q115.
    *
    * Scale: clusters are corpus-cardinality, so NOTHING here is
    * label-bounded-broadcast: the centroid frame joins back by
    * cluster_id equi-join (unhinted — the q101 lesson), the coordinate
    * explode is 64 narrow rows per vector into a map-side-combined
    * (cluster, dim) agg (the q107 accounting), and the per-cluster
    * argmin is a map-side-combinable min-of-struct — never a global or
    * per-cluster sort of raw members.
    */
  val q128ClusterReps: QuerySpec = QuerySpec(
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      // pin the quantized membership: TWO consumers (the centroid agg
      // and the distance join) would otherwise each re-run the cluster
      // semi-join + quantize scan as separate stages
      val m = graft.core.Checkpoints.pin(embClusters(s, dir).join(
        e.select(col("vec_id"), quantize("embedding").as("qv")), Seq("vec_id")))
      val cents = m.select(col("cluster_id"), posexplode(col("qv")))
        .groupBy(col("cluster_id"), col("pos"))
        .agg(sum(col("col")).as("sv"), count(lit(1)).as("nv"))
        .withColumn("mv", expr("(sv - (((sv % nv) + nv) % nv)) div nv"))
        .groupBy(col("cluster_id"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, mv))), x -> x.mv)").as("cqv"))
      m.join(cents, Seq("cluster_id"))
        .withColumn("dist", l2q("qv", "cqv"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          min(struct(col("dist"), col("vec_id"))).as("rep"))
        .select(col("cluster_id"), col("rep.vec_id").as("rep_vec_id"),
          col("rep.dist").as("rep_dist"), col("n_members"))
        .orderBy(col("cluster_id"))
    },
    "WITH RECURSIVE " + neardupPairsSql.stripPrefix("WITH ") + embClustersSql +
      s""",
         |emb AS (SELECT c.vec_id, c.cluster_id, ${duckQuantize("e.embedding")} AS qv
         |        FROM embeddings e JOIN clusters c ON e.vec_id = c.vec_id),
         |dims AS (SELECT unnest(range(1, len((SELECT embedding FROM embeddings LIMIT 1)) + 1)) AS dim),
         |u AS (SELECT cluster_id, dim, cast((sv - (((sv % nv) + nv) % nv)) // nv AS bigint) AS mv
         |      FROM (SELECT cluster_id, dim, cast(sum(qv[dim]) AS bigint) AS sv,
         |              cast(count(*) AS bigint) AS nv
         |            FROM emb CROSS JOIN dims GROUP BY 1, 2)),
         |c2 AS (SELECT cluster_id, list(mv ORDER BY dim) AS cqv FROM u GROUP BY 1),
         |d AS (SELECT e.cluster_id, e.vec_id, ${duckL2q("e.qv", "c2.cqv")} AS dist
         |      FROM emb e JOIN c2 ON e.cluster_id = c2.cluster_id)
         |SELECT cluster_id, rep_vec_id, rep_dist, n_members
         |FROM (SELECT cluster_id, vec_id AS rep_vec_id, dist AS rep_dist,
         |        cast(count(*) OVER (PARTITION BY cluster_id) AS bigint) AS n_members,
         |        row_number() OVER (PARTITION BY cluster_id ORDER BY dist, vec_id) AS rn
         |      FROM d)
         |WHERE rn = 1 ORDER BY cluster_id""".stripMargin)

  import SplitScheme.{splitOf, splitSql}

  /** q130: LEAKAGE-SAFE train/val/test split — the eval-carving rule the
    * dedup literature insists on: a near-duplicate of an eval document
    * in the training set inflates the benchmark, so splits must be
    * assigned per near-dup CLUSTER, never per document. Composes the two
    * families this repo already judges — q115's embedding dedup clusters
    * and q79's deterministic salted-hash split — and judges what the
    * composition guarantees: the split key is the cluster id (all
    * members inherit the cluster's split), so `leak_pairs_cluster_split`
    * — near-dup pairs straddling two splits — is ZERO by construction,
    * while the same accounting under the naive doc-level split
    * (`leak_pairs_doc_split`, the q79 scheme applied to vec_id) is
    * nonzero on the same pair set: the judged output contains the
    * before/after leakage proof alongside the per-split composition.
    *
    * Scale: the split is a pure hash of cluster_id — assignment adds
    * ZERO shuffles on top of the q46-machinery clustering; the leak
    * audit joins the candidate-bounded pair list to the assignment by
    * vec_id (unhinted equi-joins — both sides corpus-cardinality, the
    * q101 lesson), and the naive-split leak count needs no join at all
    * (both endpoints' splits are pure hashes of the pair's own ids).
    * A new shard extends the split without reshuffling history exactly
    * as q79 argues — clusters are keyed by their minimum member id, so
    * an untouched cluster keeps its split across incremental runs.
    */
  val q130LeakageSafeSplit: QuerySpec = QuerySpec(
    (s, dir) => {
      // pinned: consumed three times (vec counts, cluster counts, and
      // twice by the leak join) — the q128 discipline
      val asg = graft.core.Checkpoints.pin(
        clusterSplits(s, Tables.embeddings(s, dir)))
      val perSplit = asg.groupBy(col("split"))
        .agg(count(lit(1)).as("nv"), count_distinct(col("cluster_id")).as("nc"))
      val vecRows = perSplit.select(
        concat(col("split"), lit("_vecs")).as("metric"), col("nv").as("value"))
      val cluRows = perSplit.select(
        concat(col("split"), lit("_clusters")).as("metric"), col("nc").as("value"))
      val p = neardupPairs(s, dir).select(col("id_a"), col("id_b"))
      val clusterLeak = p
        .join(asg.select(col("vec_id").as("id_a"), col("split").as("split_a")), Seq("id_a"))
        .join(asg.select(col("vec_id").as("id_b"), col("split").as("split_b")), Seq("id_b"))
        .filter(col("split_a") =!= col("split_b"))
        .agg(count(lit(1)).as("value"))
        .select(lit("leak_pairs_cluster_split").as("metric"), col("value"))
      val naiveLeak = p
        .filter(splitOf(col("id_a"), "csplit") =!= splitOf(col("id_b"), "csplit"))
        .agg(count(lit(1)).as("value"))
        .select(lit("leak_pairs_doc_split").as("metric"), col("value"))
      vecRows.unionAll(cluRows).unionAll(clusterLeak).unionAll(naiveLeak)
        .orderBy(col("metric"))
    },
    "WITH RECURSIVE " + neardupPairsSql.stripPrefix("WITH ") + embClustersSql +
      s""",
         |asg AS (SELECT vec_id, cluster_id,
         |          ${splitSql("cluster_id", "csplit")} AS split
         |        FROM clusters)
         |SELECT metric, value FROM (
         |  SELECT split || '_vecs' AS metric, cast(count(*) AS bigint) AS value
         |  FROM asg GROUP BY split
         |  UNION ALL
         |  SELECT split || '_clusters', cast(count(DISTINCT cluster_id) AS bigint)
         |  FROM asg GROUP BY split
         |  UNION ALL
         |  SELECT 'leak_pairs_cluster_split', cast(count(*) AS bigint)
         |  FROM pairs p JOIN asg a ON p.id_a = a.vec_id JOIN asg b ON p.id_b = b.vec_id
         |  WHERE a.split <> b.split
         |  UNION ALL
         |  SELECT 'leak_pairs_doc_split', cast(count(*) AS bigint)
         |  FROM pairs
         |  WHERE ${splitSql("id_a", "csplit")} <> ${splitSql("id_b", "csplit")}
         |) ORDER BY metric""".stripMargin)

  val all: Map[String, QuerySpec] = Map(
    "q130_leakage_safe_split" -> q130LeakageSafeSplit,
    "q128_cluster_reps" -> q128ClusterReps,
    "q125_knn_classify" -> q125KnnClassify,
    "q120_ivfpq_ann" -> q120IvfPqAnn,
    "q107_embedding_outliers" -> q107EmbeddingOutliers,
    "q21_cosine_topk" -> q21CosineTopK,
    "q22_ann_lsh" -> q22AnnLsh,
    "q25_embedding_neardup" -> q25EmbeddingNearDup,
    "q115_embedding_clusters" -> q115EmbeddingClusters,
    "q116_shard_admission" -> q116ShardAdmission,
    "q48_ann_ivf" -> q48AnnIvf,
    "q64_ann_ivf_kmeans" -> q64AnnIvfKmeans,
    "q69_int8_cosine" -> q69Int8Cosine,
    "q96_ann_lsh_audit" -> q96AnnLshAudit,
    "q100_pq_ann" -> q100PqAnn)
}

/** Train/val/test split geometry — the q79 bucket scheme (salted
  * portable md5, 4096 buckets, 80/10/10) applied to an arbitrary key.
  * q130 keys it by the embedding-cluster id; q134 keys it by the text
  * near-dup cluster id. ONE definition (Spark column + oracle SQL twin)
  * so the split rule cannot drift between the queries that compose it.
  */
private[ext] object SplitScheme {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  private val SplitBuckets = 4096
  private val TrainLt = (SplitBuckets * 8) / 10
  private val ValLt = (SplitBuckets * 9) / 10

  def splitOf(key: Column, salt: String): Column = {
    val b = PortableHash.bucketCol(concat(lit(s"$salt:"), key.cast("string")), 3)
    when(b < TrainLt, "train").when(b < ValLt, "val").otherwise("test")
  }
  def splitSql(key: String, salt: String): String =
    s"""CASE WHEN ${PortableHash.bucketSql(s"'$salt:' || cast($key AS varchar)", 3)} < $TrainLt THEN 'train'
       |     WHEN ${PortableHash.bucketSql(s"'$salt:' || cast($key AS varchar)", 3)} < $ValLt THEN 'val'
       |     ELSE 'test' END""".stripMargin
}
