package graft.queries

import graft.Tables
import graft.ops.Shapes
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (north-star extension):
  * brute-force cosine top-k as the exact baseline, and a deterministic
  * random-hyperplane LSH variant as the scale path.
  *
  * Scale design: the query set is tiny and BROADCAST — the candidate
  * side streams through a map-side join, so the 100 TB corpus is
  * scanned once with no shuffle of the embedding column at all. Top-k
  * per query is a TakeOrdered-shaped aggregate, not a global sort. The
  * LSH variant buckets both sides by hyperplane sign bits first, so
  * each candidate is compared only within its bucket.
  *
  * The dot product runs on doubles (embeddings are float32 on disk;
  * summation order is the same left-to-right fold in Spark's
  * `aggregate` HOF and DuckDB's list functions, and results are
  * rounded to 6 decimals) — keeps the oracle bit-stable.
  */
object Similarity {

  /** The retrieval tier's top-K cut — ONE constant shared by the exact
    * scan (q29), the multiprobe search (q51) and every eval that fuses
    * their manifests (q129 recall, q143 MRR, q205 nDCG), so a K retune
    * adapts the graded-gain base and ideal DCG with it instead of
    * silently corrupting the metric. */
  val AnnTopK: Int = 3

  /** q205's ideal DCG at [[AnnTopK]]: gains (K..1) in perfect order
    * under the integer linear-reciprocal discount (1000 div rank). */
  val AnnIdcgPm: Int =
    (1 to AnnTopK).map(i => (AnnTopK + 1 - i) * (1000 / i)).sum

  /** embedding column cast float[] → double[] for stable arithmetic —
    * a native array Cast (codegen'd element loop), NOT a `transform`
    * lambda: the HOF spelling put an interpreted per-element closure
    * in front of every native vector kernel in the similarity scans. */
  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Cosine via the native codegen'd Catalyst expression
    * ([[graft.functions.CosineSimilarity]]) — the HOF spelling below is
    * kept as the reference implementation for differential tests. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_similarity(a, b)

  /** Same semantics spelled with `zip_with`/`aggregate` higher-order
    * functions (CodegenFallback — ~3-4× slower; see VectorExpressions
    * scaladoc). */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0d), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Brute-force cosine top-3 neighbors for each query vector
    * (vec_id < 5), excluding self. Exact baseline for ANN variants.
    */
  def q29CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cos_sim"))
    scored.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id").asc)))
      .filter(col("rk") <= AnnTopK)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
  }
  val q29Sql: String =
    s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 5),
      |scored AS (
      |  SELECT query_id, e.vec_id AS neighbor_id,
      |         round(list_dot_product(qv, v) /
      |               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6)
      |           AS cos_sim
      |  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos_sim,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
      |  FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, rk FROM ranked
      |WHERE rk <= $AnnTopK""".stripMargin

  /** Deterministic random-hyperplane LSH: 8 hyperplanes whose weights
    * are ±1 derived from md5(plane:dim) — reproducible on any engine,
    * no RNG state. Census of bucket occupancy (the ANN index shape):
    * at scale this bucketing is the shuffle key that keeps cosine
    * comparisons within buckets only.
    */
  private val NumPlanes = 8
  /** Reference HOF spelling of one plane's contribution — kept for
    * differential tests against the native kernel; the query path is
    * [[bucketCode]]. */
  def planeSign(v: Column, plane: Int): Column = {
    // weight(d) = +1 if first md5 hex char of "plane:dim" is 0-7 else -1
    val weighted = zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
      x * when(substring(md5(concat(lit(plane.toString), lit(":"), i.cast("string"))
        .cast("binary")), 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"),
        1d).otherwise(-1d))
    val s = aggregate(weighted, lit(0d), (acc, x) => acc + x)
    when(s > 0, 1L << plane).otherwise(0L)
  }

  /** The full 8-plane bucket code over a double[] col — native
    * one-loop kernel ([[graft.functions.HyperplaneCode]]): the ±1
    * weight table is JVM-memoized, so the scan pays n·8 multiply-adds
    * per vector instead of 8 interpreted HOF passes with per-element
    * md5 (the HOF reference [[planeSign]] is differential-tested
    * against it in HyperplaneSpec). */
  def bucketCode(v: Column): Column =
    graft.functions.HyperplaneFunctions.hyperplane_code(v)

  /** HOF spelling of the full code (differential-test reference). */
  def bucketCodeHof(v: Column): Column =
    (0 until NumPlanes).map(p => planeSign(v, p)).reduce(_ + _)

  /** DuckDB spelling of [[planeSign]] over a `v` DOUBLE[] column —
    * shared by the q30 and q31 oracles. */
  private def signSql(p: Int): String =
    s"""CASE WHEN list_sum(list_transform(range(1, len(v) + 1),
       |  i -> v[i] * (CASE WHEN substr(md5('$p:' || CAST(i - 1 AS VARCHAR)), 1, 1)
       |                    IN ('0','1','2','3','4','5','6','7')
       |               THEN 1.0 ELSE -1.0 END))) > 0
       |THEN ${1L << p} ELSE 0 END""".stripMargin
  private val bucketSql: String =
    (0 until NumPlanes).map(signSql).mkString(" + ")

  def q30LshBuckets(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    emb.withColumn("bucket", bucketCode(col("v")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("vec_count"),
        countDistinct(col("label")).as("distinct_labels"),
        min(col("vec_id")).as("min_vec_id"))
  }
  val q30Sql: String =
    s"""WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT ($bucketSql) AS bucket,
       |       count(*) AS vec_count,
       |       count(DISTINCT label) AS distinct_labels,
       |       min(vec_id) AS min_vec_id
       |FROM emb GROUP BY 1""".stripMargin

  /** Multi-probe LSH ANN search — the SCALE path q29's exact scan
    * trades against: each query probes its own hyperplane bucket plus
    * all Hamming-distance-1 buckets (flip one of the 8 sign bits —
    * the standard multi-probe recall boost: a vector near a hyperplane
    * lands on either side with near-even odds), verifies only those
    * candidates with the native cosine, and keeps the top-3.
    *
    * Plan shape: queries (with their bucket codes) broadcast; the
    * corpus streams through ONE scan computing its bucket code
    * scan-side (native kernel) with the probe test
    * `bit_count(qb ⊕ cb) ≤ 1` as a cheap codegen predicate inside the
    * broadcast join — the corpus never shuffles, and WindowGroupLimit
    * pushes the per-query top-3 below the exchange exactly like q29.
    * At 100 TB the bucket code would come from the ANN index
    * (pre-computed column), making the probe a partition-pruning
    * predicate instead of a scan computation.
    */
  /** The multi-probe candidate join — ONE definition shared by the
    * search (q51) and the audit that measures it (q129), so a probe
    * retune (radius, plane count) can never leave the recall census
    * counting candidates for a different index than the search runs.
    * `queries` must carry (query_id, qb); extra columns pass through. */
  private def multiprobeCandidates(emb: DataFrame,
      queries: DataFrame): DataFrame =
    emb.join(broadcast(queries),
      col("vec_id") =!= col("query_id") &&
        bit_count(col("cb").bitwiseXOR(col("qb"))) <= 1)

  def q51MultiprobeAnn(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("cb", bucketCode(col("v")))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("cb").as("qb"))
    val scored = multiprobeCandidates(emb, queries)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cos_sim"))
    scored.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id").asc)))
      .filter(col("rk") <= AnnTopK)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
  }
  /** DuckDB spelling of [[multiprobeCandidates]]'s predicate (aliases
    * `e` = corpus, `q` = queries) — shared by q51Sql and q129Sql. */
  private val probePredSql: String =
    "e.vec_id <> q.query_id AND bit_count(xor(e.cb, q.qb)) <= 1"
  /** The multi-probe search oracle over an arbitrary embeddings
    * relation and query predicate — parameterized so q224's
    * serve-from-the-maintained-index oracle can pass the live-rows
    * subquery and its own query-id cut (the q216 pattern). */
  def q51SqlFrom(from: String, queryPred: String): String =
    s"""WITH emb0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $from),
       |emb AS (SELECT vec_id, v, ($bucketSql) AS cb FROM emb0),
       |q AS (SELECT vec_id AS query_id, v AS qv, cb AS qb FROM emb WHERE $queryPred),
       |scored AS (
       |  SELECT query_id, e.vec_id AS neighbor_id,
       |         round(list_dot_product(qv, v) /
       |               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6)
       |           AS cos_sim
       |  FROM emb e CROSS JOIN q
       |  WHERE $probePredSql),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rk FROM ranked
       |WHERE rk <= $AnnTopK""".stripMargin

  val q51Sql: String = q51SqlFrom("embeddings", "vec_id < 5")

  /** Scalar int8 quantization of an embedding column: per-vector
    * min/max affine map to [0,255] stored as smallint + (lo, scale) —
    * a 4× storage cut for a 100 TB embedding lake (float32 → int8
    * per dim), with dequantization error ≤ scale/2 per dim. Pure
    * column ops (staged min/max/scale so HOF lambdas only read
    * attributes).
    */
  def quantizeInt8(emb: DataFrame, vCol: String = "v"): DataFrame =
    emb.withColumn("__lo", array_min(col(vCol)))
      .withColumn("__hi", array_max(col(vCol)))
      .withColumn("q_scale",
        when(col("__hi") > col("__lo"), (col("__hi") - col("__lo")) / 255d)
          .otherwise(lit(1d)))
      .withColumn("q_lo", col("__lo"))
      .withColumn("q",
        transform(col(vCol), x =>
          round((x - col("q_lo")) / col("q_scale")).cast("smallint")))
      .drop("__lo", "__hi", vCol)

  /** Inverse map: v̂ᵢ = q_lo + qᵢ·q_scale. */
  def dequantizeInt8(q: DataFrame, outCol: String = "v"): DataFrame =
    q.withColumn(outCol,
        transform(col("q"), x => col("q_lo") + x.cast("double") * col("q_scale")))
      .drop("q", "q_lo", "q_scale")

  /** IVF-style coarse quantization (the other standard ANN scale path
    * next to q30's LSH): assign every vector to its nearest of K
    * centroids; search then probes only the query's cell(s).
    *
    * The codebook is KMEANS-TRAINED ([[trainedCodebook]]): Lloyd on a
    * deterministic half-sample of L2-NORMALIZED vectors (normalization
    * is the IVF contract — L2-argmin equals cosine-argmax only on unit
    * vectors, see KMeans.l2Normalize), centroids rounded to 6 decimals
    * per step so the codebook is bit-reproducible across runs and
    * partitionings. The k×64 doubles are collect()ed to the driver and
    * baked into the plan as literals — K is always tiny, so cell
    * assignment happens SCAN-SIDE in one codegen'd pass: no join, no
    * shuffle of the corpus; the only shuffle is the census groupBy on
    * cell id. The oracle SQL is GENERATED from the same literals
    * ([[q36Sql]]), so the hash match verifies assignment + census given
    * the trained codebook; training determinism itself is asserted in
    * KMeansSpec (the property the oracle depends on).
    */
  private val NumCells = 8
  private val TrainIters = 2
  private val CodebookDp = 6

  private val codebooks =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()
  @volatile private var lastCodebook: Array[Array[Double]] = _

  /** Train (memoized per dir) the IVF codebook for the embeddings at
    * `dir`. Deterministic end to end: the training sample is
    * vec_id %% 2 = 0 (at scale: any row-owned hash cut — the codebook
    * needs thousands of points per cell, not the corpus), seeds are the
    * k first vec_ids of the sample, and every step is rounded. */
  def trainedCodebook(s: SparkSession, dir: String): Array[Array[Double]] = {
    val cb = codebooks.computeIfAbsent(dir, _ => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .filter(pmod(col("vec_id"), lit(2)) === 0)
      val dim = emb.filter(col("v").isNotNull)
        .select(max(size(col("v")))).collect()(0).getInt(0)
      val unit = graft.ops.KMeans.l2Normalize(
        graft.ops.KMeans.validVectors(emb, dim))
      graft.ops.KMeans.train(unit, NumCells, TrainIters, roundDp = CodebookDp)
    })
    lastCodebook = cb
    cb
  }

  /** Scan-side IVF cell assignment of column `v` against centroid
    * literals: argmax cosine, ties → lowest cell id. ONE copy of the
    * assignment arithmetic, shared by q36 and the composed q85. */
  def cellExpr(centroids: Array[Array[Double]]): Column = {
    val cosines = array(centroids.map { c =>
      cosine(col("v"), array(c.map(lit).toSeq: _*))
    }.toSeq: _*)
    (array_position(cosines, array_max(cosines)) - 1).cast("int")
  }

  /** Per-cell census of a (vec_id, label, v, cell) frame — the shared
    * tail of q36 and q85. */
  private def cellCensus(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("vec_count"),
        countDistinct(col("label")).as("distinct_labels"),
        min(col("vec_id")).as("min_vec_id"))

  def q36IvfCells(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    cellCensus(emb.withColumn("cell", cellExpr(trainedCodebook(s, dir))))
  }

  /** Locale-independent 6-dp rendering for generated oracle SQL — the
    * `f` interpolator is FORMAT-locale-sensitive, and a JVM with a
    * comma-decimal locale would render `0,123456` (a DuckDB syntax
    * error). `%.6f` prints the 6-dp-rounded double exactly, and DuckDB
    * parses the decimal back to the identical double, so both engines
    * work from bit-equal literals. */
  private def dp6(x: Double): String =
    String.format(java.util.Locale.ROOT, "%.6f", Double.box(x))

  /** The `cents(cid, cv)` relation of the generated ANN oracles:
    * trained-centroid VALUES literals, or the vec_id-seed fallback
    * when no codebook is trained yet (see [[q36Sql]] for why the
    * fallback exists). Shared by q36/q57/q61/q63. */
  private def centsRel(cb: Array[Array[Double]]): String =
    if (cb != null)
      "cents(cid, cv) AS (VALUES " + cb.zipWithIndex.map { case (c, i) =>
        c.map(dp6).mkString(s"($i, [", ", ", "]::DOUBLE[])")
      }.mkString(", ") + ")"
    else s"cents AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id < $NumCells)"

  /** The `books(sub, cid, cv)` relation of the generated PQ oracles:
    * trained-codebook VALUES literals or the seed fallback. Shared by
    * q58/q59/q63. */
  private def booksRel(books: Array[Array[Array[Double]]], subDim: Int): String =
    if (books != null) {
      val rows = for {
        (book, m) <- books.zipWithIndex
        (c, k) <- book.zipWithIndex
      } yield c.map(dp6).mkString(s"($m, $k, [", ", ", "]::DOUBLE[])")
      "books(sub, cid, cv) AS (VALUES " + rows.mkString(", ") + ")"
    } else
      s"""books AS (
         |  SELECT s.sub, e.vec_id AS cid,
         |         list_slice(e.v, s.sub * $subDim + 1, s.sub * $subDim + $subDim) AS cv
         |  FROM emb e CROSS JOIN (SELECT unnest(range($PqM)) AS sub) s
         |  WHERE e.vec_id < $PqK)""".stripMargin

  /** The q36 oracle as a function of the codebook (centroid literals —
    * see [[dp6]]/[[centsRel]] for the bit-equality contract). */
  def q36SqlFor(centroids: Array[Array[Double]]): String = {
    s"""WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |${centsRel(centroids)},
       |scored AS (
       |  SELECT e.vec_id, e.label, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY list_dot_product(e.v, c.cv) /
       |                              (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
       |                              DESC, c.cid ASC) AS rk
       |  FROM emb e CROSS JOIN cents c),
       |assign AS (SELECT vec_id, label, CAST(cid AS INTEGER) AS cell
       |           FROM scored WHERE rk = 1)
       |SELECT cell, count(*) AS vec_count,
       |       count(DISTINCT label) AS distinct_labels,
       |       min(vec_id) AS min_vec_id
       |FROM assign GROUP BY 1""".stripMargin
  }

  /** Oracle SQL for the MOST RECENTLY trained codebook — Verify runs
    * every query before dumping oracle_sql.json, so by dump time the
    * codebook for the verified SF dir is in the memo. If q36 never ran
    * (it crashed mid-verify), fall back to a seed codebook so the dump
    * itself survives — q36's compare is already failed in that case. */
  def q36Sql: String = q36SqlFor(lastCodebook)

  /** IVF top-k SEARCH — the query the q36 index exists for, and the
    * third ANN path next to q29 (exact) and q51 (multi-probe LSH):
    * every query vector probes its nprobe=2 nearest cells and ranks
    * only the corpus vectors ASSIGNED to those cells with the native
    * cosine, keeping the top-3.
    *
    * Plan shape: cell assignment is the same scan-side codegen argmax
    * as q36 (trained-codebook literals, no join, no shuffle); the 5
    * queries with their probe cells broadcast, so the corpus streams
    * through one scan and candidates materialize only inside probed
    * cells. At 100 TB the assignment is a pre-computed partition
    * column of the ANN index and the probe becomes partition pruning —
    * the scan touches nprobe/K of the lake.
    *
    * nprobe=2 spelled as masked argmax: second-best cell = argmax
    * after the best cell's score is replaced with -2 (cosine floor is
    * -1) — first-occurrence tie semantics identical to the oracle's
    * `row_number ... ORDER BY cos DESC, cid ASC`.
    */
  private val NumProbes = 2
  // the Spark side spells exactly two probes (the c1/c2 masked argmax
  // below and in q63); NumProbes parameterizes the oracle's rk cut, so
  // a drift between the two would fail far from the edit
  require(NumProbes == 2, "q57/q63 hardcode the two-probe masked argmax")
  def q57IvfSearch(s: SparkSession, dir: String): DataFrame = {
    val centroids = trainedCodebook(s, dir)
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val cosines = array(centroids.map { c =>
      cosine(col("v"), array(c.map(lit).toSeq: _*))
    }.toSeq: _*)
    val corpus = emb
      .withColumn("cell",
        (array_position(cosines, array_max(cosines)) - 1).cast("int"))
    val withBest = emb.withColumn("cs", cosines)
      .withColumn("c1", (array_position(col("cs"), array_max(col("cs"))) - 1).cast("int"))
    val masked = transform(col("cs"),
      (x, i) => when(i === col("c1"), lit(-2d)).otherwise(x))
    val queries = withBest.filter(col("vec_id") < 5)
      .withColumn("ms", masked)
      .withColumn("c2", (array_position(col("ms"), array_max(col("ms"))) - 1).cast("int"))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(array(col("c1"), col("c2"))).as("probe_cell"))
    val scored = corpus.join(broadcast(queries),
        col("cell") === col("probe_cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cos_sim"))
    scored.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id").asc)))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
  }

  /** q57 oracle from the same codebook literals (see [[q36Sql]] for
    * the fallback rationale). */
  def q57Sql: String = {
    s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${centsRel(lastCodebook)},
       |cellrank AS (
       |  SELECT e.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY list_dot_product(e.v, c.cv) /
       |                              (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
       |                              DESC, c.cid ASC) AS rk
       |  FROM emb e CROSS JOIN cents c),
       |assign AS (SELECT vec_id, CAST(cid AS INTEGER) AS cell FROM cellrank WHERE rk = 1),
       |probes AS (SELECT vec_id AS query_id, CAST(cid AS INTEGER) AS probe_cell
       |           FROM cellrank WHERE rk <= $NumProbes AND vec_id < 5),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN assign a
       |    ON a.cell = p.probe_cell AND a.vec_id <> p.query_id),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |         round(list_dot_product(q.v, n.v) /
       |               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))), 6)
       |           AS cos_sim
       |  FROM cand JOIN emb q ON q.vec_id = query_id
       |            JOIN emb n ON n.vec_id = neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rk FROM ranked WHERE rk <= 3""".stripMargin
  }

  /** Product-quantization census (see [[graft.ops.ProductQuantizer]]):
    * encode every vector as M=8 per-subspace codes against K=16
    * trained centroids each (a 32× storage cut at float32×64 dims) and
    * census the code space — per (subspace, code): population, min
    * vec_id, and the worst per-row reconstruction error (max of
    * per-row ROUNDED distances — an order-free aggregate, so no
    * cross-engine float summation enters the hash).
    *
    * Plan shape: encoding is scan-side codegen over staged subvector
    * columns (literal codebooks, no join); the per-row M structs
    * explode to (vec_id, subspace, code, err) and the ONLY shuffle is
    * the census groupBy on (subspace, code) — M×K=128 groups. At
    * 100 TB the explode never materializes: the encode writes M code
    * columns into the ANN/storage index and this census is its
    * monitoring query.
    */
  private val PqM = 8
  private val PqK = 16
  private val pqBooksMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Double]]]]()
  @volatile private var lastPqBooks: Array[Array[Array[Double]]] = _

  /** Train (memoized per dir) the PQ codebooks — same deterministic
    * recipe as [[trainedCodebook]]: even-vec_id half-sample, rounded
    * Lloyd steps, raw (unnormalized) vectors since PQ quantizes in L2. */
  def pqBooks(s: SparkSession, dir: String): Array[Array[Array[Double]]] = {
    val books = pqBooksMemo.computeIfAbsent(dir, _ => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .filter(pmod(col("vec_id"), lit(2)) === 0)
      val dim = emb.filter(col("v").isNotNull)
        .select(max(size(col("v")))).collect()(0).getInt(0)
      graft.ops.ProductQuantizer.train(emb, dim, PqM, PqK, iters = 2, roundDp = CodebookDp)
    })
    lastPqBooks = books
    books
  }

  def q58PqCensus(s: SparkSession, dir: String): DataFrame = {
    val books = pqBooks(s, dir)
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // ONE native-kernel call per row (graft.functions.PqEncode) — the
    // Column-level unrolled spelling (ProductQuantizer.codeAndErr,
    // kept as the differential-test reference) exceeds janino's method
    // limit at M×K×subDim terms and drops the scan out of codegen.
    emb.select(col("vec_id"),
        posexplode(graft.functions.PqFunctions.pq_encode(col("v"), books))
          .as(Seq("subspace", "s")))
      .select(col("vec_id"), col("subspace"),
        col("s.code").as("code"), round(col("s.dist"), 6).as("err"))
      .groupBy(col("subspace"), col("code"))
      .agg(count(lit(1)).as("vec_count"),
        min(col("vec_id")).as("min_vec_id"),
        max(col("err")).as("max_err"))
  }

  /** q58 oracle from the same codebook literals (fallback rationale:
    * see [[q36Sql]]). The distance is spelled
    * `list_sum(list_transform(...))` — the same left-to-right fold as
    * the unrolled Spark sum, so both engines produce bit-equal
    * doubles from the bit-equal literal centroids. */
  def q58Sql: String = {
    val books = lastPqBooks
    val subDim = if (books != null) books(0)(0).length else 8
    s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${booksRel(books, subDim)},
       |subs AS (
       |  SELECT vec_id, s.sub,
       |         list_slice(v, s.sub * $subDim + 1, s.sub * $subDim + $subDim) AS sv
       |  FROM emb CROSS JOIN (SELECT unnest(range($PqM)) AS sub) s),
       |scored AS (
       |  SELECT vec_id, sub, cid,
       |         list_sum(list_transform(range(1, $subDim + 1),
       |           i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) AS d,
       |         row_number() OVER (PARTITION BY vec_id, sub
       |                            ORDER BY list_sum(list_transform(range(1, $subDim + 1),
       |                              i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) ASC, cid ASC) AS rk
       |  FROM subs JOIN books USING (sub)),
       |assign AS (
       |  SELECT vec_id, CAST(sub AS INTEGER) AS subspace,
       |         CAST(cid AS INTEGER) AS code, round(d, 6) AS err
       |  FROM scored WHERE rk = 1)
       |SELECT subspace, code, count(*) AS vec_count,
       |       min(vec_id) AS min_vec_id, max(err) AS max_err
       |FROM assign GROUP BY 1, 2""".stripMargin
  }

  /** PQ ADC search — asymmetric distance computation, the search the
    * q58 codes exist for: the corpus is ranked WITHOUT decoding, by
    * summing per-subspace distances between the (exact) query
    * subvector and each corpus vector's ASSIGNED CENTROID, looked up
    * from a per-query distance table. Per candidate that is M=8 table
    * lookups + adds instead of D=64 multiply-adds — and the codes are
    * 8 nibbles, so at 100 TB the scan ranks the lake from ~3% of the
    * bytes, reranking only a short exact list (here: pure ADC top-3,
    * its own oracle; q29 is the exact baseline).
    *
    * Plan shape: corpus codes are the q58 scan-side encode (literal
    * codebooks, no join, no shuffle); each query carries its M×K=128
    * distance table, built once per query row before the broadcast —
    * the join then only indexes into it (element_at per subspace).
    */
  def q59PqAdcSearch(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqFunctions
    val books = pqBooks(s, dir)
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // corpus: M scan-side codes from the native kernel, the vector
    // itself dropped (ADC's point — candidates are ranked from codes)
    val coded = emb
      .withColumn("__enc", PqFunctions.pq_encode(col("v"), books))
      .select(col("vec_id") +: (0 until PqM).map(m =>
        element_at(col("__enc"), m + 1).getField("code").as(s"__code$m")): _*)
    // queries: the M×K ADC lookup table built once per query row
    // (native kernel), staged before broadcasting
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        PqFunctions.pq_dist_table(col("v"), books).as("__tabs"))
    val adc = (0 until PqM).map(m =>
      element_at(element_at(col("__tabs"), m + 1), col(s"__code$m") + 1))
      .reduce(_ + _)
    val scored = coded.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(adc, 6).as("adc_dist"))
    scored.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("adc_dist").asc, col("neighbor_id").asc)))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"), col("rk"))
  }

  /** q59 oracle from the same codebook literals: corpus codes and the
    * query-side lookup both recompute the per-subspace distance with
    * the identical list_sum fold, so the summed ADC distance is
    * bit-equal before rounding. */
  def q59Sql: String = {
    val books = lastPqBooks
    val subDim = if (books != null) books(0)(0).length else 8
    s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${booksRel(books, subDim)},
       |subs AS (
       |  SELECT vec_id, s.sub,
       |         list_slice(v, s.sub * $subDim + 1, s.sub * $subDim + $subDim) AS sv
       |  FROM emb CROSS JOIN (SELECT unnest(range($PqM)) AS sub) s),
       |dists AS (
       |  SELECT vec_id, sub, cid,
       |         list_sum(list_transform(range(1, $subDim + 1),
       |           i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) AS d
       |  FROM subs JOIN books USING (sub)),
       |codes AS (
       |  SELECT vec_id, sub, cid AS code
       |  FROM dists
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
       |                             ORDER BY d ASC, cid ASC) = 1),
       |adc AS (
       |  -- list_sum over an ORDER BY sub list = the same left-to-right
       |  -- fold as Spark's m-ordered sum (plain SUM has no row order)
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         round(list_sum(list(qd.d ORDER BY qd.sub)), 6) AS adc_dist
       |  FROM codes c
       |  JOIN (SELECT vec_id FROM emb WHERE vec_id < 5) q ON c.vec_id <> q.vec_id
       |  JOIN dists qd ON qd.vec_id = q.vec_id AND qd.sub = c.sub AND qd.cid = c.code
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adc_dist,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
       |  FROM adc)
       |SELECT query_id, neighbor_id, adc_dist, rk FROM ranked WHERE rk <= 3""".stripMargin
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023 — public
    * arXiv:2303.09540): cluster the corpus with the k-means codebook,
    * then mark as duplicates the vectors whose cosine to a LOWER-id
    * vector in the SAME cluster clears the threshold — the embedding
    * analog of the MinHash→Jaccard ladder, catching paraphrases exact
    * and shingle dedup both miss. Emits the per-cell dedup census
    * (population, dropped, kept).
    *
    * Scale shape: cell assignment is the q36 scan-side codegen argmax
    * (trained literals, no join); the candidate pairs come from a
    * self-join ON THE CELL ID — one shuffle of (vec_id, v, cell), and
    * the quadratic verify runs only within a cell. That within-cell
    * all-pairs is the real SemDeDup algorithm: K is sized to bound the
    * cell population (corpus/K rows), so the per-cell work is bounded
    * and K grows with the corpus, exactly like NumPlanes in q31.
    * Threshold 0.35 for the same near-orthogonal-testdata reason as
    * q31.
    */
  private val SemDedupTau = 0.35
  def q61SemDedup(s: SparkSession, dir: String): DataFrame = {
    val centroids = trainedCodebook(s, dir)
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val cosines = array(centroids.map { c =>
      cosine(col("v"), array(c.map(lit).toSeq: _*))
    }.toSeq: _*)
    val assigned = emb.withColumn("cell",
      (array_position(cosines, array_max(cosines)) - 1).cast("int"))
    val dropped = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(round(cosine(col("a.v"), col("b.v")), 6) >= SemDedupTau)
      .select(col("b.cell").as("cell"), col("b.vec_id").as("drop_id"))
      .groupBy(col("cell"))
      .agg(countDistinct(col("drop_id")).as("dropped"))
    assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("vec_count"), min(col("vec_id")).as("min_vec_id"))
      .join(dropped, Seq("cell"), "left")
      .select(col("cell"), col("vec_count"), col("min_vec_id"),
        coalesce(col("dropped"), lit(0L)).as("dropped_count"),
        (col("vec_count") - coalesce(col("dropped"), lit(0L))).as("kept_count"))
  }

  /** q61 oracle from the same codebook literals (fallback rationale:
    * see [[q36Sql]]). */
  def q61Sql: String = {
    s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${centsRel(lastCodebook)},
       |cellrank AS (
       |  SELECT e.vec_id, e.v, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY list_dot_product(e.v, c.cv) /
       |                              (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
       |                              DESC, c.cid ASC) AS rk
       |  FROM emb e CROSS JOIN cents c),
       |assign AS (SELECT vec_id, v, CAST(cid AS INTEGER) AS cell
       |           FROM cellrank WHERE rk = 1),
       |dropped AS (
       |  SELECT b.cell, count(DISTINCT b.vec_id) AS dropped
       |  FROM assign a JOIN assign b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE round(list_dot_product(a.v, b.v) /
       |              (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
       |        >= $SemDedupTau
       |  GROUP BY 1)
       |SELECT cell, count(*) AS vec_count, min(vec_id) AS min_vec_id,
       |       coalesce(any_value(dropped), 0) AS dropped_count,
       |       count(*) - coalesce(any_value(dropped), 0) AS kept_count
       |FROM assign LEFT JOIN dropped USING (cell)
       |GROUP BY cell""".stripMargin
  }

  /** IVF+PQ search (q63) — the composed ANN stack the separate pieces
    * build toward (the FAISS IVFPQ shape, Jégou et al. 2011): the IVF
    * probe (q57) prunes the corpus to nprobe=2 cells, and PQ ADC (q59)
    * ranks ONLY those candidates from their 8-nibble codes — no
    * full-vector read, no exact distance until an (optional) rerank.
    *
    * Scale shape: both the cell id and the PQ codes are scan-side
    * codegen against literal codebooks (at 100 TB: precomputed index
    * columns, with the cell as the partition key — the probe becomes
    * partition pruning and the scan reads nprobe/K of the lake at ~3%
    * of the bytes). Queries carry their probe cells AND their M×K ADC
    * table in one broadcast row each; the join evaluates 8 array
    * lookups per candidate. One shuffle total (the top-k window on
    * query_id over candidate rows only).
    */
  def q63IvfPqSearch(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqFunctions
    val centroids = trainedCodebook(s, dir)
    val books = pqBooks(s, dir)
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val cosines = array(centroids.map { c =>
      cosine(col("v"), array(c.map(lit).toSeq: _*))
    }.toSeq: _*)
    // corpus: IVF cell + PQ codes in one scan-side pass, vector dropped
    val coded = emb
      .withColumn("cell",
        (array_position(cosines, array_max(cosines)) - 1).cast("int"))
      .withColumn("__enc", PqFunctions.pq_encode(col("v"), books))
      .select(col("vec_id") +: col("cell") +: (0 until PqM).map(m =>
        element_at(col("__enc"), m + 1).getField("code").as(s"__code$m")): _*)
    // queries: nprobe=2 probe cells (masked argmax, q57) + ADC table (q59)
    val withBest = emb.withColumn("cs", cosines)
      .withColumn("c1", (array_position(col("cs"), array_max(col("cs"))) - 1).cast("int"))
    val masked = transform(col("cs"),
      (x, i) => when(i === col("c1"), lit(-2d)).otherwise(x))
    val queries = withBest.filter(col("vec_id") < 5)
      .withColumn("ms", masked)
      .withColumn("c2", (array_position(col("ms"), array_max(col("ms"))) - 1).cast("int"))
      .select(col("vec_id").as("query_id"),
        PqFunctions.pq_dist_table(col("v"), books).as("__tabs"),
        explode(array(col("c1"), col("c2"))).as("probe_cell"))
    val adc = (0 until PqM).map(m =>
      element_at(element_at(col("__tabs"), m + 1), col(s"__code$m") + 1))
      .reduce(_ + _)
    val scored = coded.join(broadcast(queries),
        col("cell") === col("probe_cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(adc, 6).as("adc_dist"))
    scored.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("adc_dist").asc, col("neighbor_id").asc)))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"), col("rk"))
  }

  /** q63 oracle: q57's probe CTEs composed with q59's code/ADC CTEs
    * from the same two codebooks' literals. */
  def q63Sql: String = {
    val books = lastPqBooks
    val subDim = if (books != null) books(0)(0).length else 8
    s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${centsRel(lastCodebook)},
       |${booksRel(books, subDim)},
       |cellrank AS (
       |  SELECT e.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY list_dot_product(e.v, c.cv) /
       |                              (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
       |                              DESC, c.cid ASC) AS rk
       |  FROM emb e CROSS JOIN cents c),
       |assign AS (SELECT vec_id, CAST(cid AS INTEGER) AS cell FROM cellrank WHERE rk = 1),
       |probes AS (SELECT vec_id AS query_id, CAST(cid AS INTEGER) AS probe_cell
       |           FROM cellrank WHERE rk <= $NumProbes AND vec_id < 5),
       |subs AS (
       |  SELECT vec_id, s.sub,
       |         list_slice(v, s.sub * $subDim + 1, s.sub * $subDim + $subDim) AS sv
       |  FROM emb CROSS JOIN (SELECT unnest(range($PqM)) AS sub) s),
       |dists AS (
       |  SELECT vec_id, sub, cid,
       |         list_sum(list_transform(range(1, $subDim + 1),
       |           i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) AS d
       |  FROM subs JOIN books USING (sub)),
       |codes AS (
       |  SELECT vec_id, sub, cid AS code
       |  FROM dists
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
       |                             ORDER BY d ASC, cid ASC) = 1),
       |adc AS (
       |  -- list_sum over an ORDER BY sub list = the same left-to-right
       |  -- fold as Spark's m-ordered sum (plain SUM has no row order)
       |  SELECT p.query_id, c.vec_id AS neighbor_id,
       |         round(list_sum(list(qd.d ORDER BY qd.sub)), 6) AS adc_dist
       |  FROM codes c
       |  JOIN assign a ON a.vec_id = c.vec_id
       |  JOIN probes p ON a.cell = p.probe_cell AND c.vec_id <> p.query_id
       |  JOIN dists qd ON qd.vec_id = p.query_id AND qd.sub = c.sub AND qd.cid = c.code
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adc_dist,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
       |  FROM adc)
       |SELECT query_id, neighbor_id, adc_dist, rk FROM ranked WHERE rk <= 3""".stripMargin
  }

  /** Embedding-cosine near-duplicate detection (the embedding leg of
    * the dedup ladder), END-TO-END: candidate pairs come from q30's
    * hyperplane buckets — self-join on the full 8-plane code, so pairs
    * materialize only inside buckets, never all-pairs — then each
    * candidate is verified with the native codegen'd cosine.
    *
    * Scale shape: ONE shuffle of (vec_id, v, bucket) on the bucket
    * code; within a bucket the comparisons are local. A pair exists in
    * exactly one bucket (the code is the whole signature, not per-band
    * like q44), so no distinct is needed. NumPlanes scales with corpus
    * size in production (2^planes buckets must keep per-bucket
    * cardinality bounded); 8 planes fits the testdata.
    *
    * The synthetic embeddings are near-orthogonal (max pairwise cosine
    * ~0.44), so a realistic 0.99 cut matches nothing — the 0.35
    * threshold keeps the verified set non-empty and the check
    * meaningful.
    */
  def q31EmbeddingNearDups(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val bucketed = emb.withColumn("bucket", bucketCode(col("v")))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.bucket").as("bucket"),
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine(col("a.v"), col("b.v")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.35)
  }
  /** [[q31Sql]] over an arbitrary embeddings relation — the
    * verifiedPairsSqlCtes pattern, vector edition (the q219 vacuum
    * oracle passes the live-rows subquery). */
  def q31SqlFrom(from: String): String =
    s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $from),
       |bucketed AS (SELECT vec_id, v, ($bucketSql) AS bucket FROM emb)
       |SELECT a.bucket AS bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round(list_dot_product(a.v, b.v) /
       |             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
       |         AS cos_sim
       |FROM bucketed a JOIN bucketed b
       |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE round(list_dot_product(a.v, b.v) /
       |            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
       |      >= 0.35""".stripMargin

  val q31Sql: String = q31SqlFrom("embeddings")

  /** The composed EMBEDDING pipeline (q85) — the third composed
    * pipeline next to text-dedup (q50) and curation (q84), covering
    * the vector side of corpus prep end-to-end in ONE plan:
    *  1. near-dup dedup: q31's pair query VERBATIM (shared code, not
    *     a re-spelling) — any vector appearing as the larger id of a
    *     near-dup pair is dropped. NOTE this is STRICTER than
    *     SemDeDup's keep-lowest greedy on non-transitive chains
    *     (a–b, b–c similar but a–c not: greedy would restore c after
    *     dropping b; this drops both — the conservative choice for a
    *     dedup pass, and deterministic on both engines).
    *  2. IVF shard manifest: q36's cell assignment via the shared
    *     [[cellExpr]]/[[cellCensus]] helpers — the manifest an ANN
    *     index builder shards by.
    *
    * Scale review: the pair stage is the bucketed self-join (one
    * shuffle on bucket; pairs only inside buckets); the anti-join is
    * vec_id-keyed against the (small) dominated set; assignment is
    * scan-side argmax against K broadcast-literal centroids; the
    * census is a K-row rollup. No stage touches corpus vectors
    * pairwise outside buckets.
    */
  def q85EmbeddingManifest(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val dominated = q31EmbeddingNearDups(s, dir)
      .select(col("vec_b").as("vec_id")).distinct()
    val kept = emb.join(dominated, Seq("vec_id"), "left_anti")
    cellCensus(kept.withColumn("cell", cellExpr(trainedCodebook(s, dir))))
  }

  def q85SqlFor(centroids: Array[Array[Double]]): String =
    s"""WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |bucketed AS (SELECT vec_id, v, ($bucketSql) AS bucket FROM emb),
       |dominated AS (
       |  SELECT DISTINCT b.vec_id FROM bucketed a JOIN bucketed b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE round(list_dot_product(a.v, b.v) /
       |              (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
       |        >= 0.35),
       |kept AS (
       |  SELECT * FROM emb
       |  WHERE vec_id NOT IN (SELECT vec_id FROM dominated)),
       |${centsRel(centroids)},
       |scored AS (
       |  SELECT e.vec_id, e.label, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY list_dot_product(e.v, c.cv) /
       |                              (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
       |                              DESC, c.cid ASC) AS rk
       |  FROM kept e CROSS JOIN cents c),
       |assign AS (SELECT vec_id, label, CAST(cid AS INTEGER) AS cell
       |           FROM scored WHERE rk = 1)
       |SELECT cell, count(*) AS vec_count,
       |       count(DISTINCT label) AS distinct_labels,
       |       min(vec_id) AS min_vec_id
       |FROM assign GROUP BY 1""".stripMargin

  def q85Sql: String = q85SqlFor(lastCodebook)

  // ------------------------------------------- embedding validation

  /** Expected embedding dimensionality for the validation census. */
  val ExpectedDim = 64

  /** Embedding validation census (q94) — the expectation checks a
    * pipeline runs BEFORE trusting a vector column with dedup/ANN
    * work: per label, how many vectors are null, mis-dimensioned,
    * carry NaNs, or are all-zero (cosine against a zero vector is
    * undefined — every downstream kernel here assumes it away), and
    * how many pass everything. On healthy testdata the failure
    * columns are all zero — the census proves the ASSUMPTION, and
    * any future generator drift breaks the hash, not a downstream
    * query three stages later.
    *
    * Scale shape: pure scan-side predicates (array HOFs inside
    * codegen) + one hash-agg on label — the cheapest full-corpus
    * pass there is; no joins, no windows.
    */
  def q94EmbeddingValidation(s: SparkSession, dir: String): DataFrame = {
    val nullVec = col("embedding").isNull
    val wrongDim = !nullVec && size(col("embedding")) =!= ExpectedDim
    val hasNan = !nullVec && expr("exists(embedding, x -> isnan(x))")
    val zeroNorm = !nullVec && !hasNan &&
      expr("!exists(embedding, x -> x != cast(0.0 as float))")
    val ok = !nullVec && !wrongDim && !hasNan && !zeroNorm
    Tables.embeddings(s, dir)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        count(when(nullVec, lit(1))).as("null_vecs"),
        count(when(wrongDim, lit(1))).as("wrong_dim"),
        count(when(hasNan, lit(1))).as("has_nan"),
        count(when(zeroNorm, lit(1))).as("zero_norm"),
        count(when(ok, lit(1))).as("ok_vecs"))
  }
  val q94Sql: String =
    s"""SELECT label, count(*) AS n_vectors,
       |  count(CASE WHEN embedding IS NULL THEN 1 END) AS null_vecs,
       |  count(CASE WHEN embedding IS NOT NULL
       |             AND len(embedding) <> $ExpectedDim THEN 1 END) AS wrong_dim,
       |  count(CASE WHEN embedding IS NOT NULL
       |             AND len(list_filter(embedding, x -> isnan(x))) > 0
       |        THEN 1 END) AS has_nan,
       |  count(CASE WHEN embedding IS NOT NULL
       |             AND len(list_filter(embedding, x -> isnan(x))) = 0
       |             AND len(list_filter(embedding, x -> x <> 0)) = 0
       |        THEN 1 END) AS zero_norm,
       |  count(CASE WHEN embedding IS NOT NULL
       |             AND len(embedding) = $ExpectedDim
       |             AND len(list_filter(embedding, x -> isnan(x))) = 0
       |             AND len(list_filter(embedding, x -> x <> 0)) > 0
       |        THEN 1 END) AS ok_vecs
       |FROM embeddings GROUP BY 1""".stripMargin

  /** Label-centroid similarity matrix (q110): per-label mean vectors
    * and the pairwise cosine between them — the cluster-separation
    * diagnostic run after any labeling/clustering pass (two labels
    * whose centroids sit at cosine ≈ 1 are one cluster wearing two
    * names; a label far from every other is either signal or garbage).
    * Emits the upper triangle (label_a < label_b), 45 rows for 10
    * labels.
    *
    * Scale shape: the corpus-scale work is ONE pass — posexplode to
    * (label, pos, v) feeds a hash-aggregate whose key space is
    * O(labels × dim) regardless of corpus size (map-side combine
    * collapses each partition to its local centroid partials before
    * the shuffle). The pairwise matrix then runs on the O(labels×dim)
    * aggregate — the all-pairs step never sees a row of the corpus.
    * Malformed vectors (wrong dim / NaN, the q94 census's reds) are
    * filtered with the q94 predicate so one poisoned vector cannot
    * NaN an entire centroid.
    *
    * Float discipline: centroids are rounded to 7 digits BEFORE the
    * cosine (killing cross-engine last-ulp drift from summation
    * order), and the cosine to 5 — double guard, same convention as
    * q33's round-before-hash.
    */
  def q110LabelCentroidSim(s: SparkSession, dir: String): DataFrame =
    centroidSimFrom(centroidPartialsOf(Tables.embeddings(s, dir))
      .select(col("label"), col("pos"),
        round(col("s") / col("n"), 7).as("c")))

  /** Per-label centroid partials (label, pos, Σv, n) with the q94
    * malformed-vector filter — the vector-valued SUM-mergeable state
    * the q165 monitor lands per batch. sum+count is exactly what the
    * batch `avg()` partial-aggregates internally, made persistent:
    * centroid-of-union = Σ of merged Σs over Σ of merged counts. */
  private[graft] def centroidPartialsOf(emb: DataFrame): DataFrame =
    emb.filter(size(col("embedding")) === ExpectedDim &&
        !expr("exists(embedding, x -> isnan(x))"))
      .select(col("label"), posexplode(col("embedding")))
      .toDF("label", "pos", "v")
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))

  /** The q110 pairwise tail over a (label, pos, c) centroid frame —
    * ONE definition shared with the incremental twin (q165) so the
    * matrix math can't drift between the batch census and the
    * monitor's snapshot. */
  private[graft] def centroidSimFrom(cent: DataFrame): DataFrame = {
    val a = cent.select(col("label").as("label_a"), col("pos"),
      col("c").as("ca"))
    val b = cent.select(col("label").as("label_b"), col("pos"),
      col("c").as("cb"))
    a.join(b, Seq("pos")).filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(round(sum(col("ca") * col("cb")) /
        (sqrt(sum(col("ca") * col("ca"))) * sqrt(sum(col("cb") * col("cb")))),
        5).as("centroid_cos"))
  }
  val q110Sql: String =
    s"""WITH ok AS (
       |  SELECT label, embedding FROM embeddings
       |  WHERE len(embedding) = $ExpectedDim
       |    AND len(list_filter(embedding, x -> isnan(x))) = 0),
       |dims AS (
       |  SELECT label, g.i AS pos, embedding[g.i] AS v
       |  FROM ok CROSS JOIN generate_series(1, $ExpectedDim) AS g(i)),
       |cent AS (SELECT label, pos, round(avg(v), 7) AS c
       |         FROM dims GROUP BY 1, 2)
       |SELECT a.label AS label_a, b.label AS label_b,
       |       round(sum(a.c * b.c) /
       |             (sqrt(sum(a.c * a.c)) * sqrt(sum(b.c * b.c))), 5)
       |         AS centroid_cos
       |FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
       |GROUP BY 1, 2""".stripMargin

  // -------------------------------------------------- hard negatives (q124)

  /** Hard-negative mining (q124): the contrastive-training data op —
    * for each anchor vector (every 50th id), the top-5 most-similar
    * vectors carrying a DIFFERENT label. High-cosine/wrong-label
    * neighbors are exactly the "hard negatives" an embedding model
    * trains against (easy random negatives teach nothing); this
    * manifest is what a contrastive batch builder consumes.
    *
    * Scale shape: q29's exactly — the anchor set is tiny and
    * BROADCAST, so the corpus streams map-side through one scan (the
    * label filter rides inside the broadcast join condition, pruning
    * before the dot product); per-anchor top-5 is a window group
    * limit, not a global sort. At real scale the anchor set is a
    * training batch (hundreds) — still broadcast-sized — and the
    * brute-force scan flips to the q57 IVF probe with the label
    * predicate applied inside each cell.
    */
  def q124HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val anchors = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
        col("v").as("qv"))
    val scored = emb.join(broadcast(anchors), col("label") =!= col("a_label"))
      .select(col("anchor_id"), col("vec_id").as("neg_id"),
        round(cosine(col("qv"), col("v")), 6).as("cos_sim"))
    scored.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("anchor_id"))
          .orderBy(col("cos_sim").desc, col("neg_id").asc)))
      .filter(col("rk") <= 5)
      .select(col("anchor_id"), col("neg_id"), col("cos_sim"), col("rk"))
  }
  val q124Sql: String =
    """WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
      |             FROM embeddings),
      |a AS (SELECT vec_id AS anchor_id, label AS a_label, v AS qv
      |      FROM emb WHERE vec_id % 50 = 0),
      |scored AS (
      |  SELECT anchor_id, e.vec_id AS neg_id,
      |         round(list_dot_product(qv, v) /
      |               (sqrt(list_dot_product(qv, qv)) *
      |                sqrt(list_dot_product(v, v))), 6) AS cos_sim
      |  FROM emb e CROSS JOIN a WHERE e.label <> a.a_label),
      |ranked AS (
      |  SELECT anchor_id, neg_id, cos_sim,
      |         row_number() OVER (PARTITION BY anchor_id
      |                            ORDER BY cos_sim DESC, neg_id ASC) AS rk
      |  FROM scored)
      |SELECT anchor_id, neg_id, cos_sim, rk FROM ranked WHERE rk <= 5""".stripMargin

  // -------------------------------------------------- rank fusion (q123)

  /** Reciprocal-rank fusion (q123): hybrid retrieval's merge step —
    * the corpus is ranked twice, lexically (q62's BM25 top-10 over the
    * documents table) and semantically (cosine top-10 against anchor
    * vector 0 over the paired embeddings), and the two rankings fuse
    * by RRF: score(d) = Σ 1/(60+rank_list(d)), the standard k=60
    * fusion — spelled in integer micros (1000000 div (60+rk)) so
    * nothing float crosses the engine boundary. Docs missing from a
    * list contribute 0 and report rank −1. This is the retrieval-side
    * twin of the curation dedup ladder: every RAG pipeline runs
    * exactly this merge between its keyword and vector indexes.
    *
    * Scale shape: fusion consumes two ALREADY-REDUCED top-K manifests
    * (each K rows — broadcast-trivial); the heavy lifting is inside
    * the member rankings, which keep their own audited plans (q62:
    * one scan + broadcast stats cross; cosine: broadcast anchor,
    * map-side scan). The full-outer join over two K-row frames is
    * noise at any scale — the POINT is that fusion never touches the
    * corpus again.
    */
  def q123RrfFusion(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col("doc_id").asc)
    val bm = Text.q62Bm25(s, dir)
      .withColumn("bm_rk", row_number().over(w))
      .select(col("doc_id"), col("bm_rk"))
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val anchor = emb.filter(col("vec_id") === 0)
      .select(col("v").as("qv"))
    // reduce FIRST (TakeOrdered, like the bm side's q62), THEN rank
    // the ≤10 survivors — a bare row_number window here would funnel
    // the whole scored corpus through one task
    val cosTop = Shapes.topK(
        emb.crossJoin(broadcast(anchor))
          .select(col("vec_id"),
            round(cosine(col("qv"), col("v")), 6).as("cs")),
        10, col("cs").desc, col("vec_id").asc)
      .withColumn("cos_rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cs").desc, col("vec_id").asc)))
      .select(col("vec_id").as("doc_id"), col("cos_rk"))
    bm.join(cosTop, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("bm_rk"), lit(-1)).as("bm_rk"),
        coalesce(col("cos_rk"), lit(-1)).as("cos_rk"),
        (coalesce(expr("1000000 div (60 + bm_rk)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + cos_rk)"), lit(0L)))
          .as("rrf_micros"))
  }
  lazy val q123Sql: String =
    s"""WITH bm AS (
       |  SELECT doc_id,
       |         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS bm_rk
       |  FROM (${Text.q62Sql})),
       |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |anchor AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
       |cos AS (
       |  SELECT vec_id AS doc_id,
       |         row_number() OVER (ORDER BY
       |           round(list_dot_product(qv, v) /
       |             (sqrt(list_dot_product(qv, qv)) *
       |              sqrt(list_dot_product(v, v))), 6) DESC, vec_id ASC)
       |           AS cos_rk
       |  FROM emb CROSS JOIN anchor
       |  QUALIFY cos_rk <= 10)
       |SELECT coalesce(bm.doc_id, cos.doc_id) AS doc_id,
       |       coalesce(bm.bm_rk, -1) AS bm_rk,
       |       coalesce(cos.cos_rk, -1) AS cos_rk,
       |       coalesce(1000000 // (60 + bm.bm_rk), 0)
       |         + coalesce(1000000 // (60 + cos.cos_rk), 0) AS rrf_micros
       |FROM bm FULL OUTER JOIN cos ON bm.doc_id = cos.doc_id""".stripMargin

  // -------------------------------------------------- ANN recall (q129)

  /** ANN recall census (q129): the index-quality audit — per query,
    * the multi-probe LSH search's (q51) candidate count and how many
    * of the exact top-3 (q29) it recovered. recall@3 and the
    * candidate fraction are THE two numbers an ANN deployment tunes
    * between (probe more buckets → recall up, candidates up); this
    * census is the measured trade at the current 8-plane/Hamming-1
    * config. Everything integer: hits, candidates, recall in
    * thirds-as-pct (hits·100 div 3).
    *
    * Scale shape: both member searches keep their audited plans (one
    * corpus scan each, broadcast queries, WindowGroupLimit); the
    * census joins their K-row outputs plus an O(queries) candidate
    * count — nothing here rescans the corpus. At 100 TB recall is
    * estimated on a query SAMPLE exactly this way (exact top-k on the
    * sample is the expensive-but-bounded ground-truth pass).
    */
  def q129AnnRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("cb", bucketCode(col("v")))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("cb").as("qb"))
    val cands = multiprobeCandidates(emb, queries)
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("candidates"))
    val hits = q29CosineTopK(s, dir).select(col("query_id"), col("neighbor_id"))
      .join(q51MultiprobeAnn(s, dir).select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    // anchor on the query set: a query whose probe finds ZERO
    // candidates must still report (0, 0), not vanish
    queries.select(col("query_id"))
      .join(cands, Seq("query_id"), "left")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("candidates"), lit(0L)).as("candidates"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall_pct", expr("hits * 100 div 3"))
  }
  val q129Sql: String =
    s"""WITH exact AS ($q29Sql),
       |probe AS ($q51Sql),
       |emb0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |embc AS (SELECT vec_id, ($bucketSql) AS cb FROM emb0),
       |qs AS (SELECT vec_id AS query_id, cb AS qb FROM embc WHERE vec_id < 5),
       |cand AS (
       |  SELECT query_id, count(*) AS candidates
       |  FROM embc e CROSS JOIN qs q
       |  WHERE $probePredSql
       |  GROUP BY 1),
       |h AS (
       |  SELECT e.query_id, count(*) AS hits
       |  FROM exact e JOIN probe p
       |    ON e.query_id = p.query_id AND e.neighbor_id = p.neighbor_id
       |  GROUP BY 1)
       |SELECT qs.query_id,
       |       coalesce(c.candidates, 0) AS candidates,
       |       coalesce(h.hits, 0) AS hits,
       |       coalesce(h.hits, 0) * 100 // 3 AS recall_pct
       |FROM qs LEFT JOIN cand c ON qs.query_id = c.query_id
       |        LEFT JOIN h ON qs.query_id = h.query_id""".stripMargin

  /** Retrieval MRR (q143): q129's recall told us IF the multiprobe
    * search finds the exact neighbors; this asks WHERE — the rank the
    * ANN ranking assigns to the true (exact-scan) nearest neighbor,
    * and the reciprocal rank in integer ppm (10⁶ ÷ rank; 0 = the true
    * top-1 never surfaced in the ANN top-3). MRR is the eval metric
    * retrieval tiers actually report, and the rank-0 rows are the
    * queries whose probe set needs widening (q51's nprobe knob).
    *
    * Scale shape: both members keep their audited plans (exact scan =
    * broadcast-query cross; probe = Hamming-1 bucket predicate); the
    * MRR join itself runs on two O(queries × K) manifests — the q123
    * rule: eval fuses whatever top-K manifests the retrieval tier
    * already produced, and never rescans the corpus.
    */
  def q143RetrievalMrr(s: SparkSession, dir: String): DataFrame = {
    val truth = q29CosineTopK(s, dir).filter(col("rk") === 1)
      .select(col("query_id"), col("neighbor_id").as("true_top1"))
    val ann = q51MultiprobeAnn(s, dir)
      .select(col("query_id"), col("neighbor_id"), col("rk"))
    truth.join(ann,
        truth("query_id") === ann("query_id") &&
          col("true_top1") === ann("neighbor_id"), "left")
      .select(truth("query_id"), col("true_top1"),
        coalesce(col("rk"), lit(0)).cast("long").as("ann_rank"))
      .withColumn("rr_ppm",
        when(col("ann_rank") > 0, expr("1000000 div ann_rank"))
          .otherwise(lit(0L)))
  }
  val q143Sql: String =
    s"""WITH exact AS ($q29Sql),
       |probe AS ($q51Sql),
       |truth AS (
       |  SELECT query_id, neighbor_id AS true_top1 FROM exact WHERE rk = 1)
       |SELECT t.query_id, t.true_top1,
       |       CAST(coalesce(p.rk, 0) AS BIGINT) AS ann_rank,
       |       CASE WHEN coalesce(p.rk, 0) > 0
       |            THEN 1000000 // coalesce(p.rk, 0) ELSE 0 END AS rr_ppm
       |FROM truth t LEFT JOIN probe p
       |  ON t.query_id = p.query_id AND t.true_top1 = p.neighbor_id""".stripMargin

  /** Graded ranking quality (q205) — the third member of the
    * retrieval-eval triad: q129 asks IF the true neighbors surface
    * (recall), q143 asks WHERE the single best one lands (MRR), this
    * asks how good the WHOLE returned ranking is — an nDCG-style
    * score where each ANN hit earns a graded gain (K+1 − exact_rank,
    * clamped at 0: the exact scan's #1 is worth K, #K worth 1, misses
    * 0) discounted by the position the ANN put it at. The discount is
    * LINEAR-RECIPROCAL in integer permille (1000 div rank) rather
    * than the textbook log₂ — deliberately: the metric stays exact
    * integer arithmetic end-to-end, so the oracle comparison is
    * hash-exact instead of float-tolerant, and the ranking it induces
    * over queries is the same monotone story. The gain base and the
    * ideal DCG ([[AnnIdcgPm]] — gains in perfect order under the same
    * discount) both derive from [[AnnTopK]], the SAME constant that
    * cuts the q29/q51 manifests this metric fuses, so a K retune
    * adapts the metric instead of silently corrupting it; the
    * greatest(0, ·) clamp makes an exact rank past the gain base
    * (possible only if the manifests' K outgrows the metric's) score
    * 0 loudly rather than go negative. Queries whose probe set came
    * back empty still report (dcg 0) — an eval that silently drops
    * its failures isn't one.
    *
    * Scale shape: the q123/q143 rule — eval fuses the two O(queries ×
    * K) top-K manifests the retrieval tier already produced (exact =
    * broadcast-query cross, probe = Hamming-1 bucket predicate) and
    * never rescans the corpus; the join keys on (query, neighbor),
    * the rollup is O(queries). */
  def q205RankingQuality(s: SparkSession, dir: String): DataFrame = {
    val exact = q29CosineTopK(s, dir)
      .select(col("query_id"), col("neighbor_id"), col("rk").as("ek"))
    val probe = q51MultiprobeAnn(s, dir)
      .select(col("query_id"), col("neighbor_id"), col("rk"))
    val dcg = probe.join(exact, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"),
        (greatest(coalesce(lit(AnnTopK + 1) - col("ek"), lit(0)), lit(0))
          .cast("long") * expr("1000 div rk")).as("part"))
      .groupBy(col("query_id"))
      .agg(sum(col("part")).as("dcg"))
    exact.select(col("query_id")).distinct()
      .join(dcg, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("dcg"), lit(0L)).as("dcg"))
      .withColumn("ndcg_pm", expr(s"dcg * 1000 div $AnnIdcgPm"))
  }
  val q205Sql: String =
    s"""WITH exact AS ($q29Sql),
       |probe AS ($q51Sql),
       |g AS (
       |  SELECT p.query_id,
       |         greatest(coalesce(${AnnTopK + 1} - e.rk, 0), 0)
       |           * (1000 // p.rk) AS part
       |  FROM probe p LEFT JOIN exact e
       |    ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id),
       |d AS (SELECT query_id, CAST(sum(part) AS BIGINT) AS dcg
       |      FROM g GROUP BY 1),
       |qs AS (SELECT DISTINCT query_id FROM exact)
       |SELECT qs.query_id, coalesce(d.dcg, 0) AS dcg,
       |       coalesce(d.dcg, 0) * 1000 // $AnnIdcgPm AS ndcg_pm
       |FROM qs LEFT JOIN d USING (query_id)""".stripMargin
}
