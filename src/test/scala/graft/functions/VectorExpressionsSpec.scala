package graft.functions

import graft.SparkSpec
import graft.queries.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  val vecs = Seq(
    (1L, Seq(1.0, 0.0, 2.0), Seq(3.0, 4.0, 0.5)),
    (2L, Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0)), // zero norm
    (3L, Seq(1.0, 1.0, 1.0), Seq(1.0, 1.0, 1.0))  // identical → cos 1
  ).toDF("id", "a", "b")

  test("dot_product matches hand computation and codegen runs") {
    val out = vecs.select(col("id"),
      VectorFunctions.dot_product(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === 1.0 * 3 + 0 * 4 + 2 * 0.5)
    assert(out(2L) === 0.0)
    assert(out(3L) === 3.0)
  }

  test("cosine_similarity: zero-norm guarded to 0.0, identical vectors → 1.0") {
    val out = vecs.select(col("id"),
      VectorFunctions.cosine_similarity(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(2L) === 0.0)
    assert(math.abs(out(3L) - 1.0) < 1e-12)
  }

  test("native expression agrees with the HOF reference implementation") {
    val native = vecs.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    val hof = vecs.filter(col("id") =!= 2L) // HOF form yields NaN on zero norm
      .select(Similarity.cosineHof(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(native(0) - hof(0)) < 1e-12)
    assert(math.abs(native(2) - hof(1)) < 1e-12)
  }

  test("null inputs propagate null (expression is null-intolerant)") {
    val df = Seq((Some(Seq(1.0)), None: Option[Seq[Double]])).toDF("a", "b")
    val out = df.select(VectorFunctions.dot_product(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
  }

  test("GraftExtensions: functions injected at session build, no register() call") {
    // vector_norm and simhash_agg exist ONLY via spark.sql.extensions
    val n = sql("SELECT vector_norm(array(3.0d, 4.0d)) AS n").collect()(0).getDouble(0)
    assert(math.abs(n - 5.0) < 1e-12)
    val h = sql("SELECT simhash_agg(c) FROM VALUES (5L), (5L) AS t(c)")
      .collect()(0).getLong(0)
    assert(h === 5L) // both rows vote the same bits
  }

  test("SQL registration: cosine_similarity usable from spark.sql") {
    VectorFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs_tmp")
    val r = sql("SELECT cosine_similarity(a, b) AS c FROM vecs_tmp WHERE id = 3")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("whole-stage codegen: plan does not fall back for the native expression") {
    // parquet-backed scan (LocalTableScan of a Seq bypasses codegen entirely)
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val plan = emb.select(VectorFunctions.cosine_similarity(col("v"), col("v")))
      .queryExecution.executedPlan.toString
    // `*(n)` marks a whole-stage-codegen'd operator in simpleString —
    // the Project evaluating the native expression must carry it
    // (the HOF transform() Project in the same plan does not).
    assert("\\*\\(\\d+\\) Project \\[cosinesimilarity".r.findFirstIn(plan).isDefined, plan)
  }
}
