package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))

  test("int8 round-trip error is bounded by scale/2 per dimension") {
    val q = Similarity.quantizeInt8(emb)
    val back = Similarity.dequantizeInt8(q, "vhat")
      .join(emb, "vec_id")
    val maxErrOverHalfScale = back
      .join(Similarity.quantizeInt8(emb).select(col("vec_id"), col("q_scale")), "vec_id")
      .select(aggregate(
        zip_with(col("v"), col("vhat"), (a, b) => abs(a - b)),
        lit(0d), (acc, e) => greatest(acc, e)).as("max_err"),
        col("q_scale"))
      .filter(col("max_err") > col("q_scale") / 2 + 1e-9)
      .count()
    assert(maxErrOverHalfScale === 0)
  }

  test("quantized codes fit int8 range and constant vectors survive (scale guard)") {
    val withConst = emb.limit(5).unionByName(
      Seq((9999L, Seq.fill(64)(0.5))).toDF("vec_id", "v"))
    val q = Similarity.quantizeInt8(withConst)
    val bad = q.select(explode(col("q")).as("c"))
      .filter(col("c") < 0 || col("c") > 255).count()
    assert(bad === 0)
    val const = Similarity.dequantizeInt8(
      q.filter(col("vec_id") === 9999L), "vhat")
      .select(explode(col("vhat")).as("x")).collect().map(_.getDouble(0))
    assert(const.forall(x => math.abs(x - 0.5) < 1e-9))
  }

  test("cosine ranking is approximately preserved after quantization") {
    val q5 = Similarity.quantizeInt8(emb.filter(col("vec_id") < 50))
    val deq = Similarity.dequantizeInt8(q5, "v")
    val exact = Similarity.q29CosineTopK(spark, "/root/testdata/sf0.001")
      .filter(col("rk") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // top-1 neighbor within the 50-vector sample, recomputed on
    // dequantized vectors, matches the exact top-1 where both defined
    val queries = deq.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val approx = deq.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        Similarity.cosine(col("qv"), col("v")).as("s"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("s").desc, col("nid").asc)))
      .filter(col("rk") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = approx.count { case (q, n) =>
      exact.get(q).forall(en => en == n || en >= 50) }
    assert(agree >= 4, s"approx=$approx exact=$exact") // ≥4 of 5 top-1s stable
  }
}
