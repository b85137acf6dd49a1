package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashPositionsSpec extends SparkSpec {
  import spark.implicits._

  test("hash_positions equals the composed conv/substring/md5 spelling (both users)") {
    // q68's cmsBucket family over corpus tokens
    val tok = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split($"text", " ")).as("t")).filter($"t" =!= "")
    val cms = tok.select(
      (HashPositionsFunctions.hash_positions($"t",
        graft.queries.Stats.CmsD, graft.queries.Stats.CmsW) <=>
        array((0 until graft.queries.Stats.CmsD)
          .map(i => graft.queries.Stats.cmsBucket(i, $"t")): _*)).as("eq"))
      .collect()
    assert(cms.nonEmpty)
    cms.foreach(r => assert(r.getBoolean(0)))
    // q73's bloomPos family over integer keys cast to string
    val keys = graft.Tables.supplier(spark, "/root/testdata/sf0.001")
      .select($"s_suppkey")
    val bloom = keys.select(
      (HashPositionsFunctions.hash_positions($"s_suppkey".cast("string"),
        graft.queries.Relational.BloomK, graft.queries.Relational.BloomWords * 32L) <=>
        array((0 until graft.queries.Relational.BloomK)
          .map(j => graft.queries.Relational.bloomPos(j, $"s_suppkey")): _*)).as("eq"))
      .collect()
    assert(bloom.nonEmpty)
    bloom.foreach(r => assert(r.getBoolean(0)))
  }

  test("null key yields null; empty string hashes; interpreted == codegen") {
    val df = Seq(Some("a"), Some(""), None).toDF("k")
      .select($"k", HashPositionsFunctions.hash_positions($"k", 3, 256L).as("ps"))
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    assert(df(null) === null)
    assert(df("").length === 3)
    assert(df("a").forall(p => p >= 0 && p < 256))
    // interpreted path (eval) agrees with the codegen'd column result
    import org.apache.spark.unsafe.types.UTF8String
    val interp = HashPositions(
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString("a"),
        org.apache.spark.sql.types.StringType), 3, 256L)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(interp === df("a"))
  }
}
