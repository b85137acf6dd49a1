package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Prop, Test => SCTest}

class MinHashSpec extends SparkSpec {
  import spark.implicits._

  private def check(minTests: Int)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  /** Driver-side reference: the same affine family over the md5 word,
    * written independently of the kernel's loop structure. */
  private def reference(shingles: Seq[String], k: Int): Option[Seq[Long]] = {
    if (shingles.isEmpty) None
    else Some((0 until k).map { j =>
      shingles.map { g =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8"))
        val x = java.lang.Long.parseLong(
          d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
        (MinHashKernel.A(j) * x + MinHashKernel.B(j)) % MinHashKernel.Prime
      }.min
    })
  }

  test("kernel matches the reference implementation (property)") {
    check(20)(Prop.forAll { (docs: List[List[String]]) =>
      val df = docs.map(_.filter(_.nonEmpty)).zipWithIndex
        .map { case (sh, i) => (i.toLong, sh) }.toDF("id", "sh")
      val out = df.select(col("id"),
        MinHashFunctions.minhash_bands(col("sh"), 8).as("mh"))
        .collect().map(r => r.getLong(0) ->
          Option(r.getSeq[Long](1))).toMap
      docs.map(_.filter(_.nonEmpty)).zipWithIndex.forall { case (sh, i) =>
        out(i.toLong) == reference(sh, 8).map(_.toSeq)
      }
    })
  }

  test("fused n-gram path equals shingles() + minhash_bands on the corpus") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("fused", MinHashFunctions.ngram_minhash_bands(col("toks"), 3, 8))
      .withColumn("staged", MinHashFunctions.minhash_bands(
        graft.ops.TextOps.shingles(col("toks"), 3), 8))
      .select((col("fused") <=> col("staged")).as("eq"))
      .collect()
    assert(d.nonEmpty)
    d.foreach(r => assert(r.getBoolean(0)))
  }

  test("interpreted eval agrees with codegen") {
    val sh = Seq((1L, Seq("a b c", "b c d", "c d e")))
    val df = sh.toDF("id", "sh")
      .select(MinHashFunctions.minhash_bands(col("sh"), 8).as("mh"))
    // force interpreted path via eval() on the expression directly
    val expr = MinHashBands(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("a b c", "b c d", "c d e"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)), 8)
    val interpreted = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val codegen = df.collect()(0).getSeq[Long](0)
    assert(interpreted.toSeq === codegen)
  }

  test("empty shingle array yields null, not an 8-long sentinel row") {
    val df = Seq((1L, Seq.empty[String]), (2L, Seq("x y z")))
      .toDF("id", "sh")
      .select(col("id"), MinHashFunctions.minhash_bands(col("sh"), 8).as("mh"))
    val rows = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rows(1L) && !rows(2L))
  }

  test("null elements are skipped like array_min; all-null array yields null") {
    val df = Seq(
      (1L, Seq(Option("x y z"), None, Option("a b c"))),
      (2L, Seq(Option.empty[String], None)))
      .toDF("id", "sh")
      .select(col("id"), MinHashFunctions.minhash_bands(col("sh"), 8).as("mh"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1)))).toMap
    assert(rows(2L).isEmpty)
    assert(rows(1L).get === reference(Seq("x y z", "a b c"), 8).get)
  }

  test("values stay in [0, P) — no overflow anywhere in the family") {
    check(20)(Prop.forAll { (sh: List[String]) =>
      sh.filter(_.nonEmpty).isEmpty || {
        val vals = reference(sh.filter(_.nonEmpty), 8).get
        vals.forall(v => v >= 0L && v < MinHashKernel.Prime)
      }
    })
  }

  test("SQL via GraftExtensions injection works (session built with the extension)") {
    // SparkSpec's session sets spark.sql.extensions=graft.GraftExtensions,
    // so this exercises the REAL injected builders — including the
    // es(1).eval() literal extraction for the hash count
    val out = sql("SELECT minhash_bands(array('a b c', 'b c d'), 8) AS mh")
      .collect()(0).getSeq[Long](0)
    assert(out.length === 8)
    assert(out === reference(Seq("a b c", "b c d"), 8).get)
    val hp = sql("SELECT hyperplane_code(array(1.0D, -2.0D, 3.0D)) AS c")
      .collect()(0).getLong(0)
    assert(hp >= 0L && hp < 256L)
  }

  test("SQL minhash_bands rejects a non-literal hash count with an analysis error") {
    // a column as k would otherwise hit eval() on an unbound reference
    // and surface as a raw NPE at plan time
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      sql("SELECT minhash_bands(array('a b c'), id) FROM range(3)").collect()
    }
    assert(e.getCondition === "NON_FOLDABLE_ARGUMENT", e.getMessage)
    // null literal: foldable but not a Number — same clean error
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      sql("SELECT minhash_bands(array('a b c'), NULL)").collect()
    }
    assert(e2.getCondition === "NON_FOLDABLE_ARGUMENT", e2.getMessage)
  }
}
