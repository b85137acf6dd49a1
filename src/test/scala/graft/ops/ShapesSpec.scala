package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Prop, Test => SCTest}

class ShapesSpec extends SparkSpec {
  import spark.implicits._

  private def check(minTests: Int)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  test("bucketize: whitelist case-normalized, everything else UNKNOWN") {
    val df = Seq("a", "B", "x", "E").toDF("g")
      .select(Shapes.bucketize(col("g"), Seq("a", "b", "c", "d", "e")).as("b"))
    assert(rowsOf(df) === Seq(Seq("A"), Seq("B"), Seq("E"), Seq("UNKNOWN")))
  }

  test("bucketize law: output is always in whitelist ∪ {UNKNOWN} (property)") {
    check(20)(Prop.forAll { (xs: List[String]) =>
      val inputs = xs.filter(_ != null)
      inputs.isEmpty || {
        val out = inputs.toDF("g")
          .select(Shapes.bucketize(col("g"), Seq("a", "b")).as("b"))
          .collect().map(_.getString(0)).toSet
        out.subsetOf(Set("A", "B", "UNKNOWN"))
      }
    })
  }

  test("firstTagStripped strips 2-3 letter lang prefixes only") {
    val df = Seq(Seq("en:snacks"), Seq("fra:chips"), Seq("abcd:keep"), Seq("plain"))
      .toDF("tags").select(Shapes.firstTagStripped(col("tags")).as("t"))
    assert(rowsOf(df) === Seq(Seq("abcd:keep"), Seq("chips"), Seq("plain"), Seq("snacks")))
  }

  test("topNPlusOther: OTHER bucket sums the remainder; no OTHER row when all fit") {
    val counts = Seq(("a", 5L), ("b", 4L), ("c", 3L), ("d", 1L)).toDF("k", "cnt")
    val out = rowsOf(Shapes.topNPlusOther(counts, "k", "cnt", 2))
    assert(out === Seq(Seq("OTHER", "4"), Seq("a", "5"), Seq("b", "4")))
    val all = rowsOf(Shapes.topNPlusOther(counts, "k", "cnt", 10))
    assert(all.size === 4 && !all.exists(_.head == "OTHER"))
  }

  test("topNPlusOther plans with TakeOrderedAndProject, never a single-partition window") {
    val counts = Seq(("a", 5L), ("b", 4L), ("c", 3L), ("d", 1L)).toDF("k", "cnt")
    val plan = Shapes.topNPlusOther(counts, "k", "cnt", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }

  test("topNPlusOther boundaries: all-null remainder emits no OTHER; n=0 emits full total") {
    val withNulls = Seq(("a", Some(5L)), ("b", None), ("c", None))
      .toDF("k", "cnt")
    val out1 = Shapes.topNPlusOther(withNulls, "k", "cnt", 1).collect()
    assert(out1.map(_.getString(0)).toSet === Set("a"),
      "null-count rows below the cut must not produce an OTHER row")
    val plain = Seq(("a", 5L), ("b", 3L)).toDF("k", "cnt")
    val out2 = Shapes.topNPlusOther(plain, "k", "cnt", 0).collect()
    assert(out2.length === 1)
    assert(out2(0).getString(0) === "OTHER" && out2(0).getLong(1) === 8L)
  }

  test("topNPlusOther conserves the total count (property)") {
    check(10)(Prop.forAll { (xs: Map[Int, Short], nRaw: Byte) =>
      val n = math.max(1, math.abs(nRaw.toInt) % 6)
      xs.isEmpty || {
        val counts = xs.toSeq.map { case (k, v) =>
          (k.toString, math.abs(v.toLong)) }.toDF("k", "cnt")
        val out = Shapes.topNPlusOther(counts, "k", "cnt", n)
          .agg(sum("cnt")).collect()(0).getLong(0)
        out == xs.values.map(v => math.abs(v.toLong)).sum
      }
    })
  }

  test("groupCount conservation under explode (property)") {
    check(10)(Prop.forAll { (xs: List[List[Int]]) =>
      xs.isEmpty || xs.forall(_.isEmpty) || {
        val df = xs.toDF("arr").select(explode(col("arr")).as("x"))
        val total = Shapes.groupCount(df, Seq("x"), "c")
          .agg(sum("c")).collect()(0).getLong(0)
        total == xs.map(_.size).sum
      }
    })
  }

  test("argmaxPerGroup picks per-group max with deterministic tie-break") {
    val df = Seq(("g1", "x", 5), ("g1", "a", 5), ("g2", "z", 1))
      .toDF("g", "name", "v")
    val out = rowsOf(Shapes.argmaxPerGroup(df, "g",
      Seq(col("v").desc, col("name").asc)))
    assert(out === Seq(Seq("g1", "a", "5"), Seq("g2", "z", "1")))
  }

  test("observed counters ride the producing job — no extra scan, exact values") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("quality", graft.ops.TextOps.qualityBucket(
        graft.ops.TextOps.tokens(col("text")), col("n_chars")))
    val (observedDf, obs) = Shapes.observed(docs, "quality_gate",
      count(lit(1)).as("total"),
      count(when(col("quality") === "ok", 1)).as("kept"),
      count(when(col("quality") =!= "ok", 1)).as("dropped"))
    // ONE action materializes both the survivor count and the metrics
    val survivors = observedDf.filter(col("quality") === "ok").count()
    val m = obs.get
    assert(m("kept") === survivors)
    assert(m("total").asInstanceOf[Long] ===
      m("kept").asInstanceOf[Long] + m("dropped").asInstanceOf[Long])
    // independent recount agrees — the counters are exact, not sampled
    assert(m("total") === docs.count())
  }
}
