package graft.functions

import graft.SparkSpec
import graft.ops.TextOps
import org.apache.spark.sql.functions._

class LexiconSpec extends SparkSpec {
  import spark.implicits._

  test("marker_count equals the HOF filter+size spelling for every marker set") {
    val sets = Seq(TextOps.enMarkers, TextOps.deMarkers,
      TextOps.frMarkers, TextOps.esMarkers)
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", split($"text", " "))
      .select(sets.zipWithIndex.map { case (m, i) =>
        (LexiconFunctions.marker_count($"toks", m) ===
          TextOps.markerCountHof($"toks", m)).as(s"eq$i")
      }: _*)
      .collect()
    assert(d.nonEmpty)
    d.foreach(r => (0 until sets.size).foreach(i => assert(r.getBoolean(i))))
  }

  test("lexicon_sum equals the map-literal aggregate fold, misses take the default") {
    val (table, oov) = graft.queries.Text.surprisalTable(
      spark, "/root/testdata/sf0.001")
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", split($"text", " "))
      .select((LexiconFunctions.lexicon_sum($"toks", table.toMap, oov) ===
        graft.queries.Text.q64FoldHof($"toks", table, oov)).as("eq"))
      .collect()
    assert(d.nonEmpty)
    d.foreach(r => assert(r.getBoolean(0)))
    // an out-of-vocab token takes the default
    val miss = Seq(Seq("___never-a-token___", table.head._1)).toDF("toks")
      .select(LexiconFunctions.lexicon_sum($"toks", table.toMap, oov))
      .collect()(0).getLong(0)
    assert(miss === oov + table.head._2)
  }
}
