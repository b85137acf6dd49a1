package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The driver's testdata generator has shipped events.ts under THREE
  * encodings across rounds: int64 nanoseconds (rounds 1-4, needing the
  * nanosAsLong legacy flag), then parquet timestamp[us] without a
  * timezone (TIMESTAMP_NTZ, round 5+). Round 5 lost q17 to that drift
  * — NTZ→DOUBLE casts are illegal in Spark 4 — so this spec pins the
  * contract: every ts-consuming query family returns IDENTICAL results
  * over all encodings we have seen plus the instant-typed (LTZ) one,
  * via Tables.events' normalization and type-tolerant query casts.
  */
class TsEncodingSpec extends SparkSpec {

  private lazy val encodings: Seq[(String, String)] = {
    val base = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    def write(name: String, df: org.apache.spark.sql.DataFrame): (String, String) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_ts_$name")
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      name -> dir.toString
    }
    Seq(
      write("ntz", base), // the round-5+ shape, as shipped
      write("ltz", base.withColumn("ts", col("ts").cast("timestamp_ltz"))),
      // the rounds-1-4 shape: int64 epoch nanos
      write("nanos", base.withColumn("ts",
        (unix_micros(col("ts").cast("timestamp_ltz")) * 1000L).as("ts"))))
  }

  test("events.ts encodings: nanos / NTZ / LTZ all yield identical query results") {
    def results(dir: String): Map[String, Seq[Seq[String]]] = Map(
      "q16" -> rowsOf(Events.q16HourlyEventStats(spark, dir)),
      "q17" -> rowsOf(Events.q17UserSessions(spark, dir)),
      "q19" -> rowsOf(Events.q19FirstEventPerUserType(spark, dir)),
      "q90" -> rowsOf(Events.q90RateAnomaly(spark, dir)))
    val all = encodings.map { case (name, dir) => name -> results(dir) }
    val (refName, ref) = all.head
    all.tail.foreach { case (name, got) =>
      got.foreach { case (q, rows) =>
        assert(rows === ref(q), s"$q drifted between ts encodings $refName and $name")
      }
    }
  }

  test("Tables.events normalizes the long-nanos encoding to a timestamp column") {
    val dir = encodings.find(_._1 == "nanos").get._2
    val dt = Tables.events(spark, dir).schema("ts").dataType
    assert(dt.typeName.startsWith("timestamp"), s"got $dt")
  }
}
