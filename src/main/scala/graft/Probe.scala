package graft

import org.apache.spark.sql.SparkSession

/** Throwaway perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val spark = t("session") {
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false").getOrCreate()
    }
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    t("read+count")(println(spark.read.parquet(s"$dir/lineitem.parquet").count()))
    t("groupByCount")(println(Parity1.run(spark, dir)))
    t("groupByCount2")(println(Parity1.run(spark, dir)))
    spark.stop()
  }
  object Parity1 {
    def run(s: SparkSession, d: String): Long =
      graft.queries.Parity.q1GradeDist(s, d).count()
  }
}
