package graft.sinks

import org.apache.spark.sql.DataFrame
import java.util.Properties

/** JDBC result-table sinks with the reference's semantics
  * (reference Consumer.scala:282-320), generalized:
  *
  * - The reference's `writeToPostgres` drops and recreates each table
  *   every micro-batch (`mode("overwrite")`, Consumer.scala:290-292)
  *   and serializes ALL queries' writes behind one JVM-global lock
  *   (Consumer.scala:10) while swallowing every exception
  *   (Consumer.scala:296-298). Kept here verbatim-in-spirit as
  *   `overwriteLocked` for parity demos.
  * - `appendBatch` mirrors `appendToPostgres` (Consumer.scala:302-320)
  *   with the same at-least-once semantics note.
  * - `upsertStaged` is the scale-correct variant: write the batch to a
  *   staging table and atomically swap — per-table serialization only,
  *   no cross-query global lock, no window where readers see an empty
  *   table (the reference's drop-and-recreate has one).
  *
  * Runtime-tested against embedded Derby (ships with Spark's jars;
  * in-JVM, `jdbc:derby:memory:...`) in JdbcSpec — no server process
  * needed. Postgres itself stays untestable in this container, but
  * the sink paths (Spark's df.write.jdbc + the swap transaction) are
  * the same code; only the swap DDL dialect differs (see
  * [[swapStatements]]).
  */
object JdbcSinks {

  /** Cross-thread write serialization, as in the reference — a single
    * JVM-global lock shared by every query thread. Only needed because
    * drop-and-recreate isn't transactional; upsertStaged does not use
    * it. */
  private val globalWriteLock = new Object

  def props(user: String, password: String, driver: String = "org.postgresql.Driver"): Properties = {
    val p = new Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p.setProperty("driver", driver)
    p
  }

  /** Reference-faithful: drop-and-recreate per batch under the global
    * lock, exceptions logged and swallowed (Consumer.scala:282-300). */
  def overwriteLocked(df: DataFrame, url: String, table: String, p: Properties): Unit =
    globalWriteLock.synchronized {
      try {
        df.write.mode("overwrite").jdbc(url, table, p)
        println(s"[graft] ✓ overwrote $table")
      } catch {
        case e: Exception => println(s"[graft] ✗ write $table failed: ${e.getMessage}")
      }
    }

  /** Reference-faithful append (Consumer.scala:302-320). With
    * checkpointing this is at-least-once: replayed batches duplicate
    * rows — readers must dedup on (keys, batch_id). */
  def appendBatch(df: DataFrame, url: String, table: String, p: Properties): Unit =
    globalWriteLock.synchronized {
      try {
        df.write.mode("append").jdbc(url, table, p)
        println(s"[graft] ✓ appended to $table")
      } catch {
        case e: Exception => println(s"[graft] ✗ append $table failed: ${e.getMessage}")
      }
    }

  /** Scale-correct replacement: stage + swap. Readers never observe a
    * dropped table; a failed staging write leaves the live table
    * untouched. Serialized PER TABLE (concurrent upserts to the same
    * table would race on the shared staging name), not across queries.
    * Statements are issued one-by-one inside an explicit transaction —
    * portable across JDBC drivers (multi-statement strings are a
    * Postgres-ism). Note: the swap replaces the table object, so
    * table-attached objects (indexes, grants) must be managed by the
    * reader side or re-applied post-swap.
    */
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The stage→live swap DDL, per dialect. Postgres (and most engines)
    * take `DROP TABLE IF EXISTS` + `ALTER TABLE .. RENAME TO`; Derby
    * has neither — existence is probed via JDBC metadata and the
    * rename is the two-name `RENAME TABLE` form. */
  private def swapStatements(url: String, conn: java.sql.Connection,
                             staging: String, table: String): Seq[String] =
    if (url.startsWith("jdbc:derby")) {
      val exists = {
        val rs = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
        try rs.next() finally rs.close()
      }
      (if (exists) Seq(s"DROP TABLE $table") else Nil) :+
        s"RENAME TABLE $staging TO $table"
    } else Seq(
      s"DROP TABLE IF EXISTS $table",
      s"ALTER TABLE $staging RENAME TO $table")

  def upsertStaged(df: DataFrame, url: String, table: String, p: Properties): Unit = {
    val lock = tableLocks.computeIfAbsent(s"$url#$table", _ => new Object)
    lock.synchronized {
      val staging = s"${table}_staging"
      df.write.mode("overwrite").jdbc(url, staging, p)
      val conn = java.sql.DriverManager.getConnection(url, p)
      try {
        conn.setAutoCommit(false)
        val st = conn.createStatement()
        try {
          swapStatements(url, conn, staging, table).foreach(st.execute)
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally st.close()
      } finally conn.close()
    }
  }
}
