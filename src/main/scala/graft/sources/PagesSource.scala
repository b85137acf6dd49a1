package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructField, StructType, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Custom DataSourceV2 batch source: deterministic OpenFoodFacts-shaped
  * producer pages (one row per page, `value: string` — exactly the
  * shape the reference's Kafka topic carries, reference
  * Producer.scala:39-43), so `spark.read.format("graft-pages")`
  * composes directly with FoodPipeline.parsePage.
  *
  * Demonstrates the full source extension surface: TableProvider →
  * Table(SupportsRead) → ScanBuilder → Batch → InputPartition splits →
  * PartitionReaderFactory → per-partition readers. The page range is
  * split evenly across `numPartitions` InputPartitions, so generation
  * is executor-parallel — the same splitting contract a real
  * paginated-API or object-store source would implement at scale
  * (each executor pulls only its page range; no driver funnel).
  *
  * Options: `pages` (default 100), `productsPerPage` (default 100),
  * `numPartitions` (default 4), `pagesPerTrigger` (default 10,
  * streaming only).
  *
  * STREAMING: the same table also implements MICRO_BATCH_READ — the
  * checkpointable offset IS the page number, so
  * `spark.readStream.format("graft-pages")` replays the topic the way
  * the reference's Kafka consumer does, with `pagesPerTrigger` as the
  * admission-controlled batch size (SupportsAdmissionControl — the
  * restart-safe form: the next batch's end offset derives from the
  * CHECKPOINTED start offset, never from driver-local mutable state,
  * so crash-and-restart resumes mid-topic exactly like Kafka's
  * maxOffsetsPerTrigger).
  */
class PagesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pages"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagesSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagesTable(new CaseInsensitiveStringMap(properties))
}

object PagesSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType, nullable = false)))

  private val grades = Array("a", "b", "c", "d", "e", "zz", null)

  def productJson(i: Long): String = {
    val g = grades((i % grades.length).toInt)
    val gs = if (g == null) "null" else s""""$g""""
    s"""{"row":{"nutriscore_grade":$gs,"categories_tags":["en:cat${i % 50}"],""" +
      s""""nutriments":[{"name":"sugars","value":${i % 90}.5}],""" +
      s""""product_name":[{"lang":"main","text":"Product $i"}],""" +
      s""""packaging_tags":["en:box"],"brands_tags":["en:brand${i % 200}"],""" +
      s""""additives_tags":["en:e${100 + i % 30}"],""" +
      s""""nova_groups_tags":["en:${1 + i % 4}-group"]}}"""
  }

  def pageJson(page: Int, productsPerPage: Int): String =
    // Long global index: page * productsPerPage overflows Int past
    // ~21M pages × 100, which would feed grades() a negative index
    (0 until productsPerPage)
      .map(i => productJson(page.toLong * productsPerPage + i))
      .mkString("""{"rows":[""", ",", "]}")
}

private class PagesTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_pages"
  override def schema(): StructType = PagesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new PagesScan(
      o.getInt("pages", options.getInt("pages", 100)),
      o.getInt("productsPerPage", options.getInt("productsPerPage", 100)),
      o.getInt("numPartitions", options.getInt("numPartitions", 4)),
      o.getInt("pagesPerTrigger", options.getInt("pagesPerTrigger", 10)))
}

private case class PagesInputPartition(startPage: Int, endPage: Int,
                                       productsPerPage: Int) extends InputPartition

private object PagesReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagesInputPartition]
    new PartitionReader[InternalRow] {
      private var page = p.startPage - 1
      override def next(): Boolean = { page += 1; page < p.endPage }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(
          PagesSource.pageJson(page, p.productsPerPage)))
      override def close(): Unit = ()
    }
  }
}

/** Page-range split shared by the batch and micro-batch paths. */
private object PagesSplits {
  def split(startPage: Int, endPage: Int, numPartitions: Int,
            productsPerPage: Int): Array[InputPartition] = {
    val span = endPage - startPage
    if (span <= 0) return Array.empty
    val n = math.max(1, math.min(numPartitions, span))
    (0 until n).map { p =>
      // Long math: p*span can overflow Int at ~2^31
      val s = startPage + (p.toLong * span / n).toInt
      val e = startPage + ((p + 1).toLong * span / n).toInt
      PagesInputPartition(s, e, productsPerPage): InputPartition
    }.toArray
  }
}

/** Streaming offset: "pages [0, page) have been made available". */
private case class PageOffset(page: Int) extends Offset {
  override def json(): String = page.toString
}

private class PagesScan(pages: Int, productsPerPage: Int, numPartitions: Int,
                        pagesPerTrigger: Int)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = PagesSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-pages(pages=$pages, productsPerPage=$productsPerPage)"

  override def planInputPartitions(): Array[InputPartition] =
    PagesSplits.split(0, pages, numPartitions, productsPerPage)

  override def createReaderFactory(): PartitionReaderFactory = PagesReaderFactory

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PagesMicroBatchStream(pages, productsPerPage, numPartitions, pagesPerTrigger)
}

/** Micro-batch stream over the page range: offsets are page numbers.
  * Admission control derives each batch's end from the checkpointed
  * START offset (`min(start + pagesPerTrigger, pages)`) — no mutable
  * driver state, so recovery resumes exactly where the checkpoint
  * says, the property Kafka's maxOffsetsPerTrigger has. */
private class PagesMicroBatchStream(pages: Int, productsPerPage: Int,
                                    numPartitions: Int, pagesPerTrigger: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  require(pagesPerTrigger > 0,
    s"pagesPerTrigger must be positive, got $pagesPerTrigger") // 0 would
  // make latestOffset == start: 'no new data', AvailableNow exits empty

  // the topic is bounded and static, so AvailableNow's "offset at
  // prepare time" is simply `pages` — nothing to snapshot
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): Offset = PageOffset(0)
  override def deserializeOffset(json: String): Offset = PageOffset(json.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // the default limit IS the pacing contract; latestOffset honors
  // whatever limit the engine actually passes (Trigger.Once passes
  // allAvailable and must get everything in one batch)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(pagesPerTrigger)
  override def reportLatestOffset(): Offset = PageOffset(pages)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[PageOffset].page
    // Long math: from + step can overflow Int near Int.MaxValue pages
    PageOffset(math.min(from.toLong + stepFor(limit), pages.toLong).toInt)
  }

  /** Pages admitted under an engine-requested ReadLimit. Composite
    * limits (minRows paired with maxRows — what Trigger.AvailableNow
    * composes) are honored by their tightest maxRows component, the
    * same extraction Kafka's source does; a composite with no max
    * bound admits everything (a min-only bound never throttles). */
  private def stepFor(limit: ReadLimit): Long = limit match {
    case rl: streaming.ReadMaxRows => rl.maxRows()
    case _: streaming.ReadAllAvailable => pages.toLong
    case c: streaming.CompositeReadLimit =>
      val maxes = c.getReadLimits.collect { case rl: streaming.ReadMaxRows => rl.maxRows() }
      if (maxes.nonEmpty) maxes.min else pages.toLong
    case _ => pagesPerTrigger.toLong
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    PagesSplits.split(start.asInstanceOf[PageOffset].page,
      end.asInstanceOf[PageOffset].page, numPartitions, productsPerPage)

  override def createReaderFactory(): PartitionReaderFactory = PagesReaderFactory
}
