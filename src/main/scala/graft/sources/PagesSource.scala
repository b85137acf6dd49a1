package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
  * `numPartitions` (default 4).
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
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new PagesScan(
      o.getInt("pages", options.getInt("pages", 100)),
      o.getInt("productsPerPage", options.getInt("productsPerPage", 100)),
      o.getInt("numPartitions", options.getInt("numPartitions", 4)))
}

private case class PagesInputPartition(startPage: Int, endPage: Int,
                                       productsPerPage: Int) extends InputPartition

private class PagesScan(pages: Int, productsPerPage: Int, numPartitions: Int)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = PagesSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-pages(pages=$pages, productsPerPage=$productsPerPage)"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, math.min(numPartitions, pages))
    (0 until n).map { p =>
      val start = (p.toLong * pages / n).toInt   // Long math: p*pages can
      val end = ((p + 1).toLong * pages / n).toInt // overflow Int at ~2^31
      PagesInputPartition(start, end, productsPerPage): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
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
}
