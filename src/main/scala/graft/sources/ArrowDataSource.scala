package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 facade over the [[ArrowIpc]] FILE-format reader — the
  * idiomatic mount point, so Arrow stores read like any other format:
  *
  * {{{
  * spark.read.format("graft.sources.ArrowDataSource")
  *   .option("path", "/data/store")     // dir of .arrow files, or one file
  *   .load()
  *   .select("doc_id", "lang")          // COLUMN PRUNING reaches the decode
  * }}}
  *
  * Split planning: one InputPartition per (file, record-batch block) —
  * the footer block map is the metadata phase (KBs per file, read at
  * plan time), so a single consolidated file still fans out
  * batch-per-task, and `.explain` shows the partition count as the
  * parallelism observable. Column pruning
  * (`SupportsPushDownRequiredColumns`) flows into
  * [[ArrowIpc.readBlockProjected]]: unwanted columns' buffers are
  * skipped positionally, their bytes never touched — at 100 TB a
  * 2-column projection of a 40-column interchange store decodes 2
  * columns, not 40. Dictionary blocks decode once per reader.
  */
class ArrowDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = ArrowDataSource.resolve(options.get("path"))
    ArrowIpc.readFooterWithDicts(files.head)._1
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ArrowTable(properties.get("path"), schema)
}

object ArrowDataSource {
  /** A `.arrow` file, or a directory of them — local path or
    * `file://`/`s3a://`-style URI (listed through [[ByteStore]]). */
  private[sources] def resolve(path: String): Seq[String] = {
    require(path != null, "graft-arrow needs a path option")
    val files =
      if (ByteStore.isDirectory(path))
        ByteStore.list(path)
          .filter(e => !e.isDir && e.name.endsWith(".arrow"))
          .map(_.path).sorted
      else if (ByteStore.isFile(path))
        // absolute for plain paths: partitions ship to executors
        Seq(if (ByteStore.hasScheme(path)) path
            else new java.io.File(path).getAbsolutePath)
      else Seq.empty
    require(files.nonEmpty, s"graft-arrow: no .arrow files at $path")
    files
  }
}

class ArrowTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-arrow[$path]"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowScanBuilder(path, tableSchema)
}

class ArrowScanBuilder(path: String, tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new ArrowScan(path, tableSchema, required)
}

/** One partition per footer record-batch block; dictionary blocks ride
  * along (flattened) so readers need no driver round-trip. */
case class ArrowBlockPartition(file: String, offset: Long, metaLen: Int,
    bodyLen: Long, dictBlocks: Seq[(Long, Int, Long)]) extends InputPartition

class ArrowScan(path: String, tableSchema: StructType, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-arrow scan $path cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    ArrowDataSource.resolve(path).flatMap { f =>
      val (sch, blocks, dictBlocks) = ArrowIpc.readFooterWithDicts(f)
      require(sch == tableSchema,
        s"graft-arrow: $f schema differs from the table's")
      val dicts = dictBlocks.map(b => (b.offset, b.metaLen, b.bodyLen))
      blocks.map(b => ArrowBlockPartition(f, b.offset, b.metaLen, b.bodyLen, dicts))
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowReaderFactory(tableSchema, required, MountDsv2.confSnapshot())
}

/** Ships to executors; encoders/dictionaries build lazily per reader. */
class ArrowReaderFactory(tableSchema: StructType, required: StructType,
    hadoopOverrides: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    ByteStore.install(hadoopOverrides) // executor JVMs have no session
    val p = partition.asInstanceOf[ArrowBlockPartition]
    new PartitionReader[InternalRow] {
      private lazy val toInternal =
        ExpressionEncoder(RowEncoder.encoderFor(required)).createSerializer()
      private lazy val rows = {
        val dicts = ArrowIpc.readDictBlocks(p.file, tableSchema,
          p.dictBlocks.map { case (o, m, b) => ArrowIpc.Block(o, m, b) })
        ArrowIpc.readBlockProjected(p.file, tableSchema, required,
          ArrowIpc.Block(p.offset, p.metaLen, p.bodyLen), dicts)
      }
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!rows.hasNext) false
        else { row = toInternal(rows.next()).copy(); true }
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
