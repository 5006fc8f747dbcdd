package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 facade over the consolidated-`.npy` row reader — the
  * fifth mount sibling (HDF5 / Arrow / zarr / netCDF-3 / npy), for the
  * embedding-matrix shape (2-D `<f4`, the faiss/np dump):
  *
  * {{{
  * spark.read.format("graft.sources.NpyDataSource")
  *   .option("path", "/data/emb/STAR.npy")   // file, glob, or s3a://-style URI
  *   .load()                                 // (path, row, embedding)
  *   .where($"row" < n)                      // RANGE PUSHDOWN prunes row ranges
  *   //          ^ NOTE: npy's pushable index column is `row` (its
  *   //          row-major surface), NOT the grid mounts' `idx`/`dK` —
  *   //          a `WHERE idx ...` here is just an unknown column; a
  *   //          filter on a non-pushable column stays residual and
  *   //          CORRECT but plans every row batch
  *   .select("row")                          // COLUMN PRUNING: no payload reads
  * }}}
  *
  * Split planning is pure arithmetic: the v1.0 header fixes
  * offset(row) = dataOffset + row * dim * 4, so the driver reads ONE
  * 64-byte-aligned header per file and slices closed-form row ranges
  * into InputPartitions — zero exchanges in scan->filter->project, no
  * metadata walk at all. `path` equality + IN filters and `row` range
  * predicates push into the PLAN phase (pruned files' headers are never
  * read; out-of-range row batches are never planned) and stay
  * residual. Projections without `embedding` emit row indexes from the
  * range arithmetic — payload bytes are never read. Byte access goes
  * through [[ByteStore]] (`file://`/`hdfs://`/`s3a://` URIs mount
  * identically). Rows-per-task is clamped so a task's byte count always
  * fits one buffer, whatever the matrix width.
  *
  * Non-`<f4`/non-2-D/fortran/big-endian arrays reject loudly at plan
  * time, same as [[Npy.readRows]].
  */
class NpyDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NpyDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NpyTable(properties.get("path"),
      Option(properties.get("rowsPerTask")).map(_.toInt).getOrElse(4096))
}

object NpyDataSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("row", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false)))
}

class NpyTable(path: String, rowsPerTask: Int) extends Table with SupportsRead {
  require(path != null, "graft-npy needs a path option")
  require(rowsPerTask > 0, s"graft-npy: rowsPerTask must be positive, got $rowsPerTask")
  override def name(): String = s"graft-npy[$path]"
  override def schema(): StructType = NpyDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MountScanBuilder(NpyDataSource.schema, Set("path"), Set("row")) {
      override def build(): Scan = new NpyScan(path, rowsPerTask, required, pushed)
    }
}

/** One partition = contiguous row ranges of one file. */
case class NpyRowPartition(path: String, dim: Int, dataOffset: Long,
    rowStart: Long, rowEnd: Long) extends InputPartition

class NpyScan(path: String, rowsPerTask: Int, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-npy scan $path cols=${required.fieldNames.mkString(",")} " +
      s"pushed=${pushed.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val range = MountDsv2.idxRange(pushed, col = "row")
    val paths = HDF5ChunkIngest.resolvePaths(path)
      .filter(MountDsv2.keep(pushed, "path", _))
    paths.flatMap { p =>
      val in = ByteStore.open(p)
      val meta = try Npy.readMeta(in) finally in.close()
      require(meta.descr == "<f4" && meta.shape.size == 2,
        s"graft-npy: $p is not a 2-D <f4 array (${meta.descr} ${meta.shape})")
      val nRows = meta.shape.head
      val dim = meta.shape(1).toInt
      require(dim > 0, s"graft-npy: $p has a zero-width row (dim $dim)")
      // clamp rows-per-task so a task's payload (rows * dim * 4 bytes)
      // always fits one Int-sized buffer — a wide matrix (dim ~131k at
      // the default 4096 rows) would otherwise overflow the byte count
      val maxRows = math.max(1L, (Int.MaxValue.toLong - 8) / (dim.toLong * 4))
      val step = math.min(rowsPerTask.toLong, maxRows)
      (0L until nRows by step)
        .map(s => (s, math.min(s + step, nRows)))
        // row ranges ARE the idx windows — exact prune, filter residual
        .filter { case (s, e) => range.intersects(s, e - 1) }
        .map { case (s, e) =>
          NpyRowPartition(p, dim, meta.dataOffset, s, e): InputPartition
        }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NpyReaderFactory(required, MountDsv2.confSnapshot())
}

class NpyReaderFactory(required: StructType, hadoopOverrides: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    ByteStore.install(hadoopOverrides) // executor JVMs have no session
    val t = partition.asInstanceOf[NpyRowPartition]
    val needEmb = required.fieldNames.contains("embedding")
    new PartitionReader[InternalRow] {
      private val pathU = UTF8String.fromString(t.path)
      private def row(r: Long, emb: GenericArrayData): InternalRow = {
        val out = new Array[Any](required.length)
        var i = 0
        while (i < required.length) {
          out(i) = required.fields(i).name match {
            case "path" => pathU
            case "row" => r
            case "embedding" => emb
          }
          i += 1
        }
        new GenericInternalRow(out)
      }
      private val rows: Iterator[InternalRow] =
        if (!needEmb)
          // index-only projection: pure range arithmetic, no file I/O
          (t.rowStart until t.rowEnd).iterator.map(row(_, null))
        else {
          val in = ByteStore.open(t.path)
          try {
            // plan time clamps the range so this always fits an Int;
            // keep the loud guard in case a partition was hand-built
            val nL = (t.rowEnd - t.rowStart) * t.dim.toLong * 4
            require(nL > 0 && nL <= Int.MaxValue - 8,
              s"graft-npy: task byte count $nL exceeds one buffer " +
                s"(rows ${t.rowStart}..${t.rowEnd}, dim ${t.dim})")
            val b = in.readFully(t.dataOffset + t.rowStart * t.dim * 4, nL.toInt)
            val bb = java.nio.ByteBuffer.wrap(b)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            (t.rowStart until t.rowEnd).iterator.map { r =>
              val base = ((r - t.rowStart) * t.dim).toInt
              row(r, new GenericArrayData(
                Array.tabulate(t.dim)(j => bb.getFloat((base + j) * 4))))
            }.toIndexedSeq.iterator
          } finally in.close()
        }
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { cur = rows.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
