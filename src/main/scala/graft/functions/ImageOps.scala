package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Image math (C7/C8) on tensor columns + multimodal binary-column
  * plumbing (PNG encode/decode).
  *
  * Reference: convml_data/sources/goes16/utils.py:5-55 (clip, gamma 0.4,
  * true-green linear combo, -1 sentinel), sources/images.py:12-141
  * (min-max scale, invert, contrast, uint8 quantization, RGB stacking,
  * PNG write).
  *
  * Scalar raster math stays in higher-order array functions (codegen'd,
  * per-row, no shuffle). PNG encode/decode is a real binary<->tensor UDF
  * pair via javax.imageio (in-JVM, no external deps) — the multimodal
  * column pattern: images travel as opaque BinaryType + typed metadata,
  * and only the stages that need pixels pay the decode.
  */
object ImageOps {

  /** C7: clip every element to [lo, hi]. */
  def clipArr(a: Column, lo: Double, hi: Double): Column =
    transform(a, v => greatest(lit(lo), least(lit(hi), v)))

  /** C7: gamma correction v^g on a [0,1] tensor. */
  def gammaArr(a: Column, g: Double): Column = transform(a, v => pow(v, g))

  /** C7: min-max scale to [0,1] within the tensor (images.py:34-43). */
  def minMaxScaleArr(a: Column): Column = {
    val lo = array_min(a); val hi = array_max(a)
    transform(a, v => (v - lo) / (hi - lo))
  }

  /** C7: invert a [0,1] tensor (images.py:118-124). */
  def invertArr(a: Column): Column = transform(a, v => lit(1.0) - v)

  /** C7: contrast stretch F(c)·(v-0.5)+0.5 (goes16/utils.py:38-47). */
  def contrastArr(a: Column, factor: Double): Column =
    transform(a, v => lit(factor) * (v - 0.5) + 0.5)

  /** C7: GOES true-green linear combo 0.4836·R + 0.4571·B + 0.0604·G
    * (goes16/utils.py:28-36) — elementwise over three channel tensors. */
  def trueGreen(r: Column, b: Column, g: Column): Column =
    zip_with(zip_with(r, b, (x, y) => x * 0.4836 + y * 0.4571), g,
      (rb, z) => rb + z * 0.0604)

  /** C7: uint8 quantization of a [0,1] tensor. */
  def quantizeU8(a: Column): Column =
    transform(a, v => round(clipArrScalar(v) * 255).cast("int"))
  private def clipArrScalar(v: Column): Column = greatest(lit(0.0), least(lit(1.0), v))

  /** C8: interleave three channel tensors into RGB pixel order
    * [r0,g0,b0, r1,g1,b1, ...]. */
  def stackRgb(r: Column, g: Column, b: Column): Column =
    flatten(zip_with(zip_with(r, g, (x, y) => array(x, y)), b,
      (xy, z) => concat(xy, array(z))))

  /** Encode an interleaved-RGB [0,1] tensor of shape (ny, nx) to PNG
    * bytes. Heavy per-row work -> a deliberate UDF (not Catalyst math). */
  val encodePng = udf { (rgb: Seq[Double], ny: Int, nx: Int) =>
    val img = new java.awt.image.BufferedImage(nx, ny, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < ny * nx) {
      val r = (math.max(0.0, math.min(1.0, rgb(3 * i))) * 255).toInt
      val g = (math.max(0.0, math.min(1.0, rgb(3 * i + 1))) * 255).toInt
      val b = (math.max(0.0, math.min(1.0, rgb(3 * i + 2))) * 255).toInt
      img.setRGB(i % nx, i / nx, (r << 16) | (g << 8) | b)
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode PNG bytes back to an interleaved-RGB [0,1] tensor. */
  val decodePng = udf { (bytes: Array[Byte]) =>
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (ny, nx) = (img.getHeight, img.getWidth)
    val arr = new Array[Double](ny * nx * 3)
    var i = 0
    while (i < ny * nx) {
      val px = img.getRGB(i % nx, i / nx)
      arr(3 * i) = ((px >> 16) & 0xff) / 255.0
      arr(3 * i + 1) = ((px >> 8) & 0xff) / 255.0
      arr(3 * i + 2) = (px & 0xff) / 255.0
      i += 1
    }
    arr.toSeq
  }

  /** Multimodal feature extraction over binary image columns: decode ->
    * per-channel means + size metadata. The decode UDF is the stub point
    * where a real vision library would plug in (prompt contract: Spark
    * plumbing real, decode swappable). */
  def imageFeatures(df: DataFrame, bytesCol: String, nyCol: String, nxCol: String): DataFrame = {
    val rgb = decodePng(col(bytesCol))
    df.withColumn("__rgb", rgb)
      .withColumn("mean_r", meanEvery3(col("__rgb"), 0))
      .withColumn("mean_g", meanEvery3(col("__rgb"), 1))
      .withColumn("mean_b", meanEvery3(col("__rgb"), 2))
      .withColumn("n_px", (col(nyCol) * col(nxCol)).cast("long"))
      .drop("__rgb")
  }

  private def meanEvery3(a: Column, offset: Int): Column = {
    val picked = filter(a, (_, i) => i % 3 === offset)
    aggregate(picked, lit(0.0), (acc, v) => acc + v) / size(picked)
  }

  /** Nearest-neighbor resize of an interleaved-RGB (ny, nx) tensor to
    * (oy, ox): out(j,i,c) = in(j*ny/oy floor, i*nx/ox floor, c). Pure
    * integer index arithmetic — codegen'd, shuffle-free, and an oracle
    * replays it exactly. The batch-resize step every vision training
    * pipeline runs before tensorization. */
  def resizeRgbNearest(a: Column, ny: Int, nx: Int, oy: Int, ox: Int): Column =
    transform(sequence(lit(0), lit(oy * ox * 3 - 1)), { idx =>
      val j = floor(idx.cast("double") / (ox * 3))
      val i = floor((idx % (ox * 3)).cast("double") / 3)
      val c = idx % 3
      val srcJ = floor(j * ny / oy)
      val srcI = floor(i * nx / ox)
      element_at(a, ((srcJ * nx + srcI) * 3 + c + 1).cast("int"))
    })

  /** Frame sampling over a frame-stacked tensor (a "video" column is
    * nFrames frames of frameLen values, concatenated): keep every
    * `stride`-th frame starting at frame 0 — the temporal-subsampling
    * step video training pipelines run before per-frame decode/embed.
    * Pure index picks (codegen'd, shuffle-free). */
  def frameSample(a: Column, frameLen: Int, stride: Int): Column = {
    require(frameLen > 0 && stride > 0, "frameLen and stride must be positive")
    val nOut = floor((size(a).cast("double") / frameLen - 1) / stride) + 1
    transform(sequence(lit(0), (nOut * frameLen - 1).cast("int")), { idx =>
      val f = floor(idx.cast("double") / frameLen)
      element_at(a, (f * stride * frameLen + (idx % frameLen) + 1).cast("int"))
    })
  }

  /** Bilinear resize (half-pixel centers, edge-clamped — the
    * PIL/torch `align_corners=false` convention): sample position
    * f = (o + 0.5) * in/out - 0.5 clamped at 0, blend the four
    * neighbors with (1-w)/w weights in a FIXED term order, so any
    * engine reproduces the doubles bit-for-bit from the same tokens. */
  def resizeRgbBilinear(a: Column, ny: Int, nx: Int, oy: Int, ox: Int): Column =
    transform(sequence(lit(0), lit(oy * ox * 3 - 1)), { idx =>
      val j = floor(idx.cast("double") / (ox * 3))
      val i = floor((idx % (ox * 3)).cast("double") / 3)
      val c = idx % 3
      val fy = greatest(lit(0.0), (j + 0.5) * ny / oy - 0.5)
      val fx = greatest(lit(0.0), (i + 0.5) * nx / ox - 0.5)
      val y0 = least(floor(fy), lit((ny - 1).toDouble))
      val x0 = least(floor(fx), lit((nx - 1).toDouble))
      val y1 = least(y0 + 1, lit((ny - 1).toDouble))
      val x1 = least(x0 + 1, lit((nx - 1).toDouble))
      val wy = fy - floor(fy)
      val wx = fx - floor(fx)
      def px(yy: Column, xx: Column) =
        element_at(a, ((yy * nx + xx) * 3 + c + 1).cast("int"))
      (lit(1.0) - wy) * (lit(1.0) - wx) * px(y0, x0) +
        (lit(1.0) - wy) * wx * px(y0, x1) +
        wy * (lit(1.0) - wx) * px(y1, x0) +
        wy * wx * px(y1, x1)
    })
}
