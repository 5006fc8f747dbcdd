package graft.sources

import graft.SparkSpec
import java.nio.ByteBuffer

/** HDF4 DFSD codec (S10): reader proven against hand-crafted bytes laid
  * out from the public spec (independent of the writer), writer proven by
  * round-trip through that reader, syn1deg ingest semantics per
  * ceres_syn1deg_modis/extract.py. */
class HDF4Spec extends SparkSpec {

  test("reader parses a hand-crafted DFSD file") {
    // 1 SDS: int16 2x3 = [1..6], no label. Objects: NT(58) SDD(62) SD(84)
    // NDG(96); header = 4 magic + 6 block head + 4*12 DDs = 58 bytes.
    val buf = ByteBuffer.allocate(108)
    buf.putInt(HDF4.Magic)
    buf.putShort(4); buf.putInt(0)                       // ndds, next
    buf.putShort(HDF4.TagNT.toShort); buf.putShort(1); buf.putInt(58); buf.putInt(4)
    buf.putShort(HDF4.TagSDD.toShort); buf.putShort(1); buf.putInt(62); buf.putInt(22)
    buf.putShort(HDF4.TagSD.toShort); buf.putShort(1); buf.putInt(84); buf.putInt(12)
    buf.putShort(HDF4.TagNDG.toShort); buf.putShort(1); buf.putInt(96); buf.putInt(12)
    buf.put(Array[Byte](1, HDF4.Int16.toByte, 16, 0))    // NT
    buf.putShort(2); buf.putInt(2); buf.putInt(3)        // SDD: rank, dims
    buf.putShort(HDF4.TagNT.toShort); buf.putShort(1)    //   data NT
    buf.putShort(HDF4.TagNT.toShort); buf.putShort(1)    //   scale NTs
    buf.putShort(HDF4.TagNT.toShort); buf.putShort(1)
    (1 to 6).foreach(v => buf.putShort(v.toShort))       // SD
    Seq(HDF4.TagSDD, HDF4.TagNT, HDF4.TagSD).foreach { t =>
      buf.putShort(t.toShort); buf.putShort(1)           // NDG members
    }
    val sds = HDF4.readSds(buf.array())
    assert(sds.length == 1)
    assert(sds.head.dims == Seq(2, 3) && sds.head.ntType == HDF4.Int16)
    assert(sds.head.label == "")
    assert(sds.head.data.toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("writer round-trips through the reader: multiple SDSs, labels, types") {
    val flux = Array.tabulate(3 * 2 * 2)(_ * 0.25)
    val counts = Array.tabulate(4)(i => (i * 7).toDouble)
    val bytes = HDF4.write(Seq(
      HDF4.SdsSpec("observed_all_sky_toa_lw_flux", Seq(3, 2, 2), HDF4.Float64, flux),
      HDF4.SdsSpec("pixel_counts", Seq(4), HDF4.Int32, counts)))
    val sds = HDF4.readSds(bytes)
    assert(sds.map(_.label) == Seq("observed_all_sky_toa_lw_flux", "pixel_counts"))
    assert(sds.head.dims == Seq(3, 2, 2) && sds.head.data.toSeq == flux.toSeq)
    assert(sds(1).ntType == HDF4.Int32 && sds(1).data.toSeq == counts.toSeq)
  }

  test("syn1deg ingest: band->time, y->lat, x->lon per extract.py") {
    val nB = 2; val ny = 3; val nx = 4
    val bytes = HDF4.write(Seq(HDF4.SdsSpec("observed_all_sky_toa_lw_flux",
      Seq(nB, ny, nx), HDF4.Float32, Array.tabulate(nB * ny * nx)(_.toFloat.toDouble))))
    val rows = HDF4.syn1degRows(bytes, "observed_all_sky_toa_lw_flux", "2021-07-01").toSeq
    assert(rows.length == nB * ny * nx)
    // band 1, j=2, i=3 -> flat (1*3+2)*4+3 = 23
    val r = rows.find { case (t, lat, lon, _) =>
      t == java.sql.Timestamp.valueOf("2021-07-01 01:00:00") && lat == 90.0 - 2.5 && lon == 3.5 - 180.0
    }
    assert(r.isDefined && r.get._4 == 23.0)
    val err = intercept[IllegalArgumentException] {
      HDF4.syn1degRows(bytes, "nope", "2021-07-01").toSeq
    }
    assert(err.getMessage.contains("Available variables are: observed_all_sky_toa_lw_flux"))
  }
}
