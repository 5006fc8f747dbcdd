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

  test("deflate-compressed SDs round-trip; mixed plain+compressed file") {
    val flux = Array.tabulate(2 * 3 * 4)(i => i * 0.125 - 1.0)
    val counts = Array.tabulate(6)(i => (i * 3).toDouble)
    val bytes = HDF4.write(Seq(
      HDF4.SdsSpec("toa_lw_flux", Seq(2, 3, 4), HDF4.Float32, flux, deflate = true),
      HDF4.SdsSpec("pixel_counts", Seq(6), HDF4.Int32, counts))) // plain
    // the compressed SD must NOT appear as a plain DFTAG_SD DD
    val dds = HDF4.readDDs(bytes)
    assert(dds.exists(_.tag == (HDF4.ExtendedMask | HDF4.TagSD)))
    assert(dds.exists(_.tag == HDF4.TagCompressed))
    assert(dds.count(_.tag == HDF4.TagSD) == 1) // only the plain one
    val sds = HDF4.readSds(bytes)
    assert(sds.map(_.label) == Seq("toa_lw_flux", "pixel_counts"))
    assert(sds.head.data.toSeq == flux.map(_.toFloat.toDouble).toSeq)
    assert(sds(1).data.toSeq == counts.toSeq)
  }

  test("unknown special kinds and comp codes are rejected loudly") {
    val base = HDF4.write(Seq(
      HDF4.SdsSpec("v", Seq(2, 2), HDF4.Int16, Array(1.0, 2.0, 3.0, 4.0), deflate = true)))
    val dds = HDF4.readDDs(base)
    val ext = dds.find(_.tag == (HDF4.ExtendedMask | HDF4.TagSD)).get
    // special kind SPECIAL_CHUNKED(5) instead of SPECIAL_COMP(3)
    val chunked = base.clone()
    ByteBuffer.wrap(chunked).putShort(ext.offset, 5.toShort)
    val e1 = intercept[IllegalArgumentException] { HDF4.readSds(chunked) }
    assert(e1.getMessage.contains("special element kind 5"))
    // comp code SZIP-ish (12) instead of DEFLATE(4): header offset
    // special(2)+version(2)+len(4)+ref(2)+model(2) = 12
    val szip = base.clone()
    ByteBuffer.wrap(szip).putShort(ext.offset + 12, 12.toShort)
    val e2 = intercept[IllegalArgumentException] { HDF4.readSds(szip) }
    assert(e2.getMessage.contains("compression code 12"))
  }

  test("SD-interface Vdata attributes round-trip: strings, numbers, multiple datasets") {
    val bytes = HDF4.write(Seq(
      HDF4.SdsSpec("flux", Seq(2, 2), HDF4.Int16, Array(1.0, 2.0, 3.0, 4.0),
        deflate = true,
        attrs = Seq(
          "long_name" -> HDF4.StrAttr("TOA LW Flux"),
          "units" -> HDF4.StrAttr("W/m^2"),
          "scale_factor" -> HDF4.NumAttr(HDF4.Float64, Seq(0.5)),
          "add_offset" -> HDF4.NumAttr(HDF4.Float64, Seq(-3.0)),
          "valid_range" -> HDF4.NumAttr(HDF4.Int16, Seq(-1000.0, 1000.0)))),
      HDF4.SdsSpec("bare", Seq(2), HDF4.Float64, Array(9.0, 8.0)))) // no attrs
    val sds = HDF4.readSds(bytes)
    val flux = sds.find(_.label == "flux").get
    assert(flux.attrs("long_name") == HDF4.StrAttr("TOA LW Flux"))
    assert(flux.attrs("units") == HDF4.StrAttr("W/m^2"))
    assert(flux.attrs("scale_factor") == HDF4.NumAttr(HDF4.Float64, Seq(0.5)))
    assert(flux.attrs("add_offset") == HDF4.NumAttr(HDF4.Float64, Seq(-3.0)))
    assert(flux.attrs("valid_range") == HDF4.NumAttr(HDF4.Int16, Seq(-1000.0, 1000.0)))
    assert(sds.find(_.label == "bare").get.attrs.isEmpty)
    // raw data untouched by attrs at the readSds layer
    assert(flux.data.toSeq == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("syn1deg ingest applies CF scale/offset and fill -> NaN") {
    val packed = Array(0.0, 100.0, -999.0, 40.0) // -999 is the fill
    val bytes = HDF4.write(Seq(HDF4.SdsSpec(
      "flux", Seq(1, 2, 2), HDF4.Int16, packed,
      attrs = Seq(
        "scale_factor" -> HDF4.NumAttr(HDF4.Float64, Seq(0.25)),
        "add_offset" -> HDF4.NumAttr(HDF4.Float64, Seq(10.0)),
        "_FillValue" -> HDF4.NumAttr(HDF4.Int16, Seq(-999.0))))))
    val vals = HDF4.syn1degRows(bytes, "flux", "2021-07-01").map(_._4).toSeq
    assert(vals(0) == 10.0 && vals(1) == 35.0 && vals(3) == 20.0)
    assert(vals(2).isNaN, "fill value must become NaN before scaling")
    // without attrs the raw values pass through
    val plain = HDF4.write(Seq(HDF4.SdsSpec("flux", Seq(1, 2, 2), HDF4.Int16, packed)))
    assert(HDF4.syn1degRows(plain, "flux", "2021-07-01").map(_._4).toSeq ==
      Seq(0.0, 100.0, -999.0, 40.0))
  }

  test("malformed attribute Vdatas are rejected loudly, non-attr Vdatas skipped") {
    val bytes = HDF4.write(Seq(HDF4.SdsSpec(
      "v", Seq(2), HDF4.Int16, Array(1.0, 2.0),
      attrs = Seq("units" -> HDF4.StrAttr("K")))))
    // corrupt the VH's interlace mode (fixed-width field at offset 0, so
    // the class string still parses and the reject fires)
    val vh = HDF4.readDDs(bytes).find(_.tag == HDF4.TagVH).get
    val bad = bytes.clone()
    ByteBuffer.wrap(bad).putShort(vh.offset, 1.toShort)
    val e = intercept[IllegalArgumentException] { HDF4.readSds(bad) }
    assert(e.getMessage.contains("expected one FULL_INTERLACE field"))
    // a Vdata with a non-Attr0.0 class inside the Vgroup is ignored, and
    // a Vgroup of a different class is ignored wholesale: flip the class
    // string "Var0.0" -> "Dim0.0" and attrs disappear without error
    val vg = HDF4.readDDs(bytes).find(_.tag == HDF4.TagVG).get
    val other = bytes.clone()
    // class string sits after nelt2 + 4*nelt + namelen2+name
    val sds0 = HDF4.readSds(bytes)
    assert(sds0.head.attrs.nonEmpty, "fixture sanity")
    val nelt = ByteBuffer.wrap(bytes).getShort(vg.offset) & 0xffff
    val nameLen = ByteBuffer.wrap(bytes).getShort(vg.offset + 2 + 4 * nelt) & 0xffff
    val classOff = vg.offset + 2 + 4 * nelt + 2 + nameLen + 2
    other(classOff) = 'D'.toByte; other(classOff + 1) = 'i'.toByte; other(classOff + 2) = 'm'.toByte
    assert(HDF4.readSds(other).head.attrs.isEmpty)
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
