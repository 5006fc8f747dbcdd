package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Entity resolution: hand clusters (head/tail typos, exact dups,
  * singletons), the multi-pass-blocking necessity, and a brute-force
  * reference on generated noisy records. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], blockLen: Int = 4, maxDist: Int = 2) =
    Linkage.resolve(rows.toDF("rid", "nm"), "rid", "nm", blockLen, maxDist)
      .as[(Long, Long, Long)].collect().sortBy(_._1)

  test("hand fixture: typo variants and exact dups cluster, strangers stay apart") {
    val rows = Seq(
      (1L, "john smith"),
      (2L, "xohn smith"), // head typo: prefix block broken, suffix finds it
      (3L, "john smitx"), // tail typo: suffix block broken, prefix finds it
      (10L, "mary jones"),
      (11L, "mary jones"), // exact duplicate
      (20L, "peter brown")) // singleton
    val got = run(rows)
    assert(got.map(r => (r._1, r._2)).toSeq ===
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L), (20L, 20L)))
    assert(got.map(_._3).toSeq === Seq(3L, 3L, 3L, 2L, 2L, 1L))
  }

  test("a single pass misses what the two-pass union catches") {
    // with ONLY the prefix block (simulated by maxDist high but names
    // whose head typo shares no 4-prefix), the head-typo pair can only
    // meet through the suffix pass — resolve() must link it
    val rows = Seq((1L, "abcdefgh"), (2L, "zbcdefgh"))
    val got = run(rows)
    assert(got.map(_._2).distinct.toSeq === Seq(1L), s"$got")
  }

  test("matches a brute-force all-pairs reference on noisy generated records") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Seq("albert anderson", "bridget brockman", "carolyn castillo",
      "douglas davidson", "eleanor ellsworth")
    val rows = (0 until 40).map { i =>
      val base = names(i % 5)
      val nm = (i / 5) % 4 match {
        case 0 | 3 => base
        case 1 => "x" + base.drop(1) // head typo
        case 2 => base.dropRight(1) + "x" // tail typo
      }
      (i.toLong, nm)
    }
    val got = run(rows).map(r => r._1 -> r._2).toMap
    // brute-force: all pairs within lev<=2 (single typos keep every
    // variant within 2 of its base AND of sibling variants), components
    // by union-find
    val parent = scala.collection.mutable.Map((0L until 40L).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- rows; j <- rows if i._1 < j._1)
      if (lev(i._2, j._2) <= 2) {
        val (ri, rj) = (find(i._1), find(j._1))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
    rows.foreach { case (id, _) =>
      assert(got(id) === find(id), s"rid $id")
    }
  }
}
