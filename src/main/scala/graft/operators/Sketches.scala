package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable sketch aggregators for corpus-level statistics.
  *
  * A group-level MinHash signature (min over every member's hashed
  * shingles, per hash function) estimates the Jaccard similarity between
  * whole *groups* of documents (e.g. per-source or per-shard content
  * overlap at 100 TB) from one pass: the buffer is k longs, `reduce`
  * folds each element, `merge` is elementwise min — associative and
  * commutative, so map-side partial aggregation applies and the shuffle
  * carries only k values per group. Coefficients match Dedup.aCoef/bCoef,
  * so sketches are comparable with per-document signatures (q27) and the
  * DuckDB oracle can recompute them exactly.
  */
object Sketches {

  /** Aggregator over rows of hashed-shingle arrays -> k-minhash sketch. */
  def minhashSketch(k: Int): Aggregator[Seq[Long], Array[Long], Seq[Long]] =
    new Aggregator[Seq[Long], Array[Long], Seq[Long]] {
      private val as = Array.tabulate(k)(Dedup.aCoef)
      private val bs = Array.tabulate(k)(Dedup.bCoef)
      def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
      def reduce(buf: Array[Long], xs: Seq[Long]): Array[Long] = {
        var i = 0
        while (i < k) {
          var m = buf(i)
          val it = xs.iterator
          while (it.hasNext) {
            val h = (as(i) * it.next() + bs(i)) % Dedup.P
            if (h < m) m = h
          }
          buf(i) = m
          i += 1
        }
        buf
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
        a
      }
      def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
      def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  /** Estimated Jaccard between two k-signatures: matching fraction. */
  def sketchJaccard(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length

  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._

  /** Row-i hash slot for count-min: ((a_i·h + b_i) mod P) mod width,
    * over an already-hashed key column (TextAnalysis.polyHash for
    * strings) — shared with the DuckDB oracle via the same coefficient
    * schedule as MinHash. */
  def cmsSlot(hashedKey: Column, row: Int, width: Int): Column =
    ((lit(Dedup.aCoef(row)) * hashedKey + lit(Dedup.bCoef(row))) % Dedup.P) % width

  /** Count-min sketch AS A DATAFRAME: `depth × width` cells of summed
    * counts, built by one explode + hash aggregation.
    *
    * The frequency-estimation complement to the MinHash overlap sketch:
    * heavy-hitter token statistics over a 100 TB corpus reduce to a
    * depth·width-cell table regardless of corpus size. Mergeable by
    * construction — the sketch of a union of shards is the cell-wise SUM
    * of the shard sketches (it's a groupBy sum), so partial aggregation
    * and incremental maintenance are free. Point estimate = min over
    * rows of the key's cell, an upper bound on the true count with the
    * usual (ε=e/width, δ=e^-depth) guarantee — and exact integer
    * arithmetic end to end, so the whole sketch is oracle-hashable.
    *
    * `items`: one row per occurrence; `hashedKeyCol` an int64 key hash. */
  def countMinSketch(items: DataFrame, hashedKeyCol: String,
      depth: Int, width: Int): DataFrame =
    items.select(
        explode(array((0 until depth).map { i =>
          struct(lit(i).as("row"), cmsSlot(col(hashedKeyCol), i, width).as("slot"))
        }: _*)).as("c"))
      .groupBy(col("c.row").as("row"), col("c.slot").as("slot"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate counts for `keys` against a built sketch: join each
    * (key, row) pair to its cell, take the min across rows. Keys absent
    * from the sketch estimate over empty cells -> 0 via the left join. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, hashedKeyCol: String,
      depth: Int, width: Int): DataFrame = {
    val probes = keys.select(col(hashedKeyCol))
      .withColumn("c", explode(array((0 until depth).map { i =>
        struct(lit(i).as("row"), cmsSlot(col(hashedKeyCol), i, width).as("slot"))
      }: _*)))
      .select(col(hashedKeyCol), col("c.row").as("row"), col("c.slot").as("slot"))
    probes.join(broadcast(sketch), Seq("row", "slot"), "left")
      .groupBy(col(hashedKeyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** HyperLogLog registers AS A DATAFRAME — the cardinality complement to
    * the MinHash (overlap) and count-min (frequency) sketches. m = 2^p
    * registers of max leading-zero ranks over a `wBits`-bit substream of
    * the key hash; one hash aggregation builds them and shard union is
    * cell-wise MAX, so the sketch is mergeable and incremental. Integer
    * arithmetic only (floor(log2) via the minimal-width binary-string
    * length, identical in Spark and DuckDB), so registers are
    * oracle-hashable exactly. */
  def hllRegisters(items: DataFrame, hashedKeyCol: String, groupCols: Seq[String],
      p: Int, wBits: Int = 24): DataFrame = {
    val m = 1 << p
    val v = expr(s"($hashedKeyCol div $m) % ${1 << wBits}")
    val rho = when(v === 0, lit(wBits + 1))
      .otherwise(lit(wBits) - length(bin(v)) + 1)
    items.select(groupCols.map(col) :+ (col(hashedKeyCol) % m).as("reg") :+ rho.as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("reg"): _*)
      .agg(max(col("rho")).as("maxrho"))
  }

  /** Cardinality estimate from HLL registers (Flajolet et al. 2007):
    * α·m²/Σ2^(−reg), with the linear-counting small-range correction
    * m·ln(m/V) when the raw estimate ≤ 2.5m and V registers are empty.
    * The power sum is EXACT in doubles (≤ m dyadic terms well above 2^-53
    * granularity), so it is order-independent across engines; only the
    * ln branch is libm — callers round the estimate. α tabulated for
    * p = 6 (m = 64). */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    require(p == 6, s"alpha constant tabulated for p=6 (m=64); got p=$p")
    val m = 1 << p
    registers.groupBy(groupCols.map(col): _*)
      .agg(
        sum(lit(1.0) / expr("CAST(shiftleft(CAST(1 AS BIGINT), maxrho) AS DOUBLE)")).as("sp"),
        count(lit(1)).as("npresent"))
      .withColumn("v0", lit(m.toLong) - col("npresent"))
      .withColumn("raw", lit(0.709) * m * m / (col("sp") + col("v0").cast("double")))
      .withColumn("hll_est",
        when(col("raw") <= 2.5 * m && col("v0") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v0").cast("double")))
          .otherwise(col("raw")))
      .select(groupCols.map(col) :+ col("v0") :+ col("hll_est"): _*)
  }

  /** Bloom filter AS A DATAFRAME — the membership complement to the
    * frequency (count-min) and cardinality (HLL) sketches: k hash
    * functions (the same (a_i·h + b_i) mod P family as [[cmsSlot]]) map
    * each key to bit positions in an m-bit filter, stored sparse as
    * distinct set-bit rows. Shard union = plain row-set union (the
    * distinct re-applies), so the filter is mergeable and incremental;
    * the cross-shard broadcast of set bits caps at m rows no matter how
    * large the corpus. Exact integer arithmetic only, so the oracle
    * rebuilds the bit set — and every membership verdict — bit-for-bit.
    *
    * The 100 TB use: a scalable negative cache ("definitely not seen")
    * for URL / document-key dedup between pipeline stages, where the
    * exact key set would be TBs but the filter is m bits. */
  def bloomBits(items: DataFrame, hashedKeyCol: String, k: Int, m: Int): DataFrame = {
    require(k >= 1 && m >= 2, s"need k >= 1 hash rows and m >= 2 bits, got k=$k m=$m")
    items.select(explode(array((0 until k).map(i =>
        cmsSlot(col(hashedKeyCol), i, m)): _*)).as("bit"))
      .distinct()
  }

  /** HDR-histogram-family quantile sketch (the log-bucketed fixed-size
    * histogram of Gil Tene's HdrHistogram): non-negative integer values
    * land in cells keyed by (shift, sub) where sub is the value's top
    * `sBits` significant bits and shift the discarded low-bit count —
    * so the cell's lower bound `sub << shift` under-estimates v by at
    * most a factor 2^(1-sBits), a RELATIVE error bound at every
    * magnitude. The quantile complement to count-min (frequency), HLL
    * (cardinality) and Bloom (membership): cells are bounded (≤ ~64 ·
    * 2^(sBits−1)) no matter the corpus, shard union is cell-wise count
    * SUM (mergeable, incremental), and everything is integer arithmetic
    * — the oracle replays cells AND estimates exactly.
    *
    * floor(log2) comes from the minimal-binary-string length (the HLL
    * rho trick) and the variable shift from an integer division by a
    * shifted 1 — both engines share every token. */
  def hdrCells(items: DataFrame, valueCol: String, sBits: Int,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(sBits >= 1 && sBits <= 20, s"sBits must be in [1,20], got $sBits")
    val v = s"CAST($valueCol AS BIGINT)"
    val shift = s"greatest(0, length(bin($v)) - $sBits)"
    val sub = s"$v div shiftleft(CAST(1 AS BIGINT), $shift)"
    items
      .where(expr(s"$v >= 0 OR raise_error('hdrCells: negative value ' || $valueCol)"))
      .groupBy((groupCols.map(col) :+ expr(shift).as("shift") :+ expr(sub).as("sub")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Nearest-rank quantile estimates from HDR cells: for each q the
    * estimate is the lower bound (sub << shift) of the cell containing
    * rank ceil(q·n) in cell-lower-bound order. The global window is
    * over the SKETCH table (bounded cells), not the data. */
  def hdrQuantiles(cells: DataFrame, qs: Seq[Double]): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val lb = expr("shiftleft(sub, CAST(shift AS INT))")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("lb").rowsBetween(Long.MinValue, 0)
    val cum = cells.select(lb.as("lb"), col("cnt"))
      .groupBy("lb").agg(sum("cnt").as("cnt")) // shards may repeat cells: merge = SUM
      .withColumn("cum", sum(col("cnt")).over(w))
    val total = cum.agg(sum(col("cnt")).cast("long").as("n"))
    cum.crossJoin(broadcast(total)) // bounded: one row
      .crossJoin(broadcast(qs.toDF("q"))) // bounded: the probe list
      .where(col("cum") >= greatest(lit(1L), ceil(col("q") * col("n"))))
      .groupBy(col("q"))
      .agg(min(col("lb")).as("est"), max(col("n")).as("n"))
  }

  /** Membership probes against a built filter: a key "might be present"
    * iff ALL k of its bits are set (no false negatives by construction;
    * false positives at the classic (1−e^{−kn/m})^k rate). The bit table
    * is ≤ m rows — always broadcast. */
  def bloomMightContain(bits: DataFrame, keys: DataFrame, hashedKeyCol: String,
      k: Int, m: Int): DataFrame = {
    val probes = keys.select(col(hashedKeyCol))
      .withColumn("bit", explode(array((0 until k).map(i =>
        cmsSlot(col(hashedKeyCol), i, m)): _*)))
    probes.join(broadcast(bits.withColumn("present", lit(1L))), Seq("bit"), "left")
      .groupBy(col(hashedKeyCol))
      .agg(min(coalesce(col("present"), lit(0L))).as("might_contain"))
  }

  /** Heavy hitters by Misra-Gries candidates + exact recount: the
    * bounded-state top-frequency pipeline for OPEN vocabularies, where
    * a full group-by holds one counter per distinct item (unbounded at
    * 100 TB) but the MG summary holds k-1 counters per task and its
    * merged form provably contains every item with freq > N/k
    * (`plans.MisraGriesAgg`). The candidate set (<= k-1 items) is
    * broadcast back for one exact recount, and the final threshold
    * freq·k > N is decided on exact integer counts — so the OUTPUT is
    * deterministic (and SQL-replayable) even though MG estimates are
    * stream-order-dependent.
    *
    * Output: (item, n_occur, n_total) for every item with
    * n_occur · k > n_total, i.e. frequency strictly above N/k. */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val its = items.select(col(itemCol).as("item"))
    val cands = its
      .agg(graft.plans.MisraGriesAgg.misraGriesCol(col("item"), k).as("mg"))
      .select(explode(col("mg")).as("c"))
      .select(col("c.item").as("item"))
    val total = its.agg(count(lit(1)).as("n_total"))
    its.join(broadcast(cands), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("n_occur"))
      .crossJoin(broadcast(total))
      .where(col("n_occur") * k > col("n_total"))
  }
}
