package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication suite for training-data pipelines:
  * exact (hash-group), n-gram Jaccard, MinHash+LSH banding, SimHash.
  *
  * Scale design:
  *  - exact dedup = one hash aggregation on a digest key (map-side combine).
  *  - pairwise Jaccard is only ever computed inside a *blocking* key
  *    (explicit block columns, or LSH band buckets) — never a global
  *    cross-join. The LSH path is the 100 TB route: signature generation is
  *    per-row (no shuffle), band explosion multiplies rows by #bands, and
  *    candidate pairing is an equi-join on (band, bandHash) that AQE can
  *    re-plan for skewed buckets.
  *  - all hashes are int64 mod 1e9+7 so every product stays < 2^63 and the
  *    DuckDB oracle can reproduce them exactly.
  */
object Dedup {
  val P: Long = TextAnalysis.HashMod

  /** Caches created by dedup operators on this thread (persisted shingle
    * tables, component labels). A DataFrame result must stay cached until
    * the caller consumes it, so the operator can't unpersist on return —
    * wrappers that fully consume the result (Verify, Bench) call
    * [[releaseCaches]] afterwards to stop cached blocks accumulating over
    * a long-lived session. */
  /** Register for deferred release ONLY caches this operator created —
    * a caller-persisted frame re-derived here must survive
    * [[releaseCaches]] (the ownership rule Caching.Cached encodes).
    * The registry itself now lives in graft.core.Caching so non-dedup
    * operators (e.g. the NB classifier's model table) share the same
    * consume-then-release lifecycle. */
  private def track(c: graft.core.Caching.Cached[org.apache.spark.sql.Row]): DataFrame = {
    if (c.owned) graft.core.Caching.register(c.ds)
    c.ds
  }
  def releaseCaches(): Unit = graft.core.Caching.releaseTracked()

  /** MinHash parameter schedule: hash_i(x) = (a_i * x + b_i) mod P with
    * a_i,b_i derived deterministically from i. Shared with the oracle SQL
    * (the literals are interpolated into it from these same functions). */
  def aCoef(i: Int): Long = (i.toLong * 2654435761L) % P + 1
  def bCoef(i: Int): Long = (i.toLong * 40503L * 65537L) % P

  /** Exact dedup: canonical (min) id + copy count per content digest. */
  def exactDedup(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(md5(textCol).as("digest"))
      .agg(min(idCol).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Distinct 3-gram shingles hashed to int64, sorted ascending so pair
    * verification can use the merge-walk intersect. Native single-pass
    * expression (graft.plans.ShingleHashes): identical output to
    * `sort_array(array_distinct(transform(charNgrams(c,n), polyHash)))`
    * (spec-proven) at a fraction of the allocation. */
  def shingleHashes(textCol: Column, n: Int = 3): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(graft.plans.ShingleHashes(expression(textCol), n))
  }

  /** The HOF reference form of [[shingleHashes]] (kept as the
    * cross-check oracle for the native expression). */
  def shingleHashesHof(textCol: Column, n: Int = 3): Column =
    sort_array(array_distinct(
      transform(TextAnalysis.charNgrams(textCol, n), s => TextAnalysis.polyHash(s))))

  /** MinHash signature as k scalar columns mh0..mh{k-1} over the hashed
    * shingle set in column `xs`. Native one-pass kernel
    * (graft.plans.MinHashSig): k accumulators in one array walk instead
    * of k transform+array_min passes; bit-identical to [[minhashColsHof]]
    * (spec-proven — shared coefficient schedule). */
  def minhashCols(xs: Column, k: Int): Seq[(String, Column)] = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val sig = column(graft.plans.MinHashSig(expression(xs), k))
    (0 until k).map(i => s"mh$i" -> element_at(sig, i + 1))
  }

  /** HOF reference form of [[minhashCols]] (cross-check oracle). */
  def minhashColsHof(xs: Column, k: Int): Seq[(String, Column)] =
    (0 until k).map { i =>
      s"mh$i" -> array_min(transform(xs, x => (lit(aCoef(i)) * x + lit(bCoef(i))) % P))
    }

  /** LSH band hash for band b of r consecutive minhashes. */
  def bandHash(sig: Seq[Column], b: Int, r: Int): Column =
    (b * r until (b + 1) * r).map(sig(_)).reduce((h, m) => (h * 31 + m) % P)

  /** Jaccard of two distinct-element arrays via one intersection pass:
    * |A∩B| / (|A| + |B| - |A∩B|) — skips building the union array
    * (int/int division, bit-stable across engines). */
  def jaccard(a: Column, b: Column): Column = {
    val i = size(array_intersect(a, b))
    i.cast("double") / (size(a) + size(b) - i).cast("double")
  }

  /** Jaccard over SORTED long-hash sets using the native merge-walk
    * intersect count (graft.plans.SortedLongIntersectCount) — the hot-path
    * form for pair verification. */
  def jaccardSorted(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val i = column(graft.plans.SortedLongIntersectCount(expression(a), expression(b)))
    i.cast("double") / (size(a) + size(b) - i).cast("double")
  }

  /** Blocked pairwise n-gram Jaccard near-dup pairs (doc_a < doc_b,
    * jaccard >= threshold). `blockCols` bound the quadratic blow-up; use
    * [[lshNearDupPairs]] when no natural blocking key exists.
    * Shingles travel as hashed int64 sets: long-array intersection beats
    * string-array intersection ~5x and shrinks the shuffle. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], n: Int, threshold: Double): DataFrame = {
    // persist the hashed-shingle table: both sides of the self-join read
    // it, and Spark shares no DAG across join branches — without this the
    // (expensive) shingling runs twice. MEMORY_AND_DISK so a 100 TB corpus
    // degrades to a disk-backed materialization instead of an OOM.
    // Parallelism.floor: shingling is CPU-dense, so its parallelism must
    // come from the cluster, not from the scan's split count (a
    // single-file corpus otherwise shingles on one core).
    val sh = track(graft.core.Caching.acquire(
      graft.core.Parallelism.floor(df, col(idCol)).select(
      (col(idCol).as("doc") +: blockCols.map(col)) :+
        shingleHashes(col(textCol), n).as("shingles"): _*)))
    val a = sh.select(col("doc").as("doc_a") +: col("shingles").as("sa") +:
      blockCols.map(col): _*)
    val b = sh.select(col("doc").as("doc_b") +: col("shingles").as("sb") +:
      blockCols.map(col): _*)
    a.join(b, blockCols).where(col("doc_a") < col("doc_b"))
      // size-ratio prefilter: jaccard <= min(|A|,|B|)/max(|A|,|B|), so a
      // pair failing the ratio can never clear the threshold — prunes
      // before the O(|A|+|B|) merge-walk, exactness preserved
      .where(least(size(col("sa")), size(col("sb"))).cast("double")
        >= lit(threshold) * greatest(size(col("sa")), size(col("sb"))).cast("double"))
      .withColumn("jaccard", jaccardSorted(col("sa"), col("sb")))
      .where(col("jaccard") >= threshold)
      .select((col("doc_a") +: col("doc_b") +: blockCols.map(col)) :+ col("jaccard"): _*)
  }

  /** MinHash signatures (k columns) per document. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val withShingles = df.select(col(idCol).as("doc_id"),
      shingleHashes(col(textCol)).as("xs"))
    withShingles.select(col("doc_id") +: minhashCols(col("xs"), k).map { case (n, c) => c.as(n) }: _*)
  }

  /** The scalable near-dup path: LSH banding over minhash signatures ->
    * candidate pairs sharing >= 1 band -> verified n-gram Jaccard filter.
    * One explode (x bands) + one equi-join on (band, hash); no block scan.
    *
    * Shuffle discipline: the band join and candidate dedup carry ONLY the
    * two 8-byte doc ids — the shingle arrays are joined back exactly once
    * per *distinct* candidate pair for the verify pass. (Carrying the
    * arrays through the band join multiplies them by #shared-bands and
    * makes `distinct()` compare array keys — measured ~10x slower at
    * sf0.1 on a self-similar corpus.)
    */
  /** @param broadcastShingles hint the shingle table onto the verify
    *        joins' build side: the candidate stream (the big side) then
    *        flows through two broadcast hash joins and the arrays never
    *        shuffle. Right whenever #docs x avg-shingles fits the
    *        broadcast budget (a 10^6-doc partition easily does); flip
    *        off at full-corpus scale and AQE plans the shuffled join. */
  def lshNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int, threshold: Double,
      broadcastShingles: Boolean = false): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val r = k / bands
    // hashed shingle set once; signatures derive from it, and the verify
    // pass intersects long arrays (no string sets ever shuffle). Persisted:
    // read by the banding pass and twice by the verify joins, and Spark
    // shares no DAG across join branches. Parallelism.floor: the whole
    // shingle -> minhash -> band -> candidate pipeline runs map-side on
    // this frame's partitioning, so a single-split scan would otherwise
    // serialize it onto one core (measured 4.2 s of a 5.9 s q28 in one
    // task at sf0.1).
    val sh = track(graft.core.Caching.acquire(
      graft.core.Parallelism.floor(df, col(idCol))
        .select(col(idCol).as("doc_id"), shingleHashes(col(textCol)).as("xs"))))
    val sigCols = minhashCols(col("xs"), k)
    val sig = sh.select(col("doc_id") +: sigCols.map { case (n, c) => c.as(n) }: _*)
    val sigRef = (0 until k).map(i => col(s"mh$i"))
    val banded = sig.select(col("doc_id"),
      explode(array((0 until bands).map(bi =>
        struct(lit(bi).as("band"), bandHash(sigRef, bi, r).as("bh"))): _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val l = banded.select(col("doc_id").as("doc_a"), col("band"), col("bh"))
    val rr = banded.select(col("doc_id").as("doc_b"), col("band"), col("bh"))
    val cand = l.join(rr, Seq("band", "bh")).where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    def shSide(idAs: String, xsAs: String) = {
      val side = sh.select(col("doc_id").as(idAs), col("xs").as(xsAs))
      if (broadcastShingles) broadcast(side) else side
    }
    cand
      .join(shSide("doc_a", "sa"), Seq("doc_a"))
      .join(shSide("doc_b", "sb"), Seq("doc_b"))
      // same size-ratio prune as ngramJaccardPairs: skip the merge-walk
      // for pairs that cannot reach the threshold
      .where(least(size(col("sa")), size(col("sb"))).cast("double")
        >= lit(threshold) * greatest(size(col("sa")), size(col("sb"))).cast("double"))
      .withColumn("jaccard", jaccardSorted(col("sa"), col("sb")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Cross-corpus LSH near-dup JOIN — decontamination at full scale. The
    * q94 token-overlap path broadcasts the eval suites (MB-scale, the
    * common case); when the holdout side is itself corpus-sized (a
    * held-out shard, a licensed-content blocklist, yesterday's crawl),
    * the general form is this A x B banding join: both corpora shingle
    * and band independently, candidates meet on the shared (band,
    * bandhash) equi-join — ids-only through the exchange, never
    * all-pairs, neither side broadcast unless hinted — and the verify
    * pass joins each side's shingles back once per distinct candidate
    * pair. Same shuffle discipline and size-ratio prune as
    * [[lshNearDupPairs]]. Output: (doc_a from A, doc_b from B, jaccard
    * >= threshold); ids may overlap across corpora (sides stay
    * distinct). */
  def lshCrossCorpusPairs(dfA: DataFrame, dfB: DataFrame, idCol: String,
      textCol: String, k: Int, bands: Int, threshold: Double,
      broadcastShingles: Boolean = false): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val r = k / bands
    def prep(df: DataFrame) = track(graft.core.Caching.acquire(
      graft.core.Parallelism.floor(df, col(idCol))
        .select(col(idCol).as("doc_id"), shingleHashes(col(textCol)).as("xs"))))
    val shA = prep(dfA); val shB = prep(dfB)
    def banded(sh: DataFrame, as: String) = {
      val sigCols = minhashCols(col("xs"), k)
      val sig = sh.select(col("doc_id") +: sigCols.map { case (n, c) => c.as(n) }: _*)
      val sigRef = (0 until k).map(i => col(s"mh$i"))
      sig.select(col("doc_id").as(as),
        explode(array((0 until bands).map(bi =>
          struct(lit(bi).as("band"), bandHash(sigRef, bi, r).as("bh"))): _*)).as("b"))
        .select(col(as), col("b.band").as("band"), col("b.bh").as("bh"))
    }
    val cand = banded(shA, "doc_a").join(banded(shB, "doc_b"), Seq("band", "bh"))
      .select(col("doc_a"), col("doc_b")).distinct()
    def side(sh: DataFrame, idAs: String, xsAs: String) = {
      val s = sh.select(col("doc_id").as(idAs), col("xs").as(xsAs))
      if (broadcastShingles) broadcast(s) else s
    }
    cand
      .join(side(shA, "doc_a", "sa"), Seq("doc_a"))
      .join(side(shB, "doc_b", "sb"), Seq("doc_b"))
      .where(least(size(col("sa")), size(col("sb"))).cast("double")
        >= lit(threshold) * greatest(size(col("sa")), size(col("sb"))).cast("double"))
      .withColumn("jaccard", jaccardSorted(col("sa"), col("sb")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Decontaminate by cross-corpus LSH: drop every train doc near-dup
    * (jaccard >= threshold) with ANY eval doc — the anti-join over
    * [[lshCrossCorpusPairs]]'s distinct left ids. */
  def lshDecontaminate(train: DataFrame, evalDf: DataFrame, idCol: String,
      textCol: String, k: Int, bands: Int, threshold: Double,
      broadcastShingles: Boolean = false): DataFrame = {
    val dirty = lshCrossCorpusPairs(train, evalDf, idCol, textCol, k, bands,
      threshold, broadcastShingles).select(col("doc_a")).distinct()
    train.join(dirty, train(idCol) === dirty("doc_a"), "left_anti")
  }

  /** Near-dup CLUSTERS from near-dup PAIRS: connected components by
    * iterative min-label propagation (each node repeatedly adopts the
    * minimum label among itself and its neighbors until fixpoint). The
    * dedup post-step every pipeline needs — pairs alone over-count:
    * A~B, B~C must collapse to one canonical document {min id}.
    *
    * Converges in O(component diameter) rounds; near-dup components are
    * shallow (similarity is near-transitive), so the driver-side loop is
    * bounded and each round is one shuffle (join + min agg). At extreme
    * scale the alternating large-star/small-star algorithm (Kiveris et
    * al.) halves diameters per round — same join/agg shapes, more
    * rounds-efficiency; this implementation keeps the simpler recurrence
    * and asserts convergence within `maxIter`.
    *
    * Output: (node, component) with component = min node id reachable. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25, checkpointDir: Option[String] = None): DataFrame = {
    val symC = graft.core.Caching.acquire(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst"))))
    val sym = symC.ds
    // eager lineage truncation per round: each round's plan references the
    // previous labels twice, so without truncation the logical plan
    // doubles every round. Default localCheckpoint (blocks reclaimed by
    // the context cleaner, die with an executor); pass checkpointDir for
    // reliable checkpoint() on a multi-node cluster (Checkpointing.scala).
    // seed with min(self, neighbors) — the first propagation round folded
    // into initialization
    var labels = Checkpointing.truncate(
      sym.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src").as("node"), least(col("src"), col("mn")).as("component")),
      checkpointDir)
    // labels only ever DECREASE (least of self and neighbor minima), so
    // the decimal label sum is a complete convergence witness — one tiny
    // aggregation per round instead of a self-join change count
    // sum() over zero rows is SQL NULL — an empty pairs input (corpus with
    // no near-dups) must converge to an empty labeling, not NPE
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("component").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val nbrMin = sym.join(labels, col("dst") === col("node"))
        .groupBy(col("src")).agg(min(col("component")).as("nbr_min"))
      val updated = Checkpointing.truncate(
        labels
          .join(nbrMin.withColumnRenamed("src", "node"), Seq("node"), "left")
          .select(col("node"),
            least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component")),
        checkpointDir)
      val newSum = labelSum(updated)
      labels = updated
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      it += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    symC.release()
    labels
  }

  /** Connected components by ALTERNATING large-star/small-star rounds
    * (Kiveris et al. 2014, "Connected Components in MapReduce and
    * Beyond") — the extreme-scale form of [[connectedComponents]]:
    * converges in O(log n) rounds even on adversarially deep components
    * (a path graph collapses by roughly halving its height every
    * alternation), where min-label propagation needs O(diameter) rounds.
    *
    * Both operations are the same distributed shapes as the simple
    * recurrence: a groupBy-min per node plus one equi-join — no new
    * shuffle patterns, just fewer rounds. Edges stay oriented
    * (larger, smaller) and deduped, so the edge set is monotonically
    * star-ified; at fixpoint every non-root points directly at its
    * component minimum.
    *
    * Output: (node, component) with component = min reachable node id —
    * label-for-label identical to [[connectedComponents]]
    * (AltStarSpec proves equality on random graphs). */
  def connectedComponentsAltStar(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50, checkpointDir: Option[String] = None): DataFrame =
    altStarWithRounds(pairs, aCol, bCol, maxIter, checkpointDir)._1

  /** Measurement seam for graft.CcProbe (rounds + labels). */
  private[graft] def probeAltStar(pairs: DataFrame, aCol: String, bCol: String)
      : (DataFrame, Int) = altStarWithRounds(pairs, aCol, bCol, 50, None)

  private[operators] def altStarWithRounds(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int, checkpointDir: Option[String] = None): (DataFrame, Int) =
    altStarAnyWithRounds(
      pairs.select(col(aCol).cast("long").as("__a"), col(bCol).cast("long").as("__b")),
      "__a", "__b", maxIter, checkpointDir)

  /** [[connectedComponentsAltStar]] over ANY orderable key type (e.g. a
    * `struct(graph_id, node)` composite, which runs the components of
    * many small graphs in ONE iterative job instead of one alt-star loop
    * per graph — Spark orders structs lexicographically, so the
    * component id is `struct(graph_id, min node)`). */
  private[operators] def altStarAny(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50, checkpointDir: Option[String] = None): DataFrame =
    altStarAnyWithRounds(pairs, aCol, bCol, maxIter, checkpointDir)._1

  private[operators] def altStarAnyWithRounds(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int, checkpointDir: Option[String] = None): (DataFrame, Int) = {
    // symmetric adjacency by EXPLODE, not self-union: one scan of the
    // edge frame emits both orientations map-side, so a star's input is
    // referenced exactly ONCE in the round plan. (The union form scanned
    // it twice, which forced the large-star output to be checkpointed
    // before small-star could read it — a whole extra action per round.)
    def symmetric(e: DataFrame) =
      e.select(explode(array(struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
    // m(u) = min(Γ(u) ∪ {u}), attached to every sym row via ONE window
    // exchange on u — the agg+join form paid an aggregation exchange, a
    // join exchange AND a per-round broadcast build for the same
    // information; the window keys the identical shuffle and computes the
    // unordered min in-partition. (Skew note: a giant-degree node lands
    // its adjacency on one window task, but the join form shuffled sym by
    // u too, so the hot-key concentration is unchanged; only AQE's
    // skew-split of SMJ is given up, on a frame of two fixed-width ids.)
    def withMin(e: DataFrame): DataFrame =
      symmetric(e).withColumn("m",
        least(col("u"), min(col("v")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("u")))))
    // NO trailing distinct on either star: duplicates cannot change any
    // later min (the only thing a star computes), and the round's tagged
    // aggregation dedups (u, v) in the same exchange that computes the
    // convergence witness. Volume stays O(E): large-star emits exactly
    // one row per oriented input edge (the v > u orientation of each sym
    // pair), so dropping its distinct removes one exchange per round
    // without inflating the next one beyond the edge count the round
    // already shuffles twice.
    def largeStar(e: DataFrame): DataFrame =
      withMin(e).where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
    // The (u, m) self-edge emits once per sym ROW (not per node) — the
    // tagged aggregation absorbs the multiplicity map-side.
    def smallStarRaw(e: DataFrame): DataFrame =
      withMin(e).select(explode(when(col("v") < col("u"),
          array(struct(col("v").as("eu"), col("m").as("ev")),
            struct(col("u").as("eu"), col("m").as("ev"))))
        .otherwise(array(struct(col("u").as("eu"), col("m").as("ev"))))).as("e"))
        .select(col("e.eu").as("u"), col("e.ev").as("v"))
        .where(col("u") =!= col("v"))
    // the input pair frame is read THREE times (initial edge set + both
    // sides of the node universe), and for every caller it is the
    // expensive upstream join (near-dup pair generation, eps-cell
    // candidates, within-cell cosine pairs) — cache it for the scope of
    // this call and materialize both consumers eagerly, so the pair
    // join runs once (q75's plan scanned + re-joined the embedding
    // table four times without this). acquire() respects an input the
    // caller already persisted (Dbscan's pairs cache): release is a
    // no-op on caches this call did not create.
    val pairsC = graft.core.Caching.acquire(pairs)
    val nodes = Checkpointing.truncate(
      pairsC.ds.select(col(aCol).as("n"))
        .union(pairsC.ds.select(col(bCol).as("n"))).distinct(),
      checkpointDir)
    // eager lineage truncation each round: iterative self-referencing
    // plans grow exponentially otherwise (each round references the
    // previous edge set several times). Default localCheckpoint; pass
    // checkpointDir for reliable cluster checkpointing (Checkpointing.scala).
    val edges0 = Checkpointing.truncate(
      pairsC.ds.select(
        greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
        .where(col("u") =!= col("v")).distinct(),
      checkpointDir)
    pairsC.release()
    // The rounds run under a loop-scoped session (graft.core.LoopSession):
    // shuffle partitioning is derived ONCE from the measured initial edge
    // count — the same size-adaptive decision AQE re-makes per exchange
    // per round, minus the R·K replanning round-trips — and only frames
    // in lineage-truncated form cross the session boundary. The count is
    // one narrow scan of the just-checkpointed frame; edge counts only
    // shrink over rounds, so the initial count is the conservative bound.
    val callerSession = pairs.sparkSession
    val loopSession = graft.core.LoopSession.forRows(callerSession, edges0.count())
    var edges = graft.core.LoopSession.rebind(edges0, loopSession)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // ONE checkpoint action per round (was two): the round's whole
      // large-star -> small-star -> dedup+witness pipeline is a single
      // linear plan — explode-symmetric references each star's input
      // once, so the large-star output no longer needs its own eager
      // checkpoint before small-star reads it. The small-star dedup and
      // the exact set-equality convergence witness run in ONE tagged
      // aggregation: tag new edges 1, old edges 2, group by (u, v);
      // inNew/inOld flags give both e2 = {inNew} and changed =
      // ∃ inNew ≠ inOld. Per round that is 3 exchanges (two window
      // shuffles on u, one (u, v) aggregation) + one narrow no-shuffle
      // check scan of the checkpointed frame — down from 4 exchanges
      // across 2 checkpoint actions + the check.
      val f = Checkpointing.truncate(
        smallStarRaw(largeStar(edges)).select(col("u"), col("v"), lit(1).as("t"))
          .union(edges.select(col("u"), col("v"), lit(2).as("t")))
          .groupBy(col("u"), col("v"))
          .agg(max(col("t") === 1).as("inNew"), max(col("t") === 2).as("inOld")),
        checkpointDir)
      val changed = !f.where(col("inNew") =!= col("inOld")).isEmpty
      edges = f.where(col("inNew")).select(col("u"), col("v"))
      converged = !changed
      it += 1
    }
    require(converged, s"alt-star components did not converge in $maxIter rounds")
    // back onto the caller's session (edges is a filter+project over the
    // round's checkpointed frame — a LogicalRDD leaf, no session state to
    // re-resolve) before joining caller-session nodes
    val edgesOut = graft.core.LoopSession.rebind(edges, callerSession)
    val labels = nodes.join(edgesOut.withColumnRenamed("u", "n"), Seq("n"), "left")
      .select(col("n").as("node"), coalesce(col("v"), col("n")).as("component"))
    (labels, it)
  }

  /** 16-bit SimHash over distinct whitespace tokens: bit j set iff more
    * than half the token hashes have bit j set. Native one-pass majority
    * kernel (graft.plans.SimHash16) — the HOF form walks the hash array
    * once per bit. */
  def simhash16(textCol: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val hs = transform(array_distinct(TextAnalysis.tokens(textCol)),
      t => TextAnalysis.polyHash(t) % 65536)
    column(graft.plans.SimHash16(expression(hs)))
  }

  /** Token n-grams of every position (NOT distinct — spans need each
    * occurrence): 0-based start position + int64 poly-hash. The hashed
    * per-doc arrays are cached pre-explode (parallelism-floored): the
    * occurrence-count side and the mark-back side both read this frame,
    * and without the cache the tokenize+hash pass re-runs per branch —
    * single-task on a one-split corpus. Released by the consuming
    * wrapper (Caching.releaseTracked). */
  private def ngramPositions(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    graft.core.Caching.acquireTracked(graft.core.Parallelism.floor(
        df.select(col(idCol).as("doc_id"),
          TextAnalysis.tokenNgramHashesAll(col(textCol), n).as("gs")),
        col("doc_id")))
      .select(col("doc_id"), posexplode(col("gs")).as(Seq("pos", "g")))

  /** Exact-substring duplicated-span detection — the ExactSubstr side of
    * the published training-data dedup recipe (Lee et al. 2021,
    * arXiv:2107.06499, which the reference-style pipelines run with a
    * suffix array): any token span of length >= n occurring more than once
    * in the corpus (across documents or repeated within one) is marked,
    * and overlapping/adjacent marks merge into maximal spans.
    *
    * Token-granular equivalence to the suffix-array formulation: a
    * duplicated substring of >= n tokens contains a duplicated n-gram at
    * every offset, so the union of duplicated n-gram spans [i, i+n) is
    * exactly the token set inside duplicated >= n-token substrings.
    *
    * Scale shape: n-gram hashing is per-row (no shuffle); occurrence
    * counting is one map-side-combinable int64 aggregation; the mark-back
    * join is an int64 equi-join (AQE broadcasts it when the duplicated
    * set is small, the common case); span merging is a per-document
    * window — the same doc_id shuffle any per-doc aggregate pays. Hashes
    * are polyHash mod 1e9+7 so the SQL oracle replays them exactly; a
    * production run would widen to 128 bits (xxhash64 pairs) to make
    * collisions negligible at 10^12 n-grams.
    *
    * @return one row per merged span: doc_id, span_id (0-based per-doc
    *         ordinal by position), s (inclusive), e (exclusive) token
    *         indices. Documents with no duplicated span emit no rows.
    */
  def duplicatedNgramSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, minCount: Long = 2L, keepCanonical: Boolean = false): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minCount >= 2L, s"minCount must be >= 2, got $minCount")
    val pos = ngramPositions(df, idCol, textCol, n)
    // keepCanonical = the Lee et al. retention policy: ONE occurrence of
    // each duplicated n-gram survives — the lexicographically lowest
    // (doc_id, pos), elected in the same single aggregation that counts
    // (min over a struct is the lexicographic argmin; deterministic
    // under any partitioning). All other occurrences mark. A canonical
    // position can still fall inside a span marked by a DIFFERENT
    // n-gram's non-canonical occurrence — spans are maximal unions, the
    // same convention as the detection side.
    val marked =
      if (!keepCanonical)
        pos.join(
          pos.groupBy("g").agg(count(lit(1)).as("cnt"))
            .where(col("cnt") >= minCount).select("g"),
          Seq("g")).select(col("doc_id"), col("pos"))
      else
        pos.join(
          pos.groupBy("g")
            .agg(count(lit(1)).as("cnt"),
              min(struct(col("doc_id"), col("pos"))).as("canon"))
            .where(col("cnt") >= minCount)
            .select(col("g"), col("canon")),
          Seq("g"))
          .where(!(col("doc_id") === col("canon.doc_id") &&
            col("pos") === col("canon.pos")))
          .select(col("doc_id"), col("pos"))
    // Island merge in ONE doc_id shuffle: gather each doc's marked
    // positions (bounded by doc length — the per-doc-array invariant
    // every text operator here relies on) and fold them into maximal
    // spans with a HOF aggregate. The windowed formulation pays the same
    // doc_id exchange PLUS a second (doc_id, island) aggregation
    // exchange — measured 1.5x slower at sf0.1.
    val emptySpans = array().cast("array<struct<s:bigint,e:bigint>>")
    marked
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
      .select(col("doc_id"), posexplode(
        aggregate(col("ps"), emptySpans, { (acc, p0) =>
          val p = p0.cast("long")
          val last = element_at(acc, -1)
          when(size(acc) > 0 && p <= last.getField("e"),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(struct(last.getField("s").as("s"),
                greatest(last.getField("e"), p + n).as("e")))))
            .otherwise(concat(acc, array(struct(p.as("s"), (p + n).as("e")))))
        })).as(Seq("span_id", "sp")))
      .select(col("doc_id"), col("span_id").cast("long").as("span_id"),
        col("sp.s").as("s"), col("sp.e").as("e"))
  }

  /** Remove duplicated spans from each document: tokens inside any
    * [[duplicatedNgramSpans]] span are dropped, the rest re-join with
    * single spaces (token-normalized text, as the published recipe edits
    * the tokenized stream). Returns doc_id, n_tok (pre-removal),
    * n_removed, clean_text. Documents with nothing to remove pass through
    * (left join keeps them; span filtering is per-row HOF work). */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, minCount: Long = 2L, keepCanonical: Boolean = false): DataFrame = {
    val spans = duplicatedNgramSpans(df, idCol, textCol, n, minCount, keepCanonical)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
    df.select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("spans",
        coalesce(col("spans"), array().cast("array<struct<s:bigint,e:bigint>>")))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        aggregate(col("spans"), lit(0L),
          (acc, sp) => acc + sp.getField("e") - sp.getField("s")).as("n_removed"),
        concat_ws(" ", filter(col("toks"), (t, i) =>
          !exists(col("spans"), sp =>
            i.cast("long") >= sp.getField("s") && i.cast("long") < sp.getField("e"))))
          .as("clean_text"))
  }

  /** WITHIN-document line dedup — the intra-doc repetition-removal step
    * the C4/RefinedWeb cleaning stacks run before any cross-document
    * dedup (boilerplate nav bars, cookie banners and footer text repeat
    * inside a page long before they repeat across pages): drop every
    * line whose normalized form (lower+trim) already appeared earlier in
    * the SAME document, preserving the order of first occurrences.
    *
    * Implemented as a PURE PROJECTION via the `aggregate` higher-order
    * function folding a (seen-keys, kept-lines) accumulator over the
    * line array — zero shuffles, in contrast to the explode → window
    * rank → re-aggregate formulation which pays two exchanges and a
    * per-(doc,line-key) window. The fold is O(L²) in a document's LINE
    * count (array_contains per line) — L is tens-to-hundreds for real
    * pages, so the quadratic term is noise next to the shuffle it
    * replaces; a million-line pathological doc belongs to the
    * exact-substring machinery ([[duplicatedNgramSpans]]) instead.
    *
    * Output: (doc_id, text_dedup, n_lines, n_kept). Empty lines dedup
    * like any other (normalized key "") — successive blank lines
    * collapse to the first, which is the C4 behavior for whitespace
    * boilerplate. */
  def dedupLinesWithin(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val emptyAcc = struct(
      array().cast("array<string>").as("seen"),
      array().cast("array<string>").as("kept"))
    val ls = split(col(textCol), "\n")
    val acc = aggregate(ls, emptyAcc, (a, x) => {
      val key = lower(trim(x))
      when(array_contains(a.getField("seen"), key), a)
        .otherwise(struct(
          concat(a.getField("seen"), array(key)).as("seen"),
          concat(a.getField("kept"), array(x)).as("kept")))
    })
    df.select(col(idCol).as("doc_id"), ls.as("ls"), acc.getField("kept").as("kept"))
      .select(col("doc_id"),
        array_join(col("kept"), "\n").as("text_dedup"),
        size(col("ls")).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept"))
  }

  /** Content-defined chunking + cross-document chunk dedup — the
    * storage-style dedup primitive (LBFS/Venti lineage; rsync's rolling
    * window): cut a document AFTER every position whose trailing w=8
    * character window hashes to 0 mod 64, so boundaries are CONTENT
    * anchors — insert a paragraph and every later chunk realigns
    * identically, where fixed-size blocks would shift and nothing would
    * dedup. Chunk fingerprints then dedup corpus-wide by equality: the
    * coarse complement to token-level exact-substring spans
    * ([[duplicatedNgramSpans]]) that a 100 TB pipeline can afford on
    * EVERY document (hash-keyed counts, no suffix machinery).
    *
    * The window hash is the plain 8-term polynomial Σ ord(c)·31^k —
    * exact in int64 (max < 2.5e17), written literally in the q143
    * oracle. Boundary enumeration is a per-row HOF projection; the only
    * shuffles are the chunk-hash count aggregation and the hash-keyed
    * join back (AQE size-gated), both linear in chunks ≈ chars/64.
    *
    * Output per doc: (doc_id, n_chunks, n_dup_chunks, chunks_fp) where
    * n_dup_chunks counts this doc's chunks whose content occurs more
    * than once corpus-wide and chunks_fp pins the ordered chunk-hash
    * stream. Documents with empty normalized text vanish (no chunks) —
    * mirrored in the oracle. */
  def cdcChunkStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pows = (7 to 0 by -1).map(k => math.pow(31, k).toLong) // 31^7..31^0
    // LAMBDA DISCIPLINE — the two traps this implementation dodges:
    // (1) higher-order lambdas evaluate interpreted, re-running every
    // subtree in the BODY once per element, and CollapseProject inlines
    // staged columns into lambda bodies (lambda-internal references are
    // not counted as multi-use) — so a body touching an O(chars)
    // expression re-walks the document per element; (2) inlining is
    // MULTIPLICATIVE through the expression DAG — every reference to a
    // column re-evaluates its full upstream chain (a zip_with-chain
    // formulation of the window hashes measured 48 s for 500 docs this
    // way). The boundary scan is therefore ONE aggregate fold with the
    // classic O(1) ROLLING update h' = h·31 + c_in − c_out·31^8,
    // accumulating boundary positions directly — a single per-row pass
    // whose body touches two characters, nothing else.
    val pow8 = pows.head * 31L // 31^8
    // per-char codes from ONE split (no per-element substr into s); the
    // outgoing-window char rides each element as a pre-zipped struct so
    // the fold body touches nothing but its element and the accumulator
    val nOr1 = greatest(col("n"), lit(1))
    val codes = transform(slice(split(col("s"), ""), lit(1), nOr1),
      c => ascii(c).cast("long"))
    val cOut = concat(array_repeat(lit(0L), lit(8)),
      slice(codes, lit(1), greatest(col("n") - 8, lit(0))))
    val pairs = zip_with(codes, cOut,
      (a, b) => struct(a.as("cin"), b.as("cout")))
    val withIdx = zip_with(pairs, sequence(lit(1), nOr1),
      (p, i) => struct(i.as("i"),
        p.getField("cin").as("cin"), p.getField("cout").as("cout")))
    val boundaryFold = aggregate(
      when(col("n") >= 8, withIdx)
        .otherwise(array().cast("array<struct<i:int,cin:bigint,cout:bigint>>")),
      struct(lit(0L).as("h"), array().cast("array<int>").as("bp")),
      (a, p) => {
        val h2 = a.getField("h") * 31L + p.getField("cin") -
          p.getField("cout") * pow8
        struct(h2.as("h"),
          when(p.getField("i") >= 8 && h2 % 64 === 0,
            concat(a.getField("bp"), array(p.getField("i"))))
            .otherwise(a.getField("bp")).as("bp"))
      })
    // CODE-UNIT SEMANTICS PINNED: the rolling hash reads char codes via
    // Spark `ascii()`, the q143 oracle via DuckDB `ord()` (codepoints),
    // and the spec reference via UTF-16 charAt — three engines that only
    // agree on ASCII. Project the normalized text onto printable ASCII
    // (everything outside [0x20,0x7e] -> one space) BEFORE chunking, so
    // boundaries are engine-independent on arbitrary web text; the oracle
    // and CdcChunkSpec apply the identical projection (non-ASCII case
    // proven in the spec).
    val staged = df
      .select(col(idCol).as("doc_id"),
        regexp_replace(TextAnalysis.normText(col(textCol)),
          "[^\\x20-\\x7e]", " ").as("s"))
      .withColumn("n", length(col("s")))
      .withColumn("bounds",
        concat(array(lit(0)), boundaryFold.getField("bp"), array(col("n"))))
      // chunk extraction zips two shifted slices of bounds: the heavy
      // subtree sits in input position (evaluated per row, not per
      // element) and the body touches only its elements and `s`
      .withColumn("chunks", filter(
        zip_with(
          slice(col("bounds"), lit(1), size(col("bounds")) - 1),
          slice(col("bounds"), lit(2), size(col("bounds")) - 1),
          (a, b) => col("s").substr(a + 1, b - a)),
        c => length(c) > 0))
    val ex = staged
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("idx", "chunk")))
      .select(col("doc_id"), col("idx"),
        md5(col("chunk").cast("binary")).as("h"))
    val counts = ex.groupBy("h").agg(count(lit(1)).as("cnt"))
    ex.join(counts, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        md5(concat_ws("",
          transform(sort_array(collect_list(struct(col("idx"), col("h")))),
            p => p.getField("h"))).cast("binary")).as("chunks_fp"))
  }

  /** CORPUS-WIDE line dedup — the cross-document sibling of
    * [[dedupLinesWithin]] (the CCNet / MassiveText paragraph-dedup step:
    * shared boilerplate — cookie banners, subscribe prompts, nav bars —
    * repeats across *pages*, so within-doc dedup alone leaves one copy
    * per page corpus-wide). Every line whose normalized form
    * (lower+trim) already occurred at an earlier corpus position is
    * dropped; the single FIRST occurrence (ordered by (doc_id, line
    * index)) survives. Empty/whitespace-only lines are never dedup
    * candidates — they are page structure, not content, and a global
    * "first blank line wins" would strip formatting from every document
    * but one.
    *
    * Scale shape (the part that matters at 100 TB): document text never
    * shuffles. The exploded candidate frame carries only (doc_id, idx,
    * md5(norm)) — fixed-width rows; first-occurrence election is ONE
    * map-side-combinable min() on the md5 key (a hot boilerplate line
    * collapses to one row per map partition before the exchange, so
    * key skew is absorbed by partial aggregation); the join back is a
    * fixed-width equi-join on the same key (AQE skew-split eligible);
    * and reconstruction joins a per-doc int-array of DROPPED indexes
    * (small — only actual duplicates) back to the base table on doc_id,
    * rebuilding via a per-row HOF filter. Position packing doc_id·2^20 +
    * idx bounds documents at 2^20 lines and ids at 2^43 — both are
    * checked nowhere hot (a violating corpus wraps the ordering, not
    * the dedup semantics). md5 (not xxhash) keys keep the election
    * bit-replayable in the DuckDB oracle.
    *
    * Output: (doc_id, text_dedup, n_lines, n_kept) — the
    * [[dedupLinesWithin]] shape, so the two compose in either order. */
  def dedupLinesAcross(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ls = split(col(textCol), "\n")
    val base = df.select(col(idCol).cast("long").as("doc_id"), ls.as("ls"))
    val cand = base
      .select(col("doc_id"), posexplode(col("ls")).as(Seq("idx", "line")))
      .withColumn("norm", lower(trim(col("line"))))
      .where(col("norm") =!= "")
      .select(col("doc_id"), col("idx"),
        md5(col("norm").cast("binary")).as("k"),
        (col("doc_id") * 1048576L + col("idx")).as("packed"))
    val firsts = cand.groupBy("k").agg(min(col("packed")).as("first_packed"))
    val dropped = cand.join(firsts, "k")
      .where(col("packed") =!= col("first_packed"))
      .groupBy("doc_id")
      .agg(collect_list(col("idx")).as("drop_idx"))
    base.join(dropped, Seq("doc_id"), "left")
      .withColumn("drop_idx",
        coalesce(col("drop_idx"), array().cast("array<int>")))
      .withColumn("kept", filter(col("ls"),
        (l, i) => !array_contains(col("drop_idx"), i)))
      .select(col("doc_id"),
        array_join(col("kept"), "\n").as("text_dedup"),
        size(col("ls")).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept"))
  }

  /** HOF reference form of [[simhash16]] (cross-check oracle). */
  def simhash16Hof(textCol: Column): Column = {
    val toks = array_distinct(TextAnalysis.tokens(textCol))
    val hs = transform(toks, t => TextAnalysis.polyHash(t) % 65536)
    val n = size(toks)
    (0 until 16).map { j =>
      val pow = 1L << j
      when(lit(2) * size(filter(hs, h => (h.cast("long") / pow).cast("long") % 2 === 1)) > n, lit(pow))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
