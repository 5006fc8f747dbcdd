package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence preparation for training/RAG pipelines: token-window
  * chunking (long documents → overlapping fixed-size windows, the
  * every-pretrain/RAG chunker) and contiguous sequence packing
  * (documents → fixed token-budget bins, the GPT-style packed-stream
  * step between tokenization and batching).
  *
  * Both are exact integer/array arithmetic over per-doc token arrays —
  * chunking is a pure per-row explode (no shuffle), packing is one
  * prefix sum — so a SQL oracle replays every chunk boundary and bin
  * assignment token-for-token.
  */
object SequencePrep {

  /** Overlapping token windows: chunk c covers tokens
    * [c·stride, c·stride + size) with stride = size − overlap, emitted
    * while c·stride < n_tokens (the standard HF-style stride chunker —
    * ceil(n/stride) chunks, the tail window may be short). Pure per-row
    * HOF work + one explode; no shuffle, the chunk multiplicity is the
    * only row growth.
    *
    * Returns doc_id, chunk_id, start_tok, n_tok, chunk_text. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size >= 1, s"size must be >= 1, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap")
    val stride = size - overlap
    val toks = TextAnalysis.tokens(col(textCol))
    val n = org.apache.spark.sql.functions.size(toks)
    val nChunks = ceil(n.cast("double") / stride).cast("int")
    df.select(col(idCol).as("doc_id"),
        posexplode(transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1),
          c => slice(toks, c * stride + 1, lit(size)))).as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id") * stride).cast("long").as("start_tok"),
        org.apache.spark.sql.functions.size(col("chunk")).cast("long").as("n_tok"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
  }

  /** Contiguous sequence packing: within each stratum (shard), documents
    * in id order form one concatenated token stream cut into bins of
    * `budget` tokens — each document starts at global token offset
    * cum − n, lands in bin (cum−n) div budget at offset (cum−n) mod
    * budget, and spans `n_bins` consecutive bins (boundary documents
    * straddle, the packed-stream convention: splitting at bin edges is
    * the batcher's job). One prefix sum per stratum; the stratum column
    * keeps the window partitioned — a truly global pack would serialize
    * the prefix sum, so 100 TB pipelines pack per shard exactly like
    * this. */
  def packSequences(df: DataFrame, idCol: String, strataCol: String,
      nTokCol: String, budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(idCol)
      .rowsBetween(Long.MinValue, 0)
    val n = col(nTokCol).cast("long")
    df.withColumn("__cum", sum(n).over(w))
      .select(col(idCol), col(strataCol), n.as("n_tok"),
        expr(s"(__cum - CAST($nTokCol AS BIGINT)) div $budget").as("bin"),
        expr(s"(__cum - CAST($nTokCol AS BIGINT)) % $budget").as("offset"),
        (expr(s"(__cum - 1) div $budget")
          - expr(s"(__cum - CAST($nTokCol AS BIGINT)) div $budget") + 1)
          .as("n_bins"))
  }

  /** Sentence-aware greedy chunking — the RAG/packing variant that never
    * splits a sentence (vs [[chunkTokens]]' fixed windows): sentences
    * (split on terminal-punctuation + space runs), greedily packed into
    * chunks of at most `budget` tokens; a single over-budget sentence
    * becomes its own oversized chunk (the standard rule — truncation is
    * a downstream policy). One aggregate fold per row, shuffle-free; the
    * fold's (done, cur) recurrence replays in SQL list_reduce token for
    * token. Output per doc: n_sentences, n_chunks, max_chunk_tokens and
    * the order-dependent poly-hash of the chunk-size stream. */
  def sentencePack(df: DataFrame, idCol: String, textCol: String,
      budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val sents = filter(
      split(TextAnalysis.normText(col(textCol)), "[.!?]+ +"),
      s => length(s) > 0)
    val counts = transform(sents,
      s => org.apache.spark.sql.functions.size(
        filter(split(s, " +"), w => length(w) > 0)))
    val acc0 = struct(array().cast("array<int>").as("done"), lit(0).as("cur"))
    val folded = aggregate(counts, acc0,
      (a, t) => {
        val done = a.getField("done"); val cur = a.getField("cur")
        when(cur === 0, struct(done.as("done"), t.as("cur")))
          .otherwise(when(cur + t <= budget,
            struct(done.as("done"), (cur + t).as("cur")))
          .otherwise(
            struct(concat(done, array(cur)).as("done"), t.as("cur"))))
      },
      a => when(a.getField("cur") > 0,
        concat(a.getField("done"), array(a.getField("cur"))))
        .otherwise(a.getField("done")))
    df.select(col(idCol).as("doc_id"), sents.as("ss"), folded.as("chunks"))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(col("ss")).cast("long").as("n_sentences"),
        org.apache.spark.sql.functions.size(col("chunks")).cast("long").as("n_chunks"),
        coalesce(array_max(col("chunks")), lit(0)).cast("long").as("max_chunk_tokens"),
        aggregate(col("chunks"), lit(7L),
          (a, x) => (a * 31 + x) % TextAnalysis.HashMod).as("sizes_fp"))
  }

  /** Length-bucketed batch assembly (HF `group_by_length` /
    * TF `bucket_by_sequence_length`): group similar-length sequences so
    * a padded batch wastes < `width` pad tokens per row — the inference/
    * training dataloader step between tokenization and the GPU. Docs are
    * bucketed by token count (width-`width` integer bins), sharded by
    * id (the multi-worker dataloader shape: each shard assembles its
    * own batches independently, so no global order exists to funnel
    * through one task), ranked longest-first within (bucket, shard),
    * and cut into `batchSize`-row batches.
    *
    * All integer arithmetic. Returns one row per batch:
    * (bucket, shard, batch_idx, n_docs, max_len, sum_tok, waste) with
    * waste = n_docs·max_len − sum_tok, bounded by n_docs·(width−1). */
  def lengthBucketBatches(df: DataFrame, idCol: String, textCol: String,
      width: Int = 16, batchSize: Int = 8, nShards: Int = 4): DataFrame = {
    require(width >= 1 && batchSize >= 1 && nShards >= 1,
      s"width/batchSize/nShards must be >= 1, got $width/$batchSize/$nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket", "shard")
      .orderBy(col("n_tok").desc, col("doc_id"))
    df.select(col(idCol).as("doc_id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
      // greatest(n_tok, 1) keeps empty docs in bucket 0: (0-1) div W is 0
      // in Spark (truncating div) but -1 in DuckDB (flooring //)
      .withColumn("bucket", expr(s"(greatest(n_tok, 1) - 1) div $width"))
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
      .withColumn("rnk", row_number().over(w))
      .withColumn("batch_idx", expr(s"(rnk - 1) div $batchSize").cast("long"))
      .groupBy("bucket", "shard", "batch_idx")
      .agg(count(lit(1)).as("n_docs"), max(col("n_tok")).as("max_len"),
        sum(col("n_tok")).as("sum_tok"))
      .withColumn("waste", col("n_docs") * col("max_len") - col("sum_tok"))
  }
}
