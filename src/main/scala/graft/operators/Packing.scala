package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-sequence packing: the concat-and-chunk step that turns a
 * curated document set into fixed-token-length training sequences. Docs
 * are laid end-to-end in a deterministic order inside each pack shard;
 * every document gets its token-stream offset and the range of
 * `budget`-sized chunks it lands in. This is the bookkeeping a
 * tokenize-and-pack job needs to emit sequences (and to answer "which
 * docs does sequence k contain" for attribution) without materializing
 * the token stream itself.
 *
 * Scale shape: ONE hash shuffle on the shard key, then a per-shard sort
 * and a running sum — the standard window plan. The shard is the packing
 * unit: offsets never cross shards, so shards process independently and
 * the running sum's state is one long per open partition. At 100 TB the
 * shard key must be finer than `source` (source × date × part-file is
 * typical) so a shard stays executor-sized; the contract only requires
 * that the (shard, order) pair is a total order within each shard.
 *
 * Determinism contract: `order` must be unique per row within a shard
 * (doc_id is; a content hash salted with the id also is). Ties would make
 * WHICH doc precedes which — and hence every downstream offset —
 * run-dependent.
 */
object Packing {

  /** Per-doc chunk assignment: start offset in the shard's token stream,
    * and the first/last index of the `budget`-token chunks the doc spans
    * (a doc longer than `budget` spans several; chunk indexes are
    * per-shard). `tokens` must be ≥ 1 for every row (whitespace
    * tokenization of any string yields ≥ 1 — the empty string is one
    * empty token), so `chunkLast ≥ chunkFirst` always holds. */
  def assignChunks(df: DataFrame, shard: Column, order: Column,
                   tokens: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(shard).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // floor over exact-in-double magnitudes (token offsets ≪ 2^53); the
    // double division is what DuckDB's `/` does, so the oracle agrees.
    df.withColumn("n_tokens", tokens.cast("long"))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("chunk_first",
        floor(col("start_off") / lit(budget.toDouble)).cast("long"))
      .withColumn("chunk_last",
        floor((col("start_off") + col("n_tokens") - 1) / lit(budget.toDouble))
          .cast("long"))
  }

  /** EMIT the packed sequences: one row per (shard, chunk) carrying the
    * chunk's exact token stream — each doc contributes the slice of its
    * tokens that falls inside the chunk, pieces concatenated in stream
    * order. Every chunk except a shard's last holds exactly `budget`
    * tokens (PackingSpec pins it); the md5 of the emitted text is what
    * the q77 oracle hash-matches, so a slice boundary or ordering bug
    * anywhere breaks the byte-exact comparison.
    *
    * Shape on top of assignChunks' window: one explode over the per-doc
    * chunk RANGE (a doc of n tokens lands in ≤ n/budget+1 chunks — the
    * explosion factor is ~1, not token count), a row-local token slice,
    * then one hash aggregation on (shard, chunk). The doc's token array
    * is built AFTER the window from the carried text, so the window
    * shuffle moves each text once and no array rides through the sort
    * buffer. Within a chunk the pieces are ordered by start_off via
    * array_sort over (offset, piece) structs — offsets are unique per
    * chunk, so the order (and the md5) is total and deterministic. */
  def emitChunks(df: DataFrame, shard: Column, order: Column,
                 text: Column, budget: Int): DataFrame = {
    val assigned = assignChunks(df, shard, order,
      TextAnalysis.wsTokenCount(text), budget)
      .select(shard.as("shard"), col("start_off"), col("n_tokens"),
        col("chunk_first"), col("chunk_last"), text.as("_text"))
    assigned
      .select(col("shard"), col("start_off"), col("n_tokens"), col("_text"),
        explode(sequence(col("chunk_first"), col("chunk_last"))).as("chunk"))
      .withColumn("ls", greatest(col("chunk") * budget - col("start_off"), lit(0L)))
      .withColumn("le",
        least((col("chunk") + 1) * budget - col("start_off"), col("n_tokens")))
      .withColumn("piece", concat_ws(" ",
        slice(split(col("_text"), " "), (col("ls") + 1).cast("int"),
          (col("le") - col("ls")).cast("int"))))
      .groupBy(col("shard"), col("chunk"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("le") - col("ls")).as("n_tokens"),
        array_sort(collect_list(struct(col("start_off").as("o"), col("piece").as("p"))))
          .as("_ps"))
      .select(col("shard"), col("chunk"), col("n_docs"), col("n_tokens"),
        md5(concat_ws(" ", transform(col("_ps"), s => s.getField("p")))).as("text_md5"))
  }

  /** Sliding-window chunking of long documents into OVERLAPPING
    * `maxTokens`-token windows advancing `stride` tokens at a time
    * (overlap = maxTokens − stride) — the long-context training prep that
    * [[emitChunks]]' disjoint packing is not: each window re-reads the
    * tail of its predecessor, so no span of ≤ overlap tokens is ever cut
    * by a chunk boundary (the standard stride-chunking recipe for
    * fine-tuning on documents longer than the context window).
    *
    * Windows start at token offsets 0, stride, 2·stride, …; the last
    * window is the first whose span reaches the document's final token
    * (`k_max = ceil((n − maxTokens)/stride)`, 0 when the doc fits in one
    * window), so every token appears in ≥ 1 chunk and trailing windows
    * shorter than `stride` are never emitted empty.
    *
    * Scale shape: entirely ROW-LOCAL — one split of the text, one
    * sequence-explode over the chunk range (factor ≈ n/stride), one
    * array slice per chunk; no shuffle at any corpus size, and the
    * integer chunk arithmetic (`div`, not a double divide) is exact
    * cross-engine. Output: (id, chunk_idx, chunk_start, n_tokens,
    * chunk_text). */
  def chunkWithOverlap(docs: DataFrame, id: Column, text: Column,
                       maxTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && stride <= maxTokens,
      s"stride must be in [1, maxTokens]; got stride=$stride maxTokens=$maxTokens")
    docs
      .select(id.as("id"), split(text, " ").as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        greatest(lit(0L),
          expr(s"(_n - $maxTokens + $stride - 1) div $stride").cast("long")))))
      .withColumn("chunk_start", col("chunk_idx") * stride)
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("_toks"), (col("chunk_start") + 1).cast("int"),
          lit(maxTokens))))
      .select(col("id"), col("chunk_idx"), col("chunk_start"),
        least(lit(maxTokens.toLong), col("_n") - col("chunk_start")).as("n_tokens"),
        col("chunk_text"))
  }

  /** Per-chunk summary over an assignment: how many docs START in each
    * chunk and how many tokens those docs carry — the sequence-emission
    * work list (chunk k's writer reads docs starting in k plus the tail
    * of its left neighbour's last straddler; `straddles_out` = 1 marks
    * chunks whose final doc spills into k+1). */
  def chunkSummary(assigned: DataFrame, shard: Column): DataFrame =
    assigned
      .groupBy(shard.as("shard"), col("chunk_first").as("chunk"))
      .agg(count(lit(1)).as("n_docs_start"),
        sum(col("n_tokens")).as("tokens_started"),
        max((col("chunk_last") > col("chunk_first")).cast("int"))
          .as("straddles_out"))
}
