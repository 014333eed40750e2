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

  /** Length-bucketed batch construction — the padding-minimizing
    * batching sampler: documents band into fixed-width token-length
    * buckets (a batch drawn from one band wastes at most bandWidth−1
    * pad tokens per row, vs worst-case max-length padding under random
    * batching), then fill `batchSize`-row batches in a deterministic
    * content-hash order.
    *
    * Scale shape: batches form within (bucket, shard) — shard =
    * md5₄₈(id) mod nShards, the q83 trick — so every sort window is
    * corpus/(buckets·shards)-sized and no single hot band serializes;
    * batch identity is (bucket, shard, batch_idx), reproducible from
    * the data alone (no RNG, no driver state). */
  def lengthBatches(docs: DataFrame, id: String, text: String,
                    bandWidth: Int, batchSize: Int, nShards: Int): DataFrame = {
    require(bandWidth >= 1 && batchSize >= 1 && nShards >= 1)
    val base = docs.select(col(id).as("did"),
        size(split(col(text), " ")).as("n_tokens"))
      .withColumn("bucket", (col("n_tokens") / bandWidth).cast("long"))
      .withColumn("shard",
        graft.operators.TextAnalysis.md5Hash48(col("did").cast("string")) % nShards)
      .withColumn("h",
        graft.operators.TextAnalysis.md5Hash48(concat_ws(":", col("did"), lit("b"))))
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("h"), col("did"))
    base.withColumn("rn", row_number().over(w) - 1)
      .select(col("did"), col("n_tokens"), col("bucket"), col("shard"),
        (col("rn") / batchSize).cast("long").as("batch_idx"),
        (col("rn") % batchSize).cast("long").as("pos_in_batch"))
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4), made exactly
    * replayable: the token stream is cut into fixed `blockSize` windows,
    * each block masks at most one span, and the span's presence, offset,
    * and length all derive from md5₄₈(doc:block) — no RNG state, no
    * sequential dependency between blocks (the greedy left-to-right
    * sampler of the paper is inherently order-dependent; block
    * alignment buys non-overlap BY CONSTRUCTION and lets both engines
    * replay every mask decision independently).
    *
    * Per block b (full blocks only): mask iff h mod 20 < 7 (~35% of
    * blocks ⇒ ~12% of tokens at mean span 3); start = 8b + (h div 20)
    * mod 5; len = 2 + (h div 100) mod 3 — always inside the block. The
    * corrupted text replaces each span with the sentinel `<X_k>` (k =
    * the span's per-doc ordinal by position, the T5 extra-id scheme).
    *
    * Scale shape: mask decisions are a row-local projection over
    * (doc, block); the rewrite joins token positions to spans on the
    * EQUI key (doc, pos div blockSize) — q94's rebuild pattern, one
    * (doc, pos) shuffle, no range join. Returns (id, n_spans,
    * n_masked, corrupted). */
  def spanCorruption(docs: DataFrame, id: String, text: String,
                     blockSize: Int = 8): DataFrame = {
    require(blockSize >= 8, "spanCorruption needs blockSize >= 8 (offset 0..4 + len 2..4)")
    val toks = docs.select(col(id).as("did"), split(col(text), " ").as("ts"))
    val spans = toks
      .select(col("did"),
        // guard: sequence(0, -1) would step BACKWARD ([0, -1]) — docs
        // shorter than one block contribute no candidate blocks at all
        explode_outer(when(size(col("ts")) >= blockSize,
          sequence(lit(0),
            (size(col("ts")) / blockSize).cast("int") - 1))).as("b"))
      .filter(col("b").isNotNull)
      .withColumn("h", graft.operators.TextAnalysis.md5Hash48(
        concat_ws(":", col("did"), col("b"))))
      .filter(col("h") % 20 < 7)
      .select(col("did"), col("b"),
        (col("b") * blockSize +
          floor(col("h") / 20).cast("long") % 5).as("start"),
        (lit(2) + floor(col("h") / 100).cast("long") % 3).as("len"))
      .withColumn("k", row_number().over(
        Window.partitionBy(col("did")).orderBy(col("start"))) - 1)
    val pos = toks
      .select(col("did"), posexplode(col("ts")).as(Seq("pos", "tok")))
      .withColumn("pb", (col("pos") / blockSize).cast("int"))
    val rewritten = pos
      .join(spans.withColumnRenamed("b", "pb"), Seq("did", "pb"), "left")
      .withColumn("out",
        when(col("start").isNull ||
          col("pos") < col("start") || col("pos") >= col("start") + col("len"),
          col("tok"))
          .when(col("pos") === col("start"),
            concat(lit("<X_"), col("k"), lit(">"))))
      .filter(col("out").isNotNull)
      .groupBy(col("did"))
      .agg(array_join(array_sort(collect_list(struct(col("pos"), col("out"))))
        .getField("out"), " ").as("corrupted"))
    val stats = spans.groupBy(col("did"))
      .agg(count(lit(1)).as("n_spans"), sum(col("len")).as("n_masked"))
    toks.select(col("did"))
      .join(stats, Seq("did"), "left")
      .join(rewritten, Seq("did"), "left")
      .select(col("did"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        col("corrupted"))
  }

  /** Fill-in-the-middle document transform (Bavarian et al. 2022 — the
    * FIM objective behind code-completion training data; the sibling of
    * [[spanCorruption]]'s T5 objective). Per doc, two content-keyed cut
    * points split the CHARACTER stream into (prefix, middle, suffix);
    * with probability `fimRatePct`/100 the doc is rearranged into the
    * sentinel form — PSM `<PRE>p<SUF>s<MID>m` or SPM `<SUF>s<PRE>p<MID>m`,
    * chosen 50/50 — else it passes through as plain autoregressive text
    * (mode 'ar'). The SPM form here is the paper's NAIVE SPM variant
    * (§D: sentinels reordered with the segments); Bavarian et al.'s
    * recommended SPM keeps the sentinels in PSM order
    * (`<PRE><SUF>s<MID>` then prefix+middle) for cache-friendliness —
    * a sentinel-layout choice only, orthogonal to the cut-point and
    * rate machinery pinned here. All decisions are md5-derived from the text itself
    * (the q67 content-keyed doctrine): reproducible across runs,
    * engines, and partitionings, no RNG state.
    *
    * Scale shape: ONE row-local projection — no explode, no shuffle, no
    * state; at 100 TB it fuses into the scan like c4LineFilter. Output
    * pins the transform byte-exactly: (id, mode, cut_lo, cut_hi,
    * out_md5, out_len) where out_md5 is md5 of the reassembled string.
    * Cut points are character offsets in [0, n] (empty prefix/middle/
    * suffix all legal — the paper keeps degenerate splits so the model
    * sees boundary cases). */
  def fimTransform(docs: DataFrame, id: String, text: String,
                   fimRatePct: Int = 50): DataFrame = {
    require(fimRatePct >= 0 && fimRatePct <= 100,
      "fimTransform needs fimRatePct in [0, 100]")
    val t = col(text)
    val n = length(t)
    val h1 = graft.operators.TextAnalysis.md5Hash48(concat(t, lit(":c1")))
    val h2 = graft.operators.TextAnalysis.md5Hash48(concat(t, lit(":c2")))
    val hf = graft.operators.TextAnalysis.md5Hash48(concat(t, lit(":fim")))
    val a = h1 % (n + 1)
    val b = h2 % (n + 1)
    val lo = least(a, b)
    val hi = greatest(a, b)
    val pre = t.substr(lit(1), lo.cast("int"))
    val mid = t.substr((lo + 1).cast("int"), (hi - lo).cast("int"))
    val suf = t.substr((hi + 1).cast("int"), (n - hi).cast("int"))
    // floor(hf/100) is exact here: hf < 2^48 and a double quotient can
    // only sit within 1 ulp of an integer when hf is a multiple of 100,
    // where IEEE division is exact (same argument as spanCorruption's
    // floor(h/20) offsets).
    val isFim = hf % 100 < fimRatePct
    val isPsm = floor(hf / 100).cast("long") % 2 === 0
    val out = when(!isFim, t)
      .when(isPsm, concat(lit("<PRE>"), pre, lit("<SUF>"), suf, lit("<MID>"), mid))
      .otherwise(concat(lit("<SUF>"), suf, lit("<PRE>"), pre, lit("<MID>"), mid))
    docs.select(col(id),
      when(!isFim, lit("ar")).when(isPsm, lit("psm")).otherwise(lit("spm"))
        .as("mode"),
      lo.cast("long").as("cut_lo"), hi.cast("long").as("cut_hi"),
      md5(out).as("out_md5"), length(out).cast("long").as("out_len"))
  }

  /** Inverse Cloze Task pair construction (Lee et al. 2019, ORQA — the
    * standard retriever-pretraining objective): per doc, one token BLOCK
    * (size `blockSize`, the pseudo-sentence unit — robust on corpora
    * without punctuation) becomes the pseudo-QUERY and the rest of the
    * doc the pseudo-EVIDENCE context; with probability `keepPct`/100 the
    * block stays in the context too (the paper's lexical-overlap escape
    * hatch — the retriever must not learn that the answer never shares
    * words with the query). Block choice and keep-coin are md5-derived
    * from the text (the content-keyed doctrine): reproducible across
    * runs/engines/partitionings.
    *
    * Scale shape: split barriered to an attribute, then ONE row-local
    * projection (slices + concat) — no explode, no shuffle; pairs for a
    * 100 TB corpus are built at scan speed. Output byte-pins both sides:
    * (id, n_blocks, blk_idx, kept, query_md5, ctx_md5). */
  def ictPairs(docs: DataFrame, id: String, text: String,
               blockSize: Int = 8, keepPct: Int = 10): DataFrame = {
    require(blockSize >= 1, "ictPairs needs blockSize >= 1")
    require(keepPct >= 0 && keepPct <= 100, "ictPairs needs keepPct in [0, 100]")
    val h = graft.operators.TextAnalysis.md5Hash48(concat(col(text), lit(":ict")))
    val hk = graft.operators.TextAnalysis.md5Hash48(concat(col(text), lit(":keep")))
    val withTs = docs.select(col(id), h.as("_h"), hk.as("_hk"),
      split(col(text), " ").as("_ts"))
    val n = size(col("_ts"))
    // integer ceil-div via exact double floor (n ≤ 2^31, well inside the
    // 2^53 window; same argument as fimTransform's mode coin)
    val nb = floor((n + (blockSize - 1)).cast("double") / blockSize).cast("long")
    val j = col("_h") % nb
    val kept = col("_hk") % 100 < keepPct
    val start = (j * blockSize).cast("int") // 0-based token offset of the block
    val query = concat_ws(" ", slice(col("_ts"), start + 1, lit(blockSize)))
    val ctx = when(kept, concat_ws(" ", col("_ts")))
      .otherwise(concat_ws(" ", concat(
        slice(col("_ts"), lit(1), start),
        slice(col("_ts"), start + blockSize + 1,
          greatest(n - (start + blockSize), lit(0))))))
    withTs.select(col(id), nb.as("n_blocks"), j.cast("long").as("blk_idx"),
      kept.cast("int").as("kept"),
      md5(query).as("query_md5"), md5(ctx).as("ctx_md5"))
  }
}
