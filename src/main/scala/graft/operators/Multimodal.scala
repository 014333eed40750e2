package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media payloads travel as opaque `binary`
 * columns with a typed metadata struct alongside; decode / feature-extract
 * runs batched per partition via a typed Dataset mapPartitions (the Scala
 * analog of an Arrow-batched Pandas UDF — same batch shape: the executor
 * sees a partition-iterator of rows, amortizing any per-model/per-codec
 * setup across the batch).
 *
 * The actual image/audio decode is STUBBED (no codec libs in this
 * environment): `decodeStub` derives deterministic fake dimensions from the
 * payload byte length. Everything around it — schema, encoders, partition
 * batching, and the flattened output contract — is real and oracle-checked
 * (byte-length arithmetic is reproducible in SQL).
 */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, payload: Array[Byte], kind: String, source: String)

  /** Decoded features (the part a real codec would fill in). */
  final case class MediaFeatures(
      media_id: Long, kind: String, source: String,
      byte_len: Int, width: Int, height: Int, frames: Int)

  /** A resized image: original + new dims re-PARSED from the output
    * payload, its byte length, and the unsigned pixel-byte sum (padding
    * excluded) — the roundtrip evidence the q109 oracle recomputes. */
  final case class ResizedImage(
      media_id: Long, orig_w: Int, orig_h: Int,
      new_w: Int, new_h: Int, out_bytes: Int, pixel_sum: Long)

  /** One sampled audio frame: index, slot count, integral mean |sample|. */
  final case class AudioFrame(
      media_id: Long, frame_idx: Int, n_slots: Int, mean_abs: Long)

  /** A perceptual image fingerprint: 64-bit aHash as two non-negative
    * 32-bit halves + popcount (MediaCodec.bmpAHash's contract). */
  final case class ImageHash(
      media_id: Long, w: Int, h: Int,
      hash_hi: Long, hash_lo: Long, n_bits: Int)

  /** Deterministic fake decode: dimensions derived from payload length.
    * Swap this body for a real codec (JNI/ffmpeg/ImageIO) without touching
    * the pipeline — the signature is the contract. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (64 + n % 640, 64 + (n * 7) % 480, 1 + n % 8)
  }

  /** Batched decode over partitions. `numPartitions` controls batch
    * granularity — at scale, size it so one partition's payloads fit the
    * executor's decode working set. */
  def decodeFeatures(media: Dataset[MediaRow], numPartitions: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media
      .repartition(numPartitions, col("media_id"))
      .mapPartitions { rows =>
        // per-partition setup would go here (codec init, model load)
        rows.map { r =>
          val (w, h, f) = decodeStub(r.payload)
          MediaFeatures(r.media_id, r.kind, r.source, r.payload.length, w, h, f)
        }
      }
  }

  /** Streaming form of decodeFeatures: the SAME batched decode over a
    * streaming Dataset[MediaRow] (file-stream of payload parquet in
    * production: `spark.readStream.schema(...).parquet(dir)`). Stateless
    * mapPartitions — no repartition, so the stream stays shuffle-free and
    * each micro-batch decodes where it lands. */
  def decodeFeaturesStream(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would go here (codec init, model load)
      rows.map { r =>
        val (w, h, f) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.kind, r.source, r.payload.length, w, h, f)
      }
    }
  }

  /** Build a media table from the documents table: utf-8 payload bytes as
    * the opaque binary column (stands in for image/audio bytes). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      col("source"))
      .as[MediaRow]
  }

  /** Media table with REAL container payloads, built in executors from
    * per-row deterministic parameters: valid BMPs (even ids) and PNGs
    * (odd ids) for images, valid PCM WAVs for audio, opaque text bytes
    * for "video" (the codec-bound case the stub stands in for). The
    * parameter formulas are the q71 oracle's arithmetic — the decode
    * stage must re-derive them by genuinely parsing the headers it is
    * handed (BMP little-endian, PNG big-endian: an endianness bug breaks
    * exactly one of the two). */
  def mediaWithHeaders(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    mediaFromDocuments(spark, docs).map { r =>
      val id = r.media_id
      r.kind match {
        case "image" =>
          val w = (16 + (id * 13) % 48).toInt
          val h = (16 + (id * 29) % 32).toInt
          // seed = id: the pixel/sample patterns become per-row functions
          // of doc_id, which is what lets the q109/q110 oracles recompute
          // resized-pixel sums and frame means from the id alone
          r.copy(payload =
            if (id % 2 == 0) MediaCodec.bmp(w, h, id) else MediaCodec.png(w, h))
        case "audio" =>
          r.copy(payload = MediaCodec.wav(
            channels = (1 + id % 2).toInt,
            sampleRate = (8000 + (id % 5) * 2000).toInt,
            nSamples = (100 + id % 400).toInt,
            seed = id))
        case _ => r
      }
    }
  }

  /** Media table whose image rows are REAL baseline JPEGs with a
    * per-row-length COM segment ahead of the frame header — the SOF
    * marker lands at a DIFFERENT offset in every payload, so the decode
    * stage can only recover dimensions by walking the marker stream the
    * way a real JPEG reader does (MediaCodec.parseJpegDims). Dimension
    * formulas are the q71 family's; audio/video rows pass through
    * untouched (q112 reads only the image rows). */
  def mediaJpeg(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    mediaFromDocuments(spark, docs).map { r =>
      if (r.kind != "image") r
      else {
        val id = r.media_id
        val w = (16 + (id * 13) % 48).toInt
        val h = (16 + (id * 29) % 32).toInt
        r.copy(payload = MediaCodec.jpeg(w, h, commentLen = (id % 23).toInt))
      }
    }
  }

  /** Batched decode that REALLY parses headerable containers (BMP/PNG/WAV
    * via MediaCodec) and falls back to the documented stub for codec-bound
    * payloads. Output packing per modality: image → (width, height, 1);
    * audio → (channels, sampleRate, nSamples); other → stub triple. Same
    * partition-batched mapPartitions shape as decodeFeatures.
    *
    * Dispatch is on the row's declared KIND first, magic bytes second:
    * only image/audio rows attempt a header parse; video (and any other
    * codec-bound modality) goes straight to the stub. A "video" payload
    * carrying raw text that happens to start with "BM"/"RIFF" must never
    * be misparsed as a container — the magic-byte check alone cannot
    * guarantee that, the declared modality can. parseHeader additionally
    * validates the full fixed header, so a mislabeled image row degrades
    * to the stub rather than a garbage parse. */
  /** REAL pixel-level image resize: nearest-neighbor integer-factor
    * downsample of every BMP payload (MediaCodec.resizeBmp — actual byte
    * slicing with row-padding arithmetic), emitting dims RE-PARSED from
    * the resized output plus its pixel-byte sum. Non-BMP rows (PNG would
    * need inflate; video is codec-bound) are skipped — the honest
    * boundary, same doctrine as decodeStub. Partition-batched like every
    * media stage: the payload never leaves the executor, only the tiny
    * feature row comes back. */
  def resizeImages(media: Dataset[MediaRow], factor: Int, numPartitions: Int)
    : Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media
      .repartition(numPartitions, col("media_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.kind != "image") None
          else for {
            (w, h, _) <- MediaCodec.parseHeader(r.payload)
            if r.payload.length >= 2 && r.payload(0) == 'B'.toByte
            out <- MediaCodec.resizeBmp(r.payload, factor)
            (nw, nh, _) <- MediaCodec.parseHeader(out)
            ps <- MediaCodec.bmpPixelSum(out)
          } yield ResizedImage(r.media_id, w, h, nw, nh, out.length, ps)
        }
      }
  }

  /** REAL perceptual hashing: MediaCodec.bmpAHash over every BMP
    * payload — the image-side analog of text SimHash (q45): a row-local
    * 64-bit fingerprint whose Hamming distance tracks visual
    * similarity, computed from the actual pixel bytes with padding /
    * stride arithmetic the oracle re-derives. Non-BMP rows skipped
    * (same documented boundary as resizeImages). The corpus never
    * shuffles for hashing; downstream near-dup joins band the 64 bits
    * exactly like the text path. */
  def imageAHashes(media: Dataset[MediaRow], numPartitions: Int)
    : Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media
      .repartition(numPartitions, col("media_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.kind != "image") None
          else MediaCodec.bmpAHash(r.payload).map {
            case (w, h, hi, lo, nb) => ImageHash(r.media_id, w, h, hi, lo, nb)
          }
        }
      }
  }

  /** One fixed-size byte chunk of an opaque payload: offsets, length,
    * and the chunk's md5 — the integrity/transfer manifest row. */
  final case class ByteChunk(
      media_id: Long, chunk_idx: Int, off: Int, len: Int, chunk_md5: String)

  /** Fixed-size byte-range chunking of opaque payloads — the transfer/
    * processing primitive for codec-bound modalities (multipart upload
    * manifests, range-request planning, per-chunk integrity): every
    * payload splits into ⌈bytes/chunkSize⌉ ranges with offset, length,
    * and md5 per chunk. Row-local and partition-batched like every
    * media stage; the payload bytes never leave the executor, only the
    * manifest rows return. Works on ANY kind — chunking is the one
    * operation that needs no codec at all (which is why it is the
    * honest operation to ship for the "video" rows the decode stub
    * stands in for). */
  def chunkBytes(media: Dataset[MediaRow], chunkSize: Int,
                 numPartitions: Int): Dataset[ByteChunk] = {
    require(chunkSize >= 1, "chunkSize must be >= 1")
    import media.sparkSession.implicits._
    media
      .repartition(numPartitions, col("media_id"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          val n = r.payload.length
          val nChunks = (n + chunkSize - 1) / chunkSize
          (0 until nChunks).iterator.map { i =>
            val off = i * chunkSize
            val len = math.min(chunkSize, n - off)
            md.reset()
            md.update(r.payload, off, len)
            val hex = md.digest().map(b => f"$b%02x").mkString
            ByteChunk(r.media_id, i, off, len, hex)
          }
        }
      }
  }

  /** REAL audio frame sampling: every `stride`-th frame of
    * `frameSamples` sample-frames from each WAV payload's PCM data
    * chunk, with the exact integral mean |sample| per frame
    * (MediaCodec.wavFrameMeans — genuine little-endian 16-bit decode).
    * Non-WAV rows are skipped. */
  def audioFrameMeans(media: Dataset[MediaRow], frameSamples: Int,
                      stride: Int, numPartitions: Int): Dataset[AudioFrame] = {
    import media.sparkSession.implicits._
    media
      .repartition(numPartitions, col("media_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.kind != "audio") Iterator.empty
          else MediaCodec.wavFrameMeans(r.payload, frameSamples, stride)
            .toSeq.flatten
            .map { case (k, n, m) => AudioFrame(r.media_id, k, n, m) }
        }
      }
  }

  /** INTERLEAVED multimodal sequence packing: documents that carry an
    * image contribute `patches` image-patch placeholder tokens ("[IMG]",
    * the vision-token convention of interleaved image-text training —
    * Flamingo/MMC4-style) AHEAD of their text tokens, and the augmented
    * streams pack into fixed `budget`-token chunks with the PROVEN
    * [[Packing.assignChunks]] offset arithmetic (same window, same
    * floor-division chunk spans, byte-pinned md5). Output per (shard,
    * chunk): doc count, token count, PATCH count — the modality-mix
    * stat a batch scheduler balances on — and the emitted text md5.
    *
    * A chunk boundary can split an image's patch run exactly like a
    * sentence: the training dataloader sees the same contract as text
    * packing (q74/q77), which is the point — one packing plan for both
    * modalities. Scale shape identical to emitChunks: the window
    * shuffles each doc's text once; patch expansion is a row-local
    * string prefix; per-chunk cells ≤ budget tokens by construction.
    *
    * `hasImage` / `patches` are caller-supplied columns so a real
    * pipeline can wire them to an images table; the q150 query derives
    * them from the q53 synthetic-media convention. */
  def interleavedPack(docs: DataFrame, shard: org.apache.spark.sql.Column,
                      order: org.apache.spark.sql.Column,
                      text: org.apache.spark.sql.Column,
                      hasImage: org.apache.spark.sql.Column,
                      patches: org.apache.spark.sql.Column,
                      budget: Int): DataFrame = {
    val aug = when(hasImage,
      concat(concat_ws(" ",
        transform(sequence(lit(1), patches), _ => lit("[IMG]"))), lit(" "), text))
      .otherwise(text)
    val prepped = docs.select(shard.as("shard"), order.as("ord"), aug.as("itext"))
    val assigned = Packing.assignChunks(prepped, col("shard"), col("ord"),
        graft.operators.TextAnalysis.wsTokenCount(col("itext")), budget)
      .select(col("shard"), col("start_off"), col("n_tokens"),
        col("chunk_first"), col("chunk_last"), col("itext"))
    assigned
      .select(col("shard"), col("start_off"), col("n_tokens"), col("itext"),
        explode(sequence(col("chunk_first"), col("chunk_last"))).as("chunk"))
      .withColumn("ls", greatest(col("chunk") * budget - col("start_off"), lit(0L)))
      .withColumn("le",
        least((col("chunk") + 1) * budget - col("start_off"), col("n_tokens")))
      .withColumn("ptoks",
        slice(split(col("itext"), " "), (col("ls") + 1).cast("int"),
          (col("le") - col("ls")).cast("int")))
      .withColumn("piece", concat_ws(" ", col("ptoks")))
      .withColumn("n_patch",
        size(filter(col("ptoks"), t => t === "[IMG]")).cast("long"))
      .groupBy(col("shard"), col("chunk"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("le") - col("ls")).as("n_tokens"),
        sum(col("n_patch")).as("n_patches"),
        array_sort(collect_list(struct(col("start_off").as("o"), col("piece").as("p"))))
          .as("_ps"))
      .select(col("shard"), col("chunk"), col("n_docs"), col("n_tokens"),
        col("n_patches"),
        md5(concat_ws(" ", transform(col("_ps"), s => s.getField("p")))).as("text_md5"))
  }

  def decodeHeaderFeatures(media: Dataset[MediaRow], numPartitions: Int)
    : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media
      .repartition(numPartitions, col("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val parsed = r.kind match {
            case "image" | "audio" => MediaCodec.parseHeader(r.payload)
            case _ => None // codec-bound modality: documented stub, never header-sniffed
          }
          val (w, h, f) = parsed.getOrElse(decodeStub(r.payload))
          MediaFeatures(r.media_id, r.kind, r.source, r.payload.length, w, h, f)
        }
      }
  }
}
