package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal-column support for training-data pipelines (north-star
  * extension, BASELINE.json): image/audio/video ride as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extract / resize /
  * frame-sample run as partition-batched typed transforms.
  *
  * The actual codecs are STUBBED (this environment ships no image/audio
  * libraries): `StubCodec` derives deterministic fake dimensions/frames/
  * features from the bytes, clearly marked. Everything around the stub —
  * the schema, the `Dataset[MediaRow]` encoder, the mapPartitions batch
  * shape (iterator-chunked like mapInPandas batches), the explode of
  * sampled frames, and the size-aware repartitioning — is real Spark
  * plumbing a production codec drops into.
  *
  * Scale notes: blobs are the heavy column — `repartitionBySize` targets a
  * bytes-per-partition budget instead of a row count so one partition never
  * holds 10 GB of video while another holds thumbnails; decode output
  * projects the blob AWAY as early as possible (metadata + features are
  * small); frame sampling explodes AFTER repartitioning so the shuffle
  * moves encoded bytes once.
  */
object Multimodal {

  /** A multimodal row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      format: String, width: Int, height: Int,
      sample_rate: Int, duration_ms: Long)

  final case class DecodedMedia(
      media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, features: Array[Double])

  final case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** ??? codec boundary ??? — deterministic fakes standing in for
    * libjpeg/ffmpeg/etc. Each is a pure function of the bytes so tests and
    * oracle-less queries are reproducible. */
  object StubCodec {
    private val md5Local = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
    /** STUB image decode: dims derived from a byte hash; a real codec
      * returns the actual pixel buffer dims. The hash is the top 60 bits
      * of md5 — DuckDB's `('0x'||substring(md5(x),1,15))::BIGINT`, the
      * repo's oracle-portable base — so the pipeline gate replays exactly. */
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val md = md5Local.get(); md.reset()
      val d = md.digest(bytes)
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
      h = h >>> 4
      ((64 + h % 512).toInt, (64 + (h >> 9) % 512).toInt)
    }
    /** STUB feature extraction: 8-bucket byte histogram, L1-normalized —
      * shaped like a real embedding/MFCC output (fixed-width Array[Double]). */
    def features(bytes: Array[Byte]): Array[Double] = {
      val hist = new Array[Double](8)
      bytes.foreach(b => hist((b & 0xFF) >> 5) += 1.0)
      val n = math.max(bytes.length, 1).toDouble
      hist.map(_ / n)
    }
    /** STUB frame count: one "frame" per 256 bytes (a real demuxer reads
      * container metadata). */
    def frameCount(bytes: Array[Byte]): Int = math.max(bytes.length / 256, 1)
    /** STUB frame extraction: the frame's byte slice. */
    def frame(bytes: Array[Byte], i: Int): Array[Byte] =
      bytes.slice(i * 256, math.min((i + 1) * 256, bytes.length))
    /** STUB resize: re-derive dims, keep a byte prefix proportional to the
      * area ratio (a real codec re-encodes). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      bytes.take(math.max(64, math.min(bytes.length, w * h / 64)))
  }

  /** Document ids spread to shuffle width for the per-id synth+decode
    * gates below (explode-width law, r16): the DEFLATE/Huffman/RIFF work
    * inside mapPartitions is the heavy per-row compute, and the id scan
    * is ONE parquet split on fat fixtures — unspread, the whole decode
    * ran a single task wide (the sf10 ritual read cpu/wall ≈ 1.0 on
    * multimodal_png_decode). The shuffle moves bare longs. */
  private def spreadIds(s: SparkSession, d: String): Dataset[Long] = {
    import s.implicits._
    Strata.spreadById(Tables.documents(s, d).select(col("doc_id")), "doc_id")
      .as[Long]
  }

  /** Size-aware repartition: balance partitions by cumulative blob bytes
    * (targetBytes per partition), not row count. The total size comes from
    * the optimizer's plan statistics (file sizes / column stats propagated
    * through the plan) — NOT a data scan: sizing must never add a pass over
    * the blob column, which at 100 TB would double the pipeline's IO.
    * `maxParts` bounds the count against wildly-pessimistic estimates
    * (unknown-stats plans default to huge sizeInBytes). */
  def repartitionBySize(media: DataFrame, targetBytes: Long,
                        maxParts: Int = 65536): DataFrame = {
    val total = media.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = (total / BigInt(math.max(targetBytes, 1L)))
      .min(BigInt(maxParts)).max(BigInt(1)).toInt
    media.repartition(parts, col("media_id"))
  }

  /** Decode + feature-extract, partition-batched (the mapInPandas shape:
    * an iterator of rows per partition, processed without materializing
    * the whole partition). Projects the blob away in the output.
    *
    * Formats `wav` and `bmp` dispatch to the REAL pure-JVM parsers in
    * [[Codecs]] (r12 — no longer stubs for those two); anything else
    * takes the StubCodec path. A malformed wav/bmp payload decodes to
    * None and the row is quarantined (dropped here), same contract as a
    * null blob — never a task-killing throw. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // null payload = missing/corrupt blob (an upstream extract gap a
      // 100 TB media table always contains somewhere): skip it here
      // instead of NPE-ing the task — a typed-lambda crash fails the
      // whole job after retries, the worst possible shape for one bad row
      rows.filter(_.bytes != null).flatMap { r =>
        r.format match {
          case "wav" => Codecs.decodeWav(r.bytes).map(wv =>
            DecodedMedia(r.media_id, r.kind, 0, 0, wv.nSamples,
              Array(wv.rmsQ6 / 1e6, wv.peak.toDouble, wv.durationMs.toDouble,
                wv.sampleRate.toDouble)))
          case "bmp" => Codecs.decodeBmp(r.bytes).map(bi => {
            val n = math.max(bi.width.toLong * bi.height, 1L).toDouble
            DecodedMedia(r.media_id, r.kind, bi.width, bi.height, 1,
              Array(bi.sumR / n, bi.sumG / n, bi.sumB / n))
          })
          case "png" => Codecs.decodePng(r.bytes).map(pi => {
            val n = math.max(pi.width.toLong * pi.height, 1L).toDouble
            DecodedMedia(r.media_id, r.kind, pi.width, pi.height, 1,
              Array(pi.sumR / n, pi.sumG / n, pi.sumB / n))
          })
          case "avi" => // REAL MJPEG demux + first-frame decode (r13)
            for {
              fs <- Mjpeg.aviFrames(r.bytes)
              first <- fs.headOption.flatMap(Mjpeg.decodeJpegGray)
            } yield DecodedMedia(r.media_id, r.kind, first.w, first.h,
              fs.length,
              Array(first.sumLuma.toDouble /
                math.max(first.w.toLong * first.h, 1L)))
          case _ =>
            val (w, h) = StubCodec.decodeDims(r.bytes)
            Some(DecodedMedia(r.media_id, r.kind, w, h,
              StubCodec.frameCount(r.bytes), StubCodec.features(r.bytes)))
        }
      }
    }
  }

  /** Sample every `everyN`th frame of video rows → one row per frame.
    * Format `avi` takes the REAL path (r13): [[Mjpeg.aviFrames]] demuxes
    * the RIFF container and each sampled row carries one complete encoded
    * JPEG — an undemuxable payload quarantines (drops), same contract as
    * decode. Other formats keep the stub demuxer. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    // null payload skipped, same contract as decode
    media.filter(r => r.kind == "video" && r.bytes != null).flatMap { r =>
      r.format match {
        case "avi" =>
          Mjpeg.aviFrames(r.bytes).toSeq.flatMap(fs =>
            (0 until fs.length by everyN).map(i => Frame(r.media_id, i, fs(i))))
        case _ =>
          (0 until StubCodec.frameCount(r.bytes) by everyN)
            .map(i => Frame(r.media_id, i, StubCodec.frame(r.bytes, i)))
      }
    }
  }

  /** Resize images. Formats `bmp`/`png` take the REAL path (r12):
    * nearest-neighbor resample over the decoded pixels, re-encoded as
    * canonical BMP (format updated accordingly); an undecodable payload
    * passes through untouched (resize is a row transform, not a filter —
    * quarantining undecodables is decode's job). Other formats keep the
    * stub. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      // null payload passes through untouched
      if (r.kind == "image" && r.bytes != null)
        r.format match {
          case "bmp" | "png" =>
            Codecs.resizeNearestToBmp(r.bytes, w, h)
              .map(out => r.copy(bytes = out, format = "bmp", width = w, height = h))
              .getOrElse(r)
          case _ =>
            r.copy(bytes = StubCodec.resize(r.bytes, w, h), width = w, height = h)
        }
      else r
    }
  }

  /** SparkEntry query (oracled — the stub codecs are md5/byte-length
    * arithmetic DuckDB replays exactly): the full pipeline over a synthetic
    * media table derived from documents.parquet (text bytes as payload —
    * the fixtures ship no real media). Exercises schema, size-repartition,
    * batched decode, and the small projected output. */
  def multimodalQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("bytes"),
        lit("stub").as("format"), lit(0).as("width"), lit(0).as("height"),
        lit(16000).as("sample_rate"), lit(0L).as("duration_ms"))
    val sized = repartitionBySize(media, targetBytes = 1 << 20)
    decode(sized.as[MediaRow]).toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
        min(col("width")).cast("long").as("min_w"),
        max(col("height")).cast("long").as("max_h"),
        sum(col("n_frames")).as("total_frames"))
  }

  /** SparkEntry query (oracled ANALYTICALLY): real WAV decode end-to-end.
    * Each document row synthesizes a canonical mono PCM-16 WAV whose
    * samples follow a pure integer sawtooth of (doc_id)-derived length and
    * step, then the REAL RIFF parser ([[Codecs.decodeWav]]) re-reads the
    * bytes and folds sample stats. The DuckDB oracle recomputes the
    * expected stats FROM THE FORMULA via generate_series — it never sees
    * a byte — so a header-offset, endianness, sign-extension, or
    * chunk-walk mistake in the parser hash-fails. */
  def wavDecodeQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    spreadIds(s, d)
      .mapPartitions(_.map { id =>
        val n = (256 + id % 128).toInt
        val step = (131 + id % 97).toInt
        val bytes = Codecs.synthWav(8000, n, step, 17)
        val w = Codecs.decodeWav(bytes).getOrElse(
          throw new IllegalStateException(s"wav decode failed for media $id"))
        (id, w.nSamples.toLong, w.durationMs, w.rmsQ6, w.peak.toLong,
          w.channels.toLong, w.sampleRate.toLong)
      })
      .toDF("media_id", "n_samples", "duration_ms", "rms_q6", "peak",
        "channels", "sample_rate")
  }

  /** SparkEntry query (oracled ANALYTICALLY): real BMP decode end-to-end,
    * alternating bottom-up and top-down row order per media id. The
    * corner-luma probes pin the row ORIGIN and stride handling — channel
    * sums alone are pixel-order-invariant and would pass a parser that
    * reads rows upside down. */
  def bmpDecodeQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    spreadIds(s, d)
      .mapPartitions(_.map { id =>
        val w = (4 + id % 13).toInt
        val h = (3 + id % 11).toInt
        val bytes = Codecs.synthBmp(w, h, id, topDown = id % 2 == 1)
        val bi = Codecs.decodeBmp(bytes).getOrElse(
          throw new IllegalStateException(s"bmp decode failed for media $id"))
        (id, bi.width.toLong, bi.height.toLong, bi.sumR, bi.sumG, bi.sumB,
          bi.firstLuma.toLong, bi.lastLuma.toLong)
      })
      .toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b",
        "first_luma", "last_luma")
  }

  /** SparkEntry query (oracled ANALYTICALLY): real PNG decode end-to-end —
    * DEFLATE via the JDK's zlib, multi-IDAT concatenation, and per-row
    * unfiltering with every PNG filter type exercised (the synthesizer
    * filters row y as type y mod 5). The oracle replays the pixel
    * gradient analytically; a wrong Paeth predictor, a missed IDAT
    * boundary, or an off-by-one in the filter byte skew hash-fails. */
  def pngDecodeQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    spreadIds(s, d)
      .mapPartitions(_.map { id =>
        val w = (5 + id % 12).toInt
        val h = (5 + id % 9).toInt
        val bytes = Codecs.synthPng(w, h, id)
        val pi = Codecs.decodePng(bytes).getOrElse(
          throw new IllegalStateException(s"png decode failed for media $id"))
        (id, pi.width.toLong, pi.height.toLong, pi.sumR, pi.sumG, pi.sumB,
          pi.firstLuma.toLong, pi.lastLuma.toLong)
      })
      .toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b",
        "first_luma", "last_luma")
  }

  /** SparkEntry query (oracled ANALYTICALLY): the REAL resize path
    * end-to-end — synth PNG → nearest-neighbor resample to 7×6 → BMP
    * re-encode → BMP re-decode → stats. The oracle composes the pixel
    * gradient with the integer sampling map `src = (dst·srcDim) div
    * dstDim`; a wrong mapping, a swapped axis, or a re-encode stride bug
    * hash-fails. */
  def resizeDecodeQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    spreadIds(s, d)
      .mapPartitions(_.map { id =>
        val w = (5 + id % 12).toInt
        val h = (5 + id % 9).toInt
        val png = Codecs.synthPng(w, h, id)
        val bmp = Codecs.resizeNearestToBmp(png, 7, 6).getOrElse(
          throw new IllegalStateException(s"resize failed for media $id"))
        val bi = Codecs.decodeBmp(bmp).getOrElse(
          throw new IllegalStateException(s"re-decode failed for media $id"))
        (id, bi.width.toLong, bi.height.toLong, bi.sumR, bi.sumG, bi.sumB,
          bi.firstLuma.toLong, bi.lastLuma.toLong)
      })
      .toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b",
        "first_luma", "last_luma")
  }

  /** SparkEntry query (oracled ANALYTICALLY): REAL audio framing — the
    * WAV sample stream windowed into 160-sample frames (20 ms at 8 kHz,
    * the standard VAD hop) with exact integer energy probes per frame,
    * final short frame kept. One row per (media, frame). The oracle
    * groups the sawtooth by k div 160. */
  def audioFramesQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    spreadIds(s, d)
      .mapPartitions(_.flatMap { id =>
        val n = (256 + id % 128).toInt
        val step = (131 + id % 97).toInt
        val bytes = Codecs.synthWav(8000, n, step, 17)
        Codecs.wavFrames(bytes, frameLen = 160).getOrElse(
            throw new IllegalStateException(s"wav framing failed for media $id"))
          .map(f => (id, f.frameNo.toLong, f.nSamples.toLong, f.sumAbs,
            f.peak.toLong))
      })
      .toDF("media_id", "frame_no", "n_samples", "sum_abs", "peak")
  }

  /** SparkEntry query (oracled ANALYTICALLY): G.711 µ-law WAV decode —
    * the telephony-audio compressed format, expanded per sample through
    * the CCITT ulaw2linear integer formula inside the same RIFF parser.
    * The oracle replays the complement/shift/sign formula in SQL. */
  def ulawDecodeQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    spreadIds(s, d)
      .mapPartitions(_.map { id =>
        val n = (200 + id % 100).toInt
        val bytes = Codecs.synthWavUlaw(8000, n, 131, (id % 256).toInt)
        val w = Codecs.decodeWav(bytes).getOrElse(
          throw new IllegalStateException(s"ulaw decode failed for media $id"))
        (id, w.nSamples.toLong, w.durationMs, w.rmsQ6, w.peak.toLong,
          w.bits.toLong)
      })
      .toDF("media_id", "n_samples", "duration_ms", "rms_q6", "peak", "bits")
  }

  /** Streaming audio-admission transformer (F1-registerable, `OpSpec
    * .Named`): the stream `value` column carries a base64 WAV (the
    * realistic wire shape for binary media on a JSON topic); each row
    * decodes through the REAL RIFF parser and survives only when its RMS
    * clears `minRmsQ6` — the edge silence gate a speech-ingest pipeline
    * runs before paying storage for dead air. Undecodable payloads drop
    * (decode-quarantine semantics); survivors carry `rms_q6` and
    * `duration_ms`. A UDF rather than a codegen'd expression because the
    * decode is an inherently black-box byte parser (the mapInPandas-style
    * boundary), applied AFTER the stream's cheap row filters. */
  def audioAdmit(minRmsQ6: Long): DataFrame => DataFrame = { df =>
    val decode = udf((v: String) =>
      if (v == null) None
      else (try Codecs.decodeWav(java.util.Base64.getDecoder.decode(v))
      catch { case _: IllegalArgumentException => None }) // not base64
        .map(w => (w.rmsQ6, w.durationMs)))
    df.withColumn("__wav", decode(col("value")))
      .filter(col("__wav").isNotNull && col("__wav._1") >= minRmsQ6)
      .withColumn("rms_q6", col("__wav._1"))
      .withColumn("duration_ms", col("__wav._2"))
      .drop("__wav")
  }

  /** SparkEntry query (oracled ANALYTICALLY): REAL video frame extraction
    * end-to-end (r13 — the last stubbed modality). Each video row
    * synthesizes an MJPEG AVI whose frame f is a 16×16 grayscale baseline
    * JPEG of constant 8×8 blocks `(31f + 17bx + 23by + id) mod 256`
    * (even ids add restart markers every 3 MCUs); [[sampleFrames]] demuxes
    * the RIFF container and samples every 4th frame; each sampled frame
    * runs the FULL baseline decoder (Huffman, DC prediction, dequant,
    * IDCT, level shift). Constant blocks under quantizer 8 round-trip
    * bit-exactly, so the DuckDB oracle recomputes every frame's pixel
    * stats from the block formula without seeing a byte — a wrong Huffman
    * table, DC predictor, restart reset, dequant index, or demux offset
    * hash-fails. */
  def frameSampleQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Strata.spreadById(Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(3)) === 2)
        .select(col("doc_id")), "doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val nf = (3 + id % 4).toInt
        val frames = (0 until nf).map { f =>
          Mjpeg.synthJpegGrayBlocks(16, 16,
            (bx, by) => ((31L * f + 17L * bx + 23L * by + id) % 256L).toInt,
            restartEvery = if (id % 2 == 0) 3 else 0)
        }
        MediaRow(id, "video", Mjpeg.synthAviMjpeg(frames, 16, 16), "avi",
          16, 16, 0, 0L)
      })
    sampleFrames(media, everyN = 4)
      .mapPartitions(_.map { fr =>
        val g = Mjpeg.decodeJpegGray(fr.frame_bytes).getOrElse(
          throw new IllegalStateException(
            s"frame decode failed for ${fr.media_id}/${fr.frame_no}"))
        (fr.media_id, fr.frame_no.toLong, g.w.toLong * g.h, g.sumLuma,
          g.luma(0, 0).toLong, g.luma(15, 15).toLong)
      })
      .toDF("media_id", "frame_no", "n_px", "sum_luma",
        "first_luma", "last_luma")
  }
}
