package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-batched user code.
  *
  * The pattern a 100 TB media pipeline needs from the engine:
  *  1. payloads travel as `BinaryType` columns inside ordinary rows —
  *     columnar parquet stores them contiguously and column pruning means
  *     metadata-only queries never read the bytes;
  *  2. cheap facts (size, checksum, magic-number sniff) are codegen'd
  *     expressions over the binary column — no user code, oracle-checkable;
  *  3. the expensive step (decode / feature-extract) runs per PARTITION,
  *     not per row, via `mapPartitions`, so a real implementation can
  *     amortize a decoder/model handle across the batch — the JVM shape of
  *     a vectorized (pandas-style) UDF.
  *
  * Decode is REAL for images (r10) and WAV/PCM audio (r13): both
  * codecs ship in the JDK (`javax.imageio`, `javax.sound.sampled`), so
  * PNG/JPEG/GIF/BMP rasters and RIFF/WAVE PCM payloads decode natively
  * with no external dependency — images emit width/height from the
  * decoded raster and the mean over every channel sample; audio maps
  * the same fixed feature schema as (frames, channels, mean sample on
  * the 8-bit unsigned scale). Payloads that sniff as neither (video
  * stand-ins, this corpus's UTF-8 text blobs) take `decodeStub`, the
  * clearly-marked deterministic fake, so the oracle-pinned outputs on
  * the text corpus are unchanged while planted PNG/WAV fixtures
  * exercise the real paths end-to-end (MultimodalSpec pins pixel and
  * sample values independently). Swapping the fake for an ffmpeg-class
  * video decoder changes only that function body.
  *
  * The corpus has no binary table, so payloads are derived at scan time:
  * `documents.text` encoded as UTF-8 bytes stands in for an image blob.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** A media row: opaque payload + the metadata a manifest would carry. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Decoded features (the stub's output schema — what a real decoder
    * would emit per image/frame).
    */
  final case class MediaFeatures(doc_id: Long, width: Int, height: Int,
                                 mean_byte: Double)

  /** Deterministic fake decode: width/height from payload length, channel
    * mean over the raw bytes. STUB — stands in for an image decoder; the
    * signature (bytes in, fixed-schema features out) is the contract.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Double) = {
    val n = payload.length
    val w = math.max(1, n % 640)
    val h = math.max(1, (n / 7) % 480)
    val mean = if (n == 0) 0.0
      else payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
    (w, h, mean)
  }

  /** Magic-number sniff for the formats the JDK's ImageIO decodes
    * natively (PNG/JPEG/GIF/BMP). Gates the real decoder so non-image
    * payloads never pay a reader probe — a false positive (e.g. text
    * starting "BM") just falls through to the stub when ImageIO finds
    * no readable image.
    */
  def sniffImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P'.toByte && p(2) == 'N'.toByte &&
        p(3) == 'G'.toByte) ||
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte && p(2) == 0xff.toByte) ||
      (p(0) == 'G'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte &&
        p(3) == '8'.toByte) ||
      (p(0) == 'B'.toByte && p(1) == 'M'.toByte))

  /** Decoded-raster pixel cap (4096×4096): read from the HEADER before
    * any raster exists, so a false-positive sniff (ASCII starting "BM"
    * parses to dims in the hundreds of millions) can never allocate the
    * task to death.
    */
  private val MaxPixels = 16L << 20

  /** REAL image decode — `javax.imageio` is part of the JDK, so this
    * needs no external codec: width/height from the decoded image, mean
    * over the 8-bit sRGB channels of every pixel (the same quantity the
    * stub fakes from raw bytes). Hardened per review: dims are read
    * header-only and bounded BEFORE the raster decode (the OOM guard
    * above); pixels go through bulk `getRGB` row reads, because raster
    * samples are palette INDICES for palettized GIF/PNG and 0–65535 for
    * 16-bit PNG — getRGB color-converts both to the byte scale
    * `mean_byte` declares; the input stream is memory-cached (the
    * `ImageIO.read(InputStream)` default spools every payload through a
    * disk temp file). None when no reader claims the bytes, dims are
    * implausible, or the decode throws; the caller falls back to the
    * deterministic fake.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double)] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) None
          else {
            val img = reader.read(0)
            val buf = new Array[Int](w)
            var sum = 0.0
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, buf, 0, w)
              var x = 0
              while (x < w) {
                val v = buf(x)
                sum += ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)
                x += 1
              }
              y += 1
            }
            Some((w, h, sum / (w.toLong * h * 3)))
          }
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  /** RIFF/WAVE container sniff for the JDK's native WAV reader. Both
    * magics are required ("RIFF" alone is also AVI/WebP); a false
    * positive just falls through to the stub when the audio system
    * can't parse the chunks.
    */
  def sniffWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte &&
      p(3) == 'F'.toByte && p(8) == 'W'.toByte && p(9) == 'A'.toByte &&
      p(10) == 'V'.toByte && p(11) == 'E'.toByte

  /** Decoded-audio sample-frame cap — the audio twin of [[MaxPixels]]:
    * the frame count is read from the HEADER before any sample data is
    * materialized, so a corrupt length field can never allocate the
    * task to death.
    */
  private val MaxFrames = 16L << 20

  /** REAL audio decode — `javax.sound.sampled` is part of the JDK, so
    * RIFF/WAVE PCM needs no external codec. Feature mapping onto the
    * fixed [[MediaFeatures]] schema: width = sample frames, height =
    * channels, mean_byte = mean over every channel sample rescaled to
    * the 8-bit unsigned scale (8-bit unsigned PCM samples are already
    * 0–255; 16-bit signed little-endian — the overwhelmingly common WAV
    * shape — maps via (s + 32768)/256, so digital silence reads 128.0
    * on either depth). Anything else (float PCM, big-endian, 24-bit,
    * ADPCM) returns None and the caller falls back to the deterministic
    * fake — the same weak-evidence discipline as [[decodeImage]].
    */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Double)] =
    audioPcm(payload).map { a =>
      var sum = 0.0
      var k = 0
      while (k < a.n) { sum += a.sample(k); k += 1 }
      (a.frames, a.channels, sum / a.n)
    }

  /** Decoded PCM with random sample access on the shared 8-bit unsigned
    * scale — n is the total CHANNEL-SAMPLE count (frames × channels,
    * floored to complete samples if the stream under-delivers).
    */
  private[graft] case class AudioPcm(frames: Int, channels: Int, n: Int,
                                     sample: Int => Double)

  /** The decode gate + sample accessor both audio consumers share —
    * [[decodeAudio]] (whole-payload mean) and [[extractAudioWindows]]
    * (per-window features) must agree on the supported-format set and
    * the sample scale, so there is exactly ONE definition of each. The
    * accessor is a closure over the raw PCM bytes rather than a
    * materialized Array[Double]: the windowed consumer touches samples
    * window-by-window, and at the 16 M-frame cap a double array would
    * 4× the decoded payload's footprint for no reuse.
    */
  private[graft] def audioPcm(payload: Array[Byte]): Option[AudioPcm] = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        val frames = ais.getFrameLength
        import javax.sound.sampled.AudioFormat.Encoding
        val supported =
          (enc == Encoding.PCM_SIGNED && bits == 16 && !fmt.isBigEndian) ||
            (enc == Encoding.PCM_UNSIGNED && bits == 8)
        if (!supported || ch <= 0 || frames <= 0 || frames > MaxFrames)
          None
        else {
          val data = ais.readAllBytes()
          if (bits == 8) {
            if (data.length == 0) None
            else Some(AudioPcm(frames.toInt, ch, data.length,
              k => (data(k) & 0xff).toDouble))
          } else {
            // 16-bit little-endian signed: lo byte then hi byte; floor
            // to complete samples in case the stream under-delivers
            val n = data.length / 2
            if (n == 0) None
            else Some(AudioPcm(frames.toInt, ch, n, k => {
              val s = ((data(2 * k) & 0xff) | (data(2 * k + 1) << 8)).toShort
              (s + 32768) / 256.0
            }))
          }
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-WINDOW audio features (r14) — the audio twin of
    * [[extractFrameFeatures]]'s frame sampling: a 1→N generator from one
    * payload row to one row per (width, stride) sample window. Window i
    * covers channel-samples [i·stride, i·stride + width) clipped at the
    * stream end — every window holds ≥ 1 sample, tails may be short,
    * stride < width overlaps (the spectrogram/VAD framing convention).
    * RIFF/WAVE payloads take the REAL decode ([[audioPcm]] — the same
    * gate and 8-bit sample scale as [[decodeAudio]], MultimodalSpec
    * plants both depths and checks windows sample-exactly); everything
    * else — this corpus's UTF-8 text blobs — windows the payload BYTES
    * on the same scale, so the key is fully oracle-replayable on a text
    * corpus (byte ≡ codepoint on ASCII, the mm_decode_features guard).
    * Features: sample count, mean, RMS — mean and RMS accumulate
    * left-to-right over ≤ width doubles, the same order DuckDB's
    * list_sum replays (the established mm_decode_features contract).
    */
  def extractAudioWindows(media: Dataset[MediaRow], width: Int, stride: Int)
      : Dataset[(Long, Int, Int, Double, Double)] = {
    require(width > 0 && stride > 0, s"bad framing: $width/$stride")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val pcm = if (sniffWav(r.payload)) audioPcm(r.payload) else None
      val (n, sample) = pcm match {
        case Some(a) => (a.n, a.sample)
        case None =>
          (r.payload.length, (k: Int) => (r.payload(k) & 0xff).toDouble)
      }
      val nWin = if (n == 0) 0 else (n + stride - 1) / stride
      (0 until nWin).map { i =>
        val start = i * stride
        val len = math.min(width, n - start)
        var sum = 0.0
        var sq = 0.0
        var k = start
        while (k < start + len) {
          val v = sample(k); sum += v; sq += v * v; k += 1
        }
        (r.doc_id, i, len, sum / len, math.sqrt(sq / len))
      }
    }
  }

  /** Per-frame cap for [[decodeVideoFrames]]: a multi-frame container
    * with a corrupt or adversarial frame count stops emitting (not
    * decoding) at this many frames — the frame-count twin of
    * [[MaxPixels]], which still bounds each individual raster.
    */
  private val MaxVideoFrames = 64

  /** REAL video decode — animated GIF is a genuine multi-frame video
    * container (frames + per-frame delays) whose codec ships in the JDK:
    * `ImageIO`'s GIF reader exposes every frame through
    * `getNumImages(true)` / `read(i)`, so per-frame feature extraction
    * needs no external dependency, exactly like images (r10) and WAV
    * audio (r13). Emits (frame_idx, width, height, mean over the 8-bit
    * sRGB channels) per stored frame — the width/height are the STORED
    * raster's (GIF frames may be sub-rects under disposal-method
    * composition; feature extraction reads what the container stores,
    * it does not replay the compositor). None when the reader rejects
    * the bytes (a text doc starting "GIF8…"), a frame's dims breach
    * [[MaxPixels]], or there are zero frames; the caller falls back to
    * the deterministic stub — the weak-evidence discipline shared by
    * all three real decoders.
    */
  def decodeVideoFrames(payload: Array[Byte])
      : Option[Seq[(Int, Int, Int, Double)]] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          // seekForwardOnly=false: getNumImages(true) must scan the
          // whole sequence to count frames
          reader.setInput(iis, false, true)
          val n = math.min(reader.getNumImages(true), MaxVideoFrames)
          if (n <= 0) None
          else {
            val out = Seq.newBuilder[(Int, Int, Int, Double)]
            var i = 0
            var ok = true
            while (ok && i < n) {
              val w = reader.getWidth(i)
              val h = reader.getHeight(i)
              if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) ok = false
              else {
                val img = reader.read(i)
                val buf = new Array[Int](w)
                var sum = 0.0
                var y = 0
                while (y < h) {
                  img.getRGB(0, y, w, 1, buf, 0, w)
                  var x = 0
                  while (x < w) {
                    val v = buf(x)
                    sum += ((v >> 16) & 0xff) + ((v >> 8) & 0xff) +
                      (v & 0xff)
                    x += 1
                  }
                  y += 1
                }
                out += ((i, w, h, sum / (w.toLong * h * 3)))
              }
              i += 1
            }
            if (ok) Some(out.result()) else None
          }
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  /** Decode dispatch: the real ImageIO path for payloads that sniff as
    * an image, the real WAV/PCM path for RIFF/WAVE payloads, the
    * deterministic fake for everything else. A sniffed payload that
    * FAILS to decode also takes the fake — deliberately, not as an
    * oversight: magic bytes are weak evidence (a text document
    * beginning "GIF87a …" or "BM…" sniffs as an image), so a hard
    * undecodable sentinel would reclassify ordinary text rows and break
    * the oracle's all-rows stub replay on a text corpus. A real media
    * pipeline separates corrupt blobs UPSTREAM at ingest (mm_meta's
    * length/digest pass), where "should have been an image" is known
    * from the manifest rather than guessed from content.
    */
  def decode(payload: Array[Byte]): (Int, Int, Double) =
    if (sniffImage(payload))
      decodeImage(payload).getOrElse(decodeStub(payload))
    else if (sniffWav(payload))
      decodeAudio(payload).getOrElse(decodeStub(payload))
    else decodeStub(payload)

  /** Partition-batched feature extraction: one decoder "handle" per
    * partition (here a counter standing in for an acquired native
    * resource), each row decoded through it — the mapInPandas/
    * mapPartitions batch shape.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // a real pipeline acquires the decoder/model once per partition here
      rows.map { r =>
        val (w, h, mean) = decode(r.payload)
        MediaFeatures(r.doc_id, w, h, mean)
      }
    }
  }

  /** GIF container sniff (87a/89a share the "GIF8" prefix) — gates the
    * multi-frame video decoder the way [[sniffImage]]/[[sniffWav]] gate
    * theirs.
    */
  def sniffGif(p: Array[Byte]): Boolean =
    p.length >= 4 && p(0) == 'G'.toByte && p(1) == 'I'.toByte &&
      p(2) == 'F'.toByte && p(3) == '8'.toByte

  /** Partition-batched PER-FRAME feature extraction — the video twin of
    * [[extractFeatures]]'s per-payload shape: a 1→N generator from one
    * payload row to one feature row per frame. Payloads that sniff as
    * GIF take the REAL multi-frame decode ([[decodeVideoFrames]]:
    * frame_idx = the container's frame index); everything else —
    * including this corpus's UTF-8 text blobs — emits the deterministic
    * stub's features over the byte-frame sampler (every 4th 64-byte
    * frame, [[frameSample]]'s contract), so the key stays fully
    * oracle-replayable on a text corpus while planted animated GIFs
    * exercise the real path end-to-end (MultimodalSpec).
    */
  def extractFrameFeatures(media: Dataset[MediaRow])
      : Dataset[(Long, Int, Int, Int, Double)] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val real =
        if (sniffGif(r.payload)) decodeVideoFrames(r.payload) else None
      real match {
        case Some(frames) =>
          frames.map { case (i, w, h, m) => (r.doc_id, i, w, h, m) }
        case None =>
          r.payload.grouped(64).zipWithIndex.collect {
            case (frame, idx) if idx % 4 == 0 =>
              val (w, h, m) = decodeStub(frame)
              (r.doc_id, idx, w, h, m)
          }.toSeq
      }
    }
  }

  /** documents.text as UTF-8 payload bytes — the stand-in media scan. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    documents(s, d)
      // a row with no payload never enters the media pipeline — the
      // typed Dataset contract hands user decode code a non-null
      // Array[Byte], so the boundary drops SQL nulls (skip the missing
      // blob; don't NPE three operators downstream)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Resize stub: cap the payload at `maxBytes` by stride-sampling —
    * stands in for image downscaling. Byte plumbing (not the resampling
    * math) is the contract: output is a payload column again, so resize
    * composes with every other media op.
    */
  def resize(media: Dataset[MediaRow], maxBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val n = r.payload.length
      if (n <= maxBytes) r
      else {
        val stride = math.max(1, n / maxBytes)
        MediaRow(r.doc_id,
          r.payload.indices.collect {
            case i if i % stride == 0 => r.payload(i)
          }.take(maxBytes).toArray)
      }
    })
  }

  /** Frame-sample stub: split the payload into fixed-width "frames" and
    * keep every `everyNth` — the video-keyframe access pattern. Emits
    * (doc_id, frame_idx, frame bytes): a 1→N generator over binary.
    */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int, everyNth: Int)
      : Dataset[(Long, Int, Array[Byte])] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (frame, idx) if idx % everyNth == 0 => (r.doc_id, idx, frame)
      }
    }
  }

  val queries: Map[String, Q] = Map(
    // Metadata over opaque payloads without user code: byte length and a
    // content digest, both codegen'd and oracle-checked. Column pruning
    // applies: a metadata-only projection never deserializes the blob
    // downstream of the scan.
    "mm_meta" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"),
          length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("digest"))
        .orderBy("doc_id")),

    // Partition-batched decode + feature extraction. Dispatch (r10
    // images, r13 audio): payloads that sniff as an image decode for
    // REAL through the JDK's ImageIO, RIFF/WAVE PCM payloads through
    // javax.sound.sampled (MultimodalSpec plants a PNG and a WAV and
    // pins width/height/mean against independently computed pixel and
    // sample values); everything else — including this corpus's UTF-8
    // text blobs — takes the deterministic
    // stub, so the key stays oracle-gated: the stub's byte math is
    // deterministic, and on this ASCII corpus byte values ≡ codepoints,
    // so DuckDB replays it exactly (a non-ASCII row would hash-mismatch
    // — the gate itself guards the assumption). Batching/determinism/
    // schema laws stay in MultimodalSpec.
    // mean_byte is an integer-ratio double — round(x, 4) is the
    // cross-engine half-boundary class this repo bans (review finding);
    // floor(x·1e4 + 0.5) is the same IEEE expression in both engines.
    "mm_decode_features" -> ((s, d) =>
      extractFeatures(mediaTable(s, d)).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          floor(col("mean_byte") * 1e4 + 0.5).cast("long")
            .as("mean_byte_e4"))
        .orderBy("doc_id")),

    // Resize through the media pipeline, gated on the SIZE contract (the
    // stride math guarantees exactly min(n, maxBytes) bytes survive —
    // byte content is stub-internal, the cap is the oracle-checkable law).
    "mm_resize" -> ((s, d) =>
      resize(mediaTable(s, d), maxBytes = 256).toDF()
        .select(col("doc_id"), length(col("payload")).as("n_bytes"))
        .orderBy("doc_id")),

    // Raw-file ingest through the `binaryFile` source — the entry point a
    // real media pipeline takes (a directory of image/audio files →
    // (path, modificationTime, length, content) rows). Fixture files are
    // produced by a DISTRIBUTED text write of the corpus (no driver
    // materialization), then read back as opaque binaries. The aggregate
    // uses the source's `length` METADATA column, not length(content) —
    // with content pruned, the scan reads file stats only, never the
    // payload bytes: the listing-only query pattern over a 100 TB media
    // lake. Oracle: file count = declared W, total bytes = corpus bytes
    // + one newline per row (the text writer's framing).
    "mm_ingest_binary" -> ((s, d) => {
      val dir = IO.tmpDir(d, "binfiles")
      documents(s, d).select(col("text")).repartition(8)
        .write.mode("overwrite").text(dir)
      s.read.format("binaryFile")
        .option("pathGlobFilter", "part-*")
        .load(dir)
        .agg(count(lit(1)).as("n_files"),
          sum(col("length")).as("total_bytes"))
    }),

    // WebDataset-style SHARD MANIFEST — the packing step that turns a
    // row-per-sample corpus into fixed-size shard units for sequential
    // training reads: samples ordered deterministically within each
    // source, packed by the EXCLUSIVE running byte total (shard_idx =
    // cum_bytes_before / SHARD — a sample lands in the shard its first
    // byte falls into), manifest = one row per shard with item count,
    // byte total, and the id range a reader needs to seek. Scale shape:
    // the prefix sum partitions by SOURCE — per-group windows, never a
    // single global-ordering task (a truly global shard stream would
    // use the standard two-pass prefix sum: per-partition totals
    // collected once, broadcast as offsets); skew is bounded by the
    // largest source, and the manifest itself is shard-cardinality
    // sized. Fully oracle-replayed (window + integer division). The
    // truly-global single-stream variant is `mm_shard_manifest_global`
    // below.
    "mm_shard_manifest" -> ((s, d) => {
      val shardBytes = 4096L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      documents(s, d)
        .select(col("source"), col("doc_id"),
          coalesce(octet_length(col("text")).cast("long"), lit(0L)).as("nb"))
        .withColumn("shard_idx",
          floor(coalesce(sum(col("nb")).over(w), lit(0L))
            / lit(shardBytes.toDouble)).cast("long"))
        .groupBy(col("source"), col("shard_idx"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("nb")).as("shard_bytes"),
          min(col("doc_id")).as("first_id"),
          max(col("doc_id")).as("last_id"))
        .orderBy("source", "shard_idx")
    }),

    // TRULY-GLOBAL shard manifest (r10 — previously documented-only):
    // one shard stream over the WHOLE corpus in doc_id order, no
    // per-source grouping — the layout a single sequential training
    // reader consumes. The global exclusive byte prefix is the standard
    // TWO-PASS PREFIX SUM (the text_pack_sequences / agg_ks_test
    // composition): range-partition by doc_id, per-partition running
    // sums in pid-keyed windows, per-partition totals prefix-summed
    // into start offsets (a partition-count-sized relation broadcast
    // back) — never a one-task global-ordering window. The partitioned
    // relation persists EAGERLY so both phases read the same sampled
    // range boundaries; the assignment is boundary-invariant
    // (local_cum + offset − nb is the global exclusive prefix under ANY
    // partitioning), which the single-window oracle checks.
    "mm_shard_manifest_global" -> ((s, d) => {
      val shardBytes = 4096L
      val W = org.apache.spark.sql.expressions.Window
      val part = TwoPass.rangedByPid(
        documents(s, d)
          .select(col("doc_id"),
            coalesce(octet_length(col("text")).cast("long"), lit(0L))
              .as("nb")),
        col("doc_id"))
      val localCum = part.withColumn("local_cum",
        sum(col("nb")).over(
          W.partitionBy(col("pid")).orderBy(col("doc_id"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)))
      val offsets = TwoPass.sumOffsets(part, col("nb"))
      localCum.join(broadcast(offsets), Seq("pid"))
        .withColumn("shard_idx",
          floor((col("local_cum") + col("offset") - col("nb"))
            / lit(shardBytes.toDouble)).cast("long"))
        .groupBy(col("shard_idx"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("nb")).as("shard_bytes"),
          min(col("doc_id")).as("first_id"),
          max(col("doc_id")).as("last_id"))
        .orderBy("shard_idx")
    }),

    // Frame sampling as a 1→N generator over binary: every 4th 64-byte
    // frame with its index; the (index, frame-length) stream is fully
    // determined by the payload length, so the oracle checks the whole
    // generator shape including the short tail frame.
    "mm_frames" -> ((s, d) =>
      frameSample(mediaTable(s, d), frameBytes = 64, everyNth = 4)
        .toDF("doc_id", "frame_idx", "frame")
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame")).as("n_bytes"))
        .orderBy("doc_id", "frame_idx"))
        ,

    // Per-FRAME decode + feature extraction (r13) — mm_decode_features'
    // video twin: one feature row per frame instead of per payload.
    // GIF payloads decode for REAL (animated GIF is a genuine
    // multi-frame container and its codec ships in the JDK); this
    // corpus's text blobs take the stub over the byte-frame sampler, so
    // the whole key is oracle-replayed exactly (substring byte math, the
    // ASCII guard shared with mm_decode_features). Same e4 scaling as
    // mm_decode_features: floor(x·1e4 + 0.5) is the identical IEEE
    // expression in both engines, round(x, 4) is the banned
    // half-boundary class.
    "mm_video_features" -> ((s, d) =>
      extractFrameFeatures(mediaTable(s, d))
        .toDF("doc_id", "frame_idx", "width", "height", "mean_byte")
        .select(col("doc_id"), col("frame_idx"), col("width"),
          col("height"),
          floor(col("mean_byte") * 1e4 + 0.5).cast("long")
            .as("mean_byte_e4"))
        .orderBy("doc_id", "frame_idx")),

    // Per-WINDOW audio features (r14) — mm_video_features' audio twin:
    // one row per (width=256, stride=192) sample window instead of per
    // payload; overlapping stride exercises the framing convention a
    // spectrogram/VAD stage uses. WAV payloads decode for REAL through
    // the shared audioPcm gate; this corpus's text blobs window the raw
    // bytes, so the key is oracle-replayed exactly (substring byte math
    // + list_sum, the ASCII guard shared with mm_decode_features). Same
    // e4 scaling discipline: floor(x·1e4 + 0.5), never round(x, 4).
    "mm_audio_features" -> ((s, d) =>
      extractAudioWindows(mediaTable(s, d), width = 256, stride = 192)
        .toDF("doc_id", "win_idx", "n_samples", "mean", "rms")
        .select(col("doc_id"), col("win_idx"), col("n_samples"),
          floor(col("mean") * 1e4 + 0.5).cast("long").as("mean_e4"),
          floor(col("rms") * 1e4 + 0.5).cast("long").as("rms_e4"))
        .orderBy("doc_id", "win_idx"))
  )

  val oracle: Map[String, String] = Map(
    // (DuckDB's sha256 takes VARCHAR and hashes its UTF-8 bytes — the same
    // bytes Spark's sha2(encode(text,'UTF-8'),256) digests.)
    "mm_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  sha256(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mm_decode_features (r7): exact replay of decodeStub's byte math.
    // Byte length ≡ char length and byte value ≡ codepoint on the ASCII
    // corpus (a non-ASCII row would fail the gate, guarding the
    // assumption); `//`/`%` on DuckDB BIGINTs match the stub's integer
    // ops; the n=0 coalesce mirrors the stub's empty-payload 0.0; the
    // mean is floor-scaled (same IEEE expression as the Spark side) —
    // round(x, 4) on an integer ratio is the banned half-boundary class.
    "mm_decode_features" ->
      """SELECT doc_id,
        |  CAST(greatest(1, length(text) % 640) AS INTEGER) AS width,
        |  CAST(greatest(1, (length(text) // 7) % 480) AS INTEGER)
        |    AS height,
        |  CAST(floor(coalesce(
        |    list_sum([unicode(c)::DOUBLE for c in string_split(text, '')])
        |      / nullif(length(text), 0), 0) * 1e4 + 0.5) AS BIGINT)
        |    AS mean_byte_e4
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "mm_ingest_binary" ->
      """SELECT CAST(8 AS BIGINT) AS n_files,
        |  CAST(sum(octet_length(encode(text))) + count(*) AS BIGINT)
        |    AS total_bytes
        |FROM documents""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id,
        |  CAST(least(octet_length(encode(text)), 256) AS INTEGER) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Exact replay of the per-source exclusive prefix sum + integer
    // shard assignment. DuckDB sums BIGINT into HUGEINT — every
    // aggregate is cast back to BIGINT to match Spark's long.
    "mm_shard_manifest" ->
      """WITH b AS (
        |  SELECT source, doc_id,
        |    CAST(coalesce(octet_length(encode(text)), 0) AS BIGINT) AS nb
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, nb,
        |    CAST(floor(CAST(coalesce(sum(nb) OVER (
        |        PARTITION BY source ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS DOUBLE) / 4096.0) AS BIGINT) AS shard_idx
        |  FROM b)
        |SELECT source, shard_idx, count(*) AS n_items,
        |  CAST(sum(nb) AS BIGINT) AS shard_bytes,
        |  min(doc_id) AS first_id, max(doc_id) AS last_id
        |FROM c GROUP BY source, shard_idx
        |ORDER BY source, shard_idx""".stripMargin,
    // The same replay with ONE global window — DuckDB's single-node
    // cumulative sum ≡ the engine's two-pass range-partitioned prefix
    // by the boundary-invariance argument on the operator.
    "mm_shard_manifest_global" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(coalesce(octet_length(encode(text)), 0) AS BIGINT) AS nb
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, nb,
        |    CAST(floor(CAST(coalesce(sum(nb) OVER (
        |        ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS DOUBLE) / 4096.0) AS BIGINT) AS shard_idx
        |  FROM b)
        |SELECT shard_idx, count(*) AS n_items,
        |  CAST(sum(nb) AS BIGINT) AS shard_bytes,
        |  min(doc_id) AS first_id, max(doc_id) AS last_id
        |FROM c GROUP BY shard_idx
        |ORDER BY shard_idx""".stripMargin,
    "mm_frames" ->
      """WITH d AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len FROM documents)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |  CAST(least(64, len - i * 64) AS INTEGER) AS n_bytes
        |FROM (SELECT doc_id, len,
        |        unnest([i for i in range(0, (len + 63) // 64, 4)]) AS i
        |      FROM d)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // Exact replay of the stub path: every 4th 64-byte frame's
    // decodeStub features. substring is char-addressed — byte ≡ char on
    // the ASCII corpus (the shared mm_decode_features guard: a
    // non-ASCII row would hash-mismatch the gate).
    "mm_video_features" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len FROM documents
        |  WHERE text IS NOT NULL),
        |f AS (
        |  SELECT doc_id, i, substring(text, i * 64 + 1, 64) AS fr
        |  FROM (SELECT doc_id, text, len,
        |          unnest([i for i in range(0, (len + 63) // 64, 4)]) AS i
        |        FROM d))
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |  CAST(greatest(1, length(fr) % 640) AS INTEGER) AS width,
        |  CAST(greatest(1, (length(fr) // 7) % 480) AS INTEGER) AS height,
        |  CAST(floor(
        |    list_sum([unicode(c)::DOUBLE for c in string_split(fr, '')])
        |      / length(fr) * 1e4 + 0.5) AS BIGINT) AS mean_byte_e4
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    // Exact replay of the stub windowing: window i = 256 chars starting
    // at i·192 (1-based substring), ceil(len/192) windows so every
    // window holds ≥ 1 sample. Same byte ≡ codepoint ASCII guard and
    // list_sum accumulation-order contract as mm_decode_features; RMS's
    // sqrt is correctly rounded IEEE in both engines.
    "mm_audio_features" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len FROM documents
        |  WHERE text IS NOT NULL AND length(text) > 0),
        |w AS (
        |  SELECT doc_id, i, substring(text, i * 192 + 1, 256) AS win
        |  FROM (SELECT doc_id, text,
        |          unnest([i for i in range(0, (len + 191) // 192)]) AS i
        |        FROM d)),
        |s AS (
        |  SELECT doc_id, i, length(win) AS n,
        |    [unicode(c)::DOUBLE for c in string_split(win, '')] AS xs
        |  FROM w)
        |SELECT doc_id, CAST(i AS INTEGER) AS win_idx,
        |  CAST(n AS INTEGER) AS n_samples,
        |  CAST(floor(list_sum(xs) / n * 1e4 + 0.5) AS BIGINT) AS mean_e4,
        |  CAST(floor(sqrt(list_sum([x * x for x in xs]) / n) * 1e4 + 0.5)
        |    AS BIGINT) AS rms_e4
        |FROM s ORDER BY doc_id, win_idx""".stripMargin
  )
}
