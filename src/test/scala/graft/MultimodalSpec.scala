package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal plumbing contracts: payload fidelity, partition-batched
  * decode determinism, and the feature schema a downstream consumer binds.
  */
class MultimodalSpec extends SparkSpec {

  test("payload bytes roundtrip the binary column exactly") {
    import spark.implicits._
    val row = Multimodal.mediaTable(spark, sfDir)
      .filter($"doc_id" === 0L).head()
    val text = Tables.documents(spark, sfDir)
      .filter($"doc_id" === 0L).select("text").as[String].head()
    assert(row.payload.sameElements(text.getBytes("UTF-8")))
  }

  test("mm_decode_features is deterministic and schema-stable") {
    val a = SparkEntry.queries("mm_decode_features")(spark, sfDir).collect()
    val b = SparkEntry.queries("mm_decode_features")(spark, sfDir).collect()
    assert(a.sameElements(b), "stubbed decode must be a pure function")
    val schema = SparkEntry.queries("mm_decode_features")(spark, sfDir)
      .schema.map(f => (f.name, f.dataType.simpleString))
    assert(schema == Seq(("doc_id", "bigint"), ("width", "int"),
      ("height", "int"), ("mean_byte_e4", "bigint")))
  }

  test("real image payloads decode through the JDK codec (planted PNG)") {
    import spark.implicits._
    // plant a 3×2 RGB PNG with known pixel values; PNG is lossless, so
    // the decoded raster must reproduce them exactly and the expected
    // mean is computable independently of the decode under test
    val rgbs = Array(
      Array(0xff0000, 0x00ff00, 0x0000ff),
      Array(0x102030, 0x405060, 0x708090))
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3) img.setRGB(x, y, rgbs(y)(x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    assert(Multimodal.sniffImage(png), "PNG magic must sniff as image")
    val samples = rgbs.flatten.flatMap(v =>
      Seq((v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff))
    val want = samples.sum.toDouble / samples.length
    val textPayload = "not an image".getBytes("UTF-8")
    val feats = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(1L, png), Multimodal.MediaRow(2L, textPayload))
        .toDS()).collect().sortBy(_.doc_id)
    assert(feats(0).width == 3 && feats(0).height == 2,
      s"decoded dims: ${feats(0)}")
    assert(math.abs(feats(0).mean_byte - want) < 1e-9,
      s"decoded mean ${feats(0).mean_byte} != planted $want")
    // non-image payloads keep the deterministic fake — the path the
    // DuckDB oracle pins on the text corpus
    val (fw, fh, fm) = Multimodal.decodeStub(textPayload)
    assert(feats(1).width == fw && feats(1).height == fh &&
      feats(1).mean_byte == fm)

    // palettized GIF: raster samples are palette INDICES — a solid-white
    // GIF whose single palette entry sits at index 0 would mean 0.0 if
    // the decode read raw samples; getRGB color conversion must yield 255
    val wimg = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    wimg.setRGB(0, 0, 0xffffff); wimg.setRGB(1, 0, 0xffffff)
    val gbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(wimg, "gif", gbos)
    val gif = gbos.toByteArray
    assert(Multimodal.sniffImage(gif))
    assert(Multimodal.decode(gif) == ((2, 1, 255.0)),
      s"palettized decode: ${Multimodal.decode(gif)}")

    // false-positive sniff: ASCII starting "BM" claims the BMP reader,
    // whose header parse of arbitrary text yields garbage dims — the
    // bounded header check must refuse BEFORE any raster allocation and
    // fall back to the stub, not throw or OOM
    val bm = ("BM25 is a ranking function used by search engines to " +
      "estimate the relevance of documents").getBytes("UTF-8")
    assert(Multimodal.sniffImage(bm), "the weak 2-byte BMP magic matches")
    assert(Multimodal.decode(bm) == Multimodal.decodeStub(bm),
      "false-positive sniff must take the deterministic fake")
  }

  test("real WAV payloads decode through the JDK codec (planted PCM, " +
    "sample-exact)") {
    import spark.implicits._
    import javax.sound.sampled._
    // plant 4 stereo frames of 16-bit signed little-endian PCM with
    // known sample values, containerized by the INDEPENDENT JDK writer;
    // PCM is lossless, so the decode under test must reproduce the
    // planted samples exactly and the expected mean is computable
    // without it: mean over (s + 32768)/256 — the 8-bit unsigned scale
    val samples = Seq[Short](-32768, 0, 32767, 1000, -1000, 256, -256,
      12345)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 2, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt,
        samples.length / 2),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    assert(Multimodal.sniffWav(wav), "RIFF/WAVE magic must sniff as wav")
    val want = samples.map(s => (s + 32768) / 256.0).sum / samples.length
    val textPayload = "not audio either".getBytes("UTF-8")
    val feats = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(1L, wav), Multimodal.MediaRow(2L, textPayload))
        .toDS()).collect().sortBy(_.doc_id)
    assert(feats(0).width == 4 && feats(0).height == 2,
      s"decoded frames/channels: ${feats(0)}")
    assert(math.abs(feats(0).mean_byte - want) < 1e-9,
      s"decoded mean ${feats(0).mean_byte} != planted $want")
    val (fw, fh, fm) = Multimodal.decodeStub(textPayload)
    assert(feats(1).width == fw && feats(1).height == fh &&
      feats(1).mean_byte == fm)

    // 8-bit unsigned PCM, the other supported depth: samples are
    // already on the byte scale, mono, 3 frames
    val pcm8 = Array[Byte](0, 127.toByte, 255.toByte)
    val bos8 = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm8),
        new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1,
          1, 8000f, false), 3),
      AudioFileFormat.Type.WAVE, bos8)
    val wav8 = bos8.toByteArray
    assert(Multimodal.sniffWav(wav8))
    assert(Multimodal.decode(wav8) == ((3, 1, (0 + 127 + 255) / 3.0)),
      s"8-bit decode: ${Multimodal.decode(wav8)}")

    // false-positive sniff: a RIFF/WAVE prefix on garbage chunks must
    // refuse at the parser and take the deterministic fake, not throw
    val fake = ("RIFF0000WAVEthis is not actually a wave file at all")
      .getBytes("UTF-8")
    assert(Multimodal.sniffWav(fake), "the weak container magic matches")
    assert(Multimodal.decode(fake) == Multimodal.decodeStub(fake),
      "false-positive sniff must take the deterministic fake")
  }

  test("audio windows are sample-exact on the real WAV path and " +
    "byte-exact on the stub path") {
    import spark.implicits._
    import javax.sound.sampled._
    // same planted 16-bit stereo PCM as the decode law: 8 channel-samples
    // with known values, containerized by the independent JDK writer —
    // every window's (count, mean, rms) is computable without the code
    // under test
    val samples = Seq[Short](-32768, 0, 32767, 1000, -1000, 256, -256,
      12345)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 2, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt,
        samples.length / 2),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val textPayload = "quantify the relevance".getBytes("UTF-8")
    // width 3 / stride 2: overlapping windows AND a short tail in 8
    // samples — windows [0,3) [2,5) [4,7) [6,8)
    val got = Multimodal.extractAudioWindows(
        Seq(Multimodal.MediaRow(1L, wav),
          Multimodal.MediaRow(2L, textPayload)).toDS(),
        width = 3, stride = 2)
      .collect().sortBy(r => (r._1, r._2))
    def expect(xs: Seq[Double], width: Int, stride: Int)
        : Seq[(Int, Int, Double, Double)] =
      (0 until (xs.length + stride - 1) / stride).map { i =>
        val w = xs.slice(i * stride, i * stride + width)
        (i, w.length, w.sum / w.length,
          math.sqrt(w.map(x => x * x).sum / w.length))
      }
    val scale = samples.map(s => (s + 32768) / 256.0)
    val wantWav = expect(scale, 3, 2)
    val gotWav = got.filter(_._1 == 1L)
    assert(gotWav.length == wantWav.length, s"window count: ${gotWav.length}")
    gotWav.zip(wantWav).foreach { case ((_, i, n, m, r), (wi, wn, wm, wr)) =>
      assert(i == wi && n == wn, s"window $i framing: ($n) vs ($wn)")
      assert(math.abs(m - wm) < 1e-9 && math.abs(r - wr) < 1e-9,
        s"window $i features: ($m, $r) vs ($wm, $wr)")
    }
    // stub path: the text payload's windows are its raw bytes
    val bytesScale = textPayload.map(b => (b & 0xff).toDouble).toSeq
    val wantTxt = expect(bytesScale, 3, 2)
    val gotTxt = got.filter(_._1 == 2L)
    assert(gotTxt.map(t => (t._2, t._3)).toSeq ==
      wantTxt.map(t => (t._1, t._2)))
    gotTxt.zip(wantTxt).foreach { case ((_, _, _, m, r), (_, _, wm, wr)) =>
      assert(math.abs(m - wm) < 1e-9 && math.abs(r - wr) < 1e-9)
    }
    // empty payload emits no windows (the flatMap's n == 0 guard)
    assert(Multimodal.extractAudioWindows(
      Seq(Multimodal.MediaRow(3L, Array.empty[Byte])).toDS(), 3, 2)
      .count() == 0)
  }

  test("real video payloads decode per frame through the JDK codec " +
    "(planted animated GIF)") {
    import spark.implicits._
    // plant a 3-frame 4×2 animated GIF of solid colors through the
    // INDEPENDENT JDK sequence writer; a solid frame's single color
    // lands EXACTLY in the GIF palette (no quantization error is
    // possible for a one-color image), so each decoded frame's channel
    // mean is computable without the decode under test
    val colors = Seq(0x102030, 0xff8000, 0x000000)
    val frames = colors.map { c =>
      val img = new java.awt.image.BufferedImage(4, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, c)
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f => writer.writeToSequence(
      new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    val gif = bos.toByteArray
    assert(Multimodal.sniffGif(gif), "GIF magic must sniff as video")
    val means = colors.map(c =>
      (((c >> 16) & 0xff) + ((c >> 8) & 0xff) + (c & 0xff)) / 3.0)
    val textPayload = ("not a video: a document long enough to span " +
      "several sixty-four byte frames of the byte-frame sampler, so " +
      "the stub branch emits more than one sampled frame here " +
      "........................................................" +
      "........................................................" +
      "........................................................" +
      "........................................................")
      .getBytes("UTF-8")
    val rows = Multimodal.extractFrameFeatures(
      Seq(Multimodal.MediaRow(1L, gif),
        Multimodal.MediaRow(2L, textPayload))
        .toDS()).collect().sortBy(r => (r._1, r._2)).toSeq
    val real = rows.filter(_._1 == 1L)
    assert(real.map(_._2) == Seq(0, 1, 2),
      s"expected the container's 3 frame indices, got $real")
    real.zip(means).foreach { case ((_, i, w, h, m), want) =>
      assert(w == 4 && h == 2, s"frame $i dims ($w,$h) != planted 4×2")
      assert(math.abs(m - want) < 1e-9,
        s"frame $i mean $m != planted $want")
    }
    // non-GIF payloads take the byte-frame sampler + stub — the branch
    // the DuckDB oracle replays on the text corpus (every 4th 64-byte
    // frame; this payload is long enough for two sampled frames)
    val stub = rows.filter(_._1 == 2L)
    val wantStub = textPayload.grouped(64).zipWithIndex.collect {
      case (f, i) if i % 4 == 0 =>
        val (w, h, m) = Multimodal.decodeStub(f)
        (2L, i, w, h, m)
    }.toSeq
    assert(stub.size >= 2 && stub == wantStub,
      s"stub branch mismatch: $stub vs $wantStub")
    // false-positive sniff: text starting "GIF8" claims the reader,
    // which must refuse the garbage body — stub fallback, never a throw
    val fake = "GIF87a is an image format from 1987".getBytes("UTF-8")
    assert(Multimodal.sniffGif(fake), "the weak container magic matches")
    val fakeRows = Multimodal.extractFrameFeatures(
      Seq(Multimodal.MediaRow(3L, fake)).toDS()).collect().toSeq
    val (fw, fh, fm) = Multimodal.decodeStub(fake)
    assert(fakeRows == Seq((3L, 0, fw, fh, fm)),
      s"false-positive sniff must take the deterministic fake: $fakeRows")
  }

  test("decode runs per partition, touching every row exactly once") {
    import spark.implicits._
    val n = Tables.documents(spark, sfDir).count()
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sfDir))
    assert(feats.count() == n)
    assert(feats.select(countDistinct($"doc_id")).as[Long].head() == n)
  }

  test("resize caps payloads and composes back into the media pipeline") {
    import spark.implicits._
    val resized = Multimodal.resize(
      Multimodal.mediaTable(spark, sfDir), maxBytes = 64)
    assert(resized.collect().forall(_.payload.length <= 64))
    // composition: features still extract from resized payloads
    assert(Multimodal.extractFeatures(resized).count() ==
      Tables.documents(spark, sfDir).count())
  }

  test("frameSample keeps every Nth fixed-width frame with its index") {
    import spark.implicits._
    val frames = Multimodal.frameSample(
      Multimodal.mediaTable(spark, sfDir), frameBytes = 32, everyNth = 2)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall { case (_, idx, f) =>
      idx % 2 == 0 && f.length <= 32 })
    // deterministic frame content: frame 0 is the payload's first 32 bytes
    val doc0 = Multimodal.mediaTable(spark, sfDir)
      .filter($"doc_id" === 0L).head().payload
    val f0 = frames.find { case (id, idx, _) => id == 0L && idx == 0 }.get._3
    assert(f0.sameElements(doc0.take(32)))
  }

  test("mm_shard_manifest: per-source conservation, ordered disjoint " +
    "id ranges") {
    val m = SparkEntry.queries("mm_shard_manifest")(spark, sfDir).collect()
    val bySrc = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(octet_length(col("text")).cast("long"), lit(0L)))
          .as("nb"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    m.groupBy(_.getString(0)).foreach { case (src, shards) =>
      // packing conserves: every doc in exactly one shard, every byte
      // accounted for
      assert(shards.map(_.getLong(2)).sum == bySrc(src)._1,
        s"$src: item counts must sum to the source's doc count")
      assert(shards.map(_.getLong(3)).sum == bySrc(src)._2,
        s"$src: shard bytes must sum to the source's corpus bytes")
      val ordered = shards.sortBy(_.getLong(1))
      // strictly increasing from 0 (an over-shard-size sample may
      // legally skip an index; density is not part of the contract)
      assert(ordered.head.getLong(1) == 0L,
        s"$src: first shard must be index 0")
      assert(ordered.map(_.getLong(1)).distinct.length == ordered.length,
        s"$src: shard indices must be unique")
      ordered.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getLong(5) < y.getLong(4),
            s"$src: shard id ranges must be disjoint and ordered")
        case _ => ()
      }
    }
  }

  test("metadata projection prunes the payload from the feature read") {
    // metadata-only query: the blob column must not survive into the
    // aggregate (column pruning over the derived payload)
    val df = SparkEntry.queries("mm_meta")(spark, sfDir)
      .select("doc_id", "n_bytes")
    assert(df.count() == 500)
  }
}
