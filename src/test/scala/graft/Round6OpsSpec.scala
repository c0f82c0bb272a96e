package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{FlacMeta, Mp3Meta, SampleRange}

/** Round-6 multimodal: TRUE per-sample byte ranges from the full MP4
  * sample tables (stsz size table + stsc runs + stco/co64 chunk
  * offsets) and the exact frame sampler built on them.
  */
class Round6OpsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  /** The oracle arithmetic: offset of sample i = mdat body start (28)
    * + prefix-sum of sizes + chunkGap per crossed chunk boundary. */
  private def expectRanges(sizes: Seq[Int], spc: Int, gap: Int): Seq[SampleRange] = {
    var off = 28L
    sizes.zipWithIndex.map { case (s, i) =>
      if (i > 0 && i % spc == 0) off += gap
      val r = SampleRange(off, s)
      off += s
      r
    }
  }

  // ------------------------------------------------- mp4SampleRanges

  test("mp4SampleRanges round-trips non-uniform sizes, chunk gaps, multi-entry stsc") {
    val sizes = Seq(20, 35, 59, 21, 40, 33, 58) // 7 samples → chunks of 5+2
    val b = Multimodal.mp4BytesChunked(1000, 5000, sizes, seed = 42L,
      samplesPerChunk = 5, chunkGap = 3)
    val got = Multimodal.mp4SampleRanges(b)
    assert(got.isDefined)
    assert(got.get.toSeq == expectRanges(sizes, spc = 5, gap = 3))
    // the frame bytes at the reported ranges follow the builder's ramp
    val r2 = got.get(2)
    val slice = b.slice(r2.offset.toInt, (r2.offset + r2.size).toInt)
    assert(slice.zipWithIndex.forall { case (byte, j) =>
      byte == (32 + ((42L + 7L * 2 + 11L * j) % 95)).toByte })
  }

  test("mp4SampleRanges: single chunk, exact-multiple chunks, and co64 offsets") {
    val one = Seq(10, 11, 12)
    val b1 = Multimodal.mp4BytesChunked(600, 100, one, seed = 1L,
      samplesPerChunk = 8, chunkGap = 7)
    assert(Multimodal.mp4SampleRanges(b1).get.toSeq ==
      expectRanges(one, spc = 8, gap = 7))

    val even = Seq(5, 6, 7, 8, 9, 10) // 6 samples, spc 3 → two full chunks
    val b2 = Multimodal.mp4BytesChunked(600, 100, even, seed = 2L,
      samplesPerChunk = 3, chunkGap = 4)
    assert(Multimodal.mp4SampleRanges(b2).get.toSeq ==
      expectRanges(even, spc = 3, gap = 4))

    val b3 = Multimodal.mp4BytesChunked(600, 100, even, seed = 3L,
      samplesPerChunk = 3, chunkGap = 4, useCo64 = true)
    assert(Multimodal.mp4SampleRanges(b3).get.toSeq ==
      expectRanges(even, spc = 3, gap = 4), "co64 offsets must parse too")
  }

  test("mp4SampleRanges expands the uniform-size stsz layout") {
    val sizes = Seq.fill(9)(17)
    val b = Multimodal.mp4BytesChunked(600, 100, sizes, seed = 4L,
      samplesPerChunk = 4, chunkGap = 2, uniformStsz = true)
    assert(Multimodal.mp4SampleRanges(b).get.toSeq ==
      expectRanges(sizes, spc = 4, gap = 2))
  }

  test("mp4SampleRanges picks the VIDEO track despite a leading audio track") {
    val sizes = Seq(30, 31, 32, 33)
    val b = Multimodal.mp4BytesChunked(1000, 2000, sizes, seed = 5L,
      audioFramesFirst = Some(999))
    val got = Multimodal.mp4SampleRanges(b).get
    assert(got.length == 4, "the soun trak's 999-sample stsz must not win")
    assert(got.toSeq == expectRanges(sizes, spc = 5, gap = 3))
  }

  test("mp4SampleRanges rejects malformed tables (stub, never throw)") {
    assert(Multimodal.mp4SampleRanges("garbage".getBytes).isEmpty)
    assert(Multimodal.mp4SampleRanges(Array.emptyByteArray).isEmpty)
    // old fixture: stsz only, no stsc/stco → no full table
    assert(Multimodal.mp4SampleRanges(
      Multimodal.mp4Bytes(1000, 2000, frames = 8)).isEmpty)

    val sizes = Seq(20, 21, 22, 23, 24, 25)
    val ok = Multimodal.mp4BytesChunked(600, 100, sizes, seed = 6L)
    assert(Multimodal.mp4SampleRanges(ok).isDefined)

    // a chunk offset pointing past the payload → out-of-bounds sample
    def patchFirstChunkOffset(bytes: Array[Byte], v: Int): Array[Byte] = {
      val out = bytes.clone()
      val i = indexOfTag(out, "stco")
      // stco body: +4 hdr, +4 flags, +4 count → first offset at +12
      val bb = java.nio.ByteBuffer.allocate(4).putInt(v).array()
      System.arraycopy(bb, 0, out, i + 12, 4)
      out
    }
    assert(Multimodal.mp4SampleRanges(
      patchFirstChunkOffset(ok, 1 << 20)).isEmpty,
      "offset past payload must invalidate the table")

    // truncate the declared stsz count's table: declared 6 entries but
    // body holds fewer → None (patch count UP past the box body)
    def patchStszCount(bytes: Array[Byte], v: Int): Array[Byte] = {
      val out = bytes.clone()
      val i = indexOfTag(out, "stsz")
      val bb = java.nio.ByteBuffer.allocate(4).putInt(v).array()
      System.arraycopy(bb, 0, out, i + 12, 4) // +4 hdr +4 flags +4 size
      out
    }
    assert(Multimodal.mp4SampleRanges(patchStszCount(ok, 1000)).isEmpty)

    // stsc whose first run doesn't start at chunk 1 → malformed
    def patchStscFirstChunk(bytes: Array[Byte], v: Int): Array[Byte] = {
      val out = bytes.clone()
      val i = indexOfTag(out, "stsc")
      val bb = java.nio.ByteBuffer.allocate(4).putInt(v).array()
      // +4 size +4 tag +4 flags +4 entry_count → first entry's
      // first_chunk field at +16
      System.arraycopy(bb, 0, out, i + 16, 4)
      out
    }
    assert(Multimodal.mp4SampleRanges(patchStscFirstChunk(ok, 2)).isEmpty)
  }

  test("mp4SampleRanges: hostile co64 offset near Long.MaxValue must not overflow") {
    val sizes = Seq(5, 6, 7, 8, 9, 10)
    val ok = Multimodal.mp4BytesChunked(600, 100, sizes, seed = 8L,
      samplesPerChunk = 3, chunkGap = 4, useCo64 = true)
    assert(Multimodal.mp4SampleRanges(ok).isDefined)
    val out = ok.clone()
    val i = indexOfTag(out, "co64")
    // box: [4 size][4 tag][4 version/flags][4 count] → first 64-bit
    // offset at +16. Long.MaxValue - 3 plus a positive sample size
    // wraps `off + sz` NEGATIVE, which a naive `off + sz > fileLen`
    // bound waves through — the table must instead be rejected.
    val bb = java.nio.ByteBuffer.allocate(8).putLong(Long.MaxValue - 3).array()
    System.arraycopy(bb, 0, out, i + 16, 8)
    assert(Multimodal.mp4SampleRanges(out).isEmpty,
      "wrapped offset+size must invalidate the table, not emit a bogus range")
  }

  private def indexOfTag(bytes: Array[Byte], tag: String): Int = {
    val t = tag.getBytes
    val i = bytes.indices.indexWhere(i => i + 4 <= bytes.length &&
      bytes(i) == t(0) && bytes(i + 1) == t(1) &&
      bytes(i + 2) == t(2) && bytes(i + 3) == t(3))
    assert(i > 0, s"fixture must contain a $tag box")
    i - 4 // back up over the size field to the box start
  }

  // ------------------------------------------------ frameSampleExact

  test("frameSampleExact: true ranges + md5 over the ACTUAL sample bytes") {
    import spark.implicits._
    val sizes = Seq(20, 35, 59, 21, 40, 33, 58, 44, 27) // 9 frames
    val b = Multimodal.mp4BytesChunked(1000, 5000, sizes, seed = 7L)
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", b),
      Multimodal.MediaRecord(2L, "video", "0123456789".getBytes), // stub n=10
      Multimodal.MediaRecord(3L, "audio", b)                      // excluded
    ).toDF()
    val got = Multimodal.frameSampleExact(spark, media, k = 4)
      .collect().groupBy(_.getAs[Long]("media_id"))

    // 9 frames, k=4 → strided indices 0,2,4,6; ranges from the table
    val expected = expectRanges(sizes, spc = 5, gap = 3)
    val r1 = got(1L).map(r => (r.getAs[Long]("frame_idx"),
      r.getAs[Long]("frame_offset"), r.getAs[Long]("frame_len"),
      r.getAs[String]("frame_md5"), r.getAs[String]("codec")))
      .sortBy(_._1).toSeq
    assert(r1.map(_._1) == Seq(0L, 2L, 4L, 6L))
    r1.foreach { case (idx, off, len, md5got, codec) =>
      val e = expected(idx.toInt)
      assert(codec == "mp4")
      assert(off == e.offset && len == e.size,
        s"frame $idx: got ($off,$len) want (${e.offset},${e.size})")
      assert(md5got == md5hex(b.slice(off.toInt, (off + len).toInt)),
        s"frame $idx md5 must hash the actual container bytes")
    }
    // non-uniform sizes: sampled frames must NOT all share one length
    assert(r1.map(_._3).distinct.length > 1)

    // stub path: uniform model over the raw payload
    val r2 = got(2L).map(r => (r.getAs[Long]("frame_idx"),
      r.getAs[String]("codec"))).sortBy(_._1).toSeq
    assert(r2.forall(_._2 == "stub"))
    assert(r2.map(_._1) == Seq(0L, 2L, 5L, 8L)) // n=10 → 11 frames

    assert(!got.contains(3L))
  }

  // --------------------------------------------------- MP3 / FLAC

  test("tryDecodeMp3 round-trips MPEG1 and MPEG2 fixture parameters") {
    // MPEG1, idx 9 → 128 kbps, rate idx 0 → 44100, 10 frames
    // frameLen = 144 · 128000 / 44100 = 417
    val v1 = Multimodal.mp3Bytes(mpeg1 = true, bitrateIdx = 9, rateIdx = 0,
      frames = 10)
    assert(v1.length == 10 * 417)
    assert(Multimodal.tryDecodeMp3(v1).contains(
      Mp3Meta(44100, 2, 128, 10, 10L * 1152 * 1000 / 44100)))

    // MPEG2, idx 11 → 112 kbps, rate idx 1 → 24000, mono, 7 frames
    // frameLen = 72 · 112000 / 24000 = 336
    val v2 = Multimodal.mp3Bytes(mpeg1 = false, bitrateIdx = 11, rateIdx = 1,
      frames = 7, mono = true)
    assert(v2.length == 7 * 336)
    assert(Multimodal.tryDecodeMp3(v2).contains(
      Mp3Meta(24000, 1, 112, 7, 7L * 576 * 1000 / 24000)))
  }

  test("tryDecodeMp3 skips a leading ID3v2 tag and clamps truncated frames") {
    val tagged = Multimodal.mp3Bytes(mpeg1 = true, bitrateIdx = 9, rateIdx = 0,
      frames = 5, id3Size = 300)
    assert(tagged.length == 310 + 5 * 417)
    assert(Multimodal.tryDecodeMp3(tagged).map(_.frames).contains(5))

    // cut mid-way through the last frame: only complete frames count
    val cut = Multimodal.mp3Bytes(mpeg1 = true, bitrateIdx = 9, rateIdx = 0,
      frames = 5).dropRight(100)
    assert(Multimodal.tryDecodeMp3(cut).map(_.frames).contains(4))
  }

  test("tryDecodeMp3 rejects malformed input") {
    assert(Multimodal.tryDecodeMp3("not an mp3".getBytes).isEmpty)
    assert(Multimodal.tryDecodeMp3(Array.emptyByteArray).isEmpty)
    // sync bits but reserved version (b1 bits 4-3 = 01)
    assert(Multimodal.tryDecodeMp3(
      Array(0xff.toByte, 0xeb.toByte, 0x92.toByte, 0x00)).isEmpty)
    // bad bitrate index 15
    assert(Multimodal.tryDecodeMp3(
      Array(0xff.toByte, 0xfb.toByte, 0xf0.toByte, 0x00)).isEmpty)
    // bad samplerate index 3
    assert(Multimodal.tryDecodeMp3(
      Array(0xff.toByte, 0xfb.toByte, 0x9c.toByte, 0x00)).isEmpty)
    // an ID3 tag with nothing after it
    val id3only = Multimodal.mp3Bytes(mpeg1 = true, bitrateIdx = 9,
      rateIdx = 0, frames = 1, id3Size = 20).take(30)
    assert(Multimodal.tryDecodeMp3(id3only).isEmpty)
  }

  test("tryDecodeFlac unpacks STREAMINFO exactly (with and without padding)") {
    val b = Multimodal.flacBytes(sampleRate = 44100, channels = 2,
      bitsPerSample = 16, totalSamples = 441000, dataLen = 123)
    assert(b.length == 42 + 123)
    assert(Multimodal.tryDecodeFlac(b).contains(
      FlacMeta(44100, 2, 16, 441000, 10000)))

    val padded = Multimodal.flacBytes(96000, 8, 24, 12345678L,
      dataLen = 7, withPadding = true)
    assert(padded.length == 42 + 10 + 7)
    assert(Multimodal.tryDecodeFlac(padded).contains(
      FlacMeta(96000, 8, 24, 12345678L, 12345678L * 1000 / 96000)))

    // 36-bit total-samples extremes survive the unpack
    val big = Multimodal.flacBytes(8000, 1, 32, (1L << 36) - 1)
    assert(Multimodal.tryDecodeFlac(big).map(_.totalSamples)
      .contains((1L << 36) - 1))
  }

  test("tryDecodeFlac rejects malformed input") {
    assert(Multimodal.tryDecodeFlac("not a flac".getBytes).isEmpty)
    assert(Multimodal.tryDecodeFlac(Array.emptyByteArray).isEmpty)
    // magic but truncated before the STREAMINFO body completes
    val b = Multimodal.flacBytes(44100, 2, 16, 1000)
    assert(Multimodal.tryDecodeFlac(b.take(20)).isEmpty)
    // a zero sample rate must not divide-by-zero
    val zeroRate = b.clone()
    // packed field starts at byte 4+4+10 = 18: rate(20 bits) first
    zeroRate(18) = 0; zeroRate(19) = 0
    zeroRate(20) = (zeroRate(20) & 0x0f).toByte
    assert(Multimodal.tryDecodeFlac(zeroRate).isEmpty)
  }

  test("probeMedia routes wav/flac/mp3 by content, garbage to stub") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", Multimodal.wavBytes(8000, 1, 16, 800)),
      Multimodal.MediaRecord(2L, "audio", Multimodal.flacBytes(48000, 2, 16, 4800)),
      Multimodal.MediaRecord(3L, "audio",
        Multimodal.mp3Bytes(mpeg1 = true, bitrateIdx = 9, rateIdx = 1, frames = 3)),
      Multimodal.MediaRecord(4L, "audio", "nope".getBytes)).toDF()
    val got = Multimodal.probeMedia(spark, media).collect()
      .map(p => p.media_id -> p).toMap
    assert(got(1L).codec == "wav" && got(1L).duration_ms == 100)
    assert(got(2L).codec == "flac" && got(2L).duration_ms == 100 &&
      got(2L).sample_rate == 48000)
    assert(got(3L).codec == "mp3" && got(3L).sample_rate == 48000 &&
      got(3L).frames == 3 && got(3L).duration_ms == 3L * 1152 * 1000 / 48000)
    assert(got(4L).codec == "stub")
  }

  test("frameSampleExact: k larger than the frame count dedups indices") {
    import spark.implicits._
    val sizes = Seq(12, 13)
    val b = Multimodal.mp4BytesChunked(600, 100, sizes, seed = 8L)
    val got = Multimodal.frameSampleExact(spark,
      Seq(Multimodal.MediaRecord(1L, "video", b)).toDF(), k = 6)
      .collect().map(_.getAs[Long]("frame_idx")).sorted.toSeq
    assert(got == Seq(0L, 1L), "2 frames, k=6 → exactly indices 0 and 1")
  }
}
