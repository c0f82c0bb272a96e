package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{Mp4Meta, WavMeta}

/** Round-5 multimodal container parsing: real WAV/RIFF and MP4 moov
  * header walks against spec-built fixture bytes, plus the stub
  * fallback contract for payloads no parser accepts.
  */
class Round5OpsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  // ------------------------------------------------------------ WAV

  test("tryDecodeWav round-trips the fixture builder's parameters") {
    val b = Multimodal.wavBytes(sampleRate = 16000, channels = 2,
      bitsPerSample = 16, frames = 1600)
    assert(b.length == 44 + 1600 * 4) // oracle n_bytes arithmetic
    assert(Multimodal.tryDecodeWav(b).contains(WavMeta(16000, 2, 16, 100)))

    val mono8k = Multimodal.wavBytes(8000, 1, 16, 12345)
    assert(Multimodal.tryDecodeWav(mono8k)
      .contains(WavMeta(8000, 1, 16, 12345 * 1000L / 8000)))

    val b24 = Multimodal.wavBytes(44100, 2, 24, 44100)
    assert(Multimodal.tryDecodeWav(b24).contains(WavMeta(44100, 2, 24, 1000)))
  }

  test("tryDecodeWav walks word-aligned chunks (odd-size chunk before fmt)") {
    val base = Multimodal.wavBytes(22050, 1, 16, 2205)
    // splice an odd-length junk chunk between WAVE and fmt: id+size+3
    // data bytes + 1 pad byte — the walk must land on fmt afterwards
    val junk = "JUNK".getBytes ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    // patch the RIFF size (not checked by the parser, but keep it honest)
    assert(Multimodal.tryDecodeWav(spliced).contains(WavMeta(22050, 1, 16, 100)))
  }

  test("tryDecodeWav clamps a data size declared past the payload") {
    val b = Multimodal.wavBytes(8000, 1, 16, 1000) // 2000 data bytes
    val truncated = b.take(44 + 500) // only 250 frames actually present
    assert(Multimodal.tryDecodeWav(truncated)
      .contains(WavMeta(8000, 1, 16, 250 * 1000L / 8000)))
  }

  test("tryDecodeWav rejects malformed input") {
    assert(Multimodal.tryDecodeWav("not a wav at all, nope".getBytes).isEmpty)
    assert(Multimodal.tryDecodeWav(Array.emptyByteArray).isEmpty)
    // RIFF/WAVE magic but no chunks
    assert(Multimodal.tryDecodeWav(
      "RIFF....WAVE".getBytes.padTo(44, 0: Byte)).isEmpty)
    // fmt but no data chunk
    val b = Multimodal.wavBytes(8000, 1, 16, 100)
    val noData = b.take(36) // header + fmt only
    assert(Multimodal.tryDecodeWav(noData).isEmpty)
    // zero sample rate must not divide-by-zero or parse
    val zeroRate = Multimodal.wavBytes(8000, 1, 16, 4).clone()
    zeroRate(24) = 0; zeroRate(25) = 0; zeroRate(26) = 0; zeroRate(27) = 0
    assert(Multimodal.tryDecodeWav(zeroRate).isEmpty)
  }

  // ------------------------------------------------------------ MP4

  test("tryDecodeMp4 round-trips both mvhd versions and reads stsz frames") {
    val v0 = Multimodal.mp4Bytes(timescale = 1000, duration = 2500,
      frames = 60, mvhdVersion = 0)
    assert(v0.length == 249) // oracle n_bytes arithmetic
    assert(Multimodal.tryDecodeMp4(v0).contains(Mp4Meta(1000, 2500, 60)))

    val v1 = Multimodal.mp4Bytes(timescale = 90000, duration = 450000,
      frames = 120, mvhdVersion = 1)
    assert(v1.length == 261)
    assert(Multimodal.tryDecodeMp4(v1).contains(Mp4Meta(90000, 5000, 120)))
  }

  test("tryDecodeMp4 takes the VIDEO track's frames, not a leading audio track's") {
    val b = Multimodal.mp4Bytes(timescale = 1000, duration = 4000,
      frames = 96, mvhdVersion = 0, audioFramesFirst = Some(171875))
    assert(Multimodal.tryDecodeMp4(b).contains(Mp4Meta(1000, 4000, 96)),
      "a leading 'soun' trak must not donate its stsz count")
  }

  test("tryDecodeMp4 rejects a duration that would overflow the ms conversion") {
    val b = Multimodal.mp4Bytes(1000, (1L << 31) - 1, 1, mvhdVersion = 1).clone()
    // patch the v1 duration field (mvhd body offset 24) to 2^62
    val durAt = 20 + 8 + 8 + 24 // ftyp + moov hdr + mvhd hdr + body offset
    val big = java.nio.ByteBuffer.allocate(8).putLong(1L << 62).array()
    System.arraycopy(big, 0, b, durAt, 8)
    assert(Multimodal.tryDecodeMp4(b).isEmpty,
      "2^62 ticks * 1000 overflows Long — must stub, not go negative")
  }

  test("tryDecodeMp4 handles a 64-bit (largesize) moov box") {
    val b = Multimodal.mp4Bytes(600, 1200, 24, mvhdVersion = 0)
    val ftypLen = 20
    val moovLen = java.nio.ByteBuffer.wrap(b, ftypLen, 4).getInt
    val moovBody = b.slice(ftypLen + 8, ftypLen + moovLen)
    val rest = b.drop(ftypLen + moovLen)
    val wide = java.nio.ByteBuffer.allocate(16)
      .putInt(1).put("moov".getBytes).putLong(16L + moovBody.length).array()
    val rewritten = b.take(ftypLen) ++ wide ++ moovBody ++ rest
    assert(Multimodal.tryDecodeMp4(rewritten).contains(Mp4Meta(600, 2000, 24)))
  }

  test("tryDecodeMp4 rejects malformed input") {
    assert(Multimodal.tryDecodeMp4("garbage bytes".getBytes).isEmpty)
    assert(Multimodal.tryDecodeMp4(Array.emptyByteArray).isEmpty)
    // valid boxes but no moov
    val noMoov = Multimodal.mp4Bytes(600, 100, 1).take(20)
    assert(Multimodal.tryDecodeMp4(noMoov).isEmpty)
    // timescale 0: mvhd present but unusable
    val b = Multimodal.mp4Bytes(600, 100, 1).clone()
    // mvhd body starts at ftyp(20) + moov hdr(8) + mvhd hdr(8) = 36;
    // timescale is at body offset 12 for version 0
    val ts = 36 + 12
    b(ts) = 0; b(ts + 1) = 0; b(ts + 2) = 0; b(ts + 3) = 0
    assert(Multimodal.tryDecodeMp4(b).isEmpty)
    // a box whose declared size overruns the payload
    val overrun = java.nio.ByteBuffer.allocate(16)
      .putInt(9999).put("moov".getBytes).putLong(0L).array()
    assert(Multimodal.tryDecodeMp4(overrun).isEmpty)
  }

  // ---------------------------------------------- frameSampleProbed

  test("frameSampleProbed strides over the REAL stsz count; stub only unparseable") {
    import spark.implicits._
    val mp4 = Multimodal.mp4Bytes(1000, 5000, frames = 8, mvhdVersion = 0)
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", mp4),
      Multimodal.MediaRecord(2L, "video", "0123456789".getBytes), // stub: n=10 → 11 frames
      Multimodal.MediaRecord(3L, "audio", mp4)                    // non-video: excluded
    ).toDF()
    val got = Multimodal.frameSampleProbed(spark, media, k = 4)
      .collect().groupBy(_.getAs[Long]("media_id"))
    // real container: 8 frames → strided indices 0,2,4,6; flen = len/8
    val r1 = got(1L).map(r => (r.getAs[Long]("frame_idx"), r.getAs[Long]("frame_len")))
      .sortBy(_._1).toSeq
    assert(r1.map(_._1) == Seq(0L, 2L, 4L, 6L))
    assert(r1.forall(_._2 == mp4.length / 8))
    // stub fallback: n % 30 + 1 = 11 frames → indices floor(j*11/4)
    val r2 = got(2L).map(_.getAs[Long]("frame_idx")).sorted.toSeq
    assert(r2 == Seq(0L, 2L, 5L, 8L))
    assert(!got.contains(3L))
  }

  // ----------------------------------------------------- imageStats

  test("imageStats: exact channel means through the real PNG round-trip") {
    import spark.implicits._
    // 2×2, seed 0: R = (7x+13y)%256 → {0,7,13,20} mean 10.0
    //              G = (3x+5y)%256  → {0,3,5,8}   mean 4.0
    //              B = (11x+2y)%256 → {0,11,2,13} mean 6.5
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", Multimodal.pngBytes(2, 2, 0L)),
      Multimodal.MediaRecord(2L, "image", "not a png".getBytes),
      Multimodal.MediaRecord(3L, "audio", Multimodal.wavBytes(8000, 1, 16, 8))
    ).toDF()
    val got = Multimodal.imageStats(spark, media).collect()
      .map(s => s.media_id -> s).toMap
    val r1 = got(1L)
    assert(r1.codec == "image" && r1.width == 2 && r1.height == 2)
    assert(r1.mean_r == 10.0 && r1.mean_g == 4.0 && r1.mean_b == 6.5)
    // undecodable image and non-image kinds both stub, deterministic in n
    val n2 = "not a png".length
    assert(got(2L).codec == "stub" && got(2L).mean_r == (n2 % 251).toDouble)
    assert(got(3L).codec == "stub", "audio kind must not hit the pixel decoder")
  }

  test("imageStats: a header declaring more than the pixel budget stubs out") {
    import spark.implicits._
    // hand-build a PNG IHDR declaring 8192×8192 (64M px > 4M budget)
    // over a real 2×2 payload body: header-only probe accepts the
    // dims (≤16384 side cap) but the budget must refuse the decode
    val real = Multimodal.pngBytes(2, 2, 0L)
    val forged = real.clone()
    def put32(at: Int, v: Int): Unit = {
      forged(at) = (v >> 24).toByte; forged(at + 1) = (v >> 16).toByte
      forged(at + 2) = (v >> 8).toByte; forged(at + 3) = v.toByte
    }
    put32(16, 8192); put32(20, 8192) // IHDR width/height fields
    val got = Multimodal.imageStats(spark,
      Seq(Multimodal.MediaRecord(1L, "image", forged)).toDF()).collect().head
    assert(got.codec == "stub", s"forged-dimension payload must stub, got $got")
  }

  // ----------------------------------------------------- probeMedia

  test("probeMedia routes real containers to real parsers, rest to stub") {
    import spark.implicits._
    val png = {
      val img = new java.awt.image.BufferedImage(
        13, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", Multimodal.wavBytes(16000, 1, 16, 8000)),
      Multimodal.MediaRecord(2L, "video", Multimodal.mp4Bytes(1000, 3000, 72, 1)),
      Multimodal.MediaRecord(3L, "image", png),
      Multimodal.MediaRecord(4L, "audio", "i am not audio".getBytes),
      Multimodal.MediaRecord(5L, "video", "i am not video!!".getBytes)).toDF()
    val got = Multimodal.probeMedia(spark, media).collect()
      .map(p => p.media_id -> p).toMap

    assert(got(1L).codec == "wav" && got(1L).sample_rate == 16000 &&
      got(1L).channels == 1 && got(1L).duration_ms == 500)
    assert(got(2L).codec == "mp4" && got(2L).duration_ms == 3000 &&
      got(2L).frames == 72)
    assert(got(3L).codec == "image" && got(3L).width == 13 && got(3L).height == 7)
    // stub fallback: deterministic in payload length n
    val n4 = "i am not audio".length
    assert(got(4L).codec == "stub" && got(4L).duration_ms == n4 &&
      got(4L).sample_rate == n4 % 48000 && got(4L).frames == 1)
    val n5 = "i am not video!!".length
    assert(got(5L).codec == "stub" && got(5L).frames == n5 % 30 + 1)
  }
}
