package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Round-7 multimodal: VBR-aware MP3 probing. A Xing/Info or VBRI
  * header in the first frame short-circuits the probe to O(1) — the
  * declared frame count gives frames/duration and the declared byte
  * total gives the AVERAGE bitrate — closing the round-6 gap where
  * the CBR-style walk misestimated duration whenever only a stream
  * head was available and reported the first frame's bitrate on VBR
  * streams. Headerless streams still walk, frame-by-frame, off each
  * frame's own length.
  */
class Round7OpsSpec extends AnyFunSuite {

  test("Xing header short-circuits: declared frames, duration, average bitrate") {
    val b = Multimodal.mp3BytesVbr(mpeg1 = true, rateIdx = 0, audioFrames = 6,
      declaredFrames = 1000, declaredBytes = 4000000L, kind = "xing")
    val m = Multimodal.tryDecodeMp3(b).get
    assert(m.frames == 1000, "declared count, not the 7 physical frames")
    val wantDur = 1000L * 1152 * 1000 / 44100
    assert(m.durationMs == wantDur)
    assert(m.bitrateKbps == (4000000L * 8 / wantDur).toInt,
      "average bitrate from declared bytes, not the header frame's 128")
    assert(m.sampleRate == 44100 && m.channels == 2)
  }

  test("Info tag (CBR-marked LAME) and VBRI are honored identically") {
    val info = Multimodal.mp3BytesVbr(mpeg1 = true, rateIdx = 1, audioFrames = 4,
      declaredFrames = 250, declaredBytes = 900000L, kind = "info")
    val mi = Multimodal.tryDecodeMp3(info).get
    assert(mi.frames == 250 && mi.durationMs == 250L * 1152 * 1000 / 48000)

    val vbri = Multimodal.mp3BytesVbr(mpeg1 = true, rateIdx = 2, audioFrames = 4,
      declaredFrames = 777, declaredBytes = 1234567L, kind = "vbri")
    val mv = Multimodal.tryDecodeMp3(vbri).get
    assert(mv.frames == 777 && mv.durationMs == 777L * 1152 * 1000 / 32000)
    assert(mv.bitrateKbps == (1234567L * 8 / mv.durationMs).toInt)
  }

  test("MPEG2 and mono side-info offsets locate the Xing tag") {
    // MPEG2 stereo: side info 17 → tag at 21
    val m2 = Multimodal.mp3BytesVbr(mpeg1 = false, rateIdx = 0, audioFrames = 3,
      declaredFrames = 99, declaredBytes = 50000L, kind = "xing")
    assert(Multimodal.tryDecodeMp3(m2).get.frames == 99)
    // MPEG1 mono: side info 17; MPEG2 mono: side info 9
    val mono1 = Multimodal.mp3BytesVbr(mpeg1 = true, rateIdx = 0, audioFrames = 3,
      declaredFrames = 88, declaredBytes = 40000L, kind = "xing", mono = true)
    assert(Multimodal.tryDecodeMp3(mono1).get.frames == 88)
    val mono2 = Multimodal.mp3BytesVbr(mpeg1 = false, rateIdx = 1, audioFrames = 3,
      declaredFrames = 77, declaredBytes = 30000L, kind = "vbri", mono = true)
    assert(Multimodal.tryDecodeMp3(mono2).get.frames == 77)
  }

  test("ID3v2 tag ahead of the VBR header frame is skipped") {
    val b = Multimodal.mp3BytesVbr(mpeg1 = true, rateIdx = 0, audioFrames = 2,
      declaredFrames = 123, declaredBytes = 60000L, kind = "xing", id3Size = 33)
    assert(Multimodal.tryDecodeMp3(b).get.frames == 123)
  }

  test("truncated stream: declared totals come from the head alone") {
    // The 100 TB point: with a VBR header, the probe touches only the
    // FIRST frame — chop everything after it and nothing changes.
    val full = Multimodal.mp3BytesVbr(mpeg1 = true, rateIdx = 0, audioFrames = 6,
      declaredFrames = 500, declaredBytes = 2000000L, kind = "vbri")
    val headerFrameLen = 144 * 128000 / 44100 // spf/8 * kbps*1000 / rate = 417
    val headOnly = full.take(headerFrameLen)
    val m = Multimodal.tryDecodeMp3(headOnly).get
    assert(m.frames == 500 && m.durationMs == 500L * 1152 * 1000 / 44100)
  }

  test("headerless alternating-bitrate stream: the walk stays correct") {
    val b = Multimodal.mp3BytesVbr(mpeg1 = true, rateIdx = 0, audioFrames = 5,
      declaredFrames = 1, declaredBytes = 1L, kind = "none")
    val m = Multimodal.tryDecodeMp3(b).get
    // silent lead frame + 5 audio frames, each length from its own header
    assert(m.frames == 6)
    assert(m.durationMs == 6L * 1152 * 1000 / 44100)
    assert(m.bitrateKbps == 128, "walk reports the first frame's bitrate")
  }

  test("Xing without the frame-count flag falls back to the walk") {
    val b = Multimodal.mp3BytesVbr(mpeg1 = true, rateIdx = 0, audioFrames = 4,
      declaredFrames = 1000, declaredBytes = 4000000L, kind = "xing")
    // flags word sits 4 bytes after the tag: frames|bytes = 3 → bytes-only = 2
    val i = indexOfAscii(b, "Xing")
    b(i + 7) = 2
    val m = Multimodal.tryDecodeMp3(b).get
    assert(m.frames == 5, "no declared count → walk the 5 physical frames")
  }

  test("hostile declared counts are rejected, not trusted") {
    def patched(v: Long): Array[Byte] = {
      val b = Multimodal.mp3BytesVbr(mpeg1 = true, rateIdx = 0, audioFrames = 3,
        declaredFrames = 10, declaredBytes = 1000L, kind = "xing")
      val i = indexOfAscii(b, "Xing")
      b(i + 8) = ((v >> 24) & 0xff).toByte; b(i + 9) = ((v >> 16) & 0xff).toByte
      b(i + 10) = ((v >> 8) & 0xff).toByte; b(i + 11) = (v & 0xff).toByte
      b
    }
    // zero and over-cap counts → the walk's physical 4 frames
    assert(Multimodal.tryDecodeMp3(patched(0L)).get.frames == 4)
    assert(Multimodal.tryDecodeMp3(patched((1L << 20) + 1)).get.frames == 4)
    // garbage input still refuses entirely
    assert(Multimodal.tryDecodeMp3("not an mp3".getBytes).isEmpty)
  }

  test("sampled grounding tracks exact group Jaccard at sf0.01, deterministically") {
    import graft.operators.Dedup
    val spark = Sessions.local(4)
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    def collectPairs(grounding: Dedup.Grounding, valueCol: String) =
      Dedup.groupMinhashJaccard(docs, "lang", "doc_id", "text",
          k = 16, shingleN = 3, grounding = grounding)
        .select("ga", "gb", valueCol).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap

    val exact = collectPairs(Dedup.ExactGrounding, "exact_jaccard")
    val sampled = collectPairs(Dedup.SampledGrounding(1, 4), "sampled_jaccard")
    assert(exact.keySet == sampled.keySet, "same group pairs in both modes")
    assert(exact.nonEmpty)
    exact.foreach { case (pair, ej) =>
      val sj = sampled(pair)
      assert(math.abs(sj - ej) <= 0.05,
        s"$pair: sampled $sj strays from exact $ej beyond the 1/4-coin envelope")
    }
    // the coin is content-hashed: a re-run grounds to the SAME values
    val again = collectPairs(Dedup.SampledGrounding(1, 4), "sampled_jaccard")
    assert(again == sampled, "sampled grounding must be deterministic")
  }

  test("sampled grounding MEASURABLY shrinks the grounding shuffle vs exact") {
    import graft.operators.Dedup
    val spark = Sessions.local(4)
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    def shuffled(g: Dedup.Grounding): Long = {
      val (_, m) = Metrics.capture(spark) {
        Dedup.groupMinhashJaccard(docs, "lang", "doc_id", "text",
          k = 16, shingleN = 3, grounding = g).collect()
      }
      m.shuffleWriteBytes
    }
    val exact = shuffled(Dedup.ExactGrounding)
    val sampled = shuffled(Dedup.SampledGrounding(1, 4))
    // both runs share the signature aggregation; the delta is the
    // grounding distinct+join, which the 1/4 coin must cut — measured
    // bytes, not a plan-string promise
    assert(sampled < exact * 7 / 10,
      s"sampled grounding shuffled $sampled B vs exact $exact B")
  }

  private def indexOfAscii(bytes: Array[Byte], s: String): Int = {
    val t = s.getBytes("US-ASCII")
    val i = bytes.indices.indexWhere(i => i + t.length <= bytes.length &&
      t.indices.forall(j => bytes(i + j) == t(j)))
    assert(i >= 0, s"fixture must contain '$s'")
    i
  }
}
