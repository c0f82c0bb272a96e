package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{Mp4Meta, WavMeta}

/** Seeded randomized invariants for the round-5 container parsers:
  * build→parse round-trips across the parameter space, and TOTALITY —
  * a parser fed arbitrary bytes (random garbage, truncations,
  * bit-flips of valid files) must return None or a value, never throw
  * into the Spark task (the executor-side contract every
  * `mapPartitions` kernel here relies on).
  */
class Round5PropertySpec extends AnyFunSuite {

  test("wav round-trip holds across the parameter space") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val rate = 1 + rnd.nextInt(192000)
      val channels = 1 + rnd.nextInt(8)
      val bits = Seq(8, 16, 24, 32)(rnd.nextInt(4))
      val frames = rnd.nextInt(5000)
      val parsed = Multimodal.tryDecodeWav(
        Multimodal.wavBytes(rate, channels, bits, frames))
      val expectMs = frames.toLong * 1000L / rate
      assert(parsed.contains(WavMeta(rate, channels, bits, expectMs)),
        s"seed=$seed rate=$rate ch=$channels bits=$bits frames=$frames got $parsed")
    }
  }

  test("mp4 round-trip holds across the parameter space and both mvhd versions") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val version = seed % 2
      val timescale = 1 + rnd.nextInt(1000000)
      // v0 stores duration as u32; stay within it there
      val duration =
        if (version == 0) rnd.nextLong(1L << 32) else rnd.nextLong(1L << 50)
      val frames = rnd.nextInt(1 << 20)
      val parsed = Multimodal.tryDecodeMp4(
        Multimodal.mp4Bytes(timescale, duration, frames, version))
      val expect = Mp4Meta(timescale, duration * 1000L / timescale, frames)
      assert(parsed.contains(expect),
        s"seed=$seed v=$version ts=$timescale dur=$duration got $parsed")
    }
  }

  test("parsers are total: garbage, truncations, and bit-flips never throw") {
    val valid = Seq(
      Multimodal.wavBytes(44100, 2, 16, 500),
      Multimodal.mp4Bytes(90000, 123456L, 240, 1),
      Multimodal.pngBytes(16, 9, 42L))
    def exercise(b: Array[Byte]): Unit = {
      Multimodal.tryDecodeWav(b)
      Multimodal.tryDecodeMp4(b)
      () // any throw fails the test
    }
    for (seed <- 1 to 20) {
      val rnd = new Random(seed)
      exercise(Array.fill(rnd.nextInt(2000))(rnd.nextInt().toByte))
      valid.foreach { v =>
        exercise(v.take(rnd.nextInt(v.length))) // truncation at any point
        val flipped = v.clone()
        for (_ <- 0 until 8)
          flipped(rnd.nextInt(flipped.length)) =
            (flipped(rnd.nextInt(flipped.length)) ^ (1 << rnd.nextInt(8))).toByte
        exercise(flipped)
      }
    }
  }

  test("png fixture means match the closed-form ramp on random shapes") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val (w, h, s) = (1 + rnd.nextInt(40), 1 + rnd.nextInt(30), rnd.nextInt(10000).toLong)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.pngBytes(w, h, s)))
      assert(img.getWidth == w && img.getHeight == h)
      var (sr, expected) = (0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        sr += (img.getRGB(x, y) >> 16) & 0xff
        expected += (7 * x + 13 * y + s) % 256
      }
      assert(sr == expected, s"seed=$seed w=$w h=$h")
    }
  }
}
