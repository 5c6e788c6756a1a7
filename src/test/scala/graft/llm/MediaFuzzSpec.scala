package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Corruption-robustness properties for the byte-walking media parsers
  * (r12): a 100 TB media corpus WILL contain truncated uploads, bit
  * rot, and adversarial headers, and a single throwing row must never
  * kill an executor task — the decode contract is None/skip, never an
  * exception. Pure JVM (no Spark session needed): the parsers are
  * plain functions over byte arrays.
  */
class MediaFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(1234)

  private def validPayloads(): Seq[Array[Byte]] = Seq(
    Multimodal.syntheticAvi(640, 360, 25, 250),
    Multimodal.syntheticAvi(64, 48, 10, 9, codec = "H264"),
    Multimodal.syntheticAviRgb(6, 4, 10,
      Seq((1, 2, 3), (200, 100, 50), (255, 255, 255))),
    Multimodal.syntheticAviMjpg(16, 8, 5, Seq((10, 20, 30), (40, 50, 60))),
    Multimodal.syntheticMp4(1280, 720, timescale = 90000,
      durationTicks = 900000L, frames = 300),
    Multimodal.syntheticWavPcm16(8000,
      Array.tabulate(1200)(i => (if (i % 2 == 0) 500 else -500).toShort)))

  private def mutate(b: Array[Byte]): Array[Byte] = rnd.nextInt(4) match {
    case 0 => // truncate at a random point
      b.take(rnd.nextInt(b.length + 1))
    case 1 => // flip 1-16 random bytes
      val m = b.clone()
      (0 until 1 + rnd.nextInt(16)).foreach(_ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      m
    case 2 => // stomp a random 4-byte size/tag field with extreme values
      val m = b.clone()
      val off = rnd.nextInt(math.max(1, m.length - 4))
      val v = Seq(0xffffffff, 0x7fffffff, 0x80000000, 0)(rnd.nextInt(4))
      m(off) = (v & 0xff).toByte; m(off + 1) = ((v >> 8) & 0xff).toByte
      m(off + 2) = ((v >> 16) & 0xff).toByte
      m(off + 3) = ((v >> 24) & 0xff).toByte
      m
    case _ => // splice two payloads at random cut points
      val other = validPayloads()(rnd.nextInt(6))
      b.take(rnd.nextInt(b.length + 1)) ++
        other.drop(rnd.nextInt(other.length + 1))
  }

  test("media parsers never throw on corrupted containers (500 mutations each)") {
    val seeds = validPayloads()
    (0 until 500).foreach { i =>
      val payload = mutate(seeds(i % seeds.length))
      // every parser must return cleanly: Option/None, never a throw
      // (Try-wrapped internally; this pins that contract)
      Multimodal.videoMeta(payload)
      Multimodal.videoFramesRgb(payload)
      Multimodal.decodeImage(payload)
      Multimodal.decodeAudio(payload)
    }
  }

  test("truncated BI_RGB AVI drops the cut frame instead of zero-padding it") {
    // r12 ADVICE: a truncated file whose LIST header still declares the
    // full movi size admitted the cut chunk, and copyOfRange zero-padded
    // it into a full-length, silently corrupt frame (MJPG was protected
    // by the JPEG decode failing; BI_RGB has no decode step to object).
    val full = Multimodal.syntheticAviRgb(6, 4, 10,
      Seq((1, 2, 3), (200, 100, 50), (255, 255, 255)))
    val intact = Multimodal.videoFramesRgb(full).get._3.map(_._1)
    assert(intact == Seq(0, 1, 2))
    // cut into the LAST frame's pixel data (w=6 ⇒ stride 20, frame 80 B)
    val truncated = full.take(full.length - 10)
    Multimodal.videoFramesRgb(truncated) match {
      case Some((w, h, frames)) =>
        assert(w == 6 && h == 4)
        assert(frames.map(_._1) == Seq(0, 1),
          s"truncated frame surfaced: ${frames.map(_._1)}")
      case None => // acceptable: fully rejecting the truncated container
    }
  }

  test("decoded frames from corrupted AVIs are always well-formed when present") {
    val seed = Multimodal.syntheticAviRgb(6, 4, 10,
      Seq((1, 2, 3), (200, 100, 50), (255, 255, 255)))
    val mjpgSeed = Multimodal.syntheticAviMjpg(16, 8, 5,
      Seq((10, 20, 30), (40, 50, 60)))
    (0 until 300).foreach { i =>
      val payload = mutate(if (i % 2 == 0) seed else mjpgSeed)
      Multimodal.videoFramesRgb(payload).foreach { case (w, h, frames) =>
        // dimensions positive-or-empty, every surfaced frame's pixel
        // array exactly w*h*3, indices strictly increasing
        assert(frames.isEmpty || (w > 0 && h > 0))
        frames.foreach { case (_, px) => assert(px.length == w * h * 3) }
        val idxs = frames.map(_._1)
        assert(idxs == idxs.sorted && idxs.distinct == idxs)
      }
    }
  }
}
