package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** PNG codec against the round-trip law on random images: any
  * (dims, color type, pixel bytes, per-row filter choice) must encode
  * to a container that (a) our decoder reconstructs byte-exactly and
  * (b) the JDK's independent ImageIO decoder reads to the same
  * pixels — so a symmetric encoder/decoder bug cannot survive, for
  * ANY filter pattern, not just the fixture's row-cycling one.
  * No Spark session needed: the codec is plain JVM code.
  */
object PngProps extends Properties("png") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  private val img: Gen[(Int, Int, Int, Long, Int)] = for {
    w <- Gen.chooseNum(1, 13)
    h <- Gen.chooseNum(1, 11)
    ct <- Gen.oneOf(2, 6)
    seed <- Gen.chooseNum(0L, 1000000L)
    filterSeed <- Gen.chooseNum(0, 1 << 20)
  } yield (w, h, ct, seed, filterSeed)

  property("encode->decode round-trips pixels for any filter pattern") =
    forAll(img) { case (w, h, ct, seed, filterSeed) =>
      val bpp = if (ct == 2) 3 else 4
      val px = Array.tabulate(w * h * bpp)(j =>
        ((seed * 31 + j * 131) % 256).toByte)
      val filterOf = (y: Int) => ((filterSeed >> (y % 10)) % 5 + 5) % 5
      val enc = Multimodal.encodePng(w, h, ct, px, filterOf)
      val (gw, gh, gct, got) = Multimodal.pngPixels(1L, enc)
      gw == w && gh == h && gct == ct && got.sameElements(px)
    }

  property("ImageIO agrees pixel-for-pixel (independent decoder)") =
    forAll(img) { case (w, h, ct, seed, filterSeed) =>
      val bpp = if (ct == 2) 3 else 4
      val px = Array.tabulate(w * h * bpp)(j =>
        ((seed * 17 + j * 97) % 256).toByte)
      val filterOf = (y: Int) => ((filterSeed >> (y % 10)) % 5 + 5) % 5
      val enc = Multimodal.encodePng(w, h, ct, px, filterOf)
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(enc))
      bi != null && bi.getWidth == w && bi.getHeight == h &&
        (0 until w * h).forall { p =>
          val argb = bi.getRGB(p % w, p / w)
          val o = p * bpp
          ((argb >> 16) & 255) == (px(o) & 255) &&
            ((argb >> 8) & 255) == (px(o + 1) & 255) &&
            (argb & 255) == (px(o + 2) & 255) &&
            (bpp == 3 || ((argb >> 24) & 255) == (px(o + 3) & 255))
        }
    }

  property("resample WAV round-trips at the identity rate") =
    forAll(for {
      n <- Gen.chooseNum(1, 40)
      ch <- Gen.oneOf(1, 2)
      seed <- Gen.chooseNum(0L, 99999L)
    } yield (n, ch, seed)) { case (n, ch, seed) =>
      val samples = Array.tabulate(n * ch)(i =>
        ((seed * 7919 + i * 104729) % 65536 - 32768).toShort)
      val wav = Multimodal.encodeWav(8000, ch, samples)
      val same = Multimodal.resampleWavBytes(wav, 8000)
      val m = Multimodal.parseWav(1L, same)
      // identity rate: floor mapping is i -> i, bytes preserved
      m.n_samples == n.toLong * ch &&
        m.sum_abs == samples.map(s => math.abs(s.toLong)).sum
    }
}
