package graft.multimodal

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** [[Gif]] (q148) — hand-written GIF89a/LZW encoder vs the JDK's real
  * LZW decoder, and the palette-aware gray reduction.
  */
class GifSpec extends AnyFunSuite {

  private def expectStats(w: Int, h: Int, pixel: Int => Int)
      : (Long, Int, Int, Long) = {
    val vs = (0 until w * h).map(pixel)
    (vs.map(_.toLong).sum, vs.min, vs.max,
      vs.zipWithIndex.map { case (v, i) => i.toLong * v }.sum)
  }

  private def check(w: Int, h: Int, pixel: Int => Int): Unit = {
    val s = Gif.decode(Gif.encodeGray(w, h, pixel)).get
    val (sum, min, max, wsum) = expectStats(w, h, pixel)
    assert(s.width === w && s.height === h)
    assert(s.sum === sum && s.min === min && s.max === max)
    assert(s.wsum === wsum, "order-sensitive wsum must survive LZW")
  }

  test("round-trip at assorted sizes and patterns") {
    check(1, 1, _ => 0)
    check(1, 1, _ => 255)
    check(3, 2, i => i * 40)
    check(16, 16, i => (i * 7 + 13) % 256)   // crosses the 128 re-CLEAR
    check(64, 48, i => (i * 31) % 256)       // crosses 255-byte sub-blocks
  }

  test("all 256 gray levels survive the palette round-trip") {
    check(16, 16, i => i % 256)
  }

  test("re-CLEAR boundary is exact (127/128/129-pixel images)") {
    for (n <- Seq(127, 128, 129, 256, 257))
      check(n, 1, i => (i * 3 + 5) % 256)
  }

  test("malformed payloads are rejected, not thrown") {
    assert(Gif.decode("nope".getBytes).isEmpty)
    assert(Gif.decode(Array.empty[Byte]).isEmpty)
    val good = Gif.encodeGray(8, 8, i => i)
    assert(Gif.decode(good.take(20)).isEmpty, "truncated header")
  }

  test("a foreign encoder's GIF decodes with palette-aware luma") {
    // non-grayscale palette: entry i = (i, 255-i, i/2) — index is NOT
    // the luma, so this catches an index-as-gray shortcut
    val n = 16
    val r = Array.tabulate(n)(i => (i * 16).toByte)
    val g = Array.tabulate(n)(i => (255 - i * 16).toByte)
    val b = Array.tabulate(n)(i => (i * 8).toByte)
    val icm = new IndexColorModel(4, n, r, g, b)
    val img = new BufferedImage(8, 4, BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = img.getRaster
    for (y <- 0 until 4; x <- 0 until 8)
      raster.setSample(x, y, 0, (y * 8 + x) % n)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "gif", bos), "JDK must ship a GIF writer")
    // NOTE the ground truth is ImageIO.read of the SAME bytes, not the
    // original raster: the JDK GIF *writer* itself miswrites some
    // indexed images (observed: a row's indices shifted by +8), so
    // the invariant this pins is decoder-vs-decoder agreement through
    // the non-gray palette — which still catches an index-as-gray
    // shortcut, because here luma(idx) != idx everywhere
    val back = ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    val exp = for (y <- 0 until 4; x <- 0 until 8) yield {
      val rgb = back.getRGB(x, y)
      Codecs.pngLuma((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
    }
    val s = Gif.decode(bos.toByteArray).get
    assert(s.sum === exp.map(_.toLong).sum)
    assert(s.min === exp.min && s.max === exp.max)
    assert(exp.exists(v => v != (v & 0x0f)),
      "palette must be non-gray so index-as-gray would diverge")
  }
}
