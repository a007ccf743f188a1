package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The BMP header/row walker's contract: exact synth → parse
  * round-trip, bottom-up row order actually honored, padded stride
  * actually stepped, BGR storage order swapped back, loud failure on
  * malformed or unsupported containers.
  */
class BmpSpec extends AnyFunSuite {

  test("synth → parse round-trips dimensions and exact channel sums") {
    // 3 chars → 1 pixel used + 9 zero pixels on a 10×1 canvas
    val m = Bmp.parse(Bmp.synth("abc"))
    assert(m.width === 10)
    assert(m.height === 1)
    assert(m.nPx === 10L)
    // pixel 0: R='a'=97, G='b'=98, B='c'=99; rest zero
    assert(m.sumR === 97L)
    assert(m.sumG === 98L)
    assert(m.sumB === 99L)
    assert(m.topRowSum === 97L + 98 + 99)
    assert(m.lumaSum === 299L * 97 + 587L * 98 + 114L * 99)
  }

  test("bottom-up row order: the image-space top row is stored last in the file") {
    // 31 chars → 11 pixels → height 2; top row = pixels 0..9,
    // bottom row = pixel 10 (+ 9 zero pads)
    val text = "abcdefghijklmnopqrstuvwxyzABCDE" // 31 chars
    val m = Bmp.parse(Bmp.synth(text))
    assert(m.height === 2)
    assert(m.nPx === 20L)
    val bytes = text.map(_.toInt)
    val topExpected = bytes.take(30).sum // pixels 0..9 = bytes 0..29
    assert(m.topRowSum === topExpected.toLong)
    // a parser that forgot bottom-up order would read the file's first
    // row (image BOTTOM row: pixel 10 = bytes 30.. plus zero pad)
    assert(m.topRowSum !== (bytes.drop(30).sum).toLong)
  }

  test("row stride is padded to 4 bytes and the file layout accounts for it") {
    val one = Bmp.synth("abc") // height 1
    // 54-byte headers + one 32-byte padded row (10 px × 3 = 30 → 32)
    assert(one.length === 54 + 32)
    val two = Bmp.synth("abcdefghijklmnopqrstuvwxyzABCDE") // height 2
    assert(two.length === 54 + 64)
  }

  test("channel storage order is BGR: the file's first pixel bytes are B,G,R") {
    val bmp = Bmp.synth("abc")
    // bottom-up with height 1 → file row 0 IS the image row;
    // stored as B='c', G='b', R='a'
    assert((bmp(54) & 0xff) === 'c'.toInt)
    assert((bmp(55) & 0xff) === 'b'.toInt)
    assert((bmp(56) & 0xff) === 'a'.toInt)
  }

  test("the declared pixel-array offset is honored, not hardcoded") {
    val base = Bmp.synth("hello world of bitmaps")
    val ref = Bmp.parse(base)
    // splice 8 junk bytes between the headers and the pixel array,
    // bumping the declared offset from 54 to 62
    val out = new Array[Byte](base.length + 8)
    System.arraycopy(base, 0, out, 0, 54)
    System.arraycopy(base, 54, out, 62, base.length - 54)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(2, out.length) // file size
    bb.putInt(10, 62)        // pixel-array offset
    assert(Bmp.parse(out) === ref)
  }

  test("malformed containers fail loudly") {
    intercept[IllegalArgumentException](Bmp.parse("definitely not a bmp".getBytes))
    // truncated pixel array
    val b = Bmp.synth("abcdef")
    intercept[IllegalArgumentException](Bmp.parse(b.take(60)))
    // unsupported bpp
    val c = Bmp.synth("abc")
    val bb = java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(28, 8.toShort)
    intercept[IllegalArgumentException](Bmp.parse(c))
    // non-ASCII synth input must error, not alias
    intercept[IllegalArgumentException](Bmp.synth("café"))
  }
}
