package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Blob-codec spec mirroring the reference layout contract
  * (/root/reference/src/scalar_function/bloom_filter.cpp:14-50) plus
  * seeded-random no-false-negative property tests. */
class BloomBlobSpec extends AnyFunSuite {

  private def blob(elems: Seq[String], bpe: Int = 10, k: Int = 3): Array[Byte] =
    BloomBlob.create(elems.map(_.getBytes("UTF-8")), elems.size, bpe, k)

  private def contains(b: Array[Byte], v: String): Option[Boolean] =
    BloomBlob.mayContain(b, UTF8String.fromString(v))

  test("header layout: magic, bits, hash count, little-endian") {
    val b = blob(Seq("a", "b", "c"))
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(0) === BloomBlob.Magic)
    assert(bb.getInt(4) === BloomBlob.sizeBits(3, 10))
    assert(bb.getInt(8) === 3)
    assert(b.length === BloomBlob.HeaderBytes + bb.getInt(4) / 8)
  }

  test("size clamps: minimum 64 bits, max 8M bits, byte-rounded") {
    assert(BloomBlob.sizeBits(1, 1) === 64)
    assert(BloomBlob.sizeBits(0, 10) === 64)
    assert(BloomBlob.sizeBits(10 * 1024 * 1024, 64) === BloomBlob.MaxBits)
    assert(BloomBlob.sizeBits(100, 10) % 8 === 0)
  }

  test("size grows with bits_per_element (reference bloom_filter.test)") {
    val small = blob((1 to 19).map(_.toString), bpe = 10)
    val large = blob((1 to 19).map(_.toString), bpe = 64)
    assert(small.length < large.length)
  }

  test("no false negatives (seeded property sweep)") {
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val n = 1 + rnd.nextInt(200)
      val elems = List.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(30)).mkString)
      val bpe = 1 + rnd.nextInt(30)
      val k = 1 + rnd.nextInt(8)
      val b = blob(elems, bpe, k)
      elems.foreach(e => assert(contains(b, e) === Some(true)))
    }
  }

  test("definite miss on disjoint values") {
    val b = blob((1 to 100).map(i => s"item_$i"), bpe = 10, k = 3)
    // with 10 bits/element the FP rate is ~1%; over 50 probes at least
    // one definite miss must appear (probability of all-FP ~ 1e-100)
    val misses = (1 to 50).count(i => contains(b, s"other_$i") === Some(false))
    assert(misses > 0)
    assert(contains(b, "item_50") === Some(true))
  }

  test("malformed blob → None (reference NULL-on-invalid)") {
    assert(BloomBlob.mayContain(Array[Byte](1, 2, 3), UTF8String.fromString("x")).isEmpty)
    val bad = blob(Seq("a")).clone()
    bad(0) = 'X'.toByte // corrupt magic
    assert(BloomBlob.mayContain(bad, UTF8String.fromString("a")).isEmpty)
  }

  test("bits_per_element and num_hash clamp to sane ranges") {
    val b = BloomBlob.create(Seq("a".getBytes), 1, bitsPerElement = -5, numHashFuncs = 1000)
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(4) === 64) // clamped bpe=1 → min 64 bits
    assert(bb.getInt(8) === 16) // clamped k=16
    assert(contains(b, "a") === Some(true))
  }
}
