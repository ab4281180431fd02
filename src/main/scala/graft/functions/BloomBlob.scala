package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter blob codec, semantics modelled on the reference
  * (dazzleduck `src/scalar_function/bloom_filter.cpp:14-50`): a 16-byte
  * little-endian header {magic 'BLOM', num_bits, num_hash_funcs, reserved}
  * followed by the bit array. Size = clamp(n * bitsPerElement, 64, 8M bits)
  * rounded up to a whole byte; k bit positions derived from a single 64-bit
  * base hash as `h_i = base + i*(base >>> 16) + i*i`, `bit = h_i mod bits`
  * (unsigned).
  *
  * The base hash is FNV-1a 64 over the UTF-8 bytes — deterministic across
  * JVMs and executors, cheap, and sufficient for membership prefilters.
  * (The reference uses DuckDB's internal 64-bit hash; the blob is engine-
  * internal in both systems, so only the layout contract matters.)
  */
object BloomBlob {
  final val Magic = 0x424C4F4D
  final val HeaderBytes = 16
  final val MinBits = 64
  final val MaxBits = 8 * 1024 * 1024
  final val DefaultBitsPerElement = 10
  final val DefaultNumHashFuncs = 3

  def hash64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  @inline private def bitPos(baseHash: Long, i: Int, numBits: Int): Int = {
    val h = baseHash + i.toLong * (baseHash >>> 16) + i.toLong * i
    java.lang.Long.remainderUnsigned(h, numBits.toLong).toInt
  }

  def sizeBits(numElements: Int, bitsPerElement: Int): Int = {
    val n = math.max(numElements, 1)
    val raw = math.min(math.max(n.toLong * bitsPerElement, MinBits.toLong), MaxBits.toLong).toInt
    ((raw + 7) / 8) * 8 // round up to whole bytes
  }

  /** Build a blob from UTF-8 element byte arrays (nulls already dropped). */
  def create(elements: Iterable[Array[Byte]], numElements: Int,
             bitsPerElement: Int, numHashFuncs: Int): Array[Byte] = {
    val bpe = math.min(math.max(bitsPerElement, 1), 64)
    val k = math.min(math.max(numHashFuncs, 1), 16)
    val numBits = sizeBits(numElements, bpe)
    val numBytes = numBits / 8
    val blob = new Array[Byte](HeaderBytes + numBytes)
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic).putInt(numBits).putInt(k).putInt(0)
    elements.foreach { e =>
      val base = hash64(e)
      var i = 0
      while (i < k) {
        val p = bitPos(base, i, numBits)
        blob(HeaderBytes + p / 8) = (blob(HeaderBytes + p / 8) | (1 << (p % 8))).toByte
        i += 1
      }
    }
    blob
  }

  /** Returns None if the blob is malformed (mirrors the reference's
    * NULL-on-invalid behavior), Some(mayContain) otherwise. */
  def mayContain(blob: Array[Byte], value: UTF8String): Option[Boolean] = {
    if (blob.length < HeaderBytes) return None
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt(0)
    val numBits = bb.getInt(4)
    val k = bb.getInt(8)
    if (magic != Magic || numBits <= 0 || blob.length < HeaderBytes + (numBits + 7) / 8)
      return None
    val base = hash64(value.getBytes)
    var i = 0
    while (i < k) {
      val p = bitPos(base, i, numBits)
      if ((blob(HeaderBytes + p / 8) & (1 << (p % 8))) == 0) return Some(false)
      i += 1
    }
    Some(true)
  }
}
