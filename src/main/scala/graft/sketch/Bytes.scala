package graft.sketch

/** Big-endian primitive codec over raw byte arrays.
  *
  * All sketches serialize to a fixed-layout `Array[Byte]` (version byte +
  * params + payload) so that scalar probe expressions can read them without
  * object allocation — the Spark analogue of the reference's versioned cereal
  * blobs (/root/reference/src/main/index.hpp:208-244).
  */
object Bytes {
  @inline def putInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte
    a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte
    a(off + 3) = v.toByte
  }
  @inline def getInt(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) |
      ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)

  @inline def putLong(a: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { a(off + i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
  }
  @inline def getLong(a: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (a(off + i) & 0xffL); i += 1 }
    v
  }
  @inline def putDouble(a: Array[Byte], off: Int, v: Double): Unit =
    putLong(a, off, java.lang.Double.doubleToLongBits(v))
  @inline def getDouble(a: Array[Byte], off: Int): Double =
    java.lang.Double.longBitsToDouble(getLong(a, off))

  /** Murmur3 64-bit finalizer — decorrelates derived hash streams from the
    * incoming xxhash64 values (reference analogue: murmur-style finalizer at
    * /root/reference/src/main/hashutil.hpp:50-57 and independent seeds per
    * sketch, hashutil.hpp:43-48).
    */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }
}
