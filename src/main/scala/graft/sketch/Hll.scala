package graft.sketch

/** From-scratch HyperLogLog (Flajolet et al. 2007) over pre-hashed 64-bit
  * values. Dense byte-per-register layout; merge = register-wise max
  * (associative, commutative, idempotent).
  *
  * Reference analogue: the per-group chopper HLL cardinality sketch the
  * layout optimizer consumes (/root/reference/src/main/taxor_build.cpp:324,
  * 343, 351, 389, 409, 417). Published bound: relative standard error
  * ≤ 1.04/sqrt(m) with m = 2^p registers; small range uses linear counting.
  *
  * Layout: [0]=type(1) [1]=ver(1) [2]=p [3..3+m) registers (1 byte each).
  */
object Hll {
  val TYPE: Byte = 1
  val VER: Byte = 1
  val HEADER = 3

  def m(p: Int): Int = 1 << p

  def empty(p: Int): Array[Byte] = {
    require(p >= 4 && p <= 18, s"hll p out of range: $p")
    val a = new Array[Byte](HEADER + m(p))
    a(0) = TYPE; a(1) = VER; a(2) = p.toByte
    a
  }

  @inline def precision(buf: Array[Byte]): Int = buf(2).toInt

  /** Standard relative-error bound for this sketch's register count. */
  def stdError(p: Int): Double = 1.04 / math.sqrt(m(p).toDouble)

  @inline def update(buf: Array[Byte], hash: Long): Unit = {
    val p = buf(2).toInt
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    val rank =
      (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if ((buf(HEADER + idx) & 0xff) < rank) buf(HEADER + idx) = rank.toByte
  }

  /** In-place merge of `b` into `a`; register-wise max. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a(2) == b(2), s"hll precision mismatch: ${a(2)} vs ${b(2)}")
    var i = HEADER
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  def estimate(buf: Array[Byte]): Double = {
    val p = buf(2).toInt
    val mm = m(p)
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < mm) {
      val r = buf(HEADER + i) & 0xff
      invSum += 1.0 / java.lang.Double.longBitsToDouble((1023L + r) << 52)
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha = mm match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / mm)
    }
    val e = alpha * mm.toDouble * mm.toDouble / invSum
    // Small-range correction: linear counting while registers stay sparse.
    if (e <= 2.5 * mm && zeros > 0) mm * math.log(mm.toDouble / zeros)
    else e
  }
}
