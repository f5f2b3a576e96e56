package graft.sketch

/** Minimal growable primitive double array — replaces ArrayBuffer[Double]
  * inside the quantile sketches (generic collections box every update;
  * sketches sit on the per-row hot path of the aggregation). */
final class DoubleBuf(initialCapacity: Int = 16) extends Serializable {
  private var arr = new Array[Double](math.max(4, initialCapacity))
  private var n = 0

  def size: Int = n
  def isEmpty: Boolean = n == 0
  def nonEmpty: Boolean = n != 0
  def apply(i: Int): Double = arr(i)
  def update(i: Int, v: Double): Unit = arr(i) = v

  def add(v: Double): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(n) = v
    n += 1
  }

  def addAll(o: DoubleBuf): Unit = {
    if (n + o.n > arr.length)
      arr = java.util.Arrays.copyOf(arr, math.max(arr.length * 2, n + o.n))
    System.arraycopy(o.arr, 0, arr, n, o.n)
    n += o.n
  }

  def clear(): Unit = n = 0

  def foreach(f: Double => Unit): Unit = {
    var i = 0
    while (i < n) { f(arr(i)); i += 1 }
  }

  def toArray: Array[Double] = java.util.Arrays.copyOf(arr, n)

  /** Sorted copy. */
  def sortedArray: Array[Double] = {
    val a = toArray
    java.util.Arrays.sort(a)
    a
  }

  def last: Double = arr(n - 1)
}

object DoubleBuf {
  def apply(): DoubleBuf = new DoubleBuf()
}
