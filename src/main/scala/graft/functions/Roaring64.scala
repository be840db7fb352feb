package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Roaring-style compressed 64-bit bitmap (Chambi, Lemire, Kaser, Godin —
  * "Better bitmap performance with Roaring bitmaps", Software: Practice and
  * Experience 46(5), 2016). The reference keeps its per-series dedup state in
  * exactly this structure (output/clickhouse.go:65,110-130 uses roaring64 for
  * `bmSeries`), and ClickHouse's `groupBitmap*` aggregate family is the
  * query-side twin; this is the engine-native re-implementation both build on.
  *
  * Layout: the 64-bit key space is chunked by the high 48 bits; each chunk
  * holds a container over the low 16 bits, which is either
  *  - an ARRAY container (sorted `Char` values, < 4096 entries, 2 B/value), or
  *  - a BITMAP container (1024 longs = 8 KiB, fixed) once dense.
  * That hybrid is the scale property: the serialized aggregation state is
  * `min(2·n, 8 Ki)` bytes per populated 64 Ki chunk, so a bitmap of n distinct
  * members costs at most ~2 bytes each sparse and ~0.125 bits each dense —
  * mergeable map-side, unlike `count(distinct)` whose state is the value set
  * re-shuffled at full width.
  *
  * Mutation is single-threaded per aggregation buffer (Spark's contract);
  * `or` mutates `this`, `and`/`xor` return fresh bitmaps (their results can
  * shrink container types, so in-place buys nothing).
  */
final class Roaring64 private (
    private val chunks: java.util.TreeMap[Long, Roaring64.Container]) {
  import Roaring64._

  def this() = this(new java.util.TreeMap[Long, Roaring64.Container]())

  def add(v: Long): Unit = {
    val key = v >>> 16
    val low = (v & 0xffffL).toChar
    val c = chunks.get(key)
    if (c == null) {
      val a = new ArrayContainer()
      a.add(low)
      chunks.put(key, a)
      ()
    } else {
      val c2 = c.add(low)
      if (c2 ne c) chunks.put(key, c2)
      ()
    }
  }

  def contains(v: Long): Boolean = {
    val c = chunks.get(v >>> 16)
    c != null && c.contains((v & 0xffffL).toChar)
  }

  def cardinality: Long = {
    var n = 0L
    val it = chunks.values().iterator()
    while (it.hasNext) n += it.next().cardinality
    n
  }

  /** In-place union (the `groupBitmap` / `groupBitmapOr` merge step). */
  def or(other: Roaring64): Unit = {
    val it = other.chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val mine = chunks.get(e.getKey)
      if (mine == null) chunks.put(e.getKey, e.getValue.copy())
      else chunks.put(e.getKey, mine.orWith(e.getValue))
    }
  }

  /** Fresh intersection (`groupBitmapAnd`). */
  def and(other: Roaring64): Roaring64 = {
    val out = new Roaring64()
    val it = chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val theirs = other.chunks.get(e.getKey)
      if (theirs != null) {
        val c = e.getValue.andNew(theirs)
        if (c.cardinality > 0) out.chunks.put(e.getKey, c)
      }
    }
    out
  }

  /** Fresh symmetric difference (`groupBitmapXor`). */
  def xor(other: Roaring64): Roaring64 = {
    val out = new Roaring64()
    val keys = new java.util.TreeSet[Long](chunks.keySet())
    keys.addAll(other.chunks.keySet())
    val it = keys.iterator()
    while (it.hasNext) {
      val k = it.next()
      val a = chunks.get(k)
      val b = other.chunks.get(k)
      val c =
        if (a == null) b.copy()
        else if (b == null) a.copy()
        else a.xorNew(b)
      if (c.cardinality > 0) out.chunks.put(k, c)
    }
    out
  }

  /** Ascending member iteration (chunk keys are unsigned-shifted, so order
    * is unsigned over the raw long — fine for ids, pinned by the spec). */
  def foreach(f: Long => Unit): Unit = {
    val it = chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val hi = e.getKey << 16
      e.getValue.foreach(low => f(hi | low.toLong))
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(chunks.size())
    val it = chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey)
      e.getValue.write(out)
    }
    out.flush()
    bos.toByteArray
  }
}

object Roaring64 {
  /** Array→bitmap promotion threshold: 4096 × 2 B = 8 KiB, the bitmap size —
    * beyond it the array form is strictly larger (the published constant). */
  val ArrayMax = 4096

  def deserialize(bytes: Array[Byte]): Roaring64 = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val bm = new Roaring64()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val key = in.readLong()
      bm.chunks.put(key, Container.read(in))
      i += 1
    }
    bm
  }

  sealed trait Container {
    /** Add, returning the (possibly promoted) container to store. */
    def add(v: Char): Container
    def contains(v: Char): Boolean
    def cardinality: Int
    def foreach(f: Char => Unit): Unit
    def copy(): Container
    /** In-place-ish union: returns the container to store (promotes). */
    def orWith(other: Container): Container
    def andNew(other: Container): Container
    def xorNew(other: Container): Container
    def write(out: DataOutputStream): Unit
    private[Roaring64] def toWords: Array[Long]
  }

  object Container {
    def read(in: DataInputStream): Container = in.readByte() match {
      case 0 =>
        val n = in.readInt()
        val arr = new Array[Char](math.max(n, 4))
        var i = 0
        while (i < n) { arr(i) = in.readChar(); i += 1 }
        new ArrayContainer(arr, n)
      case 1 =>
        val words = new Array[Long](1024)
        var i = 0
        while (i < 1024) { words(i) = in.readLong(); i += 1 }
        new BitmapContainer(words)
    }

    /** Shrink a word array to the most compact container form. */
    private[Roaring64] def fromWords(words: Array[Long]): Container = {
      var card = 0
      var i = 0
      while (i < 1024) { card += java.lang.Long.bitCount(words(i)); i += 1 }
      if (card >= ArrayMax) new BitmapContainer(words, card)
      else {
        val arr = new Array[Char](math.max(card, 4))
        var n = 0
        i = 0
        while (i < 1024) {
          var w = words(i)
          while (w != 0L) {
            val t = java.lang.Long.numberOfTrailingZeros(w)
            arr(n) = ((i << 6) | t).toChar
            n += 1
            w &= w - 1
          }
          i += 1
        }
        new ArrayContainer(arr, n)
      }
    }
  }

  /** Sorted dynamic array of 16-bit values; < [[ArrayMax]] entries. */
  final class ArrayContainer(
      private var arr: Array[Char], private var n: Int) extends Container {
    def this() = this(new Array[Char](4), 0)

    private def indexOf(v: Char): Int = {
      var lo = 0
      var hi = n - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid) < v) lo = mid + 1
        else if (arr(mid) > v) hi = mid - 1
        else return mid
      }
      -(lo + 1)
    }

    override def add(v: Char): Container = {
      val idx = indexOf(v)
      if (idx >= 0) this
      else if (n + 1 >= ArrayMax) { // promote: bitmap of existing + v
        val b = toBitmap
        b.set(v)
        b
      } else {
        val at = -(idx + 1)
        if (n == arr.length) {
          val bigger = new Array[Char](arr.length * 2)
          System.arraycopy(arr, 0, bigger, 0, n)
          arr = bigger
        }
        System.arraycopy(arr, at, arr, at + 1, n - at)
        arr(at) = v
        n += 1
        this
      }
    }

    override def contains(v: Char): Boolean = indexOf(v) >= 0
    override def cardinality: Int = n
    override def foreach(f: Char => Unit): Unit = {
      var i = 0
      while (i < n) { f(arr(i)); i += 1 }
    }
    override def copy(): Container =
      new ArrayContainer(java.util.Arrays.copyOf(arr, math.max(n, 4)), n)

    private def toBitmap: BitmapContainer = {
      val words = new Array[Long](1024)
      var i = 0
      while (i < n) {
        val v = arr(i)
        words(v >>> 6) |= 1L << (v & 63)
        i += 1
      }
      new BitmapContainer(words, n)
    }

    override def orWith(other: Container): Container = other match {
      case o: ArrayContainer =>
        var c: Container = this
        o.foreach(v => c = c.add(v))
        c
      case o: BitmapContainer => // denser side wins: fold self into a copy
        val b = o.copy().asInstanceOf[BitmapContainer]
        foreach(b.set)
        b
    }

    // and-with-array ≤ our size < ArrayMax, so the result is always an array
    override def andNew(other: Container): Container = {
      val out = new ArrayContainer()
      var c: Container = out
      foreach(v => if (other.contains(v)) c = c.add(v))
      c
    }

    override def xorNew(other: Container): Container = {
      val words = other.toWords
      foreach { v =>
        words(v >>> 6) ^= 1L << (v & 63)
      }
      Container.fromWords(words)
    }

    override def write(out: DataOutputStream): Unit = {
      out.writeByte(0)
      out.writeInt(n)
      var i = 0
      while (i < n) { out.writeChar(arr(i)); i += 1 }
    }

    override private[Roaring64] def toWords: Array[Long] = {
      val words = new Array[Long](1024)
      var i = 0
      while (i < n) {
        val v = arr(i)
        words(v >>> 6) |= 1L << (v & 63)
        i += 1
      }
      words
    }
  }

  /** Fixed 8 KiB bitset over the 16-bit chunk domain. */
  final class BitmapContainer(
      private val words: Array[Long], private var card: Int) extends Container {
    def this(words: Array[Long]) = this(words, {
      var c = 0
      var i = 0
      while (i < 1024) { c += java.lang.Long.bitCount(words(i)); i += 1 }
      c
    })

    def set(v: Char): Unit = {
      val w = v >>> 6
      val bit = 1L << (v & 63)
      if ((words(w) & bit) == 0L) { words(w) |= bit; card += 1 }
    }

    override def add(v: Char): Container = { set(v); this }
    override def contains(v: Char): Boolean =
      (words(v >>> 6) & (1L << (v & 63))) != 0L
    override def cardinality: Int = card
    override def foreach(f: Char => Unit): Unit = {
      var i = 0
      while (i < 1024) {
        var w = words(i)
        while (w != 0L) {
          f(((i << 6) | java.lang.Long.numberOfTrailingZeros(w)).toChar)
          w &= w - 1
        }
        i += 1
      }
    }
    override def copy(): Container =
      new BitmapContainer(java.util.Arrays.copyOf(words, 1024), card)

    override def orWith(other: Container): Container = other match {
      case o: ArrayContainer => o.foreach(set); this
      case o: BitmapContainer =>
        var i = 0
        var c = 0
        while (i < 1024) {
          words(i) |= o.words(i)
          c += java.lang.Long.bitCount(words(i))
          i += 1
        }
        card = c
        this
    }

    override def andNew(other: Container): Container = other match {
      case o: ArrayContainer => o.andNew(this) // iterate the sparse side
      case o: BitmapContainer =>
        val out = new Array[Long](1024)
        var i = 0
        while (i < 1024) { out(i) = words(i) & o.words(i); i += 1 }
        Container.fromWords(out)
    }

    override def xorNew(other: Container): Container = {
      val o = other.toWords
      val out = new Array[Long](1024)
      var i = 0
      while (i < 1024) { out(i) = words(i) ^ o(i); i += 1 }
      Container.fromWords(out)
    }

    override def write(out: DataOutputStream): Unit = {
      out.writeByte(1)
      var i = 0
      while (i < 1024) { out.writeLong(words(i)); i += 1 }
    }

    override private[Roaring64] def toWords: Array[Long] =
      java.util.Arrays.copyOf(words, 1024)
  }
}
