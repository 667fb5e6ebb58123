package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels backing the custom Catalyst expressions.
  *
  * Each is a plain static method (Scala object → static forwarder) so
  * generated whole-stage code can call it directly —
  * `graft.functions.SimHashImpl.simhash64(str)` — keeping the custom
  * operators inside the same codegen span as built-in expressions
  * (no UDF boxing, no CodegenFallback interpretation).
  *
  * All hashing is deterministic and engine-independent: FNV-1a 64 for
  * internal fingerprints (public-domain constants), MD5 where the
  * DuckDB oracle must reproduce the value (`md5()` is identical in
  * both engines).
  */
object SimHashImpl {
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** FNV-1a 64-bit over UTF-8 bytes of `s[from, until)`. */
  def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** 64-bit SimHash (Charikar, STOC 2002) over whitespace tokens: each
    * token votes ±1 per bit with its FNV-1a hash; the sign of each
    * accumulated bit forms the fingerprint. Near-duplicate documents
    * land within a small Hamming distance. */
  def simhash64(text: UTF8String): Long = {
    val bytes = text.getBytes
    val acc = new Array[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        val h = fnv1a(bytes, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r'
}

object WinnowImpl {
  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken — SIGMOD 2003
    * "Winnowing: Local Algorithms for Document Fingerprinting").
    *
    * Rolling FNV k-gram hashes over the byte stream; in every window of
    * `w` consecutive k-gram hashes select the minimum (rightmost on
    * ties, per the paper) — guarantees any match of length >= w+k-1 is
    * caught. Returns the DISTINCT selected fingerprints sorted
    * ascending (deterministic set representation). */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length - k + 1 // number of k-grams
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      hashes(i) = SimHashImpl.fnv1a(bytes, i, i + k)
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (n <= w) {
      // shorter than one window: select the global min (rightmost tie)
      var best = 0
      i = 1
      while (i < n) { if (hashes(i) <= hashes(best)) best = i; i += 1 }
      sel.add(hashes(best))
    } else {
      var start = 0
      var best = -1
      while (start + w <= n) {
        if (best < start) {
          best = start
          i = start + 1
          while (i < start + w) { if (hashes(i) <= hashes(best)) best = i; i += 1 }
          sel.add(hashes(best))
        } else {
          val incoming = start + w - 1
          if (hashes(incoming) <= hashes(best)) { best = incoming; sel.add(hashes(best)) }
        }
        start += 1
      }
    }
    val out = new Array[Long](sel.size())
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

object MinHashImpl {
  private val threadDigest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  /** "Empty" sentinel for a min buffer entry: real components are
    * unsigned 32-bit values, so MaxValue is unreachable. */
  val Empty: Long = Long.MaxValue

  /** Digest-group prefixes "g:" for g = 0..15 → up to k = 64. */
  private val prefixes: Array[Array[Byte]] =
    (0 until 16).map(g => (g.toString + ":").getBytes("UTF-8")).toArray

  /** Slice `o` (bytes [4o, 4o+4), big-endian) of a 16-byte digest as an
    * unsigned 32-bit value — the same order as comparing the digest's
    * lowercase-hex characters [8o, 8o+8). */
  @inline private def slice(dig: Array[Byte], o: Int): Long = {
    val b = o * 4
    ((dig(b) & 0xffL) << 24) | ((dig(b + 1) & 0xffL) << 16) |
      ((dig(b + 2) & 0xffL) << 8) | (dig(b + 3) & 0xffL)
  }

  /** Fold one shingle (UTF-8 bytes [from, until)) into a running k-way
    * min buffer: component i takes the min of slice (i mod 4) of
    * md5((i div 4) || ':' || shingle) — ⌈k/4⌉ digests per shingle, not
    * k (the slicing is what makes the kernel 4× cheaper than one md5
    * per component while staying DuckDB-expressible:
    * `substr(md5((i//4) || ':' || sh), 1 + 8*(i%4), 8)`). */
  def updateMinsRange(mins: Array[Long], bytes: Array[Byte], from: Int, until: Int): Unit = {
    val d = threadDigest.get()
    val k = mins.length
    var g = 0
    var i = 0
    while (i < k) {
      d.reset()
      d.update(prefixes(g))
      d.update(bytes, from, until - from)
      val dig = d.digest()
      val lim = math.min(i + 4, k)
      var o = 0
      while (i < lim) {
        val v = slice(dig, o)
        if (v < mins(i)) mins(i) = v
        o += 1
        i += 1
      }
      g += 1
    }
  }

  /** Fold one whole shingle byte array (shared by [[MinHashAgg]]). */
  def updateMins(mins: Array[Long], shingleUtf8: Array[Byte]): Unit =
    updateMinsRange(mins, shingleUtf8, 0, shingleUtf8.length)

  /** Elementwise min-merge of two min buffers (into `a`). */
  def mergeMins(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  private def hex8(v: Long): UTF8String = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) {
      out(i) = HexChars(((v >>> ((7 - i) * 4)) & 0xfL).toInt).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Hex-encode a min buffer as the signature array of 8-hex-char
    * strings (null if the buffer never saw input). */
  def toSignature(mins: Array[Long]): ArrayData =
    if (mins.length == 0 || mins(0) == Empty) null
    else new GenericArrayData(mins.map(m => hex8(m)).asInstanceOf[Array[Any]])

  /** Single-pass k-way MinHash signature over character `shingleLen`-
    * grams: component i = min over shingles of the 8-hex-char slice
    * `substr(md5((i div 4) || ':' || shingle), 1 + 8*(i mod 4), 8)` —
    * an unsigned 32-bit min computed on raw digest bytes, identical to
    * the lexicographic min over the hex slices the DuckDB oracle takes.
    *
    * Runs map-side per document: the signature (k × 8-char hex) is
    * what shuffles in the LSH band join, never the raw text. Shingles
    * are de-dupped first (a min over a set equals the min over the
    * multiset) and hashed straight from the document's UTF-8 bytes
    * (consecutive code points are a contiguous byte range), so the
    * hot loop allocates nothing but the MD5 digests — ⌈k/4⌉ of them
    * per distinct shingle. */
  def signature(text: UTF8String, k: Int, shingleLen: Int): ArrayData = {
    require(k <= 4 * prefixes.length, s"minhash_sig: k must be <= ${4 * prefixes.length}")
    // Shingle by Unicode CODE POINTS, not UTF-16 units: Spark's
    // length()/substr() and DuckDB's len()/substr() both count code
    // points, so a UTF-16 substring would split surrogate pairs and
    // break oracle parity on any non-BMP text. A code point starts at
    // every UTF-8 byte that is not a continuation byte (10xxxxxx).
    val bytes = text.getBytes
    val n = bytes.length
    val starts = new Array[Int](n + 1)
    var ncp = 0
    var b = 0
    while (b < n) {
      if ((bytes(b) & 0xc0) != 0x80) { starts(ncp) = b; ncp += 1 }
      b += 1
    }
    starts(ncp) = n
    if (ncp < shingleLen) return null
    val seen = new java.util.HashSet[java.nio.ByteBuffer]()
    val mins = Array.fill(k)(Empty)
    var p = 0
    val last = ncp - shingleLen
    while (p <= last) {
      val from = starts(p)
      val until = starts(p + shingleLen)
      // ByteBuffer.wrap equality is content-based over [from, until)
      if (seen.add(java.nio.ByteBuffer.wrap(bytes, from, until - from)))
        updateMinsRange(mins, bytes, from, until)
      p += 1
    }
    toSignature(mins)
  }
}

object CosineImpl {
  /** Cosine similarity of two float vectors, accumulated in double in
    * index order — the same sequence of IEEE ops the DuckDB oracle
    * expression performs, so results are bit-identical, not just
    * close. Returns 0.0 for zero-norm inputs. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
