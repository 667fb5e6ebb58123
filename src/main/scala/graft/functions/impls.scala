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

  def md5Hex(s: String): String = {
    val d = threadDigest.get()
    d.reset()
    toHex(d.digest(s.getBytes("UTF-8")))
  }

  private def toHex(b: Array[Byte]): String = {
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = HexChars((b(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private val prefixes: Array[Array[Byte]] =
    (0 until 64).map(i => (i.toString + ":").getBytes("UTF-8")).toArray

  /** Unsigned lexicographic compare of two 16-byte digests — the same
    * order as comparing their lowercase hex strings. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Fold one shingle into a running k-way min-digest buffer (shared
    * by the scalar [[signature]] path and [[MinHashAgg]]). */
  def updateMins(mins: Array[Array[Byte]], shingleUtf8: Array[Byte]): Unit = {
    val d = threadDigest.get()
    var i = 0
    while (i < mins.length) {
      d.reset()
      d.update(prefixes(i))
      d.update(shingleUtf8)
      val dig = d.digest()
      if (mins(i) == null || less(dig, mins(i))) mins(i) = dig
      i += 1
    }
  }

  /** Elementwise min-merge of two digest buffers (into `a`). */
  def mergeMins(a: Array[Array[Byte]], b: Array[Array[Byte]]): Array[Array[Byte]] = {
    var i = 0
    while (i < a.length) {
      if (a(i) == null || (b(i) != null && less(b(i), a(i)))) a(i) = b(i)
      i += 1
    }
    a
  }

  /** Hex-encode a digest buffer as the signature array (null if the
    * buffer never saw input). */
  def toSignature(mins: Array[Array[Byte]]): ArrayData =
    if (mins.length == 0 || mins(0) == null) null
    else new GenericArrayData(
      mins.map(m => UTF8String.fromString(toHex(m))).asInstanceOf[Array[Any]])

  /** Single-pass k-way MinHash signature over character `shingleLen`-
    * grams: component i = min over shingles of md5(i || ':' || shingle)
    * as a lowercase hex string (lexicographic min over hex ==
    * unsigned 128-bit min over digests, which is how it's computed).
    * Matches the DuckDB oracle formula exactly — the oracle recomputes
    * it with explode + min(md5(...)).
    *
    * Runs map-side per document: the signature (k × 32-char hex) is
    * what shuffles in the LSH band join, never the raw text. Shingles
    * are de-dupped first (a min over a set equals the min over the
    * multiset) and digests stay as raw bytes until the final hex
    * encoding — ~4× fewer allocations than naive per-(i,shingle)
    * string hashing. */
  def signature(text: UTF8String, k: Int, shingleLen: Int): ArrayData = {
    require(k <= prefixes.length, s"minhash_sig: k must be <= ${prefixes.length}")
    // Shingle by Unicode CODE POINTS, not UTF-16 units: Spark's
    // length()/substr() and DuckDB's len()/substr() both count code
    // points, so a UTF-16 substring would split surrogate pairs and
    // break oracle parity on any non-BMP text.
    val cps = text.toString.codePoints().toArray
    if (cps.length < shingleLen) return null
    val distinct = new java.util.HashSet[String]()
    var pos = 0
    val last = cps.length - shingleLen
    while (pos <= last) {
      distinct.add(new String(cps, pos, shingleLen))
      pos += 1
    }
    val d = threadDigest.get()
    val mins = new Array[Array[Byte]](k)
    val it = distinct.iterator()
    while (it.hasNext) {
      val shBytes = it.next().getBytes("UTF-8")
      var i = 0
      while (i < k) {
        d.reset()
        d.update(prefixes(i))
        d.update(shBytes)
        val dig = d.digest()
        if (mins(i) == null || less(dig, mins(i))) mins(i) = dig
        i += 1
      }
    }
    new GenericArrayData(
      mins.map(m => UTF8String.fromString(toHex(m))).asInstanceOf[Array[Any]])
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
