package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  private def textsDf = {
    val s = spark
    import s.implicits._
    Tables.documents(s, SfDir).select($"doc_id", $"text")
  }

  test("simhash64 is deterministic and token-order invariant") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", "alpha beta gamma delta"),
      ("b", "delta gamma beta alpha"), // same token multiset
      ("c", "totally different words here entirely unrelated content")
    ).toDF("id", "t").select($"id", GraftFunctions.simhash64($"t").as("h"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"), "simhash must not depend on token order")
    assert(m("a") != m("c"))
  }

  test("simhash64 hamming distance is small for near-dup, larger for unrelated") {
    val s = spark
    import s.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok30", "tokX") // 1 of 60 tokens changed
    val unrelated = (1 to 60).map(i => s"other$i").mkString(" ")
    val df = Seq(("b", base), ("n", nearDup), ("u", unrelated))
      .toDF("id", "t").select($"id", GraftFunctions.simhash64($"t").as("h"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m("b"), m("n")) < ham(m("b"), m("u")),
      s"near-dup hamming ${ham(m("b"), m("n"))} should be < unrelated ${ham(m("b"), m("u"))}")
    assert(ham(m("b"), m("n")) <= 16)
  }

  test("winnow guarantees a shared fingerprint for long shared substrings") {
    val s = spark
    import s.implicits._
    // shared run of length 40 >= w + k - 1 = 4 + 8 - 1 = 11
    val shared = "the quick brown fox jumps over the lazy"
    val t1 = s"prefix one $shared suffix alpha"
    val t2 = s"completely different beginning $shared and another end"
    val df = Seq(("x", t1), ("y", t2)).toDF("id", "t")
      .select($"id", GraftFunctions.winnow($"t", 8, 4).as("fp"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert(m("x").intersect(m("y")).nonEmpty,
      "winnowing must fingerprint any shared substring of length >= w+k-1")
  }

  test("winnow fingerprints are a subset of all k-gram hashes, sorted distinct") {
    val s = spark
    import s.implicits._
    val t = "abcdefghijklmnopqrstuvwxyz0123456789"
    val fp = Seq(Tuple1(t)).toDF("t")
      .select(GraftFunctions.winnow($"t", 5, 3).as("fp"))
      .collect()(0).getSeq[Long](0)
    assert(fp == fp.sorted && fp.distinct.size == fp.size)
    val bytes = t.getBytes("UTF-8")
    val all = (0 to bytes.length - 5)
      .map(i => graft.functions.SimHashImpl.fnv1a(bytes, i, i + 5)).toSet
    assert(fp.toSet.subsetOf(all))
  }

  test("minhash_sig matches a reference explode+min computation") {
    val s = spark
    import s.implicits._
    val got = textsDf.limit(20)
      .select($"doc_id", GraftFunctions.minhashSig($"text", 6, 5).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val texts = textsDf.limit(20).collect().map(r => r.getLong(0) -> r.getString(1))
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(x: String): String =
      md.digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    for ((id, t) <- texts) {
      val shingles = (0 to t.length - 5).map(i => t.substring(i, i + 5))
      // component i = min over shingles of the 8-hex-char slice (i mod 4)
      // of md5((i div 4) || ':' || shingle)
      val expected = (0 until 6).map { i =>
        shingles.map(sh => md5hex(s"${i / 4}:$sh").substring(8 * (i % 4), 8 * (i % 4) + 8)).min
      }
      assert(got(id) == expected, s"doc $id signature mismatch")
    }
  }

  test("minhash_sig shingles by code points on non-BMP text (UTF-8 byte walk)") {
    val s = spark
    import s.implicits._
    // 😀 is a surrogate pair in UTF-16 and 4 bytes in UTF-8; the kernel
    // must shingle code points, never UTF-16 units or raw bytes
    val t = "a😀b😀c😀d" // 7 code points → 5 shingles of length 3
    val got = Seq(Tuple1(t)).toDF("t")
      .select(GraftFunctions.minhashSig($"t", 6, 3).as("sig"))
      .collect()(0).getSeq[String](0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(x: String): String =
      md.digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val cps = t.codePoints().toArray
    val shingles = (0 to cps.length - 3).map(i => new String(cps, i, 3))
    val expected = (0 until 6).map { i =>
      shingles.map(sh => md5hex(s"${i / 4}:$sh").substring(8 * (i % 4), 8 * (i % 4) + 8)).min
    }
    assert(shingles.length == 5)
    assert(got == expected)
    // a text shorter than one shingle yields NULL, not an empty array
    val short = Seq(Tuple1("😀😀")).toDF("t")
      .select(GraftFunctions.minhashSig($"t", 4, 3).as("sig")).collect()(0)
    assert(short.isNullAt(0))
  }

  test("minhash_agg over exploded shingles equals map-side minhash_sig") {
    val s = spark
    import s.implicits._
    val sig = textsDf
      .select($"doc_id", GraftFunctions.minhashSig($"text", 8, 5).as("sig"))
      .filter($"sig".isNotNull)
    val agg = textsDf
      .filter(length($"text") >= 5)
      .select($"doc_id", explode(
        transform(sequence(lit(1), length($"text") - 4),
          i => $"text".substr(i, lit(5)))).as("sh"))
      .groupBy($"doc_id")
      .agg(GraftFunctions.minhashAgg($"sh", 8).as("sig2"))
    val joined = sig.join(agg, "doc_id")
      .filter(not($"sig" === $"sig2"))
    assert(joined.count() == 0, "aggregate and scalar MinHash paths must agree")
  }

  test("winnow guarantee holds on randomized strings (property, seeded)") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(7) // fixed seed: deterministic spec
    val k = 8
    val w = 4
    def randStr(n: Int): String =
      (1 to n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString // tiny alphabet → repeats
    def fps(t: String): Set[Long] = {
      val arr = graft.functions.WinnowImpl.winnow(UTF8String.fromString(t), k, w)
      (0 until arr.numElements()).map(arr.getLong).toSet
    }
    for (_ <- 1 to 40) {
      // any shared substring of length >= w + k - 1 must yield a shared fingerprint
      val shared = randStr(w + k - 1 + rnd.nextInt(10))
      val t1 = randStr(rnd.nextInt(30)) + shared + randStr(rnd.nextInt(30))
      val t2 = randStr(rnd.nextInt(30)) + shared + randStr(rnd.nextInt(30))
      assert(fps(t1).intersect(fps(t2)).nonEmpty, s"no shared fp for shared='$shared'")
      // fingerprints are a subset of the text's own k-gram hashes
      val bytes = t1.getBytes("UTF-8")
      val all = (0 to bytes.length - k)
        .map(i => graft.functions.SimHashImpl.fnv1a(bytes, i, i + k)).toSet
      assert(fps(t1).subsetOf(all))
    }
  }

  test("minhash kernel equals the naive reference on randomized unicode text (property, seeded)") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(11)
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(x: String): String =
      md.digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val alphabet = "abñ😀中 " // 1-, 2-, 3- and 4-byte UTF-8 + repeats
    val cpAlphabet = alphabet.codePoints().toArray
    for (trial <- 1 to 50) {
      val n = 1 + rnd.nextInt(40)
      val cps = (1 to n).map(_ => cpAlphabet(rnd.nextInt(cpAlphabet.length))).toArray
      val t = new String(cps, 0, cps.length)
      val k = 1 + rnd.nextInt(12)
      val len = 1 + rnd.nextInt(6)
      val got = graft.functions.MinHashImpl.signature(UTF8String.fromString(t), k, len)
      if (cps.length < len) assert(got == null, s"trial $trial: expected null")
      else {
        val shingles = (0 to cps.length - len).map(i => new String(cps, i, len))
        val want = (0 until k).map { i =>
          shingles.map(sh => md5hex(s"${i / 4}:$sh").substring(8 * (i % 4), 8 * (i % 4) + 8)).min
        }
        val gotSeq = (0 until got.numElements()).map(j => got.getUTF8String(j).toString)
        assert(gotSeq == want, s"trial $trial: text='$t' k=$k len=$len")
      }
    }
  }

  test("cosine_sim computes exact values and handles zero vectors") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f), 1.0),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f), 0.0) // zero-norm guard
    ).toDF("a", "b", "want")
      .select(GraftFunctions.cosineSim($"a", $"b").as("got"), $"want")
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("custom functions are callable from SQL via GraftExtensions") {
    val s = spark
    Tables.documents(s, SfDir).createOrReplaceTempView("docs_sql_test")
    val rows = s.sql(
      """SELECT simhash64(text) AS h, minhash_sig(text, 4, 5) AS sig,
                winnow(text, 8, 4) AS fp
         FROM docs_sql_test LIMIT 5""").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getSeq[String](1).size == 4)
      assert(r.getSeq[Long](2).nonEmpty)
    }
  }

  test("SQL surface completeness: every registered aggregate/expression runs via spark.sql") {
    // A user of the reference writes plain SQL; every function the
    // extension registers must therefore work with NO Scala at all.
    // One round-trip per function, checked on a seeded fixture.
    val s = spark
    import s.implicits._
    (1 to 100).map(i => (i.toLong, (i % 7).toLong, s"w${i % 5}"))
      .toDF("id", "v", "w").createOrReplaceTempView("fx_sql_test")
    // aggregates
    val agg = s.sql(
      """SELECT uniq_up_to(v, 3) AS u,
                approx_topk(w, 2, 16) AS tk,
                approx_topk_weighted(w, v, 2, 16) AS tkw,
                qdigest_quantiles(v, '0.5,0.9', 4, 1048576) AS qs,
                qdigest_merge_quantiles(st, '0.5', 4, 1048576) AS mq,
                adaptive_histogram(CAST(v AS DOUBLE), 8) AS hist,
                bloom_agg(v, 4096, 3) AS bf
         FROM (SELECT *, qdigest_state(v, 4, 1048576) OVER () AS st
               FROM fx_sql_test)""").head()
    assert(agg.get(agg.fieldIndex("u")).asInstanceOf[Number].longValue == 4L) // 7 distinct saturates at N+1
    assert(agg.getSeq[Row](agg.fieldIndex("tk")).size == 2)
    assert(agg.getSeq[Row](agg.fieldIndex("tkw")).size == 2)
    // v in 0..6: exact digest (k >= n) => p50 of 100 values
    assert(agg.getSeq[Long](agg.fieldIndex("qs")).head == 3L)
    assert(agg.getSeq[Long](agg.fieldIndex("mq")).head == 3L)
    assert(agg.getSeq[Row](agg.fieldIndex("hist")).map(_.getAs[Long]("cnt")).sum == 100L)
    // scalar probe over the aggregate's bloom bytes
    Seq(agg).map(r => r.getAs[Array[Byte]]("bf")).toDF("bf")
      .createOrReplaceTempView("fx_bloom")
    val probes = s.sql(
      """SELECT bloom_contains(bf, 3L) AS hit,
                bloom_contains(bf, 999L) AS miss
         FROM fx_bloom""").head()
    assert(probes.getAs[Boolean]("hit"))
    assert(!probes.getAs[Boolean]("miss")) // 4096 bits / 7 keys: no FP for this key
    // minhash_agg (exploded-feed form)
    val mh = s.sql(
      """SELECT minhash_agg(sh, 4) AS sig FROM (
           SELECT explode(array('abcdefgh', 'ijklmnop')) AS sh)""").head()
    assert(mh.getSeq[String](mh.fieldIndex("sig")).size == 4)
    // cosine_sim scalar
    val cs = s.sql(
      "SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c").head()
    assert(math.abs(cs.getAs[Double]("c") - 1.0) < 1e-12)
  }
}
