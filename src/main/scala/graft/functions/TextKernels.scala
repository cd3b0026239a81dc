package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Compiled JVM kernels for the text-hash hot path.
  *
  * Spark's higher-order array functions (`transform`/`aggregate`) are
  * interpreted per element — fine for correctness, but a
  * shingle→hash→minhash chain touches every character of every document
  * and the interpreter overhead dominates (measured ~70% of the sf0.1
  * dedup bench). These kernels implement the *identical* integer
  * arithmetic as TextPrims' SQL fragments (spec- and oracle-enforced), in
  * tight single-pass Scala; registered as UDFs they run once per row with
  * zero per-element dispatch.
  *
  * UDF-vs-builtin tradeoff: a scalar Scala UDF costs serialization at the
  * row boundary but nothing per array element; for ~100-element arrays ×
  * ~10-char shingles that's two orders of magnitude less interpreter
  * traffic. (A custom codegen Expression would save the row boundary too;
  * not needed at current profile.)
  */
object TextKernels {

  val P = TextPrims.P

  def polyhash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31 + s.charAt(i)) % P; i += 1 }
    h
  }

  /** Whitespace tokens (same as split('\s+') on already-trimmed text). */
  private def tokensOf(text: String): Array[String] =
    text.split("\\s+")

  /** Distinct word-2gram shingle hashes, in first-occurrence order
    * (order irrelevant downstream: consumers take min or set ops). */
  def wordShingleHashes(text: String): Array[Long] = {
    val t = tokensOf(text)
    if (t.length < 2) return Array.empty
    val seen = new java.util.LinkedHashSet[Long]()
    var i = 0
    while (i < t.length - 1) {
      // hash of "tok1_tok2" without building the string
      var h = polyhash(t(i))
      h = (h * 31 + '_') % P
      var j = 0
      val s2 = t(i + 1)
      while (j < s2.length) { h = (h * 31 + s2.charAt(j)) % P; j += 1 }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  /** Distinct word-2gram shingle STRINGS ("tok1_tok2", first-occurrence
    * order) — the string face of [[wordShingleHashes]], for vocabulary
    * queries (t8) where the bigram itself is the output. */
  def wordBigrams(text: String): Array[String] = {
    val t = tokensOf(text)
    if (t.length < 2) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < t.length - 1) { seen.add(t(i) + "_" + t(i + 1)); i += 1 }
    seen.toArray(new Array[String](seen.size))
  }

  /** ALL word-3gram strings ("a_b_c"), duplicates KEPT in order — the
    * multiplicity-preserving face of [[wordBigrams]], for repetition
    * statistics (t10) where how often a gram repeats IS the signal. */
  def wordTrigramsAll(text: String): Array[String] = {
    val t = tokensOf(text)
    if (t.length < 3) return Array.empty
    val out = new Array[String](t.length - 2)
    var i = 0
    while (i < t.length - 2) {
      out(i) = t(i) + "_" + t(i + 1) + "_" + t(i + 2)
      i += 1
    }
    out
  }

  /** Distinct char-kgram shingle hashes (sorted, for fast intersection). */
  def charShingleHashes(text: String, k: Int): Array[Long] = {
    if (text.length < k) return Array.empty
    val seen = new java.util.TreeSet[Long]()
    var i = 0
    while (i + k <= text.length) {
      var h = 0L
      var j = i
      while (j < i + k) { h = (h * 31 + text.charAt(j)) % P; j += 1 }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    out
  }

  /** The 12 minhash signature values over a shingle-hash array.
    * Empty input yields Long.MaxValue sentinels — callers must filter
    * empty-shingle docs out *before* banding (the sentinel otherwise
    * overflows band arithmetic and diverges from SQL list_min's NULL). */
  def minhashFromHashes(hs: Array[Long]): Array[Long] = {
    val seeds = TextPrims.minhashSeeds
    val out = Array.fill(seeds.length)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      var k = 0
      while (k < seeds.length) {
        val (a, b) = seeds(k)
        val v = (a * hs(i) + b) % P
        if (v < out(k)) out(k) = v
        k += 1
      }
      i += 1
    }
    out
  }

  /** The 12 minhash signature values over word-2gram shingle hashes. */
  def minhashSigs(text: String): Array[Long] =
    minhashFromHashes(wordShingleHashes(text))

  /** The 12 minhash signature values over char-kgram shingle hashes (the
    * banding key source for the scalable blocked-Jaccard dedup d6). The
    * banding k is deliberately LONGER than the scoring k: short grams make
    * unrelated same-language docs look alike (char-3 Jaccard of generic
    * prose is ~0.3), which floods the band buckets; 7-grams keep random
    * pairs apart while true near-dups still collide. */
  def charMinhashSigs(text: String, k: Int): Array[Long] =
    minhashFromHashes(charShingleHashes(text, k))

  /** 16-bit SimHash over (non-distinct) token hashes. */
  def simhash16(text: String): Long = {
    val t = tokensOf(text)
    val votes = new Array[Long](16)
    var i = 0
    while (i < t.length) {
      val h = polyhash(t(i))
      var b = 0
      while (b < 16) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 16) { if (votes(b) >= 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Intersection size of two sorted long arrays (two-pointer). */
  def sortedIntersectCount(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }

  /** Intersection size of two unsorted distinct long arrays (hash set). */
  def intersectCount(a: Array[Long], b: Array[Long]): Int = {
    val (small, big) = if (a.length <= b.length) (a, b) else (b, a)
    val set = new java.util.HashSet[Long](small.length * 2)
    small.foreach(set.add)
    var n = 0
    var i = 0
    while (i < big.length) { if (set.contains(big(i))) n += 1; i += 1 }
    n
  }

  /** ALL word-3gram hashes in position order, duplicates kept — the
    * hashed face of [[wordTrigramsAll]], for positional duplicated-span
    * detection (d14) where the array index IS the token position. */
  def wordTrigramHashesAll(text: String): Array[Long] = {
    val t = tokensOf(text)
    if (t.length < 3) return Array.empty
    val out = new Array[Long](t.length - 2)
    var i = 0
    while (i < t.length - 2) {
      var h = polyhash(t(i))
      h = (h * 31 + '_') % P
      var j = 0
      val s2 = t(i + 1)
      while (j < s2.length) { h = (h * 31 + s2.charAt(j)) % P; j += 1 }
      h = (h * 31 + '_') % P
      val s3 = t(i + 2)
      j = 0
      while (j < s3.length) { h = (h * 31 + s3.charAt(j)) % P; j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** ALL word-n-gram hashes in position order, duplicates kept — the
    * general-n face of [[wordTrigramHashesAll]] with identical
    * arithmetic (tokens joined by '_' under the rolling polyhash), so
    * the DuckDB mirror is polyhash(tok1 || '_' || … || tokN). Used by
    * the exact n-gram decontamination query (d19, n = 13). */
  def wordNgramHashesAll(text: String, n: Int): Array[Long] = {
    val t = tokensOf(text)
    if (t.length < n) return Array.empty
    val out = new Array[Long](t.length - n + 1)
    var i = 0
    while (i <= t.length - n) {
      var h = polyhash(t(i))
      var k = 1
      while (k < n) {
        h = (h * 31 + '_') % P
        val s = t(i + k)
        var j = 0
        while (j < s.length) { h = (h * 31 + s.charAt(j)) % P; j += 1 }
        k += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** Hashed n-gram feature buckets for the linear scorer (t12): all word
    * unigrams then all adjacent bigrams (duplicates kept — a bag, not a
    * set), each polyhashed mod `nBuckets`. Identical arithmetic to the
    * TextPrims SQL fragments; one pass, no per-element dispatch. (The
    * HOF formulation re-evaluated split() per element_at — O(tokens²)
    * string work that measured ~17 s on the 500-doc table.) */
  def ngramBuckets(text: String, nBuckets: Long): Array[Long] = {
    val t = tokensOf(text)
    val n = t.length
    val out = new Array[Long](if (n < 2) n else 2 * n - 1)
    var i = 0
    while (i < n) { out(i) = polyhash(t(i)) % nBuckets; i += 1 }
    i = 0
    while (i < n - 1) {
      var h = polyhash(t(i))
      h = (h * 31 + '_') % P
      val s2 = t(i + 1)
      var j = 0
      while (j < s2.length) { h = (h * 31 + s2.charAt(j)) % P; j += 1 }
      out(n + i) = h % nBuckets
      i += 1
    }
    out
  }

  // ---- UDF registrations (names used in operator packs)

  val minhashSigsUdf: UserDefinedFunction = udf((t: String) => minhashSigs(t))
  def charMinhashSigsUdf(k: Int): UserDefinedFunction =
    udf((t: String) => charMinhashSigs(t, k))
  val wordShingleHashesUdf: UserDefinedFunction = udf((t: String) => wordShingleHashes(t))
  val wordBigramsUdf: UserDefinedFunction = udf((t: String) => wordBigrams(t))
  val wordTrigramsAllUdf: UserDefinedFunction = udf((t: String) => wordTrigramsAll(t))
  val charShingle3Udf: UserDefinedFunction = udf((t: String) => charShingleHashes(t, 3))
  val simhash16Udf: UserDefinedFunction = udf((t: String) => simhash16(t))
  // Array[Long] signatures hit Spark's primitive fast path
  // (ArrayData.toLongArray) — no per-element boxing at the UDF boundary.
  val wordTrigramHashesAllUdf: UserDefinedFunction =
    udf((t: String) => wordTrigramHashesAll(t))
  def wordNgramHashesAllUdf(n: Int): UserDefinedFunction =
    udf((t: String) => wordNgramHashesAll(t, n))
  def ngramBucketsUdf(nBuckets: Long): UserDefinedFunction =
    udf((t: String) => ngramBuckets(t, nBuckets))
  val sortedIntersectUdf: UserDefinedFunction =
    udf((a: Array[Long], b: Array[Long]) => sortedIntersectCount(a, b))
  val intersectCountUdf: UserDefinedFunction =
    udf((a: Array[Long], b: Array[Long]) => intersectCount(a, b))

  /** Bucket-LOCAL candidate verification: all (id_lo, id_hi, jaccard)
    * pairs among one LSH band bucket's members, each member = (doc_id,
    * shingle hashes). The arithmetic per pair is IDENTICAL to the
    * row-per-candidate formulation ([[intersectCount]] + the same IEEE
    * divide), but the shingle arrays ship once per (doc, bucket) instead
    * of once per candidate pair — at 500k docs that is ~3 GB of exchange
    * instead of ~70 GB (the sf10 run's disk-spill blowup). Duplicate
    * pairs across shared buckets carry identical jaccards, so the
    * caller's distinct() sees the same row set. Struct members decode
    * positionally as tuples; arrays unwrap ONCE per member, not per pair. */
  def bucketPairJaccards(members: Seq[(Long, Seq[Long])],
                         minJac: Double): Seq[(Long, Long, Double)] = {
    val n = members.length
    val ids = new Array[Long](n)
    val hss = new Array[Array[Long]](n)
    var i = 0
    members.foreach { m => ids(i) = m._1; hss(i) = m._2.toArray; i += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var a = 0
    while (a < n) {
      var b = a + 1
      while (b < n) {
        val inter = intersectCount(hss(a), hss(b))
        val jac = inter.toDouble /
          (hss(a).length + hss(b).length - inter).toDouble
        // Threshold INSIDE the kernel: a hot bucket computes C(n,2)
        // jaccards either way, but only survivors are boxed/exploded
        // into rows (the sf10 hot buckets are boilerplate-driven — most
        // of their ~2.7M pairs are sub-threshold noise the old path
        // materialized just to filter). Same IEEE `>=` as the caller's
        // SQL filter, which stays in place as the authoritative gate.
        if (jac >= minJac) {
          if (ids(a) < ids(b)) out += ((ids(a), ids(b), jac))
          else out += ((ids(b), ids(a), jac))
        }
        b += 1
      }
      a += 1
    }
    out.toSeq
  }

  /** Cross-side variant of [[bucketPairJaccards]] for the asymmetric
    * probe (new batch × signature store, Dedup.probePairs): verifies
    * every (new, store) pair sharing this bucket, skipping equal ids
    * (a redelivered batch whose signatures were already upserted must
    * not match itself). Output keeps (new_id, store_id) orientation —
    * NOT id-sorted — the probe's asymmetric contract. Same flat-array
    * + in-kernel-threshold discipline as the one-sided kernel. */
  def bucketCrossJaccards(newMembers: Seq[(Long, Seq[Long])],
                          storeMembers: Seq[(Long, Seq[Long])],
                          minJac: Double): Seq[(Long, Long, Double)] = {
    val n = newMembers.length
    val m = storeMembers.length
    val nid = new Array[Long](n)
    val nhs = new Array[Array[Long]](n)
    var i = 0
    newMembers.foreach { x => nid(i) = x._1; nhs(i) = x._2.toArray; i += 1 }
    val sid = new Array[Long](m)
    val shs = new Array[Array[Long]](m)
    i = 0
    storeMembers.foreach { x => sid(i) = x._1; shs(i) = x._2.toArray; i += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var a = 0
    while (a < n) {
      var b = 0
      while (b < m) {
        if (nid(a) != sid(b)) {
          val inter = intersectCount(nhs(a), shs(b))
          val jac = inter.toDouble /
            (nhs(a).length + shs(b).length - inter).toDouble
          if (jac >= minJac) out += ((nid(a), sid(b), jac))
        }
        b += 1
      }
      a += 1
    }
    out.toSeq
  }

  /** Chunk-pair verification for the CAPPED bucket-local plan (VERDICT
    * r10 task 2): a bucket's members are split into fixed-size chunks
    * upstream, and each grouped row carries either ONE chunk (`bmem`
    * empty — verify all pairs within it) or TWO chunks (verify only the
    * cross pairs; each chunk's internal pairs arrive on its own row).
    * Same candidates and the same per-pair arithmetic as
    * [[bucketPairJaccards]] over the whole bucket — the union of
    * intra-chunk and cross-chunk pairs IS C(n,2) — but per-task work is
    * bounded by the chunk size, not the hottest bucket's population
    * (the single-task C(n,2) straggler / giant-collect_list-row failure
    * mode an adversarial boilerplate bucket would hit). Output id-sorted
    * like the one-bucket kernel; cross pairs can't repeat an intra pair:
    * a doc lives in exactly one chunk per bucket, and the upstream
    * grouping FILTERS OUT cross rows whose partner chunk came up empty
    * (hash-assigned chunks can be), so `bmem` empty reliably means "this
    * row IS the intra row" — the kernel never re-verifies a chunk's
    * internal pairs on a degenerate cross row. */
  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.functions.TextKernels")
  private val capWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Skew sentinel for the hash-assigned chunk split (ADVICE r11): the
    * upstream cap bounds chunk sizes only in EXPECTATION — doc_ids that
    * collide into one salted residue class re-create the oversized row
    * the cap exists to prevent. A row far past the cap is logged (once
    * per executor JVM, with sizes) so a straggler/OOM under adversarial
    * ids is attributable instead of silent; the arithmetic itself stays
    * correct at any row size. `softCap` ≤ 0 disables. */
  private[functions] def warnIfOversized(softCap: Int, aLen: Int, bLen: Int): Unit =
    if (softCap > 0 && aLen + bLen > softCap &&
        capWarned.compareAndSet(false, true))
      log.warn(s"chunk-pair row holds ${aLen + bLen} members — far past " +
        s"the soft cap $softCap: hash-assigned chunks collided (adversarial " +
        "or low-entropy doc_ids); expect a hot task where the chunk cap " +
        "promised none")

  def chunkPairJaccards(amem: Seq[(Long, Seq[Long])],
                        bmem: Seq[(Long, Seq[Long])],
                        minJac: Double,
                        softCap: Int = 0): Seq[(Long, Long, Double)] = {
    warnIfOversized(softCap, amem.length, if (bmem == null) 0 else bmem.length)
    if (bmem == null || bmem.isEmpty) bucketPairJaccards(amem, minJac)
    else bucketCrossJaccards(amem, bmem, minJac).map { t =>
      if (t._1 <= t._2) t else (t._2, t._1, t._3)
    }
  }

  val chunkPairJaccardsUdf: UserDefinedFunction =
    udf((a: Seq[(Long, Seq[Long])], b: Seq[(Long, Seq[Long])],
         minJac: Double, softCap: Int) => chunkPairJaccards(a, b, minJac, softCap))

  /** Chunked TWO-SIDED probe kernel ([[bucketCrossJaccards]] semantics
    * under the chunk cap): members carry a corpus-side tag (_3 = true
    * for the NEW batch, false for the store) because chunks are cut
    * over the bucket's COMBINED membership — a chunk can mix sides.
    * Pairs are (new, store) only, orientation kept, equal ids skipped
    * (redelivery self-match), exactly the uncapped kernel's contract;
    * intra-chunk rows (`bmem` empty) contribute their internal
    * new×store pairs, cross-chunk rows the across-chunk ones. */
  def chunkCrossJaccards(amem: Seq[(Long, Seq[Long], Boolean)],
                         bmem: Seq[(Long, Seq[Long], Boolean)],
                         minJac: Double,
                         softCap: Int = 0): Seq[(Long, Long, Double)] = {
    warnIfOversized(softCap, amem.length, if (bmem == null) 0 else bmem.length)
    def strip(xs: Seq[(Long, Seq[Long], Boolean)]) = xs.map(t => (t._1, t._2))
    val (an, as) = amem.partition(_._3)
    if (bmem == null || bmem.isEmpty)
      bucketCrossJaccards(strip(an), strip(as), minJac)
    else {
      val (bn, bs) = bmem.partition(_._3)
      bucketCrossJaccards(strip(an), strip(bs), minJac) ++
        bucketCrossJaccards(strip(bn), strip(as), minJac)
    }
  }

  val chunkCrossJaccardsUdf: UserDefinedFunction =
    udf((a: Seq[(Long, Seq[Long], Boolean)], b: Seq[(Long, Seq[Long], Boolean)],
         minJac: Double, softCap: Int) => chunkCrossJaccards(a, b, minJac, softCap))
}
