package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encoding of a text against a TRAINED merge table — the tokenizer
  * application step of an LLM data pipeline (token counts, packing
  * budgets, drift reports all consume its output).
  *
  * Pre-tokenization matches the corpus-stats subword splitter (lowercase
  * `[a-z0-9]+` runs — the q23 contract a DuckDB oracle replays exactly);
  * each word then merges bottom-up: repeatedly fuse the adjacent symbol
  * pair with the LOWEST merge rank (leftmost on rank ties) until no
  * adjacent pair is in the table. Greedy-by-rank is order-equivalent to
  * applying the merges sequentially in training order — the property the
  * differential spec and the oracle's replay-through-training both pin.
  *
  * The merge table is a constructor field (same placement rationale as
  * [[BloomProbeExpr]]: reference-compared during plan processing, shipped
  * once per stage); the lookup tables build lazily once per deserialized
  * instance (= once per task).
  *
  * HOT-LOOP SHAPE (round-16: the trainer's interning treatment applied
  * to the recurring encode pass — at corpus scale training amortizes to
  * zero and encode IS the tokenizer's cost):
  *   - symbols are INTERNED INTS (the universe is closed: 36 singles ∪
  *     merge outputs), so the greedy scan probes an open-addressed
  *     packed-long table `(idA << 32 | idB) → (rank, mergedId)` —
  *     zero allocation per probe where the string-keyed map built a
  *     fresh key string per adjacent pair per merge round;
  *   - emitted tokens are PRECOMPUTED UTF8Strings indexed by symbol id
  *     (no per-token fromString);
  *   - a per-THREAD word cache (word → token ids) exploits the Zipfian
  *     word distribution: the merge loop runs once per DISTINCT word
  *     per thread, not once per occurrence. Bounded at 64k entries,
  *     clear-on-full (a corpus partition rarely exceeds it; clearing
  *     is cheaper and simpler than LRU bookkeeping). ThreadLocal, not
  *     a plain map: tasks usually get their own deserialized instance,
  *     but a shared instance (driver-side eval) must degrade to a
  *     split cache, not HashMap corruption.
  */
case class BpeEncodeExpr(merges: Array[(String, String)], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode takes a STRING document; got ${child.dataType}")

  /** Interned symbol tables: singles 0..35 ([a-z0-9] in char order),
    * merge outputs appended in entry order. `pairTable` is
    * open-addressed linear-probe over packed-long keys; values pack
    * (rank << 32 | mergedId). First occurrence wins for duplicate
    * (a, b) entries, like a real merges.txt; forward references in
    * hand-built tables (an entry whose side is a LATER entry's
    * output) resolve via the two-phase build; only entries whose
    * sides are no entry's output and no single are dropped — such a
    * symbol can never appear in a word's buffer, so the string-keyed
    * map could never match them either (spec-pinned). */
  @transient private lazy val tables: BpeEncodeExpr.Tables =
    BpeEncodeExpr.buildTables(merges)

  /** Per-THREAD word cache: word → interned token ids, fetched from
    * the STATIC per-thread registry keyed weakly by this instance's
    * [[tables]]. Deserialization normally gives each task its own
    * expression instance, but nothing in Spark guarantees it
    * (driver-side eval, a reused local plan) — and a plain HashMap
    * mutated from two threads corrupts, up to an infinite loop inside
    * `HashMap.get`. Thread confinement makes a shared instance merely
    * split the cache (lower hit rate), never corrupt. Static + weakly
    * keyed rather than a per-instance ThreadLocal: an instance-owned
    * ThreadLocal pins its up-to-64k-entry map in every pooled executor
    * thread's ThreadLocalMap long after the task's expression dies
    * (expunged only lazily), which across 32 threads retains hundreds
    * of MB between stages; here the map dies with the Tables it
    * serves. */
  private def wordCacheFor(
      t: BpeEncodeExpr.Tables): java.util.HashMap[String, Array[Int]] = {
    val reg = BpeEncodeExpr.threadCaches.get()
    var m = reg.get(t)
    if (m == null) {
      m = new java.util.HashMap[String, Array[Int]](1 << 12)
      reg.put(t, m)
    }
    m
  }

  /** Greedy lowest-rank merge of one word, on interned ids. Returns the
    * token-id array (cached per distinct word). */
  private def encodeWordIds(word: String,
      wordCache: java.util.HashMap[String, Array[Int]]): Array[Int] = {
    val cached = wordCache.get(word)
    if (cached != null) return cached
    val t = tables
    var n = word.length
    val ids = new Array[Int](n)
    var i = 0
    while (i < n) { ids(i) = t.charId(word.charAt(i)); i += 1 }
    var continue = true
    while (continue && n > 1) {
      var best = -1L // packed (rank, mergedId); -1 = none
      var bestAt = -1
      var j = 0
      while (j < n - 1) {
        val v = t.lookup((ids(j).toLong << 32) | (ids(j + 1).toLong & 0xffffffffL))
        // unsigned compare on the packed value orders by rank first;
        // strict < keeps the LEFTMOST site on rank ties
        if (v >= 0 && (best < 0 || v < best)) { best = v; bestAt = j }
        j += 1
      }
      if (bestAt < 0) continue = false
      else {
        ids(bestAt) = (best & 0xffffffffL).toInt
        var k = bestAt + 1
        while (k < n - 1) { ids(k) = ids(k + 1); k += 1 }
        n -= 1
      }
    }
    val out = java.util.Arrays.copyOf(ids, n)
    if (wordCache.size() >= (1 << 16)) wordCache.clear()
    wordCache.put(word, out)
    out
  }

  def encode(text: UTF8String): ArrayData = {
    val t = tables
    val cache = wordCacheFor(t) // one registry lookup per document
    val out = new java.util.ArrayList[UTF8String]()
    // Locale-aware lowercase BEFORE splitting, exactly like the q23
    // splitter contract (and the DuckDB oracle's lower()): a byte-level
    // ASCII fold would mis-split the exotic mappings that LAND in
    // [a-z0-9] — U+212A KELVIN SIGN lowercases to 'k', U+0130 to
    // 'i'+combining dot — and silently diverge the gate on such input.
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var start = -1
    var i = 0
    while (i <= s.length) {
      val isWord = i < s.length && {
        val c = s.charAt(i)
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      }
      if (isWord && start < 0) start = i
      else if (!isWord && start >= 0) {
        val toks = encodeWordIds(s.substring(start, i), cache)
        var k = 0
        while (k < toks.length) { out.add(t.tokenStr(toks(k))); k += 1 }
        start = -1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.encode($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeEncodeExpr {
  /** STATIC per-thread word-cache registry: one WeakHashMap per thread
    * mapping a live [[Tables]] (≈ a live expression instance's merge
    * table) to that thread's word cache. Thread-confined (no
    * synchronization needed on the inner maps), and weakly keyed so a
    * finished task's cache becomes collectible with its Tables instead
    * of pinning the executor thread's ThreadLocalMap. */
  private val threadCaches: ThreadLocal[
      java.util.WeakHashMap[Tables, java.util.HashMap[String, Array[Int]]]] =
    ThreadLocal.withInitial(() =>
      new java.util.WeakHashMap[Tables, java.util.HashMap[String, Array[Int]]]())

  /** Interned lookup state shared by [[BpeEncodeExpr.encode]]. */
  final class Tables(val charId: Array[Int], val tokenStr: Array[UTF8String],
                     keys: Array[Long], vals: Array[Long], mask: Int) {
    /** Packed (rank << 32 | mergedId) for the pair key, or -1. */
    def lookup(key: Long): Long = {
      var h = (scala.util.hashing.byteswap64(key) & mask).toInt
      while (true) {
        val k = keys(h)
        if (k == key) return vals(h)
        if (k == -1L) return -1L
        h = (h + 1) & mask
      }
      -1L // unreachable
    }
  }

  private[functions] def buildTables(merges: Array[(String, String)]): Tables = {
    val symId = new java.util.HashMap[String, Integer](merges.length * 2)
    val strs = new java.util.ArrayList[String]()
    def intern(s: String): Int = {
      val got = symId.get(s)
      if (got != null) got.intValue()
      else { val id = strs.size(); symId.put(s, id); strs.add(s); id }
    }
    val charId = new Array[Int](128)
    var c = 'a'
    while (c <= 'z') { charId(c) = intern(String.valueOf(c)); c = (c + 1).toChar }
    c = '0'
    while (c <= '9') { charId(c) = intern(String.valueOf(c)); c = (c + 1).toChar }
    // open-addressed pair table, load factor <= 0.5
    var cap = 64
    while (cap < merges.length * 2 + 2) cap <<= 1
    val keys = Array.fill(cap)(-1L)
    val vals = new Array[Long](cap)
    val mask = cap - 1
    def put(key: Long, value: Long): Unit = {
      var h = (scala.util.hashing.byteswap64(key) & mask).toInt
      while (keys(h) != -1L && keys(h) != key) h = (h + 1) & mask
      if (keys(h) == -1L) { keys(h) = key; vals(h) = value } // first wins
    }
    // TWO-PHASE build, order-faithful to the string-keyed predecessor:
    // intern EVERY merge output first, THEN insert pair keys in array
    // order. A hand-built table may reference a LATER entry's output
    // (('ab','c') listed before ('a','b')) — the string map matched
    // such a pair once the later merge fired, so the side must count
    // as a symbol regardless of entry order (a single-pass build
    // silently dropped it — the round-16 review finding). Sides that
    // are neither singles nor ANY entry's output can never appear in
    // a word buffer, so skipping them matches the string map exactly
    // (its entry could never match either).
    var i = 0
    while (i < merges.length) {
      intern(merges(i)._1 + merges(i)._2): Unit
      i += 1
    }
    i = 0
    while (i < merges.length) {
      val (a, b) = merges(i)
      val ia = symId.get(a); val ib = symId.get(b)
      if (ia != null && ib != null)
        put((ia.longValue() << 32) | (ib.longValue() & 0xffffffffL),
          (i.toLong << 32) | symId.get(a + b).longValue())
      i += 1
    }
    val tokenStr = new Array[UTF8String](strs.size())
    i = 0
    while (i < tokenStr.length) {
      tokenStr(i) = UTF8String.fromString(strs.get(i)); i += 1
    }
    new Tables(charId, tokenStr, keys, vals, mask)
  }
}
