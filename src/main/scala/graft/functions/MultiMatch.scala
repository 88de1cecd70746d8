package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `multi_match(text, array('p1','p2',…))` — single-pass multi-pattern
  * substring search (Aho–Corasick, Aho & Corasick CACM 1975): returns the
  * DISTINCT patterns that occur in `text`, in pattern-declaration order.
  *
  * The curation use case is blocklist / taxonomy tagging: a document
  * either carries or doesn't carry each of P phrases. The composed form
  * (`filter(patterns, p -> contains(text, p))`) scans the document P
  * times — at 10⁴ blocklist entries that is 10⁴ passes over every byte of
  * a 100 TB corpus. This expression walks the text ONCE over a byte-level
  * automaton built at plan time from the (required-foldable) pattern
  * array, so cost is O(|text| + matches) regardless of P.
  *
  * Semantics match `contains` exactly (case-sensitive substring at any
  * position, UTF-8 byte matching — valid UTF-8 is self-synchronizing, so
  * byte-level equality is codepoint-level equality). Patterns must be
  * non-empty and distinct; the automaton is built once per plan and shared
  * by reference in generated code (the compiled-regex pattern of Spark's
  * own `RLike`). Match-time scratch is generation-stamped and thread-local
  * — steady-state matching allocates only the result array.
  */
case class MultiMatch(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "multi_match"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "multi_match patterns must be foldable (the automaton is a plan-time structure); " +
          s"got non-foldable ${right.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val automaton: MultiMatch.Automaton =
    MultiMatch.automatonFromFoldable(right, prettyName)

  override protected def nullSafeEval(t: Any, p: Any): Any =
    automaton.matchedArray(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val autoRef =
      ctx.addReferenceObj("acAutomaton", automaton, classOf[MultiMatch.Automaton].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $autoRef.matchedArray($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `multi_redact(text, patterns, mask)` — single-pass multi-pattern
  * REDACTION on the same plan-time Aho–Corasick automaton as
  * [[MultiMatch]]: every leftmost-longest non-overlapping occurrence of
  * any pattern is replaced by `mask`. Semantics are exactly those of a
  * global regex replace over the alternation `p1|p2|…` with alternatives
  * ordered longest-first (which is how the oracle mirrors it) — but the
  * scan is O(|text| + matches) for ANY pattern count, where the regex
  * alternation re-tries P alternatives per position. Patterns and mask
  * must be foldable; the mask is not rescanned (no replacement cascades).
  */
case class MultiRedact(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, ArrayType(StringType), StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "multi_redact"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "multi_redact patterns and mask must be foldable (plan-time structures)")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val automaton: MultiMatch.Automaton =
    MultiMatch.automatonFromFoldable(second, prettyName)

  @transient private lazy val maskBytes: Array[Byte] = {
    val m = third.eval(null)
    if (m == null)
      throw new IllegalArgumentException("multi_redact mask must not be null")
    m.asInstanceOf[UTF8String].getBytes.clone()
  }

  override protected def nullSafeEval(t: Any, p: Any, m: Any): Any =
    automaton.redact(t.asInstanceOf[UTF8String], maskBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val autoRef =
      ctx.addReferenceObj("acAutomaton", automaton, classOf[MultiMatch.Automaton].getName)
    val maskRef = ctx.addReferenceObj("acMask", maskBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, (t, _, _) =>
      s"${ev.value} = $autoRef.redact($t, $maskRef);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `multi_match_count(text, patterns)` — the number of leftmost-longest
  * non-overlapping pattern occurrences (the redaction count of
  * [[MultiRedact]], without building the redacted string). */
case class MultiMatchCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "multi_match_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "multi_match_count patterns must be foldable (plan-time structure)")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val automaton: MultiMatch.Automaton =
    MultiMatch.automatonFromFoldable(right, prettyName)

  override protected def nullSafeEval(t: Any, p: Any): Any =
    automaton.sweepCount(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val autoRef =
      ctx.addReferenceObj("acAutomaton", automaton, classOf[MultiMatch.Automaton].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $autoRef.sweepCount($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MultiMatch {

  /** Shared builder: evaluate the foldable pattern-array child into the
    * plan-time automaton (MultiMatch / MultiRedact / MultiMatchCount). */
  private[functions] def automatonFromFoldable(patterns: Expression,
                                               fn: String): Automaton = {
    val data = patterns.eval(null)
    if (data == null)
      throw new IllegalArgumentException(s"$fn patterns array must not be null")
    val arr = data.asInstanceOf[ArrayData]
    val pats = Array.tabulate(arr.numElements()) { i =>
      val p = arr.getUTF8String(i)
      if (p == null || p.numBytes() == 0)
        throw new IllegalArgumentException(
          s"$fn patterns must be non-null and non-empty")
      p.getBytes.clone()
    }
    new Automaton(pats)
  }

  /** Per-thread match scratch: generation-stamped visit marks make repeat
    * calls allocation-free without clearing (a clear would be O(nodes) per
    * row). `nodeGen[n] == gen` ⇒ node n's dict chain was already walked
    * for the current row; `patGen[p] == gen` ⇒ pattern p already reported.
    * The growable (start, len) buffer serves the redaction sweep. */
  private final class Scratch(nNodes: Int, nPats: Int) {
    val nodeGen = new Array[Int](nNodes)
    val patGen = new Array[Int](nPats)
    val hits = new Array[Int](nPats)
    var starts = new Array[Int](64)
    var lens = new Array[Int](64)
    var gen = 0
    def grow(n: Int): Unit = if (n >= starts.length) {
      starts = java.util.Arrays.copyOf(starts, starts.length * 2)
      lens = java.util.Arrays.copyOf(lens, lens.length * 2)
    }
  }

  /** Frozen byte-trie with BFS fail links and dict (output-suffix) links.
    * Node 0 is the root; its transitions are a dense 256-entry table (the
    * hot path restarts there constantly); other nodes binary-search a
    * sorted child array. Built once per plan; serializable (ships inside
    * the physical plan to executors); match scratch is rebuilt lazily per
    * JVM per thread. */
  final class Automaton(patternBytes: Array[Array[Byte]]) extends Serializable {
    require(patternBytes.nonEmpty, "multi_match needs at least one pattern")
    locally {
      val seen = new java.util.HashSet[String]()
      patternBytes.foreach { p =>
        if (!seen.add(new String(p, java.nio.charset.StandardCharsets.ISO_8859_1)))
          throw new IllegalArgumentException(
            "multi_match patterns must be distinct (duplicate found)")
      }
    }

    // ---- build (driver-side, once per plan) ----
    private val (childKey, childNext, fail, dict, out, rootNext) = {
      val keys = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.TreeMap.empty[Int, Int]) // unsigned byte -> node
      val outB = scala.collection.mutable.ArrayBuffer(-1)
      patternBytes.zipWithIndex.foreach { case (p, id) =>
        var s = 0
        p.foreach { b =>
          val ub = b & 0xff
          s = keys(s).getOrElse(ub, {
            keys += scala.collection.mutable.TreeMap.empty[Int, Int]
            outB += -1
            val n = keys.size - 1
            keys(s).put(ub, n)
            n
          })
        }
        outB(s) = id // patterns distinct => no clobbering
      }
      val n = keys.size
      val failB = new Array[Int](n)
      val dictB = new Array[Int](n)
      val queue = new java.util.ArrayDeque[Int]()
      keys(0).foreach { case (_, c) => failB(c) = 0; dictB(c) = 0; queue.add(c) }
      while (!queue.isEmpty) {
        val u = queue.poll()
        keys(u).foreach { case (b, v) =>
          var f = failB(u)
          while (f != 0 && !keys(f).contains(b)) f = failB(f)
          failB(v) = keys(f).get(b).filter(_ != v).getOrElse(0)
          dictB(v) = if (outB(failB(v)) >= 0) failB(v) else dictB(failB(v))
          queue.add(v)
        }
      }
      val ck = new Array[Array[Byte]](n)
      val cn = new Array[Array[Int]](n)
      var i = 0
      while (i < n) {
        val entries = keys(i).toArray // TreeMap => already sorted unsigned
        ck(i) = entries.map(_._1.toByte)
        cn(i) = entries.map(_._2)
        i += 1
      }
      val root = new Array[Int](256)
      keys(0).foreach { case (b, c) => root(b) = c }
      (ck, cn, failB, dictB, outB.toArray, root)
    }

    private val numNodes = fail.length
    private val numPats = patternBytes.length

    @transient private lazy val outStrings: Array[UTF8String] =
      patternBytes.map(UTF8String.fromBytes)

    @transient private lazy val scratch = new ThreadLocal[Scratch] {
      override def initialValue(): Scratch = new Scratch(numNodes, numPats)
    }

    /** Child transition for unsigned byte `ub`, or -1. Binary search over
      * the frozen sorted child keys (root uses the dense table instead). */
    private def child(s: Int, ub: Int): Int = {
      val ks = childKey(s)
      var lo = 0
      var hi = ks.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = ks(mid) & 0xff
        if (k == ub) return childNext(s)(mid)
        else if (k < ub) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    /** Distinct matched patterns, in pattern-declaration order. Called from
      * both the interpreted and the generated path. */
    def matchedArray(text: UTF8String): GenericArrayData = {
      val sc = scratch.get()
      sc.gen += 1
      val gen = sc.gen
      var nHits = 0
      val bytes = text.getBytes
      var state = 0
      var i = 0
      while (i < bytes.length && nHits < numPats) {
        val ub = bytes(i) & 0xff
        // goto with fail-link fallback; root short-circuits via dense table
        var s = state
        var nxt = if (s == 0) rootNext(ub) else -1
        while (nxt < 0) {
          nxt = child(s, ub)
          if (nxt < 0) {
            if (s == 0) nxt = 0 else s = fail(s)
          }
        }
        state = nxt
        // walk the dict chain once per (node, row): report new patterns
        var cur = if (out(state) >= 0) state else dict(state)
        while (cur != 0 && sc.nodeGen(cur) != gen) {
          sc.nodeGen(cur) = gen
          val p = out(cur)
          if (p >= 0 && sc.patGen(p) != gen) {
            sc.patGen(p) = gen
            sc.hits(nHits) = p
            nHits += 1
          }
          cur = dict(cur)
        }
        i += 1
      }
      java.util.Arrays.sort(sc.hits, 0, nHits) // ids ascending = declaration order
      val res = new Array[Any](nHits)
      var j = 0
      while (j < nHits) { res(j) = outStrings(sc.hits(j)); j += 1 }
      new GenericArrayData(res)
    }

    private val patLen: Array[Int] = patternBytes.map(_.length)

    /** Every occurrence (overlapping included) as (start, len) into the
      * scratch buffers — occurrences, not distinct patterns, so no
      * dict-chain memoization here. Returns the raw occurrence count. */
    private def collectMatches(bytes: Array[Byte], sc: Scratch): Int = {
      var n = 0
      var state = 0
      var i = 0
      while (i < bytes.length) {
        val ub = bytes(i) & 0xff
        var s = state
        var nxt = if (s == 0) rootNext(ub) else -1
        while (nxt < 0) {
          nxt = child(s, ub)
          if (nxt < 0) {
            if (s == 0) nxt = 0 else s = fail(s)
          }
        }
        state = nxt
        var cur = if (out(state) >= 0) state else dict(state)
        while (cur != 0) {
          val p = out(cur)
          if (p >= 0) {
            sc.grow(n)
            sc.starts(n) = i - patLen(p) + 1
            sc.lens(n) = patLen(p)
            n += 1
          }
          cur = dict(cur)
        }
        i += 1
      }
      n
    }

    /** Leftmost-longest non-overlapping selection (global-regex-replace
      * semantics with longest-first alternation): sort occurrences by
      * (start asc, len desc) via one packed-long sort, then a greedy
      * sweep. Survivors overwrite the scratch prefix; returns their
      * count. */
    private def greedySelect(sc: Scratch, n: Int): Int = {
      val keys = new Array[Long](n)
      var i = 0
      while (i < n) {
        keys(i) = (sc.starts(i).toLong << 32) | (0xFFFFFFFFL - sc.lens(i))
        i += 1
      }
      java.util.Arrays.sort(keys)
      var k = 0
      var next = 0
      i = 0
      while (i < n) {
        val s = (keys(i) >>> 32).toInt
        val l = (0xFFFFFFFFL - (keys(i) & 0xFFFFFFFFL)).toInt
        if (s >= next) { sc.starts(k) = s; sc.lens(k) = l; k += 1; next = s + l }
        i += 1
      }
      k
    }

    /** Number of leftmost-longest non-overlapping occurrences. */
    def sweepCount(text: UTF8String): Long = {
      val sc = scratch.get()
      val n = collectMatches(text.getBytes, sc)
      greedySelect(sc, n).toLong
    }

    /** Redacted copy: every selected occurrence replaced by `mask` (the
      * mask is never rescanned). Returns the original object when nothing
      * matched — the common case allocates nothing. */
    def redact(text: UTF8String, mask: Array[Byte]): UTF8String = {
      val sc = scratch.get()
      val bytes = text.getBytes
      val n0 = collectMatches(bytes, sc)
      val k = greedySelect(sc, n0)
      if (k == 0) return text
      var outLen = bytes.length
      var i = 0
      while (i < k) { outLen += mask.length - sc.lens(i); i += 1 }
      val outB = new Array[Byte](outLen)
      var src = 0
      var dst = 0
      i = 0
      while (i < k) {
        val s = sc.starts(i)
        System.arraycopy(bytes, src, outB, dst, s - src)
        dst += s - src
        System.arraycopy(mask, 0, outB, dst, mask.length)
        dst += mask.length
        src = s + sc.lens(i)
        i += 1
      }
      System.arraycopy(bytes, src, outB, dst, bytes.length - src)
      UTF8String.fromBytes(outB)
    }
  }
}
