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

  @transient private lazy val automaton: MultiMatch.Automaton = {
    val data = right.eval(null)
    if (data == null)
      throw new IllegalArgumentException("multi_match patterns array must not be null")
    val arr = data.asInstanceOf[ArrayData]
    val pats = Array.tabulate(arr.numElements()) { i =>
      val p = arr.getUTF8String(i)
      if (p == null || p.numBytes() == 0)
        throw new IllegalArgumentException(
          "multi_match patterns must be non-null and non-empty")
      p.getBytes.clone()
    }
    new MultiMatch.Automaton(pats)
  }

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

object MultiMatch {

  /** Per-thread match scratch: generation-stamped visit marks make repeat
    * calls allocation-free without clearing (a clear would be O(nodes) per
    * row). `nodeGen[n] == gen` ⇒ node n's dict chain was already walked
    * for the current row; `patGen[p] == gen` ⇒ pattern p already reported. */
  private final class Scratch(nNodes: Int, nPats: Int) {
    val nodeGen = new Array[Int](nNodes)
    val patGen = new Array[Int](nPats)
    val hits = new Array[Int](nPats)
    var gen = 0
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
  }
}
