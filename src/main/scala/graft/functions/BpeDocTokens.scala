package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused BPE document-encoding kernel (SURVEY §2.B D15b) as a native
  * codegen'd Catalyst expression: one imperative pass per document —
  * whitespace split, per-word code-point symbolization, every trained
  * merge applied greedily left-to-right with the one-pending-symbol
  * state, and the three counts accumulated in locals. The declarative
  * composition ([[graft.llm.Bpe.encodeDeclarative]]'s nested
  * higher-order `aggregate` folds) is the reference semantics but runs
  * interpreted per element; at 100 TB the substitution fold IS the cost
  * of the encode scan, so this kernel is the hot-path form (the
  * [[CosineSim]] pattern: fused native kernel + declarative twin,
  * equivalence property-tested).
  *
  * Output: struct(n_words, n_sym0, n_tok) — words after empty-token
  * filtering, code-point symbol count before any merge, token count
  * after all merges in rank order. NULL only when an input is NULL.
  * The heavy lifting lives in [[BpeDocTokens.compute]], shared verbatim
  * by eval and the generated code (a static call INSIDE whole-stage
  * codegen — no interpreter dispatch, no closure allocation). */
case class BpeDocTokens(text: Expression, as: Expression, bs: Expression)
    extends TernaryExpression {

  override def first: Expression = text
  override def second: Expression = as
  override def third: Expression = bs

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, as.dataType, bs.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, a, b) => TypeCheckResult.TypeCheckFailure(
        s"bpe_doc_tokens expects (string, array<string>, array<string>), " +
          s"got ($t, $a, $b)")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_sym0", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_doc_tokens"

  override def nullSafeEval(t: Any, a: Any, b: Any): Any =
    BpeDocTokens.compute(t.asInstanceOf[UTF8String],
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a, b) =>
      // compute() returns null on malformed merge arrays — the generated
      // code must propagate that into isNull (nullSafeCodeGen only
      // handles null INPUTS), or codegen'd callers dereference a null
      // row that interpreted mode would have declared NULL
      s"""${ev.value} = graft.functions.BpeDocTokens.compute($t, $a, $b);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BpeDocTokens =
    copy(text = newFirst, as = newSecond, bs = newThird)
}

object BpeDocTokens {

  /** Column-API entry point. */
  def apply(text: Column, as: Column, bs: Column): Column =
    GraftBridge.column(BpeDocTokens(
      GraftBridge.expression(text),
      GraftBridge.expression(as),
      GraftBridge.expression(bs)))

  /** Decode a merge-table side from ArrayData; null on any null entry. */
  private[functions] def sideArray(a: ArrayData): Array[String] = {
    val n = a.numElements()
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      out(i) = a.getUTF8String(i).toString
      i += 1
    }
    out
  }

  /** Symbolize one word (code points) and apply every merge rank with
    * the greedy one-pending-symbol pass — the loop both kernels share
    * ([[compute]] counts the result; [[BpeDocIds.compute]] maps it to
    * vocabulary ids). Returns the word's final token list. */
  private[functions] def encodeWord(w: String, mas: Array[String],
                                    mbs: Array[String])
      : java.util.ArrayList[String] = {
    var cur = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val l = Character.charCount(cp)
      cur.add(w.substring(i, i + l))
      i += l
    }
    var mi = 0
    while (mi < mas.length) {
      val out = new java.util.ArrayList[String](cur.size)
      var pend: String = null
      var si = 0
      while (si < cur.size) {
        val sym = cur.get(si)
        if (pend == null) pend = sym
        else if (pend == mas(mi) && sym == mbs(mi)) {
          out.add(pend + sym); pend = null
        } else { out.add(pend); pend = sym }
        si += 1
      }
      if (pend != null) out.add(pend)
      cur = out
      mi += 1
    }
    cur
  }

  /** The kernel. Semantics must stay IDENTICAL to the declarative twin:
    * words = split(text, " ") minus empties; symbols = code points
    * (Spark `length`/`split("")` granularity); each merge rank applies
    * one greedy left-to-right pass with a single pending symbol
    * ("aaa" under (a,a) merges the FIRST two). Called from both eval
    * and the generated code (static forwarder on this companion). */
  def compute(text: UTF8String, as: ArrayData, bs: ArrayData): InternalRow = {
    val nm = as.numElements()
    if (bs.numElements() != nm) return null
    val mas = sideArray(as)
    val mbs = sideArray(bs)
    if (mas == null || mbs == null) return null
    val s = text.toString
    val words = s.split(" ", -1)
    var nWords = 0L
    var nSym0 = 0L
    var nTok = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        nWords += 1
        var i = 0
        while (i < w.length) {
          nSym0 += 1
          i += Character.charCount(w.codePointAt(i))
        }
        nTok += encodeWord(w, mas, mbs).size
      }
      wi += 1
    }
    new GenericInternalRow(Array[Any](nWords, nSym0, nTok))
  }
}
