package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE document-encoding kernel that emits the TOKEN-ID SEQUENCE — the
  * loader-ready artifact a training pipeline actually feeds a model
  * (SURVEY §2.B D15; [[BpeDocTokens]] is the counting sibling, sharing
  * the same word-encode loop). One imperative pass per document:
  * whitespace split, symbolize, every merge rank greedily applied, then
  * each final token mapped to its id by POSITION in the vocabulary
  * array `vsyms` (vocab_id = array index — the caller passes the vocab
  * ordered by id, so no separate id array travels).
  *
  * The sym→id hash map is built per evaluation from the broadcast vocab
  * array. At a realistic 32k vocabulary that setup is O(|vocab|) per
  * document against an O(|merges|·|word|) merge loop — dominated by the
  * loop itself; a per-partition vocab cache is the refinement if it
  * ever shows up in a profile.
  *
  * NULL when an input is NULL, the merge sides disagree in length, or a
  * token is missing from the vocabulary (impossible when the vocab was
  * built from the same corpus + merge table — surfacing it as NULL
  * rather than a wrong id makes a mismatched vocab visible at the
  * gate). */
case class BpeDocIds(text: Expression, as: Expression, bs: Expression,
                     vsyms: Expression)
    extends QuaternaryExpression {

  override def first: Expression = text
  override def second: Expression = as
  override def third: Expression = bs
  override def fourth: Expression = vsyms

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, as.dataType, bs.dataType, vsyms.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(StringType, _),
            ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, a, b, v) => TypeCheckResult.TypeCheckFailure(
        s"bpe_doc_ids expects (string, array<string> x3), got ($t, $a, $b, $v)")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_doc_ids"

  override def nullSafeEval(t: Any, a: Any, b: Any, v: Any): Any =
    BpeDocIds.compute(t.asInstanceOf[UTF8String], a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a, b, v) =>
      // compute() returns null on malformed inputs — propagate into
      // isNull (nullSafeCodeGen only covers null INPUTS)
      s"""${ev.value} = graft.functions.BpeDocIds.compute($t, $a, $b, $v);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): BpeDocIds =
    copy(text = newFirst, as = newSecond, bs = newThird, vsyms = newFourth)
}

object BpeDocIds {

  /** Column-API entry point. */
  def apply(text: Column, as: Column, bs: Column, vsyms: Column): Column =
    GraftBridge.column(BpeDocIds(
      GraftBridge.expression(text),
      GraftBridge.expression(as),
      GraftBridge.expression(bs),
      GraftBridge.expression(vsyms)))

  /** Static kernel shared by eval and generated code. */
  def compute(text: UTF8String, as: ArrayData, bs: ArrayData,
              vs: ArrayData): ArrayData = {
    val nm = as.numElements()
    if (bs.numElements() != nm) return null
    val mas = BpeDocTokens.sideArray(as)
    val mbs = BpeDocTokens.sideArray(bs)
    if (mas == null || mbs == null) return null
    val nv = vs.numElements()
    val vocab = new java.util.HashMap[String, Integer](nv * 2)
    var vi = 0
    while (vi < nv) {
      if (vs.isNullAt(vi)) return null
      // first occurrence wins — the vocab is distinct by construction
      vocab.putIfAbsent(vs.getUTF8String(vi).toString, Integer.valueOf(vi))
      vi += 1
    }
    val words = text.toString.split(" ", -1)
    val ids = new java.util.ArrayList[Integer]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val toks = BpeDocTokens.encodeWord(w, mas, mbs)
        var ti = 0
        while (ti < toks.size) {
          val id = vocab.get(toks.get(ti))
          if (id == null) return null
          ids.add(id)
          ti += 1
        }
      }
      wi += 1
    }
    val out = new Array[Any](ids.size)
    var i = 0
    while (i < out.length) { out(i) = ids.get(i).intValue(); i += 1 }
    new GenericArrayData(out)
  }
}
