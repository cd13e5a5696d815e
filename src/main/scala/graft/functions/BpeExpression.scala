package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Kernels for BPE (byte-pair-encoding) vocabulary induction (Sennrich et
 * al. 2016): the per-document symbol-sequence state and the greedy
 * left-to-right merge pass. Both are rowwise codegen'd expressions — the
 * corpus-sized work in each BPE iteration is a scan + one pair-count
 * aggregation; only the argmax pair (one row) ever reaches the driver.
 */
object BpeExpression {

  /** Initial BPE state: one symbol per code point of the text, with the
    * word separator mapped to the boundary marker `¶` (merges across it are
    * excluded by the trainer). Matches the oracle's
    * `regexp_extract_all(replace(norm, ' ', '¶'), '.')`. */
  case class CharSymbols(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_bpe_chars"

    private def split(s: String): GenericArrayData = {
      val out = new java.util.ArrayList[UTF8String]()
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        out.add(UTF8String.fromString(
          if (cp == ' ') "¶" else new String(Character.toChars(cp))))
        i += Character.charCount(cp)
      }
      new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
    }

    override protected def nullSafeEval(input: Any): Any =
      split(input.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("charSymbols", this, classOf[CharSymbols].getName)
      nullSafeCodeGen(ctx, ev, u =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) " +
          s"$self.splitForCodegen($u.toString());")
    }

    /** Codegen entry point (public for generated code). */
    def splitForCodegen(s: String): GenericArrayData = split(s)

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** One greedy left-to-right BPE merge pass: every non-overlapping
    * occurrence of the adjacent pair (l, r) becomes the single symbol l+r,
    * scanning left to right (so `x x x` with pair (x,x) yields `xx x`). */
  case class MergePair(child: Expression, l: String, r: String)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_bpe_merge"

    @transient private lazy val lU = UTF8String.fromString(l)
    @transient private lazy val rU = UTF8String.fromString(r)
    @transient private lazy val mU = UTF8String.fromString(l + r)

    private def merge(arr: ArrayData): GenericArrayData = {
      val n = arr.numElements()
      val out = new java.util.ArrayList[UTF8String](n)
      var i = 0
      while (i < n) {
        if (i + 1 < n && lU == arr.getUTF8String(i) && rU == arr.getUTF8String(i + 1)) {
          out.add(mU); i += 2
        } else {
          out.add(arr.getUTF8String(i)); i += 1
        }
      }
      new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
    }

    override protected def nullSafeEval(input: Any): Any =
      merge(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("mergePair", this, classOf[MergePair].getName)
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) " +
          s"$self.mergeForCodegen($a);")
    }

    /** Codegen entry point (public for generated code). */
    def mergeForCodegen(arr: ArrayData): GenericArrayData = merge(arr)

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def charSymbols(text: Column): Column =
    Bridge.column(CharSymbols(Bridge.expression(text)))
  def mergePair(symbols: Column, l: String, r: String): Column =
    Bridge.column(MergePair(Bridge.expression(symbols), l, r))
}
