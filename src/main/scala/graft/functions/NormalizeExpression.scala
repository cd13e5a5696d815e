package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode normalization as a native codegen'd expression — the first step of
 * any text-curation pipeline that must treat "café" (precomposed U+00E9) and
 * "café" (e + combining U+0301) as the same document. Backed by
 * `java.text.Normalizer` (the JDK's ICU-derived implementation of UAX #15),
 * so NFC output is byte-identical to any other conformant engine — DuckDB's
 * `nfc_normalize` included, which is what lets NFC-normalized text flow
 * through the Poly64 hash-exact oracle gates.
 *
 * Hot-path shape: `Normalizer.isNormalized` runs first — for the ASCII bulk
 * of a real corpus it's a single quick-check scan and the ORIGINAL UTF8String
 * is returned without any String round-trip or re-encode, so a 100 TB scan
 * pays the conversion only on rows that actually need it.
 */
object NormalizeExpression {

  private val Forms = Set("NFC", "NFD", "NFKC", "NFKD")

  case class UnicodeNormalize(child: Expression, form: String)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(Forms(form), s"form must be one of $Forms, got $form")
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = s"graft_${form.toLowerCase}"

    @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

    override protected def nullSafeEval(input: Any): Any = {
      val u = input.asInstanceOf[UTF8String]
      val s = u.toString
      if (java.text.Normalizer.isNormalized(s, f)) u
      else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, u => {
        val s = ctx.freshName("s")
        s"""
           |java.lang.String $s = $u.toString();
           |${ev.value} = java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.${this.form})
           |  ? $u
           |  : org.apache.spark.unsafe.types.UTF8String.fromString(
           |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.${this.form}));
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def normalize(c: Column, form: String): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(c), form))
  def nfc(c: Column): Column = normalize(c, "NFC")
  def nfd(c: Column): Column = normalize(c, "NFD")
  def nfkc(c: Column): Column = normalize(c, "NFKC")
  def nfkd(c: Column): Column = normalize(c, "NFKD")
}
