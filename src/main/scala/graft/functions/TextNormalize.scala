package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization (SURVEY.md §2 addendum, r6): the step a
  * web-corpus pipeline runs BEFORE any dedup or tokenization — two
  * visually identical strings differing only in NFC/NFD composition,
  * zero-width characters, exotic whitespace, or accent presentation
  * otherwise survive exact dedup as distinct documents.
  *
  * Spark ships no Unicode-normalization builtin, so the primitive is a
  * native codegen `Expression` over `java.text.Normalizer` (route (b)
  * of the custom-operator ladder — stays inside whole-stage codegen;
  * a Scala UDF here would break the codegen span of every pipeline
  * that normalizes before hashing). The full `normalizeText` chain is
  * otherwise built from codegen'd builtins (`regexp_replace`, `trim`).
  *
  * Scale notes (100 TB): per-row map-side work, no shuffle, no state;
  * the expression allocates only the output string. Normalization cost
  * is O(bytes) and fuses into the same codegen stage as the downstream
  * hash/tokenize, so the corpus is still read exactly once.
  */
object TextNormalize {

  private val Forms = Set("NFC", "NFD", "NFKC", "NFKD")

  /** `unicode_normalize(s, 'NFC'|'NFD'|'NFKC'|'NFKD')`. */
  case class UnicodeNormalize(child: Expression, formName: String)
      extends UnaryExpression {
    require(Forms.contains(formName),
      s"unicode_normalize: unknown form '$formName' (want ${Forms.mkString("/")})")
    @transient private lazy val form = Normalizer.Form.valueOf(formName)

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects a string, got ${child.dataType.sql}")
    override def dataType: DataType = StringType
    override def prettyName: String = "unicode_normalize"

    override def nullSafeEval(s: Any): Any =
      UTF8String.fromString(Normalizer.normalize(
        s.asInstanceOf[UTF8String].toString, form))

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      // formName is validated against a closed set above, so the
      // interpolation cannot inject code.
      defineCodeGen(ctx, ev, c =>
        "org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"java.text.Normalizer.normalize($c.toString(), " +
          s"java.text.Normalizer.Form.$formName))")

    override protected def withNewChildInternal(
        newChild: Expression): UnicodeNormalize = copy(child = newChild)
  }

  private[functions] val registrations: Seq[(FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName,
        "unicode_normalize"),
      (es: Seq[Expression]) => {
        // Validate like a builtin: clean analysis-time errors instead
        // of IndexOutOfBounds/NPE/Unevaluable from a blind eval (r6
        // advice). The form must be a foldable non-null string.
        if (es.length != 2)
          throw new IllegalArgumentException(
            s"unicode_normalize expects 2 arguments (str, form), " +
              s"got ${es.length}")
        val formExpr = es(1)
        if (!formExpr.foldable)
          throw new IllegalArgumentException(
            "unicode_normalize: form must be a string literal " +
              s"(${Forms.mkString("/")}), got non-foldable " +
              formExpr.sql)
        val v = formExpr.eval()
        if (v == null)
          throw new IllegalArgumentException(
            "unicode_normalize: form must not be NULL " +
              s"(want ${Forms.mkString("/")})")
        UnicodeNormalize(es.head, v.toString)
      }))

  /** Idempotent per-session registration (same pattern as
    * VectorExpressions.register). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }

  /** The canonical cleanup chain, idempotent by construction
    * (law-tested in PropertyLawsSpec):
    *  1. NFC-compose (combining sequences → canonical precomposed),
    *  2. drop zero-width/invisible code points (ZWSP/ZWNJ/ZWJ/BOM/WJ),
    *  3. fold every control char, Unicode separator, and whitespace
    *     run to one ASCII space, trimming the ends,
    *  4. accent-fold: NFD-decompose, strip combining marks, then
    *     RE-COMPOSE to NFC — without the final pass the output stays
    *     decomposed, which diverges from DuckDB's `strip_accents`
    *     (composed output) on non-Latin decomposables: a Hangul
    *     syllable under bare NFD is conjoining Jamo, so norm_len /
    *     norm_md5 would differ between engines (r6 advice). The Latin
    *     fixture is unaffected (mark-stripped Latin NFD is already in
    *     NFC form), and idempotence is preserved (law-tested).
    * Steps use RE2-compatible `\x{..}`/`\p{..}` classes so a DuckDB
    * oracle can mirror them verbatim (accent folding maps to DuckDB's
    * `strip_accents`). */
  def normalizeText(c: Column): Column = {
    val composed = call_function("unicode_normalize", c, lit("NFC"))
    val noZw = regexp_replace(composed,
      "[\\x{200B}\\x{200C}\\x{200D}\\x{2060}\\x{FEFF}]", "")
    val oneSpace = trim(regexp_replace(noZw, "[\\p{Cc}\\p{Z}\\s]+", " "))
    val folded = regexp_replace(
      call_function("unicode_normalize", oneSpace, lit("NFD")),
      "\\p{Mn}", "")
    call_function("unicode_normalize", folded, lit("NFC"))
  }
}
