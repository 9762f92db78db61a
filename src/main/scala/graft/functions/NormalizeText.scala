package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text normalizer — the dedup-key canonicalization
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))`
  * as ONE scan over the row's bytes instead of a lowercase pass plus two
  * java.util.regex passes over the whole document (the NgramHashes
  * lesson applied to the normalize step itself: fingerprint/dedup-norm
  * spent most of their time inside the regex engine — measured ~2× on
  * the sf3 isolates).
  *
  * Output is BIT-IDENTICAL to the SQL shape. Fast path (pure-ASCII
  * input, i.e. every byte ≥ 0): one scan that lowercases A–Z, keeps
  * [a-z0-9], turns any run of dropped-or-space bytes containing a space
  * into exactly one separator space, and never emits leading/trailing
  * spaces — which is precisely remove→collapse→trim composed, because
  * removal happens BEFORE collapsing in the SQL order ("a . b" → "a  b"
  * → "a b": a dropped char between spaces still collapses). Any
  * non-ASCII byte routes the whole row through a fallback that executes
  * the literal Spark semantics — `UTF8String.toLowerCase` then the two
  * `replaceAll` regexes then the space-only trim — so exotic case
  * mappings that LAND in [a-z0-9] (Kelvin sign → k, İ → i + combining
  * dot) keep exact parity with the built-in tree. PropertySpec pins
  * bit-equality against the SQL shape on adversarial inputs.
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression with Bridge.StringInputs {

  // Bridge.StringInputs = ImplicitCastInputTypes(StringType): the SQL tree
  // this expression replaced (`lower` + two `regexp_replace`) implicitly
  // cast any argument to string, so a caller passing e.g. an int column
  // must keep getting coerced output rather than a new analysis error.
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeTextUtil.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NormalizeTextUtil.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeTextUtil {
  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    // copy once; getBytes may or may not copy depending on layout, and
    // the scan below reads every byte anyway
    val in = s.getBytes
    // ASCII detection rides INSIDE the transform loop — the hot path
    // (pure-ASCII documents) must not pay a second full scan just to
    // pick fast-vs-fallback. Bailing mid-transform is safe because the
    // fallback recomputes from the original UTF8String; the only waste
    // on a non-ASCII row is the (rare-path) out-buffer allocation.
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      var c = in(i)
      if (c < 0) return fallback(s)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = c
        o += 1
      } else if (c == ' ' && o > 0) {
        // a space only materializes if another kept char follows
        // (collapse + trailing trim); o == 0 is the leading trim
        pendingSpace = true
      } // every other byte is dropped
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  /** Non-ASCII rows: the literal built-in tree, step for step. */
  private def fallback(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase.toString
    val collapsed = lowered.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ")
    UTF8String.fromString(collapsed).trim()
  }
}

object TextFunctions {
  /** Column-API entry point for [[NormalizeText]]. */
  def normalize_text(c: Column): Column =
    Bridge.column(NormalizeText(Bridge.expression(c)))
}
