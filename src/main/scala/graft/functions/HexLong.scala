package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Parse the first `nChars` lowercase-hex characters of a string as an
  * unsigned long (nChars ≤ 15, so the value always fits a signed 64-bit).
  *
  * Semantically identical to `conv(substring(s, 1, nChars), 16, 10) cast
  * long` for md5 output, but conv() routes through BigInteger plus a
  * string allocation per row — this is the hot inner op of every
  * md5-derived uniform/hash in the engine (sampling draws, shingle index,
  * simhash bits), so it gets a tight generated loop instead.
  */
case class HexLong(child: Expression, nChars: Int) extends UnaryExpression {
  require(nChars > 0 && nChars <= 15, "nChars must fit a signed long")

  override def dataType: DataType = LongType
  override def prettyName: String = "hex_long"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    // Bounds check before the unsafe byte reads: a short input must fail
    // loudly, not read past the buffer into JVM-memory-dependent garbage.
    if (s.numBytes < nChars) throw new IllegalArgumentException(
      s"hex_long needs >= $nChars chars, got '${s.toString}'")
    var acc = 0L
    var i = 0
    while (i < nChars) {
      val b = s.getByte(i)
      val d = if (b <= '9') b - '0' else b - 'a' + 10
      acc = (acc << 4) | d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |if ($s.numBytes() < $nChars) {
         |  throw new IllegalArgumentException(
         |    "hex_long needs >= $nChars chars, got '" + $s.toString() + "'");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $nChars; $i++) {
         |  byte $b = $s.getByte($i);
         |  $acc = ($acc << 4) | (($b <= '9') ? ($b - '0') : ($b - 'a' + 10));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HexLong {
  def apply(c: Column, nChars: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(HexLong(GraftSqlBridge.expression(c), nChars))
  }
}
