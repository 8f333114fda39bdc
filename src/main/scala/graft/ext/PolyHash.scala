package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic polynomial string hash with a DUCKDB TWIN — the
  * engine-portable hash that makes MinHash signatures oracle-checkable
  * (SURVEY.md §2.11; xxhash64 has no DuckDB equivalent, this does):
  *
  *   h = fold over codepoints c: h ← (31·h + c) mod 1 000 000 007
  *
  * DuckDB spelling (bit-identical; [[graft.llm.Dedup.polyHashSql]]):
  *   list_reduce([CAST(0 AS BIGINT)] ||
  *     list_transform(generate_series(1, length(s)),
  *                    i -> CAST(unicode(s[i]) AS BIGINT)),
  *     (a, c) -> (a * 31 + c) % 1000000007)
  *
  * Codepoint iteration (not UTF-16 units) matches DuckDB's per-character
  * indexing on non-BMP text. The modulus keeps every intermediate under
  * 2^35, so the fold never overflows a BIGINT in either engine.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"poly_hash needs a string input, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (31L * h + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (s, h, i, cp) = (ctx.freshName("s"), ctx.freshName("h"),
        ctx.freshName("i"), ctx.freshName("cp"))
      s"""
         |java.lang.String $s = $a.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = (31L * $h + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}
