package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Membership-hit counts of a token array against N word sets in ONE pass:
  * result[i] = how many tokens (with multiplicity) are in word set i.
  *
  * The sets are compiled once into a token → N-bit membership bitmask hash
  * map (a word may belong to several sets — e.g. "la" is both an es and fr
  * language marker), so each token costs ONE hash lookup + popcount-style
  * bit walk instead of N× set-size string equality compares (the
  * `size(filter(tokens, isin(words)))` HOF formulation — interpreted, and
  * ~50 compares/token for 5 languages × 10 markers). Whole-stage-codegen'd;
  * used by language ID where it replaced an interpreted fold measured at
  * ~2× the tokenizer's own cost.
  */
case class WordSetHitsExpr(child: Expression, wordSets: Seq[Seq[String]])
    extends UnaryExpression {
  require(wordSets.nonEmpty && wordSets.size <= 32,
    s"wordSets must have 1..32 sets, got ${wordSets.size}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_set_hits expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_word_set_hits"

  /** token → bitmask of the sets containing it. */
  @transient private lazy val membership: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    wordSets.zipWithIndex.foreach { case (words, i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](wordSets.size)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val m = membership.get(arr.getUTF8String(i))
        if (m != null) {
          var mask = m.intValue()
          while (mask != 0) {
            counts(Integer.numberOfTrailingZeros(mask)) += 1
            mask &= mask - 1
          }
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mapRef = ctx.addReferenceObj("wordSetMembership", membership, "java.util.HashMap")
      val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
      val i = ctx.freshName("i"); val mo = ctx.freshName("mo")
      val mask = ctx.freshName("mask")
      s"""
         |final int $n = $arr.numElements();
         |final int[] $counts = new int[${wordSets.size}];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final Object $mo = $mapRef.get($arr.getUTF8String($i));
         |    if ($mo != null) {
         |      int $mask = ((Integer) $mo).intValue();
         |      while ($mask != 0) {
         |        $counts[Integer.numberOfTrailingZeros($mask)]++;
         |        $mask &= $mask - 1;
         |      }
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordSetHitsExpr =
    copy(child = newChild)
}

object WordSetHits {
  /** Column API: per-set membership hit counts of a token array. */
  def hits(tokens: Column, wordSets: Seq[Seq[String]]): Column =
    GraftShim.toColumn(WordSetHitsExpr(GraftShim.toExpression(tokens), wordSets))
}
