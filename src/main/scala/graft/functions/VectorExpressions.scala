package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}

/** `graft_dot(array<double>, array<double>) -> double` — a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why custom: Spark's built-in route for a dot product is
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — higher-order functions,
  * which never enter whole-stage codegen and are evaluated by the
  * interpreter per row (measured 10-50× slower on the ANN queries, and
  * the interpreter re-evaluates nested subtrees per lambda element).
  * This is exactly the "(b) custom Catalyst Expression" tier of the
  * design rules: same semantics, sequential left-to-right accumulation
  * (bit-identical to the HOF formulation and DuckDB's
  * list_dot_product), but a tight codegen'd loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<double>, array<double>), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $x.getDouble($i) * $y.getDouble($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** `graft_intersect(array<bigint>, array<bigint>) -> int` — size of the
  * intersection of two SORTED distinct arrays (two-pointer merge,
  * O(n+m), codegen'd).
  *
  * Why custom: pairwise set-overlap verification (n-gram Jaccard,
  * minhash candidate verify) via joins explodes each candidate pair
  * into |shingles| rows; via array_intersect it allocates an
  * intermediate array per pair. A merge count over pre-sorted 60-bit
  * hash sketches does the same work in a tight loop with zero
  * allocation — the candidate-verify step stays one row per pair,
  * which is what survives 100 TB fan-outs. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_intersect expects (array<bigint>, array<bigint>), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        int $nx = $x.numElements(); int $ny = $y.numElements();
        int $i = 0; int $j = 0; int $c = 0;
        while ($i < $nx && $j < $ny) {
          long $xv = $x.getLong($i); long $yv = $y.getLong($j);
          if ($xv == $yv) { $c++; $i++; $j++; }
          else if ($xv < $yv) { $i++; } else { $j++; }
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_intersect"
}

/** `graft_count_in(array<string>, array<string>) -> int` — number of
  * elements of the first array present in the second (occurrences, not
  * distinct matches; null elements never match).
  *
  * Why custom: the built-in formulation
  * `size(filter(toks, t => array_contains(SET, t)))` is a higher-order
  * function — interpreted per row, with the interpreter re-evaluating
  * the tokenization subtree per element. This is the stopword-scoring
  * hot path of text_langid/text_quality (a map-only operation whose
  * right cost is one codegen'd pass over the tokens). The set side is
  * a small constant list (≤10 stopwords), so the inner scan beats any
  * hash setup. */
case class CountInSet(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_count_in expects (array<string>, array<string>), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < nx) {
      if (!x.isNullAt(i)) {
        val s = x.getUTF8String(i)
        var j = 0
        var found = false
        while (j < ny && !found) {
          if (!y.isNullAt(j) && s.equals(y.getUTF8String(j))) found = true
          j += 1
        }
        if (found) c += 1
      }
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val s = ctx.freshName("s")
      val found = ctx.freshName("found")
      s"""
        int $nx = $x.numElements(); int $ny = $y.numElements();
        int $c = 0;
        for (int $i = 0; $i < $nx; $i++) {
          if ($x.isNullAt($i)) continue;
          org.apache.spark.unsafe.types.UTF8String $s = $x.getUTF8String($i);
          boolean $found = false;
          for (int $j = 0; $j < $ny && !$found; $j++) {
            if (!$y.isNullAt($j) && $s.equals($y.getUTF8String($j))) { $found = true; }
          }
          if ($found) $c++;
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountInSet =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_count_in"
}

/** `graft_sum_len(array<string>) -> bigint` — total character length of
  * the array's elements (null elements contribute 0). Replaces the
  * interpreted `aggregate(transform(toks, length), 0, +)` HOF chain in
  * text_quality with one codegen'd pass. */
case class SumStringLength(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_sum_len expects array<string>, got ${other.sql}")
    }
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) acc += x.getUTF8String(i).numChars()
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = $x.numElements();
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if (!$x.isNullAt($i)) $acc += $x.getUTF8String($i).numChars();
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SumStringLength =
    copy(child = newChild)

  override def prettyName: String = "graft_sum_len"
}

/** `graft_cosine(array<double>, array<double>) -> double` — fused
  * cosine similarity: one traversal accumulating a·b, a·a and b·b,
  * then `s_ab / (sqrt(s_aa) * sqrt(s_bb))`.
  *
  * Why custom: every ANN rerank evaluates cosine per candidate pair,
  * and the composed form `graft_dot(a,b) / (sqrt(graft_dot(a,a)) *
  * sqrt(graft_dot(b,b)))` walks both arrays three times. Fusing keeps
  * the arithmetic bit-identical — each accumulator sees exactly the
  * add/multiply sequence of its standalone left fold, and the final
  * sqrt/multiply/divide matches the composed expression — so results
  * still hash-match DuckDB's `list_dot_product` formulation while the
  * inner loop reads each element once. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects (array<double>, array<double>), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      ab += xv * yv; aa += xv * xv; bb += yv * yv
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val ab = ctx.freshName("ab"); val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = $x.getDouble($i); double $yv = $y.getDouble($i);
          $ab += $xv * $yv; $aa += $xv * $xv; $bb += $yv * $yv;
        }
        ${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}


/** `graft_sub(array<double>, array<double>) -> array<double>` —
  * elementwise vector difference (the residual r = v − c of residual
  * product quantization), codegen'd.
  *
  * Why custom: the built-in route is `zip_with(a, b, _-_)` — a
  * higher-order function, interpreted per row and per element, on the
  * corpus-scale hot path that feeds every residual-PQ training pass
  * and encode. Output length follows the left operand (the vector);
  * a shorter right operand contributes 0 past its end — in practice
  * both are dim-length. Same IEEE subtraction sequence as the oracle's
  * per-dimension x − cx, so residuals are bit-identical cross-engine. */
case class VectorDiff(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_sub expects (array<double>, array<double>), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = math.min(n, y.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < m) { out(i) = x.getDouble(i) - y.getDouble(i); i += 1 }
    while (i < n) { out(i) = x.getDouble(i); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val (n, m, i, out) = (ctx.freshName("n"), ctx.freshName("m"),
        ctx.freshName("i"), ctx.freshName("out"))
      s"""
        final int $n = $x.numElements();
        final int $m = java.lang.Math.min($n, $y.numElements());
        final double[] $out = new double[$n];
        int $i = 0;
        for (; $i < $m; $i++) {
          $out[$i] = $x.getDouble($i) - $y.getDouble($i);
        }
        for (; $i < $n; $i++) { $out[$i] = $x.getDouble($i); }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDiff =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sub"
}

object VectorExpressions {
  /** Idempotently register graft_dot in the session's function registry
    * so `expr("graft_dot(a, b)")` resolves. Belt-and-braces for
    * sessions built without [[GraftExtensions]]; a no-op overwrite
    * otherwise. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)): Expression,
      "internal")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_intersect"),
      (children: Seq[Expression]) =>
        SortedIntersectCount(children(0), children(1)): Expression,
      "internal")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_count_in"),
      (children: Seq[Expression]) => CountInSet(children(0), children(1)): Expression,
      "internal")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_sum_len"),
      (children: Seq[Expression]) => SumStringLength(children(0)): Expression,
      "internal")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_sub"),
      (children: Seq[Expression]) => VectorDiff(children(0), children(1)): Expression,
      "internal")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_cosine"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children(0), children(1)): Expression,
      "internal")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_top_freq"),
      (children: Seq[Expression]) => TopTokenFreq(children(0)): Expression,
      "internal")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dup_bigrams"),
      (children: Seq[Expression]) => DupBigramCount(children(0)): Expression,
      "internal")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_gram_h60"),
      (children: Seq[Expression]) =>
        GramHash60(children(0), children(1)): Expression,
      "internal")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_win_min"),
      (children: Seq[Expression]) =>
        WindowMin(children(0), children(1)): Expression,
      "internal")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_cell_nearest"),
      (children: Seq[Expression]) => {
        val id = CentroidModels.litId(children(1))
        NearestCentroid(children(0), id, CentroidModels.bcFor(id)): Expression
      }, "internal")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_probe_cells"),
      (children: Seq[Expression]) => {
        val id = CentroidModels.litId(children(1))
        ProbeCells(children(0), id, CentroidModels.litInt(children(2)),
          CentroidModels.bcFor(id)): Expression
      }, "internal")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_group_nearest"),
      (children: Seq[Expression]) => {
        val id = CentroidModels.litId(children(2))
        NearestInGroup(children(0), children(1), id,
          GroupedCentroidModels.bcFor(id)): Expression
      }, "internal")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_cell_vec"),
      (children: Seq[Expression]) => {
        val id = CentroidModels.litId(children(1))
        CellVector(children(0), id, CentroidModels.bcFor(id)): Expression
      }, "internal")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_group_adc"),
      (children: Seq[Expression]) => {
        val id = CentroidModels.litId(children(2))
        GroupAdcTable(children(0), children(1), id,
          CentroidModels.litInt(children(3)),
          GroupedCentroidModels.bcFor(id)): Expression
      }, "internal")
  }
}

/** Build-time injection of the graft function library — the idiomatic
  * deployment path for a Spark-native library: users add
  * `spark.sql.extensions=graft.functions.GraftExtensions` to their
  * session/cluster conf and `graft_dot`/`graft_intersect` resolve in
  * every session (SQL, DataFrame `expr`, thrift) with no per-session
  * registration call. The engine's own Bench/Verify/test sessions run
  * through this path. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => new graft.plans.SummaryRewriteRule)
    ext.injectPlannerStrategy(_ => new graft.plans.AsofJoinStrategy)
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_intersect"),
      new ExpressionInfo(classOf[SortedIntersectCount].getCanonicalName, "graft_intersect"),
      (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_count_in"),
      new ExpressionInfo(classOf[CountInSet].getCanonicalName, "graft_count_in"),
      (children: Seq[Expression]) => CountInSet(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_sum_len"),
      new ExpressionInfo(classOf[SumStringLength].getCanonicalName, "graft_sum_len"),
      (children: Seq[Expression]) => SumStringLength(children(0))))
    ext.injectFunction((FunctionIdentifier("graft_sub"),
      new ExpressionInfo(classOf[VectorDiff].getCanonicalName, "graft_sub"),
      (children: Seq[Expression]) => VectorDiff(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_top_freq"),
      new ExpressionInfo(classOf[TopTokenFreq].getCanonicalName, "graft_top_freq"),
      (children: Seq[Expression]) => TopTokenFreq(children(0))))
    ext.injectFunction((FunctionIdentifier("graft_dup_bigrams"),
      new ExpressionInfo(classOf[DupBigramCount].getCanonicalName, "graft_dup_bigrams"),
      (children: Seq[Expression]) => DupBigramCount(children(0))))
    ext.injectFunction((FunctionIdentifier("graft_gram_h60"),
      new ExpressionInfo(classOf[GramHash60].getCanonicalName, "graft_gram_h60"),
      (children: Seq[Expression]) => GramHash60(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_win_min"),
      new ExpressionInfo(classOf[WindowMin].getCanonicalName, "graft_win_min"),
      (children: Seq[Expression]) => WindowMin(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_cell_nearest"),
      new ExpressionInfo(classOf[NearestCentroid].getCanonicalName, "graft_cell_nearest"),
      (children: Seq[Expression]) => {
        val id = CentroidModels.litId(children(1))
        NearestCentroid(children(0), id, CentroidModels.bcFor(id))
      }))
    ext.injectFunction((FunctionIdentifier("graft_probe_cells"),
      new ExpressionInfo(classOf[ProbeCells].getCanonicalName, "graft_probe_cells"),
      (children: Seq[Expression]) => {
        val id = CentroidModels.litId(children(1))
        ProbeCells(children(0), id, CentroidModels.litInt(children(2)),
          CentroidModels.bcFor(id))
      }))
    ext.injectFunction((FunctionIdentifier("graft_group_nearest"),
      new ExpressionInfo(classOf[NearestInGroup].getCanonicalName, "graft_group_nearest"),
      (children: Seq[Expression]) => {
        val id = CentroidModels.litId(children(2))
        NearestInGroup(children(0), children(1), id,
          GroupedCentroidModels.bcFor(id))
      }))
    ext.injectFunction((FunctionIdentifier("graft_cell_vec"),
      new ExpressionInfo(classOf[CellVector].getCanonicalName, "graft_cell_vec"),
      (children: Seq[Expression]) => {
        val id = CentroidModels.litId(children(1))
        CellVector(children(0), id, CentroidModels.bcFor(id))
      }))
    ext.injectFunction((FunctionIdentifier("graft_group_adc"),
      new ExpressionInfo(classOf[GroupAdcTable].getCanonicalName, "graft_group_adc"),
      (children: Seq[Expression]) => {
        val id = CentroidModels.litId(children(2))
        GroupAdcTable(children(0), children(1), id,
          CentroidModels.litInt(children(3)),
          GroupedCentroidModels.bcFor(id))
      }))
  }
}
