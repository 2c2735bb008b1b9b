package graft

import graft.operators.TextClassifier
import org.apache.spark.sql.functions._

/** Hand-computed Naive Bayes model checks + the determinism laws the
  * oracle replay relies on. */
class TextClassifierSpec extends SparkSpecBase {

  test("NB predicts the hand-computed argmax on a tiny fixture") {
    import spark.implicits._
    val train = Seq(("a", "x x y"), ("a", "x y"), ("b", "z z y"))
      .toDF("lab", "text")
    val score = Seq((1L, "a", "x x"), (2L, "b", "z z"), (3L, "a", "y y"))
      .toDF("id", "lab", "text")
    val out = TextClassifier.naiveBayes(train, score, "id", "text", "lab")
      .orderBy("id").collect()
    // class a: toks {x:3, y:2} tot 5; class b: {z:2, y:1} tot 3; V=3
    // doc 1 "x x": a: log2(2/3)+2*log2(4/8)  = -2.585
    //              b: log2(1/3)+2*log2(1/6)  = -6.755  -> a
    // doc 2 "z z": a: log2(2/3)+2*log2(1/8)  = -6.585
    //              b: log2(1/3)+2*log2(3/6)  = -3.585  -> b
    // doc 3 "y y": a: log2(2/3)+2*log2(3/8)  = -3.415
    //              b: log2(1/3)+2*log2(2/6)  = -4.755  -> a
    assert(out.map(_.getAs[String]("pred")).toSeq == Seq("a", "b", "a"))
    assert(out.map(_.getAs[Boolean]("correct")).toSeq ==
      Seq(true, true, true))
    val ll1 = out(0).getAs[Double]("ll")
    assert(math.abs(ll1 - (math.log(2.0 / 3) / math.log(2) +
      2 * math.log(4.0 / 8) / math.log(2))) < 1e-6, s"ll1=$ll1")
  }

  test("calibration: hand-computed softmax confidence, binning, and " +
      "N-weighted ECE") {
    import spark.implicits._
    val train = Seq(("a", "x x y"), ("a", "x y"), ("b", "z z y"))
      .toDF("lab", "text")
    val score = Seq((1L, "a", "x x"), (2L, "b", "z z"), (3L, "b", "y y"))
      .toDF("id", "lab", "text")
    val out = TextClassifier.calibrationBins(
        train, score, "id", "text", "lab", bins = 4)
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(6)))
    def r6(v: Double) = math.round(v * 1e6) / 1e6
    val lg = (v: Double) => math.log(v) / math.log(2)
    // lls per first-spec arithmetic (round-6 per class), softmax:
    def conf(lls: Seq[Double]): Double = {
      val rs = lls.map(r6); val w = rs.max
      r6(1.0 / rs.map(x => math.pow(2.0, x - w)).foldLeft(0.0)(_ + _))
    }
    val c1 = conf(Seq(lg(2.0 / 3) + 2 * lg(4.0 / 8),
      lg(1.0 / 3) + 2 * lg(1.0 / 6)))
    val c2 = conf(Seq(lg(2.0 / 3) + 2 * lg(1.0 / 8),
      lg(1.0 / 3) + 2 * lg(3.0 / 6)))
    val c3 = conf(Seq(lg(2.0 / 3) + 2 * lg(3.0 / 8),
      lg(1.0 / 3) + 2 * lg(2.0 / 6)))
    // doc 1 -> pred a, correct; doc 2 -> pred b, correct;
    // doc 3 -> pred a, WRONG. bins of width .25
    def bin(c: Double) = math.min((c * 4).toInt, 3).toLong
    assert(Seq(c1, c2, c3).forall(c => c > 0.5 && c <= 1.0))
    val byBin = Seq((bin(c1), 1L, c1), (bin(c2), 1L, c2),
      (bin(c3), 0L, c3)).groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, xs) =>
        val n = xs.size.toLong
        val acc = r6(xs.map(_._2).sum.toDouble / n)
        val avg = r6(xs.map(x => BigDecimal(x._3)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / n)
        (b, n, xs.map(_._2).sum, acc, avg, r6(math.abs(acc - avg)))
      }
    val ece = r6(byBin.map(x => x._6 * x._2).sum / 3.0)
    assert(out.toSeq === byBin.map(x =>
      (x._1, x._2, x._3, x._4, x._5, ece)))
  }

  test("classReport: hand-computed confusion metrics and Cohen's kappa") {
    import spark.implicits._
    val train = Seq(("a", "x x y"), ("a", "x y"), ("b", "z z y"))
      .toDF("lab", "text")
    // preds per first-spec arithmetic: "x x"->a, "z z"->b, "y y"->a
    val score = Seq((1L, "a", "x x"), (2L, "b", "z z"), (3L, "b", "y y"))
      .toDF("id", "lab", "text")
    val out = TextClassifier.classReport(train, score, "id", "text", "lab")
      .orderBy(col("cls")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8)))
    def r6(v: Double) = math.round(v * 1e6) / 1e6
    // confusion: actual a: pred a (1). actual b: pred a (1), pred b (1)
    // a: n_true=1 n_pred=2 n_correct=1 -> p=.5 r=1 f1=2*.5*1/1.5
    // b: n_true=2 n_pred=1 n_correct=1 -> p=1 r=.5 f1 same
    // acc = 2/3; pe = (1*2 + 2*1)/9 = 4/9; kappa = (2/3-4/9)/(1-4/9)
    val acc = r6(2.0 / 3)
    val pe = r6(4.0 / 9)
    val kappa = r6((acc - pe) / (1.0 - pe))
    val f1 = r6(2.0 * 0.5 * 1.0 / 1.5)
    assert(out.toSeq === Seq(
      ("a", 1L, 2L, 1L, 0.5, 1.0, f1, acc, kappa),
      ("b", 2L, 1L, 1L, 1.0, 0.5, f1, acc, kappa)))
  }

  test("chiSquareTokens: hand-computed 2x2 chi-square, all-docs token " +
      "guard, doc-level presence") {
    import spark.implicits._
    // 4 docs: "x" marks class a (both a-docs, no b-doc); "w" in every
    // doc (degenerate -> 0); "y y" repeats within one doc (presence
    // counts once)
    val docs = Seq(
      (1L, "a", "x w y y"), (2L, "a", "x w"),
      (3L, "b", "w z"), (4L, "b", "w z"))
      .toDF("id", "lab", "text")
    val out = TextClassifier.chiSquareTokens(docs, "id", "text", "lab", 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    def r6(v: Double) = math.round(v * 1e6) / 1e6
    // x in cls a: a=2 b=0 c=0 d=2 -> chi2 = 4*(4-0)^2/(2*2*2*2) = 4
    val xa = out.find(t => t._1 == "a" && t._2 == "x").get
    assert(xa._3 === 2L && xa._4 === 4.0 && xa._5 === 1L)
    // w is in all docs -> chi2 0 in both classes
    assert(out.filter(_._2 == "w").forall(_._4 === 0.0))
    // y: presence once in doc 1: a=1 b=0 c=1 d=2 ->
    // chi2 = 4*(1*2-0*1)^2/(1*3*2*2) = 16/12
    val ya = out.find(t => t._1 == "a" && t._2 == "y").get
    assert(ya._3 === 1L && ya._4 === r6(16.0 / 12))
    // z marks class b exactly like x marks a
    val zb = out.find(t => t._1 == "b" && t._2 == "z").get
    assert(zb._4 === 4.0 && zb._5 === 1L)
  }

  test("oneVsRestAuc: perfect separation scores 1, ties average, " +
      "degenerate class reports 0.5") {
    import spark.implicits._
    val train = Seq(("a", "x x y"), ("a", "x y"), ("b", "z z y"))
      .toDF("lab", "text")
    // doc scores for class a (first-spec lls): "x x" high, "z z" low,
    // "y y" mid — actual labels make class-a ranking PERFECT
    // (the one positive "x x" ranks top) and class-b perfect too.
    val score = Seq((1L, "a", "x x"), (2L, "b", "z z"), (3L, "b", "y y"))
      .toDF("id", "lab", "text")
    val out = TextClassifier.oneVsRestAuc(train, score, "id", "text", "lab")
      .orderBy(col("cls")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // class a: pos {xx: p_a max}, neg {zz lowest, yy mid} -> AUC 1
    // class b: pos {zz, yy}, neg {xx}; p_b ranks: zz top, yy mid,
    // xx bottom -> AUC 1
    assert(out.toSeq === Seq(("a", 1L, 2L, 1.0), ("b", 2L, 1L, 1.0)))

    // all docs identical text -> every posterior ties -> AUC = 0.5
    // via tie-averaged ranks (not the degenerate guard)
    val tied = Seq((1L, "a", "y"), (2L, "b", "y"), (3L, "b", "y"))
      .toDF("id", "lab", "text")
    val t = TextClassifier.oneVsRestAuc(train, tied, "id", "text", "lab")
      .orderBy(col("cls")).collect().map(r => r.getDouble(3))
    assert(t.toSeq === Seq(0.5, 0.5))

    // single-class corpus: class a has no negatives -> guard 0.5
    val mono = Seq((1L, "a", "x x"), (2L, "a", "x"))
      .toDF("id", "lab", "text")
    val m = TextClassifier.oneVsRestAuc(train, mono, "id", "text", "lab")
      .orderBy(col("cls")).collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    assert(m.find(_._1 == "a").get._2 === 0.5)
  }

  test("unseen tokens route through add-one smoothing, not NaN/-inf") {
    import spark.implicits._
    val train = Seq(("a", "x"), ("b", "z")).toDF("lab", "text")
    val score = Seq((1L, "a", "q q q")).toDF("id", "lab", "text")
    val out = TextClassifier.naiveBayes(train, score, "id", "text", "lab")
      .collect()
    assert(out.length == 1)
    val ll = out(0).getAs[Double]("ll")
    assert(!ll.isNaN && !ll.isInfinite)
    // both classes identical on unseen-only text -> tie -> largest
    // label wins (sort-take-last contract)
    assert(out(0).getAs[String]("pred") == "b")
  }

  test("scores are invariant under repartitioning") {
    val docs = Tables.documents(spark, sf)
    val base = TextClassifier.naiveBayes(
      docs.filter(col("doc_id") % 3 =!= 0), docs, "doc_id", "text", "lang")
    val shuffled = TextClassifier.naiveBayes(
      docs.filter(col("doc_id") % 3 =!= 0).repartition(13),
      docs.repartition(7), "doc_id", "text", "lang")
    assertBagEqual(base, shuffled)
  }

  test("classifier beats chance on the held-out corpus") {
    val docs = Tables.documents(spark, sf)
    val out = TextClassifier.naiveBayes(
      docs.filter(col("doc_id") % 3 =!= 0),
      docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", "lang")
    val n = out.count().toDouble
    val acc = out.filter(col("correct")).count() / n
    // the synthetic corpus's lang signal is a weak frequency tilt over
    // a SHARED vocabulary (measured: ~0.34 held-out at sf0.001, ~0.42
    // at sf0.01) — so the corpus-level claim is "better than the 1/5
    // chance line", and the exact model math is pinned by the
    // hand-computed fixture above + the q162 oracle hash
    assert(acc > 0.25, s"held-out accuracy $acc not better than chance")
  }
}
