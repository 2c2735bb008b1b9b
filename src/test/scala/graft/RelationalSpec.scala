package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Direct unit tests for the projection/rename/cast operators (SURVEY
  * P1–P3) and the typed Dataset API. */
class RelationalSpec extends SparkSpecBase {
  import spark.implicits._

  test("withDateParts derives and (optionally) drops the date (P1/X1)") {
    val df = Seq(java.sql.Timestamp.valueOf("1997-03-15 00:00:00"))
      .toDF("o_orderdate")
    val kept = Relational.withDateParts(df, "o_orderdate")
    assert(kept.columns.toSeq == Seq("o_orderdate", "year", "month", "day"))
    val r = kept.head
    assert(r.getInt(1) == 1997 && r.getInt(2) == 3 && r.getInt(3) == 15)
    val dropped = Relational.withDateParts(df, "o_orderdate", dropDate = true)
    assert(!dropped.columns.contains("o_orderdate"))
  }

  test("newKeysOnly (J2) is NULL-SAFE on the keys: a NULL-keyed row " +
      "already in the sink reads as present, and the plan stays a " +
      "hash anti-join") {
    val candidates = Seq(
      (Some(1), "a"), (None, "b"), (Some(3), "c"))
      .toDF("k", "v")
    val existing = Seq(
      (Some(1), "x"), (None, "y"))
      .toDF("k", "v")
    val fresh = Relational.newKeysOnly(candidates, existing, Seq("k"))
    // plain-equality anti would keep the NULL-keyed candidate forever
    // (NULL = NULL is not true), re-appending it on every dedupAppend
    // run; null-safe keeps exactly the genuinely-new key
    assert(fresh.select("v").as[String].collect().toSeq == Seq("c"))
    // output schema is the candidates' frame, untouched
    assert(fresh.columns.toSeq == Seq("k", "v"))
    // EqualNullSafe must still extract as hash-join keys — a BNL here
    // would be the 100 TB scan-per-key disaster the anti-join replaces
    val physical = fresh.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin")
        && !physical.contains("CartesianProduct"), physical)
  }

  test("profile handles non-identifier column names (quoting, not splicing)") {
    val df = Seq((1, "a"), (2, "b"), (2, null))
      .toDF("weird name.v1", "it's")
    val got = Relational.profile(df, Seq("weird name.v1", "it's"))
      .orderBy(col("column")).collect()
    assert(got.length == 2)
    val byName = got.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byName("weird name.v1") == ((3L, 3L, 2L)))
    assert(byName("it's") == ((3L, 2L, 2L)))
  }

  test("applyChanges folds a change feed with latest-change-per-key wins") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val changes = Seq(
      (2L, "b", 25.0, "U", 1),  // update applies
      (3L, "c", 35.0, "U", 1),  // ...but the later delete wins on key 3
      (3L, "c", 30.0, "D", 2),
      (4L, "d", 40.0, "I", 1),  // brand-new key
      (4L, "d", 41.0, "U", 2))  // updated in the same feed: 41 wins
      .toDF("k", "s", "v", "op", "seq")
    val got = Relational.applyChanges(base, changes, Seq("k"), "op", "seq")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(1L -> 10.0, 2L -> 25.0, 4L -> 41.0))
    // NULL key: the window groups it as ONE partition, so the apply
    // must match it too — pre-fix the plain-equality anti left the
    // NULL-keyed base row in place, so an Update DUPLICATED it and a
    // Delete could never delete it
    val nbase = Seq((Some(1L), 10.0), (Option.empty[Long], 20.0))
      .toDF("k", "v")
    val nupd = Seq((Option.empty[Long], 25.0, "U", 1))
      .toDF("k", "v", "op", "seq")
    val afterU = Relational.applyChanges(nbase, nupd, Seq("k"), "op", "seq")
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0))
        -> r.getDouble(1)).toMap
    assert(afterU == Map(1L -> 10.0, -1L -> 25.0),
      s"NULL-keyed update mis-applied: $afterU")
    val ndel = Seq((Option.empty[Long], 20.0, "D", 1))
      .toDF("k", "v", "op", "seq")
    val afterD = Relational.applyChanges(nbase, ndel, Seq("k"), "op", "seq")
    assert(afterD.count() == 1 && afterD.head.getLong(0) == 1L,
      "NULL-keyed delete must delete the NULL-keyed row")
  }

  test("zscoreNormalize: mean 0, groups isolate, singleton group is null") {
    val df = (Seq.tabulate(5)(i => ("g", (i + 1) * 10.0)) :+ ("solo", 7.0))
      .toDF("k", "v")
    val got = Relational.zscoreNormalize(df, Seq("k"), "v")
    val g = got.filter(col("k") === "g")
      .select(col("v"), col("zscore")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(g.values.sum) < 1e-9, "z-scores must sum to ~0")
    assert(g(30.0) == 0.0, "the mean maps to exactly 0")
    assert(g(50.0) > 0 && g(10.0) < 0 && g(50.0) == -g(10.0))
    assert(got.filter(col("k") === "solo").head().isNullAt(2),
      "stddev of one row is undefined — null, not NaN/Infinity")
  }

  test("tableChecksum: order-independent, change- and null-shift-sensitive") {
    def sum(rows: Seq[(java.lang.Long, String)]) =
      Relational.tableChecksum(rows.toDF("k", "s"), Seq(col("k"), col("s")))
        .head().getDecimal(1)
    val base = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (3L, null))
    assert(sum(base) == sum(base.reverse), "row order must not matter")
    assert(sum(base) != sum(base.updated(1, (2L: java.lang.Long, "B"))),
      "a single changed cell must change the checksum")
    // null in one column vs the value shifted into the next column
    assert(sum(Seq((1L, "a"))) !=
      sum(Seq((null.asInstanceOf[java.lang.Long], "1a"))),
      "null/value boundaries must not be confusable")
  }

  test("iqrOutliers flags exactly the rows outside the Tukey fences") {
    // group g: values 1..9 plus a far outlier; q1=3, q3=8 over 1..9+100
    val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ ("g", 100.0))
      .toDF("k", "v")
    val flagged = Relational.iqrOutliers(df, Seq("k"), "v")
      .collect().map(r => r.getDouble(1) -> r.getBoolean(2)).toMap
    assert(flagged(100.0), "the planted outlier must be flagged")
    assert((1 to 9).forall(v => !flagged(v.toDouble)),
      "no in-range value may be flagged")
  }

  test("fillForward repairs gaps; leading nulls stay null; keys isolate") {
    val df = Seq(
      ("a", 1, Some(10.0)), ("a", 2, None), ("a", 3, None),
      ("a", 4, Some(40.0)), ("b", 1, None), ("b", 2, Some(5.0)))
      .toDF("k", "t", "v")
    val got = Relational.fillForward(df, Seq("k"), Seq("t"), Seq("v"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got(("a", 2)).contains(10.0) && got(("a", 3)).contains(10.0))
    assert(got(("a", 4)).contains(40.0))
    assert(got(("b", 1)).isEmpty, "no preceding value — must stay null")
    assert(got(("b", 2)).contains(5.0), "fill must not cross key groups")
  }

  test("melt is the inverse of pivot on its id/value columns") {
    val wide = Seq((1L, 2.0, 3.0), (2L, 4.0, 5.0)).toDF("id", "a", "b")
    val tall = Relational.melt(wide, Seq("id"), Seq("a", "b"), "m", "v")
    assert(tall.columns.toSeq == Seq("id", "m", "v"))
    val back = tall.groupBy("id").pivot("m", Seq("a", "b")).agg(first("v"))
    assertBagEqual(back, wide)
  }

  test("renameAll is the positional bulk rename (P2)") {
    val df = Seq((1, "x")).toDF("a", "b")
    assert(Relational.renameAll(df, Seq("c1", "c2")).columns.toSeq
      == Seq("c1", "c2"))
    intercept[IllegalArgumentException] {
      Relational.renameAll(df, Seq("only_one"))
    }
  }

  test("castToSchema projects, reorders, casts, and drops extras (P3)") {
    // the reference's .astype(str) round-trip then per-column recast
    // (weekly_dag.py:91-104): strings in, declared types out
    val df = Seq(("2024", "1", "70.5", "extra")).toDF(
      "year", "month", "oil_price", "junk")
    val schema = StructType(Seq(
      StructField("oil_price", DoubleType),
      StructField("year", IntegerType),
      StructField("month", IntegerType)))
    val out = Relational.castToSchema(df, schema)
    assert(out.columns.toSeq == Seq("oil_price", "year", "month"))
    assert(out.schema.fields.map(_.dataType).toSeq ==
      Seq(DoubleType, IntegerType, IntegerType))
    val r = out.head
    assert(r.getDouble(0) == 70.5 && r.getInt(1) == 2024 && r.getInt(2) == 1)
  }

  test("typed Dataset API: compile-time fields over the fact table") {
    val revenue = Domain.lineitems(spark, sf)
      .filter(_.l_returnflag == "R")
      .map(l => l.l_extendedprice * (1 - l.l_discount))
      .reduce(_ + _)
    assert(revenue > 0)
    val perStatus = Domain.orders(spark, sf)
      .groupByKey(_.o_orderstatus)
      .count().collect().toMap
    assert(perStatus.values.sum == Tables.orders(spark, sf).count())
  }

  test("histogram: buckets partition the rows; constants and max-edge") {
    val o = Tables.orders(spark, sf)
    val h = Relational.histogram(o, "o_totalprice", 10).collect()
    assert(h.map(_.getLong(3)).sum == o.filter(col("o_totalprice").isNotNull).count())
    assert(h.map(_.getInt(0)).forall(b => b >= 0 && b < 10))
    // max value closes into the top bucket, not a phantom bucket 10
    assert(h.map(_.getInt(0)).max == 9)
    val const = Seq(5.0, 5.0, 5.0).toDF("x")
    val hc = Relational.histogram(const, "x", 4).collect()
    assert(hc.length == 1 && hc(0).getInt(0) == 0 && hc(0).getLong(3) == 3)
    // NULLs are excluded, not a bucket
    val withNull = Seq(Some(1.0), None, Some(2.0)).toDF("x")
    assert(Relational.histogram(withNull, "x", 2)
      .agg(sum("n")).collect()(0).getLong(0) == 2)
  }

  test("sessionize: gap splits, partition-invariant, rows tagged") {
    val e = Tables.events(spark, sf)
    val tagged = Relational.sessionize(e, "user_id", "ts", 1800)
    assert(tagged.count() == e.count(), "sessionize must not drop rows")
    val a = tagged.select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Relational.sessionize(e.repartition(7), "user_id", "ts", 1800)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "session assignment must be partition-invariant")
    // a tiny hand-checked timeline: gaps of 10s with a 5s threshold
    val t = Seq((1L, 0L), (2L, 3L), (3L, 20L), (4L, 22L), (5L, 60L))
      .toDF("event_id", "secs")
      .select(col("event_id"), timestamp_seconds(col("secs")).as("ts"),
        lit(1).as("u"))
    val got = Relational.sessionize(t, "u", "ts", 5)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L))
  }

  test("imputeMean fills NULLs with the group mean; all-null groups stay null") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("b", None), ("b", None)).toDF("k", "v")
    val got = Relational.imputeMean(df, Seq("k"), "v")
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toSeq
      .sortBy(_.toString)
    assert(got.count { case ("a", v) => v.contains(2.0); case _ => false } == 1,
      s"the NULL in group a should become the mean 2.0: $got")
    assert(got.filter(_._1 == "b").forall(_._2.isEmpty),
      "an all-null group has no mean — must stay null")
    // non-null values pass through untouched
    assert(got.count { case ("a", v) => v.contains(1.0) || v.contains(3.0)
      case _ => false } == 2)
  }

  test("buildScd2 chains versions; exactly one current row per key") {
    val changes = Seq(
      (1, 100L, "a"), (1, 200L, "b"), (1, 150L, "c"),
      (2, 50L, "x")).toDF("k", "t", "attr")
    val got = Relational.buildScd2(changes, Seq("k"), "t")
      .orderBy("k", "t")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (1, 100L, "a", Some(150L), false),
      (1, 150L, "c", Some(200L), false),
      (1, 200L, "b", None, true),
      (2, 50L, "x", None, true)))
    // each version's valid_to is the NEXT valid_from: intervals tile
    // the key's timeline with no gaps and no overlaps
  }

  test("mergeIntervals: overlap, touch, containment, and gaps") {
    // key 1: [0,10] overlaps [5,20], [20,25] TOUCHES (20 ≤ 20 merges),
    //        [30,40] gapped; [31,32] nested inside it
    // key 2: isolated single interval
    val iv = Seq(
      (1, 0L, 10L), (1, 5L, 20L), (1, 20L, 25L), (1, 30L, 40L),
      (1, 31L, 32L), (2, 7L, 8L)).toDF("k", "s", "e")
    val got = Relational.mergeIntervals(iv, "k", "s", "e")
      .orderBy("k", "island")
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq((1, 0L, 25L, 3L), (1, 30L, 40L, 2L), (2, 7L, 8L, 1L)))
    // a long interval spanning late-starting short ones keeps them in
    // its island even when an intermediate end is smaller (running MAX
    // end, not lag(end))
    val span = Seq((1, 0L, 100L), (1, 10L, 20L), (1, 50L, 60L),
      (1, 101L, 110L)).toDF("k", "s", "e")
    val g2 = Relational.mergeIntervals(span, "k", "s", "e").collect()
    assert(g2.length == 2)
  }

  test("dictionary encode/decode round-trips and codes are dense") {
    val o = Tables.orders(spark, sf).select(col("o_orderpriority"))
    val dict = Relational.dictionary(o, "o_orderpriority")
    val codes = dict.collect().map(r => r.getInt(0)).sorted.toSeq
    assert(codes == codes.indices.toSeq, "codes not dense from 0")
    val encoded = Relational.dictionaryEncode(o, "o_orderpriority", dict)
    assert(encoded.columns.sameElements(Array("o_orderpriority_code")))
    // decode back: the bag of values survives the round trip
    val decoded = encoded.join(broadcast(dict),
        encoded("o_orderpriority_code") === dict("code"))
      .select(col("value").as("o_orderpriority"))
    assertBagEqual(decoded, o)
  }

  test("topP: smallest prefix covering p, crossing row included") {
    import spark.implicits._
    // group g: masses 50, 30, 15, 5 (total 100)
    //   p=0.6 → 50 (before=0) + 30 (before=0.5) — 15 has before 0.8, out
    //   p=0.8 → 50, 30 in; 15 has before 0.80 NOT < 0.8, out (boundary)
    //   p=0.81 → 15 in
    val df = Seq(("g", "a", 50L), ("g", "b", 30L), ("g", "c", 15L),
      ("g", "d", 5L)).toDF("grp", "item", "mass")
    def kept(p: Double) = Relational.topP(df, Seq("grp"), "mass", "item", p)
      .collect().map(_.getAs[String]("item")).toSet
    assert(kept(0.6) == Set("a", "b"))
    assert(kept(0.8) == Set("a", "b"))
    assert(kept(0.81) == Set("a", "b", "c"))
    assert(kept(1.0) == Set("a", "b", "c", "d"))
    // ties break on the tie-break column: equal masses, p small →
    // exactly the lexicographically first row survives
    val ties = Seq(("g", "x", 10L), ("g", "y", 10L)).toDF("grp", "item", "mass")
    assert(Relational.topP(ties, Seq("grp"), "mass", "item", 0.5)
      .collect().map(_.getAs[String]("item")).toSeq == Seq("x"))
  }
}
